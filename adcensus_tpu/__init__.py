"""TPU-native AD-Census dense stereo engine."""
__version__ = "0.1.0"
