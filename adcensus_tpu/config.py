"""Configuration for the TPU-native AD-Census stereo engine.

Mirrors every tunable of the reference ``ADCensusOption`` struct
(reference: AD-Census/adcensus_types.h:45-75) with identical defaults, as a
frozen (hashable) dataclass so it can be passed as a static argument to
``jax.jit``.
"""
from __future__ import annotations

import dataclasses

import numpy as np

# Sentinel for invalid disparities (reference: adcensus_types.h:33).
INVALID_FLOAT = np.float32(np.inf)
# Large/small float sentinels (reference: adcensus_types.h:35-36).
LARGE_FLOAT = np.float32(99999.0)
SMALL_FLOAT = np.float32(-99999.0)
# Cap on cross arm length, uint8 storage (reference: cross_aggregator.h:22).
MAX_ARM_LENGTH = 255


@dataclasses.dataclass(frozen=True)
class ADCensusOptions:
    """All 16 tunables of the AD-Census pipeline.

    Defaults match the reference constructor (adcensus_types.h:67-74).
    """

    min_disparity: int = 0
    max_disparity: int = 64

    lambda_ad: int = 10        # AD cost weighting lambda
    lambda_census: int = 30    # census cost weighting lambda
    cross_L1: int = 34         # cross window max arm length
    cross_L2: int = 17         # cross window secondary length threshold
    cross_t1: int = 20         # cross window color threshold 1
    cross_t2: int = 6          # cross window color threshold 2
    so_p1: float = 1.0         # scanline optimization P1
    so_p2: float = 3.0         # scanline optimization P2
    so_tso: int = 15           # scanline optimization color-gradient threshold
    irv_ts: int = 20           # iterative region voting count threshold
    irv_th: float = 0.4        # iterative region voting ratio threshold

    lrcheck_thres: float = 1.0  # left-right consistency threshold

    do_lr_check: bool = True
    # One flag gates BOTH region voting and interpolation, mirroring the
    # reference wiring (ADCensusStereo.cpp:182-183 passes do_filling twice).
    do_filling: bool = True
    do_discontinuity_adjustment: bool = False

    # Engine extension (not a reference tunable): reproduce the
    # reference's in-place raster-order final median exactly via the
    # sheared-wavefront scan (closes most of the remaining parity gap;
    # ~2 ms) instead of the dense out-of-place median.
    exact_median: bool = False

    @property
    def disp_range(self) -> int:
        return self.max_disparity - self.min_disparity

    def validate(self) -> None:
        if self.disp_range <= 0:
            raise ValueError(
                f"max_disparity ({self.max_disparity}) must exceed "
                f"min_disparity ({self.min_disparity})"
            )
