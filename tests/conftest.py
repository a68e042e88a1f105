"""Test configuration: force an 8-device CPU mesh before JAX imports.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count=8); bench.py runs on the real TPU.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# The ambient environment pins JAX_PLATFORMS=axon (the TPU tunnel) and a
# sitecustomize hook registers that backend at interpreter start, so env
# vars alone don't win — force the platform via jax.config too.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from adcensus_tpu.config import ADCensusOptions
from adcensus_tpu.io.image import get_pair


@pytest.fixture(scope="session")
def small_pair():
    """A small crop of the Cone pair with real image statistics, plus a
    reduced disparity range — sized so the exact NumPy oracle stays fast."""
    left, right, _ = get_pair("Cone").load()
    # Crop an interior region with texture; keep full rows of disparity
    # context to the left so costs are non-degenerate.
    y0, x0, h, w = 160, 120, 36, 52
    return (
        np.ascontiguousarray(left[y0 : y0 + h, x0 : x0 + w]),
        np.ascontiguousarray(right[y0 : y0 + h, x0 : x0 + w]),
    )


@pytest.fixture(scope="session")
def small_opts():
    return ADCensusOptions(min_disparity=0, max_disparity=16)


@pytest.fixture(scope="session")
def oracle_result(small_pair, small_opts):
    from adcensus_tpu.oracle import numpy_ref

    left, right = small_pair
    return numpy_ref.match(left, right, small_opts)


def _enable_compile_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


_enable_compile_cache()
