"""Sharded == unsharded equality on a virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adcensus_tpu.parallel.mesh import make_mesh
from adcensus_tpu.parallel.sharded import match_sharded
from adcensus_tpu.stages import cost as cost_stage
from adcensus_tpu.stages.pipeline import match_core


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(n_data=1, n_tile=8)


@pytest.fixture(scope="module")
def sharded_opts():
    """Short arms keep the XLA CPU compile of the big shard_map program
    fast; correctness coverage is unchanged (all halo/reshard paths run,
    multi-hop halos included since h_local is small)."""
    from adcensus_tpu.config import ADCensusOptions

    return ADCensusOptions(
        min_disparity=0, max_disparity=16, cross_L1=8, cross_L2=4
    )


def _run_both(left, right, opts, mesh):
    gray_l = cost_stage.compute_gray_host64(np.asarray(left))
    gray_r = cost_stage.compute_gray_host64(np.asarray(right))
    ref = match_core(
        jnp.asarray(left), jnp.asarray(right),
        jnp.asarray(gray_l), jnp.asarray(gray_r),
        opts,
    )["disparity"]
    out = match_sharded(
        jnp.asarray(left), jnp.asarray(right),
        jnp.asarray(gray_l), jnp.asarray(gray_r),
        opts, mesh,
    )
    return np.asarray(ref), np.asarray(out)


def test_sharded_equals_unsharded(small_pair, sharded_opts, mesh8):
    left, right = small_pair
    ref, out = _run_both(left, right, sharded_opts, mesh8)
    assert ref.shape == out.shape
    both = np.isfinite(ref) & np.isfinite(out)
    assert np.array_equal(np.isfinite(ref), np.isfinite(out))
    np.testing.assert_allclose(out[both], ref[both], atol=5e-5)


def test_sharded_equals_unsharded_odd_shape(small_pair, sharded_opts, mesh8):
    """Height/width NOT divisible by the tile count exercises the padded
    path (flagged scanline, masked median)."""
    left, right = small_pair
    left = left[:33, :49]
    right = right[:33, :49]
    ref, out = _run_both(left, right, sharded_opts, mesh8)
    both = np.isfinite(ref) & np.isfinite(out)
    assert np.array_equal(np.isfinite(ref), np.isfinite(out))
    np.testing.assert_allclose(out[both], ref[both], atol=5e-5)


def test_sharded_flag_gating(small_pair, mesh8):
    """do_lr_check=False and do_discontinuity_adjustment=True must behave
    identically sharded and unsharded (the sharded path used to ignore
    both flags)."""
    from adcensus_tpu.config import ADCensusOptions

    opts = ADCensusOptions(
        min_disparity=0,
        max_disparity=16,
        cross_L1=8,
        cross_L2=4,
        do_lr_check=False,
        do_discontinuity_adjustment=True,
    )
    left, right = small_pair
    ref, out = _run_both(left, right, opts, mesh8)
    assert np.array_equal(np.isfinite(ref), np.isfinite(out))
    both = np.isfinite(ref) & np.isfinite(out)
    np.testing.assert_allclose(out[both], ref[both], atol=5e-5)
