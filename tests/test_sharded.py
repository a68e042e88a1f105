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


def _run_both(left, right, opts, mesh, **kw):
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
        opts, mesh, **kw,
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


def test_disp_sharded_equals_unsharded(small_pair, sharded_opts, mesh8):
    """volume_axis='disp': the cost volume is partitioned over d-plane
    blocks through init+aggregation (D=16 over 8 shards -> 2 planes
    each), then resharded to rows — must match the unsharded pipeline
    (SURVEY.md §7 hard part 3, the Piano-class memory configuration)."""
    left, right = small_pair
    ref, out = _run_both(
        left, right, sharded_opts, mesh8, volume_axis="disp"
    )
    assert np.array_equal(np.isfinite(ref), np.isfinite(out))
    both = np.isfinite(ref) & np.isfinite(out)
    np.testing.assert_allclose(out[both], ref[both], atol=5e-5)


def test_disp_sharded_rejects_indivisible(small_pair, mesh8):
    """disp_range not divisible by the mesh size fails fast."""
    from adcensus_tpu.config import ADCensusOptions

    left, right = small_pair
    opts = ADCensusOptions(min_disparity=0, max_disparity=12, cross_L1=8)
    with pytest.raises(ValueError, match="multiple of the mesh"):
        _run_both(left, right, opts, mesh8, volume_axis="disp")


def test_batched_sharded_equals_core(small_pair, sharded_opts):
    """match_sharded_batched over a (data=2, tile=4) mesh == match_core
    per pair (VERDICT r1 #4: the data axis must be equality-tested, not
    just dryrun-finite)."""
    from adcensus_tpu.parallel.sharded import match_sharded_batched

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=2, n_tile=4)
    left, right = small_pair
    # two distinct pairs: the original and a flipped-contrast variant
    l2 = np.ascontiguousarray(left[::-1])
    r2 = np.ascontiguousarray(right[::-1])
    lefts = np.stack([left, l2])
    rights = np.stack([right, r2])
    gls = np.stack(
        [cost_stage.compute_gray_host64(x) for x in (left, l2)]
    )
    grs = np.stack(
        [cost_stage.compute_gray_host64(x) for x in (right, r2)]
    )
    out = np.asarray(
        match_sharded_batched(
            jnp.asarray(lefts), jnp.asarray(rights),
            jnp.asarray(gls), jnp.asarray(grs),
            sharded_opts, mesh,
        )
    )
    for b in range(2):
        ref = np.asarray(
            match_core(
                jnp.asarray(lefts[b]), jnp.asarray(rights[b]),
                jnp.asarray(gls[b]), jnp.asarray(grs[b]),
                sharded_opts,
            )["disparity"]
        )
        assert np.array_equal(np.isfinite(ref), np.isfinite(out[b]))
        both = np.isfinite(ref) & np.isfinite(out[b])
        np.testing.assert_allclose(out[b][both], ref[both], atol=5e-5)


def test_sharded_full_size_cone(mesh8):
    """The full 450x375 D=64 Cone pair through the 8-way sharded
    pipeline == unsharded. Slowest test in the suite (~12 min, nearly
    all XLA CPU compile of the shard_map program) — down from a >50 min
    compile before the D-unrolled builders and the 69-step masked-roll
    chains grew rolled (lax.map / fori_loop) CPU variants (VERDICT r2
    #4); runs in the default suite since round 3."""
    from adcensus_tpu.config import ADCensusOptions
    from adcensus_tpu.io.image import get_pair

    pair = get_pair("Cone")
    left, right, _ = pair.load()
    opts = ADCensusOptions(
        min_disparity=pair.dmin, max_disparity=pair.dmax
    )
    ref, out = _run_both(left, right, opts, mesh8)
    assert np.array_equal(np.isfinite(ref), np.isfinite(out))
    both = np.isfinite(ref) & np.isfinite(out)
    np.testing.assert_allclose(out[both], ref[both], atol=5e-5)


def test_distributed_fail_fast_and_pod_mesh():
    """initialize() validates its arguments before touching
    jax.distributed (a bad pod config must raise, not hang the pod);
    pod_mesh covers every addressable device."""
    from adcensus_tpu.parallel import distributed

    with pytest.raises(ValueError, match="together"):
        distributed.initialize(num_processes=2)
    with pytest.raises(ValueError, match="out of range"):
        distributed.initialize(num_processes=2, process_id=2)
    with pytest.raises(ValueError, match="must be > 0"):
        distributed.initialize(num_processes=0, process_id=0)
    with pytest.raises(ValueError, match="coordinator"):
        distributed.initialize(num_processes=2, process_id=0)
    m = distributed.pod_mesh()
    assert m.shape["data"] * m.shape["tile"] == len(jax.devices())


def test_sharded_flag_gating(small_pair, mesh8):
    """do_lr_check=False, do_discontinuity_adjustment=True and
    exact_median=True must behave identically sharded and unsharded
    (the sharded path used to ignore the first two; the in-place median
    is a global wavefront run on the all-gathered map)."""
    from adcensus_tpu.config import ADCensusOptions

    opts = ADCensusOptions(
        min_disparity=0,
        max_disparity=16,
        cross_L1=8,
        cross_L2=4,
        do_lr_check=False,
        do_discontinuity_adjustment=True,
        exact_median=True,
    )
    left, right = small_pair
    ref, out = _run_both(left, right, opts, mesh8)
    assert np.array_equal(np.isfinite(ref), np.isfinite(out))
    both = np.isfinite(ref) & np.isfinite(out)
    np.testing.assert_allclose(out[both], ref[both], atol=5e-5)
