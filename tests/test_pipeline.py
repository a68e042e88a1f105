"""End-to-end pipeline vs the exact NumPy oracle, plus batching/entry
wiring. match_core runs *eagerly* here (op-by-op) — jitting the full
graph is exercised on TPU by bench.py and by the driver's compile check;
an XLA-CPU compile of the whole pipeline is needlessly slow for CI."""
import jax.numpy as jnp
import numpy as np

from adcensus_tpu.eval.metrics import disparity_agreement
from adcensus_tpu.stages import cost as cost_stage
from adcensus_tpu.stages.pipeline import match_core


def _run_core(left, right, opts, **kw):
    gray_l = cost_stage.compute_gray_host64(left)
    gray_r = cost_stage.compute_gray_host64(right)
    return match_core(
        jnp.asarray(left),
        jnp.asarray(right),
        jnp.asarray(gray_l),
        jnp.asarray(gray_r),
        opts,
        **kw,
    )


def test_match_end_to_end_close(small_pair, small_opts, oracle_result):
    """Full pipeline final disparity vs the oracle: identical up to the
    documented dense-vs-sequential refinement differences."""
    left, right = small_pair
    out = np.asarray(_run_core(left, right, small_opts)["disparity"])
    ref = oracle_result["disparity"]
    assert (np.isfinite(out) == np.isfinite(ref)).mean() > 0.95
    m = np.isfinite(ref) & np.isfinite(out)
    d = np.abs(out[m] - ref[m])
    # stage-level float-order differences + dense-vs-sequential fills
    # compound end-to-end; bound them like test_full_refine_close
    assert (d <= 0.5).mean() > 0.93
    assert (d <= 2.0).mean() > 0.97


def test_match_intermediates_shapes(small_pair, small_opts):
    left, right = small_pair
    h, w, _ = left.shape
    d = small_opts.disp_range
    res = _run_core(
        left, right, small_opts, return_intermediates=True
    )
    assert res["cost_init"].shape == (d, h, w)
    assert res["cost_aggr"].shape == (d, h, w)
    assert res["cost_scan"].shape == (d, h, w)
    assert res["disparity"].shape == (h, w)


def test_graft_entry_shapes():
    """The driver contract: entry() returns (fn, args) and fn runs."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = fn(*args)  # eager run, no jit: just the wiring
    assert out.shape == args[0].shape[:2]
    assert bool(jnp.isfinite(out).any())


import pytest


def test_match_rejects_bad_inputs(small_pair, small_opts):
    """Fail-fast guards mirroring ADCensusStereo.cpp:71-76 /
    main.cpp:36-57: mismatched shapes, wrong dtype, wrong rank, and an
    empty disparity range all raise before any device work."""
    from adcensus_tpu.config import ADCensusOptions
    from adcensus_tpu.stages.pipeline import match

    left, right = small_pair
    with pytest.raises(ValueError, match="shapes differ"):
        match(left, right[:-2], small_opts)
    with pytest.raises(TypeError, match="uint8"):
        match(left.astype(np.float32), right.astype(np.float32),
              small_opts)
    with pytest.raises(ValueError, match=r"\(H, W, 3\)"):
        match(left[..., 0], right[..., 0], small_opts)
    with pytest.raises(ValueError, match="must exceed"):
        match(left, right, ADCensusOptions(min_disparity=8,
                                           max_disparity=8))


def test_hetero_batch_matches_per_pair(small_pair):
    """match_hetero_device: two pairs of DIFFERENT shapes and disparity
    ranges in one jitted dispatch (BASELINE config 3's mixed Wood2+Cone
    stream, scaled down) — each output equals its own single-pair
    dispatch."""
    from adcensus_tpu.config import ADCensusOptions
    from adcensus_tpu.stages.pipeline import match_device, match_hetero_device

    left, right = small_pair
    a = (jnp.asarray(left), jnp.asarray(right))
    b = (
        jnp.asarray(np.ascontiguousarray(left[:28, :44])),
        jnp.asarray(np.ascontiguousarray(right[:28, :44])),
    )
    opts_a = ADCensusOptions(min_disparity=0, max_disparity=16)
    opts_b = ADCensusOptions(min_disparity=0, max_disparity=8)
    out_a, out_b = match_hetero_device((a, b), (opts_a, opts_b))
    for out, (l, r), o in ((out_a, a, opts_a), (out_b, b, opts_b)):
        ref = np.asarray(match_device(l, r, o))
        got = np.asarray(out)
        assert got.shape == ref.shape
        assert np.array_equal(np.isfinite(got), np.isfinite(ref))
        m = np.isfinite(ref)
        # same program per pair; tolerate fusion-order float wiggle
        assert np.abs(got[m] - ref[m]).max() <= 1e-3


@pytest.mark.parametrize("dmin,dmax", [(2, 14), (-4, 8)])
def test_nonzero_min_disparity_matches_oracle(small_pair, dmin, dmax):
    """min_disparity != 0 (including negative, for verged rigs) exercises
    the d-offset handling in the right volume, penalty codes, voting and
    interpolation (the reference takes the range from the CLI,
    main.cpp:82-83)."""
    from adcensus_tpu.config import ADCensusOptions
    from adcensus_tpu.oracle import numpy_ref

    left, right = small_pair
    opts = ADCensusOptions(min_disparity=dmin, max_disparity=dmax)
    ref = numpy_ref.match(left, right, opts)["disparity"]
    out = np.asarray(_run_core(left, right, opts)["disparity"])
    assert (np.isfinite(out) == np.isfinite(ref)).mean() > 0.95
    m = np.isfinite(ref) & np.isfinite(out)
    d = np.abs(out[m] - ref[m])
    assert (d <= 0.5).mean() > 0.93
    assert (d <= 2.0).mean() > 0.97


def test_batched_grouped_unroll_matches_single(small_pair):
    """match_batched_device: B=4 stack with group=2 exercises the
    lax.map-over-statically-unrolled-groups path (reshape to
    (B//g, g, ...) and back); every output equals the single-pair
    dispatch. group=None on these tiny shapes resolves to full unroll
    (g == B), covered by the same check."""
    from adcensus_tpu.config import ADCensusOptions
    from adcensus_tpu.stages.pipeline import (
        _batch_group_size, match_batched_device, match_device,
    )

    left, right = small_pair
    opts = ADCensusOptions(min_disparity=0, max_disparity=8)
    h, w, _ = left.shape
    # tiny pairs fit any budget -> auto group is the whole batch
    assert _batch_group_size(4, h, w, opts) == 4
    # a Piano256-scale pair must split: 6x volume ~2.1 GB/pair
    assert _batch_group_size(8, 481, 707, ADCensusOptions(
        min_disparity=0, max_disparity=256)) == 4

    B = 4
    # distinct pairs per slot (flip/roll) so cross-pair DCE or slot
    # mix-ups cannot cancel out
    lefts = np.stack([left, left[::-1].copy(), right, right[::-1].copy()])
    rights = np.stack([right, right[::-1].copy(), left, left[::-1].copy()])
    out = np.asarray(
        match_batched_device(
            jnp.asarray(lefts), jnp.asarray(rights), opts, group=2
        )
    )
    assert out.shape == (B, h, w)
    for i in range(B):
        ref = np.asarray(
            match_device(jnp.asarray(lefts[i]), jnp.asarray(rights[i]), opts)
        )
        assert np.array_equal(np.isfinite(out[i]), np.isfinite(ref)), i
        m = np.isfinite(ref)
        assert np.abs(out[i][m] - ref[m]).max() <= 1e-3, i
