"""Golden tests: refinement steps and the full pipeline vs the oracle."""
import numpy as np

from adcensus_tpu.eval.metrics import disparity_agreement
from adcensus_tpu.oracle import numpy_ref
from adcensus_tpu.stages import refine as refine_stage


def _dhw(v):
    return np.ascontiguousarray(np.transpose(v, (2, 0, 1)))


def test_outlier_detection_exact(small_opts, oracle_result):
    ref_disp, ref_occl, ref_mism = numpy_ref.outlier_detection(
        oracle_result["disp_left_raw"],
        oracle_result["disp_right_raw"],
        small_opts,
    )
    disp, occl, mism = refine_stage.outlier_detection(
        oracle_result["disp_left_raw"],
        oracle_result["disp_right_raw"],
        small_opts,
    )
    disp, occl, mism = np.array(disp), np.array(occl), np.array(mism)
    assert np.array_equal(np.isfinite(disp), np.isfinite(ref_disp))
    m = np.isfinite(ref_disp)
    np.testing.assert_array_equal(disp[m], ref_disp[m])
    occl_ref = np.zeros(disp.shape, bool)
    for (x, y) in ref_occl:
        occl_ref[y, x] = True
    mism_ref = np.zeros(disp.shape, bool)
    for (x, y) in ref_mism:
        mism_ref[y, x] = True
    assert np.array_equal(occl, occl_ref)
    assert np.array_equal(mism, mism_ref)


def test_region_voting_close(small_opts, oracle_result):
    """Dense voting vs the reference's list-ordered fills: the fill sets
    may differ slightly at pixels whose histograms depend on same-phase
    fills; require near-complete agreement."""
    arms = oracle_result["arms"].astype(np.int32)
    disp0 = oracle_result["after_lr_check"]
    # oracle voting needs the lists; rebuild them
    _, occl, mism = numpy_ref.outlier_detection(
        oracle_result["disp_left_raw"],
        oracle_result["disp_right_raw"],
        small_opts,
    )
    occl_m = np.zeros(disp0.shape, bool)
    mism_m = np.zeros(disp0.shape, bool)
    for (x, y) in occl:
        occl_m[y, x] = True
    for (x, y) in mism:
        mism_m[y, x] = True
    ref = numpy_ref.iterative_region_voting(
        disp0, arms, occl, mism, small_opts
    )
    out = np.array(
        refine_stage.iterative_region_voting(
            disp0, arms, occl_m, mism_m, small_opts
        )
    )
    # the dense formulation cannot see same-phase sequential fills; on this
    # deliberately hard crop (mostly-invalid map) ~2% of pixels resolve
    # differently — the end-to-end gate is bad-2.0 on the full pairs
    agree = disparity_agreement(out, ref)
    assert agree["validity_agreement"] > 0.95
    assert agree["value_agreement"] > 0.95


def test_median_outofplace_exact(oracle_result):
    """The dense median must match a straight out-of-place NumPy median
    bitwise (border-clipped windows, +inf sorts last)."""
    src = oracle_result["after_interpolation"]
    h, w = src.shape
    ref = np.empty_like(src)
    for y in range(h):
        for x in range(w):
            vals = [
                src[yy, xx]
                for yy in range(max(0, y - 1), min(h, y + 2))
                for xx in range(max(0, x - 1), min(w, x + 2))
            ]
            vals.sort()
            ref[y, x] = vals[len(vals) // 2]
    out = np.array(refine_stage.median_filter_3x3(src))
    np.testing.assert_array_equal(out, ref)


def test_median_inplace_exact(oracle_result):
    """The sheared-wavefront in-place median == the oracle's raster-order
    in-place median BITWISE (the reference calls MedianFilter with
    in == out, adcensus_util.cpp:55-81 at multistep_refiner.cpp:86)."""
    src = oracle_result["after_interpolation"]
    ref = numpy_ref.median_filter_inplace(src.copy(), 3)
    out = np.array(refine_stage.median_filter_3x3_inplace(src))
    m = np.isfinite(ref)
    assert np.array_equal(np.isfinite(out), m)
    np.testing.assert_array_equal(out[m], ref[m])


def test_median_inplace_exact_random():
    """Random maps with invalid (inf) pixels, several odd shapes."""
    rng = np.random.default_rng(7)
    for h, w in [(9, 11), (24, 17), (33, 64)]:
        src = rng.uniform(0, 60, (h, w)).astype(np.float32)
        src[rng.random((h, w)) < 0.15] = np.inf
        ref = numpy_ref.median_filter_inplace(src.copy(), 3)
        out = np.array(refine_stage.median_filter_3x3_inplace(src))
        m = np.isfinite(ref)
        assert np.array_equal(np.isfinite(out), m), (h, w)
        np.testing.assert_array_equal(out[m], ref[m])


def test_shear_roundtrip():
    """_shear/_unshear are exact inverses on the in-image region (the
    pitch-trick reshape shear used by the wavefront median)."""
    import jax.numpy as jnp

    from adcensus_tpu.stages.refine import _shear, _unshear

    rng = np.random.default_rng(3)
    for h, w in [(5, 7), (17, 33), (36, 52)]:
        a = rng.uniform(0, 9, (h, w)).astype(np.float32)
        t_cols = w + 2 * h
        s = np.array(_shear(jnp.asarray(a), t_cols, np.inf))
        # definition: S[y, t] = a[y, t - 2y], inf outside
        for y in range(h):
            np.testing.assert_array_equal(
                s[y, 2 * y : 2 * y + w], a[y]
            )
            assert np.all(np.isinf(s[y, : 2 * y]))
            assert np.all(np.isinf(s[y, 2 * y + w :]))
        back = np.array(_unshear(jnp.asarray(s), w, np.inf))
        np.testing.assert_array_equal(back, a)


def test_median_inplace_mask_matches_unmasked():
    """With an all-true in_image mask the masked variant equals the
    static-counts variant (the sharded tail passes gathered masks)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    src = rng.uniform(0, 30, (21, 34)).astype(np.float32)
    src[rng.random((21, 34)) < 0.1] = np.inf
    a = np.array(refine_stage.median_filter_3x3_inplace(src))
    b = np.array(
        refine_stage.median_filter_3x3_inplace(
            src, jnp.ones((21, 34), bool)
        )
    )
    m = np.isfinite(a)
    assert np.array_equal(np.isfinite(b), m)
    np.testing.assert_array_equal(a[m], b[m])


def test_median_close_to_inplace_reference(oracle_result):
    """Deviation from the reference's in-place (raster-order-dependent)
    median is bounded: all diffs <= 2.0, ~99% within 0.5."""
    src = oracle_result["after_interpolation"]
    ref = numpy_ref.median_filter_inplace(src, 3)
    out = np.array(refine_stage.median_filter_3x3(src))
    m = np.isfinite(ref) & np.isfinite(out)
    d = np.abs(out[m] - ref[m])
    assert d.max() <= 2.0
    assert (d <= 0.5).mean() > 0.98


def test_full_refine_close(small_pair, small_opts, oracle_result):
    left, _ = small_pair
    refined = refine_stage.multistep_refine(
        oracle_result["disp_left_raw"],
        oracle_result["disp_right_raw"],
        left,
        _dhw(oracle_result["cost_scan"]),
        oracle_result["arms"].astype(np.int32),
        small_opts,
    )
    out = np.array(refined["final"])
    ref = oracle_result["final"]
    assert (np.isfinite(out) == np.isfinite(ref)).mean() > 0.97
    m = np.isfinite(ref) & np.isfinite(out)
    d = np.abs(out[m] - ref[m])
    # dense refinement deviates from the sequential reference only at
    # fill/median boundary pixels, and then by small magnitudes
    assert (d <= 0.5).mean() > 0.95
    assert (d <= 2.0).mean() > 0.99


def test_dda_exact_vs_oracle(small_opts, oracle_result):
    """Depth-discontinuity adjustment vs the oracle's sequential loop —
    bitwise, including the in-place x-propagation (updated left
    neighbors chain rightward through consecutive edge pixels)."""
    disp = oracle_result["after_interpolation"].copy()
    cost = oracle_result["cost_scan"]  # (H, W, D)
    out = np.array(
        refine_stage.depth_discontinuity_adjustment(
            disp, _dhw(cost), small_opts
        )
    )
    ref = numpy_ref.depth_discontinuity_adjustment(disp, cost, small_opts)
    m = np.isfinite(ref)
    assert np.array_equal(np.isfinite(out), m)
    np.testing.assert_array_equal(out[m], ref[m])


def test_dda_inplace_chain_propagates():
    """A synthetic row of consecutive edge pixels where each neighbor's
    cost strictly decreases leftward: the reference's in-place scan
    propagates the leftmost disparity across the whole chain — a dense
    (pre-update-read) formulation would only move it one pixel."""
    from adcensus_tpu.config import ADCensusOptions

    h, w, d_range = 5, 10, 8
    opts = ADCensusOptions(min_disparity=0, max_disparity=d_range)
    disp = np.zeros((h, w), np.float32)
    # center row: a staircase that trips the Sobel threshold everywhere
    disp[2] = np.array([7, 0, 5, 6, 7, 6, 5, 6, 7, 0], np.float32)
    cost = np.full((h, w, d_range), 9.0, np.float32)
    for x in range(w):
        # each pixel's own-disparity cost decreases leftward
        cost[2, x, int(disp[2, x])] = float(x)
    out = np.array(
        refine_stage.depth_discontinuity_adjustment(
            disp, np.transpose(cost, (2, 0, 1)), opts
        )
    )
    ref = numpy_ref.depth_discontinuity_adjustment(disp, cost, opts)
    np.testing.assert_array_equal(out, ref)
    # the chain really propagated: some pixel > 1 step from the source
    # took the propagated value
    assert not np.array_equal(ref[2], disp[2])


def test_region_vote_kernel_matches_jnp(small_opts, oracle_result):
    """Pallas voting-stats kernel (interpret mode on CPU) == the one-hot
    jnp mirror, including first-maximum tie-breaks and empty regions."""
    import jax.numpy as jnp

    from adcensus_tpu.config import MAX_ARM_LENGTH
    from adcensus_tpu.ops.basic import lround
    from adcensus_tpu.ops.region_vote_pallas import region_vote_stats

    arms = jnp.asarray(oracle_result["arms"].astype(np.int32))
    disp = jnp.asarray(oracle_result["after_lr_check"])
    d_range = small_opts.disp_range
    valid = jnp.isfinite(disp)
    di = jnp.clip(
        lround(jnp.where(valid, disp, 0.0)) - small_opts.min_disparity,
        0,
        d_range - 1,
    ).astype(jnp.int32)
    max_arm = min(small_opts.cross_L1, MAX_ARM_LENGTH)
    ref = region_vote_stats(di, valid, arms, d_range, max_arm,
                            use_pallas=False)
    out = region_vote_stats(di, valid, arms, d_range, max_arm,
                            use_pallas=True)  # interpret mode on CPU
    for a, b, name in zip(out, ref, ("best", "max_ht", "count")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), name)


def test_ray_interp_kernel_matches_xla(small_pair, small_opts, oracle_result):
    """Pallas ray-march kernel (interpret mode) == the XLA slice-scan
    path for both phases, including first-minimum ray tie-breaks."""
    import jax.numpy as jnp

    left, _ = small_pair
    disp = jnp.asarray(oracle_result["after_voting"])
    for is_mismatch in (True, False):
        ref = np.asarray(
            refine_stage.interpolation_fills(
                disp, jnp.asarray(left), small_opts, is_mismatch,
                use_pallas=False,
            )
        )
        out = np.asarray(
            refine_stage.interpolation_fills(
                disp, jnp.asarray(left), small_opts, is_mismatch,
                use_pallas=True,
            )
        )
        np.testing.assert_array_equal(out, ref)


def test_ray_interp_coord_mode_matches_xla(
    small_pair, small_opts, oracle_result, monkeypatch
):
    """Coordinate mode (margin-only buffers + rectangle masks, the
    Piano-256 VMEM strategy) == the XLA path bitwise. Forced by failing
    the padded-mode VMEM check."""
    import jax.numpy as jnp

    from adcensus_tpu.ops import interp_pallas

    monkeypatch.setattr(
        interp_pallas, "ray_interp_fits_vmem", lambda *a: False
    )
    left, _ = small_pair
    disp = jnp.asarray(oracle_result["after_voting"])
    for is_mismatch in (True, False):
        ref = np.asarray(
            refine_stage.interpolation_fills(
                disp, jnp.asarray(left), small_opts, is_mismatch,
                use_pallas=False,
            )
        )
        out = np.asarray(
            refine_stage.interpolation_fills(
                disp, jnp.asarray(left), small_opts, is_mismatch,
                use_pallas=True,
            )
        )
        np.testing.assert_array_equal(out, ref)


def test_ray_interp_row_chunked_matches_xla(
    small_pair, small_opts, oracle_result, monkeypatch
):
    """Row-chunked kernel driving (VMEM state scales with the chunk, so
    large pairs run the kernel in slabs incl. an overlapped final
    chunk) == the XLA path bitwise. Forced via a tiny chunk size."""
    import jax.numpy as jnp

    from adcensus_tpu.ops import interp_pallas

    monkeypatch.setattr(
        interp_pallas, "pick_row_chunk", lambda fits, r, min_chunk=32: 16
    )
    left, _ = small_pair
    disp = jnp.asarray(oracle_result["after_voting"])
    assert disp.shape[0] == 36  # 3 chunks of 16 with an overlapped tail
    for is_mismatch in (True, False):
        ref = np.asarray(
            refine_stage.interpolation_fills(
                disp, jnp.asarray(left), small_opts, is_mismatch,
                use_pallas=False,
            )
        )
        out = np.asarray(
            refine_stage.interpolation_fills(
                disp, jnp.asarray(left), small_opts, is_mismatch,
                use_pallas=True,
            )
        )
        np.testing.assert_array_equal(out, ref)


def test_ray_interp_target_seeding(small_pair, small_opts, oracle_result):
    """With a target mask, both backends' fills agree with the full-map
    search at every target pixel (non-targets are don't-care)."""
    import jax.numpy as jnp

    left, _ = small_pair
    disp = jnp.asarray(oracle_result["after_voting"])
    target = ~jnp.isfinite(disp)
    assert bool(target.any())
    for is_mismatch in (True, False):
        full = np.asarray(
            refine_stage.interpolation_fills(
                disp, jnp.asarray(left), small_opts, is_mismatch,
                use_pallas=False,
            )
        )
        t = np.asarray(target)
        for up in (False, True):
            out = np.asarray(
                refine_stage.interpolation_fills(
                    disp, jnp.asarray(left), small_opts, is_mismatch,
                    use_pallas=up, target=target,
                )
            )
            np.testing.assert_array_equal(out[t], full[t])


def test_ray_interp_early_exit_chunks(monkeypatch):
    """The kernel's chunked early-exit march (K=16 steps per chunk,
    liveness = "target not hit AND its ray still in-image") is bitwise
    equal to the XLA path across its exit modes: a D=48 range (3
    chunks) with (a) all targets hitting in step 1 (exit after chunk
    1), (b) a lone target deep in an invalid region (multi-chunk
    march), (c) a border target whose rays exit the image (structural
    liveness must terminate despite no hit), and (d) no targets at all
    (the loop must not run). Both VMEM strategies are exercised."""
    import jax.numpy as jnp

    from adcensus_tpu.config import ADCensusOptions
    from adcensus_tpu.ops import interp_pallas

    rng = np.random.default_rng(7)
    h, w = 40, 64
    opts = ADCensusOptions(min_disparity=0, max_disparity=48)
    left = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)

    base = rng.uniform(0.0, 47.0, (h, w)).astype(np.float32)

    def run_case(disp_np, target_np, coord_mode):
        disp = jnp.asarray(disp_np)
        target = jnp.asarray(target_np)
        if coord_mode:
            monkeypatch.setattr(
                interp_pallas, "ray_interp_fits_vmem", lambda *a: False
            )
        for is_mismatch in (True, False):
            ref = np.asarray(
                refine_stage.interpolation_fills(
                    disp, jnp.asarray(left), opts, is_mismatch,
                    use_pallas=False, target=target,
                )
            )
            out = np.asarray(
                refine_stage.interpolation_fills(
                    disp, jnp.asarray(left), opts, is_mismatch,
                    use_pallas=True, target=target,
                )
            )
            t = np.asarray(target)
            np.testing.assert_array_equal(out[t], ref[t])
        monkeypatch.undo()

    inf = np.float32(np.inf)
    for coord_mode in (False, True):
        # (a) every target is adjacent to valid pixels: all hit step 1
        d_a = base.copy()
        d_a[10:14, 20:24] = inf
        run_case(d_a, ~np.isfinite(d_a), coord_mode)
        # (b) lone target centered in a large invalid disc: the march
        # needs several chunks to reach the valid rim
        d_b = base.copy()
        d_b[2:38, 12:52] = inf
        tgt_b = np.zeros((h, w), bool)
        tgt_b[20, 32] = True
        run_case(d_b, tgt_b, coord_mode)
        # (c) corner target, everything invalid: every ray exits the
        # image without a hit — liveness must still terminate (a hang
        # here would be a kernel bug; equality checks the 0.0 fills)
        d_c = np.full((h, w), inf, np.float32)
        tgt_c = np.zeros((h, w), bool)
        tgt_c[0, 0] = True
        run_case(d_c, tgt_c, coord_mode)
        # (d) no targets at all: the loop must not run
        run_case(base.copy(), np.zeros((h, w), bool), coord_mode)
