"""Golden tests: cross arms, support counts, and aggregation vs the oracle."""
import numpy as np

from adcensus_tpu.stages import aggregate as agg_stage
from adcensus_tpu.stages import arms as arms_stage


def test_arms_exact(small_pair, small_opts, oracle_result):
    left, _ = small_pair
    a_jax = np.array(arms_stage.build_arms(left, small_opts))
    assert np.array_equal(a_jax, oracle_result["arms"].astype(np.int32))


def test_support_counts_exact(small_opts, oracle_result):
    arms = oracle_result["arms"].astype(np.int32)
    sup_h, sup_v = agg_stage.support_counts(arms)
    assert np.array_equal(np.array(sup_h), oracle_result["sup_count_h"])
    assert np.array_equal(np.array(sup_v), oracle_result["sup_count_v"])


def test_aggregate_pallas_matches_jnp_ref(small_opts, oracle_result):
    """Pallas kernel (interpreter mode on CPU) == jnp mirror bitwise."""
    arms = oracle_result["arms"].astype(np.int32)
    cost_init = np.transpose(oracle_result["cost_init"], (2, 0, 1))
    out_p = np.array(
        agg_stage.aggregate(cost_init, arms, small_opts, use_pallas=True)
    )
    out_j = np.array(
        agg_stage.aggregate(cost_init, arms, small_opts, use_pallas=False)
    )
    np.testing.assert_array_equal(out_p, out_j)


def test_aggregate_matmul_close(small_opts, oracle_result, monkeypatch):
    """MXU band-matrix backend vs the bit-exact jnp mirror: the 2-term
    bfloat16 split bounds the per-pass error at ~2^-17 relative."""
    monkeypatch.setenv("ADC_AGG_IMPL", "xla")  # dense XLA band matmul
    arms = oracle_result["arms"].astype(np.int32)
    cost_init = np.transpose(oracle_result["cost_init"], (2, 0, 1))
    out_m = np.array(
        agg_stage.aggregate(
            cost_init, arms, small_opts, use_pallas="matmul"
        )
    )
    out_j = np.array(
        agg_stage.aggregate(cost_init, arms, small_opts, use_pallas=False)
    )
    np.testing.assert_allclose(out_m, out_j, atol=5e-4)


def test_aggregate_banded_kernel_close(small_opts, oracle_result,
                                       monkeypatch):
    """Blocked-band Pallas kernel (opt-in ADC_AGG_IMPL=banded,
    interpret mode on CPU) vs the bit-exact jnp mirror: same hi/lo
    bfloat16 split as the XLA band matmul, so the same tolerance must
    hold — including the padded rows/columns/d-planes staying
    contained (odd H/W, D not a lane multiple)."""
    monkeypatch.setenv("ADC_AGG_IMPL", "banded")
    arms = oracle_result["arms"].astype(np.int32)
    cost_init = np.transpose(oracle_result["cost_init"], (2, 0, 1))
    out_b = np.array(
        agg_stage.aggregate(
            cost_init, arms, small_opts, use_pallas="matmul"
        )
    )
    out_j = np.array(
        agg_stage.aggregate(cost_init, arms, small_opts, use_pallas=False)
    )
    assert out_b.shape == out_j.shape
    np.testing.assert_allclose(out_b, out_j, atol=5e-4)


def test_aggregate_banded_long_arms_and_shapes():
    """Blocked-band kernel at max_arm > 64 (PAD escalates to 128) and
    an odd (H, W, D) vs the exact mirror."""
    import jax.numpy as jnp

    from adcensus_tpu.ops.band_mm_pallas import (
        aggregate_banded,
        banded_fits,
    )
    from adcensus_tpu.ops.cross_sum_pallas import cross_pass_ref

    rng = np.random.default_rng(7)
    d, h, w = 12, 37, 141
    max_arm = 70
    vol = jnp.asarray(rng.random((d, h, w), dtype=np.float32) * 2.0)
    # random arms clipped to the border like the real builder
    yy = np.arange(h)[:, None] * np.ones((1, w), int)
    xx = np.arange(w)[None, :] * np.ones((h, 1), int)
    arms = np.stack(
        [
            np.minimum(rng.integers(0, max_arm + 1, (h, w)), xx),
            np.minimum(rng.integers(0, max_arm + 1, (h, w)), w - 1 - xx),
            np.minimum(rng.integers(0, max_arm + 1, (h, w)), yy),
            np.minimum(rng.integers(0, max_arm + 1, (h, w)), h - 1 - yy),
        ],
        axis=-1,
    ).astype(np.int32)
    assert banded_fits(d, h, w, max_arm)
    sup_h, sup_v = agg_stage.support_counts(arms, max_arm)
    out_b = np.array(
        aggregate_banded(
            vol, jnp.asarray(arms),
            sup_h.astype(jnp.float32), sup_v.astype(jnp.float32),
            max_arm, num_iters=2,
        )
    )
    ref = vol
    horizontal_first = True
    for _ in range(2):
        ref = cross_pass_ref(
            ref, jnp.asarray(arms),
            (sup_h if horizontal_first else sup_v).astype(jnp.float32),
            horizontal_first, max_arm,
        )
        horizontal_first = not horizontal_first
    np.testing.assert_allclose(out_b, np.array(ref), atol=5e-4, rtol=1e-4)


def test_cross_matmul_any_arm_length():
    """The matmul backend has no arm-length cap: random arms up to 130
    (past the roll kernels' 127 fallback) match the exact jnp mirror,
    and the voting statistics stay bit-exact integers through the
    hi/lo bfloat16 split."""
    import jax.numpy as jnp

    from adcensus_tpu.ops.cross_matmul import (
        cross_pass_matmul,
        region_vote_stats_matmul,
    )
    from adcensus_tpu.ops.cross_sum_pallas import cross_pass_ref
    from adcensus_tpu.ops.region_vote_pallas import region_vote_stats

    rng = np.random.default_rng(3)
    h, w, d, max_arm = 40, 55, 12, 130
    arms = rng.integers(0, max_arm + 1, size=(h, w, 4)).astype(np.int32)
    ys, xs = np.arange(h)[:, None], np.arange(w)[None, :]
    arms[..., 0] = np.minimum(arms[..., 0], xs)
    arms[..., 1] = np.minimum(arms[..., 1], w - 1 - xs)
    arms[..., 2] = np.minimum(arms[..., 2], ys)
    arms[..., 3] = np.minimum(arms[..., 3], h - 1 - ys)
    vol = rng.uniform(0, 2, size=(d, h, w)).astype(np.float32)
    sup = np.ones((h, w), np.float32)
    for hf in (True, False):
        a = np.array(cross_pass_matmul(
            jnp.asarray(vol), jnp.asarray(arms), jnp.asarray(sup),
            hf, max_arm, normalize=False,
        ))
        b = np.array(cross_pass_ref(
            jnp.asarray(vol), jnp.asarray(arms), jnp.asarray(sup),
            hf, max_arm, normalize=False,
        ))
        np.testing.assert_allclose(a, b, rtol=5e-5, atol=5e-2)

    di = rng.integers(0, d, size=(h, w)).astype(np.int32)
    valid = rng.random((h, w)) > 0.3
    got = region_vote_stats_matmul(
        jnp.asarray(di), jnp.asarray(valid), jnp.asarray(arms), d, max_arm
    )
    want = region_vote_stats(
        jnp.asarray(di), jnp.asarray(valid), jnp.asarray(arms), d,
        max_arm, use_pallas=False,
    )
    for g, wv in zip(got, want):
        np.testing.assert_array_equal(np.array(g), np.array(wv))


def test_region_vote_matmul_int8_branch():
    """The int8 MXU branch (max_arm <= 63, the production TPU path for
    the default cross_L1=34) matches the exact jnp mirror bitwise — the
    int8/int16 accumulators must not overflow at the worst case (full
    127-wide rows of a single disparity)."""
    import jax.numpy as jnp

    from adcensus_tpu.ops.cross_matmul import region_vote_stats_matmul
    from adcensus_tpu.ops.region_vote_pallas import region_vote_stats

    rng = np.random.default_rng(7)
    h, w, d, max_arm = 140, 150, 9, 63
    arms = np.full((h, w, 4), max_arm, np.int32)  # worst-case counts
    arms[h // 2 :] = rng.integers(0, max_arm + 1, size=(h - h // 2, w, 4))
    ys, xs = np.arange(h)[:, None], np.arange(w)[None, :]
    arms[..., 0] = np.minimum(arms[..., 0], xs)
    arms[..., 1] = np.minimum(arms[..., 1], w - 1 - xs)
    arms[..., 2] = np.minimum(arms[..., 2], ys)
    arms[..., 3] = np.minimum(arms[..., 3], h - 1 - ys)
    # constant disparity in the top half maximizes per-row one-hot
    # counts (127) and region counts (127*127 < 2^15)
    di = np.zeros((h, w), np.int32)
    di[h // 2 :] = rng.integers(0, d, size=(h - h // 2, w))
    valid = np.ones((h, w), bool)
    valid[h // 2 :] = rng.random((h - h // 2, w)) > 0.3
    got = region_vote_stats_matmul(
        jnp.asarray(di), jnp.asarray(valid), jnp.asarray(arms), d, max_arm
    )
    want = region_vote_stats(
        jnp.asarray(di), jnp.asarray(valid), jnp.asarray(arms), d,
        max_arm, use_pallas=False,
    )
    for g, wv in zip(got, want):
        np.testing.assert_array_equal(np.array(g), np.array(wv))


def test_aggregate_near_exact(small_opts, oracle_result):
    """Both backends accumulate in the reference's sequential order; the
    only deviation is XLA keeping excess precision in the add chain
    (<= 1 ulp after 4 iterations)."""
    arms = oracle_result["arms"].astype(np.int32)
    cost_init = np.transpose(oracle_result["cost_init"], (2, 0, 1))
    out = np.array(
        agg_stage.aggregate(cost_init, arms, small_opts, use_pallas=False)
    )
    out = np.transpose(out, (1, 2, 0))
    np.testing.assert_allclose(out, oracle_result["cost_aggr"], atol=1e-6)
