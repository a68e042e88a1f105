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
