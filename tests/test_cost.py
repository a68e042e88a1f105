"""Golden tests: cost-init stage vs the exact NumPy oracle."""
import numpy as np

from adcensus_tpu.oracle import numpy_ref
from adcensus_tpu.stages import cost as cost_stage
from adcensus_tpu.stages.cost import census_packed_to_u64


def test_gray_close(small_pair):
    left, _ = small_pair
    g_jax = np.array(cost_stage.compute_gray(left))
    g_ref = numpy_ref.compute_gray(left)
    diff = np.abs(g_jax.astype(int) - g_ref.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3


def test_gray_host64_exact(small_pair):
    left, _ = small_pair
    assert np.array_equal(
        cost_stage.compute_gray_host64(left), numpy_ref.compute_gray(left)
    )


def test_census_exact(small_pair):
    left, _ = small_pair
    gray = numpy_ref.compute_gray(left)
    c_jax = census_packed_to_u64(
        np.array(cost_stage.census_transform_9x7(gray))
    )
    c_ref = numpy_ref.census_transform_9x7(gray)
    assert np.array_equal(c_jax, c_ref)


def test_census_small_image_zero():
    gray = np.arange(9 * 7, dtype=np.uint8).reshape(7, 9)
    out = np.array(cost_stage.census_transform_9x7(gray))
    assert (out == 0).all()


def test_cost_volume(small_pair, small_opts):
    left, right = small_pair
    gray_l = numpy_ref.compute_gray(left)
    gray_r = numpy_ref.compute_gray(right)
    cen_l = numpy_ref.census_transform_9x7(gray_l)
    cen_r = numpy_ref.census_transform_9x7(gray_r)
    ref = numpy_ref.compute_cost(left, right, cen_l, cen_r, small_opts)

    c_jax = np.array(
        cost_stage.compute_cost_volume(
            left,
            right,
            cost_stage.census_transform_9x7(gray_l),
            cost_stage.census_transform_9x7(gray_r),
            small_opts,
        )
    )
    # (D, H, W) -> (H, W, D)
    c_jax = np.transpose(c_jax, (1, 2, 0))
    assert c_jax.shape == ref.shape
    # f32 exp on device vs double exp in the reference: ~1e-5 relative
    np.testing.assert_allclose(c_jax, ref, atol=1e-5)


def test_rolled_builders_bitwise_equal_unrolled(small_pair, small_opts):
    """The lax.map/fori_loop builder variants (CPU compile-time path)
    match the unrolled static-shift forms: bitwise for the integer
    builders (arms, penalty code); cost planes to ~1 ulp (XLA emits a
    different exp codegen inside a loop body than in a straight-line
    graph — measured max diff ~1e-7). Includes a negative min_disparity
    range."""
    import dataclasses

    import jax.numpy as jnp

    from adcensus_tpu.stages import arms as arms_stage
    from adcensus_tpu.stages import scanline as scan_stage

    left, right = small_pair
    gray_l = cost_stage.compute_gray_host64(left)
    gray_r = cost_stage.compute_gray_host64(right)
    for opts in (
        small_opts,
        dataclasses.replace(small_opts, min_disparity=-4, max_disparity=12),
    ):
        cl = cost_stage.census_transform_9x7(jnp.asarray(gray_l))
        cr = cost_stage.census_transform_9x7(jnp.asarray(gray_r))
        v_u = cost_stage.compute_cost_volume(
            left, right, cl, cr, opts, rolled=False
        )
        v_r = cost_stage.compute_cost_volume(
            left, right, cl, cr, opts, rolled=True
        )
        np.testing.assert_allclose(
            np.array(v_u), np.array(v_r), atol=1e-6
        )
        p_u = cost_stage.compute_cost_planes(
            left, right, cl, cr, opts, 3, 5, rolled=False
        )
        p_r = cost_stage.compute_cost_planes(
            left, right, cl, cr, opts, 3, 5, rolled=True
        )
        np.testing.assert_allclose(
            np.array(p_u), np.array(p_r), atol=1e-6
        )
        a_u = arms_stage.build_arms(jnp.asarray(left), opts, rolled=False)
        a_r = arms_stage.build_arms(jnp.asarray(left), opts, rolled=True)
        np.testing.assert_array_equal(np.array(a_u), np.array(a_r))
        for axis in ("x", "y"):
            for fwd in (True, False):
                c_u = scan_stage.penalty_code(
                    jnp.asarray(left), jnp.asarray(right), opts, axis,
                    fwd, rolled=False,
                )
                c_r = scan_stage.penalty_code(
                    jnp.asarray(left), jnp.asarray(right), opts, axis,
                    fwd, rolled=True,
                )
                np.testing.assert_array_equal(np.array(c_u), np.array(c_r))


def test_resolve_use_pallas_strings():
    """"jnp" must DISABLE the kernels (it is the exact-mirror backend);
    unknown strings raise (ADVICE r2)."""
    import pytest

    from adcensus_tpu.ops.basic import resolve_use_pallas

    assert resolve_use_pallas("jnp") is False
    assert resolve_use_pallas("pallas") is True
    assert resolve_use_pallas(True) is True
    assert resolve_use_pallas(False) is False
    with pytest.raises(ValueError, match="unknown kernel backend"):
        resolve_use_pallas("bogus")
