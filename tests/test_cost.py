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
