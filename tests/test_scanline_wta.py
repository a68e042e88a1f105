"""Golden tests: scanline optimization and WTA vs the oracle."""
import jax
import numpy as np

from adcensus_tpu.stages import scanline as scan_stage
from adcensus_tpu.stages import wta as wta_stage


def _dhw(v):
    return np.ascontiguousarray(np.transpose(v, (2, 0, 1)))


def _hwd(v):
    return np.transpose(np.array(v), (1, 2, 0))


def test_scanline_single_pass_jnp(small_pair, small_opts, oracle_result):
    from adcensus_tpu.oracle import numpy_ref

    left, right = small_pair
    vol = _dhw(oracle_result["cost_aggr"])
    for axis, fwd in [("x", True), ("x", False), ("y", True), ("y", False)]:
        ref = numpy_ref._scanline_pass(
            oracle_result["cost_aggr"], left, right, small_opts, axis, fwd
        )
        out = _hwd(
            scan_stage.scanline_pass(
                vol, left, right, small_opts, axis, fwd, use_pallas=False
            )
        )
        np.testing.assert_allclose(out, ref, atol=1e-5, err_msg=f"{axis} {fwd}")


def test_scanline_single_pass_pallas_interpret(
    small_pair, small_opts, oracle_result
):
    from adcensus_tpu.oracle import numpy_ref

    left, right = small_pair
    vol = _dhw(oracle_result["cost_aggr"])
    for axis, fwd in [("x", True), ("y", False)]:
        ref = numpy_ref._scanline_pass(
            oracle_result["cost_aggr"], left, right, small_opts, axis, fwd
        )
        out = _hwd(
            scan_stage.scanline_pass(
                vol, left, right, small_opts, axis, fwd, use_pallas=True
            )
        )
        np.testing.assert_allclose(out, ref, atol=1e-5, err_msg=f"{axis} {fwd}")


def test_scanline_full(small_pair, small_opts, oracle_result):
    left, right = small_pair
    out = _hwd(
        scan_stage.scanline_optimize(
            _dhw(oracle_result["cost_aggr"]),
            left,
            right,
            small_opts,
            use_pallas=False,
        )
    )
    np.testing.assert_allclose(out, oracle_result["cost_scan"], atol=1e-5)


def test_scanline_lane_pad_exact(small_pair, small_opts, oracle_result):
    """W lane pre-padding (scanline_optimize(lane_pad=True)) is bitwise
    identical to the unpadded program: pad scan steps are FLAG_PAD
    (carry pass-through), pad lanes are independent DP paths sliced off,
    and the sticky-d2 boundary uses the real width (real_w)."""
    left, right = small_pair
    vol = _dhw(oracle_result["cost_aggr"])
    base = np.array(
        scan_stage.scanline_optimize(
            vol, left, right, small_opts, use_pallas=True, lane_pad=False
        )
    )
    padded = np.array(
        scan_stage.scanline_optimize(
            vol, left, right, small_opts, use_pallas=True, lane_pad=True
        )
    )
    np.testing.assert_array_equal(padded, base)


def test_wta_left(small_opts, oracle_result):
    vol = _dhw(oracle_result["cost_scan"])
    out = np.array(wta_stage.wta_left(vol, small_opts))
    ref = oracle_result["disp_left_raw"]
    assert np.array_equal(np.isfinite(out), np.isfinite(ref))
    m = np.isfinite(ref)
    np.testing.assert_allclose(out[m], ref[m], atol=1e-4)


def test_wta_right(small_opts, oracle_result):
    vol = _dhw(oracle_result["cost_scan"])
    out = np.array(wta_stage.wta_right(vol, small_opts))
    ref = oracle_result["disp_right_raw"]
    assert np.array_equal(np.isfinite(out), np.isfinite(ref))
    m = np.isfinite(ref)
    np.testing.assert_allclose(out[m], ref[m], atol=1e-4)
