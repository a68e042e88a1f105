"""MXU (matmul) backend for the cross-window operators.

The cross support-region sums (aggregation, cross_aggregator.cpp:327-394;
voting histograms, multistep_refiner.cpp:183-197) are variable-arm 1-D
windowed sums. The masked-roll Pallas kernels evaluate them in
O(2*max_arm+1) VPU steps per pixel; here the same sums are one batched
matmul against per-row/per-column 0/1 *band matrices* built from the arms:

    hsum[d, y, o] = sum_i Mh[y, o, i] * vol[d, y, i],
      Mh[y, o, i] = 1  iff  o - left_arm[y,o] <= i <= o + right_arm[y,o]

and the vertical pass likewise with Mv[x, o, i] from the top/bottom arms.
This moves the work from the VPU (~1 cycle per mask-add) to the MXU
(~128x the MAC throughput), at the price of W/(2L+1)-fold zero padding in
the band — a large win for typical arm lengths, and it has **no arm-length
limit** (the roll kernels fall back past max_arm 127).

Precision:
* **Voting histograms are bit-exact.** The one-hot counts and the 0/1
  masks are exactly representable in bfloat16; MXU products are exact 0/1
  and accumulation is float32, so counts are exact integers (< 2^24).
  Row sums past 255 (max_arm > 127) are fed to the second pass as an
  exact hi/lo bfloat16 split (integers <= 511 round to a multiple of 2;
  the residual is 0/+-1 — both parts exact).
* **Aggregation uses a 2-term bfloat16 split** of the float32 costs per
  pass (hi = bf16(x), lo = bf16(x - hi)); masks are exact, so the only
  error is the second rounding of the residual, ~2^-17 relative.
  Measured finding: Wood2's fast-mode bad-2.0 (+0.68 vs the roll
  kernels) is NOT noise magnitude — a 3-term, ~2^-26 split produced the
  identical result at +1 ms. Large textureless regions hold exactly
  TIED costs, and any reassociation epsilon flips argmin winners vs the
  sequential sums' exact ties; more precision cannot restore equality
  classes. Users needing the reference's exact tie semantics run
  use_pallas=True (parity mode).

Measured dead end (do not redo): a block-banded variant — storing only
the (2*ceil(max_arm/128)+1)*128-wide band and contracting per 128-col
output block — cut band bytes and FLOPs by W/KB-fold but ran SLOWER
end-to-end (Cone 27.6 vs 19.6 ms, Cloth3 92.5 vs 64.6 ms, TPU v5e):
fragmenting into per-block (128 x 384 x D) einsums loses more MXU/
fusion efficiency than the zero padding costs. The dense band matrix
stays.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def band_masks(
    arms: jnp.ndarray, max_arm: int, dtype=jnp.bfloat16
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """0/1 band matrices from per-pixel cross arms.

    arms: (H, W, 4) int (left, right, top, bottom).
    Returns (Mh, Mv): Mh (H, W_out, W_in), Mv (W, H_out, H_in).
    """
    al = jnp.minimum(arms[..., 0].astype(jnp.int32), max_arm)
    ar = jnp.minimum(arms[..., 1].astype(jnp.int32), max_arm)
    at = jnp.minimum(arms[..., 2].astype(jnp.int32), max_arm)
    ab = jnp.minimum(arms[..., 3].astype(jnp.int32), max_arm)
    h, w = al.shape
    iw = jnp.arange(w, dtype=jnp.int32)
    rel_w = iw[None, :] - iw[:, None]  # (W_out, W_in): i - o
    mh = (rel_w[None] >= -al[..., None]) & (rel_w[None] <= ar[..., None])
    ih = jnp.arange(h, dtype=jnp.int32)
    rel_h = ih[None, :] - ih[:, None]  # (H_out, H_in)
    at_t = at.T  # (W, H)
    ab_t = ab.T
    mv = (rel_h[None] >= -at_t[..., None]) & (rel_h[None] <= ab_t[..., None])
    return mh.astype(dtype), mv.astype(dtype)


def vote_band_masks(
    arms: jnp.ndarray, max_arm: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Band masks in the dtype the voting-histogram matmuls want:
    int8 while row counts fit (2*max_arm+1 <= 127, the MXU s8 mode),
    bfloat16 otherwise."""
    dt = jnp.int8 if 2 * max_arm + 1 <= 127 else jnp.bfloat16
    return band_masks(arms, max_arm, dtype=dt)


def _mm_h(mh: jnp.ndarray, vol: jnp.ndarray) -> jnp.ndarray:
    """out[d, y, o] = sum_i mh[y, o, i] * vol[d, y, i] (f32 accumulate)."""
    return jnp.einsum(
        "yoi,dyi->dyo", mh, vol.astype(mh.dtype),
        preferred_element_type=jnp.float32,
    )


def _mm_v(mv: jnp.ndarray, vol: jnp.ndarray) -> jnp.ndarray:
    """out[d, o, x] = sum_i mv[x, o, i] * vol[d, i, x] (f32 accumulate)."""
    return jnp.einsum(
        "xoi,dix->dox", mv, vol.astype(mv.dtype),
        preferred_element_type=jnp.float32,
    )


def _split_mm(
    mm, mask: jnp.ndarray, vol: jnp.ndarray, terms: int = 2,
    strategy: str = "auto",
) -> jnp.ndarray:
    """Multi-term bfloat16 split matmul (masks are exact 0/1): each
    term captures the bfloat16 rounding residual of the previous one,
    so 2 terms are exact for integers < 2^17 (~2^-17-relative for
    general float32) and 3 terms are float32-exact to ~2^-26 (measured
    NOT to change any bad-2.0 — the residual fast-vs-parity deviation
    is tie-breaking in exactly-tied textureless regions, insensitive
    to precision — so aggregation stays at the cheaper 2 terms).

    Strategy is size-aware: stacking the terms along the free d axis
    into ONE matmul reads the band matrix from HBM once but
    materializes a terms× volume concat; separate matmuls read the
    mask terms× but skip the concat. The stack is built directly in
    the mask dtype (the matmul casts the operand there anyway —
    identical rounding), so at bfloat16 the concat costs half the
    bytes the heuristic used to assume and it wins for every bundled
    configuration except Piano-class D=256, where the volume dwarfs
    the band. Bonus: the stacked matmul's free dimension is terms*D,
    better MXU utilization at small D."""
    d = vol.shape[0]
    parts = []
    rem = vol
    for _ in range(terms - 1):
        t = rem.astype(mask.dtype)
        parts.append(t)
        rem = rem - t.astype(vol.dtype)
    parts.append(rem.astype(mask.dtype))
    bpe = mask.dtype.itemsize
    concat_bytes = 2 * (terms * vol.size * bpe)  # write + read the stack
    extra_mask_bytes = (terms - 1) * mask.size * bpe
    separate = (
        concat_bytes > extra_mask_bytes if strategy == "auto"
        else strategy == "separate"
    )
    if separate:
        out = mm(mask, parts[0])
        for p in parts[1:]:
            out = out + mm(mask, p)
        return out
    res = mm(mask, jnp.concatenate(parts, axis=0))
    out = res[:d]
    for k in range(1, terms):
        out = out + res[k * d : (k + 1) * d]
    return out


def cross_pass_matmul(
    vol: jnp.ndarray,
    arms: jnp.ndarray,
    sup: jnp.ndarray,
    horizontal_first: bool,
    max_arm: int,
    normalize: bool = True,
    masks: Tuple[jnp.ndarray, jnp.ndarray] | None = None,
) -> jnp.ndarray:
    """One cross-aggregation iteration of a (D, H, W) float32 volume on
    the MXU. Same contract as ``cross_pass_ref``; pass ``masks`` (from
    :func:`band_masks`) to amortize the band-matrix build across calls.
    """
    mh, mv = band_masks(arms, max_arm) if masks is None else masks
    if horizontal_first:
        tmp = _split_mm(_mm_h, mh, vol)
        res = _split_mm(_mm_v, mv, tmp)
    else:
        tmp = _split_mm(_mm_v, mv, vol)
        res = _split_mm(_mm_h, mh, tmp)
    if normalize:
        res = res / sup.astype(jnp.float32)
    return res


def region_vote_stats_matmul(
    di: jnp.ndarray,
    valid: jnp.ndarray,
    arms: jnp.ndarray,
    d_range: int,
    max_arm: int,
    masks: Tuple[jnp.ndarray, jnp.ndarray] | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(best_index, max_ht, count) of the cross-region disparity histogram
    (horizontal-first region, multistep_refiner.cpp:183-197) — exact
    integer counts via MXU matmuls, any arm length.

    di: (H, W) int32 rounded 0-based disparities; valid: (H, W) bool.
    """
    if masks is None:
        masks = vote_band_masks(arms, max_arm)
    mh, mv = masks
    onehot = (
        (di[None] == jnp.arange(d_range, dtype=di.dtype)[:, None, None])
        & valid[None]
    )
    if 2 * max_arm + 1 <= 127:
        # row counts fit int8: ride the MXU's s8 x s8 mode — half the
        # band-matrix HBM bytes and double the MAC rate vs bf16
        # (callers build the masks as int8 via vote_band_masks). The
        # accumulator dtypes are the narrowest that cannot overflow:
        # row counts <= 2*max_arm+1 <= 127 (int8), region counts
        # <= 127^2 < 2^15 (int16) — partial sums of nonnegative terms
        # never exceed the final value, so no intermediate overflows.
        mh8 = mh if mh.dtype == jnp.int8 else mh.astype(jnp.int8)
        mv8 = mv if mv.dtype == jnp.int8 else mv.astype(jnp.int8)
        tmp = jnp.einsum(
            "yoi,dyi->dyo", mh8, onehot.astype(jnp.int8),
            preferred_element_type=jnp.int8,
        )
        hist16 = jnp.einsum(
            "xoi,dix->dox", mv8, tmp,
            preferred_element_type=jnp.int16,
        )
        return (
            jnp.argmax(hist16, axis=0).astype(jnp.int32),
            jnp.max(hist16, axis=0).astype(jnp.int32),
            jnp.sum(hist16, axis=0, dtype=jnp.int32),
        )
    else:
        if mh.dtype != jnp.bfloat16:
            mh, mv = mh.astype(jnp.bfloat16), mv.astype(jnp.bfloat16)
        tmp = _mm_h(mh, onehot)  # exact row counts <= 2*max_arm+1
        if 2 * max_arm + 1 > 255:
            # counts past 255 are not bf16-exact; the hi/lo split is
            # (ints <= 511 round to a multiple of 2, residual is 0/+-1)
            hist = _split_mm(_mm_v, mv, tmp)
        else:
            hist = _mm_v(mv, tmp)
        hist = hist.astype(jnp.int32)
    return (
        jnp.argmax(hist, axis=0).astype(jnp.int32),
        jnp.max(hist, axis=0),
        jnp.sum(hist, axis=0),
    )
