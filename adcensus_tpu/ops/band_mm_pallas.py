"""Pallas TPU kernel: blocked-band MXU matmul for cross aggregation.

**Measured dead end on the bench chip — kept as the opt-in
`ADC_AGG_IMPL=banded` backend, not the default.** Interleaved
in-process A/B (jax.clear_caches() between variants; cross-process
comparisons on this time-shared chip are NOT comparable), Cone fused
match: XLA dense band matmul 12.6 ms, this kernel 19.2 ms,
aggregation skipped entirely 13.1 ms. Two findings worth keeping:

1. The dense path's (H, W, W) bfloat16 "band matrices" never touch
   HBM: XLA fuses the iota/compare mask GENERATION into the einsum's
   operand read, so the byte-count argument below (the kernel's whole
   premise) attacks traffic that does not exist. The in-pipeline cost
   of the dense aggregation is ~0.5 ms on Cone.
2. The skip row is SLOWER than running aggregation: a noisier cost
   volume produces more outliers, and the refine tail pays more than
   the aggregation costs. Aggregation is self-funding.

The original design rationale (valid arithmetic, wrong premise):

The XLA band-matrix backend (ops/cross_matmul.py) contracts each
windowed sum against a dense (H, W_out, W_in) bfloat16 band matrix —
a W_in-deep MXU contraction that is ~91 % zeros (arm cap 34 << W).
This kernel keeps the same math but exploits the band structure
WITHOUT the fragmented per-block einsums that made the round-2
"block-banded" XLA variant a measured dead end
(cross_matmul.py:36-42):

* The mask entry for output column o and window slot ii depends only on
  (o % 128): the contraction window for the 128-column output block
  ``ob`` is the input slice [ob*128 - PAD, ob*128 - PAD + WK) with
  WK = 128 + 2*PAD and PAD = ceil(max_arm/64)*64, so
  ``mask[y, o, ii] = (-al[y,o] <= ii - PAD - o%128 <= ar[y,o])``.
  Arms never cross the image border (cross_aggregator.cpp:137-197
  builds them clipped), so in-image bounds come for free and the mask
  shrinks from (H, W, W) bf16 to (H, W, WK) **int8** — 3-6x fewer
  bytes and a WK-deep (not W-deep) MXU contraction.
* The float32 volume is split hi/lo into bfloat16 *inside* the kernel
  (same 2-term split as cross_matmul._split_mm — products exact vs the
  0/1 mask, float32 accumulation), so the split never materializes in
  HBM (the XLA path concatenates a 2x volume per pass).
* Window starts ob*128 are lane-aligned static slices; the grid is
  (H-blocks, D-blocks) with D innermost so the mask block is fetched
  once per row block (Pallas skips the copy when the block index is
  unchanged).

The vertical pass runs the same kernel on the (D, W, H)-transposed
volume; `aggregate_banded` keeps the volume in whichever orientation
the next pass needs (the 4-iteration h/v alternation only changes
direction 4 times), pads once and slices once.

Precision: identical split structure to the XLA matmul backend (~2^-17
relative reassociation vs the reference's sequential sums); gated by
the same end-to-end bad-2.0 tolerance and an exact-mirror comparison
test. Parity mode (use_pallas=True) is unaffected — it uses the
masked-roll kernels in the reference's summation order.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _pad_for(max_arm: int) -> int:
    """Window margin: multiple of 64 so WK = 128 + 2*PAD is a lane
    multiple, covering any |offset| <= max_arm."""
    return max(-(-max_arm // 64) * 64, 64)


class BlockedMasks(NamedTuple):
    """Blocked int8 band masks for both directions, at padded dims."""

    mh: jnp.ndarray  # (Hp, WKw, Wp) int8, K-major
    mv: jnp.ndarray  # (Wp, WKh, Hp) int8, K-major
    pad_w: int
    pad_h: int
    hp: int
    wp: int


_NB = 256  # output-block width: nb columns share one MXU dot


def _blocked_mask(
    lo: jnp.ndarray, hi: jnp.ndarray, pad: int, nb: int = _NB
) -> jnp.ndarray:
    """(N, WK, M) int8 mask from per-pixel window extents — K-major so
    the in-kernel dot's rhs is already (K, N) and Mosaic never
    transposes it.

    lo/hi: (N, M) int32, window [o - lo[n,o], o + hi[n,o]] along the M
    axis; entries < 0 produce an all-zero column (used for padding).
    mask[n, ii, o] = 1 iff -lo <= ii - pad - o%nb <= hi.
    """
    m = lo.shape[1]
    wk = nb + 2 * pad
    rel = (
        jnp.arange(wk, dtype=jnp.int32)[:, None]
        - pad
        - (jnp.arange(m, dtype=jnp.int32) % nb)[None, :]
    )  # (WK, M)
    ok = (rel[None] >= -lo[:, None, :]) & (rel[None] <= hi[:, None, :])
    return ok.astype(jnp.int8)


def make_blocked_masks(
    arms: jnp.ndarray, max_arm: int, hp: int, wp: int
) -> BlockedMasks:
    """Blocked masks from (H, W, 4) arms, padded to (hp, wp) with
    all-zero rows/columns (padded pixels contribute and receive
    nothing)."""
    a = jnp.minimum(arms.astype(jnp.int32), max_arm)
    h, w = a.shape[:2]
    neg = -jnp.ones((hp, wp), jnp.int32)
    put = lambda x: neg.at[:h, :w].set(x)  # noqa: E731
    pad_w = _pad_for(max_arm)
    pad_h = _pad_for(max_arm)
    mh = _blocked_mask(put(a[..., 0]), put(a[..., 1]), pad_w, _NB)
    mv = _blocked_mask(put(a[..., 2]).T, put(a[..., 3]).T, pad_h, _NB)
    return BlockedMasks(mh, mv, pad_w, pad_h, hp, wp)


def _band_kernel(mask_ref, vol_ref, out_ref, *, yb, db, wk, nb, n_ob):
    """out[d, y, o] = sum_ii mask[y, o, ii] * vol[d, y, ob*nb + ii]
    for the nb-column output block ob containing o, with the float32
    volume split hi/lo into bfloat16 (exact 0/1 products, f32 acc).
    The hi and lo terms ride as one stacked-M MXU dot (M = 2*db) so
    the dot count stays low — per-dot dispatch overhead, not FLOPs,
    dominated a per-term formulation."""
    mp = out_ref.shape[2]
    dn = (((1,), (0,)), ((), ()))
    for yy in range(yb):
        row = vol_ref[:, yy, :]  # (db, mp_ceil + 2*pad) f32
        hi = row.astype(jnp.bfloat16)
        lo = (row - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        for ob in range(n_ob):
            width = min(nb, mp - ob * nb)  # tail block may be 128
            m = mask_ref[yy, :, ob * nb : ob * nb + width].astype(
                jnp.bfloat16
            )  # (wk, width): rhs already (K, N)
            sl = slice(ob * nb, ob * nb + wk)
            acc = jax.lax.dot_general(
                hi[:, sl], m, dn, preferred_element_type=jnp.float32
            ) + jax.lax.dot_general(
                lo[:, sl], m, dn, preferred_element_type=jnp.float32
            )
            out_ref[:, yy, ob * nb : ob * nb + width] = acc


_VMEM_BUDGET = 11e6


def _mp_ceil(mp: int) -> int:
    return -(-mp // _NB) * _NB


def _margins(mp: int, pad: int):
    """(left, right) contraction-axis margins so every output block's
    wk-wide window slice stays in bounds (the tail block over-reads
    zeros)."""
    return pad, pad + (_mp_ceil(mp) - mp)


def _pick_blocks(dp: int, mp: int, pad: int):
    """(db, yb) whose double-buffered blocks fit the VMEM budget, or
    None. Mask block (yb, wk, mp) int8; vol (db, yb^, mp_ceil+2pad)
    f32 and out (db, yb^, mp) f32 with yb^ = sublane-padded yb."""
    wk = _NB + 2 * pad
    mpad = _mp_ceil(mp) + 2 * pad
    for yb in (8, 4):
        for db in (64, 32, 16, 8):
            if dp % db:
                continue
            ybs = max(yb, 8)
            bytes_ = (
                yb * mp * wk  # mask int8
                + db * ybs * mpad * 4
                + db * ybs * mp * 4
            ) * 2
            if bytes_ <= _VMEM_BUDGET:
                return db, yb
    return None


@functools.partial(jax.jit, static_argnames=("pad", "db", "yb"))
def _band_pass(vol_m: jnp.ndarray, mask: jnp.ndarray, pad: int,
               db: int, yb: int) -> jnp.ndarray:
    """One directional pass. vol_m: (Dp, Np, mp_ceil + 2*pad) f32 with
    the contraction-axis margins already attached (see _margins);
    mask: (Np, WK, Mp) int8. Returns (Dp, Np, Mp) f32."""
    dp, np_, _ = vol_m.shape
    mp = mask.shape[2]
    wk = _NB + 2 * pad
    kernel = functools.partial(
        _band_kernel, yb=yb, db=db, wk=wk, nb=_NB,
        n_ob=-(-mp // _NB),
    )
    return pl.pallas_call(
        kernel,
        grid=(np_ // yb, dp // db),
        in_specs=[
            pl.BlockSpec(
                (yb, wk, mp), lambda y, d: (y, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (db, yb, vol_m.shape[2]), lambda y, d: (d, y, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (db, yb, mp), lambda y, d: (d, y, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((dp, np_, mp), jnp.float32),
        interpret=_use_interpret(),
    )(mask, vol_m)


def banded_fits(d: int, h: int, w: int, max_arm: int) -> bool:
    """Whether the blocked-band kernel can run this shape."""
    # both spatial dims serve as the 128-blocked OUTPUT axis of one of
    # the two pass directions, so both pad to lane multiples
    hp = -(-h // 128) * 128
    wp = -(-w // 128) * 128
    dp = -(-d // 8) * 8
    pad = _pad_for(max_arm)
    return (
        _pick_blocks(dp, wp, pad) is not None
        and _pick_blocks(dp, hp, pad) is not None
    )


def aggregate_banded(
    cost: jnp.ndarray,
    arms: jnp.ndarray,
    sup_h: jnp.ndarray,
    sup_v: jnp.ndarray,
    max_arm: int,
    num_iters: int = 4,
) -> jnp.ndarray:
    """Full aggregation stage (cross_aggregator.cpp:89-118: num_iters
    iterations alternating horizontal-first / vertical-first, each
    normalizing by the matching support count) on the blocked-band
    kernel.

    Pads once to (Dp, Hp, Wp), runs every pass in padded space (padded
    pixels have all-zero mask rows, so they stay 0 through every
    iteration), and keeps the volume in whichever (D, H, W) /
    (D, W, H) orientation the next pass needs — the h/v alternation
    only changes direction at 4 of the 8 pass boundaries.
    """
    d, h, w = cost.shape
    hp = -(-h // 128) * 128  # v-pass output axis: 128-blocked
    wp = -(-w // 128) * 128
    dp = -(-d // 8) * 8
    masks = make_blocked_masks(arms, max_arm, hp, wp)
    sup_h_p = jnp.ones((hp, wp), jnp.float32).at[:h, :w].set(
        sup_h.astype(jnp.float32)
    )
    sup_v_p = jnp.ones((hp, wp), jnp.float32).at[:h, :w].set(
        sup_v.astype(jnp.float32)
    )
    db_w, yb_w = _pick_blocks(dp, wp, masks.pad_w)
    db_h, yb_h = _pick_blocks(dp, hp, masks.pad_h)

    vol = jnp.pad(cost, ((0, dp - d), (0, hp - h), (0, wp - w)))
    in_hw = True  # current orientation: True = (Dp, Hp, Wp)

    def run_h(v):
        lm, rm = _margins(wp, masks.pad_w)
        vm = jnp.pad(v, ((0, 0), (0, 0), (lm, rm)))
        return _band_pass(vm, masks.mh, masks.pad_w, db_w, yb_w)

    def run_v(v):  # v in (Dp, Wp, Hp) orientation
        lm, rm = _margins(hp, masks.pad_h)
        vm = jnp.pad(v, ((0, 0), (0, 0), (lm, rm)))
        return _band_pass(vm, masks.mv, masks.pad_h, db_h, yb_h)

    horizontal_first = True
    for _ in range(num_iters):
        for direction in ("h", "v") if horizontal_first else ("v", "h"):
            want_hw = direction == "h"
            if in_hw != want_hw:
                vol = jnp.swapaxes(vol, 1, 2)
                in_hw = want_hw
            vol = run_h(vol) if want_hw else run_v(vol)
        sup = sup_h_p if horizontal_first else sup_v_p
        vol = vol / (sup if in_hw else sup.T)
        horizontal_first = not horizontal_first
    if not in_hw:
        vol = jnp.swapaxes(vol, 1, 2)
    return vol[:d, :h, :w]
