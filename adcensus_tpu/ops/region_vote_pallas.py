"""Pallas TPU kernel: region-voting histogram statistics.

For every pixel, iterative region voting (multistep_refiner.cpp:153-227)
needs the argmax/max/total of the disparity histogram over the pixel's
cross support region (horizontal-first order). The naive dense form —
a (D, H, W) one-hot volume pushed through the cross-sum operator, then
argmax/max/sum over D — dominated the whole pipeline (~80 ms of 130 ms
on Cone): 64 f32 planes of variable-window sums plus 4 extra volume
passes of HBM traffic.

This kernel computes the same statistics with:

* **bit-packed counts** — the horizontal pass packs FOUR disparities
  per int32 in 8-bit fields (row sums are bounded by 2*max_arm+1), and
  the vertical pass runs on two 16-bit-field planes (region sums are
  bounded by the support area <= (2*max_arm+1)^2, which fits 16 bits
  for max_arm <= 127 — larger arms fall back to the jnp mirror). One
  masked-roll accumulation counts 4 (then 2) d-planes at once.
* **in-VMEM reduction** — the TPU grid is sequential, so the running
  (best, max_ht, count) live in the output block across grid steps;
  the one-hot volume and the D-axis argmax/max/sum passes never touch
  HBM at all.

Tie semantics match jnp.argmax / the reference's ascending-d scan:
first maximum wins (strict > update, d ascending).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adcensus_tpu.ops.cross_sum_pallas import (
    _masked_roll_sum as _masked_roll_sum_i32,  # dtype-generic
    cross_pass_ref,
)


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _region_vote_kernel(
    di_ref, valid_ref, al_ref, ar_ref, at_ref, ab_ref, out_ref,
    *, max_arm: int, k_planes: int,
):
    step = pl.program_id(0)
    di = di_ref[:]
    v = valid_ref[:]
    # arms widened one pass at a time (int8 compares are unsupported by
    # Mosaic; widening all four up front wastes VMEM)

    # K packed planes per step, FOUR disparities each in 8-bit fields for
    # the horizontal pass (row sums are bounded by 2*max_arm+1 = 69 <
    # 256, so fields cannot carry into each other), then unpacked to two
    # 16-bit-field planes for the vertical pass (region sums <= 69*69 =
    # 4761 < 65536). This halves the horizontal-pass work vs 16-bit
    # packing. K == 1 keeps rank-2 bodies (rank-3 rolls cost Mosaic
    # extra VMEM copies).
    planes = []
    for j in range(k_planes):
        d0 = 4 * (step * k_planes + j)
        b = [
            ((di == d0 + i) & (v > 0)).astype(jnp.int32) for i in range(4)
        ]
        planes.append(b[0] + (b[1] << 8) + (b[2] << 16) + (b[3] << 24))
    if k_planes == 1:
        packed = planes[0]
        ax = 0
    else:
        packed = jnp.stack(planes, axis=0)  # (K, H, W)
        ax = 1

    # horizontal-first support region (multistep_refiner.cpp:183-197)
    al = al_ref[:].astype(jnp.int32)
    ar = ar_ref[:].astype(jnp.int32)
    tmp8 = _masked_roll_sum_i32(packed, al, ar, axis=ax + 1, max_arm=max_arm)
    # unpack 4x8-bit -> two 2x16-bit planes; run the vertical pass per
    # half at the input's own rank (a stacked rank-3 body OOM'd scoped
    # VMEM on large planes)
    lo16 = (tmp8 & 0xFF) + (((tmp8 >> 8) & 0xFF) << 16)
    hi16 = ((tmp8 >> 16) & 0xFF) + (((tmp8 >> 24) & 0xFF) << 16)
    at = at_ref[:].astype(jnp.int32)
    ab = ab_ref[:].astype(jnp.int32)
    res = [
        _masked_roll_sum_i32(t16, at, ab, axis=ax, max_arm=max_arm)
        for t16 in (lo16, hi16)
    ]

    @pl.when(step == 0)
    def _():
        out_ref[0] = jnp.zeros_like(di)          # best index
        out_ref[1] = jnp.full_like(di, -1)       # max height
        out_ref[2] = jnp.zeros_like(di)          # total count

    for j in range(k_planes):
        d0 = 4 * (step * k_planes + j)
        for half in range(2):  # lo16 then hi16: d0+0/1 then d0+2/3
            rj = res[half] if k_planes == 1 else res[half][j]
            lo = rj & 0xFFFF
            # mask after the shift: an arithmetic >> sign-extends when
            # the odd-disparity region count >= 32768 (reachable for
            # cross_L1 in 91..127, where (2*L1+1)^2 > 2^15)
            hi = (rj >> 16) & 0xFFFF
            for d, cnt in ((d0 + 2 * half, lo), (d0 + 2 * half + 1, hi)):
                upd = cnt > out_ref[1]
                out_ref[0] = jnp.where(upd, d, out_ref[0])
                out_ref[1] = jnp.where(upd, cnt, out_ref[1])
            out_ref[2] = out_ref[2] + lo + hi


@functools.partial(jax.jit, static_argnames=("d_range", "max_arm"))
def _region_vote_pallas(
    di: jnp.ndarray,
    valid: jnp.ndarray,
    arms: jnp.ndarray,
    d_range: int,
    max_arm: int,
) -> jnp.ndarray:
    h, w = di.shape
    n_steps = -(-d_range // 4)  # 4 disparities per 8-bit-packed plane
    # K=1 (rank-2 bodies only): see cross_sum_pallas — rank-3 rolls cost
    # Mosaic extra VMEM copies and no longer win on time
    k = 1
    plane = pl.BlockSpec((h, w), lambda i: (0, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _region_vote_kernel, max_arm=max_arm, k_planes=k
    )
    return pl.pallas_call(
        kernel,
        grid=(n_steps // k,),
        in_specs=[plane] * 6,
        out_specs=pl.BlockSpec(
            (3, h, w), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, h, w), jnp.int32),
        interpret=_use_interpret(),
    )(
        di.astype(jnp.int32),
        valid.astype(jnp.int32),
        arms[..., 0].astype(jnp.int8),
        arms[..., 1].astype(jnp.int8),
        arms[..., 2].astype(jnp.int8),
        arms[..., 3].astype(jnp.int8),
    )


def region_vote_stats(
    di: jnp.ndarray,
    valid: jnp.ndarray,
    arms: jnp.ndarray,
    d_range: int,
    max_arm: int,
    use_pallas: bool | None = None,
    masks=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(best_index, max_ht, count) of the cross-region disparity histogram.

    di: (H, W) int32 rounded disparity indices (0-based, pre-clipped);
    valid: (H, W) bool; arms: (H, W, 4) int. All three backends (matmul /
    pallas / jnp) produce bit-identical integer statistics; ``masks`` are
    prebuilt band matrices for the matmul backend.
    """
    from adcensus_tpu.ops.basic import resolve_cross_backend
    from adcensus_tpu.ops.cross_matmul import region_vote_stats_matmul

    backend = resolve_cross_backend(use_pallas)
    if backend == "pallas" and max_arm > 127:
        # the packed-histogram kernel's int8 arms / 8-bit row fields
        # overflow past 127; the matmul path is exact at any arm length
        backend = "matmul" if jax.default_backend() != "cpu" else "jnp"
    if backend == "matmul":
        return region_vote_stats_matmul(
            di, valid, arms, d_range, max_arm, masks=masks
        )
    if backend == "pallas":
        out = _region_vote_pallas(di, valid, arms, d_range, max_arm)
        best, max_ht, count = out[0], out[1], out[2]
        # pixels whose whole region is empty: argmax(zeros) == 0, max 0
        max_ht = jnp.maximum(max_ht, 0)
        return best, max_ht, count
    onehot = (
        (di[None] == jnp.arange(d_range)[:, None, None]) & valid[None]
    ).astype(jnp.float32)
    hist = cross_pass_ref(
        onehot,
        arms,
        jnp.ones(di.shape, jnp.float32),
        horizontal_first=True,
        max_arm=max_arm,
        normalize=False,
    ).astype(jnp.int32)
    return (
        jnp.argmax(hist, axis=0).astype(jnp.int32),
        jnp.max(hist, axis=0),
        jnp.sum(hist, axis=0),
    )
