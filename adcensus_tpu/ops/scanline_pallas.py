"""Pallas TPU kernel: one directional scanline-optimization pass.

The reference DP (scanline_optimizer.cpp:63-279) is a first-order
recurrence along each image row/column. This kernel runs it for *all*
paths of a direction simultaneously: the volume is pre-transposed to
(S, D, P) with S the scan axis (sequential TPU grid), D on sublanes and
P = parallel paths on lanes. The carry (Lr vector per path + per-path min)
lives in VMEM scratch and persists across the sequential grid steps.

Each scan step carries a flag (0 = padding, 1 = seed, 2 = normal) so the
same kernel serves the sharded pipeline, where images are padded to a
multiple of the tile count: padding steps pass the carry through untouched,
and the seed step (the first *real* pixel of each path) copies its costs
unchanged (scanline_optimizer.cpp:99-100).

Measured dead ends (do not redo):
* blocking K=8 scan steps per grid step (carry in registers,
  arithmetic flag selects) changed nothing on Cone (2.95 vs 2.82 ms)
  and OOM'd the 16 MB scoped VMEM at D=256 (the (K, D, P) in/out
  blocks are double-buffered) — per-grid-step overhead is NOT the
  bottleneck; Mosaic already pipelines the S grid well.
* a D-on-lanes (S, P, D) layout is 4-8 % faster per pass in isolation
  at D>=128 (bit-exact), but producing a D-minor volume is ruinous:
  the D-major -> D-minor transpose's producer layouts get padded 128x
  per plane (42 GB HBM demand at D=256), and building the penalty code
  D-minor (2-D planes stacked on the last axis) ran 516 ms vs 23 ms.
* sharing one SDP-transpose round-trip across a direction's
  forward+backward pass pair was also ~20x SLOWER at D=256 (fine at
  D=64) — XLA's layout/fusion choices around the per-pass transposes
  are load-bearing; keep one transpose in and out per pass.

The color-adaptive penalties are fed as a compact (S, D, P) uint8 code
volume (0: both gradients < tso, 1: exactly one >= tso, 2: both >= tso)
decoded in-kernel to the static (P1, P2), (P1,P2)/4, (P1,P2)/10 constants
(scanline_optimizer.cpp:128-141).

Recurrence (scanline_optimizer.cpp:143-151, note: no min subtraction, /2):
    Lr(p,d) = (C(p,d) + min(Lr(p-r,d), Lr(p-r,d-1)+P1,
                            Lr(p-r,d+1)+P1, min_d' Lr(p-r,d') + P2)) / 2
with virtual d = -1 / D neighbors at Large_Float.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adcensus_tpu.config import LARGE_FLOAT

FLAG_PAD = 0
FLAG_SEED = 1
FLAG_NORMAL = 2


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _shift_d(lr: jnp.ndarray, up: bool) -> jnp.ndarray:
    """Shift the (D, P) carry along sublanes with Large_Float sentinels:
    up=False -> out[d] = lr[d-1] (d=0 gets Large), up=True -> lr[d+1]."""
    d = lr.shape[0]
    ids = jax.lax.broadcasted_iota(jnp.int32, lr.shape, 0)
    if up:
        rolled = pltpu.roll(lr, d - 1, axis=0)  # out[d] = lr[d+1]
        return jnp.where(ids == d - 1, LARGE_FLOAT, rolled)
    rolled = pltpu.roll(lr, 1, axis=0)          # out[d] = lr[d-1]
    return jnp.where(ids == 0, LARGE_FLOAT, rolled)


def _scanline_kernel(
    flag_ref, cost_ref, code_ref, out_ref, lr_ref, min_ref,
    *, p1: float, p2: float,
):
    flag = flag_ref[pl.program_id(0)]
    c = cost_ref[0]       # (D, P)

    @pl.when(flag == FLAG_PAD)
    def _pad():
        out_ref[0] = c  # cropped by the caller; carry untouched

    @pl.when(flag == FLAG_SEED)
    def _seed():
        out_ref[0] = c
        lr_ref[:] = c
        min_ref[:] = jnp.min(c, axis=0, keepdims=True)

    @pl.when(flag == FLAG_NORMAL)
    def _step():
        # int8 vector compares are unsupported on some TPU targets; widen
        code = code_ref[0].astype(jnp.int32)  # (D, P)
        lr_prev = lr_ref[:]
        min_prev = min_ref[:]
        # decode penalties as a masked linear combination (Mosaic dislikes
        # where(vec, scalar, scalar)); constants are the reference's f32
        # divisions, and exactly one mask is 1 per cell so the sum of
        # products is exact
        c0 = (code == 0).astype(jnp.float32)
        c1 = (code == 1).astype(jnp.float32)
        c2 = (code == 2).astype(jnp.float32)
        p1_0 = np.float32(p1)
        p1_1 = np.float32(np.float32(p1) / np.float32(4))
        p1_2 = np.float32(np.float32(p1) / np.float32(10))
        p2_0 = np.float32(p2)
        p2_1 = np.float32(np.float32(p2) / np.float32(4))
        p2_2 = np.float32(np.float32(p2) / np.float32(10))
        P1 = c0 * p1_0 + c1 * p1_1 + c2 * p1_2
        P2 = c0 * p2_0 + c1 * p2_1 + c2 * p2_2
        l2 = _shift_d(lr_prev, up=False) + P1
        l3 = _shift_d(lr_prev, up=True) + P1
        l4 = min_prev + P2
        m = jnp.minimum(jnp.minimum(lr_prev, l2), jnp.minimum(l3, l4))
        lr = (c + m) * jnp.float32(0.5)
        out_ref[0] = lr
        lr_ref[:] = lr
        min_ref[:] = jnp.min(lr, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("p1", "p2", "reverse"))
def scanline_pass_sdp(
    cost_sdp: jnp.ndarray,
    code_sdp: jnp.ndarray,
    flags: jnp.ndarray,
    p1: float,
    p2: float,
    reverse: bool = False,
) -> jnp.ndarray:
    """Run one pass over (S, D, P) arrays; ``flags`` is (S,) int32 with
    FLAG_PAD / FLAG_SEED / FLAG_NORMAL per step *in scan order* (seed
    first). Returns the optimized (S, D, P) volume in the input's
    orientation. The S grid executes sequentially on TPU, so the VMEM
    scratch carries the DP state between steps.

    ``reverse`` scans blocks S-1 .. 0 via reversed index maps — backward
    passes need NO data flip. (Feeding the custom call a jnp.flip-ed
    operand inside one jit silently corrupted blocks on some real-TPU
    shapes, e.g. 653x128x555: even the seed step's verbatim copy came out
    wrong while interpret mode was exact.)"""
    s, d, p = cost_sdp.shape
    kernel = functools.partial(_scanline_kernel, p1=p1, p2=p2)
    if reverse:
        imap = lambda i: (s - 1 - i, 0, 0)  # noqa: E731
    else:
        imap = lambda i: (i, 0, 0)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=(s,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full flags array
            pl.BlockSpec((1, d, p), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, p), imap, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, d, p), imap, memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((s, d, p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((d, p), jnp.float32),
            pltpu.VMEM((1, p), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(flags.astype(jnp.int32), cost_sdp, code_sdp)
