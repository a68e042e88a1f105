"""Pallas TPU kernel: cross-window (variable-arm) aggregation pass.

One fused kernel applies both passes of a cross-aggregation iteration to a
(D, H, W) volume — grid over disparity planes, each plane resident in VMEM:

    pass1: sum along the first axis' per-pixel arms,
    pass2: sum pass1 along the second axis' arms, optionally / support.

The variable-window sums are masked roll-accumulations: for offset t in
-L..L, add roll(plane, t) where the pixel's arm covers t. Because adding a
masked 0.0 is an exact float32 identity, the accumulation order equals the
reference's sequential per-arm loop (cross_aggregator.cpp:362-383) —
bit-exact parity, unlike a cumsum-difference.

Arm lengths are bounded by min(L1, 255) = 34 (cross_aggregator.h:22), so
the unrolled offset loop is 2*34+1 steps of pure VPU work; HBM traffic per
iteration is one volume read + one write.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _masked_roll_sum(p, lo_arm, hi_arm, axis, max_arm):
    """sum_{t=-lo_arm[px]..hi_arm[px]} p shifted so out[i] += p[i + t].

    Accumulates in ascending t (the reference's loop order,
    cross_aggregator.cpp:362), with masked zero adds — bit-exact float32
    parity with the sequential per-arm sums. Uses an incremental roll-by-1
    carry inside fori_loops so only O(1) VMEM buffers are live (an unrolled
    69-roll chain overflows scoped VMEM).

    pltpu.roll(x, shift, axis) maps out[i] = x[i - shift]; out[i] = p[i+t]
    needs shift = -t (mod n). Wrapped lanes are masked off because arms
    never cross the image border.
    """
    n = p.shape[axis]
    zero = jnp.zeros_like(p)
    elt0 = jnp.zeros((), p.dtype)  # dtype-generic (f32 costs, i32 counts)
    # NOTE: arms arrive as int8 refs and are widened to int32 by the
    # caller one pass at a time (2 planes live, not 4) — int8 compares
    # are unsupported by Mosaic ("Target does not support this
    # comparison") and widening all 4 up front OOM'd 555x653 planes.

    def neg_body(i, carry):
        acc, rolled = carry
        t = i - max_arm  # t = -max_arm .. -1
        acc = acc + jnp.where(lo_arm >= -t, rolled, elt0)
        rolled = pltpu.roll(rolled, n - 1, axis=axis)  # advance t by +1
        return acc, rolled

    acc, _ = jax.lax.fori_loop(
        0, max_arm, neg_body, (zero, pltpu.roll(p, max_arm % n, axis=axis))
    )
    acc = acc + p  # t = 0

    def pos_body(i, carry):
        acc, rolled = carry
        t = i + 1  # t = 1 .. max_arm
        rolled = pltpu.roll(rolled, n - 1, axis=axis)
        acc = acc + jnp.where(hi_arm >= t, rolled, elt0)
        return acc, rolled

    acc, _ = jax.lax.fori_loop(0, max_arm, pos_body, (acc, p))
    return acc


def _cross_pass_kernel(
    al_ref, ar_ref, at_ref, ab_ref, sup_ref, plane_ref, out_ref,
    *, horizontal_first: bool, max_arm: int, normalize: bool,
):
    # block is (K, H, W): K d-planes share each offset's arm compare
    # (masks broadcast over the leading axis), so the per-t cost drops
    # from 4 ops/plane to ~3 + 1/K. K == 1 keeps the rank-2 body —
    # rank-3 rolls cost Mosaic extra VMEM copies (observed scoped-vmem
    # OOM on 555x653 planes that fit fine in rank-2).
    k = plane_ref.shape[0]
    p = plane_ref[0] if k == 1 else plane_ref[:]
    ax = 0 if k == 1 else 1
    def h32():
        return al_ref[:].astype(jnp.int32), ar_ref[:].astype(jnp.int32)

    def v32():
        return at_ref[:].astype(jnp.int32), ab_ref[:].astype(jnp.int32)

    if horizontal_first:
        al, ar = h32()
        tmp = _masked_roll_sum(p, al, ar, axis=ax + 1, max_arm=max_arm)
        at, ab = v32()  # widened after al/ar die: 2 int32 planes live
        res = _masked_roll_sum(tmp, at, ab, axis=ax, max_arm=max_arm)
    else:
        at, ab = v32()
        tmp = _masked_roll_sum(p, at, ab, axis=ax, max_arm=max_arm)
        al, ar = h32()
        res = _masked_roll_sum(tmp, al, ar, axis=ax + 1, max_arm=max_arm)
    if normalize:
        res = res / sup_ref[:]
    if k == 1:
        out_ref[0] = res
    else:
        out_ref[:] = res


def _masked_roll_sum_jnp(p, lo_arm, hi_arm, axis, max_arm, rolled=None):
    """jnp mirror of _masked_roll_sum over a (D, H, W) volume (axis is the
    spatial axis, 1 or 2). Same ascending-t masked accumulation — bit-exact
    vs the reference, and immune to garbage in halo regions (arms never
    reach past the true image border, so wrapped values are masked off).

    ``rolled`` (default on the CPU backend) uses fori_loops with an
    incremental roll-by-1 carry — the Pallas kernel's own structure — so
    the 2*max_arm+1 offset steps compile once instead of unrolling
    (XLA CPU compile time of the full-size sharded program). Identical
    values added in the identical ascending-t order: bit-exact either
    way."""
    if rolled is None:
        rolled = jax.default_backend() == "cpu"
    zero = jnp.zeros((), p.dtype)
    if rolled:
        def neg_body(i, carry):
            acc, r = carry
            t = i - max_arm  # t = -max_arm .. -1
            acc = acc + jnp.where(lo_arm >= -t, r, zero)
            r = jnp.roll(r, -1, axis=axis)  # advance t by +1
            return acc, r

        acc, _ = jax.lax.fori_loop(
            0, max_arm, neg_body,
            (jnp.zeros_like(p), jnp.roll(p, max_arm, axis=axis)),
        )
        acc = acc + p  # t = 0

        def pos_body(i, carry):
            acc, r = carry
            t = i + 1  # t = 1 .. max_arm
            r = jnp.roll(r, -1, axis=axis)
            acc = acc + jnp.where(hi_arm >= t, r, zero)
            return acc, r

        acc, _ = jax.lax.fori_loop(0, max_arm, pos_body, (acc, p))
        return acc
    acc = jnp.zeros_like(p)
    for t in range(-max_arm, max_arm + 1):
        if t == 0:
            acc = acc + p
            continue
        rolled_p = jnp.roll(p, -t, axis=axis)
        cond = lo_arm >= -t if t < 0 else hi_arm >= t
        acc = acc + jnp.where(cond, rolled_p, zero)
    return acc


def cross_pass_ref(
    vol: jnp.ndarray,
    arms: jnp.ndarray,
    sup: jnp.ndarray,
    horizontal_first: bool,
    max_arm: int,
    normalize: bool = True,
) -> jnp.ndarray:
    """Pure-jnp reference implementation of ``cross_pass`` (used on CPU and
    for kernel validation); numerically identical to the Pallas kernel."""
    al = arms[..., 0].astype(jnp.int32)
    ar = arms[..., 1].astype(jnp.int32)
    at = arms[..., 2].astype(jnp.int32)
    ab = arms[..., 3].astype(jnp.int32)
    if horizontal_first:
        tmp = _masked_roll_sum_jnp(vol, al, ar, 2, max_arm)
        res = _masked_roll_sum_jnp(tmp, at, ab, 1, max_arm)
    else:
        tmp = _masked_roll_sum_jnp(vol, at, ab, 1, max_arm)
        res = _masked_roll_sum_jnp(tmp, al, ar, 2, max_arm)
    if normalize:
        res = res / sup.astype(jnp.float32)
    return res


def cross_pass(
    vol: jnp.ndarray,
    arms: jnp.ndarray,
    sup: jnp.ndarray,
    horizontal_first: bool,
    max_arm: int,
    normalize: bool = True,
    use_pallas: bool | None = None,
    masks=None,
) -> jnp.ndarray:
    """One cross-aggregation iteration over a (D, H, W) volume.

    arms: (H, W, 4) int (left, right, top, bottom); sup: (H, W) float32
    support counts matching ``horizontal_first``. Backends (see
    ops.basic.resolve_cross_backend): "matmul" (MXU band matrices, the
    TPU default), "pallas" (bit-exact masked-roll kernel), "jnp"
    (bit-exact roll mirror, the CPU default). ``masks`` are prebuilt
    band matrices for the matmul backend.
    """
    from adcensus_tpu.ops.basic import resolve_cross_backend
    from adcensus_tpu.ops.cross_matmul import cross_pass_matmul

    backend = resolve_cross_backend(use_pallas)
    if backend == "pallas" and max_arm > 127:
        # the roll kernel stores arms as int8; past 127 use the exact
        # jnp mirror so explicit use_pallas=True keeps bit-exactness
        backend = "jnp"
    if backend == "matmul":
        return cross_pass_matmul(
            vol, arms, sup, horizontal_first, max_arm, normalize,
            masks=masks,
        )
    if backend == "jnp":
        return cross_pass_ref(
            vol, arms, sup, horizontal_first, max_arm, normalize
        )
    return _cross_pass_pallas(
        vol, arms, sup, horizontal_first, max_arm, normalize
    )


@functools.partial(
    jax.jit,
    static_argnames=("horizontal_first", "max_arm", "normalize",
                     "k_planes"),
)
def _cross_pass_pallas(
    vol: jnp.ndarray,
    arms: jnp.ndarray,
    sup: jnp.ndarray,
    horizontal_first: bool,
    max_arm: int,
    normalize: bool = True,
    k_planes: int | None = None,
) -> jnp.ndarray:
    d, h, w = vol.shape
    # K=1: rank-2 bodies only. Rank-3 blocks cost Mosaic extra VMEM
    # copies (a 555x653 rank-3 block OOMs scoped VMEM at K=1) and the
    # measured K=2 mask-amortization gain is gone in the current kernel
    # (8.0 ms vs 8.2 ms per pass on Cone, K=1 slightly ahead).
    k = k_planes or 1
    arm_plane = pl.BlockSpec((h, w), lambda i: (0, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _cross_pass_kernel,
        horizontal_first=horizontal_first,
        max_arm=max_arm,
        normalize=normalize,
    )
    return pl.pallas_call(
        kernel,
        grid=(d // k,),
        in_specs=[
            arm_plane, arm_plane, arm_plane, arm_plane, arm_plane,
            pl.BlockSpec((k, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (k, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((d, h, w), jnp.float32),
        interpret=_use_interpret(),
    )(
        arms[..., 0].astype(jnp.int8),
        arms[..., 1].astype(jnp.int8),
        arms[..., 2].astype(jnp.int8),
        arms[..., 3].astype(jnp.int8),
        sup.astype(jnp.float32),
        vol,
    )
