"""Pallas TPU kernel: 16-ray proper-interpolation fill search.

The XLA formulation of ProperInterpolation (multistep_refiner.cpp:229-305)
marches 16 rays x up to max_disparity steps, each step dynamic-slicing the
padded disparity/color maps from HBM — ~12 ms of slice traffic on Cone.
Here the padded maps sit in VMEM for the whole search: the grid runs the
16 rays sequentially, each ray is an early-exiting while_loop over steps,
and the cross-ray selection (first-minimum color distance for mismatches,
minimum disparity for occlusions — multistep_refiner.cpp:276-296) is
reduced directly into the output block, exactly like the voting kernel.

Falls back to the XLA path when the padded maps exceed the VMEM budget
(high-disparity configs like Piano d=[0,256) have pad = 257).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.0e38  # plain float: jnp constants get captured by pallas kernels


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _ray_interp_kernel(
    row0_ref, offs_ref, disp_ref, c0_ref, c1_ref, c2_ref, out_ref,
    *, r: int, w: int, pad: int, n_steps: int, is_mismatch: bool,
):
    ray = pl.program_id(0)
    row0 = row0_ref[0]

    rl = -(-(r + 8) // 8) * 8        # block rows, 8-aligned
    wl = -(-w // 128) * 128 + 128    # block cols, 128-aligned

    def shifted(ref, dy, dx):
        """ref[pad+row0+dy : +r, pad+dx : +w] with arbitrary offsets:
        Mosaic requires dynamic-slice starts AND rotate shapes aligned
        to the (8, 128) tile, so load an aligned (rl, wl) block and
        rotate the residues away (the caller padded rl-r extra bottom
        rows and wl-w extra right columns so the block stays in
        bounds)."""
        s = pad + row0 + dy
        s8 = pl.multiple_of((s // 8) * 8, 8)
        t = pad + dx
        t128 = pl.multiple_of((t // 128) * 128, 128)
        blk = ref[pl.ds(s8, rl), pl.ds(t128, wl)]
        if blk.dtype == jnp.uint8:  # dynamic rotate needs 32-bit data
            blk = blk.astype(jnp.int32)
        blk = pltpu.roll(blk, rl - (s - s8), axis=0)
        blk = pltpu.roll(blk, wl - (t - t128), axis=1)
        return blk[:r, :w]

    if is_mismatch:
        cen = [shifted(c_ref, 0, 0) for c_ref in (c0_ref, c1_ref, c2_ref)]

    def body(j, carry):
        # found carried as f32 0/1: Mosaic miscompiles (r, w) i1 loop
        # carries (rank-3 packed-bool ori type mismatch)
        found, val, key = carry
        dy = offs_ref[ray, j, 0]
        dx = offs_ref[ray, j, 1]
        cand = shifted(disp_ref, dy, dx)
        valid = jnp.isfinite(cand)
        take = valid & (found == 0.0)
        val = jnp.where(take, cand, val)
        if is_mismatch:
            dist = jnp.zeros((r, w), jnp.int32)
            for c_ref, cen_c in zip((c0_ref, c1_ref, c2_ref), cen):
                cc = shifted(c_ref, dy, dx)  # already int32
                dist = dist + jnp.abs(cc - cen_c)
            key = jnp.where(take, dist.astype(jnp.float32), key)
        else:
            key = jnp.where(take, cand, key)
        return jnp.maximum(found, valid.astype(jnp.float32)), val, key

    # fori, not while: Mosaic cannot lower scf.while with vector carries
    init = (
        jnp.zeros((r, w), jnp.float32),
        jnp.zeros((r, w), jnp.float32),
        jnp.full((r, w), BIG, jnp.float32),
    )
    found, val, key = jax.lax.fori_loop(0, n_steps, body, init)
    found = found > 0.0

    @pl.when(ray == 0)
    def _():
        out_ref[0] = jnp.zeros((r, w), jnp.float32)  # selected fill
        out_ref[1] = jnp.full((r, w), BIG, jnp.float32)  # best key
        out_ref[2] = jnp.zeros((r, w), jnp.float32)  # found_any

    keyf = jnp.where(found, key, BIG)
    upd = keyf < out_ref[1]  # strict: first ray wins ties (ray order)
    out_ref[0] = jnp.where(upd, val, out_ref[0])
    out_ref[1] = jnp.where(upd, keyf, out_ref[1])
    out_ref[2] = jnp.maximum(
        out_ref[2], found.astype(jnp.float32)
    )


@functools.partial(
    jax.jit, static_argnames=("r", "w", "pad", "is_mismatch")
)
def _ray_interp_pallas(
    disp_pad: jnp.ndarray,
    color_pad: jnp.ndarray,
    offsets: jnp.ndarray,
    row_offset: jnp.ndarray,
    r: int,
    w: int,
    pad: int,
    is_mismatch: bool,
):
    hp, wp = disp_pad.shape
    n_rays, n_steps, _ = offsets.shape
    kernel = functools.partial(
        _ray_interp_kernel,
        r=r, w=w, pad=pad, n_steps=n_steps, is_mismatch=is_mismatch,
    )
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_rays,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # row_offset (1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # offsets table
            full((hp, wp)),
            full((hp, wp)),
            full((hp, wp)),
            full((hp, wp)),
        ],
        out_specs=pl.BlockSpec(
            (3, r, w), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, r, w), jnp.float32),
        interpret=_use_interpret(),
    )(
        row_offset.astype(jnp.int32).reshape(1),
        offsets.astype(jnp.int32),
        disp_pad,
        color_pad[..., 0],
        color_pad[..., 1],
        color_pad[..., 2],
    )
    found = out[2] > 0.0
    return found, out[0], out[1]


def ray_interp_fits_vmem(h: int, w: int, pad: int) -> bool:
    """Conservative VMEM budget for the resident padded maps + state."""
    hp, wp = h + 2 * pad, w + 2 * pad
    resident = hp * wp * (4 + 3)  # f32 disp + 3 uint8 color planes
    state = 10 * h * w * 4       # carries, out block, slice temps
    return resident + state <= 11e6


def ray_interp_select(
    disp_pad: jnp.ndarray,
    color_pad: jnp.ndarray,
    offsets: jnp.ndarray,
    row_offset,
    r: int,
    w: int,
    pad: int,
    is_mismatch: bool,
):
    """(found_any, fill_val) for rows [row_offset, row_offset+r).

    disp_pad: (H+2pad, W+2pad) f32 with Invalid_Float padding;
    color_pad: same spatial shape, (…, 3) uint8 (zero padding).
    """
    found, fill, _ = _ray_interp_pallas(
        disp_pad,
        color_pad,
        offsets,
        jnp.asarray(row_offset),
        r,
        w,
        pad,
        is_mismatch,
    )
    return found, fill
