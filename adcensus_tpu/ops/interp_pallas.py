"""Pallas TPU kernel: 16-ray proper-interpolation fill search.

The XLA formulation of ProperInterpolation (multistep_refiner.cpp:229-305)
marches 16 rays x up to max_disparity steps, each step dynamic-slicing the
padded disparity/color maps from HBM — ~12 ms of slice traffic on Cone.
Here the padded maps sit in VMEM for the whole search: the grid runs the
16 rays sequentially, and the cross-ray selection (first-minimum color
distance for mismatches, minimum disparity for occlusions —
multistep_refiner.cpp:276-296) is reduced directly into the output block.

The per-step cost is VPU-bound (each dynamic-offset load is an aligned
block load + two lane/sublane rotates). The march is a chunked
``while_loop``: 16 steps per chunk, then one liveness reduction ("any
target pixel not yet hit whose ray is still in-image?"). Real maps hit
within a few dozen steps while n_steps is max_disparity-1, so
high-disparity configs stop after 3-5 chunks instead of marching all
255 (Piano D=256: 36.7 ms -> see BENCH_DETAIL.md); low-D configs run
essentially the full range either way (every ray's p100 is 50-63 steps
of 63 on Cone) and pay only one cheap reduction per 16 steps. The
kernel halves the dominant load count too: the 3 uint8 color channels
travel as ONE int32 plane
(r | g<<8 | b<<16), unpacked with shifts after the rotate, so a
mismatch step is 2 dynamic-offset loads instead of 4. ``target``
marks the pixels whose fills are actually read (the caller writes
``where(target, fill, disp)``); hits elsewhere are masked from the
output. The caller pads with NaN beyond the border (in-image invalids
are +inf), matching the reference's break-on-exit: a NaN cell can
never be taken, and a straight ray never re-enters the image.

High-disparity configs (Piano d=[0,256) has pad = 257) would blow the
VMEM budget if the maps carried 2*pad of physical NaN padding, so a
second **coordinate mode** stores the maps with only small alignment
margins: loads clamp their start into the buffer and a per-step
coordinate-rectangle mask plays the role of the NaN moat (wrapped /
clamped rows are exactly the out-of-image probes, so the mask also
hides rotate wraparound). Costs a few extra VPU compares per step;
only used when the padded form does not fit. Falls back to the XLA
path only when even the margin-only maps exceed VMEM.
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
    row0_ref, offs_ref, tgt_ref, disp_ref, cpk_ref, out_ref,
    *, r: int, w: int, pad: int, n_steps: int, is_mismatch: bool,
    bounds: tuple | None = None,
):
    ray = pl.program_id(0)
    row0 = row0_ref[0]

    rl = -(-(r + 8) // 8) * 8        # block rows, 8-aligned
    wl = -(-w // 128) * 128 + 128    # block cols, 128-aligned
    hp_buf, wp_buf = disp_ref.shape

    def shifted(ref, dy, dx):
        """ref[base+row0+dy : +r, base+dx : +w] with arbitrary offsets:
        Mosaic requires dynamic-slice starts AND rotate shapes aligned
        to the (8, 128) tile, so load an aligned (rl, wl) block and
        rotate the residues away (the caller padded rl-r extra bottom
        rows and wl-w extra right columns so the block stays in
        bounds). In coordinate mode (bounds != None) the start is also
        clamped into the buffer; wrapped/clamped cells are exactly the
        out-of-image probes, masked by the coordinate rectangle."""
        base = 0 if bounds is not None else pad
        s = base + row0 + dy
        s8 = (s // 8) * 8
        t = base + dx
        t128 = (t // 128) * 128
        if bounds is not None:
            s8 = jnp.clip(s8, 0, hp_buf - rl)
            t128 = jnp.clip(t128, 0, wp_buf - wl)
        s8 = pl.multiple_of(s8, 8)
        t128 = pl.multiple_of(t128, 128)
        blk = ref[pl.ds(s8, rl), pl.ds(t128, wl)]
        blk = pltpu.roll(blk, (rl - (s - s8)) % rl, axis=0)
        blk = pltpu.roll(blk, (wl - (t - t128)) % wl, axis=1)
        return blk[:r, :w]

    def unpack(ci):
        return ci & 0xFF, (ci >> 8) & 0xFF, (ci >> 16) & 0xFF

    if is_mismatch:
        cen = unpack(shifted(cpk_ref, 0, 0))
    if bounds is not None:
        h_img, w_img = bounds
        ii = (
            jax.lax.broadcasted_iota(jnp.int32, (r, w), 0) + row0
        )  # image row of each output pixel
        jj = jax.lax.broadcasted_iota(jnp.int32, (r, w), 1)

    tgt = tgt_ref[...] > 0.0

    def step(j, carry):
        # "found" is implicit: key stays exactly BIG until the first
        # take (dist <= 765 and disparities << BIG), so key >= BIG is
        # the not-yet-hit mask — one carry plane and one update per
        # step cheaper than an explicit found carry. In occlusion mode
        # the selection key IS the candidate disparity, so val is
        # dropped too and the fill is read from key.
        val, key = carry
        dy = offs_ref[0, j, 0]
        dx = offs_ref[0, j, 1]
        cand = shifted(disp_ref, dy, dx)
        valid = jnp.isfinite(cand)
        if bounds is not None:
            ri = ii + dy
            ci = jj + dx
            in_img = (
                (ri >= 0) & (ri < h_img) & (ci >= 0) & (ci < w_img)
            )
            valid = valid & in_img
        take = valid & (key >= BIG)
        if is_mismatch:
            val = jnp.where(take, cand, val)
            cr, cg, cb = unpack(shifted(cpk_ref, dy, dx))
            dist = (
                jnp.abs(cr - cen[0])
                + jnp.abs(cg - cen[1])
                + jnp.abs(cb - cen[2])
            )
            key = jnp.where(take, dist.astype(jnp.float32), key)
        else:
            key = jnp.where(take, cand, key)
        return val, key

    # Chunked early-exit march: K steps per chunk, then one liveness
    # check — "does any TARGET pixel still lack a hit on a ray that is
    # still inside the image?". Real maps hit within a few dozen steps
    # while n_steps is max_disparity-1 (255 for D=256 configs), so the
    # march usually stops after 3-5 chunks; a straight fori_loop paid
    # the full 255 regardless (round-4 BENCH_DETAIL: Piano256 interp
    # 36.7 ms). Re-running a step is idempotent (take needs key >= BIG),
    # so the final chunk clamps its step index instead of shortening.
    # Liveness is structural too: once a straight ray leaves the image
    # it never re-enters (NaN moat / coordinate rectangle), so a pixel
    # whose ray has exited can never hit and must not keep the loop
    # alive.
    K = 16

    def chunk_cond(carry):
        j, _, _, live = carry
        return (j < n_steps) & live

    def chunk_body(carry):
        j, val, key, _ = carry
        val, key = jax.lax.fori_loop(
            0,
            K,
            lambda k, c: step(jnp.minimum(j + k, n_steps - 1), c),
            (val, key),
        )
        last = jnp.minimum(j + K - 1, n_steps - 1)
        dy = offs_ref[0, last, 0]
        dx = offs_ref[0, last, 1]
        if bounds is not None:
            still_in = (
                (ii + dy >= 0)
                & (ii + dy < h_img)
                & (jj + dx >= 0)
                & (jj + dx < w_img)
            )
        else:
            still_in = ~jnp.isnan(shifted(disp_ref, dy, dx))
        live_px = tgt & (key >= BIG) & still_in
        live = jnp.max(live_px.astype(jnp.int32)) > 0
        return j + K, val, key, live

    init = (
        jnp.int32(0),
        jnp.zeros((r, w), jnp.float32),
        jnp.full((r, w), BIG, jnp.float32),
        jnp.max(tgt.astype(jnp.int32)) > 0,
    )
    _, val, key, _ = jax.lax.while_loop(chunk_cond, chunk_body, init)
    if not is_mismatch:
        val = key  # occlusion: selection key == candidate disparity
    found = (key < BIG) & (tgt_ref[...] > 0.0)

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
    jax.jit, static_argnames=("r", "w", "pad", "is_mismatch", "bounds")
)
def _ray_interp_pallas(
    disp_pad: jnp.ndarray,
    color_pad: jnp.ndarray,
    offsets: jnp.ndarray,
    target: jnp.ndarray,
    row_offset: jnp.ndarray,
    r: int,
    w: int,
    pad: int,
    is_mismatch: bool,
    bounds: tuple | None = None,
):
    hp, wp = disp_pad.shape
    n_rays, n_steps, _ = offsets.shape
    c = color_pad.astype(jnp.int32)
    packed = c[..., 0] | (c[..., 1] << 8) | (c[..., 2] << 16)
    kernel = functools.partial(
        _ray_interp_kernel,
        r=r, w=w, pad=pad, n_steps=n_steps, is_mismatch=is_mismatch,
        bounds=bounds,
    )
    full = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_rays,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # row_offset (1,)
            # one ray's offsets per grid step: the full table exceeds
            # the 1 MB SMEM at n_steps 127 (SMEM pads each element to
            # ~512 B)
            pl.BlockSpec(
                (1, n_steps, 2), lambda i: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            full((r, w)),
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
        target.astype(jnp.float32),
        disp_pad,
        packed,
    )
    found = out[2] > 0.0
    return found, out[0], out[1]


_VMEM_BUDGET = 12e6  # scoped-VMEM limit is ~16 MB; leave headroom


def _block_dims(r: int, w: int):
    """Aligned (rl, wl) load-block dims for r output rows."""
    rl = -(-(r + 8) // 8) * 8
    wl = -(-w // 128) * 128 + 128
    return rl, wl


def _state_bytes(r: int, w: int) -> int:
    """Loop carries (3) + out block (3) + unpacked centers (3) + live
    temps (~2), each an (r, w) 32-bit plane, plus two live aligned
    load blocks."""
    rl, wl = _block_dims(r, w)
    return 11 * r * w * 4 + 2 * rl * wl * 4


def padded_buffer_dims(h: int, w: int, pad: int, r: int):
    """(H', W') of the padded-mode buffers: 2*pad NaN moat plus the
    bottom/right margins that keep aligned (rl, wl) loads in bounds."""
    rl, wl = _block_dims(r, w)
    return h + 2 * pad + rl + 8, w + 2 * pad + (wl - w)


def ray_interp_fits_vmem(h: int, w: int, pad: int, r: int) -> bool:
    """VMEM budget for padded mode with r output rows per kernel call
    (callers chunk rows so the state shrinks; the resident maps always
    hold the full padded image)."""
    hb, wb = padded_buffer_dims(h, w, pad, r)
    resident = hb * wb * (4 + 4)  # f32 disp + packed int32 colors
    return resident + _state_bytes(r, w) <= _VMEM_BUDGET


def coord_buffer_dims(h_img: int, w: int, r: int):
    """(H', W') of the margin-only buffers for coordinate mode: tall
    enough for clamped aligned (rl, wl) block loads, no ray padding."""
    rl, wl = _block_dims(r, w)
    hb = max(-(-h_img // 8) * 8 + 8, rl)
    return hb, wl


def coord_interp_fits_vmem(h_img: int, w: int, r: int) -> bool:
    """VMEM budget for coordinate mode (pad-independent)."""
    hb, wb = coord_buffer_dims(h_img, w, r)
    resident = hb * wb * (4 + 4)
    return resident + _state_bytes(r, w) <= _VMEM_BUDGET


def pick_row_chunk(fits, r: int, min_chunk: int = 32):
    """Largest row-chunk size (halving from r) whose kernel state fits
    the VMEM budget, or None if even ``min_chunk`` does not fit.
    ``fits``: callable r_chunk -> bool."""
    rc = r
    while rc >= min_chunk:
        if fits(rc):
            return rc
        rc = -(-rc // 2)
        if rc == r:  # safety for tiny r
            break
    return min_chunk if fits(min_chunk) else None


def ray_interp_select(
    disp_pad: jnp.ndarray,
    color_pad: jnp.ndarray,
    offsets: jnp.ndarray,
    row_offset,
    r: int,
    w: int,
    pad: int,
    is_mismatch: bool,
    target: jnp.ndarray | None = None,
    bounds: tuple | None = None,
):
    """(found_any, fill_val) for rows [row_offset, row_offset+r).

    Padded mode (bounds None): disp_pad is (H+2pad, W+2pad) f32, NaN
    beyond the border, +inf for in-image invalids. Coordinate mode
    (bounds = (h_img, w_img)): disp_pad carries only alignment margins
    (see coord_buffer_dims) and out-of-image probes are masked by
    coordinates instead of NaN cells. color_pad: same spatial shape,
    (…, 3) uint8; target: (r, w) bool — pixels whose fills will
    actually be read (None = all).
    """
    if target is None:
        target = jnp.ones((r, w), bool)
    found, fill, _ = _ray_interp_pallas(
        disp_pad,
        color_pad,
        offsets,
        target,
        jnp.asarray(row_offset),
        r,
        w,
        pad,
        is_mismatch,
        bounds=bounds,
    )
    return found, fill
