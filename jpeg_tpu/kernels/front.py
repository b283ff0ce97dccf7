"""Pallas analyze front: raw u8 batch -> transposed pixel-block layout.

Replaces the XLA ``pipelines.fast.analyze_px`` + ``fused._dct_front``
prologue for the fully-fused encode path.  XLA:TPU's codegen for the
channel deinterleave + 8x8 blocking + MCU interleave + [nblk, 64] ->
[64, nblk] transpose costs ~4 ms for a 6.55 MP batch (measured
2026-08-17 with the cache-proof fori-slope methodology) even though the
pure HBM traffic is <0.2 ms; this kernel does the same relayout with
MXU permutation matmuls, XLU 2D transposes, and aligned slice/concats
in a few hundred microseconds.

Layout algebra (the whole kernel is this observation): moving a LEADING
row factor into lanes (or a leading lane factor into rows) is free —
aligned slices + concat; only MINOR factors are expensive to move.  So
every exchange is phrased as: make the factor leading (0/1 permutation
matmul on the matching side), transpose if it must switch sides, then
slice + concat.  All matmuls are 0/1 matrices against integer-valued
operands bounded by 256, which bf16 represents exactly, so the MXU's
bf16 default loses nothing and every emitted pixel value is bit-identical
to the XLA front's.

Color math mirrors ``ops.color.rgb_to_ycbcr_444`` expression-for-
expression (reference: utils/original.c:372-404); chroma subsampling
reproduces the 2x2 truncating average exactly in f32 (all intermediate
sums are small integers, exact in f32).

Coverage: 4:2:0, interleaved, one segment per image, W % 128 == 0,
H % 128 == 0, W <= 1280 (VMEM for the [W, W] lane permutation).
``front_eligible`` gates callers; everything else falls back to the XLA
front.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_W = 1280


def front_eligible(height: int, width: int, sampling: str,
                   n_segs_per_image: int) -> bool:
    return (sampling == "420" and n_segs_per_image == 1
            and width % 128 == 0 and height % 128 == 0
            and width <= _MAX_W)


@functools.lru_cache(maxsize=8)
def _consts(mx: int, bf16: bool = True):
    """0/1 permutation matrices (numpy, cached per geometry)."""
    W = 16 * mx
    # Deinterleave: 384 interleaved RGB lanes (128 px) -> R|G|B 128 each.
    sel = np.zeros((384, 384), np.float32)
    for j in range(128):
        for c in range(3):
            sel[3 * j + c, c * 128 + j] = 1.0
    # Y lane perm: (m, dh, px) -> (px, m, dh).
    r1y = np.zeros((W, W), np.float32)
    for m in range(mx):
        for dh in range(2):
            for px in range(8):
                r1y[16 * m + 8 * dh + px, px * 2 * mx + 2 * m + dh] = 1.0
    # Chroma lane perm: (m, pcol) -> (pcol, m).
    r1c = np.zeros((W // 2, W // 2), np.float32)
    for m in range(mx):
        for pcol in range(8):
            r1c[8 * m + pcol, pcol * mx + m] = 1.0
    # Chroma horizontal pair sum.
    ps2 = np.zeros((W, W // 2), np.float32)
    for j in range(W // 2):
        ps2[2 * j, j] = 1.0
        ps2[2 * j + 1, j] = 1.0
    # Chroma row compaction: (t, 2*prow) -> (t, prow).
    lc2 = np.zeros((64, 128), np.float32)
    for t in range(8):
        for prow in range(8):
            lc2[8 * t + prow, 16 * t + 2 * prow] = 1.0
    # Final per-MCU-row window perms: lanes -> cols 6m+q of the window.
    rny = np.zeros((4 * mx, 6 * mx), np.float32)   # (dv, m, dh) -> 6m+2dv+dh
    for dv in range(2):
        for m in range(mx):
            for dh in range(2):
                rny[dv * 2 * mx + 2 * m + dh, 6 * m + 2 * dv + dh] = 1.0
    rcb = np.zeros((mx, 6 * mx), np.float32)
    rcr = np.zeros((mx, 6 * mx), np.float32)
    for m in range(mx):
        rcb[m, 6 * m + 4] = 1.0
        rcr[m, 6 * m + 5] = 1.0
    dt = jnp.bfloat16 if bf16 else jnp.float32
    return tuple(jnp.asarray(a, dt)
                 for a in (sel, r1y, r1c, ps2, lc2, rny, rcb, rcr))


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _b16(x, bf16: bool = True):
    # bf16 operands are exact for the 0/1 matrices and the integer-valued
    # pixel data (all |values| <= 256); interpret mode (CPU tests) keeps
    # f32 because XLA:CPU has no bf16 x bf16 -> f32 dot.
    return x.astype(jnp.bfloat16) if bf16 else x


def _row_interleave8(pieces, rows, cols):
    """8 x [rows, cols] -> [8*rows, cols] with out[r] = pieces[r % 8][r // 8]."""
    su = jax.lax.broadcasted_iota(jnp.int32, (8 * rows, cols), 0)
    out = jnp.zeros((8 * rows, cols), jnp.float32)
    for i, p in enumerate(pieces):
        out = jnp.where(su % 8 == i, jnp.repeat(p, 8, axis=0), out)
    return out


def _y_path(y, r1y, mx, bf16):
    """Y plane [128, W] (rows 16t+8dv+py, lanes 16m+8dh+px) ->
    8 per-MCU-row pieces [64, 4mx] (rows py*8+px, lanes (dv, m, dh))."""
    W = 16 * mx
    y1 = _dot(_b16(y, bf16), r1y)          # [128, W] lanes (px, m, dh)
    yT = y1.T                        # [W, 128] rows (px, m, dh)
    ts = []
    for px in range(8):
        s = yT[px * 2 * mx:(px + 1) * 2 * mx]    # [2mx, 128] rows (m, dh)
        sT = s.T                                 # [128, 2mx] rows (t, dv, py)
        # leading (t, dv) rows -> lanes: slice + concat
        ts.append(jnp.concatenate(
            [sT[8 * k:8 * (k + 1)] for k in range(16)], axis=1))
        # [8, 32mx] rows py, lanes (t, dv, m, dh)
    yb = _row_interleave8(ts, 8, 32 * mx)        # [64, 32mx] rows (py, px)
    return [yb[:, t * 4 * mx:(t + 1) * 4 * mx] for t in range(8)]


def _c_path(c, r1c, ps2, lc2, mx, bf16):
    """Chroma plane [128, W] -> 8 pieces [64, mx] (rows prow*8+pcol, lanes m).

    Exact 2x2 truncating average (utils/original.c:393-404): horizontal
    pair sums ride a 0/1 matmul on values shifted by -128 (sums in
    [-256, 254], bf16-exact), the vertical pair adds in f32, and
    (sum4 + 512) * 0.25 floored recovers (a+b+c+d)//4 exactly.
    """
    W = 16 * mx
    ps = _dot(_b16(c - 128.0, bf16), ps2)              # [128, W/2] pair sums - 256
    ps_tot = ps + pltpu.roll(ps, 127, axis=0)    # row r += row r+1
    csub = jnp.floor((ps_tot + 512.0) * 0.25)    # ints 0..255 at even rows
    c1 = _dot(_b16(csub, bf16), r1c)                   # lanes (pcol, m)
    c2 = _dot(lc2, _b16(c1, bf16))                     # [64, W/2] rows (t, prow)
    cT = c2.T                                    # [W/2, 64] rows (pcol, m)
    ts = []
    for pcol in range(8):
        s = cT[pcol * mx:(pcol + 1) * mx]        # [mx, 64] rows m
        sT = s.T                                 # [64, mx] rows (t, prow)
        ts.append(jnp.concatenate(
            [sT[8 * t:8 * (t + 1)] for t in range(8)], axis=1))
        # [8, 8mx] rows prow, lanes (t, m)
    zb = _row_interleave8(ts, 8, 8 * mx)         # [64, 8mx] rows (prow, pcol)
    return [zb[:, t * mx:(t + 1) * mx] for t in range(8)]


def _front_kernel(sel_ref, r1y_ref, r1c_ref, ps2_ref, lc2_ref, rny_ref,
                  rcb_ref, rcr_ref, in_ref, out_ref, *, mx: int,
                  bf16: bool):
    W = 16 * mx
    # Mosaic has no direct u8 -> f32 cast; hop through int32
    x = in_ref[0].astype(jnp.int32).astype(jnp.float32)  # [128, W*3]
    parts = [_dot(_b16(x[:, g * 384:(g + 1) * 384], bf16), sel_ref[:])
             for g in range(W * 3 // 384)]
    r = jnp.concatenate([p[:, :128] for p in parts], axis=1).astype(jnp.int32)
    g = jnp.concatenate([p[:, 128:256] for p in parts],
                        axis=1).astype(jnp.int32)
    b = jnp.concatenate([p[:, 256:384] for p in parts],
                        axis=1).astype(jnp.int32)
    # exact mirror of ops.color.rgb_to_ycbcr_444's fixed-point f32 path
    # (deterministic integer arithmetic — see that docstring)
    y_t = 299 * r + 587 * g + 114 * b
    y = jnp.floor(y_t.astype(jnp.float32) / 1000.0)
    cb_t = 128_000_000 + (-168736 * r - 331264 * g + 500000 * b)
    cr_t = 128_000_000 + (500000 * r - 418688 * g - 81312 * b)
    cb = jnp.floor((cb_t >> 6).astype(jnp.float32) / 15625.0)
    cr = jnp.floor((cr_t >> 6).astype(jnp.float32) / 15625.0)

    ypieces = _y_path(y, r1y_ref[:], mx, bf16)
    cbpieces = _c_path(cb, r1c_ref[:], ps2_ref[:], lc2_ref[:], mx, bf16)
    crpieces = _c_path(cr, r1c_ref[:], ps2_ref[:], lc2_ref[:], mx, bf16)
    windows = []
    for t in range(8):
        w = _dot(_b16(ypieces[t], bf16), rny_ref[:])
        w = w + _dot(_b16(cbpieces[t], bf16), rcb_ref[:])
        w = w + _dot(_b16(crpieces[t], bf16), rcr_ref[:])
        windows.append(w)                        # [64, 6mx]
    out_ref[:] = jnp.concatenate(windows, axis=1)


@functools.partial(jax.jit, static_argnames=("mx", "my", "interpret"))
def front_420(batch_flat, mx: int, my: int, interpret: bool = False):
    """[B, H, W*3] u8 -> xt [64, B*my*6*mx] f32 (MCU-interleaved,
    transposed, un-level-shifted pixel blocks; block column order is the
    T.81 A.2.3 interleaved MCU scan: per MCU Y00 Y01 Y10 Y11 Cb Cr).

    Grid walks (image, 8-MCU-row slab); each step's [64, 48mx] output
    block lands at 128-aligned columns because mx % 8 == 0.
    """
    B = batch_flat.shape[0]
    W = 16 * mx
    if batch_flat.shape[1] != 16 * my or batch_flat.shape[2] != W * 3:
        raise ValueError(f"batch {batch_flat.shape} != geometry "
                         f"{16*my}x{W}*3")
    if not front_eligible(16 * my, W, "420", 1):
        raise ValueError("geometry not front-eligible")
    consts = _consts(mx, bf16=not interpret)
    G = my // 8
    cspecs = [pl.BlockSpec(c.shape, lambda b, g: (0,) * c.ndim,
                           memory_space=pltpu.VMEM) for c in consts]
    out = pl.pallas_call(
        functools.partial(_front_kernel, mx=mx, bf16=not interpret),
        out_shape=jax.ShapeDtypeStruct((64, B * G * 48 * mx), jnp.float32),
        grid=(B, G),
        in_specs=cspecs + [
            pl.BlockSpec((1, 128, W * 3), lambda b, g: (b, g, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64, 48 * mx),
                               lambda b, g, G=G: (0, b * G + g),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*consts, batch_flat)
    return out
