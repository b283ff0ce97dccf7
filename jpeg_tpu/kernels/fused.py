"""Fused Huffman attach + parallel pack (transposed layout end to end).

Two Pallas phases with one tiny XLA prefix-sum between them (the global
block bit offsets force a barrier):

  A. ``_attach_bits_kernel``: combined-LUT lane-gather, codeword/amplitude
     field assembly, and per-block bit totals — slots on sublanes, blocks
     on lanes, so the bit totals are one sublane reduction and the outputs
     are already in the layout phase B consumes (no 39 MB relayouts).
  B. ``_place_kernel``: the transposed local pack + shift/rotate of
     ``kernels.pack._pack_kernel_t``, reading phase A's outputs directly.

Only used for a single shared LUT (fixed-table mode); per-image dynamic
tables go through ``lut.attach_grouped`` + ``pack.pack_segments``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lut import NULL_INDEX
from .pack import LOCAL_WORDS, _cumsum_sublanes, _sub_iota

_TB = 128  # blocks per tile (lanes); fixed: the LUT lane-gather needs 128


def _attach_bits_kernel(lut_ref, idx_ref, extra_ref, extran_ref,
                        value_ref, nbits_ref, bits_ref):
    t = lut_ref[:]            # [8, 128]
    idx = idx_ref[:]          # [64, TB]
    hi = idx >> 7
    lo = idx & 127
    entry = jnp.zeros_like(idx)
    for r in range(8):
        rowb = jnp.broadcast_to(t[r, :][None, :], idx.shape)
        g = jnp.take_along_axis(rowb, lo, axis=1)
        entry = jnp.where(hi == r, g, entry)
    en = extran_ref[:]
    nb = (entry >> 16) + en
    value_ref[:] = ((entry & 0xFFFF) << en) | extra_ref[:]
    nbits_ref[:] = nb
    bits_ref[:] = jnp.sum(nb, axis=0, keepdims=True, dtype=jnp.int32)


def _place_kernel(value_ref, nbits_ref, goff_ref, r0_ref, r1_ref):
    """Transposed local pack + placement (see pack._pack_kernel_t)."""
    shr = jax.lax.shift_right_logical
    v = value_ref[:]                          # [64, TB] int32
    nb = nbits_ref[:]
    goff = goff_ref[:]                        # [1, TB]

    ends = _cumsum_sublanes(nb)
    offs = ends - nb
    w = shr(offs, jnp.int32(5))
    ein = (offs & 31) + nb
    hi = jnp.where(ein <= 32, v << jnp.clip(32 - ein, 0, 31),
                   shr(v, jnp.clip(ein - 32, 0, 31)))
    lo = jnp.where(ein > 32, v << jnp.clip(64 - ein, 0, 31), 0)

    rows = []
    for j in range(LOCAL_WORDS):
        cj = jnp.sum(jnp.where(w == j, hi, 0), axis=0, keepdims=True,
                     dtype=jnp.int32)
        if j > 0:
            cj = cj + jnp.sum(jnp.where(w == j - 1, lo, 0), axis=0,
                              keepdims=True, dtype=jnp.int32)
        rows.append(cj)
    tb = v.shape[1]
    lw = jnp.concatenate(
        rows + [jnp.zeros((128 - LOCAL_WORDS, tb), jnp.int32)], axis=0)

    sub = _sub_iota((128, tb))
    s = goff & 31
    prev = pltpu.roll(lw, 1, axis=0)
    prev = jnp.where(sub == 0, 0, prev)
    shifted = jnp.where(s == 0, lw, shr(lw, s) | (prev << ((32 - s) & 31)))

    l = shr(goff, jnp.int32(5)) & 127
    x = shifted
    for k in range(7):
        rolled = pltpu.roll(x, 1 << k, axis=0)
        x = jnp.where((shr(l, jnp.int32(k)) & 1) == 1, rolled, x)
    r0_ref[:] = jnp.where(sub >= l, x, 0).T
    r1_ref[:] = jnp.where(sub < l, x, 0).T


def _cummax_sublanes(x):
    """Inclusive cummax along axis 0 via log-step sublane rolls (x >= 0)."""
    n = x.shape[0]
    sub = _sub_iota(x.shape)
    k = 1
    while k < n:
        rolled = pltpu.roll(x, k, axis=0)
        x = jnp.where(sub >= k, jnp.maximum(x, rolled), x)
        k *= 2
    return x


def _symbolize_attach_kernel(lut_ref, zz_ref, dcd_ref, isl_ref,
                             value_ref, nbits_ref, bits_ref):
    """Fused run-length symbolization + Huffman attach, transposed layout.

    In-kernel equivalent of ``ops.symbols.symbolize`` + ``lut.slot_index``
    + the LUT attach, consuming raw zig-zagged coefficients directly so
    the slot arrays never round-trip through HBM.  Slots live on sublanes,
    blocks on lanes; the EOB/ZRL logic needs one sublane cummax and two
    rolls.  ``dcd`` carries the per-block DC *difference* (computed by a
    tiny XLA pass — DC prediction is a cross-block, per-component chain);
    ``isl`` is +1 luma / 0 chroma / -1 padding (padding blocks emit no
    bits).
    """
    t = lut_ref[:]                              # [8, 128]
    v = zz_ref[:]                               # [64, TB] int32
    dcd = dcd_ref[:]                            # [1, TB]
    isl = isl_ref[:]                            # [1, TB]
    sub = _sub_iota(v.shape)
    # slot 0 carries the DC difference (the packer's emission order)
    v = jnp.where(sub == 0, jnp.broadcast_to(dcd, v.shape), v)

    # magnitude class (huff_class, main/encoder.c:303-313), |v| <= 4095
    a = jnp.abs(v)
    cls = jnp.zeros_like(v)
    for k in range(12):
        cls = cls + (a >= (1 << k)).astype(jnp.int32)
    amp = jnp.where(v < 0, v + (jnp.left_shift(1, cls) - 1), v)

    ac_nz = (v != 0) & (sub >= 1)
    m = _cummax_sublanes(jnp.where(ac_nz, sub, 0))
    last_nz = jnp.max(m, axis=0, keepdims=True)  # [1, TB]
    prev_nz = pltpu.roll(m, 1, axis=0)
    prev_nz = jnp.where(sub == 0, 0, prev_nz)

    run = (sub - prev_nz - 1) & 15
    sym = jnp.where(ac_nz, (run << 4) | cls, 0)
    extra = jnp.where(ac_nz, amp, 0)
    extra_n = jnp.where(ac_nz, cls, 0)
    valid = ac_nz

    zero_run = sub - prev_nz
    zrl = (~ac_nz) & (sub >= 1) & (sub < last_nz) & ((zero_run & 15) == 0)
    sym = jnp.where(zrl, 0xF0, sym)
    valid = valid | zrl

    # EOB symbol is 0x00 with no extra bits; sym already 0 there
    valid = valid | ((sub == last_nz + 1) & (last_nz < 63))

    is_dc = sub == 0
    sym = jnp.where(is_dc, cls, sym)
    extra = jnp.where(is_dc, amp, extra)
    extra_n = jnp.where(is_dc, cls, extra_n)
    valid = valid | is_dc
    valid = valid & (isl >= 0)                  # padding blocks: no slots

    idx = sym | (is_dc.astype(jnp.int32) << 8) | \
        (jnp.broadcast_to(isl == 1, v.shape).astype(jnp.int32) << 9)
    idx = jnp.where(valid, idx, NULL_INDEX)

    hi = idx >> 7
    lo = idx & 127
    entry = jnp.zeros_like(idx)
    for r in range(8):
        rowb = jnp.broadcast_to(t[r, :][None, :], idx.shape)
        g = jnp.take_along_axis(rowb, lo, axis=1)
        entry = jnp.where(hi == r, g, entry)
    extra = jnp.where(valid, extra, 0)
    extra_n = jnp.where(valid, extra_n, 0)
    nb = (entry >> 16) + extra_n
    value_ref[:] = ((entry & 0xFFFF) << extra_n) | extra
    nbits_ref[:] = nb
    bits_ref[:] = jnp.sum(nb, axis=0, keepdims=True, dtype=jnp.int32)


def _segment_place(value_t, nbits_t, bits, S: int, nblk: int, seg_rows: int,
                   interpret: bool):
    """Shared tail: per-segment bit offsets, transposed place, row scatter."""
    grid = (nblk // _TB,)
    dat = lambda: pl.BlockSpec((64, _TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
    block_bits = bits.reshape(S, nblk // S)
    ends = jnp.cumsum(block_bits, axis=-1)
    total_bits = ends[:, -1]
    goff_seg = ends - block_bits
    seg_base = (jnp.arange(S, dtype=jnp.int32) * (seg_rows * 128 * 32))[:, None]
    goff = (goff_seg + seg_base).reshape(1, -1)

    r0, r1 = pl.pallas_call(
        _place_kernel,
        out_shape=[jax.ShapeDtypeStruct((nblk, 128), jnp.int32),
                   jax.ShapeDtypeStruct((nblk, 128), jnp.int32)],
        grid=grid,
        in_specs=[dat(), dat(),
                  pl.BlockSpec((1, _TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((_TB, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((_TB, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        interpret=interpret,
    )(value_t, nbits_t, goff.astype(jnp.int32))

    rows = (goff.reshape(-1) >> 12)
    words = jnp.zeros((S * seg_rows + 1, 128), jnp.int32)
    words = words.at[rows].add(r0, mode="drop")
    words = words.at[rows + 1].add(r1, mode="drop")
    words = jax.lax.bitcast_convert_type(words[:S * seg_rows], jnp.uint32)
    return words.reshape(S, seg_rows * 128), total_bits


@functools.partial(jax.jit,
                   static_argnames=("n_segments", "seg_rows", "interpret"))
def analyze_attach_pack_segments(lut, zz, dc_diff, is_luma, n_segments: int,
                                 seg_rows: int, interpret: bool = False):
    """Fully-fused fixed-LUT symbolize + attach + pack over S segments.

    zz:      [S, nblk_seg, 64] int32/int16 zig-zagged quantized coefs in
             interleaved MCU block order, DC *not* differenced (slot 0 is
             ignored; the DC field comes from ``dc_diff``).
    dc_diff: [S, nblk_seg] per-block DC difference (per-component chains,
             reset per segment).
    is_luma: [S, nblk_seg] 1 = luma block, 0 = chroma.

    Returns (words [S, seg_rows*128] u32, total_bits [S] i32) — identical
    bytes to ``attach_pack_segments`` over ``analyze_symbols`` slots, with
    the slot arrays never materialized in HBM (the round-1 analyze stage
    cost, VERDICT item 1).
    """
    S, nblk_seg, _ = zz.shape
    if n_segments != S:
        raise ValueError(f"n_segments={n_segments} != leading dim {S}")
    if S * seg_rows * 128 * 32 >= 2 ** 31:
        raise ValueError("segment space exceeds int32 bit offsets; "
                         "pack in smaller groups")
    pad = (-nblk_seg) % _TB
    if pad:
        zz = jnp.concatenate(
            [zz, jnp.zeros((S, pad, 64), zz.dtype)], axis=1)
        dc_diff = jnp.concatenate(
            [dc_diff, jnp.zeros((S, pad), dc_diff.dtype)], axis=1)
        is_luma = jnp.concatenate(
            [is_luma, jnp.full((S, pad), -1, jnp.int32)], axis=1)
    nblk = S * (nblk_seg + pad)

    zz_t = zz.reshape(nblk, 64).astype(jnp.int32).T    # [64, nblk]
    dcd = dc_diff.reshape(1, nblk).astype(jnp.int32)
    isl = is_luma.reshape(1, nblk).astype(jnp.int32)

    grid = (nblk // _TB,)
    dat = lambda: pl.BlockSpec((64, _TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
    row = lambda: pl.BlockSpec((1, _TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
    value_t, nbits_t, bits = pl.pallas_call(
        _symbolize_attach_kernel,
        out_shape=[jax.ShapeDtypeStruct((64, nblk), jnp.int32),
                   jax.ShapeDtypeStruct((64, nblk), jnp.int32),
                   jax.ShapeDtypeStruct((1, nblk), jnp.int32)],
        grid=grid,
        in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM), dat(), row(), row()],
        out_specs=[dat(), dat(), row()],
        interpret=interpret,
    )(lut.reshape(8, 128), zz_t, dcd, isl)

    return _segment_place(value_t, nbits_t, bits, S, nblk, seg_rows,
                          interpret)


@functools.partial(jax.jit,
                   static_argnames=("n_segments", "seg_rows", "interpret"))
def attach_pack_segments(lut, idx, extra, extra_n, n_segments: int,
                         seg_rows: int, interpret: bool = False):
    """Fused fixed-LUT attach + pack over S segments.

    idx/extra/extra_n: [S, nblk_seg, 64] slot arrays (as from
    ``pipelines.fast.analyze_symbols``).  Returns
    (words [S, seg_rows*128] u32, total_bits [S] i32).
    """
    S, nblk_seg, _ = idx.shape
    if n_segments != S:
        raise ValueError(f"n_segments={n_segments} != leading dim {S}")
    if S * seg_rows * 128 * 32 >= 2 ** 31:
        raise ValueError("segment space exceeds int32 bit offsets; "
                         "pack in smaller groups")
    pad = (-nblk_seg) % _TB
    if pad:
        idx = jnp.concatenate(
            [idx, jnp.full((S, pad, 64), NULL_INDEX, idx.dtype)], axis=1)
        extra = jnp.concatenate(
            [extra, jnp.zeros((S, pad, 64), extra.dtype)], axis=1)
        extra_n = jnp.concatenate(
            [extra_n, jnp.zeros((S, pad, 64), extra_n.dtype)], axis=1)
    nblk = S * (nblk_seg + pad)

    # transposed slot layout: [64 slots, nblk blocks]
    idx_t = idx.reshape(nblk, 64).T
    extra_t = extra.reshape(nblk, 64).T
    extran_t = extra_n.reshape(nblk, 64).T

    grid = (nblk // _TB,)
    dat = lambda: pl.BlockSpec((64, _TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
    value_t, nbits_t, bits = pl.pallas_call(
        _attach_bits_kernel,
        out_shape=[jax.ShapeDtypeStruct((64, nblk), jnp.int32),
                   jax.ShapeDtypeStruct((64, nblk), jnp.int32),
                   jax.ShapeDtypeStruct((1, nblk), jnp.int32)],
        grid=grid,
        in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM), dat(), dat(), dat()],
        out_specs=[dat(), dat(),
                   pl.BlockSpec((1, _TB), lambda i: (0, i),
                                memory_space=pltpu.VMEM)],
        interpret=interpret,
    )(lut.reshape(8, 128), idx_t.astype(jnp.int32),
      extra_t.astype(jnp.int32), extran_t.astype(jnp.int32))

    block_bits = bits.reshape(S, nblk // S)
    ends = jnp.cumsum(block_bits, axis=-1)
    total_bits = ends[:, -1]
    goff_seg = ends - block_bits
    seg_base = (jnp.arange(S, dtype=jnp.int32) * (seg_rows * 128 * 32))[:, None]
    goff = (goff_seg + seg_base).reshape(1, -1)

    r0, r1 = pl.pallas_call(
        _place_kernel,
        out_shape=[jax.ShapeDtypeStruct((nblk, 128), jnp.int32),
                   jax.ShapeDtypeStruct((nblk, 128), jnp.int32)],
        grid=grid,
        in_specs=[dat(), dat(),
                  pl.BlockSpec((1, _TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((_TB, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((_TB, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        interpret=interpret,
    )(value_t, nbits_t, goff.astype(jnp.int32))

    rows = (goff.reshape(-1) >> 12)
    words = jnp.zeros((S * seg_rows + 1, 128), jnp.int32)
    words = words.at[rows].add(r0, mode="drop")
    words = words.at[rows + 1].add(r1, mode="drop")
    words = jax.lax.bitcast_convert_type(words[:S * seg_rows], jnp.uint32)
    return words.reshape(S, seg_rows * 128), total_bits
