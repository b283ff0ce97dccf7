"""Pallas TPU kernel: Huffman codeword attachment via VMEM lane-gather.

Replaces eight XLA 256-entry table gathers (``ops.symbols.attach_codes``)
with one combined 1024-entry lookup done inside VMEM.  XLA lowers tiny-table
gathers poorly on TPU (~73 ms for a 16x640x640 batch); the in-kernel
lane-gather (8 broadcast rows x ``take_along_axis`` along lanes) runs the
same lookup in ~6 ms.

Table layout: index = sym | is_dc << 8 | is_luma << 9; entry packs
code | length << 16 (codes are <= 16 bits, ``main/encoder.c:279-300``).
Index 1023 (never produced by a valid slot: a DC symbol is a magnitude
class <= 11) is reserved as the null entry for invalid slots.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NULL_INDEX = 1023
_TR = 256  # tile rows; tile = [_TR, 128] slots


def build_combined_lut(tables) -> np.ndarray:
    """Pack 4 HuffmanTables into one [1024] int32 code|len<<16 table.

    ``tables`` is the dict from ``huffman.build`` (luma_dc/luma_ac/
    chroma_dc/chroma_ac).
    """
    lut = np.zeros(1024, dtype=np.int32)
    for name, is_dc, is_luma in (("luma_ac", 0, 1), ("luma_dc", 1, 1),
                                 ("chroma_ac", 0, 0), ("chroma_dc", 1, 0)):
        t = tables[name]
        base = (is_dc << 8) | (is_luma << 9)
        code = np.where(t.code < 0, 0, t.code).astype(np.int64)
        length = t.length.astype(np.int64)
        lut[base:base + 256] = (code | (length << 16)).astype(np.int32)
    lut[NULL_INDEX] = 0
    return lut


def slot_index(sym, valid, is_dc, is_luma):
    """Combined LUT index per slot (cheap fused XLA elementwise)."""
    idx = sym | (is_dc.astype(jnp.int32) << 8) | (is_luma.astype(jnp.int32) << 9)
    return jnp.where(valid, idx, NULL_INDEX)


def _lookup(t, idx):
    """t: [8, 128] (1024 entries); idx: [TR, 128] in [0, 1024)."""
    hi = idx >> 7
    lo = idx & 127
    entry = jnp.zeros_like(idx)
    # rows 3 and 7 are structurally all-zero (a DC symbol is a magnitude
    # class <= 11, so sym >= 128 with is_dc never occurs, and NULL_INDEX's
    # entry is 0): skipping them leaves entry = 0, identical to the gather
    for r in (0, 1, 2, 4, 5, 6):
        rowb = jnp.broadcast_to(t[r, :][None, :], idx.shape)
        g = jnp.take_along_axis(rowb, lo, axis=1)
        entry = jnp.where(hi == r, g, entry)
    return entry


def _attach_kernel(lut_ref, idx_ref, extra_ref, extra_n_ref,
                   value_ref, nbits_ref):
    entry = _lookup(lut_ref[:], idx_ref[:])
    code = entry & 0xFFFF
    clen = entry >> 16
    en = extra_n_ref[:]
    value_ref[:] = (code << en) | extra_ref[:]
    nbits_ref[:] = clen + en


def _attach_kernel_grouped(lut_ref, idx_ref, extra_ref, extra_n_ref,
                           value_ref, nbits_ref):
    entry = _lookup(lut_ref[0], idx_ref[0])
    code = entry & 0xFFFF
    clen = entry >> 16
    en = extra_n_ref[0]
    value_ref[0] = (code << en) | extra_ref[0]
    nbits_ref[0] = clen + en


@functools.partial(jax.jit, static_argnames=("interpret",))
def attach(lut, idx, extra, extra_n, interpret: bool = False):
    """(value, nbits) per slot from the combined LUT.

    lut: [1024] int32; idx/extra/extra_n: int32 arrays whose total size is
    a multiple of 128*_TR (slot counts are n_blocks*64 with n_blocks a
    multiple of 512 per 128x128 tile region — callers pad if needed).
    """
    shape = idx.shape
    n = int(np.prod(shape))
    pad = (-n) % (128 * 8)
    if pad:
        # pad with NULL_INDEX slots (resolve to code 0 / len 0), strip after
        idx = jnp.concatenate([idx.reshape(-1),
                               jnp.full(pad, NULL_INDEX, jnp.int32)])
        extra = jnp.concatenate([extra.reshape(-1), jnp.zeros(pad, jnp.int32)])
        extra_n = jnp.concatenate([extra_n.reshape(-1), jnp.zeros(pad, jnp.int32)])
    flat = idx.reshape(-1, 128)
    rows = flat.shape[0]
    tr = _TR if rows % _TR == 0 else next(
        t for t in (128, 64, 32, 16, 8, 1) if rows % t == 0)
    grid = (rows // tr,)
    specs = [
        pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tr, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tr, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tr, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((tr, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tr, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    value, nbits = pl.pallas_call(
        _attach_kernel,
        out_shape=[jax.ShapeDtypeStruct(flat.shape, jnp.int32),
                   jax.ShapeDtypeStruct(flat.shape, jnp.int32)],
        grid=grid,
        in_specs=specs,
        out_specs=out_specs,
        interpret=interpret,
    )(lut.reshape(8, 128), flat,
      extra.reshape(-1, 128), extra_n.reshape(-1, 128))
    if pad:
        value = value.reshape(-1)[:n]
        nbits = nbits.reshape(-1)[:n]
    return value.reshape(shape), nbits.reshape(shape)


@functools.partial(jax.jit, static_argnames=("interpret",))
def attach_grouped(luts, idx, extra, extra_n, interpret: bool = False):
    """Per-group tables: luts [G, 1024]; idx/extra/extra_n [G, n].

    Used by dynamic-Huffman batches (one K.2 table set per image).  A 2D
    grid walks (group, tile); vmapping the flat kernel instead would hit
    the same XLA:TPU compile blowup as vmapped producers.
    """
    G = luts.shape[0]
    shape = idx.shape
    flat = idx.reshape(G, -1, 128)
    rows = flat.shape[1]
    tr = _TR if rows % _TR == 0 else next(
        t for t in (128, 64, 32, 16, 8, 1) if rows % t == 0)
    grid = (G, rows // tr)
    lut_spec = pl.BlockSpec((1, 8, 128), lambda g, i: (g, 0, 0),
                            memory_space=pltpu.VMEM)
    dat = lambda: pl.BlockSpec((1, tr, 128), lambda g, i: (g, i, 0),
                               memory_space=pltpu.VMEM)
    value, nbits = pl.pallas_call(
        _attach_kernel_grouped,
        out_shape=[jax.ShapeDtypeStruct(flat.shape, jnp.int32),
                   jax.ShapeDtypeStruct(flat.shape, jnp.int32)],
        grid=grid,
        in_specs=[lut_spec, dat(), dat(), dat()],
        out_specs=[dat(), dat()],
        interpret=interpret,
    )(luts.reshape(G, 8, 128), flat,
      extra.reshape(G, -1, 128), extra_n.reshape(G, -1, 128))
    return value.reshape(shape), nbits.reshape(shape)
