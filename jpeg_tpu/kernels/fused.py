"""Fused analyze + Huffman attach + parallel pack (transposed layout).

Two Pallas phases with one tiny XLA prefix-sum between them (the global
block bit offsets force a barrier):

  A. an analyze/attach kernel — for the fast f32 path
     ``_dct_attach_kernel``: MXU DCT on the zig-zag-ordered flat basis,
     quantization, in-kernel DC differencing (scratch carry across the
     sequential grid), run-length symbolization, combined-LUT lane-gather
     attach, and per-block bit totals.  Slots on sublanes, blocks on
     lanes, so bit totals are one sublane reduction and the outputs are
     already in the layout phase B consumes (no 39 MB relayouts).
  B. ``_place_acc_kernel``: adaptive local word build (dynamic-bound
     loop), per-block bit shift + lane rotate, and tile-dense row
     accumulation, finished by ONE windowed scatter-add per 128-block
     tile.

Fixed-table mode runs the fully-fused ``dct_attach_pack_segments``;
dynamic mode splits at the histogram sync into ``dct_index_segments``
(just the LUT index field, feeding the per-image K.2 builds) +
``dct_attach_pack_grouped`` (per-image LUTs, recomputing symbolization
in-kernel over the retained pixel blocks) — no slot arrays in HBM in
either mode.  The zz-input variants (``analyze_attach_pack_segments``
etc.) serve the f64 exact path.
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
_CHUNK = 4  # 128-block tiles per grid step in the one-kernel fused path

# fori unroll factors for the place tail's two dynamic-bound loops (the
# local-pack word loop and the row accumulation).  Each loop body is a
# short chain of masked cross-sublane reductions whose latency the VPU
# cannot fill from a single iteration; computing U independent
# rows/iteration interleaves U such chains (the same latency-hiding
# lesson as kernels/huffdec.py's group interleave) and pays 1/U of the
# loop's scalar bookkeeping.  Byte-identical for any value (the loops
# cover the same index ranges); trace-time constants, A/B'd on hardware
# by bench/unroll_profile.py.
_PACK_UNROLL = 1
_ROWACC_UNROLL = 1

# Row-accumulation implementation: "mxu" phrases each 128-block window's
# keyed row reduction as ONE one-hot matmul (out[r] = OH[r, keys] @
# stacked this-row/straddle data) instead of a fori of masked
# cross-sublane reductions + serial row RMWs; "loop" is the r3 form.
# Byte-identical (parity-tested); A/B'd on hardware.  Exactness: the
# int32 words split into four 8-BIT fields — placed bit ranges are
# DISJOINT across blocks, so each field's true per-row sum <= 255, and
# the TPU MXU's default-bf16 passes are exact for 0/1 one-hots against
# integers <= 256 (the same rule the front's permutation matmuls use;
# 11-bit fields measured WRONG on hardware for exactly this reason,
# 2026-08-20, while CPU-interpret f32 hid it).
_ROWACC_IMPL = "mxu"
_ROWACC_R = 72  # window rows: max span 58 (see _ACC_ROWS) + 7 for the
#                 8-aligned dynamic store base + pad to a sublane multiple


def _attach_fields(t, idx, extra, extra_n):
    """Combined-LUT lane-gather + field assembly -> (value, nbits).

    t: [8, 128] combined LUT rows in VMEM; idx/extra/extra_n: [64, 128]
    slot fields (one 128-block tile — the broadcast-row lane gather is
    128-wide).
    """
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
    nb = (entry >> 16) + extra_n
    value = ((entry & 0xFFFF) << extra_n) | extra
    return value, nb


def _attach_chunk(t, idx, extra, extra_n):
    """Chunk-wide attach: per-128-lane-tile LUT gathers, lane-concatenated."""
    cb = idx.shape[1]
    vals, nbs = [], []
    for s0 in range(0, cb, _TB):
        sl = slice(s0, s0 + _TB)
        v, nb = _attach_fields(t, idx[:, sl], extra[:, sl], extra_n[:, sl])
        vals.append(v)
        nbs.append(nb)
    if len(vals) == 1:
        return vals[0], nbs[0]
    return jnp.concatenate(vals, axis=1), jnp.concatenate(nbs, axis=1)


# Packed symbol-field handoff (dynamic-mode stage 1 -> 2): ONE int32 per
# slot carries (idx 10b) | (extra_n 4b << 10) | (extra 12b << 14).
# Ranges: idx <= NULL_INDEX = 1023; extra_n = magnitude class <= 12
# (coefficients clip to [-2048, 2047], main/encoder.c:109, so DC diffs
# span [-4095, 4095] and amplitude fields fit 12 bits).  All fields are
# non-negative, so pack is shift/or and unpack is shift/mask — cheap
# VPU ops on either side of the HBM round trip.  Stage 2 consuming pf
# does NO front/DCT/symbolize re-run at all (the r4 xt handoff still
# re-ran DCT+symbolize in stage 2 — the whole duplicated VPU cost).


def _pack_fields(idx, extra, extra_n):
    return idx | (extra_n << 10) | (extra << 14)


def _unpack_fields(pf):
    return pf & 1023, _shr_i(pf, 14), _shr_i(pf, 10) & 15


def _shr_i(x, n):
    return jax.lax.shift_right_logical(x, jnp.int32(n))


def _attach(t, idx, extra, extra_n, value_ref, nbits_ref, bits_ref):
    """Shared LUT attach writing refs + per-block bit totals."""
    value, nb = _attach_fields(t, idx, extra, extra_n)
    value_ref[:] = value
    nbits_ref[:] = nb
    bits_ref[:] = jnp.sum(nb, axis=0, keepdims=True, dtype=jnp.int32)


def _attach_bits_kernel(lut_ref, idx_ref, extra_ref, extran_ref,
                        value_ref, nbits_ref, bits_ref):
    _attach(lut_ref[:], idx_ref[:], extra_ref[:], extran_ref[:],
            value_ref, nbits_ref, bits_ref)


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
    idx, extra, extra_n = _symbolize(zz_ref[:], dcd_ref[:], isl_ref[:])
    _attach(lut_ref[:], idx, extra, extra_n, value_ref, nbits_ref, bits_ref)


def _symbolize_idx_kernel(zz_ref, dcd_ref, isl_ref, idx_ref,
                          extra_ref, extran_ref):
    """Symbolization only: zz -> combined-LUT indices + amplitude fields.

    The dynamic-table path needs the symbol stream twice — once for the
    histograms that feed the per-image K.2 builds, once for the attach —
    and recomputing it in-kernel is cheaper than materializing the three
    int32 slot arrays in HBM.  This pass feeds the histogram (idx) and
    the grouped attach consumes idx/extra/extra_n directly.
    """
    idx, extra, extra_n = _symbolize(zz_ref[:], dcd_ref[:], isl_ref[:])
    idx_ref[:] = idx
    extra_ref[:] = extra
    extran_ref[:] = extra_n


def _symbolize(v, dcd, isl):
    """Shared in-kernel run-length symbolization.

    In-kernel equivalent of ``ops.symbols.symbolize`` + ``lut.slot_index``:
    slot 0 carries the DC difference, AC slots carry run/class symbols with
    ZRL (0xF0) fills and a trailing EOB (T.81 F.1.2.2; reference emission
    order main/encoder.c:145-176, huff_class :303-313, |v| <= 4095).
    Slots on sublanes, blocks on lanes; the EOB/ZRL logic needs one
    sublane cummax and two rolls.  Invalid slots get NULL_INDEX (the
    combined LUT's zero-bit entry).
    """
    sub = _sub_iota(v.shape)
    v = jnp.where(sub == 0, jnp.broadcast_to(dcd, v.shape), v)
    a = jnp.abs(v)
    # bit length via the f32 exponent field (exact for ints < 2^24):
    # bitlen(a) = exponent(float(a)) - 126 for a > 0 — replaces a
    # 12-round compare-accumulate with 5 vector ops
    e = jax.lax.shift_right_logical(
        jax.lax.bitcast_convert_type(a.astype(jnp.float32), jnp.int32),
        jnp.int32(23)) & 0xFF
    cls = jnp.where(a == 0, 0, e - 126)
    amp = jnp.where(v < 0, v + (jnp.left_shift(1, cls) - 1), v)

    ac_nz = (v != 0) & (sub >= 1)
    m = _cummax_sublanes(jnp.where(ac_nz, sub, 0))
    last_nz = jnp.max(m, axis=0, keepdims=True)
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
    valid = valid | ((sub == last_nz + 1) & (last_nz < 63))

    is_dc = sub == 0
    sym = jnp.where(is_dc, cls, sym)
    extra = jnp.where(is_dc, amp, extra)
    extra_n = jnp.where(is_dc, cls, extra_n)
    valid = valid | is_dc
    valid = valid & (isl >= 0)

    idx = sym | (is_dc.astype(jnp.int32) << 8) | \
        (jnp.broadcast_to(isl == 1, v.shape).astype(jnp.int32) << 9)
    idx = jnp.where(valid, idx, NULL_INDEX)
    extra = jnp.where(valid, extra, 0)
    extra_n = jnp.where(valid, extra_n, 0)
    return idx, extra, extra_n


def _attach_grouped_kernel(lut_ref, idx_ref, extra_ref, extran_ref,
                           value_ref, nbits_ref, bits_ref):
    """Per-group LUT attach consuming pre-symbolized fields."""
    _attach(lut_ref[0], idx_ref[:], extra_ref[:], extran_ref[:],
            value_ref, nbits_ref, bits_ref)


def _dct_symbolize(m_ref, bias_ref, ql_ref, qc_ref, xt_ref, prev_ref,
                   *, tiles_per_seg: int, real_nblk: int, period: int,
                   ypm: int):
    """In-kernel DCT + quantize + zigzag + DC diff + symbolization.

    xt_ref: [64, TB] f32 raster-flattened un-level-shifted pixel blocks in
    interleaved MCU order (transposed); m_ref: [64, 64] zig-zag-ordered
    flat DCT basis (``tables.dct_flat_basis``); bias/ql/qc: [64, 128]
    lane-broadcast bias and luma/chroma quantizers in zig-zag order.

    Everything the old XLA analyze tail did is derived in-kernel from the
    static MCU pattern (period = ypm + 2 blocks: Y*ypm, Cb, Cr):
      * component select: pos = global block index mod period; luma iff
        pos < ypm; blocks past ``real_nblk`` are padding (no symbols).
      * DC differencing: the prev-same-component distance is 3 for the
        first Y of an MCU (the previous MCU's last Y), 1 for the other Y
        blocks, and ``period`` for Cb/Cr — for every subsampling.  Lane
        rolls give in-tile neighbors; ``prev_ref`` (VMEM scratch, persists
        across the sequential TPU grid) carries the previous tile's DC
        row, and the first tile of each segment zeroes the chain (restart
        semantics).  Exact integer ops — bit-identical to the XLA
        engine's per-component diff chains given equal DC values.
    """
    f = jax.lax.dot_general(m_ref[:], xt_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    f = f + bias_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, f.shape[1]), 1)
    i = pl.program_id(0)
    tile_in_seg = jax.lax.rem(i, jnp.int32(tiles_per_seg))
    blk = tile_in_seg * _TB + lane                     # [1, TB] in-segment
    pos = jax.lax.rem(blk, jnp.int32(period))
    isl_row = pos < ypm
    q = jnp.where(jnp.broadcast_to(isl_row, f.shape), ql_ref[:], qc_ref[:])
    v = jnp.trunc(f / q)
    v = jnp.clip(v, -2048.0, 2047.0).astype(jnp.int32)

    dc = v[0:1, :]
    d = jnp.where(pos == 0, 3, jnp.where(pos < ypm, 1, period))
    prev_tile = prev_ref[:]
    prev_dc = jnp.zeros_like(dc)
    for dd in sorted({1, 3, period}):
        cand = jnp.where(lane >= dd, pltpu.roll(dc, dd, axis=1),
                         pltpu.roll(prev_tile, dd, axis=1))
        prev_dc = jnp.where(d == dd, cand, prev_dc)
    first = tile_in_seg == 0
    prev_dc = jnp.where(first & (lane < d), 0, prev_dc)
    dcd = dc - prev_dc
    prev_ref[:] = dc

    isl = jnp.where(blk < real_nblk, isl_row.astype(jnp.int32), -1)
    return _symbolize(v, dcd, isl)


def _dct_symbolize_chunk(m_ref, bias_ref, ql_ref, qc_ref, xt_ref, prev_ref,
                         first, base_blk, *, real_nblk: int, period: int,
                         ypm: int):
    return _dct_symbolize_chunk_v(m_ref[:], bias_ref[:], ql_ref[:],
                                  qc_ref[:], xt_ref[:], prev_ref, first,
                                  base_blk, real_nblk=real_nblk,
                                  period=period, ypm=ypm)


def _dct_symbolize_chunk_v(m, bias, ql_b, qc_b, xt, prev_ref, first,
                           base_blk, *, real_nblk: int, period: int,
                           ypm: int, pad_from: int | None = None):
    """Chunk-wide DCT + quantize + zigzag + DC diff + symbolization.

    Same math as ``_dct_symbolize`` but width-generic: ``xt`` holds
    ``chunk`` 128-block tiles ([64, CB]); ``first`` is true for the first
    chunk of a segment (resets the DC chains — restart semantics);
    ``base_blk`` is the chunk's first in-segment block index.  The DC
    prev-neighbor lane rolls cross tile boundaries inside the chunk
    naturally; ``prev_ref`` ([1, CB] VMEM scratch) carries the previous
    chunk's DC row.  Value-level so fused callers (the front+place mega
    kernel) can feed an in-VMEM slab that never touched HBM.

    ``pad_from`` (static): lanes >= pad_from are phantom blocks appended
    to 128-align a slab whose real block count isn't a 128 multiple
    (width % 128 != 0 geometries).  They emit NULL_INDEX / 0 bits, and
    the DC row stored for the next chunk is rolled so the last REAL
    block's DC sits at the top lane — the next chunk's prev-neighbor
    rolls then skip the phantom tail exactly.
    """
    f = jax.lax.dot_general(m, xt, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    f = f + bias
    lane = _lane_iota((1, f.shape[1]))
    blk = base_blk + lane                             # [1, CB] in-segment
    pos = jax.lax.rem(blk, jnp.int32(period))
    isl_row = pos < ypm
    q = jnp.where(jnp.broadcast_to(isl_row, f.shape), ql_b, qc_b)
    v = jnp.trunc(f / q)
    v = jnp.clip(v, -2048.0, 2047.0).astype(jnp.int32)

    dc = v[0:1, :]
    d = jnp.where(pos == 0, 3, jnp.where(pos < ypm, 1, period))
    prev_chunk = prev_ref[:]
    prev_dc = jnp.zeros_like(dc)
    for dd in sorted({1, 3, period}):
        cand = jnp.where(lane >= dd, pltpu.roll(dc, dd, axis=1),
                         pltpu.roll(prev_chunk, dd, axis=1))
        prev_dc = jnp.where(d == dd, cand, prev_dc)
    prev_dc = jnp.where(first & (lane < d), 0, prev_dc)
    dcd = dc - prev_dc

    isl = jnp.where(blk < real_nblk, isl_row.astype(jnp.int32), -1)
    if pad_from is not None and pad_from < f.shape[1]:
        isl = jnp.where(lane >= pad_from, -1, isl)
        prev_ref[:] = pltpu.roll(dc, f.shape[1] - pad_from, axis=1)
    else:
        prev_ref[:] = dc
    return _symbolize(v, dcd, isl)


def _dct_place_kernel(lut_ref, m_ref, bias_ref, ql_ref, qc_ref, xt_ref,
                      out_ref, tot_ref, lw_ref, carry_ref, prev_ref,
                      *, real_nblk: int, period: int, ypm: int,
                      chunk: int, stop_after: str = "full",
                      impl: str = "full"):
    """The whole fixed-table encode numeric+entropy path as ONE kernel.

    Grid (S, chunks_per_seg): each step runs MXU DCT + quantize + zigzag
    + DC diff + symbolize + LUT attach + local pack on a chunk of
    ``chunk`` 128-block tiles and accumulates the packed bits directly
    into the segment's VMEM-resident words buffer.  Nothing but the
    color-converted pixel blocks enters HBM and nothing but the final
    words leaves — no slot arrays, no attach fields, no offsets, no
    scatter.  Fuses main/encoder.c:81-432 into a single pass.

    ``lut_ref`` is a [1, 8, 128] block of the [G, 8, 128] combined-LUT
    array; the index map picks the group (fixed mode: G = 1, dynamic
    mode: one LUT set per image).
    """
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)
        carry_ref[:, :] = jnp.zeros_like(carry_ref)

    idx, extra, extra_n = _dct_symbolize_chunk(
        m_ref, bias_ref, ql_ref, qc_ref, xt_ref, prev_ref,
        first=c == 0, base_blk=c * (chunk * _TB),
        real_nblk=real_nblk, period=period, ypm=ypm)
    if stop_after == "sym":
        out_ref[pl.dslice(0, 1), :] = (
            out_ref[pl.dslice(0, 1), :] + jnp.full(
                (1, 128), jnp.sum(idx + extra + extra_n, dtype=jnp.int32),
                jnp.int32))
        return
    value, nbits = _attach_chunk(lut_ref[0], idx, extra, extra_n)
    if stop_after == "attach":
        out_ref[pl.dslice(0, 1), :] = (
            out_ref[pl.dslice(0, 1), :] + jnp.full(
                (1, 128), jnp.sum(value + nbits, dtype=jnp.int32),
                jnp.int32))
        return
    _place_body(value, nbits, out_ref, tot_ref, lw_ref, carry_ref,
                stop_after=stop_after, impl=impl)


def _dct_attach_kernel(lut_ref, m_ref, bias_ref, ql_ref, qc_ref, xt_ref,
                       value_ref, nbits_ref, bits_ref, prev_ref, **geom):
    idx, extra, extra_n = _dct_symbolize(
        m_ref, bias_ref, ql_ref, qc_ref, xt_ref, prev_ref, **geom)
    _attach(lut_ref[:], idx, extra, extra_n, value_ref, nbits_ref, bits_ref)


def _dct_idx_kernel(m_ref, bias_ref, ql_ref, qc_ref, xt_ref,
                    idx_ref, extra_ref, extran_ref, prev_ref, **geom):
    idx, extra, extra_n = _dct_symbolize(
        m_ref, bias_ref, ql_ref, qc_ref, xt_ref, prev_ref, **geom)
    idx_ref[:] = idx
    extra_ref[:] = extra
    extran_ref[:] = extra_n


def _dct_idxonly_kernel(m_ref, bias_ref, ql_ref, qc_ref, xt_ref,
                        idx_ref, prev_ref, **geom):
    idx, _, _ = _dct_symbolize(
        m_ref, bias_ref, ql_ref, qc_ref, xt_ref, prev_ref, **geom)
    idx_ref[:] = idx


def _dct_front(px, n_segments: int, tile_blocks: int = _TB):
    """Shared prologue: pad segments to ``tile_blocks``, transpose to
    [64, nblk].

    px: [S, nblk_seg, 64] f32 pixel blocks.  Returns (xt, nblk, geometry
    kwargs minus period/ypm).
    """
    S, nblk_seg, _ = px.shape
    if n_segments != S:
        raise ValueError(f"n_segments={n_segments} != leading dim {S}")
    pad = (-nblk_seg) % tile_blocks
    if pad:
        px = jnp.concatenate(
            [px, jnp.zeros((S, pad, 64), px.dtype)], axis=1)
    nblk = S * (nblk_seg + pad)
    xt = px.reshape(nblk, 64).astype(jnp.float32).T
    return xt, nblk, dict(tiles_per_seg=(nblk_seg + pad) // _TB,
                          real_nblk=nblk_seg)


def _dct_consts(m, bias, ql, qc, width: int = 128):
    specs = [pl.BlockSpec((64, 64), lambda *_: (0, 0),
                          memory_space=pltpu.VMEM)] + \
        [pl.BlockSpec((64, width), lambda *_: (0, 0),
                      memory_space=pltpu.VMEM)] * 3
    args = (m.astype(jnp.float32),
            jnp.broadcast_to(bias.astype(jnp.float32)[:, None], (64, width)),
            jnp.broadcast_to(ql.astype(jnp.float32)[:, None], (64, width)),
            jnp.broadcast_to(qc.astype(jnp.float32)[:, None], (64, width)))
    return specs, args


def _dct_place_call(luts, segs_per_group: int, m, bias, ql, qc, px, S: int,
                    period: int, ypm: int, seg_rows: int, interpret: bool):
    """Shared one-kernel DCT->place launch (grouped LUTs) from pixel blocks.

    luts: [G, 1024] combined LUTs, one per group of ``segs_per_group``
    consecutive segments (G == 1 serves the fixed-table mode).  Returns
    (words, totals).  The caller has already checked the VMEM budget.
    """
    cb = _CHUNK * _TB
    xt, nblk, geom = _dct_front(px, S, tile_blocks=cb)
    return _place_from_xt(luts, segs_per_group, m, bias, ql, qc, xt, S,
                          period, ypm, seg_rows, geom["real_nblk"], cb,
                          interpret)


def _pick_chunk(nblk_seg: int) -> int:
    """Chunk width dividing the per-segment block count.

    Measured on the 9600-block bench segment (2026-08-17): 640 is the
    sweet spot (1.91 ms full place vs 2.13 at 384, 2.56 at 1920 — the
    row-accumulation loop's cost grows with chunk bit-span, the fixed
    per-chunk costs shrink with chunk count).
    """
    for cb in (640, 512, 384, 256, 128):
        if nblk_seg % cb == 0:
            return cb
    raise ValueError(f"nblk_seg={nblk_seg} not a multiple of 128")


def _place_from_xt(luts, segs_per_group: int, m, bias, ql, qc, xt, S: int,
                   period: int, ypm: int, seg_rows: int, real_nblk: int,
                   cb: int, interpret: bool, stop_after: str = "full",
                   impl: str = "full"):
    """One-kernel DCT->place launch from a pre-relayouted [64, nblk] xt
    (the Pallas front's output, or ``_dct_front``'s).  ``stop_after``
    is profiling-only (see ``_place_body``)."""
    seg_rows_p = (seg_rows + 7) & ~7
    nblk = xt.shape[1]
    chunks_per_seg = (nblk // S) // cb
    cspecs, cargs = _dct_consts(m, bias, ql, qc, width=cb)
    kernel = functools.partial(
        _dct_place_kernel, real_nblk=real_nblk, period=period,
        ypm=ypm, chunk=cb // _TB, stop_after=stop_after, impl=impl)
    out, tot = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((S * seg_rows_p, 128),
                                        jnp.int32),
                   jax.ShapeDtypeStruct((S * 8, 128), jnp.int32)],
        grid=(S, chunks_per_seg),
        in_specs=[pl.BlockSpec((1, 8, 128),
                               lambda s, c, g=segs_per_group: (s // g, 0, 0),
                               memory_space=pltpu.VMEM)] + cspecs +
                 [pl.BlockSpec((64, cb),
                               lambda s, c, n=chunks_per_seg:
                                   (0, s * n + c),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((seg_rows_p, 128), lambda s, c: (s, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((8, 128), lambda s, c: (s, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((128, cb), jnp.int32),
                        pltpu.VMEM((1, cb), jnp.int32),
                        pltpu.VMEM((1, cb), jnp.int32)],
        interpret=interpret,
    )(luts.reshape(-1, 8, 128), *cargs, xt)
    words = jax.lax.bitcast_convert_type(
        out.reshape(S, seg_rows_p, 128)[:, :seg_rows], jnp.uint32)
    return words.reshape(S, seg_rows * 128), tot.reshape(S, 8, 128)[:, 0, 0]


@functools.partial(jax.jit,
                   static_argnames=("n_segments", "segs_per_group", "period",
                                    "ypm", "seg_rows", "interpret",
                                    "real_nblk"))
def dct_attach_pack_xt(luts, m, bias, ql, qc, xt, n_segments: int,
                       segs_per_group: int, period: int, ypm: int,
                       seg_rows: int, interpret: bool = False,
                       real_nblk: int | None = None):
    """One-kernel DCT->place directly from a [64, nblk] transposed pixel
    layout (``kernels.front.front_analyze`` output).  ``real_nblk`` <
    per-segment blocks masks zero-padded tail MCU rows (heights that are
    not slab multiples).  Grouped LUTs as in ``dct_attach_pack_grouped``;
    G == 1 serves fixed-table mode.

    Segments whose worst-case words buffer exceeds the VMEM residency
    budget (≈4 MP of image per segment) run the two-phase split instead:
    an attach kernel emits (value, nbits, bits) fields and
    ``_segment_place`` finishes with the tile-dense windowed scatter —
    still entirely Pallas, just with one HBM round trip for the fields.
    """
    S = n_segments
    if seg_rows * 128 * 32 >= 2 ** 31:
        raise ValueError("segment space exceeds int32 bit offsets")
    seg_rows_p = (seg_rows + 7) & ~7
    nblk = xt.shape[1]
    nblk_seg = nblk // S
    rn = nblk_seg if real_nblk is None else real_nblk
    if seg_rows_p * 128 * 4 <= _RESIDENT_VMEM_BUDGET:
        cb = _pick_chunk(nblk_seg)
        return _place_from_xt(luts.reshape(-1, 1024), segs_per_group, m,
                              bias, ql, qc, xt, S, period, ypm, seg_rows,
                              rn, cb, interpret)
    if segs_per_group != S:
        raise ValueError("grouped LUTs unsupported on the two-phase path")
    cspecs, cargs = _dct_consts(m, bias, ql, qc)
    grid = (nblk // _TB,)
    dat = lambda: pl.BlockSpec((64, _TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
    kernel = functools.partial(_dct_attach_kernel, period=period, ypm=ypm,
                               tiles_per_seg=nblk_seg // _TB, real_nblk=rn)
    value_t, nbits_t, bits = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((64, nblk), jnp.int32),
                   jax.ShapeDtypeStruct((64, nblk), jnp.int32),
                   jax.ShapeDtypeStruct((1, nblk), jnp.int32)],
        grid=grid,
        in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] + cspecs + [dat()],
        out_specs=[dat(), dat(),
                   pl.BlockSpec((1, _TB), lambda i: (0, i),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((1, _TB), jnp.int32)],
        interpret=interpret,
    )(luts.reshape(-1, 8, 128)[0], *cargs, xt)
    return _segment_place(value_t, nbits_t, bits, S, nblk, seg_rows,
                          interpret)


def _pf_place_kernel(lut_ref, pf_ref, out_ref, tot_ref, lw_ref, carry_ref):
    """Resident place consuming stage 1's PACKED symbol fields: unpack ->
    LUT attach -> place.  No DCT or symbolization here — the fields
    already carry DC-diffed, real_nblk-masked symbols from
    ``front_index(emit_fields=True)``, so stage 2's only work is the
    LUT gather and the place tail."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)
        carry_ref[:, :] = jnp.zeros_like(carry_ref)

    idx, extra, extra_n = _unpack_fields(pf_ref[:])
    value, nbits = _attach_chunk(lut_ref[0], idx, extra, extra_n)
    _place_body(value, nbits, out_ref, tot_ref, lw_ref, carry_ref)


@functools.partial(jax.jit,
                   static_argnames=("n_segments", "segs_per_group",
                                    "seg_rows", "interpret"))
def attach_pack_pf(luts, pf, n_segments: int, segs_per_group: int,
                   seg_rows: int, interpret: bool = False):
    """Dynamic-mode stage 2 over packed symbol fields.

    pf: [64, nblk] int32 from ``front_index(emit_fields=True)`` (slab
    padding slots are NULL and emit no bits, so phantom-padded layouts
    need no real_nblk here).  luts: [G, 1024] per-image combined LUTs
    (G = n_segments / segs_per_group).  Returns
    (words [S, seg_rows*128] u32, total_bits [S]).
    """
    S = n_segments
    if S % segs_per_group:
        raise ValueError(f"n_segments={S} not divisible by "
                         f"segs_per_group={segs_per_group}")
    if S * seg_rows * 128 * 32 >= 2 ** 31:
        raise ValueError("segment space exceeds int32 bit offsets")
    nblk = pf.shape[1]
    nblk_seg = nblk // S
    seg_rows_p = (seg_rows + 7) & ~7
    if seg_rows_p * 128 * 4 > _RESIDENT_VMEM_BUDGET:
        # huge segments: unpack via XLA and take the two-phase attach
        idx_t, extra_t, extran_t = _unpack_fields(pf)
        return attach_pack_grouped(luts, idx_t, extra_t, extran_t, S,
                                   segs_per_group, seg_rows,
                                   interpret=interpret)
    cb = _pick_chunk(nblk_seg)
    chunks_per_seg = nblk_seg // cb
    out, tot = pl.pallas_call(
        _pf_place_kernel,
        out_shape=[jax.ShapeDtypeStruct((S * seg_rows_p, 128), jnp.int32),
                   jax.ShapeDtypeStruct((S * 8, 128), jnp.int32)],
        grid=(S, chunks_per_seg),
        in_specs=[pl.BlockSpec((1, 8, 128),
                               lambda s, c, g=segs_per_group:
                                   (s // g, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((64, cb),
                               lambda s, c, n=chunks_per_seg:
                                   (0, s * n + c),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((seg_rows_p, 128), lambda s, c: (s, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((8, 128), lambda s, c: (s, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((128, cb), jnp.int32),
                        pltpu.VMEM((1, cb), jnp.int32)],
        interpret=interpret,
    )(luts.reshape(-1, 8, 128), pf)
    words = jax.lax.bitcast_convert_type(
        out.reshape(S, seg_rows_p, 128)[:, :seg_rows], jnp.uint32)
    return words.reshape(S, seg_rows * 128), tot.reshape(S, 8, 128)[:, 0, 0]


@functools.partial(jax.jit,
                   static_argnames=("n_segments", "period", "ypm",
                                    "interpret"))
def dct_index_xt(m, bias, ql, qc, xt, n_segments: int, period: int,
                 ypm: int, interpret: bool = False):
    """Fused DCT->symbolize emitting ONLY the combined-LUT index field,
    directly from a [64, nblk] transposed pixel layout (dynamic-mode
    stage 1 over the Pallas front's output)."""
    S = n_segments
    nblk = xt.shape[1]
    nblk_seg = nblk // S
    if nblk_seg % _TB:
        raise ValueError(f"per-segment blocks {nblk_seg} not tile-aligned")
    cspecs, cargs = _dct_consts(m, bias, ql, qc)
    grid = (nblk // _TB,)
    dat = lambda: pl.BlockSpec((64, _TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
    kernel = functools.partial(_dct_idxonly_kernel, period=period, ypm=ypm,
                               tiles_per_seg=nblk_seg // _TB,
                               real_nblk=nblk_seg)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((64, nblk), jnp.int32),
        grid=grid,
        in_specs=cspecs + [dat()],
        out_specs=dat(),
        scratch_shapes=[pltpu.VMEM((1, _TB), jnp.int32)],
        interpret=interpret,
    )(*cargs, xt)


@functools.partial(jax.jit,
                   static_argnames=("n_segments", "period", "ypm",
                                    "seg_rows", "interpret"))
def dct_attach_pack_segments(lut, m, bias, ql, qc, px, n_segments: int,
                             period: int, ypm: int, seg_rows: int,
                             interpret: bool = False):
    """Fully-fused fixed-LUT DCT + quantize + zigzag + DC diff + symbolize
    + attach + pack over S segments.

    px: [S, nblk_seg, 64] f32 raster-flattened pixel blocks (after color
    conversion and MCU interleave, NO level shift — folded into ``bias``).
    The whole numeric stage of ``main/encoder.c:81-178`` runs inside one
    Pallas kernel; only the color convert and block relayout remain in
    XLA.  Returns (words [S, seg_rows*128] u32, total_bits [S] i32).
    """
    S = n_segments
    if S * seg_rows * 128 * 32 >= 2 ** 31:
        raise ValueError("segment space exceeds int32 bit offsets")
    seg_rows_p = (seg_rows + 7) & ~7
    if seg_rows_p * 128 * 4 <= _RESIDENT_VMEM_BUDGET:
        # One-kernel path: chunked DCT->place with the segment words
        # buffer VMEM-resident.
        return _dct_place_call(lut.reshape(1, -1), S, m, bias, ql, qc, px,
                               S, period, ypm, seg_rows, interpret)
    xt, nblk, geom = _dct_front(px, S)
    cspecs, cargs = _dct_consts(m, bias, ql, qc)
    grid = (nblk // _TB,)
    dat = lambda: pl.BlockSpec((64, _TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
    kernel = functools.partial(_dct_attach_kernel, period=period, ypm=ypm,
                               **geom)
    value_t, nbits_t, bits = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((64, nblk), jnp.int32),
                   jax.ShapeDtypeStruct((64, nblk), jnp.int32),
                   jax.ShapeDtypeStruct((1, nblk), jnp.int32)],
        grid=grid,
        in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] + cspecs + [dat()],
        out_specs=[dat(), dat(),
                   pl.BlockSpec((1, _TB), lambda i: (0, i),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((1, _TB), jnp.int32)],
        interpret=interpret,
    )(lut.reshape(8, 128), *cargs, xt)
    return _segment_place(value_t, nbits_t, bits, S, nblk, seg_rows,
                          interpret)


@functools.partial(jax.jit,
                   static_argnames=("n_segments", "segs_per_group", "period",
                                    "ypm", "seg_rows", "interpret"))
def dct_attach_pack_grouped(luts, m, bias, ql, qc, px, n_segments: int,
                            segs_per_group: int, period: int, ypm: int,
                            seg_rows: int, interpret: bool = False):
    """Grouped-LUT one-kernel DCT + symbolize + attach + pack.

    Dynamic-mode stage 2 (and the sharded fixed engine): same fused pass
    as ``dct_attach_pack_segments`` but with one combined LUT per group of
    ``segs_per_group`` consecutive segments (dynamic mode: per image —
    the reference's per-image ``init_huffman``, main/main.c:145).
    Re-runs the DCT/symbolization on the retained ``px`` instead of
    reading back HBM slot fields — the MXU work is cheap next to the
    field traffic it replaces.  Falls back to the two-phase kernels for
    VMEM-exceeding segments.
    """
    S = n_segments
    if S % segs_per_group:
        raise ValueError(f"n_segments={S} not divisible by "
                         f"segs_per_group={segs_per_group}")
    if S * seg_rows * 128 * 32 >= 2 ** 31:
        raise ValueError("segment space exceeds int32 bit offsets")
    seg_rows_p = (seg_rows + 7) & ~7
    if seg_rows_p * 128 * 4 <= _RESIDENT_VMEM_BUDGET:
        return _dct_place_call(luts, segs_per_group, m, bias, ql, qc, px,
                               S, period, ypm, seg_rows, interpret)
    idx_t, extra_t, extran_t = dct_symbolize_segments(
        m, bias, ql, qc, px, S, period, ypm, interpret=interpret)
    return attach_pack_grouped(luts, idx_t, extra_t, extran_t, S,
                               segs_per_group, seg_rows, interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("n_segments", "period", "ypm",
                                    "interpret"))
def dct_index_segments(m, bias, ql, qc, px, n_segments: int,
                       period: int, ypm: int, interpret: bool = False):
    """Fused DCT->symbolize emitting ONLY the combined-LUT index field.

    Dynamic-mode stage 1 feed: the histograms need just ``idx``; the
    amplitude fields are recomputed in-kernel by stage 2
    (``dct_attach_pack_grouped``), so writing them here would be pure
    HBM waste.  Returns idx_t [64, nblk] int32 (NULL_INDEX padding).
    """
    xt, nblk, geom = _dct_front(px, n_segments)
    cspecs, cargs = _dct_consts(m, bias, ql, qc)
    grid = (nblk // _TB,)
    dat = lambda: pl.BlockSpec((64, _TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
    kernel = functools.partial(_dct_idxonly_kernel, period=period, ypm=ypm,
                               **geom)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((64, nblk), jnp.int32),
        grid=grid,
        in_specs=cspecs + [dat()],
        out_specs=dat(),
        scratch_shapes=[pltpu.VMEM((1, _TB), jnp.int32)],
        interpret=interpret,
    )(*cargs, xt)


@functools.partial(jax.jit,
                   static_argnames=("n_segments", "period", "ypm",
                                    "interpret"))
def dct_symbolize_segments(m, bias, ql, qc, px, n_segments: int,
                           period: int, ypm: int, interpret: bool = False):
    """Dynamic-mode stage 1: fused DCT->symbolize, transposed slot fields.

    Same numeric path as ``dct_attach_pack_segments`` but stopping at the
    (idx, extra, extra_n) fields, which feed the per-image symbol
    histograms and then ``attach_pack_grouped``.
    """
    xt, nblk, geom = _dct_front(px, n_segments)
    cspecs, cargs = _dct_consts(m, bias, ql, qc)
    grid = (nblk // _TB,)
    dat = lambda: pl.BlockSpec((64, _TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
    kernel = functools.partial(_dct_idx_kernel, period=period, ypm=ypm,
                               **geom)
    idx, extra, extra_n = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((64, nblk), jnp.int32),
                   jax.ShapeDtypeStruct((64, nblk), jnp.int32),
                   jax.ShapeDtypeStruct((64, nblk), jnp.int32)],
        grid=grid,
        in_specs=cspecs + [dat()],
        out_specs=[dat(), dat(), dat()],
        scratch_shapes=[pltpu.VMEM((1, _TB), jnp.int32)],
        interpret=interpret,
    )(*cargs, xt)
    return idx, extra, extra_n


@functools.partial(jax.jit,
                   static_argnames=("n_segments", "interpret"))
def symbolize_segments(zz, dc_diff, is_luma, n_segments: int,
                       interpret: bool = False):
    """Pallas symbolization pass: zz -> (idx, extra, extra_n) transposed.

    Same inputs as ``analyze_attach_pack_segments``; returns the padded
    transposed slot fields ([64, nblk] each) plus the padded layout's
    block count per segment, ready for ``attach_pack_grouped``.  idx also
    feeds the symbol histograms (NULL_INDEX marks invalid slots).
    """
    S, nblk_seg, _ = zz.shape
    if n_segments != S:
        raise ValueError(f"n_segments={n_segments} != leading dim {S}")
    pad = (-nblk_seg) % _TB
    if pad:
        zz = jnp.concatenate(
            [zz, jnp.zeros((S, pad, 64), zz.dtype)], axis=1)
        dc_diff = jnp.concatenate(
            [dc_diff, jnp.zeros((S, pad), dc_diff.dtype)], axis=1)
        is_luma = jnp.concatenate(
            [is_luma, jnp.full((S, pad), -1, jnp.int32)], axis=1)
    nblk = S * (nblk_seg + pad)

    zz_t = zz.reshape(nblk, 64).astype(jnp.int32).T
    dcd = dc_diff.reshape(1, nblk).astype(jnp.int32)
    isl = is_luma.reshape(1, nblk).astype(jnp.int32)

    grid = (nblk // _TB,)
    dat = lambda: pl.BlockSpec((64, _TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
    row = lambda: pl.BlockSpec((1, _TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
    idx, extra, extra_n = pl.pallas_call(
        _symbolize_idx_kernel,
        out_shape=[jax.ShapeDtypeStruct((64, nblk), jnp.int32),
                   jax.ShapeDtypeStruct((64, nblk), jnp.int32),
                   jax.ShapeDtypeStruct((64, nblk), jnp.int32)],
        grid=grid,
        in_specs=[dat(), row(), row()],
        out_specs=[dat(), dat(), dat()],
        interpret=interpret,
    )(zz_t, dcd, isl)
    return idx, extra, extra_n, nblk_seg + pad


@functools.partial(jax.jit,
                   static_argnames=("n_segments", "segs_per_group",
                                    "seg_rows", "interpret"))
def attach_pack_grouped(luts, idx_t, extra_t, extran_t, n_segments: int,
                        segs_per_group: int, seg_rows: int,
                        interpret: bool = False):
    """Grouped-LUT attach + pack over pre-symbolized transposed fields.

    luts: [G, 1024] combined LUTs (G = n_segments / segs_per_group images);
    idx_t/extra_t/extran_t: [64, nblk] from ``symbolize_segments`` (already
    segment-padded).  Returns (words [S, seg_rows*128] u32, total_bits [S]).
    """
    S = n_segments
    nblk = idx_t.shape[1]
    nblk_seg = nblk // S
    if nblk_seg % _TB:
        raise ValueError("segment block count must be _TB-padded")
    tiles_per_group = (nblk_seg // _TB) * segs_per_group
    if S * seg_rows * 128 * 32 >= 2 ** 31:
        raise ValueError("segment space exceeds int32 bit offsets")

    grid = (nblk // _TB,)
    dat = lambda: pl.BlockSpec((64, _TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
    row = lambda: pl.BlockSpec((1, _TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
    lut_spec = pl.BlockSpec(
        (1, 8, 128), lambda i: (i // tiles_per_group, 0, 0),
        memory_space=pltpu.VMEM)
    value_t, nbits_t, bits = pl.pallas_call(
        _attach_grouped_kernel,
        out_shape=[jax.ShapeDtypeStruct((64, nblk), jnp.int32),
                   jax.ShapeDtypeStruct((64, nblk), jnp.int32),
                   jax.ShapeDtypeStruct((1, nblk), jnp.int32)],
        grid=grid,
        in_specs=[lut_spec, dat(), dat(), dat()],
        out_specs=[dat(), dat(), row()],
        interpret=interpret,
    )(luts.reshape(-1, 8, 128), idx_t, extra_t, extran_t)

    return _segment_place(value_t, nbits_t, bits, S, nblk, seg_rows,
                          interpret)


# Dense tile-accumulator rows: a 128-block tile's stream spans at most
# 128 * 1792 bits / 4096 = 56 output rows, +2 straddle rows -> 58 <= 64.
_ACC_ROWS = 64

# Largest per-segment words block (bytes) the resident place kernel may
# hold in VMEM (~16 MB/core total; out block + inputs + double buffers).
_RESIDENT_VMEM_BUDGET = 6 * 2 ** 20


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _cumsum_lanes(x):
    """Inclusive cumsum along axis 1 (lanes) via log-step rolls (x >= 0)."""
    n = x.shape[1]
    lane = _lane_iota(x.shape)
    k = 1
    while k < n:
        rolled = pltpu.roll(x, k, axis=1)
        x = x + jnp.where(lane >= k, rolled, 0)
        k *= 2
    return x


def _place_body(v, nb, out_ref, tot_ref, lw_ref, carry_ref,
                stop_after: str = "full", impl: str = "full"):
    """Place a chunk's attached fields into the resident segment buffer.

    Block bit offsets are derived in-kernel — a cross-lane cumsum of
    per-block bit totals plus a running carry (VMEM scratch, persists
    across the sequential grid) — then the usual local pack (adaptive
    word loop), per-block bit shift, lane rotate, and dynamic-slice row
    accumulation straight into ``out_ref`` (the whole segment's words
    buffer, VMEM-resident across the inner grid dimension).  No XLA
    prefix-sum barrier, no scatter.

    ``stop_after`` is a PROFILING-ONLY knob (bench/place_profile.py):
    "pack" / "shift" / "rotate" / "mask" truncate the body right after
    that phase, consuming the phase's output into ``out_ref`` row 0 so
    Mosaic cannot dead-code it.  Output is garbage for any value but
    "full" — never set it in production paths.

    ``impl`` = "w16" uses the 16-row local pack window (4 rotate rounds
    on [16, TB] instead of 7 on [128, TB]); chunks with any block over
    480 bits take the full path via an in-kernel cond (identical bytes
    either way).  Production default stays "full" until the w16 variant
    is measured faster on real hardware.
    """
    shr = jax.lax.shift_right_logical
    tb = v.shape[1]

    ends = _cumsum_sublanes(nb)
    blockbits = ends[63:64, :]                # [1, TB] bits per block
    cum = _cumsum_lanes(blockbits)            # inclusive across blocks
    carry = carry_ref[:]
    goff = carry + cum - blockbits            # [1, TB] exclusive + carry
    carry_new = carry + jnp.max(cum)          # cum monotone: max == total
    carry_ref[:, :] = carry_new
    tot_ref[:, :] = jnp.broadcast_to(jnp.max(carry_new), (8, 128))

    offs = ends - nb
    w = shr(offs, jnp.int32(5))
    ein = (offs & 31) + nb
    hi = jnp.where(ein <= 32, v << jnp.clip(32 - ein, 0, 31),
                   shr(v, jnp.clip(ein - 32, 0, 31)))
    lo = jnp.where(ein > 32, v << jnp.clip(64 - ein, 0, 31), 0)

    if impl == "w16" and stop_after == "full":
        fits = jnp.max(blockbits) <= 32 * 15  # hi<=row14, lo<=row15
        jax.lax.cond(
            fits,
            lambda: _place_tail_w16(hi, lo, w, goff, out_ref, lw_ref),
            lambda: _place_tail_full(hi, lo, w, goff, out_ref, lw_ref,
                                     "full", None))
        return
    _place_tail_full(hi, lo, w, goff, out_ref, lw_ref, stop_after,
                     _mk_consume(out_ref))


def _mk_consume(out_ref):
    def _consume(x):
        # fold the intermediate into out row 0 (anti-DCE; profiling only)
        out_ref[pl.dslice(0, 1), :] = (
            out_ref[pl.dslice(0, 1), :]
            + jnp.full((1, 128), jnp.sum(x, dtype=jnp.int32), jnp.int32))
    return _consume


def _place_tail_full(hi, lo, w, goff, out_ref, lw_ref,
                     stop_after: str, _consume):
    """128-row local pack + 7-round rotate + row accumulation."""
    shr = jax.lax.shift_right_logical
    tb = hi.shape[1]

    lw_ref[:, :] = jnp.zeros((128, tb), jnp.int32)
    U = _PACK_UNROLL

    def wbody(i, _):
        j0 = i * U
        for u in range(U):   # U independent reduction chains interleave
            j = j0 + u
            cj = jnp.sum(jnp.where(w == j, hi, 0), axis=0, keepdims=True,
                         dtype=jnp.int32)
            cj = cj + jnp.sum(jnp.where(w == j - 1, lo, 0), axis=0,
                              keepdims=True, dtype=jnp.int32)
            # per-row stores: a multi-row dynamic-index vector store
            # needs a provably 8-aligned row (Mosaic), which j0 is not
            lw_ref[pl.dslice(j, 1), :] = cj
        return 0

    # hi -> w, lo -> w + 1; rows past max(w)+1 rewrite zeros (no slot
    # matches), so the rounded-up trip count is harmless: max j0 + U
    # <= max(w) + 1 + U << 128 (a block is <= 57 local words)
    wtrip = jnp.max(w) + 2 if U == 1 else (jnp.max(w) + 1 + U) // U
    jax.lax.fori_loop(0, wtrip, wbody, 0)
    lw = lw_ref[:]
    if stop_after == "pack":
        return _consume(lw)

    sub = _sub_iota((128, tb))
    s = goff & 31
    prev = pltpu.roll(lw, 1, axis=0)
    prev = jnp.where(sub == 0, 0, prev)
    shifted = jnp.where(s == 0, lw, shr(lw, s) | (prev << ((32 - s) & 31)))
    if stop_after == "shift":
        return _consume(shifted)

    l = shr(goff, jnp.int32(5)) & 127
    x = shifted
    for k in range(7):
        rolled = pltpu.roll(x, 1 << k, axis=0)
        x = jnp.where((shr(l, jnp.int32(k)) & 1) == 1, rolled, x)
    if stop_after == "rotate":
        return _consume(x)

    # one [128, TB] transpose, then mask in the transposed space (the
    # two-transpose form costs a second full-array XLU pass)
    xt2 = x.T                                 # [TB, 128]
    lt = l.T                                  # [TB, 1]
    lane = _lane_iota(xt2.shape)
    r0t = jnp.where(lane >= lt, xt2, 0)       # [TB, 128] this-row window
    r1t = jnp.where(lane < lt, xt2, 0)        # next-row straddle
    if stop_after == "mask":
        return _consume(r0t + r1t)
    rows = shr(goff, jnp.int32(12))           # [1, TB] absolute segment row
    if _ROWACC_IMPL == "mxu" and stop_after == "full":
        return _rowacc_mxu(r0t, r1t, rows, out_ref)
    t = rows.T                                # [TB, 1]

    # Row accumulation in 128-block windows: rows are monotone along
    # blocks, so each window touches only a small dynamic row range (its
    # own bit span / 4096).  All windows advance through their ranges in
    # ONE fori (trip count = the longest window span): per iteration
    # each window contributes one masked reduction + one row RMW, so the
    # independent windows' reduce/RMW chains interleave (latency hiding
    # — the same lesson as kernels/huffdec.py's group interleave) and
    # the loop pays one trip-count scalar sync instead of one per
    # window.  The this-row (t == r) and next-row-straddle (t == r - 1)
    # halves stack into a single [256, 128] keyed reduction — half the
    # cross-sublane reductions of the two-pass form.  Exhausted windows
    # contribute exact zeros (their keys can't match r past max+1); the
    # RMW row just clamps in-bounds.
    nwin = tb // 128
    keys, data, mins, spans = [], [], [], []
    for k in range(nwin):
        sl = slice(k * 128, (k + 1) * 128)
        data.append(jnp.concatenate([r0t[sl], r1t[sl]], axis=0))
        keys.append(jnp.concatenate([t[sl], t[sl] + 1], axis=0))
        mins.append(jnp.min(t[sl]))
        spans.append(jnp.max(t[sl]) + 2 - mins[k])
    span = spans[0]
    for s in spans[1:]:
        span = jnp.maximum(span, s)

    R = _ROWACC_UNROLL

    def rbody(i, _):
        for u in range(R):
            for k in range(nwin):
                r = mins[k] + i * R + u
                add = jnp.sum(jnp.where(keys[k] == r, data[k], 0),
                              axis=0, keepdims=True, dtype=jnp.int32)
                # exhausted windows (r past their span) add exact zeros
                # into their clamped last row
                rc = jnp.minimum(r, mins[k] + spans[k] - 1)
                out_ref[pl.dslice(rc, 1), :] = \
                    out_ref[pl.dslice(rc, 1), :] + add
        return 0

    jax.lax.fori_loop(0, span if R == 1 else (span + R - 1) // R,
                      rbody, 0)


def _rowacc_mxu(r0t, r1t, rows, out_ref):
    """One-hot-matmul row accumulation (``_ROWACC_IMPL = "mxu"``).

    Each 128-block window's keyed reduction — out[r] += sum of the
    window's this-row (key r) and straddle (key r-1) pieces — is
    exactly ``OH @ data`` with OH[r, j] = (keys[j] == base + r), one
    [R, 256] x [256, 128] matmul per field.  The int32 words split into
    FOUR 8-BIT fields: placed bit ranges are disjoint across blocks, so
    each field's true per-row sum <= 255 — exact under the MXU's
    default-bf16 passes (0/1 one-hots against ints <= 256, the same
    rule the front's permutation matmuls use; 11-bit fields measured
    WRONG on hardware 2026-08-20 while CPU-interpret f32 hid it) — and
    the shifted recombination has no cross-field carries.  The fori of
    per-row masked reductions + serial row RMWs this replaces was the
    largest place-tail term (r3 attribution: 4.8 us/slab).

    ``R`` covers a window's worst span (56 rows + 2 straddle, see
    ``_ACC_ROWS``) plus up to 7 rows of store alignment: the dynamic
    multi-row RMW needs an 8-aligned base, so the base rounds down to
    8*floor(min_row/8) (clipped so base + R stays in bounds — clipping
    only lowers it, keys stay covered)."""
    shr = jax.lax.shift_right_logical
    tb = r0t.shape[0]
    out_rows = out_ref.shape[0]
    R = min(_ROWACC_R, out_rows)
    fields = [((r0t & 255), (r1t & 255)),
              ((shr(r0t, jnp.int32(8)) & 255),
               (shr(r1t, jnp.int32(8)) & 255)),
              ((shr(r0t, jnp.int32(16)) & 255),
               (shr(r1t, jnp.int32(16)) & 255)),
              (shr(r0t, jnp.int32(24)), shr(r1t, jnp.int32(24)))]
    kmax = (out_rows - R) // 8
    for k in range(tb // 128):
        sl = slice(k * 128, (k + 1) * 128)
        rw = rows[:, sl]                                 # [1, 128]
        keys = jnp.concatenate([rw, rw + 1], axis=1)     # [1, 256]
        base = 8 * jnp.clip(shr(jnp.min(rw), jnp.int32(3)), 0, kmax)
        oh = ((jax.lax.broadcasted_iota(jnp.int32, (R, 256), 0) + base)
              == jnp.broadcast_to(keys, (R, 256))).astype(jnp.float32)
        acc = jnp.zeros((R, 128), jnp.int32)
        for sh, (f, g) in zip((0, 8, 16, 24), fields):
            d = jnp.concatenate([f[sl], g[sl]],
                                axis=0).astype(jnp.float32)  # [256, 128]
            s = jax.lax.dot_general(
                oh, d, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            acc = acc + (s << sh if sh else s)
        out_ref[pl.dslice(base, R)] = out_ref[pl.dslice(base, R)] + acc


def _place_tail_w16(hi, lo, w, goff, out_ref, lw_ref):
    """16-row local pack window: 4 rotate rounds on 1/8th of the data.

    Valid only when every block in the chunk fits 16 local words
    (<= 480 bits — ``_place_body`` cond-guards; real-image chunks
    essentially always do).  The word-group position within the
    4096-bit row ((goff >> 9) & 7) moves out of the rotate and into the
    row-accumulation masks, which assemble each output row's [1, 128]
    update from eight 16-lane group reductions — the same reduced
    element count as the full path's two [*, 128] reductions, so the
    rotate/shift savings are pure.
    """
    shr = jax.lax.shift_right_logical
    tb = hi.shape[1]

    lw_ref[0:16, :] = jnp.zeros((16, tb), jnp.int32)

    def wbody(j, _):
        cj = jnp.sum(jnp.where(w == j, hi, 0), axis=0, keepdims=True,
                     dtype=jnp.int32)
        cj = cj + jnp.sum(jnp.where(w == j - 1, lo, 0), axis=0,
                          keepdims=True, dtype=jnp.int32)
        lw_ref[pl.dslice(j, 1), :] = cj
        return 0

    jax.lax.fori_loop(0, jnp.max(w) + 2, wbody, 0)
    lw = lw_ref[0:16, :]

    sub = _sub_iota((16, tb))
    s = goff & 31
    prev = pltpu.roll(lw, 1, axis=0)
    prev = jnp.where(sub == 0, 0, prev)
    shifted = jnp.where(s == 0, lw, shr(lw, s) | (prev << ((32 - s) & 31)))

    l4 = shr(goff, jnp.int32(5)) & 15
    x = shifted
    for k in range(4):
        rolled = pltpu.roll(x, 1 << k, axis=0)
        x = jnp.where((shr(l4, jnp.int32(k)) & 1) == 1, rolled, x)

    xt2 = x.T                                 # [TB, 16]
    lt = l4.T                                 # [TB, 1]
    lane = _lane_iota(xt2.shape)
    r0t = jnp.where(lane >= lt, xt2, 0)       # own 512-bit group
    r1t = jnp.where(lane < lt, xt2, 0)        # next-group straddle
    g0 = shr(goff, jnp.int32(9)).T            # [TB, 1] absolute group

    for w0 in range(0, tb, 128):
        r0w = r0t[w0:w0 + 128]
        r1w = r1t[w0:w0 + 128]
        gw = g0[w0:w0 + 128]
        # rows touched by this window: groups g (piece0) and g+1 (piece1)
        lo_r = shr(jnp.min(gw), jnp.int32(3))
        hi_r = shr(jnp.max(gw) + 1, jnp.int32(3)) + 1

        def rbody(r, _, gw=gw, r0w=r0w, r1w=r1w):
            base = r * 8
            pieces = []
            for g in range(8):
                p = jnp.sum(jnp.where(gw == base + g, r0w, 0), axis=0,
                            keepdims=True, dtype=jnp.int32)
                p = p + jnp.sum(jnp.where(gw == base + g - 1, r1w, 0),
                                axis=0, keepdims=True, dtype=jnp.int32)
                pieces.append(p)
            add = jnp.concatenate(pieces, axis=1)
            out_ref[pl.dslice(r, 1), :] = out_ref[pl.dslice(r, 1), :] + add
            return 0

        jax.lax.fori_loop(lo_r, hi_r, rbody, 0)


def _place_resident_kernel(value_ref, nbits_ref, out_ref, tot_ref,
                           lw_ref, carry_ref):
    """Segment-resident place: no scatter, no XLA offset cumsum.

    Grid is (S, tiles_per_seg); the out block is the segment's whole
    [seg_rows_p, 128] words buffer, whose index map is constant in the
    inner tile dimension — Mosaic keeps it VMEM-resident across the
    segment's tiles and writes it to HBM once, so tiles accumulate their
    rows with dynamic-slice adds instead of the XLA windowed scatter that
    dominated the encode step.
    """
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)
        carry_ref[:, :] = jnp.zeros_like(carry_ref)

    _place_body(value_ref[:], nbits_ref[:], out_ref, tot_ref, lw_ref,
                carry_ref)


def _place_acc_kernel(value_ref, nbits_ref, goff_ref, acc_ref, lw_ref):
    """Local pack + tile-dense row accumulation.

    Same front as ``_place_kernel`` (per-slot offsets, local words, bit
    shift, lane rotate), but instead of emitting one 2x128-word window
    per BLOCK (whose XLA row-scatter of nblk*2 updates dominated the
    whole encode step), each tile accumulates its blocks' windows into a
    dense [_ACC_ROWS, 128] row buffer.  Block bit offsets are sorted
    within a tile (tiles never span segments), so the row index
    ``t = (goff >> 12) - rows[0]`` is small and monotone and the
    accumulation is a short dynamic-bound loop of masked sublane
    reductions.  The caller scatter-adds ONE 64-row window per tile —
    nblk/128 updates instead of 2*nblk.
    """
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

    tb = v.shape[1]
    lw_ref[:, :] = jnp.zeros((128, tb), jnp.int32)

    def wbody(j, _):
        cj = jnp.sum(jnp.where(w == j, hi, 0), axis=0, keepdims=True,
                     dtype=jnp.int32)
        cj = cj + jnp.sum(jnp.where(w == j - 1, lo, 0), axis=0,
                          keepdims=True, dtype=jnp.int32)
        lw_ref[pl.dslice(j, 1), :] = cj
        return 0

    jax.lax.fori_loop(0, jnp.max(w) + 2, wbody, 0)  # hi -> w, lo -> w + 1
    lw = lw_ref[:]

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

    # block-major windows + tile-relative output rows (sorted, small);
    # one transpose, masks applied in the transposed space
    xt2 = x.T                                 # [TB, 128]
    lt = l.T                                  # [TB, 1]
    lane = _lane_iota(xt2.shape)
    r0t = jnp.where(lane >= lt, xt2, 0)       # [TB, 128]
    r1t = jnp.where(lane < lt, xt2, 0)
    rows = shr(goff, jnp.int32(12))
    t = (rows - rows[0, 0]).T                 # [TB, 1]

    acc_ref[:, :] = jnp.zeros((_ACC_ROWS, tb), jnp.int32)

    def rbody(r, _):
        c = jnp.sum(jnp.where(t == r, r0t, 0), axis=0, keepdims=True,
                    dtype=jnp.int32)
        c = c + jnp.sum(jnp.where(t == r - 1, r1t, 0), axis=0,
                        keepdims=True, dtype=jnp.int32)
        acc_ref[pl.dslice(r, 1), :] = c
        return 0

    jax.lax.fori_loop(0, jnp.max(t) + 2, rbody, 0)  # r0 -> t, r1 -> t + 1


def _segment_place(value_t, nbits_t, bits, S: int, nblk: int, seg_rows: int,
                   interpret: bool):
    """Shared tail: place the attached fields into per-segment bit streams.

    Fast path (segment words buffer fits the VMEM budget): the resident
    kernel — offsets, local pack, and row accumulation all in one Pallas
    call, no XLA scatter or prefix sum.  Fallback for huge segments: the
    tile-dense accumulator + windowed scatter-add.
    """
    seg_rows_p = (seg_rows + 7) & ~7
    if seg_rows_p * 128 * 4 <= _RESIDENT_VMEM_BUDGET:
        tiles_per_seg = nblk // S // _TB
        out, tot = pl.pallas_call(
            _place_resident_kernel,
            out_shape=[jax.ShapeDtypeStruct((S * seg_rows_p, 128), jnp.int32),
                       jax.ShapeDtypeStruct((S * 8, 128), jnp.int32)],
            grid=(S, tiles_per_seg),
            in_specs=[pl.BlockSpec((64, _TB),
                                   lambda s, c, t=tiles_per_seg: (0, s * t + c),
                                   memory_space=pltpu.VMEM)] * 2,
            out_specs=[pl.BlockSpec((seg_rows_p, 128), lambda s, c: (s, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((8, 128), lambda s, c: (s, 0),
                                    memory_space=pltpu.VMEM)],
            scratch_shapes=[pltpu.VMEM((128, _TB), jnp.int32),
                            pltpu.VMEM((1, 128), jnp.int32)],
            interpret=interpret,
        )(value_t, nbits_t)
        words = jax.lax.bitcast_convert_type(
            out.reshape(S, seg_rows_p, 128)[:, :seg_rows], jnp.uint32)
        return words.reshape(S, seg_rows * 128), tot.reshape(S, 8, 128)[:, 0, 0]
    grid = (nblk // _TB,)
    dat = lambda: pl.BlockSpec((64, _TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
    block_bits = bits.reshape(S, nblk // S)
    ends = jnp.cumsum(block_bits, axis=-1)
    total_bits = ends[:, -1]
    goff_seg = ends - block_bits
    seg_base = (jnp.arange(S, dtype=jnp.int32) * (seg_rows * 128 * 32))[:, None]
    goff = (goff_seg + seg_base).reshape(1, -1)

    n_tiles = nblk // _TB
    acc = pl.pallas_call(
        _place_acc_kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles * _ACC_ROWS, 128), jnp.int32),
        grid=grid,
        in_specs=[dat(), dat(),
                  pl.BlockSpec((1, _TB), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_ACC_ROWS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((128, _TB), jnp.int32)],
        interpret=interpret,
    )(value_t, nbits_t, goff.astype(jnp.int32))

    # one overlapping-window scatter-add per tile (updates apply
    # sequentially, bit ranges are disjoint so add == or)
    tile_rows = (goff.reshape(n_tiles, _TB)[:, 0] >> 12).astype(jnp.int32)
    words = jnp.zeros((S * seg_rows + _ACC_ROWS + 2, 128), jnp.int32)
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,))
    words = jax.lax.scatter_add(
        words, tile_rows[:, None], acc.reshape(n_tiles, _ACC_ROWS, 128),
        dnums, indices_are_sorted=True, unique_indices=False,
        mode=jax.lax.GatherScatterMode.CLIP)
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

    return _segment_place(value_t, nbits_t, bits, S, nblk, seg_rows,
                          interpret)
