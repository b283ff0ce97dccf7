"""Device-parallel baseline Huffman decode: restart segments on VPU lanes.

Baseline entropy decode is bit-serial WITHIN a restart segment but
embarrassingly parallel ACROSS segments (DC predictors reset at every
RSTn, T.81 F.2.1.3.1).  The C++ host runtime exploits this with threads
(``native/jpeg_tpu_host.cpp`` ``jt_decode_scan_mt``); this kernel is the
TPU-native version: 128-lane groups of segments decode in lockstep on
the VPU lanes — ``_SYM_GROUP`` symbols per loop iteration, several
independent lane GROUPS interleaved per invocation (latency hiding),
bits served from a once-per-group contiguous register-file fetch, and
the canonical-code length found by a monotone-boundary count
(T.81 F.2.2.3 DECODE reformulated; the dual of
``main/encoder.c:145-176``).  The 2026-08-19 hardware attribution that
shaped this: the [64, 128] coefficient placement costs ~nothing (VPU
throughput is not the bound); per-symbol gathers/transposes and
cross-sublane reductions (XLU) plus the serial bit-position chain are
— so the design minimizes XLU touches per symbol and overlaps
independent chains.

Layout rules (all shaped around Mosaic's gather constraint —
``take_along_axis`` along lanes needs full-shape indices, so every
per-symbol gather runs against a [128, W] source with W small):

* streams: [Sp, max_words] u32 big-endian bit streams, one segment per
  sublane row (the host un-stuffs 0xFF00 and splits at RSTn markers —
  byte fiddling, not FLOPs);
* a [128, 64]-word VMEM window slides over each lane's stream (per-lane
  word base; when any lane nears the edge, one full-row gather refills
  every lane at its own position);
* per-lane canonical tables: maxcode / (valptr - mincode) as [64, Sp]
  (4 tables x 16 lengths on sublanes) and HUFFVAL byte-packed 4-per-word
  as [Sp, 256] — so per-IMAGE Huffman tables come for free (each lane
  carries its own) and the symbol lookup gathers a [128, 64] source;
* decode state (bit position, DC predictors, window base) lives in
  [1, 128] rows — one VPU register each.

Block-synchronized iteration: all lanes decode block b together (a lane
that hit its EOB idles until the slowest lane finishes), and the block
chunk per grid step is a multiple of the MCU period, so the component /
table choice for block b is Python-static — no per-lane table selection
ever happens.  Restart streams with uniform segments (this framework's
own output; ``restart_interval_mcu_rows`` always divides the MCU rows)
are eligible; anything else falls back to the native host decoder.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LG = 128   # lanes per segment group
_WNDW = 64  # sliding window words per lane (> worst-case block: 57)
_SYM_GROUP = 5  # AC symbols decoded per while-loop iteration.  The
# while cond (vector->scalar ``any`` + branch) and the window-refill
# ``cond`` (vector->scalar ``max`` + branch) are scalar-core syncs that
# cost ~10x the loop body's vector work (measured 2026-08-19: ~1.2 us
# per single-symbol iteration vs ~0.1 us of vector ops); decoding a
# straight-line group of symbols per iteration amortizes both.  Lanes
# that finish mid-group idle masked — the group size trades a little
# wasted vector work for far fewer scalar syncs.  Re-calibrated
# 2026-08-20 with the component-sized peel in place: 5 beats 6 by
# ~1.8% reproducibly (6.93 vs 7.06 ms on the 640-lane bench batch; 7
# regresses to 7.59) — with most luma symbols peeled, the while tail
# sees sparser lanes and the smaller group wastes fewer masked decodes.
# blocks per grid step: a multiple of the MCU period (so table choice
# is static) whose x64 out-lane count is 128-aligned; kept at one or two
# MCUs because each block unrolls a full decode body in the kernel
# (larger chunks balloon Mosaic compile time)
_CHUNK = {6: 6, 4: 4, 3: 6, 1: 4}

# group-interleave candidates for decode_segments, best first.  The
# 2026-08-19 hardware sweep (16x640x640, 40 segs/img = 640 lanes):
# G=5/SG=6 hits 705 MP/s vs 299 at G=1/SG=4 — deeper interleave hides
# the per-symbol chain latency; SG=8+ regresses (register pressure).
_G_CANDS = (5, 4, 3, 2)

# PROFILING-ONLY trace-time knob (bench scripts monkeypatch): a set of
# phase names to SKIP inside the AC symbol loop — "acc" (coefficient
# placement), "core" (canonical decode, replaced by a fixed 4-bit
# symbol), "fetch" (window peek, replaced by a constant).  Output is
# garbage when non-empty; never set in production.
_PROF_SKIP: frozenset = frozenset()

# MCU pattern per sampling: (dc_table_row, ac_table_row, component) per
# block position; table rows index the stacked [4 x 16] canonical tables
# (0 = luma DC, 1 = luma AC, 2 = chroma DC, 3 = chroma AC).  "gray" is a
# single-component scan: the MCU is one 8x8 block (T.81 A.2, scans with
# one component are never interleaved).
_PATTERN = {
    "420": [(0, 1, 0)] * 4 + [(2, 3, 1), (2, 3, 2)],
    "422": [(0, 1, 0)] * 2 + [(2, 3, 1), (2, 3, 2)],
    "444": [(0, 1, 0), (2, 3, 1), (2, 3, 2)],
    "gray": [(0, 1, 0)],
}

# SOF sampling factors (Y, Cb, Cr as (h, v)) -> sampling mode; the single
# source of truth for every eligibility check in the decode paths
SAMPLING_OF_FACTORS = {
    ((2, 2), (1, 1), (1, 1)): "420",
    ((2, 1), (1, 1), (1, 1)): "422",
    ((1, 1), (1, 1), (1, 1)): "444",
}


def canonical_tables(bits: np.ndarray, huffval: np.ndarray):
    """DHT (BITS, HUFFVAL) -> (bound [16], delta [16], hv [256]).

    T.81 F.2.2.3 reformulated as monotone 16-bit-aligned boundaries:
    ``bound[l-1] = (first 16-bit-aligned value past all codes of
    length <= l)``, i.e. (maxcode_l + 1) << (16 - l) with empty
    lengths carrying the running code forward.  Bounds are monotone
    non-decreasing, so with the shifted companion table
    ``bound_prev`` (``_prev_bounds``: row l = bound[l-1], row 0 = 0)
    exactly one row satisfies ``bound_prev[l-1] <= peek16 <
    bound[l-1]`` — the true code length — and
    ``_decode_symbol_core`` extracts symbol index AND length from
    that interval hit with ONE cross-sublane masked-sum reduction.
    A peek >= bound[15] matches no row -> length 17 = invalid
    (covers empty tables and corrupt bits).  The symbol is
    hv[(peek16 >> (16 - len)) + delta[len - 1]].
    """
    bound = np.zeros(16, np.int64)
    delta = np.zeros(16, np.int64)
    code = 0
    k = 0
    for l in range(1, 17):
        n = int(bits[l])
        if n:
            delta[l - 1] = k - code
        bound[l - 1] = (code + n) << (16 - l)
        code = (code + n) << 1
        k += n
    hv = np.zeros(256, np.int64)
    hv[:len(huffval)] = np.asarray(huffval, np.int64)
    return bound, delta, hv


def _sub_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def _shr(x, s):
    return jax.lax.shift_right_logical(x, s)


def _fetch32(wnd, base_bits, bitpos):
    """Aligned 32-bit big-endian peek at ``bitpos`` per lane.

    wnd: [128, _WNDW] window VALUE; base_bits: [1, 128] window origin in
    bits (32-aligned); bitpos: [1, 128].  Returns peek32 [1, 128] with
    bits [bitpos, bitpos+32) left-aligned.
    """
    rel = jnp.clip(_shr(bitpos - base_bits, jnp.int32(5)), 0, _WNDW - 2)
    idx = rel.T + (_lane_iota((_LG, _WNDW)) & 1)  # lanes 0,1 -> w, w+1
    got = jnp.take_along_axis(wnd, idx, axis=1)
    pair = got[:, 0:2].T                          # [2, 128]
    w0, w1 = pair[0:1], pair[1:2]
    s = bitpos & 31
    return jnp.where(s == 0, w0, (w0 << s) | _shr(w1, (32 - s) & 31))


def _prev_bounds(maxc):
    """Stacked [16k, N] boundary tables -> the same tables shifted down
    one LENGTH row within each 16-row table (row l of the result =
    bound[l-1], row 0 = 0, always <= any peek).

    Row l-1 of ``bound_prev <= peek < bound`` isolates the true code
    length in ``_decode_symbol_core`` with ONE masked-sum reduction.
    Computed with plain XLA ops OUTSIDE the Pallas kernels (tiny [64, S]
    arrays, once per launch) and passed in as a fourth table operand —
    no in-kernel sublane shuffling at all."""
    rows = jax.lax.broadcasted_iota(jnp.int32, maxc.shape, 0)
    return jnp.where(rows % 16 == 0, 0, jnp.roll(maxc, 1, axis=0))


def _prep_tables(tabs):
    """(maxc, delt, hvp) table triple -> the 4-operand form
    ``_decode_symbol_core`` consumes: (bound, bound_prev, delta,
    packed HUFFVAL), with ``bound_prev`` derived via ``_prev_bounds``.
    Plain XLA ops, run once per launch outside the kernels."""
    maxc, delt, hvp = tabs
    return maxc, _prev_bounds(maxc), delt, hvp


def _decode_symbol_core(peek32, bnd16, bnd_prev16, delt16, hvp64):
    """One canonical Huffman decode step for every lane, against
    PRE-SLICED per-table arrays (``_prep_tables``): bnd16/bnd_prev16/
    delt16 [16, 128] (monotone boundaries + deltas,
    ``canonical_tables``), hvp64 [128, 64] byte-packed HUFFVAL
    (4 symbols/word).  Returns (sym, code length) [1, 128] each; length
    17 marks no-match (corrupt or padding — callers mask on it).

    Cost shape: two [16, 128] compares + ONE cross-sublane masked sum +
    one gather.  The boundaries are monotone, so exactly the row
    ``l = len`` satisfies ``bound[l-1] <= peek16 < bound[l]`` (none for
    len 17): summing a per-row packed ``(symidx << 5) | l`` under that
    mask yields symbol index AND length in a single XLU reduction —
    the old count-then-select form cost two SERIAL reductions per
    symbol, the dominant latency term of the decode chain."""
    peek16 = _shr(peek32, jnp.int32(16))
    pb = jnp.broadcast_to(peek16, (16, _LG))
    ge = pb >= bnd16
    hit = (pb >= bnd_prev16) & ~ge          # true only at row len-1
    lrow = _sub_iota((16, _LG)) + 1         # l = 1..16 per row
    val = jnp.clip(_shr(pb, 16 - lrow) + delt16, 0, 255)
    packed = jnp.sum(jnp.where(hit, (val << 5) | lrow, 0), axis=0,
                     keepdims=True, dtype=jnp.int32)
    ln = jnp.where(ge[15:16], 17, packed & 31)   # all-ge: past every bound
    symidx = _shr(packed, jnp.int32(5))
    widx = jnp.broadcast_to(_shr(symidx, jnp.int32(2)).T, (_LG, 64))
    word = jnp.take_along_axis(hvp64, widx, axis=1)[:, 0:1].T
    sym = _shr(word, 8 * (symidx & 3)) & 0xFF
    return sym, ln


def _tables_static(maxc, maxcp, delt, hvp, tbl: int):
    """Static table row ``tbl`` of the stacked [4 x 16] arrays."""
    return (maxc[16 * tbl:16 * (tbl + 1)], maxcp[16 * tbl:16 * (tbl + 1)],
            delt[16 * tbl:16 * (tbl + 1)], hvp[:, 64 * tbl:64 * (tbl + 1)])


def _tables_dyn(maxc, maxcp, delt, hvp, tsel):
    """PER-LANE table row (``tsel`` [1, 128] in 0..3) — speculative
    interleaved decode, where each lane carries its own MCU phase and
    so its own current component/table.  Select ONCE per block; the
    result feeds every symbol's ``_decode_symbol_core``."""
    maxc_s = jnp.zeros((16, _LG), jnp.int32)
    maxcp_s = jnp.zeros((16, _LG), jnp.int32)
    delt_s = jnp.zeros((16, _LG), jnp.int32)
    hvp_s = jnp.zeros((_LG, 64), jnp.int32)
    tsel_t = tsel.T  # transpose the int32 selector, not the bool mask —
    #                  Mosaic cannot legalize i1 vector transposes
    for t in range(4):
        m = tsel == t
        maxc_s = jnp.where(m, maxc[16 * t:16 * (t + 1)], maxc_s)
        maxcp_s = jnp.where(m, maxcp[16 * t:16 * (t + 1)], maxcp_s)
        delt_s = jnp.where(m, delt[16 * t:16 * (t + 1)], delt_s)
        hvp_s = jnp.where(tsel_t == t, hvp[:, 64 * t:64 * (t + 1)], hvp_s)
    return maxc_s, maxcp_s, delt_s, hvp_s


def _lane_pattern(sampling: str, pos):
    """Per-lane (dc row, ac row, component) for MCU position ``pos``
    ([1, 128] in 0..period-1), via static selects over the pattern."""
    pat = _PATTERN[sampling]
    dcs = jnp.zeros_like(pos)
    acs = jnp.zeros_like(pos)
    cmp = jnp.zeros_like(pos)
    for q, (d, a, c) in enumerate(pat):
        m = pos == q
        dcs = jnp.where(m, d, dcs)
        acs = jnp.where(m, a, acs)
        cmp = jnp.where(m, c, cmp)
    return dcs, acs, cmp


def _extend(extra, size):
    """T.81 F.2.2.1 EXTEND: ``size``-bit magnitude -> signed value."""
    half = jnp.left_shift(1, jnp.clip(size - 1, 0, 31))
    full = jnp.left_shift(1, jnp.clip(size, 0, 31)) - 1
    return jnp.where((size > 0) & (extra < half), extra - full, extra)


def _take_bits(peek32, off, n):
    """Bits [off, off+n) of peek32 as an unsigned value ([1, 128])."""
    v = _shr(peek32 << jnp.clip(off, 0, 31),
             (32 - jnp.clip(n, 1, 31)) & 31)
    return jnp.where(n == 0, 0, v)


# luma blocks peel DC + _PEEL_LUMA ACs on one register-file fetch before
# the while loop (most blocks' full symbol run is covered, so they skip
# the loop and its per-iteration scalar syncs outright); chroma blocks
# are almost always DC + EOB, so they peel just one AC.  2026-08-19
# hardware sweep (640 lanes, G=5, SG=6): 7 -> 851 MP/s, 11 -> 897,
# 15 -> 941, 19 -> 983 (peak), 21 -> 941, 23 -> 845 — past the peak the
# unconditional masked decodes on sparse blocks outweigh the saved
# while iterations.
_PEEL_LUMA = 19

# the positions pass peels NOTHING (see _scan_kernel): its lanes run to
# a uniform grid cap, so any unconditional decode multiplies across
# every lane and block; only the DC folds into the register-file fetch.
# 2026-08-19 sweep on the 3-scan fused wall: 0 -> 131 ms, 2 -> 191,
# 4 -> 134, 19 -> 297.
_PEEL_SCAN = 0

# reserve for group-decoding: the kernel's largest straight-line run at
# <= 31 bits per symbol (16-bit code + 15 claimed magnitude bits on a
# corrupt stream) plus the final symbol's 2-word aligned peek.  Sized
# PER KERNEL from its peel: an oversized reserve multiplies refill
# frequency, and a refill costs max_words/128 chunked gathers — the
# dominant term for long speculative streams.
def _reserve_for(peel: int) -> int:
    return 3 + (max(peel + 1, _SYM_GROUP) * 31 + 31) // 32

# contiguous words fetched once per symbol group: alignment slack (1) +
# the group's worst-case consumption + the last symbol's 2-word peek
def _nw_for(nsyms: int) -> int:
    return 2 + (nsyms * 31 + 31) // 32 + 1


_NW_GROUP = _nw_for(_SYM_GROUP)


def _group_fetch(wnd, base_bits, bp, nw: int = _NW_GROUP):
    """ONE gather + ONE transpose serving a whole symbol group.

    The per-symbol ``_fetch32`` costs a dynamic gather and two lane<->
    sublane transposes on the XLU — the serial resource this kernel is
    bound on (measured 2026-08-19: skipping the [64,128] coefficient
    placement entirely changes nothing, so the VPU is not the
    bottleneck).  Bits consumed by a group are CONTIGUOUS from the
    group's start position, so one [128, _NW_GROUP] gather + transpose
    yields a per-lane register file ``wc`` [_NW_GROUP, 128] from which
    each symbol's 32-bit peek is assembled with cheap lane-oriented
    selects (``_peek_from``).  Returns (wc, word_base_bits)."""
    rel0 = jnp.clip(_shr(bp - base_bits, jnp.int32(5)), 0, _WNDW - nw)
    # Mosaic's dynamic_gather wants FULL-shape indices (same shape as
    # the source); only the first ``nw`` gathered columns are used
    idx = jnp.minimum(rel0.T + _lane_iota((_LG, _WNDW)), _WNDW - 1)
    wc = jnp.take_along_axis(wnd, idx, axis=1)[:, :nw].T
    return wc, base_bits + rel0 * 32


def _peek_from(wc, word_base, bp):
    """32-bit big-endian peek at ``bp`` from the group register file."""
    off = bp - word_base                             # [1, 128]
    wsel = _shr(off, jnp.int32(5))
    s = off & 31
    w0 = jnp.zeros_like(bp)
    w1 = jnp.zeros_like(bp)
    for k in range(wc.shape[0] - 1):
        m = wsel == k
        w0 = jnp.where(m, wc[k:k + 1], w0)
        w1 = jnp.where(m, wc[k + 1:k + 2], w1)
    return jnp.where(s == 0, w0, (w0 << s) | _shr(w1, (32 - s) & 31))


def _hd_kernel(streams_ref, maxc_ref, maxcp_ref, delt_ref, hvp_ref,
               nblk_ref, entry_ref, phase_ref, out_ref, st_ref, wnd_ref, *,
               sampling: str, nblk_real: int, chunk: int, max_words: int,
               phased: bool = False, groups: int = 1,
               always_live: bool = False, peel_luma: int = _PEEL_LUMA):
    # st_ref rows: 0 bit position, 1..3 DC predictors, 4 window base
    # (bits, 32-aligned; -32*_WNDW forces the first refill)
    #
    # ``groups``: independent 128-lane groups decoded INTERLEAVED in this
    # invocation.  The per-symbol dependency chain (window gather ->
    # canonical-length reductions -> HUFFVAL gather -> bit advance) is
    # latency-bound on a single group (measured 2026-08-19: ~1.1 us per
    # 4-symbol iteration vs ~0.15 us of vector throughput); G groups'
    # chains are mutually independent, so interleaving their ops inside
    # one while loop fills the stalls.  All lane-indexed refs carry
    # G*_LG lanes; group g owns lanes [g*_LG, (g+1)*_LG).
    period = len(_PATTERN[sampling])
    c = pl.program_id(1)
    G = groups

    nblk_l = nblk_ref[:]       # [1, G*128] per-lane real block count
    phase_l = phase_ref[:]

    @pl.when(c == 0)
    def _():
        st_ref[:, :] = jnp.zeros_like(st_ref)
        st_ref[0:1, :] = entry_ref[:]  # per-lane start bit (0 = row start)
        st_ref[4:5, :] = jnp.full((1, G * _LG), -32 * _WNDW, jnp.int32)

    reserve = _reserve_for(peel_luma)

    def L(g):
        return slice(g * _LG, (g + 1) * _LG)

    gtabs = [(maxc_ref[:, L(g)], maxcp_ref[:, L(g)], delt_ref[:, L(g)],
              hvp_ref[L(g), :]) for g in range(G)]

    def refill_all(bps):
        """Refill EVERY group's window at its lanes' positions (one
        scalar cond for all groups: any group near its edge refills
        all — refills are rare enough that the over-refill is noise)."""
        def refill():
            for g in range(G):
                base_w = jnp.clip(_shr(bps[g], jnp.int32(5)), 0,
                                  max_words - _WNDW).T     # [128, 1]
                idx = base_w + _lane_iota((_LG, 128))
                acc = jnp.zeros((_LG, 128), jnp.int32)
                for k in range(0, max_words, 128):
                    src = streams_ref[L(g), k:k + 128]
                    got = jnp.take_along_axis(
                        src, jnp.clip(idx - k, 0, 127), axis=1)
                    acc = jnp.where((idx >= k) & (idx < k + 128), got, acc)
                wnd_ref[L(g), :] = acc[:, :_WNDW]
                st_ref[4:5, L(g)] = base_w.T * 32

        need = jnp.max(jnp.concatenate(
            [bps[g] - st_ref[4:5, L(g)] for g in range(G)], axis=1)) \
            > 32 * (_WNDW - reserve)
        jax.lax.cond(need, refill, lambda: None)

    for j in range(chunk):
        dct, act_t, comp = _PATTERN[sampling][j % period]
        # a per-block runtime cond is a scalar-core sync; skipped
        # entirely when the padded grid equals the real block count
        # (uniform restart segments — this framework's own output)
        blk_live = (c * chunk + j) < nblk_real     # scalar (static max)

        def dec_block(j=j, dct=dct, act_t=act_t, comp=comp):
            def ac_sym(g, done, slot, bp, acc, gf, ac_tabs):
                """One AC symbol for group ``g`` against its register
                file — shared by the peeled first group and the loop."""
                if "fetch" in _PROF_SKIP:  # profiling only
                    peek = bp | 1
                else:
                    peek = _peek_from(gf[g][0], gf[g][1], bp)
                if "core" in _PROF_SKIP:  # profiling only
                    sym, ln = (peek & 0x13) | 1, (peek & 7) + 2
                else:
                    sym, ln = _decode_symbol_core(peek, *ac_tabs[g])
                run = _shr(sym, jnp.int32(4))
                size = sym & 15
                bad = ln >= 17
                eob = (sym == 0) & ~bad
                zrl = (sym == 0xF0) & ~bad
                coef = _extend(_take_bits(peek, ln, size), size)
                live = (done == 0) & ~bad
                bp = bp + jnp.where(live, ln + size, 0)
                pos = slot + run
                wr = live & ~eob & ~zrl & (size > 0) & (pos <= 63)
                if "acc" in _PROF_SKIP:  # profiling only
                    pass  # acc unchanged: measures all-but-acc
                else:
                    acc = acc + jnp.where(
                        jnp.broadcast_to(wr, (64, _LG))
                        & (_sub_iota((64, _LG))
                           == jnp.broadcast_to(pos, (64, _LG))),
                        jnp.broadcast_to(coef, (64, _LG)), 0)
                slot = jnp.where(live,
                                 jnp.where(zrl, slot + 16, pos + 1),
                                 slot)
                done = done | (~live | eob
                               | (slot > 63)).astype(jnp.int32)
                return [done, slot, bp, acc]

            bitpos = [st_ref[0:1, L(g)] for g in range(G)]
            refill_all(bitpos)
            # window contents/origins only change at refills: load once
            # per group per refill_all, not per symbol
            wnds = [wnd_ref[L(g), :] for g in range(G)]
            bases = [st_ref[4:5, L(g)] for g in range(G)]
            # -- peeled first group: DC + peel_ac ACs on one
            # register-file fetch (a DC consumes <= 31 bits, exactly an
            # AC's worst case).  This folds the DC's former separate
            # gather + transposes and refill cond into the group
            # machinery.  The peel is sized per component (static for
            # block-synchronized patterns): luma peels enough to cover
            # its median symbol count so most blocks never enter the
            # while loop; chroma is almost always DC + EOB, so it peels
            # one AC and skips the loop outright.
            if phased:
                peel_ac = _SYM_GROUP - 1   # per-lane components: uniform
            else:
                peel_ac = peel_luma if comp == 0 else 1
            gf = [_group_fetch(wnds[g], bases[g], bitpos[g],
                               nw=_nw_for(peel_ac + 1))
                  for g in range(G)]
            ac_tabs, st0 = [], []
            for g in range(G):
                live_l = (c * chunk + j) < nblk_l[:, L(g)]
                peek = _peek_from(gf[g][0], gf[g][1], bitpos[g])
                if phased:  # per-lane MCU phase: per-lane tables/comp
                    pos = jax.lax.rem(phase_l[:, L(g)] + (c * chunk + j),
                                      jnp.int32(period))
                    dcs, acs, cmps = _lane_pattern(sampling, pos)
                    dc_t = _tables_dyn(*gtabs[g], dcs)
                    ac_t = _tables_dyn(*gtabs[g], acs)
                else:
                    cmps = None
                    dc_t = _tables_static(*gtabs[g], dct)
                    ac_t = _tables_static(*gtabs[g], act_t)
                ac_tabs.append(ac_t)
                sym, ln = _decode_symbol_core(peek, *dc_t)
                size = sym & 15
                ok = live_l & (ln < 17)
                diff = _extend(_take_bits(peek, ln, size), size)
                if phased:
                    pred = jnp.zeros_like(diff)
                    for cc in range(3):
                        pred = jnp.where(cmps == cc,
                                         st_ref[1 + cc:2 + cc, L(g)],
                                         pred)
                    dc = pred + jnp.where(ok, diff, 0)
                    for cc in range(3):
                        st_ref[1 + cc:2 + cc, L(g)] = jnp.where(
                            ok & (cmps == cc), dc,
                            st_ref[1 + cc:2 + cc, L(g)])
                else:
                    pred = st_ref[1 + comp:2 + comp, L(g)]
                    dc = pred + jnp.where(ok, diff, 0)
                    st_ref[1 + comp:2 + comp, L(g)] = dc
                bp = bitpos[g] + jnp.where(ok, ln + size, 0)
                okb = jnp.broadcast_to(ok, (64, _LG))
                acc0 = jnp.where(
                    okb & (_sub_iota((64, _LG)) == 0),
                    jnp.broadcast_to(dc, (64, _LG)), 0)
                st0.append([(~ok).astype(jnp.int32),
                            jnp.ones((1, _LG), jnp.int32), bp, acc0])
            for _ in range(peel_ac):
                for g in range(G):
                    st0[g] = ac_sym(g, *st0[g], gf, ac_tabs)

            # -- AC: _SYM_GROUP symbols per iteration per group, all
            # groups interleaved in ONE while loop (shared cond).  Lanes
            # that pass their EOB idle masked; a finished group idles
            # until the slowest group's lanes finish — the coupling
            # costs ~E[max over G]/E[max over 1] extra iterations but
            # buys G-way latency hiding, a large net win.
            # NOTE: loop carries are int32 0/1 masks, never bool — Mosaic
            # fails to legalize scf.yield with i1 vector carries (mixed
            # (1,128)/(8,128) vpad layouts; hit on first hardware compile)
            def cond(carry):
                return jnp.any(
                    jnp.concatenate([carry[4 * g] for g in range(G)],
                                    axis=1) == 0)

            def body(carry, ac_tabs=ac_tabs):
                st = [list(carry[4 * g:4 * g + 4]) for g in range(G)]
                refill_all([st[g][2] for g in range(G)])
                wnds = [wnd_ref[L(g), :] for g in range(G)]
                bases = [st_ref[4:5, L(g)] for g in range(G)]
                gf = [_group_fetch(wnds[g], bases[g], st[g][2])
                      for g in range(G)]
                for _ in range(_SYM_GROUP):
                    for g in range(G):
                        st[g] = ac_sym(g, *st[g], gf, ac_tabs)
                return tuple(x for g in range(G) for x in st[g])

            carry = tuple(x for g in range(G) for x in st0[g])
            # NOTE: the in-loop refill IS load-bearing — the threshold's
            # headroom at block start is far less than a worst-case
            # ~1700-bit block
            out = jax.lax.while_loop(cond, body, carry)
            for g in range(G):
                st_ref[0:1, L(g)] = out[4 * g + 2]
            return tuple(out[4 * g + 3] for g in range(G))

        if always_live:
            accs = dec_block()
        else:
            accs = jax.lax.cond(
                blk_live, dec_block,
                lambda: tuple(jnp.zeros((64, _LG), jnp.int32)
                              for _ in range(G)))
        for g in range(G):
            out_ref[L(g), j * 64:(j + 1) * 64] = accs[g].T


def _scan_kernel(streams_ref, maxc_ref, maxcp_ref, delt_ref, hvp_ref,
                 entry_ref, limit_ref, phase_ref, pos_ref, st_ref, wnd_ref,
                 *, sampling: str, chunk: int, max_words: int,
                 peel_luma: int = _PEEL_LUMA, groups: int = 1):
    """Positions-only speculative decode pass.

    Each lane walks blocks from its ``entry`` bit until its bit position
    reaches ``limit`` or a non-decodable code marks the lane bad.  No
    coefficients are emitted — only the exit bit position, the decoded
    block count, and the bad flag (``pos_ref`` rows 0..2), which drive
    the host's entry-point fixpoint (self-synchronizing Huffman, after
    "Accelerating JPEG Decompression on GPUs", arxiv 2111.09219).

    Period-1 patterns ("gray": grayscale images and the scans of a
    3-scan stream) use the static DC/AC table rows 0/1; interleaved
    patterns additionally speculate each lane's MCU PHASE (``phase_ref``
    — position of the lane's first block within the MCU period), which
    picks per-lane table rows per block.

    ``groups``: independent 128-lane groups decoded INTERLEAVED per
    invocation, exactly as in ``_hd_kernel`` — the per-symbol chain is
    latency-bound, so G mutually-independent chains in one while loop
    fill its stalls.  The r5 fused-decode breakdown showed the G=1
    positions passes were the dominant device cost (lane groups ran
    SEQUENTIALLY through grid dim 0, unlike the payload kernel).

    st rows: 0 bitpos, 1 dc pred (unused for positions, kept for
    layout), 3 block count, 4 window base, 5 sticky bad.
    """
    period = len(_PATTERN[sampling])
    c = pl.program_id(1)
    G = groups
    limit_l = limit_ref[:]
    phase_l = phase_ref[:]

    @pl.when(c == 0)
    def _():
        st_ref[:, :] = jnp.zeros_like(st_ref)
        st_ref[0:1, :] = entry_ref[:]
        st_ref[4:5, :] = jnp.full((1, G * _LG), -32 * _WNDW, jnp.int32)

    # peeled straight-line group sizing: UNLIKE decode_segments, ANY
    # unconditional peel loses here (the positions pass runs every lane
    # to the grid cap and walks near-empty chroma content too, so
    # masked decodes multiply: peel 19 measured 2.3x SLOWER, peel 2
    # 1.5x, on the 3-scan fused wall).  _PEEL_SCAN = 0: only the DC
    # folds into the register-file machinery.
    peel = peel_luma
    reserve = _reserve_for(peel)

    def L(g):
        return slice(g * _LG, (g + 1) * _LG)

    gtabs = [(maxc_ref[:, L(g)], maxcp_ref[:, L(g)], delt_ref[:, L(g)],
              hvp_ref[L(g), :]) for g in range(G)]

    def refill_all(bps):
        def refill():
            for g in range(G):
                base_w = jnp.clip(_shr(bps[g], jnp.int32(5)), 0,
                                  max_words - _WNDW).T
                idx = base_w + _lane_iota((_LG, 128))
                acc = jnp.zeros((_LG, 128), jnp.int32)
                for k in range(0, max_words, 128):
                    src = streams_ref[L(g), k:k + 128]
                    got = jnp.take_along_axis(
                        src, jnp.clip(idx - k, 0, 127), axis=1)
                    acc = jnp.where((idx >= k) & (idx < k + 128), got, acc)
                wnd_ref[L(g), :] = acc[:, :_WNDW]
                st_ref[4:5, L(g)] = base_w.T * 32

        need = jnp.max(jnp.concatenate(
            [bps[g] - st_ref[4:5, L(g)] for g in range(G)], axis=1)) \
            > 32 * (_WNDW - reserve)
        jax.lax.cond(need, refill, lambda: None)

    for j in range(chunk):
        def ac_sym(g, done, slot, bp, badacc, gf, ac_tabs):
            """One positions-only AC symbol for group ``g``."""
            peek = _peek_from(gf[g][0], gf[g][1], bp)
            sym, ln = _decode_symbol_core(peek, *ac_tabs[g])
            run = _shr(sym, jnp.int32(4))
            size = sym & 15
            bad = ln >= 17
            eob = (sym == 0) & ~bad
            zrl = (sym == 0xF0) & ~bad
            live = (done == 0) & ~bad
            badacc = badacc | ((done == 0) & bad).astype(jnp.int32)
            bp = bp + jnp.where(live, ln + size, 0)
            pos = slot + run
            slot = jnp.where(live,
                             jnp.where(zrl, slot + 16, pos + 1), slot)
            done = done | (~live | eob | (slot > 63)).astype(jnp.int32)
            return [done, slot, bp, badacc]

        bitpos0 = [st_ref[0:1, L(g)] for g in range(G)]
        refill_all(bitpos0)
        wnds = [wnd_ref[L(g), :] for g in range(G)]
        bases = [st_ref[4:5, L(g)] for g in range(G)]
        gf = [_group_fetch(wnds[g], bases[g], bitpos0[g],
                           nw=_nw_for(peel + 1)) for g in range(G)]
        ac_tabs, oks, st0 = [], [], []
        for g in range(G):
            if period > 1:
                pos = jax.lax.rem(phase_l[:, L(g)] + (c * chunk + j),
                                  jnp.int32(period))
                dcs, acs, _cmp = _lane_pattern(sampling, pos)
                dc_t = _tables_dyn(*gtabs[g], dcs)
                ac_t = _tables_dyn(*gtabs[g], acs)
            else:
                dc_t = _tables_static(*gtabs[g], 0)
                ac_t = _tables_static(*gtabs[g], 1)
            ac_tabs.append(ac_t)
            live_l = (bitpos0[g] < limit_l[:, L(g)]) & \
                (st_ref[5:6, L(g)] == 0)
            peek = _peek_from(gf[g][0], gf[g][1], bitpos0[g])
            sym, ln = _decode_symbol_core(peek, *dc_t)
            size = sym & 15
            ok = live_l & (ln < 17)
            badf = live_l & (ln >= 17)
            oks.append(ok)
            st0.append([(~ok).astype(jnp.int32),
                        jnp.ones((1, _LG), jnp.int32),
                        bitpos0[g] + jnp.where(ok, ln + size, 0),
                        badf.astype(jnp.int32)])
        for _ in range(peel):
            for g in range(G):
                st0[g] = ac_sym(g, *st0[g], gf, ac_tabs)

        # int32 0/1 carries, never bool (see the _hd_kernel NOTE: Mosaic
        # cannot legalize scf.yield with i1 vector loop carries)
        def cond(carry):
            return jnp.any(jnp.concatenate(
                [carry[4 * g] for g in range(G)], axis=1) == 0)

        def body(carry, ac_tabs=ac_tabs):
            st = [list(carry[4 * g:4 * g + 4]) for g in range(G)]
            refill_all([st[g][2] for g in range(G)])
            wnds = [wnd_ref[L(g), :] for g in range(G)]
            bases = [st_ref[4:5, L(g)] for g in range(G)]
            gf = [_group_fetch(wnds[g], bases[g], st[g][2])
                  for g in range(G)]
            for _ in range(_SYM_GROUP):
                for g in range(G):
                    st[g] = ac_sym(g, *st[g], gf, ac_tabs)
            return tuple(x for g in range(G) for x in st[g])

        carry = tuple(x for g in range(G) for x in st0[g])
        out = jax.lax.while_loop(cond, body, carry)
        for g in range(G):
            bitpos = out[4 * g + 2]
            badi = out[4 * g + 3]
            okf = oks[g] & (badi == 0)
            st_ref[0:1, L(g)] = jnp.where(okf, bitpos, bitpos0[g])
            st_ref[3:4, L(g)] = st_ref[3:4, L(g)] + okf.astype(jnp.int32)
            st_ref[5:6, L(g)] = st_ref[5:6, L(g)] | badi

    pos_ref[0:1, :] = st_ref[0:1, :]
    pos_ref[1:2, :] = st_ref[3:4, :]
    pos_ref[2:3, :] = st_ref[5:6, :]


@functools.partial(jax.jit,
                   static_argnames=("cap_blocks", "max_words", "sampling",
                                    "interpret"))
def scan_positions(streams, maxc, delt, hvp, entry, limit,
                   cap_blocks: int, max_words: int,
                   sampling: str = "gray", phase=None,
                   interpret: bool = False):
    """Speculative positions pass -> (exit_bits, counts, bad), each [Sp].

    ``entry``/``limit`` are [1, Sp] bit offsets within each lane's row;
    ``phase`` [1, Sp] the guessed MCU position of each lane's first
    block (interleaved patterns; ignored for period-1 ``sampling``).
    ``cap_blocks`` bounds the grid; a lane that hasn't reached its limit
    after cap_blocks keeps bitpos < limit, which the caller must treat
    as non-converged (fall back to the host decoder).
    """
    Sp = streams.shape[0]
    chunk = 8
    cap_p = -(-cap_blocks // chunk) * chunk
    if phase is None:
        phase = jnp.zeros((1, Sp), jnp.int32)
    # interleave independent 128-lane groups (same selection rule and
    # rationale as decode_segments — see _hd_kernel)
    G = 1
    for cand in _G_CANDS:
        if (Sp // _LG) % cand == 0 and \
                cand * _LG * max_words * 4 <= 4 << 20:
            G = cand
            break
    GL = G * _LG
    kernel = functools.partial(
        _scan_kernel, sampling=sampling, chunk=chunk, max_words=max_words,
        peel_luma=_PEEL_SCAN, groups=G)
    pos = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Sp // GL * 8, GL), jnp.int32),
        grid=(Sp // GL, cap_p // chunk),
        in_specs=[
            pl.BlockSpec((GL, max_words), lambda g, c: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, GL), lambda g, c: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, GL), lambda g, c: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, GL), lambda g, c: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GL, 256), lambda g, c: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GL), lambda g, c: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GL), lambda g, c: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GL), lambda g, c: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, GL), lambda g, c: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, GL), jnp.int32),
                        pltpu.VMEM((GL, _WNDW), jnp.int32)],
        interpret=interpret,
    )(jnp.asarray(streams, jnp.int32), *_prep_tables((maxc, delt, hvp)),
      jnp.asarray(entry, jnp.int32), jnp.asarray(limit, jnp.int32),
      jnp.asarray(phase, jnp.int32))
    pos = pos.reshape(Sp // GL, 8, GL)
    exits = pos[:, 0, :].reshape(Sp)
    counts = pos[:, 1, :].reshape(Sp)
    bad = pos[:, 2, :].reshape(Sp)
    return exits, counts, bad


@functools.partial(jax.jit,
                   static_argnames=("sampling", "nblk_seg", "max_words",
                                    "interpret", "phased", "peel_luma"))
def decode_segments(streams, maxc, delt, hvp, nblk_lane, sampling: str,
                    nblk_seg: int, max_words: int,
                    interpret: bool = False, entry=None, phase=None,
                    phased: bool = False, peel_luma: int | None = None):
    """[Sp, max_words] u32 segment streams -> zz [Sp, nblk_p, 64] int32.

    Sp must be a multiple of 128; ``nblk_lane`` [1, Sp] int32 holds each
    segment's REAL block count (0 for padding lanes, shorter counts for
    a stream's final partial segment) — blocks past it emit zeros and
    consume no bits.  ``nblk_seg`` is the static maximum (the uniform
    segment length).  Block order is the interleaved MCU emission order;
    DC terms are the cumulative (un-diffed) values, accumulated from 0
    at each lane's start; slots are in zigzag order — exactly what
    ``pipelines.decode.reconstruct`` consumes after the MCU-order
    inverse.  ``entry`` [1, Sp] sets each lane's starting bit within its
    row (speculative non-restart decode; default 0 = restart segments);
    ``phased=True`` additionally takes each lane's MCU position of its
    first block in ``phase`` [1, Sp] (speculative interleaved decode —
    per-lane table/component selection).
    """
    Sp = streams.shape[0]
    period = len(_PATTERN[sampling])
    chunk = _CHUNK[period]
    nblk_p = -(-nblk_seg // chunk) * chunk
    if entry is None:
        entry = jnp.zeros((1, Sp), jnp.int32)
    if phase is None:
        phase = jnp.zeros((1, Sp), jnp.int32)
    # interleave as many independent 128-lane groups per invocation as
    # the lane count and the streams' VMEM footprint allow (~4 MB cap
    # for G x [128, max_words] i32 stream blocks) — see _hd_kernel
    G = 1
    for cand in _G_CANDS:
        if (Sp // _LG) % cand == 0 and \
                cand * _LG * max_words * 4 <= 4 << 20:
            G = cand
            break
    GL = G * _LG
    # callers that know their content override the peel: the speculative
    # payload decodes 3-scan color through the "gray" pattern, where the
    # chroma scans are ~1 symbol/block and the full luma peel wastes
    # masked decodes (measured 2x wall regression on the 3-scan fixture)
    pl_ = _PEEL_LUMA if peel_luma is None else peel_luma
    kernel = functools.partial(
        _hd_kernel, sampling=sampling, nblk_real=nblk_seg, chunk=chunk,
        max_words=max_words, phased=phased, groups=G,
        always_live=nblk_p <= nblk_seg,
        # the peel size is pure performance tuning — any value decodes
        # byte-identically (test_peel_production_parity pins the real
        # one) — so interpret mode caps it to keep the Python-interpreted
        # CPU test suite fast
        peel_luma=min(pl_, 7) if interpret else pl_)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Sp, nblk_p * 64), jnp.int32),
        grid=(Sp // GL, nblk_p // chunk),
        in_specs=[
            pl.BlockSpec((GL, max_words), lambda g, c: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, GL), lambda g, c: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, GL), lambda g, c: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, GL), lambda g, c: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GL, 256), lambda g, c: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GL), lambda g, c: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GL), lambda g, c: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GL), lambda g, c: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GL, chunk * 64), lambda g, c: (g, c),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, GL), jnp.int32),
                        pltpu.VMEM((GL, _WNDW), jnp.int32)],
        interpret=interpret,
    )(jnp.asarray(streams, jnp.int32), *_prep_tables((maxc, delt, hvp)),
      nblk_lane, jnp.asarray(entry, jnp.int32),
      jnp.asarray(phase, jnp.int32))
    return out.reshape(Sp, nblk_p, 64)


def _pad_lanes(ndev, streams, maxc, delt, hvp, *rows):
    """Zero-pad the lane axis to whole 128-lane groups per device.
    ``rows`` are [1, Sp] arrays padded along lanes."""
    Sp = streams.shape[0]
    mult = _LG * ndev
    spp = -(-Sp // mult) * mult
    if spp != Sp:
        pad = spp - Sp
        streams = jnp.pad(streams, ((0, pad), (0, 0)))
        hvp = jnp.pad(hvp, ((0, pad), (0, 0)))
        # bound 0 on padding lanes: every peek counts 16 -> len 17 (bad)
        maxc = jnp.pad(maxc, ((0, 0), (0, pad)))
        delt = jnp.pad(delt, ((0, 0), (0, pad)))
        rows = tuple(jnp.pad(r, ((0, 0), (0, pad))) for r in rows)
    return (streams, maxc, delt, hvp) + rows


def decode_segments_sharded(mesh, streams, maxc, delt, hvp, nblk_lane,
                            sampling: str, nblk_seg: int, max_words: int,
                            interpret: bool = False, axis: str = "space",
                            entry=None, phase=None, phased: bool = False):
    """``decode_segments`` spread over a device mesh.

    Lanes (restart segments or speculative chunks) are independent — the
    whole premise of this kernel — so the lane axis shards
    embarrassingly across ``mesh.shape[axis]`` devices: the decode-side
    dual of ``parallel.sharded.ShardedEncoder`` slab sharding, with no
    collectives.  Inputs are zero-padded so every device gets whole
    128-lane groups; padding lanes decode nothing (``nblk_lane`` 0).
    """
    from jax.sharding import PartitionSpec as P
    ndev = mesh.shape[axis]
    Sp = streams.shape[0]
    if entry is None:
        entry = jnp.zeros((1, Sp), jnp.int32)
    if phase is None:
        phase = jnp.zeros((1, Sp), jnp.int32)
    streams, maxc, delt, hvp, nblk_lane, entry, phase = _pad_lanes(
        ndev, jnp.asarray(streams, jnp.int32), jnp.asarray(maxc),
        jnp.asarray(delt), jnp.asarray(hvp), jnp.asarray(nblk_lane),
        jnp.asarray(entry, jnp.int32), jnp.asarray(phase, jnp.int32))
    fn = jax.shard_map(
        lambda s, mc, dl, hp, nb, e, ph: decode_segments(
            s, mc, dl, hp, nb, sampling, nblk_seg, max_words,
            interpret=interpret, entry=e, phase=ph, phased=phased),
        mesh=mesh,
        in_specs=(P(axis, None), P(None, axis), P(None, axis),
                  P(axis, None), P(None, axis), P(None, axis),
                  P(None, axis)),
        out_specs=P(axis, None, None),
        check_vma=False)  # pallas_call out_shape carries no vma info
    return fn(streams, maxc, delt, hvp, nblk_lane, entry, phase)


def scan_positions_sharded(mesh, streams, maxc, delt, hvp, entry, limit,
                           cap_blocks: int, max_words: int,
                           sampling: str = "gray", phase=None,
                           interpret: bool = False, axis: str = "space"):
    """``scan_positions`` spread over a device mesh (the speculative
    fixpoint's positions pass; chains are host-side, so each round is
    one collective-free sharded launch)."""
    from jax.sharding import PartitionSpec as P
    ndev = mesh.shape[axis]
    Sp = streams.shape[0]
    if phase is None:
        phase = jnp.zeros((1, Sp), jnp.int32)
    streams, maxc, delt, hvp, entry, limit, phase = _pad_lanes(
        ndev, jnp.asarray(streams, jnp.int32), jnp.asarray(maxc),
        jnp.asarray(delt), jnp.asarray(hvp),
        jnp.asarray(entry, jnp.int32), jnp.asarray(limit, jnp.int32),
        jnp.asarray(phase, jnp.int32))
    fn = jax.shard_map(
        lambda s, mc, dl, hp, e, li, ph: scan_positions(
            s, mc, dl, hp, e, li, cap_blocks, max_words,
            sampling=sampling, phase=ph, interpret=interpret),
        mesh=mesh,
        in_specs=(P(axis, None), P(None, axis), P(None, axis),
                  P(axis, None), P(None, axis), P(None, axis),
                  P(None, axis)),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False)
    return fn(streams, maxc, delt, hvp, entry, limit, phase)


# -- host-side preparation -------------------------------------------------

def parse_scan_structure(data: bytes, require_restarts: bool = True):
    """Light marker walk (no entropy decode) for device-decode routing.

    Returns None unless the stream is a single-scan BASELINE image with
    a restart interval — either 3-component interleaved (Cb/Cr must
    share Huffman and quant tables) or single-component grayscale (this
    framework's standard output; anything else takes the native host
    decoder).  Otherwise returns a dict with the geometry, per-table
    DHT specs, quantizers (raster order), and the entropy byte range.
    ``require_restarts=False`` also returns DRI-less streams (the
    speculative interleaved path, ``pipelines.speculative``).
    """
    from ..core import tables as T
    if data[:2] != b"\xff\xd8":
        return None
    pos = 2
    quant: dict[int, np.ndarray] = {}
    dht: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    comps: list[tuple[int, int, int, int]] = []  # (cid, h, v, qid)
    width = height = 0
    ri = 0
    scan = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD9,):
            break
        if marker == 0xFF:
            pos -= 1
            continue
        seg_len = (data[pos] << 8) | data[pos + 1]
        seg = data[pos + 2:pos + seg_len]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                if seg[p] >> 4:
                    return None  # 16-bit DQT
                zzq = np.frombuffer(seg[p + 1:p + 65],
                                    np.uint8).astype(np.int32)
                q = np.zeros(64, np.int32)
                q[T.SCAN_ORDER] = zzq
                quant[seg[p] & 15] = q
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = np.zeros(17, np.int32)
                bits[1:] = np.frombuffer(seg[p + 1:p + 17], np.uint8)
                n = int(bits.sum())
                vals = np.frombuffer(seg[p + 17:p + 17 + n], np.uint8)
                dht[(tc, th)] = (bits, vals.astype(np.int32))
                p += 17 + n
        elif marker == 0xC0:
            height = (seg[1] << 8) | seg[2]
            width = (seg[3] << 8) | seg[4]
            comps = [(seg[6 + 3 * c], seg[7 + 3 * c] >> 4,
                      seg[7 + 3 * c] & 15, seg[8 + 3 * c])
                     for c in range(seg[5])]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            return None  # progressive / non-baseline
        elif marker == 0xDD:
            ri = (seg[0] << 8) | seg[1]
        elif marker == 0xDA:
            ns = seg[0]
            if ns != len(comps) or ns not in (1, 3):
                return None
            tabs = {seg[1 + 2 * c]: (seg[2 + 2 * c] >> 4,
                                     seg[2 + 2 * c] & 15)
                    for c in range(ns)}
            ent_start = pos + seg_len
            scan = (tabs, ent_start)
            break
        pos += seg_len
    if scan is None or not width or (require_restarts and ri == 0):
        return None
    tabs, ent_start = scan
    ent_end = _entropy_end(data, ent_start)
    return {
        "width": width, "height": height, "comps": comps, "quant": quant,
        "dht": dht, "tabs": tabs, "restart_interval": ri,
        "entropy": data[ent_start:ent_end],
    }


def _entropy_end(data: bytes, start: int) -> int:
    """First non-stuffing, non-RSTn, non-fill marker at/after ``start``."""
    b = np.frombuffer(data, np.uint8)
    cand = np.where(b[start:-1] == 0xFF)[0] + start
    nxt = b[cand + 1]
    stop = cand[(nxt != 0) & (nxt != 0xFF) & ((nxt < 0xD0) | (nxt > 0xD7))]
    return int(stop[0]) if len(stop) else len(data)


def parse_noninterleaved_scans(data: bytes):
    """Marker walk for baseline streams whose EVERY scan is a single
    component — grayscale images and the reference-parity 3-scan layout.

    These scans have no MCU phase (data units are bare 8x8 blocks
    through one DC/AC table pair), which makes them speculatively
    decodable without restart markers (``pipelines.speculative``).
    Returns None for interleaved/progressive/restart streams; else a
    dict with the geometry, quantizers, and per-scan
    (cid, dc_spec, ac_spec, entropy bytes) — table specs snapshotted at
    each SOS (DHT may be redefined between scans).
    """
    from ..core import tables as T
    if data[:2] != b"\xff\xd8":
        return None
    pos = 2
    quant: dict[int, np.ndarray] = {}
    dht: dict = {}
    comps: list[tuple[int, int, int, int]] = []
    width = height = 0
    scans = []
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker == 0xFF:
            pos -= 1
            continue
        seg_len = (data[pos] << 8) | data[pos + 1]
        seg = data[pos + 2:pos + seg_len]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                if seg[p] >> 4:
                    return None
                zzq = np.frombuffer(seg[p + 1:p + 65],
                                    np.uint8).astype(np.int32)
                q = np.zeros(64, np.int32)
                q[T.SCAN_ORDER] = zzq
                quant[seg[p] & 15] = q
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = np.zeros(17, np.int32)
                bits[1:] = np.frombuffer(seg[p + 1:p + 17], np.uint8)
                n = int(bits.sum())
                vals = np.frombuffer(seg[p + 17:p + 17 + n], np.uint8)
                dht[(tc, th)] = (bits, vals.astype(np.int32))
                p += 17 + n
        elif marker == 0xC0:
            height = (seg[1] << 8) | seg[2]
            width = (seg[3] << 8) | seg[4]
            comps = [(seg[6 + 3 * c], seg[7 + 3 * c] >> 4,
                      seg[7 + 3 * c] & 15, seg[8 + 3 * c])
                     for c in range(seg[5])]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            return None
        elif marker == 0xDD:
            if (seg[0] << 8) | seg[1]:
                return None  # restart streams: the segment path is better
        elif marker == 0xDA:
            if seg[0] != 1:
                return None  # interleaved scan
            cid = seg[1]
            tdc, tac = seg[2] >> 4, seg[2] & 15
            ent_start = pos + seg_len
            ent_end = _entropy_end(data, ent_start)
            try:
                scans.append(dict(cid=cid, dc_spec=dht[(0, tdc)],
                                  ac_spec=dht[(1, tac)],
                                  entropy=data[ent_start:ent_end]))
            except KeyError:
                return None
            pos = ent_end
            continue
        pos += seg_len
    if not scans or not width or not comps:
        return None
    if {s["cid"] for s in scans} != {c[0] for c in comps} \
            or len(scans) != len(comps):
        return None
    return dict(width=width, height=height, comps=comps, quant=quant,
                scans=scans)


def split_segments(entropy: bytes):
    """Entropy-coded bytes of one scan -> list of per-segment byte
    arrays split at RSTn markers, STILL STUFFED (0xFF00 intact).
    Callers that feed the speculative machinery (which unstuffs each
    whole SEGMENT on the host before chunking it into lanes —
    ``_spec_scans_fused``) must pass these raw bytes, never
    already-unstuffed ones: a data byte pair 0xFF 0x00 in unstuffed
    data would be corrupted by a second unstuff."""
    b = np.frombuffer(entropy, np.uint8)
    if len(b) < 2:
        return [b]
    is_ff = b[:-1] == 0xFF
    nxt = b[1:]
    rst = np.where(is_ff & (nxt >= 0xD0) & (nxt <= 0xD7))[0]
    starts = np.concatenate([[0], rst + 2])
    ends = np.concatenate([rst, [len(b)]])
    return [b[s:e] for s, e in zip(starts, ends)]


def unstuff_segments(entropy: bytes, n_expected: int | None = None):
    """Entropy-coded bytes of one scan (RSTn-delimited) -> list of
    un-stuffed per-segment byte arrays."""
    segs = []
    for seg in split_segments(entropy):
        stuffed = np.where((seg[:-1] == 0xFF) & (seg[1:] == 0x00))[0]
        segs.append(np.delete(seg, stuffed + 1) if len(stuffed) else seg)
    if n_expected is not None and len(segs) != n_expected:
        raise ValueError(
            f"expected {n_expected} segments, found {len(segs)}")
    return segs


def pack_streams(segs: list[np.ndarray]):
    """Per-segment raw bytes -> ([Sp, max_words] int32 big-endian words,
    active [1, Sp] int32, max_words)."""
    S = len(segs)
    Sp = -(-S // _LG) * _LG
    max_bytes = max(len(s) for s in segs)
    # 128-padded so the refill's chunked gather sees whole vregs, then
    # pow2-bucketed so same-ballpark streams share a compiled kernel
    # (every distinct max_words is a fresh ~30 s Mosaic compile)
    max_words = -(-max(-(-max_bytes // 4) + 2, _WNDW + 2) // 128) * 128
    max_words = 128 << int(np.ceil(np.log2(max_words / 128)))
    buf = np.zeros((Sp, max_words * 4), np.uint8)
    for i, s in enumerate(segs):
        buf[i, :len(s)] = s
    words = buf.view(">u4").astype(np.int64).astype(np.uint32)
    active = np.zeros((1, Sp), np.int32)
    active[0, :S] = 1
    return words.view(np.int32), active, max_words


def lane_tables(tables_per_seg):
    """Per-segment table specs -> stacked per-lane canonical arrays.

    ``tables_per_seg``: one entry per segment, each a 4-tuple of
    (bits [17], huffval) in table-row order (luma_dc, luma_ac,
    chroma_dc, chroma_ac); entries may repeat objects for shared
    tables.  Returns (maxc [64, Sp] i32, delt [64, Sp] i32,
    hvp [Sp, 256] i32 byte-packed HUFFVAL).
    """
    S = len(tables_per_seg)
    Sp = -(-S // _LG) * _LG
    maxc = np.zeros((64, Sp), np.int64)  # bound 0 = always-invalid lane
    delt = np.zeros((64, Sp), np.int64)
    hvb = np.zeros((Sp, 1024), np.int64)
    cache: dict = {}
    for s, quad in enumerate(tables_per_seg):
        for t, (bits, huffval) in enumerate(quad):
            key = (bytes(np.asarray(bits, np.int64).astype(np.uint8)),
                   bytes(np.asarray(huffval, np.int64).astype(np.uint8)))
            if key not in cache:
                cache[key] = canonical_tables(np.asarray(bits),
                                              np.asarray(huffval))
            mc, dl, hvv = cache[key]
            maxc[16 * t:16 * (t + 1), s] = mc
            delt[16 * t:16 * (t + 1), s] = dl
            hvb[s, 256 * t:256 * (t + 1)] = hvv
    # byte-pack: word w of table t = hv[4w] | hv[4w+1]<<8 | ...
    hvp = (hvb.reshape(Sp, 256, 4)
           * (1 << (8 * np.arange(4, dtype=np.int64)))).sum(-1)
    return (maxc.astype(np.int32), delt.astype(np.int32),
            hvp.astype(np.uint32).view(np.int32).copy())
