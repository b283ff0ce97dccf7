"""Progressive (SOF2) JPEG encoding — beyond the reference.

Two engines:

* the default spectral-selection script — one interleaved DC scan
  (Ss=Se=0) plus one full AC band scan per component, Ah=Al=0 — uses the
  vectorized slot machinery below (round-1 behavior, byte-stable);
* arbitrary scan scripts with successive approximation (T.81 G.1.2.3)
  via ``encode_progressive(..., successive=True)`` or an explicit
  ``scan_script``: band splits, DC/AC first scans at Al>0, DC single-bit
  refinement scans, and the buffered-correction-bit AC refinement coder.
  Dynamic mode emits per-scan optimal Huffman tables (DHT before each
  SOS, as libjpeg's optimized progressive does).

End-of-band runs accumulate across blocks into EOBn symbols in dynamic-
table mode (T.81 G.1.2.2); fixed-table mode caps runs at EOB0 because
Annex K.3 defines no EOBn codes.

A progressive stream renders incrementally in viewers: the DC scan alone
gives a recognizable 8x-downscaled preview, and successive approximation
additionally coarsens each band's first appearance.  Round-trips are
verified against both ``golden.decoder`` (SOF2-capable) and PIL.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..bitstream import jfif
from ..core import tables as T
from ..core.types import EncodeConfig
from .. import native as _native
from ..golden.encoder import mcu_order_index
from ..huffman.build import build_tables_from_histograms, fixed_tables
from ..ops import pack as ops_pack
from ..ops import symbols as ops_symbols
from .encode import (_analyze_interleaved, _analyze_interleaved_alt,
                     _analyze_interleaved_alt_fn, _analyze_interleaved_fn,
                     _luts, _pack_interleaved_segments, analyze, analyze_fn,
                     pack_scan)


def _mask_slots(slots, keep_dc: bool):
    """Restrict a slot dict to the DC slot or to the AC slots."""
    valid = slots["valid"]
    dc = jnp.zeros_like(valid).at[..., 0].set(True)
    new_valid = valid & (dc if keep_dc else ~dc)
    out = dict(slots)
    out["valid"] = new_valid
    # the packer requires zeroed fields on invalid slots
    out["sym"] = jnp.where(new_valid, slots["sym"], 0)
    out["extra"] = jnp.where(new_valid, slots["extra"], 0)
    out["extra_n"] = jnp.where(new_valid, slots["extra_n"], 0)
    return out


_MAX_EOB_RUN = 32767  # EOBn caps at n=14: run < 2^15 (T.81 G.1.2.2)


def _apply_eob_runs(slots) -> dict:
    """Collapse per-block EOBs into cross-block EOBn run symbols.

    T.81 G.1.2.2: a block whose remaining band is all zero contributes an
    end-of-band; consecutive end-of-bands (the first possibly trailing a
    content block, the rest whole-empty blocks) accumulate into one EOBn
    symbol with n = floor(log2(run)) and n appended bits (run - 2^n),
    emitted at the stream position of the run's first EOB.  Runs longer
    than 32767 are split.  Host-side numpy (block counts are small and
    the run walk is inherently sequential).
    """
    sym = np.asarray(slots["sym"]).copy()
    extra = np.asarray(slots["extra"]).copy()
    extra_n = np.asarray(slots["extra_n"]).copy()
    valid = np.asarray(slots["valid"]).copy()

    # an EOB slot is the only valid AC slot with symbol 0 (real AC symbols
    # have cls >= 1, ZRL is 0xF0); DC slots are already invalid here
    is_eob = valid & (sym == 0)
    has_eob = is_eob.any(axis=1)
    eob_pos = np.argmax(is_eob, axis=1)           # defined where has_eob
    content = (valid & ~is_eob).any(axis=1)

    n = sym.shape[0]
    prev_has_eob = np.concatenate([[False], has_eob[:-1]])
    start = has_eob & (content | ~prev_has_eob)

    run_starts = np.flatnonzero(start)
    # member count per run: blocks with an EOB until the next content block
    boundaries = np.append(run_starts, n)
    for i, s in enumerate(run_starts):
        end = boundaries[i + 1]
        # the run covers s plus the following *empty* blocks before end
        members = [s]
        b = s + 1
        while b < end and not content[b]:
            members.append(b)
            b += 1
        # split into <= _MAX_EOB_RUN chunks
        off = 0
        while off < len(members):
            chunk = members[off:off + _MAX_EOB_RUN]
            run = len(chunk)
            r = run.bit_length() - 1              # floor(log2(run))
            head = chunk[0]
            p = eob_pos[head]
            sym[head, p] = r << 4
            extra[head, p] = run - (1 << r)
            extra_n[head, p] = r
            for m in chunk[1:]:
                valid[m, eob_pos[m]] = False
            off += run

    # numpy outputs: consumers are host coders (the script engine) or
    # jnp ops that accept numpy operands; returning device arrays here
    # cost one put + fetch round trip PER SCAN on remote transports
    out = dict(slots)
    out["sym"] = np.where(valid, sym, 0)
    out["extra"] = np.where(valid, extra, 0)
    out["extra_n"] = np.where(valid, extra_n, 0)
    out["valid"] = valid
    return out


# ---------------------------------------------------------------------------
# Generic scan-script engine with successive approximation (T.81 G.1.2).

# libjpeg's classic 10-scan semi-progressive script: coarse DC, coarse
# low-frequency luma, full chroma at half precision, then refinements.
# Entries are (component | "dc", Ss, Se, Ah, Al); "dc" scans interleave
# all three components.
SUCCESSIVE_SCRIPT = [
    ("dc", 0, 0, 0, 1),
    (0, 1, 5, 0, 2),
    (1, 1, 63, 0, 1),
    (2, 1, 63, 0, 1),
    (0, 6, 63, 0, 2),
    (0, 1, 63, 2, 1),
    ("dc", 0, 0, 1, 0),
    (1, 1, 63, 1, 0),
    (2, 1, 63, 1, 0),
    (0, 1, 63, 1, 0),
]

_MAX_REFINE_BUFFER = 1000  # flush cap for buffered correction bits


def _bit_class_np(v):
    """Magnitude bit length of int array (exact; |v| < 2^52)."""
    a = np.abs(v).astype(np.int64)
    _, e = np.frexp(a.astype(np.float64))
    return np.where(a > 0, e, 0).astype(np.int64)


class _Fields:
    """Ordered emission stream: Huffman symbols and raw bit fields.

    sym >= 0: codeword for ``sym`` (resolved later) followed by
    ``extra_n`` appended bits of ``extra``; sym == -1: raw bits only.
    ``tid`` selects the scan's table when a scan uses several (the
    interleaved DC scan: 0 = luma, 1 = chroma).
    """

    def __init__(self):
        self.sym: list[int] = []
        self.extra: list[int] = []
        self.extra_n: list[int] = []
        self.tid: list[int] = []

    def append_sym(self, sym, extra, extra_n, tid=0):
        self.sym.append(int(sym))
        self.extra.append(int(extra))
        self.extra_n.append(int(extra_n))
        self.tid.append(int(tid))

    def append_bits(self, value, n):
        self.sym.append(-1)
        self.extra.append(int(value))
        self.extra_n.append(int(n))
        self.tid.append(0)

    def extend_arrays(self, sym, extra, extra_n, tid):
        self.sym.extend(np.asarray(sym, np.int64).tolist())
        self.extra.extend(np.asarray(extra, np.int64).tolist())
        self.extra_n.extend(np.asarray(extra_n, np.int64).tolist())
        t = np.asarray(tid, np.int64)
        if t.ndim == 0:
            t = np.broadcast_to(t, (len(np.asarray(sym).reshape(-1)),))
        self.tid.extend(t.tolist())

    def arrays(self):
        return (np.asarray(self.sym, np.int64),
                np.asarray(self.extra, np.int64),
                np.asarray(self.extra_n, np.int64),
                np.asarray(self.tid, np.int64))


class _ArrayFields:
    """Array-backed emission stream (same protocol as ``_Fields``) for
    the vectorized/native builders — skips the Python-list round trip."""

    def __init__(self, sym, extra, extra_n, tid=0):
        self.sym = np.asarray(sym, np.int64).reshape(-1)
        self.extra = np.asarray(extra, np.int64).reshape(-1)
        self.extra_n = np.asarray(extra_n, np.int64).reshape(-1)
        t = np.asarray(tid, np.int64)
        self.tid = (np.broadcast_to(t, self.sym.shape).copy()
                    if t.ndim == 0 else t.reshape(-1))

    def arrays(self):
        return self.sym, self.extra, self.extra_n, self.tid


def _dc_scan_fields(dc_walks, counts, ah, al):
    """Interleaved DC scan fields (first scan or refinement).

    dc_walks: per-component quantized DC values in MCU walk order;
    counts: blocks per MCU per component (e.g. [4, 1, 1] for 4:2:0).
    """
    nmcu = len(dc_walks[0]) // counts[0]
    if ah == 0:
        diffs = []
        for dcw in dc_walks:
            pt = dcw >> al  # arithmetic shift (G.1.2.1 point transform)
            diffs.append((pt - np.concatenate([[0], pt[:-1]])
                          ).reshape(nmcu, -1))
        inter = np.concatenate(diffs, axis=1)          # [nmcu, p]
        cls = _bit_class_np(inter)
        amp = np.where(inter < 0, inter + (1 << cls) - 1, inter)
        tid_row = np.concatenate(
            [np.full(c, 0 if i == 0 else 1, np.int64)
             for i, c in enumerate(counts)])
        tids = np.broadcast_to(tid_row, inter.shape)
        return _ArrayFields(cls.reshape(-1), amp.reshape(-1),
                            cls.reshape(-1), tids.reshape(-1).copy())
    bits = [((dcw >> al) & 1).reshape(nmcu, -1) for dcw in dc_walks]
    inter = np.concatenate(bits, axis=1)
    ones = np.ones(inter.size, np.int64)
    return _ArrayFields(np.full(inter.size, -1, np.int64),
                        inter.reshape(-1), ones, 0)


def _ac_first_fields(zz, ss, se, al, allow_eobn):
    """First AC scan of a band (Ah=0): vectorized band symbolization with
    the G.1.2.2 point transform, then optional cross-block EOBn runs."""
    band = zz[:, ss:se + 1].astype(np.int64)
    mag = np.abs(band) >> al
    tv = np.where(band < 0, -mag, mag)
    n, w = tv.shape
    pos = np.arange(w, dtype=np.int64)
    nz = tv != 0
    m = np.maximum.accumulate(np.where(nz, pos, -1), axis=1)
    prev = np.concatenate([np.full((n, 1), -1, np.int64), m[:, :-1]], axis=1)
    last = m[:, -1]
    cls = _bit_class_np(tv)
    amp = np.where(tv < 0, tv + (1 << cls) - 1, tv)
    run = (pos[None] - prev - 1) % 16
    sym = np.where(nz, (run << 4) | cls, 0)
    extra = np.where(nz, amp, 0)
    extra_n = np.where(nz, cls, 0)
    valid = nz.copy()
    zrl = (~nz) & (pos[None] < last[:, None]) & \
        ((pos[None] - prev) % 16 == 0)
    sym = np.where(zrl, 0xF0, sym)
    valid |= zrl
    valid |= pos[None] == last[:, None] + 1  # EOB slot (sym 0)

    slots = {"sym": np.where(valid, sym, 0),
             "extra": np.where(valid, extra, 0),
             "extra_n": np.where(valid, extra_n, 0),
             "valid": valid}
    if allow_eobn:
        slots = {k: np.asarray(v) for k, v in _apply_eob_runs(slots).items()}
    mask = slots["valid"].reshape(-1)
    return _ArrayFields(slots["sym"].reshape(-1)[mask],
                        slots["extra"].reshape(-1)[mask],
                        slots["extra_n"].reshape(-1)[mask], 0)


def _ac_refine_fields(zz, ss, se, ah, al, allow_eobn):
    """AC refinement scan (G.1.2.3): one correction bit per nonzero-history
    coefficient, newly-significant coefficients as run-coded +-1, with
    correction bits buffered across EOB runs (the libjpeg
    encode_mcu_AC_refine flow, which decoders reverse per Figure G.10)."""
    band = zz[:, ss:se + 1].astype(np.int64)
    got = _native.ac_refine_fields(band, al,
                                   0x7FFF if allow_eobn else 1,
                                   _MAX_REFINE_BUFFER)
    if got is not None:
        return _ArrayFields(*got, tid=0)
    absv = np.abs(band) >> al
    positive = band > 0
    n, w = absv.shape
    has_any = (absv > 0).any(axis=1)
    newly = absv == 1
    last_new = np.where(newly.any(axis=1),
                        w - 1 - np.argmax(newly[:, ::-1], axis=1), -1)
    max_run = 0x7FFF if allow_eobn else 1

    f = _Fields()
    eobrun = 0
    be: list[int] = []  # correction bits buffered across the EOB run

    def flush_eobrun():
        nonlocal eobrun
        if eobrun == 0:
            return
        r = eobrun.bit_length() - 1
        f.append_sym(r << 4, eobrun - (1 << r), r)
        for b in be:
            f.append_bits(b, 1)
        be.clear()
        eobrun = 0

    for blk in range(n):
        if not has_any[blk]:
            eobrun += 1
            if eobrun == max_run:
                flush_eobrun()
            continue
        a = absv[blk]
        eob = last_new[blk]
        r = 0
        br: list[int] = []
        for k in range(w):
            t = a[k]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                flush_eobrun()
                r -= 16
                f.append_sym(0xF0, 0, 0)
                for b in br:
                    f.append_bits(b, 1)
                br.clear()
            if t > 1:
                br.append(int(t & 1))
                continue
            flush_eobrun()
            f.append_sym((r << 4) | 1, 1 if positive[blk, k] else 0, 1)
            for b in br:
                f.append_bits(b, 1)
            br.clear()
            r = 0
        if r > 0 or br:
            eobrun += 1
            be.extend(br)
            if eobrun == max_run or len(be) > _MAX_REFINE_BUFFER:
                flush_eobrun()
    flush_eobrun()
    return f


def _resolve_fields(fields, tables_by_tid):
    sym, extra, extra_n, tid = fields.arrays()
    code = np.zeros(sym.shape, np.int64)
    clen = np.zeros(sym.shape, np.int64)
    for t, tab in tables_by_tid.items():
        m = (sym >= 0) & (tid == t)
        s = sym[m]
        code[m] = tab.code[s]
        clen[m] = tab.length[s]
    values = np.where(sym >= 0, (code << extra_n) | extra, extra)
    nbits = np.where(sym >= 0, clen + extra_n, extra_n)
    return values.astype(np.int64), nbits.astype(np.int64)


def _scan_histograms(fields, n_tids):
    sym, _, _, tid = fields.arrays()
    out = []
    for t in range(n_tids):
        h = np.zeros(257, np.int64)
        m = (sym >= 0) & (tid == t)
        np.add.at(h, sym[m].astype(np.int64), 1)
        h[256] = 1
        out.append(h)
    return out


@functools.lru_cache(maxsize=None)
def _analyze_jit(sampling: str):
    """Cached jitted f32 analyze (one device dispatch, all three planes;
    a per-call ``jax.jit`` would retrace + recompile on EVERY encode)."""
    from ..ops import color as ops_color
    from ..ops import dct as ops_dct
    convert = {"420": ops_color.rgb_to_ycbcr_420,
               "422": ops_color.rgb_to_ycbcr_422,
               "444": ops_color.rgb_to_ycbcr_444}[sampling]

    @jax.jit
    def analyze(im, lq, cq):
        y, cb, cr = convert(im, dtype=jnp.float32)
        return tuple(ops_dct.dct_quantize_zigzag(
            ops_color.to_blocks(p), q, dtype=jnp.float32)
            for p, q in ((y, lq), (cb, cq), (cr, cq)))
    return analyze


def encode_progressive_script(rgb, config: EncodeConfig | None = None,
                              scan_script=None) -> bytes:
    """Encode with an explicit progressive scan script (SA-capable).

    ``scan_script`` entries are (component | "dc", Ss, Se, Ah, Al);
    defaults to ``SUCCESSIVE_SCRIPT``.  Dynamic mode builds optimal
    Huffman tables per scan and emits them in per-scan DHT segments.
    """
    from ..huffman.build import build_tables_batch
    from ..ops.pack import finish_scan, pack_fields_np

    cfg = config or EncodeConfig()
    script = scan_script or SUCCESSIVE_SCRIPT
    rgb = jnp.asarray(rgb, dtype=jnp.uint8)
    h, w = rgb.shape[0], rgb.shape[1]
    mcu_w, mcu_h = {"420": (16, 16), "422": (16, 8),
                    "444": (8, 8)}[cfg.subsampling]
    if h == 0 or w == 0:
        raise ValueError("image has zero pixels")
    if h % mcu_h or w % mcu_w:
        raise ValueError(f"dimensions must be multiples of {mcu_w}x{mcu_h}, "
                         f"got {w}x{h}; pad with jpeg_tpu.io.editimage")
    for comp, ss, se, ah, al in script:
        if not (comp == "dc" or comp in (0, 1, 2)):
            raise ValueError(f"bad scan component {comp!r}")
        if comp == "dc" and (ss, se) != (0, 0):
            raise ValueError("DC scans must have Ss=Se=0")
        if comp != "dc" and ss == 0:
            raise ValueError("AC scans must not include coefficient 0")
        if not (0 <= al <= 13 and (ah == 0 or ah == al + 1)):
            raise ValueError(f"bad successive approximation Ah={ah} Al={al}")

    luma_q, chroma_q = T.quant_tables(cfg.quality)
    lq, cq = jnp.asarray(luma_q), jnp.asarray(chroma_q)
    exact = cfg.dtype == "float64"
    dtype = jnp.float64 if exact else jnp.float32

    # Per-component raster zig-zag coefficients: ONE device analyze, ONE
    # combined fetch (three separate np.asarray calls cost three blocking
    # link round trips on high-latency transports).  The field coders
    # below are host code: progressive is the fidelity mode, not the
    # throughput path.
    from ..ops import color as ops_color
    from ..ops import dct as ops_dct
    convert = {"420": ops_color.rgb_to_ycbcr_420,
               "422": ops_color.rgb_to_ycbcr_422,
               "444": ops_color.rgb_to_ycbcr_444}[cfg.subsampling]
    if exact:
        y, cb, cr = convert(rgb, dtype=dtype)
        zz = [np.asarray(ops_dct.dct_quantize_zigzag(
            ops_color.to_blocks(p), q, dtype=dtype, exact=exact))
            for p, q in ((y, lq), (cb, cq), (cr, cq))]
    else:
        zz = [np.asarray(a, np.int64) for a in jax.device_get(
            _analyze_jit(cfg.subsampling)(rgb, lq, cq))]
    ypm = {"420": 4, "422": 2, "444": 1}[cfg.subsampling]
    counts = [ypm, 1, 1]
    if cfg.subsampling == "420":
        walk = np.asarray(mcu_order_index(w, h))
        dc_walks = [zz[0][walk, 0], zz[1][:, 0], zz[2][:, 0]]
    else:
        dc_walks = [zz[0][:, 0], zz[1][:, 0], zz[2][:, 0]]

    dynamic = cfg.huffman != "fixed"
    fixed = fixed_tables()

    scans = []  # (scan_spec, fields)
    for spec in script:
        comp, ss, se, ah, al = spec
        if comp == "dc":
            fields = _dc_scan_fields(dc_walks, counts, ah, al)
        elif ah == 0:
            fields = _ac_first_fields(zz[comp], ss, se, al,
                                      allow_eobn=dynamic)
        else:
            fields = _ac_refine_fields(zz[comp], ss, se, ah, al,
                                       allow_eobn=dynamic)
        scans.append((spec, fields))

    # Resolve tables per scan and pack.
    y_sampling = {"420": (2, 2), "422": (2, 1), "444": (1, 1)}[cfg.subsampling]
    header = jfif.headers(w, h, luma_q, chroma_q, fixed, progressive=True,
                          y_sampling=y_sampling,
                          include_dht=not dynamic)
    out = [header]
    for (comp, ss, se, ah, al), fields in scans:
        if comp == "dc":
            if ah == 0:
                if dynamic:
                    hists = _scan_histograms(fields, 2)
                    t0, t1 = build_tables_batch(np.stack(hists))
                    out.append(jfif.dht_segment(0x00, t0))
                    out.append(jfif.dht_segment(0x01, t1))
                else:
                    t0, t1 = fixed["luma_dc"], fixed["chroma_dc"]
                tabs = {0: t0, 1: t1}
            else:
                tabs = {}  # refinement: raw bits only
            sos = jfif.sos_header_progressive_dc(ah=ah, al=al)
        else:
            tid = 0 if comp == 0 else 1
            if ah == 0 or _has_syms(fields):
                if dynamic:
                    (hist,) = _scan_histograms(fields, 1)
                    (tab,) = build_tables_batch(hist[None])
                    out.append(jfif.dht_segment(0x10 | tid, tab))
                else:
                    tab = fixed["luma_ac" if tid == 0 else "chroma_ac"]
                tabs = {0: tab}
            else:
                tabs = {}
            sos = jfif.sos_header_progressive_ac(comp + 1, tid, ss, se,
                                                 ah=ah, al=al)
        values, nbits = _resolve_fields(fields, tabs)
        mw = int(nbits.sum()) // 32 + 2
        words, total = pack_fields_np(values, nbits, max_words=max(mw, 2))
        out.append(sos)
        out.append(finish_scan(words, int(total)))
    out.append(jfif.EOI)
    return b"".join(out)


def _has_syms(fields) -> bool:
    return bool(np.any(np.asarray(fields.sym) >= 0))


def encode_progressive(rgb, config: EncodeConfig | None = None,
                       successive: bool = False,
                       scan_script=None) -> bytes:
    """Encode [H, W, 3] uint8 RGB as a progressive (SOF2) JPEG.

    Uses the config's quality, Huffman mode, chroma subsampling, and dtype
    (``float64`` selects the exact bit-parity analyzers).  ``config.engine``
    is ignored: progressive packing always uses the XLA packer because EOBn
    fields exceed the Pallas pack kernel's 28-bit field bound (engines are
    byte-identical, so this is a performance detail only).

    ``successive=True`` (or an explicit ``scan_script``) routes to the
    scan-script engine with successive approximation — see
    ``encode_progressive_script``.
    """
    if successive or scan_script is not None:
        return encode_progressive_script(rgb, config, scan_script)
    cfg = config or EncodeConfig()
    rgb = jnp.asarray(rgb, dtype=jnp.uint8)
    h, w = rgb.shape[0], rgb.shape[1]
    mcu_w, mcu_h = {"420": (16, 16), "422": (16, 8),
                    "444": (8, 8)}[cfg.subsampling]
    if h == 0 or w == 0:
        raise ValueError("image has zero pixels")
    if h % mcu_h or w % mcu_w:
        raise ValueError(f"dimensions must be multiples of {mcu_w}x{mcu_h}, "
                         f"got {w}x{h}; pad with jpeg_tpu.io.editimage")

    luma_q, chroma_q = T.quant_tables(cfg.quality)
    lq, cq = jnp.asarray(luma_q), jnp.asarray(chroma_q)
    exact = cfg.dtype == "float64"
    dtype = jnp.float64 if exact else jnp.float32

    # DC scan: interleaved MCU order with per-component DC prediction
    # (the interleaved analyzers already build exactly this), AC masked off.
    # The exact (float64) mode runs the un-jitted analyzers, as JpegEncoder
    # does, to keep the reference summation order un-fused.
    if cfg.subsampling == "420":
        fn = _analyze_interleaved_fn if exact else _analyze_interleaved
        inter, _ = fn(rgb, lq, cq, jnp.asarray(mcu_order_index(w, h)), 1,
                      dtype=dtype, exact=exact)
    else:
        fn = _analyze_interleaved_alt_fn if exact else _analyze_interleaved_alt
        inter, _ = fn(rgb, lq, cq, 1, cfg.subsampling,
                      dtype=dtype, exact=exact)
    dc_slots = _mask_slots(inter, keep_dc=True)

    # AC band scans: per-component raster block order, DC slot masked off.
    # Cross-block EOB-run accumulation needs EOBn codes in the AC tables;
    # the Annex K.3 fixed tables only define EOB0 (0x00), so fixed mode
    # keeps per-block EOBs.
    comps, _ = (analyze_fn if exact else analyze)(
        rgb, lq, cq, dtype=dtype, exact=exact, sampling=cfg.subsampling)
    ac_slots = {}
    for name in ("y", "cb", "cr"):
        s = _mask_slots(comps[name], keep_dc=False)
        if cfg.huffman != "fixed":
            s = _apply_eob_runs(s)
        ac_slots[name] = s

    # Histograms for the table build reflect the actual scan structure.
    if cfg.huffman == "fixed":
        tables = fixed_tables()
    else:
        is_luma = dc_slots["is_luma"]
        ldc = ops_symbols.histogram_256(dc_slots["sym"],
                                        dc_slots["valid"] & is_luma)
        cdc = ops_symbols.histogram_256(dc_slots["sym"],
                                        dc_slots["valid"] & ~is_luma)
        lac = ops_symbols.histogram_256(ac_slots["y"]["sym"],
                                        ac_slots["y"]["valid"])
        cac = (ops_symbols.histogram_256(ac_slots["cb"]["sym"],
                                         ac_slots["cb"]["valid"])
               + ops_symbols.histogram_256(ac_slots["cr"]["sym"],
                                           ac_slots["cr"]["valid"]))
        tables = build_tables_from_histograms(*(np.asarray(x) for x in
                                                (ldc, lac, cdc, cac)))

    # DC scan payload (per-component tables via the interleaved packer).
    dc_l, len_l = _luts(tables["luma_dc"])
    ac_l, alen_l = _luts(tables["luma_ac"])
    dc_c, len_c = _luts(tables["chroma_dc"])
    ac_c, alen_c = _luts(tables["chroma_ac"])
    mw = ops_pack.max_words_for_slots(int(np.prod(dc_slots["sym"].shape[1:])))
    words, totals = _pack_interleaved_segments(
        dc_slots, dc_l, len_l, ac_l, alen_l, dc_c, len_c, ac_c, alen_c, mw)
    dc_payload = ops_pack.finish_scan(np.asarray(words)[0], int(np.asarray(totals)[0]))

    # AC scan payloads (single-component tables).
    ac_payloads = []
    for name, cid, code, clen in (("y", 1, ac_l, alen_l),
                                  ("cb", 2, ac_c, alen_c),
                                  ("cr", 3, ac_c, alen_c)):
        s = ac_slots[name]
        mw = ops_pack.max_words_for_slots(int(np.prod(s["sym"].shape)))
        # DC LUT unused (slot 0 invalid); pass the AC LUT for both.
        w_, t_ = pack_scan(s, code, clen, code, clen, mw)
        ac_payloads.append(
            (cid, 0 if name == "y" else 1, 1, 63,
             ops_pack.finish_scan(np.asarray(w_), int(t_))))

    y_sampling = {"420": (2, 2), "422": (2, 1), "444": (1, 1)}[cfg.subsampling]
    header = jfif.headers(w, h, luma_q, chroma_q, tables, progressive=True,
                          y_sampling=y_sampling)
    return jfif.assemble_progressive(header, dc_payload, ac_payloads)
