"""Progressive (spectral-selection) JPEG encoding — beyond the reference.

Scan script: one interleaved DC scan (Ss=Se=0), then one full AC band scan
(Ss=1, Se=63) per component — progressive AC scans must be non-interleaved
(T.81 G.1.1.1.1).  No successive approximation (Ah=Al=0).

End-of-band runs accumulate across blocks into EOBn symbols in dynamic-
table mode (T.81 G.1.2.2; see ``_apply_eob_runs``); fixed-table mode
keeps per-block EOB0 because Annex K.3 defines no EOBn codes.

A progressive stream renders incrementally in browsers/viewers: the DC
scan alone gives a recognizable 8x-downscaled preview.  Decoding here is
delegated to standard decoders (PIL/libjpeg); the in-repo baseline
decoder intentionally rejects SOF2.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..bitstream import jfif
from ..core import tables as T
from ..core.types import EncodeConfig
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

    out = dict(slots)
    out["sym"] = jnp.asarray(np.where(valid, sym, 0))
    out["extra"] = jnp.asarray(np.where(valid, extra, 0))
    out["extra_n"] = jnp.asarray(np.where(valid, extra_n, 0))
    out["valid"] = jnp.asarray(valid)
    return out


def encode_progressive(rgb, config: EncodeConfig | None = None) -> bytes:
    """Encode [H, W, 3] uint8 RGB as a progressive (SOF2) JPEG.

    Uses the config's quality, Huffman mode, chroma subsampling, and dtype
    (``float64`` selects the exact bit-parity analyzers).  ``config.engine``
    is ignored: progressive packing always uses the XLA packer because EOBn
    fields exceed the Pallas pack kernel's 28-bit field bound (engines are
    byte-identical, so this is a performance detail only).
    """
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
