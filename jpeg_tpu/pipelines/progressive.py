"""Progressive (spectral-selection) JPEG encoding — beyond the reference.

Scan script: one interleaved DC scan (Ss=Se=0), then one full AC band scan
(Ss=1, Se=63) per component — progressive AC scans must be non-interleaved
(T.81 G.1.1.1.1).  No successive approximation (Ah=Al=0).

End-of-band runs are emitted per block (EOB0, the baseline-identical 0x00
symbol) rather than accumulated across blocks — spec-valid, keeps every
block independent for the parallel packer, and costs only a few percent of
compression on typical content.  Cross-block EOB-run accumulation is a
TODO.

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
from .encode import (_analyze_interleaved_fn, _luts, _pack_interleaved_segments,
                     analyze_fn, pack_scan)


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


def encode_progressive(rgb, config: EncodeConfig | None = None) -> bytes:
    """Encode [H, W, 3] uint8 RGB as a progressive (SOF2) JPEG.

    Uses the config's quality and Huffman mode; 4:2:0 only for now.
    """
    cfg = config or EncodeConfig()
    if cfg.subsampling != "420":
        raise ValueError("progressive encoding currently supports 4:2:0 only")
    rgb = jnp.asarray(rgb, dtype=jnp.uint8)
    h, w = rgb.shape[0], rgb.shape[1]
    if h % 16 or w % 16:
        raise ValueError(f"dimensions must be multiples of 16, got {w}x{h}; "
                         "pad with jpeg_tpu.io.editimage")

    luma_q, chroma_q = T.quant_tables(cfg.quality)
    lq, cq = jnp.asarray(luma_q), jnp.asarray(chroma_q)

    # DC scan: interleaved MCU order with per-component DC prediction
    # (the interleaved analyzer already builds exactly this), AC masked off.
    inter, _ = _analyze_interleaved_fn(rgb, lq, cq,
                                       jnp.asarray(mcu_order_index(w, h)), 1)
    dc_slots = _mask_slots(inter, keep_dc=True)

    # AC band scans: per-component raster block order, DC slot masked off.
    comps, _ = analyze_fn(rgb, lq, cq, sampling="420")
    ac_slots = {name: _mask_slots(comps[name], keep_dc=False)
                for name in ("y", "cb", "cr")}

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

    header = jfif.headers(w, h, luma_q, chroma_q, tables, progressive=True)
    return jfif.assemble_progressive(header, dc_payload, ac_payloads)
