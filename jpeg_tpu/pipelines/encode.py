"""End-to-end device encode pipelines.

The TPU-native counterpart of the reference's encode driver
(``rgb_to_dct`` + ``init_huffman`` + ``write_jpg``, ``main/main.c:144-152``):

  device:  color convert -> 4:2:0 -> batched DCT/quant/zigzag -> DC diff ->
           run-length symbolization -> per-symbol histograms -> prefix-sum
           bit packing into 32-bit words
  host:    K.2 Huffman table build (257 symbols, microseconds), marker
           emission, byte stuffing, segment stitching.

Dynamic-Huffman mode needs one device->host sync per image (4x256 counts,
like the reference's per-image ``init_huffman``); fixed-table mode
(Annex K.3) runs fully batched with no sync.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..bitstream import jfif
from ..core import tables as T
from ..core.types import EncodeConfig
from ..huffman.build import HuffmanTable, build_tables_from_histograms, fixed_tables
from ..ops import color as ops_color
from ..ops import dct as ops_dct
from ..ops import pack as ops_pack
from ..ops import symbols as ops_symbols


def _luts(table: HuffmanTable):
    return (jnp.asarray(np.where(table.code < 0, 0, table.code), dtype=jnp.int32),
            jnp.asarray(table.length, dtype=jnp.int32))


def _unflat3(rgb):
    """Accept [H, W*3] minor-flattened images alongside [H, W, 3].

    XLA:TPU's codegen for channel slices of a rank-3 u8 *parameter* with
    minor dim 3 costs ~4 ms per 20 MB; the same bytes passed logically
    flat and reshaped in-jit cost ~0.05 ms (measured 2026-08-17, see
    FastBatchEncoder._check_batch).  The analyzers therefore take either
    form; jitted callers pass flat.
    """
    if rgb.ndim == 2:
        return rgb.reshape(rgb.shape[0], rgb.shape[1] // 3, 3)
    return rgb


def analyze_fn(rgb, luma_q, chroma_q, dtype=jnp.float32, exact=False,
               sampling="420"):
    """Device stage 1: image -> symbol slots + histograms (3-scan layout).

    Use the jitted ``analyze`` wrapper for speed; call this un-jitted for
    exact float64 parity (XLA fuses mul+add into FMA inside jit, which
    perturbs the last ulp vs the reference's separate double ops).
    """
    rgb = _unflat3(rgb)
    if sampling == "444":
        y, cb, cr = ops_color.rgb_to_ycbcr_444(rgb, dtype=dtype)
    elif sampling == "422":
        y, cb, cr = ops_color.rgb_to_ycbcr_422(rgb, dtype=dtype)
    else:
        y, cb, cr = ops_color.rgb_to_ycbcr_420(rgb, dtype=dtype)
    out = {}
    hists = {}
    for name, plane, q in (("y", y, luma_q), ("cb", cb, chroma_q), ("cr", cr, chroma_q)):
        blocks = ops_color.to_blocks(plane)
        zz = ops_dct.dct_quantize_zigzag(blocks, q, dtype=dtype, exact=exact)
        slots = ops_symbols.symbolize(ops_dct.diff_dc(zz))
        out[name] = slots
        hists[name] = ops_symbols.dc_ac_histograms(slots)
    luma_dc, luma_ac = hists["y"]
    chroma_dc = hists["cb"][0] + hists["cr"][0]
    chroma_ac = hists["cb"][1] + hists["cr"][1]
    return out, (luma_dc, luma_ac, chroma_dc, chroma_ac)


analyze = functools.partial(
    jax.jit, static_argnames=("dtype", "exact", "sampling"))(analyze_fn)


@functools.partial(jax.jit, static_argnames=("max_words",))
def pack_scan(slots, dc_code, dc_len, ac_code, ac_len, max_words):
    """Device stage 2: slots + Huffman LUTs -> packed words + bit count."""
    values, nbits = ops_symbols.attach_codes(slots, dc_code, dc_len, ac_code, ac_len)
    return ops_pack.pack_fields(values, nbits, max_words=max_words)


@functools.partial(jax.jit, static_argnames=("is_luma", "seg_rows", "interpret"))
def pack_scan_kernels(slots, lut, is_luma: bool, seg_rows: int,
                      interpret: bool = False):
    """Pallas-engine scan packing: LUT attach + hierarchical bit pack.

    slots leaves are [N, 64] (one non-interleaved scan); lut is the
    combined 1024-entry table.  Returns (words [seg_rows*128] u32,
    total_bits scalar) — same stream layout as pack_scan modulo padding.
    """
    from ..kernels import lut as klut
    from ..kernels import pack as kpack

    sym = slots["sym"]
    is_dc = jnp.zeros(sym.shape, bool).at[..., 0].set(True)
    luma = jnp.full(sym.shape, is_luma)
    idx = klut.slot_index(sym, slots["valid"], is_dc, luma)
    value, nbits = klut.attach(lut, idx, slots["extra"], slots["extra_n"],
                               interpret=interpret)
    words, totals = kpack.pack_segments(
        value.reshape(1, -1, 64), nbits.reshape(1, -1, 64), 1, seg_rows,
        interpret=interpret)
    return words[0], totals[0]


class JpegEncoder:
    """Reusable encoder; jit caches are keyed on input shapes."""

    def __init__(self, config: EncodeConfig | None = None):
        self.config = config or EncodeConfig()
        self._luma_q, self._chroma_q = T.quant_tables(self.config.quality)
        self._luma_q_dev = jnp.asarray(self._luma_q)
        self._chroma_q_dev = jnp.asarray(self._chroma_q)
        # "dynamic-sampled" deliberately falls through to EXACT dynamic
        # here: sampling only pays off on the batch fast path's device
        # histograms (FastBatchEncoder); exact tables are a strict
        # superset of the sampled contract (legal stream, same PSNR)
        self._fixed = fixed_tables() if self.config.huffman == "fixed" else None

    # -- helpers ---------------------------------------------------------

    def _dtype(self):
        return jnp.float64 if self.config.dtype == "float64" else jnp.float32

    def _exact(self):
        return self.config.dtype == "float64"

    def _build_tables(self, hists):
        if self._fixed is not None:
            return self._fixed
        h = [np.asarray(x) for x in hists]
        return build_tables_from_histograms(*h)

    def _resolve_engine(self) -> str:
        """"auto" -> pallas on TPU, xla elsewhere.  Engines are
        byte-identical (the entropy stage is exact integer work)."""
        if self.config.engine != "auto":
            return self.config.engine
        if self.config.dtype == "float64":
            return "xla"  # bit-parity mode: exact un-jitted summation path
        return "pallas" if jax.default_backend() == "tpu" else "xla"

    def _payload(self, slots, tables, is_luma: bool):
        num_slots = int(np.prod(slots["sym"].shape))
        if self._resolve_engine() == "pallas":
            from ..kernels import lut as klut
            from ..kernels import pack as kpack
            lut = jnp.asarray(klut.build_combined_lut(tables))
            seg_rows = kpack.rows_per_segment(num_slots)
            interp = jax.default_backend() != "tpu"
            words, total = pack_scan_kernels(slots, lut, is_luma, seg_rows,
                                             interpret=interp)
            return ops_pack.finish_scan(np.asarray(words), int(total))
        dc_tab = tables["luma_dc" if is_luma else "chroma_dc"]
        ac_tab = tables["luma_ac" if is_luma else "chroma_ac"]
        mw = ops_pack.max_words_for_slots(num_slots)
        dc_code, dc_len = _luts(dc_tab)
        ac_code, ac_len = _luts(ac_tab)
        words, total = pack_scan(slots, dc_code, dc_len, ac_code, ac_len, mw)
        return ops_pack.finish_scan(np.asarray(words), int(total))

    # -- public API ------------------------------------------------------

    def encode(self, rgb) -> bytes:
        """Encode one [H, W, 3] uint8 RGB image to baseline JFIF bytes."""
        rgb = jnp.asarray(rgb, dtype=jnp.uint8)
        h, w = rgb.shape[0], rgb.shape[1]
        if h == 0 or w == 0:
            raise ValueError("image has zero pixels")
        mcu_w, mcu_h = {"420": (16, 16), "422": (16, 8),
                        "444": (8, 8)}[self.config.subsampling]
        if h % mcu_h or w % mcu_w:
            raise ValueError(
                f"dimensions must be multiples of {mcu_w}x{mcu_h}, got "
                f"{w}x{h}; pad with jpeg_tpu.io.editimage, or use encode_any")
        if self.config.debug_checks:
            from ..utils.guards import validate_encode_inputs
            validate_encode_inputs(rgb, self._luma_q_dev, self._chroma_q_dev,
                                   sampling=self.config.subsampling)
        rgb = rgb.reshape(h, w * 3)  # in-jit unflatten; see _unflat3
        if self.config.scan_layout == "interleaved":
            return self._encode_interleaved(rgb, h, w)
        if self.config.restart_interval_mcu_rows:
            return self._encode_3scan_restarts(rgb, h, w)

        fn = analyze_fn if self._exact() else analyze
        slots, hists = fn(rgb, self._luma_q_dev, self._chroma_q_dev,
                          dtype=self._dtype(), exact=self._exact(),
                          sampling=self.config.subsampling)
        tables = self._build_tables(hists)
        y_sampling = {"420": (2, 2), "422": (2, 1),
                      "444": (1, 1)}[self.config.subsampling]
        header = jfif.headers(w, h, self._luma_q, self._chroma_q, tables,
                              y_sampling=y_sampling)
        return jfif.assemble_3scan(
            header,
            self._payload(slots["y"], tables, True),
            self._payload(slots["cb"], tables, False),
            self._payload(slots["cr"], tables, False),
        )

    def encode_batch(self, rgbs) -> list[bytes]:
        """Encode a [B, H, W, 3] uint8 batch (one shared shape)."""
        rgbs = jnp.asarray(rgbs, dtype=jnp.uint8)
        return [self.encode(rgbs[i]) for i in range(rgbs.shape[0])]

    def encode_any(self, rgb) -> bytes:
        """Encode an image of arbitrary dimensions.

        Pads to full MCUs by edge replication and declares the true size
        in SOF0 (decoders crop — T.81 A.2.1).  The reference rejects such
        inputs outright (``utils/original.c:327-331``); this is the
        standard-JPEG upgrade of that constraint.

        When padding is needed, the interleaved layout is used regardless
        of ``scan_layout``: T.81 A.2.2 requires *non-interleaved* scans to
        carry exactly ceil(component_dim/8) blocks per row — not the
        MCU-padded count this pipeline produces — so a padded 3-scan
        stream would desync standard decoders.  (Interleaved scans are
        MCU-complete by definition.)
        """
        from ..io.editimage import pad_replicate
        rgb = np.asarray(rgb)
        h, w = rgb.shape[0], rgb.shape[1]
        mcu_w, mcu_h = {"420": (16, 16), "422": (16, 8),
                        "444": (8, 8)}[self.config.subsampling]
        if h % mcu_h == 0 and w % mcu_w == 0:
            return self.encode(rgb)
        enc = self
        if self.config.scan_layout != "interleaved":
            if "_any_encoder" not in self.__dict__:
                cfg = dataclasses.replace(self.config,
                                          scan_layout="interleaved",
                                          restart_interval_mcu_rows=0)
                self._any_encoder = JpegEncoder(cfg)
            enc = self._any_encoder
        padded = rgb
        if h % mcu_h:
            padded = np.pad(padded, ((0, (-h) % mcu_h), (0, 0), (0, 0)),
                            mode="edge")
        if w % mcu_w:
            padded = np.pad(padded, ((0, 0), (0, (-w) % mcu_w), (0, 0)),
                            mode="edge")
        data = enc.encode(padded)
        return jfif.patch_sof_dims(data, w, h)

    def encode_region(self, rgb, area) -> bytes:
        """Encode an Area window of a larger frame as its own JPEG.

        The windowed-encode contract of the reference (``rgb_to_dct`` over
        an ``area_t``, ``main/encoder.c:158``; driven per difference region
        at ``main/main.c:142-152``).  The slice happens on device; jit
        caches are keyed per window shape, so recurring region sizes
        compile once.
        """
        rgb = jnp.asarray(rgb, dtype=jnp.uint8)
        h, w = rgb.shape[0], rgb.shape[1]
        if area.x + area.w > w or area.y + area.h > h:
            raise ValueError(f"area {area} exceeds frame {w}x{h}")
        window = jax.lax.dynamic_slice(
            rgb, (area.y, area.x, 0), (area.h, area.w, 3))
        return self.encode(window)

    # -- 3-scan with restart markers -------------------------------------

    def _encode_3scan_restarts(self, rgb, h, w):
        """Non-interleaved scans split into restart segments.

        ``restart_interval_mcu_rows`` counts 8px block rows of each
        component's own grid (a non-interleaved MCU is one block, T.81
        A.2.2); each scan carries its own DRI since per-component block
        counts differ.  DC prediction resets per segment, enabling the
        same segment-parallel packing as the interleaved layout.
        """
        rows_per_seg = self.config.restart_interval_mcu_rows
        fn = _analyze_3scan_segments_fn if self._exact() else _analyze_3scan_segments
        comps, hists = fn(rgb, self._luma_q_dev, self._chroma_q_dev,
                          rows_per_seg, self.config.subsampling,
                          dtype=self._dtype(), exact=self._exact())
        tables = self._build_tables(hists)
        y_sampling = {"420": (2, 2), "422": (2, 1),
                      "444": (1, 1)}[self.config.subsampling]
        header = jfif.headers(w, h, self._luma_q, self._chroma_q, tables,
                              y_sampling=y_sampling)
        scans = []
        for (slots, interval), is_luma in zip(comps, (True, False, False)):
            dc_tab = tables["luma_dc" if is_luma else "chroma_dc"]
            ac_tab = tables["luma_ac" if is_luma else "chroma_ac"]
            n_slots = int(np.prod(slots["sym"].shape[1:]))
            mw = ops_pack.max_words_for_slots(n_slots)
            dc_code, dc_len = _luts(dc_tab)
            ac_code, ac_len = _luts(ac_tab)
            words, totals = _pack_scan_segments(slots, dc_code, dc_len,
                                                ac_code, ac_len, mw)
            segs = ops_pack.finish_scans(np.asarray(words), np.asarray(totals))
            scans.append((interval if len(segs) > 1 else 0, segs))
        return jfif.assemble_3scan_restarts(header, scans)

    # -- interleaved (restart-capable) layout ----------------------------

    def _interleaved_fast(self, rgb, h, w):
        """Pallas-engine interleaved encode: delegate to FastBatchEncoder
        (byte-identical; one cached fused pipeline per geometry)."""
        from .fast import SAMPLING_GEOMETRY, FastBatchEncoder
        my = h // SAMPLING_GEOMETRY[self.config.subsampling][1]
        rows_per_seg = self.config.restart_interval_mcu_rows or my
        if my % rows_per_seg:
            raise ValueError(
                f"restart_interval_mcu_rows={rows_per_seg} must divide MCU rows {my}")
        key = (h, w)
        cache = self.__dict__.setdefault("_fast_cache", {})
        if key not in cache:
            cache[key] = FastBatchEncoder(
                h, w, config=self.config, segs_per_image=my // rows_per_seg,
                interpret=jax.default_backend() != "tpu")
        return cache[key].encode_batch(rgb[None])[0]

    def _encode_interleaved(self, rgb, h, w):
        if self._resolve_engine() == "pallas":
            return self._interleaved_fast(rgb, h, w)
        if self.config.subsampling in ("444", "422"):
            return self._encode_interleaved_alt(rgb, h, w)
        from ..golden.encoder import mcu_order_index  # host-precomputed index

        mx, my = w // 16, h // 16
        rows_per_seg = self.config.restart_interval_mcu_rows or my
        if my % rows_per_seg:
            raise ValueError(
                f"restart_interval_mcu_rows={rows_per_seg} must divide MCU rows {my}")
        n_segs = my // rows_per_seg

        idx_cache = self.__dict__.setdefault("_mcu_index_cache", {})
        if (w, h) not in idx_cache:
            idx_cache[(w, h)] = jnp.asarray(mcu_order_index(w, h))
        fn = _analyze_interleaved_fn if self._exact() else _analyze_interleaved
        slots, hists = fn(
            rgb, self._luma_q_dev, self._chroma_q_dev,
            idx_cache[(w, h)], n_segs,
            dtype=self._dtype(), exact=self._exact())
        return self._pack_and_assemble_interleaved(
            slots, hists, w, h, n_segs,
            interval=rows_per_seg * mx, y_sampling=(2, 2))

    def _pack_and_assemble_interleaved(self, slots, hists, w, h, n_segs,
                                       interval, y_sampling):
        """Shared tail of the interleaved paths: tables, per-segment pack,
        finalize, assemble."""
        tables = self._build_tables(hists)
        dc_l, len_l = _luts(tables["luma_dc"])
        ac_l, alen_l = _luts(tables["luma_ac"])
        dc_c, len_c = _luts(tables["chroma_dc"])
        ac_c, alen_c = _luts(tables["chroma_ac"])
        num_slots = int(np.prod(slots["sym"].shape[1:]))
        mw = ops_pack.max_words_for_slots(num_slots)
        words, totals = _pack_interleaved_segments(
            slots, dc_l, len_l, ac_l, alen_l, dc_c, len_c, ac_c, alen_c, mw)
        segments = ops_pack.finish_scans(np.asarray(words), np.asarray(totals))
        header = jfif.headers(w, h, self._luma_q, self._chroma_q, tables,
                              restart_interval=interval if n_segs > 1 else 0,
                              y_sampling=y_sampling)
        return jfif.assemble_interleaved(header, segments)

    def _encode_interleaved_alt(self, rgb, h, w):
        """Interleaved scan for 4:4:4 (8x8 MCU: Y,Cb,Cr) or 4:2:2
        (16x8 MCU: Y,Y,Cb,Cr)."""
        sampling = self.config.subsampling
        mcu_w = 8 if sampling == "444" else 16
        mx, my = w // mcu_w, h // 8
        rows_per_seg = self.config.restart_interval_mcu_rows or my
        if my % rows_per_seg:
            raise ValueError(
                f"restart_interval_mcu_rows={rows_per_seg} must divide "
                f"8px MCU rows {my}")
        n_segs = my // rows_per_seg

        fn = _analyze_interleaved_alt_fn if self._exact() else _analyze_interleaved_alt
        slots, hists = fn(rgb, self._luma_q_dev, self._chroma_q_dev, n_segs,
                          sampling, dtype=self._dtype(), exact=self._exact())
        return self._pack_and_assemble_interleaved(
            slots, hists, w, h, n_segs, interval=rows_per_seg * mx,
            y_sampling=(1, 1) if sampling == "444" else (2, 1))


def _interleaved_slots_hists(seq, pattern, mps):
    """Shared symbolization + per-table histograms for interleaved layouts.

    ``pattern`` is the per-MCU block luma mask (e.g. [1,1,1,1,0,0] for
    4:2:0); seq is [n_segs, mps*len(pattern), 64] with DC already
    differenced per segment.
    """
    slots = ops_symbols.symbolize(seq)
    is_luma = jnp.tile(jnp.array(pattern, dtype=bool), (mps,))
    is_luma = jnp.broadcast_to(is_luma[None, :, None],
                               slots["valid"].shape[:2] + (1,))
    valid = slots["valid"]
    dc_mask = jnp.zeros_like(valid).at[..., 0].set(True)
    hists = (
        ops_symbols.histogram_256(slots["sym"], valid & dc_mask & is_luma),
        ops_symbols.histogram_256(slots["sym"], valid & ~dc_mask & is_luma),
        ops_symbols.histogram_256(slots["sym"], valid & dc_mask & ~is_luma),
        ops_symbols.histogram_256(slots["sym"], valid & ~dc_mask & ~is_luma),
    )
    slots["is_luma"] = jnp.broadcast_to(is_luma, slots["valid"].shape)
    return slots, hists


def _analyze_3scan_segments_fn(rgb, luma_q, chroma_q, rows_per_seg, sampling,
                               dtype=jnp.float32, exact=False):
    """Per-component restart segments for the non-interleaved layout.

    Returns ([(slots [S_c, n_c, 64], interval_blocks_c)] for Y, Cb, Cr,
    hists 4-tuple).  Each component's segment count S_c follows its own
    block grid (rows_per_seg must divide each grid's rows).
    """
    rgb = _unflat3(rgb)
    if sampling == "444":
        y, cb, cr = ops_color.rgb_to_ycbcr_444(rgb, dtype=dtype)
    elif sampling == "422":
        y, cb, cr = ops_color.rgb_to_ycbcr_422(rgb, dtype=dtype)
    else:
        y, cb, cr = ops_color.rgb_to_ycbcr_420(rgb, dtype=dtype)
    comps = []
    hists = {}
    for name, plane, q in (("y", y, luma_q), ("cb", cb, chroma_q),
                           ("cr", cr, chroma_q)):
        bh, bw = plane.shape[-2] // 8, plane.shape[-1] // 8
        if bh % rows_per_seg:
            raise ValueError(
                f"restart_interval_mcu_rows={rows_per_seg} must divide the "
                f"{name} component's {bh} block rows (3-scan layout)")
        n_segs = bh // rows_per_seg
        zz = ops_dct.dct_quantize_zigzag(ops_color.to_blocks(plane), q,
                                         dtype=dtype, exact=exact)
        seg = ops_dct.diff_dc(zz.reshape(n_segs, (bh // n_segs) * bw, 64))
        slots = ops_symbols.symbolize(seg)
        comps.append((slots, rows_per_seg * bw))
        hists[name] = ops_symbols.dc_ac_histograms(slots)
    luma_dc, luma_ac = hists["y"]
    chroma_dc = hists["cb"][0] + hists["cr"][0]
    chroma_ac = hists["cb"][1] + hists["cr"][1]
    return comps, (luma_dc, luma_ac, chroma_dc, chroma_ac)


_analyze_3scan_segments = functools.partial(
    jax.jit, static_argnames=("rows_per_seg", "sampling", "dtype", "exact"))(
        _analyze_3scan_segments_fn)


@functools.partial(jax.jit, static_argnames=("max_words",))
def _pack_scan_segments(slots, dc_code, dc_len, ac_code, ac_len, max_words):
    """Per-segment packing for one non-interleaved scan ([S, n, 64] slots)."""
    values, nbits = ops_symbols.attach_codes(slots, dc_code, dc_len,
                                             ac_code, ac_len)
    S = values.shape[0]
    return jax.vmap(lambda v, n: ops_pack.pack_fields(
        v, n, max_words=max_words))(values.reshape(S, -1),
                                    nbits.reshape(S, -1))


def _analyze_interleaved_alt_fn(rgb, luma_q, chroma_q, n_segs, sampling,
                                dtype=jnp.float32, exact=False):
    """4:4:4 / 4:2:2 interleaved: per-segment slot arrays.

    444: MCU blocks (Y, Cb, Cr) -> [n_segs, mps*3, 64];
    422: MCU blocks (Y, Y, Cb, Cr) -> [n_segs, mps*4, 64].
    In both, raster block order within each component already matches the
    MCU walk (one block row per MCU row), so no reorder gather is needed.
    """
    rgb = _unflat3(rgb)
    if sampling == "444":
        y, cb, cr = ops_color.rgb_to_ycbcr_444(rgb, dtype=dtype)
        y_per_mcu = 1
    else:
        y, cb, cr = ops_color.rgb_to_ycbcr_422(rgb, dtype=dtype)
        y_per_mcu = 2
    zz = [ops_dct.dct_quantize_zigzag(ops_color.to_blocks(p), q,
                                      dtype=dtype, exact=exact)
          for p, q in ((y, luma_q), (cb, chroma_q), (cr, chroma_q))]
    nm = zz[1].shape[0]  # MCUs == chroma blocks
    mps = nm // n_segs
    y_seg = ops_dct.diff_dc(zz[0].reshape(n_segs, mps * y_per_mcu, 64))
    cb_seg = ops_dct.diff_dc(zz[1].reshape(n_segs, mps, 64))
    cr_seg = ops_dct.diff_dc(zz[2].reshape(n_segs, mps, 64))
    seq = jnp.concatenate([
        y_seg.reshape(n_segs, mps, y_per_mcu, 64),
        cb_seg.reshape(n_segs, mps, 1, 64),
        cr_seg.reshape(n_segs, mps, 1, 64),
    ], axis=2).reshape(n_segs, mps * (y_per_mcu + 2), 64)
    return _interleaved_slots_hists(seq, [1] * y_per_mcu + [0, 0], mps)


_analyze_interleaved_alt = functools.partial(
    jax.jit, static_argnames=("n_segs", "sampling", "dtype", "exact"))(
        _analyze_interleaved_alt_fn)


def _analyze_interleaved_fn(rgb, luma_q, chroma_q, y_mcu_index, n_segs,
                            dtype=jnp.float32, exact=False):
    """Device: image -> per-segment interleaved slot arrays + histograms.

    Output slot arrays have shape [n_segs, mcus_per_seg*6, 64]; DC prediction
    is differenced independently per segment (restart semantics).
    """
    y, cb, cr = ops_color.rgb_to_ycbcr_420(_unflat3(rgb), dtype=dtype)
    zz_y = ops_dct.dct_quantize_zigzag(ops_color.to_blocks(y), luma_q,
                                       dtype=dtype, exact=exact)
    zz_cb = ops_dct.dct_quantize_zigzag(ops_color.to_blocks(cb), chroma_q,
                                        dtype=dtype, exact=exact)
    zz_cr = ops_dct.dct_quantize_zigzag(ops_color.to_blocks(cr), chroma_q,
                                        dtype=dtype, exact=exact)
    y_mcu = zz_y[y_mcu_index]  # MCU emission order

    nm = zz_cb.shape[0]  # total MCUs
    mps = nm // n_segs   # MCUs per segment

    y_seg = y_mcu.reshape(n_segs, mps * 4, 64)
    cb_seg = zz_cb.reshape(n_segs, mps, 64)
    cr_seg = zz_cr.reshape(n_segs, mps, 64)
    y_seg = ops_dct.diff_dc(y_seg)
    cb_seg = ops_dct.diff_dc(cb_seg)
    cr_seg = ops_dct.diff_dc(cr_seg)

    # interleave per MCU: Y0 Y1 Y2 Y3 Cb Cr
    seq = jnp.concatenate([
        y_seg.reshape(n_segs, mps, 4, 64),
        cb_seg.reshape(n_segs, mps, 1, 64),
        cr_seg.reshape(n_segs, mps, 1, 64),
    ], axis=2).reshape(n_segs, mps * 6, 64)
    return _interleaved_slots_hists(seq, [1, 1, 1, 1, 0, 0], mps)


_analyze_interleaved = functools.partial(
    jax.jit, static_argnames=("n_segs", "dtype", "exact"))(_analyze_interleaved_fn)


def pack_interleaved_segments_fn(slots, dc_l, len_l, ac_l, alen_l,
                                 dc_c, len_c, ac_c, alen_c, max_words):
    """vmapped per-segment packing with per-component Huffman tables."""
    sym = slots["sym"]
    is_luma = slots["is_luma"]
    is_dc = jnp.zeros_like(sym, dtype=bool).at[..., 0].set(True)
    code = jnp.where(
        is_dc,
        jnp.where(is_luma, dc_l[sym], dc_c[sym]),
        jnp.where(is_luma, ac_l[sym], ac_c[sym]),
    )
    clen = jnp.where(
        is_dc,
        jnp.where(is_luma, len_l[sym], len_c[sym]),
        jnp.where(is_luma, alen_l[sym], alen_c[sym]),
    )
    value = jnp.left_shift(code, slots["extra_n"]) | slots["extra"]
    value = jnp.where(slots["valid"], value, 0)
    nbits = jnp.where(slots["valid"], clen + slots["extra_n"], 0)
    return jax.vmap(lambda v, n: ops_pack.pack_fields(v, n, max_words=max_words))(
        value, nbits)


_pack_interleaved_segments = functools.partial(
    jax.jit, static_argnames=("max_words",))(pack_interleaved_segments_fn)


def _analyze_gray_fn(plane, luma_q, exact=False):
    zz = ops_dct.dct_quantize_zigzag(ops_color.to_blocks(plane.astype(jnp.int32)),
                                     luma_q, dtype=jnp.float64 if exact else jnp.float32,
                                     exact=exact)
    slots = ops_symbols.symbolize(ops_dct.diff_dc(zz))
    return slots, ops_symbols.dc_ac_histograms(slots)


_analyze_gray = functools.partial(jax.jit, static_argnames=("exact",))(_analyze_gray_fn)


def encode_gray(plane, config: EncodeConfig | None = None) -> bytes:
    """Encode an [H, W] uint8 grayscale plane as a 1-component JPEG.

    Beyond the reference (3-component only); arbitrary dims are padded by
    edge replication with the true size in SOF0.  The input is treated as
    the Y channel directly (no color conversion, full-range).
    """
    cfg = config or EncodeConfig()
    arr = np.asarray(plane)
    if arr.ndim != 2:
        raise ValueError(f"expected [H, W] grayscale, got shape {arr.shape}")
    h, w = arr.shape
    if h == 0 or w == 0:
        raise ValueError("image has zero pixels")
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    if (ph, pw) != (h, w):
        arr = np.pad(arr, ((0, ph - h), (0, pw - w)), mode="edge")

    luma_q, _ = T.quant_tables(cfg.quality)
    exact = cfg.dtype == "float64"
    fn = _analyze_gray_fn if exact else _analyze_gray  # exact runs un-jitted
    slots, hists = fn(jnp.asarray(arr, jnp.uint8), jnp.asarray(luma_q),
                      exact=exact)
    if cfg.huffman == "fixed":
        tables = fixed_tables()
    else:
        from ..huffman.build import build_table
        tables = {}
        for name, freq in zip(("luma_dc", "luma_ac"), hists):
            full = np.zeros(257, np.int64)
            full[:256] = np.asarray(freq)
            full[256] = 1
            tables[name] = build_table(full)
    num_slots = int(np.prod(slots["sym"].shape))
    mw = ops_pack.max_words_for_slots(num_slots)
    dc_code, dc_len = _luts(tables["luma_dc"])
    ac_code, ac_len = _luts(tables["luma_ac"])
    words, total = pack_scan(slots, dc_code, dc_len, ac_code, ac_len, mw)
    payload = ops_pack.finish_scan(np.asarray(words), int(total))
    header = jfif.headers_gray(pw, ph, luma_q, tables)
    data = b"".join([header, jfif.sos_header_single(1, 0, 0), payload,
                     jfif.EOI])
    if (ph, pw) != (h, w):
        data = jfif.patch_sof_dims(data, w, h)
    return data


def encode_jpeg(rgb, config: EncodeConfig | None = None) -> bytes:
    """One-shot encode of an [H, W, 3] uint8 RGB image."""
    return JpegEncoder(config).encode(rgb)
