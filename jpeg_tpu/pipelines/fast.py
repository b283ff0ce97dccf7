"""Optimized batched encode pipeline (Pallas fast path).

Same semantics as ``pipelines.encode`` in interleaved layout, but built for
TPU throughput (SURVEY §8.3.1):

* MCU reorder by reshape/transpose instead of a row gather;
* Huffman codeword attach in a Pallas VMEM lane-gather kernel
  (``kernels.lut``) instead of eight XLA 256-entry gathers;
* entropy packing via block-local Pallas packing + one row-granular
  scatter (``kernels.pack``) instead of a 19.6M-update element scatter;
* symbol histograms (dynamic-Huffman mode only) via compare-reduce
  instead of ``bincount`` scatter-adds;
* fixed-table mode skips histograms entirely.

The numerical path (color convert, DCT, quantize, zigzag, DC diff,
symbolization) is shared with the XLA pipeline, so outputs are
byte-identical between engines at equal dtype.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..bitstream import jfif
from ..core import tables as T
from ..core.types import EncodeConfig
from ..huffman.build import build_tables_from_histograms, fixed_tables
from ..kernels import lut as klut
from ..kernels import pack as kpack
from ..ops import color as ops_color
from ..ops import dct as ops_dct
from ..ops import symbols as ops_symbols


def mcu_reorder(zz_y, mcus_x: int, mcus_y: int):
    """Raster Y-block order -> interleaved MCU order, by pure relayout.

    [..., 4*mx*my, 64] where block (r, c, dv, dh) sits at raster index
    (2r+dv)*2mx + 2c+dh; the interleaved order is (r, c, dv, dh).
    """
    lead = zz_y.shape[:-2]
    z = zz_y.reshape(*lead, mcus_y, 2, mcus_x, 2, 64)
    z = jnp.swapaxes(z, -4, -3)  # -> [..., my, mx, 2, 2, 64]
    return z.reshape(*lead, mcus_y * mcus_x * 4, 64)


def interleave_segments(zz_y, zz_cb, zz_cr, mcus_x: int, mcus_y: int,
                        n_segs: int):
    """Component planes -> per-segment MCU-interleaved blocks with DC diff.

    Returns [..., n_segs, mps*6, 64] int32 (DC prediction independent per
    segment — restart semantics).
    """
    lead = zz_y.shape[:-2]
    nm = mcus_x * mcus_y
    mps = nm // n_segs
    y_mcu = mcu_reorder(zz_y, mcus_x, mcus_y)
    y_seg = ops_dct.diff_dc(y_mcu.reshape(*lead, n_segs, mps * 4, 64))
    cb_seg = ops_dct.diff_dc(zz_cb.reshape(*lead, n_segs, mps, 64))
    cr_seg = ops_dct.diff_dc(zz_cr.reshape(*lead, n_segs, mps, 64))
    return jnp.concatenate([
        y_seg.reshape(*lead, n_segs, mps, 4, 64),
        cb_seg.reshape(*lead, n_segs, mps, 1, 64),
        cr_seg.reshape(*lead, n_segs, mps, 1, 64),
    ], axis=-2).reshape(*lead, n_segs, mps * 6, 64)


def luma_mask(mps: int):
    """[mps*6] bool: interleaved MCU block pattern Y Y Y Y Cb Cr."""
    return jnp.tile(jnp.array([1, 1, 1, 1, 0, 0], dtype=bool), (mps,))


def hist_1024(idx):
    """[..., n] combined-LUT indices -> [..., 1024] histogram, compare-reduce.

    The NULL_INDEX bin collects invalid slots; callers drop it.  One pass
    over the data instead of four scatter-add bincounts (~12x faster on
    TPU, where tiny scatters serialize).  Batch-native (no vmap).
    """
    bins = jnp.arange(1024, dtype=jnp.int32)
    return jnp.sum(idx[..., :, None] == bins, axis=-2, dtype=jnp.int32)


def split_hists(h1024):
    """[..., 1024] -> (luma_dc, luma_ac, chroma_dc, chroma_ac) [..., 256]."""
    h = h1024.reshape(*h1024.shape[:-1], 4, 256)
    # index = sym | is_dc<<8 | is_luma<<9 -> group order: c_ac, c_dc, l_ac, l_dc
    chroma_ac, chroma_dc, luma_ac, luma_dc = (
        h[..., 0, :], h[..., 1, :], h[..., 2, :], h[..., 3, :])
    # drop the NULL_INDEX bin (invalid slots land at index 1023 = chroma?? no:
    # 1023 = sym 255 | dc | luma -> luma_dc bin 255, never a real DC class)
    luma_dc = luma_dc.at[..., 255].set(0)
    return luma_dc, luma_ac, chroma_dc, chroma_ac


def analyze_symbols(rgb, luma_q, chroma_q, mcus_x: int, mcus_y: int,
                    n_segs: int, dtype=jnp.float32):
    """Image -> per-segment slot arrays + combined LUT indices.

    Returns dict with idx/extra/extra_n of shape [n_segs, mps*6, 64].
    """
    y, cb, cr = ops_color.rgb_to_ycbcr_420(rgb, dtype=dtype)
    zz_y = ops_dct.dct_quantize_zigzag(ops_color.to_blocks(y), luma_q, dtype=dtype)
    zz_cb = ops_dct.dct_quantize_zigzag(ops_color.to_blocks(cb), chroma_q, dtype=dtype)
    zz_cr = ops_dct.dct_quantize_zigzag(ops_color.to_blocks(cr), chroma_q, dtype=dtype)
    seq = interleave_segments(zz_y, zz_cb, zz_cr, mcus_x, mcus_y, n_segs)
    slots = ops_symbols.symbolize(seq)
    mps = (mcus_x * mcus_y) // n_segs
    is_luma = jnp.broadcast_to(luma_mask(mps)[None, :, None], slots["sym"].shape)
    is_dc = jnp.zeros(slots["sym"].shape, bool).at[..., 0].set(True)
    idx = klut.slot_index(slots["sym"], slots["valid"], is_dc, is_luma)
    return {"idx": idx, "extra": slots["extra"], "extra_n": slots["extra_n"]}


class FastBatchEncoder:
    """Single-device batched interleaved encoder, Pallas engine.

    The device step is one jit: color -> DCT/quant/zigzag -> symbols ->
    attach (Pallas) -> pack (Pallas + row scatter).  Fixed-table mode has
    zero host round trips inside the step; dynamic mode adds a histogram
    output and a microsecond-scale host K.2 build (SURVEY §8.3.2).
    """

    def __init__(self, height: int, width: int,
                 config: EncodeConfig | None = None,
                 segs_per_image: int = 1, interpret: bool = False):
        if height % 16 or width % 16:
            raise ValueError(f"dimensions must be multiples of 16, got {width}x{height}")
        self.config = config or EncodeConfig(scan_layout="interleaved",
                                             huffman="fixed")
        if self.config.scan_layout != "interleaved":
            raise ValueError("FastBatchEncoder is interleaved-only")
        if self.config.subsampling != "420":
            raise ValueError("FastBatchEncoder supports 4:2:0 only; use "
                             "JpegEncoder for 4:2:2/4:4:4")
        self.height, self.width = height, width
        self.mcus_x, self.mcus_y = width // 16, height // 16
        nm = self.mcus_x * self.mcus_y
        if nm % segs_per_image or (self.mcus_y % segs_per_image):
            raise ValueError(f"segs_per_image={segs_per_image} must divide "
                             f"MCU rows {self.mcus_y}")
        self.n_segs = segs_per_image
        self.mcus_per_segment = nm // segs_per_image
        self.blocks_per_seg = self.mcus_per_segment * 6
        self.seg_rows = kpack.rows_per_segment(self.blocks_per_seg * 64)
        self.interpret = interpret

        self._luma_q, self._chroma_q = T.quant_tables(self.config.quality)
        self._luma_q_d = jnp.asarray(self._luma_q)
        self._chroma_q_d = jnp.asarray(self._chroma_q)
        self._fixed = None
        if self.config.huffman == "fixed":
            self._fixed = fixed_tables()
            self._fixed_lut = jnp.asarray(klut.build_combined_lut(self._fixed))
        self._dtype = jnp.float64 if self.config.dtype == "float64" else jnp.float32

        self._step = jax.jit(self._step_fn, static_argnames=("with_hist",))
        self._pack_only = jax.jit(self._pack_only_fn)
        self._analyze_hist = jax.jit(self._analyze_hist_fn)

    # -- jitted pieces ---------------------------------------------------

    def _analyze_batch(self, rgbs):
        # Batch-polymorphic ops, deliberately NOT vmapped: vmap's batched
        # relayouts feeding a Pallas custom call blow XLA:TPU compile time
        # up ~100x (56 s vs 1.7 s on a tiny batch).
        return analyze_symbols(rgbs, self._luma_q_d, self._chroma_q_d,
                               self.mcus_x, self.mcus_y, self.n_segs,
                               dtype=self._dtype)

    def _attach_pack(self, slots, lut_per_seg):
        """slots leaves [B, S, nblk, 64]; lut_per_seg [B*S or 1, 1024]."""
        B, S = slots["idx"].shape[0], slots["idx"].shape[1]
        if lut_per_seg.shape[0] == 1:
            # fixed tables: fused attach+pack (transposed layout end to end)
            from ..kernels import fused as kfused
            words, total_bits = kfused.attach_pack_segments(
                lut_per_seg[0],
                slots["idx"].reshape(B * S, -1, 64),
                slots["extra"].reshape(B * S, -1, 64),
                slots["extra_n"].reshape(B * S, -1, 64),
                B * S, self.seg_rows, interpret=self.interpret)
        else:
            idx = slots["idx"].reshape(B * S, -1)
            extra = slots["extra"].reshape(B * S, -1)
            extra_n = slots["extra_n"].reshape(B * S, -1)
            value, nbits = klut.attach_grouped(lut_per_seg, idx, extra, extra_n,
                                               interpret=self.interpret)
            words, total_bits = kpack.pack_segments(
                value.reshape(B * S, -1, 64), nbits.reshape(B * S, -1, 64),
                B * S, self.seg_rows, interpret=self.interpret)
        return (words.reshape(B, S, -1), total_bits.reshape(B, S))

    def _step_fn(self, rgbs, lut, with_hist: bool):
        slots = self._analyze_batch(rgbs)
        out = self._attach_pack(slots, lut[None])
        if with_hist:
            h = hist_1024(slots["idx"].reshape(rgbs.shape[0], -1))
            return out + (h,)
        return out

    def _analyze_hist_fn(self, rgbs):
        """Dynamic-table stage 1, one jit: slots + per-image histograms."""
        slots = self._analyze_batch(rgbs)
        h = hist_1024(slots["idx"].reshape(rgbs.shape[0], -1))
        return slots, h

    def _pack_only_fn(self, slots, lut_per_image):
        B, S = slots["idx"].shape[0], slots["idx"].shape[1]
        luts = jnp.repeat(lut_per_image, S, axis=0)  # [B*S, 1024]
        return self._attach_pack(slots, luts)

    # -- public API ------------------------------------------------------

    def step(self, rgbs):
        """Fixed-table fused device step: batch -> (words, total_bits)."""
        if self._fixed is None:
            raise ValueError("step() requires huffman='fixed'")
        rgbs = jnp.asarray(rgbs, dtype=jnp.uint8)
        return self._step(rgbs, self._fixed_lut, with_hist=False)

    def encode_batch(self, rgbs) -> list[bytes]:
        rgbs = jnp.asarray(rgbs, dtype=jnp.uint8)
        if rgbs.shape[1:] != (self.height, self.width, 3):
            raise ValueError(f"batch shape {rgbs.shape} != "
                             f"{self.height}x{self.width}")
        if self._fixed is not None:
            words, totals = self._step(rgbs, self._fixed_lut, with_hist=False)
            tables = [self._fixed] * int(rgbs.shape[0])
        else:
            slots, h = self._analyze_hist(rgbs)
            h_np = np.asarray(h)
            tables = []
            luts = np.empty((rgbs.shape[0], 1024), np.int32)
            for b in range(rgbs.shape[0]):
                hb = h_np[b].reshape(4, 256)
                # group order per slot_index bits (see split_hists); drop
                # the NULL_INDEX bin
                cac, cdc, lac, ldc = hb[0], hb[1], hb[2], hb[3].copy()
                ldc[255] = 0
                t = build_tables_from_histograms(ldc, lac, cdc, cac)
                tables.append(t)
                luts[b] = klut.build_combined_lut(t)
            words, totals = self._pack_only(slots, jnp.asarray(luts))
        # Fetch totals first (tiny), then one sliced transfer of just the
        # used word prefix — the padded buffer is worst-case sized (28
        # bits/slot) while real streams are ~10x smaller, and device->host
        # bandwidth is the e2e bottleneck.
        totals_np = np.asarray(totals)
        used = (int(totals_np.max()) + 31) // 32 + 1  # +1: tail-word read slack
        cap = min(words.shape[-1], -(-used // 128) * 128)
        words_np = np.asarray(words[:, :, :cap])
        return self._assemble(words_np, totals_np, tables)

    def _assemble(self, words, totals, tables):
        from .. import native
        from ..ops.pack import finish_scan
        B = words.shape[0]
        payloads = native.finish_scans(words.reshape(B * self.n_segs, -1),
                                       totals.reshape(-1))
        if payloads is None:  # no C++ toolchain: per-scan NumPy fallback
            payloads = [finish_scan(words[b, s], int(totals[b, s]))
                        for b in range(B) for s in range(self.n_segs)]
        out = []
        for b in range(B):
            segs = payloads[b * self.n_segs:(b + 1) * self.n_segs]
            interval = self.mcus_per_segment if self.n_segs > 1 else 0
            header = jfif.headers(self.width, self.height, self._luma_q,
                                  self._chroma_q, tables[b],
                                  restart_interval=interval)
            out.append(jfif.assemble_interleaved(header, segs))
        return out
