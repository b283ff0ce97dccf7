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

import collections
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


# Per-MCU geometry by chroma subsampling: (mcu_w, mcu_h, y_blocks_per_mcu).
# The interleaved block pattern is Y*ypm, Cb, Cr (T.81 A.2.3; sampling
# factor emission main/encoder.c:536 for the 4:2:0 case).
SAMPLING_GEOMETRY = {"420": (16, 16, 4), "422": (16, 8, 2), "444": (8, 8, 1)}


def interleave_segments(zz_y, zz_cb, zz_cr, mcus_x: int, mcus_y: int,
                        n_segs: int, sampling: str = "420"):
    """Component planes -> per-segment MCU-interleaved blocks with DC diff.

    Returns [..., n_segs, mps*(ypm+2), 64] int32 (DC prediction independent
    per segment — restart semantics).  Only 4:2:0 needs the Y relayout:
    in 4:2:2/4:4:4 each MCU's Y blocks are raster-consecutive already.
    """
    lead = zz_y.shape[:-2]
    nm = mcus_x * mcus_y
    mps = nm // n_segs
    ypm = SAMPLING_GEOMETRY[sampling][2]
    y_mcu = mcu_reorder(zz_y, mcus_x, mcus_y) if sampling == "420" else zz_y
    y_seg = ops_dct.diff_dc(y_mcu.reshape(*lead, n_segs, mps * ypm, 64))
    cb_seg = ops_dct.diff_dc(zz_cb.reshape(*lead, n_segs, mps, 64))
    cr_seg = ops_dct.diff_dc(zz_cr.reshape(*lead, n_segs, mps, 64))
    return jnp.concatenate([
        y_seg.reshape(*lead, n_segs, mps, ypm, 64),
        cb_seg.reshape(*lead, n_segs, mps, 1, 64),
        cr_seg.reshape(*lead, n_segs, mps, 1, 64),
    ], axis=-2).reshape(*lead, n_segs, mps * (ypm + 2), 64)


def luma_mask(mps: int, y_per_mcu: int = 4):
    """[mps*(ypm+2)] bool: interleaved MCU block pattern Y*ypm Cb Cr."""
    return jnp.tile(jnp.array([1] * y_per_mcu + [0, 0], dtype=bool), (mps,))


# worst-case histogram one-hot residency bound (see hist_1024_t's KC)
_HIST_OH_BUDGET = 1 << 30


def _possible_symbols():
    """(dc, ac) 0/1 masks of the symbols baseline streams can emit given
    the [-2048, 2047] coefficient clip (main/encoder.c:109): DC classes
    0..12 (diffs span +-4095) and AC (run<<4|size) with size 1..11,
    plus EOB (0x00) and ZRL (0xF0)."""
    dc = np.zeros(256, np.int64)
    dc[:13] = 1
    ac = np.zeros(256, np.int64)
    ac[0] = ac[0xF0] = 1
    for run in range(16):
        for size in range(1, 12):
            ac[(run << 4) | size] = 1
    return dc, ac


_DC_POSSIBLE, _AC_POSSIBLE = _possible_symbols()


def hist_1024_t(idx_t, n_images: int):
    """Transposed slot indices [64, n_images*n] -> [n_images, 1024] hists.

    MXU one-hot contraction, shaped for zero hidden relayouts: one
    explicit [64, B, n] -> [B, 64*n] transpose of the int32 indices
    (cheap), then per chunk an [B, 32, KC] @ [B, KC, 32] int8 matmul —
    hist[a, c] for idx = a*32 + c.  The balanced 32+32 decomposition
    halves the one-hot HBM traffic vs the 8+128 split (64 vs 136 bytes
    per slot), and building oh_a directly transposed keeps XLA from
    inserting a 300 MB int8 transpose before the dot (the round-1
    formulation contracted non-adjacent axes, which did exactly that —
    ~18 ms of the 27 ms dynamic stage 1).
    """
    r, total = idx_t.shape
    n = total // n_images
    m = idx_t.reshape(r, n_images, n).transpose(1, 0, 2).reshape(
        n_images, r * n)
    # slots per chunk: as LARGE as the memory budget allows — XLA fuses
    # the one-hot construction into the int8 dot, and every extra scan
    # step costs real time (measured 2026-08-20: one chunk 0.82-0.93 ms
    # vs 1.33 ms at the old 32768 for the 16x640x640 batch).  The cap is
    # derived from a worst-case-materialization budget: if a future XLA
    # version stops fusing the one-hots, they occupy ~64*B*KC bytes
    # (two [B, 32, KC] int8 arrays), so KC is bounded to keep that under
    # _HIST_OH_BUDGET even for large batches — a silent fusion
    # regression then costs time, not an OOM.
    KC = min(-(-(r * n) // 128) * 128, 1 << 20,
             max(_HIST_OH_BUDGET // (64 * n_images) // 128 * 128, 4096))
    pad = (-m.shape[1]) % KC
    if pad:
        m = jnp.concatenate(
            [m, jnp.full((n_images, pad), klut.NULL_INDEX, m.dtype)],
            axis=-1)

    def step(h, ch):  # ch: [B, KC]
        oh_a = (ch[:, None, :] >> 5 == jnp.arange(32, dtype=jnp.int32)
                [None, :, None]).astype(jnp.int8)        # [B, 32, KC]
        oh_c = ((ch & 31)[..., None] == jnp.arange(32, dtype=jnp.int32)
                ).astype(jnp.int8)                       # [B, KC, 32]
        return h + jnp.einsum("bak,bkc->bac", oh_a, oh_c,
                              preferred_element_type=jnp.int32), None

    h0 = jnp.zeros((n_images, 32, 32), jnp.int32)
    if m.shape[1] == KC:  # common case: ONE chunk, no scan at all
        h, _ = step(h0, m)
    else:
        chunks = jnp.moveaxis(m.reshape(n_images, -1, KC), 1, 0)
        h, _ = jax.lax.scan(step, h0, chunks)
    return h.reshape(n_images, 1024)


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


def analyze_zz(rgb, luma_q, chroma_q, mcus_x: int, mcus_y: int,
               n_segs: int, dtype=jnp.float32, sampling: str = "420"):
    """Image -> un-diffed interleaved coefficients + per-block DC diffs.

    Feeds ``kernels.fused.analyze_attach_pack_segments``: the heavy
    symbolization happens in-kernel, so this stage only produces
    (seq [..., n_segs, nblk, 64] int32, dc_diff [..., n_segs, nblk] int32)
    — one less full-array pass than ``analyze_symbols`` (no ``.at[...,0]``
    DC rewrite, no slot arrays).

    Coefficients stay int32 deliberately: int16 would halve the relayout
    traffic (the clip makes them int16-exact) and saves ~0.3 ms/step, but
    the int16 transpose feeding the kernel blows the XLA:TPU compile up
    from ~2 min to ~17 min (measured 2026-08-17) — the same class of
    pathology as the vmap/einsum cases in CLAUDE.md.
    """
    convert = {"420": ops_color.rgb_to_ycbcr_420,
               "422": ops_color.rgb_to_ycbcr_422,
               "444": ops_color.rgb_to_ycbcr_444}[sampling]
    y, cb, cr = convert(rgb, dtype=dtype)
    zz_y = ops_dct.dct_quantize_zigzag(ops_color.to_blocks(y), luma_q, dtype=dtype)
    zz_cb = ops_dct.dct_quantize_zigzag(ops_color.to_blocks(cb), chroma_q, dtype=dtype)
    zz_cr = ops_dct.dct_quantize_zigzag(ops_color.to_blocks(cr), chroma_q, dtype=dtype)
    lead = zz_y.shape[:-2]
    nm = mcus_x * mcus_y
    mps = nm // n_segs
    ypm = SAMPLING_GEOMETRY[sampling][2]
    y_mcu = (mcu_reorder(zz_y, mcus_x, mcus_y) if sampling == "420"
             else zz_y)
    y_seg = y_mcu.reshape(*lead, n_segs, mps * ypm, 64)
    cb_seg = zz_cb.reshape(*lead, n_segs, mps, 64)
    cr_seg = zz_cr.reshape(*lead, n_segs, mps, 64)

    def dc_diff_of(x):  # [..., S, n, 64] -> [..., S, n]
        dc = x[..., 0]
        prev = jnp.concatenate(
            [jnp.zeros_like(dc[..., :1]), dc[..., :-1]], axis=-1)
        return dc - prev

    dc_diff = jnp.concatenate([
        dc_diff_of(y_seg).reshape(*lead, n_segs, mps, ypm),
        dc_diff_of(cb_seg).reshape(*lead, n_segs, mps, 1),
        dc_diff_of(cr_seg).reshape(*lead, n_segs, mps, 1),
    ], axis=-1).reshape(*lead, n_segs, mps * (ypm + 2))
    seq = jnp.concatenate([
        y_seg.reshape(*lead, n_segs, mps, ypm, 64),
        cb_seg.reshape(*lead, n_segs, mps, 1, 64),
        cr_seg.reshape(*lead, n_segs, mps, 1, 64),
    ], axis=-2).reshape(*lead, n_segs, mps * (ypm + 2), 64)
    return seq, dc_diff


def analyze_px(rgb, mcus_x: int, mcus_y: int, n_segs: int,
               sampling: str = "420"):
    """Image -> per-segment interleaved f32 PIXEL blocks (no DCT).

    Front half of the fully-fused path: color convert + 8x8 blocking +
    MCU interleave only; DCT/quant/zigzag/DC-diff/symbolization all run
    inside ``kernels.fused.dct_attach_pack_segments``.  Returns
    [..., n_segs, mps*(ypm+2), 64] float32 raster-flattened blocks,
    un-level-shifted (the -128 is folded into the DCT bias).
    """
    convert = {"420": ops_color.rgb_to_ycbcr_420,
               "422": ops_color.rgb_to_ycbcr_422,
               "444": ops_color.rgb_to_ycbcr_444}[sampling]
    y, cb, cr = convert(rgb, dtype=jnp.float32)
    yb = ops_color.to_blocks(y)
    yb = yb.reshape(*yb.shape[:-2], 64)
    cbb = ops_color.to_blocks(cb)
    cbb = cbb.reshape(*cbb.shape[:-2], 64)
    crb = ops_color.to_blocks(cr)
    crb = crb.reshape(*crb.shape[:-2], 64)
    lead = yb.shape[:-2]
    nm = mcus_x * mcus_y
    mps = nm // n_segs
    ypm = SAMPLING_GEOMETRY[sampling][2]
    y_mcu = mcu_reorder(yb, mcus_x, mcus_y) if sampling == "420" else yb
    return jnp.concatenate([
        y_mcu.reshape(*lead, n_segs, mps, ypm, 64),
        cbb.reshape(*lead, n_segs, mps, 1, 64),
        crb.reshape(*lead, n_segs, mps, 1, 64),
    ], axis=-2).reshape(*lead, n_segs, mps * (ypm + 2), 64)


def analyze_symbols(rgb, luma_q, chroma_q, mcus_x: int, mcus_y: int,
                    n_segs: int, dtype=jnp.float32, sampling: str = "420"):
    """Image -> per-segment slot arrays + combined LUT indices.

    Returns dict with idx/extra/extra_n of shape [n_segs, mps*(ypm+2), 64].
    """
    convert = {"420": ops_color.rgb_to_ycbcr_420,
               "422": ops_color.rgb_to_ycbcr_422,
               "444": ops_color.rgb_to_ycbcr_444}[sampling]
    y, cb, cr = convert(rgb, dtype=dtype)
    zz_y = ops_dct.dct_quantize_zigzag(ops_color.to_blocks(y), luma_q, dtype=dtype)
    zz_cb = ops_dct.dct_quantize_zigzag(ops_color.to_blocks(cb), chroma_q, dtype=dtype)
    zz_cr = ops_dct.dct_quantize_zigzag(ops_color.to_blocks(cr), chroma_q, dtype=dtype)
    seq = interleave_segments(zz_y, zz_cb, zz_cr, mcus_x, mcus_y, n_segs,
                              sampling=sampling)
    slots = ops_symbols.symbolize(seq)
    mps = (mcus_x * mcus_y) // n_segs
    ypm = SAMPLING_GEOMETRY[sampling][2]
    is_luma = jnp.broadcast_to(luma_mask(mps, ypm)[None, :, None],
                               slots["sym"].shape)
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
                 segs_per_image: int | None = None,
                 interpret: bool = False):
        self.config = config or EncodeConfig(scan_layout="interleaved",
                                             huffman="fixed")
        if self.config.scan_layout != "interleaved":
            raise ValueError("FastBatchEncoder is interleaved-only")
        self.sampling = self.config.subsampling
        mcu_w, mcu_h, self.y_per_mcu = SAMPLING_GEOMETRY[self.sampling]
        if height % mcu_h or width % mcu_w:
            raise ValueError(f"dimensions must be multiples of "
                             f"{mcu_w}x{mcu_h}, got {width}x{height}")
        self.height, self.width = height, width
        self.mcus_x, self.mcus_y = width // mcu_w, height // mcu_h
        nm = self.mcus_x * self.mcus_y
        if segs_per_image is None:
            # derive the restart structure from the config (the encoder
            # must never silently drop a requested DRI/RSTn layout)
            rows = self.config.restart_interval_mcu_rows or self.mcus_y
            if self.mcus_y % rows:
                raise ValueError(
                    f"restart_interval_mcu_rows={rows} must divide "
                    f"MCU rows {self.mcus_y}")
            segs_per_image = self.mcus_y // rows
        if nm % segs_per_image or (self.mcus_y % segs_per_image):
            raise ValueError(f"segs_per_image={segs_per_image} must divide "
                             f"MCU rows {self.mcus_y}")
        self.n_segs = segs_per_image
        self.mcus_per_segment = nm // segs_per_image
        self.blocks_per_seg = self.mcus_per_segment * (self.y_per_mcu + 2)
        self.seg_rows = kpack.rows_per_segment(self.blocks_per_seg * 64)
        self.interpret = interpret

        self._luma_q, self._chroma_q = T.quant_tables(self.config.quality)
        self._luma_q_d = jnp.asarray(self._luma_q)
        self._chroma_q_d = jnp.asarray(self._chroma_q)
        scan = np.asarray(T.SCAN_ORDER)
        m, bias = T.dct_flat_basis()
        self._dct_m = jnp.asarray(m, jnp.float32)
        self._dct_bias = jnp.asarray(bias, jnp.float32)
        self._ql_zz = jnp.asarray(
            np.asarray(self._luma_q).reshape(64)[scan], jnp.float32)
        self._qc_zz = jnp.asarray(
            np.asarray(self._chroma_q).reshape(64)[scan], jnp.float32)
        self._fixed = None
        if self.config.huffman == "fixed":
            self._fixed = fixed_tables()
            self._fixed_lut = jnp.asarray(klut.build_combined_lut(self._fixed))
        # "dynamic-sampled": per-image K.2 tables from a 1/5-sampled
        # histogram (+1-smoothed so every symbol keeps a code); ~4-5x
        # less of the dominant dynamic-only device cost for ~1% size
        self._sampled = self.config.huffman == "dynamic-sampled"
        if self._sampled and self.config.dtype == "float64":
            raise ValueError("dynamic-sampled requires the f32 fast path"
                             " (exact mode exists for byte parity — "
                             "sampling would defeat it)")
        self._dtype = jnp.float64 if self.config.dtype == "float64" else jnp.float32
        self._is_luma_seg = np.tile(
            np.array([1] * self.y_per_mcu + [0, 0], np.int32),
            self.mcus_per_segment)

        # silent-fallback guard (VERDICT r4 #8): the XLA front is ~10x
        # slower than the Pallas mega kernel — never take it silently
        if self._dtype != jnp.float64:
            from ..kernels import front as kfront
            reason = kfront.front_ineligible_reason(
                self.height, self.width, self.sampling, self.n_segs)
            if reason is None and not self._front_ok:
                sc = kfront.slab_cols(self.width // 16, self.sampling)
                if not (self._front_aligned and sc % 128 == 0 and
                        kfront.analyze_fits(self.width // 16,
                                            self.sampling,
                                            symbolize=False)):
                    reason = ("mega-kernel VMEM estimate or segment "
                              "words budget exceeded, and the two-phase "
                              "Pallas front needs 128-aligned slab "
                              "columns, slab-aligned segments, and "
                              "VMEM room for the xt output")
            if reason is None and self._front_ok \
                    and self.config.huffman != "fixed" \
                    and not self._front_index_ok:
                reason = ("dynamic stage-1 index kernel exceeds the "
                          "slab VMEM estimate (the fixed path still "
                          "rides the mega kernel)")
            if reason is not None:
                import warnings
                warnings.warn(
                    f"FastBatchEncoder {self.width}x{self.height} "
                    f"({self.sampling}, {self.n_segs} segs): Pallas "
                    f"front unavailable ({reason}); falling back to the "
                    f"~10x slower XLA front", stacklevel=2)

        self._step = jax.jit(self._step_fn)
        self._pack_only = jax.jit(self._pack_only_fn)
        self._analyze_hist = jax.jit(self._analyze_hist_fn)
        # device->host fetch machinery (see _fetch_assemble): cached
        # per-caps slice executables + the caps prediction for the next
        # batch (merges the totals and words fetches into ONE link round
        # trip — the round trip, not bandwidth, dominates e2e on
        # high-latency links).
        self._slice_cache: dict[tuple[int, ...], object] = {}
        self._pred_caps: tuple[int, ...] | None = None

    # -- jitted pieces ---------------------------------------------------

    def _analyze_zz_batch(self, rgbs):
        """Shared analyze front: (seq [B,S,nblk,64], dcd [B,S,nblk], isl).

        Batch-polymorphic ops, deliberately NOT vmapped: vmap's batched
        relayouts feeding a Pallas custom call blow XLA:TPU compile time
        up ~100x (56 s vs 1.7 s on a tiny batch).
        """
        seq, dcd = analyze_zz(rgbs, self._luma_q_d, self._chroma_q_d,
                              self.mcus_x, self.mcus_y, self.n_segs,
                              dtype=self._dtype, sampling=self.sampling)
        B, S = seq.shape[0], seq.shape[1]
        isl = jnp.broadcast_to(
            jnp.asarray(self._is_luma_seg)[None, :],
            (B * S, self._is_luma_seg.shape[0]))
        return seq, dcd, isl

    @property
    def _front_geom_ok(self):
        """Pallas-front geometry eligibility (kernels.front)."""
        from ..kernels import front as kfront
        return (self._dtype != jnp.float64 and
                kfront.front_eligible(self.height, self.width,
                                      self.sampling, self.n_segs))

    @property
    def _front_ok(self):
        """Mega-kernel eligibility: geometry + the VMEM-resident segment
        words budget (≈4 MP of image per segment) + the whole-slab
        scoped-VMEM estimate (wide slabs are xt-bound — see
        ``kernels.front.mega_vmem_bytes``).  Bigger segments keep the
        Pallas front but split entropy into the two-phase kernels
        (``_front_geom_ok``)."""
        from ..kernels import front as kfront
        from ..kernels import fused as kfused
        seg_rows_p = (self.seg_rows + 7) & ~7
        return (self._front_geom_ok and
                seg_rows_p * 128 * 4 <= kfused._RESIDENT_VMEM_BUDGET and
                kfront.mega_fits(self.width // 16, self.sampling,
                                 self.seg_rows))

    @property
    def _front_index_ok(self):
        """Dynamic stage-1 eligibility: the index kernel (front +
        symbolize + packed-field emit) has no resident words buffer but
        its own VMEM envelope — ungated it OOM'd past W≈3500 by the
        estimator while ``_front_ok`` (which models the place kernel
        with chunk backoff) still passed."""
        from ..kernels import front as kfront
        return (self._front_ok and
                kfront.analyze_fits(self.width // 16, self.sampling,
                                    n_outputs=1))

    @property
    def _h_pad(self):
        """Rows padded up to full 128-row slabs (mega kernels mask the
        padded tail MCU rows via real_height)."""
        return -(-self.height // 128) * 128

    def _pad_rows(self, rgbs_flat):
        pad = self._h_pad - self.height
        if pad:
            rgbs_flat = jnp.pad(rgbs_flat, ((0, 0), (0, pad), (0, 0)))
        return rgbs_flat

    # -- pseudo-segment mode: restart boundaries NOT on slab edges -------
    #
    # front_place's segment model needs every segment to be a whole
    # number of 128-row slabs.  Any other MCU-granular segmentation
    # (e.g. 1920x1088 with 4 restart segments of 272 rows — the
    # reference CLI's most common real geometry) runs each segment as
    # its own zero-padded pseudo-image instead: segments are contiguous
    # row ranges, so [B, H, W*3] -> [B*S, seg_h, W*3] is a free view,
    # the pad is one XLA DMA, and real_height masks the padded tail MCU
    # rows exactly as for slab-padded single-segment images.  DC
    # prediction resets per pseudo-image = per segment (restart
    # semantics), and the words/totals come back per segment already.

    @property
    def _front_aligned(self):
        from ..kernels import front as kfront
        return kfront.aligned_segments(self.height, self.n_segs)

    @property
    def _seg_h(self):
        return self.height // self.n_segs

    @property
    def _seg_h_pad(self):
        return -(-self._seg_h // 128) * 128

    def _seg_pseudo_batch(self, rgbs_flat):
        """[B, H, W*3] -> [B*S, seg_h_pad, W*3] pseudo-image batch."""
        B = rgbs_flat.shape[0]
        x = rgbs_flat.reshape(B * self.n_segs, self._seg_h,
                              rgbs_flat.shape[-1])
        pad = self._seg_h_pad - self._seg_h
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        return x

    def _step_fn(self, rgbs_flat, lut):
        """Fixed-table fused step.  f32: a Pallas front kernel does the
        deinterleave + color + 4:2:0 + block/MCU relayout (MXU permutation
        matmuls — the same stage cost ~4 ms as XLA ops), then ONE Pallas
        kernel does DCT (MXU dot) + quantize + zigzag + DC diff +
        symbolization + LUT attach + local packing — no coefficient or
        slot arrays in HBM.  f64 (exact mode): coefficients come from the
        XLA analyze stage and only symbolize-onward is fused."""
        from ..kernels import fused as kfused
        if self._dtype == jnp.float64:
            rgbs = self._unflatten(rgbs_flat)
            seq, dcd, isl = self._analyze_zz_batch(rgbs)
            B, S = seq.shape[0], seq.shape[1]
            words, totals = kfused.analyze_attach_pack_segments(
                lut, seq.reshape(B * S, -1, 64), dcd.reshape(B * S, -1),
                isl, B * S, self.seg_rows, interpret=self.interpret)
            return words.reshape(B, S, -1), totals.reshape(B, S)
        B, S = rgbs_flat.shape[0], self.n_segs
        if self._front_ok:
            from ..kernels import front as kfront
            if self._front_aligned:
                words, totals = kfront.front_place(
                    self._pad_rows(rgbs_flat), lut[None, :], self._dct_m,
                    self._dct_bias, self._ql_zz, self._qc_zz,
                    self.width // 16, self._h_pad // 16, self.sampling,
                    self.seg_rows, interpret=self.interpret,
                    real_height=self.height, n_segs=S)
            else:  # pseudo-segment mode (see _seg_pseudo_batch)
                words, totals = kfront.front_place(
                    self._seg_pseudo_batch(rgbs_flat), lut[None, :],
                    self._dct_m, self._dct_bias, self._ql_zz, self._qc_zz,
                    self.width // 16, self._seg_h_pad // 16, self.sampling,
                    self.seg_rows, interpret=self.interpret,
                    real_height=self._seg_h, n_segs=1)
            return words.reshape(B, S, -1), totals.reshape(B, S)
        from ..kernels import front as kfront
        if (self._front_geom_ok and self._front_aligned and
                kfront.slab_cols(self.width // 16, self.sampling)
                % 128 == 0 and
                kfront.analyze_fits(self.width // 16, self.sampling,
                                    symbolize=False)):
            # Pallas front + two-phase entropy: segments too large for the
            # VMEM-resident mega kernel (> ~4 MP/segment).  front_analyze
            # needs 128-aligned slab columns (xt lands in HBM); unaligned
            # widths fall through to the XLA front below.
            mx, myp = self.width // 16, self._h_pad // 16
            xt = kfront.front_analyze(self._pad_rows(rgbs_flat), mx, myp,
                                      self.sampling,
                                      interpret=self.interpret)
            G = self._h_pad // 128
            sc = kfront.slab_cols(mx, self.sampling)
            rn = kfront._real_nblk(mx, myp, self.sampling, self.height,
                                   G, sc)
            words, totals = kfused.dct_attach_pack_xt(
                lut[None, :], self._dct_m, self._dct_bias, self._ql_zz,
                self._qc_zz, xt, B * S, B * S, self.y_per_mcu + 2,
                self.y_per_mcu, self.seg_rows, interpret=self.interpret,
                real_nblk=rn)
            return words.reshape(B, S, -1), totals.reshape(B, S)
        px = analyze_px(self._unflatten(rgbs_flat), self.mcus_x,
                        self.mcus_y, self.n_segs, sampling=self.sampling)
        words, totals = kfused.dct_attach_pack_segments(
            lut, self._dct_m, self._dct_bias, self._ql_zz, self._qc_zz,
            px.reshape(B * S, -1, 64), B * S, self.y_per_mcu + 2,
            self.y_per_mcu, self.seg_rows, interpret=self.interpret)
        return words.reshape(B, S, -1), totals.reshape(B, S)

    def _analyze_hist_fn(self, rgbs_flat):
        """Dynamic-table stage 1, one jit: analyze + Pallas symbolize +
        per-image MXU histograms.  f32 keeps only the pixel blocks on
        device (stage 2 recomputes symbolization in-kernel — writing the
        amplitude fields would be pure HBM waste); f64 (exact mode) keeps
        the transposed slot fields as before."""
        from ..kernels import fused as kfused
        rgbs = self._unflatten(rgbs_flat)
        if self._dtype == jnp.float64:
            seq, dcd, isl = self._analyze_zz_batch(rgbs)
            B, S = seq.shape[0], seq.shape[1]
            idx_t, extra_t, extran_t, _ = kfused.symbolize_segments(
                seq.reshape(B * S, -1, 64), dcd.reshape(B * S, -1), isl,
                B * S, interpret=self.interpret)
            h = hist_1024_t(idx_t, B)
            return (idx_t, extra_t, extran_t), h
        B, S = rgbs_flat.shape[0], self.n_segs
        if self._front_index_ok:
            # stage 1 emits PACKED symbol fields (idx|extra_n|extra in
            # one int32/slot): the histogram masks pf & 1023, and stage
            # 2 (fused.attach_pack_pf) does NO front/DCT/symbolize
            # re-run — only the LUT attach + place remain after the
            # sync.  The r4 xt handoff (same-size f32 pixel blocks)
            # still re-ran DCT+symbolize in stage 2; pf removes that
            # whole duplicated VPU cost for the same HBM traffic.
            from ..kernels import front as kfront
            if self._front_aligned:
                pf = kfront.front_index(
                    self._pad_rows(rgbs_flat), self._dct_m, self._dct_bias,
                    self._ql_zz, self._qc_zz, self.width // 16,
                    self._h_pad // 16, self.sampling,
                    interpret=self.interpret, real_height=self.height,
                    n_segs=S, emit_fields=True)
            else:  # pseudo-segment mode (see _seg_pseudo_batch)
                pf = kfront.front_index(
                    self._seg_pseudo_batch(rgbs_flat), self._dct_m,
                    self._dct_bias, self._ql_zz, self._qc_zz,
                    self.width // 16, self._seg_h_pad // 16, self.sampling,
                    interpret=self.interpret, real_height=self._seg_h,
                    n_segs=1, emit_fields=True)
            h = hist_1024_t(self._hist_src(pf, B) & 1023, B)
            return (pf,), h
        px = analyze_px(rgbs, self.mcus_x, self.mcus_y, self.n_segs,
                        sampling=self.sampling)
        px = px.reshape(B * S, -1, 64)
        idx_t = kfused.dct_index_segments(
            self._dct_m, self._dct_bias, self._ql_zz, self._qc_zz,
            px, B * S, self.y_per_mcu + 2, self.y_per_mcu,
            interpret=self.interpret)
        h = hist_1024_t(self._hist_src(idx_t, B), B)
        return (px,), h

    # block stride of the "dynamic-sampled" histogram: coprime to every
    # MCU period (6/4/3), so all component positions are sampled evenly
    _SAMPLE_STRIDE = 5

    def _hist_src(self, idx_t, B: int):
        """Histogram feed: full field, or a per-image strided block
        subsample in "dynamic-sampled" mode (reshape keeps each image's
        samples in its own contiguous run — hist_1024_t splits images
        by equal spans)."""
        if not self._sampled:
            return idx_t
        r, total = idx_t.shape
        n = total // B
        return idx_t.reshape(r, B, n)[:, :, ::self._SAMPLE_STRIDE] \
            .reshape(r, -1)

    def _pack_only_fn(self, fields, lut_per_image):
        """Dynamic-table stage 2: per-image-LUT fused attach + pack."""
        from ..kernels import fused as kfused
        B, S = lut_per_image.shape[0], self.n_segs
        if len(fields) == 3:  # f64 exact mode: pre-symbolized slot fields
            idx_t, extra_t, extran_t = fields
            words, totals = kfused.attach_pack_grouped(
                lut_per_image, idx_t, extra_t, extran_t, B * S, S,
                self.seg_rows, interpret=self.interpret)
        elif fields[0].ndim == 2:  # pf handoff: stage 1 emitted packed
            # symbol fields; stage 2 is pure attach + place (no front,
            # no DCT, no symbolize — see _analyze_hist_fn)
            (pf,) = fields
            words, totals = kfused.attach_pack_pf(
                lut_per_image, pf, B * S, S, self.seg_rows,
                interpret=self.interpret)
        else:  # f32: grouped one-kernel DCT->place over the retained px
            (px,) = fields
            words, totals = kfused.dct_attach_pack_grouped(
                lut_per_image, self._dct_m, self._dct_bias, self._ql_zz,
                self._qc_zz, px, B * S, S, self.y_per_mcu + 2,
                self.y_per_mcu, self.seg_rows, interpret=self.interpret)
        return words.reshape(B, S, -1), totals.reshape(B, S)

    # -- public API ------------------------------------------------------

    def step(self, rgbs):
        """Fixed-table fused device step: batch -> (words, total_bits)."""
        if self._fixed is None:
            raise ValueError("step() requires huffman='fixed'")
        return self._step(self._check_batch(rgbs), self._fixed_lut)

    def _unflatten(self, rgbs_flat):
        """In-jit view back to [B, H, W, 3] (see ``_check_batch``)."""
        return rgbs_flat.reshape(rgbs_flat.shape[0], self.height,
                                 self.width, 3)

    def _check_batch(self, rgbs):
        """Validate a [B, H, W, 3] batch and return it minor-flattened.

        The jitted steps take the batch as [B, H, W*3]: XLA:TPU's codegen
        for channel slices of a rank-4 *parameter* with minor dim 3 costs
        ~4 ms per 20 MB batch, while the identical bytes passed logically
        flat and reshaped inside the jit cost ~0.05 ms (measured
        2026-08-17).  For host arrays the reshape is a free view; device
        arrays pay one relayout here instead of a pathological one per
        step.
        """
        if hasattr(rgbs, "shape") and tuple(rgbs.shape[1:]) == \
                (self.height, self.width * 3):
            return jnp.asarray(rgbs, dtype=jnp.uint8)
        if isinstance(rgbs, np.ndarray):
            rgbs = rgbs.astype(np.uint8, copy=False)
        else:
            rgbs = jnp.asarray(rgbs, dtype=jnp.uint8)
        if rgbs.shape[1:] != (self.height, self.width, 3):
            raise ValueError(f"batch shape {rgbs.shape} != "
                             f"{self.height}x{self.width}")
        return jnp.asarray(
            rgbs.reshape(rgbs.shape[0], self.height, self.width * 3))

    def _build_tables_batch(self, h_np, smooth: bool = False):
        """Per-image K.2 table builds + combined LUTs from [B, 1024] hists.

        All 4B tables build in one native batch call (C++ K.2; the Python
        builder at ~6 ms/table was the dominant host cost of dynamic mode).
        ``smooth`` adds +1 to every symbol bin ("dynamic-sampled" mode):
        a symbol the sample missed still gets a code, so the stream stays
        legal for any content at a negligible table-optimality cost.
        """
        from ..huffman.build import build_tables_batch
        B = h_np.shape[0]
        hb = h_np.reshape(B, 4, 256)
        # group order per slot_index bits (see split_hists); drop the
        # NULL_INDEX bin
        ldc = hb[:, 3].copy()
        ldc[:, 255] = 0
        freqs = np.ones((B, 4, 257), np.int64)
        freqs[:, 0, :256] = ldc
        freqs[:, 1, :256] = hb[:, 2]  # luma_ac
        freqs[:, 2, :256] = hb[:, 1]  # chroma_dc
        freqs[:, 3, :256] = hb[:, 0]  # chroma_ac
        if smooth:
            # floor only symbols that CAN occur (coefficients clip to
            # [-2048, 2047] -> AC size <= 11, DC class <= 12, plus
            # EOB/ZRL): an all-256 floor would bloat every DHT with
            # codes for impossible symbols (~1 KB/image measured)
            freqs[:, 0, :256] += _DC_POSSIBLE
            freqs[:, 2, :256] += _DC_POSSIBLE
            freqs[:, 1, :256] += _AC_POSSIBLE
            freqs[:, 3, :256] += _AC_POSSIBLE
        tabs = build_tables_batch(freqs.reshape(B * 4, 257))
        tables = []
        luts = np.empty((B, 1024), np.int32)
        for b in range(B):
            t = {"luma_dc": tabs[4 * b], "luma_ac": tabs[4 * b + 1],
                 "chroma_dc": tabs[4 * b + 2], "chroma_ac": tabs[4 * b + 3]}
            tables.append(t)
            luts[b] = klut.build_combined_lut(t)
        return tables, luts

    def dynamic_pack(self, rgbs):
        """Dynamic-table device path: batch -> (words, totals, tables).

        One histogram sync per batch (the reference's per-image
        ``init_huffman``, main/main.c:145, batched), host K.2 builds, then
        the per-image-LUT pack.  Outputs stay on device.
        """
        fields, h = self._analyze_hist(self._check_batch(rgbs))
        tables, luts = self._build_tables_batch(np.asarray(h),
                                                smooth=self._sampled)
        words, totals = self._pack_only(fields, jnp.asarray(luts))
        return words, totals, tables

    def encode_batch(self, rgbs) -> list[bytes]:
        rgbs = self._check_batch(rgbs)
        if self._fixed is not None:
            words, totals = self._step(rgbs, self._fixed_lut)
            tables = [self._fixed] * int(rgbs.shape[0])
        else:
            words, totals, tables = self.dynamic_pack(rgbs)
        return self._fetch_assemble(words, totals, tables)

    # device-memory budget for TOTAL in-flight stream residency: the
    # grouped pipeline holds up to ~(2*depth+1) batches' worst-case words
    # buffers (fixed) or xt handoffs (dynamic) PLUS up to ``depth``
    # enqueued input batches; _stream_depth solves
    #   (2*depth+1)*per_batch + depth*input <= budget
    # for depth, so residency stays under the budget on large geometries
    # instead of OOMing a 16 GB chip
    _STREAM_BUDGET_BYTES = 2 << 30

    def _stream_depth(self, per_batch_bytes: int, sync_depth: int,
                      input_bytes: int = 0) -> int:
        denom = 2 * per_batch_bytes + input_bytes
        avail = self._STREAM_BUDGET_BYTES - per_batch_bytes
        return max(1, min(max(sync_depth, 1),
                          int(avail // max(denom, 1))))

    def encode_stream(self, batches, sync_depth: int = 4):
        """Pipelined multi-batch encode; yields one list of JPEGs per batch.

        Fixed mode: up to ``sync_depth`` batches' device steps are
        enqueued per group and the WHOLE group's outputs fetch in one
        link round trip (``_fetch_assemble_many``), two groups deep —
        the round trip, not bandwidth, dominates the fetch on
        high-latency links, so grouping amortizes it sync_depth-fold.

        Dynamic mode: the histogram device->host sync is the expensive
        step on high-latency links (one blocking round trip per batch),
        so up to ``sync_depth`` batches' analyzes are enqueued first and
        their histograms fetched in ONE stacked transfer; the host K.2
        builds and per-image-LUT packs then run per batch with the next
        super-batch's analyzes already in flight; the packed outputs
        group-fetch the same way as fixed mode.

        Memory: in-flight residency is ~(2*depth+1) words buffers (and
        in dynamic mode up to depth xt handoffs), so the effective depth
        shrinks below ``sync_depth`` when a group would exceed
        ``_STREAM_BUDGET_BYTES``.  Group sizes are held constant at the
        effective depth (only the final drain may be smaller), so each
        stream compiles at most two group-shape fetch executables.
        """
        if self._fixed is not None:
            group, prev, depth = [], None, max(sync_depth, 1)
            for rgbs in batches:
                rgbs = self._check_batch(rgbs)
                words, totals = self._step(rgbs, self._fixed_lut)
                group.append((words, totals,
                              [self._fixed] * int(rgbs.shape[0])))
                depth = self._stream_depth(words.nbytes, sync_depth,
                                           input_bytes=rgbs.nbytes)
                if len(group) >= depth:
                    if prev is not None:
                        yield from self._fetch_assemble_many(prev)
                    prev, group = group, []
            for g in (prev, group):
                if g:
                    yield from self._fetch_assemble_many(g)
            return

        import threading

        analyzed = []          # (fields, hist) awaiting the batched sync
        staged = None          # previous super-batch: (fields list, fetch)
        ready = collections.deque()   # packed, awaiting fetch+assembly

        def stage():
            """Two-deep super-batch pipeline step: start the current
            super-batch's stacked histogram transfer in a BACKGROUND
            THREAD (the device->host copy releases the GIL, so the
            link round trip genuinely overlaps the next super-batch's
            host work and enqueues — ``copy_to_host_async`` is
            best-effort-only on some transports, see CLAUDE.md) and
            consume the PREVIOUS one, whose fetch has had a whole
            super-batch to complete."""
            nonlocal staged
            nxt = None
            if analyzed:
                hs = jnp.stack([h for _, h in analyzed])
                box = {}

                def fetch(hs=hs, box=box):
                    try:
                        box["h"] = np.asarray(hs)
                    except BaseException as e:  # re-raised at join
                        box["err"] = e

                th = threading.Thread(target=fetch)
                th.start()
                nxt = ([f for f, _ in analyzed], th, box)
                analyzed.clear()
            if staged is not None:
                fields_list, th_prev, box_prev = staged
                th_prev.join()
                if "err" in box_prev:  # surface the REAL device/link
                    raise box_prev["err"]  # error, not a KeyError
                for fields, h_np in zip(fields_list, box_prev["h"]):
                    tables, luts = self._build_tables_batch(
                        h_np, smooth=self._sampled)
                    words, totals = self._pack_only(fields,
                                                    jnp.asarray(luts))
                    ready.append((words, totals, tables))
            staged = nxt

        depth = max(sync_depth, 1)
        for rgbs in batches:
            fh = self._analyze_hist(self._check_batch(rgbs))
            analyzed.append(fh)
            # xt handoffs (f32 pixel blocks) dominate residency; scale
            # the analyze super-batch down on large geometries (the
            # packed words buffers of up to depth ready batches are the
            # "input" term here)
            words_bytes = (int(fh[1].shape[0]) * self.n_segs
                           * ((self.seg_rows + 7) & ~7) * 128 * 4)
            depth = self._stream_depth(fh[0][0].nbytes, sync_depth,
                                       input_bytes=words_bytes)
            if len(analyzed) >= depth:
                stage()
            # fetch in CONSTANT-size groups (one in flight): varying
            # group sizes would compile a fresh stack/concat executable
            # per size, stalling ~0.7 s in-band each first time
            while len(ready) > depth:
                grp = [ready.popleft() for _ in range(depth)]
                yield from self._fetch_assemble_many(grp)
        stage()
        stage()
        while len(ready) > depth:
            grp = [ready.popleft() for _ in range(depth)]
            yield from self._fetch_assemble_many(grp)
        if ready:
            yield from self._fetch_assemble_many(list(ready))
            ready.clear()

    # words-fetch bucketing: caps quantize to _CAP_BUCKET words so slice
    # executables are reused across batches (an unbucketed ``w[:, :, :cap]``
    # triggers a fresh ~0.7 s XLA compile for EVERY new content size —
    # the round-2 e2e regression).  One extra bucket of prediction
    # headroom makes same-content streams hit the single-round-trip path.
    _CAP_BUCKET = 2048
    _SLICE_CACHE_MAX = 64

    def _caps_of(self, totals_np, max_words: int, headroom: int = 0):
        """Per-image word caps (bucketed) from the [B, S] bit totals."""
        used = (totals_np.max(axis=1).astype(np.int64) + 31) // 32 + 1
        b = self._CAP_BUCKET
        return tuple(int(min(max_words, -(-int(u) // b) * b + headroom * b))
                     for u in used)

    def _flat_slice(self, words, caps):
        """Jitted per-image used-prefix gather -> one flat u32 array.

        Each image contributes its segments' first ``caps[b]`` words;
        one contiguous transfer replaces B*S strided ones.  Executables
        cache per caps tuple; the cache is bounded (content-stable
        streams use 1-2 entries; wildly varying streams fall back to a
        batch-uniform cap so the key space stays small).
        """
        if len(self._slice_cache) >= self._SLICE_CACHE_MAX:
            caps = (max(caps),) * len(caps)
        fn = self._slice_cache.get(caps)
        if fn is None:
            def f(w, caps=caps):
                return jnp.concatenate(
                    [w[b, :, :caps[b]].reshape(-1)
                     for b in range(len(caps))])
            fn = self._slice_cache.setdefault(caps, jax.jit(f))
        return fn(words), caps

    def _split_flat(self, flat_np, caps):
        """Host split of the flat fetch back to [B, S, max(caps)] words."""
        S = self.n_segs
        out = np.zeros((len(caps), S, max(caps)), flat_np.dtype)
        off = 0
        for b, c in enumerate(caps):
            out[b, :, :c] = flat_np[off:off + S * c].reshape(S, c)
            off += S * c
        return out

    def _fetch_assemble(self, words, totals, tables):
        # Fetch just the used word prefixes — the padded device buffer is
        # worst-case sized (30 bits/slot) while real streams are ~10x
        # smaller.  The per-image caps come from the bit totals, which
        # live on device too; fetching them first costs a full link round
        # trip, so the caps are PREDICTED from the previous batch (plus
        # one bucket of headroom) and totals + sliced words fetch in ONE
        # device_get.  A misprediction (content grew past the headroom)
        # salvages with a second exact fetch.
        pred = self._pred_caps
        if pred is not None and len(pred) == words.shape[0]:
            flat, caps = self._flat_slice(words, pred)
            totals_np, flat_np = jax.device_get((totals, flat))
            need = self._caps_of(totals_np, words.shape[-1])
            if any(n > c for n, c in zip(need, caps)):
                flat, caps = self._flat_slice(words, need)
                flat_np = np.asarray(flat)
        else:
            totals_np = np.asarray(totals)
            need = self._caps_of(totals_np, words.shape[-1])
            flat, caps = self._flat_slice(words, need)
            flat_np = np.asarray(flat)
        # Ratchet the prediction: grow to cover what this batch needed
        # (plus headroom) but never shrink — shrinking would flap between
        # slice executables (a fresh ~0.7 s compile each) on streams
        # whose content size wobbles across a bucket edge.
        new = self._caps_of(totals_np, words.shape[-1], headroom=1)
        if pred is not None and len(pred) == len(new):
            new = tuple(max(a, b) for a, b in zip(pred, new))
        self._pred_caps = new
        return self._assemble(self._split_flat(flat_np, caps), totals_np,
                              tables)

    def _fetch_assemble_many(self, pending):
        """Fetch SEVERAL batches' outputs in one link round trip.

        Each batch's used word prefixes slice on device under the shared
        caps prediction (same executable for every batch), the slices
        concatenate into one transfer alongside the stacked totals, and
        assembly runs per batch on host.  A batch whose content outgrew
        the prediction salvages with its own exact refetch (rare; the
        ratchet then covers it).  Returns a list of per-batch file lists
        in submission order.
        """
        pred = self._pred_caps
        if pred is None or any(len(pred) != w.shape[0]
                               for w, _, _ in pending):
            # no usable prediction yet: per-batch path establishes it
            return [self._fetch_assemble(w, t, tb) for w, t, tb in pending]
        flats, capss = [], []
        for words, _totals, _tables in pending:
            f, c = self._flat_slice(words, pred)
            flats.append(f)
            capss.append(c)
        tot_stack = jnp.stack([t for _, t, _ in pending])
        comb = flats[0] if len(flats) == 1 else jnp.concatenate(flats)
        tots_np, comb_np = jax.device_get((tot_stack, comb))
        outs = []
        off = 0
        new = pred
        for (words, _totals, tables), caps, tnp in zip(pending, capss,
                                                       tots_np):
            n = self.n_segs * sum(caps)
            flat_np = comb_np[off:off + n]
            off += n
            need = self._caps_of(tnp, words.shape[-1])
            if any(nd > c for nd, c in zip(need, caps)):
                f2, caps = self._flat_slice(words, need)
                flat_np = np.asarray(f2)
            new = tuple(max(a, b) for a, b in zip(
                new, self._caps_of(tnp, words.shape[-1], headroom=1)))
            outs.append(self._assemble(self._split_flat(flat_np, caps),
                                       tnp, tables))
        self._pred_caps = new
        return outs

    def _assemble(self, words, totals, tables):
        from .. import native
        from ..ops.pack import finish_scans
        B = words.shape[0]
        y_sampling = {"420": (2, 2), "422": (2, 1), "444": (1, 1)}[self.sampling]
        interval = self.mcus_per_segment if self.n_segs > 1 else 0
        headers = [jfif.headers(self.width, self.height, self._luma_q,
                                self._chroma_q, tables[b],
                                restart_interval=interval,
                                y_sampling=y_sampling)
                   for b in range(B)]
        # one native call emits every complete file (finalize + RSTn + EOI
        # on host threads); jfif.py remains the Python fallback
        sos = jfif.sos_header_interleaved()
        files = native.assemble_interleaved(
            words.reshape(B * self.n_segs, -1), totals.reshape(-1),
            [h + sos for h in headers], self.n_segs)
        if files is not None:
            return files
        payloads = finish_scans(words.reshape(B * self.n_segs, -1),
                                totals.reshape(-1))
        return [jfif.assemble_interleaved(
                    headers[b],
                    payloads[b * self.n_segs:(b + 1) * self.n_segs])
                for b in range(B)]
