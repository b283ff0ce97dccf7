"""Multi-chip sharded JPEG encoding over a (data, space) mesh.

The TPU-scale counterpart of the reference's single-core encode loop
(``main/main.c:130-166``): a batch of images is data-parallel over the
``data`` mesh axis, and each image's MCU rows are spatially sharded over
the ``space`` axis in restart-delimited slabs (SURVEY §2.3, §8.2 phase 3).
Because the interleaved scan resets DC prediction at every RSTn marker,
each device's entropy segment is fully independent — no halo exchange is
needed; the only collective is a ``psum`` of the 4x256 symbol histograms
over ``space`` (dynamic-Huffman mode), which rides ICI.

Two modes:

* fixed tables (Annex K.3): one fused jitted step, zero host syncs —
  uint8 batch in, packed words + bit counts out.  The production batch
  fast path.
* dynamic tables (reference behavior, per-image K.2): stage 1 analyzes and
  psums histograms, the microsecond-scale K.2 build runs on host
  (SURVEY §8.3.2), stage 2 packs with the per-image LUTs.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import native
from ..bitstream import jfif
from ..core import tables as T
from ..core.types import EncodeConfig
from ..golden.encoder import mcu_order_index
from ..huffman.build import build_tables_from_histograms, fixed_tables
from ..ops import pack as ops_pack
from ..pipelines.encode import (_analyze_interleaved_alt_fn,
                                _analyze_interleaved_fn, _luts,
                                pack_interleaved_segments_fn)
from .mesh import DATA_AXIS, SPACE_AXIS


def _stack_hists(hists):
    return jnp.stack(list(hists))  # [4, 256]


class ShardedEncoder:
    """Batch encoder over a (data, space) mesh for one image geometry.

    Per-shard slab height is ``height / space_size``; it must be a multiple
    of ``16 * segs_per_device``.  Each segment becomes one restart interval.
    """

    def __init__(self, mesh, height: int, width: int,
                 config: EncodeConfig | None = None,
                 segs_per_device: int = 1):
        self.mesh = mesh
        self.config = config or EncodeConfig(scan_layout="interleaved")
        if self.config.scan_layout != "interleaved":
            raise ValueError("sharded encoding requires the interleaved layout "
                             "(restart markers delimit the shards)")
        from ..pipelines.fast import SAMPLING_GEOMETRY
        self.sampling = self.config.subsampling
        mcu_w, mcu_h, self.y_per_mcu = SAMPLING_GEOMETRY[self.sampling]
        if height % mcu_h or width % mcu_w:
            raise ValueError(f"dimensions must be multiples of "
                             f"{mcu_w}x{mcu_h}, got {width}x{height}")
        self.height, self.width = height, width
        ns = mesh.shape[SPACE_AXIS]
        if height % (ns * mcu_h * segs_per_device):
            raise ValueError(
                f"height {height} not divisible into {ns} slabs of "
                f"{segs_per_device} segments with {mcu_h}-row granularity")
        self.slab_h = height // ns
        self.segs_per_device = segs_per_device
        self.n_segments = ns * segs_per_device
        self.mcus_per_segment = ((self.slab_h // mcu_h // segs_per_device)
                                 * (width // mcu_w))
        self._mcu_w, self._mcu_h = mcu_w, mcu_h

        self._luma_q, self._chroma_q = T.quant_tables(self.config.quality)
        self._fixed = fixed_tables() if self.config.huffman == "fixed" else None

        slots_per_seg = self.mcus_per_segment * (self.y_per_mcu + 2) * 64
        self._max_words = ops_pack.max_words_for_slots(slots_per_seg)
        self._mcu_index = (jnp.asarray(mcu_order_index(width, self.slab_h))
                           if self.sampling == "420" else None)

        self._dtype = jnp.float64 if self.config.dtype == "float64" else jnp.float32
        self._engine = self._resolve_engine()
        self._analyze_step = self._build_analyze_step()
        self._pack_step = self._build_pack_step()
        if self._fixed is None:
            self._fused_step = None
        elif self._engine == "pallas":
            self._fused_step = self._build_fused_step_pallas()
        else:
            self._fused_step = self._build_fused_step()

    def _resolve_engine(self) -> str:
        """Pallas per-device kernels on TPU for the fixed-table fused step;
        dynamic-table mode keeps the XLA engine (same bytes either way)."""
        if self.config.engine != "auto":
            eng = self.config.engine
        else:
            eng = "pallas" if jax.default_backend() == "tpu" else "xla"
        if eng == "pallas" and self.config.dtype == "float64":
            # the Pallas analyze stage has no exact-summation mode; keep
            # the f64 bit-parity contract on the XLA engine
            eng = "xla"
        return eng

    # -- jitted steps ----------------------------------------------------

    def _in_shard(self):
        # [B, H, W*3] minor-flattened batch: data-parallel over images,
        # space-parallel over MCU-row slabs.  The W*3 flattening is the
        # same XLA:TPU parameter-layout fix as FastBatchEncoder._check_batch
        # (rank-4 u8 params with minor dim 3 cost ~4 ms per 20 MB to read
        # channel-sliced; flat params reshaped in-jit cost ~0.05 ms).
        return NamedSharding(self.mesh, P(DATA_AXIS, SPACE_AXIS, None))

    def _analyze_one(self, rgb_slab):
        """[slab_h, W, 3] -> (slots dict [segs, mps*bpm, 64], hists [4, 256]).

        In f64 exact mode this is only called eagerly (via
        ``_analyze_batch_exact``): under jit XLA:CPU contracts f64 mul+add
        into FMA, breaking the separately-rounded parity contract (caught
        by test_sharded for 4:4:4).
        """
        if self.sampling == "420":
            slots, hists = _analyze_interleaved_fn(
                rgb_slab, jnp.asarray(self._luma_q),
                jnp.asarray(self._chroma_q),
                self._mcu_index, self.segs_per_device, dtype=self._dtype,
                exact=self.config.dtype == "float64")
        else:
            slots, hists = _analyze_interleaved_alt_fn(
                rgb_slab, jnp.asarray(self._luma_q),
                jnp.asarray(self._chroma_q),
                self.segs_per_device, self.sampling, dtype=self._dtype,
                exact=self.config.dtype == "float64")
        return slots, _stack_hists(hists)

    def _build_analyze_step(self):
        mesh = self.mesh
        slot_spec = P(DATA_AXIS, SPACE_AXIS, None, None)

        def device_fn(rgb_local):
            rgb_local = self._unflatten_local(rgb_local)
            slots, hists = jax.vmap(self._analyze_one)(rgb_local)
            hists = jax.lax.psum(hists, SPACE_AXIS)  # replicated over space
            return slots, hists

        f = jax.shard_map(
            device_fn, mesh=mesh,
            in_specs=(P(DATA_AXIS, SPACE_AXIS, None),),
            out_specs=({k: slot_spec for k in
                        ("sym", "extra", "extra_n", "valid", "is_luma")},
                       P(DATA_AXIS, None, None)),
            check_vma=False)
        return jax.jit(f)

    def _build_pack_step(self):
        mesh = self.mesh
        slot_spec = P(DATA_AXIS, SPACE_AXIS, None, None)
        mw = self._max_words

        def device_fn(slots, luts):
            # slots leaves: [B_local, segs, mps*6, 64]; luts: [B_local, 8, 256]
            def per_image(s, l):
                return pack_interleaved_segments_fn(
                    s, l[0], l[1], l[2], l[3], l[4], l[5], l[6], l[7],
                    max_words=mw)
            return jax.vmap(per_image)(slots, luts)

        f = jax.shard_map(
            device_fn, mesh=mesh,
            in_specs=({k: slot_spec for k in
                       ("sym", "extra", "extra_n", "valid", "is_luma")},
                      P(DATA_AXIS, None, None)),
            out_specs=(P(DATA_AXIS, SPACE_AXIS, None), P(DATA_AXIS, SPACE_AXIS)),
            check_vma=False)
        return jax.jit(f)

    def _build_fused_step(self):
        """Fixed-table single step: batch -> (words, totals, hists)."""
        mesh = self.mesh
        mw = self._max_words
        luts = jnp.stack(self._lut_rows(self._fixed))

        def device_fn(rgb_local):
            rgb_local = self._unflatten_local(rgb_local)
            slots, hists = jax.vmap(self._analyze_one)(rgb_local)
            hists = jax.lax.psum(hists, SPACE_AXIS)
            words, totals = jax.vmap(lambda s: pack_interleaved_segments_fn(
                s, luts[0], luts[1], luts[2], luts[3],
                luts[4], luts[5], luts[6], luts[7], max_words=mw))(slots)
            return words, totals, hists

        f = jax.shard_map(
            device_fn, mesh=mesh,
            in_specs=(P(DATA_AXIS, SPACE_AXIS, None),),
            out_specs=(P(DATA_AXIS, SPACE_AXIS, None), P(DATA_AXIS, SPACE_AXIS),
                       P(DATA_AXIS, None, None)),
            check_vma=False)
        return jax.jit(f)

    def _build_fused_step_pallas(self):
        """Fixed-table fused step with the Pallas per-device kernels.

        Same shard_map decomposition as the XLA variant, but each device
        runs the fused Pallas stack over its restart-segment slab: one
        DCT+quantize+zigzag+DC-diff+symbolize kernel (``kernels.fused``),
        then the combined-LUT attach + parallel bit pack, all in the
        transposed slot layout.  Bytes are identical to the XLA engine;
        histograms are also produced (psum over space) so ``step`` has one
        signature across engines.
        """
        from ..kernels import fused as kfused
        from ..kernels import lut as klut
        from ..kernels import pack as kpack
        from ..pipelines import fast as F

        mesh = self.mesh
        lut = jnp.asarray(klut.build_combined_lut(self._fixed))
        mx = self.width // self._mcu_w
        slab_my = self.slab_h // self._mcu_h
        spd = self.segs_per_device
        seg_rows = kpack.rows_per_segment(
            self.mcus_per_segment * (self.y_per_mcu + 2) * 64)
        interp = jax.default_backend() not in ("tpu",)
        sampling = self.sampling
        ypm = self.y_per_mcu
        scan = np.asarray(T.SCAN_ORDER)
        m, bias = T.dct_flat_basis()
        dct_m = jnp.asarray(m, jnp.float32)
        dct_b = jnp.asarray(bias, jnp.float32)
        ql_zz = jnp.asarray(
            np.asarray(self._luma_q).reshape(64)[scan], jnp.float32)
        qc_zz = jnp.asarray(
            np.asarray(self._chroma_q).reshape(64)[scan], jnp.float32)

        from ..kernels import front as kfront
        seg_rows_p = (seg_rows + 7) & ~7
        use_front = (
            self.slab_h % 128 == 0  # whole 128-row slabs per device (the
            # sharded step can't row-pad: each device owns a fixed slab)
            and kfront.front_eligible(self.slab_h, self.width, sampling,
                                      spd)
            and kfront.aligned_segments(self.slab_h, spd)
            and seg_rows_p * 128 * 4 <= kfused._RESIDENT_VMEM_BUDGET
            # both per-device kernels must fit the slab VMEM estimate:
            # front_place raises past it (callers gate), and the hist
            # index kernel has its own envelope
            and kfront.mega_fits(self.width // 16, sampling, seg_rows)
            and kfront.analyze_fits(self.width // 16, sampling))
        if not use_front:
            import warnings
            warnings.warn(
                f"ShardedEncoder: per-device slab "
                f"{self.slab_h}x{self.width} ({sampling}, {spd} segs) "
                f"cannot ride the front_place mega kernel; using the "
                f"~10x slower XLA front", stacklevel=3)

        def device_fn(rgb_local):  # [B_local, slab_h, W*3]
            b = rgb_local.shape[0]
            if use_front:
                # per-device mega kernels: each device's slab encodes with
                # the same one-pass front_place as FastBatchEncoder (spd
                # restart segments per slab, DC chains reset per segment)
                words, totals = kfront.front_place(
                    rgb_local, lut[None, :], dct_m, dct_b, ql_zz, qc_zz,
                    self.width // 16, self.slab_h // 16, sampling,
                    seg_rows, interpret=interp, n_segs=spd)
                idx_t = kfront.front_index(
                    rgb_local, dct_m, dct_b, ql_zz, qc_zz,
                    self.width // 16, self.slab_h // 16, sampling,
                    interpret=interp, n_segs=spd)
            else:
                rgb4 = self._unflatten_local(rgb_local)
                px = F.analyze_px(rgb4, mx, slab_my, spd, sampling=sampling)
                px = px.reshape(b * spd, -1, 64)
                words, totals = kfused.dct_attach_pack_grouped(
                    lut[None, :], dct_m, dct_b, ql_zz, qc_zz, px,
                    b * spd, b * spd, ypm + 2, ypm, seg_rows,
                    interpret=interp)
                idx_t = kfused.dct_index_segments(
                    dct_m, dct_b, ql_zz, qc_zz, px, b * spd, ypm + 2, ypm,
                    interpret=interp)
            hists = F.hist_1024_t(idx_t, b)
            ldc, lac, cdc, cac = F.split_hists(hists)
            h4 = jnp.stack([ldc, lac, cdc, cac], axis=1)  # [B_local, 4, 256]
            h4 = jax.lax.psum(h4, SPACE_AXIS)
            return (words.reshape(b, spd, -1), totals.reshape(b, spd), h4)

        f = jax.shard_map(
            device_fn, mesh=mesh,
            in_specs=(P(DATA_AXIS, SPACE_AXIS, None),),
            out_specs=(P(DATA_AXIS, SPACE_AXIS, None), P(DATA_AXIS, SPACE_AXIS),
                       P(DATA_AXIS, None, None)),
            check_vma=False)
        return jax.jit(f)

    def _unflatten_local(self, rgb_local):
        """In-jit view of a local [B, slab_h, W*3] shard as [B, slab_h, W, 3]."""
        return rgb_local.reshape(rgb_local.shape[0], rgb_local.shape[1],
                                 self.width, 3)

    def _analyze_batch_exact(self, rgbs):
        """Host-orchestrated eager analyze for the f64 bit-parity mode.

        The exact mode's contract is "separately rounded f64 ops, matching
        the un-jitted single-device path and therefore the C reference".
        Under jit (which shard_map requires) XLA:CPU contracts mul+add
        into FMA — optimization_barrier and bitcast round-trips are both
        stripped by its pipeline — occasionally flipping a trunc at an
        exact-integer boundary.  So in exact mode each (image, slab) runs
        the un-jitted analyzer eagerly and only the integer pack stage
        stays on the jitted mesh path.  Throughput is irrelevant here:
        f64 is the parity/testing mode, not the production path.
        """
        ns = self.mesh.shape[SPACE_AXIS]
        rgbs = np.asarray(rgbs)
        B = rgbs.shape[0]
        keys = ("sym", "extra", "extra_n", "valid", "is_luma")
        batch_leaves = {k: [] for k in keys}
        hists = []
        for b in range(B):
            segs = {k: [] for k in keys}
            h = None
            for s in range(ns):
                slab = jnp.asarray(rgbs[b, s * self.slab_h:(s + 1) * self.slab_h])
                slots, h4 = self._analyze_one(slab)
                for k in keys:
                    segs[k].append(np.asarray(slots[k]))
                h = np.asarray(h4) if h is None else h + np.asarray(h4)
            for k in keys:
                batch_leaves[k].append(np.concatenate(segs[k], axis=0))
            hists.append(h)
        slots = {k: jnp.asarray(np.stack(v)) for k, v in batch_leaves.items()}
        return slots, np.stack(hists)

    # -- helpers ---------------------------------------------------------

    @staticmethod
    def _lut_rows(tables):
        dc_l, len_l = _luts(tables["luma_dc"])
        ac_l, alen_l = _luts(tables["luma_ac"])
        dc_c, len_c = _luts(tables["chroma_dc"])
        ac_c, alen_c = _luts(tables["chroma_ac"])
        return [dc_l, len_l, ac_l, alen_l, dc_c, len_c, ac_c, alen_c]

    def _device_put(self, rgbs):
        if isinstance(rgbs, np.ndarray):
            rgbs = rgbs.astype(np.uint8, copy=False)
        else:
            rgbs = jnp.asarray(rgbs, dtype=jnp.uint8)
        if rgbs.shape[1:] == (self.height, self.width * 3):
            pass  # already minor-flattened
        elif rgbs.shape[1:] == (self.height, self.width, 3):
            rgbs = rgbs.reshape(rgbs.shape[0], self.height, self.width * 3)
        else:
            raise ValueError(f"batch shape {rgbs.shape} does not match encoder "
                             f"geometry {self.height}x{self.width}")
        nd = self.mesh.shape[DATA_AXIS]
        if rgbs.shape[0] % nd:
            raise ValueError(f"batch {rgbs.shape[0]} not divisible by data axis {nd}")
        return jax.device_put(jnp.asarray(rgbs), self._in_shard())

    def _assemble(self, words, totals, tables_per_image):
        # Fetch the tiny bit counts first, then only the used word prefix:
        # buffers are worst-case sized ~10x the real streams and the
        # device->host link is the e2e bottleneck (same move as
        # pipelines.fast).  One native batch call finalizes all B*S scans.
        totals = np.asarray(totals)
        B = totals.shape[0]
        used = (int(totals.max()) + 31) // 32 + 1
        cap = min(words.shape[-1], -(-used // 128) * 128)
        words = np.asarray(words[:, :, :cap])
        y_sampling = {"420": (2, 2), "422": (2, 1),
                      "444": (1, 1)}[self.sampling]
        interval = self.mcus_per_segment if self.n_segments > 1 else 0
        headers = [jfif.headers(self.width, self.height, self._luma_q,
                                self._chroma_q, tables_per_image[b],
                                restart_interval=interval,
                                y_sampling=y_sampling)
                   for b in range(B)]
        files = native.assemble_interleaved(
            words.reshape(B * self.n_segments, -1), totals.reshape(-1),
            [h + jfif.sos_header_interleaved() for h in headers],
            self.n_segments)
        if files is not None:
            return files
        payloads = ops_pack.finish_scans(
            words.reshape(B * self.n_segments, -1), totals.reshape(-1))
        return [jfif.assemble_interleaved(
                    headers[b],
                    payloads[b * self.n_segments:(b + 1) * self.n_segments])
                for b in range(B)]

    # -- public API ------------------------------------------------------

    def step(self, rgbs):
        """The fully-jitted device step (fixed tables): batch -> device arrays.

        Returns (words [B, S, mw] u32, totals [B, S] i32, hists [B, 4, 256]).
        This is the function to benchmark: no host round trips.
        """
        if self._fused_step is None:
            raise ValueError("step() requires huffman='fixed'")
        return self._fused_step(self._device_put(rgbs))

    def encode_batch(self, rgbs) -> list[bytes]:
        """Encode [B, H, W, 3] uint8 -> list of JFIF byte strings."""
        exact = self.config.dtype == "float64"
        if self._fixed is not None and not exact:
            rgbs = self._device_put(rgbs)
            words, totals, _ = self._fused_step(rgbs)
            tables = [self._fixed] * int(rgbs.shape[0])
            return self._assemble(words, totals, tables)

        if exact:
            slots, hists_np = self._analyze_batch_exact(rgbs)
        else:
            slots, hists = self._analyze_step(self._device_put(rgbs))
            hists_np = np.asarray(hists)
        if self._fixed is not None:
            tables = [self._fixed] * hists_np.shape[0]
        else:
            tables = [build_tables_from_histograms(*hists_np[b])
                      for b in range(hists_np.shape[0])]
        luts = jnp.stack([jnp.stack(self._lut_rows(t)) for t in tables])
        words, totals = self._pack_step(slots, luts)
        return self._assemble(words, totals, tables)
