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

from ..bitstream import jfif
from ..core import tables as T
from ..core.types import EncodeConfig
from ..golden.encoder import mcu_order_index
from ..huffman.build import build_tables_from_histograms, fixed_tables
from ..ops import pack as ops_pack
from ..pipelines.encode import (_analyze_interleaved_fn, _luts,
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
        if height % 16 or width % 16:
            raise ValueError(f"dimensions must be multiples of 16, got {width}x{height}")
        self.mesh = mesh
        self.config = config or EncodeConfig(scan_layout="interleaved")
        if self.config.scan_layout != "interleaved":
            raise ValueError("sharded encoding requires the interleaved layout "
                             "(restart markers delimit the shards)")
        if self.config.subsampling != "420":
            raise ValueError("sharded encoding supports 4:2:0 only")
        self.height, self.width = height, width
        ns = mesh.shape[SPACE_AXIS]
        if height % (ns * 16 * segs_per_device):
            raise ValueError(
                f"height {height} not divisible into {ns} slabs of "
                f"{segs_per_device} segments with 16-row granularity")
        self.slab_h = height // ns
        self.segs_per_device = segs_per_device
        self.n_segments = ns * segs_per_device
        self.mcus_per_segment = (self.slab_h // 16 // segs_per_device) * (width // 16)

        self._luma_q, self._chroma_q = T.quant_tables(self.config.quality)
        self._fixed = fixed_tables() if self.config.huffman == "fixed" else None

        slots_per_seg = self.mcus_per_segment * 6 * 64
        self._max_words = ops_pack.max_words_for_slots(slots_per_seg)
        self._mcu_index = jnp.asarray(mcu_order_index(width, self.slab_h))

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
        return NamedSharding(self.mesh, P(DATA_AXIS, SPACE_AXIS, None, None))

    def _analyze_one(self, rgb_slab):
        """[slab_h, W, 3] -> (slots dict [segs, mps*6, 64], hists [4, 256]).

        Note: in f64 exact mode this still runs under jit (shard_map
        requires it); if a backend fuses f64 mul+add into FMA the last
        ulp could differ from the un-jitted single-device exact path.
        The byte-parity test (sharded == single-device) guards this.
        """
        slots, hists = _analyze_interleaved_fn(
            rgb_slab, jnp.asarray(self._luma_q), jnp.asarray(self._chroma_q),
            self._mcu_index, self.segs_per_device, dtype=self._dtype,
            exact=self.config.dtype == "float64")
        return slots, _stack_hists(hists)

    def _build_analyze_step(self):
        mesh = self.mesh
        slot_spec = P(DATA_AXIS, SPACE_AXIS, None, None)

        def device_fn(rgb_local):
            slots, hists = jax.vmap(self._analyze_one)(rgb_local)
            hists = jax.lax.psum(hists, SPACE_AXIS)  # replicated over space
            return slots, hists

        f = jax.shard_map(
            device_fn, mesh=mesh,
            in_specs=(P(DATA_AXIS, SPACE_AXIS, None, None),),
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
            slots, hists = jax.vmap(self._analyze_one)(rgb_local)
            hists = jax.lax.psum(hists, SPACE_AXIS)
            words, totals = jax.vmap(lambda s: pack_interleaved_segments_fn(
                s, luts[0], luts[1], luts[2], luts[3],
                luts[4], luts[5], luts[6], luts[7], max_words=mw))(slots)
            return words, totals, hists

        f = jax.shard_map(
            device_fn, mesh=mesh,
            in_specs=(P(DATA_AXIS, SPACE_AXIS, None, None),),
            out_specs=(P(DATA_AXIS, SPACE_AXIS, None), P(DATA_AXIS, SPACE_AXIS),
                       P(DATA_AXIS, None, None)),
            check_vma=False)
        return jax.jit(f)

    def _build_fused_step_pallas(self):
        """Fixed-table fused step with the Pallas per-device kernels.

        Same shard_map decomposition as the XLA variant, but each device
        runs the fast-path stack (combined-LUT VMEM attach + hierarchical
        bit pack) over its restart-segment slab.  Bytes are identical to
        the XLA engine; histograms are also produced (psum over space) so
        ``step`` has one signature across engines.
        """
        from ..kernels import lut as klut
        from ..kernels import pack as kpack
        from ..pipelines import fast as F

        mesh = self.mesh
        lut = jnp.asarray(klut.build_combined_lut(self._fixed))
        lq, cq = jnp.asarray(self._luma_q), jnp.asarray(self._chroma_q)
        mx, slab_my = self.width // 16, self.slab_h // 16
        spd = self.segs_per_device
        seg_rows = kpack.rows_per_segment(self.mcus_per_segment * 6 * 64)
        interp = jax.default_backend() not in ("tpu",)
        dtype = self._dtype

        def device_fn(rgb_local):  # [B_local, slab_h, W, 3]
            b = rgb_local.shape[0]
            slots = F.analyze_symbols(rgb_local, lq, cq, mx, slab_my, spd,
                                      dtype=dtype)
            idx = slots["idx"].reshape(b * spd, -1)
            value, nbits = klut.attach(lut, idx,
                                       slots["extra"].reshape(b * spd, -1),
                                       slots["extra_n"].reshape(b * spd, -1),
                                       interpret=interp)
            words, totals = kpack.pack_segments(
                value.reshape(b * spd, -1, 64), nbits.reshape(b * spd, -1, 64),
                b * spd, seg_rows, interpret=interp)
            hists = F.hist_1024(slots["idx"].reshape(b, -1))
            ldc, lac, cdc, cac = F.split_hists(hists)
            h4 = jnp.stack([ldc, lac, cdc, cac], axis=1)  # [B_local, 4, 256]
            h4 = jax.lax.psum(h4, SPACE_AXIS)
            return (words.reshape(b, spd, -1), totals.reshape(b, spd), h4)

        f = jax.shard_map(
            device_fn, mesh=mesh,
            in_specs=(P(DATA_AXIS, SPACE_AXIS, None, None),),
            out_specs=(P(DATA_AXIS, SPACE_AXIS, None), P(DATA_AXIS, SPACE_AXIS),
                       P(DATA_AXIS, None, None)),
            check_vma=False)
        return jax.jit(f)

    # -- helpers ---------------------------------------------------------

    @staticmethod
    def _lut_rows(tables):
        dc_l, len_l = _luts(tables["luma_dc"])
        ac_l, alen_l = _luts(tables["luma_ac"])
        dc_c, len_c = _luts(tables["chroma_dc"])
        ac_c, alen_c = _luts(tables["chroma_ac"])
        return [dc_l, len_l, ac_l, alen_l, dc_c, len_c, ac_c, alen_c]

    def _device_put(self, rgbs):
        rgbs = jnp.asarray(rgbs, dtype=jnp.uint8)
        if rgbs.shape[1:] != (self.height, self.width, 3):
            raise ValueError(f"batch shape {rgbs.shape} does not match encoder "
                             f"geometry {self.height}x{self.width}")
        nd = self.mesh.shape[DATA_AXIS]
        if rgbs.shape[0] % nd:
            raise ValueError(f"batch {rgbs.shape[0]} not divisible by data axis {nd}")
        return jax.device_put(rgbs, self._in_shard())

    def _assemble(self, words, totals, tables_per_image):
        words = np.asarray(words)
        totals = np.asarray(totals)
        out = []
        for b in range(words.shape[0]):
            segments = [ops_pack.finish_scan(words[b, s], int(totals[b, s]))
                        for s in range(self.n_segments)]
            interval = self.mcus_per_segment if self.n_segments > 1 else 0
            header = jfif.headers(self.width, self.height, self._luma_q,
                                  self._chroma_q, tables_per_image[b],
                                  restart_interval=interval)
            out.append(jfif.assemble_interleaved(header, segments))
        return out

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
        rgbs = self._device_put(rgbs)
        if self._fixed is not None:
            words, totals, _ = self._fused_step(rgbs)
            tables = [self._fixed] * int(rgbs.shape[0])
            return self._assemble(words, totals, tables)

        slots, hists = self._analyze_step(rgbs)
        hists_np = np.asarray(hists)
        tables = [build_tables_from_histograms(*hists_np[b])
                  for b in range(hists_np.shape[0])]
        luts = jnp.stack([jnp.stack(self._lut_rows(t)) for t in tables])
        words, totals = self._pack_step(slots, luts)
        return self._assemble(words, totals, tables)
