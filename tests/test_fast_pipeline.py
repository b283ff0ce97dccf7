"""Pallas fast path: kernel numerics + byte-identity with the XLA engine.

Kernels run in interpreter mode on CPU (the TPU-compiled versions are
verified byte-identical on hardware; interpret mode checks the same
program logic in CI).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from jpeg_tpu.core.types import EncodeConfig
from jpeg_tpu.huffman.build import fixed_tables
from jpeg_tpu.kernels import lut as klut
from jpeg_tpu.kernels import pack as kpack
from jpeg_tpu.ops import pack as ops_pack
from jpeg_tpu.pipelines.encode import JpegEncoder
from jpeg_tpu.pipelines.fast import FastBatchEncoder


def _random_slots(rng, S, nblk):
    nbits = rng.integers(0, 12, size=(S, nblk, 64)).astype(np.int32)
    nbits[..., 0] = rng.integers(2, 14, size=(S, nblk))
    nbits = np.where(rng.random((S, nblk, 64)) < 0.6, 0, nbits)
    value = np.where(
        nbits > 0,
        rng.integers(0, 1 << 28, size=(S, nblk, 64)) & ((1 << np.maximum(nbits, 1)) - 1),
        0).astype(np.uint32)
    return value, nbits


def test_pack_segments_matches_reference_packer():
    rng = np.random.default_rng(0)
    S, nblk = 2, 64
    value, nbits = _random_slots(rng, S, nblk)
    seg_rows = kpack.rows_per_segment(nblk * 64)
    w, tb = kpack.pack_segments(jnp.asarray(value), jnp.asarray(nbits),
                                S, seg_rows, interpret=True)
    w, tb = np.asarray(w), np.asarray(tb)
    for s in range(S):
        ref_w, ref_t = ops_pack.pack_fields(
            jnp.asarray(value[s].reshape(-1).view(np.int32)),
            jnp.asarray(nbits[s].reshape(-1)))
        ref_w, ref_t = np.asarray(ref_w), int(ref_t)
        nw = (ref_t + 31) // 32
        assert int(tb[s]) == ref_t
        np.testing.assert_array_equal(w[s][:nw], ref_w[:nw])


def test_attach_kernel_matches_lut():
    rng = np.random.default_rng(1)
    tabs = fixed_tables()
    lut_np = klut.build_combined_lut(tabs)
    n = 8 * 128
    sym = rng.integers(0, 256, size=n).astype(np.int32)
    is_dc = rng.integers(0, 2, size=n).astype(bool)
    sym = np.where(is_dc, sym % 12, sym)
    is_luma = rng.integers(0, 2, size=n).astype(bool)
    valid = rng.integers(0, 2, size=n).astype(bool)
    extra_n = np.where(valid, rng.integers(0, 11, size=n), 0).astype(np.int32)
    extra = np.where(valid, rng.integers(0, 1 << 10, size=n)
                     & ((1 << np.maximum(extra_n, 1)) - 1), 0).astype(np.int32)

    idx = klut.slot_index(jnp.asarray(sym), jnp.asarray(valid),
                          jnp.asarray(is_dc), jnp.asarray(is_luma))
    v, nb = klut.attach(jnp.asarray(lut_np), idx, jnp.asarray(extra),
                        jnp.asarray(extra_n), interpret=True)
    e = lut_np[np.asarray(idx)]
    np.testing.assert_array_equal(
        np.asarray(v), np.where(valid, ((e & 0xFFFF) << extra_n) | extra, 0))
    np.testing.assert_array_equal(
        np.asarray(nb), np.where(valid, (e >> 16) + extra_n, 0))


@pytest.mark.parametrize("huff", ["fixed", "dynamic"])
def test_fast_pipeline_bytes_match_xla_engine(huff, img_synthetic_160):
    img = np.asarray(img_synthetic_160)[:64, :64]
    batch = np.stack([img, np.roll(img, 8, axis=1)])
    cfg = EncodeConfig(scan_layout="interleaved", huffman=huff,
                       restart_interval_mcu_rows=2)
    fast = FastBatchEncoder(64, 64, config=cfg, segs_per_image=2,
                            interpret=True)
    ref = JpegEncoder(cfg)
    got = fast.encode_batch(batch)
    exp = [ref.encode(batch[i]) for i in range(2)]
    assert [bytes(g) for g in got] == exp


def test_restart_config_without_explicit_segs(img_synthetic_160):
    """A config-requested DRI/RSTn layout must be honored by default.

    Regression: FastBatchEncoder(config=...restart_interval_mcu_rows=2)
    without segs_per_image used to silently emit a single-segment stream
    (no DRI, no RSTn) — found by bench/tpu_drive.py on real hardware."""
    img = np.asarray(img_synthetic_160)[:64, :64]
    cfg = EncodeConfig(scan_layout="interleaved", huffman="fixed",
                       restart_interval_mcu_rows=2)
    fast = FastBatchEncoder(64, 64, config=cfg, interpret=True)
    assert fast.n_segs == 2
    got = bytes(fast.encode_batch(img[None])[0])
    assert got == bytes(JpegEncoder(cfg).encode(img))
    assert b"\xff\xdd" in got and b"\xff\xd0" in got  # DRI + RST0
    with pytest.raises(ValueError, match="must divide"):
        FastBatchEncoder(64, 64, config=EncodeConfig(
            scan_layout="interleaved", huffman="fixed",
            restart_interval_mcu_rows=3))


@pytest.mark.parametrize("huff", ["fixed", "dynamic"])
def test_encode_stream_matches_encode_batch(huff, img_synthetic_160):
    """The pipelined multi-batch API must produce exactly encode_batch's
    bytes, batch for batch."""
    img = np.asarray(img_synthetic_160)[:64, :64]
    batches = [np.stack([np.roll(img, 4 * i + j, axis=1) for j in range(2)])
               for i in range(3)]
    cfg = EncodeConfig(scan_layout="interleaved", huffman=huff)
    fast = FastBatchEncoder(64, 64, config=cfg, interpret=True)
    streamed = list(fast.encode_stream(iter(batches)))
    direct = [fast.encode_batch(b) for b in batches]
    assert [[bytes(x) for x in ys] for ys in streamed] == \
        [[bytes(x) for x in ys] for ys in direct]
    # grouped-fetch pipeline (fixed: grouped device steps; dynamic:
    # super-batched histogram sync + grouped output fetch) must not
    # change bytes or order, including a partial tail group (5 batches,
    # depth 2) and content that grows past the caps prediction (the
    # heavy random batch forces the salvage refetch)
    heavy = np.stack([
        np.random.default_rng(3).integers(0, 256, img.shape, np.uint8),
        img])
    more = batches + [np.stack([img, np.roll(img, 9, axis=0)]), heavy]
    streamed2 = list(fast.encode_stream(iter(more), sync_depth=2))
    direct2 = [fast.encode_batch(b) for b in more]
    assert [[bytes(x) for x in ys] for ys in streamed2] == \
        [[bytes(x) for x in ys] for ys in direct2]


def test_stream_depth_budget():
    """The grouped-fetch pipeline scales its group size down so that
    in-flight buffers stay under the device-memory budget (large
    geometries must not OOM where the old two-deep pipeline worked)."""
    enc = FastBatchEncoder(64, 64, config=EncodeConfig(
        scan_layout="interleaved", huffman="fixed"), interpret=True)
    B = enc._STREAM_BUDGET_BYTES
    assert enc._stream_depth(1 << 20, 4) == 4      # small buffers: full
    assert enc._stream_depth(1 << 31, 4) == 1      # huge buffers: solo
    # residency model: (2*depth+1)*per_batch + depth*inputs <= budget
    assert enc._stream_depth(B // 8, 4) == 3       # (2*3+1)/8 <= 1 < 9/8
    assert enc._stream_depth(B // 2, 4) == 1       # 3/2 > 1: solo
    assert enc._stream_depth(B // 16, 4,
                             input_bytes=B // 2) == 1  # inputs count too
    assert enc._stream_depth(123, 0) == 1          # depth floor


def test_hist_1024_matches_bincount():
    """hist_1024_t (MXU one-hot dot, adaptive chunking) vs a NumPy
    bincount oracle — both the single-chunk fast path and the scan
    fallback (forced by shrinking the chunk cap)."""
    from jpeg_tpu.kernels import lut as klut
    from jpeg_tpu.pipelines import fast as F

    rng = np.random.default_rng(7)
    B, r, n = 3, 64, 640  # r*n = 40960 slots/image
    idx = np.where(rng.random((r, B * n)) < 0.3,
                   rng.integers(0, 1023, (r, B * n)),
                   klut.NULL_INDEX).astype(np.int32)
    want = np.stack([
        np.bincount(idx.reshape(r, B, n)[:, b, :].ravel(), minlength=1024)
        for b in range(B)])

    got = np.asarray(F.hist_1024_t(jnp.asarray(idx), B))
    np.testing.assert_array_equal(got, want)

    # scan fallback: r*n > the 1<<20 cap forces multi-chunk (pads land
    # in the NULL bin, which split_hists drops in production)
    B2, n2 = 1, 20000  # 64 * 20000 = 1.28M slots > 1<<20
    idx2 = np.where(rng.random((r, B2 * n2)) < 0.05,
                    rng.integers(0, 1023, (r, B2 * n2)),
                    klut.NULL_INDEX).astype(np.int32)
    want2 = np.bincount(idx2.ravel(), minlength=1024)[None]
    got2 = np.asarray(F.hist_1024_t(jnp.asarray(idx2), B2))
    np.testing.assert_array_equal(got2[:, :1023], want2[:, :1023])


def test_dynamic_sampled_mode():
    """huffman='dynamic-sampled': per-image K.2 tables from a 1/5-sampled
    +1-smoothed histogram.  Decoded pixels must be IDENTICAL to exact
    dynamic mode (same quantization), every emitted symbol must have a
    code (the smoothing guarantee), and the size cost must be small."""
    from jpeg_tpu.golden import decoder as gdec

    rng = np.random.default_rng(17)
    yy, xx = np.mgrid[0:128, 0:128]
    base = ((yy // 16 + xx // 16) % 2) * 160 + 40
    img = np.clip(np.stack([base, 255 - base, xx % 256], axis=-1)
                  + rng.integers(-25, 26, (128, 128, 3)),
                  0, 255).astype(np.uint8)
    batch = np.stack([img, img[:, ::-1]])
    cfg_s = EncodeConfig(scan_layout="interleaved",
                         huffman="dynamic-sampled")
    cfg_d = EncodeConfig(scan_layout="interleaved", huffman="dynamic")
    got_s = FastBatchEncoder(128, 128, config=cfg_s,
                             interpret=True).encode_batch(batch)
    got_d = FastBatchEncoder(128, 128, config=cfg_d,
                             interpret=True).encode_batch(batch)
    for ds, dd, im in zip(got_s, got_d, batch):
        ps = gdec.decode(bytes(ds))
        pd = gdec.decode(bytes(dd))
        assert np.array_equal(ps, pd)  # same quantization -> same pixels
        # near-optimal tables: the extra cost is the +1-floored DHT
        # (bounded ~450 B of extra symbol codes) plus ~2% of entropy
        assert len(ds) <= len(dd) * 1.03 + 600


def test_dynamic_sampled_rejects_f64():
    with pytest.raises(ValueError, match="dynamic-sampled"):
        FastBatchEncoder(64, 64, config=EncodeConfig(
            scan_layout="interleaved", huffman="dynamic-sampled",
            dtype="float64"), interpret=True)
