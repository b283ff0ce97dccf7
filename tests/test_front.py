"""Pallas analyze-front parity: kernels.front vs the XLA front.

The front kernel must emit bit-identical pixel blocks to analyze_px for
every sampling, and the full fast-path encode through the front must be
byte-identical to the XLA-engine encoder on front-eligible geometry
(W, H multiples of 128 — smaller test images fall back and are covered
by the other suites).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from jpeg_tpu.core.types import EncodeConfig
from jpeg_tpu.kernels import front as kfront
from jpeg_tpu.pipelines.encode import JpegEncoder
from jpeg_tpu.pipelines.fast import FastBatchEncoder, analyze_px

_GEOM = {"420": (16, 16), "422": (16, 8), "444": (8, 8)}


@pytest.fixture(scope="module")
def img128():
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (128, 128, 3)).astype(np.uint8)
    # mix smooth + noise so symbol streams have runs and EOBs
    yy, xx = np.mgrid[0:128, 0:128]
    smooth = ((yy * 2 + xx) % 256).astype(np.uint8)
    base[:, :64, 0] = smooth[:, :64]
    return base


@pytest.mark.parametrize("samp", ["420", "422", "444"])
def test_front_matches_analyze_px(samp, img128):
    B, H, W = 2, 128, 128
    batch = np.stack([img128, img128[::-1].copy()])
    flat = jnp.asarray(batch.reshape(B, H, W * 3))
    xt = kfront.front_analyze(flat, W // 16, H // 16, samp, interpret=True)
    mw, mh = _GEOM[samp]
    px = analyze_px(jnp.asarray(batch), W // mw, H // mh, 1, sampling=samp)
    ref = np.asarray(px).reshape(-1, 64).T
    assert np.array_equal(np.asarray(xt), ref)


@pytest.mark.parametrize("samp", ["420", "422", "444"])
def test_front_engine_bytes(samp, img128):
    """Front-eligible fast path == XLA engine bytes (128x128, fixed)."""
    cfg = EncodeConfig(scan_layout="interleaved", huffman="fixed",
                       subsampling=samp)
    fast = FastBatchEncoder(128, 128, config=cfg, interpret=True)
    assert fast._front_ok  # geometry must actually exercise the front
    got = fast.encode_batch(np.stack([img128]))
    ref = JpegEncoder(EncodeConfig(scan_layout="interleaved",
                                   huffman="fixed", subsampling=samp,
                                   engine="xla")).encode(img128)
    assert bytes(got[0]) == bytes(ref)


def test_front_dynamic_bytes(img128):
    cfg = EncodeConfig(scan_layout="interleaved", huffman="dynamic")
    fast = FastBatchEncoder(128, 128, config=cfg, interpret=True)
    assert fast._front_ok
    got = fast.encode_batch(np.stack([img128, img128[:, ::-1].copy()]))
    ref = JpegEncoder(EncodeConfig(scan_layout="interleaved",
                                   huffman="dynamic", engine="xla"))
    assert bytes(got[0]) == bytes(ref.encode(img128))
    assert bytes(got[1]) == bytes(ref.encode(img128[:, ::-1]))


@pytest.mark.parametrize("h,w", [(192, 128), (128, 1152), (320, 1152)])
def test_front_padded_and_strips(h, w, img128):
    """Heights that need slab padding and widths that need 1024-px strip
    processing must still match the XLA engine byte-for-byte."""
    rng = np.random.default_rng(h + w)
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    img[:64, :64] = img128[:64, :64]
    cfg = EncodeConfig(scan_layout="interleaved", huffman="fixed")
    fast = FastBatchEncoder(h, w, config=cfg, interpret=True)
    assert fast._front_ok
    got = fast.encode_batch(np.stack([img]))
    ref = JpegEncoder(EncodeConfig(scan_layout="interleaved",
                                   huffman="fixed", engine="xla")).encode(img)
    assert bytes(got[0]) == bytes(ref)


@pytest.mark.parametrize("samp,h,w", [
    ("420", 128, 96),    # sc = 288 -> padded 384, 3 chunks of 128
    ("420", 192, 160),   # slab-padded height + phantom columns
    ("422", 128, 80),    # sc = 320 -> padded 384
    ("444", 128, 48),    # sc = 288 -> padded 384
    ("420", 128, 1104),  # strips with a partial remainder strip
])
def test_front_unaligned_width(samp, h, w, img128):
    """Widths that aren't 128 multiples ride the mega kernels through
    phantom-padded slab columns and must match the XLA engine bytes."""
    rng = np.random.default_rng(w)
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    img[:64, :32] = img128[:64, :32]
    cfg = EncodeConfig(scan_layout="interleaved", huffman="fixed",
                       subsampling=samp)
    fast = FastBatchEncoder(h, w, config=cfg, interpret=True)
    assert fast._front_ok
    got = fast.encode_batch(np.stack([img]))
    ref = JpegEncoder(EncodeConfig(scan_layout="interleaved",
                                   huffman="fixed", subsampling=samp,
                                   engine="xla")).encode(img)
    assert bytes(got[0]) == bytes(ref)


def test_front_unaligned_width_dynamic(img128):
    """Dynamic mode over phantom-padded slabs: NULL bins from phantom
    blocks must not perturb the per-image histograms or tables."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (128, 96, 3)).astype(np.uint8)
    img[:64, :32] = img128[:64, :32]
    cfg = EncodeConfig(scan_layout="interleaved", huffman="dynamic")
    fast = FastBatchEncoder(128, 96, config=cfg, interpret=True)
    assert fast._front_ok
    got = fast.encode_batch(np.stack([img, img[:, ::-1].copy()]))
    ref = JpegEncoder(EncodeConfig(scan_layout="interleaved",
                                   huffman="dynamic", engine="xla"))
    assert bytes(got[0]) == bytes(ref.encode(img))
    assert bytes(got[1]) == bytes(ref.encode(img[:, ::-1]))


def test_front_unaligned_multisegment(img128):
    """Phantom-padded slabs + restart segments: DC chains must reset per
    segment and skip phantom lanes at every slab boundary."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (256, 96, 3)).astype(np.uint8)
    cfg = EncodeConfig(scan_layout="interleaved", huffman="fixed",
                       restart_interval_mcu_rows=8)
    fast = FastBatchEncoder(256, 96, config=cfg, segs_per_image=2,
                            interpret=True)
    assert fast._front_ok and fast.n_segs == 2
    got = fast.encode_batch(np.stack([img]))
    ref = JpegEncoder(EncodeConfig(scan_layout="interleaved",
                                   huffman="fixed",
                                   restart_interval_mcu_rows=8,
                                   engine="xla")).encode(img)
    assert bytes(got[0]) == bytes(ref)


def test_front_two_phase_over_budget(img128, monkeypatch):
    """Segments exceeding the VMEM residency budget must keep the Pallas
    front and produce identical bytes through the two-phase entropy
    kernels."""
    from jpeg_tpu.kernels import fused as kfused
    monkeypatch.setattr(kfused, "_RESIDENT_VMEM_BUDGET", 1024)
    cfg = EncodeConfig(scan_layout="interleaved", huffman="fixed")
    fast = FastBatchEncoder(192, 128, config=cfg, interpret=True)
    assert fast._front_geom_ok and not fast._front_ok
    img = np.concatenate([img128, img128[:64]], axis=0)
    got = fast.encode_batch(np.stack([img]))
    ref = JpegEncoder(EncodeConfig(scan_layout="interleaved",
                                   huffman="fixed", engine="xla")).encode(img)
    assert bytes(got[0]) == bytes(ref)


@pytest.mark.parametrize("huff", ["fixed", "dynamic"])
def test_front_multisegment(huff, img128):
    """Restart segments on slab boundaries ride the mega kernels and
    must match the XLA engine (DRI/RSTn markers included)."""
    h = 256  # 2 slabs -> 2 segments of 8 MCU rows each
    img = np.concatenate([img128, img128[::-1]], axis=0)
    cfg = EncodeConfig(scan_layout="interleaved", huffman=huff,
                       restart_interval_mcu_rows=8)
    fast = FastBatchEncoder(h, 128, config=cfg, segs_per_image=2,
                            interpret=True)
    assert fast._front_ok and fast.n_segs == 2
    got = fast.encode_batch(np.stack([img]))
    ref = JpegEncoder(EncodeConfig(scan_layout="interleaved", huffman=huff,
                                   restart_interval_mcu_rows=8,
                                   engine="xla")).encode(img)
    assert bytes(got[0]) == bytes(ref)


@pytest.mark.parametrize("samp,quality,n_segs", [
    ("420", None, 1),
    ("420", 100, 1),   # >480-bit blocks: in-kernel worst-case fallback
    ("422", None, 1),
    ("444", None, 1),
    ("420", None, 2),  # multi-segment: carry resets per segment
])
def test_place_impl_w16_byte_identical(samp, quality, n_segs):
    """The 16-row local-pack place variant (place_impl='w16') emits the
    same bytes as the full path across samplings, quality extremes
    (fallback cond), and multi-segment streams."""
    import jax.numpy as jnp
    from jpeg_tpu.core.types import EncodeConfig
    from jpeg_tpu.kernels import front as kfront
    from jpeg_tpu.pipelines.fast import FastBatchEncoder
    H, W = 256, 128
    enc = FastBatchEncoder(
        H, W, config=EncodeConfig(scan_layout="interleaved",
                                  huffman="fixed", quality=quality,
                                  subsampling=samp),
        segs_per_image=n_segs, interpret=True)
    rng = np.random.default_rng(7)
    b = jnp.asarray(rng.integers(0, 256, (2, H, W * 3), dtype=np.uint8))
    args = (b, enc._fixed_lut, enc._dct_m, enc._dct_bias, enc._ql_zz,
            enc._qc_zz, W // 16, H // 16, samp, enc.seg_rows)
    a1, t1 = kfront.front_place(*args, interpret=True, n_segs=n_segs)
    a2, t2 = kfront.front_place(*args, interpret=True, n_segs=n_segs,
                                place_impl="w16")
    assert np.array_equal(np.asarray(a1), np.asarray(a2))
    assert np.array_equal(np.asarray(t1), np.asarray(t2))
