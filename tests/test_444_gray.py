"""4:4:4 subsampling and grayscale — capabilities beyond the reference."""
import io

import numpy as np
import pytest

from jpeg_tpu.core.types import EncodeConfig
from jpeg_tpu.golden import decoder as gdec
from jpeg_tpu.pipelines.encode import JpegEncoder, encode_gray


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((yy // 16 + xx // 16) % 2) * 140 + 50
    img = np.stack([base, 255 - base, xx * 255 // max(w - 1, 1)], axis=-1)
    return np.clip(img + rng.integers(-10, 11, size=img.shape), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("layout", ["3scan", "interleaved"])
def test_444_roundtrip_beats_420_on_chroma_detail(layout):
    img = _img(64, 64)
    # sharp chroma edge content where 4:2:0 visibly loses
    img[:, ::2, 0] = 255
    img[:, 1::2, 0] = 0
    cfg444 = EncodeConfig(scan_layout=layout, subsampling="444")
    cfg420 = EncodeConfig(scan_layout=layout, subsampling="420")
    d444 = JpegEncoder(cfg444).encode(img)
    d420 = JpegEncoder(cfg420).encode(img)
    r444 = gdec.decode(d444)
    r420 = gdec.decode(d420)
    assert r444.shape == r420.shape == img.shape
    assert gdec.psnr(r444, img) > gdec.psnr(r420, img) + 3.0


def test_444_interleaved_restarts_pil():
    PIL = pytest.importorskip("PIL.Image")
    img = _img(48, 64, seed=1)
    cfg = EncodeConfig(scan_layout="interleaved", subsampling="444",
                       restart_interval_mcu_rows=2)
    data = JpegEncoder(cfg).encode(img)
    assert b"\xff\xdd" in data and b"\xff\xd0" in data
    im = PIL.open(io.BytesIO(data))
    im.load()
    assert im.size == (64, 48)
    ours = gdec.decode(data)
    assert abs(gdec.psnr(np.asarray(im.convert("RGB")), img)
               - gdec.psnr(ours, img)) < 2.0


def test_444_allows_mod8_dims():
    img = _img(24, 40, seed=2)  # not multiples of 16
    data = JpegEncoder(EncodeConfig(subsampling="444")).encode(img)
    assert gdec.decode(data).shape == (24, 40, 3)


def test_gray_roundtrip_and_pil():
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(3)
    plane = np.clip(rng.integers(0, 256, size=(50, 70)), 0, 255).astype(np.uint8)
    plane[10:30, 20:40] = 200  # some structure
    data = encode_gray(plane)
    rec = gdec.decode(data)
    assert rec.shape == (50, 70) and rec.dtype == np.uint8
    im = PIL.open(io.BytesIO(data))
    im.load()
    assert im.mode == "L" and im.size == (70, 50)
    pil = np.asarray(im)
    assert np.abs(pil.astype(int) - rec.astype(int)).mean() < 2.0


def test_gray_fixed_tables():
    plane = np.linspace(0, 255, 64 * 64).reshape(64, 64).astype(np.uint8)
    data = encode_gray(plane, EncodeConfig(huffman="fixed"))
    rec = gdec.decode(data)
    assert gdec.psnr(rec, plane) > 30.0


def test_device_decode_falls_back_for_444_and_gray():
    from jpeg_tpu.pipelines.decode import decode_jpeg as ddec
    img = _img(32, 32, seed=5)
    d444 = JpegEncoder(EncodeConfig(subsampling="444")).encode(img)
    np.testing.assert_array_equal(ddec(d444), gdec.decode(d444))
    g = encode_gray(img[..., 1].copy())
    np.testing.assert_array_equal(ddec(g), gdec.decode(g))


@pytest.mark.parametrize("layout", ["3scan", "interleaved"])
def test_422_roundtrip(layout):
    img = _img(48, 64, seed=7)
    cfg = EncodeConfig(scan_layout=layout, subsampling="422")
    data = JpegEncoder(cfg).encode(img)
    rec = gdec.decode(data)
    assert rec.shape == img.shape
    assert gdec.psnr(rec, img) > 22.0


def test_422_interleaved_restarts_pil():
    PIL = pytest.importorskip("PIL.Image")
    img = _img(48, 64, seed=8)
    cfg = EncodeConfig(scan_layout="interleaved", subsampling="422",
                       restart_interval_mcu_rows=2, huffman="fixed")
    data = JpegEncoder(cfg).encode(img)
    im = PIL.open(io.BytesIO(data))
    im.load()
    assert im.size == (64, 48)
    pil_422 = gdec.psnr(np.asarray(im.convert("RGB")), img)
    # an independent decoder sees >= 4:2:0 quality from the 4:2:2 stream
    # (upsampling filters differ between decoders, so compare PIL-to-PIL)
    d420 = JpegEncoder(EncodeConfig(scan_layout="interleaved",
                                    huffman="fixed")).encode(img)
    pil_420 = gdec.psnr(np.asarray(PIL.open(io.BytesIO(d420)).convert("RGB")), img)
    assert pil_422 >= pil_420 - 0.1


def test_422_chroma_fidelity_between_420_and_444():
    img = _img(64, 64, seed=9)
    img[:, ::2, 0] = 255
    img[:, 1::2, 0] = 0
    res = {}
    for s in ("420", "422", "444"):
        d = JpegEncoder(EncodeConfig(subsampling=s)).encode(img)
        res[s] = gdec.psnr(gdec.decode(d), img)
    assert res["420"] <= res["422"] <= res["444"]


def test_3scan_restart_markers():
    """Non-interleaved scans with per-scan DRI/RSTn (beyond the reference)."""
    PIL = pytest.importorskip("PIL.Image")
    img = _img(64, 64, seed=12)
    cfg = EncodeConfig(scan_layout="3scan", restart_interval_mcu_rows=2)
    data = JpegEncoder(cfg).encode(img)
    assert data.count(b"\xff\xdd") == 3  # one DRI per scan
    assert b"\xff\xd0" in data
    rec = gdec.decode(data)
    # identical pixels to the restart-free 3-scan stream (same coefficients)
    plain = gdec.decode(JpegEncoder(EncodeConfig()).encode(img))
    np.testing.assert_array_equal(rec, plain)
    im = PIL.open(io.BytesIO(data))
    im.load()
    assert im.size == (64, 64)
    assert abs(gdec.psnr(np.asarray(im.convert("RGB")), img)
               - gdec.psnr(rec, img)) < 2.0
