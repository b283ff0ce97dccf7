"""Arbitrary-size encoding: edge-replicated MCU padding, true SOF dims."""
import io

import numpy as np
import pytest

from jpeg_tpu.core.types import EncodeConfig
from jpeg_tpu.golden import decoder as gdec
from jpeg_tpu.io.editimage import pad_replicate
from jpeg_tpu.pipelines.decode import decode_jpeg as device_decode
from jpeg_tpu.pipelines.encode import JpegEncoder


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((yy // 8 + xx // 8) % 2) * 120 + 60
    img = np.stack([base, 255 - base, (xx * 255 // max(w - 1, 1))], axis=-1)
    return np.clip(img + rng.integers(-10, 11, size=img.shape), 0, 255).astype(np.uint8)


def test_pad_replicate_edges():
    img = _img(17, 33)
    p = pad_replicate(img)
    assert p.shape == (32, 48, 3)
    np.testing.assert_array_equal(p[16:, :33], np.broadcast_to(p[16:17, :33], (16, 33, 3)))
    np.testing.assert_array_equal(p[:17, 33:], np.broadcast_to(p[:17, 33:34], (17, 15, 3)))


@pytest.mark.parametrize("h,w", [(17, 33), (100, 60), (64, 50)])
def test_encode_any_roundtrip(h, w):
    img = _img(h, w, seed=h * w)
    data = JpegEncoder(EncodeConfig()).encode_any(img)
    rec = gdec.decode(data)
    assert rec.shape == (h, w, 3)
    assert gdec.psnr(rec, img) > 18.0
    dev = device_decode(data)
    assert dev.shape == (h, w, 3)
    assert np.abs(dev.astype(int) - rec.astype(int)).max() <= 1


def test_encode_any_pil_oracle():
    PIL = pytest.importorskip("PIL.Image")
    img = _img(50, 70)
    data = JpegEncoder(EncodeConfig(scan_layout="interleaved")).encode_any(img)
    im = PIL.open(io.BytesIO(data))
    im.load()
    assert im.size == (70, 50)
    pil = np.asarray(im.convert("RGB"))
    ours = gdec.decode(data)
    # both decoders reconstruct the source equally well (they differ in
    # chroma upsampling: libjpeg "fancy" vs our nearest-neighbor)
    assert abs(gdec.psnr(pil, img) - gdec.psnr(ours, img)) < 2.0


def test_encode_any_multiple_of_16_is_plain_encode(img64):
    img = np.asarray(img64)
    enc = JpegEncoder(EncodeConfig())
    assert enc.encode_any(img) == enc.encode(img)


def test_encode_any_3scan_config_is_pil_decodable():
    """Regression: a padded non-interleaved scan violates T.81 A.2.2 (block
    count per scan must be ceil(comp_dim/8), not the MCU-padded count), so
    encode_any must switch to the interleaved layout when padding.  A 40x40
    image through the default (3scan) config previously decoded to garbage
    in libjpeg (12 dB) while our own decoder hid the bug."""
    PIL = pytest.importorskip("PIL.Image")
    img = _img(40, 40, seed=11)
    data = JpegEncoder(EncodeConfig()).encode_any(img)  # default 3scan cfg
    im = PIL.open(io.BytesIO(data))
    im.load()
    assert im.size == (40, 40)
    pil = np.asarray(im.convert("RGB"))
    ours = gdec.decode(data)
    # content-limited PSNR; the point is both decoders agree (pre-fix,
    # libjpeg read ~8 dB below our decoder on padded 3-scan streams)
    assert gdec.psnr(pil, img) > 18.0
    assert abs(gdec.psnr(pil, img) - gdec.psnr(ours, img)) < 2.0
