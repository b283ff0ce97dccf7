"""Device decoder vs the float64 host decoder."""
import numpy as np

from jpeg_tpu.core.types import EncodeConfig
from jpeg_tpu.golden import decoder as gdec
from jpeg_tpu.pipelines.decode import decode_jpeg
from jpeg_tpu.pipelines.encode import JpegEncoder


def _roundtrip(img, cfg):
    data = JpegEncoder(cfg).encode(img)
    host = gdec.decode(data)
    dev = decode_jpeg(data)
    assert dev.shape == host.shape and dev.dtype == np.uint8
    # f32 device accumulation vs f64 host: a stray pixel can compound two
    # round() stages (IDCT clip, then upsample+color) into 2 code values
    diff = np.abs(dev.astype(int) - host.astype(int))
    assert diff.max() <= 2 and np.mean(diff <= 1) > 0.999
    assert abs(gdec.psnr(dev, img) - gdec.psnr(host, img)) < 0.05
    return dev


def test_device_decode_3scan(img64):
    _roundtrip(np.asarray(img64), EncodeConfig())


def test_device_decode_interleaved_restarts(img_synthetic_160):
    img = np.asarray(img_synthetic_160)
    cfg = EncodeConfig(scan_layout="interleaved", huffman="fixed",
                       restart_interval_mcu_rows=2)
    _roundtrip(img, cfg)


def test_device_decode_422_444(img64):
    img = np.asarray(img64)
    for samp in ("422", "444"):
        _roundtrip(img, EncodeConfig(subsampling=samp))
        _roundtrip(img, EncodeConfig(subsampling=samp,
                                     scan_layout="interleaved"))


def test_device_decode_gray(img64):
    from jpeg_tpu.pipelines.encode import encode_gray
    gray = np.asarray(img64)[..., 1]
    data = encode_gray(gray)
    host = gdec.decode(data)
    dev = decode_jpeg(data)
    assert dev.shape == host.shape == gray.shape
    assert np.abs(dev.astype(int) - host.astype(int)).max() <= 1


def test_native_entropy_decode_matches_python(img_synthetic_160):
    """The C++ bit-walk must reproduce the Python walk coefficient-exactly
    across layouts, samplings, and restart markers."""
    from jpeg_tpu import native
    import pytest
    if not native.available():
        pytest.skip("native library unavailable")
    img = np.asarray(img_synthetic_160)
    configs = [
        EncodeConfig(),
        EncodeConfig(scan_layout="interleaved"),
        EncodeConfig(scan_layout="interleaved", restart_interval_mcu_rows=2),
        EncodeConfig(subsampling="444"),
        EncodeConfig(subsampling="422", scan_layout="interleaved"),
        EncodeConfig(huffman="fixed", scan_layout="interleaved"),
    ]
    orig = native.decode_scan
    for cfg in configs:
        data = JpegEncoder(cfg).encode(img)
        rec_native = gdec.decode(data)
        try:
            native.decode_scan = lambda *a, **k: None  # force Python walk
            rec_python = gdec.decode(data)
        finally:
            native.decode_scan = orig
        np.testing.assert_array_equal(rec_native, rec_python)
