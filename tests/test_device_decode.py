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
    # f32 device accumulation vs f64 host: at most one code value apart
    assert np.abs(dev.astype(int) - host.astype(int)).max() <= 1
    assert abs(gdec.psnr(dev, img) - gdec.psnr(host, img)) < 0.05
    return dev


def test_device_decode_3scan(img64):
    _roundtrip(np.asarray(img64), EncodeConfig())


def test_device_decode_interleaved_restarts(img_synthetic_160):
    img = np.asarray(img_synthetic_160)
    cfg = EncodeConfig(scan_layout="interleaved", huffman="fixed",
                       restart_interval_mcu_rows=2)
    _roundtrip(img, cfg)
