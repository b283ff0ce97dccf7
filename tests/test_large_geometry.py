"""1920x1280 geometry (SURVEY §8.2 phase 3).

The reference's large fixture is absent from its snapshot
(/root/reference/.MISSING_LARGE_BLOBS lists images/sample_1920x1280.ppm);
we synthesize it by tiling the 640x640 fixture, as SURVEY §6 prescribes.
"""
import numpy as np
import pytest

from jpeg_tpu.core.types import EncodeConfig
from jpeg_tpu.golden import decoder as gdec
from jpeg_tpu.pipelines.encode import JpegEncoder


@pytest.fixture(scope="module")
def img1920(img640):
    base = np.asarray(img640)
    return np.tile(base, (2, 3, 1))[:1280, :1920]


def test_encode_1920x1280_with_restarts(img1920):
    assert img1920.shape == (1280, 1920, 3)
    cfg = EncodeConfig(scan_layout="interleaved", huffman="fixed",
                       restart_interval_mcu_rows=16, engine="xla")
    data = JpegEncoder(cfg).encode(img1920)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert b"\xff\xdd" in data[:1000]  # DRI present
    rec = gdec.decode(data)
    assert rec.shape == (1280, 1920, 3)
    # same content as the 640 fixture -> same PSNR regime (~25 dB)
    assert gdec.psnr(rec, img1920) > 24.0
