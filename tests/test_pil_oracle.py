"""Independent decoder oracle: PIL (libjpeg) must decode our output.

The reference's de-facto oracle was "output opens in standard viewers"
(SURVEY §4.6); here it is a CI check across scan layouts and Huffman
modes.
"""
import io

import numpy as np
import pytest

PIL = pytest.importorskip("PIL.Image")

from jpeg_tpu.core.types import EncodeConfig
from jpeg_tpu.golden import decoder as gdec
from jpeg_tpu.pipelines.encode import JpegEncoder


@pytest.mark.parametrize("cfg", [
    EncodeConfig(),
    EncodeConfig(quality=80),
    EncodeConfig(scan_layout="interleaved", huffman="fixed"),
    EncodeConfig(scan_layout="interleaved", restart_interval_mcu_rows=1),
])
def test_pil_decodes_all_layouts(cfg, img64):
    img = np.asarray(img64)
    data = JpegEncoder(cfg).encode(img)
    im = PIL.open(io.BytesIO(data))
    im.load()
    assert im.format == "JPEG" and im.size == (64, 64)
    pil_rgb = np.asarray(im.convert("RGB"))
    ours = gdec.decode(data)
    # two independent decoders of the same bitstream agree closely
    # (IDCT implementations differ legitimately by a few code values)
    assert np.abs(pil_rgb.astype(int) - ours.astype(int)).mean() < 3.0
