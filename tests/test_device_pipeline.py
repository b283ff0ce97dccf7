"""Device (JAX) pipeline tests.

Bit-exact parity: with dtype="float64" the device pipeline must produce the
same bytes as the golden NumPy encoder (which is byte-identical to the C
reference) — this validates the vectorized symbolization and the
prefix-sum parallel packer against the reference's serial walk.

float32 (the TPU configuration) must stay PSNR-equivalent and produce
streams both our decoder and PIL accept.
"""
import numpy as np
import pytest

from jpeg_tpu.core.types import EncodeConfig
from jpeg_tpu.golden import decoder as gdec
from jpeg_tpu.golden import encoder as genc
from jpeg_tpu.pipelines.encode import JpegEncoder


@pytest.mark.parametrize("quality", [None, 75])
def test_exact_mode_matches_golden_3scan(img64, quality):
    enc = JpegEncoder(EncodeConfig(quality=quality, dtype="float64"))
    assert enc.encode(img64) == genc.encode(img64, quality=quality)


def test_exact_mode_matches_golden_interleaved(img64):
    enc = JpegEncoder(EncodeConfig(scan_layout="interleaved", dtype="float64"))
    assert enc.encode(img64) == genc.encode(img64, scan_layout="interleaved")


def test_exact_mode_matches_golden_restart(img640):
    enc = JpegEncoder(EncodeConfig(scan_layout="interleaved",
                                   restart_interval_mcu_rows=8,
                                   dtype="float64"))
    assert enc.encode(img640) == genc.encode(
        img640, scan_layout="interleaved", restart_interval_mcu_rows=8)


def test_exact_mode_matches_golden_fixed_tables(img64):
    enc = JpegEncoder(EncodeConfig(huffman="fixed", dtype="float64"))
    assert enc.encode(img64) == genc.encode(img64, huffman="fixed")


def test_exact_mode_640(img640):
    enc = JpegEncoder(EncodeConfig(dtype="float64"))
    assert enc.encode(img640) == genc.encode(img640)


@pytest.mark.parametrize("layout", ["3scan", "interleaved"])
def test_f32_psnr_parity(img640, layout):
    """The TPU dtype must match the golden encoder's quality."""
    enc = JpegEncoder(EncodeConfig(scan_layout=layout, dtype="float32"))
    data = enc.encode(img640)
    out = gdec.decode(data)
    p_dev = gdec.psnr(img640, out)
    p_gold = gdec.psnr(img640, gdec.decode(genc.encode(img640, scan_layout=layout)))
    assert p_dev >= p_gold - 0.05, (p_dev, p_gold)


def test_f32_pil_valid(img64):
    import io

    from PIL import Image
    data = JpegEncoder(EncodeConfig(dtype="float32")).encode(img64)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert gdec.psnr(img64, pil) > 25.0


def test_batch_encode(img_synthetic_160):
    batch = np.stack([img_synthetic_160,
                      np.roll(img_synthetic_160, 7, axis=1),
                      255 - img_synthetic_160])
    enc = JpegEncoder(EncodeConfig(dtype="float64"))
    outs = enc.encode_batch(batch)
    assert len(outs) == 3
    for i, data in enumerate(outs):
        assert data == genc.encode(np.asarray(batch[i]))


def test_non_mod16_rejected():
    enc = JpegEncoder()
    with pytest.raises(ValueError):
        enc.encode(np.zeros((60, 64, 3), np.uint8))
