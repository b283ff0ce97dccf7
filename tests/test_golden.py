"""Golden encoder/decoder tests: validity, round-trip PSNR, PIL cross-oracle.

Mirrors the reference's test strategy (SURVEY §4): stage-level checks plus
external-decoder validation of the produced bitstream.
"""
import io

import numpy as np
import pytest

from jpeg_tpu.golden import decoder as gdec
from jpeg_tpu.golden import encoder as genc


def _pil_decode(data: bytes):
    try:
        from PIL import Image
    except ImportError:  # pragma: no cover
        pytest.skip("PIL not available")
    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


@pytest.mark.parametrize("quality", [None, 50, 75, 90])
def test_golden_roundtrip_3scan(img64, quality):
    data = genc.encode(img64, quality=quality)
    out = gdec.decode(data)
    assert out.shape == img64.shape
    p = gdec.psnr(img64, out)
    assert p > 25.0, f"PSNR too low: {p}"


@pytest.mark.parametrize("quality", [None, 75])
def test_golden_pil_cross_oracle(img64, quality):
    """Our decoder and PIL (libjpeg) must agree the stream is valid and
    produce (nearly) the same pixels."""
    data = genc.encode(img64, quality=quality)
    ours = gdec.decode(data)
    pil = _pil_decode(data)
    assert pil.shape == ours.shape
    # libjpeg uses fancy (triangle) chroma upsampling vs our nearest-neighbor,
    # so pixels differ near chroma edges; both must reconstruct the source
    # equally well and agree closely overall.
    p_ours = gdec.psnr(img64, ours)
    p_pil = gdec.psnr(img64, pil)
    assert abs(p_ours - p_pil) < 1.5, (p_ours, p_pil)
    assert gdec.psnr(ours, pil) > 30.0


def test_golden_interleaved_roundtrip(img64):
    data = genc.encode(img64, scan_layout="interleaved")
    out = gdec.decode(data)
    assert gdec.psnr(img64, out) > 25.0
    pil = _pil_decode(data)
    assert gdec.psnr(out, pil) > 30.0


def test_golden_interleaved_restart_markers(img640):
    """Restart segments: bitstream contains DRI + RSTn and decodes to the
    same pixels as the unsegmented interleaved stream."""
    plain = genc.encode(img640, scan_layout="interleaved")
    seg = genc.encode(img640, scan_layout="interleaved", restart_interval_mcu_rows=8)
    assert b"\xff\xdd" in seg and b"\xff\xd0" in seg
    a = gdec.decode(plain)
    b = gdec.decode(seg)
    assert np.array_equal(a, b)
    pil = _pil_decode(seg)
    assert gdec.psnr(b, pil) > 30.0


def test_golden_fixed_tables(img64):
    data = genc.encode(img64, huffman="fixed")
    out = gdec.decode(data)
    assert gdec.psnr(img64, out) > 25.0
    pil = _pil_decode(data)
    assert gdec.psnr(out, pil) > 30.0


def test_3scan_and_interleaved_same_pixels(img64):
    """Scan layout changes the container, not the coefficients."""
    a = gdec.decode(genc.encode(img64, scan_layout="3scan"))
    b = gdec.decode(genc.encode(img64, scan_layout="interleaved"))
    assert np.array_equal(a, b)


def test_dims_not_multiple_of_16_rejected():
    img = np.zeros((60, 64, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        genc.encode(img)


def test_stage_shapes(img64):
    stages = genc.encode_stages(img64)
    assert stages["y"].shape == (64, 64)
    assert stages["cb"].shape == (32, 32)
    assert stages["y_zigzag"].shape == (64, 64)  # 64 blocks x 64 coefs
    assert stages["cb_zigzag"].shape == (16, 64)
    # DC differencing telescopes back to the original DCs
    assert np.array_equal(np.cumsum(stages["y_diff"][:, 0]), stages["y_zigzag"][:, 0])


def test_decoder_rejects_corrupt_streams(img64):
    """Malformed inputs raise ValueError cleanly (no crashes/hangs)."""
    import pytest
    from jpeg_tpu.golden import decoder as gdec
    from jpeg_tpu.pipelines.encode import JpegEncoder
    data = JpegEncoder().encode(__import__("numpy").asarray(img64))
    for bad in (b"", b"\x00\x01", data[2:], data[:20]):
        with pytest.raises((ValueError, IndexError)):
            gdec.decode(bad)
    # truncated mid-scan: the bit reader runs out of data
    with pytest.raises((ValueError, IndexError)):
        gdec.decode(data[:len(data) - 60])
    # unknown markers are skipped per spec — this still decodes
    mut = bytearray(data)
    mut[3] = 0x99  # APP0 -> unknown (but well-formed) marker
    assert gdec.decode(bytes(mut)).shape == (64, 64, 3)
