"""Checkify numeric sanitizers (SURVEY §5 quant-path guards)."""
import numpy as np
import pytest

from jpeg_tpu.core.types import EncodeConfig
from jpeg_tpu.pipelines.encode import JpegEncoder
from jpeg_tpu.utils.guards import validate_encode_inputs


def test_valid_input_passes(img64):
    img = np.asarray(img64)
    from jpeg_tpu.core import tables as T
    lq, cq = T.quant_tables()
    for sampling in ("420", "422", "444"):
        validate_encode_inputs(img, lq, cq, sampling=sampling)


def test_zero_quantizer_entry_raises(img64):
    from jpeg_tpu.core import tables as T
    lq, cq = T.quant_tables()
    bad = lq.copy()
    bad[3] = 0
    with pytest.raises(Exception, match="quantizer"):
        validate_encode_inputs(np.asarray(img64), bad, cq)


def test_debug_checks_config_path(img64):
    img = np.asarray(img64)
    cfg = EncodeConfig(debug_checks=True)
    data = JpegEncoder(cfg).encode(img)
    assert data[:2] == b"\xff\xd8"
    # identical bytes with and without the sanitizer pass
    assert data == JpegEncoder(EncodeConfig()).encode(img)


def test_decoder_corruption_never_hangs_or_crashes():
    """Corrupt and truncated streams must either decode (to garbage
    pixels) or raise a Python exception — never hang, segfault (C++
    bit-walk), or loop (device kernel's block loop is bounded by the
    slot counter by construction)."""
    import numpy as np
    from jpeg_tpu.core.types import EncodeConfig
    from jpeg_tpu.pipelines.decode import (_parse_device_eligible,
                                           decode_jpeg)
    from jpeg_tpu.pipelines.encode import JpegEncoder

    img = np.random.default_rng(0).integers(
        0, 256, (64, 64, 3), dtype=np.uint8)
    cfg = EncodeConfig(scan_layout="interleaved",
                       restart_interval_mcu_rows=1)
    data = bytearray(JpegEncoder(cfg).encode(img))
    rng = np.random.default_rng(2)
    for trial in range(8):
        d = bytearray(data)
        for _ in range(int(rng.integers(1, 4))):
            d[int(rng.integers(2, len(d) - 2))] = int(rng.integers(0, 256))
        for engine, kw in (("host", {}), ("device", {"interpret": True})):
            try:
                if engine == "device" and \
                        _parse_device_eligible(bytes(d)) is None:
                    continue
                out = decode_jpeg(bytes(d), entropy_engine=engine, **kw)
                assert out.dtype == np.uint8
            except Exception:
                pass  # clean failure is acceptable; hanging is not
    for cut in (10, 100, len(data) // 2, len(data) - 3):
        try:
            decode_jpeg(bytes(data[:cut]), entropy_engine="host")
        except Exception:
            pass
