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
