"""Engine byte-identity: the Pallas entropy stage must produce exactly the
bytes of the XLA stage (and therefore of the golden/C path in f64 mode)."""
import numpy as np
import pytest

from jpeg_tpu.core.types import EncodeConfig
from jpeg_tpu.pipelines.encode import JpegEncoder


def test_3scan_pallas_engine_bytes_match_xla(img64):
    img = np.asarray(img64)
    a = JpegEncoder(EncodeConfig(engine="xla")).encode(img)
    b = JpegEncoder(EncodeConfig(engine="pallas")).encode(img)
    assert a == b


def test_interleaved_pallas_engine_matches_xla(img_synthetic_160):
    img = np.asarray(img_synthetic_160)[:64, :64]
    base = dict(scan_layout="interleaved", restart_interval_mcu_rows=2)
    a = JpegEncoder(EncodeConfig(engine="xla", **base)).encode(img)
    b = JpegEncoder(EncodeConfig(engine="pallas", **base)).encode(img)
    assert a == b


@pytest.mark.parametrize("sampling", ["420", "422", "444"])
@pytest.mark.parametrize("restarts", [0, 2])
def test_interleaved_engines_all_subsamplings(img_synthetic_160, sampling,
                                              restarts):
    """4:2:2/4:4:4 are first-class in the fast engine: byte-identical to
    the XLA path in plain and restart-segmented interleaved layouts."""
    img = np.asarray(img_synthetic_160)[:64, :64]
    base = dict(scan_layout="interleaved", subsampling=sampling,
                restart_interval_mcu_rows=restarts)
    a = JpegEncoder(EncodeConfig(engine="xla", **base)).encode(img)
    b = JpegEncoder(EncodeConfig(engine="pallas", **base)).encode(img)
    assert a == b


@pytest.mark.parametrize("sampling", ["422", "444"])
def test_interleaved_engines_non420_dynamic(img_synthetic_160, sampling):
    img = np.asarray(img_synthetic_160)[:64, :64]
    base = dict(scan_layout="interleaved", subsampling=sampling,
                huffman="dynamic")
    a = JpegEncoder(EncodeConfig(engine="xla", **base)).encode(img)
    b = JpegEncoder(EncodeConfig(engine="pallas", **base)).encode(img)
    assert a == b


def test_3scan_pallas_engine_odd_chroma_blocks(img_synthetic_160):
    # 160x96 -> chroma blocks per scan = 10*6 = 60 (not a multiple of 128):
    # exercises the padding paths in attach and pack_segments
    img = np.asarray(img_synthetic_160)
    a = JpegEncoder(EncodeConfig(engine="xla")).encode(img)
    b = JpegEncoder(EncodeConfig(engine="pallas")).encode(img)
    assert a == b
