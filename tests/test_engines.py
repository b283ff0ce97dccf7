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


@pytest.mark.parametrize("unroll", [(2, 1), (4, 2)])
def test_place_unroll_parity(img_synthetic_160, unroll, monkeypatch):
    """The place-tail fori unroll factors are pure performance knobs:
    any (_PACK_UNROLL, _ROWACC_UNROLL) must produce byte-identical
    streams (bench/unroll_profile.py A/Bs them on hardware)."""
    from jpeg_tpu.kernels import front as kfront
    from jpeg_tpu.kernels import fused as kf

    img = np.asarray(img_synthetic_160)[:128, :64]
    base = dict(scan_layout="interleaved", restart_interval_mcu_rows=4)
    a = JpegEncoder(EncodeConfig(engine="pallas", **base)).encode(img)
    monkeypatch.setattr(kf, "_PACK_UNROLL", unroll[0])
    monkeypatch.setattr(kf, "_ROWACC_UNROLL", unroll[1])
    kfront.front_place.clear_cache()
    kf.dct_attach_pack_xt.clear_cache()
    kf.dct_attach_pack_segments.clear_cache()
    kf.dct_attach_pack_grouped.clear_cache()
    try:
        b = JpegEncoder(EncodeConfig(engine="pallas", **base)).encode(img)
    finally:
        kfront.front_place.clear_cache()
        kf.dct_attach_pack_xt.clear_cache()
        kf.dct_attach_pack_segments.clear_cache()
        kf.dct_attach_pack_grouped.clear_cache()
    assert a == b


@pytest.mark.parametrize("quality", [None, 100])
def test_rowacc_impl_parity(img_synthetic_160, quality, monkeypatch):
    """The MXU one-hot row accumulation must emit exactly the bytes of
    the loop form — including quality=100 (long codes, max row spans)
    and multi-segment streams."""
    from jpeg_tpu.kernels import front as kfront
    from jpeg_tpu.kernels import fused as kf

    img = np.asarray(img_synthetic_160)[:128, :64]
    base = dict(scan_layout="interleaved", restart_interval_mcu_rows=4,
                quality=quality)
    a = JpegEncoder(EncodeConfig(engine="pallas", **base)).encode(img)
    monkeypatch.setattr(kf, "_ROWACC_IMPL", "loop")
    kfront.front_place.clear_cache()
    kf.dct_attach_pack_xt.clear_cache()
    kf.attach_pack_pf.clear_cache()
    kf.dct_attach_pack_segments.clear_cache()
    kf.dct_attach_pack_grouped.clear_cache()
    try:
        b = JpegEncoder(EncodeConfig(engine="pallas", **base)).encode(img)
    finally:
        kfront.front_place.clear_cache()
        kf.dct_attach_pack_xt.clear_cache()
        kf.attach_pack_pf.clear_cache()
        kf.dct_attach_pack_segments.clear_cache()
        kf.dct_attach_pack_grouped.clear_cache()
    assert a == b


def test_dynamic_pf_handoff_parity(monkeypatch):
    """Dynamic-mode stage 1 -> 2 packed-field handoff
    (front_index(emit_fields=True) + attach_pack_pf) must be
    byte-identical to the XLA-front fallback path it supersedes."""
    import warnings

    from jpeg_tpu.pipelines.fast import FastBatchEncoder

    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:128, 0:128]
    base = ((yy // 16 + xx // 16) % 2) * 180 + 40
    img = np.clip(np.stack([base, 255 - base, xx * 2], axis=-1)
                  + rng.integers(-20, 21, (128, 128, 3)),
                  0, 255).astype(np.uint8)[None]
    cfg = EncodeConfig(scan_layout="interleaved", huffman="dynamic")
    enc = FastBatchEncoder(128, 128, config=cfg, interpret=True)
    assert enc._front_ok
    a = enc.encode_batch(img)
    monkeypatch.setattr(FastBatchEncoder, "_front_ok",
                        property(lambda self: False))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # deliberate fallback
        enc2 = FastBatchEncoder(128, 128, config=cfg, interpret=True)
    assert not enc2._front_ok and enc2._front_geom_ok
    b = enc2.encode_batch(img)
    assert a[0] == b[0]
