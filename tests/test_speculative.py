"""Speculative (non-restart) device entropy decode vs host oracles.

The self-synchronizing lane decode must be coefficient-exact against
the golden decoder on every content type it accepts, and must FALL BACK
(never corrupt) on anything it cannot prove."""
import io

import numpy as np
import pytest

from jpeg_tpu.core.types import EncodeConfig
from jpeg_tpu.golden.decoder import parse_coefficients
from jpeg_tpu.kernels import huffdec as hd
from jpeg_tpu.pipelines.decode import decode_jpeg
from jpeg_tpu.pipelines.encode import JpegEncoder
from jpeg_tpu.pipelines.speculative import (speculative_decode,
                                            speculative_scan_zz)


def _gray(seed, kind):
    rng = np.random.default_rng(seed)
    if kind == "noise":
        return rng.integers(0, 256, (160, 160), dtype=np.uint8)
    if kind == "structured":
        yy, xx = np.mgrid[0:160, 0:160]
        return (((yy // 9) * 13 + (xx // 7) * 5
                 + rng.integers(0, 3, (160, 160))) % 200).astype(np.uint8)
    g = np.full((160, 160), 128, np.uint8)  # flat with a busy window
    g[40:120, 40:120] = rng.integers(0, 256, (80, 80))
    return g


@pytest.mark.parametrize("kind", ["noise", "structured", "flat"])
def test_gray_scan_coefficient_exact(kind):
    from PIL import Image
    g = _gray(3, kind)
    buf = io.BytesIO()
    Image.fromarray(g, "L").save(buf, "JPEG", quality=93)
    data = buf.getvalue()
    info = hd.parse_noninterleaved_scans(data)
    assert info is not None
    scan = info["scans"][0]
    zz = speculative_scan_zz(scan["entropy"], scan["dc_spec"],
                             scan["ac_spec"], 400, interpret=True,
                             target_lane_bytes=512)
    assert zz is not None
    comps, coeffs, _q, _w, _h = parse_coefficients(data)
    assert np.array_equal(zz, coeffs[comps[0].comp_id])


@pytest.mark.parametrize("huff,samp", [("dynamic", "420"),
                                       ("fixed", "444")])
def test_3scan_stream_device_equals_host(huff, samp):
    """The reference-parity default layout (3 single-component scans,
    no restarts) decodes on device, pixel-identical to the host."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (192, 192, 3), dtype=np.uint8)
    cfg = EncodeConfig(huffman=huff, subsampling=samp)
    data = bytes(JpegEncoder(cfg).encode(img))
    out = speculative_decode(data, interpret=True, target_lane_bytes=512)
    assert out is not None
    ref = decode_jpeg(data, entropy_engine="host")
    assert np.array_equal(out, ref)


def test_decode_jpeg_routes_speculative():
    """decode_jpeg(entropy_engine='device') serves a big-enough 3-scan
    stream via the speculative path instead of raising."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
    data = bytes(JpegEncoder(EncodeConfig()).encode(img))
    out = decode_jpeg(data, entropy_engine="device", interpret=True)
    ref = decode_jpeg(data, entropy_engine="host")
    assert np.array_equal(out, ref)


def test_corrupt_stream_falls_back_not_wrong():
    """Flipping entropy bytes must yield None (fallback) or a clean
    decode attempt — never a silently wrong accept of mismatched block
    counts."""
    from PIL import Image
    g = _gray(5, "noise")
    buf = io.BytesIO()
    Image.fromarray(g, "L").save(buf, "JPEG", quality=93)
    data = bytearray(buf.getvalue())
    info = hd.parse_noninterleaved_scans(bytes(data))
    assert info is not None
    rng = np.random.default_rng(7)
    for _ in range(4):
        d = bytearray(data)
        for _k in range(3):
            d[int(rng.integers(len(d) // 2, len(d) - 2))] = \
                int(rng.integers(0, 256))
        info = hd.parse_noninterleaved_scans(bytes(d))
        if info is None:
            continue
        scan = info["scans"][0]
        zz = speculative_scan_zz(scan["entropy"], scan["dc_spec"],
                                 scan["ac_spec"], 400, interpret=True,
                                 target_lane_bytes=512)
        # None (detected) is fine; if accepted, the count contract held
        if zz is not None:
            assert zz.shape == (400, 64)


def test_speculative_batch_combined():
    """Many images' scans in ONE combined launch; results equal the
    per-image path and the host decoder."""
    from jpeg_tpu.pipelines.decode import decode_jpeg_batch
    from jpeg_tpu.pipelines.speculative import speculative_decode_batch
    rng = np.random.default_rng(4)
    datas = []
    for k, (samp, hw) in enumerate([("420", (192, 192)),
                                    ("444", (128, 192)),
                                    ("420", (192, 128))]):
        img = rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
        datas.append(bytes(JpegEncoder(
            EncodeConfig(subsampling=samp)).encode(img)))
    outs = speculative_decode_batch(datas, interpret=True,
                                    target_lane_bytes=512)
    for d, out in zip(datas, outs):
        assert out is not None
        assert np.array_equal(out, decode_jpeg(d, entropy_engine="host"))
    # and through the public batch API (mixed with a restart stream)
    cfg = EncodeConfig(scan_layout="interleaved", huffman="fixed",
                       restart_interval_mcu_rows=2, engine="xla")
    rimg = rng.integers(0, 256, (96, 96, 3), dtype=np.uint8)
    datas.append(bytes(JpegEncoder(cfg).encode(rimg)))
    got = decode_jpeg_batch(datas, interpret=True)
    for d, out in zip(datas, got):
        assert np.array_equal(out, decode_jpeg(d, entropy_engine="host"))


@pytest.mark.parametrize("pil_samp,samp", [(2, "420"), (1, "422"),
                                           (0, "444")])
def test_interleaved_nonrestart_pillow(pil_samp, samp):
    """Default libjpeg/Pillow output — interleaved single scan, NO
    restart markers — decodes via per-lane MCU-phase speculation,
    pixel-identical to the host decoder."""
    from PIL import Image
    rng = np.random.default_rng(pil_samp)
    img = rng.integers(0, 256, (160, 160, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img, "RGB").save(buf, "JPEG", quality=90,
                                     subsampling=pil_samp)
    data = buf.getvalue()
    out = speculative_decode(data, interpret=True,
                             target_lane_bytes=1024)
    assert out is not None
    ref = decode_jpeg(data, entropy_engine="host")
    assert np.array_equal(out, ref)
    # and via the public single-image API
    got = decode_jpeg(data, entropy_engine="device", interpret=True)
    assert np.array_equal(got, ref)


def test_interleaved_nonrestart_own_encoder():
    """Our own interleaved output without restarts through the phased
    speculative path (fixed tables)."""
    img = np.random.default_rng(12).integers(
        0, 256, (192, 192, 3), dtype=np.uint8)
    cfg = EncodeConfig(scan_layout="interleaved", huffman="fixed",
                       engine="xla")
    data = bytes(JpegEncoder(cfg).encode(img))
    out = speculative_decode(data, interpret=True, target_lane_bytes=512)
    assert out is not None
    assert np.array_equal(out, decode_jpeg(data, entropy_engine="host"))


def test_speculative_sharded_matches_single():
    """Speculative lanes sharded over the 8-device CPU mesh decode the
    same pixels as the single-device launch (restart-free 3-scan and
    interleaved streams)."""
    from jpeg_tpu.parallel.mesh import make_mesh
    from jpeg_tpu.pipelines.decode import decode_jpeg_batch
    mesh = make_mesh(data=1, space=8)
    rng = np.random.default_rng(6)
    datas = [bytes(JpegEncoder(EncodeConfig()).encode(
        rng.integers(0, 256, (192, 192, 3), dtype=np.uint8)))]
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 256, (160, 160, 3), dtype=np.uint8),
                    "RGB").save(buf, "JPEG", quality=90, subsampling=2)
    datas.append(buf.getvalue())
    single = decode_jpeg_batch(datas, interpret=True)
    sharded = decode_jpeg_batch(datas, interpret=True, mesh=mesh)
    for a, b in zip(single, sharded):
        assert np.array_equal(a, b)


def test_batch_salvage_with_corrupt_member():
    """One corrupt stream in a batch must not sink the others: the
    batched fused launch fails as a whole, the fallback machinery
    salvages the healthy images, and the corrupt one returns None or a
    count-contract-respecting decode — never a wrong image."""
    from jpeg_tpu.pipelines.speculative import speculative_decode_batch
    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
            for _ in range(3)]
    datas = [bytes(JpegEncoder(EncodeConfig()).encode(im)) for im in imgs]
    bad = bytearray(datas[1])
    # stomp entropy bytes in the back half (markers live up front)
    for k in range(6):
        bad[len(bad) // 2 + 7 * k] = 0x55
    datas[1] = bytes(bad)
    outs = speculative_decode_batch(datas, interpret=True,
                                    target_lane_bytes=256)
    from jpeg_tpu.pipelines.decode import decode_jpeg
    for i in (0, 2):
        if outs[i] is not None:
            ref = decode_jpeg(datas[i], entropy_engine="host")
            assert np.array_equal(outs[i], ref), i
    assert any(outs[i] is not None for i in (0, 2)), \
        "healthy images must be salvaged"


def test_restart_intra_segment_speculation():
    """A restart stream with FEW segments decodes through the fused
    intra-segment speculative path (entropy_engine='device'), pixel-
    identical to the host-entropy decode of the same file."""
    rng = np.random.default_rng(21)
    yy, xx = np.mgrid[0:320, 0:320]
    base = ((yy // 16 + xx // 16) % 2) * 160 + 40
    img = np.clip(np.stack([base, 255 - base, xx % 256], axis=-1)
                  + rng.integers(-25, 26, (320, 320, 3)),
                  0, 255).astype(np.uint8)
    data = JpegEncoder(EncodeConfig(scan_layout="interleaved",
                                    restart_interval_mcu_rows=5)).encode(img)
    assert b"\xff\xd0" in data  # 4 segments -> 4 lanes un-speculated
    from jpeg_tpu.pipelines.speculative import speculative_decode_restart
    # small fixture: shrink the per-lane chunk so each ~1 KB segment
    # still splits into several speculated lanes
    out = speculative_decode_restart(bytes(data), interpret=True,
                                     target_lane_bytes=256)
    assert out is not None, "restart speculation must converge here"
    ref = decode_jpeg(bytes(data), entropy_engine="host")
    assert np.array_equal(out, ref)
    # the forced-device router must take the same path for few segments
    out2 = decode_jpeg(bytes(data), entropy_engine="device",
                       interpret=True)
    assert np.array_equal(out2, ref)


def test_restart_speculation_gray():
    """Grayscale restart streams route through the gray_rst recon."""
    g = _gray(9, "structured")
    from jpeg_tpu.pipelines.encode import encode_gray
    data = encode_gray(g, EncodeConfig(scan_layout="interleaved",
                                       restart_interval_mcu_rows=4))
    from jpeg_tpu.pipelines.speculative import speculative_decode_restart
    out = speculative_decode_restart(bytes(data), interpret=True,
                                     target_lane_bytes=256)
    if out is None:
        pytest.skip("stream too small or no restarts in gray encode")
    ref = decode_jpeg(bytes(data), entropy_engine="host")
    assert np.array_equal(out, ref)
