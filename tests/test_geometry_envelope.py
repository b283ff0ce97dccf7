"""Round-5 geometry envelope: restart segments off slab boundaries and
wide images (VERDICT r4 #4), plus the silent-fallback warnings (#8).

The reference's only window constraint is w, h = 0 (mod 16)
(utils/original.c:327-331); the mega-kernel fast path must match that
envelope.  Segments whose boundaries do not fall on 128-row slab edges
run as zero-padded pseudo-images (pipelines.fast._seg_pseudo_batch) and
must stay byte-identical to the XLA engine.
"""
import warnings

import numpy as np
import pytest

from jpeg_tpu.core.types import EncodeConfig
from jpeg_tpu.pipelines.encode import JpegEncoder
from jpeg_tpu.pipelines.fast import FastBatchEncoder


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    smooth = ((yy * 2 + xx) % 256).astype(np.uint8)
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    img[:, : w // 2, 0] = smooth[:, : w // 2]
    return img


@pytest.mark.parametrize("huff", ["fixed", "dynamic"])
def test_pseudo_segment_parity(huff):
    """Restart boundaries NOT on slab edges (320 rows, 5 segments of 64
    rows) ride the mega kernel via pseudo-images, byte-identical to the
    XLA engine.  W=128 -> slab columns 384 (128-aligned), so dynamic
    mode exercises the pseudo xt handoff too."""
    h, w, segs = 320, 128, 5
    img = _img(h, w, seed=3)
    cfg = EncodeConfig(scan_layout="interleaved", huffman=huff,
                       restart_interval_mcu_rows=4)
    fast = FastBatchEncoder(h, w, config=cfg, segs_per_image=segs,
                            interpret=True)
    assert fast._front_ok and not fast._front_aligned
    got = fast.encode_batch(np.stack([img, img[::-1].copy()]))
    ref = JpegEncoder(EncodeConfig(scan_layout="interleaved", huffman=huff,
                                   restart_interval_mcu_rows=4,
                                   engine="xla"))
    assert bytes(got[0]) == bytes(ref.encode(img))
    assert bytes(got[1]) == bytes(ref.encode(img[::-1]))


@pytest.mark.parametrize("huff", ["fixed", "dynamic"])
@pytest.mark.parametrize("samp,h,segs", [
    ("422", 192, 3),   # 8-px MCU rows: 24 rows / 3 segs = 64-px segments
    ("444", 320, 5),   # 40 rows / 5 segs = 64-px segments
])
def test_pseudo_segment_non420(samp, h, segs, huff):
    """Pseudo-segment mode across the other chroma modes (fixed AND
    dynamic — the packed-field handoff): the per-sampling PERIOD/YPM
    block patterns and DC chains must survive the per-segment
    pseudo-image split byte-exactly."""
    w = 128
    img = _img(h, w, seed=11)
    rows = {"422": 8, "444": 8}[samp]
    cfg = EncodeConfig(scan_layout="interleaved", huffman=huff,
                       subsampling=samp,
                       restart_interval_mcu_rows=(h // rows) // segs)
    fast = FastBatchEncoder(h, w, config=cfg, segs_per_image=segs,
                            interpret=True)
    assert fast._front_ok and not fast._front_aligned
    got = fast.encode_batch(np.stack([img]))
    ref = JpegEncoder(EncodeConfig(scan_layout="interleaved",
                                   huffman=huff, subsampling=samp,
                                   restart_interval_mcu_rows=(h // rows)
                                   // segs,
                                   engine="xla")).encode(img)
    assert bytes(got[0]) == bytes(ref)


def test_pseudo_segment_unaligned_columns_dynamic():
    """Pseudo-segment mode with slab columns NOT 128-aligned (W=96 ->
    sc=288 -> phantom-padded to 384): the packed-field handoff must
    carry the phantom slots as NULL (zero bits) through stage 2."""
    h, w, segs = 320, 96, 5
    img = _img(h, w, seed=4)
    cfg = EncodeConfig(scan_layout="interleaved", huffman="dynamic",
                       restart_interval_mcu_rows=4)
    fast = FastBatchEncoder(h, w, config=cfg, segs_per_image=segs,
                            interpret=True)
    assert fast._front_ok and not fast._front_aligned
    got = fast.encode_batch(np.stack([img]))
    ref = JpegEncoder(EncodeConfig(scan_layout="interleaved",
                                   huffman="dynamic",
                                   restart_interval_mcu_rows=4,
                                   engine="xla")).encode(img)
    assert bytes(got[0]) == bytes(ref)


def test_1080p_with_restarts_hits_mega_kernel():
    """The VERDICT's named geometry: 1920x1088 (1080p padded to the MCU
    grid) with restart segments — 1088 is not a slab multiple, so this
    is pseudo-segment mode.  Byte parity vs the XLA engine."""
    h, w, segs = 1088, 1920, 4  # 17 MCU rows (272 px) per segment
    img = _img(h, w, seed=5)
    cfg = EncodeConfig(scan_layout="interleaved", huffman="fixed",
                       restart_interval_mcu_rows=17)
    fast = FastBatchEncoder(h, w, config=cfg, segs_per_image=segs,
                            interpret=True)
    assert fast._front_ok and not fast._front_aligned
    got = fast.encode_batch(np.stack([img]))
    ref = JpegEncoder(EncodeConfig(scan_layout="interleaved",
                                   huffman="fixed",
                                   restart_interval_mcu_rows=17,
                                   engine="xla")).encode(img)
    assert bytes(got[0]) == bytes(ref)


def test_wide_3840_hits_mega_kernel():
    """W=3840 — near the slab-VMEM edge (cbp backs off to 640) — rides
    the strip-decomposed mega kernel, byte-identical to the XLA
    engine."""
    h, w = 128, 3840
    img = _img(h, w, seed=6)
    cfg = EncodeConfig(scan_layout="interleaved", huffman="fixed")
    fast = FastBatchEncoder(h, w, config=cfg, interpret=True)
    assert fast._front_ok
    from jpeg_tpu.kernels import front as kfront
    assert kfront.pick_mega_layout(w // 16, "420", fast.seg_rows)[1] < 1920
    got = fast.encode_batch(np.stack([img]))
    ref = JpegEncoder(EncodeConfig(scan_layout="interleaved",
                                   huffman="fixed",
                                   engine="xla")).encode(img)
    assert bytes(got[0]) == bytes(ref)


def test_wide_6400_falls_back_with_warning():
    """W=6400 exceeds the 16 MB scoped-VMEM slab bound (the xt alone is
    ~9.4 MB): the encoder must warn, fall back to the XLA front, and
    still produce XLA-engine-identical bytes."""
    h, w = 64, 6400
    img = _img(h, w, seed=7)
    cfg = EncodeConfig(scan_layout="interleaved", huffman="fixed")
    with pytest.warns(UserWarning, match="VMEM"):
        fast = FastBatchEncoder(h, w, config=cfg, interpret=True)
    assert not fast._front_ok
    got = fast.encode_batch(np.stack([img]))
    ref = JpegEncoder(EncodeConfig(scan_layout="interleaved",
                                   huffman="fixed",
                                   engine="xla")).encode(img)
    assert bytes(got[0]) == bytes(ref)


def test_fast_path_fallback_warns():
    """An ineligible geometry (width beyond the VMEM bound) must WARN
    when it silently takes the ~10x slower XLA front (VERDICT r4 #8)."""
    with pytest.warns(UserWarning, match="8192"):
        FastBatchEncoder(16, 8320,
                         config=EncodeConfig(scan_layout="interleaved",
                                             huffman="fixed"),
                         interpret=True)


def test_front_eligible_no_warning():
    """Eligible geometries must NOT warn."""
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        FastBatchEncoder(128, 128,
                         config=EncodeConfig(scan_layout="interleaved",
                                             huffman="fixed"),
                         interpret=True)


def test_speculative_fallback_warns():
    """A stream too small for the speculative device path must warn when
    decode falls back to the host entropy decoder."""
    from jpeg_tpu.pipelines.decode import decode_jpeg
    from jpeg_tpu.pipelines.encode import encode_gray
    plane = np.arange(256, dtype=np.uint8).reshape(16, 16)
    data = encode_gray(plane)
    with pytest.warns(UserWarning, match="host entropy decoder"):
        out = decode_jpeg(data, entropy_engine="auto", interpret=True)
    assert out.shape == (16, 16)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_geometry_property(seed):
    """Seeded randomized sweep over the envelope: random MCU-granular
    dims, random segmentation, random mode — the fast path (whatever
    route it takes: mega kernel, pseudo-segments, phantom columns, or
    XLA fallback) must always match the XLA engine byte-for-byte."""
    rng = np.random.default_rng(100 + seed)
    samp = ["420", "422", "444"][seed % 3]
    mcu_h = 16 if samp == "420" else 8
    h = int(rng.integers(2, 20)) * mcu_h
    w = int(rng.integers(2, 14)) * 16
    mcus_y = h // mcu_h
    divs = [d for d in range(1, mcus_y + 1) if mcus_y % d == 0]
    segs = int(rng.choice(divs))
    huff = ["fixed", "dynamic"][seed % 2]
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    cfg = dict(scan_layout="interleaved", huffman=huff, subsampling=samp,
               restart_interval_mcu_rows=mcus_y // segs)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # fallbacks are legal here
        fast = FastBatchEncoder(h, w, config=EncodeConfig(**cfg),
                                segs_per_image=segs, interpret=True)
    got = fast.encode_batch(np.stack([img]))
    ref = JpegEncoder(EncodeConfig(engine="xla", **cfg)).encode(img)
    assert bytes(got[0]) == bytes(ref), \
        f"h={h} w={w} segs={segs} {samp} {huff}"
