"""Progressive (SOF2) encoding, oracled by PIL/libjpeg."""
import io

import numpy as np
import pytest

PIL = pytest.importorskip("PIL.Image")

from jpeg_tpu.core.types import EncodeConfig
from jpeg_tpu.golden import decoder as gdec
from jpeg_tpu.pipelines.encode import JpegEncoder
from jpeg_tpu.pipelines.progressive import encode_progressive


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((yy // 16 + xx // 16) % 2) * 140 + 50
    img = np.stack([base, 255 - base, xx * 255 // max(w - 1, 1)], axis=-1)
    return np.clip(img + rng.integers(-10, 11, size=img.shape), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("huffman", ["dynamic", "fixed"])
def test_progressive_pil_roundtrip(huffman):
    img = _img(64, 64)
    data = encode_progressive(img, EncodeConfig(huffman=huffman))
    assert b"\xff\xc2" in data            # SOF2
    assert data.count(b"\xff\xda") == 4   # 1 DC + 3 AC scans
    im = PIL.open(io.BytesIO(data))
    im.load()
    assert im.size == (64, 64)
    pil = np.asarray(im.convert("RGB"))

    # same coefficients as baseline: reconstruction quality must match the
    # baseline stream PIL-decodes from the same source
    base = JpegEncoder(EncodeConfig(huffman=huffman)).encode(img)
    pil_base = np.asarray(PIL.open(io.BytesIO(base)).convert("RGB"))
    assert abs(gdec.psnr(pil, img) - gdec.psnr(pil_base, img)) < 0.5


def test_progressive_quality_param():
    img = _img(64, 64, seed=1)
    lo = encode_progressive(img, EncodeConfig(quality=30))
    hi = encode_progressive(img, EncodeConfig(quality=90))
    assert len(lo) < len(hi)
    im = PIL.open(io.BytesIO(hi))
    im.load()
    assert im.size == (64, 64)


def test_progressive_rejects_bad_dims():
    with pytest.raises(ValueError):
        encode_progressive(_img(24, 24))  # not a 4:2:0 MCU multiple


def test_eob_runs_shrink_sparse_content():
    """Dynamic mode accumulates cross-block EOB runs; on sparse content the
    stream should shrink well below one EOB symbol per block."""
    img = np.full((64, 64, 3), 180, np.uint8)   # flat: every AC band empty
    img[0:8, 0:8] = 0                           # one busy corner block
    data = encode_progressive(img, EncodeConfig())
    im = PIL.open(io.BytesIO(data))
    im.load()
    assert im.size == (64, 64)
    rec = np.asarray(im.convert("RGB"))
    assert np.abs(rec[32:, 32:].astype(int) - 180).max() <= 6
    # fixed mode has no EOBn codes -> one EOB per block; dynamic must win
    fixed = encode_progressive(img, EncodeConfig(huffman="fixed"))
    assert len(data) < len(fixed)


def test_eob_runs_noise_roundtrip():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(64, 64, 3)).astype(np.uint8)
    data = encode_progressive(img, EncodeConfig())
    im = PIL.open(io.BytesIO(data))
    im.load()
    base = JpegEncoder(EncodeConfig()).encode(img)
    pil_prog = np.asarray(im.convert("RGB"))
    pil_base = np.asarray(PIL.open(io.BytesIO(base)).convert("RGB"))
    assert abs(gdec.psnr(pil_prog, img) - gdec.psnr(pil_base, img)) < 0.5


@pytest.mark.parametrize("subsampling", ["422", "444"])
def test_progressive_chroma_modes(subsampling):
    img = _img(64, 64, seed=6)
    data = encode_progressive(img, EncodeConfig(subsampling=subsampling))
    assert b"\xff\xc2" in data
    im = PIL.open(io.BytesIO(data))
    im.load()
    assert im.size == (64, 64)
    pil = np.asarray(im.convert("RGB"))
    base = JpegEncoder(EncodeConfig(subsampling=subsampling)).encode(img)
    pil_base = np.asarray(PIL.open(io.BytesIO(base)).convert("RGB"))
    assert abs(gdec.psnr(pil, img) - gdec.psnr(pil_base, img)) < 0.5


# --- successive approximation (scan-script engine) -------------------------

from jpeg_tpu.pipelines.progressive import (SUCCESSIVE_SCRIPT,
                                            encode_progressive_script)


@pytest.mark.parametrize("huffman", ["dynamic", "fixed"])
@pytest.mark.parametrize("subsampling", ["420", "422", "444"])
def test_successive_approximation_roundtrip(huffman, subsampling):
    """The 10-scan SA script decodes to exactly baseline quality, through
    both our SOF2 decoder and PIL, and the two agree."""
    img = _img(64, 96, seed=9)
    data = encode_progressive_script(
        img, EncodeConfig(huffman=huffman, subsampling=subsampling))
    assert b"\xff\xc2" in data
    assert data.count(b"\xff\xda") == len(SUCCESSIVE_SCRIPT)
    im = PIL.open(io.BytesIO(data))
    im.load()
    pil = np.asarray(im.convert("RGB"))
    ours = gdec.decode(data)
    assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 2
    base = JpegEncoder(EncodeConfig(huffman=huffman,
                                    subsampling=subsampling)).encode(img)
    pil_base = np.asarray(PIL.open(io.BytesIO(base)).convert("RGB"))
    assert abs(gdec.psnr(pil, img) - gdec.psnr(pil_base, img)) < 0.05


def test_sa_noise_stresses_refinement_paths():
    """Random noise maximizes ZRL runs, correction-bit buffering, and EOB
    accumulation in the refinement coder."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(160, 96, 3)).astype(np.uint8)
    for huffman in ("dynamic", "fixed"):
        data = encode_progressive_script(img, EncodeConfig(huffman=huffman))
        pil = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB"))
        ours = gdec.decode(data)
        assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 2
        base = JpegEncoder(EncodeConfig(huffman=huffman)).encode(img)
        pil_base = np.asarray(PIL.open(io.BytesIO(base)).convert("RGB"))
        assert abs(gdec.psnr(pil, img) - gdec.psnr(pil_base, img)) < 0.05


def test_sa_scan_prefixes_refine_monotonically():
    """Decoding a truncated SA stream must work scan by scan, with PSNR
    (non-strictly) improving as scans accumulate — the point of
    progressive rendering."""
    img = _img(64, 64, seed=12)
    data = encode_progressive_script(img, EncodeConfig())
    offs = []
    i = 0
    while True:
        j = data.find(b"\xff\xda", i + 1)
        if j < 0:
            break
        offs.append(j)
        i = j
    assert len(offs) == len(SUCCESSIVE_SCRIPT)
    psnrs = []
    for k in range(1, len(offs) + 1):
        end = offs[k] if k < len(offs) else len(data) - 2
        rec = gdec.decode(data[:end] + b"\xff\xd9")
        psnrs.append(gdec.psnr(rec, img))
    assert all(b >= a - 0.3 for a, b in zip(psnrs, psnrs[1:])), psnrs
    # the checkerboard is block-aligned, so the coarse scans already score
    # well; the refinements must still add measurable quality
    assert psnrs[-1] > psnrs[0] + 1, psnrs


def test_golden_decoder_decodes_spectral_progressive():
    """The in-repo decoder is now a self-contained SOF2 oracle for the
    default spectral-selection engine too (PIL stays as second opinion)."""
    img = _img(64, 64, seed=3)
    for huffman in ("dynamic", "fixed"):
        data = encode_progressive(img, EncodeConfig(huffman=huffman))
        ours = gdec.decode(data)
        pil = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB"))
        assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 2


def test_scan_script_validation():
    img = _img(32, 32)
    with pytest.raises(ValueError):
        encode_progressive_script(img, scan_script=[("dc", 0, 5, 0, 0)])
    with pytest.raises(ValueError):
        encode_progressive_script(img, scan_script=[(0, 0, 63, 0, 0)])
    with pytest.raises(ValueError):
        encode_progressive_script(img, scan_script=[("dc", 0, 0, 3, 1)])


def test_custom_band_script():
    """Band-split spectral-only script (no SA) through the script engine."""
    img = _img(64, 64, seed=8)
    script = [("dc", 0, 0, 0, 0),
              (0, 1, 5, 0, 0), (0, 6, 63, 0, 0),
              (1, 1, 63, 0, 0), (2, 1, 63, 0, 0)]
    data = encode_progressive_script(img, EncodeConfig(), scan_script=script)
    pil = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB"))
    ours = gdec.decode(data)
    assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 2


def test_native_refine_coder_matches_python(monkeypatch):
    """The C++ SA refinement coder must emit element-identical fields to
    the Python reference loop (jt_ac_refine_fields parity)."""
    from jpeg_tpu import native
    from jpeg_tpu.pipelines import progressive as P
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    # mix of empty blocks, long zero runs, corrections and new ones
    zz = rng.integers(-9, 10, size=(120, 64)).astype(np.int64)
    zz[rng.random((120, 64)) < 0.85] = 0
    zz[::7] = 0                      # whole-block EOB runs
    zz[5, 1:] = 0; zz[5, 63] = 3     # long run to a correction
    zz[9, 1:] = 0; zz[9, 62] = 1     # long run to a new one (ZRLs)
    for ss, se, ah, al in ((1, 63, 1, 0), (1, 63, 2, 1), (6, 63, 1, 0)):
        for allow_eobn in (True, False):
            got = P._ac_refine_fields(zz, ss, se, ah, al, allow_eobn)
            monkeypatch.setattr(native, "ac_refine_fields",
                                lambda *a, **k: None)
            want = P._ac_refine_fields(zz, ss, se, ah, al, allow_eobn)
            monkeypatch.undo()
            for g, w in zip(got.arrays(), want.arrays()):
                assert np.array_equal(g, w), (ss, se, ah, al, allow_eobn)
