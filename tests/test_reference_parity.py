"""Byte-level parity with the reference C encoder.

Compiles the reference's golden desktop encoder (``utils/original.c``) at
test time and byte-compares its output JPEG with ours on the in-repo
fixtures — the strongest possible form of the reference's own golden-file
test strategy (SURVEY §4: dir-compare of stage dumps).  Skipped when the
reference checkout or a C compiler is unavailable.
"""
import os
import shutil
import subprocess

import pytest

REF_SRC = "/root/reference/utils/original.c"
REF_IMAGES = "/root/reference/images"


@pytest.fixture(scope="session")
def ref_encoder(tmp_path_factory):
    if not os.path.exists(REF_SRC) or shutil.which("gcc") is None:
        pytest.skip("reference source or gcc unavailable")
    d = tmp_path_factory.mktemp("refenc")
    (d / "hisParts").mkdir()
    binpath = d / "original"
    subprocess.run(["gcc", "-O2", "-o", str(binpath), REF_SRC, "-lm"],
                   check=True, capture_output=True)
    return d


@pytest.fixture(scope="session")
def ref_encoder_quality(tmp_path_factory):
    """The reference encoder with its commented-out ``set_quality`` calls
    re-enabled (``utils/original.c:1157-1158``) — the quality-scaling
    oracle.  The source is patched in a temp copy; nothing is checked in.
    """
    if not os.path.exists(REF_SRC) or shutil.which("gcc") is None:
        pytest.skip("reference source or gcc unavailable")
    d = tmp_path_factory.mktemp("refencq")
    (d / "hisParts").mkdir()
    src = d / "original_q.c"
    text = open(REF_SRC).read()
    patched = text.replace("// set_quality(", "set_quality(")
    assert patched != text, "set_quality call sites not found to re-enable"
    src.write_text(patched)
    binpath = d / "original_q"
    subprocess.run(["gcc", "-O2", "-o", str(binpath), str(src), "-lm"],
                   check=True, capture_output=True)
    return d


@pytest.mark.parametrize("quality", [10, 50, 75, 90, 100])
def test_quality_scaling_byte_identical_to_reference(ref_encoder_quality,
                                                     quality):
    """`quality=q` output is byte-identical to the C with scaling enabled.

    Validates ``tables.set_quality`` (the CLIP((100-q)/50 * q, 1, 255)
    truncation semantics) end to end through DQT emission and the
    quantize stage.
    """
    ppm = os.path.join(REF_IMAGES, "sample_64x64.ppm")
    if not os.path.exists(ppm):
        pytest.skip("fixture missing")
    subprocess.run([str(ref_encoder_quality / "original_q"), ppm,
                    str(quality)],
                   cwd=ref_encoder_quality, check=True, capture_output=True)
    ref_bytes = (ref_encoder_quality / "out.jpg").read_bytes()

    from jpeg_tpu.golden import encoder as genc
    from jpeg_tpu.io.ppm import read_ppm
    mine = genc.encode(read_ppm(ppm), quality=quality)
    assert mine == ref_bytes, (
        f"quality={quality}: golden encoder differs from C reference with "
        f"set_quality enabled ({len(mine)} vs {len(ref_bytes)} bytes)")


@pytest.mark.parametrize("name", ["sample_64x64.ppm", "sample_640x640.ppm"])
def test_bitstream_byte_identical_to_reference(ref_encoder, name):
    ppm = os.path.join(REF_IMAGES, name)
    if not os.path.exists(ppm):
        pytest.skip(f"fixture {name} missing")
    subprocess.run([str(ref_encoder / "original"), ppm, "90"],
                   cwd=ref_encoder, check=True, capture_output=True)
    ref_bytes = (ref_encoder / "out.jpg").read_bytes()

    from jpeg_tpu.golden import encoder as genc
    from jpeg_tpu.io.ppm import read_ppm
    mine = genc.encode(read_ppm(ppm))  # quality=None == reference behavior
    assert mine == ref_bytes, (
        f"golden encoder output differs from C reference on {name} "
        f"({len(mine)} vs {len(ref_bytes)} bytes)")
