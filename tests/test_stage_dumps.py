"""Stage dumps byte-compared against the C reference's hisParts output.

This is the reference's own test methodology run against it: compile
``utils/original.c``, let it dump every stage into ``hisParts/``, dump the
same stages with our tooling, and dir-compare.  Only the reference's
well-defined files are compared — its chroma Quant/ZigZag/Diff dumps read
out of bounds (utils/original.c:1249-1253 vs the num_pixel/4 allocation
at :180-190) and contain heap garbage.
"""
import os
import shutil
import subprocess

import pytest

REF_SRC = "/root/reference/utils/original.c"
FIXTURE = "/root/reference/images/sample_64x64.ppm"

WELL_DEFINED = [
    "Y-Pre", "Cb-Pre", "Cr-Pre",
    "Y-Dct", "Cb-Dct", "Cr-Dct",
    "Y-Quant", "Y-ZigZag", "Y-Diff",
]


@pytest.fixture(scope="module")
def his_parts(tmp_path_factory):
    if not (os.path.exists(REF_SRC) and os.path.exists(FIXTURE)
            and shutil.which("gcc")):
        pytest.skip("reference source, fixture, or gcc unavailable")
    d = tmp_path_factory.mktemp("stagecmp")
    (d / "hisParts").mkdir()
    subprocess.run(["gcc", "-O2", "-o", str(d / "original"), REF_SRC, "-lm"],
                   check=True, capture_output=True)
    subprocess.run([str(d / "original"), FIXTURE, "90"],
                   cwd=d, check=True, capture_output=True)
    return d


def test_stage_dumps_match_reference(his_parts, tmp_path):
    from jpeg_tpu.io.ppm import read_ppm
    from jpeg_tpu.utils.dir_compare import compare_dirs
    from jpeg_tpu.utils.stage_dump import dump_stages

    mine = tmp_path / "myParts"
    dump_stages(read_ppm(FIXTURE), str(mine))  # quality=None == reference
    results = compare_dirs(str(his_parts / "hisParts"), str(mine))
    bad = [n for n in WELL_DEFINED if not results.get(n, False)]
    assert not bad, f"stage dumps differ from C reference: {bad}"
