"""CLI subcommands (run in-process on CPU)."""
import os

import numpy as np

from jpeg_tpu.__main__ import main
from jpeg_tpu.io.ppm import read_ppm, write_ppm

FIXTURE = "/root/reference/images/sample_64x64.ppm"


def _src(tmp_path):
    if os.path.exists(FIXTURE):
        return FIXTURE
    p = tmp_path / "src.ppm"
    rng = np.random.default_rng(0)
    write_ppm(str(p), rng.integers(0, 256, size=(64, 64, 3)).astype(np.uint8))
    return str(p)


def test_cli_encode_decode_roundtrip(tmp_path):
    src = _src(tmp_path)
    jpg = str(tmp_path / "out.jpg")
    ppm = str(tmp_path / "out.ppm")
    assert main(["encode", src, jpg, "--quality", "85"]) == 0
    assert open(jpg, "rb").read()[:2] == b"\xff\xd8"
    assert main(["decode", jpg, ppm, "--host"]) == 0
    rec = read_ppm(ppm)
    assert rec.shape == read_ppm(src).shape


def test_cli_resize_and_stage_tools(tmp_path):
    src = _src(tmp_path)
    out = str(tmp_path / "r.ppm")
    assert main(["resize", src, out, "48x32"]) == 0
    assert read_ppm(out).shape == (32, 48, 3)

    d = str(tmp_path / "parts")
    assert main(["dump-stages", src, d]) == 0
    assert sorted(os.listdir(d))[0] == "Cb-Dct"
    assert main(["compare-dirs", d, d]) == 0


def test_cli_diff(tmp_path):
    src = _src(tmp_path)
    img = read_ppm(src)
    changed = img.copy()
    changed[8:40, 8:40] = 255 - changed[8:40, 8:40]
    a, b = str(tmp_path / "a.ppm"), str(tmp_path / "b.ppm")
    write_ppm(a, img)
    write_ppm(b, changed)
    outdir = str(tmp_path / "regions")
    assert main(["diff", a, b, outdir]) == 0
    files = os.listdir(outdir)
    assert files and all(f.startswith("jpg-") for f in files)


def test_cli_decode_batch(tmp_path):
    import numpy as np

    from jpeg_tpu.__main__ import main
    from jpeg_tpu.core.types import EncodeConfig
    from jpeg_tpu.io.ppm import read_ppm
    from jpeg_tpu.pipelines.encode import JpegEncoder

    rng = np.random.default_rng(0)
    paths = []
    for k in range(2):
        img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        p = tmp_path / f"in{k}.jpg"
        p.write_bytes(JpegEncoder(EncodeConfig()).encode(img))
        paths.append(str(p))
    out = tmp_path / "out"
    assert main(["decode-batch", *paths, "--outdir", str(out)]) in (0, None)
    for k in range(2):
        got = read_ppm(str(out / f"in{k}.ppm"))
        assert got.shape == (32, 32, 3)
