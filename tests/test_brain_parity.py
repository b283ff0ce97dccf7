"""Comparator parity with the reference's compiled ``main/brain.c``.

Builds the reference comparator into a host oracle binary at test time
(geometry patched to the 640x640 fixture, driver in ``brain_driver.c``) and
cross-checks ``FrameComparator`` against it: subsample arithmetic,
``enlargeAdjust`` arithmetic, and full ``compare`` region outputs.

Documented divergences this test pins down (see PARITY.md):

* BGR: the reference's ``subsample`` swaps its camera's BGR buffer to RGB
  (brain.c:25-41); this framework is RGB-native, so the C output equals
  ours channel-reversed.
* Dropped edge runs: the reference's run-stitching flushes a row's runs at
  the start of the *next* row and only counts runs closed by a
  below-threshold pixel, so (a) a run touching a row's right edge is never
  closed and (b) the final row is never flushed — those differences are
  silently discarded (brain.c:122-209).  Our 8-connected component pass
  keeps them; the parity tests avoid/exercise the edge cases explicitly.
* Post-adjust ``sumAreas`` (brain.c:96-99) takes max of w/h *sizes* where
  bounding-box union needs max of extents, so C merge results can
  under-cover; we merge to the true bounding union.
"""
import os
import shutil
import subprocess

import numpy as np
import pytest

from jpeg_tpu.pipelines import diff as D

REF_MAIN = "/root/reference/main/brain.c"
REF_INC = "/root/reference/include"
DRIVER = os.path.join(os.path.dirname(__file__), "brain_driver.c")
W = H = 640  # full-res geometry baked into the oracle build
SW, SH = W // 4, H // 4  # subsampled geometry


@pytest.fixture(scope="session")
def brain_oracle(tmp_path_factory):
    if not os.path.exists(REF_MAIN) or shutil.which("gcc") is None:
        pytest.skip("reference source or gcc unavailable")
    d = tmp_path_factory.mktemp("brain")
    (d / "main").mkdir()
    (d / "include").mkdir()
    shutil.copy(REF_MAIN, d / "main" / "brain.c")
    for h in ("brain.h", "structs.h", "define.h"):
        shutil.copy(os.path.join(REF_INC, h), d / "include" / h)
    define = (d / "include" / "define.h").read_text()
    define = define.replace("#define WIDTH 320", f"#define WIDTH {W}")
    define = define.replace("#define HEIGHT 240", f"#define HEIGHT {H}")
    (d / "include" / "define.h").write_text(define)
    shutil.copy(DRIVER, d / "main" / "brain_driver.c")
    binpath = d / "brain_oracle"
    subprocess.run(
        ["gcc", "-O2", "-o", str(binpath),
         str(d / "main" / "brain.c"), str(d / "main" / "brain_driver.c"),
         "-lm"],
        check=True, capture_output=True)
    return str(binpath)


def _c_adjust(oracle, rects):
    inp = "".join(f"{r.x} {r.y} {r.X} {r.Y}\n" for r in rects)
    out = subprocess.run([oracle, "adjust"], input=inp.encode(),
                         capture_output=True, check=True).stdout.decode()
    return [tuple(map(int, line.split())) for line in out.splitlines() if line]


def _c_compare(oracle, tmpdir, new_sub, old_sub):
    """C regions for compare(new, saved=old): list of (x, y, w, h)."""
    a, b = os.path.join(tmpdir, "new.bin"), os.path.join(tmpdir, "old.bin")
    with open(a, "wb") as f:
        f.write(np.ascontiguousarray(new_sub, dtype=np.uint8).tobytes())
    with open(b, "wb") as f:
        f.write(np.ascontiguousarray(old_sub, dtype=np.uint8).tobytes())
    out = subprocess.run([oracle, "compare", a, b], capture_output=True,
                         check=True).stdout.decode()
    return sorted(tuple(map(int, line.split()))
                  for line in out.splitlines() if line)


def _our_regions(new_sub, old_sub):
    comp = D.FrameComparator(H, W)
    comp.store(np.asarray(old_sub))
    return sorted((a.x, a.y, a.w, a.h) for a in comp.compare(new_sub))


def test_subsample_matches_reference(brain_oracle, tmp_path, img640):
    raw = os.path.join(tmp_path, "full.bin")
    with open(raw, "wb") as f:
        f.write(np.ascontiguousarray(img640, dtype=np.uint8).tobytes())
    out = subprocess.run([brain_oracle, "subsample", raw],
                         capture_output=True, check=True).stdout
    c_sub = np.frombuffer(out, np.uint8).reshape(SH, SW, 3)
    ours = np.asarray(D.subsample_4x4(img640))
    # The reference swaps BGR->RGB while subsampling; on RGB input its
    # output is therefore the channel-reversed trunc(/16) box mean.
    np.testing.assert_array_equal(c_sub, ours[..., ::-1])


def test_enlarge_adjust_parity_random(brain_oracle):
    rng = np.random.default_rng(7)
    rects = []
    for _ in range(500):
        x = int(rng.integers(0, SW))
        y = int(rng.integers(0, SH))
        xx = int(rng.integers(x, SW))
        yy = int(rng.integers(y, SH))
        rects.append(D.RawRect(x, y, xx, yy))
    got = _c_adjust(brain_oracle, rects)
    want = [(a.x, a.y, a.w, a.h)
            for a in (D.enlarge_adjust(r, W, H) for r in rects)]
    assert got == want


def _blob_pair(blobs):
    """(new, old) subsampled frames whose change mask is exactly ``blobs``.

    old is flat gray; new flips masked pixels far past the threshold.
    """
    old = np.full((SH, SW, 3), 128, np.uint8)
    new = old.copy()
    for (r0, r1, c0, c1) in blobs:
        new[r0:r1, c0:c1] = 250  # dG^2*4 alone is ~59k >> 600
    return new, old


def test_compare_parity_separated_blobs(brain_oracle, tmp_path):
    """Interior, well-separated blobs: region sets must be identical."""
    rng = np.random.default_rng(3)
    for trial in range(5):
        blobs = []
        # lay blobs on a coarse grid so no post-adjust merge can occur and
        # none touches the right edge / bottom row (the C dropped-run bug)
        for gy in range(4):
            for gx in range(4):
                if rng.random() < 0.5:
                    continue
                r0 = gy * 38 + int(rng.integers(2, 10))
                c0 = gx * 38 + int(rng.integers(2, 10))
                hh = int(rng.integers(1, 12))
                ww = int(rng.integers(1, 12))
                blobs.append((r0, r0 + hh, c0, c0 + ww))
        if not blobs:
            continue
        new, old = _blob_pair(blobs)
        got_c = _c_compare(brain_oracle, tmp_path, new, old)
        got_py = _our_regions(new, old)
        assert got_c == got_py, f"trial {trial}: {got_c} != {got_py}"


def test_compare_parity_touching_runs(brain_oracle, tmp_path):
    """Diagonal runs exercise the transitive ``done`` merges (the growth
    phase, where the reference's sumAreas IS a correct bounding union)."""
    blobs = [
        (10, 11, 10, 30), (11, 12, 29, 50), (12, 13, 49, 60),  # staircase
        (100, 120, 20, 22), (121, 140, 40, 42),  # disjoint
    ]
    new, old = _blob_pair(blobs)
    assert _c_compare(brain_oracle, tmp_path, new, old) == \
        _our_regions(new, old)


def test_post_adjust_merge_divergence(brain_oracle, tmp_path):
    """Pin the documented sumAreas divergence (brain.c:96-99): merging two
    *adjusted* areas takes max(w), max(h) of the sizes, which under-covers
    whenever the wider region does not start leftmost.  Our merge takes the
    true bounding union (re-aligned), which covers both inputs."""
    # two blobs 1 subsampled px apart -> separate components, but their
    # MCU-adjusted areas fall within the 2-px merge distance
    blobs = [(60, 75, 80, 82), (60, 75, 83, 95)]
    new, old = _blob_pair(blobs)
    # adjusted inputs: A=(316,238,16,64), B=(324,238,48,64)
    # C: min x, max w -> (316,.,48,.) covers x in [316,364) — loses B's tail
    assert _c_compare(brain_oracle, tmp_path, new, old) == [(316, 238, 48, 64)]
    # ours: union [316,372) -> w 56 -> re-aligned to (312,.,64,.), covers all
    assert _our_regions(new, old) == [(312, 238, 64, 64)]


def test_reference_drops_edge_runs(brain_oracle, tmp_path):
    """Pin the documented divergence: the C comparator loses runs touching
    a row's right edge and everything in the final subsampled row; our
    component pass keeps them."""
    # blob flush against the right edge, every row of it open-ended
    new, old = _blob_pair([(40, 60, SW - 20, SW)])
    assert _c_compare(brain_oracle, tmp_path, new, old) == []
    # (enlargeAdjust shifts x/y by 8 even when w/h are already multiples
    # of 16 — (16 - 0)/2 — so the box sits 8 px up-left of the blob)
    assert _our_regions(new, old) == [(W - 88, 152, 80, 80)]

    # blob confined to the last subsampled row: flushed never
    new, old = _blob_pair([(SH - 1, SH, 40, 80)])
    assert _c_compare(brain_oracle, tmp_path, new, old) == []
    [(x, y, w, h)] = _our_regions(new, old)
    assert y + h == H and w >= 160


def test_compare_fixture_pair(brain_oracle, tmp_path, img640, img640_diffs):
    """Reference fixture pair: C regions vs ours, pinned exactly.

    Three of the four regions agree byte-for-byte; the third differs only
    by the post-adjust sumAreas divergence (C: y=66, h=336 under-covers
    the merged pair; ours: y=60, h=368 is the true union).  Our union must
    cover every C region.  If either implementation drifts, this fails.
    """
    old = np.asarray(D.subsample_4x4(img640))
    new = np.asarray(D.subsample_4x4(img640_diffs))
    got_c = _c_compare(brain_oracle, tmp_path, new, old)
    got_py = _our_regions(new, old)

    assert got_c == [(2, 36, 112, 432), (146, 412, 176, 144),
                     (358, 66, 256, 336), (406, 476, 192, 160)]
    assert got_py == [(2, 36, 112, 432), (146, 412, 176, 144),
                      (358, 60, 256, 368), (406, 476, 192, 160)]

    cover = np.zeros((H, W), bool)
    for (x, y, w, h) in got_py:
        cover[y:y + h, x:x + w] = True
    for (x, y, w, h) in got_c:
        assert cover[y:y + h, x:x + w].all(), (
            f"C region {(x, y, w, h)} not covered by ours {got_py}")
