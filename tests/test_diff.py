"""Comparator pipeline (brain) tests: subsample, change mask, regions,
MCU alignment, and the full monitor loop on the reference fixture pair."""
import numpy as np
import pytest

from jpeg_tpu.core.types import Area
from jpeg_tpu.golden import decoder as gdec
from jpeg_tpu.io.editimage import pad_to_multiple, resize_pad
from jpeg_tpu.pipelines import diff as D
from jpeg_tpu.pipelines.monitor import ChangeMonitor


def test_subsample_box_mean_truncates():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(16, 32, 3)).astype(np.uint8)
    out = np.asarray(D.subsample_4x4(img))
    assert out.shape == (4, 8, 3)
    # exact integer-truncated 4x4 box mean
    ref = img.astype(np.int64).reshape(4, 4, 8, 4, 3).sum(axis=(1, 3)) // 16
    np.testing.assert_array_equal(out, ref.astype(np.uint8))


def test_change_mask_threshold_semantics():
    a = np.full((8, 8, 3), 100, np.uint8)
    b = a.copy()
    b[2, 3] = [100, 113, 100]   # dG^2*4 = 676 > 600
    b[5, 5] = [100, 112, 100]   # dG^2*4 = 576 < 600
    mask = np.asarray(D.change_mask(b, a))
    assert mask[2, 3] and not mask[5, 5]
    assert mask.sum() == 1


def test_find_regions_8_connectivity_with_gap():
    mask = np.zeros((10, 10), bool)
    mask[1, 1:4] = True
    mask[2, 4] = True       # diagonal adjacency (beg == end+1) -> connects
    mask[2, 6] = True       # gap of 2 from col 4 -> separate run, no connect
    mask[5, 8] = True       # separate region
    rects = D.find_regions(mask)
    assert len(rects) == 3
    big = max(rects, key=lambda r: r.X - r.x)
    assert (big.x, big.y, big.X, big.Y) == (1, 1, 4, 2)


def test_enlarge_adjust_matches_reference_arithmetic():
    # rect rows 3..4, cols 2..6 (subsampled) in a 320x240 frame
    a = D.enlarge_adjust(D.RawRect(2, 3, 6, 4), 320, 240)
    # w=5*4=20 -> 32 wide (center-expanded), h=2*4=8 -> 16 tall
    assert a.w % 16 == 0 and a.h % 16 == 0
    assert a.w == 32 and a.h == 16
    assert a.x <= 8 <= a.x + a.w and a.y <= 12 <= a.y + a.h
    assert 0 <= a.x and a.x + a.w <= 320 and 0 <= a.y and a.y + a.h <= 240


def test_filter_small_drops_16x16_only():
    keep = Area(x=0, y=0, w=32, h=16)
    drop = Area(x=0, y=0, w=16, h=16)
    assert D.filter_small([keep, drop]) == [keep]


def test_comparator_on_reference_fixture_pair(img640, img640_diffs):
    comp = D.FrameComparator(640, 640)
    comp.store(comp.subsample(img640))
    areas = comp.compare(comp.subsample(img640_diffs))
    assert areas, "fixture pair must produce difference regions"
    # every region must be MCU-aligned and in-bounds
    diff_px = np.argwhere(np.any(img640 != img640_diffs, axis=-1))
    covered = np.zeros(len(diff_px), bool)
    for a in areas:
        assert a.w % 16 == 0 and a.h % 16 == 0
        assert a.x + a.w <= 640 and a.y + a.h <= 640
        inside = ((diff_px[:, 0] >= a.y) & (diff_px[:, 0] < a.y + a.h) &
                  (diff_px[:, 1] >= a.x) & (diff_px[:, 1] < a.x + a.w))
        covered |= inside
    # strongly-changed pixels should overwhelmingly fall inside regions
    assert covered.mean() > 0.9


def test_identical_frames_produce_no_regions(img640):
    comp = D.FrameComparator(640, 640)
    sub = comp.subsample(img640)
    comp.store(sub)
    assert comp.compare(sub) == []


def test_monitor_end_to_end(img640, img640_diffs):
    mon = ChangeMonitor(640, 640)
    first = mon.process_frame(img640)
    assert not first.changed  # seeds the stored frame
    second = mon.process_frame(img640_diffs)
    assert second.changed
    for area, data in second.regions:
        rec = gdec.decode(data)
        assert rec.shape == (area.h, area.w, 3)
        window = np.asarray(img640_diffs)[area.y:area.y + area.h,
                                          area.x:area.x + area.w]
        assert gdec.psnr(rec, window) > 20.0
    # a third identical frame is quiet again
    third = mon.process_frame(img640_diffs)
    assert not third.changed
    # adaptive cadence (main/main.c:154-158,164): fast poll after a
    # change, back off when idle
    from jpeg_tpu.pipelines.monitor import ACTIVE_DELAY_S, IDLE_DELAY_S
    assert second.suggested_delay == ACTIVE_DELAY_S
    assert first.suggested_delay == IDLE_DELAY_S
    assert third.suggested_delay == IDLE_DELAY_S


def test_resize_pad_and_multiple():
    img = np.zeros((20, 30, 3), np.uint8)
    out = resize_pad(img, 40, 16)
    assert out.shape == (16, 40, 3)
    assert (out[:, 30:] == 0xFF).all() and (out[:16, :30] == 0).all()
    out2 = pad_to_multiple(np.zeros((17, 33, 3), np.uint8))
    assert out2.shape == (32, 48, 3)


def test_snap_multiple_bounds_region_shapes(img640, img640_diffs):
    comp = D.FrameComparator(640, 640, snap_multiple=64)
    comp.store(comp.subsample(img640))
    areas = comp.compare(comp.subsample(img640_diffs))
    assert areas
    for a in areas:
        # snapped unless clamped by the frame edge
        assert a.w % 64 == 0 or a.w == 640
        assert a.h % 64 == 0 or a.h == 640
        assert a.w % 16 == 0 and a.h % 16 == 0


def test_comparator_save_load_roundtrip(tmp_path, img640, img640_diffs):
    comp = D.FrameComparator(640, 640)
    comp.store(comp.subsample(img640))
    path = str(tmp_path / "stored.npy")
    comp.save(path)

    fresh = D.FrameComparator(640, 640)
    fresh.load(path)
    areas_a = comp.compare(comp.subsample(img640_diffs))
    areas_b = fresh.compare(fresh.subsample(img640_diffs))
    assert areas_a == areas_b and areas_a


def test_pairwise_batch_matches_sequential(img640, img640_diffs):
    frames = np.stack([img640, img640_diffs, img640_diffs])
    comp = D.FrameComparator(640, 640)
    batched = comp.compare_pairwise_batch(frames)
    assert len(batched) == 2
    # frame1 vs frame0 == the stored-frame compare on the same pair
    comp.store(comp.subsample(frames[0]))
    assert batched[0] == comp.compare(comp.subsample(frames[1]))
    # identical consecutive frames -> no regions
    assert batched[1] == []
