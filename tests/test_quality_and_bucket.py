"""Quality scaling and mixed-resolution bucketed batching."""
import numpy as np

from jpeg_tpu.core import tables as T
from jpeg_tpu.core.types import EncodeConfig
from jpeg_tpu.golden import decoder as gdec
from jpeg_tpu.pipelines.bucket import BucketedEncoder
from jpeg_tpu.pipelines.encode import JpegEncoder


def test_set_quality_matches_reference_formula():
    q75 = T.set_quality(T.LUMA_QUANTIZER, 75)
    # q' = CLIP(trunc((100-q)/50 * t), 1, 255) — utils/original.c:504-509
    exp = np.clip(np.trunc(0.5 * T.LUMA_QUANTIZER), 1, 255)
    np.testing.assert_array_equal(q75, exp)
    assert T.set_quality(T.LUMA_QUANTIZER, 100).max() == 1  # all ones
    assert (T.set_quality(T.LUMA_QUANTIZER, 1) >=
            T.LUMA_QUANTIZER.astype(np.int64) * 0).all()


def test_quality_sweep_monotonic(img64):
    img = np.asarray(img64)
    sizes, psnrs = [], []
    for q in (25, 50, 75, 90):
        data = JpegEncoder(EncodeConfig(quality=q)).encode(img)
        sizes.append(len(data))
        psnrs.append(gdec.psnr(gdec.decode(data), img))
    assert sizes == sorted(sizes), f"sizes not monotonic: {sizes}"
    assert psnrs == sorted(psnrs), f"psnr not monotonic: {psnrs}"


def test_bucketed_mixed_resolutions(img_synthetic_160):
    big = np.asarray(img_synthetic_160)          # 160x96
    small = big[:64, :64]
    imgs = [big, small, big, small, small]
    enc = BucketedEncoder(interpret=True)
    out = enc.encode(imgs)
    assert len(out) == 5
    for img, data in zip(imgs, out):
        rec = gdec.decode(data)
        assert rec.shape == img.shape
    # same-geometry images share one cached encoder
    assert len(enc._encoders) == 2


def test_bucketed_ragged_auto_pad(img_synthetic_160):
    """encode_any pads arbitrary dims to the MCU grid and declares true
    sizes; every stream must decode at its true size.  (Padding cannot
    exceed the MCU grid — T.81 derives the MCU count from the SOF dims —
    so bucketing granularity is exactly the MCU grid.)"""
    from jpeg_tpu.golden import decoder as gdec
    img = np.asarray(img_synthetic_160)
    raggeds = [img[:37, :50], img[:64, :64], img[:61, :64], img[:100, :90]]
    enc = BucketedEncoder(interpret=True)
    out = enc.encode_any(raggeds)
    # 61x64 pads to the same 64x64 grid as the exact 64x64 image;
    # 37x50 -> 48x64 and 100x90 -> 112x96 get their own buckets
    assert len(enc._encoders) == 3
    for src, data in zip(raggeds, out):
        rec = gdec.decode(data)
        assert rec.shape == src.shape
        assert gdec.psnr(rec, src) > 18.0
