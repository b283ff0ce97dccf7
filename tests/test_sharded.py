"""Multi-chip sharded encode on an 8-device CPU mesh (SURVEY §8.2 phase 3).

The strongest check: the spatially-sharded encoder (each device owning one
restart-delimited slab of MCU rows) must be byte-identical to the
single-device interleaved encoder with the same restart interval — sharding
is purely a parallel decomposition, not a format change.
"""
import numpy as np
import pytest

import jax

from jpeg_tpu.core.types import EncodeConfig
from jpeg_tpu.golden import decoder as gdec
from jpeg_tpu.parallel.mesh import make_mesh
from jpeg_tpu.parallel.sharded import ShardedEncoder
from jpeg_tpu.pipelines.encode import JpegEncoder


def _batch(img, b):
    return np.stack([np.roll(img, i * 7, axis=1) for i in range(b)])


@pytest.fixture(scope="module")
def mesh24():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(data=2, space=4)


def test_sharded_matches_single_device_bytes(mesh24, img_synthetic_160):
    img = np.asarray(img_synthetic_160)[:128, :96]  # 128 rows -> 32-row slabs
    batch = _batch(img, 4)

    cfg = EncodeConfig(scan_layout="interleaved", huffman="dynamic",
                       restart_interval_mcu_rows=2, dtype="float64")
    single = JpegEncoder(cfg)
    expected = [single.encode(batch[i]) for i in range(4)]

    enc = ShardedEncoder(mesh24, 128, 96, config=cfg, segs_per_device=1)
    got = enc.encode_batch(batch)
    assert [bytes(g) for g in got] == expected


def test_sharded_fixed_tables_decodes(mesh24, img_synthetic_160):
    img = np.asarray(img_synthetic_160)[:128, :96]
    batch = _batch(img, 2)
    cfg = EncodeConfig(scan_layout="interleaved", huffman="fixed",
                       restart_interval_mcu_rows=2, dtype="float64")
    enc = ShardedEncoder(mesh24, 128, 96, config=cfg, segs_per_device=1)
    out = enc.encode_batch(batch)
    # Huffman tables change only the bit encoding, never the coefficients:
    # the fixed-table output must decode to exactly the dynamic-table pixels.
    dyn = JpegEncoder(EncodeConfig(scan_layout="interleaved", huffman="dynamic",
                                   restart_interval_mcu_rows=2, dtype="float64"))
    for i in range(2):
        rec = gdec.decode(out[i])
        ref = gdec.decode(dyn.encode(batch[i]))
        np.testing.assert_array_equal(rec, ref)
        # sanity floor only: the rolled checkerboard misaligns edges with the
        # block grid, so absolute PSNR is content-limited (~17 dB at i=1)
        assert gdec.psnr(rec, batch[i]) > 15.0


def test_sharded_multiseg_per_device(mesh24, img_synthetic_160):
    img = np.asarray(img_synthetic_160)[:128, :96]
    batch = _batch(img, 2)
    cfg = EncodeConfig(scan_layout="interleaved", huffman="dynamic",
                       restart_interval_mcu_rows=1, dtype="float64")
    single = JpegEncoder(cfg)
    expected = [single.encode(batch[i]) for i in range(2)]
    enc = ShardedEncoder(mesh24, 128, 96, config=cfg, segs_per_device=2)
    got = enc.encode_batch(batch)
    assert [bytes(g) for g in got] == expected


def test_sharded_pallas_engine_matches_xla(mesh24, img_synthetic_160):
    img = np.asarray(img_synthetic_160)[:128, :96]
    batch = _batch(img, 2)
    base = dict(scan_layout="interleaved", huffman="fixed",
                restart_interval_mcu_rows=2)
    xla = ShardedEncoder(mesh24, 128, 96,
                         config=EncodeConfig(engine="xla", **base))
    pal = ShardedEncoder(mesh24, 128, 96,
                         config=EncodeConfig(engine="pallas", **base))
    assert [bytes(b) for b in pal.encode_batch(batch)] == \
           [bytes(b) for b in xla.encode_batch(batch)]


@pytest.mark.parametrize("sampling", ["422", "444"])
def test_sharded_non420_matches_single_device_bytes(mesh24,
                                                    img_synthetic_160,
                                                    sampling):
    """4:2:2/4:4:4 are first-class in the sharded encoder: byte-identical
    to the single-device interleaved encoder (8px MCU rows -> 4 MCU rows
    per 32-row slab)."""
    img = np.asarray(img_synthetic_160)[:128, :96]
    batch = _batch(img, 2)
    cfg = EncodeConfig(scan_layout="interleaved", huffman="dynamic",
                       subsampling=sampling, restart_interval_mcu_rows=4,
                       dtype="float64")
    single = JpegEncoder(cfg)
    expected = [single.encode(batch[i]) for i in range(2)]
    enc = ShardedEncoder(mesh24, 128, 96, config=cfg, segs_per_device=1)
    got = enc.encode_batch(batch)
    assert [bytes(g) for g in got] == expected


@pytest.mark.parametrize("sampling", ["422", "444"])
def test_sharded_non420_pallas_engine_matches_xla(mesh24, img_synthetic_160,
                                                  sampling):
    img = np.asarray(img_synthetic_160)[:128, :96]
    batch = _batch(img, 2)
    base = dict(scan_layout="interleaved", huffman="fixed",
                subsampling=sampling, restart_interval_mcu_rows=4)
    xla = ShardedEncoder(mesh24, 128, 96,
                         config=EncodeConfig(engine="xla", **base))
    pal = ShardedEncoder(mesh24, 128, 96,
                         config=EncodeConfig(engine="pallas", **base))
    assert [bytes(b) for b in pal.encode_batch(batch)] == \
           [bytes(b) for b in xla.encode_batch(batch)]


def test_fused_step_is_jitted_end_to_end(mesh24, img_synthetic_160):
    img = np.asarray(img_synthetic_160)[:128, :96]
    batch = _batch(img, 2)
    cfg = EncodeConfig(scan_layout="interleaved", huffman="fixed")
    enc = ShardedEncoder(mesh24, 128, 96, config=cfg)
    words, totals, hists = enc.step(batch)
    assert words.shape[0] == 2 and words.shape[1] == enc.n_segments
    assert int(np.asarray(totals).min()) > 0
    assert hists.shape == (2, 4, 256)


def test_sharded_front_mega_matches_xla(img_synthetic_160):
    """When the per-device slab is front-eligible (128-row slabs, slab-
    aligned restart segments), the Pallas engine rides the front_place
    mega kernel and must still match the XLA engine byte-for-byte."""
    mesh = make_mesh(data=2, space=2)
    img = np.tile(np.asarray(img_synthetic_160)[:128, :64], (2, 2, 1))
    batch = _batch(img, 2)  # 256x128: slab_h = 128 per space shard
    base = dict(scan_layout="interleaved", huffman="fixed",
                restart_interval_mcu_rows=8)
    xla = ShardedEncoder(mesh, 256, 128,
                         config=EncodeConfig(engine="xla", **base))
    pal = ShardedEncoder(mesh, 256, 128,
                         config=EncodeConfig(engine="pallas", **base))
    # the interpret-mode Pallas path must actually take the front branch
    from jpeg_tpu.kernels import front as kfront
    assert kfront.front_eligible(pal.slab_h, pal.width, pal.sampling,
                                 pal.segs_per_device)
    assert [bytes(b) for b in pal.encode_batch(batch)] == \
           [bytes(b) for b in xla.encode_batch(batch)]
