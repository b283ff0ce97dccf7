"""Real-TPU verification drive for the pending-on-hardware checklist.

Everything here is already interpret/CPU-verified by the test suite; this
script's job is the FIRST Mosaic compile + run of each kernel family on
the actual chip (tunneled axon), asserting byte/pixel parity against the
host oracles.  Run it after any outage or Mosaic/toolchain change:

    python bench/tpu_drive.py            # full drive (~minutes: compiles)

Covers, in order (fail-fast):
  1. device probe (trivial device_put with a deadline — dead-tunnel guard)
  2. fixed-path fused encode (front_place mega kernel) bytes == golden C
     mirror bytes, 420/422/444
  3. dynamic-Huffman fast path bytes == golden
  4. device entropy decode (kernels/huffdec.py restart-lane kernel,
     interpret=False) == host decode, 420/422/444
  5. speculative decode of non-restart streams (3-scan + interleaved)
     == host decode

Prints one PASS/FAIL line per stage and exits non-zero on first failure.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def _probe():
    os.makedirs("/tmp/jax_cache", exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    t0 = time.time()
    x = jax.device_put(np.arange(16, dtype=np.int32))
    assert int(np.asarray(x)[7]) == 7
    print(f"PASS probe ({time.time() - t0:.2f}s, {jax.devices()[0]})")


def _img(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    img[:, : w // 2, 0] = ((yy * 3 + xx) % 256).astype(np.uint8)[:, : w // 2]
    return img


def _stage(name, fn):
    t0 = time.time()
    try:
        fn()
    except Exception as e:  # noqa: BLE001 - drive reports and aborts
        print(f"FAIL {name} ({time.time() - t0:.1f}s): {type(e).__name__}: {e}")
        sys.exit(1)
    print(f"PASS {name} ({time.time() - t0:.1f}s)")


def drive_fixed_encode():
    """Engine parity on hardware: fused Pallas bytes == XLA engine bytes.

    (The host golden oracle is NOT byte-comparable here: on TPU the f32
    DCT rounds a ~1e-3 fraction of coefficients one quant step from the
    host f64-order numbers — documented in ops/dct.py.  The Mosaic and
    XLA engines, however, are built to round bit-equally.)"""
    from jpeg_tpu.core.types import EncodeConfig
    from jpeg_tpu.pipelines.encode import JpegEncoder
    from jpeg_tpu.pipelines.fast import FastBatchEncoder

    img = _img(128, 128, seed=5)
    for samp in ("420", "422", "444"):
        cfg = EncodeConfig(scan_layout="interleaved", huffman="fixed",
                           restart_interval_mcu_rows=2, subsampling=samp)
        enc = FastBatchEncoder(128, 128, config=cfg)
        got = bytes(enc.encode_batch(np.stack([img, img[::-1].copy()]))[0])
        assert b"\xff\xdd" in got, f"fixed {samp}: DRI marker missing"
        xla = bytes(JpegEncoder(EncodeConfig(
            scan_layout="interleaved", huffman="fixed",
            restart_interval_mcu_rows=2, subsampling=samp,
            engine="xla")).encode(img))
        assert got == xla, f"fixed {samp}: fast bytes != xla engine bytes"


def drive_dynamic_encode():
    from jpeg_tpu.core.types import EncodeConfig
    from jpeg_tpu.pipelines.encode import JpegEncoder
    from jpeg_tpu.pipelines.fast import FastBatchEncoder

    img = _img(128, 128, seed=6)
    cfg = EncodeConfig(scan_layout="interleaved", huffman="dynamic",
                       restart_interval_mcu_rows=2)
    enc = FastBatchEncoder(128, 128, config=cfg)
    got = bytes(enc.encode_batch(img[None])[0])
    want = bytes(JpegEncoder(EncodeConfig(
        scan_layout="interleaved", huffman="dynamic",
        restart_interval_mcu_rows=2, engine="xla")).encode(img))
    assert got == want, "dynamic: fast bytes != xla engine bytes"


def drive_device_entropy_decode():
    from jpeg_tpu.core.types import EncodeConfig
    from jpeg_tpu.pipelines.decode import decode_jpeg
    from jpeg_tpu.pipelines.encode import JpegEncoder

    for samp in ("420", "422", "444"):
        img = _img(96, 96, seed=11)
        cfg = EncodeConfig(scan_layout="interleaved", huffman="fixed",
                           restart_interval_mcu_rows=2, subsampling=samp)
        data = bytes(JpegEncoder(cfg).encode(img))
        got = decode_jpeg(data, entropy_engine="device")
        ref = decode_jpeg(data, entropy_engine="host")
        assert np.array_equal(got, ref), f"device decode {samp} != host"


def drive_speculative_decode():
    from jpeg_tpu.core.types import EncodeConfig
    from jpeg_tpu.pipelines.decode import decode_jpeg
    from jpeg_tpu.pipelines.encode import JpegEncoder

    # noise-heavy 512x512: big enough scans to clear the speculative
    # path's lane-occupancy thresholds (_MIN_LANES / _TARGET_LANE_BYTES)
    img = _img(512, 512, seed=21)
    # 3-scan layout, no restarts (the reference's own default output)
    d3 = bytes(JpegEncoder(EncodeConfig()).encode(img))
    # interleaved single scan, no DRI (default libjpeg shape)
    din = bytes(JpegEncoder(EncodeConfig(
        scan_layout="interleaved", huffman="fixed")).encode(img))
    for name, data in (("3scan", d3), ("interleaved", din)):
        got = decode_jpeg(data, entropy_engine="device")
        ref = decode_jpeg(data, entropy_engine="host")
        assert np.array_equal(got, ref), f"speculative {name} != host"


def drive_app_surface():
    """BucketedEncoder (mixed resolutions) + ChangeMonitor (the
    reference's surveillance loop, adaptive cadence) on the real chip —
    the app-level surfaces above the kernels the other stages cover."""
    import io

    import numpy as np
    from PIL import Image

    from jpeg_tpu.core.types import EncodeConfig
    from jpeg_tpu.pipelines.bucket import BucketedEncoder
    from jpeg_tpu.pipelines.monitor import ChangeMonitor

    img = _img(256, 256, 5)
    small = np.ascontiguousarray(img[:128, :128])
    be = BucketedEncoder(config=EncodeConfig(scan_layout="interleaved",
                                             huffman="fixed"))
    outs = be.encode([img, small, img])
    for o, wh in zip(outs, [(256, 256), (128, 128), (256, 256)]):
        im = Image.open(io.BytesIO(bytes(o)))
        im.load()
        assert im.size == wh, (im.size, wh)

    mon = ChangeMonitor(256, 256)
    mon.process_frame(img)
    moved = img.copy()
    moved[64:192, 64:192] = np.roll(moved[64:192, 64:192], 31, axis=0)
    res = mon.process_frame(moved)
    assert res.changed and res.suggested_delay == 1.0
    for _a, jb in res.regions:
        im = Image.open(io.BytesIO(bytes(jb)))
        im.load()
    idle = mon.process_frame(moved)
    assert not idle.changed and idle.suggested_delay == 10.0


def drive_sharded():
    """ShardedEncoder (shard_map over a 1-device mesh) byte-identical
    to the fast path on the real chip — the SPMD program the CPU mesh
    tests pin, compiled by the real backend (first verified on hardware
    2026-08-20, fixed AND dynamic modes at 640x640)."""
    import numpy as np

    from jpeg_tpu.core.types import EncodeConfig
    from jpeg_tpu.parallel.mesh import make_mesh
    from jpeg_tpu.parallel.sharded import ShardedEncoder
    from jpeg_tpu.pipelines.fast import FastBatchEncoder

    imgs = np.stack([_img(256, 256, s) for s in (7, 8)])
    mesh = make_mesh(data=1, space=1)
    cfg = EncodeConfig(scan_layout="interleaved", huffman="fixed")
    got = ShardedEncoder(mesh, 256, 256, config=cfg,
                         segs_per_device=2).encode_batch(imgs)
    want = FastBatchEncoder(256, 256, config=cfg,
                            segs_per_image=2).encode_batch(imgs)
    assert [bytes(a) for a in got] == [bytes(b) for b in want]


def main():
    _stage("probe", _probe)
    _stage("fixed_encode", drive_fixed_encode)
    _stage("dynamic_encode", drive_dynamic_encode)
    _stage("device_entropy_decode", drive_device_entropy_decode)
    _stage("speculative_decode", drive_speculative_decode)
    _stage("app_surface", drive_app_surface)
    _stage("sharded", drive_sharded)
    print("DRIVE OK")


if __name__ == "__main__":
    main()
