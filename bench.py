"""Headline benchmark: batch JPEG encode throughput (MP/s) on one chip.

End-to-end: uint8 RGB batch in HBM -> JFIF byte strings (device fused
analyze+pack step, host bitstream finalization), 640x640 fixture, 4:2:0,
fixed Annex K.3 tables, interleaved scan — the production batch fast path.

Baseline: the C reference's own golden encoder (``utils/original.c``)
compiled -O2 and timed on this host, summing its per-stage timers excluding
PPM file read (best of 10 runs — see BASELINE.md): 19.0 MP/s single-core.

Prints exactly one JSON line.
"""
import json
import os
import sys
import time

import numpy as np

# Baseline measured on the bench host (see BASELINE.md "Measured" section).
C_REFERENCE_MPS = 19.0

BATCH = int(os.environ.get("BENCH_BATCH", "16"))
ITERS = int(os.environ.get("BENCH_ITERS", "10"))


def _load_batch():
    path = "/root/reference/images/sample_640x640.ppm"
    if os.path.exists(path):
        from jpeg_tpu.io.ppm import read_ppm
        img = read_ppm(path)
    else:
        rng = np.random.default_rng(0)
        yy, xx = np.mgrid[0:640, 0:640]
        base = ((yy // 16 + xx // 16) % 2) * 180 + 40
        img = np.clip(np.stack([base, 255 - base, xx % 256], axis=-1)
                      + rng.integers(-20, 21, size=(640, 640, 3)),
                      0, 255).astype(np.uint8)
    return np.stack([np.roll(img, 16 * i, axis=0) for i in range(BATCH)])


def main():
    import jax

    from jpeg_tpu.core.types import EncodeConfig
    from jpeg_tpu.parallel.mesh import make_mesh
    from jpeg_tpu.parallel.sharded import ShardedEncoder

    batch = _load_batch()
    h, w = batch.shape[1:3]
    mesh = make_mesh(data=1, space=1)
    enc = ShardedEncoder(
        mesh, h, w,
        config=EncodeConfig(scan_layout="interleaved", huffman="fixed"),
        segs_per_device=1)

    # Warmup (compile) + correctness probe.
    out = enc.encode_batch(batch)
    assert all(j[:2] == b"\xff\xd8" and j[-2:] == b"\xff\xd9" for j in out)

    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        enc.encode_batch(batch)
        times.append(time.perf_counter() - t0)

    best = min(times)
    mps = (batch.shape[0] * h * w) / best / 1e6
    print(json.dumps({
        "metric": "batch_encode_throughput",
        "value": round(mps, 2),
        "unit": "MP/s",
        "vs_baseline": round(mps / C_REFERENCE_MPS, 2),
    }))
    print(f"# platform={jax.devices()[0].platform} batch={BATCH} "
          f"best={best*1000:.1f}ms median={sorted(times)[len(times)//2]*1000:.1f}ms",
          file=sys.stderr)


if __name__ == "__main__":
    main()
