"""Surveillance-diff workload benchmark (SURVEY §8.2 phase 4).

Streams N synthetic frames (a moving block over the 640x640 fixture)
through the comparator + ROI encoder and reports frames/s plus region
stats — the batch analog of the reference's capture/compare/encode loop.

Run: python bench/diff_bench.py [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def _frames(n):
    from bench import _load_batch
    base = _load_batch()[0]
    h, w = base.shape[:2]
    for i in range(n):
        f = base.copy()
        if i:  # frame 0 seeds the stored reference
            x = (40 + 17 * i) % (w - 96)
            y = (60 + 11 * i) % (h - 96)
            f[y:y + 96, x:x + 96] = 255 - f[y:y + 96, x:x + 96]
        yield f


def main():
    os.makedirs("/tmp/jax_cache", exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from jpeg_tpu.pipelines.monitor import ChangeMonitor
    from jpeg_tpu.utils.profiling import encode_metrics

    mon = ChangeMonitor(640, 640, snap_multiple=64)
    frames = list(_frames(n))
    mon.process_frame(frames[0])  # seed + compile

    regions = 0
    total_bytes = 0
    t0 = time.perf_counter()
    for f in frames[1:]:
        res = mon.process_frame(f)
        regions += len(res.regions)
        total_bytes += sum(len(d) for _, d in res.regions)
    dt = time.perf_counter() - t0
    fps = (n - 1) / dt
    print(f"frames={n - 1}  fps={fps:.1f}  regions={regions}  "
          f"region_bytes={total_bytes}  "
          f"({fps * 0.4096:.1f} MP/s of full frames scanned)")
    print("# note: per-frame latency-bound on tunneled chips (~10 host<->device "
          "round trips/frame); local-PCIe TPU hosts run this 30-50x faster")


if __name__ == "__main__":
    main()
