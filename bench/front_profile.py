"""Phase attribution INSIDE the mega kernel's front (the dominant phase
after the r5 MXU row accumulation: ~0.62 of the 1.40 ms step).

Slope-times the front's truncations — deinterleave+color ("front_deint"),
+ block exchanges ("front_exchange"), + window matmuls ("front") — and
the full step; deltas attribute the front's cost to its sub-phases.
Run: python bench/front_profile.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

PHASES = ["front_deint", "front_exchange", "front", "full"]


def main():
    os.makedirs("/tmp/jax_cache", exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from jpeg_tpu.core.types import EncodeConfig
    from jpeg_tpu.kernels import front as kfront
    from jpeg_tpu.pipelines import fast as F

    from bench import _load_batch

    batch_np = _load_batch()
    B, H, W = batch_np.shape[0], batch_np.shape[1], batch_np.shape[2]
    batch = jax.device_put(jnp.asarray(batch_np.reshape(B, H, W * 3)))
    jax.block_until_ready(batch)
    mp = B * H * W / 1e6
    mx, my = W // 16, H // 16

    enc = F.FastBatchEncoder(H, W, config=EncodeConfig(
        scan_layout="interleaved", huffman="fixed"))
    assert enc._front_ok
    rng = np.random.default_rng(13)
    deltas = [jax.device_put(jnp.uint8(int(v)))
              for v in rng.integers(2, 255, 64)]
    jax.block_until_ready(deltas)
    di = [0]

    def nd():
        di[0] += 1
        return deltas[(di[0] - 1) % len(deltas)]

    def loop(stop, n):
        @jax.jit
        def run(b, d):
            def body(i, c):
                seed, acc = c
                w_, t_ = kfront.front_place(
                    b ^ (seed + d), enc._fixed_lut[None, :], enc._dct_m,
                    enc._dct_bias, enc._ql_zz, enc._qc_zz, mx, my, "420",
                    enc.seg_rows, real_height=H, n_segs=1,
                    stop_after=stop)
                s = jnp.sum(w_, dtype=jnp.uint32) \
                    + jnp.sum(t_).astype(jnp.uint32)
                return (s & 1).astype(jnp.uint8), acc + s
            return jax.lax.fori_loop(0, n, body,
                                     (jnp.uint8(0), jnp.uint32(0)))[1]
        return run

    prev = 0.0
    for ph in PHASES:
        r1, r2 = loop(ph, 4), loop(ph, 16)
        int(np.asarray(r1(batch, nd())))
        int(np.asarray(r2(batch, nd())))

        def t(r):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                int(np.asarray(r(batch, nd())))
                best = min(best, time.perf_counter() - t0)
            return best
        ms = (t(r2) - t(r1)) / 12 * 1000.0
        print(f"{ph:<16}{ms:8.3f} ms  (+{ms - prev:7.3f})", flush=True)
        prev = ms
    print(f"batch = {B} x {W}x{H} = {mp:.2f} MP", flush=True)


if __name__ == "__main__":
    main()
