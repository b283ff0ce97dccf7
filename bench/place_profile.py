"""Phase attribution inside the front_place mega kernel.

Runs the mega kernel repeatedly with the profiling-only ``stop_after``
knob (front -> sym -> attach -> pack -> shift -> rotate -> mask ->
full), slope-timing each truncation; successive deltas attribute the
step time to each phase.  This is the in-kernel drill-down under
``bench/stages.py`` — use it to decide which phase of the place chain
to attack next.  Run: python bench/place_profile.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

PHASES = ["front", "sym", "attach", "pack", "shift", "rotate", "mask",
          "full"]


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

    def slope(stop, n1=4, n2=16, reps=2, impl="full"):
        def make(n):
            @jax.jit
            def run(b, d):
                def body(i, c):
                    seed, acc = c
                    o, tot = kfront.front_place(
                        b ^ (seed + d), enc._fixed_lut, enc._dct_m,
                        enc._dct_bias, enc._ql_zz, enc._qc_zz, mx, my,
                        "420", enc.seg_rows, stop_after=stop,
                        place_impl=impl)
                    s = jnp.sum(o, dtype=jnp.uint32)
                    if stop == "full":  # totals defined only here
                        s = s + jnp.sum(tot).astype(jnp.uint32)
                    return (s & 1).astype(jnp.uint8), acc + s
                return jax.lax.fori_loop(0, n, body,
                                         (jnp.uint8(0), jnp.uint32(0)))[1]
            return run

        r1, r2 = make(n1), make(n2)

        def t(r):
            di[0] += 1
            int(np.asarray(r(batch, deltas[di[0] % 64])))  # settle/compile
            best = 1e9
            for _ in range(reps):
                di[0] += 1
                t0 = time.perf_counter()
                int(np.asarray(r(batch, deltas[di[0] % 64])))
                best = min(best, time.perf_counter() - t0)
            return best
        return (t(r2) - t(r1)) / (n2 - n1) * 1000.0

    prev = 0.0
    print(f"batch = {B} x {W}x{H} = {mp:.2f} MP")
    for ph in PHASES:
        ms = slope(ph)
        print(f"{ph:<10}{ms:9.3f} ms  (+{ms - prev:7.3f})", flush=True)
        prev = ms
    print(f"full-phase throughput = {mp / (prev / 1000):.0f} MP/s")

    # A/B: the 16-row local-pack place variant (kernels/fused.py
    # _place_tail_w16) vs the shipped full path
    w16 = slope("full", impl="w16")
    print(f"place_impl=w16 {w16:9.3f} ms ({mp / (w16 / 1000):.0f} MP/s) "
          f"vs full {prev:.3f} ms — "
          f"{'WIN' if w16 < prev else 'no win'} "
          f"{abs(prev - w16) / prev * 100:.1f}%", flush=True)


if __name__ == "__main__":
    main()
