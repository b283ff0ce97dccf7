"""A/B the place-tail fori unroll factors on hardware.

Sweeps (kernels.fused._PACK_UNROLL, _ROWACC_UNROLL) over the full
front_place mega kernel with the cache-proof fori-slope methodology
(see bench.py).  Byte parity across factors is pinned by
tests/test_engines.py::test_place_unroll_parity; this script only
answers which factor is fastest on the real chip.
Run: python bench/unroll_profile.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

COMBOS = [(1, 1), (2, 1), (4, 1), (2, 2), (4, 2)]


def main():
    os.makedirs("/tmp/jax_cache", exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from jpeg_tpu.core.types import EncodeConfig
    from jpeg_tpu.kernels import front as kfront
    from jpeg_tpu.kernels import fused as kf
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

    def slope(n1=4, n2=16, reps=2):
        def make(n):
            @jax.jit
            def run(b, d):
                def body(i, c):
                    seed, acc = c
                    o, tot = kfront.front_place(
                        b ^ (seed + d), enc._fixed_lut, enc._dct_m,
                        enc._dct_bias, enc._ql_zz, enc._qc_zz, mx, my,
                        "420", enc.seg_rows)
                    s = jnp.sum(o, dtype=jnp.uint32)
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

    print(f"batch = {B} x {W}x{H} = {mp:.2f} MP")
    best = (None, 1e9)
    for pu, ru in COMBOS:
        kf._PACK_UNROLL, kf._ROWACC_UNROLL = pu, ru
        kfront.front_place.clear_cache()
        ms = slope()
        print(f"pack_u={pu} rowacc_u={ru}  {ms:9.3f} ms "
              f"({mp / (ms / 1000):.0f} MP/s)", flush=True)
        if ms < best[1]:
            best = ((pu, ru), ms)
    print(f"best: pack_u={best[0][0]} rowacc_u={best[0][1]} "
          f"{best[1]:.3f} ms ({mp / (best[1] / 1000):.0f} MP/s)")


if __name__ == "__main__":
    main()
