"""A/B the mega-kernel slab chunk width (cbp) on hardware.

``front.py::_pick_slab_pad`` currently picks the LARGEST 128-multiple
chunk dividing the slab columns (the whole slab when sc % 128 == 0).
Smaller chunks re-amortize the place tail's fixed costs differently
(shorter row-accumulation spans per chunk, more chunk prologues); this
sweeps the divisors with the shipped unroll factors.  Byte parity is
structural (chunking never changes the math — the DC chain and carry
cross chunks); tests pin it on the 128-aligned geometries.
Run: python bench/cbp_profile.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


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
    sc = kfront.slab_cols(mx, "420")
    cands = [c for c in (sc, 1024, 640, 512, 384, 256)
             if c <= sc and sc % c == 0 and c % 128 == 0]

    enc = F.FastBatchEncoder(H, W, config=EncodeConfig(
        scan_layout="interleaved", huffman="fixed"))
    assert enc._front_ok
    rng = np.random.default_rng(17)
    deltas = [jax.device_put(jnp.uint8(int(v)))
              for v in rng.integers(2, 255, 64)]
    jax.block_until_ready(deltas)
    di = [0]
    orig_pick = kfront._pick_slab_pad

    def slope(n1=4, n2=16, reps=3):
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
            int(np.asarray(r(batch, deltas[di[0] % 64])))
            best = 1e9
            for _ in range(reps):
                di[0] += 1
                t0 = time.perf_counter()
                int(np.asarray(r(batch, deltas[di[0] % 64])))
                best = min(best, time.perf_counter() - t0)
            return best
        return (t(r2) - t(r1)) / (n2 - n1) * 1000.0

    print(f"batch = {B} x {W}x{H} = {mp:.2f} MP, sc = {sc}, "
          f"candidates = {cands}", flush=True)
    best = (None, 1e9)
    for cand in cands:
        kfront._pick_slab_pad = lambda s, c=cand: (s, c)
        kfront.front_place.clear_cache()
        ms = slope()
        print(f"cbp={cand:<5} {ms:9.3f} ms ({mp / (ms / 1000):.0f} MP/s)",
              flush=True)
        if ms < best[1]:
            best = (cand, ms)
    kfront._pick_slab_pad = orig_pick
    print(f"best: cbp={best[0]} {best[1]:.3f} ms "
          f"({mp / (best[1] / 1000):.0f} MP/s)")


if __name__ == "__main__":
    main()
