"""Micro-sweep of the device entropy decode knobs on hardware.

Sweeps (kernels.huffdec._SYM_GROUP, _PEEL_LUMA) around the shipped
default — (5, 19) since 2026-08-20 (the sweep itself flipped SG 6 -> 5;
see huffdec.py's _SYM_GROUP comment) — on the bench decode shape
(16 images x 40 restart segments = 640 lanes, G=5), slope-timing
decode_segments.  The peel/SG values are
pure performance knobs — byte parity is pinned by
tests/test_huffdec.py::test_peel_production_parity.
Run: python bench/decode_tune.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

COMBOS = [(6, 19), (7, 19), (5, 19), (6, 17), (6, 21), (7, 21)]


def main():
    os.makedirs("/tmp/jax_cache", exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from jpeg_tpu.core.types import EncodeConfig
    from jpeg_tpu.kernels import huffdec as hd
    from jpeg_tpu.pipelines.fast import FastBatchEncoder

    from bench import _load_batch

    batch_np = _load_batch()
    B, h, w = batch_np.shape[0], batch_np.shape[1], batch_np.shape[2]
    enc8 = FastBatchEncoder(
        h, w, config=EncodeConfig(scan_layout="interleaved",
                                  huffman="fixed"), segs_per_image=40)
    jpegs8 = enc8.encode_batch(batch_np.reshape(B, h, w, 3))
    st = hd.parse_scan_structure(jpegs8[0])
    mcus = (h // 16) * (w // 16)
    s_per = mcus // st["restart_interval"]
    segs = []
    for j in jpegs8:
        stj = hd.parse_scan_structure(j)
        segs.extend(hd.unstuff_segments(stj["entropy"], n_expected=s_per))
    S = len(segs)
    mp = B * h * w / 1e6
    streams, active, max_words = hd.pack_streams(segs)
    tabs = st["tabs"]
    c0, c1 = st["comps"][0][0], st["comps"][1][0]
    quad = (st["dht"][(0, tabs[c0][0])], st["dht"][(1, tabs[c0][1])],
            st["dht"][(0, tabs[c1][0])], st["dht"][(1, tabs[c1][1])])
    maxc, delt, hvp = hd.lane_tables([quad] * S)
    pad_mask = np.zeros_like(streams)
    for i, s in enumerate(segs):
        pad_mask[i, -(-len(s) // 4) + 1] = 1
    nblk_seg = st["restart_interval"] * 6
    dargs = tuple(jax.device_put(jnp.asarray(a)) for a in (
        streams, pad_mask, maxc, delt, hvp, active * nblk_seg))
    jax.block_until_ready(dargs)

    def hd_loop(n):
        @jax.jit
        def run(sw, pm, mc, dl, hp, ac, d):
            def body(i, c):
                seed, acc = c
                out = hd.decode_segments(
                    sw ^ (pm * (seed + d)), mc, dl, hp, ac, "420",
                    nblk_seg, max_words)
                s = jnp.sum(out, dtype=jnp.int32)
                return (s & 1) + 1, acc + s
            return jax.lax.fori_loop(0, n, body, (d, jnp.int32(0)))[1]
        return run

    def hd_slope(n1=5, n2=25, reps=3):
        r1, r2 = hd_loop(n1), hd_loop(n2)
        d32 = jnp.int32(3)
        int(np.asarray(r1(*dargs, d32)))
        int(np.asarray(r2(*dargs, d32)))

        def t(r):
            best = 1e9
            for _ in range(reps):
                t0 = time.perf_counter()
                int(np.asarray(r(*dargs, d32)))
                best = min(best, time.perf_counter() - t0)
            return best
        return (t(r2) - t(r1)) / (n2 - n1) * 1000.0

    print(f"decode shape: {S} lanes, nblk_seg={nblk_seg}, "
          f"max_words={max_words}, {mp:.2f} MP", flush=True)
    best = (None, 1e9)
    for sg, peel in COMBOS:
        hd._SYM_GROUP = sg
        hd._NW_GROUP = hd._nw_for(sg)
        hd._group_fetch.__defaults__ = (hd._NW_GROUP,)
        hd._PEEL_LUMA = peel
        hd.decode_segments.clear_cache()
        ms = hd_slope()
        print(f"SG={sg} peel={peel}  {ms:9.3f} ms/batch "
              f"({mp / ms * 1000:.0f} MP/s)", flush=True)
        if ms < best[1]:
            best = ((sg, peel), ms)
    print(f"best: SG={best[0][0]} peel={best[0][1]} {best[1]:.3f} ms "
          f"({mp / best[1] * 1000:.0f} MP/s)")


if __name__ == "__main__":
    main()
