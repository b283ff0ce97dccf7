"""Device entropy decode lane-scaling curve (VERDICT r4 #1 evidence).

Fixed total work — the 16x640x640 bench batch — encoded at varying
restart layouts so the decode kernel sees 32 / 128 / 640 / 1280 lanes.
The lockstep kernel decodes 128-lane groups with G-way group
interleave (G=5 at 640+ lanes); if the wall is flat once lanes >= 640
(full occupancy: one grid pass, 5 interleaved groups), then
multiplying lanes further (e.g. by intra-segment entry speculation)
cannot speed up the full-occupancy bench shape — speculation's win is
confined to UNDER-occupied decodes (few segments), which is exactly
how pipelines.decode routes it.

Run: python bench/decode_scaling.py
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
    from jpeg_tpu.kernels import huffdec as hd
    from jpeg_tpu.pipelines.fast import FastBatchEncoder

    from bench import _load_batch

    batch16 = _load_batch()
    h, w = batch16.shape[1:3]

    # (images, segs/image): spi caps at the 40 MCU rows; the >640-lane
    # point doubles the batch instead (2 sequential grid passes at G=5)
    for B, spi in ((16, 2), (16, 8), (16, 40), (32, 40)):
        batch_np = (batch16 if B == 16 else
                    np.concatenate([batch16, batch16[:, ::-1]], axis=0))
        mp = B * h * w / 1e6
        enc = FastBatchEncoder(
            h, w, config=EncodeConfig(scan_layout="interleaved",
                                      huffman="fixed"),
            segs_per_image=spi)
        jpegs = enc.encode_batch(
            jnp.asarray(batch_np.reshape(B, h, w * 3)))
        st = hd.parse_scan_structure(jpegs[0])
        mcus = (h // 16) * (w // 16)
        s_per = mcus // st["restart_interval"]
        segs = []
        for j in jpegs:
            stj = hd.parse_scan_structure(j)
            segs.extend(hd.unstuff_segments(stj["entropy"],
                                            n_expected=s_per))
        S = len(segs)
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

        r1, r2 = hd_loop(3), hd_loop(9)
        d32 = jnp.int32(3)
        int(np.asarray(r1(*dargs, d32)))
        int(np.asarray(r2(*dargs, d32)))

        def t(r):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                int(np.asarray(r(*dargs, d32)))
                best = min(best, time.perf_counter() - t0)
            return best
        ms = (t(r2) - t(r1)) / 6 * 1000.0
        print(f"lanes={S:5d} (spi={spi:3d}, {nblk_seg:5d} blk/lane, "
              f"max_words={max_words:5d}): {ms:7.2f} ms/batch = "
              f"{mp / ms * 1000:7.1f} MP/s", flush=True)


if __name__ == "__main__":
    main()
