"""Per-stage device timing — the TPU analog of the reference's stage
timers (``utils/original.c:1160-1336``).  Run: python bench/stages.py

Every device stage is timed with the cache-proof fori-slope methodology
(carry-dependent inputs, fetched scalar result, slope of two loop
lengths — see bench.py and CLAUDE.md: on the tunneled chip both plain
block_until_ready and repeated same-input dispatch timings lie).
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

    from bench import _load_batch  # repo-root bench.py helpers

    batch_np = _load_batch()
    B, H, W = batch_np.shape[0], batch_np.shape[1], batch_np.shape[2]
    batch = jax.device_put(jnp.asarray(batch_np.reshape(B, H, W * 3)))
    jax.block_until_ready(batch)
    mp = B * H * W / 1e6
    mx, my = W // 16, H // 16

    enc = F.FastBatchEncoder(H, W, config=EncodeConfig(
        scan_layout="interleaved", huffman="fixed"))
    dyn = F.FastBatchEncoder(H, W, config=EncodeConfig(
        scan_layout="interleaved", huffman="dynamic"))
    rng = np.random.default_rng(11)
    deltas = [jax.device_put(jnp.uint8(int(v)))
              for v in rng.integers(2, 255, 64)]
    jax.block_until_ready(deltas)
    di = [0]

    def slope(fn, n1=4, n2=16, reps=2, on=None):
        """fn maps a perturbed batch to output(s); returns ms/iteration."""
        data = batch if on is None else on

        def make(n):
            @jax.jit
            def run(b, d):
                def body(i, c):
                    seed, acc = c
                    o = fn(b ^ (seed + d))
                    s = sum(jnp.sum(x, dtype=jnp.uint32) for x in
                            (o if isinstance(o, tuple) else (o,)))
                    return (s & 1).astype(jnp.uint8), acc + s
                return jax.lax.fori_loop(0, n, body,
                                         (jnp.uint8(0), jnp.uint32(0)))[1]
            return run
        r1, r2 = make(n1), make(n2)
        int(np.asarray(r1(data, deltas[di[0]]))); di[0] += 1
        int(np.asarray(r2(data, deltas[di[0]]))); di[0] += 1

        def t(r):
            best = 1e9
            for _ in range(reps):
                d = deltas[di[0]]; di[0] += 1
                t0 = time.perf_counter()
                int(np.asarray(r(data, d)))
                best = min(best, time.perf_counter() - t0)
            return best
        return (t(r2) - t(r1)) / (n2 - n1) * 1000.0

    def report(name, ms):
        print(f"{name:<58}{ms:10.3f} ms")

    pargs = (enc._dct_m, enc._dct_bias, enc._ql_zz, enc._qc_zz)

    report("front (deint+color+4:2:0+relayout, one Pallas kernel)",
           slope(lambda b: kfront.front_analyze(b, mx, my, "420")))
    report("front+index (dynamic stage-1 feed)",
           slope(lambda b: kfront.front_index(b, *pargs, mx, my, "420")))
    s1 = slope(lambda b: dyn._analyze_hist_fn(b)[1])
    report("dynamic stage 1 (front+index + MXU histograms)", s1)
    step_ms = slope(lambda b: enc._step_fn(b, enc._fixed_lut))
    report("full fixed step (front_place mega-kernel)", step_ms)

    # host K.2 builds (wall clock — pure host)
    fields, h = dyn._analyze_hist(batch)
    h_np = np.asarray(h)
    tables, luts = dyn._build_tables_batch(h_np)
    t0 = time.perf_counter()
    for _ in range(10):
        dyn._build_tables_batch(h_np)
    report("dynamic host K.2 builds + LUTs (16 images, wall)",
           (time.perf_counter() - t0) / 10 * 1000.0)

    luts_d = jax.device_put(jnp.asarray(luts))
    jax.block_until_ready(luts_d)
    # stage 2 as production runs it (_pack_only over stage 1's fields):
    # on front-eligible geometries that is attach_pack_pf over stage 1's
    # PACKED symbol fields — no front/DCT/symbolize re-run — time the
    # real chain (stage 1 + stage 2) and report stage 2 as the
    # difference, exactly like bench.py's roofline rows
    def chain(b):
        # consume the HISTOGRAM too: stage 1's hist output feeds the
        # host K.2 build (not stage 2), so a chain that drops it lets
        # XLA dead-code the whole one-hot pass and s2 comes out ~0.9 ms
        # too low (r5 bug: the 2026-08-20 run printed s2=0.35 ms vs the
        # correctly-consumed 1.28 ms in bench.py)
        fields, h = dyn._analyze_hist_fn(b)
        return tuple(dyn._pack_only_fn(fields, luts_d)) + (h,)

    s12 = slope(chain)
    s2 = max(s12 - s1, 1e-3)
    report("dynamic stage 2 (pf attach+place, per-image LUTs; chain-s1)",
           s2)

    # Progressive successive-approximation encode (host-side refinement
    # coder by design — TODO.md "Capabilities"): one wall number so the
    # by-design claim is evidence-backed.  This is a latency/feature
    # path, not a throughput path; compare per-image against the C
    # reference baseline (~21.6 ms for this fixture), not the device
    # steps above.
    from jpeg_tpu.pipelines.progressive import encode_progressive
    img0 = batch_np[0]
    encode_progressive(img0, EncodeConfig(), successive=True)  # warm
    t0 = time.perf_counter()
    reps_sa = 3
    for _ in range(reps_sa):
        encode_progressive(img0, EncodeConfig(), successive=True)
    sa_ms = (time.perf_counter() - t0) / reps_sa * 1000.0
    report("progressive SA encode (1 x 640x640, wall incl. host coder)",
           sa_ms)
    print(f"  -> {H * W / sa_ms / 1e3:.1f} MP/s/img "
          f"(C reference baseline: 19.0 MP/s)")

    # Non-128-multiple width: phantom-padded slab columns keep such
    # geometries on the Pallas front (front_eligible allows any W%16==0
    # up to 4096); this row proves the per-MP cost stays front-kernel
    # class instead of falling back to the ~4 ms XLA front.
    W2 = 1008  # 63 MCU columns: not a multiple of 128 (or even 64) px
    img2 = np.concatenate([batch_np[0], batch_np[0]], axis=1)[:, :W2]
    b2_np = np.stack([np.roll(img2, 16 * i, axis=0) for i in range(B)])
    batch2 = jax.device_put(jnp.asarray(b2_np.reshape(B, H, W2 * 3)))
    jax.block_until_ready(batch2)
    enc2 = F.FastBatchEncoder(H, W2, config=EncodeConfig(
        scan_layout="interleaved", huffman="fixed"))
    assert enc2._front_ok, "W=1008 must ride the Pallas front"
    mp2 = B * H * W2 / 1e6
    step2_ms = slope(lambda b: enc2._step_fn(b, enc2._fixed_lut), on=batch2)
    report(f"full fixed step, W={W2} (non-128-multiple, phantom pad)",
           step2_ms)
    print(f"  -> {mp2 / (step2_ms / 1000):.0f} MP/s on {mp2:.2f} MP "
          f"(vs {mp / (step_ms / 1000):.0f} MP/s at W={W})")

    print(f"\nbatch = {B} x {W}x{H} = {mp:.2f} MP")
    print(f"fixed device throughput   = {mp / (step_ms / 1000):.0f} MP/s")
    print(f"dynamic device throughput = {mp / ((s1 + s2) / 1000):.0f} MP/s "
          f"(stages 1+2; histogram sync + host builds pipeline behind "
          f"other batches' device work)")


if __name__ == "__main__":
    main()
