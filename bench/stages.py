"""Per-stage device timing — the TPU analog of the reference's stage
timers (``utils/original.c:1160-1336``).  Run: python bench/stages.py"""
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

    from jpeg_tpu.core import tables as T
    from jpeg_tpu.core.types import EncodeConfig
    from jpeg_tpu.ops import color as C, dct as D
    from jpeg_tpu.pipelines import fast as F

    from bench import _load_batch  # repo-root bench.py helpers

    batch_np = _load_batch()
    B, H, W = batch_np.shape[0], batch_np.shape[1], batch_np.shape[2]
    # minor-flattened [B, H, W*3] — the layout the jitted steps consume
    # (see FastBatchEncoder._check_batch); stage fns unflatten in-jit
    batch = jax.device_put(jnp.asarray(batch_np.reshape(B, H, W * 3)))
    jax.block_until_ready(batch)
    mp = B * H * W / 1e6

    lq, cq = (jnp.asarray(x) for x in T.quant_tables())
    enc = F.FastBatchEncoder(H, W, config=EncodeConfig(
        scan_layout="interleaved", huffman="fixed"))
    dyn = F.FastBatchEncoder(H, W, config=EncodeConfig(
        scan_layout="interleaved", huffman="dynamic"))

    unflat = lambda b: b.reshape(B, H, W, 3)
    color = jax.jit(lambda b: C.rgb_to_ycbcr_420(unflat(b)))
    dcts = jax.jit(lambda y, cb, cr: (
        D.dct_quantize_zigzag(C.to_blocks(y), lq),
        D.dct_quantize_zigzag(C.to_blocks(cb), cq),
        D.dct_quantize_zigzag(C.to_blocks(cr), cq)))
    azz = jax.jit(lambda b: F.analyze_zz(unflat(b), lq, cq, W // 16, H // 16, 1))
    apx = jax.jit(lambda b: F.analyze_px(unflat(b), W // 16, H // 16, 1))
    step = enc.step

    # warm up all
    planes = color(batch)
    zz = dcts(*planes)
    seq = azz(batch)
    px = apx(batch)
    out = step(batch)
    ah = dyn._analyze_hist(batch)
    tables, luts = dyn._build_tables_batch(np.asarray(ah[1]))
    po = dyn._pack_only(ah[0], jnp.asarray(luts))
    jax.block_until_ready((seq, out, ah, po))

    # Amortized timing: enqueue ITERS dispatches, block once — isolates
    # device time from the per-call host->device dispatch latency (which
    # dominates on tunneled chips; locally the two coincide).
    ITERS = 10

    def amortized(name, fn, *args):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            o = fn(*args)
        jax.block_until_ready(o)
        ms = (time.perf_counter() - t0) / ITERS * 1000.0
        print(f"{name:<52}{ms:10.3f} ms")
        return ms

    amortized("RGB->YCbCr + 4:2:0", color, batch)
    amortized("DCT + quantize + zig-zag (3 planes)", dcts, *planes)
    amortized("analyze_zz (color+DCT+interleave+DC diff)", azz, batch)
    amortized("analyze_px (color+interleave, XLA front)", apx, batch)
    step_ms = amortized("full fixed step (px + fused DCT/sym/attach/pack)",
                        step, batch)
    amortized("dynamic stage 1 (analyze + Pallas symbolize + MXU hist)",
              dyn._analyze_hist, batch)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        tables, luts = dyn._build_tables_batch(np.asarray(ah[1]))
    print(f"{'dynamic host K.2 builds + LUTs (16 images)':<52}"
          f"{(time.perf_counter() - t0) / ITERS * 1000.0:10.3f} ms")
    amortized("dynamic stage 2 (grouped attach + pack)",
              dyn._pack_only, ah[0], jnp.asarray(luts))
    print(f"\nbatch = {B} x {W}x{H} = {mp:.2f} MP; "
          f"device throughput = {mp / (step_ms / 1000):.1f} MP/s")


if __name__ == "__main__":
    main()
