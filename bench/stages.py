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
    from jpeg_tpu.kernels import lut as klut
    from jpeg_tpu.kernels import pack as kpack
    from jpeg_tpu.ops import color as C, dct as D, symbols as S
    from jpeg_tpu.pipelines import fast as F
    from jpeg_tpu.utils.profiling import StageTimer

    from bench import _load_batch  # repo-root bench.py helpers

    batch = jax.device_put(jnp.asarray(_load_batch()))
    jax.block_until_ready(batch)
    B, H, W = batch.shape[0], batch.shape[1], batch.shape[2]
    mp = B * H * W / 1e6

    lq, cq = (jnp.asarray(x) for x in T.quant_tables())
    enc = F.FastBatchEncoder(H, W, config=EncodeConfig(
        scan_layout="interleaved", huffman="fixed"))

    color = jax.jit(lambda b: C.rgb_to_ycbcr_420(b))
    dcts = jax.jit(lambda y, cb, cr: (
        D.dct_quantize_zigzag(C.to_blocks(y), lq),
        D.dct_quantize_zigzag(C.to_blocks(cb), cq),
        D.dct_quantize_zigzag(C.to_blocks(cr), cq)))
    inter = jax.jit(lambda zy, zcb, zcr: F.interleave_segments(
        zy, zcb, zcr, W // 16, H // 16, 1))
    symb = jax.jit(S.symbolize)
    ana = jax.jit(enc._analyze_batch)
    step = enc.step

    # warm up all
    planes = color(batch)
    zz = dcts(*planes)
    seq = inter(*zz)
    slots_s = symb(seq)
    slots = ana(batch)
    out = step(batch)
    jax.block_until_ready((slots_s, slots, out))

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
        print(f"{name:<46}{ms:10.3f} ms")
        return ms

    amortized("RGB->YCbCr + 4:2:0", color, batch)
    amortized("DCT + quantize + zig-zag (3 planes)", dcts, *planes)
    amortized("MCU interleave + DC diff", inter, *zz)
    amortized("run-length symbolization", symb, seq)
    amortized("full analyze (fused)", ana, batch)
    step_ms = amortized("full device step (analyze+attach+pack)", step, batch)
    print(f"\nbatch = {B} x {W}x{H} = {mp:.2f} MP; "
          f"device throughput = {mp / (step_ms / 1000):.1f} MP/s")


if __name__ == "__main__":
    main()
