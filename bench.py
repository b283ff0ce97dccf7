"""Headline benchmark: single-chip JPEG encode throughput (MP/s).

Measures the fused device encode step (color convert -> 4:2:0 -> DCT/quant/
zigzag -> symbolization -> Pallas Huffman attach -> Pallas parallel bit
packing) on the 640x640 reference fixture, batch of 16, fixed Annex K.3
tables, interleaved scan.  This mirrors the C reference's own measurement
convention (its per-stage timers exclude file read: in-memory pixels ->
JPEG bits).

Timing methodology (this environment's tunneled TPU makes naive timing
lie in BOTH directions — see CLAUDE.md): the step runs inside a
``lax.fori_loop`` whose carry XORs the input each iteration (so no
execution can be cached/replayed/hoisted/DCE'd), the loop result is a
scalar reduction of the full output that is FETCHED to host (the tunnel's
block_until_ready returns early for small programs), and the per-step
time is the slope between two loop lengths (removes dispatch + fetch
constants).

Baseline: the reference's golden encoder (``utils/original.c``) compiled
-O2 on this host: 19.0 MP/s single-core best-of-10 (BASELINE.md).

Prints exactly one JSON line.
"""
import json
import os
import sys
import time

import numpy as np

C_REFERENCE_MPS = 19.0

# Roofline anchors: TPU v5e (the bench chip) public specs — 819 GB/s HBM
# bandwidth, 197 TFLOP/s bf16 MXU peak.  The attribution below prints
# each measured stage's achieved HBM GB/s and MXU TFLOP/s as a % of
# these, so "fast" claims are self-auditing (VERDICT r2 #7).
HBM_GBPS = 819.0
MXU_TFLOPS = 197.0
# VPU peak estimate: 8x128 = 1024 vector lanes, ~4 ALU ops/lane/cycle,
# ~1.5 GHz (the clock implied by the public 197 TF/s bf16 MXU figure:
# 4 MXUs x 128x128 x 2 x 1.5e9).  An ESTIMATE — used only to bound the
# mega kernel's VPU utilization so "VPU-work-bound" is quantified
# (VERDICT r4 #5); the op COUNT below is the load-bearing number.
VPU_TOPS = 6.1


def vpu_ops_fixed_step(sc: int, slabs: int, avg_bits_per_block: float
                       = 450.0) -> float:
    """Analytic VECTOR-LANE op count (adds/compares/selects/shifts on
    (8,128) vregs x 1024 lanes) of the mega kernel's entropy phases per
    batch, from the kernel structure (kernels/fused.py):

    per slab of ``sc`` 128-block columns, counting ops on [64, cb]
    arrays as 4*cb lane-ops per single full-array op pass:
      * symbolize: ~64 elementwise/roll passes     -> 4.0 * sc vregs
      * attach: 6 LUT rows x (bcast+gather+select) -> 2.3 * sc
      * offsets/cumsum + shift + rotate (incl XLU) -> 5.6 * sc
      * local-pack word loop: ~16 iters x 2 masked
        reductions over [64, cb]                   -> 4.0 * sc
      * row accumulation: ~(128*avg_bits/4096 + 2)
        iters x 2 masked [256,128] reductions/win  -> ~8.3 * sc
    front relayout ops (exchange8 XLU transposes, color int math) are
    NOT counted (they are XLU/load-bound, not ALU-bound), so the true
    VPU load is strictly higher: the printed utilization is a LOWER
    bound.  One vreg = 1024 lane-ops.
    """
    rowacc = (128.0 * avg_bits_per_block / 4096.0 + 2) / 16.0 * 8.3
    vregs_per_slab = (4.0 + 2.3 + 5.6 + 4.0 + rowacc) * sc
    return vregs_per_slab * slabs * 1024.0


def _roofline(name, ms, hbm_bytes, mxu_flops, lines):
    gbps = hbm_bytes / (ms / 1e3) / 1e9
    tf = mxu_flops / (ms / 1e3) / 1e12
    lines.append(
        f"#   {name:<28}{ms:8.2f}ms  HBM {gbps:6.1f} GB/s "
        f"({gbps / HBM_GBPS * 100:4.1f}%)  MXU {tf:6.2f} TF/s "
        f"({tf / MXU_TFLOPS * 100:4.1f}%)")

BATCH = int(os.environ.get("BENCH_BATCH", "16"))
N1 = int(os.environ.get("BENCH_N1", "5"))
N2 = int(os.environ.get("BENCH_N2", "25"))
ITERS = int(os.environ.get("BENCH_ITERS", "20"))  # dynamic-mode pipeline
E2E_ITERS = int(os.environ.get("BENCH_E2E_ITERS", "10"))  # fixed e2e pipeline


def _load_batch():
    path = "/root/reference/images/sample_640x640.ppm"
    if os.path.exists(path):
        from jpeg_tpu.io.ppm import read_ppm
        img = read_ppm(path)
    else:
        rng = np.random.default_rng(0)
        yy, xx = np.mgrid[0:640, 0:640]
        base = ((yy // 16 + xx // 16) % 2) * 180 + 40
        img = np.clip(np.stack([base, 255 - base, xx % 256], axis=-1)
                      + rng.integers(-20, 21, size=(640, 640, 3)),
                      0, 255).astype(np.uint8)
    return np.stack([np.roll(img, 16 * i, axis=0) for i in range(BATCH)])


def _t(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    os.makedirs("/tmp/jax_cache", exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    # The tunneled chip's failure mode is a HANG (see CLAUDE.md); fail
    # fast with a diagnosable message instead of wedging the driver.
    from jpeg_tpu.utils.resilience import probe_device
    # probes measured up to ~380 s under tunnel load (2026-08-20);
    # a short deadline would falsely report a live-but-busy chip dead
    if not probe_device(timeout_s=float(os.environ.get(
            "BENCH_PROBE_TIMEOUT", "900"))):
        print("# device probe timed out: TPU backend unavailable",
              file=sys.stderr)
        sys.exit(1)

    from jpeg_tpu.core.types import EncodeConfig
    from jpeg_tpu.pipelines.fast import FastBatchEncoder

    batch_np = _load_batch()
    h, w = batch_np.shape[1:3]
    enc = FastBatchEncoder(
        h, w, config=EncodeConfig(scan_layout="interleaved", huffman="fixed"),
        segs_per_image=1)
    # minor-flattened on host (free view): the jitted steps consume
    # [B, H, W*3] — see FastBatchEncoder._check_batch for why
    batch = jax.device_put(jnp.asarray(batch_np.reshape(BATCH, h, w * 3)))
    jax.block_until_ready(batch)
    # fresh-input deltas: every timed call sees bytes no earlier call saw
    rng = np.random.default_rng(7)
    deltas = [jax.device_put(jnp.uint8(int(v)))
              for v in rng.integers(2, 255, 128)]
    jax.block_until_ready(deltas)
    _di = [0]

    def next_delta():
        _di[0] += 1
        return deltas[(_di[0] - 1) % len(deltas)]

    _t("warmup fixed")
    # Warmup/compile + correctness probe (PIL-independent: SOI/EOI + decode).
    jpegs = enc.encode_batch(batch)
    assert all(j[:2] == b"\xff\xd8" and j[-2:] == b"\xff\xd9" for j in jpegs)

    def step_loop(n):
        @jax.jit
        def run(b, d):
            def body(i, c):
                seed, acc = c
                words, totals = enc._step_fn(b ^ (seed + d), enc._fixed_lut)
                s = jnp.sum(words, dtype=jnp.uint32)
                return ((s & 1).astype(jnp.uint8),
                        acc + s + jnp.sum(totals).astype(jnp.uint32))
            return jax.lax.fori_loop(0, n, body,
                                     (jnp.uint8(0), jnp.uint32(0)))[1]
        return run

    def slope(mk, n1=N1, n2=N2, reps=3):
        r1, r2 = mk(n1), mk(n2)
        int(np.asarray(r1(batch, next_delta())))   # compile + settle
        int(np.asarray(r2(batch, next_delta())))

        def t(r):
            best = 1e9
            for _ in range(reps):
                t0 = time.perf_counter()
                int(np.asarray(r(batch, next_delta())))
                best = min(best, time.perf_counter() - t0)
            return best
        return (t(r2) - t(r1)) / (n2 - n1)

    _t("measure fixed (fori slope)")

    def robust_slope(mk, tol=0.15, max_extra=2):
        """Cross-checked slope: single slopes on this tunnel occasionally
        land 5-10% slow AND once impossibly fast (0.588 ms that
        re-measured at 1.52 — BASELINE.md r4), so a bare min() would
        publish exactly that outlier.  Take two slopes; if they agree
        within ``tol`` use the min (both credible), else re-measure up
        to ``max_extra`` times and use the MEDIAN of all measurements
        (robust to a single outlier in either direction)."""
        ss = [mk(), mk()]
        if abs(ss[0] - ss[1]) <= tol * max(ss):
            return min(ss)
        for _ in range(max_extra):
            ss.append(mk())
            med = float(np.median(ss))
            close = [s for s in ss if abs(s - med) <= tol * med]
            if len(close) >= 2:
                return min(close)
        return float(np.median(ss))

    dt = robust_slope(lambda: slope(step_loop))
    mps = (BATCH * h * w) / dt / 1e6

    roof = []
    in_bytes = BATCH * h * w * 3
    seg_rows_p = (enc.seg_rows + 7) & ~7
    words_bytes = BATCH * enc.n_segs * seg_rows_p * 128 * 4
    nblk = BATCH * (h // 8) * (w // 8) * 3 // 2   # 4:2:0: Y + Cb/4 + Cr/4
    dct_flops = nblk * 2 * 64 * 64                # flat [*,64]@[64,64] form
    _roofline("fixed step (mega kernel)", dt * 1e3,
              in_bytes + words_bytes, dct_flops, roof)
    # VPU row: quantifies "VPU-work-bound" (VERDICT r4 #5).  avg bits
    # per block from the measured totals of the warmup batch.
    from jpeg_tpu.kernels import front as kfront
    sc = kfront.slab_cols(w // 16, "420")
    slabs = BATCH * ((h + 127) // 128)
    avg_bits = float(np.mean([len(j) * 8 for j in jpegs])) / (nblk / BATCH)
    vops = vpu_ops_fixed_step(sc, slabs, avg_bits)
    vtops = vops / dt / 1e12
    roof.append(
        f"#   fixed step VPU (est. lower bound)  {vops / 1e9:6.2f} Gop "
        f"-> {vtops:5.2f} Top/s (~{vtops / VPU_TOPS * 100:4.1f}% of est. "
        f"{VPU_TOPS} Top/s peak; entropy-phase ops only — front "
        f"relayout excluded)")

    # Secondary: the reference CLI's other headline geometry, 1920x1280
    # (utils/original.c is run on 1920x1280 PPMs; the fixture is absent
    # from the snapshot, so tile the 640x640 one).  A 4-image batch is
    # 9.83 MP — 1.5x the 16x640x640 batch — and the step is latency-
    # bound, so the large geometry amortizes better (measured 322x C).
    big_mps = float("nan")
    try:
        big_np = np.tile(batch_np[0], (2, 3, 1))
        bh, bw = big_np.shape[:2]
        bb_np = np.stack([np.roll(big_np, 16 * i, axis=0) for i in range(4)])
        enc_big = FastBatchEncoder(
            bh, bw, config=EncodeConfig(scan_layout="interleaved",
                                        huffman="fixed"),
            segs_per_image=10)
        bb = jax.device_put(jnp.asarray(bb_np.reshape(4, bh, bw * 3)))
        jax.block_until_ready(bb)

        def big_loop(n):
            @jax.jit
            def run(b, d):
                def body(i, c):
                    seed, acc = c
                    w_, t_ = enc_big._step_fn(b ^ (seed + d),
                                              enc_big._fixed_lut)
                    s = jnp.sum(w_, dtype=jnp.uint32) \
                        + jnp.sum(t_).astype(jnp.uint32)
                    return (s & 1).astype(jnp.uint8), acc + s
                return jax.lax.fori_loop(0, n, body,
                                         (jnp.uint8(0), jnp.uint32(0)))[1]
            return run

        r1b, r2b = big_loop(4), big_loop(16)

        def tb(r):
            int(np.asarray(r(bb, next_delta())))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                int(np.asarray(r(bb, next_delta())))
                best = min(best, time.perf_counter() - t0)
            return best
        big_dt = (tb(r2b) - tb(r1b)) / 12
        big_mp = 4 * bh * bw / 1e6
        big_mps = big_mp / big_dt
        _roofline("fixed step 4x1920x1280", big_dt * 1e3,
                  4 * bh * bw * 3
                  + 4 * 10 * ((enc_big.seg_rows + 7) & ~7) * 128 * 4,
                  4 * (bh // 8) * (bw // 8) * 3 // 2 * 2 * 64 * 64, roof)
    except Exception as e:  # pragma: no cover - platform-dependent
        print(f"# large-geometry bench skipped: {e}", file=sys.stderr)

    # Standing non-420 rows (VERDICT r4 #6): a regression in the 4:4:4
    # front path or the grayscale encoder must be bench-visible.
    _t("444 + grayscale bench")
    mps444 = float("nan")
    gray_ms = float("nan")
    try:
        enc444 = FastBatchEncoder(
            h, w, config=EncodeConfig(scan_layout="interleaved",
                                      huffman="fixed", subsampling="444"),
            segs_per_image=1)

        def s444_loop(n, e=enc444):
            @jax.jit
            def run(b, d):
                def body(i, c):
                    seed, acc = c
                    words, totals = e._step_fn(b ^ (seed + d),
                                               e._fixed_lut)
                    s = jnp.sum(words, dtype=jnp.uint32)
                    return ((s & 1).astype(jnp.uint8),
                            acc + s + jnp.sum(totals).astype(jnp.uint32))
                return jax.lax.fori_loop(0, n, body,
                                         (jnp.uint8(0), jnp.uint32(0)))[1]
            return run

        dt444 = slope(s444_loop)
        mps444 = (BATCH * h * w) / dt444 / 1e6
    except Exception as e:  # pragma: no cover - platform-dependent
        print(f"# 444 bench skipped: {e}", file=sys.stderr)
    try:
        from jpeg_tpu.pipelines.encode import encode_gray
        plane = batch_np[0][:, :, 0].copy()
        d = encode_gray(plane)  # compile + probe
        assert d[:2] == b"\xff\xd8" and d[-2:] == b"\xff\xd9"
        gray_ms = 1e9
        for i in range(3):
            pl_in = plane ^ np.uint8(i + 1)
            t0 = time.perf_counter()
            encode_gray(pl_in)
            gray_ms = min(gray_ms, (time.perf_counter() - t0) * 1e3)
    except Exception as e:  # pragma: no cover - platform-dependent
        print(f"# grayscale bench skipped: {e}", file=sys.stderr)

    # Standing surveillance-diff row (the reference's own control loop,
    # main/main.c:130-166; SURVEY §8.2 phase 4).
    _t("diff workload bench")
    diff_fps = float("nan")
    diff_regions = 0
    try:
        from jpeg_tpu.pipelines.monitor import ChangeMonitor
        mon = ChangeMonitor(h, w, snap_multiple=64)
        nfr = 24
        base = batch_np[0]
        frames = []
        for i in range(nfr):
            f = base.copy()
            if i:
                x = (40 + 17 * i) % (w - 96)
                y = (60 + 11 * i) % (h - 96)
                f[y:y + 96, x:x + 96] = 255 - f[y:y + 96, x:x + 96]
            frames.append(f)
        mon.process_frame(frames[0])  # seed + compile
        mon.process_frame(frames[1])  # compile ROI-encode shapes
        t0 = time.perf_counter()
        for f in frames[2:]:
            res = mon.process_frame(f)
            diff_regions += len(res.regions)
        diff_fps = (nfr - 2) / (time.perf_counter() - t0)
    except Exception as e:  # pragma: no cover - platform-dependent
        print(f"# diff bench skipped: {e}", file=sys.stderr)

    _t("measure e2e")
    # Secondary: e2e bytes-out.  The fetch path predicts per-image word
    # caps from the previous batch and fetches totals + sliced words in
    # ONE link round trip (fast.py::_fetch_assemble); the wall is
    # round-trip + payload-transfer bound on this tunnel.  One warm call
    # settles the slice executables and the caps prediction, then the
    # one-shot number is a single encode_batch and the pipelined number
    # streams E2E_ITERS batches through encode_stream (device step of
    # batch i+1 enqueued before batch i's fetch+assembly).
    xor = jax.jit(lambda b, d: b ^ d)
    # e2e perturbations flip only low bits: fresh bytes every call (the
    # tunnel cannot replay) at a stable compressed size, so the caps
    # prediction and its slice executable stay warm — the content-varying
    # case costs one ~0.7 s slice compile per new size bucket instead,
    # which the ratcheting prediction bounds (fast.py::_fetch_assemble).
    lo_deltas = [jax.device_put(jnp.uint8(v)) for v in (1, 2, 3)]
    jax.block_until_ready(lo_deltas)
    _li = [0]

    def lo_delta():
        _li[0] += 1
        return lo_deltas[_li[0] % len(lo_deltas)]

    enc.encode_batch(xor(batch, lo_delta()))  # settle prediction
    enc.encode_batch(xor(batch, lo_delta()))  # compile predicted-caps slice
    t0 = time.perf_counter()
    enc.encode_batch(xor(batch, lo_delta()))
    e2e = time.perf_counter() - t0
    e2e_mps = (BATCH * h * w) / e2e / 1e6

    # warm pass: same batch count as the timed run so the grouped-fetch
    # stack/concat executables for every group shape (incl. the partial
    # tail group) compile OUTSIDE the timed region
    for out in enc.encode_stream(
            xor(batch, lo_delta()) for _ in range(E2E_ITERS)):
        pass
    n_files = 0
    t0 = time.perf_counter()
    for out in enc.encode_stream(
            xor(batch, lo_delta()) for _ in range(E2E_ITERS)):
        n_files += len(out)
    pipe_dt = (time.perf_counter() - t0) / E2E_ITERS
    assert n_files == BATCH * E2E_ITERS
    pipe_mps = (BATCH * h * w) / pipe_dt / 1e6

    # Secondary: dynamic-Huffman mode (per-image K.2 tables — the
    # reference's actual behavior).  Pipelined: batch i+1's analyze is
    # enqueued before batch i's histogram sync, hiding the device->host
    # histogram fetch and the host table builds behind device compute.
    # Every batch is XOR-perturbed with a fresh delta so no execution can
    # be replayed by the tunnel.
    _t("warmup dynamic")
    dyn_enc = FastBatchEncoder(
        h, w, config=EncodeConfig(scan_layout="interleaved",
                                  huffman="dynamic"), segs_per_image=1)
    analyze = jax.jit(lambda b, d: dyn_enc._analyze_hist_fn(b ^ d))
    out = dyn_enc.dynamic_pack(batch)  # warmup/compile assemble path
    jax.block_until_ready(out[:2])
    fields, hist = analyze(batch, deltas[0])  # compile
    jax.block_until_ready(hist)
    _, luts = dyn_enc._build_tables_batch(np.asarray(hist))
    out = dyn_enc._pack_only(fields, jnp.asarray(luts))  # compile
    jax.block_until_ready(out)

    _t("measure dynamic")
    # True pipelined bytes-out through encode_stream: super-batched
    # histogram sync (K analyzes enqueued, ONE stacked histogram
    # transfer), host K.2 builds + per-image-LUT packs behind the next
    # super-batch's device work, and grouped output fetches (one link
    # round trip per sync_depth packed batches).  Same semantics as the
    # fixed-path pipelined number: complete JPEG files out.  Warm pass
    # compiles every group-shape executable outside the timed region.
    xor_d = jax.jit(lambda b, d: b ^ d)
    for out in dyn_enc.encode_stream(
            xor_d(batch, next_delta()) for _ in range(ITERS)):
        pass
    n_files = 0
    t0 = time.perf_counter()
    for out in dyn_enc.encode_stream(
            xor_d(batch, next_delta()) for _ in range(ITERS)):
        n_files += len(out)
    dyn_dt = (time.perf_counter() - t0) / ITERS
    assert n_files == BATCH * ITERS
    dyn_mps = (BATCH * h * w) / dyn_dt / 1e6

    # Device-bound dynamic throughput (stages 1+2 fori slopes): what the
    # chip itself sustains when the histogram sync and host K.2 builds
    # pipeline behind other batches' device work (they do in
    # encode_stream; this tunnel's 8 MB/s d2h makes the wall number above
    # link-bound, which no real deployment is).
    _t("measure dynamic device")
    luts_d = jnp.asarray(luts)
    jax.block_until_ready(luts_d)

    def dyn_stage_loop(n, full, e=None):
        # full=False: stage 1 only (analyze + hist over the packed
        # fields); full=True: the REAL two-stage device chain exactly as
        # _pack_only consumes stage 1's fields — stage 2 is reported as
        # the difference
        e = e or dyn_enc

        @jax.jit
        def run(b, d):
            def body(i, c):
                seed, acc = c
                bp = b ^ (seed + d)
                fields, hist = e._analyze_hist_fn(bp)
                s = jnp.sum(hist.astype(jnp.uint32))
                if full:
                    words, tot = e._pack_only_fn(fields, luts_d)
                    s = s + jnp.sum(words, dtype=jnp.uint32) \
                        + jnp.sum(tot).astype(jnp.uint32)
                return (s & 1).astype(jnp.uint8), acc + s
            return jax.lax.fori_loop(0, n, body,
                                     (jnp.uint8(0), jnp.uint32(0)))[1]
        return run

    def stage_slope(full, e=None):
        r1 = dyn_stage_loop(N1, full, e)
        r2 = dyn_stage_loop(N2, full, e)
        int(np.asarray(r1(batch, next_delta())))
        int(np.asarray(r2(batch, next_delta())))

        def t(r):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                int(np.asarray(r(batch, next_delta())))
                best = min(best, time.perf_counter() - t0)
            return best
        return (t(r2) - t(r1)) / (N2 - N1)

    s1_dt, tot_dt = stage_slope(False), stage_slope(True)
    s2_dt = max(tot_dt - s1_dt, 1e-6)
    dyn_dev_dt = tot_dt

    # "dynamic-sampled": per-image K.2 tables from a 1/5-sampled
    # +1-floored histogram — same PSNR, ~1% size, and the histogram
    # (the dominant dynamic-only cost) shrinks ~5x.
    dyns_dev_mps = float("nan")
    try:
        _t("measure dynamic-sampled device")
        se = FastBatchEncoder(
            h, w, config=EncodeConfig(scan_layout="interleaved",
                                      huffman="dynamic-sampled"),
            segs_per_image=1)
        outs = se.encode_batch(batch)  # warm + correctness probe
        assert all(j[:2] == b"\xff\xd8" and j[-2:] == b"\xff\xd9"
                   for j in outs)
        dyns_dt = stage_slope(True, se)
        dyns_dev_mps = (BATCH * h * w) / dyns_dt / 1e6
    except Exception as e:  # pragma: no cover - platform-dependent
        print(f"# dynamic-sampled bench skipped: {e}", file=sys.stderr)
    dyn_dev_mps = (BATCH * h * w) / dyn_dev_dt / 1e6
    pf_bytes = 64 * nblk * 4      # [64, nblk] i32 packed symbol fields
    _roofline("dynamic stage 1 (pf+hist)", s1_dt * 1e3,
              in_bytes + 2 * pf_bytes, dct_flops, roof)
    _roofline("dynamic stage 2 (pf attach+place)", s2_dt * 1e3,
              pf_bytes + words_bytes, 0, roof)

    # Secondary: decode. Host-side entropy decode (native C++ bit-walk)
    # feeds the device IDCT/reconstruct; the two stages pipeline across
    # images, so sustained throughput is bounded by the slower stage.
    _t("decode bench")
    from jpeg_tpu.golden.decoder import parse_coefficients
    from jpeg_tpu.pipelines.decode import reconstruct
    # restart-delimited stream: RSTn segments decode thread-parallel in the
    # native bit-walk (jt_decode_scan_mt), the decode-side dual of the
    # encoder's segment-parallel packing
    # 40 segs/img: the encoder-side restart layout that feeds the decode
    # kernels best (640 lanes -> 5 interleaved groups; calibrated
    # 2026-08-19) and also parallelizes the native host bit-walk
    enc8 = FastBatchEncoder(
        h, w, config=EncodeConfig(scan_layout="interleaved",
                                  huffman="fixed"), segs_per_image=40)
    one = enc8.encode_batch(batch[:1])[0]
    comps, coeffs, quant, w2, h2 = parse_coefficients(one)  # warm
    entropy_ms = 1e9
    for _ in range(5):  # best-of: host timing is noisy on a shared box
        t0 = time.perf_counter()
        parse_coefficients(one)
        entropy_ms = min(entropy_ms, (time.perf_counter() - t0) * 1000.0)
    args = tuple(jax.device_put(jnp.asarray(a)) for a in (
        coeffs[comps[0].comp_id], coeffs[comps[1].comp_id],
        coeffs[comps[2].comp_id], quant[comps[0].quant_id],
        quant[comps[1].quant_id]))
    jax.block_until_ready(args)

    def recon_loop(n):
        @jax.jit
        def run(cy, cb, cr, ql, qc, d):
            def body(i, c):
                seed, acc = c
                out = reconstruct(cy + seed, cb, cr, ql, qc, h, w,
                                  samp="420")
                s = jnp.sum(out.astype(jnp.uint32))
                return (s & 1).astype(cy.dtype), acc + s
            return jax.lax.fori_loop(
                0, n, body, (d.astype(cy.dtype), jnp.uint32(0)))[1]
        return run

    def recon_slope(n1=N1, n2=N2):
        r1, r2 = recon_loop(n1), recon_loop(n2)
        int(np.asarray(r1(*args, next_delta())))
        int(np.asarray(r2(*args, next_delta())))

        def t(r):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                int(np.asarray(r(*args, next_delta())))
                best = min(best, time.perf_counter() - t0)
            return best
        return (t(r2) - t(r1)) / (n2 - n1)

    recon_ms = max(recon_slope() * 1000.0, 0.01)
    dec_mps = (h * w) / max(entropy_ms, recon_ms) / 1e3
    nblk_img = (h // 8) * (w // 8) * 3 // 2
    _roofline("decode reconstruct (1 img)", recon_ms,
              nblk_img * 64 * 4 + h * w * 3, nblk_img * 2 * 64 * 64, roof)

    # Device entropy decode (kernels.huffdec): 128 restart segments
    # bit-walk in lockstep on the VPU lanes — the full-occupancy batch
    # shape (decode_jpeg_batch): all BATCH images x 8 segments fill the
    # 128 lanes of one kernel launch.  Fresh-input rule: the
    # carry-dependent XOR flips bits ONLY in padding words at least one
    # word past each segment's real bytes, so every iteration sees a new
    # input array while the decoded work stays exactly the real stream's.
    _t("device entropy decode bench")
    from jpeg_tpu.kernels import huffdec as hd
    jpegs8 = enc8.encode_batch(batch)
    st = hd.parse_scan_structure(jpegs8[0])
    dev_entropy_ms = float("nan")
    dec_mp = h * w / 1e6
    if st is not None:
        mcus = (h // 16) * (w // 16)
        s_per = mcus // st["restart_interval"]
        segs = []
        for j in jpegs8:
            stj = hd.parse_scan_structure(j)
            segs.extend(hd.unstuff_segments(stj["entropy"],
                                            n_expected=s_per))
        S = len(segs)
        dec_mp = len(jpegs8) * h * w / 1e6
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
                return jax.lax.fori_loop(
                    0, n, body, (d, jnp.int32(0)))[1]
            return run

        def hd_slope(n1=N1, n2=N2):
            r1, r2 = hd_loop(n1), hd_loop(n2)
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
            return (t(r2) - t(r1)) / (n2 - n1)

        try:
            dev_entropy_ms = max(hd_slope() * 1000.0, 0.01)
            nblk_p = -(-nblk_seg // 6) * 6
            _roofline("device entropy decode", dev_entropy_ms,
                      streams.size * 4 + S * nblk_p * 64 * 4, 0, roof)
        except Exception as e:  # pragma: no cover - platform-dependent
            print(f"# device entropy decode skipped: {e}", file=sys.stderr)
    # pipelined all-device decode: slower of the two stages, per MP
    ent_ms_mp = dev_entropy_ms / dec_mp
    rec_ms_mp = recon_ms / (h * w / 1e6)
    dev_dec_mps = 1000.0 / max(ent_ms_mp, rec_ms_mp)

    # Speculative decode of a NON-restart 3-scan stream (the reference's
    # own layout): wall time incl. the entry-fixpoint rounds' dispatch
    # latency (tunnel-dominated here; real deployments pipeline it).
    _t("speculative decode bench")
    spec_ms = float("nan")
    spec_batch_ms = float("nan")
    spec_rst_ms = float("nan")
    try:
        # under-occupied restart stream (8 segments = 8 idle-heavy lanes
        # in the plain kernel): intra-segment entry speculation decodes
        # + reconstructs in one fused dispatch (VERDICT r4 #1)
        from jpeg_tpu.pipelines.speculative import \
            speculative_decode_restart
        enc_s8 = FastBatchEncoder(
            h, w, config=EncodeConfig(scan_layout="interleaved",
                                      huffman="fixed"), segs_per_image=8)
        d_s8 = bytes(enc_s8.encode_batch(batch[:1])[0])
        out = speculative_decode_restart(d_s8)
        if out is not None:
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                speculative_decode_restart(d_s8)
                best = min(best, time.perf_counter() - t0)
            spec_rst_ms = best * 1000.0
    except Exception as e:  # pragma: no cover - platform-dependent
        print(f"# restart-speculation bench skipped: {e}", file=sys.stderr)
    try:
        from jpeg_tpu.pipelines.encode import JpegEncoder
        from jpeg_tpu.pipelines.speculative import (speculative_decode,
                                                    speculative_decode_batch)
        d3 = bytes(JpegEncoder(EncodeConfig()).encode(batch_np[0]))
        out = speculative_decode(d3)  # compile + correctness probe
        if out is not None:
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                out = speculative_decode(d3)
                best = min(best, time.perf_counter() - t0)
            spec_ms = best * 1000.0
        # batched fused: all images' scans decode AND reconstruct in one
        # jit — one put + one fetch for the whole batch amortizes the
        # tunnel round trips that dominate the single-image wall
        nb = 8
        d3s = [bytes(JpegEncoder(EncodeConfig()).encode(batch_np[i]))
               for i in range(nb)]
        outs = speculative_decode_batch(d3s)  # compile + probe
        if all(o is not None for o in outs):
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                outs = speculative_decode_batch(d3s)
                best = min(best, time.perf_counter() - t0)
            spec_batch_ms = best * 1000.0 / nb
    except Exception as e:  # pragma: no cover - platform-dependent
        print(f"# speculative decode skipped: {e}", file=sys.stderr)

    _t("done")
    print(json.dumps({
        "metric": "device_encode_throughput",
        "value": round(mps, 1),
        "unit": "MP/s",
        "vs_baseline": round(mps / C_REFERENCE_MPS, 2),
    }))
    print("# roofline (v5e peaks: HBM 819 GB/s, MXU 197 TF/s bf16; bytes "
          "= kernel in+out HBM traffic, FLOPs = MXU DCT/IDCT only — the "
          "entropy stages are VPU-bound by design, low %s are expected "
          "there and mean headroom is in VPU work, not bandwidth):",
          file=sys.stderr)
    for line in roof:
        print(line, file=sys.stderr)
    print(f"# decode: entropy(host C++) {entropy_ms:.1f}ms/img, device "
          f"reconstruct {recon_ms:.1f}ms/img -> pipelined {dec_mps:.1f} MP/s;"
          f" device entropy (kernels.huffdec, {BATCH}-img batch) "
          f"{dev_entropy_ms:.1f}ms/batch -> all-device {dev_dec_mps:.1f} "
          f"MP/s; speculative 3-scan wall {spec_ms:.0f}ms/img one-shot, "
          f"{spec_batch_ms:.0f}ms/img batched-fused x8 (the one-shot wall "
          f"is the tunnel's put + image fetch round trips; the batch "
          f"amortizes them); restart stream w/ 8 segs via intra-segment "
          f"speculation {spec_rst_ms:.0f}ms one-shot", file=sys.stderr)
    print(f"# large geometry: 4x1920x1280 (the reference CLI's size, "
          f"10 restart segs/img) {big_mps:.0f} MP/s device step "
          f"({big_mps/C_REFERENCE_MPS:.0f}x C)", file=sys.stderr)
    gray_mps = (h * w) / gray_ms / 1e3 if gray_ms == gray_ms else \
        float("nan")
    print(f"# non-420: 4:4:4 device step {mps444:.0f} MP/s; grayscale "
          f"e2e {gray_ms:.1f} ms/img ({gray_mps:.1f} MP/s bytes-out over "
          f"this tunnel)", file=sys.stderr)
    print(f"# surveillance diff (640x640 frames, moving 96px block): "
          f"{diff_fps:.1f} frames/s ({diff_fps * h * w / 1e6:.1f} MP/s "
          f"scanned), {diff_regions} regions encoded — per-frame "
          f"latency-bound on this tunnel (~10 round trips/frame)",
          file=sys.stderr)
    print(f"# platform={jax.devices()[0].platform} batch={BATCH} "
          f"step={dt*1000:.2f}ms e2e one-shot {e2e*1000:.0f}ms "
          f"({e2e_mps:.1f} MP/s), pipelined {pipe_dt*1000:.0f}ms/batch "
          f"({pipe_mps:.1f} MP/s incl. host assembly over the tunnel); "
          f"dynamic-huffman device "
          f"{dyn_dev_mps:.1f} MP/s ({dyn_dev_dt*1000:.2f}ms/batch stages "
          f"1+2, {mps/max(dyn_dev_mps,1e-9):.2f}x fixed; "
          f"dynamic-sampled {dyns_dev_mps:.0f} MP/s), pipelined "
          f"bytes-out over this tunnel {dyn_mps:.1f} MP/s "
          f"({dyn_dt*1000:.1f}ms/batch)", file=sys.stderr)


if __name__ == "__main__":
    main()
