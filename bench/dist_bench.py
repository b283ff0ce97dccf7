"""Multi-process scaling bench for the data axis (CPU backend).

Real 2-host TPU hardware is unavailable in this environment (TODO.md
"Scale"), so this harness quantifies the SOFTWARE overheads of the
multi-host path with what exists: N real OS processes, each a
``jax.distributed`` participant with its own CPU devices, weak-scaling a
fixed per-process encode workload (the data axis of
``parallel/distributed.py`` — each process encodes its
``process_batch_slice``).  Reported per process:

* ``step_s``   — device encode time (jit dispatch + compute),
* ``sync_s``   — one cross-process psum per batch (the dynamic-mode
  histogram sync's DCN analog: the only cross-host communication the
  encode path ever needs),
* ``fetch_s``  — device->host word fetch,
* ``asm_s``    — host JFIF assembly (native C++ threads).

Weak-scaling efficiency = wall(1 process) / wall(N processes); ≥80% is
the BASELINE.json north star for the 2-host run (there it is bounded by
ICI/DCN, here by host oversubscription — this measures the software
floor, not the hardware).  Usage:

    python bench/dist_bench.py            # 1/2/4/8-process sweep
    python bench/dist_bench.py --procs 4  # one point

Writes ``DIST_BENCH.json`` (BENCH-style artifact) to the repo root.
"""
import argparse
import json
import os
import shutil
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# per-process workload (weak scaling): BATCH images per process per iter
BATCH = 4
SIZE = 256          # SIZE x SIZE px images
ITERS = 3           # timed iterations (after 1 warmup)


def worker(coordinator: str, num_procs: int, pid: int, out_path: str):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    # ONE compute thread per process: without this every process runs a
    # multi-threaded Eigen/intra-op pool over all host cores, so N
    # processes on an M-core host self-oversubscribe N*M-fold and the
    # measured "efficiency" collapses for reasons that have nothing to
    # do with the distributed software path (VERDICT r4 weak #1).  The
    # launcher additionally taskset-pins each worker to its own core.
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=1"
        " --xla_cpu_multi_thread_eigen=false"
        " intra_op_parallelism_threads=1"
        " inter_op_parallelism_threads=1").strip()
    for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
              "MKL_NUM_THREADS"):
        os.environ.setdefault(v, "1")

    import jax
    jax.config.update("jax_platforms", "cpu")

    from jpeg_tpu.parallel import distributed as dist

    if num_procs > 1:
        dist.initialize(coordinator_address=coordinator,
                        num_processes=num_procs, process_id=pid)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from jpeg_tpu.core.types import EncodeConfig
    from jpeg_tpu.pipelines.fast import FastBatchEncoder

    # interpret=True: Pallas kernels only compile for TPU; on the CPU
    # backend they run interpreted (same numerics, byte-identical output
    # — the scaling shape is what this bench measures, not kernel speed)
    enc = FastBatchEncoder(SIZE, SIZE, config=EncodeConfig(
        scan_layout="interleaved", huffman="fixed"), segs_per_image=1,
        interpret=True)

    # every process encodes ITS slice of the global batch (data axis)
    rng = np.random.default_rng(42)
    gbatch = rng.integers(
        0, 256, size=(BATCH * num_procs, SIZE, SIZE, 3)).astype(np.uint8)
    sl = dist.process_batch_slice(gbatch.shape[0])
    local = gbatch[sl.start:sl.stop]

    mesh = dist.global_mesh()
    psum = None
    if num_procs > 1:
        # the dynamic-mode histogram sync's cross-host analog: an
        # all-reduce of a [4, 256] per-process histogram over the mesh
        sharding = NamedSharding(mesh, P(None))
        psum = jax.jit(lambda x: jnp.sum(x) * 0 + jnp.sum(x),
                       out_shardings=NamedSharding(mesh, P()))

    tm = dict(step_s=0.0, sync_s=0.0, fetch_s=0.0, asm_s=0.0, wall_s=0.0)
    digests = []
    for it in range(ITERS + 1):
        timed = it > 0
        lb = local ^ np.uint8(it)  # fresh content every iteration
        t0 = time.perf_counter()
        words, totals = enc._step(enc._check_batch(lb), enc._fixed_lut)
        jax.block_until_ready(words)
        t1 = time.perf_counter()
        if psum is not None:
            h = jax.make_array_from_process_local_data(
                NamedSharding(mesh, P()),
                np.ones((4, 256), np.float32))
            float(psum(h))
        t2 = time.perf_counter()
        totals_np = np.asarray(totals)
        words_np = np.asarray(words)
        t3 = time.perf_counter()
        files = enc._assemble(words_np, totals_np,
                              [enc._fixed] * len(local))
        t4 = time.perf_counter()
        if timed:
            tm["step_s"] += t1 - t0
            tm["sync_s"] += t2 - t1
            tm["fetch_s"] += t3 - t2
            tm["asm_s"] += t4 - t3
            tm["wall_s"] += t4 - t0
    import hashlib
    digests = [hashlib.sha256(f).hexdigest()[:16] for f in files]
    mp = BATCH * SIZE * SIZE * ITERS / 1e6
    with open(out_path, "w") as f:
        json.dump(dict(pid=pid, slice=[sl.start, sl.stop], mp=mp,
                       digests=digests,
                       **{k: round(v, 4) for k, v in tm.items()}), f)


def run_point(num_procs: int, tmpdir: str):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coordinator = f"localhost:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO] + env.get("PYTHONPATH", "").split(os.pathsep))
    procs, outs = [], []
    ncpu = os.cpu_count() or 1
    have_taskset = shutil.which("taskset") is not None
    for pid in range(num_procs):
        out = os.path.join(tmpdir, f"dist_{num_procs}_{pid}.json")
        outs.append(out)
        # pin each worker to its own core (round-robin past ncpu, which
        # only the deliberately-oversubscribed 8-proc point hits on a
        # 4-core host) so the kernel scheduler cannot migrate the
        # single-threaded workers onto shared cores mid-measurement
        pin = (["taskset", "-c", str(pid % ncpu)] if have_taskset else [])
        procs.append(subprocess.Popen(
            pin + [sys.executable, os.path.abspath(__file__), "--worker",
                   coordinator, str(num_procs), str(pid), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    for p in procs:
        stdout, stderr = p.communicate(timeout=600)
        if p.returncode:
            raise RuntimeError(f"worker rc={p.returncode}:\n"
                               f"{stderr.decode()[-2000:]}")
    reports = [json.load(open(o)) for o in outs]
    # all processes produce identical bytes for identical content slices?
    # no — slices differ; instead check digests are all present
    assert all(len(r["digests"]) == BATCH for r in reports)
    return reports


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", nargs=4, default=None,
                    metavar=("COORD", "N", "PID", "OUT"))
    ap.add_argument("--procs", type=int, default=None)
    args = ap.parse_args()
    if args.worker:
        coord, n, pid, out = args.worker
        worker(coord, int(n), int(pid), out)
        return

    import tempfile
    points = [args.procs] if args.procs else [1, 2, 4, 8]
    results = {}
    base_wall = None
    with tempfile.TemporaryDirectory() as td:
        for n in points:
            reports = run_point(n, td)
            wall = max(r["wall_s"] for r in reports)  # slowest process
            mp = sum(r["mp"] for r in reports)
            row = dict(
                procs=n,
                mps=round(mp / wall, 2),
                wall_s=round(wall, 3),
                step_s=round(max(r["step_s"] for r in reports), 3),
                sync_s=round(max(r["sync_s"] for r in reports), 3),
                fetch_s=round(max(r["fetch_s"] for r in reports), 3),
                asm_s=round(max(r["asm_s"] for r in reports), 3),
            )
            if base_wall is None:
                base_wall = wall
            row["efficiency"] = round(base_wall / wall, 3)
            results[n] = row
            print(json.dumps(row), flush=True)
    artifact = dict(
        metric="weak_scaling_efficiency_cpu",
        points=list(results.values()),
        note=(f"weak scaling, {BATCH}x{SIZE}x{SIZE} per process per iter, "
              f"{ITERS} iters, CPU backend (software-overhead floor; real "
              "2-host TPU pending hardware)"),
    )
    with open(os.path.join(REPO, "DIST_BENCH.json"), "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"# wrote DIST_BENCH.json", file=sys.stderr)


if __name__ == "__main__":
    main()
