"""Worker process for the real 2-process distributed test.

Launched by ``test_distributed.py::test_two_process_cpu_run`` with a
coordinator address; runs ``jpeg_tpu.parallel.distributed.initialize`` for
real (CPU backend, 4 virtual devices per process), checks the global
topology, performs a cross-process collective on the (data, space) mesh,
encodes its ``process_batch_slice`` of a deterministic global batch, and
writes results as JSON for the parent to cross-check.

Must configure the platform BEFORE touching any other JAX API: distributed
initialization has to precede backend initialization.
"""
import json
import os
import sys


def main():
    coordinator, num_procs, pid, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

    import jax
    jax.config.update("jax_platforms", "cpu")  # sitecustomize may force axon

    from jpeg_tpu.parallel import distributed as dist

    dist.initialize(coordinator_address=coordinator,
                    num_processes=num_procs, process_id=pid)
    dist.initialize()  # idempotent second call must be a no-op

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == num_procs
    assert jax.process_index() == pid
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * num_procs

    mesh = dist.global_mesh(space_per_host=2)
    # space stays host-local: 2 per host; data spans hosts
    assert mesh.shape["space"] == 2
    assert mesh.shape["data"] == 2 * num_procs

    # Cross-process collective: global sum over a data-sharded array.
    local = np.full((mesh.shape["data"] // num_procs, 4),
                    float(pid + 1), np.float32)
    sharding = NamedSharding(mesh, P("data", None))
    garr = jax.make_array_from_process_local_data(sharding, local)
    total = jax.jit(
        lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P()))(garr)
    # sum over procs of (data_per_proc * 4 * (pid+1))
    expect = sum((mesh.shape["data"] // num_procs) * 4 * (p + 1)
                 for p in range(num_procs))
    assert float(total) == expect, (float(total), expect)

    # Host-local encode of this process's slice of the global batch.
    from jpeg_tpu.core.types import EncodeConfig
    from jpeg_tpu.pipelines.encode import JpegEncoder

    rng = np.random.default_rng(42)  # same global batch in every process
    batch = rng.integers(0, 256, size=(2 * num_procs, 64, 64, 3)).astype(
        np.uint8)
    sl = dist.process_batch_slice(batch.shape[0])
    assert sl.stop - sl.start == 2
    enc = JpegEncoder(EncodeConfig(scan_layout="interleaved"))
    jpegs = [enc.encode(batch[i]) for i in range(sl.start, sl.stop)]

    import hashlib
    with open(out_path, "w") as f:
        json.dump({
            "pid": pid,
            "slice": [sl.start, sl.stop],
            "digests": [hashlib.sha256(j).hexdigest() for j in jpegs],
            "total": float(total),
        }, f)


if __name__ == "__main__":
    main()
