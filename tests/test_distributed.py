"""Multi-host helpers: single-process paths + a real 2-process run."""
import hashlib
import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from jpeg_tpu.parallel import distributed as dist
from jpeg_tpu.parallel.mesh import DATA_AXIS, SPACE_AXIS


def test_global_mesh_shape():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = dist.global_mesh()
    assert set(mesh.axis_names) == {DATA_AXIS, SPACE_AXIS}
    assert mesh.size == mesh.shape[DATA_AXIS] * mesh.shape[SPACE_AXIS] <= 8
    m2 = dist.global_mesh(space_per_host=2)
    assert m2.shape[SPACE_AXIS] == 2


def test_process_batch_slice_single_process():
    s = dist.process_batch_slice(32)
    assert (s.start, s.stop) == (0, 32)


def test_initialize_is_noop_single_process():
    dist.initialize()  # must not raise in a single-process run
    assert jax.process_count() == 1


def test_two_process_cpu_run(tmp_path):
    """Real ``jax.distributed.initialize`` across two CPU processes.

    Spawns two workers with a localhost coordinator (4 virtual devices
    each), which validate the global topology, run a cross-process psum on
    the (data, space) mesh, and encode their ``process_batch_slice`` of a
    shared deterministic batch.  The parent asserts both processes
    succeeded and that their encoded bytes equal the single-process
    encoding of the same slices.
    """
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coordinator = f"localhost:{port}"

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(worker))]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    procs = []
    outs = []
    for pid in range(2):
        out = tmp_path / f"worker{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(pid), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    results = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        results.append((p.returncode, stdout, stderr))
    for rc, stdout, stderr in results:
        assert rc == 0, f"worker failed:\n{stderr.decode()[-2000:]}"

    reports = [json.loads(out.read_text()) for out in outs]
    assert [r["slice"] for r in reports] == [[0, 2], [2, 4]]
    assert reports[0]["total"] == reports[1]["total"]

    # cross-check bytes against a single-process encode of the same batch
    from jpeg_tpu.core.types import EncodeConfig
    from jpeg_tpu.pipelines.encode import JpegEncoder
    rng = np.random.default_rng(42)
    batch = rng.integers(0, 256, size=(4, 64, 64, 3)).astype(np.uint8)
    enc = JpegEncoder(EncodeConfig(scan_layout="interleaved"))
    want = [hashlib.sha256(enc.encode(batch[i])).hexdigest()
            for i in range(4)]
    got = reports[0]["digests"] + reports[1]["digests"]
    assert got == want
