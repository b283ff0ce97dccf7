"""Single-process paths of the multi-host helpers."""
import jax
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
