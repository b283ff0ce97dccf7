"""Device-mesh construction for the (data, space) parallel layout.

The reference is single-core (SURVEY §2.3: no threads, no multi-process);
parallel scale-out is a design mandate of the TPU build, not a port target.
The mesh has two axes:

* ``data``  — batch data parallelism: whole images per shard.
* ``space`` — spatial sharding: each image's MCU rows are split into
  restart-delimited slabs, one per device, so every shard's entropy
  stream is independent (DC prediction resets at RSTn boundaries —
  the image-codec analog of sequence parallelism).

Collectives ride XLA (``psum`` of symbol histograms over ``space``); there
is no NCCL-style layer to port — the reference has none.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(data: int = 1, space: int = 1, devices=None) -> Mesh:
    """Build a (data, space) mesh from the available devices.

    ``data * space`` must divide into the device list; extra devices are
    left unused (they would otherwise force awkward image geometries).
    """
    if devices is None:
        devices = jax.devices()
    need = data * space
    if need > len(devices):
        raise ValueError(
            f"mesh {data}x{space} needs {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(data, space)
    return Mesh(arr, (DATA_AXIS, SPACE_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """[B, H, W, 3] batch: images over ``data``, rows over ``space``."""
    return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
