"""Multi-host initialization and mesh construction (SURVEY §8.2 phase 5).

The reference has no distributed layer (SURVEY §2.3); this is the
TPU-native scale-out path: ``jax.distributed`` for process bootstrap, a
(data, space) mesh spanning hosts — ICI within a slice, DCN across — and
host-local assembly of each host's image shards.

Single-host mode works without any initialization; ``initialize`` is a
no-op when JAX is already initialized or when only one process exists.
"""
from __future__ import annotations

import os
import time

import jax

from .mesh import make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               retries: int = 0, backoff_s: float = 2.0) -> None:
    """Bring up jax.distributed from args or the standard env variables.

    On TPU pods, ``jax.distributed.initialize()`` discovers everything
    from the runtime; arguments are only needed for manual/CPU testing
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).

    Must run before any other JAX call: probing (e.g. jax.process_count())
    initializes the XLA backend and makes distributed init fail, so this
    function probes nothing and instead treats "already initialized" as
    success.

    ``retries`` > 0 re-attempts transient bring-up failures (coordinator
    not yet listening, DNS blips — the failure-detection mandate of
    SURVEY §5) with exponential backoff starting at ``backoff_s``.
    "Already initialized" is never retried (it's success), and a
    single-process run (no cluster detected) is never an error.
    """
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    auto = addr is None and num_processes is None
    last: Exception | None = None
    for attempt in range(retries + 1):
        try:
            if auto:
                try:
                    jax.distributed.initialize()
                except ValueError:
                    # no cluster environment auto-detected ("coordinator
                    # _address should be defined") — a single-process run
                    return
            else:
                jax.distributed.initialize(coordinator_address=addr,
                                           num_processes=num_processes,
                                           process_id=process_id)
            return
        except RuntimeError as e:
            msg = str(e).lower()
            if "already" in msg and ("initialize" in msg or "called" in msg):
                return  # idempotent
            last = e
            if attempt < retries:
                time.sleep(backoff_s * (2 ** attempt))
    if auto:
        # single-process semantics: a backend that's already up (e.g. a
        # prior jax call in-process) is not an error in auto mode
        return
    assert last is not None
    raise last


def global_mesh(space_per_host: int | None = None):
    """(data, space) mesh over all global devices.

    The ``space`` axis (spatial restart-segment sharding) is kept within a
    host so its histogram psum rides ICI; the ``data`` axis spans hosts
    over DCN, where only independent images travel.
    """
    local = jax.local_device_count()
    space = space_per_host or min(local, 4)
    while local % space:
        space -= 1
    data = jax.device_count() // space
    return make_mesh(data=data, space=space, devices=jax.devices())


def process_batch_slice(batch_size: int) -> slice:
    """The slice of a global batch this process should feed (data axis)."""
    n = jax.process_count()
    if batch_size % n:
        raise ValueError(
            f"batch size {batch_size} must be divisible by the "
            f"{n} processes (pad the batch or drop the remainder explicitly)")
    per = batch_size // n
    start = per * jax.process_index()
    return slice(start, start + per)
