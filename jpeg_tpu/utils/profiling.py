"""Observability: stage timers and encode metrics.

The reference's instrumentation is a gettimeofday stopwatch printing ms
per stage (``timer()``, ``utils/original.c:84-93``) plus log lines with
difference counts (``main/main.c:141-143``).  Here:

* ``StageTimer`` — wall-clock per named stage with device synchronization
  (``block_until_ready``) so device work is attributed to its stage;
* ``encode_metrics`` — structured per-image results: bytes, bits/pixel,
  and PSNR against the source via the host decoder.

For kernel-level traces use ``jax.profiler.trace`` around the step; these
helpers cover the everyday "where did the milliseconds go" need.
"""
from __future__ import annotations

import contextlib
import time

import numpy as np


class _StageOutputs:
    """Mutable holder for a stage's device outputs (see StageTimer.stage)."""

    __slots__ = ("out",)

    def __init__(self):
        self.out = None


class StageTimer:
    """Accumulating per-stage stopwatch.

    >>> t = StageTimer()
    >>> with t.stage("dct") as s:
    ...     s.out = step(batch)      # doctest: +SKIP
    >>> t.report()                   # doctest: +SKIP
    """

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        """Time a block of work.  Yields a holder: set ``holder.out`` to the
        stage's device outputs to get exact attribution on any backend
        (``measure()`` does this for you).  Without outputs the drain falls
        back to blocking on a trivial computation, which attributes
        correctly only on backends with in-order stream execution (TPU);
        CPU/GPU may overlap, skewing per-stage numbers.
        """
        holder = _StageOutputs()
        t0 = time.perf_counter()
        try:
            yield holder
        finally:
            if self.sync:
                try:
                    import jax
                    if holder.out is not None:
                        jax.block_until_ready(holder.out)
                    else:
                        import jax.numpy as jnp
                        jax.block_until_ready(jnp.zeros(()))
                except Exception:
                    pass
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def measure(self, name: str, fn, *args, **kwargs):
        """Run fn under the stage timer, blocking on its device outputs."""
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        if self.sync:
            try:
                import jax
                jax.block_until_ready(out)
            except Exception:
                pass
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        return out

    def report(self) -> dict[str, dict]:
        return {k: {"total_ms": v * 1000.0,
                    "count": self.counts[k],
                    "mean_ms": v * 1000.0 / self.counts[k]}
                for k, v in self.totals.items()}

    def pretty(self) -> str:
        # same visual shape as the reference's per-stage prints
        lines = [f"{name:<42}{r['mean_ms']:10.3f} ms  (x{r['count']})"
                 for name, r in self.report().items()]
        return "\n".join(lines)


def encode_metrics(rgb: np.ndarray, data: bytes, compute_psnr: bool = True) -> dict:
    """Structured per-image encode metrics: size, bpp, PSNR."""
    h, w = rgb.shape[:2]
    out = {"bytes": len(data), "bpp": 8.0 * len(data) / (h * w),
           "width": w, "height": h}
    if compute_psnr:
        from ..golden import decoder as gdec
        out["psnr_db"] = gdec.psnr(gdec.decode(data), np.asarray(rgb))
    return out
