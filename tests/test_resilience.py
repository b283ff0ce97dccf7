"""Failure detection + elastic host fallback (utils/resilience.py) and
multi-host init retry (parallel/distributed.py)."""
import numpy as np
import pytest

from jpeg_tpu.core.types import EncodeConfig
from jpeg_tpu.golden.encoder import encode as golden_encode
from jpeg_tpu.utils.resilience import (FailureEvent, ResilientEncoder,
                                       probe_device)


def _img(h=32, w=32, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3)).astype(np.uint8)


class _Flaky:
    """Fails n times, then delegates to the golden encoder."""

    def __init__(self, fail_times):
        self.left = fail_times
        self.calls = 0

    def encode_batch(self, batch):
        self.calls += 1
        if self.left > 0:
            self.left -= 1
            raise RuntimeError("synthetic device failure")
        return [bytes(golden_encode(img)) for img in np.asarray(batch)]


def test_probe_device_healthy():
    assert probe_device(timeout_s=60.0)


def test_retry_then_success():
    enc = ResilientEncoder(_Flaky(fail_times=1), retries=2,
                           probe_timeout_s=60.0)
    batch = np.stack([_img(seed=1), _img(seed=2)])
    out = enc.encode_batch(batch)
    assert [o[:2] for o in out] == [b"\xff\xd8"] * 2
    assert enc.encoder.calls == 2
    assert [e.kind for e in enc.events] == ["device_error"]


def test_fallback_matches_golden():
    events = []
    cfg = EncodeConfig(scan_layout="interleaved",
                       restart_interval_mcu_rows=1, huffman="fixed")
    enc = ResilientEncoder(_Flaky(fail_times=99), config=cfg, retries=1,
                           probe_timeout_s=60.0, on_event=events.append)
    batch = np.stack([_img(seed=3), _img(seed=4)])
    out = enc.encode_batch(batch)
    want = [bytes(golden_encode(img, quality=None,
                                scan_layout="interleaved",
                                restart_interval_mcu_rows=1,
                                huffman="fixed"))
            for img in batch]
    assert out == want
    kinds = [e.kind for e in enc.events]
    assert kinds.count("device_error") == 2 and kinds[-1] == "fallback"
    assert events == enc.events
    assert all(isinstance(e, FailureEvent) for e in events)


def test_fallback_accepts_flat_layout():
    enc = ResilientEncoder(_Flaky(fail_times=99), retries=0,
                           probe_timeout_s=60.0)
    img = _img(seed=5)
    out = enc.encode_batch(img.reshape(1, 32, 96))
    assert out == [bytes(golden_encode(img))]


def test_fallback_rejects_non_420():
    cfg = EncodeConfig(scan_layout="interleaved", subsampling="444")
    enc = ResilientEncoder(_Flaky(fail_times=99), config=cfg, retries=0,
                           probe_timeout_s=60.0)
    with pytest.raises(RuntimeError, match="4:2:0 only"):
        enc.encode_batch(np.stack([_img(seed=6)]))


def test_initialize_retries_transient(monkeypatch):
    import jax

    from jpeg_tpu.parallel import distributed as D

    calls = {"n": 0}

    def flaky_init(coordinator_address=None, num_processes=None,
                   process_id=None):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("coordinator unavailable (transient)")

    monkeypatch.setattr(jax.distributed, "initialize", flaky_init)
    D.initialize("127.0.0.1:9999", num_processes=1, process_id=0,
                 retries=3, backoff_s=0.01)
    assert calls["n"] == 3

    calls["n"] = 0
    with pytest.raises(RuntimeError, match="transient"):
        D.initialize("127.0.0.1:9999", num_processes=1, process_id=0,
                     retries=1, backoff_s=0.01)
    assert calls["n"] == 2


def test_passthrough_with_real_encoder():
    """No failure -> the wrapped encoder's exact bytes, no events."""
    from jpeg_tpu.pipelines.fast import FastBatchEncoder
    cfg = EncodeConfig(scan_layout="interleaved", huffman="fixed")
    inner = FastBatchEncoder(32, 32, config=cfg, interpret=True)
    enc = ResilientEncoder(inner, config=cfg, retries=1,
                           probe_timeout_s=60.0)
    batch = np.stack([_img(seed=7), _img(seed=8)])
    assert enc.encode_batch(batch) == inner.encode_batch(batch)
    assert enc.events == []


def test_fallback_maps_dynamic_sampled_to_exact():
    """The host fallback serves huffman='dynamic-sampled' as exact
    dynamic (the golden encoder has no sampled mode; exact tables
    strictly satisfy the sampled contract)."""
    cfg = EncodeConfig(scan_layout="interleaved",
                       huffman="dynamic-sampled")
    enc = ResilientEncoder(_Flaky(fail_times=99), config=cfg, retries=0,
                           probe_timeout_s=60.0)
    img = _img(seed=7)
    out = enc.encode_batch(np.stack([img]))
    assert out == [bytes(golden_encode(img, quality=None,
                                       scan_layout="interleaved",
                                       restart_interval_mcu_rows=0,
                                       huffman="dynamic"))]
