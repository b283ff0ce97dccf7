"""Native host runtime vs the NumPy reference finalization."""
import numpy as np
import pytest

from jpeg_tpu import native


def _numpy_finish(words, total_bits):
    """The portable implementation (ops.pack fallback), inlined as oracle."""
    total = int(total_bits)
    nfull = total // 8
    raw = np.ascontiguousarray(np.asarray(words)).astype(">u4").tobytes()
    buf = np.frombuffer(raw, dtype=np.uint8)[:nfull + 1].copy()
    rem = total % 8
    pad = int(buf[nfull]) | ((1 << (8 - rem)) - 1) if rem else 0xFF
    full = buf[:nfull]
    ff = full == 0xFF
    out = np.zeros(nfull + int(ff.sum()), dtype=np.uint8)
    out[np.arange(nfull) + np.concatenate([[0], np.cumsum(ff[:-1])])] = full
    tail = bytes([pad])
    if rem and pad == 0xFF:
        tail += b"\x00"   # data-carrying 0xFF tail is stuffed (T.81)
    return out.tobytes() + tail


@pytest.mark.skipif(not native.available(), reason="toolchain unavailable")
@pytest.mark.parametrize("total_bits", [1, 7, 8, 31, 32, 33, 1000, 4096, 4093])
def test_native_finish_scan_matches_numpy(total_bits):
    rng = np.random.default_rng(total_bits)
    nwords = (total_bits + 31) // 32 + 2
    words = rng.integers(0, 1 << 32, size=nwords, dtype=np.uint64).astype(np.uint32)
    # salt in some 0xFF bytes to exercise stuffing
    words[::3] |= 0xFF000000
    assert native.finish_scan(words, total_bits) == _numpy_finish(words, total_bits)


@pytest.mark.skipif(not native.available(), reason="toolchain unavailable")
def test_native_batch_finish():
    rng = np.random.default_rng(0)
    words = rng.integers(0, 1 << 32, size=(4, 40), dtype=np.uint64).astype(np.uint32)
    totals = np.array([1000, 1280, 7, 1279], np.int32)
    got = native.finish_scans(words, totals)
    exp = [_numpy_finish(words[i], int(totals[i])) for i in range(4)]
    assert got == exp
