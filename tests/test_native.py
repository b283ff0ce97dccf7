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


@pytest.mark.skipif(not native.available(), reason="toolchain unavailable")
def test_native_assemble_interleaved_matches_python():
    from jpeg_tpu.bitstream import jfif
    rng = np.random.default_rng(5)
    B, S = 3, 4
    words = rng.integers(0, 1 << 32, size=(B * S, 40),
                         dtype=np.uint64).astype(np.uint32)
    words[:, ::3] |= 0xFF000000  # exercise stuffing
    totals = rng.integers(1, 1270, size=B * S).astype(np.int32)
    headers = [b"\xff\xd8HDR%d" % i for i in range(B)]  # distinct lengths ok
    sos = jfif.sos_header_interleaved()
    got = native.assemble_interleaved(
        words, totals, [h + sos for h in headers], S)
    exp = [jfif.assemble_interleaved(
               headers[b],
               [_numpy_finish(words[b * S + s], int(totals[b * S + s]))
                for s in range(S)])
           for b in range(B)]
    assert got == exp
    # single-segment (no RSTn) and single-thread paths
    got1 = native.assemble_interleaved(
        words[:B], totals[:B], [h + sos for h in headers], 1, n_threads=1)
    exp1 = [jfif.assemble_interleaved(
                headers[b], [_numpy_finish(words[b], int(totals[b]))])
            for b in range(B)]
    assert got1 == exp1


def test_native_huffman_builder_matches_python():
    """The C++ K.2 builder must equal the Python one field-for-field."""
    from jpeg_tpu import native
    from jpeg_tpu.huffman.build import build_table, build_tables_batch
    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    freqs = []
    for trial in range(30):
        f = np.zeros(257, np.int64)
        n_active = int(rng.integers(1, 200))
        idx = rng.choice(256, size=n_active, replace=False)
        f[idx] = rng.integers(1, 100000, size=n_active)
        f[256] = 1
        freqs.append(f)
    # skewed edge cases: single symbol, two symbols, all-equal
    one = np.zeros(257, np.int64); one[5] = 1000; one[256] = 1
    two = np.zeros(257, np.int64); two[3] = 7; two[200] = 7; two[256] = 1
    eq = np.ones(257, np.int64)
    freqs += [one, two, eq]
    batch = build_tables_batch(np.stack(freqs))
    for f, nat in zip(freqs, batch):
        ref = build_table(f, allow_native=False)
        np.testing.assert_array_equal(nat.bits, ref.bits)
        np.testing.assert_array_equal(nat.huffval, ref.huffval)
        np.testing.assert_array_equal(nat.code, ref.code)
        np.testing.assert_array_equal(nat.length, ref.length)


@pytest.mark.skipif(not native.available(), reason="toolchain unavailable")
def test_native_mt_decode_matches_serial():
    """Segment-parallel decode must equal the serial bit-walk exactly."""
    import jax

    from jpeg_tpu.core.types import EncodeConfig
    from jpeg_tpu.golden.decoder import _huff_specs
    from jpeg_tpu.huffman.build import fixed_tables
    from jpeg_tpu.pipelines.fast import FastBatchEncoder

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(160, 160, 3), dtype=np.uint8)
    enc = FastBatchEncoder(160, 160, config=EncodeConfig(
        scan_layout="interleaved", huffman="fixed"), segs_per_image=5,
        interpret=jax.default_backend() != "tpu")
    data = enc.encode_batch(img[None])[0]

    sos = data.find(b"\xff\xda")
    start = sos + 2 + ((data[sos + 2] << 8) | data[sos + 3])
    ft = fixed_tables()
    huff = {(0, 0): ft["luma_dc"], (1, 0): ft["luma_ac"],
            (0, 1): ft["chroma_dc"], (1, 1): ft["chroma_ac"]}
    pattern = [0, 0, 0, 0, 1, 2]
    comp_dc, comp_ac = [0, 1, 1], [0, 1, 1]
    n_mcus = (160 // 16) ** 2
    ri = n_mcus // 5

    serial, end_s = native.decode_scan(
        data, start, _huff_specs(huff, 0), _huff_specs(huff, 1), pattern,
        comp_dc, comp_ac, n_mcus, ri, n_threads=1)
    mt, end_m = native.decode_scan(
        data, start, _huff_specs(huff, 0), _huff_specs(huff, 1), pattern,
        comp_dc, comp_ac, n_mcus, ri, n_threads=8)
    np.testing.assert_array_equal(serial, mt)
    assert end_s == end_m


@pytest.mark.skipif(not native.available(), reason="toolchain unavailable")
def test_native_mt_decode_malformed_stream():
    """A truncated restart stream must fail cleanly from worker threads."""
    from jpeg_tpu.golden.decoder import _huff_specs
    from jpeg_tpu.huffman.build import fixed_tables

    ft = fixed_tables()
    huff = {(0, 0): ft["luma_dc"], (1, 0): ft["luma_ac"],
            (0, 1): ft["chroma_dc"], (1, 1): ft["chroma_ac"]}
    # stream with no restart markers at all but n_mcus demanding several
    data = bytes([0x12, 0x34, 0x56] * 40)
    with pytest.raises(ValueError):
        native.decode_scan(
            data, 0, _huff_specs(huff, 0), _huff_specs(huff, 1),
            [0, 0, 0, 0, 1, 2], [0, 1, 1], [0, 1, 1], 100, 10, n_threads=4)
