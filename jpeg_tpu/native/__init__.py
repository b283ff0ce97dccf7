"""ctypes bindings for the native host runtime (see /native).

Builds the shared library on first use (g++ -O2) into
``jpeg_tpu/native/_build``; every entry point has a NumPy fallback so the
package works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, os.pardir, os.pardir, "native", "jpeg_tpu_host.cpp")
_BUILD_DIR = os.path.join(_HERE, "_build")
_SO = os.path.join(_BUILD_DIR, "libjpeg_tpu_host.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            src = os.path.abspath(_SRC)
            if not os.path.exists(_SO) or (
                    os.path.exists(src)
                    and os.path.getmtime(_SO) < os.path.getmtime(src)):
                os.makedirs(_BUILD_DIR, exist_ok=True)
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-pthread",
                     "-o", _SO, src],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            lib.jt_finish_scan.restype = ctypes.c_int64
            lib.jt_finish_scan.argtypes = [
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8)]
            lib.jt_finish_scan_max_out.restype = ctypes.c_int64
            lib.jt_finish_scan_max_out.argtypes = [ctypes.c_int64]
            lib.jt_finish_scans.restype = ctypes.c_int64
            lib.jt_finish_scans.argtypes = [
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64)]
            lib.jt_assemble_interleaved.restype = ctypes.c_int64
            lib.jt_assemble_interleaved.argtypes = [
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
            lib.jt_build_huff_tables.restype = ctypes.c_int64
            lib.jt_build_huff_tables.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32)]
            i32p = ctypes.POINTER(ctypes.c_int32)
            lib.jt_decode_scan.restype = ctypes.c_int64
            lib.jt_decode_scan.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.c_int64, i32p, i32p, i32p, ctypes.c_int64,
                i32p, i32p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, i32p]
            lib.jt_decode_scan_mt.restype = ctypes.c_int64
            lib.jt_decode_scan_mt.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.c_int64, i32p, i32p, i32p, ctypes.c_int64,
                i32p, i32p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, i32p]
            lib.jt_ac_refine_fields.restype = ctypes.c_int64
            lib.jt_ac_refine_fields.argtypes = [
                i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, i32p, i32p, i32p]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def finish_scan(words: np.ndarray, total_bits: int) -> bytes | None:
    """Native scan finalization; None if the library is unavailable.

    ``words`` must be uint32 (big-endian-packed bit stream as produced by
    the device packers).
    """
    lib = _load()
    if lib is None:
        return None
    w = np.ascontiguousarray(words, dtype=np.uint32)
    needed_words = (int(total_bits) + 31) // 32 + 1
    if w.size < needed_words:
        w = np.concatenate([w, np.zeros(needed_words - w.size, np.uint32)])
    out = np.empty(int(lib.jt_finish_scan_max_out(total_bits)), np.uint8)
    n = lib.jt_finish_scan(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_int64(int(total_bits)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out[:n].tobytes()


def ac_refine_fields(band: np.ndarray, al: int, max_run: int,
                     max_buffer: int):
    """Native successive-approximation AC refinement coder.

    band: [n, w] int32 band coefficients (un-shifted).  Returns
    (sym, extra, extra_n) int32 arrays, or None if the library is
    unavailable (the Python loop in pipelines/progressive.py is the
    reference implementation and fallback).
    """
    lib = _load()
    if lib is None:
        return None
    b = np.ascontiguousarray(band, dtype=np.int32)
    n, w = b.shape
    cap = n * (w + w // 16 + 2) + 8
    sym = np.empty(cap, np.int32)
    extra = np.empty(cap, np.int32)
    extra_n = np.empty(cap, np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    m = lib.jt_ac_refine_fields(
        b.ctypes.data_as(i32p), ctypes.c_int64(n), ctypes.c_int64(w),
        ctypes.c_int64(int(al)), ctypes.c_int64(int(max_run)),
        ctypes.c_int64(int(max_buffer)),
        sym.ctypes.data_as(i32p), extra.ctypes.data_as(i32p),
        extra_n.ctypes.data_as(i32p))
    return sym[:m], extra[:m], extra_n[:m]


def build_huff_tables(freqs: np.ndarray):
    """Batch Annex K.2 table builds: freqs [n, 257] int64 (freq[256] == 1).

    Returns (bits [n, 17], huffval [n, 256], code [n, 256],
    length [n, 256]) int32 arrays, or None if the library is unavailable.
    Raises ValueError on empty histograms / length overflow, mirroring the
    Python builder.
    """
    lib = _load()
    if lib is None:
        return None
    f = np.ascontiguousarray(freqs, dtype=np.int64)
    n = f.shape[0]
    bits = np.empty((n, 17), np.int32)
    huffval = np.empty((n, 256), np.int32)
    code = np.empty((n, 256), np.int32)
    length = np.empty((n, 256), np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    rc = lib.jt_build_huff_tables(
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), ctypes.c_int64(n),
        bits.ctypes.data_as(i32p), huffval.ctypes.data_as(i32p),
        code.ctypes.data_as(i32p), length.ctypes.data_as(i32p))
    if rc == 1:
        raise ValueError("empty symbol histogram: nothing to encode "
                         "(zero-sized image?)")
    if rc:
        raise ValueError("Huffman code length overflow (>= 32 bits)")
    return bits, huffval, code, length


def decode_scan(data: bytes, start: int, dc_specs: np.ndarray,
                ac_specs: np.ndarray, pattern, comp_dc, comp_ac,
                n_mcus: int, restart_interval: int,
                n_threads: int | None = None):
    """Native baseline scan decode (the serial Huffman bit-walk).

    dc_specs/ac_specs: [4, 273] int32 — DHT BITS[17] + HUFFVAL[256] per
    table id.  pattern: component slot per block within an MCU.  When the
    stream has restart markers, RSTn-delimited segments decode in parallel
    on ``n_threads`` host threads (default: one per CPU, capped at 16 —
    segment decode is the dual of the encoder's segment-parallel packing).
    Returns (zz [n_mcus*len(pattern), 64] int32 in emission order,
    end_pos) or None if the library is unavailable.  Raises ValueError on
    a malformed stream.
    """
    lib = _load()
    if lib is None:
        return None
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 16)
    buf = np.frombuffer(data, np.uint8)
    dc = np.ascontiguousarray(dc_specs, np.int32)
    ac = np.ascontiguousarray(ac_specs, np.int32)
    pat = np.ascontiguousarray(pattern, np.int32)
    cdc = np.ascontiguousarray(comp_dc, np.int32)
    cac = np.ascontiguousarray(comp_ac, np.int32)
    out = np.empty((n_mcus * pat.size, 64), np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    end = lib.jt_decode_scan_mt(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(buf.size), ctypes.c_int64(start),
        dc.ctypes.data_as(i32p), ac.ctypes.data_as(i32p),
        pat.ctypes.data_as(i32p), ctypes.c_int64(pat.size),
        cdc.ctypes.data_as(i32p), cac.ctypes.data_as(i32p),
        ctypes.c_int64(cdc.size), ctypes.c_int64(n_mcus),
        ctypes.c_int64(restart_interval), ctypes.c_int64(int(n_threads)),
        out.ctypes.data_as(i32p))
    if end < 0:
        raise ValueError("malformed entropy-coded segment")
    return out, int(end)


def assemble_interleaved(words: np.ndarray, total_bits: np.ndarray,
                         headers: list[bytes], n_segs: int,
                         n_threads: int | None = None) -> list[bytes] | None:
    """Batch full-file assembly for interleaved restart streams.

    ``words`` [n_images * n_segs, stride] uint32, ``total_bits``
    [n_images * n_segs], ``headers`` one SOI..SOS-header byte string per
    image (identical objects fine).  Returns complete JPEG files (header
    + finalized segments with RSTn + EOI), byte-identical to
    ``jfif.assemble_interleaved(header, finish_scans(...))``, or None if
    the native library is unavailable.  Images assemble on host threads.
    """
    lib = _load()
    if lib is None:
        return None
    w = np.ascontiguousarray(words, dtype=np.uint32)
    tb = np.ascontiguousarray(total_bits, dtype=np.int32)
    n = len(headers)
    assert w.shape[0] == n * n_segs and tb.size == n * n_segs
    hdr = np.frombuffer(b"".join(headers), np.uint8)
    offs = np.zeros(n + 1, np.int64)
    np.cumsum([len(h) for h in headers], out=offs[1:])
    seg_caps = (2 * (tb.astype(np.int64) // 8) + 2).reshape(n, n_segs)
    stride = int((seg_caps.sum(1) + np.diff(offs)).max()) + 2 * n_segs + 2
    out = np.empty(n * stride, np.uint8)
    lens = np.empty(n, np.int64)
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 16)
    lib.jt_assemble_interleaved(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_int64(w.shape[1]),
        tb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(n), ctypes.c_int64(n_segs),
        hdr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(stride),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(int(n_threads)))
    return [out[i * stride:i * stride + lens[i]].tobytes()
            for i in range(n)]


def finish_scans(words: np.ndarray, total_bits: np.ndarray) -> list[bytes] | None:
    """Batch finalization: words [S, stride], total_bits [S] -> payloads."""
    lib = _load()
    if lib is None:
        return None
    w = np.ascontiguousarray(words, dtype=np.uint32)
    tb = np.ascontiguousarray(total_bits, dtype=np.int32)
    s = w.shape[0]
    cap = sum(int(lib.jt_finish_scan_max_out(int(t))) for t in tb)
    out = np.empty(cap, np.uint8)
    offs = np.empty(s + 1, np.int64)
    total = lib.jt_finish_scans(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_int64(w.shape[1]),
        tb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(s),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    offs[s] = total
    return [out[offs[i]:offs[i + 1]].tobytes() for i in range(s)]
