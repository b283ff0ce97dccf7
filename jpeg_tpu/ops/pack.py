"""Parallel entropy bitstream assembly.

This replaces the reference's inherently serial bit packer — a global
1-byte buffer fed one codeword at a time with recursive byte splitting
(``write_byte``/``write_bits``, ``main/encoder.c:383-423``) — with a
data-parallel formulation (SURVEY §2.3, §8.3.1):

1. every emission slot's (codeword || amplitude) field has a known bit
   length; an exclusive prefix sum over the lengths yields each field's
   absolute bit offset;
2. each field spans at most two 32-bit output words (fields are <= 30 bits);
   both word contributions are computed with vector shifts and combined by
   scatter-add (disjoint bit ranges make add == or);
3. the 0xFF00 byte stuffing and the reference's always-emitted ones-padded
   tail byte (``fill_last_byte``, ``main/encoder.c:425-432``) are applied to
   the packed bytes on the host via one more prefix sum (stuffed-byte
   offsets), where the result is being assembled into the container anyway.

Everything on the device side is static-shaped: invalid slots carry
nbits = 0 and contribute nothing.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Worst-case bits per emission slot.  Baseline slots are <= 27 bits (16-bit
# Huffman code + 11 DC amplitude bits); progressive EOBn slots reach 30 bits
# (16-bit dynamic code + up to 14 appended run bits, T.81 G.1.2.2).  Sizing
# uses the global worst case so every packer path's buffer contract holds.
MAX_FIELD_BITS = 30


def max_words_for_slots(num_slots: int) -> int:
    return (num_slots * MAX_FIELD_BITS) // 32 + 2


def pack_fields(values, nbits, max_words: int | None = None):
    """Pack bit fields into 32-bit big-endian words on device.

    values : int32 [...]— field bits, right-aligned; MUST be zero where
             nbits == 0 (attach_codes guarantees this).
    nbits  : int32 [...] — field lengths (0..30).

    Returns (words uint32 [max_words], total_bits int32 scalar).  Bit i of
    the stream lives in word i//32 at big-endian position i%32.
    """
    v = values.reshape(-1).astype(jnp.uint32)
    n = nbits.reshape(-1).astype(jnp.int32)
    if max_words is None:
        max_words = max_words_for_slots(v.shape[0])

    ends = jnp.cumsum(n)  # inclusive: end bit offset of each field
    total = ends[-1]
    offs = ends - n
    w = offs >> 5
    end_in = (offs & 31) + n  # field end within its first word, in (0, 61]

    hi = jnp.where(
        end_in <= 32,
        v << jnp.clip(32 - end_in, 0, 31).astype(jnp.uint32),
        v >> jnp.clip(end_in - 32, 0, 31).astype(jnp.uint32),
    ).astype(jnp.uint32)
    lo = jnp.where(end_in > 32,
                   v << jnp.clip(64 - end_in, 0, 31).astype(jnp.uint32),
                   jnp.zeros_like(v)).astype(jnp.uint32)

    words = jnp.zeros(max_words, jnp.uint32)
    words = words.at[w].add(hi, mode="drop")
    words = words.at[w + 1].add(lo, mode="drop")
    return words, total


def pack_fields_np(values, nbits, max_words: int | None = None):
    """Host NumPy ``pack_fields`` (identical layout and semantics).

    Latency paths with host-resident fields (progressive scan scripts)
    pack here: a device round trip per scan costs ~100 ms on high-latency
    links for microseconds of compute.
    """
    v = np.asarray(values).reshape(-1).astype(np.int64) & 0xFFFFFFFF
    n = np.asarray(nbits).reshape(-1).astype(np.int64)
    if max_words is None:
        max_words = max_words_for_slots(v.shape[0])
    if v.size == 0:
        return np.zeros(max_words, np.uint32), 0
    ends = np.cumsum(n)
    total = int(ends[-1])
    offs = ends - n
    w = offs >> 5
    end_in = (offs & 31) + n
    hi = np.where(end_in <= 32,
                  v << np.clip(32 - end_in, 0, 31),
                  v >> np.clip(end_in - 32, 0, 31)) & 0xFFFFFFFF
    lo = np.where(end_in > 32,
                  v << np.clip(64 - end_in, 0, 31), 0) & 0xFFFFFFFF
    words = np.zeros(max_words, np.uint32)
    np.add.at(words, w, hi.astype(np.uint32))          # disjoint bits:
    np.add.at(words, w + 1, lo.astype(np.uint32))      # add == or
    return words, total


def finish_scans(words_2d: np.ndarray, totals) -> list[bytes]:
    """Batch finalization of S scans: words [S, stride] u32, totals [S].

    One call into the native C++ batch finalizer when built (amortizes the
    ctypes crossing over the whole batch); NumPy per-scan fallback
    otherwise.  Semantics identical to ``finish_scan`` per row.
    """
    from .. import native
    w = np.ascontiguousarray(np.asarray(words_2d))
    t = np.asarray(totals).reshape(-1)
    got = native.finish_scans(w, t)
    if got is not None:
        return got
    return [finish_scan(w[s], int(t[s])) for s in range(w.shape[0])]


def finish_scan(words: np.ndarray, total_bits: int) -> bytes:
    """Host finalization: bytes, 0xFF00 stuffing, reference pad byte.

    Matches the reference packer byte-for-byte: a 0x00 stuffed after every
    full 0xFF data byte, then one ones-padded tail byte with no stuffing
    (a bare 0xFF when the scan ended on a byte boundary) —
    main/encoder.c:385-432.

    Uses the C++ host runtime (jpeg_tpu.native) when built; the NumPy
    implementation below is the portable fallback.
    """
    from .. import native
    got = native.finish_scan(np.asarray(words), int(total_bits))
    if got is not None:
        return got
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
        # T.81 B.1.1.5: a data-carrying 0xFF must be stuffed.  The
        # reference omits this (fill_last_byte) — deliberate spec fix,
        # see PARITY.md.  A rem==0 bare 0xFF is a legal fill byte.
        tail += b"\x00"
    return out.tobytes() + tail
