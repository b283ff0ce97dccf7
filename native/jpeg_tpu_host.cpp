// Native host runtime for jpeg_tpu: bitstream finalization.
//
// The device produces each entropy segment as big-endian-packed u32 words
// plus a bit count (kernels/pack.py).  Turning that into the on-wire scan
// payload — byte serialization, 0xFF00 stuffing, ones-padded tail byte —
// is strictly sequential byte work, the host-side hot path of batch
// encoding.  Semantics byte-for-byte match the reference packer's flush
// (write_byte/fill_last_byte, main/encoder.c:385-432): a 0x00 stuffed
// after every full 0xFF data byte; the tail byte is padded with 1-bits
// and is a bare 0xFF when the stream ends on a byte boundary.
//
// Exposed with C linkage for ctypes.  No Python.h dependency.

#include <cstdint>
#include <cstring>

extern "C" {

// Worst-case output size for a scan of total_bits (callers size buffers):
// every full byte could be 0xFF (stuffed) + tail byte + its stuffing.
int64_t jt_finish_scan_max_out(int64_t total_bits) {
  return 2 * (total_bits / 8) + 2;
}

// words:      big-endian-packed stream, words[i] holds bits [32i, 32i+32)
//             with bit 32i at the MSB.  Length must cover total_bits plus
//             the partial tail word.
// total_bits: payload length in bits.
// out:        receives the stuffed scan payload; must hold at least
//             jt_finish_scan_max_out(total_bits) bytes.
// returns     bytes written.
int64_t jt_finish_scan(const uint32_t* words, int64_t total_bits,
                       uint8_t* out) {
  const int64_t nfull = total_bits / 8;
  const int rem = static_cast<int>(total_bits % 8);
  int64_t o = 0;
  for (int64_t i = 0; i < nfull; ++i) {
    const uint32_t w = words[i >> 2];
    const uint8_t b = static_cast<uint8_t>(w >> (8 * (3 - (i & 3))));
    out[o++] = b;
    if (b == 0xFF) out[o++] = 0x00;
  }
  if (rem) {
    const uint32_t w = words[nfull >> 2];
    const uint8_t b = static_cast<uint8_t>(w >> (8 * (3 - (nfull & 3))));
    const uint8_t tail = static_cast<uint8_t>(b | ((1u << (8 - rem)) - 1u));
    out[o++] = tail;
    // T.81 B.1.1.5: a data-carrying 0xFF must be stuffed.  The reference
    // omits this (fill_last_byte, main/encoder.c:425-432) — a spec defect
    // we deliberately fix (divergence documented in PARITY.md).
    if (tail == 0xFF) out[o++] = 0x00;
  } else {
    // pure ones-pad with no data bits: a legal fill byte before the next
    // marker, matching the reference byte-for-byte
    out[o++] = 0xFF;
  }
  return o;
}

// Batch variant: S segments laid out contiguously, each with stride_words
// u32 words and its own bit count.  Offsets[i] receives the start of
// segment i's payload in out; returns total bytes written.
int64_t jt_finish_scans(const uint32_t* words, int64_t stride_words,
                        const int32_t* total_bits, int64_t n_segments,
                        uint8_t* out, int64_t* offsets) {
  int64_t o = 0;
  for (int64_t s = 0; s < n_segments; ++s) {
    offsets[s] = o;
    o += jt_finish_scan(words + s * stride_words, total_bits[s], out + o);
  }
  return o;
}

}  // extern "C"
