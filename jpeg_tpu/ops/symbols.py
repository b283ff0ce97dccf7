"""Device run-length symbolization (EOB/ZRL) and histograms.

Vectorized equivalent of the reference's sequential coefficient walk
(``calc_dc_freq``/``calc_ac_freq``/``write_coefficients``,
``main/encoder.c:315-358,462-502``): one emission slot per coefficient
position — slot 0 the DC symbol, AC slots either the run-length symbol of a
nonzero coefficient, a ZRL at every 16th consecutive zero, or the EOB at
``last_nonzero + 1``.  Slot order equals the serial emission order, which is
what lets the packer use a prefix sum instead of a bit-serial loop.

All shapes are static; invalid slots carry nbits=0 and vanish in the pack.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bit_class(v):
    """Magnitude bit-length (huff_class, main/encoder.c:303-313) for |v|<=4095."""
    a = jnp.abs(v)
    cls = jnp.zeros_like(v)
    for k in range(12):
        cls = cls + (a >= (1 << k)).astype(v.dtype)
    return cls


def symbolize(zz):
    """[..., N, 64] int32 (DC already differenced) -> slot arrays.

    Returns dict of [..., N, 64] arrays: sym int32, extra int32 (amplitude
    bits), extra_n int32, valid bool.
    """
    v = zz.astype(jnp.int32)
    pos = jnp.arange(64, dtype=jnp.int32)
    cls = bit_class(v)
    # negative amplitudes as ones'-complement on the low cls bits
    # (main/encoder.c:442-444)
    amp = jnp.where(v < 0, v + (jnp.left_shift(1, cls) - 1), v)

    ac_nz = (v != 0) & (pos >= 1)
    m = jax.lax.cummax(jnp.where(ac_nz, pos, 0), axis=v.ndim - 1)
    last_nz = m[..., -1:]
    prev_nz = jnp.concatenate([jnp.zeros_like(m[..., :1]), m[..., :-1]], axis=-1)

    run = (pos - prev_nz - 1) % 16
    sym = jnp.where(ac_nz, (run << 4) | cls, 0)
    extra = jnp.where(ac_nz, amp, 0)
    extra_n = jnp.where(ac_nz, cls, 0)
    valid = ac_nz

    zero_run = pos - prev_nz
    zrl = (~ac_nz) & (pos >= 1) & (pos < last_nz) & (zero_run % 16 == 0)
    sym = jnp.where(zrl, 0xF0, sym)
    valid = valid | zrl

    eob = (pos == last_nz + 1) & (last_nz < 63)
    # EOB symbol is 0x00 with no extra bits; sym already 0 there.
    valid = valid | eob

    # DC slot
    sym = sym.at[..., 0].set(cls[..., 0])
    extra = extra.at[..., 0].set(amp[..., 0])
    extra_n = extra_n.at[..., 0].set(cls[..., 0])
    valid = valid.at[..., 0].set(True)

    return {"sym": sym, "extra": extra, "extra_n": extra_n, "valid": valid}


def histogram_256(sym, valid):
    """Symbol histogram over valid slots; [..., 256] int32 (device bincount)."""
    flat_sym = sym.reshape(-1)
    flat_valid = valid.reshape(-1)
    return jnp.zeros(256, jnp.int32).at[flat_sym].add(flat_valid.astype(jnp.int32))


def dc_ac_histograms(slots):
    """(dc_hist[256], ac_hist[256]) matching calc_dc_freq/calc_ac_freq."""
    valid = slots["valid"]
    dc_mask = jnp.zeros_like(valid).at[..., 0].set(True)
    return (histogram_256(slots["sym"], valid & dc_mask),
            histogram_256(slots["sym"], valid & ~dc_mask))


def attach_codes(slots, dc_code, dc_len, ac_code, ac_len):
    """Resolve Huffman codes: slot -> (field value, field nbits).

    dc_code/dc_len/ac_code/ac_len are 256-entry int32 LUTs uploaded from the
    host-built tables.  Returns (values, nbits) of the slots' combined
    codeword+amplitude bit fields, with nbits=0 on invalid slots.
    """
    sym = slots["sym"]
    is_dc = jnp.zeros_like(sym, dtype=bool).at[..., 0].set(True)
    code = jnp.where(is_dc, dc_code[sym], ac_code[sym])
    clen = jnp.where(is_dc, dc_len[sym], ac_len[sym])
    value = jnp.left_shift(code, slots["extra_n"]) | slots["extra"]
    value = jnp.where(slots["valid"], value, 0)  # packer requires zeros
    nbits = jnp.where(slots["valid"], clen + slots["extra_n"], 0)
    return value, nbits
