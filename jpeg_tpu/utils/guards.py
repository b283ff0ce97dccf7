"""Numeric sanitizers for the encode pipeline (SURVEY §5).

The reference's thread-safety hazard class — its global packer state
(``byte_buffer``/``bits_written``, ``main/encoder.c:383-384``) would race
if threaded — does not exist here: everything under jit is pure.  What
remains worth guarding is numeric health, checked functionally with
``jax.experimental.checkify``:

* quantizer entries >= 1 — a zero entry turns the quantize divide into
  inf/NaN and silently corrupts the stream;
* DCT outputs finite — catches NaN propagation from corrupted inputs or
  a broken basis table;
* pre-clip coefficient magnitude <= 2047 — for valid 8-bit input the
  [-2048, 2047] clip (``main/encoder.c:109``) must never actually engage
  (max DCT magnitude is 255*8 = 2040 at quantizer 1); if it fires, the
  input or the math is out of contract and quality silently degrades.

Enabled via ``EncodeConfig(debug_checks=True)`` (one extra jitted device
pass before encoding) or called directly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from ..core import tables as T


def _validate_fn(rgb, luma_q, chroma_q, sampling: str):
    from ..ops import color as ops_color

    convert = {"420": ops_color.rgb_to_ycbcr_420,
               "422": ops_color.rgb_to_ycbcr_422,
               "444": ops_color.rgb_to_ycbcr_444}[sampling]
    y, cb, cr = convert(rgb)
    m, bias = T.dct_flat_basis()
    md = jnp.asarray(m, jnp.float32)
    bd = jnp.asarray(bias, jnp.float32)
    ok = jnp.ones((), bool)
    for name, plane, q in (("luma", y, luma_q), ("chroma", cb, chroma_q),
                           ("chroma", cr, chroma_q)):
        checkify.check(jnp.all(q >= 1),
                       "quantizer entries must be >= 1 (divide hazard)")
        blocks = ops_color.to_blocks(plane)
        x = blocks.reshape(*blocks.shape[:-2], 64).astype(jnp.float32)
        freq = jnp.matmul(x, md.T, preferred_element_type=jnp.float32) + bd
        checkify.check(jnp.all(jnp.isfinite(freq)),
                       "non-finite DCT coefficients")
        q_zz = q.reshape(64)[jnp.asarray(T.SCAN_ORDER)].astype(jnp.float32)
        coef = jnp.trunc(freq / q_zz)
        checkify.check(
            jnp.all(jnp.abs(coef) <= float(T.COEF_CLIP_MAX)),
            "coefficient overflow: the [-2048, 2047] clip engaged")
        ok = ok & jnp.all(jnp.isfinite(freq))
    return ok


@functools.partial(jax.jit, static_argnames=("sampling",))
def _validate_checked(rgb, luma_q, chroma_q, sampling: str):
    return checkify.checkify(
        functools.partial(_validate_fn, sampling=sampling))(
            rgb, luma_q, chroma_q)


def validate_encode_inputs(rgb, luma_q, chroma_q,
                           sampling: str = "420") -> None:
    """Run the quant-path sanitizers; raises checkify's error on failure."""
    err, _ = _validate_checked(jnp.asarray(rgb, jnp.uint8),
                               jnp.asarray(luma_q), jnp.asarray(chroma_q),
                               sampling)
    checkify.check_error(err)
