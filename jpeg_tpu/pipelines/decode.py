"""Device-side JPEG decoding (dequant + IDCT + reconstruction on TPU).

The reference repo is named "JPEG-encoder-decoder" but its decoder was
never completed — ``utils/func_tester.c:1262-1319`` is a stub (``decode``
returns 0, ``idct`` carries a TODO).  This module finishes the capability
TPU-natively:

* host: marker parse (Python) + Huffman entropy decode (the C++ host
  runtime's ``jt_decode_scan`` bit-walk via ``golden.decoder``, with a
  pure-Python fallback);
* device (all the FLOPs): de-zigzag + dequantize + inverse DCT as one
  [N, 64] @ [64, 64] MXU matmul (the transpose of the encoder's flat
  basis — orthonormal, so inverse == transpose), block reassembly, 2x
  chroma upsample, BT.601 YCbCr->RGB, rounding/clipping — jitted, cached
  per image geometry.  Covers 4:2:0 / 4:2:2 / 4:4:4 and grayscale; other
  sampling factors fall back to the host reconstruction.

Numerics match the float64 host decoder within +-1 code value (f32
accumulation); PSNR differences are below 0.01 dB.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..core import tables as T
from ..golden.decoder import parse_coefficients


def _plane(zz, q, ph: int, pw: int):
    m = jnp.asarray(T.dct_flat_basis()[0], jnp.float32)  # zz = M @ x - bias
    deq = zz.astype(jnp.float32) * \
        q.reshape(64)[jnp.asarray(T.SCAN_ORDER)].astype(jnp.float32)
    x = jnp.matmul(deq, m, preferred_element_type=jnp.float32) + 128.0
    blocks = x.reshape(ph // 8, pw // 8, 8, 8)
    return blocks.transpose(0, 2, 1, 3).reshape(ph, pw)


def _up2h(p):
    # triangle-filter 2x upsample (3/4-1/4, edge-replicated), matching
    # the host decoder and libjpeg's "fancy" mode
    left = jnp.concatenate([p[:, :1], p[:, :-1]], axis=1)
    right = jnp.concatenate([p[:, 1:], p[:, -1:]], axis=1)
    a = 0.75 * p + 0.25 * left
    b = 0.75 * p + 0.25 * right
    return jnp.stack([a, b], axis=2).reshape(p.shape[0], p.shape[1] * 2)


@functools.partial(jax.jit, static_argnames=("height", "width", "samp"))
def reconstruct(y_zz, cb_zz, cr_zz, luma_q, chroma_q,
                height: int, width: int, samp: str = "420"):
    """Zig-zagged quantized coefficients -> [H, W, 3] uint8 RGB (device).

    ``samp`` selects the chroma geometry: "420" (H/2 x W/2), "422"
    (H x W/2), "444" (full).  Pixel round+clip happens per plane BEFORE
    upsampling, matching the host decoder's _idct_blocks -> _upsample
    order.
    """
    ch_h = height // 2 if samp == "420" else height
    ch_w = width // 2 if samp in ("420", "422") else width
    y = jnp.clip(jnp.round(_plane(y_zz, luma_q, height, width)), 0, 255)
    cb = jnp.clip(jnp.round(_plane(cb_zz, chroma_q, ch_h, ch_w)), 0, 255)
    cr = jnp.clip(jnp.round(_plane(cr_zz, chroma_q, ch_h, ch_w)), 0, 255)
    if samp == "420":
        up = lambda p: _up2h(_up2h(p.T).T)
    elif samp == "422":
        up = _up2h
    else:
        up = lambda p: p
    cb = up(cb) - 128.0
    cr = up(cr) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)


# Backwards-compatible alias (round-1 public name).
@functools.partial(jax.jit, static_argnames=("height", "width"))
def reconstruct_420(y_zz, cb_zz, cr_zz, luma_q, chroma_q,
                    height: int, width: int):
    return reconstruct(y_zz, cb_zz, cr_zz, luma_q, chroma_q,
                       height, width, samp="420")


@functools.partial(jax.jit, static_argnames=("height", "width"))
def reconstruct_gray(y_zz, luma_q, height: int, width: int):
    y = jnp.clip(jnp.round(_plane(y_zz, luma_q, height, width)), 0, 255)
    return y.astype(jnp.uint8)


def decode_jpeg(data: bytes):
    """Baseline JFIF bytes -> [H, W, 3] uint8 RGB (or [H, W] grayscale),
    with the numeric reconstruction on device.

    Covers the formats this framework and the reference emit: baseline,
    4:2:0/4:2:2/4:4:4 or single-component, interleaved or 3-scan, with or
    without restarts.  Non-MCU-padded foreign streams and uncommon
    sampling factors fall back to the host reconstruction.
    """
    comps, coeffs, quant, width, height = parse_coefficients(data)

    def host():
        from ..golden.decoder import _reconstruct
        return _reconstruct(comps, coeffs, quant, width, height)

    if len(comps) == 1:
        comp = comps[0]
        ph, pw = -(-height // 8) * 8, -(-width // 8) * 8
        if comp.bw and (comp.bw * 8 != pw or comp.bh * 8 != ph):
            return host()
        out = np.asarray(reconstruct_gray(
            jnp.asarray(coeffs[comp.comp_id]),
            jnp.asarray(quant[comp.quant_id]), ph, pw))
        return out[:height, :width]

    samplings = [(c.h_samp, c.v_samp) for c in comps]
    samp = {((2, 2), (1, 1), (1, 1)): "420",
            ((2, 1), (1, 1), (1, 1)): "422",
            ((1, 1), (1, 1), (1, 1)): "444"}.get(tuple(samplings))
    if len(comps) != 3 or samp is None:
        return host()
    luma, cb, cr = comps
    mcu_h = 16 if samp == "420" else 8
    mcu_w = 8 if samp == "444" else 16
    ph, pw = -(-height // mcu_h) * mcu_h, -(-width // mcu_w) * mcu_w
    if cb.quant_id != cr.quant_id:
        # reconstruct takes one chroma quantizer; rare 3-table streams go
        # through the general host path
        return host()
    if luma.bw and (luma.bw * 8 != pw or luma.bh * 8 != ph):
        # non-MCU-padded block grid (padded non-interleaved stream from
        # another encoder): host reconstruction handles the general case
        return host()
    out = np.asarray(reconstruct(
        jnp.asarray(coeffs[luma.comp_id]), jnp.asarray(coeffs[cb.comp_id]),
        jnp.asarray(coeffs[cr.comp_id]),
        jnp.asarray(quant[luma.quant_id]),
        jnp.asarray(quant[cb.quant_id]),
        ph, pw, samp=samp))
    return out[:height, :width]
