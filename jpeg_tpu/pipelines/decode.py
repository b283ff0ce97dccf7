"""Device-side JPEG decoding (dequant + IDCT + reconstruction on TPU).

The reference repo is named "JPEG-encoder-decoder" but its decoder was
never completed — ``utils/func_tester.c:1262-1319`` is a stub (``decode``
returns 0, ``idct`` carries a TODO).  This module finishes the capability
TPU-natively:

* host (serial by nature): marker parse + Huffman entropy decode —
  ``golden.decoder.parse_coefficients``;
* device (all the FLOPs): de-zigzag + dequantize + inverse DCT as one
  [N, 64] @ [64, 64] MXU matmul (the transpose of the encoder's flat
  basis — orthonormal, so inverse == transpose), block reassembly, 2x
  chroma upsample, BT.601 YCbCr->RGB, rounding/clipping — jitted, cached
  per image geometry.

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


@functools.partial(jax.jit, static_argnames=("height", "width"))
def reconstruct_420(y_zz, cb_zz, cr_zz, luma_q, chroma_q,
                    height: int, width: int):
    """Zig-zagged quantized coefficients -> [H, W, 3] uint8 RGB (device)."""
    m = jnp.asarray(T.dct_flat_basis()[0], jnp.float32)  # zz = M @ x - bias

    def plane(zz, q, ph, pw):
        deq = zz.astype(jnp.float32) * q.reshape(64)[jnp.asarray(T.SCAN_ORDER)].astype(jnp.float32)
        x = jnp.matmul(deq, m, preferred_element_type=jnp.float32) + 128.0
        blocks = x.reshape(ph // 8, pw // 8, 8, 8)
        return blocks.transpose(0, 2, 1, 3).reshape(ph, pw)

    def up2h(p):
        # triangle-filter 2x upsample (3/4-1/4, edge-replicated), matching
        # the host decoder and libjpeg's "fancy" mode
        left = jnp.concatenate([p[:, :1], p[:, :-1]], axis=1)
        right = jnp.concatenate([p[:, 1:], p[:, -1:]], axis=1)
        a = 0.75 * p + 0.25 * left
        b = 0.75 * p + 0.25 * right
        return jnp.stack([a, b], axis=2).reshape(p.shape[0], p.shape[1] * 2)

    def up2(p):
        return up2h(up2h(p.T).T)

    # pixel round+clip per plane BEFORE upsampling, matching the host
    # decoder's _idct_blocks -> _upsample order
    y = jnp.clip(jnp.round(plane(y_zz, luma_q, height, width)), 0, 255)
    cb = jnp.clip(jnp.round(plane(cb_zz, chroma_q, height // 2, width // 2)),
                  0, 255)
    cr = jnp.clip(jnp.round(plane(cr_zz, chroma_q, height // 2, width // 2)),
                  0, 255)
    cb = up2(cb) - 128.0
    cr = up2(cr) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)


def decode_jpeg(data: bytes):
    """Baseline JFIF bytes -> [H, W, 3] uint8 RGB, reconstruction on device.

    Supports the formats this framework and the reference emit: baseline,
    4:2:0, 3 components (interleaved or 3-scan, with or without restarts).
    """
    comps, coeffs, quant, width, height = parse_coefficients(data)
    samplings = [(c.h_samp, c.v_samp) for c in comps]
    if len(comps) != 3 or samplings != [(2, 2), (1, 1), (1, 1)]:
        # grayscale / 4:4:4 / other samplings: host reconstruction
        from ..golden.decoder import _reconstruct
        return _reconstruct(comps, coeffs, quant, width, height)
    # components in SOF order (Y, Cb, Cr per the sampling check); ids are
    # whatever the encoder chose — do not assume 1/2/3
    luma, cb, cr = comps
    ph, pw = -(-height // 16) * 16, -(-width // 16) * 16  # coded geometry
    if cb.quant_id != cr.quant_id:
        # reconstruct_420 takes one chroma quantizer; rare 3-table streams
        # go through the general host path
        from ..golden.decoder import _reconstruct
        return _reconstruct(comps, coeffs, quant, width, height)
    if luma.bw and (luma.bw * 8 != pw or luma.bh * 8 != ph):
        # non-MCU-padded block grid (padded non-interleaved stream from
        # another encoder): host reconstruction handles the general case
        from ..golden.decoder import _reconstruct
        return _reconstruct(comps, coeffs, quant, width, height)
    out = np.asarray(reconstruct_420(
        jnp.asarray(coeffs[luma.comp_id]), jnp.asarray(coeffs[cb.comp_id]),
        jnp.asarray(coeffs[cr.comp_id]),
        jnp.asarray(quant[luma.quant_id]),
        jnp.asarray(quant[cb.quant_id]),
        ph, pw))
    return out[:height, :width]
