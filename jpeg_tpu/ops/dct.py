"""Batched 8x8 forward DCT + quantization + zig-zag on device.

Replaces the reference's per-block triple-loop DCT with quantizer division
(``main/encoder.c:81-112``, ``utils/original.c:428-523``) by a batched
matrix formulation F = A @ X @ A.T over all blocks at once, which XLA maps
onto the MXU, fused with the level shift, truncating quantization, the
[-2048, 2047] clip and the zig-zag gather.

Two modes:
* fast (default): orthonormal-basis matmuls in the configured dtype —
  the TPU path (float32/bfloat16-free; JPEG needs the f32 mantissa).
* exact: float64 with the reference's exact summation order (column pass
  then row pass, sequential accumulation), bit-identical to the golden
  encoder and therefore to the C reference.  Used by CPU parity tests.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import tables as T

_SQRT1_2 = float(np.sqrt(0.5))


def dct_quantize_zigzag(blocks, quantizer, dtype=jnp.float32, exact: bool = False):
    """[..., N, 8, 8] int -> [..., N, 64] int32 zig-zagged quantized coefs.

    Fast path: one [N, 64] @ [64, 64] MXU matmul (kron-flattened separable
    DCT with the level shift folded into a bias and zig-zag folded into the
    row order — see ``tables.dct_flat_basis``).  Numerics differ from the
    two-sided 8x8 form only in the last ulp of the f32 accumulation; a
    ~1e-3 fraction of coefficients can land one quantization step apart at
    exact trunc boundaries (PSNR-neutral; the f64 ``exact`` mode is the
    bit-parity path).
    """
    if exact:
        freq = _dct_exact(blocks)
        q = jnp.asarray(quantizer).reshape(8, 8).astype(freq.dtype)
        quant = jnp.trunc(freq / q)
        quant = jnp.clip(quant, T.COEF_CLIP_MIN, T.COEF_CLIP_MAX).astype(jnp.int32)
        flat = quant.reshape(*quant.shape[:-2], 64)
        return flat[..., jnp.asarray(T.SCAN_ORDER)]

    m, bias = T.dct_flat_basis()
    md = jnp.asarray(m, dtype=dtype)
    bd = jnp.asarray(bias, dtype=dtype)
    x = blocks.reshape(*blocks.shape[:-2], 64).astype(dtype)
    freq = jnp.matmul(x, md.T, preferred_element_type=dtype) + bd
    q_zz = jnp.asarray(quantizer).reshape(64)[jnp.asarray(T.SCAN_ORDER)]
    quant = jnp.trunc(freq / q_zz.astype(dtype))
    return jnp.clip(quant, T.COEF_CLIP_MIN, T.COEF_CLIP_MAX).astype(jnp.int32)


def _dct_exact(blocks):
    """Reference summation order (utils/original.c:428-456), float64.

    Exact ONLY when evaluated eagerly: under jit XLA:CPU contracts the
    mul+add chains into FMA (stripping optimization_barrier and bitcast
    round-trips), which perturbs the last ulp and can flip a quantization
    trunc.  Every bit-parity caller runs this un-jitted (JpegEncoder's
    exact branches; ShardedEncoder._analyze_batch_exact).
    """
    cos = jnp.asarray(T.dct_cosine_table(), dtype=jnp.float64)  # [t, f]
    x = blocks.astype(jnp.float64) - 128.0  # [..., N, y_t, x_t]
    inner = jnp.zeros_like(x)  # [..., N, x_t, y_f]
    for y_t in range(8):
        inner = inner + x[..., y_t, :, None] * cos[y_t, None, :]
    freq = jnp.zeros_like(x)  # [..., N, y_f, x_f]
    for x_t in range(8):
        freq = freq + inner[..., x_t, :, None] * cos[x_t, None, :]
    freq = freq.at[..., :, 0].multiply(_SQRT1_2)
    freq = freq.at[..., 0, :].multiply(_SQRT1_2)
    return freq / 4.0


def diff_dc(zz):
    """Sequential DC differencing along the block axis (axis -2)."""
    dc = zz[..., 0]
    prev = jnp.concatenate(
        [jnp.zeros_like(dc[..., :1]), dc[..., :-1]], axis=-1)
    return zz.at[..., 0].set(dc - prev)
