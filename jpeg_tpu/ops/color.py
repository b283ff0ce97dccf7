"""Device color conversion + chroma subsampling (JAX).

TPU-native equivalent of the reference's per-pixel RGB->YCbCr + 4:2:0
(``utils/original.c:372-404``, ``main/encoder.c:133-138``): whole-image
vectorized elementwise math that XLA fuses into one pass over HBM.

Truncation semantics: the reference assigns the double result to an int
(truncation toward zero; all values are in [0, 255] so this equals floor).
With dtype=float64 the results are bit-exact with the golden encoder; with
float32 (the TPU path) a ~1e-6 fraction of pixels can land one code value
away at exact-integer boundaries, which is PSNR-neutral.
"""
from __future__ import annotations

import jax.numpy as jnp


def rgb_to_ycbcr_420(rgb, dtype=jnp.float32):
    """[..., H, W, 3] uint8 -> (y [..,H,W], cb [..,H/2,W/2], cr) int32 planes.

    Expression grouping matches the C left-to-right evaluation
    (utils/original.c:372-374).

    Exactness note: in float64 the separately-rounded semantics only hold
    when evaluated eagerly (un-jitted) — under jit XLA:CPU contracts
    mul+add into FMA (optimization_barrier/bitcast round-trips are
    stripped), which can flip a floor at an exact-integer boundary.  The
    parity paths therefore run these un-jitted (see
    ``parallel.sharded.ShardedEncoder._analyze_batch_exact``).
    """
    yi, cbi, cri = rgb_to_ycbcr_444(rgb, dtype=dtype)
    return yi, _avg2x2(cbi), _avg2x2(cri)


def rgb_to_ycbcr_422(rgb, dtype=jnp.float32):
    """[..., H, W, 3] uint8 -> (y [H,W], cb [H,W/2], cr) int32 planes.

    Horizontal-only chroma subsampling (trunc-average of 2 samples)."""
    y, cb, cr = rgb_to_ycbcr_444(rgb, dtype=dtype)
    return y, _avg1x2(cb), _avg1x2(cr)


def _avg1x2(plane_i32):
    w = plane_i32.shape[-1]
    q = plane_i32.reshape(*plane_i32.shape[:-1], w // 2, 2)
    return (q[..., 0] + q[..., 1]) // 2


def rgb_to_ycbcr_444(rgb, dtype=jnp.float32):
    """[..., H, W, 3] uint8 -> full-resolution (y, cb, cr) int32 planes.

    float64: the reference's double expressions verbatim (C parity).

    float32 (the fast path) uses exact FIXED-POINT arithmetic instead:
    the coefficients are the decimal fractions 299/1000, 168736/1e6, ...,
    so ``floor(sum_of_scaled_int_products / scale)`` is a deterministic
    pure-integer function of the pixel — identical on every backend and
    under any FMA/fusion choice the compiler makes.  (Float expressions
    here previously differed by 1 ulp between XLA and Pallas/Mosaic
    compilations of the same formula, flipping the floor on ~1e-5 of
    pixels and breaking the engines-byte-identical invariant.)  The
    divergence from the C doubles is the same class as the old f32 path:
    rare one-code-value flips at exact-integer boundaries, PSNR-neutral.

    Exactness of the f32 ops: all scaled sums are < 2^31 (int32 exact);
    the chroma >> 6 then /15625 uses floor(floor(x/64)/15625) ==
    floor(x/1e6); quotients and dividends are < 2^24 so f32 divides
    cannot cross an integer boundary (remainder >= 1/15625 >> ulp).
    """
    if dtype == jnp.float64:
        x = rgb.astype(dtype)
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        y = (0.299 * r + 0.587 * g) + 0.114 * b
        cb = ((128.0 - 0.168736 * r) - 0.331264 * g) + 0.5 * b
        cr = ((128.0 + 0.5 * r) - 0.418688 * g) - 0.081312 * b
        return (jnp.floor(y).astype(jnp.int32),
                jnp.floor(cb).astype(jnp.int32),
                jnp.floor(cr).astype(jnp.int32))
    x = rgb.astype(jnp.int32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y_t = 299 * r + 587 * g + 114 * b
    y = jnp.floor(y_t.astype(jnp.float32) / 1000.0).astype(jnp.int32)
    cb_t = 128_000_000 + (-168736 * r - 331264 * g + 500000 * b)
    cr_t = 128_000_000 + (500000 * r - 418688 * g - 81312 * b)
    cb = jnp.floor((cb_t >> 6).astype(jnp.float32) / 15625.0)
    cr = jnp.floor((cr_t >> 6).astype(jnp.float32) / 15625.0)
    return y, cb.astype(jnp.int32), cr.astype(jnp.int32)


def _avg2x2(plane_i32):
    """2x2 integer-truncating average (utils/original.c:393-404)."""
    h, w = plane_i32.shape[-2], plane_i32.shape[-1]
    q = plane_i32.reshape(*plane_i32.shape[:-2], h // 2, 2, w // 2, 2)
    s = q[..., 0, :, 0] + q[..., 0, :, 1] + q[..., 1, :, 0] + q[..., 1, :, 1]
    return s // 4


def to_blocks(plane):
    """[..., H, W] -> [..., H/8*W/8, 8, 8] in raster block order."""
    *lead, h, w = plane.shape
    return (plane.reshape(*lead, h // 8, 8, w // 8, 8)
            .swapaxes(-3, -2)
            .reshape(*lead, (h // 8) * (w // 8), 8, 8))
