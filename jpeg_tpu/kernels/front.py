"""Pallas analyze front: raw u8 batch -> transposed pixel-block layout.

Replaces the XLA ``pipelines.fast.analyze_px`` + ``fused._dct_front``
prologue for the fully-fused encode path.  XLA:TPU's codegen for the
channel deinterleave + 8x8 blocking + MCU interleave + [nblk, 64] ->
[64, nblk] transpose costs ~4 ms for a 6.55 MP batch (measured
2026-08-17 with the cache-proof fori-slope methodology) even though the
pure HBM traffic is <0.2 ms; this kernel does the same relayout with
MXU permutation matmuls, XLU 2D transposes, and aligned slice/concats
in ~0.4 ms.

Layout algebra (the whole kernel is this observation): moving a LEADING
row factor into lanes (or a leading lane factor into rows) is free —
aligned slices + concat; only MINOR factors are expensive to move.  So
every exchange is phrased as: make the factor leading (0/1 permutation
matmul on the matching side), transpose (XLU) if it must switch sides,
then slice + concat.  All matmuls are 0/1 matrices against
integer-valued operands bounded by 256, which bf16 represents exactly,
so the MXU's bf16 default loses nothing and every emitted pixel value
is bit-identical to the XLA front's.

Color convert is the exact fixed-point integer formulation of
``ops.color.rgb_to_ycbcr_444`` (deterministic across backends); chroma
subsampling reproduces the truncating averages exactly (all
intermediate sums are small integers, exact in f32).  Reference
behavior: utils/original.c:372-404, main/encoder.c:133-138.

Coverage: 4:2:0 / 4:2:2 / 4:4:4, interleaved, any W % 16 == 0 within
the slab VMEM estimate (``mega_vmem_bytes`` — uniform strips bound the
permutation matrices; the slab xt bounds the width to ~3840 for the
place mega kernel on the 16 MB scoped VMEM), any MCU-granular height
(rows pad to 128-row slabs; the tail masks via ``real_nblk``), and
multi-segment restart streams — slab-edge-aligned directly, any other
MCU-granular segmentation as per-segment pseudo-images
(``pipelines.fast._seg_pseudo_batch``).  ``front_eligible`` +
``mega_fits``/``analyze_fits`` gate callers; everything else falls
back to the XLA front with a warning.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_W = 8192
_STRIP_MCU = 64  # strip width in 16-px MCU columns (1024 px): bounds the
#                  per-strip permutation matrices to [1024, 1024] bf16

# per-slab output columns (slab = 128 image rows) by sampling:
#   420: 8 MCU rows x (4Y + Cb + Cr) x mx        = 48 mx
#   422: 16 MCU rows x (2Y + Cb + Cr) x mx       = 64 mx
#   444: 16 MCU rows x 3 x (W/8)                 = 6 W = 96 mx


def slab_cols(mx: int, sampling: str) -> int:
    return {"420": 48 * mx, "422": 64 * mx, "444": 96 * mx}[sampling]


def front_ineligible_reason(height: int, width: int, sampling: str,
                            n_segs_per_image: int) -> str | None:
    """Why the Pallas front can NOT take this geometry (None = eligible).

    Heights only need MCU granularity — the mega kernels pad rows to
    full 128-row slabs and mask the tail blocks via ``real_nblk`` (tail
    MCU rows are contiguous in the interleaved scan, so masking is
    exact).  Widths only need 16-px granularity: the deinterleave
    zero-pads a partial 128-px group and the place chunks pad the slab's
    block columns to 128 with phantom zero-bit blocks
    (``_pick_slab_pad``).  Multi-segment restart streams whose
    boundaries do NOT fall on 128-row slab edges run each segment as a
    padded pseudo-image (``pipelines.fast``), so they only need the
    segment height to be MCU-granular — matching the reference's own
    mod-16 window constraint (utils/original.c:327-331).
    ``front_analyze`` (the xt-emitting variant) additionally requires
    128-aligned slab columns and height."""
    mcu_h = {"420": 16, "422": 8, "444": 8}.get(sampling)
    if mcu_h is None:
        return f"unsupported sampling {sampling!r}"
    if width % 16:
        return f"width {width} not a multiple of 16"
    if height % mcu_h:
        return f"height {height} not a multiple of the {mcu_h}-px MCU"
    if width > _MAX_W:
        return f"width {width} > {_MAX_W} (per-slab VMEM bound)"
    if n_segs_per_image > 1:
        mcus_y = height // mcu_h
        if mcus_y % n_segs_per_image:
            return (f"{n_segs_per_image} segments do not divide "
                    f"{mcus_y} MCU rows")
    return None


def front_eligible(height: int, width: int, sampling: str,
                   n_segs_per_image: int) -> bool:
    """Pallas-front eligibility (see ``front_ineligible_reason``)."""
    return front_ineligible_reason(height, width, sampling,
                                   n_segs_per_image) is None


def aligned_segments(height: int, n_segs_per_image: int) -> bool:
    """True when every restart segment is a whole number of 128-row
    slabs with no padding — the geometry ``front_place`` takes directly
    with ``n_segs > 1``.  Other MCU-granular segmentations run each
    segment as a padded pseudo-image instead (``pipelines.fast``)."""
    return (n_segs_per_image == 1 or
            (height % 128 == 0 and
             (height // 128) % n_segs_per_image == 0))


def _strip_plan(mx: int):
    """Strip decomposition of ``mx`` MCU columns.

    Prefer UNIFORM strip widths: every distinct width instantiates its
    own permutation-matrix set in VMEM (~2-4 MB bf16 each), and the
    measured v5e scoped-VMEM limit is 16 MB — W=1920 as 64+56 MCU
    strips carries two const sets (~7 MB) and OOM'd the mega kernel,
    while 60+60 carries one (~3.5 MB).  Fall back to 64-wide strips +
    remainder only when no uniform divisor >= 32 MCUs exists (the
    floor keeps the per-strip matmuls MXU-sized)."""
    if mx <= _STRIP_MCU:
        return [mx]
    kmin = -(-mx // _STRIP_MCU)
    for k in range(kmin, max(kmin, mx // 32) + 1):
        if mx % k == 0:
            return [mx // k] * k
    k, rem = divmod(mx, _STRIP_MCU)
    return [_STRIP_MCU] * k + ([rem] if rem else [])


def _perm(n, pairs):
    m = np.zeros((n, n), np.float32)
    for src, dst in pairs:
        m[src, dst] = 1.0
    return m


@functools.lru_cache(maxsize=16)
def _consts_np(mx: int, sampling: str):
    """0/1 permutation matrices (numpy, cached per geometry)."""
    W = 16 * mx
    mats = {}
    # Deinterleave: 384 interleaved RGB lanes (128 px) -> R|G|B 128 each.
    sel = np.zeros((384, 384), np.float32)
    for j in range(128):
        for c in range(3):
            sel[3 * j + c, c * 128 + j] = 1.0
    mats["sel"] = sel
    # Row interleave of 8 stacked [8, cols] pieces -> out[r] =
    # stacked[(r%8)*8 + r//8]: ONE [64, 64] permutation matmul on the
    # MXU replaces the 8 repeat+where passes of the old
    # _row_interleave8 (r5; bit-exact — 0/1 matrix on integer pixel
    # values <= 256, the front's standard bf16-exactness rule).
    il8 = np.zeros((64, 64), np.float32)
    for i in range(64):
        il8[i, (i % 8) * 8 + i // 8] = 1.0
    mats["il8"] = il8
    if sampling in ("420", "422"):
        # Y lane perm: (m, dh, px) -> (px, m, dh).
        mats["r1y"] = _perm(W, [
            (16 * m + 8 * dh + px, px * 2 * mx + 2 * m + dh)
            for m in range(mx) for dh in range(2) for px in range(8)])
        # Chroma lane perm: (m, pcol) -> (pcol, m).
        mats["r1c"] = _perm(W // 2, [
            (8 * m + pcol, pcol * mx + m)
            for m in range(mx) for pcol in range(8)])[:, :]
        # Horizontal pair sum.
        ps2 = np.zeros((W, W // 2), np.float32)
        for j in range(W // 2):
            ps2[2 * j, j] = 1.0
            ps2[2 * j + 1, j] = 1.0
        mats["ps2"] = ps2
    if sampling == "420":
        # Chroma row compaction: (t, 2*prow) -> (t, prow).
        lc2 = np.zeros((64, 128), np.float32)
        for t in range(8):
            for prow in range(8):
                lc2[8 * t + prow, 16 * t + 2 * prow] = 1.0
        mats["lc2"] = lc2
        # Window perms: lanes -> cols 6m+q of one MCU row's window.
        mats["rny"] = np.zeros((4 * mx, 6 * mx), np.float32)
        for dv in range(2):
            for m in range(mx):
                for dh in range(2):
                    mats["rny"][dv * 2 * mx + 2 * m + dh,
                                6 * m + 2 * dv + dh] = 1.0
        mats["rcb"] = np.zeros((mx, 6 * mx), np.float32)
        mats["rcr"] = np.zeros((mx, 6 * mx), np.float32)
        for m in range(mx):
            mats["rcb"][m, 6 * m + 4] = 1.0
            mats["rcr"][m, 6 * m + 5] = 1.0
    elif sampling == "422":
        # Window perms for one 8-row MCU row: cols 4m+q, q = Y0 Y1 Cb Cr.
        mats["rny"] = np.zeros((2 * mx, 4 * mx), np.float32)
        for m in range(mx):
            for dh in range(2):
                mats["rny"][2 * m + dh, 4 * m + dh] = 1.0
        mats["rcb"] = np.zeros((mx, 4 * mx), np.float32)
        mats["rcr"] = np.zeros((mx, 4 * mx), np.float32)
        for m in range(mx):
            mats["rcb"][m, 4 * m + 2] = 1.0
            mats["rcr"][m, 4 * m + 3] = 1.0
    else:  # 444
        m8 = W // 8
        # plane lane perm: (m8, px) -> (px, m8); shared by Y/Cb/Cr.
        mats["r1y"] = _perm(W, [
            (8 * m + px, px * m8 + m)
            for m in range(m8) for px in range(8)])
        # Window perms: cols 3m+q per 8-row MCU row.
        mats["rny"] = np.zeros((m8, 3 * m8), np.float32)
        mats["rcb"] = np.zeros((m8, 3 * m8), np.float32)
        mats["rcr"] = np.zeros((m8, 3 * m8), np.float32)
        for m in range(m8):
            mats["rny"][m, 3 * m] = 1.0
            mats["rcb"][m, 3 * m + 1] = 1.0
            mats["rcr"][m, 3 * m + 2] = 1.0
    names = sorted(mats)
    return names, tuple(mats[n] for n in names)


def _consts(mx: int, sampling: str, bf16: bool = True):
    # convert to jnp at every call site: caching device arrays would leak
    # tracers across jit traces (numpy stays cached in _consts_np)
    dt = jnp.bfloat16 if bf16 else jnp.float32
    names, mats = _consts_np(mx, sampling)
    return names, tuple(jnp.asarray(m, dt) for m in mats)


def _strip_args(mx: int, sampling: str, bf16: bool):
    """Strip plan -> (meta [(mxs, names, base)], flat consts tuple).

    Strips of equal width share one const set (the permutation matrices
    depend only on the strip width)."""
    meta, consts = [], []
    base_by_w = {}
    for mxs in _strip_plan(mx):
        if mxs not in base_by_w:
            names, cs = _consts(mxs, sampling, bf16)
            base_by_w[mxs] = (len(consts), names)
            consts.extend(cs)
        base, names = base_by_w[mxs]
        meta.append((mxs, names, base))
    return meta, tuple(consts)


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _b16(x, bf16: bool = True):
    # bf16 operands are exact for the 0/1 matrices and the integer-valued
    # pixel data (all |values| <= 256); interpret mode (CPU tests) keeps
    # f32 because XLA:CPU has no bf16 x bf16 -> f32 dot.
    return x.astype(jnp.bfloat16) if bf16 else x


def _row_interleave8(pieces, il8, bf16: bool):
    """8 x [8, cols] -> [64, cols] with out[r] = pieces[r % 8][r // 8]:
    an aligned row concat + one [64, 64] permutation matmul (``il8``,
    see ``_consts_np``) — the MXU does the interleave the old 8
    repeat+mask passes did on the VPU."""
    stacked = jnp.concatenate(pieces, axis=0)     # [64, cols]
    return _dot(il8, _b16(stacked, bf16))


def _exchange8(p1, il8, bf16: bool):
    """[128, W'] (rows (k16, sub8), lanes (px8, rest)) ->
    [64, 16*W'/8] (rows (sub, px), lanes (k, rest)).

    The generic minor-exchange: one XLU transpose, 8 aligned px slices,
    8 more transposes, 16 aligned row slices + lane concat each, and a
    permutation-matmul row interleave.  Every block-relayout variant in
    this module is this primitive behind a lane permutation.
    """
    Wp = p1.shape[1]
    width = Wp // 8
    pT = p1.T                                     # [W', 128]
    ts = []
    for px in range(8):
        s = pT[px * width:(px + 1) * width]       # [width, 128]
        sT = s.T                                  # [128, width]
        ts.append(jnp.concatenate(
            [sT[8 * k:8 * (k + 1)] for k in range(16)], axis=1))
        # [8, 16*width]: rows sub, lanes (k, rest)
    return _row_interleave8(ts, il8, bf16)


def _deint_color(x, sel, W, bf16):
    """[128, W*3] f32 interleaved u8 values -> (y, cb, cr) [128, W] f32
    integer planes (exact fixed-point color — see ops.color).

    The deinterleave matmul works in 128-px (384-lane) groups; a partial
    final group (W % 128 != 0) zero-pads its input to 384 lanes — the
    zero pixels emit zero output columns, sliced away below."""
    parts, widths = [], []
    for g0 in range(0, W, 128):
        wpx = min(128, W - g0)
        xg = x[:, g0 * 3:(g0 + wpx) * 3]
        if wpx < 128:
            xg = jnp.concatenate(
                [xg, jnp.zeros((x.shape[0], 384 - 3 * wpx), x.dtype)],
                axis=1)
        parts.append(_dot(_b16(xg, bf16), sel))
        widths.append(wpx)
    r = jnp.concatenate([p[:, :w] for p, w in zip(parts, widths)],
                        axis=1).astype(jnp.int32)
    g = jnp.concatenate([p[:, 128:128 + w] for p, w in zip(parts, widths)],
                        axis=1).astype(jnp.int32)
    b = jnp.concatenate([p[:, 256:256 + w] for p, w in zip(parts, widths)],
                        axis=1).astype(jnp.int32)
    y_t = 299 * r + 587 * g + 114 * b
    y = jnp.floor(y_t.astype(jnp.float32) / 1000.0)
    cb_t = 128_000_000 + (-168736 * r - 331264 * g + 500000 * b)
    cr_t = 128_000_000 + (500000 * r - 418688 * g - 81312 * b)
    cb = jnp.floor((cb_t >> 6).astype(jnp.float32) / 15625.0)
    cr = jnp.floor((cr_t >> 6).astype(jnp.float32) / 15625.0)
    return y, cb, cr


def _front_kernel(meta, *refs, sampling: str, bf16: bool):
    # pallas passes (in_ref, *const_refs, out_ref)
    in_ref, out_ref = refs[0], refs[-1]
    strip_cs = _strip_consts(meta, refs[1:-1])
    out_ref[:] = _front_slab(strip_cs, in_ref, sampling, bf16)


def _strip_consts(meta, crefs):
    """meta: [(mxs, names, base)] per strip -> [(mxs, {name: value})]."""
    out = []
    cache = {}
    for mxs, names, base in meta:
        if base not in cache:
            cache[base] = {n: crefs[base + i][:]
                           for i, n in enumerate(names)}
        out.append((mxs, cache[base]))
    return out


def _front_slab(strip_cs, in_ref, sampling: str, bf16: bool,
                front_stop: str | None = None):
    """One 128-image-row slab -> [64, slab_cols] xt value (pure VMEM).

    Wide images process in 1024-px strips (bounding the permutation
    matrices); each strip emits its per-MCU-row windows, assembled in
    (MCU row, strip) order — exactly the interleaved scan's column
    order.

    ``front_stop`` is PROFILING-ONLY (bench/front_profile.py): "deint"
    truncates after the deinterleave+color phase, "exchange" after the
    block exchanges, each folding its outputs into a garbage [64, sc]
    value so Mosaic cannot dead-code the measured phase.  420-only.
    """
    n_t = 8 if sampling == "420" else 16
    sc = slab_cols(sum(m for m, _ in strip_cs), sampling)
    if front_stop is not None:
        assert sampling == "420", "front_stop profiling is 420-only"
        acc = jnp.float32(0)
        off = 0
        for mxs, c in strip_cs:
            x = in_ref[0][:, off:off + 48 * mxs].astype(
                jnp.int32).astype(jnp.float32)
            y, cb, cr = _deint_color(x, c["sel"], 16 * mxs, bf16)
            if front_stop == "deint":
                acc = acc + jnp.sum(y) + jnp.sum(cb) + jnp.sum(cr)
            else:  # "exchange": exchanges included, window dots skipped
                ey = _exchange8(_dot(_b16(y, bf16), c["r1y"]),
                                c["il8"], bf16)
                acc = acc + jnp.sum(ey)
                for p in (cb, cr):
                    ps = _dot(_b16(p - 128.0, bf16), c["ps2"])
                    ps_tot = ps + pltpu.roll(ps, 127, axis=0)
                    csub = jnp.floor((ps_tot + 512.0) * 0.25)
                    c1 = _dot(_b16(csub, bf16), c["r1c"])
                    c2 = _dot(c["lc2"], _b16(c1, bf16))
                    cT = c2.T
                    ts = []
                    for pcol in range(8):
                        s = cT[pcol * mxs:(pcol + 1) * mxs]
                        sT = s.T
                        ts.append(jnp.concatenate(
                            [sT[8 * t:8 * (t + 1)] for t in range(8)],
                            axis=1))
                    acc = acc + jnp.sum(
                        _row_interleave8(ts, c["il8"], bf16))
            off += 48 * mxs
        return jnp.zeros((64, sc), jnp.float32) + acc
    wins = [[] for _ in range(n_t)]
    off = 0
    for mxs, c in strip_cs:
        x = in_ref[0][:, off:off + 48 * mxs].astype(
            jnp.int32).astype(jnp.float32)        # [128, 48*mxs]
        for t, w in enumerate(_strip_windows(c, x, mxs, sampling, bf16)):
            wins[t].append(w)
        off += 48 * mxs
    return jnp.concatenate([w for ws in wins for w in ws], axis=1)


def _strip_windows(c, x, mx: int, sampling: str, bf16: bool):
    """One strip of one slab -> per-MCU-row window values."""
    W = 16 * mx
    y, cb, cr = _deint_color(x, c["sel"], W, bf16)

    if sampling == "420":
        # Y rows (t8, dv, py): k16 = (t, dv); lanes (m, dh, px).
        ey = _exchange8(_dot(_b16(y, bf16), c["r1y"]), c["il8"], bf16)
        # [64, 32mx] rows (py, px), lanes (k=(t,dv), m, dh)
        ypieces = [ey[:, t * 4 * mx:(t + 1) * 4 * mx] for t in range(8)]

        def cpath(p):
            ps = _dot(_b16(p - 128.0, bf16), c["ps2"])
            ps_tot = ps + pltpu.roll(ps, 127, axis=0)    # row r += row r+1
            csub = jnp.floor((ps_tot + 512.0) * 0.25)    # (a+b+c+d)//4
            c1 = _dot(_b16(csub, bf16), c["r1c"])        # lanes (pcol, m)
            c2 = _dot(c["lc2"], _b16(c1, bf16))          # rows (t8, prow)
            cT = c2.T                                    # [W/2, 64]
            ts = []
            for pcol in range(8):
                s = cT[pcol * mx:(pcol + 1) * mx]
                sT = s.T                                 # [64, mx]
                ts.append(jnp.concatenate(
                    [sT[8 * t:8 * (t + 1)] for t in range(8)], axis=1))
            zb = _row_interleave8(ts, c["il8"], bf16)    # rows (prow, pcol)
            return [zb[:, t * mx:(t + 1) * mx] for t in range(8)]

        cbp, crp = cpath(cb), cpath(cr)
        windows = []
        for t in range(8):
            w = _dot(_b16(ypieces[t], bf16), c["rny"])
            w = w + _dot(_b16(cbp[t], bf16), c["rcb"])
            w = w + _dot(_b16(crp[t], bf16), c["rcr"])
            windows.append(w)                            # [64, 6mx]
    elif sampling == "422":
        # Y rows (t16, py); lanes (m, dh, px).
        ey = _exchange8(_dot(_b16(y, bf16), c["r1y"]), c["il8"], bf16)
        # [64, 32mx] rows (py, px), lanes (t16, m, dh)

        def cpath(p):
            ps = _dot(_b16(p - 128.0, bf16), c["ps2"])   # pair sums - 256
            csub = jnp.floor((ps + 256.0) * 0.5)         # (a+b)//2, all rows
            c1 = _dot(_b16(csub, bf16), c["r1c"])        # lanes (pcol, m)
            return _exchange8(c1, c["il8"], bf16)
            # [64, 16mx] rows (prow, pcol), lanes (t, m)

        ecb, ecr = cpath(cb), cpath(cr)
        windows = []
        for t in range(16):
            w = _dot(_b16(ey[:, t * 2 * mx:(t + 1) * 2 * mx], bf16),
                     c["rny"])
            w = w + _dot(_b16(ecb[:, t * mx:(t + 1) * mx], bf16), c["rcb"])
            w = w + _dot(_b16(ecr[:, t * mx:(t + 1) * mx], bf16), c["rcr"])
            windows.append(w)                            # [64, 4mx]
    else:  # 444
        m8 = W // 8
        ey, ecb, ecr = (
            _exchange8(_dot(_b16(p, bf16), c["r1y"]), c["il8"], bf16)
            for p in (y, cb, cr))
        # each [64, 2W] rows (py, px), lanes (t16, m8)
        windows = []
        for t in range(16):
            w = _dot(_b16(ey[:, t * m8:(t + 1) * m8], bf16), c["rny"])
            w = w + _dot(_b16(ecb[:, t * m8:(t + 1) * m8], bf16), c["rcb"])
            w = w + _dot(_b16(ecr[:, t * m8:(t + 1) * m8], bf16), c["rcr"])
            windows.append(w)                            # [64, 3*m8]
    return windows


@functools.partial(jax.jit,
                   static_argnames=("mx", "my", "sampling", "interpret"))
def front_analyze(batch_flat, mx: int, my: int, sampling: str = "420",
                  interpret: bool = False):
    """[B, H, W*3] u8 -> xt [64, B*nblk_img] f32: MCU-interleaved,
    transposed, un-level-shifted pixel blocks, ready for the fused
    DCT->place kernels.  Block column order is the T.81 A.2.3
    interleaved MCU scan (420: Y00 Y01 Y10 Y11 Cb Cr; 422: Y0 Y1 Cb Cr;
    444: Y Cb Cr per MCU).

    ``mx``/``my`` are the 16x16-granular grid (width//16, height//16)
    regardless of sampling; the kernel derives its own MCU geometry.
    Grid walks (image, 128-image-row slab); each step's [64, slab_cols]
    output block lands at 128-aligned columns because mx % 8 == 0.
    """
    B = batch_flat.shape[0]
    W = 16 * mx
    if batch_flat.shape[1] != 16 * my or batch_flat.shape[2] != W * 3:
        raise ValueError(f"batch {batch_flat.shape} != geometry "
                         f"{16*my}x{W}*3")
    if (16 * my % 128 or not front_eligible(16 * my, W, sampling, 1)
            or slab_cols(mx, sampling) % 128):
        # the xt-emitting variant writes [64, sc] HBM blocks at
        # sc-strided columns, so sc must stay 128-aligned (the mega
        # kernels handle unaligned sc via in-VMEM phantom padding)
        raise ValueError("geometry not front-eligible")
    meta, consts = _strip_args(mx, sampling, not interpret)
    G = 16 * my // 128
    sc = slab_cols(mx, sampling)
    cspecs = [pl.BlockSpec(c.shape, lambda b, g: (0, 0),
                           memory_space=pltpu.VMEM) for c in consts]
    out = pl.pallas_call(
        functools.partial(_front_kernel, meta, sampling=sampling,
                          bf16=not interpret),
        out_shape=jax.ShapeDtypeStruct((64, B * G * sc), jnp.float32),
        grid=(B, G),
        in_specs=[pl.BlockSpec((1, 128, W * 3), lambda b, g: (b, g, 0),
                               memory_space=pltpu.VMEM)] + cspecs,
        out_specs=pl.BlockSpec((64, sc), lambda b, g, G=G: (0, b * G + g),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(batch_flat, *consts)
    return out


def front_420(batch_flat, mx: int, my: int, interpret: bool = False):
    """Back-compat alias for the 4:2:0 front."""
    return front_analyze(batch_flat, mx, my, "420", interpret=interpret)


# -- fused front + entropy kernels (u8 image in, packed words out) --------

PERIOD = {"420": 6, "422": 4, "444": 3}
YPM = {"420": 4, "422": 2, "444": 1}


def _tile_lanes(a, sc):
    """[64, 128] lane-broadcast constant -> [64, sc] (sc % 128 == 0)."""
    if a.shape[1] == sc:
        return a
    return jnp.concatenate([a] * (sc // a.shape[1]), axis=1)


# Scoped-VMEM budget for ONE mega-kernel invocation, in ESTIMATE units:
# the 2026-08-20 hardware OOM measured a 16.00M hard limit at an
# estimate of 18.06M (the estimate runs ~10% hot), so 16M of estimate
# ~= 14.5M real with ~1.5M headroom for Mosaic's own spill.
_VMEM_EST_LIMIT = 16 << 20


def _const_bytes(mx: int, sampling: str) -> int:
    """bf16 bytes of the per-strip permutation-matrix sets."""
    total = 0
    for mxs in set(_strip_plan(mx)):
        _names, mats = _consts_np(mxs, sampling)
        total += sum(m.size * 2 for m in mats)
    return total


def mega_vmem_bytes(mx: int, sampling: str, seg_rows: int,
                    cbp: int) -> int:
    """Estimated scoped-VMEM footprint of one ``front_place`` grid step.

    Terms: permutation consts, double-buffered u8 input slab, the slab
    xt plus one live window copy, the VMEM-resident segment words
    buffer, the local-words scratch, and ~6 live [64, cbp] chunk
    intermediates.  Calibrated against the one measured OOM (W=1920,
    4 pseudo-segments, 2026-08-20: estimate 18.06M vs reported 16.40M
    at a 16.00M limit) — the estimate runs ~10% conservative."""
    sc = slab_cols(mx, sampling)
    seg_rows_p = (seg_rows + 7) & ~7
    return (_const_bytes(mx, sampling)
            + 2 * 128 * 16 * mx * 3      # u8 input block, double-buffered
            + 2 * 64 * sc * 4            # slab xt + live window pieces
            + seg_rows_p * 128 * 4       # resident words buffer
            + (128 + 2) * cbp * 4        # lw + carry/prev scratch
            + 6 * 64 * cbp * 4)          # live chunk intermediates


def pick_mega_layout(mx: int, sampling: str,
                     seg_rows: int) -> tuple[int, int, bool]:
    """(sc_p, cbp, fits): the place chunk layout, with cbp backed off
    through smaller 128-multiple divisors of sc_p while the estimated
    VMEM footprint exceeds the scoped limit.  ``fits=False`` means no
    layout fits — the caller must take a non-mega path."""
    sc = slab_cols(mx, sampling)
    sc_p, cbp = _pick_slab_pad(sc)
    while mega_vmem_bytes(mx, sampling, seg_rows, cbp) > _VMEM_EST_LIMIT:
        smaller = [c for c in range(cbp - 128, 0, -128) if sc_p % c == 0]
        if not smaller:
            return sc_p, cbp, False
        cbp = smaller[0]
    return sc_p, cbp, True


def mega_fits(mx: int, sampling: str, seg_rows: int) -> bool:
    return pick_mega_layout(mx, sampling, seg_rows)[2]


def analyze_fits(mx: int, sampling: str, n_outputs: int = 1,
                 symbolize: bool = True) -> bool:
    """VMEM-estimate gate for the index/xt-emitting front kernels:
    consts + double-buffered input + in-kernel xt assembly +
    ``n_outputs`` double-buffered [64, sc_p] output blocks, plus the
    symbolize chunk intermediates when the kernel runs the DCT+
    symbolize chain (``front_index``; ``front_analyze`` emits the raw
    xt only — pass ``symbolize=False`` so its gate is not ~2 MB too
    strict).  These kernels have no resident words buffer, so they fit
    wider slabs than the place mega kernel — but NOT unboundedly (the
    r5 review caught stage-1 ``front_index`` ungated past W≈3500)."""
    sc = slab_cols(mx, sampling)
    sc_p, cbp = _pick_slab_pad(sc)
    est = (_const_bytes(mx, sampling) + 2 * 128 * 16 * mx * 3
           + 2 * 64 * sc_p * 4
           + n_outputs * 2 * 64 * sc_p * 4
           + (4 * 64 * cbp * 4 if symbolize else 0))
    return est <= _VMEM_EST_LIMIT


def _pick_slab_pad(sc: int) -> tuple[int, int]:
    """(padded slab columns, chunk width) for the mega kernels.

    The place stage works in 128-multiple chunks, so a slab whose real
    block count ``sc`` isn't a 128 multiple pads with phantom blocks
    (NULL symbols, 0 bits — see ``_dct_symbolize_chunk_v`` pad_from).
    Zero padding with the largest chunk <= 2048 wins when available;
    otherwise the smallest padding (<= max(128, sc // 8) phantom
    columns) that still admits a large chunk."""
    for k in range(16, 0, -1):
        if sc % (128 * k) == 0:
            return sc, 128 * k
    for k in range(16, 0, -1):
        scp = -(-sc // (128 * k)) * (128 * k)
        if scp - sc <= max(128, sc // 8):
            return scp, 128 * k
    raise AssertionError("k = 1 always pads < 128")


def _pad_slab(xt, sc: int, sc_p: int):
    if sc_p == sc:
        return xt
    return jnp.concatenate(
        [xt, jnp.zeros((xt.shape[0], sc_p - sc), xt.dtype)], axis=1)


def _place_slab(kf, xt, g, sc, sc_p, cbp, nblk_real, sampling, m, bias128,
                ql128, qc128, lut, out_ref, tot_ref, lw_ref, carry_ref,
                prev_ref, stop_after: str = "full", impl: str = "full"):
    """Symbolize + attach + place one slab's xt, in cbp-wide chunks.

    ``sc`` is the slab's real block count; ``sc_p`` the 128-aligned
    padded count (phantom tail blocks emit no bits).  ``stop_after`` is
    profiling-only (see ``fused._place_body``)."""
    def _consume(x):
        out_ref[pl.dslice(0, 1), :] = (
            out_ref[pl.dslice(0, 1), :] + jnp.full(
                (1, 128),
                jnp.sum(x.astype(jnp.float32)).astype(jnp.int32),
                jnp.int32))

    bias_t = _tile_lanes(bias128, cbp)
    ql_t = _tile_lanes(ql128, cbp)
    qc_t = _tile_lanes(qc128, cbp)
    xt = _pad_slab(xt, sc, sc_p)
    for j in range(sc_p // cbp):
        lo = j * cbp
        chunk = xt[:, lo:lo + cbp]
        pad_from = min(cbp, sc - lo)
        idx, extra, extra_n = kf._dct_symbolize_chunk_v(
            m, bias_t, ql_t, qc_t, chunk, prev_ref,
            first=(g == 0) if j == 0 else False,
            base_blk=g * sc + lo, real_nblk=nblk_real,
            period=PERIOD[sampling], ypm=YPM[sampling],
            pad_from=pad_from if pad_from < cbp else None)
        if stop_after == "sym":
            _consume(idx + extra + extra_n)
            continue
        value, nbits = kf._attach_chunk(lut, idx, extra, extra_n)
        if stop_after == "attach":
            _consume(value + nbits)
            continue
        kf._place_body(value, nbits, out_ref, tot_ref, lw_ref, carry_ref,
                       stop_after=stop_after, impl=impl)


def _mega_place_kernel(meta, *refs, sampling: str, bf16: bool,
                       nblk_real: int, sc: int, sc_p: int, cbp: int,
                       nconst: int, sps: int, stop_after: str = "full",
                       impl: str = "full"):
    """ONE kernel from raw u8 pixels to packed segment bitstreams.

    Grid (image, 128-row slab): the front relayout (deinterleave + color
    + subsample + blocking + MCU interleave) feeds the DCT -> quantize ->
    zigzag -> DC diff -> symbolize -> attach -> place chain entirely in
    VMEM — the only HBM traffic is the u8 input read and the final words
    write.  main/encoder.c:81-432 plus its framebuffer walk as one pass.
    ``nblk_real`` < slabs*sc masks the zero-padded tail MCU rows of
    heights that are not slab multiples (tail blocks emit no bits).
    """
    from . import fused as kf
    in_ref, lut_ref, m_ref, bias_ref, ql_ref, qc_ref = refs[:6]
    crefs = refs[6:6 + nconst]
    out_ref, tot_ref = refs[6 + nconst:8 + nconst]
    lw_ref, carry_ref, prev_ref = refs[8 + nconst:]
    strip_cs = _strip_consts(meta, crefs)

    g = pl.program_id(1)
    gs = jax.lax.rem(g, jnp.int32(sps))  # slab index within the segment

    @pl.when(gs == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)
        carry_ref[:, :] = jnp.zeros_like(carry_ref)

    if stop_after in ("front_deint", "front_exchange"):
        xt = _front_slab(strip_cs, in_ref, sampling, bf16,
                         front_stop=stop_after.split("_", 1)[1])
    else:
        xt = _front_slab(strip_cs, in_ref, sampling, bf16)  # [64, sc]
    if stop_after in ("front", "front_deint", "front_exchange"):
        out_ref[pl.dslice(0, 1), :] = (
            out_ref[pl.dslice(0, 1), :] + jnp.full(
                (1, 128),
                jnp.sum(xt.astype(jnp.float32)).astype(jnp.int32),
                jnp.int32))
        return
    _place_slab(kf, xt, gs, sc, sc_p, cbp, nblk_real, sampling, m_ref[:],
                bias_ref[:], ql_ref[:], qc_ref[:], lut_ref[0], out_ref,
                tot_ref, lw_ref, carry_ref, prev_ref,
                stop_after=stop_after, impl=impl)


def _mega_index_kernel(meta, *refs, sampling: str, bf16: bool,
                       nblk_real: int, sc: int, sc_p: int, cbp: int,
                       nconst: int, sps: int, emit_xt: bool = False,
                       emit_fields: bool = False):
    """Front + DCT + symbolize emitting the combined-LUT index field
    (dynamic-mode stage 1 — feeds the MXU histograms).

    ``emit_fields`` packs (idx, extra, extra_n) into ONE int32 per slot
    (``fused._pack_fields``) so stage 2 (``fused.attach_pack_pf``) skips
    the ENTIRE front + DCT + symbolize re-run; the histogram masks
    ``pf & 1023``.  ``emit_xt`` (the r4 handoff, kept for the two-phase
    paths) additionally writes the slab's relayouted pixel blocks to a
    second output for ``fused.dct_attach_pack_xt``."""
    from . import fused as kf
    in_ref, m_ref, bias_ref, ql_ref, qc_ref = refs[:5]
    crefs = refs[5:5 + nconst]
    if emit_xt:
        idx_ref, xt_ref = refs[5 + nconst:7 + nconst]
        prev_ref = refs[7 + nconst]
    else:
        idx_ref = refs[5 + nconst]
        prev_ref = refs[6 + nconst]
    strip_cs = _strip_consts(meta, crefs)
    g = pl.program_id(1)
    gs = jax.lax.rem(g, jnp.int32(sps))
    xt = _pad_slab(_front_slab(strip_cs, in_ref, sampling, bf16), sc, sc_p)
    if emit_xt:
        xt_ref[:] = xt
    bias_t = _tile_lanes(bias_ref[:], cbp)
    ql_t = _tile_lanes(ql_ref[:], cbp)
    qc_t = _tile_lanes(qc_ref[:], cbp)
    outs = []
    for j in range(sc_p // cbp):
        lo = j * cbp
        pad_from = min(cbp, sc - lo)
        idx, extra, extra_n = kf._dct_symbolize_chunk_v(
            m_ref[:], bias_t, ql_t, qc_t, xt[:, lo:lo + cbp],
            prev_ref, first=(gs == 0) if j == 0 else False,
            base_blk=gs * sc + lo, real_nblk=nblk_real,
            period=PERIOD[sampling], ypm=YPM[sampling],
            pad_from=pad_from if pad_from < cbp else None)
        outs.append(kf._pack_fields(idx, extra, extra_n)
                    if emit_fields else idx)
    idx_ref[:] = outs[0] if len(outs) == 1 else jnp.concatenate(outs,
                                                                axis=1)


def _mega_args(mx, my, sampling, interpret):
    meta, consts = _strip_args(mx, sampling, not interpret)
    G = 16 * my // 128
    sc = slab_cols(mx, sampling)
    cspecs = [pl.BlockSpec(c.shape, lambda b, g: (0, 0),
                           memory_space=pltpu.VMEM) for c in consts]
    return meta, consts, G, sc, cspecs


def _bcast128(v):
    """[64] zig-zag-ordered table -> [64, 128] lane broadcast."""
    return jnp.broadcast_to(v.astype(jnp.float32)[:, None], (64, 128))


@functools.partial(jax.jit,
                   static_argnames=("mx", "my", "sampling", "seg_rows",
                                    "interpret", "real_height", "n_segs",
                                    "stop_after", "place_impl"))
def front_place(batch_flat, luts, m, bias, ql, qc, mx: int, my: int,
                sampling: str, seg_rows: int, interpret: bool = False,
                real_height: int | None = None, n_segs: int = 1,
                stop_after: str = "full", place_impl: str = "full"):
    """Fused u8 batch -> (words [B*n_segs, seg_rows*128] u32,
    total_bits [B*n_segs]).

    ``luts``: [1, 1024] (fixed mode, shared) or [B, 1024] (dynamic mode,
    per image).  ``n_segs`` restart segments per image, each an equal
    number of 128-row slabs (front_eligible geometry; ``seg_rows`` is
    per segment).  ``batch_flat`` rows must be a 128-multiple (callers
    zero-pad; only with n_segs == 1); ``real_height`` (default: all
    rows) masks the padded tail MCU rows.
    """
    B = batch_flat.shape[0]
    meta, consts, G, sc, cspecs = _mega_args(mx, my, sampling, interpret)
    seg_rows_p = (seg_rows + 7) & ~7
    from . import fused as kf
    if seg_rows_p * 128 * 4 > kf._RESIDENT_VMEM_BUDGET:
        raise ValueError("segment words exceed the VMEM-resident budget")
    if G % n_segs or (n_segs > 1 and real_height not in (None, 16 * my)):
        raise ValueError("segments must be whole slabs, unpadded")
    sps = G // n_segs
    grouped = luts.shape[0] != 1
    sc_p, cbp, fits = pick_mega_layout(mx, sampling, seg_rows)
    if not fits:
        raise ValueError("slab VMEM estimate exceeds the scoped limit "
                         "(callers gate via mega_fits)")
    nblk_real = _real_nblk(mx, my, sampling, real_height, G, sc) // n_segs
    kernel = functools.partial(
        _mega_place_kernel, meta, sampling=sampling,
        bf16=not interpret, nblk_real=nblk_real, sc=sc, sc_p=sc_p,
        cbp=cbp, nconst=len(consts), sps=sps, stop_after=stop_after,
        impl=place_impl)
    S = B * n_segs
    out, tot = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((S * seg_rows_p, 128), jnp.int32),
                   jax.ShapeDtypeStruct((S * 8, 128), jnp.int32)],
        grid=(B, G),
        in_specs=[pl.BlockSpec((1, 128, batch_flat.shape[2]),
                               lambda b, g: (b, g, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 8, 128),
                               lambda b, g, grp=grouped:
                                   (b if grp else 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((64, 64), lambda b, g: (0, 0),
                               memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec((64, 128), lambda b, g: (0, 0),
                               memory_space=pltpu.VMEM)] * 3 + cspecs,
        out_specs=[pl.BlockSpec((seg_rows_p, 128),
                                lambda b, g, n=n_segs, sp=sps:
                                    (b * n + g // sp, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((8, 128),
                                lambda b, g, n=n_segs, sp=sps:
                                    (b * n + g // sp, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((128, cbp), jnp.int32),
                        pltpu.VMEM((1, cbp), jnp.int32),
                        pltpu.VMEM((1, cbp), jnp.int32)],
        interpret=interpret,
    )(batch_flat, luts.reshape(-1, 8, 128), m.astype(jnp.float32),
      _bcast128(bias), _bcast128(ql), _bcast128(qc), *consts)
    words = jax.lax.bitcast_convert_type(
        out.reshape(S, seg_rows_p, 128)[:, :seg_rows], jnp.uint32)
    return words.reshape(S, seg_rows * 128), tot.reshape(S, 8, 128)[:, 0, 0]


# (front_index below shares this plumbing; keep the two in sync)


def _real_nblk(mx, my, sampling, real_height, G, sc):
    if real_height is None:
        return G * sc
    mcu_h = {"420": 16, "422": 8, "444": 8}[sampling]
    blocks_per_mcu_row = sc * mcu_h // 128
    return (real_height // mcu_h) * blocks_per_mcu_row


@functools.partial(jax.jit,
                   static_argnames=("mx", "my", "sampling", "interpret",
                                    "real_height", "n_segs", "emit_xt",
                                    "emit_fields"))
def front_index(batch_flat, m, bias, ql, qc, mx: int, my: int,
                sampling: str, interpret: bool = False,
                real_height: int | None = None, n_segs: int = 1,
                emit_xt: bool = False, emit_fields: bool = False):
    """Fused u8 batch -> combined-LUT index field [64, B*nblk_img]
    (padded tail blocks emit NULL_INDEX, whose histogram bin is
    dropped).

    ``emit_fields=True`` emits PACKED symbol fields instead
    (``fused._pack_fields``: idx | extra_n << 10 | extra << 14), same
    shape/dtype, so stage 2 (``fused.attach_pack_pf``) runs with no
    front/DCT/symbolize re-run at all; the histogram side masks
    ``pf & 1023``.  Works for any slab-column padding (phantom slots
    pack as NULL and emit no bits downstream).

    ``emit_xt=True`` returns (idx_t, xt): xt is the relayouted
    [64, B*nblk_img] f32 pixel-block layout (``front_analyze``'s), so
    stage 2 can consume it via ``fused.dct_attach_pack_xt`` instead of
    re-running the ~0.5 ms in-kernel front.  Requires 128-aligned slab
    columns (no phantom padding)."""
    B = batch_flat.shape[0]
    meta, consts, G, sc, cspecs = _mega_args(mx, my, sampling, interpret)
    sc_p, cbp = _pick_slab_pad(sc)
    if G % n_segs or (n_segs > 1 and real_height not in (None, 16 * my)):
        raise ValueError("segments must be whole slabs, unpadded")
    if emit_xt and sc_p != sc:
        raise ValueError("emit_xt needs 128-aligned slab columns")
    kernel = functools.partial(
        _mega_index_kernel, meta, sampling=sampling,
        bf16=not interpret,
        nblk_real=_real_nblk(mx, my, sampling, real_height, G, sc)
        // n_segs,
        sc=sc, sc_p=sc_p, cbp=cbp, nconst=len(consts), sps=G // n_segs,
        emit_xt=emit_xt, emit_fields=emit_fields)
    ospec = lambda: pl.BlockSpec((64, sc_p),
                                 lambda b, g, G=G: (0, b * G + g),
                                 memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((64, B * G * sc_p), jnp.int32)
    out_specs = ospec()
    if emit_xt:
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((64, B * G * sc_p), jnp.float32)]
        out_specs = [out_specs, ospec()]
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(B, G),
        in_specs=[pl.BlockSpec((1, 128, batch_flat.shape[2]),
                               lambda b, g: (b, g, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((64, 64), lambda b, g: (0, 0),
                               memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec((64, 128), lambda b, g: (0, 0),
                               memory_space=pltpu.VMEM)] * 3 + cspecs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((1, cbp), jnp.int32)],
        interpret=interpret,
    )(batch_flat, m.astype(jnp.float32), _bcast128(bias), _bcast128(ql),
      _bcast128(qc), *consts)
