"""Speculative device entropy decode of NON-restart baseline streams.

Covers every baseline layout the framework meets without restart
markers: single-component scans (grayscale images and the scans of the
reference-parity 3-scan layout, ``main/encoder.c:605-635``'s own output
format) AND interleaved single-scan color (default libjpeg/Pillow
output).  Parallelization across VPU lanes rides Huffman
self-synchronization (cf. "Accelerating JPEG Decompression on GPUs",
arxiv 2111.09219):

1. every scan's unstuffed bytes split into ~equal chunks; ALL scans'
   chunks together fill the lanes of ONE kernel launch (each lane
   carries its own Huffman tables), so even a stream of small scans
   reaches useful occupancy;
2. a positions-only pass (``kernels.huffdec.scan_positions``) decodes
   blocks from each lane's guessed byte-aligned entry until the lane
   crosses its chunk end, recording (exit bit, block count, bad flag).
   Interleaved scans additionally speculate each lane's MCU PHASE
   (which block of the Y/Y/Y/Y/Cb/Cr period its first block is) —
   wrong-phase decodes self-synchronize just like wrong-bit ones;
3. the host iterates the (entry bit, phase) fixpoint per scan chain:
   lane k's true entry state is lane k-1's exit state; each chain's
   head is exact from the start.  A lane whose guessed decode
   self-synchronized onto the true symbol stream already has the true
   exit, so chains close in 2-3 rounds empirically; desynced lanes
   propose out-of-window entries, which are clamped and repaired on
   later rounds;
4. one payload pass (``decode_segments`` with per-lane entry bits,
   phases, and block counts) emits coefficients; per-lane
   per-COMPONENT DC chains (each accumulated from 0) get
   exclusive-scan base corrections, and lanes concatenate into each
   scan's emission order.

Every inconsistency — no fixpoint within the round budget, an
undersized block cap, count mismatch, bad codes at the fixpoint, a
scan too small or too large to be worth lanes — returns None and the
caller falls back to the host decoder: the speculation is an
optimization, never a correctness dependence.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_SLACK = 384          # bytes past the chunk end each lane can read (one
#                       worst-case block is ~213 bytes)
_MIN_LANES = 8        # below this total, the threaded host decoder wins
_TARGET_LANE_BYTES = 2048
_LANE_TARGET = 640    # lanes the adaptive chunking aims to fill: 5
#                       interleaved 128-lane groups = full occupancy of
#                       one decode_segments launch


def _auto_lane_bytes(total_bytes: int) -> int:
    """Adaptive per-lane chunk size: split the WHOLE workload into
    ~_LANE_TARGET lanes.  A fixed 2048-byte chunk made big batches
    overshoot (wasted grid passes) and small streams undershoot (idle
    lanes AND a larger per-lane block cap -> more sequential lockstep
    steps — the grid length scales with blocks per lane, so halving
    lane bytes halves the sequential depth)."""
    return int(min(4096, max(512, total_bytes // _LANE_TARGET)))


_PAYLOAD_PEEL = 5     # decode_segments peel for "gray" payload passes
#                       (scan mixes dense luma with near-empty chroma)
_MAX_ROUNDS = 8
_MAX_ROUNDS_PHASED = 16   # interleaved chains may repair lane by lane
_MAX_WORDS = 4096         # per-lane row words (16 KB): the streams VMEM
#                           block is [128, max_words] i32 — beyond this
#                           (scans > ~4 MB at the 256-lane cap) the host
#                           decoder takes over instead of risking a VMEM
#                           lowering failure


def _spec_scans(scan_list, interpret: bool = False,
                target_lane_bytes: int | None = None,
                min_lanes: int = _MIN_LANES, sampling: str = "gray",
                mesh=None, mesh_axis: str = "space"):
    """Decode a list of (entropy, table_quad, nblk) scans in one
    combined speculative launch -> list of zz [nblk, 64] arrays (block
    emission order), or None (caller falls back to the host decoder).

    ``sampling`` selects the MCU pattern for EVERY chain: "gray" for
    single-component scans (3-scan layout / grayscale; tables at quad
    rows 0/1), or an interleaved mode ("420"/"422"/"444"), in which case
    lanes additionally speculate the MCU PHASE of their first block —
    initially guessed 0 and corrected through the same chain fixpoint
    as the entry bits."""
    from ..kernels import huffdec as hd
    period = len(hd._PATTERN[sampling])
    if target_lane_bytes is None:
        target_lane_bytes = _auto_lane_bytes(
            sum(len(e) for e, _, _ in scan_list))

    rows, quads, chain = [], [], []     # chain[k] = scan index of lane k
    starts_l, limits_l, need = [], [], []
    phase0_l = []
    for entropy, quad, nblk in scan_list:
        segs = hd.unstuff_segments(entropy)
        if len(segs) != 1:
            return None  # RSTn inside: the restart path is better
        b = segs[0]
        nbytes = len(b)
        s_i = int(min(max(nbytes // target_lane_bytes, 1), 256))
        o = np.linspace(0, nbytes, s_i + 1).round().astype(np.int64)
        for s, e in zip(o[:-1], o[1:]):
            rows.append(b[s:min(e + _SLACK, nbytes)])
            quads.append(quad)
            chain.append(len(need))
            starts_l.append(int(s))
            limits_l.append(8 * int(e - s))
            # initial MCU-phase prior: blocks are ~uniform in bytes, so
            # a byte-proportional guess usually lands within a repair
            # round of the truth (heads are exact; the fixpoint corrects
            # any miss)
            phase0_l.append(int(round(s * nblk / max(nbytes, 1))))
        need.append(int(nblk))
    S = len(rows)
    if S < min_lanes:
        return None
    chain = np.asarray(chain)
    starts = np.asarray(starts_l, np.int64)
    head = np.ones(S, bool)
    head[1:] = chain[1:] != chain[:-1]
    tail = np.ones(S, bool)
    tail[:-1] = chain[:-1] != chain[1:]

    streams, active, max_words = hd.pack_streams(rows)
    if max_words > _MAX_WORDS:
        return None  # giant scan: speculation must never crash, only skip
    Sp = streams.shape[0]
    maxc, delt, hvp = hd.lane_tables(quads)
    limits = np.zeros((1, Sp), np.int32)
    limits[0, :S] = limits_l
    d_streams = jnp.asarray(streams)
    d_maxc, d_delt, d_hvp = map(jnp.asarray, (maxc, delt, hvp))
    d_limits = jnp.asarray(limits)

    avg = max(1, sum(need) // S)
    # pow2 bucket: every distinct (cap, max_words, nblk_seg) triple is a
    # fresh Mosaic compile (~30 s on the tunneled chip) — quantize so
    # same-ballpark streams share executables.  3x the average blocks
    # per lane: the positions grid length IS the cap, and the r5
    # breakdown showed the old 6x margin doubled every round's wall for
    # no benefit (equal-byte chunks vary maybe +-50% in blocks; runaway
    # garbage lanes hit the cap and trigger the 4x retry either way)
    cap = 1 << int(np.ceil(np.log2(max(64, 3 * avg))))
    entries = 8 * starts.copy()          # absolute bit guesses
    phases_prior = np.asarray(phase0_l, np.int64) % period
    phases = phases_prior.copy()         # prior; heads true
    rounds = _MAX_ROUNDS if period == 1 else _MAX_ROUNDS_PHASED
    for _attempt in range(2):
        converged = False
        for _r in range(rounds):
            earr = np.zeros((1, Sp), np.int32)
            earr[0, :S] = entries - 8 * starts
            parr = np.zeros((1, Sp), np.int32)
            parr[0, :S] = phases
            if mesh is not None:
                exits, counts, bad = hd.scan_positions_sharded(
                    mesh, d_streams, d_maxc, d_delt, d_hvp,
                    jnp.asarray(earr), d_limits, cap_blocks=cap,
                    max_words=max_words, sampling=sampling,
                    phase=jnp.asarray(parr), interpret=interpret,
                    axis=mesh_axis)
            else:
                exits, counts, bad = hd.scan_positions(
                    d_streams, d_maxc, d_delt, d_hvp, jnp.asarray(earr),
                    d_limits, cap_blocks=cap, max_words=max_words,
                    sampling=sampling, phase=jnp.asarray(parr),
                    interpret=interpret)
            exits = np.asarray(exits)[:S].astype(np.int64)
            counts = np.asarray(counts)[:S].astype(np.int64)
            bad = np.asarray(bad)[:S].astype(bool)
            capped = (~bad) & (exits < limits[0, :S]) & (counts >= cap)
            if capped.any():
                break  # cap too small: retry larger
            # propose (entry bit, phase)_k = exit state of lane k-1
            # within each scan's chain; a desynced predecessor (bad code
            # or early stall) proposes garbage outside lane k's row
            # window — clamp those to the chunk start and keep iterating
            # (the chain repairs lane by lane at worst); accept only an
            # all-in-window fixpoint
            prop = exits[:-1] + 8 * starts[:-1]
            lo = 8 * starts[1:]
            in_range = (prop >= lo) & (prop <= lo + 8 * _SLACK)
            new = entries.copy()
            upd = ~head[1:]
            new[1:][upd] = np.where(in_range, prop, lo)[upd]
            newp = phases.copy()
            prop_p = (phases[:-1] + counts[:-1]) % period
            # out-of-range resets go back to the lane's phase PRIOR
            # (entry resets to the chunk start)
            newp[1:][upd] = np.where(in_range, prop_p,
                                     phases_prior[1:])[upd]
            fix = (new == entries).all() and (newp == phases).all()
            if fix and in_range[upd].all() and not bad[~tail].any():
                converged = True
                break
            if fix:
                return None  # stuck on a broken chain: corrupt stream
            entries, phases = new, newp
        if converged:
            break
        if not capped.any():
            return None  # no fixpoint within the round budget
        cap *= 4
    else:
        return None

    # chain tails decode the byte-pad tail too; clamp to the truth
    for i, nblk in enumerate(need):
        sel = chain == i
        t = np.flatnonzero(sel)[-1]
        lastn = nblk - int(counts[sel].sum() - counts[t])
        if not 0 <= lastn <= int(counts[t]):
            return None
        counts[t] = lastn

    nblk_seg = 1 << int(np.ceil(np.log2(max(16, int(counts.max())))))
    nlarr = np.zeros((1, Sp), np.int32)
    nlarr[0, :S] = counts
    earr = np.zeros((1, Sp), np.int32)
    earr[0, :S] = entries - 8 * starts
    parr = np.zeros((1, Sp), np.int32)
    parr[0, :S] = phases
    if mesh is not None:
        out = np.asarray(hd.decode_segments_sharded(
            mesh, d_streams, d_maxc, d_delt, d_hvp, jnp.asarray(nlarr),
            sampling, nblk_seg, max_words, interpret=interpret,
            axis=mesh_axis, entry=jnp.asarray(earr),
            phase=jnp.asarray(parr), phased=period > 1))[:S]
    else:
        out = np.asarray(hd.decode_segments(
            d_streams, d_maxc, d_delt, d_hvp, jnp.asarray(nlarr),
            sampling, nblk_seg, max_words, interpret=interpret,
            entry=jnp.asarray(earr), phase=jnp.asarray(parr),
            phased=period > 1, peel_luma=_PAYLOAD_PEEL))[:S]

    # stitch lanes per scan; per-lane per-COMPONENT DC chains start at
    # 0 -> exclusive-scan base corrections along each chain
    comp_of = np.asarray([c for _, _, c in hd._PATTERN[sampling]])
    results = []
    for i, nblk in enumerate(need):
        parts, base = [], np.zeros(3, np.int64)
        for k in np.flatnonzero(chain == i):
            nk = int(counts[k])
            if not nk:
                continue
            blk = out[k, :nk].copy()
            if period == 1:
                blk[:, 0] += base[0]
                base[0] = blk[-1, 0]
            else:
                cseq = comp_of[(phases[k] + np.arange(nk)) % period]
                for cc in range(3):
                    idx = np.flatnonzero(cseq == cc)
                    if idx.size:
                        blk[idx, 0] += base[cc]
                        base[cc] = blk[idx[-1], 0]
            parts.append(blk)
        zz = (np.concatenate(parts) if parts
              else np.zeros((0, 64), np.int32))
        if len(zz) != nblk:
            return None
        results.append(zz)
    return results


# -- fused single-launch decode ---------------------------------------------
#
# The host-driven fixpoint above costs one kernel dispatch plus several
# blocking transfers PER ROUND (~200 ms/round on a ~48 ms-latency
# transport) and then fetches the padded [Sp, nblk_p, 64] coefficient
# buffer to stitch on host.  The fused path moves the WHOLE decode into
# one jit: a lax.while_loop carries the (entry bit, phase) chain fixpoint
# across positions-kernel passes, the tail clamp / lane stitch / DC base
# corrections run as XLA gathers and scans on device, and the standard
# reconstruct emits the final uint8 image — one dispatch, one image-sized
# fetch.  Geometry (lane layout, chains, caps, dims) is trace-time
# static; executables cache per geometry via ``_fused_jit``.

import functools as _ft

# fixpoint status codes (device scalar -> host routing)
_ST_RUN, _ST_OK, _ST_CAPPED, _ST_BROKEN, _ST_BADCOUNT = 0, 1, 2, 3, 4


@_ft.lru_cache(maxsize=64)
def _fused_jit(S: int, Sp: int, starts_t: tuple, limits_t: tuple,
               head_t: tuple, tail_t: tuple, chain_t: tuple,
               need_t: tuple, sampling: str, cap: int, max_words: int,
               rounds: int, recon_key, interpret: bool,
               phase0_t: tuple = ()):
    """Build (and cache) the fused speculative-decode executable for one
    static geometry.  ``recon_key`` describes the reconstruction:
    ("interleaved", samp, mx, my, H, W) or ("scans", spec-tuples...) —
    see ``_spec_scans_fused`` for how it is assembled."""
    from ..kernels import huffdec as hd
    period = len(hd._PATTERN[sampling])
    starts8 = np.asarray(starts_t, np.int64) * 8
    head = np.asarray(head_t, bool)
    tail = np.asarray(tail_t, bool)
    chain = np.asarray(chain_t, np.int64)
    need = list(need_t)
    comp_of = np.asarray([c for _, _, c in hd._PATTERN[sampling]],
                         np.int32)

    def run(streams, maxc, delt, hvp, limits, *quants):
        starts8_d = jnp.asarray(starts8, jnp.int32)
        limits_s = limits[0, :S]
        upd = jnp.asarray(~head)
        midlane = jnp.asarray(~tail)

        def expand(v):  # [S] -> [1, Sp]
            return jnp.zeros((1, Sp), jnp.int32).at[0, :S].set(v)

        phases0 = (jnp.asarray(np.asarray(phase0_t, np.int32) % period)
                   if phase0_t else jnp.zeros((S,), jnp.int32))

        def positions(entries_abs, phases):
            ex, ct, bd = hd.scan_positions(
                streams, maxc, delt, hvp,
                expand(entries_abs - starts8_d), limits,
                cap_blocks=cap, max_words=max_words, sampling=sampling,
                phase=expand(phases), interpret=interpret)
            return ex[:S], ct[:S], bd[:S] != 0

        def cond(c):
            _, _, _, _, status, r = c
            return (status == _ST_RUN) & (r < rounds)

        def body(c):
            entries, phases, _, _, _, r = c
            ex, ct, bd = positions(entries, phases)
            capped = ((~bd) & (ex < limits_s) & (ct >= cap)).any()
            prop = ex + starts8_d                   # absolute exits
            propm1 = jnp.concatenate([entries[:1], prop[:-1]])
            ctm1 = jnp.concatenate([ct[:1] * 0, ct[:-1]])
            phm1 = jnp.concatenate([phases[:1], phases[:-1]])
            ir = (propm1 >= starts8_d) & \
                 (propm1 <= starts8_d + 8 * _SLACK)
            new = jnp.where(upd, jnp.where(ir, propm1, starts8_d),
                            entries)
            # out-of-range lanes reset to their ORIGINAL start, so the
            # phase resets to the lane's byte-proportional prior (not
            # 0 — that would discard the prior exactly when a repair
            # round needs it)
            newp = jnp.where(upd,
                             jnp.where(ir, (phm1 + ctm1) % period,
                                       phases0),
                             phases)
            fix = (new == entries).all() & (newp == phases).all()
            ok = jnp.where(upd, ir, True).all() & \
                ~jnp.where(midlane, bd, False).any()
            status = jnp.where(
                capped, jnp.int32(_ST_CAPPED),
                jnp.where(fix & ok, jnp.int32(_ST_OK),
                          jnp.where(fix, jnp.int32(_ST_BROKEN),
                                    jnp.int32(_ST_RUN)))).astype(jnp.int32)
            return (new, newp, ct.astype(jnp.int32),
                    bd.astype(jnp.int32), status, r + 1)

        entries0 = starts8_d
        z = jnp.zeros((S,), jnp.int32)
        entries, phases, ct, _bd, status, _r = jax.lax.while_loop(
            cond, body, (entries0, phases0, z, z,
                         jnp.int32(_ST_RUN), jnp.int32(0)))

        # tail clamp: each chain's last lane decodes byte-pad garbage
        # past the scan's true block count — clamp to the truth (static
        # chain layout, device counts)
        ok_counts = jnp.bool_(True)
        for i, nblk in enumerate(need):
            lanes = np.flatnonzero(chain == i)
            k0, k1 = int(lanes[0]), int(lanes[-1]) + 1
            total = ct[k0:k1].sum()
            lastn = nblk - (total - ct[k1 - 1])
            ok_counts &= (lastn >= 0) & (lastn <= ct[k1 - 1])
            ct = ct.at[k1 - 1].set(lastn.astype(jnp.int32))
        status = jnp.where((status == _ST_OK) & ~ok_counts,
                           _ST_BADCOUNT, status)

        out = hd.decode_segments(
            streams, maxc, delt, hvp, expand(ct), sampling, cap,
            max_words, interpret=interpret,
            entry=expand(entries - starts8_d), phase=expand(phases),
            phased=period > 1,
            # "gray"-pattern payloads mix dense luma and near-empty
            # chroma scans: a moderate peel beats the full luma one
            peel_luma=_PAYLOAD_PEEL)    # [Sp, nblk_p, 64]
        nblk_p = out.shape[1]

        def stitch(i, nblk):
            lanes = np.flatnonzero(chain == i)
            k0, k1 = int(lanes[0]), int(lanes[-1]) + 1
            nk = k1 - k0
            sl = out[k0:k1]
            ctk = ct[k0:k1]
            cum = jnp.cumsum(ctk)
            cume = cum - ctk
            di = jnp.arange(nblk, dtype=jnp.int32)
            lane = jnp.searchsorted(cum, di, side="right").astype(
                jnp.int32)
            lane = jnp.clip(lane, 0, nk - 1)
            off = jnp.clip(di - cume[lane], 0, nblk_p - 1)
            zz = sl[lane, off]                       # [nblk, 64]
            lk = jnp.arange(nk)
            if period == 1:
                fin = jnp.where(
                    ctk > 0,
                    sl[lk, jnp.clip(ctk - 1, 0, nblk_p - 1), 0], 0)
                base = jnp.cumsum(fin) - fin         # exclusive
                zz = zz.at[:, 0].add(base[lane])
            else:
                jj = jnp.arange(nblk_p, dtype=jnp.int32)
                cseq = jnp.asarray(comp_of)[
                    (phases[k0:k1, None] + jj[None]) % period]
                live = jj[None] < ctk[:, None]
                cdest = jnp.asarray(comp_of)[di % period]
                for cc in range(3):
                    m = live & (cseq == cc)
                    lastj = jnp.max(jnp.where(m, jj[None], -1), axis=1)
                    fin = jnp.where(
                        lastj >= 0,
                        sl[lk, jnp.clip(lastj, 0, nblk_p - 1), 0], 0)
                    base = jnp.cumsum(fin) - fin
                    zz = zz.at[:, 0].add(
                        jnp.where(cdest == cc, base[lane], 0))
            return zz

        zzs = [stitch(i, nblk) for i, nblk in enumerate(need)]
        # per-image reconstruction: recon_key is a TUPLE of per-image
        # (key, n_scans, n_quants) — every image of a batched launch
        # decodes and reconstructs inside this one jit
        imgs = []
        zoff = qoff = 0
        for key, n_scans, n_q in recon_key:
            imgs.append(_reconstruct_traced(
                key, zzs[zoff:zoff + n_scans],
                quants[qoff:qoff + n_q]))
            zoff += n_scans
            qoff += n_q
        return tuple(imgs), status

    return jax.jit(run)


def _reconstruct_traced(recon_key, zzs, quants):
    """Trace-time reconstruction dispatch (shapes/geometry static)."""
    from .decode import _em_to_planes, reconstruct, reconstruct_gray
    kind = recon_key[0]
    if kind == "rst":
        # per-SEGMENT zz arrays concatenate into the full interleaved
        # emission order (segments are consecutive MCU runs)
        _, samp, mx, my, ph, pw, height, width = recon_key
        em = jnp.concatenate(zzs, axis=0).reshape(mx * my, -1, 64)
        y, cb, cr = _em_to_planes(em, samp, mx, my)
        ql, qc = quants
        img = reconstruct(y, cb, cr, ql, qc, ph, pw, samp=samp)
        return img[:height, :width]
    if kind == "gray_rst":
        _, mx, my, height, width = recon_key
        (ql,) = quants
        em = jnp.concatenate(zzs, axis=0)       # [mcus, 64], period 1
        img = reconstruct_gray(em, ql, my * 8, mx * 8)
        return img[:height, :width]
    if kind == "interleaved":
        _, samp, mx, my, ph, pw, height, width = recon_key
        period = zzs[0].shape[0] // (mx * my)
        em = zzs[0].reshape(-1, period, 64)
        y, cb, cr = _em_to_planes(em, samp, mx, my)
        ql, qc = quants
        img = reconstruct(y, cb, cr, ql, qc, ph, pw, samp=samp)
        return img[:height, :width]
    if kind == "gray":
        _, bw, bh, height, width = recon_key
        (ql,) = quants
        img = reconstruct_gray(zzs[0], ql, bh * 8, bw * 8)
        return img[:height, :width]
    # kind == "scans3": three single-component scans in Y, Cb, Cr order
    _, samp, ph, pw, height, width = recon_key
    ql, qc = quants
    img = reconstruct(zzs[0], zzs[1], zzs[2], ql, qc, ph, pw, samp=samp)
    return img[:height, :width]


def _image_recon_key(p):
    """Per-image (recon key, n_scans, n_quants) + runtime quantizers for
    the fused launch, or None when the scan order defeats it."""
    if p["kind"] == "rst":
        # restart stream whose chains ARE the restart segments
        # (intra-segment entry speculation — VERDICT r4 #1)
        info = p["info"]
        S = len(p["scan_list"])
        if info["samp"] == "gray":
            key = ("gray_rst", info["mx"], info["my"],
                   *info["true_dims"])
            return (key, S, 1), (jnp.asarray(info["ql"]),)
        key = ("rst", info["samp"], info["mx"], info["my"],
               *info["dims"], *info["true_dims"])
        return (key, S, 2), (jnp.asarray(info["ql"]),
                             jnp.asarray(info["qc"]))
    if p["kind"] == "interleaved":
        ph, pw = p["pdims"]
        st = p["st"]
        key = ("interleaved", p["sampling"], p["mx"], p["my"], ph, pw,
               st["height"], st["width"])
        return (key, 1, 2), (jnp.asarray(p["ql"]), jnp.asarray(p["qc"]))
    info, grids = p["info"], p["grids"]
    comps = info["comps"]
    if len(comps) == 1:
        cid, _, _, qid = comps[0]
        bw, bh = grids[cid]
        key = ("gray", bw, bh, info["height"], info["width"])
        return (key, 1, 1), (jnp.asarray(info["quant"][qid]),)
    # scans arrive in stream order; reconstruct wants Y, Cb, Cr
    order = {s["cid"]: i for i, s in enumerate(info["scans"])}
    cids = [c[0] for c in comps]
    if [order[c] for c in cids] != list(range(3)):
        return None  # out-of-order scans: host fixpoint handles
    (cy, _, _, qy), (cb_, _, _, qb), _ = comps
    ph, pw = info["pdims"]
    key = ("scans3", info["samp"], ph, pw, info["height"],
           info["width"])
    return (key, 3, 2), (jnp.asarray(info["quant"][qy]),
                         jnp.asarray(info["quant"][qb]))


def _spec_scans_fused(ps, interpret: bool = False,
                      target_lane_bytes: int | None = None,
                      min_lanes: int = _MIN_LANES):
    """Fused decode of one OR MANY same-sampling images: one dispatch,
    one fetch for everything (fixpoint + payload + stitch + reconstruct
    all inside a single jit).

    ``ps``: list of ``_parse_spec`` dicts sharing ``sampling``.  Returns
    a list of uint8 images (one per input), or None (ineligible /
    non-converged — callers fall back to the host-driven fixpoint or
    the host decoder; a combined multi-image failure is salvaged
    per-image by the batch caller).
    """
    from ..kernels import huffdec as hd
    sampling = ps[0]["sampling"]
    period = len(hd._PATTERN[sampling])
    if target_lane_bytes is None:
        target_lane_bytes = _auto_lane_bytes(sum(
            len(e) for p in ps for e, _, _ in p["scan_list"]))

    recon_keys, quants = [], []
    for p in ps:
        got = _image_recon_key(p)
        if got is None:
            return None
        recon_keys.append(got[0])
        quants.extend(got[1])

    rows, quads, chain = [], [], []
    starts_l, limits_l, need = [], [], []
    phase0_l = []
    for p in ps:
        for entropy, quad, nblk in p["scan_list"]:
            segs = hd.unstuff_segments(entropy)
            if len(segs) != 1:
                return None
            b = segs[0]
            nbytes = len(b)
            s_i = int(min(max(nbytes // target_lane_bytes, 1), 256))
            o = np.linspace(0, nbytes, s_i + 1).round().astype(np.int64)
            for s, e in zip(o[:-1], o[1:]):
                rows.append(b[s:min(e + _SLACK, nbytes)])
                quads.append(quad)
                chain.append(len(need))
                starts_l.append(int(s))
                limits_l.append(8 * int(e - s))
                phase0_l.append(
                    int(round(s * nblk / max(nbytes, 1))))  # phase prior
            need.append(int(nblk))
    S = len(rows)
    if S < min_lanes:
        return None
    chain_np = np.asarray(chain)
    head = np.ones(S, bool)
    head[1:] = chain_np[1:] != chain_np[:-1]
    tail = np.ones(S, bool)
    tail[:-1] = chain_np[:-1] != chain_np[1:]

    streams, _active, max_words = hd.pack_streams(rows)
    if max_words > _MAX_WORDS:
        return None
    Sp = streams.shape[0]
    maxc, delt, hvp = hd.lane_tables(quads)
    limits = np.zeros((1, Sp), np.int32)
    limits[0, :S] = limits_l

    avg = max(1, sum(need) // S)
    cap = 1 << int(np.ceil(np.log2(max(64, 3 * avg))))  # see _spec_scans
    rounds = _MAX_ROUNDS if period == 1 else _MAX_ROUNDS_PHASED

    d_streams = jnp.asarray(streams)
    d_tabs = tuple(map(jnp.asarray, (maxc, delt, hvp)))
    d_limits = jnp.asarray(limits)
    for _attempt in range(2):
        fn = _fused_jit(S, Sp, tuple(starts_l), tuple(limits_l),
                        tuple(head.tolist()), tuple(tail.tolist()),
                        tuple(chain), tuple(need), sampling, cap,
                        max_words, rounds, tuple(recon_keys), interpret,
                        phase0_t=tuple(phase0_l))
        out = jax.device_get(fn(d_streams, *d_tabs, d_limits, *quants))
        imgs, status = out
        status = int(status)
        if status == _ST_OK:
            return [np.asarray(im) for im in imgs]
        if status != _ST_CAPPED:
            return None
        cap *= 4  # block cap too small: one recompile at the next bucket
    return None


def speculative_scan_zz(entropy: bytes, dc_spec, ac_spec, nblk: int,
                        interpret: bool = False,
                        target_lane_bytes: int | None = None):
    """One single-component scan -> zig-zagged [nblk, 64] int32, or None.

    ``dc_spec``/``ac_spec`` are (bits [17], huffval) DHT arrays;
    ``nblk`` the scan's true data-unit count (bw * bh).
    """
    got = _spec_scans([(entropy, (dc_spec, ac_spec, dc_spec, ac_spec),
                        nblk)], interpret=interpret,
                      target_lane_bytes=target_lane_bytes)
    return None if got is None else got[0]


def _color_geometry(comps, width, height, grids):
    """-> (samp, (ph, pw)) for an MCU-padded 3-component stream with
    shared chroma quantizers, else None."""
    from ..kernels.huffdec import SAMPLING_OF_FACTORS
    samp = SAMPLING_OF_FACTORS.get(
        tuple((h_s, v_s) for _, h_s, v_s, _ in comps))
    (cy, _, _, _qy), (cb, _, _, qb), (cr, _, _, qr) = comps
    if samp is None or qb != qr:
        return None
    mcu_h = 16 if samp == "420" else 8
    mcu_w = 8 if samp == "444" else 16
    ph = -(-height // mcu_h) * mcu_h
    pw = -(-width // mcu_w) * mcu_w
    ch_h = ph // 2 if samp == "420" else ph
    ch_w = pw // 2 if samp in ("420", "422") else pw
    if grids[cy] != (pw // 8, ph // 8) or \
            grids[cb] != (ch_w // 8, ch_h // 8) or grids[cb] != grids[cr]:
        return None  # non-MCU-padded foreign grid: host path
    return samp, (ph, pw)


def _parse_spec(data: bytes):
    """Exception-safe wrapper: malformed-but-parseable streams (bad
    table ids, truncated segments) must mean "host path", not a raised
    KeyError/IndexError that would abort a whole decode batch."""
    try:
        return _parse_spec_inner(data)
    except (KeyError, IndexError, ValueError):
        return None


def _parse_spec_inner(data: bytes):
    """Parse + fully validate a stream for the speculative path.

    Covers non-interleaved streams (grayscale / the 3-scan layout) AND
    single-scan interleaved streams WITHOUT restart markers (default
    libjpeg/Pillow output — per-lane MCU-phase speculation).  Returns
    None for anything ineligible (progressive, restarts, non-MCU-padded
    color grids, split chroma quantizers); else a dict with
    ``sampling``, ``scan_list`` (for ``_spec_scans``) and the
    reconstruction metadata.
    """
    from ..kernels import huffdec as hd
    info = hd.parse_noninterleaved_scans(data)
    if info is not None:
        comps = info["comps"]
        width, height = info["width"], info["height"]
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        grids = {}
        for cid, h_s, v_s, _qid in comps:
            cw = -(-width * h_s // hmax)
            ch = -(-height * v_s // vmax)
            grids[cid] = (-(-cw // 8), -(-ch // 8))  # (bw, bh)
        if len(comps) == 3:
            geo = _color_geometry(comps, width, height, grids)
            if geo is None:
                return None
            info["samp"], info["pdims"] = geo
        elif len(comps) != 1:
            return None
        scan_list = [
            (s["entropy"],
             (s["dc_spec"], s["ac_spec"], s["dc_spec"], s["ac_spec"]),
             grids[s["cid"]][0] * grids[s["cid"]][1])
            for s in info["scans"]]
        return dict(kind="scans", sampling="gray", scan_list=scan_list,
                    info=info, grids=grids)

    # interleaved single scan, no DRI (default foreign output)
    st = hd.parse_scan_structure(data, require_restarts=False)
    if st is None or st["restart_interval"] or len(st["comps"]) != 3:
        return None
    comps = st["comps"]
    width, height = st["width"], st["height"]
    # interleaved block grids are MCU-padded by construction — only the
    # sampling mode and shared chroma tables need checking
    samp = hd.SAMPLING_OF_FACTORS.get(
        tuple((h_s, v_s) for _, h_s, v_s, _ in comps))
    (cid0, _, _, qid0), (cid1, _, _, qid1), (cid2, _, _, qid2) = comps
    if samp is None or qid1 != qid2 \
            or st["tabs"][cid1] != st["tabs"][cid2]:
        return None
    mcu_h = 16 if samp == "420" else 8
    mcu_w = 8 if samp == "444" else 16
    mx, my = -(-width // mcu_w), -(-height // mcu_h)
    dht = st["dht"]
    dc0, ac0 = st["tabs"][cid0]
    dc1, ac1 = st["tabs"][cid1]
    try:
        quad = (dht[(0, dc0)], dht[(1, ac0)], dht[(0, dc1)],
                dht[(1, ac1)])
    except KeyError:
        return None
    period = len(hd._PATTERN[samp])
    scan_list = [(st["entropy"], quad, mx * my * period)]
    return dict(kind="interleaved", sampling=samp, scan_list=scan_list,
                st=st, mx=mx, my=my,
                pdims=(my * mcu_h, mx * mcu_w),
                ql=st["quant"][qid0], qc=st["quant"][qid1])


def _reconstruct_spec(p, zzs):
    """Per-scan coefficient arrays -> uint8 image (device IDCT path)."""
    from .decode import _em_to_planes, reconstruct, reconstruct_gray
    if p["kind"] == "interleaved":
        st, samp = p["st"], p["sampling"]
        period = zzs[0].shape[0] // (p["mx"] * p["my"])
        em = zzs[0].reshape(-1, period, 64)
        y, cb, cr = _em_to_planes(em, samp, p["mx"], p["my"])
        ph, pw = p["pdims"]
        height, width = st["height"], st["width"]
        out = np.asarray(reconstruct(
            jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr),
            jnp.asarray(p["ql"]), jnp.asarray(p["qc"]), ph, pw,
            samp=samp))
        return out[:height, :width]
    info, grids = p["info"], p["grids"]
    comps = info["comps"]
    width, height = info["width"], info["height"]
    zz_by_cid = {s["cid"]: zz for s, zz in zip(info["scans"], zzs)}
    if len(comps) == 1:
        cid, _, _, qid = comps[0]
        bw, bh = grids[cid]
        out = np.asarray(reconstruct_gray(
            jnp.asarray(zz_by_cid[cid]), jnp.asarray(info["quant"][qid]),
            bh * 8, bw * 8))
        return out[:height, :width]
    (cy, _, _, qy), (cb, _, _, qb), (cr, _, _, _qr) = comps
    ph, pw = info["pdims"]
    out = np.asarray(reconstruct(
        jnp.asarray(zz_by_cid[cy]), jnp.asarray(zz_by_cid[cb]),
        jnp.asarray(zz_by_cid[cr]), jnp.asarray(info["quant"][qy]),
        jnp.asarray(info["quant"][qb]), ph, pw, samp=info["samp"]))
    return out[:height, :width]


def speculative_decode(data: bytes, interpret: bool = False,
                       target_lane_bytes: int | None = None,
                       mesh=None, mesh_axis: str = "space"):
    """Non-restart baseline stream -> [H, W, 3] / [H, W] uint8, or None.

    Covers grayscale, 3-scan color (the reference's own layout), and
    interleaved single-scan color (default libjpeg output) with
    MCU-padded component grids; all scans share one combined
    speculative launch, the reconstruction rides the standard device
    path.
    """
    p = _parse_spec(data)
    if p is None:
        return None
    if mesh is None:
        # fused single-launch path first: one dispatch + one image
        # fetch; any failure (non-convergence, odd scan order) falls
        # through to the host-driven fixpoint below
        imgs = _spec_scans_fused([p], interpret=interpret,
                                 target_lane_bytes=target_lane_bytes)
        if imgs is not None:
            return imgs[0]
    got = _spec_scans(p["scan_list"], interpret=interpret,
                      target_lane_bytes=target_lane_bytes,
                      sampling=p["sampling"], mesh=mesh,
                      mesh_axis=mesh_axis)
    if got is None:
        return None
    return _reconstruct_spec(p, got)


def _restart_spec(data: bytes, info=None):
    """Restart-delimited stream -> fused-speculation parse dict whose
    CHAINS are the restart segments (intra-segment entry speculation,
    VERDICT r4 #1): each segment's bytes split into byte-aligned lane
    chunks whose entry bits/phases converge through the standard chain
    fixpoint, so a stream with FEW segments still fills the VPU lanes.
    Segment heads are exact (bit 0, MCU phase 0 — restart semantics,
    T.81 F.2.1.3.1), and per-chain DC bases start at 0 exactly as the
    restart DC reset requires.  Returns None when ineligible."""
    from .decode import _parse_device_eligible
    if info is None:
        info = _parse_device_eligible(data)
    if info is None:
        return None
    scan_list = [(seg.tobytes(), info["quad"], n)
                 for seg, n in zip(info["segs_raw"], info["nblk"])]
    return dict(kind="rst", sampling=info["samp"], scan_list=scan_list,
                info=info)


def speculative_decode_restart(data: bytes, interpret: bool = False,
                               target_lane_bytes: int | None = None,
                               info=None):
    """Fused intra-segment speculative decode of a RESTART stream ->
    uint8 image, or None (callers fall back to ``device_entropy_zz`` /
    the host decoder).  One dispatch + one image fetch: the win over
    the plain segment-per-lane kernel is lane occupancy — a stream
    with S segments yields only S lanes there, while this path yields
    ~bytes/2048 lanes per segment."""
    p = _restart_spec(data, info=info)
    if p is None:
        return None
    imgs = _spec_scans_fused([p], interpret=interpret,
                             target_lane_bytes=target_lane_bytes)
    return None if imgs is None else imgs[0]


def speculative_decode_batch(datas, interpret: bool = False,
                             target_lane_bytes: int | None = None,
                             mesh=None, mesh_axis: str = "space"):
    """Batch variant -> list of (image or None), one entry per input.

    Images' scans share combined launches (grouped by sampling mode —
    the MCU pattern is a static kernel parameter), amortizing the
    fixpoint rounds' dispatch latency across the batch; if a combined
    call fails (one corrupt stream), its images are salvaged
    individually before giving up on them.
    """
    parsed = [_parse_spec(d) for d in datas]
    results: list = [None] * len(datas)
    groups: dict = {}
    for i, p in enumerate(parsed):
        if p is not None:
            groups.setdefault(p["sampling"], []).append(i)
    for sampling, idx in groups.items():
        if mesh is None:
            # batched fused launch: all of this group's images decode
            # AND reconstruct in one jit — one put + one fetch total
            imgs = _spec_scans_fused(
                [parsed[i] for i in idx], interpret=interpret,
                target_lane_bytes=target_lane_bytes)
            if imgs is not None:
                for i, im in zip(idx, imgs):
                    results[i] = im
                continue
        combined = []
        for i in idx:
            combined.extend(parsed[i]["scan_list"])
        got = _spec_scans(combined, interpret=interpret,
                          target_lane_bytes=target_lane_bytes,
                          sampling=sampling, mesh=mesh,
                          mesh_axis=mesh_axis)
        if got is not None:
            off = 0
            for i in idx:
                n = len(parsed[i]["scan_list"])
                results[i] = _reconstruct_spec(parsed[i],
                                               got[off:off + n])
                off += n
            continue
        for i in idx:  # combined failed: salvage per image
            got_i = _spec_scans(parsed[i]["scan_list"],
                                interpret=interpret,
                                target_lane_bytes=target_lane_bytes,
                                sampling=sampling, mesh=mesh,
                                mesh_axis=mesh_axis)
            if got_i is not None:
                results[i] = _reconstruct_spec(parsed[i], got_i)
    return results
