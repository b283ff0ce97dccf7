"""Device-parallel Huffman decode (kernels.huffdec) vs the host decoders.

The kernel's zigzag coefficient output must equal the golden decoder's
parse exactly (integer-exact oracle); decode_jpeg's device-entropy path
must reconstruct within the usual device/host reconstruction tolerance.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from jpeg_tpu.core.types import EncodeConfig
from jpeg_tpu.golden.decoder import parse_coefficients
from jpeg_tpu.kernels import huffdec as hd
from jpeg_tpu.pipelines.decode import decode_jpeg, device_entropy_zz
from jpeg_tpu.pipelines.encode import JpegEncoder


def _img(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    img[:, :w // 2, 0] = ((yy * 2 + xx) % 256).astype(np.uint8)[:, :w // 2]
    return img


def _emission_oracle(data, samp):
    """Golden-decoder coefficients, re-interleaved to emission order."""
    comps, coeffs, quant, w, h = parse_coefficients(bytes(data))
    mcu_w = 8 if samp == "444" else 16
    mcu_h = 16 if samp == "420" else 8
    mx, my = -(-w // mcu_w), -(-h // mcu_h)
    mcus = mx * my
    period = len(hd._PATTERN[samp])
    oracle = np.zeros((mcus * period, 64), np.int32)
    off = 0
    for comp in comps:
        hv = comp.h_samp * comp.v_samp
        sel = (np.arange(mcus)[:, None] * period
               + off + np.arange(hv)).reshape(-1)
        r = np.arange(my)[:, None, None, None]
        c = np.arange(mx)[None, :, None, None]
        dv = np.arange(comp.v_samp)[None, None, :, None]
        dh = np.arange(comp.h_samp)[None, None, None, :]
        bi = ((comp.v_samp * r + dv) * comp.bw
              + comp.h_samp * c + dh).reshape(-1)
        oracle[sel] = coeffs[comp.comp_id][bi]
        off += hv
    return oracle, mcus


@pytest.mark.parametrize("samp,h,w,ri,huff", [
    ("420", 128, 128, 2, "fixed"),
    ("420", 128, 128, 1, "dynamic"),
    ("422", 64, 96, 2, "fixed"),
    ("444", 64, 64, 4, "dynamic"),
    ("420", 160, 96, 5, "fixed"),   # non-mod-128 geometry, 2 segments
])
def test_kernel_matches_golden_coefficients(samp, h, w, ri, huff):
    img = _img(h, w, seed=h + w)
    cfg = EncodeConfig(scan_layout="interleaved", huffman=huff,
                       restart_interval_mcu_rows=ri, engine="xla",
                       subsampling=samp)
    data = bytes(JpegEncoder(cfg).encode(img))
    st = hd.parse_scan_structure(data)
    assert st is not None
    oracle, mcus = _emission_oracle(data, samp)
    ri_mcus = st["restart_interval"]
    S = mcus // ri_mcus
    segs = hd.unstuff_segments(st["entropy"], n_expected=S)
    streams, active, max_words = hd.pack_streams(segs)
    dht = st["tabs"]
    c0, c1 = st["comps"][0][0], st["comps"][1][0]
    quad = (st["dht"][(0, dht[c0][0])], st["dht"][(1, dht[c0][1])],
            st["dht"][(0, dht[c1][0])], st["dht"][(1, dht[c1][1])])
    maxc, delt, hvp = hd.lane_tables([quad] * S)
    period = len(hd._PATTERN[samp])
    nblk_seg = ri_mcus * period
    out = hd.decode_segments(
        jnp.asarray(streams), jnp.asarray(maxc), jnp.asarray(delt),
        jnp.asarray(hvp), jnp.asarray(active * nblk_seg), samp, nblk_seg,
        max_words, interpret=True)
    emission = np.asarray(out)[:S, :nblk_seg].reshape(-1, 64)
    assert np.array_equal(emission, oracle)


@pytest.mark.parametrize("samp", ["420", "422", "444"])
def test_decode_jpeg_device_entropy_roundtrip(samp):
    img = _img(96, 96, seed=11)
    cfg = EncodeConfig(scan_layout="interleaved", huffman="fixed",
                       restart_interval_mcu_rows=2, engine="xla",
                       subsampling=samp)
    data = bytes(JpegEncoder(cfg).encode(img))
    got = decode_jpeg(data, entropy_engine="device", interpret=True)
    ref = decode_jpeg(data, entropy_engine="host")
    assert got.shape == ref.shape == img.shape
    # both run the same device reconstruction from identical coefficients
    assert np.array_equal(got, ref)


def test_decode_jpeg_device_rejects_ineligible():
    img = _img(64, 64, seed=3)
    data = bytes(JpegEncoder(EncodeConfig()).encode(img))  # 3-scan layout
    with pytest.raises(ValueError, match="not eligible"):
        decode_jpeg(data, entropy_engine="device", interpret=True)
    # auto falls back silently
    out = decode_jpeg(data, entropy_engine="auto", interpret=True)
    assert out.shape == img.shape


def test_device_entropy_foreign_partial_segment():
    """A Pillow/libjpeg stream whose restart interval does not divide the
    MCU count (short final segment) must decode on device, matching both
    our host decoder and Pillow's own pixels exactly."""
    import io
    from PIL import Image
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (80, 96, 3), dtype=np.uint8)
    buf = io.BytesIO()
    # 96x80 at 4:2:0 -> 6x5 = 30 MCUs; 2 MCU rows per restart -> ri=12:
    # segments of 12, 12, 6 blocks' worth of MCUs
    Image.fromarray(img, "RGB").save(
        buf, "JPEG", quality=90, subsampling=2, restart_marker_rows=2)
    data = buf.getvalue()
    st = hd.parse_scan_structure(data)
    assert st is not None and st["restart_interval"] == 12
    got = decode_jpeg(data, entropy_engine="device", interpret=True)
    ref = decode_jpeg(data, entropy_engine="host")
    assert np.array_equal(got, ref)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    # same bitstream, independent IDCT implementations: near-identical
    assert np.mean(np.abs(got.astype(int) - pil.astype(int))) < 1.5


def test_device_entropy_many_segments():
    """More segments than one lane group (Sp > 128) spills into a second
    grid row; cumulative DC chains must reset per segment."""
    img = _img(2064, 32, seed=7)  # 129 MCU rows x 2 -> 129 segments
    h, w = img.shape[:2]
    cfg = EncodeConfig(scan_layout="interleaved", huffman="fixed",
                       restart_interval_mcu_rows=1, engine="xla")
    data = bytes(JpegEncoder(cfg).encode(img))
    st = hd.parse_scan_structure(data)
    mcus = (h // 16) * (w // 16)
    S = mcus // st["restart_interval"]
    assert S > 128
    oracle, _ = _emission_oracle(data, "420")
    dev = device_entropy_zz(data, interpret=True)
    assert dev is not None
    got = decode_jpeg(data, entropy_engine="device", interpret=True)
    ref = decode_jpeg(data, entropy_engine="host")
    assert np.array_equal(got, ref)


def test_decode_jpeg_batch_mixed():
    """Mixed sizes, samplings, table modes, a foreign Pillow stream, and
    an ineligible 3-scan stream in one batch: per-image host-engine
    results must be reproduced exactly."""
    import io
    from PIL import Image
    from jpeg_tpu.pipelines.decode import decode_jpeg_batch

    datas = []
    for samp, hw, ri, huff in [("420", (96, 96), 2, "fixed"),
                               ("420", (96, 96), 3, "dynamic"),
                               ("422", (64, 96), 2, "fixed"),
                               ("444", (64, 64), 4, "dynamic"),
                               ("420", (128, 64), 1, "fixed")]:
        cfg = EncodeConfig(scan_layout="interleaved", huffman=huff,
                           restart_interval_mcu_rows=ri, engine="xla",
                           subsampling=samp)
        datas.append(bytes(JpegEncoder(cfg).encode(
            _img(*hw, seed=sum(hw)))))
    buf = io.BytesIO()
    Image.fromarray(_img(80, 96, seed=5), "RGB").save(
        buf, "JPEG", quality=85, subsampling=2, restart_marker_rows=2)
    datas.append(buf.getvalue())
    datas.append(bytes(JpegEncoder(EncodeConfig()).encode(
        _img(64, 64, seed=9))))  # 3-scan: host fallback inside the batch

    got = decode_jpeg_batch(datas, interpret=True)
    for g, d in zip(got, datas):
        assert np.array_equal(g, decode_jpeg(d, entropy_engine="host"))

    with pytest.raises(ValueError, match="stream 6"):
        decode_jpeg_batch(datas, entropy_engine="device", interpret=True)


def test_device_entropy_grayscale():
    """Single-component (grayscale) restart streams decode on device —
    the scan's data units are bare blocks (T.81 A.2, non-interleaved)."""
    import io
    from PIL import Image
    rng = np.random.default_rng(33)
    img = rng.integers(0, 256, (72, 88), dtype=np.uint8)
    img[:36] = (np.arange(88) * 2 % 256).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img, "L").save(buf, "JPEG", quality=92,
                                   restart_marker_rows=3)
    data = buf.getvalue()
    got = decode_jpeg(data, entropy_engine="device", interpret=True)
    ref = decode_jpeg(data, entropy_engine="host")
    assert got.shape == ref.shape == img.shape
    assert np.array_equal(got, ref)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("L"))
    assert np.mean(np.abs(got.astype(int) - pil.astype(int))) < 1.5
    # and through the batch API alongside a color stream
    from jpeg_tpu.pipelines.decode import decode_jpeg_batch
    cfg = EncodeConfig(scan_layout="interleaved", huffman="fixed",
                       restart_interval_mcu_rows=2, engine="xla")
    color = bytes(JpegEncoder(cfg).encode(_img(96, 96, seed=2)))
    outs = decode_jpeg_batch([data, color], interpret=True)
    assert np.array_equal(outs[0], ref)
    assert np.array_equal(outs[1], decode_jpeg(color, entropy_engine="host"))


@pytest.mark.parametrize("pil_samp,h,w,q", [
    (0, 56, 72, 95),    # 4:4:4, odd block grid
    (1, 100, 60, 80),   # 4:2:2, non-mod-16 height
    (2, 120, 104, 70),  # 4:2:0, non-mod-16 width
])
def test_device_entropy_pillow_sweep(pil_samp, h, w, q):
    """libjpeg streams across subsamplings, odd geometries, and quality
    (scaled tables) through the device engine, vs Pillow's own pixels."""
    import io
    from PIL import Image
    rng = np.random.default_rng(h * w)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img, "RGB").save(buf, "JPEG", quality=q,
                                     subsampling=pil_samp,
                                     restart_marker_rows=1)
    data = buf.getvalue()
    got = decode_jpeg(data, entropy_engine="device", interpret=True)
    ref = decode_jpeg(data, entropy_engine="host")
    assert np.array_equal(got, ref)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert got.shape == pil.shape
    assert np.mean(np.abs(got.astype(int) - pil.astype(int))) < 2.0


def test_decode_segments_sharded_matches_single():
    """Segments sharded over an 8-device CPU mesh decode to the same
    pixels as the single-device kernel (no collectives, pure split)."""
    from jpeg_tpu.parallel.mesh import make_mesh
    from jpeg_tpu.pipelines.decode import decode_jpeg_batch
    mesh = make_mesh(data=1, space=8)
    datas = []
    for seed, (h, w) in enumerate([(96, 96), (128, 64), (96, 96)]):
        cfg = EncodeConfig(scan_layout="interleaved", huffman="fixed",
                           restart_interval_mcu_rows=1, engine="xla")
        datas.append(bytes(JpegEncoder(cfg).encode(_img(h, w, seed=seed))))
    single = decode_jpeg_batch(datas, interpret=True)
    sharded = decode_jpeg_batch(datas, interpret=True, mesh=mesh)
    for a, b in zip(single, sharded):
        assert np.array_equal(a, b)


def test_decode_segments_multigroup_parity():
    """G interleaved 128-lane groups must decode byte-identically to the
    single-group kernel (the auto pick keys on Sp//128 divisibility:
    tiling a 128-lane problem x4 exercises groups=4)."""
    img = _img(128, 128, seed=77)
    cfg = EncodeConfig(scan_layout="interleaved", huffman="fixed",
                       restart_interval_mcu_rows=2, engine="xla")
    data = bytes(JpegEncoder(cfg).encode(img))
    st = hd.parse_scan_structure(data)
    mcus = (128 // 16) * (128 // 16)
    S = mcus // st["restart_interval"]
    segs = hd.unstuff_segments(st["entropy"], n_expected=S)
    dht = st["tabs"]
    c0, c1 = st["comps"][0][0], st["comps"][1][0]
    quad = (st["dht"][(0, dht[c0][0])], st["dht"][(1, dht[c0][1])],
            st["dht"][(0, dht[c1][0])], st["dht"][(1, dht[c1][1])])
    nblk_seg = st["restart_interval"] * 6

    def run(reps):
        sg = segs * ((reps * 128) // S)
        streams, active, max_words = hd.pack_streams(sg)
        maxc, delt, hvp = hd.lane_tables([quad] * len(sg))
        return np.asarray(hd.decode_segments(
            jnp.asarray(streams), jnp.asarray(maxc), jnp.asarray(delt),
            jnp.asarray(hvp), jnp.asarray(active * nblk_seg), "420",
            nblk_seg, max_words, interpret=True))

    one = run(1)       # Sp = 128 -> groups = 1
    four = run(4)      # Sp = 512 -> groups = 4
    for r in range(4):
        assert np.array_equal(four[r * 128:(r + 1) * 128][:S], one[:S])


def test_peel_production_parity(monkeypatch):
    """The production luma peel size (capped in interpret mode to keep
    this suite fast) decodes byte-identically to the capped one."""
    img = _img(96, 96, seed=5)
    cfg = EncodeConfig(scan_layout="interleaved", huffman="fixed",
                       restart_interval_mcu_rows=2, engine="xla")
    data = bytes(JpegEncoder(cfg).encode(img))
    st = hd.parse_scan_structure(data)
    S = (96 // 16) * (96 // 16) // st["restart_interval"]
    segs = hd.unstuff_segments(st["entropy"], n_expected=S)
    dht = st["tabs"]
    c0, c1 = st["comps"][0][0], st["comps"][1][0]
    quad = (st["dht"][(0, dht[c0][0])], st["dht"][(1, dht[c0][1])],
            st["dht"][(0, dht[c1][0])], st["dht"][(1, dht[c1][1])])
    nblk_seg = st["restart_interval"] * 6
    streams, active, max_words = hd.pack_streams(segs)
    maxc, delt, hvp = hd.lane_tables([quad] * S)

    def run():
        return np.asarray(hd.decode_segments(
            jnp.asarray(streams), jnp.asarray(maxc), jnp.asarray(delt),
            jnp.asarray(hvp), jnp.asarray(active * nblk_seg), "420",
            nblk_seg, max_words, interpret=True))

    capped = run()
    # force the full production peel through the interpret path
    real_kernel = hd._hd_kernel
    monkeypatch.setattr(
        hd, "_hd_kernel",
        lambda *a, **k: real_kernel(
            *a, **{**k, "peel_luma": hd._PEEL_LUMA}))
    hd.decode_segments.clear_cache()
    full = run()
    hd.decode_segments.clear_cache()
    assert np.array_equal(capped, full)


def test_symbol_core_matches_bruteforce():
    """_decode_symbol_core (single masked-sum form) vs a brute-force
    canonical decode, over random tables and exhaustive-ish peeks —
    including no-match peeks (length 17) and length-16 codes."""
    rng = np.random.default_rng(42)
    for trial in range(4):
        # random canonical table: random BITS histogram over a random
        # symbol alphabet (including the degenerate nearly-empty table)
        nsym = int(rng.integers(1, 200)) if trial else 1
        bits = np.zeros(17, np.int64)
        left = nsym
        space = 2  # free canonical code space entering each length
        for l in range(1, 17):
            # keep >=1 slot open below l=16 so deeper codes stay valid
            room = min(left, space - (1 if l < 16 else 0))
            n = int(rng.integers(0, room + 1)) if l < 16 else room
            bits[l] = n
            left -= n
            space = (space - n) * 2
            if not left:
                break
        nsym = int(bits.sum())
        huffval = rng.integers(0, 256, nsym).astype(np.int64)
        bound, delta, hv = hd.canonical_tables(bits, huffval)

        # brute-force oracle: walk code lengths like T.81 F.2.2.3
        def oracle(peek16):
            code, k = 0, 0
            for l in range(1, 17):
                n = int(bits[l])
                cd = peek16 >> (16 - l)
                if n and cd < code + n:
                    return int(hv[k + cd - code]), l
                code = (code + n) << 1
                k += n
            return None, 17

        peeks = np.unique(np.concatenate([
            rng.integers(0, 1 << 16, 128),
            np.asarray([0, 1, 0xFFFF, 0x8000, 0x7FFF])]))[:hd._LG]
        pk = np.zeros((1, hd._LG), np.int64)
        pk[0, :len(peeks)] = peeks << 16  # peek32 with peek16 on top

        maxc = np.tile(bound[:, None], (1, hd._LG))
        delt = np.tile(delta[:, None], (1, hd._LG))
        hvp = (hv.reshape(64, 4)
               * (1 << (8 * np.arange(4, dtype=np.int64)))).sum(-1)
        hvp = np.tile(hvp[None].astype(np.uint32).view(np.int32),
                      (hd._LG, 1))
        tabs = hd._prep_tables((jnp.asarray(maxc, jnp.int32),
                                jnp.asarray(delt, jnp.int32),
                                jnp.asarray(hvp)))
        sym, ln = hd._decode_symbol_core(jnp.asarray(pk, jnp.int32), *tabs)
        sym, ln = np.asarray(sym)[0], np.asarray(ln)[0]
        for i, p in enumerate(peeks):
            want_sym, want_len = oracle(int(p))
            assert ln[i] == want_len, (trial, hex(p), ln[i], want_len)
            if want_sym is not None:
                assert sym[i] == want_sym, (trial, hex(p), sym[i], want_sym)
