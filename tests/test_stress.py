"""Stress and property tests: extreme content through the full chain."""
import numpy as np
import pytest

from jpeg_tpu.core.types import EncodeConfig
from jpeg_tpu.golden import decoder as gdec
from jpeg_tpu.golden import encoder as genc
from jpeg_tpu.pipelines.encode import JpegEncoder


def _extreme_images():
    rng = np.random.default_rng(0)
    return {
        "white": np.full((64, 64, 3), 255, np.uint8),
        "black": np.zeros((64, 64, 3), np.uint8),
        "noise": rng.integers(0, 256, size=(64, 64, 3)).astype(np.uint8),
        "saturated": np.tile(np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255],
                                       [255, 255, 0]], np.uint8).reshape(1, 4, 3),
                             (64, 16, 1)),
        "pixel_checker": (np.indices((64, 64)).sum(0) % 2 * 255
                          ).astype(np.uint8)[..., None].repeat(3, -1),
    }


@pytest.mark.parametrize("quality", [1, 50, 100])
def test_extreme_content_roundtrips(quality):
    """Worst/best-case quality x extreme content: valid streams that decode.

    quality=1 maximizes coefficient magnitudes (stresses the packer's
    worst-case buffer sizing and 12-bit amplitude classes); noise content
    maximizes symbol entropy (stresses the K.2 16-bit length limiting).
    """
    for name, img in _extreme_images().items():
        for layout in ("3scan", "interleaved"):
            cfg = EncodeConfig(quality=quality, scan_layout=layout)
            data = JpegEncoder(cfg).encode(img)
            rec = gdec.decode(data)
            assert rec.shape == img.shape, (name, layout)
            if name in ("white", "black"):
                # flat fields reconstruct to within one DC quantization
                # step (q=1 scales the DC quantizer to 31: trunc division
                # loses up to a full step -> err 3 at 255)
                tol = 4 if quality == 1 else 2
                assert np.abs(rec.astype(int) - img.astype(int)).max() <= tol, \
                    (name, layout, quality)


def test_entropy_chain_is_lossless():
    """Coefficients parsed back from the stream == coefficients we encoded.

    The entire entropy chain (symbolization, Huffman, packing, stuffing,
    markers, restart segmentation) must be exactly invertible — pixel
    fidelity is quantization-limited, but the coefficient path is not.
    """
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(64, 64, 3)).astype(np.uint8)

    stages = genc.encode_stages(img)  # float64 exact stages
    data = genc.encode(img)
    comps, coeffs, quant, w, h = gdec.parse_coefficients(data)
    # the decoder resolves DC prediction, so compare against the absolute
    # (pre-diff) zig-zagged coefficients
    np.testing.assert_array_equal(
        coeffs[1], stages["y_zigzag"].reshape(-1, 64))
    np.testing.assert_array_equal(
        coeffs[2], stages["cb_zigzag"].reshape(-1, 64))
    np.testing.assert_array_equal(
        coeffs[3], stages["cr_zigzag"].reshape(-1, 64))


def test_entropy_chain_lossless_device_interleaved():
    """Same invariant through the device pipeline with restart markers."""
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(64, 64, 3)).astype(np.uint8)
    cfg = EncodeConfig(scan_layout="interleaved", dtype="float64",
                       restart_interval_mcu_rows=1)
    data = JpegEncoder(cfg).encode(img)
    comps, coeffs, quant, w, h = gdec.parse_coefficients(data)

    stages = genc.encode_stages(img)
    # interleaved Y coefficients come back in raster block order from the
    # general decoder, with DC prediction resolved
    np.testing.assert_array_equal(coeffs[1],
                                  stages["y_zigzag"].reshape(-1, 64))


def test_sharded_rejects_bad_geometry():
    import jax
    from jpeg_tpu.parallel.mesh import make_mesh
    from jpeg_tpu.parallel.sharded import ShardedEncoder
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    mesh = make_mesh(data=1, space=2)
    with pytest.raises(ValueError):
        ShardedEncoder(mesh, 48, 64)  # 48 rows not divisible into 2x16 slabs
    with pytest.raises(ValueError):
        ShardedEncoder(mesh, 64, 64,
                       config=EncodeConfig(scan_layout="3scan"))

def test_zero_sized_image_rejected():
    with pytest.raises(ValueError):
        JpegEncoder().encode(np.zeros((0, 0, 3), np.uint8))
    from jpeg_tpu.pipelines.encode import encode_gray
    with pytest.raises(ValueError):
        encode_gray(np.zeros((0, 0), np.uint8))


def test_huffman_empty_histogram_rejected():
    from jpeg_tpu.huffman.build import build_table
    freq = np.zeros(257, np.int64)
    freq[256] = 1
    with pytest.raises(ValueError):
        build_table(freq)


@pytest.mark.parametrize("layout", ["3scan", "interleaved"])
@pytest.mark.parametrize("subsampling", ["420", "422", "444"])
@pytest.mark.parametrize("huffman", ["dynamic", "fixed"])
def test_config_matrix_roundtrips(layout, subsampling, huffman):
    """Every (layout, subsampling, huffman) combination produces a valid
    stream that decodes at the right shape, with and without restarts."""
    rng = np.random.default_rng(hash((layout, subsampling, huffman)) % 2**32)
    img = rng.integers(0, 256, size=(32, 32, 3)).astype(np.uint8)
    img[8:24, 8:24] = 128  # mix of flat + noise
    for restart in (0, 1):
        cfg = EncodeConfig(scan_layout=layout, subsampling=subsampling,
                           huffman=huffman, restart_interval_mcu_rows=restart)
        data = JpegEncoder(cfg).encode(img)
        rec = gdec.decode(data)
        assert rec.shape == img.shape
        assert gdec.psnr(rec, img) > 10.0  # decodes coherently
