"""Test configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths
(mesh/shard_map) execute without TPU hardware, mirroring the reference's
hardware-independence strategy (SURVEY §4.4: develop stages on host against
the golden encoder, then deploy).
"""
import os

# Must be set before jax is imported anywhere.  Tests always run on CPU
# (the TPU env exports JAX_PLATFORMS=axon; override it here).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon sitecustomize prepends the TPU platform regardless of env vars;
# force CPU explicitly (config wins over the sitecustomize default).
jax.config.update("jax_platforms", "cpu")
# float64 on CPU enables the bit-exact parity mode of the device pipeline
# (dtype="float64" uses the reference's exact summation order).
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest

REFERENCE_IMAGES = "/root/reference/images"


def _checkerboard(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((yy // 16 + xx // 16) % 2) * 180 + 40
    img = np.stack([base, 255 - base, (xx * 255 // max(w - 1, 1))], axis=-1)
    noise = rng.integers(-20, 21, size=img.shape)
    return np.clip(img + noise, 0, 255).astype(np.uint8)


@pytest.fixture(scope="session")
def img64():
    """64x64 test image: the reference fixture if present, else synthetic."""
    path = os.path.join(REFERENCE_IMAGES, "sample_64x64.ppm")
    if os.path.exists(path):
        from jpeg_tpu.io.ppm import read_ppm
        return read_ppm(path)
    return _checkerboard(64, 64)


@pytest.fixture(scope="session")
def img640():
    path = os.path.join(REFERENCE_IMAGES, "sample_640x640.ppm")
    if os.path.exists(path):
        from jpeg_tpu.io.ppm import read_ppm
        return read_ppm(path)
    return _checkerboard(640, 640, seed=1)


@pytest.fixture(scope="session")
def img640_diffs():
    path = os.path.join(REFERENCE_IMAGES, "sample_640x640_diffs.ppm")
    if os.path.exists(path):
        from jpeg_tpu.io.ppm import read_ppm
        return read_ppm(path)
    img = _checkerboard(640, 640, seed=1).copy()
    img[100:180, 300:420] = 255 - img[100:180, 300:420]
    return img


@pytest.fixture(scope="session")
def img_synthetic_160():
    return _checkerboard(160, 96, seed=2)
