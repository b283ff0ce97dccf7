"""jpeg_tpu — a TPU-native baseline JPEG encode engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference ESP32 JPEG encoder + frame-differencing firmware
(MattiaDallaCosta/JPEG-encoder-decoder), redesigned TPU-first:

* batched MXU-shaped DCT/quantization kernels over all 8x8 blocks at once,
* device-parallel entropy packing (prefix sums + scatter) replacing the
  reference's bit-serial packer,
* spatial sharding across a device mesh at restart-marker boundaries,
* a bit-exact NumPy golden path (oracle) and a full baseline decoder.

Public API:
    encode_jpeg(rgb, config)             — single-image encode on device
    decode_jpeg(data)                    — decode (device reconstruction;
                                           device entropy for restart streams)
    decode_jpeg_batch(datas)             — batch decode, one entropy kernel
    pipelines.fast.FastBatchEncoder      — fused batch encode (Pallas)
    pipelines.bucket.BucketedEncoder     — mixed-resolution batches
    parallel.sharded.ShardedEncoder      — multi-chip (data, space) mesh
    pipelines.monitor.ChangeMonitor      — frame-differencing workload
    golden.encoder / golden.decoder      — float64 host oracle
"""
from .core.types import Area, EncodeConfig  # noqa: F401


def encode_jpeg(rgb, config=None) -> bytes:
    """One-shot single-image encode (see pipelines.encode)."""
    from .pipelines.encode import encode_jpeg as _impl
    return _impl(rgb, config)


def decode_jpeg(data: bytes, entropy_engine: str = "auto"):
    """Baseline JFIF bytes -> [H, W, 3] uint8 RGB (device reconstruction)."""
    from .pipelines.decode import decode_jpeg as _impl
    return _impl(data, entropy_engine=entropy_engine)


def decode_jpeg_batch(datas, entropy_engine: str = "auto"):
    """Batch decode: all images' restart segments share one device
    entropy kernel launch (see pipelines.decode.decode_jpeg_batch)."""
    from .pipelines.decode import decode_jpeg_batch as _impl
    return _impl(datas, entropy_engine=entropy_engine)


__version__ = "0.1.0"
