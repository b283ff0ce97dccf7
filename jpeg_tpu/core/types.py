"""Core configuration and geometry types.

The reference's geometry type is ``area_t {x, y, w, h}``
(``include/structs.h:15-20``); its encode configuration is compile-time
macros (``include/define.h``).  Here both are first-class dataclasses.
"""
from __future__ import annotations

import dataclasses
from typing import Literal

ScanLayout = Literal["3scan", "interleaved"]


@dataclasses.dataclass(frozen=True)
class Area:
    """A window of a larger frame; w and h must be multiples of 16.

    Mirrors ``area_t`` (``include/structs.h:15-20``) and the windowed-encode
    contract of ``rgb_to_dct`` (``main/encoder.c:158``).
    """

    x: int
    y: int
    w: int
    h: int

    def __post_init__(self):
        if self.w % 16 or self.h % 16:
            raise ValueError(f"Area w/h must be multiples of 16, got {self.w}x{self.h}")
        if self.x < 0 or self.y < 0:
            raise ValueError(f"Area origin must be non-negative, got ({self.x},{self.y})")

    @property
    def num_pixels(self) -> int:
        return self.w * self.h

    @property
    def mcus_x(self) -> int:
        return self.w // 16

    @property
    def mcus_y(self) -> int:
        return self.h // 16


@dataclasses.dataclass(frozen=True)
class EncodeConfig:
    """Configuration for the encode pipelines.

    quality=None reproduces the reference's unscaled T.81 tables
    (its ``set_quality`` call is commented out, ``utils/original.c:1157-1158``).

    scan_layout:
      * "3scan"       — three non-interleaved single-component scans, the
                        reference's layout (``main/encoder.c:605-635``).
      * "interleaved" — one interleaved Y/Cb/Cr scan; required for
                        restart-marker spatial sharding (DRI/RSTn).

    huffman:
      * "dynamic" — per-image K.2 tables, the reference's behavior
                    (``main/encoder.c:360-381``).
      * "fixed"   — T.81 Annex K.3 typical tables; avoids the per-image
                    device->host histogram sync (batch fast path).
      * "dynamic-sampled" — per-image K.2 tables from a 1/5-sampled
                    symbol histogram with a +1 floor on every possible
                    symbol (so a symbol the sample missed still keeps
                    a code — the stream stays legal for any content).
                    Identical PSNR to "dynamic" (same quantization),
                    compressed size typically within ~1%, and the
                    dominant dynamic-only device cost (the exact
                    histogram) drops ~5x.  FastBatchEncoder fast path
                    only (JpegEncoder treats it as exact dynamic).

    restart_interval_mcu_rows: if > 0, emit DRI and an RSTn marker every N
    MCU rows (interleaved: 16px MCU rows; 3scan: 8px block rows per
    component scan); each segment's DC prediction resets, which is what
    makes spatial sharding across devices possible.
    """

    quality: int | None = None
    scan_layout: ScanLayout = "3scan"
    huffman: Literal["dynamic", "fixed", "dynamic-sampled"] = "dynamic"
    # Chroma subsampling: "420" (the reference's only mode), "422"
    # (horizontal-only; 16x8 MCUs), or "444" (full-resolution chroma;
    # 8x8 MCUs).
    subsampling: Literal["420", "422", "444"] = "420"
    restart_interval_mcu_rows: int = 0
    dtype: str = "float32"  # DCT compute dtype on device ("float32"/"float64")
    # Entropy-stage engine: "pallas" = VMEM LUT-attach + hierarchical pack
    # kernels (kernels/), "xla" = pure-XLA ops (ops/), "auto" = pallas on
    # TPU, xla elsewhere.  Output bytes are engine-independent.
    engine: Literal["auto", "xla", "pallas"] = "auto"
    # Debug sanitizer (SURVEY §5): run a checkify pass over the numeric
    # pipeline before encoding — quantizer >= 1 (no divide hazards),
    # finite DCT outputs, coefficients within the [-2048, 2047] clip that
    # the entropy coder's bit_class assumes.  Costs one extra device pass;
    # off in production.
    debug_checks: bool = False

    def __post_init__(self):
        if self.quality is not None and not (1 <= self.quality <= 100):
            raise ValueError(f"quality must be in [1, 100], got {self.quality}")
        # restart intervals are supported in both layouts: interleaved
        # counts 16px MCU rows; 3scan counts 8px block rows per component
        # (each scan gets its own DRI, since per-component block counts
        # differ — T.81 allows DRI changes between scans)
        if self.scan_layout not in ("3scan", "interleaved"):
            raise ValueError(f"unknown scan_layout {self.scan_layout!r}")
        if self.huffman not in ("dynamic", "fixed", "dynamic-sampled"):
            raise ValueError(f"unknown huffman mode {self.huffman!r}")
        if self.subsampling not in ("420", "422", "444"):
            raise ValueError(f"unknown subsampling {self.subsampling!r}")
        if self.dtype not in ("float32", "float64"):
            raise ValueError(f"unknown dtype {self.dtype!r}")
        if self.engine not in ("auto", "xla", "pallas"):
            raise ValueError(f"unknown engine {self.engine!r}")
