"""Mixed-resolution batch encoding via shape buckets (SURVEY §8.2 phase 4).

XLA programs are shape-specialized, so a mixed-resolution stream is
grouped by geometry: one cached ``FastBatchEncoder`` per (height, width)
bucket, each batch encoded in one fused device step.  Images whose dims
are not multiples of 16 must be padded first (``io.editimage``), exactly
as the reference requires of its inputs (``utils/original.c:327-331``).
"""
from __future__ import annotations

import numpy as np

from ..core.types import EncodeConfig
from .fast import FastBatchEncoder


class BucketedEncoder:
    """Encode lists of same-or-mixed-resolution images efficiently."""

    def __init__(self, config: EncodeConfig | None = None,
                 segs_per_image: int | None = None,
                 interpret: bool = False):
        self.config = config or EncodeConfig(scan_layout="interleaved",
                                             huffman="fixed")
        self.segs_per_image = segs_per_image
        self.interpret = interpret
        self._encoders: dict[tuple[int, int], FastBatchEncoder] = {}

    def _encoder(self, h: int, w: int) -> FastBatchEncoder:
        from .fast import SAMPLING_GEOMETRY
        key = (h, w)
        if key not in self._encoders:
            segs = self.segs_per_image
            if segs is None:
                # derive from the config's requested restart structure
                my = h // SAMPLING_GEOMETRY[self.config.subsampling][1]
                rows = self.config.restart_interval_mcu_rows or my
                segs = my // rows if my % rows == 0 else 1
            while (h // 16) % segs:
                segs -= 1
            self._encoders[key] = FastBatchEncoder(
                h, w, config=self.config, segs_per_image=segs,
                interpret=self.interpret)
        return self._encoders[key]

    def encode(self, images: list[np.ndarray]) -> list[bytes]:
        """Encode a mixed-geometry list; output order matches input."""
        from .fast import SAMPLING_GEOMETRY
        mcu_w, mcu_h, _ = SAMPLING_GEOMETRY[self.config.subsampling]
        buckets: dict[tuple[int, int], list[int]] = {}
        for i, img in enumerate(images):
            h, w = img.shape[:2]
            if h % mcu_h or w % mcu_w:
                raise ValueError(
                    f"image {i} is {w}x{h}; pad with io.editimage first, "
                    "or use encode_any")
            buckets.setdefault((h, w), []).append(i)

        out: list[bytes | None] = [None] * len(images)
        for (h, w), idxs in buckets.items():
            enc = self._encoder(h, w)
            batch = np.stack([np.asarray(images[i]) for i in idxs])
            for i, data in zip(idxs, enc.encode_batch(batch)):
                out[i] = data
        return out  # type: ignore[return-value]

    def encode_any(self, images: list[np.ndarray]) -> list[bytes]:
        """Ragged batch: arbitrary dims, automatic padding + bucketing.

        Images are edge-replicated up to the MCU grid and each SOF
        declares the true size (decoders crop, T.81 A.2.1); images
        sharing an MCU grid share one compiled encoder.  Padding CANNOT
        go beyond the minimal MCU grid: T.81 A.2 derives the coded MCU
        count from the SOF dims, so a coarser bucket grid would desync
        every standard decoder.  Output order matches input.
        """
        from ..bitstream import jfif
        from .fast import SAMPLING_GEOMETRY
        mcu_w, mcu_h, _ = SAMPLING_GEOMETRY[self.config.subsampling]
        padded = []
        dims = []
        for img in images:
            img = np.asarray(img)
            h, w = img.shape[:2]
            if h == 0 or w == 0:
                raise ValueError("image has zero pixels")
            ph, pw = -(-h // mcu_h) * mcu_h, -(-w // mcu_w) * mcu_w
            dims.append((h, w, ph, pw))
            if (ph, pw) != (h, w):
                img = np.pad(img, ((0, ph - h), (0, pw - w), (0, 0)),
                             mode="edge")
            padded.append(img)
        out = self.encode(padded)
        return [jfif.patch_sof_dims(data, w, h) if (ph, pw) != (h, w)
                else data
                for data, (h, w, ph, pw) in zip(out, dims)]
