"""Image resize/pad utility (reference U5, ``utils/editimage.c``).

Crops or white-pads (0xFF, ``utils/editimage.c:165-183``) an RGB image to
target dimensions — the tool the reference uses to make fixtures whose
dims are multiples of 16 (the encoder's window constraint,
``utils/original.c:327-331``).
"""
from __future__ import annotations

import numpy as np

PAD_VALUE = 0xFF


def resize_pad(image: np.ndarray, width: int, height: int) -> np.ndarray:
    """Crop and/or pad ``image`` to exactly [height, width, 3].

    Content is anchored at the top-left, padding is white — matching
    ``createImmage`` (``utils/editimage.c:154-186``).
    """
    image = np.asarray(image)
    h, w = image.shape[:2]
    out = np.full((height, width, 3), PAD_VALUE, dtype=np.uint8)
    ch, cw = min(h, height), min(w, width)
    out[:ch, :cw] = image[:ch, :cw]
    return out


def pad_to_multiple(image: np.ndarray, multiple: int = 16) -> np.ndarray:
    """Pad up to the next multiple of ``multiple`` in both dims."""
    h, w = image.shape[:2]
    return resize_pad(image,
                      -(-w // multiple) * multiple,
                      -(-h // multiple) * multiple)
