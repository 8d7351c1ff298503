"""Spectrogram JPEG quantization for dataset creation.

Matches /root/reference/data/video_utils.py:250-293: log-mel values are
scaled by magic_number = 255 / max(percentile99, 1), clipped to uint8, stored
as a grayscale JPEG ([num_mels, T] layout); the loader divides by
magic_number to dequantize.
"""

from __future__ import annotations

import io
from typing import Tuple

import numpy as np


def quantize_spectrogram(log_mel: np.ndarray, quality: int = 90) -> Tuple[bytes, float]:
    """[num_mels, T] log-mel -> (jpeg bytes, magic_number)."""
    from PIL import Image

    perc99 = max(np.percentile(log_mel, 99), 1.0)
    magic_number = 255.0 / perc99
    compressed = np.minimum(log_mel * magic_number, 255.0).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(compressed, mode="L").save(buf, format="JPEG", quality=quality)
    return buf.getvalue(), float(magic_number)


def dequantize_spectrogram(jpeg: bytes, magic_number: float) -> np.ndarray:
    from PIL import Image

    arr = np.asarray(Image.open(io.BytesIO(jpeg)).convert("L"), dtype=np.float32)
    return arr / magic_number
