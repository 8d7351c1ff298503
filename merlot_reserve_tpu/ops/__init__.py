"""Compute-path primitives: rotary position machinery, attention (Pallas flash
kernel + XLA fallback), on-device audio DSP (STFT->mel->log), and image
patchify/resize kernels."""

from merlot_reserve_tpu.ops.rotary import (  # noqa: F401
    apply_rotary,
    construct_rotary_sinusoids,
    get_rotary_coordinates,
    get_rotary_coordinates_2d,
    multimodal_rotary_coords,
)
from merlot_reserve_tpu.ops.pooling import one_hot_pool, unit_normalize  # noqa: F401
