"""Compute-path primitives: rotary position machinery, attention (Pallas flash
kernel + XLA fallback), on-device audio DSP (STFT->mel->log), image
patchify/resize kernels, ring attention (ops.ring_attention), and the
fixed-shape device masking engine (ops.masking_device)."""

# NOTE: the generic entry point lives at ops.attention.attention — exporting
# the function here would shadow the submodule of the same name.
from merlot_reserve_tpu.ops.attention import (  # noqa: F401
    flash_attention,
    make_attention_bias,
    xla_attention,
)
from merlot_reserve_tpu.ops.audio import (  # noqa: F401
    make_spectrogram,
    mel_filterbank,
    mel_power_spectrogram,
)
from merlot_reserve_tpu.ops.pooling import one_hot_pool, unit_normalize  # noqa: F401
from merlot_reserve_tpu.ops.rotary import (  # noqa: F401
    apply_rotary,
    construct_rotary_sinusoids,
    get_rotary_coordinates,
    get_rotary_coordinates_2d,
    multimodal_rotary_coords,
)
from merlot_reserve_tpu.ops.vision import (  # noqa: F401
    preprocess_image_to_patches,
    resize_and_pad,
    space_to_depth,
)
