"""merlot_reserve_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of rowanz/merlot_reserve.

MERLOT Reserve learns joint representations of vision + language + sound from
videos: each 5-second segment carries one frame, a 3-subsegment log-mel
spectrogram, and ASR text. Pretraining optimizes three contrastive heads over
masked text/audio spans; downstream use is zero-shot mask-infilling or light
finetuning (VCR, TVQA).

This package is a ground-up TPU-first redesign (not a port):
  * one jit/pjit world over an explicit ``jax.sharding.Mesh`` (no pmap),
  * Pallas flash attention with packed block-diagonal segment masking,
  * on-device signal DSP (STFT -> mel -> log) replacing host librosa,
  * the full pretraining example assembly as one device program
    (data/device_builder.py) — host workers only decode bytes,
  * sharding-spec'd ZeRO optimizer states instead of hand-rolled
    device_put_sharded,
  * flax-msgpack checkpoint compatibility with gs://merlotreserve/ckpts/*.

Reference behavior is documented throughout with ``/root/reference`` file:line
citations so parity can be audited.
"""

__version__ = "0.1.0"

from merlot_reserve_tpu.config import MerlotConfig, load_config  # noqa: F401
from merlot_reserve_tpu.tokenizer import (  # noqa: F401
    AUDIOSPAN,
    END,
    LTOVPOOL,
    MASK,
    MASKAUDIO,
    PADDING,
    RESETCTX,
    START,
    get_tokenizer,
)
