"""Device mesh construction.

The reference's only compute parallelism is pmap data-parallel over all pod
cores with per-host input sharding (/root/reference/pretrain/train.py:106-107,
pretrain/dataloader.py:920-930). Here the equivalent is an explicit
``jax.sharding.Mesh`` with named axes:

  * ``dp`` — data parallel; batches shard over it, gradients psum over it,
    contrastive negatives all-gather over it (all on ICI).
  * ``tp`` — tensor parallel for the big joint transformer (weights shard
    over it); size 1 reproduces the reference's pure-DP world.

Multi-host: ``jax.distributed.initialize`` + the same global mesh; pjit
handles cross-host addressability. Tests use a CPU mesh via
``XLA_FLAGS=--xla_force_host_platform_device_count=N``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: int = -1, tp: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    """Build a (dp, tp) mesh. dp=-1 means all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp == -1:
        assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != device count ({n})"
    dev_array = np.asarray(devices).reshape(dp, tp)
    return Mesh(dev_array, axis_names=("dp", "tp"))
