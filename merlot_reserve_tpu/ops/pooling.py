"""Scatter-pooling and normalization helpers for the contrastive heads."""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax


def one_hot_pool(do_pool, idx, v, num_segments: int, real_bsize: Optional[int] = None) -> Dict:
    """Sum-pool rows of ``v`` into ``num_segments`` slots keyed by ``idx``,
    only where ``do_pool`` — used to collect hidden states at MASK/MASKAUDIO/
    LTOVPOOL positions (cf. /root/reference/mreserve/modeling.py:541-567).

    :param do_pool: [B, L] bool
    :param idx: [B, L] int in [0, num_segments)
    :param v: [B, L, H]
    :param real_bsize: if given, first reshape (B, L) -> (real_bsize, B*L/real_bsize)
                       so slots pool across the stream's sub-batches.
    :return: {'x': [B', num_segments, H], 'idx_oh': [B', L', num_segments]}

    The one-hot einsum maps straight onto the MXU; a gather/scatter would not.
    """
    B, L, H = v.shape
    assert do_pool.shape == (B, L)
    assert idx.shape == (B, L)

    if real_bsize is not None:
        l2 = (L * B) // real_bsize
        do_pool = do_pool.reshape(real_bsize, l2)
        idx = idx.reshape(real_bsize, l2)
        v = v.reshape(real_bsize, l2, H)

    pointer = lax.select(do_pool, idx, jnp.full(idx.shape, -1))
    pointer_oh = jax.nn.one_hot(pointer, num_classes=num_segments, dtype=v.dtype)
    pooled = jnp.einsum("bls,blh->bsh", pointer_oh, v)
    return {"x": pooled, "idx_oh": pointer_oh}


def unit_normalize(x):
    """L2-normalize the last dim in f32 (+1e-5 under the sqrt), cast back
    (cf. modeling.py:570-578). f32 accumulation matters in bf16 towers."""
    x_f32 = x.astype(jnp.float32)
    x_norm = x_f32 / jnp.sqrt(jnp.square(x_f32).sum(-1, keepdims=True) + 1e-5)
    return x_norm.astype(x.dtype)
