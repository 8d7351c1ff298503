"""Multimodal rotary position embeddings.

MERLOT Reserve encodes position as up to four normalized coordinate axes —
(h, w, segment_idx/16, token_idx/1024) — expanded into sinusoids that rotate
the first ``rotary_hsize`` dims of each attention head's query/key.  Behavior
matches /root/reference/mreserve/modeling.py:21-144, including the rotation
sign quirk ([-x0, x1] instead of the standard [-x1, x0], modeling.py:138-140)
that the public checkpoints were trained with.  The quirk is a flag so new
from-scratch models can use the standard rotation.

Everything here is shape-static, trace-friendly, and cheap relative to the
attention matmuls it feeds; XLA fuses the sin/cos/elementwise chain into the
QK projection epilogue, so no Pallas kernel is warranted for these.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np


def get_rotary_coordinates(seq_len: int, dtype=jnp.float32, center_origin: bool = True):
    """1-D rotary coordinates of length ``seq_len``.

    center_origin=True  -> [-L//2 .. -1, 1 .. L-L//2]   (skips 0)
    center_origin=False -> [1 .. L]

    cf. modeling.py:21-35.
    """
    if center_origin:
        neg_half = seq_len // 2
        neg = jnp.arange(neg_half, dtype=dtype) - float(neg_half)
        pos = 1.0 + jnp.arange(seq_len - neg_half, dtype=dtype)
        return jnp.concatenate([neg, pos], 0)
    return 1.0 + jnp.arange(seq_len, dtype=dtype)


def get_rotary_coordinates_2d(h: int, w: int, dtype=jnp.float32):
    """[h*w, 2] centered coordinates scaled as if cropped from a square box
    (cf. modeling.py:38-50)."""
    base_scale = 1.0 / (max(h, w) + 1.0)
    h_coords = base_scale * get_rotary_coordinates(h, dtype=dtype, center_origin=True)
    w_coords = base_scale * get_rotary_coordinates(w, dtype=dtype, center_origin=True)
    grid = jnp.stack(jnp.meshgrid(h_coords, w_coords, indexing="ij"), -1)
    return grid.reshape(h * w, 2)


def multimodal_rotary_coords(
    h=None,
    w=None,
    segment_idx=None,
    token_idx=None,
    dtype=jnp.float32,
    max_segment: float = 16.0,
    max_token: float = 1024.0,
):
    """Stack the four coordinate axes into [B, L, 4], zero-filling absent ones
    and normalizing segment/token indices (cf. modeling.py:53-78).  The
    normalization is what lets resolution/length adapt without new params."""
    provided = [x for x in (h, w, segment_idx, token_idx) if x is not None]
    if not provided:
        raise ValueError("provide at least one coordinate tensor")
    shape = provided[0].shape
    assert all(x.shape == shape for x in provided)

    zeros = jnp.zeros(shape, dtype=dtype)
    h_vec = zeros if h is None else h.astype(dtype)
    w_vec = zeros if w is None else w.astype(dtype)
    s_vec = zeros if segment_idx is None else segment_idx.astype(dtype) / max_segment
    t_vec = zeros if token_idx is None else token_idx.astype(dtype) / max_token
    return jnp.stack([h_vec, w_vec, s_vec, t_vec], -1)


def construct_rotary_sinusoids(coords, rotary_hsize: int = 32, max_freq: float = 10.0, dtype=None):
    """Expand coordinates into rotation sinusoids.

    :param coords: [*batch, L, num_dims] in roughly [-1, 1]
    :return: [*batch, 2 (cos, sin), L, rotary_hsize]; the last dim repeats each
             frequency twice so it lines up with the (even, odd) rotation pairs.

    Frequencies are log-spaced over [1, max_freq/2] octaves (modeling.py:81-113).
    """
    *batch_dims, seq_len, num_dims = coords.shape
    assert rotary_hsize % (num_dims * 2) == 0
    dim_expansion = rotary_hsize // (num_dims * 2)
    assert dim_expansion > 0

    freqs = jnp.logspace(
        0.0,
        math.log2(max_freq / 2.0),
        dim_expansion,
        base=2,
        dtype=coords.dtype if dtype is None else dtype,
    )
    freqs = freqs.reshape((1,) * (len(batch_dims) + 2) + (dim_expansion,))

    radians = coords[..., None] * freqs * np.pi
    radians = radians.reshape(*batch_dims, seq_len, num_dims * dim_expansion)
    # Stack order is [cos, sin] (modeling.py:104-106); note apply_rotary below
    # indexes slot 0 as the *sin* multiplier — that asymmetry is part of the
    # reference contract.
    sinusoids = jnp.stack([jnp.cos(radians), jnp.sin(radians)], -3)
    return jnp.repeat(sinusoids, 2, axis=-1)


def apply_rotary(query_key, sinusoids, sign_quirk: bool = True):
    """Rotate the first ``rotary_hsize`` dims of q/k by the sinusoids.

    :param query_key: [*batch, L, heads, size_per_head]
    :param sinusoids: [*sin_batch, 2, L, rotary_hsize]
    :param sign_quirk: reproduce the reference's [-x0, x1] pairing
                       (modeling.py:138-140). The public checkpoints require
                       True; standard RoPE is [-x1, x0] (False).

    NOTE (reference contract, modeling.py:133-134): slot 0 of the sinusoids
    (built as cos) is used as the `sin` factor and slot 1 as `cos`. Combined
    with the pairing quirk this is what the checkpoints were trained with, so
    both are reproduced exactly when sign_quirk=True.
    """
    *sin_batch, _two, _L, rotary_hsize = sinusoids.shape
    *batch_dims, _L2, _heads, size_per_head = query_key.shape
    assert rotary_hsize <= size_per_head

    sinusoids = sinusoids.reshape((1,) * (len(batch_dims) - len(sin_batch)) + sinusoids.shape)
    sin = sinusoids[..., 0, :, None, :]
    cos = sinusoids[..., 1, :, None, :]

    qk_rope = query_key[..., :rotary_hsize]
    if sign_quirk:
        rotated = jnp.stack([-qk_rope[..., ::2], qk_rope[..., 1::2]], -1).reshape(qk_rope.shape)
    else:
        rotated = jnp.stack([-qk_rope[..., 1::2], qk_rope[..., ::2]], -1).reshape(qk_rope.shape)

    qk_rope = qk_rope * cos + rotated * sin
    return jnp.concatenate([qk_rope, query_key[..., rotary_hsize:]], -1)
