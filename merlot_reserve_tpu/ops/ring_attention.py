"""Ring attention: sequence-parallel exact attention over a mesh axis.

The reference handles long video context structurally (pooling, segment
groups, packing — SURVEY.md §5 "masked sequence packing, not sequence
parallelism") and caps the joint sequence at 1024. This module removes that
cap: shard the sequence over a mesh axis ('sp'), keep Q local, and rotate
K/V (+ their position labels) around the ring with ``lax.ppermute`` while
merging partial attention with the online-softmax recurrence — exact
attention over the full sequence with O(L/n) memory per device and
communication overlapped across ring steps by XLA.

Masking uses the same per-position (is_valid, segment_ids) labels as
ops/attention.py, so packed-video block-diagonal structure works unchanged
under sequence parallelism.

Usage (inside shard_map over a Mesh with an 'sp' axis):
    out_local = ring_attention(q_loc, k_loc, v_loc, valid_loc, seg_loc,
                               axis_name='sp')
or at the array level via ``sequence_parallel_attention`` which wraps the
shard_map plumbing.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_NEG_INF = -1e10


def _partial_attention(q, k_blk, v_blk, q_valid, q_seg, k_valid, k_seg, scale):
    """One block's contribution: masked scores + un-normalized softmax stats.

    :return: (numerator [Bq, H, D-acc], row max m [B, H, Lq], row sum l)
    """
    s = jnp.einsum("blhd,bmhd->bhlm", (q * scale).astype(jnp.float32),
                   k_blk.astype(jnp.float32))
    mask = (q_valid[:, None, :, None] > 0) & (k_valid[:, None, None, :] > 0) & \
        (q_seg[:, None, :, None] == k_seg[:, None, None, :])
    s = jnp.where(mask, s, _NEG_INF)
    m = jnp.max(s, axis=-1)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    acc = jnp.einsum("bhlm,bmhd->bhld", p, v_blk.astype(jnp.float32))
    return acc, m, l


def ring_attention(q, k, v, is_valid, segment_ids, axis_name: str = "sp"):
    """Exact attention with sequence shards rotating K/V around ``axis_name``.

    All arguments are LOCAL shards (call under shard_map):
      q, k, v: [B, L_local, H, D]; is_valid/segment_ids: [B, L_local]
    :return: [B, L_local, H, D] in q.dtype
    """
    n = lax.psum(1, axis_name)
    my_idx = lax.axis_index(axis_name)
    B, Lq, H, D = q.shape
    scale = float(1.0 / np.sqrt(D))

    q_valid = is_valid.astype(jnp.int32)
    q_seg = segment_ids.astype(jnp.int32)

    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, _):
        k_cur, v_cur, kv_valid, kv_seg, acc, m_run, l_run = carry
        acc_b, m_b, l_b = _partial_attention(
            q, k_cur, v_cur, q_valid, q_seg, kv_valid, kv_seg, scale)

        m_new = jnp.maximum(m_run, m_b)
        c_run = jnp.exp(m_run - m_new)
        c_b = jnp.exp(m_b - m_new)
        acc = acc * c_run[..., None] + acc_b * c_b[..., None]
        l_run = l_run * c_run + l_b * c_b

        k_nxt = lax.ppermute(k_cur, axis_name, perm)
        v_nxt = lax.ppermute(v_cur, axis_name, perm)
        valid_nxt = lax.ppermute(kv_valid, axis_name, perm)
        seg_nxt = lax.ppermute(kv_seg, axis_name, perm)
        return (k_nxt, v_nxt, valid_nxt, seg_nxt, acc, m_new, l_run), None

    acc0 = jnp.zeros((B, H, Lq, D), jnp.float32)
    m0 = jnp.full((B, H, Lq), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, H, Lq), jnp.float32)
    # under shard_map's varying-axis typing, the running stats must be marked
    # as varying over the ring axis to match the loop outputs
    if hasattr(lax, "pvary"):
        acc0, m0, l0 = (lax.pvary(x, axis_name) for x in (acc0, m0, l0))
    carry0 = (k, v, q_valid, q_seg, acc0, m0, l0)
    (_, _, _, _, acc, _m, l), _ = lax.scan(step, carry0, None, length=n)

    l_safe = jnp.where(l == 0.0, 1.0, l)
    out = (acc / l_safe[..., None]).transpose(0, 2, 1, 3)
    return out.astype(q.dtype)


def sequence_parallel_attention(mesh, q, k, v, is_valid=None, segment_ids=None,
                                axis_name: str = "sp"):
    """Array-level wrapper: shards the sequence dim of global [B, L, H, D]
    inputs over ``axis_name`` and runs ring_attention under shard_map."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    B, L, H, D = q.shape
    n = mesh.shape[axis_name]
    assert L % n == 0, f"L={L} not divisible by {axis_name}={n}"
    if is_valid is None:
        is_valid = jnp.ones((B, L), jnp.int32)
    if segment_ids is None:
        segment_ids = jnp.zeros((B, L), jnp.int32)

    qkv_spec = P(None, axis_name, None, None)
    lbl_spec = P(None, axis_name)

    fn = shard_map(
        functools.partial(ring_attention, axis_name=axis_name),
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, lbl_spec, lbl_spec),
        out_specs=qkv_spec,
    )
    return fn(q, k, v, is_valid.astype(jnp.int32), segment_ids.astype(jnp.int32))
