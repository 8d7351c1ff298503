"""Attention for TPU: Pallas flash kernel + XLA fallback.

The reference materializes O(L^2) attention probabilities through
``nn.attention.dot_product_attention_weights`` and builds dense [B, L, L]
additive masks (/root/reference/mreserve/modeling.py:188-202,343-356,743-756).
Every mask it ever builds, though, factors through *per-position labels*:

    mask(i, j) = valid(i) & valid(j) & (segment_id(i) == segment_id(j))

— validity from padding, and segment ids from ``video_src_idx`` packing. So
the TPU-native design passes those two [B, L] vectors instead of an [B, L, L]
tensor: the flash kernel rebuilds the predicate on the fly per tile (zero HBM
traffic for masks), and the XLA path broadcasts it into a bias only as a
fallback.

``attention(...)`` is the single entry point; ``impl`` picks:
  * 'flash': Pallas fused softmax(QK^T)V, fwd + bwd: 4D (b, h, q-blk, k-blk)
    grids so Pallas double-buffers the streamed blocks; online-softmax /
    gradient state carried in VMEM scratch; no L^2 tensor in HBM either
    direction. Beats XLA's dense attention 1.7-3.4x at L >= 4096.
  * 'xla':   jnp.einsum attention (wins at the reference's short lengths).
  * 'auto':  flash on TPU when seq_len >= _FLASH_MIN_LEN, else xla.
  * 'ring':  sequence-parallel ring attention over the active mesh's sp
    axis (ops/ring_attention.py) — 'ring' / 'ring:lax' and 'ring:flash'
    (both differentiable; flash = Pallas kernels per hop, fwd and bwd),
    'ring:rdma' (single in-kernel RDMA ring, fwd-only),
    optionally 'ring:IMPL:AXIS' to ring over a different mesh axis. Needs
    an active mesh (parallel.mesh.activate_mesh); degenerates to the dense
    path when the axis is absent or size 1, so a config with
    joint_attention_impl='ring' still runs single-chip.
  * 'ulysses': sequence parallelism by all_to_all head sharding
    (ops/ring_attention.py::ulysses_attention) — 'ulysses' / 'ulysses:xla'
    (dense inner) or 'ulysses:flash' (Pallas inner), optionally
    'ulysses:INNER:AXIS'. O(1) collectives per call vs the ring's O(n)
    hops; needs num_heads % axis_size == 0; differentiable with BOTH
    inners (all_to_all transposes to all_to_all; the flash kernel has a
    custom_vjp). Same no-mesh dense fallback as 'ring'.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# Measured on v5e: XLA's fused dense attention wins at the reference's
# sequence lengths (<=640 joint), the tuned flash kernel wins at long
# context (8.9ms vs 16.0ms at L=8192, H12 D64). The auto policy switches at
# _FLASH_MIN_LEN; block sizes below are the measured sweet spot.
_FLASH_MIN_LEN = 2048
_FLASH_BLOCK_Q = 512
_FLASH_BLOCK_K = 1024
_NEG_INF = -1e10

# test hook: force Pallas interpret mode for every attention() call so CPU
# suites can exercise forced-flash model configs (joint_attention_impl)
# end to end without mosaic
_FORCE_INTERPRET = False


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def make_attention_bias(is_valid=None, segment_ids=None, attention_mask=None, dtype=jnp.float32):
    """Build the additive [B, 1, L, L] bias from per-position labels (or pass
    through a dense boolean mask). Matches the reference's -1e10 convention
    (modeling.py:350-356)."""
    if attention_mask is None:
        assert is_valid is not None or segment_ids is not None
        if is_valid is not None:
            attention_mask = is_valid[..., None, :] & is_valid[..., :, None]
        if segment_ids is not None:
            seg_eq = segment_ids[..., None, :] == segment_ids[..., :, None]
            attention_mask = seg_eq if attention_mask is None else (attention_mask & seg_eq)
    bias = jnp.where(attention_mask[..., None, :, :], 0.0, _NEG_INF).astype(dtype)
    return bias


def xla_attention(q, k, v, bias=None, softmax_dtype=None):
    """Dense attention.

    :param q, k, v: [B, L, heads, size_per_head]
    :param bias: [B, 1, Lq, Lk] additive, or None
    :param softmax_dtype: dtype for the softmax; None keeps q.dtype (the
        reference's dot_product_attention_weights numerics, modeling.py:197-199)
    :return: [B, L, heads, size_per_head] in q.dtype
    """
    depth = q.shape[-1]
    # python float (weak-typed) — a numpy scalar here silently promotes the
    # whole attention chain bf16 -> f32 (1.5x HBM traffic; found via profile)
    scale = float(1.0 / np.sqrt(depth))
    logits = jnp.einsum("...qhd,...khd->...hqk", q * scale, k)
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    if softmax_dtype is not None and logits.dtype != softmax_dtype:
        probs = jax.nn.softmax(logits.astype(softmax_dtype), axis=-1).astype(q.dtype)
    else:
        probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("...hqk,...khd->...qhd", probs, v)


# ---------------------------------------------------------------------------
# Pallas flash attention
# ---------------------------------------------------------------------------


def _flash_kernel(qlab_ref, klab_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                  acc_ref, m_ref, l_ref, *, scale: float):
    """Canonical pipelined flash forward: grid (b, h, q_block, k_block) with
    k innermost, so Pallas double-buffers the K/V block stream while the MXU
    works. Softmax running state lives in VMEM scratch, carried across the k
    dimension of the grid; the output block is written on the last k step.

    qlab/klab: [1, 2, block] int32 position labels (row 0 validity, row 1
    segment id) for the current q/k block.
    """
    from jax.experimental import pallas as pl  # deferred: CPU tests may lack mosaic

    k_idx = pl.program_id(3)
    num_k = pl.num_programs(3)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0, 0].astype(jnp.float32) * scale        # [bq, d]
    k_blk = k_ref[0, 0].astype(jnp.float32)            # [bk, d]
    v_blk = v_ref[0, 0].astype(jnp.float32)

    s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)  # [bq, bk]
    q_valid, q_seg = qlab_ref[0, 0], qlab_ref[0, 1]
    k_valid, k_seg = klab_ref[0, 0], klab_ref[0, 1]
    mask = (q_valid[:, None] > 0) & (k_valid[None, :] > 0) & \
        (q_seg[:, None] == k_seg[None, :])
    s = jnp.where(mask, s, _NEG_INF)

    m_prev = m_ref[0]
    l_prev = l_ref[0]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1))
    correction = jnp.exp(m_prev - m_cur)
    p = jnp.exp(s - m_cur[:, None])
    l_cur = l_prev * correction + jnp.sum(p, axis=-1)
    acc_ref[...] = acc_ref[...] * correction[:, None] + \
        jnp.dot(p, v_blk, preferred_element_type=jnp.float32)
    m_ref[0] = m_cur
    l_ref[0] = l_cur

    @pl.when(k_idx == num_k - 1)
    def _finalize():
        l_fin = l_ref[0]
        l_safe = jnp.where(l_fin == 0.0, 1.0, l_fin)
        o_ref[0, 0] = (acc_ref[...] / l_safe[:, None]).astype(o_ref.dtype)
        lse_ref[0, 0, 0] = m_ref[0] + jnp.log(l_safe)


def _pad_for_blocks(q, k, v, is_valid, segment_ids, block: int):
    """Pad L to a block multiple; padded positions marked invalid.

    ``block`` must be the LCM of the q/k block sizes — padding to
    max(block_q, block_k) silently leaves trailing rows unprocessed whenever
    the larger block doesn't contain a whole number of the smaller
    (e.g. bq=512, bk=640: Lp=640 but the q grid covers only 512 rows)."""
    B, L, H, D = q.shape
    Lp = int(np.ceil(L / block) * block)
    pad = Lp - L
    is_valid = is_valid.astype(jnp.int32)
    segment_ids = segment_ids.astype(jnp.int32)
    if pad:
        qkv_pad = [(0, 0), (0, pad), (0, 0), (0, 0)]
        q = jnp.pad(q, qkv_pad)
        k = jnp.pad(k, qkv_pad)
        v = jnp.pad(v, qkv_pad)
        is_valid = jnp.pad(is_valid, [(0, 0), (0, pad)])
        segment_ids = jnp.pad(segment_ids, [(0, 0), (0, pad)], constant_values=-1)
    return q, k, v, is_valid, segment_ids, Lp, pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def flash_attention(q, k, v, is_valid, segment_ids, block_q: int = _FLASH_BLOCK_Q,
                    block_k: int = _FLASH_BLOCK_K, interpret: bool = False):
    """Fused attention with per-position label masking.

    :param q, k, v: [B, L, heads, d]
    :param is_valid: [B, L] bool/int — padding mask
    :param segment_ids: [B, L] int — positions attend only within equal ids
    :return: [B, L, heads, d]

    L is padded internally to a multiple of the block size; padded positions
    are marked invalid so they contribute nothing.

    Fully differentiable: backward is two Pallas kernels (dq; dk+dv) that
    recompute probabilities per tile from the saved log-sum-exp — no O(L^2)
    tensor in HBM in either direction.
    """
    out, _lse = _flash_forward(q, k, v, is_valid, segment_ids, block_q, block_k,
                               interpret)
    return out


def _flash_forward(q, k, v, is_valid, segment_ids, block_q=128, block_k=128,
                   interpret=False, k_is_valid=None, k_segment_ids=None):
    """When k_is_valid/k_segment_ids are given, the K/V side carries its own
    labels (ring attention rotates K/V shards past fixed local queries);
    otherwise labels are shared, the self-attention case."""
    from jax.experimental import pallas as pl

    B, L, H, D = q.shape
    scale = float(1.0 / np.sqrt(D))
    cross = k_is_valid is not None
    block_lcm = int(np.lcm(block_q, block_k))
    if cross:
        q, _, _, is_valid, segment_ids, Lp, pad = _pad_for_blocks(
            q, q, q, is_valid, segment_ids, block_lcm)
        k, v, _, k_is_valid, k_segment_ids, _, _ = _pad_for_blocks(
            k, v, v, k_is_valid, k_segment_ids, block_lcm)
    else:
        q, k, v, is_valid, segment_ids, Lp, pad = _pad_for_blocks(
            q, k, v, is_valid, segment_ids, block_lcm)
        k_is_valid, k_segment_ids = is_valid, segment_ids

    from jax.experimental.pallas import tpu as pltpu

    # [B, L, H, D] -> [B, H, L, D] so each program reads a contiguous row
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    # labels carried as [B, 2, L] (row 0 validity, row 1 segment id) so a
    # (1, 2, block) tile is (sublane, lane)-aligned
    labels = jnp.stack([is_valid, segment_ids], axis=1)
    k_labels = (jnp.stack([k_is_valid, k_segment_ids], axis=1) if cross
                else labels)

    Lkp = kt.shape[2]
    grid = (B, H, Lp // block_q, Lkp // block_k)
    kernel = functools.partial(_flash_kernel, scale=scale)

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2, block_q), lambda b, h, i, j: (b, 0, i)),  # q labels
            pl.BlockSpec((1, 2, block_k), lambda b, h, i, j: (b, 0, j)),  # k labels
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, j, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0)),
            # row stats live as [B, H, 1, Lp] so the (sublane, lane) tile is
            # (1, block_q) — lane-aligned on TPU
            pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j: (b, h, 0, i)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Lp, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, 1, Lp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, D), jnp.float32),   # acc
            pltpu.VMEM((1, block_q), jnp.float32),   # m
            pltpu.VMEM((1, block_q), jnp.float32),   # l
        ],
        interpret=interpret,
    )(labels, k_labels, qt, kt, vt)

    out = out.transpose(0, 2, 1, 3)
    if pad:
        out = out[:, :L]
    return out, lse  # lse stays padded [B, H, 1, Lp] for the bwd kernels


def _flash_bwd_dq_kernel(qlab_ref, klab_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                         delta_ref, dq_ref, dq_acc, *, scale: float):
    """Pipelined dq: grid (b, h, q_block, k_block), k innermost — Pallas
    streams K/V blocks while dq accumulates in VMEM scratch. p is recomputed
    from the saved log-sum-exp; delta_i = rowsum(dO * O) is precomputed.
    ds = p * (dp - delta); dq = scale * sum_k ds @ K."""
    from jax.experimental import pallas as pl

    k_idx = pl.program_id(3)
    num_k = pl.num_programs(3)

    @pl.when(k_idx == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q = q_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0, 0]      # [block_q]
    delta = delta_ref[0, 0, 0]  # [block_q]
    k_blk = k_ref[0, 0].astype(jnp.float32)
    v_blk = v_ref[0, 0].astype(jnp.float32)

    s = jnp.dot(q * scale, k_blk.T, preferred_element_type=jnp.float32)
    q_valid, q_seg = qlab_ref[0, 0], qlab_ref[0, 1]
    k_valid, k_seg = klab_ref[0, 0], klab_ref[0, 1]
    mask = (q_valid[:, None] > 0) & (k_valid[None, :] > 0) & \
        (q_seg[:, None] == k_seg[None, :])
    s = jnp.where(mask, s, _NEG_INF)
    p = jnp.exp(s - lse[:, None])
    dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
    ds = p * (dp - delta[:, None])
    dq_acc[...] = dq_acc[...] + jnp.dot(ds, k_blk,
                                        preferred_element_type=jnp.float32)

    @pl.when(k_idx == num_k - 1)
    def _finalize():
        dq_ref[0, 0] = (dq_acc[...] * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(qlab_ref, klab_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                          delta_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                          scale: float):
    """Pipelined dk/dv: grid (b, h, k_block, q_block), q innermost — Pallas
    streams Q/dO blocks; dk/dv accumulate in VMEM scratch.
    dv = sum_q p^T @ dO; dk = scale * sum_q ds^T @ q."""
    from jax.experimental import pallas as pl

    q_idx = pl.program_id(3)
    num_q = pl.num_programs(3)

    @pl.when(q_idx == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    k_blk = k_ref[0, 0].astype(jnp.float32)
    v_blk = v_ref[0, 0].astype(jnp.float32)
    q = q_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    lse = lse_ref[0, 0, 0]
    delta = delta_ref[0, 0, 0]

    s = jnp.dot(q * scale, k_blk.T, preferred_element_type=jnp.float32)
    q_valid, q_seg = qlab_ref[0, 0], qlab_ref[0, 1]
    k_valid, k_seg = klab_ref[0, 0], klab_ref[0, 1]
    mask = (q_valid[:, None] > 0) & (k_valid[None, :] > 0) & \
        (q_seg[:, None] == k_seg[None, :])
    s = jnp.where(mask, s, _NEG_INF)
    p = jnp.exp(s - lse[:, None])  # [bq, bk]

    dv_acc[...] = dv_acc[...] + jnp.dot(p.T, do,
                                        preferred_element_type=jnp.float32)
    dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
    ds = p * (dp - delta[:, None])
    dk_acc[...] = dk_acc[...] + jnp.dot(ds.T, q,
                                        preferred_element_type=jnp.float32)

    @pl.when(q_idx == num_q - 1)
    def _finalize():
        dk_ref[0, 0] = (dk_acc[...] * scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_fwd_rule(q, k, v, is_valid, segment_ids, block_q, block_k, interpret):
    out, lse = _flash_forward(q, k, v, is_valid, segment_ids, block_q, block_k,
                              interpret)
    return out, (q, k, v, is_valid, segment_ids, out, lse)


def _flash_backward(q, k, v, do, out, lse, is_valid, segment_ids,
                    block_q=128, block_k=128, interpret=False,
                    k_is_valid=None, k_segment_ids=None):
    """Flash backward as two Pallas kernels: returns (dq, dk, dv).

    The q-side residuals ``out``/``lse`` must be the FULL softmax statistics
    for these queries — in the self-attention case that's _flash_forward's
    outputs; in the ring's cross case (k_is_valid/k_segment_ids given, K/V
    being one visiting shard) they are the globally-merged out/lse over all
    shards, which makes per-shard p = exp(s - lse) the true global
    probability and the per-hop dk/dv/dq contributions exactly additive.

    ``lse``: [B, H, 1, *] f32 — padded (as _flash_forward returns) or
    unpadded; re-padded here with zeros (padded q rows carry do == 0, so
    every term they touch vanishes: ds = p * (dp - delta) with dp = do@V^T
    = 0 and delta = rowsum(do*out) = 0).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, H, D = q.shape
    Lk = k.shape[1]
    scale = float(1.0 / np.sqrt(D))
    cross = k_is_valid is not None
    block_lcm = int(np.lcm(block_q, block_k))

    # delta_i = rowsum(dO * O): one fused elementwise reduce, [B, H, 1, L]
    delta = jnp.einsum("blhd,blhd->bhl", do.astype(jnp.float32),
                       out.astype(jnp.float32))[:, :, None, :]

    if cross:
        q, _, _, is_valid, segment_ids, Lp, pad = _pad_for_blocks(
            q, q, q, is_valid, segment_ids, block_lcm)
        k, v, _, k_is_valid, k_segment_ids, Lkp, k_pad = _pad_for_blocks(
            k, v, v, k_is_valid, k_segment_ids, block_lcm)
    else:
        q, k, v, is_valid, segment_ids, Lp, pad = _pad_for_blocks(
            q, k, v, is_valid, segment_ids, block_lcm)
        k_is_valid, k_segment_ids, Lkp, k_pad = is_valid, segment_ids, Lp, pad

    g_p = jnp.pad(do, [(0, 0), (0, pad), (0, 0), (0, 0)]) if pad else do
    delta = jnp.pad(delta, [(0, 0), (0, 0), (0, 0), (0, pad)]) if pad else delta
    lse_pad = Lp - lse.shape[-1]
    if lse_pad > 0:
        lse = jnp.pad(lse, [(0, 0), (0, 0), (0, 0), (0, lse_pad)])
    elif lse_pad < 0:
        lse = lse[..., :Lp]

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    dot = g_p.transpose(0, 2, 1, 3)
    labels = jnp.stack([is_valid, segment_ids], axis=1)
    k_labels = (jnp.stack([k_is_valid, k_segment_ids], axis=1) if cross
                else labels)

    # dq: grid (b, h, q, k) with k innermost — q-indexed refs at i, k at j
    qlab_i = pl.BlockSpec((1, 2, block_q), lambda b, h, i, j: (b, 0, i))
    klab_j = pl.BlockSpec((1, 2, block_k), lambda b, h, i, j: (b, 0, j))
    qblk_i = pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, i, 0))
    kblk_j = pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, j, 0))
    stat_i = pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j: (b, h, 0, i))

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale),
        grid=(B, H, Lp // block_q, Lkp // block_k),
        in_specs=[qlab_i, klab_j, qblk_i, kblk_j, kblk_j, qblk_i, stat_i, stat_i],
        out_specs=qblk_i,
        out_shape=jax.ShapeDtypeStruct((B, H, Lp, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        interpret=interpret,
    )(labels, k_labels, qt, kt, vt, dot, lse, delta)

    # dk/dv: grid (b, h, k, q) with q innermost — k-indexed refs at i, q at j
    qlab_j = pl.BlockSpec((1, 2, block_q), lambda b, h, i, j: (b, 0, j))
    klab_i = pl.BlockSpec((1, 2, block_k), lambda b, h, i, j: (b, 0, i))
    qblk_j = pl.BlockSpec((1, 1, block_q, D), lambda b, h, i, j: (b, h, j, 0))
    kblk_i = pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, j: (b, h, i, 0))
    stat_j = pl.BlockSpec((1, 1, 1, block_q), lambda b, h, i, j: (b, h, 0, j))

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale),
        grid=(B, H, Lkp // block_k, Lp // block_q),
        in_specs=[qlab_j, klab_i, qblk_j, kblk_i, kblk_i, qblk_j, stat_j, stat_j],
        out_specs=(kblk_i, kblk_i),
        out_shape=(jax.ShapeDtypeStruct((B, H, Lkp, D), k.dtype),
                   jax.ShapeDtypeStruct((B, H, Lkp, D), v.dtype)),
        scratch_shapes=[pltpu.VMEM((block_k, D), jnp.float32),
                        pltpu.VMEM((block_k, D), jnp.float32)],
        interpret=interpret,
    )(labels, k_labels, qt, kt, vt, dot, lse, delta)

    def unpack(x, orig_len, padded):
        x = x.transpose(0, 2, 1, 3)
        return x[:, :orig_len] if padded else x

    return (unpack(dq, L, pad), unpack(dk, Lk, k_pad), unpack(dv, Lk, k_pad))


def _flash_bwd_rule(block_q, block_k, interpret, residuals, g):
    q, k, v, is_valid, segment_ids, out, lse = residuals
    dq, dk, dv = _flash_backward(q, k, v, g, out, lse, is_valid, segment_ids,
                                 block_q=block_q, block_k=block_k,
                                 interpret=interpret)
    return dq, dk, dv, None, None


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def _parse_flash_impl(impl: str):
    """'flash' or 'flash:BQ:BK' -> (block_q or None, block_k or None)."""
    parts = impl.split(":")
    if len(parts) == 1:
        return None, None
    assert len(parts) == 3, f"attention impl '{impl}' — want flash[:BQ:BK]"
    return int(parts[1]), int(parts[2])


def _auto_block(Lp: int, cap: int) -> int:
    """Largest multiple of 128 that divides ``Lp`` and fits ``cap`` — keeps
    the tuned long-context defaults while staying grid-exact at lengths the
    defaults don't divide (e.g. L=640 -> 128, not 512)."""
    best = 128
    b = 128
    while b <= min(cap, Lp):
        if Lp % b == 0:
            best = b
        b += 128
    return best


def _axis_is_manual(name: str) -> bool:
    """True iff ``name`` is bound as a MANUAL mesh axis at this trace point
    (i.e. we are inside a shard_map region that lists it in axis_names)."""
    import jax.lax as _lax

    try:
        _lax.axis_index(name)  # dead value; raises NameError when unbound
        return True
    except Exception:
        return False


def _flash_on_mesh(q, k, v, is_valid, segment_ids, block_q, block_k,
                   interpret):
    """Partition the flash kernels over the active mesh (support-matrix
    flash x {dp, tp, sp} cells, round 5).

    A pallas_call is a custom call GSPMD cannot partition: traced under a
    mesh without help it gets REPLICATED — every device gathers the full
    [B, L, H, D] operands and computes every batch row and head (measured
    on the CPU mesh while closing the matrix). This wrapper runs the kernel
    under shard_map instead, batch-sharded over the data axes and
    head-sharded over tp (heads are independent in attention; with
    Megatron-sharded qkv params — parallel/sharding.py puts P(None, "tp",
    None) on the kernels whenever the mesh has tp>1 — q/k/v arrive
    head-sharded already, so this is also zero-reshard). The seq dim stays
    unsharded: softmax needs whole rows — under a GSPMD sp layout the
    boundary all-gathers seq exactly like the dense path does; TRUE
    seq-sharded flash is ring:flash / ulysses:flash (ops/ring_attention.py).

    Returns None when the wrapper does not apply (no active mesh; nothing
    shardable; already inside a manual region — e.g. the pipeline's
    partial-manual stage region, where dp/sp stay GSPMD-auto and a nested
    shard_map over them would conflict).
    """
    from merlot_reserve_tpu.parallel.mesh import (batch_axes, current_mesh,
                                                  dp_size)

    mesh = current_mesh()
    if mesh is None:
        return None
    if any(_axis_is_manual(a) for a in mesh.shape):
        return None
    B, L, H, D = q.shape
    bax = None
    if "dp" in mesh.shape and dp_size(mesh) > 1 and B % dp_size(mesh) == 0:
        bax = batch_axes(mesh)
    hax = None
    tp_n = mesh.shape.get("tp", 1)
    if tp_n > 1 and H % tp_n == 0:
        hax = "tp"
    if bax is None and hax is None:
        return None
    from jax.sharding import PartitionSpec as P

    qkv = P(bax, None, hax, None)
    lbl = P(bax, None)
    def body(q_, k_, v_, iv_, sg_):
        # positional call: custom_vjp nondiff_argnums are position-resolved
        return flash_attention(q_, k_, v_, iv_, sg_, block_q, block_k,
                               interpret)
    specs = dict(in_specs=(qkv, qkv, qkv, lbl, lbl), out_specs=qkv)
    if hasattr(jax, "shard_map"):
        # pallas_call's out_shape carries no varying-mesh-axes annotation
        fn = jax.shard_map(body, mesh=mesh, check_vma=False, **specs)
    else:  # older JAX
        from jax.experimental.shard_map import shard_map

        fn = shard_map(body, mesh=mesh, **specs)
    return fn(q, k, v, is_valid.astype(jnp.int32),
              segment_ids.astype(jnp.int32))


def resolve_impl(seq_len: int, impl: str = "auto", has_bias: bool = False,
                 has_labels: bool = False) -> str:
    """Resolve the 'auto' attention policy once (e.g. at encoder level so the
    mask bias can be hoisted out of the layer loop/scan). Non-auto strings
    ('xla', 'flash', 'flash:BQ:BK') pass through."""
    if impl != "auto":
        return impl
    if has_bias or not has_labels:
        return "xla"
    return "flash" if (_on_tpu() and seq_len >= _FLASH_MIN_LEN) else "xla"


def attention(q, k, v, *, is_valid=None, segment_ids=None, bias=None, impl: str = "auto",
              interpret: bool = False):
    """Unified attention entry point.

    Per-position labels (is_valid, segment_ids) are the fast path; a dense
    ``bias`` forces the XLA path. ``impl='flash:BQ:BK'`` pins the kernel
    block sizes (production tuning knob; bare 'flash' auto-picks).
    """
    L = q.shape[-3]
    interpret = interpret or _FORCE_INTERPRET
    impl = resolve_impl(
        L, impl, has_bias=bias is not None,
        has_labels=is_valid is not None or segment_ids is not None)

    if impl.startswith(("ring", "ulysses")):
        assert bias is None, (
            "sequence-parallel attention consumes per-position labels, not "
            "a dense bias — pass is_valid/segment_ids or use impl='xla'")
        from merlot_reserve_tpu.ops.ring_attention import (
            sequence_parallel_attention,
        )
        from merlot_reserve_tpu.parallel.mesh import current_mesh

        # grammar: 'ring[:lax|flash|rdma][:AXIS]' / 'ulysses[:xla|flash][:AXIS]'
        # (a single tail token that isn't a known inner is an AXIS shorthand);
        # anything else is an error — a typo must not silently degrade to
        # dense attention
        parts = impl.split(":")
        known = {"ring": ("lax", "flash", "rdma"),
                 "ulysses": ("xla", "flash")}[parts[0]]
        sub, axis, tail = known[0], "sp", parts[1:]
        if len(tail) == 1:
            if tail[0] in known:
                sub = tail[0]
            else:
                axis = tail[0]
        elif len(tail) == 2:
            assert tail[0] in known, (
                f"impl {impl!r}: unknown {parts[0]} inner {tail[0]!r}; "
                f"expected one of {known}")
            sub, axis = tail
        else:
            assert not tail, f"bad sequence-parallel impl string {impl!r}"
        if parts[0] == "ulysses":
            sub = "ulysses-flash" if sub == "flash" else "ulysses"
        mesh = current_mesh()
        assert mesh is None or axis in mesh.shape, (
            f"impl {impl!r}: axis {axis!r} not in mesh axes "
            f"{tuple(mesh.shape)}")
        if mesh is not None and mesh.shape.get(axis, 1) > 1:
            return sequence_parallel_attention(
                mesh, q, k, v, is_valid=is_valid, segment_ids=segment_ids,
                axis_name=axis, impl=sub, interpret=interpret)
        impl = "xla"  # no sequence axis to shard over

    if impl.startswith("flash"):
        assert bias is None, (
            "flash attention consumes per-position labels, not a dense bias "
            "— pass is_valid/segment_ids or use impl='xla'")
        assert q.shape[-3] == k.shape[-3], (
            f"flash self-attention requires Lq == Lk (got {q.shape[-3]} vs "
            f"{k.shape[-3]}): labels and padding are per-query-position — "
            "use impl='xla' for cross-attention")
        B = q.shape[0]
        if is_valid is None:
            is_valid = jnp.ones((B, L), jnp.int32)
        if segment_ids is None:
            segment_ids = jnp.zeros((B, L), jnp.int32)
        bq, bk = _parse_flash_impl(impl)
        if bq is None:
            Lp = int(np.ceil(L / 128) * 128)
            bq = _auto_block(Lp, _FLASH_BLOCK_Q)
            bk = _auto_block(Lp, _FLASH_BLOCK_K)
        out = _flash_on_mesh(q, k, v, is_valid, segment_ids, bq, bk, interpret)
        if out is not None:
            return out
        return flash_attention(q, k, v, is_valid, segment_ids, bq, bk, interpret)

    if bias is None and (is_valid is not None or segment_ids is not None):
        bias = make_attention_bias(is_valid=is_valid, segment_ids=segment_ids, dtype=jnp.float32)
    return xla_attention(q, k, v, bias=bias)
