"""Ring + Ulysses attention: sequence-parallel exact attention over a mesh axis.

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

Two sequence-parallel strategies live here, selected by impl string:
ring ('lax'/'flash'/'rdma' — K/V rotate past fixed local queries, O(n) hops)
and Ulysses ('ulysses'/'ulysses-flash' — one all_to_all trades the sequence
sharding for a head sharding, O(1) collectives per call; needs
num_heads % n == 0 and is differentiable with both inners). 'lax',
'flash' and both ulysses variants are differentiable — long-context
TRAINING keeps the Pallas kernels via 'flash' even when heads don't
divide the axis; only 'rdma' is forward-only.

VALIDATION STATUS: the ``lax`` and per-hop ``flash`` implementations are
equivalence-tested on the CPU mesh (kernels in interpret mode) AND exercised
by dryrun_multichip's dp4xsp2 layout; ``ulysses``/``ulysses-flash`` are
equivalence- and grad-tested on the CPU mesh. The single-kernel ``rdma`` ring
(in-kernel async remote DMA + semaphore backpressure) is necessarily
interpret-mode-tested ONLY in this environment: real ICI DMA semantics
(remote semaphores, backpressure timing) have never executed on multi-chip
hardware. Treat 'rdma' as experimental until it has run on a real slice;
'lax'/'flash' are the production paths.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_NEG_INF = -1e10


def _pvary(x, axis_name, ref=None):
    # mark an unvarying array as varying over the ring axis so the scan
    # carry types line up under shard_map's varying-axis checks; with a
    # ``ref`` array (e.g. q, which may additionally vary over a dp batch
    # axis on a combined mesh), match its full varying set
    axes = {axis_name} if isinstance(axis_name, str) else set(axis_name)
    if ref is not None:
        try:
            axes |= set(jax.typeof(ref).vma)
        except Exception:
            pass
    axes = tuple(sorted(axes))
    if hasattr(lax, "pcast"):  # JAX >= 0.9
        return lax.pcast(x, axes, to="varying")
    if hasattr(lax, "pvary"):
        return lax.pvary(x, axes)
    return x


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

    def merge(acc, m_run, l_run, k_cur, v_cur, kv_valid, kv_seg):
        acc_b, m_b, l_b = _partial_attention(
            q, k_cur, v_cur, q_valid, q_seg, kv_valid, kv_seg, scale)
        m_new = jnp.maximum(m_run, m_b)
        c_run = jnp.exp(m_run - m_new)
        c_b = jnp.exp(m_b - m_new)
        acc = acc * c_run[..., None] + acc_b * c_b[..., None]
        return acc, m_new, l_run * c_run + l_b * c_b

    def step(carry, _):
        k_cur, v_cur, kv_valid, kv_seg, acc, m_run, l_run = carry
        acc, m_run, l_run = merge(acc, m_run, l_run,
                                  k_cur, v_cur, kv_valid, kv_seg)
        k_nxt = lax.ppermute(k_cur, axis_name, perm)
        v_nxt = lax.ppermute(v_cur, axis_name, perm)
        valid_nxt = lax.ppermute(kv_valid, axis_name, perm)
        seg_nxt = lax.ppermute(kv_seg, axis_name, perm)
        return (k_nxt, v_nxt, valid_nxt, seg_nxt, acc, m_run, l_run), None

    acc0 = jnp.zeros((B, H, Lq, D), jnp.float32)
    m0 = jnp.full((B, H, Lq), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, H, Lq), jnp.float32)
    # under shard_map's varying-axis typing, the running stats must be marked
    # as varying over the ring axis to match the loop outputs
    acc0, m0, l0 = (_pvary(x, axis_name, ref=q) for x in (acc0, m0, l0))
    carry0 = (k, v, q_valid, q_seg, acc0, m0, l0)
    # n-1 rotation steps + a merge-only epilogue: the n-th rotation would
    # only feed the discarded final carry, and XLA cannot DCE collectives
    # inside a scan body — one full K/V+labels ICI hop saved per call (and
    # per backward replay on the differentiable path)
    carry, _ = lax.scan(step, carry0, None, length=n - 1)
    k_l, v_l, valid_l, seg_l, acc, m_run, l_run = carry
    acc, _m, l = merge(acc, m_run, l_run, k_l, v_l, valid_l, seg_l)

    l_safe = jnp.where(l == 0.0, 1.0, l)
    out = (acc / l_safe[..., None]).transpose(0, 2, 1, 3)
    return out.astype(q.dtype)


def ring_flash_attention(q, k, v, is_valid, segment_ids, axis_name: str = "sp",
                         block_q: int = 512, block_k: int = 512,
                         interpret: bool = False):
    """Pallas ring attention: per ring step the local queries attend to the
    resident K/V shard with the pipelined Pallas flash kernel
    (ops/attention.py), while the NEXT shard rotates via ``lax.ppermute`` —
    the permute is issued before the kernel so XLA's latency-hiding
    scheduler overlaps the ICI transfer with the MXU work (double-buffered
    K/V: current shard computing, next shard in flight).

    Per-step partials are merged exactly with the flash log-sum-exp
    recurrence: out = sum_t out_t * exp(lse_t - logsumexp_t lse_t).

    DIFFERENTIABLE (custom VJP): the backward runs its own K/V ring — each
    hop applies the Pallas backward kernels (ops/attention.py::
    _flash_backward) against the visiting shard using the globally-merged
    out/lse residuals, so p = exp(s - lse) is the true global probability
    and per-hop dq/dk/dv contributions are exactly additive; dk/dv
    accumulators travel WITH their shard and come home on the final hop.
    Long-context training keeps the flash kernels even when
    num_heads % sp != 0 (where ulysses can't apply).

    All arguments are LOCAL shards (call under shard_map), same signature
    as ``ring_attention``. On CPU pass interpret=True (tests do).
    """
    return _ring_flash(q, k, v, is_valid.astype(jnp.int32),
                       segment_ids.astype(jnp.int32), axis_name,
                       block_q, block_k, interpret)


def _ring_flash_forward(q, k, v, q_valid, q_seg, axis_name, block_q, block_k,
                        interpret):
    """Forward ring (see ring_flash_attention): returns (out, merged lse
    [B, Lq, H, 1] f32 — the full-sequence softmax stats the backward needs)."""
    from merlot_reserve_tpu.ops.attention import _flash_forward

    n = lax.psum(1, axis_name)
    B, Lq, H, D = q.shape
    perm = [(i, (i + 1) % n) for i in range(n)]

    def one_step(k_cur, v_cur, kv_valid, kv_seg):
        out_t, lse_t = _flash_forward(
            q, k_cur, v_cur, q_valid, q_seg, block_q=block_q, block_k=block_k,
            interpret=interpret, k_is_valid=kv_valid, k_segment_ids=kv_seg)
        # lse [B, H, 1, Lqp] -> [B, Lq, H, 1] aligned with out [B, Lq, H, D]
        lse_t = lse_t[:, :, 0, :Lq].transpose(0, 2, 1)[..., None]
        return out_t.astype(jnp.float32), lse_t

    def lse_merge(out_run, lse_run, out_t, lse_t):
        lse_new = jnp.logaddexp(lse_run, lse_t)
        out_run = (out_run * jnp.exp(lse_run - lse_new)
                   + out_t * jnp.exp(lse_t - lse_new))
        return out_run, lse_new

    def step(carry, _):
        k_cur, v_cur, kv_valid, kv_seg, out_run, lse_run = carry
        # issue the rotation FIRST: no data dependence on this step's
        # compute, so the collective-permute flies while flash runs
        k_nxt = lax.ppermute(k_cur, axis_name, perm)
        v_nxt = lax.ppermute(v_cur, axis_name, perm)
        valid_nxt = lax.ppermute(kv_valid, axis_name, perm)
        seg_nxt = lax.ppermute(kv_seg, axis_name, perm)

        out_t, lse_t = one_step(k_cur, v_cur, kv_valid, kv_seg)
        out_run, lse_run = lse_merge(out_run, lse_run, out_t, lse_t)
        return (k_nxt, v_nxt, valid_nxt, seg_nxt, out_run, lse_run), None

    out0 = jnp.zeros((B, Lq, H, D), jnp.float32)
    # finite "-inf": keeps exp(lse_run - lse_new) well-defined on the first
    # merge (every real step's lse is > -1e30 even for fully masked rows)
    lse0 = jnp.full((B, Lq, H, 1), -1e30, jnp.float32)
    out0, lse0 = (_pvary(x, axis_name, ref=q) for x in (out0, lse0))
    carry0 = (k, v, q_valid, q_seg, out0, lse0)
    # n-1 rotate+compute steps, then a compute-only epilogue on the last
    # received shard (the n-th rotation would feed the discarded carry)
    carry, _ = lax.scan(step, carry0, None, length=n - 1)
    k_l, v_l, valid_l, seg_l, out, lse = carry
    out_t, lse_t = one_step(k_l, v_l, valid_l, seg_l)
    out, lse = lse_merge(out, lse, out_t, lse_t)
    return out.astype(q.dtype), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _ring_flash(q, k, v, q_valid, q_seg, axis_name, block_q, block_k,
                interpret):
    out, _ = _ring_flash_forward(q, k, v, q_valid, q_seg, axis_name,
                                 block_q, block_k, interpret)
    return out


def _ring_flash_fwd(q, k, v, q_valid, q_seg, axis_name, block_q, block_k,
                    interpret):
    out, lse = _ring_flash_forward(q, k, v, q_valid, q_seg, axis_name,
                                   block_q, block_k, interpret)
    return out, (q, k, v, q_valid, q_seg, out, lse)


def _ring_flash_bwd(axis_name, block_q, block_k, interpret, residuals, g):
    """Backward ring: K/V shards (+labels +their dk/dv accumulators) rotate
    past the fixed local (q, do, out, lse) while the Pallas backward kernels
    produce each hop's exact contribution. After the n-1 rotations + the
    merge-only epilogue, every shard's accumulated dk/dv sits ONE hop short
    of its owner (mirroring the forward's saved epilogue rotation) — a
    single final ppermute of the two grad buffers brings them home.
    """
    from merlot_reserve_tpu.ops.attention import _flash_backward

    q, k, v, q_valid, q_seg, out, lse = residuals
    n = lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    do = g.astype(jnp.float32)
    # [B, Lq, H, 1] -> [B, H, 1, Lq] (the kernels' row-stat layout)
    lse_bh = lse[..., 0].transpose(0, 2, 1)[:, :, None, :]

    def hop(k_cur, v_cur, val_cur, seg_cur, dq_acc, dk_cur, dv_cur):
        dq_t, dk_t, dv_t = _flash_backward(
            q, k_cur, v_cur, do, out, lse_bh, q_valid, q_seg,
            block_q=block_q, block_k=block_k, interpret=interpret,
            k_is_valid=val_cur, k_segment_ids=seg_cur)
        return (dq_acc + dq_t.astype(jnp.float32),
                dk_cur + dk_t.astype(jnp.float32),
                dv_cur + dv_t.astype(jnp.float32))

    def step(carry, _):
        k_cur, v_cur, val_cur, seg_cur, dq_acc, dk_cur, dv_cur = carry
        dq_acc, dk_cur, dv_cur = hop(k_cur, v_cur, val_cur, seg_cur,
                                     dq_acc, dk_cur, dv_cur)
        rotated = [lax.ppermute(x, axis_name, perm)
                   for x in (k_cur, v_cur, val_cur, seg_cur, dk_cur, dv_cur)]
        return (rotated[0], rotated[1], rotated[2], rotated[3],
                dq_acc, rotated[4], rotated[5]), None

    dq0, dk0, dv0 = (_pvary(jnp.zeros(a.shape, jnp.float32), axis_name, ref=q)
                     for a in (q, k, v))
    carry0 = (k, v, q_valid, q_seg, dq0, dk0, dv0)
    carry, _ = lax.scan(step, carry0, None, length=n - 1)
    k_l, v_l, val_l, seg_l, dq, dk, dv = carry
    dq, dk, dv = hop(k_l, v_l, val_l, seg_l, dq, dk, dv)
    dk = lax.ppermute(dk, axis_name, perm)
    dv = lax.ppermute(dv, axis_name, perm)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            None, None)


_ring_flash.defvjp(_ring_flash_fwd, _ring_flash_bwd)


def ulysses_attention(q, k, v, is_valid, segment_ids, axis_name: str = "sp",
                      inner: str = "xla", interpret: bool = False):
    """Ulysses-style sequence parallelism: trade the sequence sharding for a
    HEAD sharding with one ``all_to_all``, run exact attention locally over
    the full sequence with H/n heads, and swap back.

    Communication per call is 4 all_to_alls of the local activation size
    (q, k, v in; out back) plus an all_gather of the [B, L/n] int labels —
    independent of the ring length — versus the ring's (n-1) K/V+label
    rotations. Prefer ulysses when num_heads % n == 0 and the shard count is
    large (communication O(1) vs O(n) hops); prefer ring when heads don't
    divide or when the O(L) full-sequence score rows per head must also be
    avoided. Unlike the per-hop 'flash' ring (forward-only merge), BOTH
    ulysses inners differentiate end-to-end: all_to_all's transpose is
    all_to_all and the local attention is either XLA (native AD) or the
    Pallas flash kernel (custom_vjp with the tuned backward kernels).

    All arguments are LOCAL shards (call under shard_map):
      q, k, v: [B, L/n, H, D]; is_valid/segment_ids: [B, L/n]
    :return: [B, L/n, H, D] in q.dtype

    No reference counterpart (the reference caps sequences at 1024 and packs
    instead — SURVEY.md §5); capability peer of ring_attention above.
    """
    def swap_in(x):  # [B, L/n, H, D] -> [B, L, H/n, D]
        return lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1,
                              tiled=True)

    qg, kg, vg = swap_in(q), swap_in(k), swap_in(v)
    valid_g = lax.all_gather(is_valid.astype(jnp.int32), axis_name, axis=1,
                             tiled=True)
    seg_g = lax.all_gather(segment_ids.astype(jnp.int32), axis_name, axis=1,
                           tiled=True)

    # lazy import: ops.attention imports this module lazily for the same
    # reason (the two are mutually-recursive capability layers)
    if inner == "flash":
        from merlot_reserve_tpu.ops.attention import (
            _FLASH_BLOCK_K, _FLASH_BLOCK_Q, _auto_block, flash_attention,
        )

        L = qg.shape[1]
        Lp = int(np.ceil(L / 128) * 128)
        out = flash_attention(qg, kg, vg, valid_g, seg_g,
                              _auto_block(Lp, _FLASH_BLOCK_Q),
                              _auto_block(Lp, _FLASH_BLOCK_K), interpret)
    else:
        from merlot_reserve_tpu.ops.attention import (
            make_attention_bias, xla_attention,
        )

        out = xla_attention(qg, kg, vg, make_attention_bias(
            is_valid=valid_g, segment_ids=seg_g, dtype=jnp.float32))
    return lax.all_to_all(out.astype(q.dtype), axis_name, split_axis=1,
                          concat_axis=2, tiled=True)


def sequence_parallel_attention(mesh, q, k, v, is_valid=None, segment_ids=None,
                                axis_name: str = "sp", impl: str = "lax",
                                interpret: bool = False,
                                tp_heads: bool = None):
    """Array-level wrapper: shards the sequence dim of global [B, L, H, D]
    inputs over ``axis_name`` and runs ring attention under shard_map.

    impl: 'lax' (differentiable, ppermute+scan online-softmax), 'flash'
    (Pallas kernel per ring step with the permute overlapped; differentiable
    via a backward ring of the Pallas backward kernels), 'rdma' (single
    Pallas kernel, in-kernel async remote DMA ring; forward-only,
    VMEM-bounded shard size), or 'ulysses' / 'ulysses-flash' (all_to_all
    head sharding, differentiable with either inner; needs
    num_heads % n == 0).

    tp_heads: whether q/k/v arrive head-sharded over a 'tp' mesh axis
    (Megatron QKV). Default ``None`` auto-enables it whenever the mesh has
    a tp axis that divides num_heads — correct for every layout this
    package's param_shardings produce (tp>1 always Megatron-shards the QKV
    kernels). Callers driving this op directly with REPLICATED q/k/v on a
    tp mesh should pass ``tp_heads=False``: the auto head spec would split
    heads at entry and all-gather the output at exit, adding boundary
    collectives in exchange for computing only H/tp heads per shard.
    """
    from jax.sharding import PartitionSpec as P

    B, L, H, D = q.shape
    n = mesh.shape[axis_name]
    assert L % n == 0, f"L={L} not divisible by {axis_name}={n}"
    if is_valid is None:
        is_valid = jnp.ones((B, L), jnp.int32)
    if segment_ids is None:
        segment_ids = jnp.zeros((B, L), jnp.int32)

    # Shard the batch dim over dp when the mesh has one (and B divides):
    # otherwise a combined dp x sp mesh would all-gather the global batch
    # into every dp shard at the shard_map boundary and compute it
    # redundantly (the same trap parallel/pipeline.py documents).
    from merlot_reserve_tpu.parallel.mesh import batch_axes, dp_size

    bax = None
    if "dp" in mesh.shape and dp_size(mesh) > 1 and B % dp_size(mesh) == 0:
        bax = batch_axes(mesh)
    # Megatron composition: with a tp axis in the mesh, q/k/v arrive head-
    # sharded over tp (the qkv kernel is P(None, "tp", None) — parallel/
    # sharding.py), so the head dim must be named in the specs too: each tp
    # shard rings ONLY its own heads (heads are independent in attention)
    # and the output stays head-sharded for the row-parallel attn_proj.
    # Leaving it unnamed would all-gather the heads at the boundary and
    # compute every head redundantly per tp shard.
    tp_n = mesh.shape.get("tp", 1)
    if tp_heads is None:
        tp_heads = tp_n > 1 and H % tp_n == 0 and axis_name != "tp"
    elif tp_heads:
        assert tp_n > 1 and H % tp_n == 0 and axis_name != "tp", (
            f"tp_heads=True needs a tp mesh axis dividing num_heads={H} "
            f"(tp={tp_n}) distinct from axis_name={axis_name!r}")
    hax = "tp" if tp_heads else None
    qkv_spec = P(bax, axis_name, hax, None)
    lbl_spec = P(bax, axis_name)

    if impl == "rdma":
        body = functools.partial(ring_flash_attention_rdma,
                                 axis_name=axis_name, interpret=interpret)
    elif impl == "flash":
        body = functools.partial(ring_flash_attention, axis_name=axis_name,
                                 interpret=interpret)
    elif impl.startswith("ulysses"):
        # with a tp head sharding the body sees H/tp local heads, and THOSE
        # must split over the ulysses axis
        local_heads = H // tp_n if hax else H
        assert local_heads % n == 0, (
            f"ulysses attention shards heads over '{axis_name}': "
            f"{local_heads} local heads (num_heads={H}"
            + (f" / tp={tp_n}" if hax else "")
            + f") not divisible by {axis_name}={n} — use impl='lax' (ring) "
            "for non-dividing head counts")
        body = functools.partial(
            ulysses_attention, axis_name=axis_name,
            inner="flash" if impl.endswith("flash") else "xla",
            interpret=interpret)
    else:
        body = functools.partial(ring_attention, axis_name=axis_name)
    specs = dict(in_specs=(qkv_spec, qkv_spec, qkv_spec, lbl_spec, lbl_spec),
                 out_specs=qkv_spec)
    if hasattr(jax, "shard_map"):
        # pallas_call's out_shape carries no varying-mesh-axes annotation;
        # disable the vma check for the kernel paths
        fn = jax.shard_map(body, mesh=mesh,
                           check_vma=impl not in ("flash", "rdma",
                                                  "ulysses-flash"), **specs)
    else:  # older JAX
        from jax.experimental.shard_map import shard_map

        fn = shard_map(body, mesh=mesh, **specs)
    return fn(q, k, v, is_valid.astype(jnp.int32), segment_ids.astype(jnp.int32))


# ---------------------------------------------------------------------------
# in-kernel RDMA ring (single Pallas kernel per device)
# ---------------------------------------------------------------------------


def _rdma_ring_kernel(q_ref, k_ref, v_ref, qlab_ref, klab_ref, o_ref,
                      comm_k, comm_v, comm_lab, acc, m_scr, l_scr,
                      send_sem, recv_sem, cap_sem,
                      *, axis_name: str, n_dev: int, block_q: int,
                      scale: float):
    """Whole ring in ONE kernel: K/V (+labels) live in double-buffered VMEM
    scratch and hop to the right neighbor via async remote DMA, overlapped
    with the flash compute on the resident slot (pallas_guide.md "Ring
    Collectives" pattern). Slot protocol: step s computes on slot s%2 and
    sends it into the remote slot (s+1)%2; a capacity semaphore from the
    right neighbor provides backpressure so a fast sender can never
    overwrite an unconsumed buffer (signals after compute at steps
    r <= n-3 exactly balance waits at sends s >= 1 — all semaphores drain
    to zero by kernel end, as mosaic requires).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    my_id = lax.axis_index(axis_name)
    right = lax.rem(my_id + 1, n_dev)
    left = lax.rem(my_id + n_dev - 1, n_dev)

    B, H, Lq, D = q_ref.shape
    Lk = k_ref.shape[2]
    num_q_blocks = Lq // block_q

    comm_k[0] = k_ref[...]
    comm_v[0] = v_ref[...]
    comm_lab[0] = klab_ref[...]
    acc[...] = jnp.zeros_like(acc)
    m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
    l_scr[...] = jnp.zeros_like(l_scr)

    def ring_step(step, _):
        send_slot = lax.rem(step, 2)
        recv_slot = 1 - send_slot

        # declarative descriptors; started/waited under pl.when guards
        rdmas = [
            pltpu.make_async_remote_copy(
                src_ref=buf.at[send_slot], dst_ref=buf.at[recv_slot],
                send_sem=send_sem.at[i], recv_sem=recv_sem.at[i],
                device_id=right,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            for i, buf in enumerate((comm_k, comm_v, comm_lab))
        ]

        @pl.when(jnp.logical_and(step < n_dev - 1, step >= 1))
        def _wait_capacity():
            # right neighbor must have consumed the slot we're about to fill
            pltpu.semaphore_wait(cap_sem.at[recv_slot], 1)

        @pl.when(step < n_dev - 1)
        def _send():
            for r in rdmas:
                r.start()

        # ---- flash compute on the resident slot (overlaps the DMA) ----
        k_all = comm_k[send_slot]        # [B, H, Lk, D]
        v_all = comm_v[send_slot]
        lab = comm_lab[send_slot]        # [B, 2, Lk]

        def bh_body(bh, _):
            b = bh // H
            h = lax.rem(bh, H)
            k_bh = k_all[b, h].astype(jnp.float32)     # [Lk, D]
            v_bh = v_all[b, h].astype(jnp.float32)
            k_valid = lab[b, 0]
            k_seg = lab[b, 1]

            def q_body(qi, _):
                qs = pl.ds(qi * block_q, block_q)
                q_blk = q_ref[b, h, qs, :].astype(jnp.float32) * scale
                s = jnp.dot(q_blk, k_bh.T,
                            preferred_element_type=jnp.float32)
                q_valid = qlab_ref[b, 0, qs]
                q_seg = qlab_ref[b, 1, qs]
                mask = (q_valid[:, None] > 0) & (k_valid[None, :] > 0) & \
                    (q_seg[:, None] == k_seg[None, :])
                s = jnp.where(mask, s, _NEG_INF)

                m_prev = m_scr[b, h, qs]
                l_prev = l_scr[b, h, qs]
                m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1))
                corr = jnp.exp(m_prev - m_cur)
                p = jnp.exp(s - m_cur[:, None])
                l_scr[b, h, qs] = l_prev * corr + jnp.sum(p, axis=-1)
                acc[b, h, qs, :] = acc[b, h, qs, :] * corr[:, None] + \
                    jnp.dot(p, v_bh, preferred_element_type=jnp.float32)
                m_scr[b, h, qs] = m_cur
                return 0

            lax.fori_loop(0, num_q_blocks, q_body, 0)
            return 0

        lax.fori_loop(0, B * H, bh_body, 0)

        @pl.when(step < n_dev - 1)
        def _wait():
            # send completion locally + our incoming copies (SPMD: the left
            # neighbor's identical transfer signals our recv semaphores)
            for r in rdmas:
                r.wait()

        @pl.when(step <= n_dev - 3)
        def _free_slot():
            # tell our LEFT neighbor this slot may be refilled — only AFTER
            # rdma.wait(): both our compute on the slot and our outgoing
            # DMA *reading* it are done (signaling earlier lets the
            # neighbor's next hop overwrite data still in flight)
            pltpu.semaphore_signal(cap_sem.at[send_slot], inc=1,
                                   device_id=left,
                                   device_id_type=pltpu.DeviceIdType.LOGICAL)
        return 0

    lax.fori_loop(0, n_dev, ring_step, 0)

    l_fin = l_scr[...]
    l_safe = jnp.where(l_fin == 0.0, 1.0, l_fin)
    o_ref[...] = (acc[...] / l_safe[..., None]).astype(o_ref.dtype)


def ring_flash_attention_rdma(q, k, v, is_valid, segment_ids,
                              axis_name: str = "sp", block_q: int = 256,
                              interpret: bool = False):
    """Exact ring attention as ONE Pallas kernel per device: K/V + labels
    rotate chip-to-chip with double-buffered async remote DMA entirely in
    VMEM, no HBM round-trips between ring steps (the lax/ppermute paths
    bounce K/V through HBM every hop). Forward-only; requires the local
    K/V shard x2 buffers + the f32 accumulator to fit VMEM (~Lloc <= 1k at
    base head sizes in bf16) — use ``ring_flash_attention`` beyond that.

    Arguments are LOCAL shards under shard_map, same contract as
    ``ring_attention``. interpret=True runs the TPU interpret mode (CPU
    tests simulate the RDMA semantics faithfully, incl. semaphores).

    VALIDATION STATUS: interpret-mode/CPU-mesh tested ONLY (this dev
    environment has one chip, no ICI). Real inter-chip DMA semantics —
    hardware semaphores, backpressure, send/recv ordering — have never
    executed. Prefer ``ring_flash_attention`` (lax.ppermute hops, fully
    exercised) until this kernel has run on a real multi-chip slice.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_dev = int(lax.psum(1, axis_name))  # static under shard_map tracing
    if n_dev == 1:
        from merlot_reserve_tpu.ops.attention import _flash_forward

        out, _ = _flash_forward(q, k, v, is_valid.astype(jnp.int32),
                                segment_ids.astype(jnp.int32),
                                block_q=block_q, block_k=block_q,
                                interpret=interpret)
        return out

    B, Lq, H, D = q.shape
    scale = float(1.0 / np.sqrt(D))
    assert Lq % block_q == 0 or Lq < block_q, \
        f"L_local={Lq} must divide into block_q={block_q} blocks"
    bq = min(block_q, Lq)

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    qlab = jnp.stack([is_valid.astype(jnp.int32),
                      segment_ids.astype(jnp.int32)], 1)

    kernel = functools.partial(_rdma_ring_kernel, axis_name=axis_name,
                               n_dev=n_dev, block_q=bq, scale=scale)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((2,) + kt.shape, kt.dtype),        # comm_k
            pltpu.VMEM((2,) + vt.shape, vt.dtype),        # comm_v
            pltpu.VMEM((2,) + qlab.shape, jnp.int32),     # comm_lab
            pltpu.VMEM(qt.shape, jnp.float32),            # acc
            pltpu.VMEM(qt.shape[:3], jnp.float32),        # m
            pltpu.VMEM(qt.shape[:3], jnp.float32),        # l
            pltpu.SemaphoreType.DMA((3,)),                # send
            pltpu.SemaphoreType.DMA((3,)),                # recv
            pltpu.SemaphoreType.REGULAR((2,)),            # capacity
        ],
        interpret=(pltpu.InterpretParams() if interpret else False),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            collective_id=7,
        ) if not interpret else None,
    )(qt, kt, vt, qlab, qlab)
    return out.transpose(0, 2, 1, 3)
