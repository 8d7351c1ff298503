"""GPipe-style pipeline parallelism over a mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2.13: its only compute
parallelism is pmap data-parallel, /root/reference/pretrain/train.py:106-107).
This module adds it the TPU-native way: the scan-layout transformer params
(stacked ``[num_layers, ...]`` leaves, models/layers.py ``scan_layers``)
shard their layer dim over a ``pp`` mesh axis, so each device holds
``num_layers / pp`` contiguous layers — one pipeline *stage*. Microbatches
flow through the stages under ``shard_map``: at tick ``t`` stage ``s``
processes microbatch ``t - s`` (predicated off during the fill/drain
bubble) and hands its activations to stage ``s+1`` with ``lax.ppermute``,
which XLA overlaps with the next tick's compute on ICI.

The shard_map is PARTIAL-MANUAL (round 4): only the ``pp`` axis is manual —
the ppermute ring and the stage predication need per-stage control — while
every other mesh axis (dcn, dp, sp, tp) stays GSPMD-managed *inside* the
region. Activations therefore keep their data-parallel batch sharding AND
their ``sp`` sequence sharding through the pipeline (a bare-PartitionSpec
anchor per tick re-asserts them after the provenance-erasing microbatch
dynamic-slice), and stage-local layer weights may carry ``tp`` shardings on
their non-stacked dims. Before round 4 the region was fully manual with a
hand-threaded dp dim: sp could not be propagated at all (joint activations
replicated over sp inside pp — the r3 support-matrix hole) and tp-within-a-
stage needed per-leaf manual specs.

Everything is ``lax.scan``/``ppermute``, so the pipeline is exactly
reverse-differentiable: the backward pass is the same pipeline run in
reverse (ppermute transposes to the inverted permutation), and parameter
gradients come out stacked ``[num_layers, ...]`` and sharded over ``pp``.
PARAM memory therefore scales 1/S with the stage count; activation memory
does not (each stage keeps its scan-carried microbatch activations live
through backward unless ``remat=True``).

Efficiency notes (correctness first, tiny-shape dryrun second):
  * bubble fraction = (S-1)/(M+S-1) for S stages and M microbatches — pick
    M >= 4*S for production;
  * the fill/drain ticks still execute predicated layer compute (standard
    GPipe);
  * On 1F1B (considered for r3, rejected on semantics): interleaving each
    microbatch's backward behind its forward requires a per-microbatch
    loss. The pretraining objective's InfoNCE denominator couples EVERY
    microbatch (global negatives, models/pretrainer.py) — output gradients
    exist only after the full-batch loss, so the legal schedule is
    all-forward -> loss -> all-backward regardless of pipeline shape.
    1F1B's actual benefit at that point is its activation bound
    (S microbatches live instead of M), and ``remat=True`` already delivers
    that bound here: only per-tick stage-boundary activations are saved and
    layers recompute in backward. Workloads with per-example losses
    (finetune heads) use lax.scan gradient accumulation instead
    (finetune/train.py), where the same bound holds trivially.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def _partial_shard_map(fn, mesh, in_specs, out_specs, manual_axis):
    """shard_map with ONLY ``manual_axis`` manual; every other mesh axis
    stays auto (GSPMD-sharded inside the region). JAX >= 0.9 spells this
    ``axis_names=``; older versions spell the complement ``auto=``."""
    import inspect

    if hasattr(jax, "shard_map") and \
            "axis_names" in inspect.signature(jax.shard_map).parameters:
        # detect support explicitly: a blanket try/except TypeError would
        # swallow genuine spec errors and reroute them into the legacy
        # module (removed in newer JAX) as a confusing ImportError
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs,
                             axis_names=frozenset({manual_axis}),
                             check_vma=False)
    from jax.experimental.shard_map import shard_map

    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     auto=frozenset(mesh.axis_names) - {manual_axis})


def _pvary(x, axis_name):
    # mark an unvarying array as varying over the pipeline axis so the scan
    # carry types line up under shard_map's varying-axis checks
    if hasattr(lax, "pcast"):  # JAX >= 0.9
        return lax.pcast(x, axis_name, to="varying")
    if hasattr(lax, "pvary"):
        return lax.pvary(x, axis_name)
    return x


def pipeline_transformer(stacked_params, x, sinusoids=None, is_valid=None,
                         segment_ids=None, attention_bias=None, *,
                         layer, mesh: Mesh, axis: str = "pp",
                         sp_axis: Optional[str] = None,
                         num_microbatches: int = 2, remat: bool = False,
                         remat_policy=None):
    """Apply a stacked transformer layer pytree as a pipeline over ``axis``.

    :param stacked_params: pytree with every leaf ``[num_layers, ...]`` (the
        ``scan_layers`` param layout under 'layers', models/layers.py).
    :param x: ``[B, L, H]`` global activations; B must divide by
        ``num_microbatches``.
    :param layer: a ``TransformerLayer``-like flax module template with
        ``scan_format=True`` (its ``apply({'params': p}, x, sin, valid, seg,
        bias)`` returns ``(x, None)``).
    :param mesh: mesh containing ``axis``; ``num_layers`` must divide by its
        size. Only ``axis`` is manual in the region — batch sharding (the
        mesh's data-parallel axes) and ``sp_axis`` sequence sharding are
        GSPMD-propagated through the stage compute, anchored per tick.
    :param sp_axis: sequence-parallel mesh axis the caller shards the
        activations' L dim over (``TransformerEncoder.seq_shard_axis``);
        None leaves the seq dim unconstrained.
    :return: ``[B, L, H]`` outputs, numerically identical to applying the
        layers sequentially.
    """
    from merlot_reserve_tpu.parallel.mesh import batch_axes

    S = mesh.shape[axis]
    B, L, H = x.shape
    M = num_microbatches
    assert B % M == 0, f"batch {B} not divisible by {M} microbatches"
    num_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    assert num_layers % S == 0, f"{num_layers} layers over {S} stages"

    bax = batch_axes(mesh)
    sp = sp_axis if (sp_axis and sp_axis in mesh.shape) else None
    # bare-PartitionSpec anchor for a [B/M, L, H] microbatch inside the
    # region: batch over the dp axes, seq over sp. Applied after each tick's
    # dynamic-slice/select (provenance-erasing ops — without the anchor
    # GSPMD replicates the microbatch over dp and sp, the pre-r4 behavior).
    act_anchor = P(bax, sp, None)
    # per-slot anchors for the sliced microbatch args: sinusoids
    # [B/M, 2, L, rh] and attention_bias [B/M, heads?, L, L] carry the
    # QUERY seq dim at -2 (bias keys stay full-L: dense attention inside
    # the region all-gathers K anyway); labels [B/M, L] at -1. Without
    # these, the dynamic_index_in_dim slice erases provenance and GSPMD
    # may replicate a [B/M, ., L, L] bias over dp x sp every tick.
    arg_anchors = (P(bax, None, sp, None), P(bax, sp), P(bax, sp),
                   P(bax, None, sp, None))

    def mb(t):
        return None if t is None else t.reshape((M, B // M) + t.shape[1:])

    mb_args = tuple(mb(t) for t in (sinusoids, is_valid, segment_ids,
                                    attention_bias))
    x_mb = mb(x)

    param_specs = jax.tree.map(lambda _: P(axis), stacked_params)
    present = [a for a in mb_args if a is not None]
    # in/out specs name ONLY the manual axis: activations are pp-replicated
    # at the boundary while their dp/sp shardings flow through as auto axes
    # (no resharding at entry — the caller's batch arrives dp-sharded).
    in_specs = (param_specs, P()) + tuple(P() for _ in present)

    def stage_fn(params_local, x_mb, *present_args):
        # re-inflate optional args to positional slots
        it = iter(present_args)
        args_mb = tuple(next(it) if a is not None else None for a in mb_args)

        stage = lax.axis_index(axis)
        T = M + S - 1

        def run_local(h, args_m):
            sin, valid, seg, bias = args_m

            def body(h, p_slice):
                h2, _ = layer.apply({"params": p_slice}, h, sin, valid, seg,
                                    bias)
                return h2, None

            if remat:
                # rematerialize per layer: backward recomputes the layer
                # instead of keeping T x L_local activations live
                body = jax.checkpoint(body, prevent_cse=False,
                                      policy=remat_policy)
            h, _ = lax.scan(body, h, params_local)
            return h

        def tick(carry, t):
            state, outputs = carry
            m = t - stage
            mc = jnp.clip(m, 0, M - 1)

            def idx(a):
                return None if a is None else lax.dynamic_index_in_dim(
                    a, mc, 0, keepdims=False)

            inp = jnp.where(stage == 0, idx(x_mb), state)
            inp = lax.with_sharding_constraint(inp, act_anchor)
            args_t = tuple(
                None if a is None
                else lax.with_sharding_constraint(idx(a), anch)
                for a, anch in zip(args_mb, arg_anchors))
            y = run_local(inp, args_t)
            y = lax.with_sharding_constraint(y, act_anchor)

            write = (m >= 0) & (m < M) & (stage == S - 1)
            upd = lax.dynamic_update_index_in_dim(
                outputs, y.astype(outputs.dtype), mc, 0)
            outputs = jnp.where(write, upd, outputs)
            state = lax.ppermute(y, axis, [(i, (i + 1) % S) for i in range(S)])
            return (state, outputs), None

        # anchor the scan-carried buffers too: the [M, B/M, L, H] outputs
        # stream and the stage hand-off state have no sharding provenance
        # of their own (zeros_like erases it), and an unanchored 4-D
        # buffer silently replicates over dp/sp inside the region
        state0 = lax.with_sharding_constraint(
            _pvary(jnp.zeros_like(x_mb[0]), axis), act_anchor)
        outputs0 = lax.with_sharding_constraint(
            _pvary(jnp.zeros_like(x_mb), axis), P(None, bax, sp, None))
        (state, outputs), _ = lax.scan(tick, (state0, outputs0),
                                       jnp.arange(T))
        # outputs live on the last stage; replicate for the P() out_spec
        outputs = lax.psum(
            jnp.where(stage == S - 1, outputs, jnp.zeros_like(outputs)), axis)
        return outputs

    fn = _partial_shard_map(stage_fn, mesh, in_specs, P(), axis)
    out = fn(stacked_params, x_mb, *present)
    return out.reshape(B, L, H)
