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
    (finetune/train.py), where the same bound holds trivially;
  * activations shard over dp inside the pipeline region (each dp row
    pipelines its own batch slice — compute scales with dp); sp sharding is
    NOT propagated inside the region, and layer weights are replicated over
    tp (in_specs shard the layer dim only) — combining pp with tp *within a
    stage* would need tp specs on the per-leaf weight dims as well.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def _shard_map(fn, mesh, in_specs, out_specs):
    if hasattr(jax, "shard_map"):  # JAX >= 0.6 API
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    from jax.experimental.shard_map import shard_map

    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


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
                         dp_axis: str = "dp",
                         num_microbatches: int = 2, remat: bool = False,
                         remat_policy=None):
    """Apply a stacked transformer layer pytree as a pipeline over ``axis``.

    :param stacked_params: pytree with every leaf ``[num_layers, ...]`` (the
        ``scan_layers`` param layout under 'layers', models/layers.py).
    :param x: ``[B, L, H]`` global activations; B must divide by
        ``num_microbatches`` (and by ``num_microbatches * dp``).
    :param layer: a ``TransformerLayer``-like flax module template with
        ``scan_format=True`` (its ``apply({'params': p}, x, sin, valid, seg,
        bias)`` returns ``(x, None)``).
    :param mesh: mesh containing ``axis``; ``num_layers`` must divide by its
        size.
    :param dp_axis: data-parallel mesh axis — each microbatch's batch dim
        shards over it, so every dp row pipelines only its OWN batch slice
        (without this, dp rows would all-gather the global batch at the
        shard_map boundary and redundantly compute all of it — correct but
        zero compute scaling). sp is NOT propagated inside the pipeline
        region; activations there shard over dp only.
    :return: ``[B, L, H]`` outputs, numerically identical to applying the
        layers sequentially.
    """
    S = mesh.shape[axis]
    B, L, H = x.shape
    M = num_microbatches
    assert B % M == 0, f"batch {B} not divisible by {M} microbatches"
    num_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    assert num_layers % S == 0, f"{num_layers} layers over {S} stages"

    dp = dp_axis if dp_axis in mesh.shape else None
    if dp is not None and (B // M) % mesh.shape[dp] != 0:
        dp = None  # microbatch not divisible by dp: fall back to replicated

    def mb(t):
        return None if t is None else t.reshape((M, B // M) + t.shape[1:])

    mb_args = tuple(mb(t) for t in (sinusoids, is_valid, segment_ids,
                                    attention_bias))
    x_mb = mb(x)

    param_specs = jax.tree.map(lambda _: P(axis), stacked_params)
    act_spec = P(None, dp)  # [M, B/M, ...]: batch dim over dp
    arg_specs = tuple(None if a is None else act_spec for a in mb_args)
    present = [a for a in mb_args if a is not None]
    in_specs = (param_specs, act_spec) + tuple(
        s for s in arg_specs if s is not None)
    # Known inefficiency when combining sp with pp: activations arrive
    # seq-sharded and the shard_map boundary's conversion to the pipeline's
    # dp-sharded layout makes GSPMD replicate-then-partition ("involuntary
    # full rematerialization" warning; XLA bug b/433785288, to be fixed by
    # the Shardy partitioner). Correctness is unaffected; sp+pp layouts pay
    # one extra activation copy per step until then.

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
            y = run_local(inp, tuple(idx(a) for a in args_mb))

            write = (m >= 0) & (m < M) & (stage == S - 1)
            upd = lax.dynamic_update_index_in_dim(
                outputs, y.astype(outputs.dtype), mc, 0)
            outputs = jnp.where(write, upd, outputs)
            state = lax.ppermute(y, axis, [(i, (i + 1) % S) for i in range(S)])
            return (state, outputs), None

        state0 = _pvary(jnp.zeros_like(x_mb[0]), axis)
        outputs0 = _pvary(jnp.zeros_like(x_mb), axis)
        (state, outputs), _ = lax.scan(tick, (state0, outputs0),
                                       jnp.arange(T))
        # outputs live on the last stage; replicate for the P() out_spec
        outputs = lax.psum(
            jnp.where(stage == S - 1, outputs, jnp.zeros_like(outputs)), axis)
        return outputs

    fn = _shard_map(stage_fn, mesh, in_specs, act_spec)
    out = fn(stacked_params, x_mb, *present)
    return out.reshape(B, L, H)
