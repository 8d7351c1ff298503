"""The pjit training loop core.

One jit'd ``train_step`` over the global mesh replaces the reference's
pmap + explicit collectives (/root/reference/pretrain/pretrain_model.py:306-340,
pretrain/train.py:106-145):

  * grads need no explicit pmean — the loss is a global mean, so XLA emits
    the psum over dp as part of backward;
  * contrastive negatives need no explicit all_gather (see pretrainer.py);
  * ZeRO-1 falls out of opt-state out_shardings;
  * buffers are donated so params/opt-state update in place.

bf16 grad flow matches the reference: the forward/backward runs on bf16-cast
params and grads are cast up only after the (implicit) cross-chip reduction.
"""

from __future__ import annotations

import functools
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from merlot_reserve_tpu.models.pretrainer import loss_fn_given_preds
from merlot_reserve_tpu.parallel.mesh import activate_mesh
from merlot_reserve_tpu.parallel.sharding import (batch_sharding,
                                                  constrain_params_for_use,
                                                  state_shardings)
from merlot_reserve_tpu.utils.checkpoint import bf16_to_f32, f32_to_bf16


def _grad_and_update(state, loss_fn, use_bfloat16_grads: bool):
    """value_and_grad -> nan_to_num -> apply_gradients; the shared core of
    every step variant.

    Differentiation is rooted at the STORED params (ZeRO-1-sharded f32
    masters under a mesh, parallel/sharding.py), with the bf16 cast and the
    compute-sharding constraint INSIDE the differentiated function: the
    forward's param all-gather then moves bf16, its backward is the matching
    bf16 reduce-scatter onto each chip's own shard, and the cast-up to f32
    is the cast's backward — shard-local, AFTER the wire reduction, i.e.
    the reference's bf16 grad-flow semantics (finetune/optimization.py
    cast-up-after-pmean) with GSPMD placing the collectives."""

    def _cast_then_loss(params):
        if use_bfloat16_grads:
            params = f32_to_bf16(params)
        params = constrain_params_for_use(params)
        return loss_fn(params)

    (_, loss_info), grads = jax.value_and_grad(_cast_then_loss, has_aux=True)(
        state.params)
    grads = jax.tree.map(lambda x: jnp.nan_to_num(x, copy=False), grads)
    loss_info = bf16_to_f32(loss_info)
    return state.apply_gradients(grads=grads), loss_info


def train_step(state, batch, use_bfloat16_grads: bool = True):
    """One pretraining step (global-batch semantics under jit)."""

    def _loss_fn(params):
        return loss_fn_given_preds(state.apply_fn({"params": params}, batch))

    return _grad_and_update(state, _loss_fn, use_bfloat16_grads)


def make_jit_train_step(mesh: Mesh, state, step_fn: Callable = train_step,
                        zero1: bool = True, donate: bool = True):
    """jit ``step_fn`` with explicit state/batch shardings over ``mesh``.

    Returns (jitted_fn, sharded_state): the input state is placed according to
    the sharding plan (params replicated mod tp; Adam moments dim-0 sharded
    over dp when zero1).
    """
    s_shardings = state_shardings(mesh, state, zero1=zero1)
    b_sharding = batch_sharding(mesh)

    state = jax.device_put(state, s_shardings)

    jitted = jax.jit(
        step_fn,
        in_shardings=(s_shardings, b_sharding),
        out_shardings=(s_shardings, NamedSharding(mesh, P())),
        donate_argnums=(0,) if donate else (),
        static_argnums=(2,) if step_fn is train_step else (),
    )

    @functools.wraps(jitted)
    def with_mesh(*args, **kwargs):
        # trace/execute under the ambient mesh so in-model sharding
        # constraints (seq_shard_axis) and the pipeline shard_map
        # (pipeline_axis) resolve their named axes
        with activate_mesh(mesh):
            return jitted(*args, **kwargs)

    return with_mesh, state


def make_jit_mixed_res_train_step(mesh: Mesh, state, apply_b: Callable,
                                  zero1: bool = True, donate: bool = True,
                                  use_bfloat16_grads: bool = True):
    """Two-resolution pretraining step as ONE SPMD program — the
    resolution-adaptation (fixres) redesign.

    The reference adapts resolution by giving each HOST a different grid
    (``res = possible_res[process_index % 2]``,
    /root/reference/pretrain/train_fixres.py:78-81). That is legal under
    per-host pmap — each host compiles its own shapes and only the
    grad-pmean and the contrastive all_gather cross hosts — but impossible
    under a global-mesh jit, where every process must execute the same
    program over the same global shapes. The GSPMD-native equivalent: every
    step carries BOTH grids, half the global batch each. ``state.apply_fn``
    runs grid A's forward on ``batch_a``, ``apply_b`` (a second
    ``MerlotReservePretrainer`` built at grid B, sharing the
    resolution-independent params — rotary, not learned PE) runs grid B's
    on ``batch_b``, and the two preds trees are concatenated along dim 0
    before :func:`loss_fn_given_preds`. The InfoNCE denominators therefore
    span both resolutions — exactly the reference's semantics, where the
    negatives all_gather (pretrain_model.py:290) mixes per-host batches of
    different grids. Span selection / content-keyed augmentation stay
    per-half, matching the reference's per-device behavior.

    Compute per step equals the single-grid step at the same global batch
    (each half is half the batch at its own seq_len), so the schedule and
    step count carry over from the reference recipe unchanged.

    The two halves MUST carry disjoint data (scripts/pretrain_fixres.py
    shards files 2*num_hosts ways and seeds the loaders apart): feeding the
    same example stream to both grids would put each row's exact positive
    — same span tokens, bitwise-identical span embedding — into the other
    half's InfoNCE denominator, flooring the loss near log 2 and actively
    pushing identical positives apart.
    """
    s_shardings = state_shardings(mesh, state, zero1=zero1)
    b_sharding = batch_sharding(mesh)
    state = jax.device_put(state, s_shardings)

    def mixed_step(state, batch_a, batch_b):
        def _loss_fn(params):
            preds_a = state.apply_fn({"params": params}, batch_a)
            preds_b = apply_b({"params": params}, batch_b)
            preds = jax.tree.map(
                lambda a, b: jnp.concatenate([a, b], axis=0),
                preds_a, preds_b)
            return loss_fn_given_preds(preds)

        return _grad_and_update(state, _loss_fn, use_bfloat16_grads)

    jitted = jax.jit(
        mixed_step,
        in_shardings=(s_shardings, b_sharding, b_sharding),
        out_shardings=(s_shardings, NamedSharding(mesh, P())),
        donate_argnums=(0,) if donate else (),
    )

    @functools.wraps(jitted)
    def with_mesh(*args, **kwargs):
        with activate_mesh(mesh):
            return jitted(*args, **kwargs)

    return with_mesh, state


def make_jit_fused_data_train_step(mesh: Mesh, state, builder,
                                   data_seed: int = 0, zero1: bool = True,
                                   donate: bool = True,
                                   use_bfloat16_grads: bool = True):
    """ONE jit from raw byte-decoded arrays to the updated state: on-device
    example assembly (data/device_builder.py ``build_batch``) composed with
    :func:`train_step`, so a full training step — masking, placement,
    collation, forward, backward, optimizer — is a single device dispatch
    and the assembled batch never crosses a program boundary (the
    reference's whole assembly runs on host tf.data instead,
    /root/reference/pretrain/dataloader.py:449-712).

    The mask PRNG is folded from ``state.step`` INSIDE the graph: fresh
    masks every step, deterministic given ``data_seed``, and stable across
    preemption resume (the two-dispatch DevicePretrainLoader path re-counts
    its batch counter from 0 on resume instead).

    The raw batch is the flat dict from ``DeviceExampleBuilder.host_prepare``
    stacked batch-major (``stack_raw_examples``) plus ``images``
    [B, S*hw, 768] float32 decoded host-side (JPEG decode is the one stage
    that stays on host). Use ``DevicePretrainLoader(fused=True)`` to get
    exactly this dict per batch.
    """
    s_shardings = state_shardings(mesh, state, zero1=zero1)
    b_sharding = batch_sharding(mesh)
    state = jax.device_put(state, s_shardings)

    def fused(state, raw):
        raw = dict(raw)
        # host-decoded patches ride along as "images"; with on-device
        # frames (cfg.data.on_device_frames) raw carries "frames_u8"/
        # "frame_hw" instead and build_batch assembles images in-graph
        images = raw.pop("images", None)
        key = jax.random.fold_in(jax.random.PRNGKey(data_seed),
                                 state.step.astype(jnp.uint32))
        batch = dict(builder.build_batch(key, raw))
        if images is not None:
            if builder.cfg.model.use_bfloat16:
                images = images.astype(jnp.bfloat16)
            batch["images"] = images
        return train_step(state, batch, use_bfloat16_grads)

    jitted = jax.jit(
        fused,
        in_shardings=(s_shardings, b_sharding),
        out_shardings=(s_shardings, NamedSharding(mesh, P())),
        donate_argnums=(0,) if donate else (),
    )

    @functools.wraps(jitted)
    def with_mesh(*args, **kwargs):
        with activate_mesh(mesh):
            return jitted(*args, **kwargs)

    return with_mesh, state


class MetricsQueue:
    """Async metrics: device->host copies start immediately, floats materialize
    ``delay`` steps later so logging never blocks the device (the reference's
    copy_to_host_async pattern, train.py:119-129)."""

    def __init__(self, delay: int = 50):
        self.delay = delay
        self._queue = []

    def push(self, step: int, metrics: Dict[str, Any]):
        metrics = jax.tree.map(lambda x: x, metrics)
        for leaf in jax.tree_util.tree_leaves(metrics):
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()
        self._queue.append((step, metrics))
        # pop once the queue exceeds `delay` pending entries, so a metric
        # materializes exactly `delay` pushes after its own (delay=0 =>
        # synchronous)
        if len(self._queue) > max(self.delay, 0):
            return self.pop()
        return None

    def pop(self) -> Optional[Tuple[int, Dict[str, float]]]:
        if not self._queue:
            return None
        step, metrics = self._queue.pop(0)
        return step, jax.tree.map(lambda x: float(jax.device_get(x)), metrics)

    def drain(self):
        while self._queue:
            yield self.pop()
