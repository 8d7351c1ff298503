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
from merlot_reserve_tpu.parallel.sharding import batch_sharding, state_shardings
from merlot_reserve_tpu.utils.checkpoint import bf16_to_f32, f32_to_bf16


def train_step(state, batch, use_bfloat16_grads: bool = True):
    """One pretraining step (global-batch semantics under jit)."""

    def _loss_fn(params):
        return loss_fn_given_preds(state.apply_fn({"params": params}, batch))

    params = state.params
    if use_bfloat16_grads:
        params = f32_to_bf16(params)

    (loss, loss_info), grads = jax.value_and_grad(_loss_fn, has_aux=True)(params)
    grads = jax.tree.map(lambda x: jnp.nan_to_num(x, copy=False), grads)
    if use_bfloat16_grads:
        grads = bf16_to_f32(grads)
    loss_info = bf16_to_f32(loss_info)
    new_state = state.apply_gradients(grads=grads)
    return new_state, loss_info


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
        images = raw.pop("images")
        key = jax.random.fold_in(jax.random.PRNGKey(data_seed),
                                 state.step.astype(jnp.uint32))
        batch = dict(builder.build_batch(key, raw))
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
        if len(self._queue) > max(self.delay, 1):
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
