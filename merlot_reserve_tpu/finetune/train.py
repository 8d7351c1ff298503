"""Finetuning train step with optional gradient accumulation.

The jit/mesh counterpart of /root/reference/finetune/optimization.py:106-191:
bf16 grads, nan_to_num, optional lax.scan microbatching; the reference's
hand-rolled 8-way optimizer-state sharding + grouped all_gather is replaced
by ZeRO-1 sharding specs (parallel/sharding.py), and pmean by global-mean
loss semantics under jit.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from merlot_reserve_tpu.parallel.sharding import (batch_sharding,
                                                  constrain_params_for_use,
                                                  state_shardings)
from merlot_reserve_tpu.utils.checkpoint import bf16_to_f32, f32_to_bf16


def finetune_train_step(state, batch, loss_fn: Callable, scan_minibatch: bool = False,
                        use_bfloat16_grads: bool = True):
    """One step. ``loss_fn(state, params, batch) -> (loss, metrics)``.

    Unlike the pretrain step, differentiation roots at the bf16 COPY (cast
    + compute-sharding constraint outside value_and_grad): the
    scan_minibatch path must accumulate microbatch grads in bf16 exactly as
    the reference sums them (optimization.py:125-139), so the cast-up
    happens once after accumulation. The stored masters are still
    ZeRO-1-dp-sharded f32 (state_shardings); the constraint makes the
    per-step gather move bf16."""
    params = f32_to_bf16(state.params) if use_bfloat16_grads else state.params
    params = constrain_params_for_use(params)

    def _loss(p, b):
        return loss_fn(state, p, b)

    if scan_minibatch:
        # microbatches of size 1, summed bf16 grads (optimization.py:125-139)
        bsize = jax.tree_util.tree_leaves(batch)[0].shape[0]

        def _scan_body(carry, microbatch):
            (loss_acc, info_acc, grads_acc) = carry
            (loss, info), grads = jax.value_and_grad(_loss, has_aux=True)(
                params, microbatch)
            grads = jax.tree.map(jnp.add, grads_acc, grads)
            info = jax.tree.map(jnp.add, info_acc, info)
            return (loss_acc + loss, info, grads), None

        micro0 = jax.tree.map(lambda x: x[0, None], batch)
        (l0, i0), g0 = jax.value_and_grad(_loss, has_aux=True)(params, micro0)
        rest = jax.tree.map(lambda x: x[1:, None], batch)
        (loss, info, grads), _ = jax.lax.scan(_scan_body, (l0, i0, g0), rest)
        scale = 1.0 / bsize
        loss = loss * scale
        info = jax.tree.map(lambda x: x * scale, info)
        grads = jax.tree.map(lambda x: x * scale, grads)
    else:
        (loss, info), grads = jax.value_and_grad(_loss, has_aux=True)(params, batch)

    grads = jax.tree.map(lambda x: jnp.nan_to_num(x, copy=False), grads)
    if use_bfloat16_grads:
        grads = bf16_to_f32(grads)
    info = bf16_to_f32(info)
    new_state = state.apply_gradients(grads=grads)
    return new_state, info


def make_finetune_step(mesh: Mesh, state, loss_fn: Callable,
                       scan_minibatch: bool = False, zero1: bool = True):
    """jit finetune_train_step over the mesh; returns (step_fn, placed_state)."""
    s_shardings = state_shardings(mesh, state, zero1=zero1)
    b_sharding = batch_sharding(mesh)
    state = jax.device_put(state, s_shardings)

    fn = functools.partial(finetune_train_step, loss_fn=loss_fn,
                           scan_minibatch=scan_minibatch)
    jitted = jax.jit(fn, in_shardings=(s_shardings, b_sharding),
                     out_shardings=(s_shardings, NamedSharding(mesh, P())),
                     donate_argnums=(0,))
    return jitted, state


def make_pred_step(mesh: Mesh, state, pred_fn: Callable):
    """jit an inference function over the mesh (val epochs / leaderboards)."""
    s_shardings = state_shardings(mesh, state, zero1=False)
    b_sharding = batch_sharding(mesh)
    return jax.jit(pred_fn, in_shardings=(s_shardings, b_sharding))


def vcr_loss_fn(state, params, batch) -> Tuple[jnp.ndarray, Dict]:
    """Softmax CE per task (qa_qar_joint_finetune.py:188-195)."""
    logits = state.apply_fn({"params": params}, batch)
    log_p = jax.nn.log_softmax(logits, axis=-1)
    labels_oh = jax.nn.one_hot(batch["labels"], dtype=log_p.dtype,
                               num_classes=log_p.shape[-1])
    loss = -jnp.mean(jnp.sum(labels_oh * log_p, axis=-1))
    is_right = (jnp.argmax(log_p, -1) == batch["labels"]).astype(jnp.float32).mean()
    return loss, {"is_right": is_right, "loss": loss}


def tvqa_loss_fn(state, params, batch) -> Tuple[jnp.ndarray, Dict]:
    """CE(audio stream) + CE(text stream) (tvqa_finetune.py:277-294)."""
    logits_from_audio, logits_from_text = state.apply_fn({"params": params}, batch)
    lp_audio = jax.nn.log_softmax(logits_from_audio, axis=-1)
    lp_text = jax.nn.log_softmax(logits_from_text, axis=-1)
    labels_oh = jax.nn.one_hot(batch["labels"], dtype=lp_audio.dtype,
                               num_classes=lp_audio.shape[-1])
    loss_audio = -jnp.mean(jnp.sum(labels_oh * lp_audio, axis=-1))
    loss_text = -jnp.mean(jnp.sum(labels_oh * lp_text, axis=-1))
    loss = loss_audio + loss_text
    return loss, {
        "is_right_audio": (jnp.argmax(logits_from_audio, -1) == batch["labels"]
                           ).astype(jnp.float32).mean(),
        "is_right_text": (jnp.argmax(logits_from_text, -1) == batch["labels"]
                          ).astype(jnp.float32).mean(),
        "loss_audio": loss_audio,
        "loss_text": loss_text,
    }


def tvqa_pred_step(state, batch) -> Dict:
    """Joint prediction: softmax(audio) + softmax(text) (tvqa_finetune.py:308)."""
    logits_from_audio, logits_from_text = state.apply_fn(
        {"params": state.params}, batch)
    joint = jax.nn.softmax(logits_from_audio, -1) + jax.nn.softmax(logits_from_text, -1)
    return {
        "preds_audio": jnp.argmax(logits_from_audio, -1),
        "preds_text": jnp.argmax(logits_from_text, -1),
        "preds_joint": jnp.argmax(joint, -1),
        "logprobs_audio": jax.nn.log_softmax(logits_from_audio, -1),
        "logprobs_text": jax.nn.log_softmax(logits_from_text, -1),
    }


def vcr_pred_step(state, batch) -> Dict:
    logits = state.apply_fn({"params": state.params}, batch)
    return {"logprobs": jax.nn.log_softmax(logits, -1),
            "preds": jnp.argmax(logits, -1)}
