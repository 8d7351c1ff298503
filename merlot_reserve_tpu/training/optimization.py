"""Optimizers and schedules.

Reproduces the reference's memory-lean Adam (/root/reference/pretrain/
optimization.py:30-195): first moment stored bf16; second moment stored in a
*cube-root bf16* encoding that spends the (always-positive) sign bit as an
extra mantissa bit — a full train state is ~4 bytes/param. In the pjit world
optimizer-state sharding (the reference's hand-rolled ZeRO-1,
finetune/optimization.py:37-52) falls out of sharding specs instead
(see parallel/sharding.py).

Schedules: linear warmup -> cosine decay to final_lr_scale (pretraining) and
linear decay (finetuning), matching optimization.py:117-155.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

# one extra half-step of mantissa, signaled by the sign bit
_MISSING_PRECISION = 1 + (1 / 2 ** 9)


class ScaleByAdamState(NamedTuple):
    count: chex.Array
    mu: optax.Updates
    nu: optax.Updates


def unsigned_bfloat16_decode(v):
    """Decode the cube-root bf16 encoding back to f32 (optimization.py:38-41)."""
    v_abs = jnp.abs(v).astype(jnp.float32)
    v_abs = jax.lax.select(v >= 0, v_abs, v_abs * _MISSING_PRECISION)
    return jnp.cbrt(v_abs)


def unsigned_bfloat16_encode(v):
    """Encode a non-negative f32 as bf16 of v^3, choosing the sign that
    minimizes decode error (optimization.py:44-51)."""
    v_pow = jnp.power(v, 3)
    v_bf = v_pow.astype(jnp.bfloat16)
    v_bf32 = v_bf.astype(jnp.float32)
    err0 = jnp.abs(v_bf32 - v_pow)
    err1 = jnp.abs(v_bf32 * _MISSING_PRECISION - v_pow)
    return jax.lax.select(err0 < err1, v_bf, -v_bf)


def _bias_correction(moment, decay, count):
    bias_correction = 1 - decay ** count
    return jax.tree.map(lambda t: t / bias_correction.astype(t.dtype), moment)


def _safe_int32_increment(count):
    max_int32 = jnp.iinfo(jnp.int32).max
    return jnp.where(count < max_int32, count + 1, max_int32)


def scale_by_bfloat16_adam(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    eps_root: float = 0.0,
    use_bfloat16: bool = True,
    do_bias_correction: bool = True,
) -> optax.GradientTransformation:
    """Adam with bf16 mu and cube-root-bf16 nu (optimization.py:54-114)."""
    if not use_bfloat16:
        assert do_bias_correction
        return optax.scale_by_adam(b1, b2, eps, eps_root)

    _init = functools.partial(jnp.zeros_like, dtype=jnp.bfloat16)

    def init_fn(params):
        return ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(_init, params),
            nu=jax.tree.map(_init, params),
        )

    def _momentum_update(grad, current_m):
        return (1 - b1) * grad + b1 * current_m.astype(jnp.float32)

    def _secondorder_update(grad, current_v):
        return (1 - b2) * jnp.square(grad) + b2 * unsigned_bfloat16_decode(current_v)

    def update_fn(updates, state, params=None):
        del params
        next_m = jax.tree.map(_momentum_update, updates, state.mu)
        next_m_enc = jax.tree.map(lambda x: x.astype(jnp.bfloat16), next_m)

        next_v = jax.tree.map(_secondorder_update, updates, state.nu)
        next_v_enc = jax.tree.map(unsigned_bfloat16_encode, next_v)

        count_inc = _safe_int32_increment(state.count)
        if do_bias_correction:
            next_m = _bias_correction(next_m, b1, count_inc)
            next_v = _bias_correction(next_v, b2, count_inc)

        updates = jax.tree.map(
            lambda m, v: m / (jnp.sqrt(v + eps_root) + eps), next_m, next_v)
        return updates, ScaleByAdamState(count=count_inc, mu=next_m_enc, nu=next_v_enc)

    return optax.GradientTransformation(init_fn, update_fn)


def lr_scale_linearwarmup_cosinedecay(num_warmup_steps, num_train_steps,
                                      final_lr_scale=0.1):
    assert num_warmup_steps <= num_train_steps

    def schedule(step):
        warmup_scale = step / num_warmup_steps
        post = (step - num_warmup_steps) / (num_train_steps - num_warmup_steps + 1.0)
        post = jnp.minimum(post, 1.0)
        post = 1.0 - (1.0 - jnp.cos(jnp.pi * post)) / 2.0
        post = final_lr_scale + (1.0 - final_lr_scale) * post
        return jax.lax.select(step < num_warmup_steps, warmup_scale, post)

    return schedule


def lr_scale_linearwarmup_lineardecay(num_warmup_steps, num_train_steps):
    assert num_warmup_steps <= num_train_steps

    def schedule(step):
        warmup_scale = step / num_warmup_steps
        post = (step - num_warmup_steps) / (num_train_steps - num_warmup_steps + 1.0)
        post = 1.0 - jnp.minimum(post, 1.0)
        return jax.lax.select(step < num_warmup_steps, warmup_scale, post)

    return schedule


class SubtractOldWeightsState(NamedTuple):
    """bf16 anchor (the pretrained init) the decay pulls toward."""

    orig_params: Any


def subtract_old_weights(weight_decay: float, mask_fn=None):
    """Weight decay *toward the pretrained init* rather than zero — the
    finetuning regularizer from finetune/optimization.py:15-34.

    The anchor lives in the OPTIMIZER STATE (bf16), exactly like the
    reference's ``SubtractOldState`` — NOT in a Python closure: a closed-over
    param tree becomes ~2 bytes/param of embedded HLO constants in every
    compiled train step (hundreds of MB at base scale), which bloats
    executables and overflows compile-request limits. As state it is a
    runtime argument: donated, sharded by the ZeRO-1 specs, checkpointed."""

    def init_fn(params):
        return SubtractOldWeightsState(
            orig_params=jax.tree.map(lambda x: x.astype(jnp.bfloat16), params))

    def update_fn(updates, state, params=None):
        assert params is not None

        def _upd(u, p, a, m):
            if not m:
                return u
            return u + weight_decay * (p - a.astype(p.dtype))

        if mask_fn is not None:
            mask = mask_fn(params)
        else:
            mask = jax.tree.map(lambda x: True, params)
        updates = jax.tree.map(_upd, updates, params, state.orig_params, mask)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def construct_train_state(opt_config, model, params,
                          return_chainables: bool = False):
    """Pretraining chain: bf16-Adam -> decoupled wd (ndim>1) -> cosine schedule
    -> -lr (optimization.py:158-195)."""
    opt = scale_by_bfloat16_adam(
        b1=opt_config.beta_1,
        b2=opt_config.beta_2,
        eps=opt_config.eps,
        use_bfloat16=opt_config.use_bfloat16_adam,
        do_bias_correction=opt_config.do_bias_correction,
    )
    chainables = [
        opt,
        optax.add_decayed_weights(
            weight_decay=opt_config.weight_decay_rate,
            mask=lambda p: jax.tree.map(lambda x: x.ndim > 1, p)),
        optax.scale_by_schedule(lr_scale_linearwarmup_cosinedecay(
            num_warmup_steps=opt_config.num_warmup_steps,
            num_train_steps=opt_config.num_train_steps,
            final_lr_scale=opt_config.final_lr_scale)),
        optax.scale(-opt_config.learning_rate),
    ]
    if return_chainables:
        return chainables
    tx = optax.chain(*chainables)
    return train_state.TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def construct_finetuning_train_state(opt_config, model, params):
    """Finetuning chain: adds subtract_old_weights (decay toward the pretrained
    init, masked to ndim>1 and size>4096) and a linear-decay schedule
    (finetune/optimization.py:55-104)."""
    opt = scale_by_bfloat16_adam(
        b1=opt_config.beta_1,
        b2=opt_config.beta_2,
        eps=opt_config.eps,
        use_bfloat16=opt_config.use_bfloat16_adam,
        do_bias_correction=opt_config.do_bias_correction,
    )

    def _mask(p):
        return jax.tree.map(lambda x: (x.ndim > 1) and (x.size > 4096), p)

    chainables = [
        opt,
        subtract_old_weights(opt_config.weight_decay_rate, mask_fn=_mask),
        optax.scale_by_schedule(lr_scale_linearwarmup_lineardecay(
            num_warmup_steps=opt_config.num_warmup_steps,
            num_train_steps=opt_config.num_train_steps)),
        optax.scale(-opt_config.learning_rate),
    ]
    tx = optax.chain(*chainables)
    return train_state.TrainState.create(apply_fn=model.apply, params=params, tx=tx)
