"""Attention op: XLA path vs reference masking semantics, flash kernel
(interpret mode on CPU) vs XLA, and flash gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merlot_reserve_tpu.ops.attention import (
    flash_attention,
    make_attention_bias,
    xla_attention,
)


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.RandomState(0)
    B, L, H, D = 2, 40, 2, 16
    q = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    valid = jnp.asarray(rng.rand(B, L) > 0.2)
    segs = jnp.asarray(rng.randint(0, 2, (B, L)))
    return q, k, v, valid, segs


def test_label_mask_equals_dense_mask(qkv):
    """(is_valid, segment_ids) labels == the dense mask the reference builds."""
    q, k, v, valid, segs = qkv
    dense_mask = (valid[:, None, :] & valid[:, :, None]) & (
        segs[:, None, :] == segs[:, :, None])
    out_labels = xla_attention(q, k, v, make_attention_bias(is_valid=valid,
                                                            segment_ids=segs))
    out_dense = xla_attention(q, k, v, make_attention_bias(attention_mask=dense_mask))
    np.testing.assert_allclose(np.asarray(out_labels), np.asarray(out_dense), atol=1e-6)


def test_flash_matches_xla_interpret(qkv):
    q, k, v, valid, segs = qkv
    out_flash = flash_attention(q, k, v, valid, segs, 16, 16, True)
    out_xla = xla_attention(q, k, v, make_attention_bias(is_valid=valid,
                                                         segment_ids=segs))
    mask = np.asarray(valid)[..., None, None]
    np.testing.assert_allclose(np.asarray(out_flash) * mask,
                               np.asarray(out_xla) * mask, atol=1e-5)


def test_flash_padding_invariance(qkv):
    """Padding L up to block multiples must not change valid outputs."""
    q, k, v, valid, segs = qkv  # L=40, blocks of 16 -> pads to 48
    out = flash_attention(q, k, v, valid, segs, 16, 16, True)
    assert out.shape == q.shape
    assert np.isfinite(np.asarray(out)).all()


def test_flash_grads_match_xla(qkv):
    q, k, v, valid, segs = qkv

    def loss_flash(q_, k_, v_):
        return (flash_attention(q_, k_, v_, valid, segs, 16, 16, True) *
                np.asarray(valid)[..., None, None]).sum()

    def loss_xla(q_, k_, v_):
        bias = make_attention_bias(is_valid=valid, segment_ids=segs)
        return (xla_attention(q_, k_, v_, bias) *
                np.asarray(valid)[..., None, None]).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_reference_attention_parity(reference_modeling, qkv):
    """XLA path == the reference's dot_product_attention_weights chain."""
    q, k, v, valid, segs = qkv
    B, L, H, D = q.shape
    qkv_cat = jnp.concatenate([q, k, v], axis=-2)  # [B, L, 3H, D]

    mask = (valid[:, None, :] & valid[:, :, None])[:, None]  # [B, 1, L, L]
    bias = jnp.where(mask, 0.0, -1e10).astype(jnp.float32)
    out_ref = reference_modeling.apply_attention(qkv_cat, None, bias)
    out_mine = xla_attention(q, k, v, make_attention_bias(is_valid=valid))
    np.testing.assert_allclose(np.asarray(out_mine), np.asarray(out_ref), atol=2e-5)
