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


def test_flash_mixed_block_sizes_grid_exact():
    """Regression: bq != bk with Lp = max(bq, bk) left trailing q rows
    unprocessed (the grid covered only Lp//bq * bq rows). Padding must use
    lcm(bq, bk). This is exactly the L=640, bq=512, bk=640 shape the
    flagship joint transformer would hit with the old tuned defaults."""
    rng = np.random.RandomState(1)
    B, L, H, D = 1, 40, 2, 16
    q = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    valid = jnp.ones((B, L), bool)
    segs = jnp.zeros((B, L), jnp.int32)
    out_xla = xla_attention(q, k, v, make_attention_bias(is_valid=valid))
    for bq, bk in [(16, 40), (40, 16), (16, 24), (8, 40)]:
        out = flash_attention(q, k, v, valid, segs, bq, bk, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_xla),
                                   atol=1e-5, err_msg=f"bq={bq} bk={bk}")


def test_attention_impl_string_blocks():
    """'flash:BQ:BK' impl strings parse and run; auto block picker divides."""
    from merlot_reserve_tpu.ops.attention import _auto_block, attention

    assert _auto_block(640, 512) == 128
    assert _auto_block(640, 1024) == 640
    assert _auto_block(8192, 512) == 512
    assert _auto_block(8192, 1024) == 1024
    assert _auto_block(768, 512) == 384

    rng = np.random.RandomState(2)
    B, L, H, D = 1, 32, 2, 16
    q = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    valid = jnp.ones((B, L), bool)
    out = attention(q, k, v, is_valid=valid, impl="flash:16:16", interpret=True)
    ref = attention(q, k, v, is_valid=valid, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_joint_flash_impl_matches_xla_end_to_end():
    """joint_attention_impl='flash:BQ:BK' swaps the joint transformer onto
    the Pallas kernel (interpret mode here): full 4-stream pretrainer loss
    AND grads must match the XLA path — the memory-headroom training
    configuration is numerically free."""
    import merlot_reserve_tpu as mr
    import merlot_reserve_tpu.ops.attention as attn_ops
    from merlot_reserve_tpu.data.dummy import make_dummy_batch
    from merlot_reserve_tpu.models import MerlotReservePretrainer
    from merlot_reserve_tpu.models.pretrainer import loss_fn_given_preds

    def build(joint_impl):
        cfg = mr.load_config(
            "base", hidden_size=64, joint_num_layers=2, vit_num_layers=2,
            audio_num_layers=2, span_num_layers=2, size_per_head=32,
            output_grid=(4, 4), use_bfloat16=False,
            joint_attention_impl=joint_impl)
        return cfg.replace_data(num_segments=4, num_segment_groups=2,
                                seq_len=80, lang_seq_len=40,
                                num_text_spans_to_include=8)

    cfg = build(None)
    model = MerlotReservePretrainer.from_config(cfg)
    batch = make_dummy_batch(cfg, batch_size=2, seed=0, num_text_spans=16)
    params = model.init_params(batch)
    bd = {k: jnp.asarray(v) for k, v in batch.items()}

    def loss_fn(m):
        return lambda p: loss_fn_given_preds(m.apply({"params": p}, bd))[0]

    l_ref, g_ref = jax.value_and_grad(loss_fn(model))(params)

    flash_model = MerlotReservePretrainer.from_config(build("flash:16:16"))
    attn_ops._FORCE_INTERPRET = True
    try:
        l_fl, g_fl = jax.value_and_grad(loss_fn(flash_model))(params)
    finally:
        attn_ops._FORCE_INTERPRET = False

    assert abs(float(l_ref) - float(l_fl)) < 1e-4, (l_ref, l_fl)
    worst = max(jax.tree_util.tree_leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), g_ref, g_fl)))
    assert worst < 2e-3, worst


def test_flash_rejects_cross_attention_lengths():
    """Lq != Lk through the flash path must error, not silently apply
    q-side labels/padding to K/V (diverged 0.36 from the XLA oracle before
    the guard)."""
    from merlot_reserve_tpu.ops.attention import attention

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, 256, 2, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 384, 2, 8).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 384, 2, 8).astype(np.float32))
    with pytest.raises(AssertionError, match="Lq == Lk"):
        attention(q, k, v, impl="flash", interpret=True)
    # the xla path handles cross lengths
    out = attention(q, k, v, impl="xla")
    assert out.shape == (1, 256, 2, 8)


def test_sequence_parallel_impl_string_validation(cpu_devices):
    """Typos in ring/ulysses impl strings must raise, not silently fall
    back to dense attention; a bare axis token is accepted as shorthand."""
    from merlot_reserve_tpu.ops.attention import attention
    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.parallel.mesh import activate_mesh

    rng = np.random.RandomState(1)
    q, k, v = (jnp.asarray(rng.randn(1, 64, 2, 8).astype(np.float32))
               for _ in range(3))
    mesh = make_mesh(dp=1, sp=4, devices=cpu_devices[:4])
    with activate_mesh(mesh):
        with pytest.raises(AssertionError, match="unknown ring inner"):
            attention(q, k, v, impl="ring:flsh:sp")
        with pytest.raises(AssertionError, match="not in mesh axes"):
            attention(q, k, v, impl="ulysses:xla:nope")
        # axis shorthand: 'ring:tp' = lax ring over the (size-1) tp axis
        # -> dense fallback, same result as xla
        out_tp = attention(q, k, v, impl="ring:tp")
        out_ref = attention(q, k, v, impl="xla")
        np.testing.assert_allclose(np.asarray(out_tp), np.asarray(out_ref),
                                   atol=2e-5)
