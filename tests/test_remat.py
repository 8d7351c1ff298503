"""Gradient checkpointing (remat) through scan and unrolled encoders."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merlot_reserve_tpu.models.layers import TransformerEncoder


@pytest.mark.parametrize("scan,policy", [
    (False, None),
    pytest.param(True, None, marks=pytest.mark.slow),
    pytest.param(True, "dots_saveable", marks=pytest.mark.slow)])
def test_remat_grads_match(scan, policy):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 9, 64).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1, 1, (2, 9, 1)).astype(np.float32))

    plain = TransformerEncoder(hidden_size=64, num_layers=2, size_per_head=32,
                               scan_layers=scan, remat=False)
    ckpt = TransformerEncoder(hidden_size=64, num_layers=2, size_per_head=32,
                              scan_layers=scan, remat=True,
                              remat_policy=policy)
    params = plain.init(jax.random.PRNGKey(0), x, rotary_coords=coords)

    def loss(module, p, x_):
        return (module.apply(p, x_, rotary_coords=coords)["seq"] ** 2).sum()

    g_plain = jax.grad(lambda p, x_: loss(plain, p, x_), argnums=1)(params, x)
    g_ckpt = jax.grad(lambda p, x_: loss(ckpt, p, x_), argnums=1)(params, x)
    np.testing.assert_allclose(np.asarray(g_ckpt), np.asarray(g_plain), atol=1e-5)


@pytest.mark.slow  # two extra big compiles; grads-match covers correctness
def test_remat_policy_changes_saved_residuals():
    """The policy knob must actually change WHAT is saved, not just stay
    numerically equal: XLA's buffer assignment for the grad computation
    should allocate more live temp memory with 'everything_saveable'
    (== no recompute) than with save-nothing full remat, with
    'dots_saveable' in between or equal to the larger. Uses a long
    sequence so activation residuals dominate parameter buffers."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 256, 64).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1, 1, (1, 256, 1)).astype(np.float32))

    def temp_bytes(policy):
        enc = TransformerEncoder(hidden_size=64, num_layers=4,
                                 size_per_head=32, scan_layers=True,
                                 remat=True, remat_policy=policy)
        params = enc.init(jax.random.PRNGKey(0), x, rotary_coords=coords)

        def loss(p, x_):
            return (enc.apply(p, x_, rotary_coords=coords)["seq"] ** 2).sum()

        compiled = jax.jit(jax.grad(loss)).lower(params, x).compile()
        mem = compiled.memory_analysis()
        assert mem is not None, "XLA memory analysis unavailable"
        return int(mem.temp_size_in_bytes)

    save_nothing = temp_bytes(None)
    save_dots = temp_bytes("dots_saveable")
    save_all = temp_bytes("everything_saveable")
    assert save_nothing < save_all, (save_nothing, save_all)
    assert save_nothing < save_dots <= save_all + 1, (
        save_nothing, save_dots, save_all)


def test_remat_policy_unknown_name_raises():
    from merlot_reserve_tpu.models.layers import resolve_remat_policy

    with pytest.raises(ValueError, match="remat policy"):
        resolve_remat_policy("not_a_policy")
    assert resolve_remat_policy(None) is None
    assert callable(resolve_remat_policy("dots_saveable"))


@pytest.mark.slow
def test_remat_policy_through_pretrainer_config():
    """gradient_checkpoint_policy flows config -> joint tower; losses match
    the no-remat step exactly."""
    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.data.dummy import make_dummy_batch
    from merlot_reserve_tpu.models import MerlotReservePretrainer

    kw = dict(hidden_size=64, joint_num_layers=2, vit_num_layers=2,
              audio_num_layers=2, span_num_layers=2, size_per_head=32,
              output_grid=(4, 4), use_bfloat16=False)
    cfg0 = mr.load_config("base", **kw)
    cfg0 = cfg0.replace_data(num_segments=4, seq_len=80, lang_seq_len=40,
                             num_text_spans_to_include=8)
    cfg1 = mr.load_config("base", gradient_checkpoint=True,
                          gradient_checkpoint_policy="dots_saveable", **kw)
    cfg1 = cfg1.replace_data(num_segments=4, seq_len=80, lang_seq_len=40,
                             num_text_spans_to_include=8)

    batch = make_dummy_batch(cfg0, batch_size=2, num_text_spans=16)
    m0 = MerlotReservePretrainer.from_config(cfg0)
    m1 = MerlotReservePretrainer.from_config(cfg1)
    params = m0.init_params(batch)
    # jnp leaves: the content-derived PRNG key must use JAX dtype semantics
    # (numpy's uint32 sum promotes to uint64 and is not a valid key)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    from merlot_reserve_tpu.models.pretrainer import loss_fn_given_preds

    def loss(model, p):
        return loss_fn_given_preds(model.apply({"params": p}, batch))[0]

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=2e-5), g0, g1)

    # tower remat (round 5, the long-video lever): remats the vision/audio/
    # span towers too — still grad-exact vs no-remat
    cfg2 = mr.load_config("base", gradient_checkpoint=True,
                          tower_gradient_checkpoint=True, **kw)
    cfg2 = cfg2.replace_data(num_segments=4, seq_len=80, lang_seq_len=40,
                             num_text_spans_to_include=8)
    m2 = MerlotReservePretrainer.from_config(cfg2)
    l2, g2 = jax.value_and_grad(lambda p: loss(m2, p))(params)
    np.testing.assert_allclose(float(l0), float(l2), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=2e-5), g0, g2)
