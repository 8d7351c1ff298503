"""Forward-parity of the transformer stack against the reference, and —
critically — *param-tree compatibility*: my modules are applied with params
initialized by the reference modules, which is exactly what loading a
gs://merlotreserve checkpoint requires.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merlot_reserve_tpu.models import layers as L
from merlot_reserve_tpu.models import towers as T

ATOL = 2e-5


def _tree_paths(tree):
    return {"/".join(str(getattr(k, "key", k)) for k in path)
            for path, _ in jax.tree_util.tree_flatten_with_path(tree)[0]}


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0)


def test_kernel_init_matches(reference_modeling):
    key = jax.random.PRNGKey(7)
    for shape in [(768, 3072), (3072, 768), (768, 36, 64), (12, 64, 768), (1024, 4096)]:
        ours = np.asarray(L.kernel_init(key, shape))
        ref = np.asarray(reference_modeling.kernel_init(key, shape))
        np.testing.assert_allclose(ours, ref, atol=0)


def test_gelu_matches(reference_modeling):
    x = jnp.linspace(-5, 5, 101)
    np.testing.assert_allclose(
        np.asarray(L.my_gelu(x)), np.asarray(reference_modeling.my_gelu(x)), atol=1e-7)


def test_transformer_encoder_parity(reference_modeling, rng):
    """Encoder with CLS + rotary + is_valid: reference params drive my module."""
    H, layers_n = 64, 2
    B, seq = 2, 9

    ref_mod = reference_modeling.TransformerEncoder(
        hidden_size=H, num_layers=layers_n, add_cls_token=True, size_per_head=32)
    my_mod = L.TransformerEncoder(
        hidden_size=H, num_layers=layers_n, add_cls_token=True, size_per_head=32,
        attention_impl="xla")

    x = jnp.asarray(rng.randn(B, seq, H).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1, 1, (B, seq, 1)).astype(np.float32))
    is_valid = jnp.asarray(rng.rand(B, seq) > 0.2)

    params = ref_mod.init(jax.random.PRNGKey(0), x, rotary_coords=coords, is_valid=is_valid)
    out_ref = ref_mod.apply(params, x, rotary_coords=coords, is_valid=is_valid)
    out_mine = my_mod.apply(params, x, rotary_coords=coords, is_valid=is_valid)

    assert _tree_paths(my_mod.init(jax.random.PRNGKey(0), x, rotary_coords=coords,
                                   is_valid=is_valid)) == _tree_paths(params)
    np.testing.assert_allclose(np.asarray(out_mine["cls"]), np.asarray(out_ref["cls"]),
                               atol=ATOL)
    np.testing.assert_allclose(np.asarray(out_mine["seq"]), np.asarray(out_ref["seq"]),
                               atol=ATOL)


def test_transformer_encoder_learned_pe(reference_modeling, rng):
    """No rotary -> learned positional embedding fallback."""
    H = 64
    ref_mod = reference_modeling.TransformerEncoder(hidden_size=H, num_layers=1,
                                                    size_per_head=32)
    my_mod = L.TransformerEncoder(hidden_size=H, num_layers=1, size_per_head=32,
                                  attention_impl="xla")
    x = jnp.asarray(rng.randn(2, 7, H).astype(np.float32))
    params = ref_mod.init(jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(
        np.asarray(my_mod.apply(params, x)["seq"]),
        np.asarray(ref_mod.apply(params, x)["seq"]), atol=ATOL)


def test_vision_transformer_parity(reference_modeling, rng):
    grid_h, grid_w, H = 6, 10, 64
    ref_mod = reference_modeling.VisionTransformer(
        hidden_size=H, num_layers=2, output_grid_h=grid_h, output_grid_w=grid_w,
        size_per_head=32)
    my_mod = T.VisionTransformer(
        hidden_size=H, num_layers=2, output_grid_h=grid_h, output_grid_w=grid_w,
        size_per_head=32, attention_impl="xla")

    x = jnp.asarray(rng.randn(2, grid_h * grid_w, 16 * 16 * 3).astype(np.float32))
    params = ref_mod.init(jax.random.PRNGKey(2), x)
    out_ref = ref_mod.apply(params, x)
    out_mine = my_mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_mine["cls"]), np.asarray(out_ref["cls"]),
                               atol=ATOL)
    np.testing.assert_allclose(np.asarray(out_mine["seq_attnpool"]),
                               np.asarray(out_ref["seq_attnpool"]), atol=ATOL)


def test_audio_transformer_parity(reference_modeling, rng):
    H = 64
    ref_mod = reference_modeling.AudioTransformer(hidden_size=H, num_layers=2,
                                                  pooling_ratio=5, size_per_head=32)
    my_mod = T.AudioTransformer(hidden_size=H, num_layers=2, pooling_ratio=5,
                                size_per_head=32, attention_impl="xla")
    x = jnp.asarray(rng.randn(3, 60, 65).astype(np.float32))
    params = ref_mod.init(jax.random.PRNGKey(3), x)
    out_ref = ref_mod.apply(params, x)
    out_mine = my_mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_mine["cls"]), np.asarray(out_ref["cls"]),
                               atol=ATOL)
    np.testing.assert_allclose(np.asarray(out_mine["seq_attnpool"]),
                               np.asarray(out_ref["seq_attnpool"]), atol=ATOL)


def test_span_transformer_parity(reference_modeling, rng):
    H = 64
    ref_mod = reference_modeling.SpanTransformer(hidden_size=H, num_layers=2,
                                                 max_len=16, size_per_head=32)
    my_mod = T.SpanTransformer(hidden_size=H, num_layers=2, max_len=16,
                               size_per_head=32, attention_impl="xla")
    x = jnp.asarray(rng.randn(4, 15, H).astype(np.float32))
    is_valid = jnp.asarray(rng.rand(4, 15) > 0.3)
    params = ref_mod.init(jax.random.PRNGKey(4), x, is_valid)
    np.testing.assert_allclose(
        np.asarray(my_mod.apply(params, x, is_valid)),
        np.asarray(ref_mod.apply(params, x, is_valid)), atol=ATOL)


def test_token_embedder_parity(reference_modeling, rng):
    ref_mod = reference_modeling.TokenEmbedder(hidden_size=32, vocab_size=128)
    my_mod = T.TokenEmbedder(hidden_size=32, vocab_size=128)
    tokens = {"a": jnp.asarray(rng.randint(0, 128, (2, 5))),
              "b": jnp.asarray(rng.randint(0, 128, (3, 7)))}
    params = ref_mod.init(jax.random.PRNGKey(5), tokens)
    out_ref = ref_mod.apply(params, tokens)
    out_mine = my_mod.apply(params, tokens)
    for k in tokens:
        np.testing.assert_allclose(np.asarray(out_mine[k]), np.asarray(out_ref[k]),
                                   atol=1e-6)


def test_one_hot_pool_parity(reference_modeling, rng):
    from merlot_reserve_tpu.ops.pooling import one_hot_pool

    B, Lx, H = 2, 11, 8
    do_pool = jnp.asarray(rng.rand(B, Lx) > 0.5)
    idx = jnp.asarray(rng.randint(0, 4, (B, Lx)))
    v = jnp.asarray(rng.randn(B, Lx, H).astype(np.float32))
    ours = one_hot_pool(do_pool, idx, v, 4)
    ref = reference_modeling.one_hot_pool(do_pool, idx, v, 4)
    np.testing.assert_allclose(np.asarray(ours["x"]), np.asarray(ref["x"]), atol=1e-6)
    ours2 = one_hot_pool(do_pool, idx, v, 4, real_bsize=1)
    ref2 = reference_modeling.one_hot_pool(do_pool, idx, v, 4, real_bsize=1)
    np.testing.assert_allclose(np.asarray(ours2["x"]), np.asarray(ref2["x"]), atol=1e-6)


def test_unit_normalize_parity(reference_modeling, rng):
    from merlot_reserve_tpu.ops.pooling import unit_normalize

    x = jnp.asarray(rng.randn(5, 16).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(unit_normalize(x)), np.asarray(reference_modeling.unit_normalize(x)),
        atol=1e-7)
