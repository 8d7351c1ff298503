"""Gradient checkpointing (remat) through scan and unrolled encoders."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merlot_reserve_tpu.models.layers import TransformerEncoder


@pytest.mark.parametrize("scan", [False, True])
def test_remat_grads_match(scan):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 9, 64).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1, 1, (2, 9, 1)).astype(np.float32))

    plain = TransformerEncoder(hidden_size=64, num_layers=2, size_per_head=32,
                               scan_layers=scan, remat=False)
    ckpt = TransformerEncoder(hidden_size=64, num_layers=2, size_per_head=32,
                              scan_layers=scan, remat=True)
    params = plain.init(jax.random.PRNGKey(0), x, rotary_coords=coords)

    def loss(module, p, x_):
        return (module.apply(p, x_, rotary_coords=coords)["seq"] ** 2).sum()

    g_plain = jax.grad(lambda p, x_: loss(plain, p, x_), argnums=1)(params, x)
    g_ckpt = jax.grad(lambda p, x_: loss(ckpt, p, x_), argnums=1)(params, x)
    np.testing.assert_allclose(np.asarray(g_ckpt), np.asarray(g_plain), atol=1e-5)
