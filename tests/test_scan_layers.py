"""scan_layers=True must be numerically identical to the unrolled encoder, and
the stack/unstack converters must round-trip the reference's layer_NN layout."""

import jax
import jax.numpy as jnp
import numpy as np

from merlot_reserve_tpu.models.layers import TransformerEncoder
from merlot_reserve_tpu.utils.checkpoint import stack_layer_params, unstack_layer_params


def _setup(scan, unroll=1):
    return TransformerEncoder(hidden_size=64, num_layers=3, size_per_head=32,
                              add_cls_token=True, attention_impl="xla",
                              scan_layers=scan, scan_unroll=unroll)


def test_scan_matches_unrolled():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 9, 64).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1, 1, (2, 9, 1)).astype(np.float32))
    is_valid = jnp.asarray(rng.rand(2, 9) > 0.2)

    unrolled = _setup(scan=False)
    scanned = _setup(scan=True)

    p_unrolled = unrolled.init(jax.random.PRNGKey(0), x, rotary_coords=coords,
                               is_valid=is_valid)
    p_scanned = {"params": stack_layer_params(p_unrolled["params"])}

    out_u = unrolled.apply(p_unrolled, x, rotary_coords=coords, is_valid=is_valid)
    out_s = scanned.apply(p_scanned, x, rotary_coords=coords, is_valid=is_valid)
    np.testing.assert_allclose(np.asarray(out_s["seq"]), np.asarray(out_u["seq"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_s["cls"]), np.asarray(out_u["cls"]),
                               atol=1e-5)


def test_scan_unroll_matches_scan():
    """Partial unrolling (scan_unroll=3 over 3 layers) is a compile-time
    schedule knob: same stacked param layout, identical numerics."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 9, 64).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1, 1, (2, 9, 1)).astype(np.float32))

    scanned = _setup(scan=True)
    unrolled3 = _setup(scan=True, unroll=3)
    params = scanned.init(jax.random.PRNGKey(0), x, rotary_coords=coords)
    out1 = scanned.apply(params, x, rotary_coords=coords)
    out3 = unrolled3.apply(params, x, rotary_coords=coords)
    np.testing.assert_allclose(np.asarray(out1["seq"]), np.asarray(out3["seq"]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out1["cls"]), np.asarray(out3["cls"]),
                               atol=1e-6)


def test_stack_unstack_roundtrip():
    rng = np.random.RandomState(1)
    f32 = lambda *s: rng.randn(*s).astype(np.float32)
    tree = {
        "transformer": {
            "layer_00": {"w": f32(4, 4), "b": f32(4)},
            "layer_01": {"w": f32(4, 4), "b": f32(4)},
            "pre_ln": {"scale": f32(4)},
        },
        "head": {"kernel": f32(4, 4)},
    }
    stacked = stack_layer_params(tree)
    assert stacked["transformer"]["layers"]["w"].shape == (2, 4, 4)
    back = unstack_layer_params(stacked)
    for lk in ["layer_00", "layer_01"]:
        np.testing.assert_array_equal(np.asarray(back["transformer"][lk]["w"]),
                                      tree["transformer"][lk]["w"])
    np.testing.assert_array_equal(np.asarray(back["head"]["kernel"]),
                                  tree["head"]["kernel"])


def test_scan_init_shapes():
    scanned = _setup(scan=True)
    x = jnp.zeros((1, 9, 64))
    params = scanned.init(jax.random.PRNGKey(0), x,
                          rotary_coords=jnp.zeros((1, 9, 1)))
    qkv = params["params"]["layers"]["attention_layer"]["qkv"]["kernel"]
    assert qkv.shape[0] == 3  # stacked layer axis
