"""Sharding rules: ZeRO-1 opt-state placement, tp param specs, batch specs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

import merlot_reserve_tpu as mr
from merlot_reserve_tpu.data.dummy import make_dummy_batch
from merlot_reserve_tpu.models import MerlotReservePretrainer
from merlot_reserve_tpu.parallel import make_mesh


def test_make_mesh_dcn_arg(cpu_devices):
    import pytest as _pytest

    # dcn_dp=1 (or None) is the plain single-slice path
    m = make_mesh(dp=4, tp=2, devices=cpu_devices[:8], dcn_dp=1)
    assert dict(m.shape) == {"dcn": 1, "dp": 4, "sp": 1, "pp": 1, "tp": 2}
    # dp must split evenly across slices
    with _pytest.raises(AssertionError):
        make_mesh(dp=4, tp=2, devices=cpu_devices[:8], dcn_dp=3)
    # dcn_dp>1 builds a real mesh on virtual devices too (no slice_index
    # attribute -> contiguous-reshape fallback) and stays executable
    m2 = make_mesh(dp=4, tp=2, devices=cpu_devices[:8], dcn_dp=2)
    assert dict(m2.shape) == {"dcn": 2, "dp": 2, "sp": 1, "pp": 1, "tp": 2}
    x = jax.device_put(np.arange(8, dtype=np.float32),
                       jax.sharding.NamedSharding(m2, P("dp")))
    assert float(jnp.sum(x)) == 28.0
from merlot_reserve_tpu.parallel.sharding import (
    batch_sharding,
    opt_state_shardings,
    param_shardings,
)
from merlot_reserve_tpu.training.optimization import construct_train_state


@pytest.fixture(scope="module")
def small_state():
    cfg = mr.load_config("base", hidden_size=64, joint_num_layers=2,
                         vit_num_layers=2, audio_num_layers=2, span_num_layers=2,
                         size_per_head=32, output_grid=(4, 4), use_bfloat16=False)
    cfg = cfg.replace_data(num_segments=4, num_segment_groups=2, seq_len=80,
                           lang_seq_len=40, num_text_spans_to_include=8)
    model = MerlotReservePretrainer.from_config(cfg)
    batch = make_dummy_batch(cfg, batch_size=2, seed=0, num_text_spans=16)
    params = model.init_params(batch)
    return construct_train_state(cfg.optimizer, model, params)


def test_zero1_moments_sharded(small_state, cpu_devices):
    mesh = make_mesh(dp=8, tp=1, devices=cpu_devices[:8])
    shardings = opt_state_shardings(mesh, small_state.opt_state, zero1=True)
    mu_shardings = jax.tree_util.tree_leaves(
        shardings[0].mu if hasattr(shardings[0], "mu") else shardings[0][1])
    # every moment leaf with a dim divisible by 8 must be dp-sharded
    mu_leaves = jax.tree_util.tree_leaves(small_state.opt_state[0].mu)
    n_sharded = 0
    for leaf, sh in zip(mu_leaves, mu_shardings):
        spec = sh.spec
        if any(d % 8 == 0 and d >= 8 for d in leaf.shape):
            assert "dp" in tuple(spec), (leaf.shape, spec)
            n_sharded += 1
    assert n_sharded > 0


def test_zero1_master_params_sharded(small_state, cpu_devices):
    """ZeRO-1 state layout: f32 master params shard over dp alongside the
    moments (the step consumes a gathered bf16 cast — see
    constrain_params_for_use); inference placement stays replicated."""
    from merlot_reserve_tpu.parallel.sharding import state_shardings

    mesh = make_mesh(dp=8, tp=1, devices=cpu_devices[:8])
    sh = state_shardings(mesh, small_state, zero1=True)
    p_leaves = jax.tree_util.tree_leaves(small_state.params)
    s_leaves = jax.tree_util.tree_leaves(sh.params)
    n_sharded = 0
    for leaf, s in zip(p_leaves, s_leaves):
        if any(d % 8 == 0 and d >= 8 for d in leaf.shape):
            assert "dp" in tuple(s.spec), (leaf.shape, s.spec)
            n_sharded += 1
    assert n_sharded > 0
    # param/moment specs agree leaf-for-leaf -> the optimizer update is
    # fully shard-local (no resharding between grads, moments and params)
    mu_shardings = jax.tree_util.tree_leaves(
        state_shardings(mesh, small_state, zero1=True).opt_state[0].mu)
    for s, m in zip(s_leaves, mu_shardings):
        assert s.spec == m.spec, (s.spec, m.spec)
    # the default (inference) placement is untouched: replicated
    repl = jax.tree_util.tree_leaves(param_shardings(mesh, small_state.params))
    assert all("dp" not in tuple(s.spec) for s in repl)


def test_constrain_params_for_use_removes_dp(small_state, cpu_devices):
    """Inside an activated mesh the in-step copy is pinned to compute
    sharding (replicated here, dp=8 tp=1); without a mesh it's a no-op."""
    from merlot_reserve_tpu.parallel.mesh import activate_mesh
    from merlot_reserve_tpu.parallel.sharding import (constrain_params_for_use,
                                                      state_shardings)

    mesh = make_mesh(dp=8, tp=1, devices=cpu_devices[:8])
    sh = state_shardings(mesh, small_state, zero1=True)
    placed = jax.device_put(small_state.params, sh.params)

    def fn(p):
        p = constrain_params_for_use(p)
        return jax.tree_util.tree_leaves(p)[0]

    with activate_mesh(mesh):
        out = jax.jit(fn)(placed)
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(jax.tree_util.tree_leaves(small_state.params)[0]))
    # no-op path: no active mesh
    same = constrain_params_for_use(small_state.params)
    assert jax.tree_util.tree_leaves(same)[0] is \
        jax.tree_util.tree_leaves(small_state.params)[0]


def test_param_tp_rules(small_state, cpu_devices):
    mesh = make_mesh(dp=4, tp=2, devices=cpu_devices[:8])
    shardings = param_shardings(mesh, small_state.params)
    flat, _ = jax.tree_util.tree_flatten_with_path(shardings)
    by_path = {"/".join(str(getattr(k, "key", k)) for k in p): s for p, s in flat}
    mlp_up = [s for p, s in by_path.items() if p.endswith("intermediate/kernel")]
    assert mlp_up and all("tp" in tuple(s.spec) for s in mlp_up)
    ln = [s for p, s in by_path.items() if "pre_attn_ln/scale" in p]
    assert ln and all(s.spec == P() for s in ln)


def test_batch_sharding_placement(cpu_devices):
    mesh = make_mesh(dp=8, tp=1, devices=cpu_devices[:8])
    sh = batch_sharding(mesh)
    x = jax.device_put(np.zeros((16, 4)), sh)
    assert len(x.addressable_shards) == 8
    assert x.addressable_shards[0].data.shape == (2, 4)


def test_form_global_batch_single_process(cpu_devices):
    """Single-process: form_global_batch == sharded device_put, passes
    jax.Arrays through, and the result feeds a dp-sharded jit directly."""
    from merlot_reserve_tpu.parallel.sharding import form_global_batch

    mesh = make_mesh(dp=8, tp=1, devices=cpu_devices[:8])
    batch = {
        "tokens": np.arange(32, dtype=np.int32).reshape(8, 4),
        "images": np.ones((16, 3), np.float32),  # flattened example-major leaf
    }
    g = form_global_batch(mesh, batch)
    for k, v in g.items():
        assert isinstance(v, jax.Array)
        assert v.sharding == batch_sharding(mesh)
        np.testing.assert_array_equal(np.asarray(v), batch[k])
    # device-builder output (already a jax.Array) passes through untouched
    pre = jax.device_put(np.zeros((8, 2)), batch_sharding(mesh))
    g2 = form_global_batch(mesh, {"x": pre})
    assert g2["x"] is pre
    out = jax.jit(lambda b: b["tokens"].sum(),
                  in_shardings=(batch_sharding(mesh),))({"tokens": g["tokens"]})
    assert int(out) == int(batch["tokens"].sum())
