"""Pipeline (pp) and sequence (sp) parallelism equivalence.

The reference has neither (SURVEY.md §2.13: pmap DP only); these are
beyond-reference capabilities of this framework. The contract is the same as
test_distributed_equivalence.py: mesh layout must not change the math —
pipelined / sequence-sharded runs reproduce the single-path outputs, losses,
and gradients exactly (f32 tolerances).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import merlot_reserve_tpu as mr
from merlot_reserve_tpu.data.dummy import make_dummy_batch
from merlot_reserve_tpu.models import MerlotReservePretrainer
from merlot_reserve_tpu.models.layers import TransformerEncoder
from merlot_reserve_tpu.parallel import activate_mesh, make_mesh
from merlot_reserve_tpu.training.optimization import construct_train_state
from merlot_reserve_tpu.training.trainer import make_jit_train_step


# ---------------------------------------------------------------------------
# encoder level: pipeline_transformer == sequential layers, fwd + grad
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def encoder_setup():
    B, L, H, NL = 4, 16, 32, 4
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, L, H).astype(np.float32))
    coords = jnp.asarray(rng.rand(B, L, 2).astype(np.float32))
    is_valid = jnp.asarray((rng.rand(B, L) > 0.1).astype(np.int32))
    seg = jnp.asarray((rng.rand(B, L) > 0.5).astype(np.int32))
    kw = dict(hidden_size=H, num_layers=NL, size_per_head=16, rotary_hsize=8,
              dtype=jnp.float32, scan_layers=True)
    enc = TransformerEncoder(**kw)
    params = enc.init(jax.random.PRNGKey(0), x, rotary_coords=coords,
                      is_valid=is_valid, segment_ids=seg)["params"]
    ref = enc.apply({"params": params}, x, rotary_coords=coords,
                    is_valid=is_valid, segment_ids=seg)["seq"]
    return kw, params, (x, coords, is_valid, seg), ref


@pytest.mark.parametrize("pp,microbatches", [(2, 2), (4, 4), (2, 1)])
def test_pipeline_encoder_forward(encoder_setup, cpu_devices, pp, microbatches):
    kw, params, (x, coords, is_valid, seg), ref = encoder_setup
    mesh = make_mesh(dp=1, pp=pp, devices=cpu_devices[:pp])
    enc_pp = TransformerEncoder(pipeline_axis="pp",
                                pipeline_microbatches=microbatches, **kw)

    def f(p, x):
        return enc_pp.apply({"params": p}, x, rotary_coords=coords,
                            is_valid=is_valid, segment_ids=seg)["seq"]

    with activate_mesh(mesh):
        out = jax.jit(f)(params, x)
    assert float(jnp.abs(out - ref).max()) < 2e-5


def test_pipeline_encoder_grads_remat(encoder_setup, cpu_devices):
    """remat inside the pipeline recomputes layers in backward — grads must
    be identical to the plain (non-pipelined, non-remat) encoder."""
    kw, params, (x, coords, is_valid, seg), _ = encoder_setup
    enc = TransformerEncoder(**kw)
    enc_pp = TransformerEncoder(pipeline_axis="pp", pipeline_microbatches=2,
                                remat=True, **kw)
    mesh = make_mesh(dp=1, pp=2, devices=cpu_devices[:2])

    def loss(module):
        def _fn(p):
            y = module.apply({"params": p}, x, rotary_coords=coords,
                             is_valid=is_valid, segment_ids=seg)["seq"]
            return (y ** 2).mean()
        return _fn

    g_ref = jax.grad(loss(enc))(params)
    with activate_mesh(mesh):
        g_pp = jax.jit(jax.grad(loss(enc_pp)))(params)
    worst = max(jax.tree_util.tree_leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), g_ref, g_pp)))
    assert worst < 2e-5, worst


def test_pipeline_encoder_grads(encoder_setup, cpu_devices):
    kw, params, (x, coords, is_valid, seg), _ = encoder_setup
    enc = TransformerEncoder(**kw)
    enc_pp = TransformerEncoder(pipeline_axis="pp", pipeline_microbatches=2, **kw)
    mesh = make_mesh(dp=1, pp=2, devices=cpu_devices[:2])

    def loss(module):
        def _fn(p):
            y = module.apply({"params": p}, x, rotary_coords=coords,
                             is_valid=is_valid, segment_ids=seg)["seq"]
            return (y ** 2).mean()
        return _fn

    g_ref = jax.grad(loss(enc))(params)
    with activate_mesh(mesh):
        g_pp = jax.jit(jax.grad(loss(enc_pp)))(params)
    worst = max(jax.tree_util.tree_leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), g_ref, g_pp)))
    assert worst < 2e-5, worst


def test_pipeline_seq_sharding_propagates_inside(encoder_setup, cpu_devices):
    """sp x pp composition (round 4): the pipeline's shard_map is
    partial-manual (only pp manual), so the caller's seq sharding is
    GSPMD-propagated INSIDE the region — the joint activations never
    materialize full-seq per device. Checked structurally: the partitioned
    HLO's local microbatch activation is [B/M, L/sp, H] and the full-seq
    [B/M, L, H] buffer is absent (before r4 the region was fully manual and
    activations replicated over sp there — the r3 support-matrix hole)."""
    kw, params, (x, coords, is_valid, seg), ref = encoder_setup
    mesh = make_mesh(dp=1, sp=2, pp=2, devices=cpu_devices[:4])
    enc_pp = TransformerEncoder(pipeline_axis="pp", pipeline_microbatches=2,
                                seq_shard_axis="sp", **kw)

    def f(p, x):
        return enc_pp.apply({"params": p}, x, rotary_coords=coords,
                            is_valid=is_valid, segment_ids=seg)["seq"]

    with activate_mesh(mesh):
        jitted = jax.jit(f)
        hlo = jitted.lower(params, x).compile().as_text()
        out = jitted(params, x)
    assert float(jnp.abs(out - ref).max()) < 2e-5
    # B=4, M=2, L=16, H=32, sp=2: local [2,8,32] present, full-seq absent
    assert "f32[2,8,32]" in hlo
    assert "f32[2,16,32]" not in hlo, (
        "full-seq microbatch activations materialized inside the pipeline "
        "region — sp propagation regressed")
    # the scan-carried 4-D outputs stream [M, B/M, L, H] must be sp-sharded
    # too (it is explicitly anchored since r5 — a zeros-initialized buffer
    # has no sharding provenance and used to escape the 3-D substring check).
    # Checked at B=8 (M=2 -> stream [2,4,L,32]) so the shape cannot collide
    # with the stacked attn_proj weights [2,2,16,32].
    x8 = jnp.concatenate([x, x])
    coords8 = jnp.concatenate([coords, coords])
    valid8 = jnp.concatenate([is_valid, is_valid])
    seg8 = jnp.concatenate([seg, seg])

    def f8(p, x):
        return enc_pp.apply({"params": p}, x, rotary_coords=coords8,
                            is_valid=valid8, segment_ids=seg8)["seq"]

    with activate_mesh(mesh):
        jitted8 = jax.jit(f8)
        hlo8 = jitted8.lower(params, x8).compile().as_text()
        out8 = jitted8(params, x8)
    assert float(jnp.abs(out8 - jnp.concatenate([ref, ref])).max()) < 2e-5
    assert "f32[2,4,8,32]" in hlo8
    assert "f32[2,4,16,32]" not in hlo8, (
        "full-seq 4-D microbatch stream buffer materialized inside the "
        "pipeline region — outputs0/state0 anchoring regressed")


def test_pipeline_tensor_parallel_inside_stage(encoder_setup, cpu_devices):
    """tp x pp composition (round 4): stacked layer params carry Megatron tp
    specs on their non-stacked dims (P("pp", ...tp...), _pp_spec_for) which
    flow into the partial-manual pipeline region as auto axes — each stage's
    layer matmuls run tensor-parallel. Structural check: the partitioned
    HLO's local MLP up-projection is [NL/pp, H, 4H/tp] and the
    tp-replicated [NL/pp, H, 4H] buffer never feeds a dot."""
    kw, params, (x, coords, is_valid, seg), ref = encoder_setup
    mesh = make_mesh(dp=1, tp=2, pp=2, devices=cpu_devices[:4])
    enc_pp = TransformerEncoder(pipeline_axis="pp", pipeline_microbatches=2,
                                **kw)

    from merlot_reserve_tpu.parallel.sharding import param_shardings
    sh = param_shardings(mesh, {"joint_transformer": params})[
        "joint_transformer"]
    p_sharded = jax.device_put(params, sh)

    def f(p, x):
        return enc_pp.apply({"params": p}, x, rotary_coords=coords,
                            is_valid=is_valid, segment_ids=seg)["seq"]

    with activate_mesh(mesh):
        jitted = jax.jit(f)
        hlo = jitted.lower(p_sharded, x).compile().as_text()
        out = jitted(p_sharded, x)
    assert float(jnp.abs(out - ref).max()) < 2e-5
    # NL=4, pp=2, H=32, 4H=128, tp=2: stage-local tp-sharded up-proj kernel
    assert "f32[2,32,64]" in hlo, "MLP kernel not tp-sharded inside the stage"
    assert "f32[2,32,128]" not in hlo, (
        "full (tp-replicated) MLP kernel materialized inside the pipeline "
        "stage — tp composition regressed")


def test_train_step_dp2_tp2_pp2_matches_dp2(cpu_devices):
    """full train step on the 3-axis dp x tp x pp mesh reproduces the dp-only
    losses (ZeRO-1 masters, tp'd stage weights, pipelined joint stack)."""
    base = _one_step(_tiny_config(),
                     make_mesh(dp=2, devices=cpu_devices[:2]))
    tpp = _one_step(_tiny_config(pipeline_axis="pp", pipeline_microbatches=2),
                    make_mesh(dp=2, tp=2, pp=2, devices=cpu_devices[:8]))
    for k in base:
        assert abs(base[k] - tpp[k]) < 1e-4, (k, base[k], tpp[k])


def test_pipeline_sp_grads(encoder_setup, cpu_devices):
    """grads through the sp x pp composition match the plain encoder."""
    kw, params, (x, coords, is_valid, seg), _ = encoder_setup
    enc = TransformerEncoder(**kw)
    enc_pp = TransformerEncoder(pipeline_axis="pp", pipeline_microbatches=2,
                                seq_shard_axis="sp", **kw)
    mesh = make_mesh(dp=1, sp=2, pp=2, devices=cpu_devices[:4])

    def loss(module):
        def _fn(p):
            y = module.apply({"params": p}, x, rotary_coords=coords,
                             is_valid=is_valid, segment_ids=seg)["seq"]
            return (y ** 2).mean()
        return _fn

    g_ref = jax.grad(loss(enc))(params)
    with activate_mesh(mesh):
        g_pp = jax.jit(jax.grad(loss(enc_pp)))(params)
    worst = max(jax.tree_util.tree_leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), g_ref, g_pp)))
    assert worst < 2e-5, worst


# ---------------------------------------------------------------------------
# full train step: dp x pp and dp x sp meshes reproduce the dp-only losses
# ---------------------------------------------------------------------------


def _tiny_config(**model_overrides):
    cfg = mr.load_config(
        "base", hidden_size=64, joint_num_layers=2, vit_num_layers=2,
        audio_num_layers=2, span_num_layers=2, size_per_head=32,
        output_grid=(4, 4), use_bfloat16=False, **model_overrides)
    return cfg.replace_data(num_segments=4, num_segment_groups=2, seq_len=80,
                            lang_seq_len=40, num_text_spans_to_include=8)


def _one_step(cfg, mesh):
    model = MerlotReservePretrainer.from_config(cfg)
    batch = make_dummy_batch(cfg, batch_size=2, seed=0, num_text_spans=16)
    params = model.init_params(batch)
    state = construct_train_state(cfg.optimizer, model, params)
    step_fn, state = make_jit_train_step(mesh, state, zero1=True)
    bd = {k: jnp.asarray(v) for k, v in batch.items()}
    state, metrics = step_fn(state, bd)
    return {k: float(v) for k, v in jax.device_get(metrics).items()}


def test_train_step_dp2_pp2_matches_dp2(cpu_devices):
    base = _one_step(_tiny_config(),
                     make_mesh(dp=2, devices=cpu_devices[:2]))
    pp = _one_step(_tiny_config(pipeline_axis="pp", pipeline_microbatches=2),
                   make_mesh(dp=2, pp=2, devices=cpu_devices[:4]))
    for k in base:
        assert abs(base[k] - pp[k]) < 1e-4, (k, base[k], pp[k])


def test_train_step_dp2_sp2_matches_dp2(cpu_devices):
    base = _one_step(_tiny_config(),
                     make_mesh(dp=2, devices=cpu_devices[:2]))
    sp = _one_step(_tiny_config(seq_shard_axis="sp"),
                   make_mesh(dp=2, sp=2, devices=cpu_devices[:4]))
    for k in base:
        assert abs(base[k] - sp[k]) < 1e-4, (k, base[k], sp[k])


import pytest  # noqa: E402

# heavy tier: full-model / multi-device / subprocess tests
pytestmark = pytest.mark.slow
