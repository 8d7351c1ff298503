"""Distributed semantics: results must be independent of the mesh layout.

The reference's pmap world had per-device losses + explicit all_gather/pmean;
here GSPMD owns the collectives. These tests pin the contract: the same
global batch produces the same losses and updated params whether run on one
device or sharded dp=4 (and dp=2 x tp=2).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import merlot_reserve_tpu as mr
from merlot_reserve_tpu.data.dummy import make_dummy_batch
from merlot_reserve_tpu.models import MerlotReservePretrainer
from merlot_reserve_tpu.parallel import make_mesh
from merlot_reserve_tpu.training.optimization import construct_train_state
from merlot_reserve_tpu.training.trainer import make_jit_train_step


@pytest.fixture(scope="module")
def setup():
    cfg = mr.load_config("base", hidden_size=64, joint_num_layers=2,
                         vit_num_layers=2, audio_num_layers=2, span_num_layers=2,
                         size_per_head=32, output_grid=(4, 4), use_bfloat16=False)
    cfg = cfg.replace_data(num_segments=4, num_segment_groups=2, seq_len=80,
                           lang_seq_len=40, num_text_spans_to_include=8)
    model = MerlotReservePretrainer.from_config(cfg)
    batch = make_dummy_batch(cfg, batch_size=4, seed=0, num_text_spans=16)
    params = model.init_params(batch)
    return cfg, model, params, batch


def _one_step(cfg, model, params, batch, mesh, zero1):
    # the jitted step donates the state, so give each run its own buffers
    params = jax.tree.map(lambda x: np.array(x), params)
    state = construct_train_state(cfg.optimizer, model, params)
    step_fn, state = make_jit_train_step(mesh, state, zero1=zero1)
    bd = {k: jnp.asarray(v) for k, v in batch.items()}
    state, metrics = step_fn(state, bd)
    new_params = jax.device_get(state.params)
    return jax.device_get(metrics), new_params


def test_dp4_matches_single_device(setup, cpu_devices):
    cfg, model, params, batch = setup
    m1, p1 = _one_step(cfg, model, params, batch,
                       make_mesh(dp=1, tp=1, devices=cpu_devices[:1]), False)
    m4, p4 = _one_step(cfg, model, params, batch,
                       make_mesh(dp=4, tp=1, devices=cpu_devices[:4]), True)

    for k in m1:
        assert abs(float(m1[k]) - float(m4[k])) < 1e-4, (k, m1[k], m4[k])
    flat1 = jax.tree_util.tree_leaves(p1)
    flat4 = jax.tree_util.tree_leaves(p4)
    worst = max(np.max(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)))
                for a, b in zip(flat1, flat4))
    assert worst < 5e-3, worst  # bf16 grads + reduction-order differences


def test_dp2_tp2_matches_single_device(setup, cpu_devices):
    cfg, model, params, batch = setup
    m1, _ = _one_step(cfg, model, params, batch,
                      make_mesh(dp=1, tp=1, devices=cpu_devices[:1]), False)
    mtp, _ = _one_step(cfg, model, params, batch,
                       make_mesh(dp=2, tp=2, devices=cpu_devices[:4]), True)
    for k in m1:
        assert abs(float(m1[k]) - float(mtp[k])) < 1e-4, (k, m1[k], mtp[k])


def test_dp2_tp2_sp2_matches_single_device(setup, cpu_devices):
    """tp x sp composition (support-matrix cell): Megatron weight sharding
    and GSPMD sequence sharding of the joint activations in one layout."""
    import merlot_reserve_tpu as mr

    cfg, model, params, batch = setup
    m1, _ = _one_step(cfg, model, params, batch,
                      make_mesh(dp=1, tp=1, devices=cpu_devices[:1]), False)
    cfg_sp = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, seq_shard_axis="sp"))
    model_sp = type(model).from_config(cfg_sp)
    msp, _ = _one_step(cfg_sp, model_sp, params, batch,
                       make_mesh(dp=2, tp=2, sp=2, devices=cpu_devices[:8]),
                       True)
    for k in m1:
        assert abs(float(m1[k]) - float(msp[k])) < 1e-4, (k, m1[k], msp[k])


def test_dcn2_dp2_sp2_matches_single_device(setup, cpu_devices):
    """dcn x sp composition (support-matrix cell): a 2-slice hybrid mesh
    (virtual devices take the contiguous-reshape fallback — make_mesh) with
    GSPMD sequence sharding; batches span ("dcn", "dp") while the sp
    collectives stay on the intra-slice axes."""
    cfg, model, params, batch = setup
    m1, _ = _one_step(cfg, model, params, batch,
                      make_mesh(dp=1, tp=1, devices=cpu_devices[:1]), False)
    cfg_sp = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, seq_shard_axis="sp"))
    model_sp = type(model).from_config(cfg_sp)
    msp, _ = _one_step(cfg_sp, model_sp, params, batch,
                       make_mesh(dp=4, sp=2, dcn_dp=2,
                                 devices=cpu_devices[:8]), True)
    for k in m1:
        assert abs(float(m1[k]) - float(msp[k])) < 1e-4, (k, m1[k], msp[k])


def test_dp2_sp2_segment_shard_tower_remat_matches_single_device(
        setup, cpu_devices):
    """Long-video memory levers (round 5): segment_shard_axis shards the
    modality towers' row dim (B x segments etc.) over sp — towers never mix
    rows, so this is pure data parallelism over an otherwise tower-idle
    axis — and tower_gradient_checkpoint remats the towers. Both are
    memory-only knobs: the step must reproduce the single-device result.
    (Measured effect: 80-segment single-chip 21.3G OOM -> 5.8G fit,
    BASELINE.md 'long-video recipe'.)"""
    cfg, model, params, batch = setup
    m1, _ = _one_step(cfg, model, params, batch,
                      make_mesh(dp=1, tp=1, devices=cpu_devices[:1]), False)
    cfg_seg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, seq_shard_axis="sp",
                                       segment_shard_axis="sp",
                                       tower_gradient_checkpoint=True))
    model_seg = type(model).from_config(cfg_seg)
    mseg, _ = _one_step(cfg_seg, model_seg, params, batch,
                        make_mesh(dp=2, sp=2, devices=cpu_devices[:4]), True)
    for k in m1:
        assert abs(float(m1[k]) - float(mseg[k])) < 1e-4, (k, m1[k], mseg[k])


def test_dcn2_pp2_matches_single_device(setup, cpu_devices):
    """dcn x pp composition (support-matrix cell): the pipelined joint stack
    under a 2-slice mesh — stage ppermutes ride the intra-slice axes; only
    the grad reduction spans dcn."""
    cfg, model, params, batch = setup
    m1, _ = _one_step(cfg, model, params, batch,
                      make_mesh(dp=1, tp=1, devices=cpu_devices[:1]), False)
    cfg_pp = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, pipeline_axis="pp",
                                       pipeline_microbatches=2))
    model_pp = type(model).from_config(cfg_pp)
    mpp, _ = _one_step(cfg_pp, model_pp, params, batch,
                       make_mesh(dp=2, pp=2, dcn_dp=2,
                                 devices=cpu_devices[:4]), True)
    for k in m1:
        assert abs(float(m1[k]) - float(mpp[k])) < 1e-4, (k, m1[k], mpp[k])


def test_dp2_tp2_remat_matches_single_device(setup, cpu_devices):
    """tp x remat composition (support-matrix cell): gradient checkpointing
    under tensor-parallel weight sharding."""
    cfg, model, params, batch = setup
    m1, p1 = _one_step(cfg, model, params, batch,
                       make_mesh(dp=1, tp=1, devices=cpu_devices[:1]), False)
    cfg_r = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, gradient_checkpoint=True))
    model_r = type(model).from_config(cfg_r)
    mr_, pr = _one_step(cfg_r, model_r, params, batch,
                        make_mesh(dp=2, tp=2, devices=cpu_devices[:4]), True)
    for k in m1:
        assert abs(float(m1[k]) - float(mr_[k])) < 1e-4, (k, m1[k], mr_[k])
    flat1 = jax.tree_util.tree_leaves(p1)
    flatr = jax.tree_util.tree_leaves(pr)
    worst = max(np.max(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)))
                for a, b in zip(flat1, flatr))
    assert worst < 5e-3, worst


def _flash_cfg(cfg, **model_overrides):
    return dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model,
                                       joint_attention_impl="flash:16:16",
                                       **model_overrides))


def _one_step_interpret(cfg, model, params, batch, mesh, zero1):
    import merlot_reserve_tpu.ops.attention as attn_ops

    attn_ops._FORCE_INTERPRET = True
    try:
        return _one_step(cfg, model, params, batch, mesh, zero1)
    finally:
        attn_ops._FORCE_INTERPRET = False


def test_dp2_tp2_flash_joint_matches_single_device(setup, cpu_devices):
    """flash joint x tp (support-matrix cell): the Pallas kernels run under
    shard_map, batch-sharded over dp and HEAD-sharded over tp — matching the
    Megatron qkv sharding, so q/k/v enter the kernel without resharding
    (ops/attention.py::_flash_on_mesh; without it GSPMD replicates the
    custom call). Losses and updated params must match the dense
    single-device step."""
    cfg, model, params, batch = setup
    m1, p1 = _one_step(cfg, model, params, batch,
                       make_mesh(dp=1, tp=1, devices=cpu_devices[:1]), False)
    cfg_fl = _flash_cfg(cfg)
    model_fl = type(model).from_config(cfg_fl)
    mfl, pfl = _one_step_interpret(
        cfg_fl, model_fl, params, batch,
        make_mesh(dp=2, tp=2, devices=cpu_devices[:4]), True)
    for k in m1:
        assert abs(float(m1[k]) - float(mfl[k])) < 1e-4, (k, m1[k], mfl[k])
    worst = max(np.max(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)))
                for a, b in zip(jax.tree_util.tree_leaves(p1),
                                jax.tree_util.tree_leaves(pfl)))
    assert worst < 5e-3, worst


def test_dp2_sp2_flash_joint_matches_single_device(setup, cpu_devices):
    """flash joint x sp-GSPMD (support-matrix cell): under seq_shard_axis
    the joint activations arrive seq-sharded; the flash shard_map keeps seq
    UNsharded (softmax needs whole rows), so the boundary all-gathers seq —
    the same traffic the dense GSPMD path pays. True seq-sharded flash is
    ring:flash / ulysses:flash. Semantics must be unchanged."""
    cfg, model, params, batch = setup
    m1, _ = _one_step(cfg, model, params, batch,
                      make_mesh(dp=1, tp=1, devices=cpu_devices[:1]), False)
    cfg_fl = _flash_cfg(cfg, seq_shard_axis="sp")
    model_fl = type(model).from_config(cfg_fl)
    mfl, _ = _one_step_interpret(
        cfg_fl, model_fl, params, batch,
        make_mesh(dp=2, sp=2, devices=cpu_devices[:4]), True)
    for k in m1:
        assert abs(float(m1[k]) - float(mfl[k])) < 1e-4, (k, m1[k], mfl[k])


def test_dp2_pp2_flash_joint_matches_single_device(setup, cpu_devices):
    """flash joint x pp (support-matrix cell): inside the pipeline's
    partial-manual region the flash wrapper detects the manual pp axis and
    falls back to the plain kernel call (a nested shard_map over the auto
    axes would conflict); the kernel still computes per-microbatch.
    Losses must match the dense single-device step."""
    cfg, model, params, batch = setup
    m1, _ = _one_step(cfg, model, params, batch,
                      make_mesh(dp=1, tp=1, devices=cpu_devices[:1]), False)
    cfg_fl = _flash_cfg(cfg, pipeline_axis="pp", pipeline_microbatches=2)
    model_fl = type(model).from_config(cfg_fl)
    mfl, _ = _one_step_interpret(
        cfg_fl, model_fl, params, batch,
        make_mesh(dp=2, pp=2, devices=cpu_devices[:4]), True)
    for k in m1:
        assert abs(float(m1[k]) - float(mfl[k])) < 1e-4, (k, m1[k], mfl[k])


import pytest  # noqa: E402

# heavy tier: full-model / multi-device / subprocess tests
pytestmark = pytest.mark.slow
