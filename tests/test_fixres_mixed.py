"""Mixed-resolution (fixres) training step.

The reference adapts resolution by giving each host a different grid
(/root/reference/pretrain/train_fixres.py:78-81) — per-host heterogeneous
pmap programs, impossible under a global-mesh jit. The GSPMD redesign
(training/trainer.py::make_jit_mixed_res_train_step) carries BOTH grids in
one SPMD program, half the batch each, concatenating preds before the
contrastive loss so the InfoNCE negatives span both resolutions (the
reference's cross-host all_gather semantics, pretrain_model.py:290).

These tests pin: (a) params are resolution-independent (the premise of
fixres), (b) the jitted sharded step computes exactly the documented
composition, (c) the denominators really do couple the two halves.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import merlot_reserve_tpu as mr
from merlot_reserve_tpu.data.dummy import make_dummy_batch
from merlot_reserve_tpu.models import MerlotReservePretrainer
from merlot_reserve_tpu.models.pretrainer import loss_fn_given_preds
from merlot_reserve_tpu.parallel import make_mesh
from merlot_reserve_tpu.training.optimization import construct_train_state
from merlot_reserve_tpu.training.trainer import make_jit_mixed_res_train_step
from merlot_reserve_tpu.utils.checkpoint import bf16_to_f32, f32_to_bf16

pytestmark = pytest.mark.slow


def _tiny_cfg(grid, seq_len):
    cfg = mr.load_config("base", hidden_size=64, joint_num_layers=2,
                         vit_num_layers=2, audio_num_layers=2,
                         span_num_layers=2, size_per_head=32,
                         output_grid=grid, use_bfloat16=False)
    return cfg.replace_data(num_segments=4, num_segment_groups=2,
                            seq_len=seq_len, lang_seq_len=40,
                            num_text_spans_to_include=8)


@pytest.fixture(scope="module")
def setup():
    cfg_a = _tiny_cfg((4, 4), 80)
    cfg_b = _tiny_cfg((2, 2), 76)
    model_a = MerlotReservePretrainer.from_config(cfg_a)
    model_b = MerlotReservePretrainer.from_config(cfg_b)
    batch_a = make_dummy_batch(cfg_a, batch_size=4, seed=0, num_text_spans=16)
    batch_b = make_dummy_batch(cfg_b, batch_size=4, seed=1, num_text_spans=16)
    params = model_a.init_params(batch_a)
    return cfg_a, cfg_b, model_a, model_b, params, batch_a, batch_b


def test_params_are_resolution_independent(setup):
    """Same param tree (structure AND shapes) at both grids — rotary, not
    learned PE, is what makes fixres possible at all (train_fixres.py:90)."""
    _, _, _, model_b, params, _, batch_b = setup
    params_b = model_b.init_params(batch_b)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(params_b)
    assert [(p, v.shape) for p, v in flat_a] == \
           [(p, v.shape) for p, v in flat_b]


def test_mixed_step_matches_manual_composition(setup, cpu_devices):
    """The jitted dp-sharded mixed step == value_and_grad over
    concat(preds_a, preds_b) -> apply_gradients, computed by hand."""
    cfg_a, _, model_a, model_b, params, batch_a, batch_b = setup

    state = construct_train_state(
        cfg_a.optimizer, model_a, jax.tree.map(np.array, params))
    mesh = make_mesh(dp=4, devices=cpu_devices[:4])
    step_fn, dstate = make_jit_mixed_res_train_step(
        mesh, state, model_b.apply, donate=False)
    ba = {k: jnp.asarray(v) for k, v in batch_a.items()}
    bb = {k: jnp.asarray(v) for k, v in batch_b.items()}
    new_state, metrics = step_fn(dstate, ba, bb)

    def manual_loss(p):
        # jnp (not numpy) batches: the content-derived PRNG sums token
        # pointers as uint32, and numpy's eager sum would promote to uint64
        preds_a = model_a.apply({"params": p}, ba)
        preds_b = model_b.apply({"params": p}, bb)
        preds = jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0),
                             preds_a, preds_b)
        return loss_fn_given_preds(preds)

    ref_state = construct_train_state(
        cfg_a.optimizer, model_a, jax.tree.map(np.array, params))
    (_, ref_info), grads = jax.value_and_grad(manual_loss, has_aux=True)(
        f32_to_bf16(ref_state.params))
    grads = bf16_to_f32(jax.tree.map(jnp.nan_to_num, grads))
    ref_new = ref_state.apply_gradients(grads=grads)

    for k, v in ref_info.items():
        assert abs(float(v) - float(metrics[k])) < 1e-4, (k, v, metrics[k])
    worst = max(
        np.max(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)))
        for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(
            new_state.params)),
            jax.tree_util.tree_leaves(jax.device_get(ref_new.params))))
    assert worst < 2e-5, f"params diverge from manual composition: {worst}"


def test_negatives_span_both_resolutions(setup):
    """The mixed loss must exceed the size-weighted mean of the per-half
    losses: every row's logsumexp denominator gains the other grid's
    targets as negatives (the coupling that per-half training lacks)."""
    _, _, model_a, model_b, params, batch_a, batch_b = setup

    ba = {k: jnp.asarray(v) for k, v in batch_a.items()}
    bb = {k: jnp.asarray(v) for k, v in batch_b.items()}
    preds_a = model_a.apply({"params": params}, ba)
    preds_b = model_b.apply({"params": params}, bb)
    loss_a, _ = loss_fn_given_preds(preds_a)
    loss_b, _ = loss_fn_given_preds(preds_b)
    preds = jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0),
                         preds_a, preds_b)
    loss_mixed, _ = loss_fn_given_preds(preds)

    # equal-sized halves -> unweighted mean; strict margin since the extra
    # negatives are random embeddings, not near-duplicates
    assert float(loss_mixed) > (float(loss_a) + float(loss_b)) / 2 + 1e-3


def test_mixed_loaders_consume_disjoint_shards(tmp_path):
    """The script's 2*num_hosts virtual-host scheme: the two grid loaders
    must read DISJOINT file shards — the same stream through both grids
    would put each row's exact positive (same span tokens -> identical span
    embedding) into the other half's InfoNCE denominator, flooring the loss
    and pushing identical positives apart."""
    from merlot_reserve_tpu.data.loader import input_fn_builder
    from merlot_reserve_tpu.data.synthetic import write_synthetic_corpus

    cfg = _tiny_cfg((4, 4), 80)
    cfg = dataclasses.replace(cfg, device=dataclasses.replace(
        cfg.device, batch_size=2))
    files = [write_synthetic_corpus(str(tmp_path / f"c{i}.tfrecord"), cfg,
                                    num_records=2, seed=i) for i in range(4)]
    loaders = [input_fn_builder(cfg, files, host_index=2 * 0 + i,
                                num_hosts=2 * 1, seed=100 + i)
               for i in range(2)]
    assert not (set(loaders[0].files) & set(loaders[1].files))
    assert set(loaders[0].files) | set(loaders[1].files) == set(files)
    # and the halved per-loader batch: combined = configured global batch
    assert loaders[0].batch_size + loaders[1].batch_size == 2
