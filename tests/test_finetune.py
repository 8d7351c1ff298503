"""Finetuning: VCR and TVQA end to end — synthetic records -> preprocessors ->
task models -> finetune train steps (with subtract-old-weights decay and grad
accumulation) on the CPU mesh."""

import os

import numpy as np
import pytest

import merlot_reserve_tpu as mr
from merlot_reserve_tpu.data.synthetic import write_synthetic_finetune_corpus
from merlot_reserve_tpu.finetune.data import finetune_batches
from merlot_reserve_tpu.finetune.models import (
    MerlotReserveTVQA,
    MerlotReserveVCR,
    adapt_pretrained_params,
)
from merlot_reserve_tpu.tokenizer import AUDIOSPAN, MASK


@pytest.fixture(scope="module")
def cfg():
    c = mr.load_config("base", hidden_size=64, joint_num_layers=2, vit_num_layers=2,
                       audio_num_layers=2, span_num_layers=2, size_per_head=32,
                       output_grid=(4, 4), use_bfloat16=False)
    c = c.replace_data(lang_seq_len=48, num_segments=7)
    import dataclasses

    return dataclasses.replace(
        c, optimizer=dataclasses.replace(
            c.optimizer, num_train_steps=10, num_warmup_steps=2,
            learning_rate=1e-4, do_bias_correction=True))


@pytest.fixture(scope="module")
def vcr_file(cfg, tmp_path_factory):
    p = os.path.join(tmp_path_factory.mktemp("vcr"), "vcr.tfrecord")
    return write_synthetic_finetune_corpus(p, cfg, "vcr", num_records=4)


@pytest.fixture(scope="module")
def tvqa_file(cfg, tmp_path_factory):
    p = os.path.join(tmp_path_factory.mktemp("tvqa"), "tvqa.tfrecord")
    return write_synthetic_finetune_corpus(p, cfg, "tvqa", num_records=4)


def test_vcr_preprocess(vcr_file, cfg):
    batch = next(finetune_batches([vcr_file], cfg, "vcr", batch_size=2, seed=0))
    assert batch["image"].shape == (2, 16, 768)
    assert batch["answers"].shape == (2, 2, 4, 48)
    assert batch["labels"].shape == (2, 2)
    # every option ends with a MASK somewhere
    assert (batch["answers"] == MASK).any(-1).all()


def test_tvqa_preprocess(tvqa_file, cfg):
    batch = next(finetune_batches([tvqa_file], cfg, "tvqa", batch_size=2, seed=0))
    assert batch["images"].shape == (2, 7, 16, 768)
    assert batch["audio_clips"].shape == (2, 7, 3, 60, 65)
    assert batch["textonly_seqs"].shape == (2, 5, 48, 2)
    assert batch["audio_seqs"].shape == (2, 5, 48, 2)
    # audio stream carries AUDIOSPAN runs; playback channel is exactly 1
    assert (batch["audio_seqs"][..., 0] == AUDIOSPAN).any()
    np.testing.assert_array_equal(batch["audio_clips"][..., -1],
                                  np.ones_like(batch["audio_clips"][..., -1]))


def test_vcr_train_steps(vcr_file, cfg):
    import jax
    import jax.numpy as jnp

    from merlot_reserve_tpu.finetune.train import (
        make_finetune_step,
        vcr_loss_fn,
        vcr_pred_step,
    )
    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.training.optimization import construct_finetuning_train_state

    model = MerlotReserveVCR.from_config(cfg)
    batches = finetune_batches([vcr_file], cfg, "vcr", batch_size=2, seed=0)
    batch = next(batches)
    params = model.init_params(batch)
    params = adapt_pretrained_params(dict(params), cfg.model.hidden_size,
                                     drop_audio=True)
    # model must run with the adapted tree (audio/head/span dropped)
    state = construct_finetuning_train_state(cfg.optimizer, model, params)

    mesh = make_mesh(dp=2, tp=1, devices=jax.devices("cpu")[:2])
    step_fn, state = make_finetune_step(mesh, state, vcr_loss_fn)
    for _ in range(2):
        bd = {k: jnp.asarray(v) for k, v in batch.items()}
        state, info = step_fn(state, bd)
    floats = {k: float(v) for k, v in info.items()}
    assert np.isfinite(floats["loss"])
    assert 0.0 <= floats["is_right"] <= 1.0

    preds = jax.jit(vcr_pred_step)(state, {k: jnp.asarray(v) for k, v in batch.items()})
    assert preds["preds"].shape == (2, 2)


def test_tvqa_train_step_with_accumulation(tvqa_file, cfg):
    import jax
    import jax.numpy as jnp

    from merlot_reserve_tpu.finetune.train import (
        make_finetune_step,
        tvqa_loss_fn,
        tvqa_pred_step,
    )
    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.training.optimization import construct_finetuning_train_state

    model = MerlotReserveTVQA.from_config(cfg)
    batch = next(finetune_batches([tvqa_file], cfg, "tvqa", batch_size=2, seed=0))
    params = model.init_params(batch)
    params = adapt_pretrained_params(dict(params), cfg.model.hidden_size)
    state = construct_finetuning_train_state(cfg.optimizer, model, params)

    mesh = make_mesh(dp=1, tp=1, devices=jax.devices("cpu")[:1])
    step_fn, state = make_finetune_step(mesh, state, tvqa_loss_fn,
                                        scan_minibatch=True)
    bd = {k: jnp.asarray(v) for k, v in batch.items()}
    state, info = step_fn(state, bd)
    floats = {k: float(v) for k, v in info.items()}
    assert np.isfinite(floats["loss_audio"]) and np.isfinite(floats["loss_text"])

    preds = jax.jit(tvqa_pred_step)(state, bd)
    assert preds["preds_joint"].shape == (2,)


import pytest  # noqa: E402

# heavy tier: full-model / multi-device / subprocess tests
pytestmark = pytest.mark.slow
