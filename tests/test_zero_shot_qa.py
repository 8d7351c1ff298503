"""Batched zero-shot TVQA / VCR (BASELINE.json config 2): MASK-statement
preprocessors, span-encoder answer ranking modules, and the batched eval
loop — all on synthetic records with randomly initialized params."""

import os

import numpy as np
import pytest

import merlot_reserve_tpu as mr
from merlot_reserve_tpu.data.synthetic import write_synthetic_finetune_corpus
from merlot_reserve_tpu.data.tfrecord import parse_example, read_records
from merlot_reserve_tpu.finetune.data import (
    finetune_batches,
    preprocess_tvqa,
    preprocess_tvqa_zero_shot,
    preprocess_vcr_zero_shot,
)
from merlot_reserve_tpu.finetune.models import (
    MerlotReserveTVQAZeroShot,
    MerlotReserveVCRZeroShot,
)
from merlot_reserve_tpu.tokenizer import AUDIOSPAN, MASK, PADDING, get_tokenizer


@pytest.fixture(scope="module")
def cfg():
    c = mr.load_config("base", hidden_size=64, joint_num_layers=2, vit_num_layers=2,
                       audio_num_layers=2, span_num_layers=2, size_per_head=32,
                       output_grid=(4, 4), use_bfloat16=False)
    return c.replace_data(lang_seq_len=48, num_segments=7)


@pytest.fixture(scope="module")
def vcr_file(cfg, tmp_path_factory):
    p = os.path.join(tmp_path_factory.mktemp("vcr"), "vcr.tfrecord")
    return write_synthetic_finetune_corpus(p, cfg, "vcr", num_records=4)


@pytest.fixture(scope="module")
def tvqa_file(cfg, tmp_path_factory):
    p = os.path.join(tmp_path_factory.mktemp("tvqa"), "tvqa.tfrecord")
    return write_synthetic_finetune_corpus(p, cfg, "tvqa", num_records=4)


def test_preprocess_tvqa_zero_shot(tvqa_file, cfg):
    raw = parse_example(next(iter(read_records(tvqa_file))))
    rng = np.random.default_rng(0)
    zs = preprocess_tvqa_zero_shot(raw, cfg, rng)
    ft = preprocess_tvqa(raw, cfg, np.random.default_rng(0), is_training=False)

    # context decode is shared with the finetune preprocessor
    np.testing.assert_array_equal(zs["images"], ft["images"])
    np.testing.assert_array_equal(zs["audio_clips"], ft["audio_clips"])
    assert zs["labels"] == ft["labels"]

    assert zs["textonly_seqs"].shape == (1, 48, 2)
    assert zs["audio_seqs"].shape == (1, 48, 2)
    # statement row: question + 'answer: ' + MASK, segment id 0
    enc = get_tokenizer()
    query = list(np.asarray(raw["qa_query"])) + list(enc.encode("answer: ").ids)
    stmt_len = len(query) + 1
    toks, segs = zs["textonly_seqs"][0, :, 0], zs["textonly_seqs"][0, :, 1]
    np.testing.assert_array_equal(toks[:len(query)], query)
    assert toks[len(query)] == MASK
    assert (segs[:stmt_len] == 0).all()
    # context rows follow (subtitles / AUDIOSPAN runs), one segment id each
    assert segs[stmt_len] == 1
    assert (zs["audio_seqs"][0, stmt_len:, 0][
        zs["audio_seqs"][0, stmt_len:, 1] > 0] == AUDIOSPAN).all()

    # answer table: the 5 choices padded to the span length
    assert zs["answers"].shape == (5, cfg.model.text_span_length)
    ch0 = np.asarray(raw["qa_choice_0"])
    np.testing.assert_array_equal(zs["answers"][0, :len(ch0)], ch0)
    assert (zs["answers"][0, len(ch0):] == PADDING).all()


def test_preprocess_vcr_zero_shot(vcr_file, cfg):
    raw = parse_example(next(iter(read_records(vcr_file))))
    zs = preprocess_vcr_zero_shot(raw, cfg, np.random.default_rng(0))
    assert zs["image"].shape == (16, 768)
    assert zs["statements"].shape == (2, 48)
    assert zs["answers"].shape == (2, 4, cfg.model.text_span_length)
    assert zs["labels"].shape == (2,)

    enc = get_tokenizer()
    for t, (prefix, sep) in enumerate([("qa", "answer: "), ("qar", "rationale: ")]):
        query = list(np.asarray(raw[f"{prefix}_query"])) + list(enc.encode(sep).ids)
        assert zs["statements"][t, len(query)] == MASK
        assert (zs["statements"][t, len(query) + 1:] == PADDING).all()
        ch = np.asarray(raw[f"{prefix}_choice_2"])
        np.testing.assert_array_equal(zs["answers"][t, 2, :len(ch)], ch)


def _init(model, batch):
    return model.init_params({k: np.asarray(v) for k, v in batch.items()})


@pytest.mark.slow  # 80s; the VCR variant covers the shared path fast
def test_tvqa_zero_shot_forward(tvqa_file, cfg):
    import jax.numpy as jnp

    model = MerlotReserveTVQAZeroShot.from_config(cfg)
    batch = next(finetune_batches([tvqa_file], cfg, "tvqa_zero_shot",
                                  batch_size=2, is_training=False))
    params = _init(model, batch)
    bd = {k: jnp.asarray(v) for k, v in batch.items() if k != "labels"}
    la, lt = model.apply({"params": params}, bd)
    assert la.shape == lt.shape == (2, 5)
    # cosine logits: unit-normalized both sides
    assert float(jnp.abs(la).max()) <= 1.0 + 1e-4
    assert float(jnp.abs(lt).max()) <= 1.0 + 1e-4

    # wiring: changing answer k moves only column k (both streams)
    b2 = dict(bd)
    ans = np.array(batch["answers"])
    ans[:, 3, :5] = [[9000, 9001, 9002, 9003, 9004]] * 2
    b2["answers"] = jnp.asarray(ans)
    la2, lt2 = model.apply({"params": params}, b2)
    keep = [0, 1, 2, 4]
    np.testing.assert_allclose(np.asarray(la)[:, keep], np.asarray(la2)[:, keep],
                               rtol=0, atol=1e-6)
    assert not np.allclose(np.asarray(la)[:, 3], np.asarray(la2)[:, 3])
    np.testing.assert_allclose(np.asarray(lt)[:, keep], np.asarray(lt2)[:, keep],
                               rtol=0, atol=1e-6)


def test_vcr_zero_shot_forward(vcr_file, cfg):
    import jax.numpy as jnp

    model = MerlotReserveVCRZeroShot.from_config(cfg)
    batch = next(finetune_batches([vcr_file], cfg, "vcr_zero_shot",
                                  batch_size=2, is_training=False))
    params = _init(model, batch)
    bd = {k: jnp.asarray(v) for k, v in batch.items() if k != "labels"}
    logits = model.apply({"params": params}, bd)
    assert logits.shape == (2, 2, 4)
    assert float(jnp.abs(logits).max()) <= 1.0 + 1e-4

    # the two tasks pool different MASK statements: rows must differ
    assert not np.allclose(np.asarray(logits)[:, 0], np.asarray(logits)[:, 1])


@pytest.mark.slow
def test_zero_shot_qa_eval_loop(tvqa_file, vcr_file, cfg):
    from merlot_reserve_tpu.zero_shot import zero_shot_qa_eval

    model = MerlotReserveTVQAZeroShot.from_config(cfg)
    batch0 = next(finetune_batches([tvqa_file], cfg, "tvqa_zero_shot",
                                   batch_size=2, is_training=False))
    params = _init(model, batch0)
    batches = finetune_batches([tvqa_file], cfg, "tvqa_zero_shot", batch_size=3,
                               is_training=False, repeat=False, return_ids=True)
    metrics, rows = zero_shot_qa_eval(model, params, batches, "tvqa")
    assert metrics["n"] == 4  # 4 records; the padded 2nd batch slots skipped
    assert set(metrics) == {"acc_audio", "acc_text", "acc_joint", "n"}
    assert len(rows) == 4 and all("pred_joint" in r for r in rows)

    model_v = MerlotReserveVCRZeroShot.from_config(cfg)
    batch0 = next(finetune_batches([vcr_file], cfg, "vcr_zero_shot",
                                   batch_size=2, is_training=False))
    params_v = _init(model_v, batch0)
    batches = finetune_batches([vcr_file], cfg, "vcr_zero_shot", batch_size=4,
                               is_training=False, repeat=False, return_ids=True)
    metrics_v, rows_v = zero_shot_qa_eval(model_v, params_v, batches, "vcr")
    assert metrics_v["n"] == 4
    assert set(metrics_v) == {"acc_qa", "acc_qar", "acc_joint", "n"}
    for r in rows_v:
        assert 0 <= r["pred_qa"] < 4 and 0 <= r["pred_qar"] < 4


@pytest.mark.slow
def test_zero_shot_qa_eval_mesh(tvqa_file, cfg, cpu_devices):
    """dp-sharded eval (form_global_batch + sharded jit) reproduces the
    single-device predictions exactly."""
    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.zero_shot import zero_shot_qa_eval

    model = MerlotReserveTVQAZeroShot.from_config(cfg)
    batch0 = next(finetune_batches([tvqa_file], cfg, "tvqa_zero_shot",
                                   batch_size=2, is_training=False))
    params = _init(model, batch0)

    def batches():
        return finetune_batches([tvqa_file], cfg, "tvqa_zero_shot",
                                batch_size=2, is_training=False,
                                repeat=False, return_ids=True)

    m0, r0 = zero_shot_qa_eval(model, params, batches(), "tvqa")
    mesh = make_mesh(dp=2, devices=cpu_devices[:2])
    m1, r1 = zero_shot_qa_eval(model, params, batches(), "tvqa", mesh=mesh)
    assert r0 == r1
    assert m0 == m1
