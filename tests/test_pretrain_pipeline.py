"""End-to-end data pipeline: synthetic TFRecord corpus -> example builder ->
collate -> one pretraining step on the CPU mesh."""

import os

import numpy as np
import pytest

import merlot_reserve_tpu as mr
from merlot_reserve_tpu.data.pretrain_pipeline import (
    PretrainExampleBuilder,
    collate_batch,
    parse_segment_record,
    pretrain_examples_from_file,
)
from merlot_reserve_tpu.data.synthetic import write_synthetic_corpus
from merlot_reserve_tpu.data.tfrecord import read_records
from merlot_reserve_tpu.tokenizer import AUDIOSPAN, LTOVPOOL, MASK, MASKAUDIO, PADDING


@pytest.fixture(scope="module")
def cfg():
    c = mr.load_config("base", hidden_size=64, joint_num_layers=2, vit_num_layers=2,
                       audio_num_layers=2, span_num_layers=2, size_per_head=32,
                       output_grid=(4, 4), use_bfloat16=False)
    # seq_len >= num_segments * 19 for audio_text_matching; 8 segments
    return c.replace_data(num_segments=8, num_segment_groups=2, seq_len=168,
                          lang_seq_len=48, num_text_spans_to_include=8,
                          text_span_budget=10)


@pytest.fixture(scope="module")
def corpus(cfg, tmp_path_factory):
    path = os.path.join(tmp_path_factory.mktemp("data"), "corpus.tfrecord")
    return write_synthetic_corpus(path, cfg, num_records=3, seed=0)


def test_parse_segments(corpus, cfg):
    rec = next(iter(read_records(corpus)))
    segments = parse_segment_record(rec, cfg.data.num_segments)
    assert len(segments) == 8
    for seg in segments:
        assert "image/encoded" in seg and "tok_ids" in seg
        assert len(seg["tok_ids"]) == 20


def test_structured_corpus_is_learnable_and_deterministic(cfg, tmp_path):
    """structured=True media must be (a) deterministic given the seed,
    (b) distinct across segments (so contrastive heads have signal), and
    (c) time-constant in the spectrogram (so the random 3x60 subsegment
    placement crops the same identifying pattern wherever it lands)."""
    import io

    from PIL import Image

    def _b(v):
        return v[0] if isinstance(v, (list, tuple)) else bytes(v)

    p1 = write_synthetic_corpus(str(tmp_path / "s1.tfrecord"), cfg,
                                num_records=2, seed=5, structured=True)
    p2 = write_synthetic_corpus(str(tmp_path / "s2.tfrecord"), cfg,
                                num_records=2, seed=5, structured=True)
    recs1, recs2 = list(read_records(p1)), list(read_records(p2))
    segs = parse_segment_record(recs1[0], cfg.data.num_segments)
    segs_again = parse_segment_record(recs2[0], cfg.data.num_segments)

    imgs = [np.asarray(Image.open(io.BytesIO(_b(s["image/encoded"]))))
            for s in segs]
    # deterministic
    np.testing.assert_array_equal(
        imgs[0], np.asarray(Image.open(io.BytesIO(
            _b(segs_again[0]["image/encoded"])))))
    # distinct across segments AND records
    for i in range(1, len(imgs)):
        assert np.abs(imgs[0].astype(int) - imgs[i].astype(int)).mean() > 10
    other = parse_segment_record(recs1[1], cfg.data.num_segments)
    img_other = np.asarray(Image.open(io.BytesIO(_b(other[0]["image/encoded"]))))
    assert np.abs(imgs[0].astype(int) - img_other.astype(int)).mean() > 10

    # spectrogram pattern constant along the time axis (JPEG-tolerant)
    spec = np.asarray(Image.open(io.BytesIO(_b(segs[0]["spectrogram/encoded"]))))
    assert spec.shape == (cfg.data.num_mels, cfg.data.spec_size)
    assert float(spec.std(axis=1).mean()) < 3.0
    assert float(spec.mean(axis=1).std()) > 20.0  # but varied across mels

    # and the examples still build
    builder = PretrainExampleBuilder(cfg)
    ex = builder.build(parse_segment_record(recs1[0], cfg.data.num_segments),
                       rng=np.random.default_rng(0))
    assert ex["images"].shape[0] == cfg.data.num_segments


def test_example_builder_schema(corpus, cfg):
    examples = list(pretrain_examples_from_file(corpus, cfg, seed=1))
    assert len(examples) == 3
    d = cfg.data
    ex = examples[0]
    assert ex["images"].shape == (8, 16, 768)
    assert ex["audio_clips"].shape == (8, 3, 60, 65)
    assert ex["text2audio"].shape == (d.num_segment_groups, d.lang_seq_len, 3)
    assert ex["audio2text"].shape == (d.num_segment_groups, d.lang_seq_len, 3)
    assert ex["audio_text_matching"].shape == (1, d.seq_len, 3)
    assert ex["random_text"].shape == (1, d.seq_len, 3)
    assert ex["video_src_index"].shape == (8,)
    assert ex["text_spans"].shape[1] == cfg.model.text_span_length

    # text2audio: masked positions carry MASK then MASKAUDIO
    t2a = ex["text2audio"].reshape(-1, 3)
    n_mask = (t2a[:, 0] == MASK).sum()
    n_maskaudio = (t2a[:, 0] == MASKAUDIO).sum()
    assert n_mask > 0 and n_mask == n_maskaudio
    # every MASK has a valid text_ptr into the span table
    ptrs = t2a[t2a[:, 0] == MASK, 2]
    assert (ptrs >= 0).all() and (ptrs < len(ex["text_spans"])).all()

    # audio2text: AUDIOSPAN runs with in-range audio pointers (runs may be
    # end-truncated by the budget subsample, as in the reference)
    a2t = ex["audio2text"].reshape(-1, 3)
    aspan = a2t[a2t[:, 0] == AUDIOSPAN]
    assert len(aspan) > 0
    assert (aspan[:, 1] >= 0).all() and (aspan[:, 1] < d.num_audio_spans).all()

    # matching stream has one LTOVPOOL per segment
    atm = ex["audio_text_matching"].reshape(-1, 3)
    assert (atm[:, 0] == LTOVPOOL).sum() == d.num_segments

    # span table: masked span targets exist and are padded to length
    assert (ex["text_spans"] != PADDING).any()


def test_masked_spans_match_table(corpus, cfg):
    """The tokens a MASK replaced must appear at text_spans[text_ptr]."""
    ex = next(iter(pretrain_examples_from_file(corpus, cfg, seed=3)))
    rec = next(iter(read_records(corpus)))
    segments = parse_segment_record(rec, cfg.data.num_segments)
    all_tokens = np.concatenate([np.asarray(s["tok_ids"]) for s in segments])

    t2a = ex["text2audio"].reshape(-1, 3)
    for ptr in t2a[t2a[:, 0] == MASK, 2]:
        span = ex["text_spans"][ptr]
        span = span[span != PADDING]
        assert len(span) == 0 or np.isin(span, all_tokens).all()


@pytest.mark.slow
def test_collate_and_train_step(corpus, cfg):
    import jax
    import jax.numpy as jnp

    from merlot_reserve_tpu.models import MerlotReservePretrainer
    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.training.optimization import construct_train_state
    from merlot_reserve_tpu.training.trainer import make_jit_train_step

    examples = list(pretrain_examples_from_file(corpus, cfg, seed=2))
    batch = collate_batch(examples[:2])
    assert batch["images"].shape == (2, 8 * 16, 768)
    assert batch["audio_clips"].shape == (2, 8 * 3 * 60, 65)
    assert "text2audio/audio_ptr" in batch and "random_text/text_ptr" in batch

    pre = MerlotReservePretrainer.from_config(cfg)
    params = pre.init_params(batch)
    state = construct_train_state(cfg.optimizer, pre, params)
    mesh = make_mesh(dp=2, tp=1, devices=jax.devices("cpu")[:2])
    step_fn, state = make_jit_train_step(mesh, state)
    state, metrics = step_fn(state, {k: jnp.asarray(v) for k, v in batch.items()})
    floats = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in floats.values()), floats
    assert floats["imgs_to_audio"] > 0


def test_random_resize_method_deterministic_and_varied():
    """Per-image random resize kernel (data_utils.py:8-23,110-117 parity):
    deterministic given the rng, draws every PIL method over many seeds,
    and different kernels actually change the pixels."""
    from merlot_reserve_tpu.data.pretrain_pipeline import (
        host_image_to_patches, pil_resize_methods)

    rng0 = np.random.default_rng(3)
    img = (rng0.uniform(0, 255, size=(96, 128, 3))).astype(np.uint8)
    grid, scale = (4, 4), (1.05, 1.1)

    a = host_image_to_patches(img, grid, rng=np.random.default_rng(7),
                              random_scale=scale)
    b = host_image_to_patches(img, grid, rng=np.random.default_rng(7),
                              random_scale=scale)
    np.testing.assert_array_equal(a, b)

    # method distribution: every kernel index shows up across seeds, and the
    # chosen kernel changes the output relative to forced-bilinear
    n_methods = len(pil_resize_methods())
    seen = set()
    n_diff = 0
    for seed in range(60):
        r1 = np.random.default_rng(seed)
        out_rand = host_image_to_patches(img, grid, rng=r1, random_scale=scale)
        # replay the same rng draws to learn which method was chosen
        r2 = np.random.default_rng(seed)
        r2.uniform(*scale)
        m = int(r2.integers(0, n_methods))
        seen.add(m)
        out_bilin = host_image_to_patches(img, grid,
                                          rng=np.random.default_rng(seed),
                                          random_scale=scale,
                                          random_resize_method=False)
        if not np.array_equal(out_rand, out_bilin):
            n_diff += 1
    assert seen == set(range(n_methods))
    assert n_diff > 30  # non-bilinear kernels change the pixels

    # eval path (rng=None) ignores the selector entirely
    e1 = host_image_to_patches(img, grid)
    e2 = host_image_to_patches(img, grid)
    np.testing.assert_array_equal(e1, e2)
