"""On-device PretrainExampleBuilder (data/device_builder.py) vs the host
builder (data/pretrain_pipeline.py).

Deterministic stages must match the host engine exactly on identical
inputs; stochastic stages share distributions/invariants but not draws
(jax PRNG vs numpy RNG).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import merlot_reserve_tpu as mr
from merlot_reserve_tpu.data import masking as M
from merlot_reserve_tpu.data.device_builder import (DeviceExampleBuilder,
                                                    stack_raw_examples)
from merlot_reserve_tpu.data.pretrain_pipeline import (PretrainExampleBuilder,
                                                       parse_segment_record)
from merlot_reserve_tpu.data.synthetic import write_synthetic_corpus
from merlot_reserve_tpu.data.tfrecord import read_records
from merlot_reserve_tpu.tokenizer import (AUDIOSPAN, LTOVPOOL, MASK,
                                          MASKAUDIO, PADDING)


@pytest.fixture(scope="module")
def cfg():
    c = mr.load_config("base", hidden_size=64, joint_num_layers=2,
                       vit_num_layers=2, audio_num_layers=2, span_num_layers=2,
                       size_per_head=32, output_grid=(4, 4),
                       use_bfloat16=False)
    return c.replace_data(num_segments=8, num_segment_groups=2, seq_len=168,
                          lang_seq_len=48, num_text_spans_to_include=8,
                          text_span_budget=10)


@pytest.fixture(scope="module")
def segments(cfg, tmp_path_factory):
    path = os.path.join(tmp_path_factory.mktemp("dev_builder"), "c.tfrecord")
    write_synthetic_corpus(path, cfg, num_records=2, seed=0)
    recs = list(read_records(path))
    return [parse_segment_record(r, cfg.data.num_segments) for r in recs]


@pytest.fixture(scope="module")
def builder(cfg):
    return DeviceExampleBuilder(cfg)


@pytest.fixture(scope="module")
def raw(builder, segments):
    return builder.host_prepare(segments[0])


def test_host_prepare_shapes(cfg, builder, raw):
    d = cfg.data
    assert raw["spec_u8"].shape == (d.num_segments, d.spec_size, d.num_mels)
    assert raw["tok_ids"].shape == (d.num_segments, builder.TM)
    assert (raw["tok_num"] <= builder.TM).all()
    assert raw["aux_num"] <= builder.AUXL


def test_audio_clips_match_host_given_same_windows(cfg, builder, raw):
    """Window slicing + magic dequant + speed channel: recompute the device
    output in numpy from the device's own placement — must be exact."""
    d, m = cfg.data, cfg.model
    clips, start_t, end_t = builder._audio_clips(jax.random.PRNGKey(0), raw)
    clips = np.asarray(clips)
    # recover integer starts from the window times (the host formula,
    # masking.py::audio_window_times)
    scale = d.fft_hop_length / d.sample_rate
    fft_window = d.fft_window_size / d.sample_rate
    starts = np.rint((np.asarray(start_t) + fft_window / 2) / scale).astype(int)
    for s in range(d.num_segments):
        assert (np.diff(starts[s]) >= m.audio_seq_length).all()
        for a in range(d.num_audio_subsegments):
            w = raw["spec_u8"][s, starts[s, a]:starts[s, a] + m.audio_seq_length]
            expect = w.astype(np.float32) / raw["magic"][s]
            np.testing.assert_allclose(clips[s, a, :, :-1], expect, rtol=1e-6)
            np.testing.assert_allclose(clips[s, a, :, -1], raw["playback"][s])


def test_token_ragged_matches_host(cfg, builder, raw):
    """Assignment + flat ragged stream: drive the HOST primitives with the
    device's own audio windows — values, lengths, centroids, and window
    times must all be exact."""
    d = cfg.data
    _, start_t, end_t = builder._audio_clips(jax.random.PRNGKey(1), raw)
    tokens, row_lengths, cent, ase = builder._token_ragged(
        raw, jnp.asarray(start_t), jnp.asarray(end_t))
    tokens, row_lengths = np.asarray(tokens), np.asarray(row_lengths)
    cent, ase = np.asarray(cent), np.asarray(ase)

    start_t, end_t = np.asarray(start_t), np.asarray(end_t)
    seg_idx_all, tok_all, cent_all, ase_all = [], [], [], []
    t0 = 0.0
    for i in range(d.num_segments):
        n = int(raw["tok_num"][i])
        ids = raw["tok_ids"][i, :n]
        c = (raw["tok_start"][i, :n] + raw["tok_end"][i, :n]) / 2.0
        ac = (start_t[i] + end_t[i]) / 2.0
        assign = M.assign_tokens_to_audio(c, ac)
        seg_idx_all.append(assign + i * d.num_audio_subsegments)
        tok_all.append(ids)
        cent_all.append(c + t0)
        ase_all.append(np.stack([start_t[i], end_t[i]], -1) + t0)
        t0 += float(raw["seg_end"][i] - raw["seg_start"][i])

    ragged = M.Ragged.from_value_rowids(
        np.concatenate(tok_all), np.concatenate(seg_idx_all), builder.N)
    L = int(ragged.row_lengths.sum())
    np.testing.assert_array_equal(row_lengths, ragged.row_lengths)
    np.testing.assert_array_equal(tokens[:L], ragged.values)
    np.testing.assert_allclose(cent[:L], np.concatenate(cent_all), rtol=1e-5)
    np.testing.assert_allclose(ase, np.concatenate(ase_all, 0), rtol=1e-5)


@pytest.mark.parametrize("prob", [0.0, 1.0])
def test_audio_text_matching_matches_host(cfg, segments, prob):
    """With the use-audio coin pinned by the config, the matching stream is
    deterministic — host and device must agree exactly on the valid
    prefix."""
    cfg2 = cfg.replace_data(use_audio_token_prob=prob)
    dev_b = DeviceExampleBuilder(cfg2)
    raw = dev_b.host_prepare(segments[0])
    out = np.asarray(dev_b._audio_text_matching(
        jax.random.PRNGKey(3), jax.tree.map(jnp.asarray, raw)))

    host_b = PretrainExampleBuilder(cfg2)
    host_ex = host_b.build(segments[0], np.random.default_rng(0))
    expect = host_ex["audio_text_matching"][0]

    np.testing.assert_array_equal(out[:, 0], expect[:, 0])   # tokens
    real = out[:, 0] != 0
    np.testing.assert_array_equal(out[real, 1], expect[real, 1])  # audio_ptr
    np.testing.assert_array_equal(out[real, 2], expect[real, 2])  # text_ptr


def test_build_invariants(cfg, builder, raw):
    """Full single-example device build: schema, mask counts, span table."""
    d = cfg.data
    ex = jax.jit(builder.build)(jax.random.PRNGKey(7),
                                jax.tree.map(jnp.asarray, raw))
    n_trg = builder.n_trg

    t2a = np.asarray(ex["text2audio"])
    assert t2a.shape == (d.num_text2audio_seqs * d.num_segment_groups,
                         d.lang_seq_len, 3)
    # each masked subsegment contributes MASK (+MASKAUDIO); budget select
    # protects MASK so all n_trg survive across the groups
    assert (t2a[..., 0] == MASK).sum() == n_trg * d.num_text2audio_seqs
    assert (t2a[..., 0] == MASKAUDIO).sum() <= n_trg * d.num_text2audio_seqs

    a2t = np.asarray(ex["audio2text"])
    assert (a2t[..., 0] == MASK).sum() == n_trg * d.num_audio2text_seqs
    assert (a2t[..., 0] == AUDIOSPAN).sum() % cfg.model.audio_token_length == 0

    matching = np.asarray(ex["audio_text_matching"])
    assert (matching[..., 0] == LTOVPOOL).sum() == d.num_segments

    rt = np.asarray(ex["random_text"])
    assert rt.shape == (d.num_text_seqs, d.seq_len, 3)
    assert (rt[..., 0] == MASK).sum() >= 1

    table = np.asarray(ex["text_spans"])
    expected_rows = (d.num_text2audio_seqs + d.num_audio2text_seqs) * n_trg \
        + d.num_text_seqs * d.text_span_budget
    assert table.shape == (expected_rows, cfg.model.text_span_length)
    assert (table != PADDING).any(-1).sum() >= expected_rows // 2

    clips = np.asarray(ex["audio_clips"])
    assert clips.shape == (d.num_segments, d.num_audio_subsegments,
                           cfg.model.audio_seq_length, d.num_mels + 1)
    assert np.isfinite(clips).all()


@pytest.mark.parametrize("span_len", [
    11, pytest.param(18, marks=pytest.mark.slow)])
def test_build_non_default_span_length(cfg, segments, span_len):
    """text_span_length != 15 must still build: the random_text span table
    keeps the configured width (regression: it was hard-coded to 15, which
    broke the span-table concat) and fake-segment rows up to 15 tokens are
    not truncated by the span-table width."""
    import dataclasses

    c = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, text_span_length=span_len))
    b = DeviceExampleBuilder(c)
    raw = b.host_prepare(segments[0])
    ex = jax.jit(b.build)(jax.random.PRNGKey(3),
                          jax.tree.map(jnp.asarray, raw))
    d = c.data
    expected_rows = (d.num_text2audio_seqs + d.num_audio2text_seqs) * b.n_trg \
        + d.num_text_seqs * d.text_span_budget
    table = np.asarray(ex["text_spans"])
    assert table.shape == (expected_rows, span_len)
    assert (np.asarray(ex["text2audio"])[..., 0] == MASK).sum() == \
        b.n_trg * d.num_text2audio_seqs


@pytest.mark.slow
def test_build_deterministic_given_key(builder, raw):
    raw_j = jax.tree.map(jnp.asarray, raw)
    a = jax.jit(builder.build)(jax.random.PRNGKey(5), raw_j)
    b = jax.jit(builder.build)(jax.random.PRNGKey(5), raw_j)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)
    c = jax.jit(builder.build)(jax.random.PRNGKey(6), raw_j)
    assert any(not np.array_equal(np.asarray(a[k]), np.asarray(c[k]))
               for k in a)


@pytest.mark.slow
def test_build_batch_feeds_train_step(cfg, builder, segments):
    """build_batch output + host-decoded frames == a trainable batch: one
    full pretraining step runs and returns finite losses."""
    import jax.numpy as jnp

    from merlot_reserve_tpu.models import MerlotReservePretrainer
    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.training.optimization import construct_train_state
    from merlot_reserve_tpu.training.trainer import make_jit_train_step

    raws = [builder.host_prepare(s) for s in segments]
    raw_batch = jax.tree.map(jnp.asarray, stack_raw_examples(raws))
    batch = builder.build_batch(jax.random.PRNGKey(0), raw_batch)

    # frames keep the host/native decode path
    host_b = PretrainExampleBuilder(cfg)
    rng = np.random.default_rng(0)
    images = np.stack([
        np.stack([host_b.decode_image(s, rng) for s in segs])
        for segs in segments])
    B = images.shape[0]
    batch = dict(batch)
    batch["images"] = jnp.asarray(
        images.reshape(B, -1, images.shape[-1]).astype(np.float32))

    model = MerlotReservePretrainer.from_config(cfg)
    params = model.init_params({k: np.asarray(v) for k, v in batch.items()})
    state = construct_train_state(cfg.optimizer, model, params)
    step_fn, state = make_jit_train_step(
        make_mesh(dp=1, devices=jax.devices("cpu")[:1]), state)
    state, metrics = step_fn(state, batch)
    for k, v in jax.device_get(metrics).items():
        assert np.isfinite(v), (k, v)


@pytest.mark.slow
def test_span_length_distribution_tracks_host(cfg, builder, segments):
    """Distributional parity for the stochastic masking: the text2audio
    span-length histogram from the device builder must track the host
    engine's over many draws (same record, many keys/seeds)."""
    host_b = PretrainExampleBuilder(cfg)
    raw = builder.host_prepare(segments[0])
    raw_j = jax.tree.map(jnp.asarray, raw)
    build = jax.jit(builder.build)

    def span_lens(table):
        lens = (np.asarray(table) != PADDING).sum(-1)
        return lens[lens > 0]

    dev_lens, host_lens = [], []
    for i in range(12):
        dev_lens.append(span_lens(build(jax.random.PRNGKey(i), raw_j)
                                  ["text_spans"]))
        host_lens.append(span_lens(host_b.build(
            segments[0], np.random.default_rng(i))["text_spans"]))
    dev_lens = np.concatenate(dev_lens)
    host_lens = np.concatenate(host_lens)
    assert abs(dev_lens.mean() - host_lens.mean()) < 1.5
    assert abs(np.median(dev_lens) - np.median(host_lens)) <= 2


@pytest.mark.slow
def test_device_loader_end_to_end(cfg, tmp_path):
    """DevicePretrainLoader: workers decode bytes, the device assembles —
    yielded batches carry the same keys as the host loader's and feed the
    trainer."""
    from merlot_reserve_tpu.data.loader import (DevicePretrainLoader,
                                                PretrainLoader)

    path = os.path.join(tmp_path, "c.tfrecord")
    write_synthetic_corpus(path, cfg, num_records=4, seed=1)

    host_loader = PretrainLoader([path], cfg, batch_size=2, seed=0,
                                 num_workers=2, repeat=False)
    host_batch = next(iter(host_loader))

    dev_loader = DevicePretrainLoader([path], cfg, batch_size=2, seed=0,
                                      num_workers=2, repeat=False)
    batches = list(dev_loader)
    assert len(batches) == 2
    b = batches[0]
    assert set(b) == set(host_batch)
    for k in b:
        assert np.asarray(b[k]).shape == np.asarray(host_batch[k]).shape, k
    # deterministic across loader instances with the same seed
    again = next(iter(DevicePretrainLoader([path], cfg, batch_size=2, seed=0,
                                           num_workers=2, repeat=False)))
    for k in b:
        np.testing.assert_array_equal(np.asarray(b[k]), np.asarray(again[k]),
                                      err_msg=k)


def test_fused_loader_host_bf16_cast(cfg, tmp_path):
    """DevicePretrainLoader(fused=True, use_bfloat16=True) casts images to
    bf16 ON HOST (halving the dominant host->device bytes); every other raw
    array keeps its host dtype and the trainer's in-graph cast is a no-op."""
    import jax.numpy as jnp

    from merlot_reserve_tpu.data.loader import DevicePretrainLoader

    path = os.path.join(tmp_path, "c.tfrecord")
    write_synthetic_corpus(path, cfg, num_records=2, seed=3)

    def first_batch(use_bfloat16):
        loader = DevicePretrainLoader([path], cfg, batch_size=2, seed=0,
                                      num_workers=1, repeat=False, fused=True,
                                      use_bfloat16=use_bfloat16)
        it = iter(loader)
        try:
            return next(it)
        finally:
            it.close()

    b16 = first_batch(True)
    f32 = first_batch(False)
    assert b16["images"].dtype == jnp.bfloat16
    assert f32["images"].dtype == np.float32
    np.testing.assert_array_equal(
        np.asarray(b16["images"], np.float32),
        np.asarray(f32["images"].astype(jnp.bfloat16), np.float32))
    for k in f32:
        if k != "images":
            assert b16[k].dtype == f32[k].dtype, k
            np.testing.assert_array_equal(b16[k], f32[k], err_msg=k)
