"""Dataset creation: quantization round trip, offset model, text cleaning,
window splitting, chunk packing — and the closure test: records produced by
the creation pipeline feed the pretraining pipeline."""

import os

import numpy as np
import pytest

from merlot_reserve_tpu.dataset_creation import process as P
from merlot_reserve_tpu.dataset_creation.spectrogram import (
    dequantize_spectrogram,
    quantize_spectrogram,
)
from merlot_reserve_tpu.dataset_creation.text import (
    asciify,
    clean_text,
    number_to_words,
    spell_out_numbers,
)


def test_spectrogram_quantization_roundtrip():
    rng = np.random.RandomState(0)
    log_mel = np.abs(rng.randn(64, 188)).astype(np.float32) * 2
    jpeg, magic = quantize_spectrogram(log_mel)
    back = dequantize_spectrogram(jpeg, magic)
    # JPEG is lossy; bounded error on the 99% mass
    p99 = np.percentile(log_mel, 99)
    err = np.abs(np.minimum(back, p99) - np.minimum(log_mel, p99))
    assert err.mean() < 0.15


def test_offset_model_with_reference_weights():
    if not os.path.exists("/root/reference/data/offset_model/model_params.json"):
        pytest.skip("reference offset weights unavailable")
    from merlot_reserve_tpu.dataset_creation.offset_model import apply_offsets

    words = [{"word": "Hello", "start": 1.0, "end": 1.4, "encoded": [1, 2]},
             {"word": "world", "start": 1.5, "end": 1.9, "encoded": [3]}]
    out = apply_offsets(words)
    assert len(out) == 2
    # corrections are small, bounded by tanh * temperature + bias
    for w0, w1 in zip(words, out):
        assert abs(w1["start"] - w0["start"]) < 2.0
        assert abs(w1["end"] - w0["end"]) < 2.0


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(21) == "twenty one"
    assert number_to_words(105) == "one hundred five"
    assert number_to_words(3200) == "three thousand two hundred"


def test_text_cleaning():
    assert asciify("café ☕ nice") == "cafe  nice"  # accent folds, emoji drops
    import random

    out = spell_out_numbers("i have 3 cats", random.Random(0), prob=1.0)
    assert out == "i have three cats"
    assert clean_text("  hello   world  ") == "hello world"


def test_split_into_windows():
    words = [{"word": f"w{i}", "start": 0.8 * i, "end": 0.8 * i + 0.4}
             for i in range(40)]  # dense words over 32 s
    windows = P.split_into_windows(words, duration=32.0)
    assert all(w["playback_speed"] == 1 for w in windows)
    assert all(abs((w["end_time"] - w["start_time"]) - 5.0) < 1e-6 for w in windows)
    assert len(windows) == 6

    # sparse words -> fast-forward
    sparse = [{"word": f"w{i}", "start": 4.9 * i, "end": 4.9 * i + 0.3}
              for i in range(7)]
    windows = P.split_into_windows(sparse, duration=33.0)
    assert any(w["playback_speed"] > 1 for w in windows)


def test_pack_chunks():
    def chunk(vid):
        return P.VideoChunk(b"", b"", 1.0, [], [], [], 0.0, 5.0, 1, youtube_id=vid)

    videos = iter([[chunk("a")] * 20, [chunk("b")] * 7, [chunk("c")] * 9])
    groups = list(P.pack_chunks(videos, group_size=16))
    assert all(len(g) == 16 for g in groups)
    assert len(groups) == 2  # 36 chunks -> 2 full groups (+4 leftover dropped)
    # second group mixes videos
    vids = {c.youtube_id for c in groups[1]}
    assert len(vids) >= 2


def test_creation_to_training_closure(tmp_path):
    """Records written by the creation pipeline parse and train through the
    pretraining pipeline."""
    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.data.pretrain_pipeline import pretrain_examples_from_file
    from merlot_reserve_tpu.data.tfrecord import write_records

    rng = np.random.RandomState(0)
    sr = 22050
    duration = 42.0
    n_words = 120
    words = [{"word": f"word{i}", "start": duration / n_words * i,
              "end": duration / n_words * i + 0.25} for i in range(n_words)]
    waveform = (0.1 * rng.randn(int(sr * duration))).astype(np.float32)
    frames = rng.randint(0, 256, (8, 180, 320, 3), dtype=np.uint8)

    chunks = P.process_video_arrays(frames, waveform, words, duration,
                                    youtube_id="vidA", title="a test video")
    assert len(chunks) >= 8
    for c in chunks:
        assert len(c.tok_ids) >= 3
        assert c.playback_speed == 1

    # pack two copies into one 16-segment record
    groups = list(P.pack_chunks(iter([chunks, chunks]), group_size=16))
    assert groups
    random_texts = [rng.randint(100, 30000, 600).tolist() for _ in range(16)]
    record = P.chunks_to_record(groups[0], random_texts)

    path = str(tmp_path / "created.tfrecord")
    write_records(path, [record])

    cfg = mr.load_config("base", hidden_size=64, joint_num_layers=2,
                         vit_num_layers=2, audio_num_layers=2, span_num_layers=2,
                         size_per_head=32, output_grid=(4, 4), use_bfloat16=False)
    cfg = cfg.replace_data(num_segments=16, num_segment_groups=2, seq_len=320,
                           lang_seq_len=48, text_span_budget=10)
    ex = next(iter(pretrain_examples_from_file(path, cfg, seed=0)))
    assert ex["images"].shape == (16, 16, 768)
    assert ex["audio_clips"].shape == (16, 3, 60, 65)
    assert np.isfinite(ex["audio_clips"]).all()
    # packing produced at least 2 video sources when the group mixes videos
    assert ex["video_src_index"].max() >= 1


def test_youtube_screening_pipeline():
    """The acquisition acceptance gates mirror the reference's
    download_id pipeline (download_youtube.py:286-430): transcript
    presence, duration, gaming category, word density, English check —
    each with its recorded fail reason."""
    from merlot_reserve_tpu.dataset_creation.youtube import (looks_english,
                                                             screen_video,
                                                             words_per_30s)

    def transcript(n, rate_per_30s, english=True):
        words = ("so this is the thing that we are going to do now and then "
                 "we will see what it does").split() if english else \
            ["zxqv%d" % i for i in range(20)]
        out = []
        for i in range(n):
            t = i * (30.0 / rate_per_30s)
            out.append({"word": words[i % len(words)], "start": t,
                        "end": t + 0.2})
        return out

    meta = {"title": "How to cook the best pasta at home",
            "description": "In this video we show you the way to do it",
            "tags": "cooking pasta", "duration": 300.0, "categories": []}

    good = screen_video(meta, transcript(600, 60))
    assert good["ok"], good
    assert max(good["_words_per_30s"]) >= 50

    assert screen_video(meta, [])["fail_reason"] == "no transcript"
    assert screen_video(dict(meta, duration=30 * 60),
                        transcript(600, 60))["fail_reason"] == "video too long"
    assert screen_video(dict(meta, categories=["Gaming"]),
                        transcript(600, 60))["fail_reason"] == "gaming"
    sparse = screen_video(meta, transcript(100, 10))
    assert sparse["fail_reason"] == "word density too low"
    nonen = screen_video(dict(meta, title="zxq vbn", description=""),
                         transcript(600, 60, english=False))
    assert nonen["fail_reason"] == "maybe not english"

    # density histogram shape
    assert words_per_30s([0.0, 1.0, 31.0]) == [2, 1]
    assert words_per_30s([]) == [0]

    # language proxy accepts real English, rejects gibberish
    assert looks_english("A day in the life", "we go to the park and see "
                         "what is there", ["the", "dog", "is", "here"])
    assert not looks_english("zzz", "", ["qqq", "vvv"])
