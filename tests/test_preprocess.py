"""Host preprocessing: black bars, array->segments, preprocess_video, and the
full zero-shot slice (segments -> model inputs -> embed_video on CPU)."""

import numpy as np
import pytest

from merlot_reserve_tpu import preprocess as P
from merlot_reserve_tpu.tokenizer import AUDIOSPAN


def test_detect_black_bars():
    rng = np.random.RandomState(0)
    frames = np.zeros((2, 100, 200, 3), np.uint8)
    frames[:, 20:80, 30:170] = rng.randint(40, 255, (2, 60, 140, 3))
    y1, y2, x1, x2 = P.detect_black_bars(frames)
    assert (y1, x1) == (20, 30)
    assert (y2, x2) == (80, 170)  # content edges inside the 20% trim cap


def test_detect_black_bars_caps_trim():
    frames = np.zeros((1, 100, 100, 3), np.uint8)
    frames[:, 45:55, 45:55] = 200  # tiny bright square: trim capped at 20%
    y1, y2, x1, x2 = P.detect_black_bars(frames)
    assert y1 == 20 and y2 == 80 and x1 == 20 and x2 == 80


@pytest.fixture(scope="module")
def segments():
    rng = np.random.RandomState(1)
    n = 4
    frames = rng.randint(0, 256, (n, 120, 160, 3), dtype=np.uint8)
    sr = 22050
    waveform = (0.1 * rng.randn(sr * 21)).astype(np.float32)
    times = [{"start_time": 5.0 * i, "end_time": 5.0 * (i + 1),
              "mid_time": 5.0 * i + 2.5} for i in range(n)]
    return P.segments_from_arrays(frames, waveform, times)


def test_segments_from_arrays(segments):
    assert len(segments) == 4
    for i, seg in enumerate(segments):
        assert seg["spectrogram"].shape == (3, 60, 65)
        assert seg["frame"].shape == (120, 160, 3)
        assert seg["idx"] == i
        # playback speed channel
        np.testing.assert_array_equal(seg["spectrogram"][..., 64], 1.0)


def test_preprocess_video_mixed(segments):
    segs = [dict(s) for s in segments]
    segs[0]["text"] = "a person is cooking"
    segs[0]["use_text_as_input"] = True
    for s in segs[1:]:
        s["use_text_as_input"] = False

    out = P.preprocess_video(segs, output_grid_size=(12, 20))
    assert out["images"].shape == (4, 240, 768)
    assert out["audio_clips"].shape == (12, 60, 65)
    assert out["tokens"].shape == (160,)
    assert out["subseg_idxs"].shape == (160,)

    # audio segments contribute 18 AUDIOSPAN tokens each
    n_audio_tokens = int((out["tokens"] == AUDIOSPAN).sum())
    assert n_audio_tokens == 3 * 18
    # the text segment's subseg idx is 0 (segment 0 * 3)
    text_len = len(out["tokens"]) - (out["tokens"] == 0).sum() - n_audio_tokens
    assert text_len > 0


@pytest.mark.slow
def test_zero_shot_slice_end_to_end(segments):
    """segments -> preprocess_video -> embed_video -> label-space ranking,
    entirely through the public API (tiny model, CPU)."""
    import jax.numpy as jnp

    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.models import MerlotReserve

    segs = [dict(s) for s in segments]
    segs[-1]["text"] = "the next action is <|MASK|>"
    for s in segs[:-1]:
        s["use_text_as_input"] = False

    video_pre = P.preprocess_video(segs, output_grid_size=(4, 4))
    # grid (4,4) -> images [4, 16, 768]
    assert video_pre["images"].shape == (4, 16, 768)

    cfg = mr.load_config("base", hidden_size=64, joint_num_layers=2,
                         vit_num_layers=2, audio_num_layers=2, span_num_layers=2,
                         size_per_head=32, output_grid=(4, 4), use_bfloat16=False)
    model = MerlotReserve.from_config(cfg)
    args = {k: jnp.asarray(v) for k, v in video_pre.items()}
    params = model.init_params_full()
    out = model.apply({"params": params}, **args, method=model.embed_video)
    assert out.shape == (160, 64)
    norms = np.linalg.norm(np.asarray(out, np.float32), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-2)

    # label space through the span encoder
    spans = model.apply({"params": params},
                        jnp.asarray(np.array([[10, 11, 0], [12, 13, 14]], np.int32)),
                        method=model.embed_text_spans_only)
    assert spans.shape == (2, 64)


def test_dense_segments_for_action_segmentation():
    """1-second dense segments: pad_size=0 spectrograms, one [1, 60, 65]
    subsegment per segment (preprocess.py:349-460 semantics)."""
    rng = np.random.RandomState(3)
    n = 5  # odd count exercises the leftover-window path
    frames = rng.randint(0, 256, (n, 120, 160, 3), dtype=np.uint8)
    sr = 22050
    waveform = (0.1 * rng.randn(sr * 8)).astype(np.float32)
    times = [{"start_time": 0.5 + i, "end_time": 1.5 + i,
              "mid_time": 1.0 + i} for i in range(n)]
    segs = P.dense_segments_from_arrays(frames, waveform, times)
    assert len(segs) == n
    for seg in segs:
        assert seg["spectrogram"].shape == (1, 60, 65)
        np.testing.assert_array_equal(seg["spectrogram"][..., 64], 1.0)


def test_flip_if_vertical():
    from merlot_reserve_tpu.data.pretrain_pipeline import flip_if_vertical

    landscape = np.zeros((100, 200, 3), np.uint8)
    assert flip_if_vertical(landscape).shape == (100, 200, 3)
    portrait = np.zeros((400, 100, 3), np.uint8)
    out = flip_if_vertical(portrait)
    assert out.shape == (100, 408, 3)  # rotated + 4px markers each side
    assert (out[:, :4] == 128).all()
