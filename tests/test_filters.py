"""Dataset-creation filters + DTW alignment."""

import numpy as np

from merlot_reserve_tpu.dataset_creation.filters import (
    align_using_dtw,
    edit_distance,
    is_static_video,
    mean_pairwise_cosine,
    passes_object_filter,
    transfer_timestamps,
)


def test_static_video_detected():
    rng = np.random.RandomState(0)
    frame = rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
    static = np.stack([frame] * 6)
    assert is_static_video(static)

    moving = rng.randint(0, 256, (6, 64, 64, 3), dtype=np.uint8)
    assert not is_static_video(moving)


def test_object_filter():
    assert passes_object_filter(None)
    assert passes_object_filter([2.0, 1.5])
    assert not passes_object_filter([0.2, 0.1])


def test_edit_distance():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance("", "abc") == 3
    assert edit_distance("same", "same") == 0


def test_dtw_alignment_monotonic():
    src = ["the", "quick", "brown", "fox"]
    tgt = ["the", "quik", "brown", "fx"]
    path = align_using_dtw(src, tgt)
    assert path[0] == (0, 0) and path[-1] == (3, 3)
    # monotonic
    assert all(p2 >= p1 for (p1, _), (p2, _) in zip(path, path[1:]))


def test_transfer_timestamps():
    src = [{"word": w, "start": float(i), "end": float(i) + 0.5}
           for i, w in enumerate(["hello", "world", "its", "me"])]
    out = transfer_timestamps(src, ["helo", "world", "it's", "me"])
    assert len(out) == 4
    assert out[0]["start"] == 0.0
    assert out[1]["word"] == "world" and out[1]["start"] == 1.0
    assert out[3]["start"] == 3.0
