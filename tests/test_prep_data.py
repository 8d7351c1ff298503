"""Finetune data-prep utilities."""

import numpy as np

from merlot_reserve_tpu.finetune.prep_data import (
    color_for_name,
    detokenize,
    draw_boxes_on_image,
    relative_localization_tokens,
    rewrite_detection_tags,
    tvqa_segment_times,
)


def test_color_deterministic():
    assert color_for_name("person") == color_for_name("person")
    assert color_for_name("person") != color_for_name("dog")
    assert all(0 <= c <= 255 for c in color_for_name("anything"))


def test_draw_boxes():
    img = np.zeros((100, 100, 3), np.uint8)
    out = draw_boxes_on_image(img, [(10, 10, 50, 50)], ["person"])
    assert out.shape == img.shape
    assert out[10:12, 10:50].sum() > 0  # top border drawn
    assert out[30, 30].sum() == 0  # interior untouched


def test_rewrite_detection_tags():
    names = ["person", "person", "dog"]
    out = rewrite_detection_tags(["Why", "is", [0], "looking", "at", [1, 2], "?"],
                                 names)
    assert "Person 1" in out
    assert "Person 2 and dog 3" in out
    assert out.endswith("?")


def test_detokenize():
    assert detokenize(["Hello", ",", "world", "!"]) == "Hello, world!"
    assert detokenize(["it", "'s", "fine"]) == "it's fine"


def test_tvqa_segment_times():
    segs = tvqa_segment_times(20.0, 25.0, duration=120.0)
    assert len(segs) == 7
    total = segs[-1]["end_time"] - segs[0]["start_time"]
    assert abs(total - 7 * 4.6667) < 1e-3
    # QA span midpoint inside the covered window
    assert segs[0]["start_time"] <= 22.5 <= segs[-1]["end_time"]


def test_relative_localization_tokens():
    segs = tvqa_segment_times(20.0, 25.0, duration=120.0)
    toks = relative_localization_tokens(20.0, 25.0, segs)
    assert toks[-1] == 1  # START terminator
    assert len(toks) > 2
