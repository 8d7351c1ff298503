"""Zero-shot toolkit + subtitle parsing."""

import numpy as np
import pytest

from merlot_reserve_tpu.utils.subtitles import parse_vtt, words_to_segments
from merlot_reserve_tpu.zero_shot import (
    question_to_statement,
    topk_accuracy,
    verb_noun_action_accuracy,
)

VTT = """WEBVTT
Kind: captions
Language: en

00:00:00.000 --> 00:00:02.000
hello<00:00:00.500><c> world</c><00:00:01.000><c> again</c>

00:00:02.000 --> 00:00:04.000
plain cue words here
"""


def test_parse_vtt_word_level():
    words = parse_vtt(VTT)
    surface = [w["word"] for w in words]
    assert surface[:3] == ["hello", "world", "again"]
    hello = words[0]
    assert hello["start"] == 0.0 and abs(hello["end"] - 0.5) < 1e-6
    world = words[1]
    assert abs(world["start"] - 0.5) < 1e-6


def test_parse_vtt_plain_cue():
    words = parse_vtt(VTT)
    plain = [w for w in words if w["word"] in ("plain", "cue", "words", "here")]
    assert len(plain) == 4
    assert all(2.0 <= w["start"] < 4.0 for w in plain)


def test_words_to_segments():
    words = parse_vtt(VTT)
    segs = words_to_segments(words, [
        {"start_time": 0.0, "end_time": 2.0},
        {"start_time": 2.0, "end_time": 4.0},
    ])
    assert "hello" in segs[0] and "plain" in segs[1]


def test_topk_accuracy():
    logits = np.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    labels = np.asarray([1, 2])
    acc = topk_accuracy(logits, labels, ks=(1, 2))
    assert acc["top1"] == 0.5
    assert acc["top2"] == 0.5  # example 1's label ranks 3rd


def test_verb_noun_action_accuracy():
    # 4 actions = (verb, noun) pairs: (0,0), (0,1), (1,0), (1,1)
    a2v = np.asarray([0, 0, 1, 1])
    a2n = np.asarray([0, 1, 0, 1])
    logits = np.asarray([[5.0, 1.0, 0.0, 0.0]])  # predicts action 0
    labels = np.asarray([1])  # true action 1 -> verb 0, noun 1
    acc = verb_noun_action_accuracy(logits, labels, a2v, a2n, ks=(1,))
    assert acc["action_top1"] == 0.0
    assert acc["verb_top1"] == 1.0  # predicted verb 0 == true verb 0
    assert acc["noun_top1"] == 0.0


def test_question_to_statement():
    assert question_to_statement("What is the man holding?") == \
        "the man holding is <|MASK|>"
    out = question_to_statement("Why did she leave?")
    assert out.endswith("<|MASK|>")


def test_attach_subtitles_midpoint_bucketing():
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "demo", "load_video.py")
    spec = importlib.util.spec_from_file_location("_load_video", path)
    lv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(lv)
    segments = [{"start_time": 0.0, "end_time": 5.0},
                {"start_time": 5.0, "end_time": 10.0}]
    words = [{"word": "hello", "start": 0.5, "end": 1.0},
             {"word": "world", "start": 4.8, "end": 5.4},   # midpoint 5.1 -> seg 1
             {"word": "bye", "start": 9.0, "end": 9.5},
             {"word": "late", "start": 11.0, "end": 12.0}]  # outside -> dropped
    out = lv.attach_subtitles(segments, words)
    assert out[0]["sub"] == "hello"
    assert out[1]["sub"] == "world bye"


def test_statement_for_qa_item_prefers_reference_infill():
    from merlot_reserve_tpu.zero_shot import statement_for_qa_item

    # the reference's {split}_infill.json: the GPT-3 rewrite is written
    # back into 'question' with the <|MASK|> slot (qa_to_infill.py:59-63)
    item = {"question": "a car is being driven through <|MASK|>."}
    assert statement_for_qa_item(item) == item["question"]
    # explicit statement wins over everything
    assert statement_for_qa_item(
        {"question": "x?", "statement": "y <|MASK|>"}) == "y <|MASK|>"
    # plain question (or a failed rewrite left as the raw question)
    # falls back to the heuristic
    out = statement_for_qa_item({"question": "What is the man holding?"})
    assert out == "the man holding is <|MASK|>"
