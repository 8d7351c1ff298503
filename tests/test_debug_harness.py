"""Dataloader debug harness: readable decoding, histograms, KL, corpus report."""

import os
from collections import Counter

import numpy as np
import pytest

import merlot_reserve_tpu as mr
from merlot_reserve_tpu.data import debug as D
from merlot_reserve_tpu.data.pretrain_pipeline import pretrain_examples_from_file
from merlot_reserve_tpu.data.synthetic import write_synthetic_corpus
from merlot_reserve_tpu.tokenizer import AUDIOSPAN, MASK, PADDING


def test_tokens_to_readable():
    toks = np.asarray([AUDIOSPAN] * 6 + [100, 200] + [MASK] + [PADDING] * 3)
    aptr = np.asarray([2] * 6 + [0, 0, 0, 0, 0, 0])
    tptr = np.asarray([-1] * 8 + [5] + [-1] * 3)
    s = D.tokens_to_readable(toks, aptr, tptr)
    assert "<AUDIO x6@2>" in s
    assert "<MASK->5>" in s
    assert "<PAD>" not in s


def test_histogram_and_kl():
    spans = np.zeros((5, 15), np.int32)
    spans[0, :3] = 7
    spans[1, :3] = 7
    spans[2, :1] = 7
    h = D.span_length_histogram(spans)
    assert h == Counter({3: 2, 1: 1})
    assert D.kl_divergence(h, h) < 1e-9
    assert D.kl_divergence(h, Counter({10: 5})) > 1.0


def test_corpus_report(tmp_path, capsys):
    cfg = mr.load_config("base", hidden_size=64, joint_num_layers=2,
                         vit_num_layers=2, audio_num_layers=2, span_num_layers=2,
                         size_per_head=32, output_grid=(4, 4), use_bfloat16=False)
    cfg = cfg.replace_data(num_segments=8, num_segment_groups=2, seq_len=168,
                           lang_seq_len=48, text_span_budget=10)
    corpus = write_synthetic_corpus(os.path.join(tmp_path, "c.tfrecord"), cfg,
                                    num_records=3)
    report = D.corpus_report(pretrain_examples_from_file(corpus, cfg, seed=0))
    assert report["num_examples"] == 3
    assert report["text2audio/num_spans"] > 0
    assert report["audio2text/num_spans"] > 0
    assert np.isfinite(report["kl(text2audio||audio2text)"])
    out = capsys.readouterr().out
    assert "text2audio:" in out
