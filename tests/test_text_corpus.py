"""Raw-text corpus iterator."""

import gzip
import json
import os

import numpy as np

from merlot_reserve_tpu.dataset_creation.text_corpus import (
    iter_text_documents,
    token_blob_iterator,
)


def _write_shard(path, docs, gz=False):
    opener = gzip.open if gz else open
    with opener(path, "wt") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")


def test_source_whitelist(tmp_path):
    p = os.path.join(tmp_path, "shard.jsonl")
    _write_shard(p, [
        {"text": "keep me", "meta": {"pile_set_name": "Pile-CC"}},
        {"text": "drop me", "meta": {"pile_set_name": "GitHub"}},
        {"text": "no meta keeps"},
    ])
    docs = list(iter_text_documents([p]))
    assert docs == ["keep me", "no meta keeps"]


def test_token_blobs(tmp_path):
    p = os.path.join(tmp_path, "shard.jsonl.gz")
    _write_shard(p, [{"text": "hello world this is a document. " * 100}], gz=True)
    blobs = list(token_blob_iterator([p], blob_len=64))
    assert len(blobs) >= 5
    for b in blobs:
        assert b.shape == (64,) and b.dtype == np.int32
