"""Tokenizer: the 32768-token lowercasing byte-level BPE the checkpoints were
trained with, plus the special-token id contract.

Special ids follow /root/reference/mreserve/lowercase_encoder.py:9-16 — the
embedding table rows for these ids are baked into the public checkpoints, so
they are part of the compatibility surface.

The vocab file (``lowercase_encoder.json``, a HuggingFace ``tokenizers`` dump
with a lowercase BertNormalizer + ByteLevel pretokenizer) is a ~900KB data
artifact.  It is *not* checked into this repo; ``get_tokenizer`` resolves it
from (in order): an explicit path argument, ``$MERLOT_RESERVE_VOCAB``, a copy
next to this file, or the reference checkout when present.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import List, Optional, Sequence

os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import numpy as np

PADDING = 0
START = 1
END = 2
MASK = 3
MASKAUDIO = 4
AUDIOSPAN = 5
LTOVPOOL = 6
RESETCTX = 9

PAD_TOKEN = "<|PAD|>"
SPECIAL_TOKENS = (
    ["<|PAD|>", "<|START|>", "<|END|>", "<|MASK|>", "<|MASKAUDIO|>",
     "<|AUDIOSPAN|>", "<|LTOVPOOL|>"]
    + [f"<|unused{i}|>" for i in range(3)]
)

_VOCAB_SEARCH_PATHS = (
    os.environ.get("MERLOT_RESERVE_VOCAB", ""),
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "lowercase_encoder.json"),
    "/root/reference/mreserve/lowercase_encoder.json",
)


def vocab_path() -> str:
    for p in _VOCAB_SEARCH_PATHS:
        if p and os.path.exists(p):
            return p
    raise FileNotFoundError(
        "lowercase_encoder.json not found. Set $MERLOT_RESERVE_VOCAB to the "
        "BPE vocab file shipped with merlot_reserve checkpoints.")


@lru_cache(maxsize=4)
def get_tokenizer(path: Optional[str] = None):
    """Load the BPE tokenizer (HuggingFace `tokenizers.Tokenizer`)."""
    from tokenizers import Tokenizer

    return Tokenizer.from_file(path or vocab_path())


def encode(text: str, tokenizer=None) -> List[int]:
    tok = tokenizer or get_tokenizer()
    return tok.encode(text).ids


def decode(ids: Sequence[int], tokenizer=None, skip_special_tokens: bool = False) -> str:
    tok = tokenizer or get_tokenizer()
    return tok.decode(list(ids), skip_special_tokens=skip_special_tokens)


def encode_batch_padded(texts: Sequence[str], length: int, tokenizer=None) -> np.ndarray:
    """Encode ``texts`` into an [B, length] int32 matrix padded/truncated to
    ``length`` — the label-space encoding used by zero-shot inference
    (cf. /root/reference/mreserve/modeling.py:1024-1032)."""
    tok = tokenizer or get_tokenizer()
    tok.enable_padding(pad_token=PAD_TOKEN, pad_id=PADDING, length=length)
    try:
        out = np.array([e.ids[:length] for e in tok.encode_batch(list(texts))], dtype=np.int32)
    finally:
        tok.no_padding()
    return out


_BANNED_MASK_TOKENS = (149, 4858, 9504, 15162, 22312, 22433, 32156)


@lru_cache(maxsize=1)
def token_is_valid_table() -> "np.ndarray":
    """Boolean [vocab] table of tokens eligible for span masking: id > 10 and
    the surface form matches ^[ A-Za-z0-9']*$, minus 7 hand-banned ids — the
    maskability gate from /root/reference/pretrain/dataloader.py:383-387."""
    import re

    tok = get_tokenizer()
    vocab_size = tok.get_vocab_size()
    pattern = re.compile(r"^[ A-Za-z0-9']*$")
    ok = np.zeros(vocab_size, dtype=bool)
    for tid in range(vocab_size):
        ok[tid] = tid > 10 and bool(pattern.match(tok.decode([tid])))
    ok[list(_BANNED_MASK_TOKENS)] = False
    return ok
