"""Masking engine semantics (dataloader.py:150-446 equivalents)."""

import numpy as np
import pytest

from merlot_reserve_tpu.data import masking as M
from merlot_reserve_tpu.tokenizer import AUDIOSPAN, MASK, MASKAUDIO


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _ragged(rows):
    values = np.concatenate([np.asarray(r, np.int64) for r in rows if len(r)]) \
        if any(len(r) for r in rows) else np.zeros(0, np.int64)
    return M.Ragged.from_row_lengths(values, [len(r) for r in rows])


def test_shift_right_to_left():
    r = _ragged([[1, 2], [3, 4], [5]])
    out = M.shift_ragged_tokens_at_positions(r, [1], right_to_left=True)
    assert out.rows()[0].tolist() == [1, 2, 3]
    assert out.rows()[1].tolist() == [4]
    assert out.rows()[2].tolist() == [5]


def test_shift_left_to_right():
    r = _ragged([[1, 2], [3, 4], [5]])
    out = M.shift_ragged_tokens_at_positions(r, [0], right_to_left=False)
    assert out.rows()[0].tolist() == [1]
    assert out.rows()[1].tolist() == [2, 3, 4]


def test_shift_skips_empty_rows():
    r = _ragged([[1], [], [2]])
    out = M.shift_ragged_tokens_at_positions(r, [1], right_to_left=True)
    assert [len(x) for x in out.rows()] == [1, 0, 1]


def test_reassign_empty_tokens(rng):
    # row 1 is masked and empty; row 0 can donate (len>=2)
    r = _ragged([[1, 2], [], [3]])
    out = M.reassign_empty_tokens(r, np.asarray([1]), rng)
    assert len(out.rows()[1]) == 1  # stole one token
    assert sum(len(x) for x in out.rows()) == 3


def test_mask_tokens_basic(rng):
    r = _ragged([[10, 11], [12], [13, 14, 15], [16]])
    spans, groups = M.mask_tokens(r, [1, 3], rng, num_groups=1)
    # spans == the masked rows' original contents
    assert spans.rows()[0].tolist() == [12]
    assert spans.rows()[1].tolist() == [16]
    out = groups[0]
    toks = out[:, 0]
    # masked rows replaced with single MASK
    assert (toks == MASK).sum() == 2
    # text_ptr set only at MASK positions, pointing at span indices 0,1
    mask_pos = np.where(toks == MASK)[0]
    np.testing.assert_array_equal(out[mask_pos, 2], [0, 1])
    assert (out[toks != MASK, 2] == -1).all()
    # audio_ptr equals originating row index
    assert out[mask_pos, 1].tolist() == [1, 3]


def test_mask_tokens_audio_mask(rng):
    r = _ragged([[10, 11], [12]])
    _, groups = M.mask_tokens(r, [0], rng, num_groups=1, do_audio_mask=True)
    toks = groups[0][:, 0]
    assert toks[0] == MASK and toks[1] == MASKAUDIO


def test_mask_tokens_audio_span(rng):
    r = _ragged([[10, 11], [12], [13]])
    _, groups = M.mask_tokens(r, [0], rng, num_groups=1,
                              do_audio_span=np.asarray([True, True, False]),
                              audio_token_length=4)
    out = groups[0]
    # row 0 masked (wins over audio span); row 1 becomes 4 AUDIOSPAN tokens
    assert (out[:, 0] == AUDIOSPAN).sum() == 4
    aspan_rows = out[out[:, 0] == AUDIOSPAN, 1]
    assert (aspan_rows == 1).all()


def test_mask_tokens_groups(rng):
    r = _ragged([[1], [2], [3], [4]])
    _, groups = M.mask_tokens(r, [0, 2], rng, num_groups=2)
    assert len(groups) == 2
    # group 1's audio_ptr continues global row numbering
    assert groups[1][:, 1].min() >= 2


def test_mask_tokens_padding(rng):
    r = _ragged([[1, 2, 3], [4]])
    _, groups = M.mask_tokens(r, [1], rng, num_groups=1, padded_seq_len=10)
    assert groups[0].shape == (10, 3)
    # padding rows are [0, -1, -1]
    assert (groups[0][4:, 0] == 0).all() and (groups[0][4:, 1] == -1).all()


def test_select_tokens_protects_masks(rng):
    # long sequence, MASK in the middle
    toks = np.stack([np.arange(100, 150), np.repeat(np.arange(10), 5),
                     np.full(50, -1)], 1).astype(np.int32)
    toks[25, 0] = MASK
    out = M.select_tokens(toks, 20, num_segments=10, rng=rng)
    assert len(out) == 20
    assert (out[:, 0] == MASK).sum() == 1


def test_select_tokens_truncates_ends_first(rng):
    toks = np.stack([np.arange(100, 130), np.zeros(30), np.full(30, -1)], 1).astype(np.int32)
    toks[15, 0] = MASK
    out = M.select_tokens(toks, 10, num_segments=1, rng=rng)
    # MASK at position 15 survives; output ordered
    assert (out[:, 0] == MASK).sum() == 1
    assert len(out) == 10


def test_convert_rawtext(rng):
    tokens = np.arange(1000, 3000)
    ragged, lhs, rhs = M.convert_rawtext_into_fake_segments(tokens, 160, 38, rng)
    lens = ragged.row_lengths
    assert (lens >= 1).all() and (lens <= 15).all()
    total = len(lhs) + len(rhs) + int(lens.sum())
    assert total == len(tokens)
    # contiguity: values are a contiguous slice
    np.testing.assert_array_equal(
        ragged.values, tokens[len(lhs):len(lhs) + int(lens.sum())])


def test_place_audio_subsegments(rng):
    for _ in range(20):
        starts = M.place_audio_subsegments(188, 3, 60, rng)
        assert len(starts) == 3
        assert starts[0] >= 0
        assert (np.diff(starts) >= 60).all()
        assert starts[-1] + 60 <= 188


def test_assign_tokens_monotonic():
    toks = np.asarray([0.1, 0.2, 2.0, 0.3, 4.0])  # out-of-order centroid at idx 3
    audio = np.asarray([0.5, 2.5, 4.5])
    a = M.assign_tokens_to_audio(toks, audio)
    assert (np.diff(a) >= 0).all()


def test_span_length_distribution(rng):
    """text2audio-style masking after donation/widening should produce spans
    mostly of length >= 1 with few empty spans (the heuristics' purpose)."""
    empty_before, empty_after = 0, 0
    for trial in range(50):
        lens = rng.integers(0, 5, 12)
        values = rng.integers(100, 1000, int(lens.sum()))
        r = M.Ragged.from_row_lengths(values, lens)
        mask_idx = rng.permutation(12)[:3]
        empty_before += int((r.row_lengths[mask_idx] == 0).sum())
        r2 = M.reassign_empty_tokens(r, mask_idx, rng)
        spans, _ = M.mask_tokens(r2, mask_idx, rng)
        empty_after += int((spans.row_lengths == 0).sum())
    assert empty_after < empty_before
