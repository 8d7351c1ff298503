"""The span-masking engine as fixed-shape device programs.

SURVEY.md §2.5's TPU-native plan: "the ragged masking logic becomes
fixed-shape integer programs". data/masking.py keeps the reference's
semantics (/root/reference/pretrain/dataloader.py:150-446) in host numpy;
this module re-expresses the same operations as jit-compatible JAX so
masking can run inside the device input pipeline (e.g. fused with decode /
augmentation, or resampled per epoch on accelerator).

The enabling observation: every ragged op in the engine — boundary-token
donation (dataloader.py:260-321), time-threshold mask widening (:324-380),
MASK/AUDIOSPAN rewriting (:192-257) — permutes NO values. Tokens stay in
flat order; only the row-length vector changes (and rewriting is a per-row
substitution). So the ragged (values, row_lengths) pair maps directly onto
fixed shapes: values [L] + row_lengths [N], with per-row reductions as
segment_min/max over `repeat(arange(N), row_lengths, total_repeat_length=L)`
and the stochastic choices (direction order, Gumbel subsampling, window
placement) drawn from an explicit jax PRNG key.

Numerical contract: every deterministic function here equals its numpy
counterpart in data/masking.py exactly (tests/test_masking_device.py drives
both with identical inputs); stochastic ones share the distribution but not
the draw.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from merlot_reserve_tpu.tokenizer import AUDIOSPAN, MASK, MASKAUDIO

_BIG = jnp.array(1e4, jnp.float32)


def value_rowids(row_lengths, total_length: int):
    """[N] row lengths -> [L] row ids (static L)."""
    n = row_lengths.shape[0]
    return jnp.repeat(jnp.arange(n), row_lengths,
                      total_repeat_length=total_length)


def shift_row_lengths(row_lengths, positions_onehot, right_to_left: bool = True):
    """Marked rows donate one boundary token to their neighbor — the
    row-length algebra of shift_ragged_tokens_at_positions
    (data/masking.py:131-150; dataloader.py:260-283). ``positions_onehot``
    is bool [N]."""
    amt = (positions_onehot & (row_lengths > 0)).astype(row_lengths.dtype)
    if right_to_left:
        take = amt[1:]
        sub1 = jnp.concatenate([jnp.zeros(1, amt.dtype), -take])
        add1 = jnp.concatenate([take, jnp.zeros(1, amt.dtype)])
    else:
        take = amt[:-1]
        sub1 = jnp.concatenate([-take, jnp.zeros(1, amt.dtype)])
        add1 = jnp.concatenate([jnp.zeros(1, amt.dtype), take])
    return row_lengths + sub1 + add1


def _reassign_one_dir(row_lengths, masked, right_to_left: bool):
    needs = masked & (row_lengths == 0)
    can_donate = (~masked) & (row_lengths >= 2)
    if right_to_left:
        # row i donates right-to-left when it can and row i-1 needs
        pos = jnp.concatenate([jnp.zeros(1, bool), can_donate[1:] & needs[:-1]])
        return shift_row_lengths(row_lengths, pos, right_to_left=True)
    pos = jnp.concatenate([can_donate[:-1] & needs[1:], jnp.zeros(1, bool)])
    return shift_row_lengths(row_lengths, pos, right_to_left=False)


def reassign_empty_tokens(row_lengths, masked, key):
    """Empty masked rows steal one token from an adjacent donor
    (data/masking.py:160-175; dataloader.py:298-321). Direction order is the
    engine's coin flip."""
    a = _reassign_one_dir(_reassign_one_dir(row_lengths, masked, True),
                          masked, False)
    b = _reassign_one_dir(_reassign_one_dir(row_lengths, masked, False),
                          masked, True)
    return jnp.where(jax.random.uniform(key) < 0.5, a, b)


def _row_min_max(vals, row_lengths, total_length: int):
    """Per-row (min, max) of flat float vals under the CURRENT lengths;
    empty rows give (+inf, -inf). Trailing flat-stream padding
    (sum(row_lengths) < total_length) is routed to a discard bin — repeat's
    total_repeat_length pads rids with n-1, which would otherwise fold
    garbage values into the LAST row's extrema."""
    n = row_lengths.shape[0]
    rid = value_rowids(row_lengths, total_length)
    in_stream = jnp.arange(total_length) < jnp.sum(row_lengths)
    rid = jnp.where(in_stream, rid, n)
    mins = jax.ops.segment_min(vals, rid, num_segments=n + 1)[:n]
    maxs = jax.ops.segment_max(vals, rid, num_segments=n + 1)[:n]
    empty = row_lengths == 0
    mins = jnp.where(empty, jnp.inf, mins)
    maxs = jnp.where(empty, -jnp.inf, maxs)
    return mins, maxs


def _increase_one_dir(row_lengths, masked, tok_centroids, audio_start_end,
                      delta_thresh: float, right_to_left: bool):
    """One direction of the time-threshold mask widening
    (data/masking.py:178-217; dataloader.py:324-380)."""
    n = row_lengths.shape[0]
    L = tok_centroids.shape[0]
    mins, maxs = _row_min_max(tok_centroids.astype(jnp.float32), row_lengths, L)

    if right_to_left:
        # masked row m looks at row m+1's earliest token time
        t_next = jnp.concatenate([mins[1:], jnp.full(1, jnp.inf)])
        len_next = jnp.concatenate([row_lengths[1:], jnp.zeros(1, row_lengths.dtype)])
        t_next = jnp.where(len_next <= 1, _BIG, t_next)
        masked_next = jnp.concatenate([masked[1:], jnp.zeros(1, bool)])
        take = masked & ((t_next - audio_start_end[:, 1]) < delta_thresh)
        take &= ~masked_next
        take &= jnp.arange(n) + 1 < n
        # positions = m+1 for each taking masked row m
        pos = jnp.concatenate([jnp.zeros(1, bool), take[:-1]])
        return shift_row_lengths(row_lengths, pos, right_to_left=True)

    t_prev = jnp.concatenate([jnp.full(1, -jnp.inf), maxs[:-1]])
    len_prev = jnp.concatenate([jnp.zeros(1, row_lengths.dtype), row_lengths[:-1]])
    t_prev = jnp.where(len_prev <= 1, -_BIG, t_prev)
    masked_prev = jnp.concatenate([jnp.zeros(1, bool), masked[:-1]])
    take = masked & ((audio_start_end[:, 0] - t_prev) < delta_thresh)
    take &= ~masked_prev
    take &= jnp.arange(n) > 0
    pos = jnp.concatenate([take[1:], jnp.zeros(1, bool)])
    return shift_row_lengths(row_lengths, pos, right_to_left=False)


def increase_textmask(row_lengths, masked, tok_centroids, audio_start_end, key,
                      delta_thresh: float = 0.1):
    """Widen text masks across subsegment borders (dataloader.py:324-380).

    Caution (matches the numpy engine): the per-row min/max regroup uses the
    lengths as updated by the FIRST direction before the second runs.
    """
    f = functools.partial(_increase_one_dir, masked=masked,
                          tok_centroids=tok_centroids,
                          audio_start_end=audio_start_end,
                          delta_thresh=delta_thresh)
    a = f(f(row_lengths, right_to_left=True), right_to_left=False)
    b = f(f(row_lengths, right_to_left=False), right_to_left=True)
    return jnp.where(jax.random.uniform(key) < 0.5, a, b)


# ---------------------------------------------------------------------------
# raw-text fake segmentation
# ---------------------------------------------------------------------------


def rawtext_flat_bound(desired_len: int, span_budget: int,
                       use_v1_stats: bool = False) -> int:
    """Static bound on the raw-text flat stream / fake-segment row count:
    ``L_target = desired_len + (E[span_len]*0.85 - 1) * span_budget``.

    THE single source of this formula — convert_rawtext_into_fake_segments
    sizes its row table with it and DeviceExampleBuilder sizes its
    random-text vals buffer with it; they must stay in sync or row tails
    read clipped garbage with no error."""
    from merlot_reserve_tpu.data.masking import _WEIGHTS_V1, _WEIGHTS_V2

    w = np.asarray(_WEIGHTS_V1 if use_v1_stats else _WEIGHTS_V2)
    ev = float((np.arange(len(w)) * w).sum()) + 1.0
    return desired_len + int((ev * 0.85 - 1) * span_budget)


def convert_rawtext_into_fake_segments(key, tokens, n_tokens, desired_len: int,
                                       span_budget: int,
                                       use_v1_stats: bool = False):
    """Chop raw text into fake 'audio span'-length rows by the empirical
    length distribution (data/masking.py:330-353; dataloader.py:400-446),
    fixed-shape: returns row_lengths over a static max row count plus the
    chosen [offset, offset+l_sel) window.

    :param tokens: [Lmax] flat raw text; n_tokens: actual count (<= Lmax)
    :return: (row_lengths [max(desired_len, L_target)] int32 — zero rows
        beyond the kept spans, offset int32, l_sel int32). Consume as
        values = tokens[offset : offset + l_sel] with these lengths.
    """
    from merlot_reserve_tpu.data.masking import _WEIGHTS_V1, _WEIGHTS_V2

    weights = jnp.asarray(_WEIGHTS_V1 if use_v1_stats else _WEIGHTS_V2,
                          jnp.float32)
    L_target = rawtext_flat_bound(desired_len, span_budget, use_v1_stats)

    k1, k2 = jax.random.split(key)
    L = jnp.minimum(L_target, n_tokens)
    # one categorical draw per potential row. Worst case is all length-1
    # draws, which needs L_target rows — desired_len alone would truncate
    # the many-short-rows tail of the distribution whenever span_budget > 0.
    max_rows = max(desired_len, L_target)
    segm_lens = jax.random.categorical(
        k1, jnp.log(weights)[None].repeat(max_rows, 0), axis=-1) + 1
    keep = jnp.cumsum(segm_lens) <= L
    segm_lens = jnp.where(keep, segm_lens, 0).astype(jnp.int32)

    l_sel = segm_lens.sum()
    wiggle = jnp.maximum(n_tokens - l_sel, 1)
    offset = jax.random.randint(k2, (), 0, wiggle)
    return segm_lens, offset.astype(jnp.int32), l_sel


# ---------------------------------------------------------------------------
# audio placement + assignment
# ---------------------------------------------------------------------------


def place_audio_subsegments(key, spec_size: int, num_subsegments: int,
                            seq_length: int):
    """Random non-overlapping windows via normalized-gap cumsum
    (data/masking.py:361-370; dataloader.py:102-110)."""
    content_len = num_subsegments * seq_length
    paddings = jax.random.uniform(key, (num_subsegments + 1,))
    num_pad = spec_size - content_len
    csum = jnp.cumsum(paddings / paddings.sum())
    paddings_int = (num_pad * csum).astype(jnp.int32)
    return paddings_int[:num_subsegments] + (
        jnp.arange(num_subsegments, dtype=jnp.int32) * seq_length)


def assign_tokens_to_audio(tok_centroids, audio_centroids):
    """Nearest-centroid with monotonic fix (dataloader.py:510-518)."""
    dist = jnp.abs(tok_centroids[:, None] - audio_centroids[None])
    return jax.lax.cummax(jnp.argmin(dist, 1))


# ---------------------------------------------------------------------------
# masking + budget selection (fixed [Lmax, 3] streams)
# ---------------------------------------------------------------------------


def select_tokens(key, tokens, valid, padded_seq_len: int, num_segments: int):
    """Budget subsample of a padded [Lmax, 3] stream (data/masking.py:242-268;
    dataloader.py:150-189): truncate from both ends outside the MASK span,
    then Gumbel top-k protecting MASK tokens with whole-segment preference.

    :param tokens: [Lmax, 3] int32 (token, audio_ptr, text_ptr)
    :param valid: [Lmax] bool; invalid rows are padding at ANY position
    :return: ([padded_seq_len, 3], [padded_seq_len] valid) — real tokens
        compacted to the front in original order.
    """
    Lmax = tokens.shape[0]
    tok = tokens[:, 0]
    L = valid.sum()
    amt_to_truncate = jnp.maximum(L - padded_seq_len, 0)

    is_mask_c = jnp.cumsum(valid & ((tok == MASK) | (tok == MASKAUDIO)))
    is_span_c = jnp.cumsum(valid & (tok == AUDIOSPAN))
    lhs_amt = ((is_mask_c == 0) & (is_span_c == 0) & valid).sum()
    rhs_amt = jnp.maximum(((is_mask_c == is_mask_c[-1]) & valid).sum() - 1, 0)

    trunc_start = jnp.minimum(amt_to_truncate // 2, lhs_amt)
    trunc_end = jnp.minimum(amt_to_truncate - trunc_start, rhs_amt)
    trunc_start = jnp.minimum(amt_to_truncate - trunc_end, lhs_amt)

    pos = jnp.cumsum(valid.astype(jnp.int32)) - 1  # position among real tokens
    keep = valid & (pos >= trunc_start) & (pos < L - trunc_end)

    # Gumbel top-k over the survivors (no-op when already within budget:
    # protected logits keep original tokens in that case via the big valid
    # boost — everything surviving truncation stays selected)
    keep_logits = 1e7 * ((tok == MASK) & keep).astype(jnp.float32)
    seg_score = jax.random.uniform(key, (num_segments,), minval=-1e5, maxval=1e5)
    keep_logits += seg_score[jnp.clip(tokens[:, 1], 0, num_segments - 1)]
    keep_logits = jnp.where(keep, keep_logits, -jnp.inf)
    g = -jnp.log(-jnp.log(jax.random.uniform(
        jax.random.fold_in(key, 1), (Lmax,), minval=1e-20, maxval=1.0)))
    scores = keep_logits + g

    n_keep = jnp.minimum(keep.sum(), padded_seq_len)
    # rank of each element among scores (descending): selected iff rank < n_keep
    order = jnp.argsort(-scores)
    rank = jnp.zeros(Lmax, jnp.int32).at[order].set(jnp.arange(Lmax, dtype=jnp.int32))
    selected = keep & (rank < n_keep)

    # stable compaction to the front, original order preserved
    comp_order = jnp.argsort(~selected, stable=True)
    out = tokens[comp_order][:padded_seq_len]
    out_valid = selected[comp_order][:padded_seq_len]
    out = jnp.where(out_valid[:, None], out,
                    jnp.asarray([0, -1, -1], jnp.int32)[None])
    return out, out_valid


def mask_tokens(key, tokens, row_lengths, masked, *,
                max_row: int,
                do_audio_span=None,
                audio_token_length: int = 6,
                text_span_start_counter: int = 0,
                do_audio_mask: bool = False,
                padded_seq_len: Optional[int] = None,
                num_groups: int = 1,
                text_span_len: int = 15):
    """Rewrite masked/audio rows and emit fixed-shape grouped streams
    (data/masking.py:271-315; dataloader.py:192-257).

    :param tokens: flat [L] int32; :param row_lengths: [N]; masked: [N] bool
    :param max_row: static cap on tokens per output row (>= max input row
        length and >= audio_token_length)
    :return: (text_spans [N, text_span_len] with -1 pad — row i holds row
        i's span iff masked[i]; streams: list of num_groups
        ([grp*max_row or padded_seq_len, 3], valid) streams)
    """
    n = row_lengths.shape[0]
    L = tokens.shape[0]
    rid = value_rowids(row_lengths, L)
    pos_in_row = jnp.arange(L) - jnp.concatenate(
        [jnp.zeros(1, row_lengths.dtype), jnp.cumsum(row_lengths)[:-1]])[rid]

    # dense [N, max_row] of the original rows. Scatter with UNCLIPPED
    # indices and mode='drop': both row-overflow positions (pos_in_row >=
    # max_row) and trailing flat-stream padding (jnp.repeat's
    # total_repeat_length pads rid with n-1, pos_in_row >= that row's
    # length) fall outside the target and are dropped — clipping instead
    # would overwrite the last row's real final token with 0 whenever
    # sum(row_lengths) < L and row_lengths[n-1] == max_row.
    is_real = jnp.arange(L) < jnp.sum(row_lengths)
    rid_safe = jnp.where(is_real, rid, n)  # n is out of bounds -> dropped
    dense = jnp.full((n, max_row), 0, tokens.dtype)
    dense = dense.at[rid_safe, pos_in_row].set(tokens, mode="drop")
    dense_len = jnp.minimum(row_lengths, max_row)

    # text spans: masked rows' original contents, -1 padded
    w = min(max_row, text_span_len)
    span_w = jnp.arange(w)
    spans = jnp.where(
        (span_w[None, :] < dense_len[:, None]) & masked[:, None],
        dense[:, :w], -1).astype(jnp.int32)
    if w < text_span_len:
        spans = jnp.pad(spans, ((0, 0), (0, text_span_len - w)),
                        constant_values=-1)

    # row rewrites
    if do_audio_span is not None:
        do_span = do_audio_span & ~masked
        dense = jnp.where(do_span[:, None],
                          jnp.full((1, max_row), AUDIOSPAN, dense.dtype), dense)
        dense_len = jnp.where(do_span, audio_token_length, dense_len)

    mask_row = jnp.zeros(max_row, dense.dtype).at[0].set(MASK)
    mask_len = 1
    if do_audio_mask:
        mask_row = mask_row.at[1].set(MASKAUDIO)
        mask_len = 2
    dense = jnp.where(masked[:, None], mask_row[None], dense)
    dense_len = jnp.where(masked, mask_len, dense_len)

    text_ptr_row = jnp.cumsum(masked.astype(jnp.int32)) - 1 + text_span_start_counter
    text_ptr_row = jnp.where(masked, text_ptr_row, -1)

    # assemble [N, max_row, 3] then compact per group
    col = jnp.arange(max_row)
    valid_nm = col[None, :] < dense_len[:, None]
    audio_ptr = jnp.broadcast_to(jnp.arange(n)[:, None], (n, max_row))
    text_ptr = jnp.broadcast_to(text_ptr_row[:, None], (n, max_row))
    triples = jnp.stack([dense, audio_ptr.astype(dense.dtype),
                         text_ptr.astype(dense.dtype)], -1)

    grp = n // num_groups
    streams = []
    for g in range(num_groups):
        t = triples[g * grp:(g + 1) * grp].reshape(-1, 3).astype(jnp.int32)
        v = valid_nm[g * grp:(g + 1) * grp].reshape(-1)
        order = jnp.argsort(~v, stable=True)  # compact, order-preserving
        t, v = t[order], v[order]
        if padded_seq_len is not None:
            t, v = select_tokens(jax.random.fold_in(key, g), t, v,
                                 padded_seq_len, num_segments=n)
        streams.append((t, v))
    return spans, streams
