"""Device masking engine vs the host numpy engine.

Every deterministic op in ops/masking_device.py must equal its
data/masking.py counterpart exactly on identical inputs (the numpy engine is
itself oracle-parity-tested against the reference's TF functions in
test_masking_parity.py, so transitivity covers the reference). Stochastic
ops are checked by invariants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merlot_reserve_tpu.data import masking as host
from merlot_reserve_tpu.ops import masking_device as dev
from merlot_reserve_tpu.tokenizer import AUDIOSPAN, MASK, MASKAUDIO


def _random_ragged(rng, n_rows=12, max_len=7):
    lens = rng.integers(0, max_len, size=n_rows)
    vals = rng.integers(10, 30000, size=int(lens.sum()))
    return vals.astype(np.int64), lens.astype(np.int64)


@pytest.mark.parametrize("rl", [True, False])
def test_shift_matches_host(rl):
    rng = np.random.default_rng(0)
    for trial in range(10):
        vals, lens = _random_ragged(rng)
        marked = rng.random(len(lens)) < 0.4
        r = host.Ragged(vals, lens.copy())
        out_host = host.shift_ragged_tokens_at_positions(
            r, np.where(marked)[0], right_to_left=rl).row_lengths
        out_dev = dev.shift_row_lengths(jnp.asarray(lens), jnp.asarray(marked),
                                        right_to_left=rl)
        np.testing.assert_array_equal(np.asarray(out_dev), out_host)


@pytest.mark.parametrize("rl", [True, False])
def test_reassign_one_dir_matches_host(rl):
    rng = np.random.default_rng(1)
    for trial in range(10):
        vals, lens = _random_ragged(rng)
        masked = rng.random(len(lens)) < 0.4
        r = host.Ragged(vals, lens.copy())
        out_host = host._reassign_one_dir(
            r, mask_idx=np.where(masked)[0], right_to_left=rl).row_lengths
        out_dev = dev._reassign_one_dir(jnp.asarray(lens), jnp.asarray(masked), rl)
        np.testing.assert_array_equal(np.asarray(out_dev), out_host)


@pytest.mark.parametrize("rl", [True, False])
def test_increase_one_dir_matches_host(rl):
    rng = np.random.default_rng(2)
    for trial in range(10):
        n_rows = 10
        lens = rng.integers(0, 5, size=n_rows).astype(np.int64)
        L = int(lens.sum())
        cent = np.sort(rng.uniform(0, 30, size=L))
        vals = rng.integers(10, 30000, size=L).astype(np.int64)
        masked = rng.random(n_rows) < 0.35
        # audio windows roughly ordered in time
        starts = np.sort(rng.uniform(0, 25, size=n_rows))
        ase = np.stack([starts, starts + 3.0], -1)

        r = host.Ragged(vals, lens.copy())
        out_host = host._increase_one_dir(
            r, mask_idx=np.where(masked)[0], tok_centroids_vals=cent,
            audio_start_end=ase, delta_thresh=0.5, right_to_left=rl).row_lengths
        out_dev = dev._increase_one_dir(
            jnp.asarray(lens), jnp.asarray(masked), jnp.asarray(cent),
            jnp.asarray(ase), 0.5, rl)
        np.testing.assert_array_equal(np.asarray(out_dev), out_host,
                                      err_msg=f"trial {trial} rl={rl}")


def test_assign_tokens_to_audio_matches_host():
    rng = np.random.default_rng(3)
    tok = np.sort(rng.uniform(0, 20, size=40))
    aud = np.sort(rng.uniform(0, 20, size=6))
    np.testing.assert_array_equal(
        np.asarray(dev.assign_tokens_to_audio(jnp.asarray(tok), jnp.asarray(aud))),
        host.assign_tokens_to_audio(tok, aud))


def test_place_audio_subsegments_invariants():
    starts = np.asarray(dev.place_audio_subsegments(
        jax.random.PRNGKey(0), spec_size=188, num_subsegments=3, seq_length=60))
    assert starts.shape == (3,)
    assert (starts >= 0).all() and starts[-1] + 60 <= 188
    assert (np.diff(starts) >= 60).all()  # non-overlapping


def test_mask_tokens_matches_host_unbudgeted():
    """Without a budget, the device stream's valid prefix must equal the host
    [L, 3] output rows exactly (tokens, audio_ptr, text_ptr)."""
    rng_np = np.random.default_rng(4)
    for do_audio_mask in (False, True):
        vals, lens = _random_ragged(rng_np, n_rows=8, max_len=6)
        masked = np.zeros(8, bool)
        masked[[1, 4]] = True
        do_span = np.zeros(8, bool)
        do_span[[2, 6]] = True

        r = host.Ragged(vals.copy(), lens.copy())
        spans_h, streams_h = host.mask_tokens(
            r, np.where(masked)[0], np.random.default_rng(0),
            do_audio_span=do_span, audio_token_length=6,
            text_span_start_counter=5, num_groups=1,
            do_audio_mask=do_audio_mask)

        spans_d, streams_d = dev.mask_tokens(
            jax.random.PRNGKey(0), jnp.asarray(vals), jnp.asarray(lens),
            jnp.asarray(masked), max_row=8, do_audio_span=jnp.asarray(do_span),
            audio_token_length=6, text_span_start_counter=5,
            do_audio_mask=do_audio_mask, num_groups=1)

        t, v = streams_d[0]
        t = np.asarray(t)[np.asarray(v)]
        np.testing.assert_array_equal(t, streams_h[0])

        # text spans: masked rows' contents
        spans_d = np.asarray(spans_d)
        for k, m in enumerate(np.where(masked)[0]):
            row = spans_h.row(k)
            got = spans_d[m][spans_d[m] >= 0]
            np.testing.assert_array_equal(got, row)


def test_select_tokens_truncation_matches_host():
    """When both-end truncation alone reaches the budget, host and device
    must pick exactly the same window (no sampling involved)."""
    # 30 tokens: 10 plain, 3 MASK, 10 plain, rest plain tail
    toks = np.zeros((30, 3), np.int32)
    toks[:, 0] = np.arange(100, 130)
    toks[12:15, 0] = MASK
    toks[:, 1] = np.arange(30) // 5
    toks[:, 2] = -1
    budget = 6  # forces truncation close to the mask span
    out_h = host.select_tokens(toks.copy(), budget, num_segments=6,
                               rng=np.random.default_rng(0))
    out_d, valid_d = dev.select_tokens(
        jax.random.PRNGKey(0), jnp.asarray(toks),
        jnp.ones(30, bool), budget, num_segments=6)
    out_d = np.asarray(out_d)[np.asarray(valid_d)]
    # both keep all 3 MASK tokens and hit the budget
    assert (out_h[:, 0] == MASK).sum() == 3
    assert (out_d[:, 0] == MASK).sum() == 3
    assert len(out_d) == budget and len(out_h) == budget
    # device output preserves original order
    assert (np.diff(out_d[:, 0][out_d[:, 0] != MASK]) > 0).all()


def test_select_tokens_under_budget_identity():
    toks = np.zeros((10, 3), np.int32)
    toks[:, 0] = np.arange(50, 60)
    toks[3, 0] = MASK
    out_d, valid_d = dev.select_tokens(
        jax.random.PRNGKey(1), jnp.asarray(toks), jnp.ones(10, bool),
        padded_seq_len=16, num_segments=4)
    assert np.asarray(valid_d).sum() == 10
    np.testing.assert_array_equal(np.asarray(out_d)[:10], toks)


def test_fake_segments_distribution_and_budget():
    """Device fake segmentation: spans bounded by the selected window, span
    lengths in [1, 15], and the span-length distribution tracks the
    empirical weights (same contract the host engine is tested to)."""
    Lmax, desired_len, budget = 512, 64, 38
    tokens = np.arange(1000, 1000 + Lmax).astype(np.int32)
    counts = np.zeros(16, np.int64)
    for seed in range(50):
        lens, offset, l_sel = dev.convert_rawtext_into_fake_segments(
            jax.random.PRNGKey(seed), jnp.asarray(tokens), Lmax,
            desired_len, budget)
        lens, offset, l_sel = np.asarray(lens), int(offset), int(l_sel)
        assert l_sel == lens.sum()
        assert offset + l_sel <= Lmax
        real = lens[lens > 0]
        assert (real >= 1).all() and (real <= 15).all()
        np.add.at(counts, real, 1)
    # distribution sanity: mid lengths (4-7) dominate extremes, per weights
    assert counts[4:8].sum() > counts[12:16].sum()
    assert counts[4:8].sum() > counts[1]


def test_full_chain_vmaps_and_jits():
    """The batched form the device loader uses: reassign -> widen -> mask ->
    select, vmapped over examples inside one jit."""
    import functools

    B, N, L, MAX_ROW, SEQ = 4, 12, 48, 8, 24

    def one(key, tokens, lens, masked, cent, ase):
        k1, k2, k3 = jax.random.split(key, 3)
        lens = dev.reassign_empty_tokens(lens, masked, k1)
        lens = dev.increase_textmask(lens, masked, cent, ase, k2)
        spans, streams = dev.mask_tokens(
            k3, tokens, lens, masked, max_row=MAX_ROW, do_audio_mask=True,
            padded_seq_len=SEQ, num_groups=2)
        return spans, streams[0][0], streams[0][1]

    rng = np.random.default_rng(7)
    lens = np.minimum(rng.integers(0, MAX_ROW // 2, size=(B, N)), L // N).astype(np.int32)
    tokens = rng.integers(10, 30000, size=(B, L)).astype(np.int32)
    cent = np.sort(rng.uniform(0, 30, size=(B, L)), axis=-1).astype(np.float32)
    masked = rng.random((B, N)) < 0.25
    starts = np.sort(rng.uniform(0, 25, size=(B, N)), axis=-1)
    ase = np.stack([starts, starts + 3.0], -1).astype(np.float32)
    keys = jax.vmap(jax.random.PRNGKey)(np.arange(B, dtype=np.uint32))

    spans, t0, v0 = jax.jit(jax.vmap(one))(
        keys, jnp.asarray(tokens), jnp.asarray(lens), jnp.asarray(masked),
        jnp.asarray(cent), jnp.asarray(ase))
    assert spans.shape == (B, N, 15)
    assert t0.shape == (B, SEQ, 3)
    # stream 0 covers rows [0, N/2): its masked rows appear as MASK tokens
    t0, v0, = np.asarray(t0), np.asarray(v0)
    for b in range(B):
        n_masked_g0 = int(masked[b, :N // 2].sum())
        assert (t0[b][v0[b]][:, 0] == MASK).sum() == n_masked_g0


@pytest.mark.slow
def test_masked_stream_feeds_model_in_one_jit():
    """End-to-end in-graph composition: raw tokens -> device masking ->
    [L, 3] stream -> prepare_multimodal_inputs -> joint transformer, all
    inside ONE jit — the on-accelerator re-masking path."""
    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.models import MerlotReserve

    cfg = mr.load_config("base", hidden_size=64, joint_num_layers=2,
                         vit_num_layers=2, audio_num_layers=2,
                         span_num_layers=2, size_per_head=32,
                         output_grid=(4, 4), use_bfloat16=False)
    model = MerlotReserve.from_config(cfg)

    N, MAX_ROW, SEQ = 12, 8, 48
    rng = np.random.default_rng(9)
    lens = rng.integers(1, 5, size=N).astype(np.int32)
    L = 48
    tokens = rng.integers(10, 30000, size=L).astype(np.int32)
    masked = np.zeros(N, bool)
    masked[[3, 8]] = True

    params = model.init_params_full()

    def fwd(params, key, tokens, lens, masked):
        _, streams = dev.mask_tokens(key, tokens, lens, masked,
                                     max_row=MAX_ROW, do_audio_mask=True,
                                     padded_seq_len=SEQ, num_groups=1)
        stream, valid = streams[0]
        toks = jnp.where(valid, stream[:, 0], 0)[None]
        seg_idx = jnp.clip(stream[:, 1], 0, N - 1)[None] // 3

        def run(m):
            mm = m.prepare_multimodal_inputs(tokens=toks,
                                             token_segment_idx=seg_idx)
            out = m.joint_transformer(
                mm["x"], rotary_coords=mm["rotary_coords"],
                is_valid=mm["is_valid"], segment_ids=mm["segment_ids"])["seq"]
            return out, stream

        return model.apply({"params": params}, method=run)

    out, stream = jax.jit(fwd)(params, jax.random.PRNGKey(0),
                               jnp.asarray(tokens), jnp.asarray(lens),
                               jnp.asarray(masked))
    assert out.shape == (1, SEQ, 64)
    assert np.isfinite(np.asarray(out)).all()
    # both masked rows surfaced as MASK (+MASKAUDIO) in the stream
    s = np.asarray(stream)
    assert (s[:, 0] == MASK).sum() == 2
    assert (s[:, 0] == MASKAUDIO).sum() == 2


def test_mask_tokens_trailing_padding_full_last_row():
    """Regression (r2 advisor): trailing flat-stream padding + last row at
    exactly max_row used to clip the padding scatter onto the last column,
    overwriting the row's real final token with 0."""
    tokens = np.asarray([20, 21, 22, 23, 99, 98], np.int32)  # 2 pad tokens
    lens = np.asarray([4], np.int32)
    masked = np.asarray([False])
    _, streams = dev.mask_tokens(
        jax.random.PRNGKey(0), jnp.asarray(tokens), jnp.asarray(lens),
        jnp.asarray(masked), max_row=4, num_groups=1)
    t, v = streams[0]
    t, v = np.asarray(t), np.asarray(v)
    np.testing.assert_array_equal(t[v][:, 0], [20, 21, 22, 23])


def test_fake_segments_short_row_tail_not_truncated():
    """Regression (r2 advisor): with span_budget > 0 the target token count
    L exceeds desired_len, so the row bound must be L_target, not
    desired_len — otherwise the many-short-rows tail is cut and l_sel falls
    far short of L."""
    Lmax, desired_len, budget = 512, 8, 38
    tokens = np.arange(Lmax).astype(np.int32)
    for seed in range(20):
        lens, offset, l_sel = dev.convert_rawtext_into_fake_segments(
            jax.random.PRNGKey(seed), jnp.asarray(tokens), Lmax,
            desired_len, budget)
        lens, l_sel = np.asarray(lens), int(l_sel)
        assert lens.shape[0] >= desired_len
        assert l_sel == lens.sum()
        # keep = cumsum <= L drops at most the one overshooting row (< 15
        # tokens); the old desired_len bound left l_sel at ~48 of L~170
        from merlot_reserve_tpu.data.masking import _WEIGHTS_V2
        ev = float((np.arange(len(_WEIGHTS_V2)) * np.asarray(_WEIGHTS_V2)).sum()) + 1.0
        L_target = desired_len + int((ev * 0.85 - 1) * budget)
        assert l_sel >= min(L_target, Lmax) - 15


@pytest.mark.slow
def test_mask_tokens_budgeted_invariants():
    rng_np = np.random.default_rng(5)
    vals, lens = _random_ragged(rng_np, n_rows=12, max_len=8)
    masked = np.zeros(12, bool)
    masked[[2, 7, 9]] = True
    _, streams = dev.mask_tokens(
        jax.random.PRNGKey(2), jnp.asarray(vals), jnp.asarray(lens),
        jnp.asarray(masked), max_row=10, do_audio_mask=True,
        padded_seq_len=20, num_groups=2)
    for t, v in streams:
        t, v = np.asarray(t), np.asarray(v)
        assert t.shape == (20, 3)
        # every group keeps its MASK/MASKAUDIO tokens under the budget
        assert ((t[:, 0] == MASK) | (t[:, 0] == MASKAUDIO)).sum() >= 1
        assert (~v[v.argmin():]).all() or v.all()  # valid prefix layout


def test_increase_textmask_ignores_trailing_padding():
    """Regression: a padded flat stream (sum(row_lengths) < len(vals), the
    device-builder layout) must widen exactly like the exact-length stream —
    pad centroids used to pollute the LAST row's min/max (repeat pads rids
    with n-1), spuriously triggering the widen-right of the row before it."""
    # masked row 0 looks right at row 1 (length 2, real min 5.0: far from
    # the 1.0 audio boundary -> NO widen). Pad centroids 1.05 would fake
    # min 1.05 -> spurious widen pre-fix.
    lens = np.asarray([1, 2], np.int32)
    cent = np.asarray([0.0, 5.0, 6.0], np.float32)
    ase = np.asarray([[0.0, 1.0], [4.9, 7.0]], np.float32)
    masked = np.asarray([True, False])
    key = jax.random.PRNGKey(0)

    exact = np.asarray(dev.increase_textmask(
        jnp.asarray(lens), jnp.asarray(masked), jnp.asarray(cent),
        jnp.asarray(ase), key))
    np.testing.assert_array_equal(exact, lens)  # no widening happens

    cent_pad = np.concatenate([cent, np.full(6, 1.05, np.float32)])
    padded = np.asarray(dev.increase_textmask(
        jnp.asarray(lens), jnp.asarray(masked), jnp.asarray(cent_pad),
        jnp.asarray(ase), key))
    np.testing.assert_array_equal(exact, padded)


@pytest.mark.slow
def test_fuzz_host_device_op_parity():
    """Randomized-shape sweep over the deterministic host<->device op pairs,
    deliberately covering the edge regimes where past bugs lived: empty
    rows, rows at exactly max_row, all/none masked, and trailing flat-stream
    padding (r2 advisor bug class). Seeded — failures reproduce."""
    rng = np.random.default_rng(1234)
    for trial in range(10):
        n_rows = int(rng.integers(1, 20))
        max_len = int(rng.integers(1, 9))
        lens = rng.integers(0, max_len + 1, size=n_rows).astype(np.int64)
        if trial == 0:
            lens[:] = 0                     # all-empty
        if trial == 1:
            lens[:] = max_len               # all-full
        vals = rng.integers(10, 30000, size=int(lens.sum())).astype(np.int64)
        mode = trial % 3
        masked = (np.zeros(n_rows, bool) if mode == 0 else
                  np.ones(n_rows, bool) if mode == 1 else
                  rng.random(n_rows) < 0.4)

        for rl in (True, False):
            r = host.Ragged(vals.copy(), lens.copy())
            out_h = host.shift_ragged_tokens_at_positions(
                r, np.where(masked)[0], right_to_left=rl).row_lengths
            out_d = dev.shift_row_lengths(jnp.asarray(lens),
                                          jnp.asarray(masked), right_to_left=rl)
            np.testing.assert_array_equal(np.asarray(out_d), out_h,
                                          err_msg=f"shift trial={trial} rl={rl}")

            r = host.Ragged(vals.copy(), lens.copy())
            out_h = host._reassign_one_dir(
                r, mask_idx=np.where(masked)[0], right_to_left=rl).row_lengths
            out_d = dev._reassign_one_dir(jnp.asarray(lens),
                                          jnp.asarray(masked), rl)
            np.testing.assert_array_equal(np.asarray(out_d), out_h,
                                          err_msg=f"reassign trial={trial} rl={rl}")

        # increase_textmask one-dir: needs time structure
        L = int(lens.sum())
        cent = np.sort(rng.uniform(0, 30, size=L))
        starts = np.sort(rng.uniform(0, 25, size=n_rows))
        ase = np.stack([starts, starts + float(rng.uniform(0.5, 5.0))], -1)
        thresh = float(rng.uniform(0.1, 2.0))
        for rl in (True, False):
            r = host.Ragged(vals.copy(), lens.copy())
            out_h = host._increase_one_dir(
                r, mask_idx=np.where(masked)[0], tok_centroids_vals=cent,
                audio_start_end=ase, delta_thresh=thresh,
                right_to_left=rl).row_lengths
            out_d = dev._increase_one_dir(
                jnp.asarray(lens), jnp.asarray(masked), jnp.asarray(cent),
                jnp.asarray(ase), thresh, rl)
            np.testing.assert_array_equal(np.asarray(out_d), out_h,
                                          err_msg=f"increase trial={trial} rl={rl}")


@pytest.mark.slow
def test_fuzz_mask_tokens_stream_parity():
    """mask_tokens (unbudgeted) under random shapes, mask/span patterns and
    random trailing flat padding: the device stream's valid prefix must
    equal the host rows exactly."""
    rng = np.random.default_rng(4321)
    for trial in range(8):
        n_rows = int(rng.integers(1, 12))
        max_len = int(rng.integers(1, 8))
        lens = rng.integers(0, max_len + 1, size=n_rows).astype(np.int64)
        if trial == 0:
            lens[-1] = max_len  # last row exactly full (+padding below)
        vals = rng.integers(10, 30000, size=int(lens.sum())).astype(np.int64)
        pad = int(rng.integers(0, 5))
        vals_padded = np.concatenate([vals, np.zeros(pad, np.int64)])
        masked = rng.random(n_rows) < 0.35
        do_span = (~masked) & (rng.random(n_rows) < 0.4)
        do_audio_mask = bool(rng.integers(0, 2))
        atl = int(rng.integers(1, 7))
        counter = int(rng.integers(0, 20))

        r = host.Ragged(vals.copy(), lens.copy())
        spans_h, streams_h = host.mask_tokens(
            r, np.where(masked)[0], np.random.default_rng(0),
            do_audio_span=do_span, audio_token_length=atl,
            text_span_start_counter=counter, num_groups=1,
            do_audio_mask=do_audio_mask)

        spans_d, streams_d = dev.mask_tokens(
            jax.random.PRNGKey(0), jnp.asarray(vals_padded), jnp.asarray(lens),
            jnp.asarray(masked), max_row=max(max_len, atl),
            do_audio_span=jnp.asarray(do_span), audio_token_length=atl,
            text_span_start_counter=counter, do_audio_mask=do_audio_mask,
            num_groups=1)

        t, v = streams_d[0]
        t = np.asarray(t)[np.asarray(v)]
        np.testing.assert_array_equal(t, streams_h[0],
                                      err_msg=f"trial={trial}")
        spans_d = np.asarray(spans_d)
        for k, m in enumerate(np.where(masked)[0]):
            row = spans_h.row(k)
            got = spans_d[m][spans_d[m] >= 0]
            np.testing.assert_array_equal(got, row, err_msg=f"trial={trial}")
