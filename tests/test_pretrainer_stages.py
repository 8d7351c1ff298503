"""Stage-level tests for the pretrainer's named stages (encode_towers /
fuse_streams / pool_*_targets / contrastive_heads).

End-to-end numerical parity vs the reference objective lives in
test_pretrainer_parity.py; these pin each stage's own contract so a
regression localizes to a stage instead of a 300-line forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import merlot_reserve_tpu as mr
from merlot_reserve_tpu.data.dummy import make_dummy_batch
from merlot_reserve_tpu.models import MerlotReservePretrainer
from merlot_reserve_tpu.tokenizer import LTOVPOOL, MASK, MASKAUDIO


@pytest.fixture(scope="module")
def setup():
    cfg = mr.load_config("base", hidden_size=64, joint_num_layers=2,
                         vit_num_layers=2, audio_num_layers=2,
                         span_num_layers=2, size_per_head=32,
                         output_grid=(4, 4), use_bfloat16=False)
    cfg = cfg.replace_data(num_segments=4, num_segment_groups=2, seq_len=80,
                           lang_seq_len=40, num_text_spans_to_include=8)
    model = MerlotReservePretrainer.from_config(cfg)
    batch = make_dummy_batch(cfg, batch_size=2, seed=0, num_text_spans=16)
    params = model.init_params(batch)
    bd = {k: jnp.asarray(v) for k, v in batch.items()}
    return cfg, model, params, bd


def _towers(model, params, bd):
    return model.apply({"params": params}, bd, method=model.encode_towers)


def test_encode_towers_shapes_and_flattening(setup):
    cfg, model, params, bd = setup
    t = _towers(model, params, bd)
    B, S = t["batch_size"], t["num_segments"]
    H = cfg.model.hidden_size
    assert (B, S) == (2, 4)
    # one vision CLS per frame; frames regrouped per segment group
    assert t["vision_cls"].shape == (B * S, H)
    assert t["frames_by_group"].shape[0] == B
    assert t["frames_by_group"].shape[1] == cfg.data.num_segment_groups
    # one audio span per (segment, subsegment), token_length tokens each
    assert t["audio_span_tokens"].shape == (
        B, t["num_audio_spans"], cfg.model.audio_token_length, H)
    assert t["audio_span_cls"].shape == (B, t["num_audio_spans"], H)
    # flattened streams: [rows, L]
    assert t["flat"]["text2audio"].ndim == 2
    assert t["flat"]["text2audio"].shape[1] == cfg.data.lang_seq_len
    assert t["flat"]["random_text"].shape[1] == cfg.data.seq_len
    # token embeddings exist for all five streams
    assert set(t["token_embs"]) >= {"text2audio", "audio2text",
                                    "audio_text_matching", "text_spans",
                                    "random_text"}


def test_fuse_streams_row_layout(setup):
    """The joint call sees all four streams; outputs split back with the
    language-only truncation on the two span-target streams."""
    cfg, model, params, bd = setup

    def run(m):
        t = m.encode_towers(bd)
        keys = m.content_keys(t)
        return m.fuse_streams(t, keys)

    out = model.apply({"params": params}, method=run)
    assert set(out) == {"audio2text", "audio_text_matching", "text2audio",
                        "random_text"}
    assert out["text2audio"].shape[1] == cfg.data.lang_seq_len
    assert out["audio2text"].shape[1] == cfg.data.lang_seq_len
    assert out["audio_text_matching"].shape[1] == cfg.data.seq_len
    assert out["random_text"].shape[1] == cfg.data.seq_len
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_pool_matching_targets_is_ltovpool_states(setup):
    """The imgs<->audio x side must be exactly the joint states at the
    LTOVPOOL positions, one per segment, in segment order."""
    cfg, model, params, bd = setup

    def run(m):
        t = m.encode_towers(bd)
        out = m.fuse_streams(t, m.content_keys(t))
        return t, out, m.pool_matching_targets(t, out)

    t, out, pooled = model.apply({"params": params}, method=run)
    pooled = np.asarray(pooled)
    tokens = np.asarray(t["flat"]["audio_text_matching"])
    states = np.asarray(out["audio_text_matching"])
    B, S = t["batch_size"], t["num_segments"]
    manual = np.zeros((B * S, pooled.shape[-1]), np.float32)
    for b in range(tokens.shape[0]):
        slots = np.where(tokens[b] == LTOVPOOL)[0]
        for s_i, pos in enumerate(slots):
            manual[b * S + s_i] = states[b, pos]
    np.testing.assert_allclose(pooled, manual, atol=1e-5)


def test_pool_audio_span_targets_ranks_masked_first(setup):
    """Target slots must be the actually-MASKAUDIO'd spans; the leftover
    spans' CLS become extra negatives; counts add up."""
    cfg, model, params, bd = setup

    def run(m):
        t = m.encode_towers(bd)
        out = m.fuse_streams(t, m.content_keys(t))
        return t, m.pool_audio_span_targets(t, out)

    t, (x, y, y_extra) = model.apply({"params": params}, method=run)
    B = t["batch_size"]
    num_targets = int(t["num_audio_spans"] * cfg.data.mask_rate) * \
        cfg.data.num_text2audio_seqs
    assert x.shape == (B * num_targets, cfg.model.hidden_size)
    assert y.shape == (B * num_targets, cfg.model.hidden_size)
    assert y_extra.shape == (B * (t["num_audio_spans"] - num_targets),
                             cfg.model.hidden_size)
    # masked slots rank first, so every genuinely-MASKAUDIO'd span fits in
    # the target set (dummy data may mask fewer than the budget; the
    # leftover target slots are then filled by unmasked spans, matching the
    # reference's plain top-k over counts)
    ptrs = np.asarray(t["flat"]["text2audio/audio_ptr"])
    toks = np.asarray(t["flat"]["text2audio"])
    rows_per_ex = toks.shape[0] // B
    masked_slots = {(r // rows_per_ex, int(p))
                    for r in range(toks.shape[0])
                    for p in ptrs[r][toks[r] == MASKAUDIO]}
    assert 1 <= len(masked_slots) <= B * num_targets


def test_pool_text_span_targets_draw_is_valid_and_deterministic(setup):
    """Gumbel span draw: deterministic given the content key, returns
    source labels in {-1..2}, and every drawn span was actually masked."""
    cfg, model, params, bd = setup

    def run(m):
        t = m.encode_towers(bd)
        keys = m.content_keys(t)
        out = m.fuse_streams(t, keys)
        return m.pool_text_span_targets(t, out, keys[2])

    x1, y1, src1 = model.apply({"params": params}, method=run)
    x2, y2, src2 = model.apply({"params": params}, method=run)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(src1), np.asarray(src2))
    assert x1.shape == (2 * cfg.data.num_text_spans_to_include,
                        cfg.model.hidden_size)
    assert set(np.asarray(src1).tolist()) <= {-1, 0, 1, 2}


def test_contrastive_heads_normalize_and_scale(setup):
    """Each side comes out unit-norm times exp(scale/2), per-head scales in
    their fixed slots."""
    cfg, model, params, bd = setup
    rng = np.random.RandomState(0)
    heads = {
        "imgs_to_audio": {"x": jnp.asarray(rng.randn(4, 64), jnp.float32),
                          "y": jnp.asarray(rng.randn(4, 64), jnp.float32)},
        "text_to_audio": {"x": jnp.asarray(rng.randn(4, 64), jnp.float32),
                          "y": jnp.asarray(rng.randn(4, 64), jnp.float32),
                          "y_extra": jnp.asarray(rng.randn(2, 64), jnp.float32)},
        "stuff_to_span": {"x": jnp.asarray(rng.randn(4, 64), jnp.float32),
                          "y": jnp.asarray(rng.randn(4, 64), jnp.float32),
                          "_sources": jnp.zeros(4, jnp.int32)},
    }
    out = model.apply({"params": params}, heads,
                      method=model.contrastive_heads)
    scales = np.asarray(params["contrastive_scales"], np.float32)
    scales = np.minimum(scales, np.log(100.0))
    for i, name in enumerate(["imgs_to_audio", "text_to_audio",
                              "stuff_to_span"]):
        for side in ("x", "y", "y_extra"):
            if side in out[name]:
                norms = np.linalg.norm(np.asarray(out[name][side], np.float32),
                                       axis=-1)
                np.testing.assert_allclose(norms, np.exp(scales[i] / 2.0),
                                           rtol=2e-3)
    # diagnostics pass through untouched
    np.testing.assert_array_equal(np.asarray(out["stuff_to_span"]["_sources"]),
                                  np.zeros(4))


import pytest  # noqa: E402

# heavy tier: full-model / multi-device / subprocess tests
pytestmark = pytest.mark.slow
