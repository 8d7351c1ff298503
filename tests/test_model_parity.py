"""Full-model parity: embed_video and the zero-shot API against the reference
model driven by the same params (CPU, f32)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import merlot_reserve_tpu as mr
from merlot_reserve_tpu.models import MerlotReserve
from merlot_reserve_tpu.tokenizer import AUDIOSPAN, MASK
from merlot_reserve_tpu.utils.checkpoint import unstack_layer_params

ATOL = 2e-4


@pytest.fixture(scope="module")
def models_and_params(reference_modeling):
    cfg = mr.load_config("base", hidden_size=64, joint_num_layers=2,
                         vit_num_layers=2, audio_num_layers=2, span_num_layers=2,
                         size_per_head=32, output_grid=(4, 4), use_bfloat16=False,
                         scan_layers=False)
    mine = MerlotReserve.from_config(cfg)

    ref_cfg = {
        "data": {},
        "model": {
            "hidden_size": 64, "joint_num_layers": 2, "use_bfloat16": False,
            "audio_num_layers": 2, "audio_patch_size": 2, "audio_seq_length": 60,
            "audio_token_length": 6, "output_grid": [4, 4], "vit_patch_size": 16,
            "vit_pooling_ratio": 2, "vit_num_layers": 2, "span_num_layers": 2,
            "text_span_length": 15, "size_per_head": 32,
        },
    }
    ref = reference_modeling.MerlotReserve.from_config(ref_cfg)

    rng = np.random.RandomState(0)
    n_seg = 4
    images = jnp.asarray(rng.randn(n_seg, 16, 768).astype(np.float32))
    audio = jnp.asarray(rng.randn(3 * n_seg, 60, 65).astype(np.float32))
    tokens = np.zeros(40, np.int32)
    tokens[:18] = AUDIOSPAN
    tokens[18:24] = [100, 200, MASK, 300, 400, 2]
    subseg = np.zeros(40, np.int32)
    subseg[:18] = np.arange(18) // 6
    subseg[18:24] = 3
    tokens = jnp.asarray(tokens)
    subseg = jnp.asarray(subseg)

    params = mine.init_params_full()
    return mine, ref, params, (images, audio, tokens, subseg)


def test_embed_video_parity(models_and_params):
    mine, ref, params, args = models_and_params
    out_mine = mine.apply({"params": params}, *args, method=mine.embed_video)
    out_ref = ref.apply({"params": params}, *args, method=ref.embed_video)
    assert out_mine.shape == out_ref.shape
    np.testing.assert_allclose(np.asarray(out_mine), np.asarray(out_ref),
                               atol=ATOL)


def test_embed_video_packed_parity(models_and_params):
    """With video packing (video_src_idx) my label-based masking must equal
    the reference's dense block-diagonal mask. Exercised through
    prepare_multimodal_inputs + the joint transformer."""
    mine, ref, params, (images, audio, tokens, subseg) = models_and_params

    vis = jnp.asarray(np.random.RandomState(1).randn(1, 16, 64).astype(np.float32))
    toks = tokens[None]
    seg_idx = (subseg // 3)[None]
    src_idx = jnp.asarray(np.array([[1, 1, 2, 2]], np.int32))  # 2 packed videos

    def run_mine(p):
        def fwd(m):
            mm = m.prepare_multimodal_inputs(
                tokens=toks, token_segment_idx=seg_idx, vision_input=vis,
                padding_len=80, video_src_idx=src_idx)
            return m.joint_transformer(
                mm["x"], rotary_coords=mm["rotary_coords"],
                is_valid=mm["is_valid"], segment_ids=mm["segment_ids"])["seq"]

        return mine.apply({"params": p}, method=fwd)

    def run_ref(p):
        def fwd(m):
            mm = m.prepare_multimodal_inputs(
                tokens=toks, token_segment_idx=seg_idx, vision_input=vis,
                padding_len=80, video_src_idx=src_idx)
            return m.joint_transformer(
                mm["x"], rotary_coords=mm["rotary_coords"],
                attention_mask=mm["attention_mask"])["seq"]

        return ref.apply({"params": p}, method=fwd)

    out_mine = run_mine(params)
    out_ref = run_ref(params)
    np.testing.assert_allclose(np.asarray(out_mine), np.asarray(out_ref),
                               atol=ATOL)


def test_zero_shot_methods_parity(models_and_params):
    mine, ref, params, (images, audio, tokens, subseg) = models_and_params

    spans = jnp.asarray(np.random.RandomState(2).randint(10, 1000, (3, 15)))
    a = mine.apply({"params": params}, spans, method=mine.embed_text_spans_only)
    b = ref.apply({"params": params}, spans, method=ref.embed_text_spans_only)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=ATOL)

    a = mine.apply({"params": params}, audio, method=mine.embed_audio_only)
    b = ref.apply({"params": params}, audio, method=ref.embed_audio_only)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=ATOL)

    a = mine.apply({"params": params}, images, method=mine.get_imgseq_only)
    b = ref.apply({"params": params}, images, method=ref.get_imgseq_only)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=ATOL)


def test_scan_model_matches_reference(models_and_params, reference_modeling):
    """scan_layers=True + stacked params == the reference end to end."""
    mine, ref, params, args = models_and_params
    cfg = mr.load_config("base", hidden_size=64, joint_num_layers=2,
                         vit_num_layers=2, audio_num_layers=2, span_num_layers=2,
                         size_per_head=32, output_grid=(4, 4), use_bfloat16=False,
                         scan_layers=True)
    from merlot_reserve_tpu.utils.checkpoint import stack_layer_params

    scan_model = MerlotReserve.from_config(cfg)
    stacked = stack_layer_params(params)
    out_scan = scan_model.apply({"params": stacked}, *args,
                                method=scan_model.embed_video)
    out_ref = ref.apply({"params": params}, *args, method=ref.embed_video)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_ref),
                               atol=ATOL)


import pytest  # noqa: E402

# heavy tier: full-model / multi-device / subprocess tests
pytestmark = pytest.mark.slow
