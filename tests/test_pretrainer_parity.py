"""Pretrainer parity: the full 4-stream forward + 3-head contrastive outputs
and the loss against the reference pretrain_model, same params, same batch.

The reference derives its PRNG from batch content (pretrain_model.py:96-97),
so given identical params and batch the two implementations must agree
numerically (f32, CPU). The reference loss all_gathers over a pmap axis;
wrapped in a 1-device pmap here.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import merlot_reserve_tpu as mr
from merlot_reserve_tpu.data.dummy import make_dummy_batch
from merlot_reserve_tpu.models import MerlotReservePretrainer, loss_fn_given_preds

ATOL = 3e-4


@pytest.fixture(scope="module")
def ref_pretrain():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        import pretrain.pretrain_model as ref_pm
    except ImportError as e:
        pytest.skip(f"reference pretrain_model unavailable: {e}")
    return ref_pm


@pytest.fixture(scope="module")
def setup(ref_pretrain):
    cfg = mr.load_config("base", hidden_size=64, joint_num_layers=2,
                         vit_num_layers=2, audio_num_layers=2, span_num_layers=2,
                         size_per_head=32, output_grid=(4, 4), use_bfloat16=False,
                         scan_layers=False)
    cfg = cfg.replace_data(num_segments=4, num_segment_groups=2, seq_len=80,
                           lang_seq_len=40, num_text_spans_to_include=8)
    mine = MerlotReservePretrainer.from_config(cfg)

    ref_cfg = {
        "data": {
            "num_segment_groups": 2, "num_audio_subsegments": 3,
            "lang_seq_len": 40, "seq_len": 80, "num_segments": 4,
            "num_audio2text_seqs": 1, "num_text2audio_seqs": 1,
            "num_text_seqs": 1, "mask_rate": 0.25,
            "num_text_spans_to_include": 8, "text_span_budget": 10,
        },
        "model": {
            "hidden_size": 64, "joint_num_layers": 2, "use_bfloat16": False,
            "audio_num_layers": 2, "audio_patch_size": 2, "audio_seq_length": 60,
            "audio_token_length": 6, "output_grid": [4, 4], "vit_patch_size": 16,
            "vit_pooling_ratio": 2, "vit_num_layers": 2, "span_num_layers": 2,
            "text_span_length": 15, "size_per_head": 32,
        },
    }
    ref = ref_pretrain.MerlotReservePretrainer.from_config(ref_cfg)

    batch_np = make_dummy_batch(cfg, batch_size=2, seed=0, num_text_spans=16)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    # the reference reshapes batch fields in place per device; it expects the
    # same flat layout our collate produces
    params = mine.init_params(batch_np)
    return mine, ref, params, batch


def test_pretrainer_forward_parity(setup):
    mine, ref, params, batch = setup
    out_mine = mine.apply({"params": params}, dict(batch))
    out_ref = ref.apply({"params": params}, dict(batch))

    assert set(out_mine.keys()) == set(out_ref.keys())
    for head in ["imgs_to_audio", "text_to_audio", "stuff_to_span"]:
        for field in out_mine[head]:
            a, b = out_mine[head][field], out_ref[head][field]
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=ATOL, err_msg=f"{head}/{field}")


def test_loss_parity(setup, ref_pretrain):
    mine, ref, params, batch = setup
    preds_mine = mine.apply({"params": params}, dict(batch))
    loss_mine, info_mine = loss_fn_given_preds(preds_mine)

    # reference loss needs a pmap axis for all_gather; 1-device pmap
    preds_ref = ref.apply({"params": params}, dict(batch))
    preds_ref_b = jax.tree.map(lambda x: x[None], preds_ref)

    import functools

    @functools.partial(jax.pmap, axis_name="batch")
    def ref_loss(p):
        return ref_pretrain.loss_fn_given_preds(p)[0]

    loss_ref = float(ref_loss(preds_ref_b)[0])
    assert abs(float(loss_mine) - loss_ref) < 1e-3, (float(loss_mine), loss_ref)


import pytest  # noqa: E402

# heavy tier: full-model / multi-device / subprocess tests
pytestmark = pytest.mark.slow
