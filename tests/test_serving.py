"""Batched inference service: padding, micro-batching, MASK features."""

import numpy as np
import pytest

import merlot_reserve_tpu as mr
from merlot_reserve_tpu.models import MerlotReserve
from merlot_reserve_tpu.serving import VideoEmbedService
from merlot_reserve_tpu.tokenizer import AUDIOSPAN, MASK


@pytest.fixture(scope="module")
def service():
    cfg = mr.load_config("base", hidden_size=64, joint_num_layers=2,
                         vit_num_layers=2, audio_num_layers=2, span_num_layers=2,
                         size_per_head=32, output_grid=(4, 4), use_bfloat16=False)
    model = MerlotReserve.from_config(cfg)

    rng = np.random.RandomState(0)

    def make_pre(seed):
        r = np.random.RandomState(seed)
        tokens = np.zeros(40, np.int32)
        tokens[:18] = AUDIOSPAN
        tokens[18:22] = [100, MASK, 200, 2]
        subseg = np.zeros(40, np.int32)
        subseg[:18] = np.arange(18) // 6
        subseg[18:22] = 3
        return {"images": r.randn(2, 16, 768).astype(np.float32),
                "audio_clips": r.randn(6, 60, 65).astype(np.float32),
                "tokens": tokens, "subseg_idxs": subseg}

    pres = [make_pre(i) for i in range(5)]
    import jax.numpy as jnp

    params = model.init_params({k: jnp.asarray(v) for k, v in pres[0].items()},
                               method="embed_video")
    return VideoEmbedService(model=model, params=params, batch_size=2), pres


def test_embed_with_padding(service):
    svc, pres = service
    out = svc.embed(pres[:1])  # pads 1 -> 2
    assert out.shape == (1, 40, 64)


def test_embed_stream_microbatches(service):
    svc, pres = service
    out = svc.embed_stream(pres)  # 5 videos at batch 2 -> 3 batches
    assert out.shape == (5, 40, 64)
    assert svc.stats["videos"] >= 5
    assert svc.throughput > 0


def test_mask_features(service):
    svc, pres = service
    feats = svc.mask_features(pres[:3])
    assert feats.shape == (3, 64)
    # unit-normalized joint projections
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0, atol=1e-2)


def test_batching_consistency(service):
    """The same video embeds identically alone and inside a batch."""
    svc, pres = service
    solo = svc.embed(pres[:1])[0]
    batch = svc.embed(pres[:2])[0]
    np.testing.assert_allclose(solo, batch, atol=1e-5)
