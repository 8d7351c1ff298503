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


# ---------------------------------------------------------------------------
# DynamicBatcher (stub service: no model, pure queue/flush semantics)
# ---------------------------------------------------------------------------


class _StubService:
    def __init__(self, batch_size=4, fail_on=None):
        self.batch_size = batch_size
        self.calls = []
        self.fail_on = fail_on or set()

    def embed(self, video_pres):
        assert len(video_pres) <= self.batch_size
        ids = [vp["id"] for vp in video_pres]
        self.calls.append(ids)
        if self.fail_on & set(ids):
            raise ValueError(f"poison in {ids}")
        return np.asarray(ids, np.float32)[:, None] * 10  # [n, 1]


def test_dynamic_batcher_results_match_requests():
    from merlot_reserve_tpu.serving import DynamicBatcher

    svc = _StubService(batch_size=4)
    with DynamicBatcher(svc, max_wait_ms=20.0) as b:
        futs = [b.submit({"id": i}) for i in range(10)]
        results = [f.result(timeout=10) for f in futs]
    for i, r in enumerate(results):
        np.testing.assert_array_equal(r, [i * 10.0])
    assert sum(b.batch_fills) == 10
    assert max(b.batch_fills) <= 4


def test_dynamic_batcher_coalesces_and_flushes_partial():
    import time

    from merlot_reserve_tpu.serving import DynamicBatcher

    svc = _StubService(batch_size=4)
    b = DynamicBatcher(svc, max_wait_ms=30.0)
    try:
        # burst of exactly batch_size coalesces into one call
        futs = [b.submit({"id": i}) for i in range(4)]
        [f.result(timeout=10) for f in futs]
        assert b.batch_fills[0] == 4
        # a lone request flushes after max_wait, not never
        t0 = time.monotonic()
        fut = b.submit({"id": 99})
        np.testing.assert_array_equal(fut.result(timeout=10), [990.0])
        assert time.monotonic() - t0 < 5.0
        assert b.batch_fills[-1] == 1
    finally:
        b.close()


def test_dynamic_batcher_propagates_errors_and_survives():
    from merlot_reserve_tpu.serving import DynamicBatcher

    svc = _StubService(batch_size=2, fail_on={7})
    with DynamicBatcher(svc, max_wait_ms=5.0) as b:
        bad = b.submit({"id": 7})
        with pytest.raises(ValueError):
            bad.result(timeout=10)
        ok = b.submit({"id": 1})  # the dispatcher thread must still be alive
        np.testing.assert_array_equal(ok.result(timeout=10), [10.0])


def test_dynamic_batcher_close_flushes_pending():
    from merlot_reserve_tpu.serving import DynamicBatcher

    svc = _StubService(batch_size=8)
    b = DynamicBatcher(svc, max_wait_ms=60_000.0)  # would wait forever
    futs = [b.submit({"id": i}) for i in range(3)]
    b.close()  # must flush the 3 pending instead of abandoning them
    for i, f in enumerate(futs):
        np.testing.assert_array_equal(f.result(timeout=1), [i * 10.0])


def test_service_construction_preserves_caller_params(service):
    """Donation must consume the service's COPY, not the caller's tree
    (device_put is a no-op for committed arrays — the pre-fix construction
    donated the caller's buffers on the first embed)."""
    import jax
    import jax.numpy as jnp

    svc, pres = service
    caller_params = jax.device_put(
        jax.tree.map(lambda x: jnp.array(x, copy=True), svc.params))
    svc2 = VideoEmbedService(model=svc.model, params=caller_params,
                             batch_size=2)
    out = svc2.embed(pres[:1])
    assert out.shape == (1, 40, 64)
    # every caller leaf must still be alive and readable
    for leaf in jax.tree_util.tree_leaves(caller_params):
        np.asarray(leaf)


def test_empty_request_raises(service):
    svc, _ = service
    with pytest.raises(ValueError, match="empty request"):
        svc.embed([])
    with pytest.raises(ValueError, match="empty request"):
        svc.embed_stream([])


def test_dynamic_batcher_submit_after_close_raises():
    from merlot_reserve_tpu.serving import DynamicBatcher

    svc = _StubService(batch_size=2)
    b = DynamicBatcher(svc, max_wait_ms=5.0)
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit({"id": 0})
    b.close()  # idempotent
