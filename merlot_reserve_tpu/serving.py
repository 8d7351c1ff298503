"""Batched zero-shot inference service (BASELINE.json config 2).

Wraps a MerlotReserve model for production-style serving: fixed batch shapes
(compile once), params donated and threaded through executions (no per-call
re-upload), host-side micro-batching with padding, and the precompute paths
(`embed_preencoded_*`) for label-space or image-prefix caching.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from merlot_reserve_tpu.tokenizer import MASK


@dataclass
class VideoEmbedService:
    """Fixed-shape batched embed_video server.

    :param model: MerlotReserve (flax module)
    :param params: param tree (device-resident; donated across calls)
    :param batch_size: compiled batch size; requests pad up to it
    """

    model: object
    params: Dict
    batch_size: int = 8
    _fn: Optional[object] = None
    stats: Dict = field(default_factory=lambda: {"batches": 0, "videos": 0,
                                                 "seconds": 0.0})

    def __post_init__(self):
        model = self.model

        @partial(jax.jit, donate_argnums=(0,))
        def fn(params, images, audio, tokens, subseg):
            out = model.apply({"params": params}, images, audio, tokens, subseg,
                              method=model.batch_embed_video)
            return params, out

        self._fn = fn
        # donation consumes the tree we place; copy so the CALLER's params
        # survive (device_put alone is a no-op for already-committed arrays
        # and the donated buffer would be the caller's — same fix as
        # zero_shot.zero_shot_qa_eval)
        self.params = jax.tree.map(lambda x: jnp.array(x, copy=True),
                                   self.params)

    def embed(self, video_pres: Sequence[Dict]) -> np.ndarray:
        """Embed up to batch_size preprocessed videos -> [N, L, H]."""
        n = len(video_pres)
        if n == 0:
            raise ValueError(
                "empty request: the output seq length is set by the inputs, "
                "so an empty result has no well-defined shape — filter "
                "upstream (ExportedVideoService knows its shapes and does "
                "return a typed empty)")
        assert n <= self.batch_size
        pad = self.batch_size - n
        stack = {k: np.stack([np.asarray(v[k]) for v in video_pres] +
                             [np.asarray(video_pres[0][k])] * pad)
                 for k in ("images", "audio_clips", "tokens", "subseg_idxs")}
        t0 = time.perf_counter()
        self.params, out = self._fn(self.params, jnp.asarray(stack["images"]),
                                    jnp.asarray(stack["audio_clips"]),
                                    jnp.asarray(stack["tokens"]),
                                    jnp.asarray(stack["subseg_idxs"]))
        out = np.asarray(out[:n])
        self.stats["batches"] += 1
        self.stats["videos"] += n
        self.stats["seconds"] += time.perf_counter() - t0
        return out

    def embed_stream(self, video_pres: Sequence[Dict]) -> np.ndarray:
        """Embed any number (>= 1) of videos, micro-batching internally."""
        if not video_pres:
            raise ValueError("empty request (see embed)")
        outs = []
        for i in range(0, len(video_pres), self.batch_size):
            outs.append(self.embed(video_pres[i:i + self.batch_size]))
        return np.concatenate(outs, 0)

    def mask_features(self, video_pres: Sequence[Dict]) -> np.ndarray:
        """[N, H] hidden state at each video's first MASK."""
        out = self.embed_stream(video_pres)
        feats = []
        for i, vp in enumerate(video_pres):
            pos = int(np.argmax(np.asarray(vp["tokens"]) == MASK))
            feats.append(out[i, pos])
        return np.stack(feats)

    @property
    def throughput(self) -> float:
        """Videos/sec over the service lifetime."""
        return self.stats["videos"] / max(self.stats["seconds"], 1e-9)


class DynamicBatcher:
    """Queue-fed dynamic batching on top of :class:`VideoEmbedService` —
    the production-serving layer the reference lacks (its demo embeds one
    video per call; a server must coalesce concurrent requests to fill the
    compiled batch).

    Requests submit from any thread and get a Future; a single dispatcher
    thread flushes a batch when ``batch_size`` requests are pending OR the
    oldest pending request has waited ``max_wait_ms`` (classic
    latency/throughput knob). Underfilled flushes pad to the compiled shape
    (the service already does), so there is exactly ONE compiled program.

    >>> with DynamicBatcher(service, max_wait_ms=5.0) as b:
    ...     futs = [b.submit(vp) for vp in video_pres]
    ...     embs = [f.result() for f in futs]
    """

    def __init__(self, service: VideoEmbedService, max_wait_ms: float = 10.0):
        import queue
        import threading

        self.service = service
        self.max_wait = max_wait_ms / 1000.0
        self._q: "queue.Queue" = queue.Queue()
        self._closed = False
        # guards the closed-check + enqueue pair: without it a submit could
        # pass the check, lose the CPU, and enqueue AFTER close()'s None
        # sentinel — the dispatcher would already be gone and the Future
        # would never resolve
        self._lock = threading.Lock()
        self.batch_fills: List[int] = []
        self._thread = threading.Thread(target=self._dispatch, daemon=True)
        self._thread.start()

    def submit(self, video_pre: Dict):
        """Enqueue one preprocessed video; returns a Future of its [L, H]
        embedding."""
        from concurrent.futures import Future

        fut: Future = Future()
        with self._lock:
            if self._closed:
                raise RuntimeError("batcher is closed")
            self._q.put((video_pre, fut))
        return fut

    def _dispatch(self):
        import queue
        import time as _time

        while True:
            try:
                item = self._q.get(timeout=0.1)
            except queue.Empty:
                if self._closed:
                    return
                continue
            if item is None:
                return
            pending = [item]
            deadline = _time.monotonic() + self.max_wait
            while len(pending) < self.service.batch_size:
                remaining = deadline - _time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    self._flush(pending)
                    return
                pending.append(nxt)
            self._flush(pending)

    def _flush(self, pending):
        self.batch_fills.append(len(pending))
        try:
            out = self.service.embed([vp for vp, _ in pending])
        except Exception as e:  # noqa: BLE001 — deliver, don't kill the thread
            for _, fut in pending:
                fut.set_exception(e)
            return
        for i, (_, fut) in enumerate(pending):
            fut.set_result(out[i])

    def close(self):
        """Drain the queue, flush remaining requests, stop the thread."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
            # FIFO + the lock guarantee every accepted item precedes the
            # sentinel, so the dispatcher flushes them all before exiting
            self._q.put(None)
        self._thread.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
