"""AOT serving artifacts: jax.export'ed StableHLO + params on disk.

The reference deploys by shipping the *source* plus a checkpoint and paying a
trace+compile at every process start (PretrainedMerlotReserve.__getattr__
jits lazily, /root/reference/mreserve/modeling.py:1005-1022). A TPU-native
deployment wants the opposite: freeze the traced computation once, at build
time, into a versioned on-disk artifact that any serving host can load and
run **without the model code, flax, or a re-trace** — only jax + the
artifact. `jax.export` gives exactly that (StableHLO with a stable calling
convention, multi-platform lowering), so:

  * `export_serving_artifact` writes a directory:
      manifest.json        — versions, shapes, platforms, model config echo
      embed_video.jaxexp   — serialized Exported for batched embed_video
      label_space.jaxexp   — serialized Exported for embed_text_spans_only
      params.msgpack       — f16-compressed params (utils/checkpoint codec)
  * `load_serving_artifact` restores an `ExportedVideoService` that serves
    with the same donated-params threading as serving.VideoEmbedService
    (the exported call is traceable, so it jits with donate_argnums — no
    per-call param re-upload).

Artifacts are fixed-shape by design (the compile-once serving contract;
callers pad to the exported batch size, exactly like VideoEmbedService).
Multi-platform by default: one artifact serves on TPU and falls back to CPU.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Dict, Sequence

import jax
import numpy as np
from jax import export as jax_export

ARTIFACT_FORMAT_VERSION = 1


def _sds_tree(tree):
    return jax.tree.map(
        lambda v: jax.ShapeDtypeStruct(np.shape(v), np.asarray(v).dtype), tree)


def export_serving_artifact(model, params, example_video: Dict, path: str,
                            batch_size: int = 8, num_options: int = 64,
                            platforms: Sequence[str] = ("tpu", "cpu")) -> Dict:
    """Build an AOT artifact for the zero-shot serving surface.

    :param example_video: one preprocessed video dict (preprocess_video
        output: images/audio_clips/tokens/subseg_idxs) — fixes the exported
        shapes, like the first batch fixes them in the live service.
    :param num_options: exported label-space rows; callers pad options up.
    :returns: the manifest dict.
    """
    import flax.serialization

    from merlot_reserve_tpu.utils.checkpoint import compress_state

    params = jax.device_get(params)

    def embed_fn(p, images, audio, tokens, subseg):
        return model.apply({"params": p}, images, audio, tokens, subseg,
                           method=model.batch_embed_video)

    def label_fn(p, opts):
        return model.apply({"params": p}, opts,
                           method=model.embed_text_spans_only)

    batch = {k: np.stack([np.asarray(example_video[k])] * batch_size)
             for k in ("images", "audio_clips", "tokens", "subseg_idxs")}
    span_len = int(model.config.text_span_length)  # CLS is added inside
    opts = np.zeros((num_options, span_len), np.int32)

    p_sds = _sds_tree(params)
    embed_exp = jax_export.export(jax.jit(embed_fn), platforms=list(platforms))(
        p_sds, *(_sds_tree(batch[k]) for k in
                 ("images", "audio_clips", "tokens", "subseg_idxs")))
    label_exp = jax_export.export(jax.jit(label_fn), platforms=list(platforms))(
        p_sds, _sds_tree(opts))

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "embed_video.jaxexp"), "wb") as f:
        f.write(embed_exp.serialize())
    with open(os.path.join(path, "label_space.jaxexp"), "wb") as f:
        f.write(label_exp.serialize())
    with open(os.path.join(path, "params.msgpack"), "wb") as f:
        f.write(flax.serialization.msgpack_serialize(
            jax.tree.map(np.asarray, compress_state(params))))

    manifest = {
        "format_version": ARTIFACT_FORMAT_VERSION,
        "jax_version": jax.__version__,
        "calling_convention_version": int(embed_exp.calling_convention_version),
        "platforms": list(platforms),
        "batch_size": batch_size,
        "num_options": num_options,
        "span_length": span_len,
        "hidden_size": int(model.config.hidden_size),
        "input_shapes": {k: list(np.shape(v)) for k, v in batch.items()},
        "input_dtypes": {k: str(np.asarray(v).dtype) for k, v in batch.items()},
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


@dataclass
class ExportedVideoService:
    """Serving handle over a loaded artifact — no model code, no re-trace.

    Same operating contract as serving.VideoEmbedService: fixed batch shape,
    requests pad up, params live on device and are donated through every
    call.
    """

    manifest: Dict
    params: Dict
    _embed: object
    _label: object

    def embed(self, video_pres: Sequence[Dict]) -> np.ndarray:
        bs = self.manifest["batch_size"]
        if not video_pres:  # empty request (e.g. fully filtered upstream)
            # same rank as the non-empty path: [N, L, H] with L = the
            # exported token length (embed_video returns one row per token)
            return np.zeros((0, self.manifest["input_shapes"]["tokens"][1],
                             self.manifest["hidden_size"]), np.float32)
        assert len(video_pres) <= bs, (len(video_pres), bs)
        pad = bs - len(video_pres)
        stack = {k: np.stack([np.asarray(v[k]) for v in video_pres] +
                             [np.asarray(video_pres[0][k])] * pad)
                 for k in ("images", "audio_clips", "tokens", "subseg_idxs")}
        for k, shape in self.manifest["input_shapes"].items():
            assert list(stack[k].shape) == shape, (k, stack[k].shape, shape)
        self.params, out = self._embed(
            self.params, stack["images"], stack["audio_clips"],
            stack["tokens"], stack["subseg_idxs"])
        return np.asarray(out[:len(video_pres)])

    def embed_stream(self, video_pres: Sequence[Dict]) -> np.ndarray:
        bs = self.manifest["batch_size"]
        if not video_pres:
            return self.embed([])
        return np.concatenate([self.embed(video_pres[i:i + bs])
                               for i in range(0, len(video_pres), bs)], 0)

    def label_space(self, option_tokens: np.ndarray) -> np.ndarray:
        """[n, span_len] padded option tokens -> [n, H] unit span embeddings."""
        n_exp = self.manifest["num_options"]
        n = option_tokens.shape[0]
        assert n <= n_exp, (n, n_exp)
        opts = np.zeros((n_exp, self.manifest["span_length"]), np.int32)
        opts[:n] = option_tokens
        self.params, out = self._label(self.params, opts)
        return np.asarray(out[:n])


def load_serving_artifact(path: str) -> ExportedVideoService:
    """Load an artifact written by :func:`export_serving_artifact`.

    Needs only jax + flax.serialization — no model/tokenizer/flax-module
    imports; the computation comes from the serialized StableHLO.
    """
    import flax.serialization

    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["format_version"] == ARTIFACT_FORMAT_VERSION, manifest

    with open(os.path.join(path, "embed_video.jaxexp"), "rb") as f:
        embed_exp = jax_export.deserialize(f.read())
    with open(os.path.join(path, "label_space.jaxexp"), "rb") as f:
        label_exp = jax_export.deserialize(f.read())
    from merlot_reserve_tpu.utils.checkpoint import decompress_state

    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        params = decompress_state(flax.serialization.msgpack_restore(f.read()))

    # donated-params threading around the exported calls (the relay/service
    # pattern from serving.py — exported calls are traceable, so jit+donate
    # composes; params upload once and update in place)
    embed_call = jax.jit(lambda p, *a: (p, embed_exp.call(p, *a)),
                         donate_argnums=(0,))
    label_call = jax.jit(lambda p, o: (p, label_exp.call(p, o)),
                         donate_argnums=(0,))
    params = jax.device_put(params)
    return ExportedVideoService(manifest=manifest, params=params,
                                _embed=embed_call, _label=label_call)
