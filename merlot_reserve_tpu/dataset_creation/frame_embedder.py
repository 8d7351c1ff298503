"""MobileNetV2 frame embedder for the dataset-creation quality filters.

The reference (/root/reference/data/process.py:580-691) scores candidate
video chunks with a torchvision MobileNetV2 (+ a COCO multi-label
classifier head from a checkpoint): mean-pooled `features` give the
embedding for the static-video cosine filter, `sigmoid(classifier(...))`
the expected-object-count filter. Round 1 shipped only a pixel-downsample
placeholder; this module is the real architecture, TPU-native:

* ``MobileNetV2`` — faithful inverted-residual network in flax (width 1.0:
  32-ch stem, [1,16,1,1][6,24,2,2][6,32,3,2][6,64,4,2][6,96,3,1]
  [6,160,3,2][6,320,1,1] blocks, 1280-ch head, ReLU6, BN eps 1e-3 as in
  torchvision), inference-mode batch norm.
* ``load_torch_mobilenet_v2`` — maps a torchvision-format state_dict
  (torch .pt/.pth file or a dict) onto the flax params, so production runs
  load the exact reference weights (no network egress here; any
  mobilenet_v2 checkpoint file works).
* ``MobileNetV2Embedder`` — the reference's preprocessing (resize (90,120),
  center-crop (82,114), ImageNet normalize, process.py:581-587) fused with
  the jitted forward; pluggable as ``filters.is_static_video``'s
  ``frame_embedder`` and as the object scorer for
  ``filters.passes_object_filter``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

# torchvision mobilenet_v2 inverted-residual schedule:
# (expand_ratio, out_channels, num_blocks, first_stride)
_IR_SETTING = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
               (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))
_BN_EPS = 1e-3  # torchvision MobileNetV2 uses eps=0.001


def _relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


class _ConvBN(nn.Module):
    """Conv + inference-mode BatchNorm (+ optional ReLU6)."""

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)],
                    feature_group_count=self.groups, use_bias=False,
                    name="conv")(x)
        # inference BN: variables are params so checkpoints carry them
        shape = (self.features,)
        scale = self.param("bn_scale", nn.initializers.ones, shape)
        bias = self.param("bn_bias", nn.initializers.zeros, shape)
        mean = self.param("bn_mean", nn.initializers.zeros, shape)
        var = self.param("bn_var", nn.initializers.ones, shape)
        x = (x - mean) * jax.lax.rsqrt(var + _BN_EPS) * scale + bias
        return _relu6(x) if self.act else x


class _InvertedResidual(nn.Module):
    features: int
    stride: int
    expand: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = x
        if self.expand != 1:
            h = _ConvBN(in_ch * self.expand, kernel=1, name="expand")(h)
        h = _ConvBN(in_ch * self.expand, kernel=3, stride=self.stride,
                    groups=in_ch * self.expand, name="depthwise")(h)
        h = _ConvBN(self.features, kernel=1, act=False, name="project")(h)
        if self.stride == 1 and in_ch == self.features:
            h = x + h
        return h


class MobileNetV2(nn.Module):
    """Features trunk + optional classifier head (COCO multi-label in the
    reference's filter checkpoint; 1000-way for stock torchvision)."""

    num_classes: Optional[int] = None

    @nn.compact
    def __call__(self, x, *, pool: bool = True):
        x = _ConvBN(32, kernel=3, stride=2, name="stem")(x)
        idx = 0
        for expand, out_ch, n_blocks, stride in _IR_SETTING:
            for b in range(n_blocks):
                x = _InvertedResidual(
                    out_ch, stride if b == 0 else 1, expand,
                    name=f"block{idx}")(x)
                idx += 1
        x = _ConvBN(1280, kernel=1, name="head")(x)
        if not pool:
            return x
        feats = x.mean(axis=(1, 2))  # the reference's .mean([2,3])
        if self.num_classes is None:
            return feats
        logits = nn.Dense(self.num_classes, name="classifier")(feats)
        return feats, logits


def load_torch_mobilenet_v2(src: Any, num_classes: Optional[int] = None
                            ) -> Dict:
    """torchvision-format state_dict (path or dict of arrays/tensors) ->
    flax params for ``MobileNetV2``.

    Mapping: features.0 = stem, features.{1..17} = inverted residuals,
    features.18 = head; each ConvBNReLU is (conv.weight, bn.{weight,bias,
    running_mean,running_var}); torch conv weights [O, I/g, kh, kw] ->
    flax [kh, kw, I/g, O]. classifier.* maps when num_classes is given
    (torchvision uses classifier.1; the reference's filter ckpt a single
    Linear — both layouts are accepted).
    """
    if isinstance(src, (str, bytes)):
        import torch

        sd = torch.load(src, map_location="cpu", weights_only=True)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    else:
        sd = src
    sd = {k: np.asarray(getattr(v, "numpy", lambda: v)()) for k, v in sd.items()}

    def conv_w(key):
        w = sd[key]  # [O, I/g, kh, kw]
        return jnp.asarray(w.transpose(2, 3, 1, 0))

    def convbn(prefix, conv_i=0, bn_i=1):
        return {
            "conv": {"kernel": conv_w(f"{prefix}.{conv_i}.weight")},
            "bn_scale": jnp.asarray(sd[f"{prefix}.{bn_i}.weight"]),
            "bn_bias": jnp.asarray(sd[f"{prefix}.{bn_i}.bias"]),
            "bn_mean": jnp.asarray(sd[f"{prefix}.{bn_i}.running_mean"]),
            "bn_var": jnp.asarray(sd[f"{prefix}.{bn_i}.running_var"]),
        }

    params: Dict[str, Any] = {"stem": convbn("features.0")}
    idx = 0
    feat_i = 1
    for expand, _out, n_blocks, _s in _IR_SETTING:
        for _b in range(n_blocks):
            p = f"features.{feat_i}.conv"
            blk = {}
            if expand != 1:
                blk["expand"] = convbn(f"{p}.0")
                blk["depthwise"] = convbn(f"{p}.1")
                blk["project"] = {"conv": {"kernel": conv_w(f"{p}.2.weight")},
                                  "bn_scale": jnp.asarray(sd[f"{p}.3.weight"]),
                                  "bn_bias": jnp.asarray(sd[f"{p}.3.bias"]),
                                  "bn_mean": jnp.asarray(sd[f"{p}.3.running_mean"]),
                                  "bn_var": jnp.asarray(sd[f"{p}.3.running_var"])}
            else:
                blk["depthwise"] = convbn(f"{p}.0")
                blk["project"] = {"conv": {"kernel": conv_w(f"{p}.1.weight")},
                                  "bn_scale": jnp.asarray(sd[f"{p}.2.weight"]),
                                  "bn_bias": jnp.asarray(sd[f"{p}.2.bias"]),
                                  "bn_mean": jnp.asarray(sd[f"{p}.2.running_mean"]),
                                  "bn_var": jnp.asarray(sd[f"{p}.2.running_var"])}
            params[f"block{idx}"] = blk
            idx += 1
            feat_i += 1
    params["head"] = convbn("features.18")

    if num_classes is not None:
        for cand in ("classifier.1", "classifier", "classifier.0"):
            if f"{cand}.weight" in sd:
                params["classifier"] = {
                    "kernel": jnp.asarray(sd[f"{cand}.weight"].T),
                    "bias": jnp.asarray(sd[f"{cand}.bias"]),
                }
                break
        else:
            raise KeyError("no classifier weights in state_dict")
    return params


_IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def preprocess_frames(frames: np.ndarray) -> np.ndarray:
    """uint8 [N, H, W, 3] -> normalized float32 [N, 82, 114, 3]: the
    reference's Resize((90,120)) + CenterCrop((82,114)) + ImageNet
    normalize (process.py:581-587), bilinear half-pixel resize."""
    n, h, w, _ = frames.shape
    th, tw = 90, 120

    def axis_idx(src, dst):
        f = (np.arange(dst) + 0.5) * (src / dst) - 0.5
        f = np.clip(f, 0, src - 1)
        i0 = np.floor(f).astype(int)
        i1 = np.minimum(i0 + 1, src - 1)
        return i0, i1, (f - i0).astype(np.float32)

    y0, y1, wy = axis_idx(h, th)
    x0, x1, wx = axis_idx(w, tw)
    fr = frames.astype(np.float32)
    top = fr[:, y0][:, :, x0] * (1 - wx[None, None, :, None]) + \
        fr[:, y0][:, :, x1] * wx[None, None, :, None]
    bot = fr[:, y1][:, :, x0] * (1 - wx[None, None, :, None]) + \
        fr[:, y1][:, :, x1] * wx[None, None, :, None]
    img = top * (1 - wy[None, :, None, None]) + bot * wy[None, :, None, None]

    oy, ox = (th - 82) // 2, (tw - 114) // 2
    img = img[:, oy:oy + 82, ox:ox + 114] / 255.0
    return (img - _IMAGENET_MEAN) / _IMAGENET_STD


class MobileNetV2Embedder:
    """Callable [N, H, W, 3] uint8 -> [N, 1280] embeddings (+ object
    scorer), drop-in for filters.is_static_video / passes_object_filter."""

    def __init__(self, params: Optional[Dict] = None,
                 num_classes: Optional[int] = None, seed: int = 0):
        self.model = MobileNetV2(num_classes=num_classes)
        self.num_classes = num_classes
        if params is None:
            dummy = jnp.zeros((1, 82, 114, 3), jnp.float32)
            params = self.model.init(jax.random.PRNGKey(seed), dummy)["params"]
        self.params = params
        self._fwd = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x))

    @classmethod
    def from_torch_checkpoint(cls, path: str,
                              num_classes: Optional[int] = None):
        return cls(load_torch_mobilenet_v2(path, num_classes=num_classes),
                   num_classes=num_classes)

    def __call__(self, frames: np.ndarray) -> np.ndarray:
        x = jnp.asarray(preprocess_frames(frames))
        out = self._fwd(self.params, x)
        feats = out[0] if self.num_classes is not None else out
        return np.asarray(feats)

    def object_scores(self, frames: np.ndarray) -> np.ndarray:
        """sigmoid(classifier) per frame — the reference's expected-COCO
        count: score = sum of per-class max-over-frames probs > 0.3
        (process.py:686-691)."""
        assert self.num_classes is not None, "no classifier head loaded"
        x = jnp.asarray(preprocess_frames(frames))
        _feats, logits = self._fwd(self.params, x)
        return np.asarray(jax.nn.sigmoid(logits))

    def expected_object_count(self, frames: np.ndarray,
                              prob_thresh: float = 0.3) -> float:
        probs = self.object_scores(frames).max(axis=0)
        return float(probs[probs > prob_thresh].sum())
