"""MobileNetV2 frame embedder: architecture anchored to published
torchvision facts (param counts, state_dict key layout), BN/conv math
hand-verified, and wired into the dataset-creation filters."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from merlot_reserve_tpu.dataset_creation import filters
from merlot_reserve_tpu.dataset_creation.frame_embedder import (
    _IR_SETTING, MobileNetV2, MobileNetV2Embedder, load_torch_mobilenet_v2,
    preprocess_frames)


def _count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def _count_learnable(params):
    """Exclude BN running stats: torch counts them as buffers, and the
    published 2,223,872 figure is parameters only."""
    total = 0
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    for path, leaf in flat:
        name = str(path[-1])
        if "bn_mean" in name or "bn_var" in name:
            continue
        total += int(np.prod(leaf.shape))
    return total


@pytest.mark.slow
def test_features_param_count_matches_torchvision():
    """torchvision mobilenet_v2(width=1.0): features trunk = 2,223,872
    params, +1000-way classifier = 3,504,872 (published model card)."""
    model = MobileNetV2(num_classes=1000)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 82, 114, 3)))["params"]
    clf = _count(params.pop("classifier"))
    assert clf == 1280 * 1000 + 1000
    assert _count_learnable(params) == 2_223_872, _count_learnable(params)


@pytest.mark.slow  # heaviest fast-tier test (76s): full MobileNetV2 fwd
def test_embedding_shape_and_determinism():
    emb = MobileNetV2Embedder()
    frames = np.random.RandomState(0).randint(0, 256, (3, 180, 320, 3),
                                              dtype=np.uint8)
    feats = emb(frames)
    assert feats.shape == (3, 1280)
    assert np.allclose(feats, emb(frames))


def test_preprocess_matches_reference_transform():
    """Resize (90,120) -> CenterCrop (82,114) -> ImageNet normalize
    (process.py:581-587). Constant image must map exactly."""
    val = 128
    frames = np.full((1, 200, 300, 3), val, np.uint8)
    out = preprocess_frames(frames)
    assert out.shape == (1, 82, 114, 3)
    expect = (val / 255.0 - np.asarray([0.485, 0.456, 0.406])) / \
        np.asarray([0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0, 0, 0], expect, atol=1e-5)
    np.testing.assert_allclose(out.std(axis=(0, 1, 2)), 0.0, atol=1e-4)


def _synthetic_torch_state_dict(num_classes=None, seed=0):
    """A state_dict with EXACTLY torchvision mobilenet_v2's key names and
    shapes (features.0.0 stem conv, features.N.conv.{0.0,0.1,...} blocks,
    features.18 head, classifier.1)."""
    torch = pytest.importorskip("torch")
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def convbn(prefix, out_ch, in_ch, k, groups=1):
        sd[f"{prefix}.0.weight"] = torch.randn(out_ch, in_ch // groups, k, k,
                                               generator=g) * 0.05
        sd[f"{prefix}.1.weight"] = torch.rand(out_ch, generator=g) + 0.5
        sd[f"{prefix}.1.bias"] = torch.randn(out_ch, generator=g) * 0.1
        sd[f"{prefix}.1.running_mean"] = torch.randn(out_ch, generator=g) * 0.1
        sd[f"{prefix}.1.running_var"] = torch.rand(out_ch, generator=g) + 0.5

    convbn("features.0", 32, 3, 3)
    in_ch = 32
    feat_i = 1
    for expand, out_ch, n_blocks, _s in _IR_SETTING:
        for _b in range(n_blocks):
            p = f"features.{feat_i}.conv"
            hid = in_ch * expand
            if expand != 1:
                convbn(f"{p}.0", hid, in_ch, 1)
                convbn(f"{p}.1", hid, hid, 3, groups=hid)
                sd[f"{p}.2.weight"] = torch.randn(out_ch, hid, 1, 1,
                                                  generator=g) * 0.05
                convbn_bn = f"{p}.3"
            else:
                convbn(f"{p}.0", hid, hid, 3, groups=hid)
                sd[f"{p}.1.weight"] = torch.randn(out_ch, hid, 1, 1,
                                                  generator=g) * 0.05
                convbn_bn = f"{p}.2"
            sd[f"{convbn_bn}.weight"] = torch.rand(out_ch, generator=g) + 0.5
            sd[f"{convbn_bn}.bias"] = torch.randn(out_ch, generator=g) * 0.1
            sd[f"{convbn_bn}.running_mean"] = torch.randn(out_ch, generator=g) * 0.1
            sd[f"{convbn_bn}.running_var"] = torch.rand(out_ch, generator=g) + 0.5
            in_ch = out_ch
            feat_i += 1
    convbn("features.18", 1280, 320, 1)
    if num_classes:
        sd["classifier.1.weight"] = torch.randn(num_classes, 1280,
                                                generator=g) * 0.05
        sd["classifier.1.bias"] = torch.zeros(num_classes)
    return sd


def test_torch_state_dict_loads_and_runs(tmp_path):
    torch = pytest.importorskip("torch")
    sd = _synthetic_torch_state_dict(num_classes=80)
    path = str(tmp_path / "mnv2.pt")
    torch.save(sd, path)

    params = load_torch_mobilenet_v2(path, num_classes=80)
    emb = MobileNetV2Embedder(params, num_classes=80)
    frames = np.random.RandomState(1).randint(0, 256, (2, 120, 160, 3),
                                              dtype=np.uint8)
    feats = emb(frames)
    scores = emb.object_scores(frames)
    assert feats.shape == (2, 1280)
    assert scores.shape == (2, 80)
    assert (scores >= 0).all() and (scores <= 1).all()
    assert np.isfinite(emb.expected_object_count(frames))


def test_stem_conv_bn_math():
    """Hand-verify the stem: stride-2 3x3 conv (pad 1) + BN, against a
    direct numpy computation on a small input."""
    model = MobileNetV2()
    x = np.random.RandomState(2).randn(1, 6, 6, 3).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 6, 3)))["params"]
    # randomize stem BN so the check is non-trivial
    stem = dict(params["stem"])
    rng = np.random.RandomState(3)
    stem["bn_scale"] = jnp.asarray(rng.rand(32).astype(np.float32) + 0.5)
    stem["bn_mean"] = jnp.asarray(rng.randn(32).astype(np.float32) * 0.1)
    stem["bn_var"] = jnp.asarray(rng.rand(32).astype(np.float32) + 0.5)
    params = dict(params)
    params["stem"] = stem

    from merlot_reserve_tpu.dataset_creation.frame_embedder import _BN_EPS, _ConvBN

    out = _ConvBN(32, kernel=3, stride=2).apply(
        {"params": stem}, jnp.asarray(x))

    w = np.asarray(stem["conv"]["kernel"])  # [3,3,3,32]
    xp = np.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
    ref = np.zeros((1, 3, 3, 32), np.float32)
    for oy in range(3):
        for ox in range(3):
            patch = xp[0, oy * 2:oy * 2 + 3, ox * 2:ox * 2 + 3]  # [3,3,3]
            ref[0, oy, ox] = np.tensordot(patch, w, axes=([0, 1, 2], [0, 1, 2]))
    ref = (ref - np.asarray(stem["bn_mean"])) / \
        np.sqrt(np.asarray(stem["bn_var"]) + _BN_EPS) * \
        np.asarray(stem["bn_scale"]) + np.asarray(stem["bn_bias"])
    ref = np.clip(ref, 0, 6)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_wired_into_static_video_filter():
    """The embedder plugs into filters.is_static_video: identical frames
    read as static, decorrelated noise frames as non-static."""
    emb = MobileNetV2Embedder()
    rng = np.random.RandomState(4)
    frame = rng.randint(0, 256, (160, 240, 3), dtype=np.uint8)
    static = np.stack([frame] * 4)
    moving = rng.randint(0, 256, (4, 160, 240, 3), dtype=np.uint8)
    assert filters.is_static_video(static, frame_embedder=emb)
    # a randomly-initialized net correlates all embeddings (pretrained
    # weights discriminate absolutely); require the relative ordering
    sim_static = filters.mean_pairwise_cosine(emb(static))
    sim_moving = filters.mean_pairwise_cosine(emb(moving))
    assert sim_static > 0.999
    assert sim_moving < sim_static - 1e-4
