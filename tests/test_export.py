"""AOT serving artifacts (merlot_reserve_tpu/export.py): export -> load ->
serve parity, with no re-trace of model code on the loading side."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # module fixture exports a model (~50s setup)

import merlot_reserve_tpu as mr
from merlot_reserve_tpu.models import MerlotReserve
from merlot_reserve_tpu.tokenizer import AUDIOSPAN, MASK


@pytest.fixture(scope="module")
def tiny_model():
    cfg = mr.load_config("base", hidden_size=64, joint_num_layers=2,
                         vit_num_layers=2, audio_num_layers=2,
                         span_num_layers=2, size_per_head=32,
                         output_grid=(4, 4), use_bfloat16=False)
    model = MerlotReserve.from_config(cfg)

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

    import jax.numpy as jnp

    pres = [make_pre(i) for i in range(3)]
    params = model.init_params({k: jnp.asarray(v) for k, v in pres[0].items()},
                               method="embed_video")
    # embed_video never touches the span tower; the label-space export needs
    # it (a real checkpoint carries the full tree)
    import jax

    span_params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, model.config.text_span_length), jnp.int32),
        method=model.embed_text_spans_only)["params"]
    params = {**dict(span_params), **dict(params)}
    return model, params, pres


@pytest.fixture(scope="module")
def artifact(tiny_model, tmp_path_factory):
    from merlot_reserve_tpu.export import export_serving_artifact

    model, params, pres = tiny_model
    path = str(tmp_path_factory.mktemp("artifact"))
    manifest = export_serving_artifact(model, params, pres[0], path,
                                       batch_size=2, num_options=8,
                                       platforms=("cpu",))
    return path, manifest


def test_artifact_files_and_manifest(artifact):
    path, manifest = artifact
    for fn in ("manifest.json", "embed_video.jaxexp", "label_space.jaxexp",
               "params.msgpack"):
        assert os.path.exists(os.path.join(path, fn)), fn
    with open(os.path.join(path, "manifest.json")) as f:
        on_disk = json.load(f)
    assert on_disk == manifest
    assert manifest["batch_size"] == 2
    assert manifest["input_shapes"]["images"] == [2, 2, 16, 768]


def test_exported_embed_matches_live_model(artifact, tiny_model):
    import jax

    from merlot_reserve_tpu.export import load_serving_artifact
    from merlot_reserve_tpu.utils.checkpoint import (compress_state,
                                                     decompress_state)

    model, params, pres = tiny_model
    path, _ = artifact
    svc = load_serving_artifact(path)

    out = svc.embed(pres[:2])
    assert out.shape == (2, 40, 64)

    # live side with the same f16 round-trip the artifact stores
    params16 = decompress_state(compress_state(params))
    ref = np.stack([np.asarray(model.apply(
        {"params": params16}, *(v[k] for k in ("images", "audio_clips",
                                               "tokens", "subseg_idxs")),
        method=model.embed_video)) for v in pres[:2]])
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)

    # padding path + micro-batching
    out3 = svc.embed_stream(pres)
    assert out3.shape == (3, 40, 64)
    np.testing.assert_allclose(out3[:2], out, atol=1e-6)


def test_exported_label_space(artifact, tiny_model):
    from merlot_reserve_tpu.export import load_serving_artifact

    model, params, pres = tiny_model
    path, manifest = artifact
    svc = load_serving_artifact(path)
    opts = np.zeros((3, manifest["span_length"]), np.int32)
    opts[:, :2] = [[101, 2], [202, 2], [303, 2]]
    vecs = svc.label_space(opts)
    assert vecs.shape == (3, 64)
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=-1), 1.0, atol=1e-3)
    # distinct options embed distinctly
    assert np.abs(vecs[0] - vecs[1]).max() > 1e-4


def test_loader_needs_no_model_code():
    """The artifact loader must not import the model/tower modules — the
    serving host runs from StableHLO alone."""
    import ast

    src = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "merlot_reserve_tpu", "export.py")).read()
    tree = ast.parse(src)
    load_fn = next(n for n in ast.walk(tree) if isinstance(n, ast.FunctionDef)
                   and n.name == "load_serving_artifact")
    for node in ast.walk(load_fn):
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            mod = getattr(node, "module", None) or node.names[0].name
            assert "models" not in mod and "towers" not in mod, mod


def test_exported_empty_request_shape(artifact):
    """Empty requests return the same RANK as non-empty ones: [0, L, H]
    with L = the exported token length (a caller concatenating per-shard
    results must not hit a rank mismatch)."""
    from merlot_reserve_tpu.export import load_serving_artifact

    path, _ = artifact
    svc = load_serving_artifact(path)
    out = svc.embed([])
    L = svc.manifest["input_shapes"]["tokens"][1]
    H = svc.manifest["hidden_size"]
    assert out.shape == (0, L, H)
