"""Checkpoint FILE interop with the reference, both directions.

The real-checkpoint acceptance gate (zero-shot accuracy parity against
gs://merlotreserve/ckpts/*) is unreachable in this environment (no network);
this suite is its maximal in-env slice: bytes written by the reference's own
mreserve/checkpoint.py:61-118 must restore through our utils/checkpoint
layer — and vice versa — with exact leaf equality, exercising the f16
compress/decompress convention, the 'ckpt_' prefix, no_optimizer mode, the
full optimizer-state layout (bf16 mu, cube-root-bf16 nu, optax chain
positions), and the layer_NN <-> stacked scan conversion.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import merlot_reserve_tpu as mr
from merlot_reserve_tpu.models import MerlotReserve
from merlot_reserve_tpu.utils import checkpoint as ckpt_lib


@pytest.fixture(scope="module")
def ref_ckpt(reference_modeling):
    """The reference's own checkpoint module (read-only oracle), with the
    legacy jax.tree_map shim its pinned-jax code expects."""
    if not hasattr(jax, "tree_map"):
        jax.tree_map = jax.tree.map
    if not hasattr(jax, "tree_multimap"):
        jax.tree_multimap = jax.tree.map
    import mreserve.checkpoint as rc

    return rc


@pytest.fixture(scope="module")
def ref_opt(ref_ckpt):
    import pretrain.optimization as ro

    return ro


@pytest.fixture(scope="module")
def tiny(reference_modeling):
    cfg = mr.load_config("base", hidden_size=64, joint_num_layers=2,
                         vit_num_layers=2, audio_num_layers=2,
                         span_num_layers=2, size_per_head=32,
                         output_grid=(4, 4), use_bfloat16=False,
                         scan_layers=False)
    model = MerlotReserve.from_config(cfg)
    params = model.init_params_full()

    ref_cfg = {
        "data": {},
        "model": {
            "hidden_size": 64, "joint_num_layers": 2, "use_bfloat16": False,
            "audio_num_layers": 2, "audio_patch_size": 2,
            "audio_seq_length": 60, "audio_token_length": 6,
            "output_grid": [4, 4], "vit_patch_size": 16,
            "vit_pooling_ratio": 2, "vit_num_layers": 2, "span_num_layers": 2,
            "text_span_length": 15, "size_per_head": 32,
        },
    }
    ref_model = reference_modeling.MerlotReserve.from_config(ref_cfg)
    return cfg, model, ref_model, params


def _video_args(seed=0, n_seg=4):
    from merlot_reserve_tpu.tokenizer import AUDIOSPAN, MASK

    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.randn(n_seg, 16, 768).astype(np.float32))
    audio = jnp.asarray(rng.randn(3 * n_seg, 60, 65).astype(np.float32))
    tokens = np.zeros(40, np.int32)
    tokens[:18] = AUDIOSPAN
    tokens[18:24] = [100, 200, MASK, 300, 400, 2]
    subseg = np.zeros(40, np.int32)
    subseg[:18] = np.arange(18) // 6
    subseg[18:24] = 3
    return images, audio, jnp.asarray(tokens), jnp.asarray(subseg)


def _f16_roundtrip(tree):
    return jax.tree.map(
        lambda x: x.astype(jnp.float16).astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)


def _assert_trees_equal(a, b, msg=""):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert len(la) == len(lb), f"{msg}: leaf counts {len(la)} vs {len(lb)}"
    for i, (x, y) in enumerate(zip(la, lb)):
        x, y = np.asarray(x), np.asarray(y)
        assert x.dtype == y.dtype, f"{msg} leaf {i}: {x.dtype} vs {y.dtype}"
        np.testing.assert_array_equal(x, y, err_msg=f"{msg} leaf {i}")


def _ref_opt_config(cfg):
    o = cfg.optimizer
    return {"learning_rate": o.learning_rate, "num_train_steps": 100,
            "num_warmup_steps": 10, "weight_decay_rate": o.weight_decay_rate,
            "beta_1": o.beta_1, "beta_2": o.beta_2, "eps": o.eps,
            "use_bfloat16_adam": True,
            "do_bias_correction": o.do_bias_correction}


def _dummy_grads(params, scale=1e-2):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    grads = [jnp.full_like(x, scale * (i % 5 + 1)) for i, x in enumerate(leaves)]
    return jax.tree_util.tree_unflatten(treedef, grads)


# ---------------------------------------------------------------------------
# reference save -> our load
# ---------------------------------------------------------------------------


def test_reference_save_our_load_full_state(ref_ckpt, ref_opt, tiny, tmp_path):
    """A full train state written by the reference's save_checkpoint (f16
    compress, replica-0 extraction, ckpt_ prefix) restores into OUR
    TrainState structure with exact leaves — params AND the bf16-Adam
    optimizer layout (mreserve/checkpoint.py:61-99)."""
    import dataclasses

    from flax import jax_utils

    from merlot_reserve_tpu.training.optimization import construct_train_state

    cfg, model, ref_model, params = tiny
    cfg = dataclasses.replace(cfg, optimizer=dataclasses.replace(
        cfg.optimizer, num_train_steps=100, num_warmup_steps=10))

    ref_state = ref_opt.construct_train_state(_ref_opt_config(cfg), ref_model,
                                              params)
    # one real update so moments/counters are nonzero
    ref_state = ref_state.apply_gradients(grads=_dummy_grads(params))

    path = str(tmp_path / "ref_save")
    os.makedirs(path)
    ref_ckpt.save_checkpoint(jax_utils.replicate(ref_state), path)
    assert any(f.startswith("ckpt_") for f in os.listdir(path))

    target = construct_train_state(
        cfg.optimizer, model, jax.tree.map(jnp.zeros_like, params))
    loaded = ckpt_lib.load_checkpoint(path, state=target)

    assert int(loaded.step) == 1
    _assert_trees_equal(loaded.params, _f16_roundtrip(ref_state.params),
                        "params")
    # optimizer layout: position 0 of the optax chain is bf16-Adam
    ours_adam, ref_adam = loaded.opt_state[0], ref_state.opt_state[0]
    assert int(ours_adam.count) == 1
    _assert_trees_equal(ours_adam.mu, ref_adam.mu, "adam mu (bf16)")
    _assert_trees_equal(ours_adam.nu, ref_adam.nu, "adam nu (cube-root bf16)")


def test_reference_save_our_load_forward_parity(ref_ckpt, ref_opt, tiny,
                                                tmp_path):
    """no_optimizer save (the released-checkpoint format, fixres/finetune
    path) -> our raw-dict load -> layer stacking -> scan-model forward must
    match the reference model driven by its own in-memory params."""
    from flax import jax_utils

    cfg, model, ref_model, params = tiny

    ref_state = ref_opt.construct_train_state(_ref_opt_config(cfg), ref_model,
                                              params)
    path = str(tmp_path / "ref_save_noopt")
    os.makedirs(path)
    ref_ckpt.save_checkpoint(jax_utils.replicate(ref_state), path,
                             no_optimizer=True)

    raw = ckpt_lib.load_checkpoint(path)
    assert raw["opt_state"] is None
    restored = raw["params"]
    _assert_trees_equal(restored, _f16_roundtrip(params), "params")

    # the stacked (scan_layers=True) model consumes the same file through
    # stack_layer_params — the from_params conversion path
    scan_cfg = mr.load_config("base", hidden_size=64, joint_num_layers=2,
                              vit_num_layers=2, audio_num_layers=2,
                              span_num_layers=2, size_per_head=32,
                              output_grid=(4, 4), use_bfloat16=False,
                              scan_layers=True)
    scan_model = MerlotReserve.from_config(scan_cfg)
    stacked = ckpt_lib.stack_layer_params(restored)

    args = _video_args()
    out_ours = scan_model.apply({"params": stacked}, *args,
                                method=scan_model.embed_video)
    out_ref = ref_model.apply({"params": params}, *args,
                              method=ref_model.embed_video)
    # f16 compress puts the two param sets within half-precision of each
    # other; embed_video output is unit-normalized so 2e-3 is generous
    np.testing.assert_allclose(np.asarray(out_ours), np.asarray(out_ref),
                               atol=2e-3)


# ---------------------------------------------------------------------------
# our save -> reference load
# ---------------------------------------------------------------------------


def test_our_save_reference_load(ref_ckpt, ref_opt, tiny, tmp_path):
    """Bytes we write restore through the reference's own restore path —
    both into a raw dict and into its TrainState target — with exact
    leaves, and drive the reference model."""
    import dataclasses

    from merlot_reserve_tpu.training.optimization import construct_train_state

    cfg, model, ref_model, params = tiny
    cfg = dataclasses.replace(cfg, optimizer=dataclasses.replace(
        cfg.optimizer, num_train_steps=100, num_warmup_steps=10))

    state = construct_train_state(cfg.optimizer, model, params)
    state = state.apply_gradients(grads=_dummy_grads(params))

    path = str(tmp_path / "our_save")
    os.makedirs(path)
    ckpt_lib.save_checkpoint(state, path)
    assert any(f.startswith("ckpt_") for f in os.listdir(path))

    # raw-dict restore (how the reference loads released checkpoints when
    # no target is given)
    raw = ref_ckpt.load_checkpoint(path)
    _assert_trees_equal(raw["params"], _f16_roundtrip(state.params), "params")

    # TrainState-target restore: the reference's own optax chain layout
    # accepts our serialized opt_state positions
    ref_target = ref_opt.construct_train_state(
        _ref_opt_config(cfg), ref_model,
        jax.tree.map(jnp.zeros_like, params))
    ref_loaded = ref_ckpt.load_checkpoint(path, state=ref_target)
    assert int(ref_loaded.step) == 1
    _assert_trees_equal(ref_loaded.opt_state[0].mu, state.opt_state[0].mu,
                        "adam mu")
    _assert_trees_equal(ref_loaded.opt_state[0].nu, state.opt_state[0].nu,
                        "adam nu")

    # the restored params drive the reference model
    args = _video_args()
    out_ref = ref_model.apply({"params": raw["params"]}, *args,
                              method=ref_model.embed_video)
    out_ours = model.apply({"params": state.params}, *args,
                           method=model.embed_video)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_ours),
                               atol=2e-3)


def test_our_save_no_optimizer_reference_load(tiny, ref_ckpt, tmp_path):
    """no_optimizer round trip through our writer and the reference reader
    (the finetune/fixres release convention, checkpoint.py:85-93)."""
    from flax.training import train_state
    import optax

    cfg, model, ref_model, params = tiny
    state = train_state.TrainState.create(apply_fn=model.apply, params=params,
                                          tx=optax.sgd(0.1))
    path = str(tmp_path / "our_noopt")
    os.makedirs(path)
    ckpt_lib.save_checkpoint(state, path, no_optimizer=True)
    raw = ref_ckpt.load_checkpoint(path)
    assert raw["opt_state"] is None
    _assert_trees_equal(raw["params"], _f16_roundtrip(params), "params")


def test_stack_unstack_roundtrip_through_file(tiny, tmp_path):
    """layer_NN -> file -> stacked -> unstacked reproduces the original
    tree exactly (the from_params conversion is file-stable)."""
    cfg, model, ref_model, params = tiny
    from flax.training import train_state
    import optax

    state = train_state.TrainState.create(apply_fn=model.apply, params=params,
                                          tx=optax.sgd(0.1))
    path = str(tmp_path / "stack")
    os.makedirs(path)
    ckpt_lib.save_checkpoint(state, path, no_optimizer=True)
    restored = ckpt_lib.load_checkpoint(path)["params"]
    rt = ckpt_lib.unstack_layer_params(ckpt_lib.stack_layer_params(restored))
    _assert_trees_equal(rt, _f16_roundtrip(params), "roundtrip")


import pytest  # noqa: E402

# heavy tier: full-model / multi-device / subprocess tests
pytestmark = pytest.mark.slow


def test_convert_checkpoint_cli_roundtrip(tiny, ref_ckpt, ref_opt, tmp_path):
    """scripts/convert_checkpoint.py: reference file -> --to-scan file that
    drives the scan model; --to-layers inverse restores byte-for-byte
    through the reference reader."""
    import subprocess
    import sys

    from flax import jax_utils

    cfg, model, ref_model, params = tiny
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "scripts", "convert_checkpoint.py")

    src = str(tmp_path / "src")
    os.makedirs(src)
    ref_state = ref_opt.construct_train_state(_ref_opt_config(cfg), ref_model,
                                              params)
    ref_ckpt.save_checkpoint(jax_utils.replicate(ref_state), src,
                             no_optimizer=True)

    scan_dir = str(tmp_path / "scan")
    proc = subprocess.run(
        [sys.executable, script, src, scan_dir, "--to-scan"],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-1500:]

    scanned = ckpt_lib.load_checkpoint(scan_dir)["params"]
    assert "layers" in scanned["joint_transformer"]
    scan_cfg = mr.load_config("base", hidden_size=64, joint_num_layers=2,
                              vit_num_layers=2, audio_num_layers=2,
                              span_num_layers=2, size_per_head=32,
                              output_grid=(4, 4), use_bfloat16=False,
                              scan_layers=True)
    scan_model = MerlotReserve.from_config(scan_cfg)
    args = _video_args()
    out_scan = scan_model.apply({"params": scanned}, *args,
                                method=scan_model.embed_video)
    out_ref = ref_model.apply({"params": params}, *args,
                              method=ref_model.embed_video)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_ref),
                               atol=2e-3)

    # inverse: scan file -> reference layout, restored by the reference
    back_dir = str(tmp_path / "layers")
    proc = subprocess.run(
        [sys.executable, script, scan_dir, back_dir, "--to-layers"],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-1500:]
    raw = ref_ckpt.load_checkpoint(back_dir)
    _assert_trees_equal(raw["params"], _f16_roundtrip(params), "roundtrip")
