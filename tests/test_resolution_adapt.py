"""Resolution adaptation: rotary (not learned) positions make params
grid-independent — the property train_fixres.py exploits (SURVEY §3.4)."""

import jax.numpy as jnp
import numpy as np
import pytest

import merlot_reserve_tpu as mr
from merlot_reserve_tpu.models import MerlotReserve
from merlot_reserve_tpu.tokenizer import AUDIOSPAN


def _inputs(grid, n_seg=2, seed=0):
    rng = np.random.RandomState(seed)
    hw = grid[0] * grid[1]
    images = jnp.asarray(rng.randn(n_seg, hw, 768).astype(np.float32))
    audio = jnp.asarray(rng.randn(3 * n_seg, 60, 65).astype(np.float32))
    tokens = np.full(40, 0, np.int32)
    tokens[:12] = AUDIOSPAN
    tokens[12:16] = [100, 200, 300, 2]
    subseg = np.zeros(40, np.int32)
    subseg[:12] = np.arange(12) // 6
    return images, audio, jnp.asarray(tokens), jnp.asarray(subseg)


def test_same_params_across_grids():
    base_kw = dict(hidden_size=64, joint_num_layers=2, vit_num_layers=2,
                   audio_num_layers=2, span_num_layers=2, size_per_head=32,
                   use_bfloat16=False)
    cfg_small = mr.load_config("base", output_grid=(4, 4), **base_kw)
    model_small = MerlotReserve.from_config(cfg_small)
    args_small = _inputs((4, 4))
    params = model_small.init_params(
        dict(zip(("images", "audio_clips", "tokens", "subseg_idxs"), args_small)),
        method="embed_video")

    out_small = model_small.apply({"params": params}, *args_small,
                                  method=model_small.embed_video)
    assert np.isfinite(np.asarray(out_small)).all()

    # the SAME params drive a higher-resolution model (fixres semantics)
    for grid in [(6, 8), (8, 8)]:
        cfg_big = mr.load_config("base", output_grid=grid, **base_kw)
        model_big = MerlotReserve.from_config(cfg_big)
        out_big = model_big.apply({"params": params}, *_inputs(grid),
                                  method=model_big.embed_video)
        assert out_big.shape == (40, 64)
        assert np.isfinite(np.asarray(out_big)).all()
        norms = np.linalg.norm(np.asarray(out_big, np.float32), axis=-1)
        np.testing.assert_allclose(norms[:16], 1.0, atol=1e-2)


import pytest  # noqa: E402

# heavy tier: full-model / multi-device / subprocess tests
pytestmark = pytest.mark.slow
