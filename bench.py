"""Benchmark: video segments/sec/chip for the encode path (BASELINE.json).

Measures batched ``embed_video`` (vision tower + audio tower + joint
transformer + projection) on the real device for:
  * this framework (merlot_reserve_tpu), and
  * the reference implementation (/root/reference/mreserve/modeling.py, run
    as-is under jit on the same chip, driven by the same param tree — the
    trees are compatible by construction),
and prints ONE json line with segments/sec/chip and the ratio.

The reference publishes no numbers (BASELINE.md), so the baseline is measured
here, same chip, same shapes, same dtype.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

N_VIDEOS = 8        # videos per batch
N_SEG = 8           # segments per video
WARMUP = 2
ITERS = 8


def _inputs(cfg, rng):
    import jax.numpy as jnp

    grid_hw = cfg.model.vit_seq_len
    images = rng.randn(N_VIDEOS, N_SEG, grid_hw, 768).astype(np.float32)
    audio = rng.randn(N_VIDEOS, 3 * N_SEG, 60, 65).astype(np.float32)
    tokens = np.zeros((N_VIDEOS, 160), np.int32)
    tokens[:, :144] = 5  # AUDIOSPAN
    subseg = np.zeros((N_VIDEOS, 160), np.int32)
    subseg[:, :144] = (np.arange(144) // 6)[None]
    return tuple(map(jnp.asarray, (images, audio, tokens, subseg)))


def _time_fn(fn, params, args):
    """fn(params, *args) -> (params, out) with params donated. Sync by
    fetching a slice of out — block_until_ready is unreliable on the
    remote-attached device, and non-donated params re-upload per call."""
    import numpy as _np

    params, out = fn(params, *args)  # compile
    _np.asarray(out.reshape(-1)[:8])
    for _ in range(WARMUP):
        params, out = fn(params, *args)
    _np.asarray(out.reshape(-1)[:8])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        params, out = fn(params, *args)
    _np.asarray(out.reshape(-1)[:8])
    dt = (time.perf_counter() - t0) / ITERS
    return dt, params


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.models import MerlotReserve

    on_tpu = jax.default_backend() == "tpu"
    cfg = mr.load_config("base", use_bfloat16=on_tpu)
    model = MerlotReserve.from_config(cfg)

    rng = np.random.RandomState(0)
    images, audio, tokens, subseg = _inputs(cfg, rng)
    args1 = (images[0], audio[0], tokens[0], subseg[0])
    params = model.init_params(
        dict(zip(("images", "audio_clips", "tokens", "subseg_idxs"), args1)),
        method="embed_video")
    params = jax.device_put(params)
    batch_args = (images, audio, tokens, subseg)

    mine = jax.jit(
        lambda p, *a: (p, model.apply({"params": p}, *a,
                                      method=model.batch_embed_video)),
        donate_argnums=(0,))
    dt_mine, params = _time_fn(mine, params, batch_args)
    segs_per_sec = N_VIDEOS * N_SEG / dt_mine

    # ---- reference baseline on the same chip ----
    ref_segs_per_sec = None
    try:
        sys.path.insert(0, "/root/reference")
        import mreserve.modeling as ref_modeling
        import yaml

        with open("/root/reference/pretrain/configs/base.yaml") as f:
            ref_cfg = yaml.safe_load(f)
        ref_cfg["model"]["use_bfloat16"] = on_tpu
        ref_model = ref_modeling.MerlotReserve.from_config(ref_cfg)

        from merlot_reserve_tpu.utils.checkpoint import unstack_layer_params

        ref_fn = jax.jit(
            lambda p, *a: (p, ref_model.apply(
                {"params": p}, *a, method=ref_model.batch_embed_video)),
            donate_argnums=(0,))
        # our params are scan-stacked; the reference wants per-layer trees
        ref_params = jax.device_put(unstack_layer_params(params))
        dt_ref, _ = _time_fn(ref_fn, ref_params, batch_args)
        ref_segs_per_sec = N_VIDEOS * N_SEG / dt_ref
    except Exception as e:  # reference not available / not runnable here
        print(f"# reference baseline unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)

    result = {
        "metric": "video segments/sec/chip (batched embed_video, base, 12x20)",
        "value": round(segs_per_sec, 2),
        "unit": "segments/sec/chip",
        "vs_baseline": round(segs_per_sec / ref_segs_per_sec, 3)
        if ref_segs_per_sec else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
