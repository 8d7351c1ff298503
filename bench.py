"""Benchmark: video segments/sec/chip for the encode path (BASELINE.json).

Measures batched ``embed_video`` (vision tower + audio tower + joint
transformer + projection) on the real device for:
  * this framework (merlot_reserve_tpu), and
  * the reference implementation (/root/reference/mreserve/modeling.py, run
    as-is under jit on the same chip, driven by the same param tree — the
    trees are compatible by construction),
and prints ONE json line with segments/sec/chip and the ratio.

Methodology: the remote-attached dev chip re-uploads non-donated args per
execution and has ~30ms dispatch overhead, so each measurement chains N
model invocations inside ONE jit execution (serialized by a data dependency)
and reports (t(N) - t(1)) / (N - 1) — pure device compute throughput, which
is what transfers to production TPUs where input feeding is pipelined.

The reference publishes no numbers (BASELINE.md); the baseline is measured
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
CHAIN = 8           # model invocations chained per jit execution


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


def _make_chained(apply_fn, n):
    """Build fn(params, images, audio, tokens, subseg) running `n` serialized
    model invocations (each depends on the previous output)."""
    import jax
    import jax.numpy as jnp

    def chained(params, images, audio, tokens, subseg):
        def body(i, carry):
            s, _ = carry
            out = apply_fn(params, images + s * 1e-20, audio, tokens, subseg)
            return (out.astype(jnp.float32).reshape(-1)[0], out)

        s0 = jnp.float32(0.0)
        out0 = apply_fn(params, images, audio, tokens, subseg)
        s, out = jax.lax.fori_loop(0, n - 1, body, (out0.astype(jnp.float32).reshape(-1)[0], out0))
        return params, out.reshape(-1)[:8]

    return jax.jit(chained, donate_argnums=(0,), static_argnums=())


def _time_chained(apply_fn, params, args):
    import numpy as _np

    fns = {n: _make_chained(apply_fn, n) for n in (1, CHAIN)}
    times = {}
    for n, fn in fns.items():
        params, out = fn(params, *args)  # compile + run
        _np.asarray(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            params, out = fn(params, *args)
            _np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    per_iter = (times[CHAIN] - times[1]) / (CHAIN - 1)
    return max(per_iter, 1e-9), params


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

    def my_apply(p, *a):
        return model.apply({"params": p}, *a, method=model.batch_embed_video)

    dt_mine, params = _time_chained(my_apply, params, batch_args)
    segs_per_sec = N_VIDEOS * N_SEG / dt_mine

    # ---- reference baseline on the same chip ----
    ref_segs_per_sec = None
    try:
        sys.path.insert(0, "/root/reference")
        import mreserve.modeling as ref_modeling
        import yaml

        from merlot_reserve_tpu.utils.checkpoint import unstack_layer_params

        with open("/root/reference/pretrain/configs/base.yaml") as f:
            ref_cfg = yaml.safe_load(f)
        ref_cfg["model"]["use_bfloat16"] = on_tpu
        ref_model = ref_modeling.MerlotReserve.from_config(ref_cfg)

        def ref_apply(p, *a):
            return ref_model.apply({"params": p}, *a,
                                   method=ref_model.batch_embed_video)

        ref_params = jax.device_put(unstack_layer_params(params))
        dt_ref, _ = _time_chained(ref_apply, ref_params, batch_args)
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
