"""Weight-format A/B for the serving unit: ONE video (8 segments) through
``embed_video`` — f32 vs bf16 vs weight-only int8 (dequant-in-graph).

Why this experiment: at serving batch sizes the GEMMs are skinny (1920 rows
into H=768), so weight HBM reads are a meaningful fraction of the step —
unlike the rejected *dynamic-quant* int8 GEMM (BASELINE.md round 2), which
paid per-token quantize/dequant compute at K=768. Weight-only int8 keeps
activations bf16 and only changes the bytes-at-rest: if XLA fuses the
int8->bf16 convert+scale into the matmul operand read, HBM weight traffic
halves; if it materializes a bf16 copy per call instead, it LOSES to plain
bf16. The f32-vs-bf16 delta calibrates how weight-bandwidth-bound the shape
actually is. Whatever the outcome, it gets recorded in BASELINE.md.

Timing: chained-iteration methodology (see bench.py / CLAUDE.md) — N
invocations data-chained inside one jit, report (t(N)-t(1))/(N-1).

Usage: python scripts/bench_quant_serving.py [--config base|large]
           [--videos 1] [--chain 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_SEG = 8


def _quantize_leaf(a: np.ndarray):
    """Per-output-channel symmetric int8 over the last axis; None = keep."""
    if a.ndim < 2 or a.size <= 4096:
        return None
    red = tuple(range(a.ndim - 1))
    s = np.max(np.abs(a), axis=red, keepdims=True) / 127.0
    s = np.where(s == 0, 1.0, s).astype(np.float32)
    q = np.clip(np.round(a / s), -127, 127).astype(np.int8)
    return q, s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="base", choices=["base", "large"],
                    help="model scale (large inference fits one v5e chip)")
    ap.add_argument("--videos", type=int, default=1)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--skip_f32", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.models import MerlotReserve

    # scan_layers keeps the relay compiles ~1 layer's worth; both arms of
    # every A/B run under the same layout so deltas are fair
    cfg = mr.load_config(args.config, use_bfloat16=True, scan_layers=True)
    model = MerlotReserve.from_config(cfg)
    grid = tuple(cfg.model.output_grid)

    rng = np.random.RandomState(0)
    B = args.videos
    images = jnp.asarray(
        rng.randn(B, N_SEG, grid[0] * grid[1], 768).astype(np.float32))
    audio = jnp.asarray(rng.randn(B, 3 * N_SEG, 60, 65).astype(np.float32))
    tokens_np = np.zeros((B, 160), np.int32)
    tokens_np[:, :144] = 5
    subseg_np = np.zeros((B, 160), np.int32)
    subseg_np[:, :144] = (np.arange(144) // 6)[None]
    tokens = jnp.asarray(tokens_np)
    subseg = jnp.asarray(subseg_np)

    params = model.init_params(
        {"images": images[0], "audio_clips": audio[0], "tokens": tokens[0],
         "subseg_idxs": subseg[0]}, method="embed_video")
    leaves, treedef = jax.tree_util.tree_flatten(params)
    leaves = [np.asarray(l, np.float32) for l in leaves]

    def embed(p, im, au, tok, sub):
        f = lambda i, a, t, s: model.apply({"params": p}, i, a, t, s,
                                           method=model.embed_video)
        return jax.vmap(f)(im, au, tok, sub)

    def chained_fn(reconstruct, n):
        """reconstruct: device fn (weight leaves) -> params pytree."""

        def chained(wleaves, im, au, tok, sub):
            p = reconstruct(wleaves)
            out0 = embed(p, im, au, tok, sub)

            def body(i, carry):
                s, _ = carry
                out = embed(p, im + s * 1e-20, au, tok, sub)
                return (out.astype(jnp.float32).reshape(-1)[0], out)

            s, out = jax.lax.fori_loop(
                0, n - 1, body, (out0.astype(jnp.float32).reshape(-1)[0], out0))
            return out.reshape(-1)[:8] + s * 0.0, out

        return jax.jit(chained)

    def time_variant(wleaves, reconstruct):
        times = {}
        out_full = None
        for n in (1, args.chain):
            fn = chained_fn(reconstruct, n)
            probe, out = fn(wleaves, images, audio, tokens, subseg)
            np.asarray(probe)
            if n == 1:
                out_full = np.asarray(out, np.float32)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                probe, _ = fn(wleaves, images, audio, tokens, subseg)
                np.asarray(probe)
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        dt = max((times[args.chain] - times[1]) / (args.chain - 1), 1e-9)
        return dt, out_full

    results = {}

    # --- bf16 weights (production serving format) ---
    bf_leaves = [jnp.asarray(l, jnp.bfloat16) for l in leaves]
    recon_plain = lambda wl: jax.tree_util.tree_unflatten(treedef, wl)
    dt_bf16, out_bf16 = time_variant(bf_leaves, recon_plain)
    results["bf16_ms"] = dt_bf16 * 1e3

    # --- f32 weights (bandwidth calibration: 2x the weight bytes) ---
    if not args.skip_f32:
        f32_leaves = [jnp.asarray(l) for l in leaves]
        dt_f32, _ = time_variant(f32_leaves, recon_plain)
        results["f32_ms"] = dt_f32 * 1e3

    # --- weight-only int8, dequantized in-graph ---
    qinfo = [_quantize_leaf(l) for l in leaves]
    kinds = [q is not None for q in qinfo]
    wq = [jnp.asarray(q[0]) if k else jnp.asarray(l, jnp.bfloat16)
          for l, q, k in zip(leaves, qinfo, kinds)]
    scales = [jnp.asarray(q[1]) for q, k in zip(qinfo, kinds) if k]

    def recon_int8(wl):
        ws, sc = wl
        new, si = [], 0
        for w, k in zip(ws, kinds):
            if k:
                new.append(w.astype(jnp.bfloat16) * sc[si].astype(jnp.bfloat16))
                si += 1
            else:
                new.append(w)
        return jax.tree_util.tree_unflatten(treedef, new)

    dt_int8, out_int8 = time_variant((wq, scales), recon_int8)
    results["int8_ms"] = dt_int8 * 1e3

    # output fidelity of the quantization (unit-normed embeddings -> cosine)
    a = out_bf16.reshape(-1, out_bf16.shape[-1])
    b = out_int8.reshape(-1, out_int8.shape[-1])
    cos = np.sum(a * b, -1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9)
    results["int8_vs_bf16_min_cosine"] = float(cos.min())

    q_bytes = sum(q[0].nbytes + q[1].nbytes for q, k in zip(qinfo, kinds) if k)
    q_bytes += sum(2 * l.size for l, k in zip(leaves, kinds) if not k)
    bf_bytes = sum(2 * l.size for l in leaves)
    results["weight_bytes_bf16_mb"] = bf_bytes / 1e6
    results["weight_bytes_int8_mb"] = q_bytes / 1e6
    results["videos"] = B
    results["config"] = args.config
    results["int8_speedup_vs_bf16"] = results["bf16_ms"] / results["int8_ms"]
    print(json.dumps(results))


if __name__ == "__main__":
    main()
