"""Benchmark: video segments/sec/chip for PREPROCESS + ENCODE (BASELINE.json
north star: "a raw video segment goes decode-to-embedding on device").

Workload (config 1/2 shape): batches of 8 videos x 8 five-second segments.
Inputs are raw decoded media — uint8 frames [180, 320, 3] and 22050 Hz PCM —
through to unit-normalized joint embeddings.

  * THIS framework: one jit'd device program — resize+patchify (ops/vision),
    matmul-DFT log-mel (ops/audio), towers, joint transformer.
  * REFERENCE pipeline: its host preprocessing (librosa-semantics mel via
    scipy FFT + TF resize_and_pad/space_to_depth, exactly
    mreserve/preprocess.py:121-156,464-481) followed by its model's
    batch_embed_video on the same chip (driven by the same params; trees are
    compatible by construction). Host and device stages are timed separately
    and combined as max() — i.e. we GRANT the baseline perfect host/device
    pipelining, which the sequential reference demo path doesn't even have.

Device timings chain N invocations inside one jit execution and report
(t(N)-t(1))/(N-1) to cancel the dev-chip's per-execution relay overhead
(see CLAUDE.md). Prints ONE json line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

N_VIDEOS = 8
N_SEG = 8
CHAIN = 8
FRAME_H, FRAME_W = 180, 320
SR = 22050
SAMPLES = SR * 5  # 110250 per segment


def _raw_inputs(rng):
    frames = rng.randint(0, 256, (N_VIDEOS, N_SEG, FRAME_H, FRAME_W, 3),
                         dtype=np.uint8)
    pcm = (0.1 * rng.randn(N_VIDEOS, N_SEG, SAMPLES)).astype(np.float32)
    tokens = np.zeros((N_VIDEOS, 160), np.int32)
    tokens[:, :144] = 5  # AUDIOSPAN
    subseg = np.zeros((N_VIDEOS, 160), np.int32)
    subseg[:, :144] = (np.arange(144) // 6)[None]
    return frames, pcm, tokens, subseg


def _time_device(fn_maker, params, args):
    """Chained-iteration device timing; returns (sec_per_iter, params)."""
    times = {}
    for n in (1, CHAIN):
        fn = fn_maker(n)
        params, out = fn(params, *args)
        np.asarray(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            params, out = fn(params, *args)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return max((times[CHAIN] - times[1]) / (CHAIN - 1), 1e-9), params


def _backend_watchdog(limit_s: float = 600.0):
    """Fail fast if the device backend never initializes.

    The axon relay has been observed to go down in a way that makes
    jax.devices() hang indefinitely (CLAUDE.md round-3 gotcha). A hung
    bench is worse than a failed one: exit loudly on stderr with a nonzero
    code instead, and never print a fabricated JSON result line. Returns a
    cancel() callback to call once the backend is up.
    """
    import threading

    done = threading.Event()

    def watch():
        if not done.wait(limit_s):
            print(f"# FATAL: device backend failed to initialize within "
                  f"{limit_s:.0f}s (axon relay down?) — no result",
                  file=sys.stderr, flush=True)
            os._exit(3)

    threading.Thread(target=watch, daemon=True).start()
    return done.set


def main():
    cancel_watchdog = _backend_watchdog()
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.models import MerlotReserve
    from merlot_reserve_tpu.ops.audio import make_spectrogram
    from merlot_reserve_tpu.ops.vision import preprocess_image_to_patches

    on_tpu = jax.default_backend() == "tpu"
    jax.devices()  # force backend init while the watchdog is armed
    cancel_watchdog()
    # unrolled layers: same numerics, but the layer-scan costs a few percent
    # even on the forward path and the whole-graph compile is cached after
    # the first bench run (BASELINE.md round-2 scan_layers findings)
    cfg = mr.load_config("base", use_bfloat16=on_tpu, scan_layers=False)
    model = MerlotReserve.from_config(cfg)
    grid = tuple(cfg.model.output_grid)

    rng = np.random.RandomState(0)
    frames_np, pcm_np, tokens_np, subseg_np = _raw_inputs(rng)
    frames = jnp.asarray(frames_np)
    pcm = jnp.asarray(pcm_np)
    tokens = jnp.asarray(tokens_np)
    subseg = jnp.asarray(subseg_np)

    # init params via the encode path
    dummy_images = jnp.zeros((N_SEG, grid[0] * grid[1], 768))
    dummy_audio = jnp.zeros((3 * N_SEG, 60, 65))
    params = model.init_params(
        {"images": dummy_images, "audio_clips": dummy_audio,
         "tokens": tokens[0], "subseg_idxs": subseg[0]}, method="embed_video")
    params = jax.device_put(params)

    # ---- ours: preprocess + encode fused in one device program ----
    def preprocess_and_encode(p, frames, pcm, tokens, subseg):
        def one_video(fr, au, tok, sub):
            patches = jax.vmap(
                lambda im: preprocess_image_to_patches(im, grid))(fr)
            specs = make_spectrogram(au)  # [N_SEG, 3, 60, 65]
            specs = specs.reshape(-1, 60, 65)
            return model.apply({"params": p}, patches, specs, tok, sub,
                               method=model.embed_video)

        return jax.vmap(one_video)(frames, pcm, tokens, subseg)

    def make_chained(n):
        def chained(p, frames, pcm, tokens, subseg):
            def body(i, carry):
                s, _ = carry
                out = preprocess_and_encode(p, frames, pcm + s * 1e-20, tokens,
                                            subseg)
                return (out.astype(jnp.float32).reshape(-1)[0], out)

            out0 = preprocess_and_encode(p, frames, pcm, tokens, subseg)
            s, out = jax.lax.fori_loop(
                0, n - 1, body, (out0.astype(jnp.float32).reshape(-1)[0], out0))
            return p, out.reshape(-1)[:8]

        return jax.jit(chained, donate_argnums=(0,))

    dt_mine, params = _time_device(make_chained, params,
                                   (frames, pcm, tokens, subseg))
    segs_mine = N_VIDEOS * N_SEG / dt_mine

    # ---- ours: encode-only (pre-patchified inputs, same shape as the
    # reference's batch_embed_video) for the core-compute comparison ----
    images_enc = jnp.asarray(rng.randn(N_VIDEOS, N_SEG, grid[0] * grid[1], 768)
                             .astype(np.float32))
    audio_enc = jnp.asarray(rng.randn(N_VIDEOS, 3 * N_SEG, 60, 65)
                            .astype(np.float32))

    def make_chained_encode(n):
        def chained(p, images, audio, tokens, subseg):
            def one_video(im, au, tok, sub):
                return model.apply({"params": p}, im, au, tok, sub,
                                   method=model.embed_video)

            def body(i, carry):
                s, _ = carry
                out = jax.vmap(one_video)(images + s * 1e-20, audio, tokens,
                                          subseg)
                return (out.astype(jnp.float32).reshape(-1)[0], out)

            out0 = jax.vmap(one_video)(images, audio, tokens, subseg)
            s, out = jax.lax.fori_loop(
                0, n - 1, body, (out0.astype(jnp.float32).reshape(-1)[0], out0))
            return p, out.reshape(-1)[:8]

        return jax.jit(chained, donate_argnums=(0,))

    dt_mine_enc, params = _time_device(make_chained_encode, params,
                                       (images_enc, audio_enc, tokens, subseg))

    # ---- reference pipeline: host preprocessing + on-chip encode ----
    ref_segs = None
    try:
        dt_ref_host = _reference_host_preprocess_time(frames_np, pcm_np, grid)
        dt_ref_dev = _reference_encode_time(params, cfg, grid, tokens, subseg,
                                            rng)
        # grant the baseline perfect pipelining
        dt_ref = max(dt_ref_host, dt_ref_dev)
        ref_segs = N_VIDEOS * N_SEG / dt_ref
        print(f"# ref host preprocess: {dt_ref_host*1000:.1f}ms/batch; "
              f"ref encode: {dt_ref_dev*1000:.1f}ms/batch", file=sys.stderr)
    except Exception as e:
        print(f"# reference baseline unavailable: {type(e).__name__}: {e}",
              file=sys.stderr)

    # ---- MFU: analytic matmul FLOPs / measured time / chip peak ----
    from merlot_reserve_tpu.utils.profiling import device_peak_flops, encode_flops

    peak = device_peak_flops() if on_tpu else None
    mfu = mfu_enc = None
    if peak:
        mfu = encode_flops(cfg, N_VIDEOS, N_SEG, include_preprocess=True) \
            / dt_mine / peak
        mfu_enc = encode_flops(cfg, N_VIDEOS, N_SEG) / dt_mine_enc / peak
        print(f"# our encode-only: {dt_mine_enc*1000:.1f}ms/batch "
              f"(mfu {mfu_enc:.3f}); fused preprocess+encode mfu {mfu:.3f}",
              file=sys.stderr)

    print(json.dumps({
        "metric": "video segments/sec/chip (raw frames+PCM -> joint embeddings,"
                  " base 12x20)",
        "value": round(segs_mine, 2),
        "unit": "segments/sec/chip",
        "vs_baseline": round(segs_mine / ref_segs, 3) if ref_segs else None,
        "mfu": round(mfu, 4) if mfu else None,
        "encode_mfu": round(mfu_enc, 4) if mfu_enc else None,
        "encode_vs_reference": (round(dt_ref_dev / dt_mine_enc, 3)
                                if ref_segs else None),
    }))


def _reference_host_preprocess_time(frames_np, pcm_np, grid) -> float:
    """The reference's host preprocessing per batch: librosa-semantics mel
    (scipy FFT, hann, slaney filterbank — mreserve/preprocess.py:121-156) +
    TF resize_and_pad + space_to_depth (preprocess.py:464-481)."""
    import scipy.signal

    sys.path.insert(0, "/root/reference")
    import tensorflow as tf

    tf.config.experimental.set_visible_devices([], "GPU")
    from pretrain.data_utils import resize_and_pad as ref_resize_and_pad

    from merlot_reserve_tpu.ops.audio import mel_filterbank

    n_fft, hop = 1536, 588
    window = scipy.signal.windows.hann(n_fft)
    mel_w = mel_filterbank(SR, n_fft, 64, 20.0, 11025.0)  # same as librosa's

    def host_mel(y):
        pad = n_fft // 2
        ypad = np.pad(y, pad, mode="reflect")
        n_frames = 1 + (len(ypad) - n_fft) // hop
        idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
        spec = np.fft.rfft(ypad[idx] * window[None, :], axis=-1)
        power = np.abs(spec) ** 2
        return power @ mel_w

    def preprocess_batch():
        for v in range(N_VIDEOS):
            for s in range(N_SEG):
                mel = host_mel(pcm_np[v, s])
                log_mel = np.log(mel + 0.1) - np.log(0.1)
                img = tf.image.convert_image_dtype(frames_np[v, s], tf.float32)
                img, _ = ref_resize_and_pad(img, (grid[0] * 16, grid[1] * 16),
                                            do_random_scale=False,
                                            do_flip_if_vertical=False,
                                            resize_method="bilinear")
                patches = tf.nn.space_to_depth(img[None], 16)
                _ = np.asarray(tf.reshape(patches, [grid[0] * grid[1], 768]))
                _ = log_mel

    preprocess_batch()  # warm tf graphs
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        preprocess_batch()
        best = min(best, time.perf_counter() - t0)
    return best


def _reference_encode_time(params, cfg, grid, tokens, subseg, rng) -> float:
    import jax
    import jax.numpy as jnp
    import yaml

    sys.path.insert(0, "/root/reference")
    import mreserve.modeling as ref_modeling

    from merlot_reserve_tpu.utils.checkpoint import unstack_layer_params

    with open("/root/reference/pretrain/configs/base.yaml") as f:
        ref_cfg = yaml.safe_load(f)
    ref_cfg["model"]["use_bfloat16"] = jax.default_backend() == "tpu"
    ref_model = ref_modeling.MerlotReserve.from_config(ref_cfg)

    images = jnp.asarray(rng.randn(N_VIDEOS, N_SEG, grid[0] * grid[1], 768)
                         .astype(np.float32))
    audio = jnp.asarray(rng.randn(N_VIDEOS, 3 * N_SEG, 60, 65).astype(np.float32))

    def make_chained(n):
        def chained(p, images, audio, tokens, subseg):
            def body(i, carry):
                s, _ = carry
                out = ref_model.apply({"params": p}, images + s * 1e-20, audio,
                                      tokens, subseg,
                                      method=ref_model.batch_embed_video)
                return (out.astype(jnp.float32).reshape(-1)[0], out)

            out0 = ref_model.apply({"params": p}, images, audio, tokens, subseg,
                                   method=ref_model.batch_embed_video)
            s, out = jax.lax.fori_loop(
                0, n - 1, body, (out0.astype(jnp.float32).reshape(-1)[0], out0))
            return p, out.reshape(-1)[:8]

        return jax.jit(chained, donate_argnums=(0,))

    # with scan_layers=False our tree already uses the reference's
    # layer_NN layout; unstacking is only needed for stacked params
    ref_params = jax.device_put(unstack_layer_params(params))
    dt, _ = _time_device(make_chained, ref_params,
                         (images, audio, tokens, subseg))
    return dt


if __name__ == "__main__":
    main()
