"""Throughput of the full on-device example builder (data/device_builder.py)
at FULL base shapes — the whole-example counterpart of
bench_masking_device.py's 26.2k ex/s masking-only number.

Chained timing like bench.py: N builds of the same raw batch under one jit
(key folded per iteration), per-batch = (t(N)-t(1))/(N-1).

Usage: python scripts/bench_device_builder.py [batch ...]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def synth_raw(cfg, builder, rng):
    """One synthetic raw example at full shapes (host_prepare output)."""
    S, TM, AUXL, RTL = builder.S, builder.TM, builder.AUXL, builder.RTL
    d = cfg.data
    tok_num = rng.integers(10, TM, size=S).astype(np.int32)
    tok_ids = rng.integers(10, 30000, size=(S, TM)).astype(np.int32)
    starts = np.sort(rng.uniform(0, 4.5, size=(S, TM)), -1).astype(np.float32)
    return {
        "spec_u8": rng.integers(0, 255, size=(S, d.spec_size, d.num_mels)
                                ).astype(np.uint8),
        "magic": rng.uniform(0.5, 2.0, size=S).astype(np.float32),
        "playback": np.ones(S, np.float32),
        "tok_ids": tok_ids, "tok_num": tok_num,
        "tok_start": starts, "tok_end": (starts + 0.3).astype(np.float32),
        "seg_start": np.zeros(S, np.float32),
        "seg_end": np.full(S, 5.0, np.float32),
        "aux": rng.integers(10, 30000, size=AUXL).astype(np.int32),
        "aux_num": np.int32(AUXL // 2),
        "random_text": rng.integers(10, 30000, size=(
            d.num_text_seqs_in_record, RTL)).astype(np.int32),
        "random_text_num": np.full(d.num_text_seqs_in_record, RTL, np.int32),
        "video_src_index": np.ones(S, np.int32),
    }


def main():
    batch_sizes = [int(a) for a in sys.argv[1:]] or [64, 256]
    n_chain = int(os.environ.get("BENCH_CHAIN", "8"))

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.data.device_builder import (DeviceExampleBuilder,
                                                        stack_raw_examples)

    cfg = mr.load_config("base")
    builder = DeviceExampleBuilder(cfg)
    rng = np.random.default_rng(0)

    for bsz in batch_sizes:
        raws = [synth_raw(cfg, builder, rng) for _ in range(bsz)]
        raw_batch = jax.device_put(
            jax.tree.map(jnp.asarray, stack_raw_examples(raws)))

        def chained(n):
            @jax.jit
            def fn(key, raw):
                def body(c, i):
                    b = builder.build_batch(jax.random.fold_in(key, i), raw)
                    probe = (b["text2audio"].astype(jnp.float32).sum()
                             + b["audio_clips"].astype(jnp.float32).sum())
                    return c + probe, None
                out, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n))
                return out
            return fn

        def sync(x):
            return float(np.asarray(x))

        f1, fN = chained(1), chained(n_chain)
        key = jax.random.PRNGKey(0)
        sync(f1(key, raw_batch))
        t1 = float("inf")
        for _ in range(3):
            t0 = time.time()
            sync(f1(key, raw_batch))
            t1 = min(t1, time.time() - t0)
        sync(fN(key, raw_batch))
        tN = float("inf")
        for _ in range(3):
            t0 = time.time()
            sync(fN(key, raw_batch))
            tN = min(tN, time.time() - t0)

        per_batch = (tN - t1) / (n_chain - 1)
        print(json.dumps({
            "metric": "device_example_builder_examples_per_sec_per_chip",
            "value": round(bsz / per_batch, 1), "unit": "ex/s/chip",
            "batch": bsz, "ms_per_batch": round(per_batch * 1e3, 2),
            "chain": n_chain,
        }), flush=True)


if __name__ == "__main__":
    main()
