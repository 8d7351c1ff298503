"""Throughput of the on-device masking engine (ops/masking_device.py).

Context: the host loader's masking runs in numpy at ~3.5ms/example inside
the 25 ex/s/core pipeline (BASELINE.md host data plane). This measures the
device alternative: the full chain (reassign empty -> widen textmask ->
MASK/AUDIOSPAN rewrite -> Gumbel budget select) vmapped over a batch and
jitted as ONE program — masking moves off the host entirely, e.g. for
on-accelerator re-masking of cached token streams (fresh masks every epoch
without re-reading data).

Prints one JSON line with examples/sec on the current backend.
"""

import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

BATCH = 256
N_ROWS = 48          # 16 segments x 3 subsegments (base shapes)
MAX_ROW = 16
L = N_ROWS * 8       # flat token budget per example
SEQ = 160            # lang_seq_len
CHAIN = 8


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.jax_cache"))
    import jax.numpy as jnp

    from merlot_reserve_tpu.ops import masking_device as dev

    def one_example(key, tokens, lens, masked, cent, ase):
        k1, k2, k3 = jax.random.split(key, 3)
        lens = dev.reassign_empty_tokens(lens, masked, k1)
        lens = dev.increase_textmask(lens, masked, cent, ase, k2)
        spans, streams = dev.mask_tokens(
            k3, tokens, lens, masked, max_row=MAX_ROW, do_audio_mask=True,
            padded_seq_len=SEQ, num_groups=2)
        (t0, v0), (t1, v1) = streams
        return spans, t0, v0, t1, v1

    batched = jax.vmap(one_example)

    def chained(n):
        def fn(keys, tokens, lens, masked, cent, ase):
            def body(carry, _):
                keyseed, acc = carry
                out = batched(keys + keyseed, tokens, lens, masked, cent, ase)
                return (keyseed + 1, out[1][0, 0, 0]), None

            out0 = batched(keys, tokens, lens, masked, cent, ase)
            (seed, probe), _ = jax.lax.scan(
                body, (jnp.uint32(1), out0[1][0, 0, 0]), None, length=n - 1)
            return probe, out0[1]

        return jax.jit(fn)

    rng = np.random.default_rng(0)
    lens = rng.integers(0, MAX_ROW // 2, size=(BATCH, N_ROWS)).astype(np.int32)
    # flat layout: every example padded to L tokens (tail tokens unused)
    lens = np.minimum(lens, L // N_ROWS)
    tokens = rng.integers(10, 30000, size=(BATCH, L)).astype(np.int32)
    cent = np.sort(rng.uniform(0, 80, size=(BATCH, L)), axis=-1).astype(np.float32)
    masked = rng.random((BATCH, N_ROWS)) < 0.25
    starts = np.sort(rng.uniform(0, 75, size=(BATCH, N_ROWS)), axis=-1)
    ase = np.stack([starts, starts + 3.0], -1).astype(np.float32)
    keys = jax.vmap(jax.random.PRNGKey)(np.arange(BATCH, dtype=np.uint32))

    args = (keys, jnp.asarray(tokens), jnp.asarray(lens), jnp.asarray(masked),
            jnp.asarray(cent), jnp.asarray(ase))

    times = {}
    for n in (1, CHAIN):
        fn = chained(n)
        probe, out = fn(*args)
        np.asarray(probe)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            probe, out = fn(*args)
            np.asarray(probe)
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    dt = max((times[CHAIN] - times[1]) / (CHAIN - 1), 1e-9)

    print(json.dumps({
        "metric": "device_masking_examples_per_sec",
        "value": round(BATCH / dt, 1), "unit": "examples/s",
        "batch": BATCH, "backend": jax.default_backend(),
        "ms_per_batch": round(dt * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
