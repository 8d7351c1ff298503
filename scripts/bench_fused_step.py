"""Device time of the FUSED data+train step (trainer.
make_jit_fused_data_train_step): raw byte-decoded arrays -> assembled
examples -> fwd/bwd -> optimizer, as one jit. Same chained-scan methodology
as scripts/bench_train.py ((t(N)-t(1))/(N-1) cancels the relay's
per-execution overhead), so this isolates the DEVICE cost of moving example
assembly inside the step — the end-to-end relay number (raw-array upload
per dispatch) is measured separately by driving DevicePretrainLoader
(fused=True) through run_pretraining.

The chained body threads state through lax.scan, so state.step advances and
the in-graph mask PRNG (fold_in(key, step)) draws FRESH masks every chained
step — exactly the production dependency structure.

Usage: python scripts/bench_fused_step.py [--unroll] [batch ...]
"""

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    args = sys.argv[1:]
    unroll = "--unroll" in args
    frames = "--on_device_frames" in args  # frames assembled in-graph too
    batch_sizes = [int(a) for a in args if not a.startswith("--")] or [1, 2]
    n_chain = int(os.environ.get("BENCH_CHAIN", "8"))

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.data.loader import DevicePretrainLoader
    from merlot_reserve_tpu.data.synthetic import write_synthetic_corpus
    from merlot_reserve_tpu.models import MerlotReservePretrainer
    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.training.optimization import construct_train_state
    from merlot_reserve_tpu.training.trainer import (
        make_jit_fused_data_train_step, train_step)
    from merlot_reserve_tpu.parallel.sharding import (batch_sharding,
                                                      state_shardings)
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = mr.load_config("base", scan_layers=not unroll)
    if frames:
        cfg = cfg.replace_data(on_device_frames=True)
    mesh = make_mesh(dp=1, devices=jax.devices()[:1])

    corpus = os.path.join(tempfile.mkdtemp(prefix="bench_fused"), "c.tfrecord")
    write_synthetic_corpus(corpus, cfg, num_records=max(batch_sizes), seed=0)

    def sync(tree):
        leaf = jax.tree.leaves(tree)[0]
        return float(np.asarray(leaf).reshape(-1)[0])

    pre = MerlotReservePretrainer.from_config(cfg)

    for bsz in batch_sizes:
        loader = DevicePretrainLoader([corpus], cfg, batch_size=bsz, seed=0,
                                      num_workers=1, repeat=True, fused=True)
        it = iter(loader)
        raw_np = next(it)
        builder = loader._dev_builder
        it.close()  # generator close -> producer threads stop

        # eager one-shot build for param init
        raw0 = dict(raw_np)
        images0 = raw0.pop("images", None)
        b0 = dict(jax.device_get(builder.build_batch(
            jax.random.PRNGKey(0), jax.tree.map(jnp.asarray, raw0))))
        if images0 is not None:
            b0["images"] = np.asarray(images0, np.float32)
        params = pre.init_params(b0)
        state = construct_train_state(cfg.optimizer, pre, params)
        del params

        def make_chained(n):
            def fused_chain(state, raw):
                raw = dict(raw)
                images = raw.pop("images", None)

                def body(s, _):
                    key = jax.random.fold_in(jax.random.PRNGKey(0),
                                             s.step.astype(jnp.uint32))
                    batch = dict(builder.build_batch(key, raw))
                    if images is not None:
                        imgs = images
                        if cfg.model.use_bfloat16:
                            imgs = imgs.astype(jnp.bfloat16)
                        batch["images"] = imgs
                    s2, info = train_step(s, batch)
                    return s2, info

                state2, infos = jax.lax.scan(body, state, None, length=n)
                return state2, jax.tree.map(lambda x: x[-1], infos)
            return fused_chain

        s_sh = state_shardings(mesh, state, zero1=True)
        b_sh = batch_sharding(mesh)
        state = jax.device_put(state, s_sh)

        def jit_chain(n):
            return jax.jit(make_chained(n), in_shardings=(s_sh, b_sh),
                           out_shardings=(s_sh, NamedSharding(mesh, P())),
                           donate_argnums=(0,))

        step1 = jit_chain(1)
        stepN = jit_chain(n_chain)
        raw = {k: jnp.asarray(v) for k, v in raw_np.items()}

        state, info = step1(state, raw)
        sync(info)
        t1 = float("inf")
        for _ in range(3):
            t0 = time.time()
            state, info = step1(state, raw)
            sync(info)
            t1 = min(t1, time.time() - t0)

        state, info = stepN(state, raw)
        sync(info)
        tN = float("inf")
        loss = None
        for _ in range(3):
            t0 = time.time()
            state, info = stepN(state, raw)
            loss = sync(info)
            tN = min(tN, time.time() - t0)

        print(f"# bsz={bsz}: t1={t1:.3f}s tN={tN:.3f}s", file=sys.stderr)
        step_s = (tN - t1) / (n_chain - 1)
        segs = bsz * cfg.data.num_segments / step_s
        print(json.dumps({
            "metric": "fused_data_train_step",
            "value": round(segs, 1), "unit": "segments/s/chip",
            "per_chip_batch": bsz, "step_ms": round(step_s * 1e3, 1),
            "scan_layers": not unroll, "on_device_frames": frames,
            "loss_probe": loss, "chain": n_chain,
        }), flush=True)
        del state


if __name__ == "__main__":
    main()
