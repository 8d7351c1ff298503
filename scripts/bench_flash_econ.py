#!/usr/bin/env python
"""Flash batch-4 training ECONOMICS on one chip (VERDICT r3 item 8).

Round 3 established residency: base batch 4 no-remat OOMs with XLA dense
attention (31.9G) but RUNS with the Pallas flash joint tower
(flash:640:640), at ~13%% more per-step device time (BASELINE.md
"Flash attention at the flagship training shape"). This script tests the
claim that the bigger per-chip batch buys CONVERGENCE PER WALL-CLOCK, not
just residency: two soaks from identical initial params over the same
structured learnable corpus (the r3 soak recipe),

  A: XLA dense attention, per-chip batch 2 (its no-remat ceiling, unrolled)
  B: flash:640:640,       per-chip batch 4

both logging (cumulative TRAIN wall-clock, eval loss on a FIXED eval set).
Eval uses each run's own forward (flash is exact attention — same math to
1e-3) on the same eval batches, so the curves are directly comparable;
raw train losses are NOT (the InfoNCE denominator grows with batch).
Eval pauses are excluded from the train clock.

LR is held at the recipe value for both (no batch-size rescale): this
biases AGAINST batch 4, so a batch-4 win is conservative.

Usage: python scripts/bench_flash_econ.py [--steps 800] [--eval_every 100]
Prints one JSON line per (variant, eval point) and a final summary.
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

    def opt(name, default):
        for a in args:
            if a.startswith(f"--{name}="):
                return int(a.split("=", 1)[1])
        return default

    steps_a = opt("steps", 800)       # XLA batch-2 steps
    eval_every = opt("eval_every", 100)
    n_eval_batches = opt("eval_batches", 4)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.jax_cache"))
    import jax.numpy as jnp

    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.data.loader import PretrainLoader
    from merlot_reserve_tpu.data.synthetic import write_synthetic_corpus
    from merlot_reserve_tpu.models import MerlotReservePretrainer
    from merlot_reserve_tpu.models.pretrainer import loss_fn_given_preds
    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.parallel.mesh import activate_mesh
    from merlot_reserve_tpu.parallel.sharding import (batch_sharding,
                                                      state_shardings)
    from merlot_reserve_tpu.training.optimization import construct_train_state
    from merlot_reserve_tpu.training.trainer import train_step
    from jax.sharding import NamedSharding, PartitionSpec as P

    def make_cfg(impl):
        cfg = mr.load_config(
            os.path.join(REPO, "merlot_reserve_tpu", "configs",
                         "soak_onechip.yaml"),)
        import dataclasses
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, scan_layers=False, joint_attention_impl=impl))
        return cfg

    # one structured (learnable) corpus shared by both runs
    td = tempfile.mkdtemp(prefix="flash_econ")
    cfg0 = make_cfg(None)
    files = []
    for i in range(2):
        p = os.path.join(td, f"fold{i:05d}.tfrecord")
        write_synthetic_corpus(p, cfg0, num_records=32, seed=i,
                               structured=True)
        files.append(p)

    def sync(x):
        return float(np.asarray(jax.tree.leaves(x)[0]).reshape(-1)[0])

    mesh = make_mesh(dp=1, devices=jax.devices()[:1])

    # fixed eval set drawn once (same bytes for both runs); ONE batched
    # eval call per eval point — through the relay every non-donated call
    # re-uploads params (CLAUDE.md), so fewer, fatter eval calls
    eval_loader = PretrainLoader(files, cfg0, batch_size=2 * n_eval_batches,
                                 seed=999, num_workers=2, repeat=True,
                                 use_bfloat16=True, shuffle_buffer=1)
    eit = iter(eval_loader)
    eval_batch = next(eit)
    eit.close()

    results = {}
    for impl, bsz, n_steps in [(None, 2, steps_a),
                               ("flash:640:640", 4, steps_a // 2)]:
        cfg = make_cfg(impl)
        pre = MerlotReservePretrainer.from_config(cfg)
        loader = PretrainLoader(files, cfg, batch_size=bsz, seed=7,
                                num_workers=4, prefetch=4,
                                use_bfloat16=True)
        it = iter(loader)
        first = next(it)
        params = pre.init_params(first)  # seed fixed -> identical init
        state = construct_train_state(cfg.optimizer, pre, params)
        del params

        s_sh = state_shardings(mesh, state, zero1=True)
        b_sh = batch_sharding(mesh)
        state = jax.device_put(state, s_sh)

        step_jit = jax.jit(train_step, in_shardings=(s_sh, b_sh),
                           out_shardings=(s_sh, NamedSharding(mesh, P())),
                           donate_argnums=(0,))

        def eval_fn(params, batch):
            preds = pre.apply({"params": params}, batch)
            total, parts = loss_fn_given_preds(preds)
            return total

        eval_jit = jax.jit(eval_fn, in_shardings=(s_sh.params, b_sh),
                           out_shardings=NamedSharding(mesh, P()))

        name = impl or "xla"
        curve = []
        t_train = 0.0

        def do_eval(step):
            bd = {k: jnp.asarray(v) for k, v in eval_batch.items()}
            with activate_mesh(mesh):
                loss = sync(eval_jit(state.params, bd))
            rec = {"variant": name, "per_chip_batch": bsz, "step": step,
                   "train_wallclock_s": round(t_train, 1),
                   "eval_loss": round(float(loss), 4)}
            curve.append(rec)
            print(json.dumps(rec), flush=True)

        batch = first
        # compile + warm (excluded from the train clock)
        with activate_mesh(mesh):
            state, m = step_jit(state, {k: jnp.asarray(v)
                                        for k, v in batch.items()})
        sync(m)
        do_eval(1)
        done = 1
        while done < n_steps:
            # dispatch eagerly in chunks and sync ONCE per chunk: a
            # per-step sync would add the relay's ~30 ms round-trip to
            # every step, biasing toward the variant taking fewer steps
            # (B). Chunks are capped so the eagerly-queued batch uploads
            # can't pile up in HBM (flash batch 4 is near the 16G line).
            # Loader time stays off the clock — batches are fetched before
            # t0 (device upload happens inside, as in any real pipeline,
            # overlapped with compute by async dispatch).
            span = min((eval_every - done % eval_every) or eval_every,
                       n_steps - done, 25)
            bds = [next(it) for _ in range(span)]
            t0 = time.time()
            with activate_mesh(mesh):
                for b in bds:
                    state, m = step_jit(state, {k: jnp.asarray(v)
                                                for k, v in b.items()})
            sync(m)
            t_train += time.time() - t0
            done += span
            if done % eval_every == 0 or done == n_steps:
                do_eval(done)
        it.close()
        results[name] = curve
        del state

    # summary: loss at matched wall-clock marks (linear interp on B's curve)
    a, b = results["xla"], results["flash:640:640"]
    ta = [r["train_wallclock_s"] for r in a]
    la = [r["eval_loss"] for r in a]
    tb = [r["train_wallclock_s"] for r in b]
    lb = [r["eval_loss"] for r in b]
    t_common = min(ta[-1], tb[-1])
    marks = [t_common * f for f in (0.25, 0.5, 0.75, 1.0)]
    summary = {"metric": "flash_batch4_econ",
               "marks_s": [round(t, 1) for t in marks],
               "xla_b2_loss_at_marks": [round(float(np.interp(t, ta, la)), 4)
                                        for t in marks],
               "flash_b4_loss_at_marks": [round(float(np.interp(t, tb, lb)), 4)
                                          for t in marks]}
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
