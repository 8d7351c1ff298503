"""Sweep TPU compiler options on the pretrain step (the one per-step lever
BASELINE.md had not measured): compile the SAME chained train-step graph
with explicit PJRT ``compiler_options`` and time each variant back-to-back.

Usage:
    python scripts/bench_train_xla_flags.py [--unroll] [batch] \
        [--opt xla_tpu_scoped_vmem_limit_kib=65536] [--opt k=v ...]

With no --opt, times the default compile plus a small built-in sweep of
``xla_tpu_scoped_vmem_limit_kib`` (the scoped-VMEM fusion budget: larger
values let XLA form fatter fusions at the cost of double-buffering room;
the v5e default is chosen for generic graphs, not this one).

Same methodology as scripts/bench_train.py: chain N steps inside one jit
via lax.scan, per-step = (t(N)-t(1))/(N-1), best-of-3, sync by fetching a
scalar (the relay's block_until_ready is unreliable — CLAUDE.md).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    args = sys.argv[1:]
    unroll = "--unroll" in args
    opts = []
    take_next = False
    batch_sizes = []
    for a in args:
        if take_next:
            if "=" not in a:
                raise SystemExit(f"--opt expects key=value, got {a!r} "
                                 "(usage: --opt xla_flag_name=value)")
            opts.append(a)
            take_next = False
        elif a == "--opt":
            take_next = True
        elif not a.startswith("--"):
            batch_sizes.append(int(a))
    if take_next:
        raise SystemExit("trailing --opt with no key=value argument")
    batch_sizes = batch_sizes or [1]
    n_chain = int(os.environ.get("BENCH_CHAIN", "8"))

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.data.dummy import make_dummy_batch
    from merlot_reserve_tpu.models import MerlotReservePretrainer
    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.parallel.mesh import activate_mesh
    from merlot_reserve_tpu.parallel.sharding import (batch_sharding,
                                                      state_shardings)
    from merlot_reserve_tpu.training.optimization import construct_train_state
    from merlot_reserve_tpu.training.trainer import train_step

    if opts:
        # always time the default compile in the same run so the custom
        # options have an in-run baseline to compare against
        sweep = [None, dict(kv.split("=", 1) for kv in opts)]
    else:
        sweep = [None,
                 {"xla_tpu_scoped_vmem_limit_kib": "65536"},
                 {"xla_tpu_scoped_vmem_limit_kib": "98304"}]

    cfg = mr.load_config("base", scan_layers=not unroll)
    n_spans = cfg.data.num_text_spans_to_include
    pre = MerlotReservePretrainer.from_config(cfg)
    mesh = make_mesh(dp=1, devices=jax.devices()[:1])

    from jax.sharding import NamedSharding, PartitionSpec as P

    def chained(n):
        def fn(st, b):
            def body(s, _):
                s2, info = train_step(s, b)
                return s2, info
            st2, infos = jax.lax.scan(body, st, None, length=n)
            return st2, jax.tree.map(lambda x: x[-1], infos)
        return fn

    def sync(tree):
        leaf = jax.tree.leaves(tree)[0]
        return float(np.asarray(leaf).reshape(-1)[0])

    for bsz in batch_sizes:
        batch_np = make_dummy_batch(cfg, batch_size=bsz, seed=0,
                                    num_text_spans=n_spans)
        params = pre.init_params(batch_np)
        state = construct_train_state(cfg.optimizer, pre, params)
        del params

        s_shardings = state_shardings(mesh, state, zero1=True)
        b_sharding = batch_sharding(mesh)
        # donate_argnums=() ON PURPOSE: one resident state is reused across
        # every sweep variant (donation would invalidate it after the first
        # call). Through the axon relay each non-donated execution re-uploads
        # params (~8 s/call, CLAUDE.md) — that overhead is IDENTICAL for the
        # 1-chain and N-chain programs, so it cancels in (tN-t1)/(N-1) and
        # step_ms stays valid; it only inflates wall time (~16 uploads/variant)
        state = jax.device_put(state, s_shardings)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

        def compile_step(n, copts):
            jitted = jax.jit(chained(n),
                             in_shardings=(s_shardings, b_sharding),
                             out_shardings=(s_shardings,
                                            NamedSharding(mesh, P())),
                             donate_argnums=())
            with activate_mesh(mesh):
                lowered = jitted.lower(state, batch)
                return lowered.compile(
                    compiler_options=copts) if copts else lowered.compile()

        for copts in sweep:
            # one try around compile AND execution: a variant that compiles
            # but dies at run time (aggressive scoped-VMEM values, relay
            # hiccups) must not abort the remaining variants
            try:
                t_c = time.time()
                c1 = compile_step(1, copts)
                cN = compile_step(n_chain, copts)
                t_compile = time.time() - t_c
                _, info = c1(state, batch)
                sync(info)
                t1 = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    _, info = c1(state, batch)
                    sync(info)
                    t1 = min(t1, time.time() - t0)
                _, info = cN(state, batch)
                sync(info)
                tN = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    _, info = cN(state, batch)
                    loss = sync(info)
                    tN = min(tN, time.time() - t0)
            except Exception as e:  # rejected option/run failure: keep going
                print(json.dumps({"compiler_options": copts,
                                  "per_chip_batch": bsz,
                                  "error": repr(e)[:300]}), flush=True)
                continue
            step_s = (tN - t1) / (n_chain - 1)
            print(json.dumps({
                "compiler_options": copts, "per_chip_batch": bsz,
                "scan_layers": not unroll,
                "step_ms": round(step_s * 1e3, 2),
                "segs_per_s": round(bsz * cfg.data.num_segments / step_s, 1),
                "compile_s": round(t_compile, 1), "loss_probe": loss,
            }), flush=True)


if __name__ == "__main__":
    main()
