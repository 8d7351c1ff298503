"""Profile one pretraining step on the current device and print the
device-op time table (utils/profiling.py trace analysis).

This is the tool form of the methodology that verified the per-step bench
numbers on hardware (BASELINE.md "profile-verified 54.2 ms/step"): trace a
single compiled train step, aggregate the device-lane events, and report
the top fusions + the step's device wall time. Works on the axon relay
(jax.profiler is supported there) and on CPU for smoke runs.

Usage:
  python scripts/profile_step.py [--config=base] [--batch=1] [--unroll]
                                 [--remat] [--remat_policy=NAME]
                                 [--out=/tmp/profile_step] [--top=25]
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    args = sys.argv[1:]

    def flag(name, default=None):
        for a in args:
            if a.startswith(f"--{name}="):
                return a.split("=", 1)[1]
        return default

    config_name = flag("config", "base")
    batch = int(flag("batch", "1"))
    top = int(flag("top", "25"))
    out_dir = flag("out", "/tmp/profile_step")
    unroll = "--unroll" in args
    remat = "--remat" in args

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.data.dummy import make_dummy_batch
    from merlot_reserve_tpu.models import MerlotReservePretrainer
    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.training.optimization import construct_train_state
    from merlot_reserve_tpu.training.trainer import make_jit_train_step
    from merlot_reserve_tpu.utils.profiling import (op_time_table, trace,
                                                    trace_wall_ms)

    cfg = mr.load_config(config_name, gradient_checkpoint=remat,
                         gradient_checkpoint_policy=flag("remat_policy"),
                         scan_layers=not unroll)
    pre = MerlotReservePretrainer.from_config(cfg)
    batch_np = make_dummy_batch(cfg, batch_size=batch)
    params = pre.init_params(batch_np)
    state = construct_train_state(cfg.optimizer, pre, params)
    step_fn, state = make_jit_train_step(make_mesh(dp=1,
                                                   devices=jax.devices()[:1]),
                                         state)
    bd = {k: jnp.asarray(v) for k, v in batch_np.items()}

    def sync(tree):
        import jax as _jax
        return float(np.asarray(_jax.tree.leaves(tree)[0]).reshape(-1)[0])

    # warm up (compile) outside the trace, then trace ONE executed step
    state, metrics = step_fn(state, bd)
    sync(metrics)
    with trace(out_dir):
        state, metrics = step_fn(state, bd)
        sync(metrics)

    is_tpu = any(d.platform == "tpu" for d in jax.local_devices())
    lane = "tpu" if is_tpu else None
    table = op_time_table(out_dir, lane_filter=lane, top=top)
    wall = trace_wall_ms(out_dir, lane_filter=lane)
    print(f"# device wall (one step incl. host sync): {wall:.1f} ms; "
          f"top {len(table)} ops:", file=sys.stderr)
    for r in table:
        print(f"#  {r['total_ms']:9.3f} ms  x{r['count']:<5d} "
              f"{r['pct']:5.1f}%  {r['name'][:90]}", file=sys.stderr)
    print(json.dumps({"metric": "profiled_step_device_wall_ms",
                      "value": round(wall, 2), "config": config_name,
                      "batch": batch, "scan_layers": not unroll,
                      "remat": remat, "trace_dir": out_dir,
                      "top_op": table[0]["name"] if table else None}))


if __name__ == "__main__":
    main()
