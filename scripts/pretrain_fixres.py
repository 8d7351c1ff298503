#!/usr/bin/env python
"""Resolution-adaptation pretraining — /root/reference/pretrain/
train_fixres.py:78-261: continue from a pretrained checkpoint at higher
resolution (grids (18,32) and (24,24) split across hosts), lr x0.02 for 75k
steps with warmup 15k and final_lr_scale 0. Rotary (not learned) positions
make the params resolution-independent, so only shapes change.

Usage: python scripts/pretrain_fixres.py base -ckpt CKPT -train_fns '...' -output_dir OUT
"""

import argparse
import dataclasses
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POSSIBLE_RES = [(18, 32), (24, 24)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("-ckpt", required=True)
    ap.add_argument("-train_fns", required=True)
    ap.add_argument("-output_dir", default=None)
    ap.add_argument("-num_steps", type=int, default=75_000)
    ap.add_argument("-warmup", type=int, default=15_000)
    ap.add_argument("-lr_scale", type=float, default=0.02)
    ap.add_argument("-res", default=None, help="H,W; default picks by host index")
    ap.add_argument("-distributed", action="store_true")
    args = ap.parse_args()

    if args.distributed:
        import jax

        jax.distributed.initialize()
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))

    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.data.loader import input_fn_builder
    from merlot_reserve_tpu.models import MerlotReservePretrainer
    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.training.optimization import construct_train_state
    from merlot_reserve_tpu.training.pretrain import run_pretraining
    from merlot_reserve_tpu.utils.checkpoint import load_checkpoint, stack_layer_params

    if args.res:
        grid = tuple(int(x) for x in args.res.split(","))
    else:
        # per-host heterogeneous resolution (train_fixres.py:78-81)
        grid = POSSIBLE_RES[jax.process_index() % 2]

    cfg = mr.load_config(args.config, output_grid=grid)
    # seq_len = lang + segments_per_group * pooled grid (train_fixres.py:90)
    cfg = cfg.replace_data(seq_len=cfg.joint_seq_len)
    cfg = dataclasses.replace(cfg, optimizer=dataclasses.replace(
        cfg.optimizer,
        learning_rate=cfg.optimizer.learning_rate * args.lr_scale,
        num_train_steps=args.num_steps, num_warmup_steps=args.warmup,
        final_lr_scale=0.0))

    params = load_checkpoint(args.ckpt)["params"]
    if cfg.model.scan_layers:
        params = stack_layer_params(params)

    model = MerlotReservePretrainer.from_config(cfg)
    state = construct_train_state(cfg.optimizer, model, params)

    files = sorted(glob.glob(args.train_fns))
    loader = input_fn_builder(cfg, files, host_index=jax.process_index(),
                              num_hosts=jax.process_count(),
                              use_bfloat16=cfg.model.use_bfloat16)

    # run_pretraining would re-init; drive the provided state directly
    import jax.numpy as jnp

    from merlot_reserve_tpu.training.trainer import make_jit_train_step
    from merlot_reserve_tpu.utils.checkpoint import save_checkpoint

    mesh = make_mesh()
    step_fn, state = make_jit_train_step(mesh, state)
    for step, batch in zip(range(args.num_steps), loader):
        state, metrics = step_fn(state, {k: jnp.asarray(v) for k, v in batch.items()})
        if (step + 1) % 100 == 0:
            print(f"step {step + 1}: "
                  f"{ {k: float(v) for k, v in metrics.items() if not k.startswith('_')} }",
                  flush=True)
        if args.output_dir and (step + 1) % cfg.device.iterations_per_loop == 0:
            save_checkpoint(state, args.output_dir, no_optimizer=True)
    if args.output_dir:
        save_checkpoint(state, args.output_dir, no_optimizer=True)


if __name__ == "__main__":
    main()
