#!/usr/bin/env python
"""Resolution-adaptation pretraining — /root/reference/pretrain/
train_fixres.py:78-261: continue from a pretrained checkpoint at higher
resolution, lr x0.02 for 75k steps with warmup 15k and final_lr_scale 0.
Rotary (not learned) positions make the params resolution-independent, so
only shapes change.

The reference mixes the two target grids by assigning one per HOST
(``res = possible_res[process_index % 2]``, train_fixres.py:78-81) — legal
under per-host pmap, impossible under a global-mesh jit where every
process must execute the same program. Default mode here is the GSPMD
redesign: every step carries BOTH grids, half the global batch each from
DISJOINT file shards (2*num_hosts virtual hosts — each grid gets its own
data, as each reference host did), preds concatenated before the
contrastive loss so the InfoNCE negatives span both resolutions (the
reference's cross-host all_gather semantics) — see
training/trainer.py::make_jit_mixed_res_train_step. ``-res H,W`` forces a
single grid instead (e.g. to adapt to one deployment resolution only).
Mixed mode needs batch_size divisible by 2*num_hosts (asserted).

Usage: python scripts/pretrain_fixres.py base -ckpt CKPT -train_fns '...' -output_dir OUT
"""

import argparse
import dataclasses
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POSSIBLE_RES = [(18, 32), (24, 24)]


def _fixres_config(mr, name, grid, num_steps, warmup, lr_scale):
    cfg = mr.load_config(name, output_grid=grid)
    # seq_len = lang + segments_per_group * pooled grid (train_fixres.py:90)
    cfg = cfg.replace_data(seq_len=cfg.joint_seq_len)
    return dataclasses.replace(cfg, optimizer=dataclasses.replace(
        cfg.optimizer,
        learning_rate=cfg.optimizer.learning_rate * lr_scale,
        num_train_steps=num_steps, num_warmup_steps=warmup,
        final_lr_scale=0.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("-ckpt", required=True)
    ap.add_argument("-train_fns", required=True)
    ap.add_argument("-output_dir", default=None)
    ap.add_argument("-num_steps", type=int, default=75_000)
    ap.add_argument("-warmup", type=int, default=15_000)
    ap.add_argument("-lr_scale", type=float, default=0.02)
    ap.add_argument("-res", default=None,
                    help="H,W: adapt to this single grid only; default "
                         "trains both reference grids jointly (mixed-res)")
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
    from merlot_reserve_tpu.parallel.sharding import form_global_batch
    from merlot_reserve_tpu.training.optimization import construct_train_state
    from merlot_reserve_tpu.training.trainer import (
        make_jit_mixed_res_train_step, make_jit_train_step)
    from merlot_reserve_tpu.utils.checkpoint import (
        load_checkpoint, save_checkpoint, stack_layer_params)

    mixed = args.res is None
    grids = POSSIBLE_RES if mixed else [
        tuple(int(x) for x in args.res.split(","))]
    cfgs = [_fixres_config(mr, args.config, g, args.num_steps, args.warmup,
                           args.lr_scale) for g in grids]
    cfg = cfgs[0]

    params = load_checkpoint(args.ckpt)["params"]
    if cfg.model.scan_layers:
        params = stack_layer_params(params)

    model = MerlotReservePretrainer.from_config(cfg)
    state = construct_train_state(cfg.optimizer, model, params)

    files = sorted(glob.glob(args.train_fns))
    if mixed:
        # each grid's loader carries half the global batch, from a DISJOINT
        # file shard with a distinct rng: the two grids act as 2*num_hosts
        # virtual hosts, mirroring the reference's per-host scheme where
        # each host had its own grid AND its own data shard
        # (train_fixres.py:78-81 + dataloader.py:927-930). Feeding both
        # grids the same stream would put each row's exact positive into
        # the other half's InfoNCE denominator.
        base_seed = int(time.time())
        loaders = [input_fn_builder(c, files,
                                    host_index=2 * jax.process_index() + i,
                                    num_hosts=2 * jax.process_count(),
                                    seed=base_seed + i,
                                    use_bfloat16=c.model.use_bfloat16)
                   for i, c in enumerate(cfgs)]
    else:
        loaders = [input_fn_builder(cfg, files,
                                    host_index=jax.process_index(),
                                    num_hosts=jax.process_count(),
                                    use_bfloat16=cfg.model.use_bfloat16)]

    mesh = make_mesh()
    if mixed:
        model_b = MerlotReservePretrainer.from_config(cfgs[1])
        step_fn, state = make_jit_mixed_res_train_step(mesh, state,
                                                       model_b.apply)
        batches = zip(*loaders)
    else:
        step_fn, state = make_jit_train_step(mesh, state)
        batches = ((b,) for b in loaders[0])

    for step, step_batches in zip(range(args.num_steps), batches):
        step_batches = [form_global_batch(mesh, b) for b in step_batches]
        state, metrics = step_fn(state, *step_batches)
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
