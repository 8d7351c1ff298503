#!/usr/bin/env python
"""Pretraining entrypoint: python scripts/pretrain.py configs/base.yaml
(the reference's `python train.py configs/base.yaml` surface,
/root/reference/pretrain/train.py).

Multi-host: set JAX coordinator env vars (or run under a launcher that calls
jax.distributed.initialize) — each host reads its file shard and joins the
global mesh.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", help="YAML config path or name (base/large)")
    ap.add_argument("-output_dir", default=None)
    ap.add_argument("-train_fns", default=None,
                    help="glob or {:05d}-style pattern for TFRecord shards")
    ap.add_argument("-num_steps", type=int, default=None)
    ap.add_argument("-batch_size", type=int, default=None,
                    help="override device.batch_size (global batch)")
    ap.add_argument("-seed", type=int, default=None)
    ap.add_argument("-distributed", action="store_true",
                    help="call jax.distributed.initialize() first")
    ap.add_argument("--on_device_data", action="store_true",
                    help="assemble examples on the accelerator (host "
                         "workers only decode bytes; masking/placement/"
                         "collation run as one jit per batch — "
                         "data/device_builder.py)")
    ap.add_argument("--fused_data", action="store_true",
                    help="on-device data FUSED INTO the train step: one jit "
                         "per step builds the batch and trains on it "
                         "(trainer.make_jit_fused_data_train_step); implies "
                         "--on_device_data")
    ap.add_argument("--on_device_frames", action="store_true",
                    help="move frame flip/resize/augment/patchify in-graph "
                         "too (ops/vision_train.py): host workers only "
                         "DECODE frame bytes; implies --on_device_data")
    args = ap.parse_args()

    if args.distributed:
        import jax

        jax.distributed.initialize()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))

    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.data.loader import input_fn_builder
    from merlot_reserve_tpu.training.pretrain import run_pretraining

    cfg = mr.load_config(args.config)
    if args.on_device_frames:
        cfg = cfg.replace_data(on_device_frames=True)
    if args.batch_size:
        cfg = cfg.replace_device(batch_size=args.batch_size)

    pattern = args.train_fns or cfg.data.train_fns
    if "{" in pattern:
        files = [pattern.format(i) for i in range(cfg.data.num_train_files)]
    else:
        files = sorted(glob.glob(pattern))
    if not files:
        raise SystemExit(f"no input files match {pattern!r}")

    loader = input_fn_builder(
        cfg, files,
        host_index=jax.process_index(), num_hosts=jax.process_count(),
        seed=args.seed, use_bfloat16=cfg.model.use_bfloat16,
        on_device=(args.on_device_data or args.fused_data
                   or args.on_device_frames),
        **({"fused": True} if args.fused_data else {}))

    def log_fn(step, metrics):
        parts = " ".join(f"{k}={v:.4f}" for k, v in sorted(metrics.items())
                         if not k.startswith("_"))
        print(f"step {step}: {parts}", flush=True)

    run_pretraining(cfg, loader, num_steps=args.num_steps,
                    output_dir=args.output_dir, log_fn=log_fn,
                    fused_builder=(loader._dev_builder if args.fused_data
                                   else None),
                    data_seed=args.seed or 0)


if __name__ == "__main__":
    main()
