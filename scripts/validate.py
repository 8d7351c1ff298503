#!/usr/bin/env python
"""Offline validation-loss tracking over saved checkpoints — the
/root/reference/pretrain/validate.py:94-158 capability: replay held-out
TFRecords through each checkpoint, accumulating several forward batches into
a megabatch before the contrastive loss so the denominator matches training's
global-batch semantics.

Usage: python scripts/validate.py configs/base.yaml -ckpt_dir DIR -val_fns 'val*' \
           -num_batches 8 [-every 75000]
"""

import argparse
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("-ckpt_dir", required=True)
    ap.add_argument("-val_fns", required=True)
    ap.add_argument("-num_batches", type=int, default=8)
    ap.add_argument("-batch_size", type=int, default=8)
    ap.add_argument("-every", type=int, default=0,
                    help="only evaluate ckpts whose step is a multiple of this")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))

    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.data.loader import PretrainLoader
    from merlot_reserve_tpu.models import MerlotReservePretrainer
    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.training.optimization import construct_train_state
    from merlot_reserve_tpu.training.pretrain import evaluate_loss
    from merlot_reserve_tpu.utils.checkpoint import load_checkpoint, stack_layer_params

    cfg = mr.load_config(args.config)
    files = sorted(glob.glob(args.val_fns))
    mesh = make_mesh()
    model = MerlotReservePretrainer.from_config(cfg)

    ckpts = sorted(glob.glob(os.path.join(args.ckpt_dir, "ckpt_*")),
                   key=lambda p: int(re.search(r"ckpt_(\d+)", p).group(1)))
    if args.every:
        ckpts = [c for c in ckpts
                 if int(re.search(r"ckpt_(\d+)", c).group(1)) % args.every == 0]

    for ckpt in ckpts:
        step = int(re.search(r"ckpt_(\d+)", ckpt).group(1))
        raw = load_checkpoint(ckpt)
        params = raw["params"]
        if cfg.model.scan_layers and "layers" not in str(params.keys()):
            params = stack_layer_params(params)
        state = construct_train_state(cfg.optimizer, model, params)
        loader = PretrainLoader(files, cfg, batch_size=args.batch_size, seed=0,
                                repeat=False,
                                use_bfloat16=cfg.model.use_bfloat16)
        info = evaluate_loss(cfg, state, loader, num_batches=args.num_batches,
                             mesh=mesh)
        parts = " ".join(f"{k}={v:.4f}" for k, v in sorted(info.items())
                         if not k.startswith("_"))
        print(f"ckpt step {step}: {parts}", flush=True)


if __name__ == "__main__":
    main()
