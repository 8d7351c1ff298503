#!/usr/bin/env python
"""VCR finetuning (QA + QA->R jointly) — the recipe of
/root/reference/finetune/vcr/qa_qar_joint_finetune.py:100-271: bs 32,
lang_seq 144, ~5 epochs over 212,736 examples, lr ~1e-5, grid 18x32,
weight decay toward the pretrained init.

Usage: python scripts/finetune_vcr.py base -ckpt CKPT -train_fns 'train*.tfrecord' \
           -val_fns 'val*.tfrecord' -output_dir OUT
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRAIN_SIZE = 212_736


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("-ckpt", required=True)
    ap.add_argument("-train_fns", required=True)
    ap.add_argument("-val_fns", default="")
    ap.add_argument("-output_dir", default="")
    ap.add_argument("-lr", type=float, default=1e-5)
    ap.add_argument("-ne", type=int, default=5, help="epochs")
    ap.add_argument("-batch_size", type=int, default=32)
    ap.add_argument("-output_grid_h", type=int, default=18)
    ap.add_argument("-output_grid_w", type=int, default=32)
    ap.add_argument("-scan_minibatch", action="store_true")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))

    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.finetune.data import finetune_batches
    from merlot_reserve_tpu.finetune.models import MerlotReserveVCR, adapt_pretrained_params
    from merlot_reserve_tpu.finetune.train import (
        make_finetune_step,
        vcr_loss_fn,
        vcr_pred_step,
    )
    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.parallel.sharding import form_global_batch
    from merlot_reserve_tpu.training.optimization import construct_finetuning_train_state
    from merlot_reserve_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
        stack_layer_params,
    )

    steps_per_epoch = TRAIN_SIZE // args.batch_size
    cfg = mr.load_config(args.config,
                         output_grid=(args.output_grid_h, args.output_grid_w))
    cfg = cfg.replace_data(lang_seq_len=144)
    cfg = dataclasses.replace(cfg, optimizer=dataclasses.replace(
        cfg.optimizer, learning_rate=args.lr,
        num_train_steps=args.ne * steps_per_epoch,
        num_warmup_steps=steps_per_epoch // 2,
        do_bias_correction=True, eps=1e-6))

    model = MerlotReserveVCR.from_config(cfg)
    params = load_checkpoint(args.ckpt)["params"]
    if cfg.model.scan_layers:
        params = stack_layer_params(params)
    params = adapt_pretrained_params(params, cfg.model.hidden_size, drop_audio=True)
    state = construct_finetuning_train_state(cfg.optimizer, model, params)

    mesh = make_mesh()
    step_fn, state = make_finetune_step(mesh, state, vcr_loss_fn,
                                        scan_minibatch=args.scan_minibatch)
    pred_fn = jax.jit(vcr_pred_step)

    train_files = sorted(glob.glob(args.train_fns))
    batches = finetune_batches(train_files, cfg, "vcr", args.batch_size, seed=123456)

    for epoch in range(args.ne):
        for it in range(steps_per_epoch):
            batch = next(batches)
            state, info = step_fn(state, form_global_batch(mesh, batch))
            if (it + 1) % 100 == 0:
                info = {k: float(v) for k, v in info.items()}
                print(f"epoch {epoch} it {it + 1}: {info}", flush=True)

        if args.val_fns:
            val_files = sorted(glob.glob(args.val_fns))
            n_right = np.zeros(2)
            n_total = 0
            for batch in finetune_batches(val_files, cfg, "vcr", args.batch_size,
                                          is_training=False, repeat=False):
                preds = pred_fn(state, form_global_batch(mesh, batch))
                n_right += (np.asarray(preds["preds"]) ==
                            batch["labels"]).sum(0)
                n_total += len(batch["labels"])
            print(f"epoch {epoch}: qa acc {n_right[0] / n_total:.4f} "
                  f"qar acc {n_right[1] / n_total:.4f}", flush=True)

        if args.output_dir:
            save_checkpoint(state, args.output_dir, no_optimizer=True)


if __name__ == "__main__":
    main()
