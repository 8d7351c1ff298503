#!/usr/bin/env python
"""TVQA finetuning with audio + subtitles — the recipe of
/root/reference/finetune/tvqa/tvqa_finetune.py:105-395: bs 32, lang_seq 256,
7 segments, ~3 epochs over 122,112 examples, lr 5e-6 for large
(scan_minibatch recommended). Writes leaderboard predictions as JSON.

Usage: python scripts/finetune_tvqa.py large -ckpt CKPT -train_fns 'train*' \
           -val_fns 'val*' -output_dir OUT
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRAIN_SIZE = 122_112


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("-ckpt", required=True)
    ap.add_argument("-train_fns", required=True)
    ap.add_argument("-val_fns", default="")
    ap.add_argument("-test_fns", default="")
    ap.add_argument("-output_dir", default="")
    ap.add_argument("-lr", type=float, default=5e-6)
    ap.add_argument("-ne", type=int, default=3)
    ap.add_argument("-batch_size", type=int, default=32)
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
    from merlot_reserve_tpu.finetune.models import MerlotReserveTVQA, adapt_pretrained_params
    from merlot_reserve_tpu.finetune.train import (
        make_finetune_step,
        tvqa_loss_fn,
        tvqa_pred_step,
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
    cfg = mr.load_config(args.config)
    cfg = cfg.replace_data(lang_seq_len=256, num_segments=7)
    cfg = dataclasses.replace(cfg, optimizer=dataclasses.replace(
        cfg.optimizer, learning_rate=args.lr,
        num_train_steps=args.ne * steps_per_epoch,
        num_warmup_steps=steps_per_epoch // 2,
        do_bias_correction=True, eps=1e-6))

    model = MerlotReserveTVQA.from_config(cfg)
    params = load_checkpoint(args.ckpt)["params"]
    if cfg.model.scan_layers:
        params = stack_layer_params(params)
    params = adapt_pretrained_params(params, cfg.model.hidden_size)
    state = construct_finetuning_train_state(cfg.optimizer, model, params)

    mesh = make_mesh()
    step_fn, state = make_finetune_step(mesh, state, tvqa_loss_fn,
                                        scan_minibatch=args.scan_minibatch)
    pred_fn = jax.jit(tvqa_pred_step)

    train_files = sorted(glob.glob(args.train_fns))
    batches = finetune_batches(train_files, cfg, "tvqa", args.batch_size,
                               seed=123456)

    for epoch in range(args.ne):
        for it in range(steps_per_epoch):
            batch = next(batches)
            state, info = step_fn(state, form_global_batch(mesh, batch))
            if (it + 1) % 100 == 0:
                info = {k: float(v) for k, v in info.items()}
                print(f"epoch {epoch} it {it + 1}: {info}", flush=True)

        if args.val_fns:
            stats = np.zeros(3)
            n = 0
            for batch in finetune_batches(sorted(glob.glob(args.val_fns)), cfg,
                                          "tvqa", args.batch_size,
                                          is_training=False, repeat=False):
                preds = pred_fn(state, form_global_batch(mesh, batch))
                for j, k in enumerate(["preds_audio", "preds_text", "preds_joint"]):
                    stats[j] += (np.asarray(preds[k]) == batch["labels"]).sum()
                n += len(batch["labels"])
            print(f"epoch {epoch}: audio {stats[0]/n:.4f} text {stats[1]/n:.4f} "
                  f"joint {stats[2]/n:.4f}", flush=True)

        if args.output_dir:
            save_checkpoint(state, args.output_dir, no_optimizer=True)

    if args.test_fns:
        # leaderboard submission: one {id: pred} json per stream
        # (finetune/tvqa/submit_to_leaderboard.py:213-236 format)
        out = {"text": {}, "audio": {}, "joint": {}}
        for ids, batch in finetune_batches(sorted(glob.glob(args.test_fns)), cfg,
                                           "tvqa", args.batch_size,
                                           is_training=False, repeat=False,
                                           return_ids=True):
            preds = pred_fn(state, form_global_batch(mesh, batch))
            for i, id_i in enumerate(ids):
                if id_i == "pad":
                    continue
                id_i = id_i.split("~")[0]
                out["text"][id_i] = int(np.asarray(preds["preds_text"])[i])
                out["audio"][id_i] = int(np.asarray(preds["preds_audio"])[i])
                out["joint"][id_i] = int(np.asarray(preds["preds_joint"])[i])
        base = args.output_dir or "."
        for stream, pred_dict in out.items():
            out_fn = os.path.join(base, f"prediction_test_public_{stream}.json")
            with open(out_fn, "w") as f:
                json.dump(pred_dict, f)
            print(f"wrote {len(pred_dict)} predictions to {out_fn}")


if __name__ == "__main__":
    main()
