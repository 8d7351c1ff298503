#!/usr/bin/env python
"""Batched zero-shot TVQA inference (BASELINE.json config 2): rank each
question's 5 answers with a PRETRAINED checkpoint — no finetuning. The
question + 'answer:' + MASK statement is fused with subtitles (text stream)
and with audio (AUDIOSPAN stream); the MASK hidden state goes through the
pretrained joint_proj and scores the span-encoded answers (per-question
get_label_space, /root/reference/mreserve/modeling.py:806-843,1024-1032 —
the reference has no batched zero-shot TVQA driver; this is the paper's
zero-shot protocol over the finetune record format).

Use ``-grid 18,32`` / ``-grid 24,24`` with a resadapt checkpoint for
higher-res frames.

Usage: python scripts/zero_shot_tvqa.py large -ckpt CKPT -val_fns 'val*' \
           [-grid 18,32] [-out preds.json]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("-ckpt", required=True)
    ap.add_argument("-val_fns", required=True)
    ap.add_argument("-grid", default=None, help="H,W (resadapt ckpts)")
    ap.add_argument("-batch_size", type=int, default=8)
    ap.add_argument("-temperature", type=float, default=100.0)
    ap.add_argument("-out", default="")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))

    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.finetune.data import finetune_batches
    from merlot_reserve_tpu.finetune.models import MerlotReserveTVQAZeroShot
    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.utils.checkpoint import load_checkpoint, stack_layer_params
    from merlot_reserve_tpu.zero_shot import zero_shot_qa_eval

    kw = {}
    if args.grid:
        kw["output_grid"] = tuple(int(x) for x in args.grid.split(","))
    cfg = mr.load_config(args.config, **kw)
    cfg = cfg.replace_data(lang_seq_len=256, num_segments=7)

    model = MerlotReserveTVQAZeroShot.from_config(cfg)
    params = load_checkpoint(args.ckpt)["params"]
    if cfg.model.scan_layers:
        params = stack_layer_params(params)

    files = sorted(glob.glob(args.val_fns))
    batches = finetune_batches(files, cfg, "tvqa_zero_shot", args.batch_size,
                               is_training=False, repeat=False, return_ids=True)
    metrics, rows = zero_shot_qa_eval(model, params, batches, "tvqa",
                                      temperature=args.temperature,
                                      mesh=make_mesh())
    print(json.dumps(metrics))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f)


if __name__ == "__main__":
    main()
