#!/usr/bin/env python
"""Batched zero-shot VCR inference: rank each task's 4 choices with a
PRETRAINED checkpoint — QA (question + 'answer: <MASK>') and QA->R
(question+answer + 'rationale: <MASK>') statements over the drawn-boxes
image, choices span-encoded as the per-question label space
(/root/reference/mreserve/modeling.py:806-843,1024-1032 protocol over the
finetune/vcr record format; the reference has no zero-shot VCR driver).

Usage: python scripts/zero_shot_vcr.py base -ckpt CKPT -val_fns 'val*' \
           [-out preds.json]
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
    ap.add_argument("-batch_size", type=int, default=8)
    ap.add_argument("-out", default="")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))

    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.finetune.data import finetune_batches
    from merlot_reserve_tpu.finetune.models import MerlotReserveVCRZeroShot
    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.utils.checkpoint import load_checkpoint, stack_layer_params
    from merlot_reserve_tpu.zero_shot import zero_shot_qa_eval

    cfg = mr.load_config(args.config)
    cfg = cfg.replace_data(lang_seq_len=144)

    model = MerlotReserveVCRZeroShot.from_config(cfg)
    params = load_checkpoint(args.ckpt)["params"]
    if cfg.model.scan_layers:
        params = stack_layer_params(params)

    files = sorted(glob.glob(args.val_fns))
    batches = finetune_batches(files, cfg, "vcr_zero_shot", args.batch_size,
                               is_training=False, repeat=False, return_ids=True)
    metrics, rows = zero_shot_qa_eval(model, params, batches, "vcr",
                                      mesh=make_mesh())
    print(json.dumps(metrics))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f)


if __name__ == "__main__":
    main()
