#!/usr/bin/env python
"""VCR leaderboard submission — /root/reference/finetune/vcr/
submit_to_leaderboard.py:100-146 surface: at test time the rationale query is
conditioned on EACH candidate answer (records carry ids like
"annotid-N_<conditionee>"); probabilities for all conditionings merge into
one CSV row per annot_id.

Usage: python scripts/vcr_leaderboard.py base -ckpt CKPT -test_fns 'test*' -out sub.csv
"""

import argparse
import csv
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("-ckpt", required=True)
    ap.add_argument("-test_fns", required=True)
    ap.add_argument("-out", default="vcr_submission.csv")
    ap.add_argument("-batch_size", type=int, default=32)
    ap.add_argument("-output_grid_h", type=int, default=18)
    ap.add_argument("-output_grid_w", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))

    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.data.tfrecord import parse_example, read_records
    from merlot_reserve_tpu.finetune.data import preprocess_vcr
    from merlot_reserve_tpu.finetune.models import MerlotReserveVCR
    from merlot_reserve_tpu.finetune.train import vcr_pred_step
    from merlot_reserve_tpu.utils.checkpoint import load_checkpoint, stack_layer_params

    cfg = mr.load_config(args.config,
                         output_grid=(args.output_grid_h, args.output_grid_w))
    cfg = cfg.replace_data(lang_seq_len=144)

    model = MerlotReserveVCR.from_config(cfg)
    params = load_checkpoint(args.ckpt)["params"]
    if cfg.model.scan_layers:
        params = stack_layer_params(params)

    from flax.training import train_state
    import optax

    state = train_state.TrainState.create(apply_fn=model.apply, params=params,
                                          tx=optax.identity())
    pred_fn = jax.jit(vcr_pred_step)

    rng = np.random.default_rng(0)
    out = defaultdict(dict)
    examples, ids = [], []

    def flush():
        nonlocal examples, ids
        if not examples:
            return
        while len(examples) < args.batch_size:  # pad the final batch
            examples.append(examples[0])
            ids.append("pad")
        batch = {k: jnp.asarray(np.stack([e[k] for e in examples]))
                 for k in examples[0]}
        probs = np.exp(np.asarray(pred_fn(state, batch)["logprobs"],
                                  dtype=np.float32))
        for id_i, p_i in zip(ids, probs):
            if id_i == "pad":
                continue
            annot_id = "-".join(id_i.split("-")[:2])
            conditionee = id_i.split("_")[-1]
            row = {f"answer_{i}": float(p_i[0, i]) for i in range(4)}
            for i in range(4):
                row[f"rationale_conditioned_on_{conditionee}_{i}"] = float(p_i[1, i])
            out[annot_id].update(row)
        examples, ids = [], []

    for path in sorted(glob.glob(args.test_fns)):
        for record in read_records(path):
            raw = parse_example(record)
            ids.append(bytes(raw["id"][0]).decode())
            examples.append(preprocess_vcr(raw, cfg, rng, is_training=False))
            if len(examples) == args.batch_size:
                flush()
    flush()

    annot_ids = sorted(out.keys(), key=lambda a: int(a.split("-")[1]))
    cols = sorted({c for row in out.values() for c in row})
    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["annot_id"] + cols)
        for a in annot_ids:
            assert all(c in out[a] for c in cols), f"missing columns for {a}"
            w.writerow([a] + [out[a][c] for c in cols])
    print(f"wrote {len(annot_ids)} rows to {args.out}")


if __name__ == "__main__":
    main()
