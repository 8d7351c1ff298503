#!/usr/bin/env python
"""Checkpoint converter CLI: reference <-> this framework, any layout.

A user switching from rowanz/merlot_reserve brings flax-msgpack checkpoints
written by /root/reference/mreserve/checkpoint.py:61-99 (f16-compressed,
'ckpt_'-prefixed, per-layer 'layer_NN' param trees). This framework reads
those directly (utils/checkpoint.py) — this tool exists for the cases where
you want a converted FILE:

  * --to-scan:    restack 'layer_NN' trees into the stacked 'layers' layout
                  (scan_layers=True models) — loading is faster and the
                  tree matches what the pjit trainer checkpoints.
  * --to-layers:  the inverse, producing a file whose params restore
                  byte-for-byte through the reference's own
                  restore_checkpoint.
  * --no-optimizer: strip optimizer state (release/finetune convention).
  * --bfloat16:   cast params bf16 for inference-only deployments.

Examples:
  python scripts/convert_checkpoint.py ckpts/ out/ --to-scan
  python scripts/convert_checkpoint.py ckpts/ out/ --to-layers --no-optimizer
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("src", help="checkpoint dir (ckpt_* files) or file")
    ap.add_argument("dst", help="output dir")
    ap.add_argument("--step", type=int, default=None,
                    help="which step to convert (default: latest)")
    direction = ap.add_mutually_exclusive_group()
    direction.add_argument("--to-scan", action="store_true",
                           help="layer_NN -> stacked 'layers' leaves")
    direction.add_argument("--to-layers", action="store_true",
                           help="stacked 'layers' -> layer_NN (reference layout)")
    ap.add_argument("--no-optimizer", action="store_true",
                    help="drop optimizer state from the output")
    ap.add_argument("--bfloat16", action="store_true",
                    help="cast float32 params to bfloat16 (inference)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from merlot_reserve_tpu.utils import checkpoint as ckpt

    raw = ckpt.load_checkpoint(args.src, step=args.step)
    if raw is None:
        raise SystemExit(f"no checkpoint found under {args.src!r}")
    if not isinstance(raw, dict) or "params" not in raw:
        raise SystemExit("checkpoint does not look like a train state "
                         "(no 'params' entry)")

    params = raw["params"]
    if args.to_scan:
        params = ckpt.stack_layer_params(params)
    elif args.to_layers:
        params = ckpt.unstack_layer_params(params)
    if args.bfloat16:
        params = ckpt.f32_to_bf16(params)

    out = dict(raw, params=params)
    if args.no_optimizer:
        out["opt_state"] = None
    if "step" not in out or out["step"] is None:
        out["step"] = 0

    os.makedirs(args.dst, exist_ok=True)
    ckpt.save_checkpoint(out, args.dst)
    n = sum(int(getattr(x, "size", 0))
            for x in jax.tree_util.tree_leaves(params))
    print(f"wrote step {out['step']} ({n:,d} params) to {args.dst}")


if __name__ == "__main__":
    main()
