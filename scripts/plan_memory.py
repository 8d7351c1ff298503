#!/usr/bin/env python
"""HBM planning CLI: will this training configuration fit, per chip?

Wraps parallel/memory.py (calibrated on six measured v5e OOM/fit points)
so operators can size batch / remat / ZeRO / pipeline / flash BEFORE paying
a compile.

Examples:
  python scripts/plan_memory.py base --batch 1 2 4
  python scripts/plan_memory.py large --batch 1 --remat --zero1-dp 8
  python scripts/plan_memory.py base --batch 4 --flash-joint
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("config", help="config name or YAML path")
    ap.add_argument("--batch", type=int, nargs="+", default=[1, 2, 4],
                    help="per-chip batch sizes to plan")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--zero1-dp", type=int, default=1,
                    help="dp size the Adam moments shard over (ZeRO-1)")
    ap.add_argument("--pp", type=int, default=1, help="pipeline stages")
    ap.add_argument("--sp", type=int, default=1,
                    help="sequence-parallel shards of the joint tower "
                         "(seq_shard_axis / ring / ulysses)")
    ap.add_argument("--flash-joint", action="store_true",
                    help="joint tower on the Pallas flash kernels "
                         "(no materialized attention probs)")
    ap.add_argument("--hbm-gb", type=float, default=15.75,
                    help="usable HBM per chip (v5e default)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.parallel.memory import estimate_train_hbm

    cfg = mr.load_config(args.config)
    budget = args.hbm_gb * 1e9
    for b in args.batch:
        e = estimate_train_hbm(cfg, b, remat=args.remat,
                               zero1_dp=args.zero1_dp, pp=args.pp,
                               flash_joint=args.flash_joint, sp=args.sp)
        print(json.dumps({
            "config": args.config, "per_chip_batch": b,
            "remat": args.remat, "zero1_dp": args.zero1_dp, "pp": args.pp,
            "sp": args.sp, "flash_joint": args.flash_joint,
            "params_m": round(e["params"] / 1e6, 1),
            "state_gb": round(e["state_bytes"] / 1e9, 2),
            "activations_gb": round(e["activation_bytes"] / 1e9, 2),
            "total_gb": round(e["total"] / 1e9, 2),
            "fits": bool(e["total"] <= budget),
        }), flush=True)


if __name__ == "__main__":
    main()
