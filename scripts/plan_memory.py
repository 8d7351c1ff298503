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
    ap.add_argument("--segments", type=int, default=None,
                    help="long-video mode: scale DATA shapes to an "
                         "N-segment video (same seq math as bench_train "
                         "--segments). NOTE: >32 segments is outside the "
                         "planner's calibrated regime — it will say so and "
                         "point at the chipless-AOT recipe")
    ap.add_argument("--tower-remat", action="store_const", const=True,
                    default=None,
                    help="ModelConfig.tower_gradient_checkpoint (the "
                         "long-video memory lever). Omitted = the legacy "
                         "calibration coupling (towers follow --remat)")
    ap.add_argument("--segment-sp", type=int, default=1,
                    help="ModelConfig.segment_shard_axis shard count "
                         "(tower rows shard over sp too)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.parallel.memory import estimate_train_hbm

    cfg = mr.load_config(args.config)
    if args.segments is not None:
        d, m = cfg.data, cfg.model
        per_seg = (m.output_grid[0] * m.output_grid[1]) // (m.vit_pooling_ratio ** 2)
        cfg = cfg.replace_data(
            num_segments=args.segments,
            seq_len=d.lang_seq_len + (args.segments // d.num_segment_groups) * per_seg)

    budget = args.hbm_gb * 1e9
    for b in args.batch:
        e = estimate_train_hbm(cfg, b, remat=args.remat,
                               zero1_dp=args.zero1_dp, pp=args.pp,
                               flash_joint=args.flash_joint, sp=args.sp,
                               tower_remat=args.tower_remat,
                               segment_sp=args.segment_sp)
        rec = {
            "config": args.config, "per_chip_batch": b,
            "remat": args.remat, "zero1_dp": args.zero1_dp, "pp": args.pp,
            "sp": args.sp, "flash_joint": args.flash_joint,
            "tower_remat": args.tower_remat, "segment_sp": args.segment_sp,
            "params_m": round(e["params"] / 1e6, 1),
            "state_gb": round(e["state_bytes"] / 1e9, 2),
            "activations_gb": round(e["activation_bytes"] / 1e9, 2),
            "total_gb": round(e["total"] / 1e9, 2),
            "fits": bool(e["total"] <= budget),
        }
        if "uncalibrated_regime" in e:
            rec["WARNING"] = e["uncalibrated_regime"]
        print(json.dumps(rec), flush=True)
        if "uncalibrated_regime" in e:
            print(f"WARNING: {e['uncalibrated_regime']}", file=sys.stderr)


if __name__ == "__main__":
    main()
