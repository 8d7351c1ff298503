#!/usr/bin/env python
"""Audit the cross-chip collectives of a compiled training step.

Lowers the jitted train step for a chosen (dp, tp, sp, pp) layout on a
VIRTUAL CPU mesh (no TPUs needed), parses the optimized HLO, and prints a
JSON table of per-collective counts and buffer bytes — what the layout
will ask of the ICI before renting a pod. Companion to
scripts/plan_memory.py (HBM side); see parallel/comm.py for semantics
(result-buffer bytes, once-per-HLO-appearance for loop bodies).

The reference has no counterpart: its three collectives are hand-placed
pmap calls (SURVEY.md §2.13) with no way to inspect the lowering.

Examples:
  python scripts/audit_comm.py base --dp 4 --batch 4 --tiny
  python scripts/audit_comm.py base --dp 2 --sp 2 --ring --tiny
  # long-video (VERDICT r4 item 7): full-base bytes at joint seq 2560
  python scripts/audit_comm.py base --dp 2 --sp 2 --impl ring --segments 80
  python scripts/audit_comm.py base --dp 2 --sp 2 --impl ulysses --segments 80
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--sp", type=int, default=1)
    ap.add_argument("--pp", type=int, default=1)
    ap.add_argument("--batch", type=int, default=None,
                    help="global batch (default: dp)")
    ap.add_argument("--ring", action="store_true",
                    help="joint_attention_impl='ring' over the sp axis")
    ap.add_argument("--impl", default=None,
                    help="joint_attention_impl for sp>1 layouts (e.g. "
                         "'ring', 'ring:flash', 'ulysses', 'ulysses:flash');"
                         " --ring is shorthand for --impl ring")
    ap.add_argument("--segments", type=int, default=None,
                    help="long-video mode: scale DATA shapes to an "
                         "N-segment video (same seq math as "
                         "scripts/bench_train.py --segments)")
    ap.add_argument("--no-zero1", action="store_true",
                    help="replicate optimizer state instead of dp-sharding")
    ap.add_argument("--tiny", action="store_true",
                    help="shrink the model (64-hidden, 2-layer) — same "
                         "collective STRUCTURE, fast CPU compile; drop for "
                         "production byte magnitudes")
    args = ap.parse_args()

    n_dev = args.dp * args.tp * args.sp * args.pp
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", max(n_dev, 1))

    import dataclasses

    import jax.numpy as jnp

    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.data.dummy import make_dummy_batch
    from merlot_reserve_tpu.models import MerlotReservePretrainer
    from merlot_reserve_tpu.parallel import collective_summary, make_mesh
    from merlot_reserve_tpu.training.optimization import construct_train_state
    from merlot_reserve_tpu.training.trainer import make_jit_train_step

    overrides = {}
    if args.tiny:
        overrides = dict(hidden_size=64, joint_num_layers=2, vit_num_layers=2,
                         audio_num_layers=2, span_num_layers=2,
                         size_per_head=32, output_grid=(4, 4),
                         use_bfloat16=False)
    cfg = mr.load_config(args.config, **overrides)
    if args.tiny:
        cfg = cfg.replace_data(num_segments=4, num_segment_groups=2,
                               seq_len=80, lang_seq_len=40,
                               num_text_spans_to_include=8)
    if args.segments is not None:
        # long-video DATA scaling — same seq math as bench_train --segments
        d, m = cfg.data, cfg.model
        per_seg = (m.output_grid[0] * m.output_grid[1]) // (m.vit_pooling_ratio ** 2)
        seq = d.lang_seq_len + (args.segments // d.num_segment_groups) * per_seg
        cfg = cfg.replace_data(num_segments=args.segments, seq_len=seq)
        print(f"# long-video: {args.segments} segments -> joint seq {seq}",
              file=sys.stderr)
    impl = args.impl or ("ring" if args.ring else None)
    model_kw = {}
    if args.sp > 1:
        model_kw["seq_shard_axis"] = "sp"
        if impl:
            model_kw["joint_attention_impl"] = impl
    if args.pp > 1:
        model_kw["pipeline_axis"] = "pp"
    if model_kw:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, **model_kw))

    batch_size = args.batch or args.dp
    model = MerlotReservePretrainer.from_config(cfg)
    batch = make_dummy_batch(
        cfg, batch_size=batch_size, seed=0,
        num_text_spans=(16 if args.tiny else
                        cfg.data.num_text_spans_to_include))
    params = model.init_params(batch)
    state = construct_train_state(cfg.optimizer, model, params)

    mesh = make_mesh(dp=args.dp, tp=args.tp, sp=args.sp, pp=args.pp)
    step_fn, state = make_jit_train_step(mesh, state,
                                         zero1=not args.no_zero1,
                                         donate=False)
    bd = {k: jnp.asarray(v) for k, v in batch.items()}
    summary = collective_summary(step_fn, state, bd, mesh=mesh)
    summary["layout"] = {"dp": args.dp, "tp": args.tp, "sp": args.sp,
                         "pp": args.pp, "batch": batch_size,
                         "tiny": args.tiny, "impl": impl,
                         "segments": args.segments,
                         "seq_len": cfg.data.seq_len,
                         "zero1": not args.no_zero1}
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
