#!/usr/bin/env python
"""Chipless single-layout AOT memory probe: compile the FULL train step
for a v5e without any TPU and print XLA's memory verdict.

This is the tool that settled the round-5 long-video campaign: the
chipless compiler reproduces the real chip's OOM totals EXACTLY (same
"Used N.NNG of 15.75G" to the hundredth, with the largest-allocations
list in the exception), so memory questions at any shape get answered in
minutes, with no TPU time, before any bench is paid for. It replaces the
analytic planner wherever the planner declares itself uncalibrated
(parallel/memory.py `uncalibrated_regime`, e.g. >32-segment videos).

Unlike scripts/pod_readiness.py (fixed production layouts + collective
audit + docs tables), this probes ONE ad-hoc shape/knob combination:

  python scripts/aot_probe.py base --segments 80 --joint_attn flash \
      --tower-remat                      # the 80-seg winner: 15.61G
  python scripts/aot_probe.py base --segments 160 --joint_attn flash \
      --remat --tower-remat              # 7.66G
  python scripts/aot_probe.py large --batch 1 --remat --dp 8

On OOM the verdict is printed as a RESULT (exit 0), with the top
allocations; pass --raise to get the full exception instead.
"""

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", help="config name or YAML path")
    ap.add_argument("--batch", type=int, default=1, help="global batch")
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--sp", type=int, default=1)
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--segments", type=int, default=None,
                    help="long-video mode (same seq math as bench_train)")
    ap.add_argument("--joint_attn", default=None,
                    help="joint_attention_impl override (xla/flash/ring/...)")
    ap.add_argument("--remat", action="store_true",
                    help="gradient_checkpoint (joint tower)")
    ap.add_argument("--tower-remat", action="store_true",
                    help="tower_gradient_checkpoint (modality towers)")
    ap.add_argument("--segment-shard", action="store_true",
                    help="segment_shard_axis='sp' (tower rows over sp)")
    ap.add_argument("--unroll", action="store_true")
    ap.add_argument("--topology", default=None,
                    help="v5e topology name (default: smallest that holds "
                         "dp*sp*tp chips)")
    ap.add_argument("--raise", dest="raise_", action="store_true")
    ap.add_argument("--top", type=int, default=0,
                    help="print the N largest allocations on OOM")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.jax_cache"))
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import NamedSharding, PartitionSpec as P

    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.data.dummy import make_dummy_batch
    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.parallel.mesh import activate_mesh
    from merlot_reserve_tpu.parallel.sharding import (batch_sharding,
                                                      state_shardings)
    from merlot_reserve_tpu.training.trainer import train_step
    from pod_readiness import abstract_train_state

    n_chips = args.dp * args.sp * args.tp
    topo_name = args.topology or {1: "v5e:2x2", 2: "v5e:2x2", 4: "v5e:2x2",
                                  8: "v5e:2x4", 16: "v5e:4x4"}.get(
                                      n_chips, "v5e:8x8")
    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=topo_name)

    kw = dict(gradient_checkpoint=args.remat,
              tower_gradient_checkpoint=args.tower_remat,
              scan_layers=not args.unroll)
    if args.joint_attn:
        kw["joint_attention_impl"] = args.joint_attn
    if args.sp > 1:
        kw["seq_shard_axis"] = "sp"
    if args.segment_shard:
        kw["segment_shard_axis"] = "sp"
    cfg = mr.load_config(args.config, **kw)
    if args.segments is not None:
        d, m = cfg.data, cfg.model
        per_seg = (m.output_grid[0] * m.output_grid[1]) // (m.vit_pooling_ratio ** 2)
        cfg = cfg.replace_data(
            num_segments=args.segments,
            seq_len=d.lang_seq_len + (args.segments // d.num_segment_groups) * per_seg)

    mesh = make_mesh(dp=args.dp, sp=args.sp, tp=args.tp,
                     devices=list(topo.devices)[:n_chips])
    batch_np = make_dummy_batch(cfg, batch_size=args.batch, seed=0,
                                num_text_spans=cfg.data.num_text_spans_to_include)
    abs_state = abstract_train_state(cfg, batch_np)
    s_sh = state_shardings(mesh, abs_state, zero1=True)
    b_sh = batch_sharding(mesh)
    state_sds = jax.tree.map(
        lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
        abs_state, s_sh)
    batch_sds = {k: jax.ShapeDtypeStruct(np.asarray(v).shape,
                                         np.asarray(v).dtype, sharding=b_sh)
                 for k, v in batch_np.items()}
    jitted = jax.jit(train_step,
                     out_shardings=(s_sh, NamedSharding(mesh, P())),
                     donate_argnums=(0,))
    rec = {"config": args.config, "segments": args.segments,
           "seq_len": cfg.data.seq_len, "batch": args.batch,
           "dp": args.dp, "sp": args.sp, "tp": args.tp,
           "joint_attn": args.joint_attn, "remat": args.remat,
           "tower_remat": args.tower_remat,
           "segment_shard": args.segment_shard, "topology": topo_name}
    with activate_mesh(mesh):
        lowered = jitted.lower(state_sds, batch_sds)
        try:
            compiled = lowered.compile()
        except Exception as e:
            if args.raise_:
                raise
            m = re.search(r"Used ([0-9.]+[GM]) of ([0-9.]+[GM]) hbm", str(e))
            rec["compile"] = (f"OOM ({m.group(1)} of {m.group(2)})"
                              if m else f"error: {str(e)[:200]}")
            if args.top and m:
                allocs = re.findall(
                    r"(\d+)\. Size: ([0-9.]+[GMK]?)\n\s+Shape: (\S+)", str(e))
                rec["largest_allocations"] = [
                    {"size": s, "shape": sh[:90]}
                    for _, s, sh in allocs[:args.top]]
            print(json.dumps(rec))
            return
    ma = compiled.memory_analysis()
    hbm = (ma.argument_size_in_bytes + ma.temp_size_in_bytes
           + ma.output_size_in_bytes - ma.alias_size_in_bytes)
    rec.update(compile="clean",
               hbm_highwater_gib=round(hbm / 2**30, 3),
               temp_gib=round(ma.temp_size_in_bytes / 2**30, 3),
               argument_gib=round(ma.argument_size_in_bytes / 2**30, 3))
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
