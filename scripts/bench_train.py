"""Our pretraining-step throughput on this chip, same methodology as
scripts/bench_reference_train.py (chained lax.scan of train steps inside
one jit; per-step = (t(N)-t(1))/(N-1); best-of-3 timings): full base
config, all four streams, bf16-Adam.

Usage: python scripts/bench_train.py [--remat] [--tower_remat]
           [--remat_policy=dots_saveable] [batch ...]

Long-video mode (round 5, VERDICT item 7): ``--segments=N`` scales the
DATA shapes to an N-segment video — joint seq becomes
lang_seq_len + (N / num_segment_groups) * (grid_hw / pooling^2)
(e.g. --segments=80 -> L = 160 + 40*60 = 2560, four times the reference's
hard 1024 cap, /root/reference/pretrain/train_fixres.py:87). The joint
attention impl defaults to 'auto' = the Pallas flash kernels at L >= 2048;
pass --joint_attn=xla for the dense arm of the A/B.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    args = [a for a in sys.argv[1:]]
    remat = "--remat" in args
    tower_remat = "--tower_remat" in args
    unroll = "--unroll" in args
    scan_unroll = 1
    config_name = "base"
    joint_attn = None  # e.g. --joint_attn=flash:128:128
    remat_policy = None  # e.g. --remat_policy=dots_saveable
    for a in args:
        if a.startswith("--scan_unroll="):
            scan_unroll = int(a.split("=")[1])
        if a.startswith("--remat_policy="):
            remat_policy = a.split("=", 1)[1]
        if a.startswith("--config="):
            config_name = a.split("=")[1]
        if a.startswith("--joint_attn="):
            joint_attn = a.split("=", 1)[1]
    tower_attn = None  # e.g. --attn=flash:128:128 (vision/audio/span towers)
    for a in args:
        if a.startswith("--attn="):
            tower_attn = a.split("=", 1)[1]
    batch_sizes = [int(a) for a in args if not a.startswith("--")] or [1, 2]
    n_chain = int(os.environ.get("BENCH_CHAIN", "8"))

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.data.dummy import make_dummy_batch
    from merlot_reserve_tpu.models import MerlotReservePretrainer
    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.training.optimization import construct_train_state
    from merlot_reserve_tpu.training.trainer import make_jit_train_step, train_step
    from merlot_reserve_tpu.utils.profiling import device_peak_flops

    segments = None
    for a in args:
        if a.startswith("--segments="):
            segments = int(a.split("=")[1])

    cfg = mr.load_config(config_name, gradient_checkpoint=remat,
                         gradient_checkpoint_policy=remat_policy,
                         tower_gradient_checkpoint=tower_remat,
                         scan_layers=not unroll, scan_unroll=scan_unroll,
                         joint_attention_impl=joint_attn,
                         **({"attention_impl": tower_attn} if tower_attn
                            else {}))
    if segments is not None:
        d, m = cfg.data, cfg.model
        per_seg = (m.output_grid[0] * m.output_grid[1]) // (m.vit_pooling_ratio ** 2)
        seq = d.lang_seq_len + (segments // d.num_segment_groups) * per_seg
        cfg = cfg.replace_data(num_segments=segments, seq_len=seq)
        print(f"# long-video: {segments} segments -> joint seq {seq}",
              file=sys.stderr)
    n_spans = cfg.data.num_text_spans_to_include

    pre = MerlotReservePretrainer.from_config(cfg)
    mesh = make_mesh(dp=1, devices=jax.devices()[:1])

    def sync(tree):
        leaf = jax.tree.leaves(tree)[0]
        return float(np.asarray(leaf).reshape(-1)[0])

    for bsz in batch_sizes:
        batch_np = make_dummy_batch(cfg, batch_size=bsz, seed=0,
                                    num_text_spans=n_spans)
        params = pre.init_params(batch_np)
        state = construct_train_state(cfg.optimizer, pre, params)
        del params

        def chained(n):
            def fn(state, batch):
                def body(s, _):
                    s2, info = train_step(s, batch)
                    return s2, info
                state2, infos = jax.lax.scan(body, state, None, length=n)
                return state2, jax.tree.map(lambda x: x[-1], infos)
            return fn

        step1, state = make_jit_train_step(mesh, state, step_fn=chained(1))
        stepN, _ = make_jit_train_step(mesh, state, step_fn=chained(n_chain))

        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

        state, info = step1(state, batch)
        sync(info)
        t1 = float("inf")
        for _ in range(3):
            t0 = time.time()
            state, info = step1(state, batch)
            sync(info)
            t1 = min(t1, time.time() - t0)

        state, info = stepN(state, batch)
        sync(info)
        tN = float("inf")
        loss = None
        for _ in range(3):
            t0 = time.time()
            state, info = stepN(state, batch)
            loss = sync(info)
            tN = min(tN, time.time() - t0)

        print(f"# bsz={bsz} remat={remat}: t1={t1:.3f}s tN={tN:.3f}s",
              file=sys.stderr)
        step_s = (tN - t1) / (n_chain - 1)
        segs = bsz * cfg.data.num_segments / step_s
        peak = device_peak_flops()
        from merlot_reserve_tpu.utils.profiling import pretrain_step_flops

        mfu = (pretrain_step_flops(cfg, bsz) / step_s / peak) if peak else None
        print(json.dumps({
            "metric": "train_segments_per_sec_per_chip",
            "value": round(segs, 1), "unit": "segments/s/chip",
            "per_chip_batch": bsz, "step_ms": round(step_s * 1e3, 1),
            "config": config_name,
            "remat": remat, "tower_remat": tower_remat,
            "remat_policy": remat_policy,
            "scan_layers": not unroll,
            "scan_unroll": scan_unroll, "joint_attn": joint_attn,
            "mfu": round(mfu, 4) if mfu else None,
            "loss_probe": loss, "chain": n_chain,
        }), flush=True)
        del state


if __name__ == "__main__":
    main()
