"""Worker process for tests/test_multiprocess.py.

Runs `run_pretraining` as one process of a 2-process jax.distributed CPU
cluster (4 local devices each, dp=8 global mesh). Each worker feeds only its
half of the global batch — the multi-host feed path the reference exercises
only on real TPU pods (SURVEY.md §4: "multi-node without a cluster is not
tested" there; here it is).

Usage: python _mp_worker.py <process_id> <coordinator_port> <out_json> [layout]

layout 'dp8' (default): dp=8 mesh, each worker feeds its half-batch.
layout 'tp4x2': dp=4 x tp=2 mesh, device order interleaved so every
Megatron tp psum pair (and every dp grad-psum pair) is cross-process;
params live half-per-process.
layout 'ring4x2': dp=4 x sp=2 mesh with the device order INTERLEAVED across
the two processes so every sp pair — i.e. every ring-attention ppermute
partner and every dp grad-psum pair — straddles the process boundary; the
joint tower runs joint_attention_impl='ring'. Each worker feeds the full
global batch (with cross-process sp replication every dp row is addressable
from both processes, so the process-local slice IS the full batch).
layout 'ulysses4x2' / 'sp4x2': same interleaved dp=4 x sp=2 mesh with
joint_attention_impl='ulysses' (cross-process all_to_alls) / plain GSPMD
sequence sharding (cross-process K/V all-gathers).
layout 'pp4x2': dp=4 x pp=2 mesh, interleaved so every pipeline-stage
hand-off (the GPipe ppermute in parallel/pipeline.py's partial-manual
region) crosses the process boundary; the joint stack runs pipelined with
2 microbatches.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)


def main():
    pid, port, out_json = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    layout = sys.argv[4] if len(sys.argv) > 4 else "dp8"
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                               process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8

    import dataclasses

    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.data.dummy import make_dummy_batch
    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.training.pretrain import run_pretraining
    from merlot_reserve_tpu.utils.experiment import NullTracker

    cfg = mr.load_config("base", hidden_size=64, joint_num_layers=2,
                         vit_num_layers=2, audio_num_layers=2,
                         span_num_layers=2, size_per_head=32,
                         output_grid=(4, 4), use_bfloat16=False)
    cfg = cfg.replace_data(num_segments=4, num_segment_groups=2, seq_len=80,
                           lang_seq_len=40, num_text_spans_to_include=8)
    cfg = dataclasses.replace(cfg, optimizer=dataclasses.replace(
        cfg.optimizer, num_train_steps=100, num_warmup_steps=10))

    if layout == "zs_eval":
        # multi-host zero-shot QA eval: dp=8 mesh, ONE global batch of 8
        # TVQA examples, each worker feeding its 4 and keeping its own rows
        import numpy as np

        from merlot_reserve_tpu.data.synthetic import (
            write_synthetic_finetune_corpus)
        from merlot_reserve_tpu.data.tfrecord import parse_example, read_records
        from merlot_reserve_tpu.finetune.data import preprocess_tvqa_zero_shot
        from merlot_reserve_tpu.finetune.models import MerlotReserveTVQAZeroShot
        from merlot_reserve_tpu.zero_shot import zero_shot_qa_eval

        cfg = cfg.replace_data(num_segments=7, lang_seq_len=48)
        corpus = out_json + f".{pid}.tfrecord"  # same seed -> same bytes
        write_synthetic_finetune_corpus(corpus, cfg, "tvqa", num_records=8,
                                        seed=7)
        records = [parse_example(r) for r in read_records(corpus)]
        rng = np.random.default_rng(0)
        exs = [preprocess_tvqa_zero_shot(r, cfg, rng) for r in records]

        model = MerlotReserveTVQAZeroShot.from_config(cfg)
        params = model.init_params(
            {k: np.stack([e[k] for e in exs[:2]]) for k in exs[0]})

        mine = list(range(pid * 4, (pid + 1) * 4))
        batches = [([f"r{g}" for g in mine],
                    {k: np.stack([exs[g][k] for g in mine]) for k in exs[0]})]
        mesh = make_mesh(dp=8)
        metrics, rows = zero_shot_qa_eval(model, params, iter(batches),
                                          "tvqa", mesh=mesh)
        with open(out_json, "w") as f:
            json.dump({"metrics": metrics, "rows": rows}, f)
        print(f"worker {pid} done", flush=True)
        return

    if layout == "fused_dev":
        # multi-host ON-DEVICE DATA PLANE (VERDICT r3 item 6): each worker's
        # DevicePretrainLoader(fused=True, on_device_frames=True) reads its
        # file shard and yields raw byte-decoded arrays (incl. uint8 frame
        # buffers); form_global_batch assembles the global raw batch across
        # the processes and the fused train step builds examples IN-GRAPH.
        from merlot_reserve_tpu.data.loader import DevicePretrainLoader
        from merlot_reserve_tpu.data.synthetic import write_synthetic_corpus

        cfg = cfg.replace_data(on_device_frames=True, frame_buffer_size=328)
        # same seeds on both workers -> byte-identical shard files
        files = [out_json + f".shard{i}.tfrecord" for i in range(2)]
        for i, p in enumerate(files):
            write_synthetic_corpus(p, cfg, num_records=8, seed=100 + i)
        loader = DevicePretrainLoader(files, cfg, batch_size=4,
                                      host_index=pid, num_hosts=2, seed=3,
                                      num_workers=2, repeat=True, fused=True)
        mesh = make_mesh(dp=8)
        logged = []
        run_pretraining(cfg, loader, num_steps=3, mesh=mesh, log_every=1,
                        tracker=NullTracker(), data_seed=7,
                        fused_builder=loader._dev_builder,
                        log_fn=lambda s, m: logged.append((s, m)))
        with open(out_json, "w") as f:
            json.dump(logged, f)
        print(f"worker {pid} done", flush=True)
        return

    if layout == "tp4x2":
        # Megatron tensor parallelism ACROSS the process boundary: the
        # interleaved order puts each tp pair (the per-layer psum partners,
        # parallel/sharding.py::_tp_spec_for) in different processes, so
        # every layer's tp reduction and every dp grad-psum pair is a
        # cross-process collective; each param lives half-per-process.
        devs = sorted(jax.devices(), key=lambda d: d.id)
        order = [devs[i] for i in (0, 4, 1, 5, 2, 6, 3, 7)]
        mesh = make_mesh(dp=4, tp=2, devices=order)

        def local_batches(n):
            # every dp row is addressable from both processes (its tp pair
            # has one device in each) -> the local slice is the full batch
            for i in range(n):
                yield make_dummy_batch(cfg, batch_size=8, seed=i,
                                       num_text_spans=16)
    elif layout in ("ring4x2", "ulysses4x2", "sp4x2"):
        import dataclasses as dc

        # sp4x2 = plain GSPMD sequence sharding (cross-process K/V
        # all-gathers); ring/ulysses swap in the explicit collectives
        impl = {"ring4x2": "ring", "ulysses4x2": "ulysses",
                "sp4x2": None}[layout]
        cfg = dc.replace(cfg, model=dc.replace(
            cfg.model, seq_shard_axis="sp", joint_attention_impl=impl))
        devs = sorted(jax.devices(), key=lambda d: d.id)
        # interleave: sp pairs (and each dp row) straddle the two processes
        order = [devs[i] for i in (0, 4, 1, 5, 2, 6, 3, 7)]
        mesh = make_mesh(dp=4, sp=2, devices=order)

        def local_batches(n):
            # every dp row is addressable from both processes (its sp pair
            # has one device in each) -> the local slice is the full batch
            for i in range(n):
                yield make_dummy_batch(cfg, batch_size=8, seed=i,
                                       num_text_spans=16)
    elif layout == "pp4x2":
        import dataclasses as dc

        # GPipe ACROSS the process boundary: the interleaved order puts
        # each pp stage pair in different processes, so every microbatch
        # hand-off ppermute (and every dp grad-psum pair) crosses hosts
        cfg = dc.replace(cfg, model=dc.replace(
            cfg.model, pipeline_axis="pp", pipeline_microbatches=2))
        devs = sorted(jax.devices(), key=lambda d: d.id)
        order = [devs[i] for i in (0, 4, 1, 5, 2, 6, 3, 7)]
        mesh = make_mesh(dp=4, pp=2, devices=order)

        def local_batches(n):
            # every dp row is addressable from both processes (its pp pair
            # has one device in each) -> the local slice is the full batch
            for i in range(n):
                yield make_dummy_batch(cfg, batch_size=8, seed=i,
                                       num_text_spans=16)
    else:
        mesh = make_mesh(dp=8)

        def local_batches(n):
            # each host yields its 1/num_hosts slice of the global batch
            # (the role data/loader.py's file sharding plays in production)
            for i in range(n):
                b = make_dummy_batch(cfg, batch_size=8, seed=i,
                                     num_text_spans=16)
                yield {k: v[pid * 4:(pid + 1) * 4] for k, v in b.items()}

    logged = []
    run_pretraining(cfg, local_batches(3), num_steps=3, mesh=mesh,
                    log_every=1, tracker=NullTracker(),
                    log_fn=lambda s, m: logged.append((s, m)))
    with open(out_json, "w") as f:
        json.dump(logged, f)
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
