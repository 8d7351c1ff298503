"""Host data-plane throughput benchmark (VERDICT r1 item #3).

Measures examples/sec through the pretraining loader — record read ->
protobuf parse -> JPEG decode (image + spectrogram) -> resize/patchify ->
masking engine -> collate — at full base shapes (16 segments, 188-frame
specs), with a per-stage breakdown, with and without the native C++ decode
plane, and across worker counts (this dev box has 1 core; worker scaling
beyond 1 documents contention, the per-core number is the capacity unit).

The reference's host path is tf.data with a 48-thread private threadpool
per host (/root/reference/pretrain/dataloader.py:864-903). Capacity math
(BASELINE.md): one v5e chip consumes ~9-12 examples/s at base shapes
(107-174 ms/step, per-chip batch 1-2), so a pod host needs
cores >= chip_consumption / per_core_exps * chips_per_host.

Usage: python scripts/bench_loader.py [--records N] [--workers 1,2,4]
Prints one JSON line per configuration.
"""

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def bench_stages(cfg, path, n: int):
    """Single-thread per-stage breakdown over n examples."""
    from merlot_reserve_tpu.data import native as N
    from merlot_reserve_tpu.data.pretrain_pipeline import (
        PretrainExampleBuilder, collate_batch, parse_segment_record)
    from merlot_reserve_tpu.data.tfrecord import read_records

    records = []
    while len(records) < n:
        for r in read_records(path):
            records.append(r)
            if len(records) == n:
                break

    t0 = time.perf_counter()
    parsed = [parse_segment_record(r, cfg.data.num_segments) for r in records]
    t_parse = time.perf_counter() - t0

    builder = PretrainExampleBuilder(cfg)
    t0 = time.perf_counter()
    examples = [builder.build(p, np.random.default_rng(i))
                for i, p in enumerate(parsed)]
    t_build = time.perf_counter() - t0

    t0 = time.perf_counter()
    bs = 4
    for i in range(0, len(examples) - bs + 1, bs):
        collate_batch(examples[i:i + bs])
    t_collate = time.perf_counter() - t0

    return {
        "native": bool(N.native_available()),
        "parse_ms_per_ex": round(1e3 * t_parse / n, 2),
        "build_ms_per_ex": round(1e3 * t_build / n, 2),
        "collate_ms_per_ex": round(1e3 * t_collate / n, 2),
    }


def bench_loader(cfg, paths, n_batches: int, batch_size: int, workers: int,
                 use_processes: bool, on_device: bool = False,
                 fused: bool = False):
    from merlot_reserve_tpu.data.loader import (DevicePretrainLoader,
                                                PretrainLoader)

    cls = DevicePretrainLoader if on_device else PretrainLoader
    # fused=True makes the device loader yield raw host arrays with ZERO
    # device calls — the pure host-floor measurement (assembly cost then
    # lives inside the fused train step, scripts/bench_fused_step.py)
    kw = {"fused": True} if (on_device and fused) else {}
    loader = cls(paths, cfg, batch_size=batch_size, seed=0,
                 num_workers=workers, prefetch=2,
                 use_processes=use_processes, **kw)
    it = iter(loader)
    next(it)  # warm pools/caches
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    dt = time.perf_counter() - t0
    return n_batches * batch_size / dt


def bench_reference(cfg, path, batch_size: int):
    """The reference's OWN tf.data pipeline (unmodified
    /root/reference/pretrain/dataloader.py:864-903 — TFRecordDataset ->
    dataset_parser -> batch -> handle_batch, 48-thread private pool,
    AUTOTUNE maps) over the same schema-exact records, examples/s on this
    host. Its module imports tensorflow_datasets (dataloader.py:16) but
    never uses it; absent in this image, so an empty stub is installed
    (same trick as tests/test_masking_parity.py)."""
    import sys
    import types

    sys.modules.setdefault("tensorflow_datasets",
                           types.ModuleType("tensorflow_datasets"))
    sys.path.insert(0, "/root/reference")
    import yaml

    with open("/root/reference/pretrain/configs/base.yaml") as f:
        config = yaml.safe_load(f)
    from pretrain import dataloader as ref_dl

    ds = ref_dl.make_dataset(config, fns=[path], batch_size=batch_size,
                             num_devices=1, is_training=True)
    it = iter(ds)
    next(it), next(it)  # pipeline warmup
    n = 0
    t0 = time.perf_counter()
    for _ in it:
        n += batch_size
    dt = time.perf_counter() - t0
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", type=int, default=24)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--workers", default="1,2,4")
    ap.add_argument("--processes", action="store_true")
    ap.add_argument("--on-device", action="store_true",
                    help="DevicePretrainLoader: host workers only decode "
                         "bytes; example assembly runs on the accelerator")
    ap.add_argument("--on-device-frames", action="store_true",
                    help="frames stay raw uint8 buffers too (flip/resize/"
                         "augment/patchify in-graph, ops/vision_train.py); "
                         "implies --on-device")
    ap.add_argument("--fused", action="store_true",
                    help="loader yields raw host arrays with no device "
                         "calls (the pure host-floor measurement)")
    ap.add_argument("--reference", action="store_true",
                    help="measure the reference's own tf.data pipeline "
                         "instead (same synthetic records, this host)")
    args = ap.parse_args()
    if args.on_device_frames:
        args.on_device = True

    import merlot_reserve_tpu as mr

    cfg = mr.load_config("base")
    if args.on_device_frames:
        cfg = cfg.replace_data(on_device_frames=True)

    with tempfile.TemporaryDirectory() as td:
        from merlot_reserve_tpu.data.synthetic import write_synthetic_corpus

        paths = []
        for i in range(2):
            p = os.path.join(td, f"train-{i:05d}.tfrecord")
            write_synthetic_corpus(p, cfg, num_records=args.records // 2,
                                   seed=i)
            paths.append(p)

        if args.reference:
            exps = bench_reference(cfg, paths[0], args.batch_size)
            print(json.dumps({
                "metric": "reference_tf_data_examples_per_sec",
                "value": round(exps, 2), "unit": "examples/s",
                "segments_per_sec": round(exps * cfg.data.num_segments, 1),
            }), flush=True)
            return

        stages = bench_stages(cfg, paths[0], min(args.records, 12))
        print(json.dumps({"metric": "loader_stage_breakdown", **stages}),
              flush=True)

        chip_need_exps = 12.0  # v5e chip at per-chip batch 2 (BASELINE.md)
        for w in [int(x) for x in args.workers.split(",")]:
            exps = bench_loader(cfg, paths, args.batches, args.batch_size, w,
                                args.processes, on_device=args.on_device,
                                fused=args.fused)
            print(json.dumps({
                "metric": "loader_examples_per_sec",
                "value": round(exps, 2), "unit": "examples/s",
                "workers": w, "on_device": args.on_device,
                "on_device_frames": args.on_device_frames,
                "fused": args.fused,
                "mode": ("process" if args.processes
                         else "thread"),
                "segments_per_sec": round(exps * cfg.data.num_segments, 1),
                "chips_fed_per_worker": round(exps / chip_need_exps / w, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
