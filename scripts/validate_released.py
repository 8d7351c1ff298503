#!/usr/bin/env python
"""Released-checkpoint validation gate, as ONE command (VERDICT r3 item 4).

On a networked TPU-VM this downloads a released MERLOT Reserve checkpoint,
converts it to this framework's layout, runs batched zero-shot TVQA and/or
VCR over the given val shards, and emits a parity table. It is the
BASELINE.json acceptance gate ("matching TVQA zero-shot accuracy") in
runbook form; every stage is the same code the tests exercise in-env
(tests/test_validate_released.py dry-runs the WHOLE flow against a local
fake bucket — only the network fetch itself is unexercised there).

Checkpoint naming follows the reference exactly
(/root/reference/mreserve/modeling.py:960-991): (model, grid) ->
gs://merlotreserve/ckpts/{base,large,base_resadapt,large_resadapt}, GCS
client with an HTTPS-requests fallback, cached under
~/.cache/merlotreserve.

Usage (networked TPU-VM):
  python scripts/validate_released.py large -grid 18,32 \
      --tvqa_fns 'gs://.../tvqa_val*.tfrecord' \
      --expected tvqa_joint=0.42 --tolerance 0.01 -out report.json

Dry run against a local layout (what the in-env test does):
  python scripts/validate_released.py base \
      --source /path/fake_bucket --tvqa_fns 'val*.tfrecord' ...

Exit code: 0 when every --expected metric is within --tolerance (or no
expectations given); 1 otherwise.
"""

import argparse
import glob
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (model, grid) -> released file name (modeling.py:960-967)
PARAM_FN = {
    ("base", (12, 20)): "base",
    ("large", (12, 20)): "large",
    ("base", (18, 32)): "base_resadapt",
    ("large", (18, 32)): "large_resadapt",
    ("base", (24, 24)): "base_resadapt",
    ("large", (24, 24)): "large_resadapt",
}
VALID_GRIDS = [(12, 20), (18, 32), (24, 24)]


def fetch_checkpoint(model_name: str, grid, source: str, cache_dir: str) -> str:
    """Resolve + fetch the released ckpt file; returns the local path.

    ``source``: a directory/file path (local fake-bucket layouts and
    pre-downloaded files), or a ``gs://bucket/prefix`` to download from
    (reference download semantics, modeling.py:974-989)."""
    param_fn = PARAM_FN[(model_name, tuple(grid))]
    if os.path.isfile(source):
        return source
    if os.path.isdir(source):
        local = os.path.join(source, param_fn)
        if not os.path.exists(local):
            raise FileNotFoundError(f"{local} not in local source layout")
        return local

    os.makedirs(cache_dir, exist_ok=True)
    cache_path = os.path.join(cache_dir, param_fn)
    if os.path.exists(cache_path):
        print(f"cached: {cache_path}", flush=True)
        return cache_path
    assert source.startswith("gs://"), source
    bucket_name, _, prefix = source[len("gs://"):].partition("/")
    blob_name = f"{prefix.rstrip('/')}/{param_fn}" if prefix else param_fn
    try:
        from google.cloud import storage

        print(f"DOWNLOADING gs://{bucket_name}/{blob_name}", flush=True)
        storage.Client().bucket(bucket_name).blob(
            blob_name).download_to_filename(cache_path)
    except Exception as e:  # no GCS client/credentials: plain HTTPS
        import requests

        url = f"https://storage.googleapis.com/{bucket_name}/{blob_name}"
        print(f"gcs client failed ({type(e).__name__}); "
              f"DOWNLOADING {url}", flush=True)
        r = requests.get(url, stream=True)
        r.raise_for_status()
        tmp = cache_path + ".part"
        with open(tmp, "wb") as f:
            for chunk in r.iter_content(chunk_size=1 << 20):
                f.write(chunk)
        shutil.move(tmp, cache_path)
    return cache_path


def load_released_params(ckpt_path: str, scan_layers: bool):
    """Released file -> this framework's param tree (f16 decompression +
    optional layer_NN -> stacked restack; utils/checkpoint.py)."""
    from merlot_reserve_tpu.utils.checkpoint import (load_checkpoint,
                                                     stack_layer_params)

    restored = load_checkpoint(ckpt_path)
    params = restored["params"] if "params" in restored else restored
    if scan_layers:
        params = stack_layer_params(params)
    return params


def run_gate(model_name: str, grid, source: str, cache_dir: str,
             tvqa_fns=None, vcr_fns=None, batch_size: int = 8,
             temperature: float = 100.0, model_overrides=None, mesh=None):
    """The whole gate as a callable (the dry-run test drives this):
    fetch -> convert -> zero-shot eval(s) -> parity table dict."""
    import math

    import jax
    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.finetune.data import finetune_batches
    from merlot_reserve_tpu.finetune.models import (MerlotReserveTVQAZeroShot,
                                                    MerlotReserveVCRZeroShot)
    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.zero_shot import zero_shot_qa_eval

    if mesh is None:
        # dp must divide the batch; don't assume it does on small runs
        g = math.gcd(batch_size, len(jax.devices()))
        mesh = make_mesh(dp=g, devices=jax.devices()[:g])

    ckpt_path = fetch_checkpoint(model_name, grid, source, cache_dir)
    print(f"checkpoint: {ckpt_path}", flush=True)

    table = {"checkpoint": ckpt_path, "model": model_name,
             "grid": list(grid), "tasks": {}}
    # model_overrides may shrink the model (the dry-run test); the released
    # grid stays the default otherwise
    overrides = {"output_grid": tuple(grid)}
    overrides.update(model_overrides or {})

    if tvqa_fns:
        cfg = mr.load_config(model_name, **overrides)
        cfg = cfg.replace_data(lang_seq_len=256, num_segments=7)
        params = load_released_params(ckpt_path, cfg.model.scan_layers)
        model = MerlotReserveTVQAZeroShot.from_config(cfg)
        batches = finetune_batches(sorted(glob.glob(tvqa_fns)), cfg,
                                   "tvqa_zero_shot", batch_size,
                                   is_training=False, repeat=False,
                                   return_ids=True)
        metrics, _ = zero_shot_qa_eval(model, params, batches, "tvqa",
                                       temperature=temperature, mesh=mesh)
        table["tasks"]["tvqa"] = metrics
        print(f"tvqa: {json.dumps(metrics)}", flush=True)

    if vcr_fns:
        cfg = mr.load_config(model_name, **overrides)
        cfg = cfg.replace_data(lang_seq_len=144)
        params = load_released_params(ckpt_path, cfg.model.scan_layers)
        model = MerlotReserveVCRZeroShot.from_config(cfg)
        batches = finetune_batches(sorted(glob.glob(vcr_fns)), cfg,
                                   "vcr_zero_shot", batch_size,
                                   is_training=False, repeat=False,
                                   return_ids=True)
        metrics, _ = zero_shot_qa_eval(model, params, batches, "vcr",
                                       temperature=temperature, mesh=mesh)
        table["tasks"]["vcr"] = metrics
        print(f"vcr: {json.dumps(metrics)}", flush=True)

    return table


def check_expected(table, expected, tolerance: float):
    """expected: {'tvqa_joint': 0.42, 'vcr_qa': ...} — '<task>_<metric>'
    keys matched against the eval outputs. Returns (ok, rows)."""
    rows = []
    ok = True
    flat = {}
    for task, metrics in table["tasks"].items():
        for k, v in metrics.items():
            flat[f"{task}_{k}"] = v
    for k, want in expected.items():
        got = flat.get(k)
        within = got is not None and abs(got - want) <= tolerance
        ok &= within
        rows.append({"metric": k, "expected": want, "got": got,
                     "within_tolerance": bool(within)})
    return ok, rows


def main():
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("model", choices=["base", "large"])
    ap.add_argument("-grid", default="12,20", help="H,W; resadapt grids "
                    "select the *_resadapt released file")
    ap.add_argument("--source", default="gs://merlotreserve/ckpts",
                    help="gs://bucket/prefix to download from, or a local "
                         "dir/file (dry runs, pre-downloaded ckpts)")
    ap.add_argument("--cache_dir", default=os.path.join(
        os.path.expanduser("~"), ".cache", "merlotreserve"))
    ap.add_argument("--tvqa_fns", default=None)
    ap.add_argument("--vcr_fns", default=None)
    ap.add_argument("-batch_size", type=int, default=8)
    ap.add_argument("-temperature", type=float, default=100.0)
    ap.add_argument("--expected", nargs="*", default=[],
                    help="k=v acceptance pairs, e.g. tvqa_joint=0.42")
    ap.add_argument("--tolerance", type=float, default=0.01)
    ap.add_argument("-out", default="")
    args = ap.parse_args()

    grid = tuple(int(x) for x in args.grid.split(","))
    if grid not in VALID_GRIDS:
        raise SystemExit(f"grid {grid} not in {VALID_GRIDS}")
    if not (args.tvqa_fns or args.vcr_fns):
        raise SystemExit("give --tvqa_fns and/or --vcr_fns")
    expected = {}
    for kv in args.expected:
        if "=" not in kv:
            raise SystemExit(f"--expected wants k=v, got {kv!r}")
        k, v = kv.split("=", 1)
        expected[k] = float(v)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.jax_cache"))

    table = run_gate(args.model, grid, args.source, args.cache_dir,
                     tvqa_fns=args.tvqa_fns, vcr_fns=args.vcr_fns,
                     batch_size=args.batch_size,
                     temperature=args.temperature)
    if expected:
        ok, rows = check_expected(table, expected, args.tolerance)
        table["parity"] = rows
        table["pass"] = ok
    print(json.dumps(table))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(table, f, indent=2)
    if expected and not table["pass"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
