"""Refit parallel/memory.py's overhead coefficients against ground truth.

Two calibration corpora constrain the planner:
  1. docs/pod_readiness_results.jsonl — XLA memory-analysis numbers from
     chipless-AOT compiles of the FULL production train step at real TPU
     topologies (scripts/pod_readiness.py). Target: every row within 25%
     (pinned by tests/test_memory.py::test_aot_ground_truth_within_25pct).
  2. The six measured single-chip v5e OOM/fit points (BASELINE.md) — the
     predicted total must classify each correctly against the 15.75e9-byte
     usable-HBM line.

Run after adding pod_readiness rows; it sweeps the module coefficients and
prints the best assignment + the per-row error table. Apply the winning
values to the _C_* / _*_TENSORS constants at the top of
merlot_reserve_tpu/parallel/memory.py by hand (they are deliberately plain
literals there so the planner has no runtime dependence on this script).
"""

import itertools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import merlot_reserve_tpu as mr
from merlot_reserve_tpu.parallel import memory

HBM_LINE = 15.75e9  # bytes usable on a 16G v5e (CLAUDE.md / BASELINE.md)


def load_rows():
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "pod_readiness_results.jsonl")
    return [json.loads(l) for l in open(path) if l.strip()]


def singlechip_points():
    cfgb, cfgl = mr.load_config("base"), mr.load_config("large")
    # (name, cfg, batch, kwargs, fits?)
    return [
        ("base b1 scan", cfgb, 1, {}, True),
        ("base b2 scan OOM 16.28G", cfgb, 2, {}, False),
        ("base b4 OOM 31.9G", cfgb, 4, {}, False),
        ("base b4 remat", cfgb, 4, dict(remat=True), True),
        ("large b1 remat OOM 18.28G", cfgl, 1, dict(remat=True), False),
        ("base b4 flash", cfgb, 4, dict(flash_joint=True), True),
    ]


def evaluate(rows, points, verbose=False):
    """Return (max AOT relative error, #misclassified single-chip points)."""
    worst = 0.0
    for r in rows:
        cfg = mr.load_config(r["config"])
        est = memory.estimate_train_hbm(
            cfg, r["batch"], remat=r["remat"], zero1_dp=r["zero1_dp"],
            sp=r["sp"], tp=r["tp"], pp=r["pp"], dcn=r["dcn"])
        got = est["total"] / 2**30
        err = (got - r["measured_gib"]) / r["measured_gib"]
        worst = max(worst, abs(err))
        if verbose:
            print(f"  {r['name']:45s} pred={got:6.2f} "
                  f"meas={r['measured_gib']:6.2f} err={err:+.3f}")
    bad = 0
    for name, cfg, bs, kw, fits in points:
        tot = memory.estimate_train_hbm(cfg, bs, **kw)["total"]
        ok = (tot <= HBM_LINE) == fits
        bad += not ok
        if verbose:
            print(f"  {name:28s} pred={tot/1e9:6.2f}e9B "
                  f"fits={tot <= HBM_LINE} expected={fits} "
                  f"{'OK' if ok else 'WRONG'}")
    return worst, bad


def main():
    rows, points = load_rows(), singlechip_points()
    print("current coefficients:")
    worst, bad = evaluate(rows, points, verbose=True)
    print(f"current: max AOT err {worst:.3f}, misclassified {bad}\n")

    grid = dict(
        _C_STATE=[1.3, 1.4, 1.5],
        _C_ACT=[0.7, 0.8],
        _REMAT_TENSORS=[14.5, 16.0, 17.5, 19.0, 20.5],
        _GSPMD_SP_PENALTY=[1.35, 1.4, 1.45],
        _PP_STREAM_TENSORS=[18.0, 24.0, 30.0, 36.0],
    )
    names = list(grid)
    best = None
    for combo in itertools.product(*(grid[n] for n in names)):
        for n, v in zip(names, combo):
            setattr(memory, n, v)
        worst, bad = evaluate(rows, points)
        if bad == 0 and (best is None or worst < best[0]):
            best = (worst, dict(zip(names, combo)))
    if best is None:
        print("no assignment classifies all single-chip points — widen grid")
        return
    print(f"best: max AOT err {best[0]:.3f} with {best[1]}")
    for n, v in best[1].items():
        setattr(memory, n, v)
    evaluate(rows, points, verbose=True)


if __name__ == "__main__":
    main()
