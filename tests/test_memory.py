"""HBM planner: the analytic estimator must classify every measured v5e
point from BASELINE.md correctly, and respond monotonically to its knobs."""

import merlot_reserve_tpu as mr
from merlot_reserve_tpu.parallel.memory import (
    estimate_train_hbm,
    fits_v5e,
    param_count,
)


def test_param_counts():
    base = param_count(mr.load_config("base"))
    large = param_count(mr.load_config("large"))
    assert 250e6 < base < 380e6  # ~310M incl. 25M embedding
    assert 700e6 < large < 1000e6
    assert large > 2 * base


def test_measured_v5e_points_classified():
    base, large = mr.load_config("base"), mr.load_config("large")
    assert fits_v5e(base, 1)                        # 73.7 ms/step measured
    assert not fits_v5e(base, 2)                    # 16.28G OOM
    assert not fits_v5e(base, 4)                    # 31.9G OOM
    assert fits_v5e(base, 4, remat=True)            # measured fits (r1)
    assert not fits_v5e(large, 1, remat=True)       # 18.28G OOM


def test_monotonic_knobs():
    base = mr.load_config("base")
    e = lambda **kw: estimate_train_hbm(base, **kw)["total"]
    assert e(batch_size=2) > e(batch_size=1)
    assert e(batch_size=2, remat=True) < e(batch_size=2)
    assert e(batch_size=1, zero1_dp=8) < e(batch_size=1, zero1_dp=1)
    b = estimate_train_hbm(base, 1)
    assert b["activation_bytes"] > 0 and b["state_bytes"] > 0


def test_flash_and_pp_terms():
    """Round-3 measured point: base batch-4 no-remat OOMs with XLA dense
    attention (31.9G) but runs with the flash joint kernels; the planner
    must classify both. pp shards joint params+activations."""
    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.parallel.memory import estimate_train_hbm, fits_v5e

    cfg = mr.load_config("base")
    assert not fits_v5e(cfg, 4)
    flash = estimate_train_hbm(cfg, 4, flash_joint=True)
    assert flash["total"] <= 15.75e9
    # pp=2 strictly reduces the estimate at fixed batch
    e1 = estimate_train_hbm(cfg, 2)["total"]
    e2 = estimate_train_hbm(cfg, 2, pp=2)["total"]
    assert e2 < e1
    # GSPMD seq sharding (the seq_shard_axis path) COSTS memory — measured
    # x1.5 at sp=2 on the AOT points (base 13.36 vs dp8's 8.90 GiB) — while
    # ring/ulysses sequence parallelism genuinely shards the saved
    # residuals and score rows
    e_dense = estimate_train_hbm(cfg, 4)["total"]
    assert estimate_train_hbm(cfg, 4, sp=2)["total"] > e_dense
    e_ring = estimate_train_hbm(cfg, 4, sp=2, sp_impl="ring")["total"]
    assert e_ring < e_dense
    # ring sp=2 halves probs; flash removes them entirely
    assert estimate_train_hbm(cfg, 4, sp=1, flash_joint=True)["total"] < e_ring


def test_aot_ground_truth_within_25pct():
    """Round-5 calibration contract: the planner must land within 25% of
    XLA's memory analysis on EVERY chipless-AOT pod layout recorded in
    docs/pod_readiness_results.jsonl (base + large, remat and not, with
    sp/tp/pp/dcn axes — regenerate rows with scripts/pod_readiness.py)."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "pod_readiness_results.jsonl")
    rows = [json.loads(l) for l in open(path) if l.strip()]
    assert len(rows) >= 12
    for r in rows:
        cfg = mr.load_config(r["config"])
        est = estimate_train_hbm(
            cfg, r["batch"], remat=r["remat"], zero1_dp=r["zero1_dp"],
            sp=r["sp"], tp=r["tp"], pp=r["pp"], dcn=r["dcn"])
        got = est["total"] / 2**30
        err = abs(got - r["measured_gib"]) / r["measured_gib"]
        assert err <= 0.25, (r["name"], round(got, 2), r["measured_gib"],
                             round(err, 3))


def _longvideo_cfg(segments=80):
    cfg = mr.load_config("base")
    d, m = cfg.data, cfg.model
    per_seg = (m.output_grid[0] * m.output_grid[1]) // (m.vit_pooling_ratio ** 2)
    return cfg.replace_data(
        num_segments=segments,
        seq_len=d.lang_seq_len + (segments // d.num_segment_groups) * per_seg)


def test_longvideo_regime_guard_and_safe_classifications():
    """Round 5: the long-video measurement campaign (BASELINE.md 'long-video
    recipe') showed the analytic model's tower terms do not extrapolate past
    the calibrated <=16-segment regime (XLA's tower-buffer reuse collapses
    when the scan stacks get large). The planner must (a) say so, and (b)
    still classify the measured no-tower-remat OOM points correctly — the
    direction an operator would be burned by."""
    cfg = _longvideo_cfg(80)
    line = 15.75e9

    e = estimate_train_hbm(cfg, 1, remat=False, tower_remat=False)
    assert "uncalibrated_regime" in e
    assert e["total"] > line  # measured 51.55G OOM (relay, BASELINE.md)

    e = estimate_train_hbm(cfg, 1, remat=False, tower_remat=False,
                           flash_joint=True)
    assert e["total"] > line  # measured 30.90G OOM

    e = estimate_train_hbm(cfg, 1, remat=True, tower_remat=False)
    assert e["total"] > line  # measured 22.88G OOM

    e = estimate_train_hbm(cfg, 1, remat=True, tower_remat=False,
                           flash_joint=True)
    assert e["total"] > line  # measured 21.29G OOM

    # inside the calibrated regime: no warning
    assert "uncalibrated_regime" not in estimate_train_hbm(
        mr.load_config("base"), 1)


def test_longvideo_tower_knobs_direction():
    """tower_remat and segment_sp must both REDUCE the estimate (the
    directions are what plan_memory sorts layouts by, even where the
    absolute long-video numbers defer to AOT)."""
    cfg = _longvideo_cfg(80)
    e = lambda **kw: estimate_train_hbm(cfg, 1, **kw)["total"]
    assert e(remat=True, tower_remat=True) < e(remat=True, tower_remat=False)
    assert (e(remat=True, tower_remat=True, sp=2, sp_impl="ring", segment_sp=2)
            < e(remat=True, tower_remat=True, sp=2, sp_impl="ring"))
