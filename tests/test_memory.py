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
    # sp shards joint activations AND score rows; reduces, less than flash
    e_sp = estimate_train_hbm(cfg, 4, sp=2)["total"]
    assert e_sp < estimate_train_hbm(cfg, 4)["total"]
    # sp=2 halves probs, flash removes them entirely at equal act sharing
    assert estimate_train_hbm(cfg, 4, sp=1, flash_joint=True)["total"] < \
        estimate_train_hbm(cfg, 4, sp=2)["total"]
