"""Experiment-tracker subsystem (the reference's wandb slot,
/root/reference/pretrain/train.py:74-78, as a pluggable backend)."""

import json
import os

import numpy as np
import pytest

from merlot_reserve_tpu.utils.experiment import (
    JsonlTracker, MultiTracker, NullTracker, make_tracker)


def test_jsonl_tracker_roundtrip(tmp_path):
    t = JsonlTracker(str(tmp_path / "run1"), run_name="r1")
    t.log_config({"model": {"hidden_size": 64}, "grid": (4, 4),
                  "fn": lambda: 0})  # non-serializable -> repr
    t.log(0, {"loss": 1.5})
    t.log(50, {"loss": np.float32(1.25)})
    t.finish()

    cfg = json.load(open(tmp_path / "run1" / "config.json"))
    assert cfg["model"]["hidden_size"] == 64
    assert isinstance(cfg["fn"], str)

    recs = [json.loads(l) for l in open(tmp_path / "run1" / "metrics.jsonl")]
    assert [r["step"] for r in recs] == [0, 50]
    assert recs[1]["loss"] == 1.25
    assert "steps_per_sec" in recs[1]


def test_make_tracker_specs(tmp_path):
    assert isinstance(make_tracker(None), NullTracker)
    assert isinstance(make_tracker("none"), NullTracker)
    # non-zero hosts never log (reference: wandb on host 0 only)
    assert isinstance(make_tracker(f"jsonl:{tmp_path}/x", host_index=3),
                      NullTracker)
    t = make_tracker(f"jsonl:{tmp_path}/y")
    assert isinstance(t, JsonlTracker)
    t.finish()
    with pytest.raises(ValueError):
        make_tracker("tensorboard:/nope")
    with pytest.raises(ImportError):
        make_tracker("wandb:proj")  # wandb not installed in this image


def test_multi_tracker(tmp_path):
    a = JsonlTracker(str(tmp_path / "a"))
    b = JsonlTracker(str(tmp_path / "b"))
    m = MultiTracker([a, b])
    m.log(1, {"x": 2.0})
    m.finish()
    for d in ("a", "b"):
        recs = [json.loads(l) for l in open(tmp_path / d / "metrics.jsonl")]
        assert recs[0]["x"] == 2.0


@pytest.mark.slow
def test_run_pretraining_writes_run_dir(tmp_path):
    """End-to-end: the pretraining loop produces a run dir with config +
    metrics without any tracker arg."""
    import jax

    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.data.dummy import make_dummy_batch
    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.training.pretrain import run_pretraining

    cfg = mr.load_config(
        "base", hidden_size=32, joint_num_layers=1, vit_num_layers=1,
        audio_num_layers=1, span_num_layers=1, size_per_head=32,
        output_grid=(4, 4), use_bfloat16=False)
    cfg = cfg.replace_data(num_segments=4, seq_len=80, lang_seq_len=40,
                           num_text_spans_to_include=8)

    batches = (make_dummy_batch(cfg, batch_size=1, seed=i, num_text_spans=16)
               for i in range(3))
    out = str(tmp_path / "ckpt")
    mesh = make_mesh(dp=1, devices=jax.devices("cpu")[:1])
    run_pretraining(cfg, batches, num_steps=3, output_dir=out, mesh=mesh,
                    log_every=1, save_every=100)
    run_dir = os.path.join(out, "run")
    assert os.path.exists(os.path.join(run_dir, "config.json"))
    recs = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    assert len(recs) >= 1 and "stuff_to_span" in recs[0]
