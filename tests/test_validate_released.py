"""Dry run of the WHOLE released-checkpoint validation gate
(scripts/validate_released.py) against a local fake gs:// layout: resolve
(model, grid) -> released file name, fetch from the layout, f16-decompress
+ restack, run batched zero-shot TVQA and VCR, emit the parity table and
apply the acceptance check. Only the network fetch itself is unexercised
in-env (VERDICT r3 item 4).
"""

import os
import sys

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # two zero-shot model compiles

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

import merlot_reserve_tpu as mr
from merlot_reserve_tpu.data.synthetic import write_synthetic_finetune_corpus
from merlot_reserve_tpu.models import MerlotReservePretrainer
from merlot_reserve_tpu.utils.checkpoint import (save_checkpoint,
                                                 unstack_layer_params)

TINY = dict(hidden_size=64, joint_num_layers=2, vit_num_layers=2,
            audio_num_layers=2, span_num_layers=2, size_per_head=32,
            output_grid=(4, 4), use_bfloat16=False)


@pytest.fixture(scope="module")
def fake_bucket(tmp_path_factory):
    """A local dir shaped like gs://merlotreserve/ckpts: one file per
    released name, flax-msgpack, f16-compressed, params-only, layer_NN
    layout (what the reference's save_checkpoint publishes)."""
    import flax.training.train_state as ts
    import optax

    cfg = mr.load_config("base", **TINY)
    cfg = cfg.replace_data(num_segments=4, seq_len=80, lang_seq_len=40,
                           num_text_spans_to_include=8)
    from merlot_reserve_tpu.data.dummy import make_dummy_batch

    pre = MerlotReservePretrainer.from_config(cfg)
    batch = make_dummy_batch(cfg, batch_size=1, seed=0, num_text_spans=8)
    params = pre.init_params(batch)
    # released layout: per-layer trees, not the scan stack
    params = unstack_layer_params(params)

    d = tmp_path_factory.mktemp("fake_bucket")
    state = ts.TrainState.create(apply_fn=None, params=params,
                                 tx=optax.identity())
    save_checkpoint(state, os.path.join(str(d), "ckpt_staging"),
                    no_optimizer=True)
    staged = [f for f in os.listdir(os.path.join(str(d), "ckpt_staging"))
              if f.startswith("ckpt_")]
    assert staged, "save_checkpoint wrote nothing"
    os.rename(os.path.join(str(d), "ckpt_staging", staged[0]),
              os.path.join(str(d), "base"))
    return str(d)


@pytest.fixture(scope="module")
def val_shards(tmp_path_factory):
    cfg = mr.load_config("base", **TINY)
    d = tmp_path_factory.mktemp("val")
    tvqa = os.path.join(str(d), "tvqa_val.tfrecord")
    vcr = os.path.join(str(d), "vcr_val.tfrecord")
    write_synthetic_finetune_corpus(
        tvqa, cfg.replace_data(lang_seq_len=64, num_segments=7), "tvqa",
        num_records=4, seed=0)
    write_synthetic_finetune_corpus(
        vcr, cfg.replace_data(lang_seq_len=48), "vcr", num_records=4, seed=1)
    return tvqa, vcr


def test_fetch_resolution(fake_bucket):
    import validate_released as VR

    p = VR.fetch_checkpoint("base", (12, 20), fake_bucket, "/tmp/unused")
    assert p == os.path.join(fake_bucket, "base")
    with pytest.raises(FileNotFoundError):
        VR.fetch_checkpoint("large", (18, 32), fake_bucket, "/tmp/unused")
    # resadapt grids resolve to the *_resadapt released names
    assert VR.PARAM_FN[("large", (24, 24))] == "large_resadapt"


def test_gate_dry_run_end_to_end(fake_bucket, val_shards):
    import validate_released as VR

    tvqa, vcr = val_shards
    table = VR.run_gate(
        "base", (12, 20), fake_bucket, "/tmp/unused",
        tvqa_fns=tvqa, vcr_fns=vcr, batch_size=2,
        model_overrides=dict(TINY))
    assert set(table["tasks"]) == {"tvqa", "vcr"}
    for task, metrics in table["tasks"].items():
        assert metrics and metrics["n"] == 4, task
        for k, v in metrics.items():
            if k != "n":
                assert np.isfinite(v) and 0.0 <= v <= 1.0, (task, k, v)

    # acceptance check plumbing: a trivially-met and an impossible bound
    some_key = next(iter(
        f"tvqa_{k}" for k in table["tasks"]["tvqa"]))
    got = table["tasks"]["tvqa"][some_key[len("tvqa_"):]]
    ok, rows = VR.check_expected(table, {some_key: got}, tolerance=0.01)
    assert ok and rows[0]["within_tolerance"]
    ok, rows = VR.check_expected(table, {some_key: got + 0.5},
                                 tolerance=0.01)
    assert not ok
    ok, _ = VR.check_expected(table, {"tvqa_nonexistent": 0.5}, 0.01)
    assert not ok  # unknown metric = fail loudly, not silently pass
