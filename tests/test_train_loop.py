"""Training loop: multi-step run, checkpoint write + resume, validate-style
megabatch loss — all on the CPU mesh with synthetic data."""

import os

import numpy as np
import pytest

import merlot_reserve_tpu as mr
from merlot_reserve_tpu.data.dummy import make_dummy_batch


@pytest.fixture(scope="module")
def cfg():
    c = mr.load_config("base", hidden_size=64, joint_num_layers=2, vit_num_layers=2,
                       audio_num_layers=2, span_num_layers=2, size_per_head=32,
                       output_grid=(4, 4), use_bfloat16=False)
    c = c.replace_data(num_segments=4, num_segment_groups=2, seq_len=80,
                       lang_seq_len=40, num_text_spans_to_include=8)
    import dataclasses

    return dataclasses.replace(
        c, optimizer=dataclasses.replace(c.optimizer, num_train_steps=100,
                                         num_warmup_steps=10))


def _batches(cfg, n, batch_size=2):
    for i in range(n):
        yield make_dummy_batch(cfg, batch_size=batch_size, seed=i, num_text_spans=16)


def test_train_checkpoint_resume(cfg, tmp_path):
    import jax

    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.training.pretrain import run_pretraining

    out = str(tmp_path / "ckpts")
    os.makedirs(out)
    mesh = make_mesh(dp=2, tp=1, devices=jax.devices("cpu")[:2])

    logged = []
    state = run_pretraining(cfg, _batches(cfg, 3), num_steps=3, output_dir=out,
                            mesh=mesh, log_every=1,
                            log_fn=lambda s, m: logged.append((s, m)))
    assert int(jax.device_get(state.step)) == 3
    assert any(f.startswith("ckpt_") for f in os.listdir(out))
    assert logged and all(np.isfinite(v) for _, m in logged
                          for k, v in m.items())

    # resume: picks up at step 3, runs to 5
    state2 = run_pretraining(cfg, _batches(cfg, 5), num_steps=5, output_dir=out,
                             mesh=mesh, log_every=1)
    assert int(jax.device_get(state2.step)) == 5


def test_loader_position_checkpointed_with_training(tmp_path):
    """run_pretraining persists the loader position next to each checkpoint
    and restores it on resume — model step AND data position survive
    restarts together.

    Runs in a SUBPROCESS: this scenario (two full training runs over real
    loader threads) right before another in-process XLA CPU compile
    reliably segfaulted the compiler late in the full suite; isolation
    keeps the suite deterministic.
    """
    import json
    import subprocess
    import sys

    out = str(tmp_path / "ckpts_loader")
    os.makedirs(out)
    corpus = str(tmp_path / "c.tfrecord")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    script = f"""
import os, sys, json
sys.path.insert(0, {repr(repo_root)})
import jax
jax.config.update("jax_platforms", "cpu")
import merlot_reserve_tpu as mr
from merlot_reserve_tpu.data.loader import PretrainLoader
from merlot_reserve_tpu.data.synthetic import write_synthetic_corpus
from merlot_reserve_tpu.parallel import make_mesh
from merlot_reserve_tpu.training.pretrain import run_pretraining
import dataclasses

cfg = mr.load_config("base", hidden_size=64, joint_num_layers=2, vit_num_layers=2,
                     audio_num_layers=2, span_num_layers=2, size_per_head=32,
                     output_grid=(4, 4), use_bfloat16=False)
cfg = cfg.replace_data(num_segments=8, num_segment_groups=2, seq_len=168,
                       lang_seq_len=48, text_span_budget=10,
                       num_text_spans_to_include=8)
cfg = dataclasses.replace(cfg, optimizer=dataclasses.replace(
    cfg.optimizer, num_train_steps=100, num_warmup_steps=10))

corpus, out = {repr(corpus)}, {repr(out)}
write_synthetic_corpus(corpus, cfg, num_records=6, seed=0)
mesh = make_mesh(dp=1, tp=1, devices=jax.devices("cpu")[:1])

loader = PretrainLoader([corpus], cfg, batch_size=2, seed=3, num_workers=1,
                        repeat=True)
run_pretraining(cfg, loader, num_steps=3, output_dir=out, mesh=mesh, log_every=1)
sidecar = os.path.join(out, "loader_state.json")
assert json.load(open(sidecar))["records_consumed"] == 6  # 3 batches x 2

loader2 = PretrainLoader([corpus], cfg, batch_size=2, seed=3, num_workers=1,
                         repeat=True)
state = run_pretraining(cfg, loader2, num_steps=5, output_dir=out, mesh=mesh,
                        log_every=1)
assert int(jax.device_get(state.step)) == 5
# FINAL_CONSUMED == 10 proves the sidecar resume: a non-resumed loader
# would have consumed only 4 records in the 2 remaining steps
print("FINAL_CONSUMED", json.load(open(sidecar))["records_consumed"])
"""
    proc = subprocess.run([sys.executable, "-c", script], capture_output=True,
                          text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    final = int([l for l in proc.stdout.splitlines()
                 if l.startswith("FINAL_CONSUMED")][0].split()[1])
    assert final == 10
    sidecar = os.path.join(out, "loader_state.json")
    assert json.load(open(sidecar))["records_consumed"] == 10


def test_preemption_checkpoints_and_exits(cfg, tmp_path):
    """SIGTERM mid-run: finish the in-flight step, write a checkpoint, and
    return — a restart resumes from the preempted step with zero lost work.

    The SIGTERM phase runs in a SUBPROCESS: delivering signals to the shared
    pytest process is fragile mid-suite (a signal landing inside an XLA
    compile segfaulted the CPU backend when this ran late in the full run).
    """
    import subprocess
    import sys

    import jax

    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.training.pretrain import run_pretraining

    out = str(tmp_path / "ckpts_preempt")
    os.makedirs(out)

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = f"""
import os, signal, sys
sys.path.insert(0, {repr(repo_root)})
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "")
import jax
jax.config.update("jax_platforms", "cpu")
import merlot_reserve_tpu as mr
from merlot_reserve_tpu.data.dummy import make_dummy_batch
from merlot_reserve_tpu.parallel import make_mesh
from merlot_reserve_tpu.training.pretrain import run_pretraining
import dataclasses

cfg = mr.load_config("base", hidden_size=64, joint_num_layers=2, vit_num_layers=2,
                     audio_num_layers=2, span_num_layers=2, size_per_head=32,
                     output_grid=(4, 4), use_bfloat16=False)
cfg = cfg.replace_data(num_segments=4, num_segment_groups=2, seq_len=80,
                       lang_seq_len=40, num_text_spans_to_include=8)
cfg = dataclasses.replace(cfg, optimizer=dataclasses.replace(
    cfg.optimizer, num_train_steps=100, num_warmup_steps=10))

def batches():
    for i in range(50):
        if i == 2:  # "preemption notice" arrives while fetching batch 3
            os.kill(os.getpid(), signal.SIGTERM)
        yield make_dummy_batch(cfg, batch_size=2, seed=i, num_text_spans=16)

mesh = make_mesh(dp=1, tp=1, devices=jax.devices("cpu")[:1])
state = run_pretraining(cfg, batches(), num_steps=50, output_dir={repr(out)},
                        mesh=mesh, log_every=1, save_every=1000)
print("STOPPED_AT", int(jax.device_get(state.step)))
"""
    proc = subprocess.run([sys.executable, "-c", script], capture_output=True,
                          text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    stopped_at = int([l for l in proc.stdout.splitlines()
                      if l.startswith("STOPPED_AT")][0].split()[1])
    assert stopped_at < 50, "SIGTERM should have stopped the run early"
    assert any(f.startswith("ckpt_") for f in os.listdir(out))

    # resume in-process from the preempted checkpoint
    mesh = make_mesh(dp=1, tp=1, devices=jax.devices("cpu")[:1])
    state2 = run_pretraining(cfg, _batches(cfg, 10), output_dir=out,
                             num_steps=stopped_at + 2, mesh=mesh, log_every=1)
    assert int(jax.device_get(state2.step)) == stopped_at + 2


def test_loss_decreases_on_repeated_batch(cfg):
    """Overfitting sanity: repeating one batch must reduce the loss."""
    import dataclasses

    import jax

    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.training.pretrain import run_pretraining

    cfg2 = dataclasses.replace(
        cfg, optimizer=dataclasses.replace(cfg.optimizer, learning_rate=1e-3,
                                           num_train_steps=12,
                                           num_warmup_steps=1))
    batch = make_dummy_batch(cfg2, batch_size=2, seed=0, num_text_spans=16)
    mesh = make_mesh(dp=2, tp=1, devices=jax.devices("cpu")[:2])

    logged = []
    run_pretraining(cfg2, iter([batch] * 12), num_steps=12, mesh=mesh,
                    log_every=1, log_fn=lambda s, m: logged.append((s, m)))
    losses = [sum(v for k, v in m.items() if not k.startswith("_"))
              for _, m in logged]
    assert losses[-1] < losses[0], losses


def test_evaluate_loss(cfg):
    import jax

    from merlot_reserve_tpu.models import MerlotReservePretrainer
    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.training.optimization import construct_train_state
    from merlot_reserve_tpu.training.pretrain import evaluate_loss

    model = MerlotReservePretrainer.from_config(cfg)
    batch = make_dummy_batch(cfg, batch_size=2, seed=0, num_text_spans=16)
    params = model.init_params(batch)
    state = construct_train_state(cfg.optimizer, model, params)
    mesh = make_mesh(dp=1, tp=1, devices=jax.devices("cpu")[:1])
    info = evaluate_loss(cfg, state, _batches(cfg, 2), num_batches=2, mesh=mesh)
    assert np.isfinite(info["total"])
    # megabatch denominator: more negatives than a single batch would have
    assert info["imgs_to_audio"] > 0


def test_evaluate_loss_sp_pp_mesh():
    """Regression (r2 advisor): evaluate_loss used to jit without
    activate_mesh, so exactly the seq-shard / pipeline layouts broke eval
    ('no active mesh' assert in TransformerEncoder). Must match the plain
    dp eval losses — layout never changes the math."""
    import dataclasses

    import jax

    from merlot_reserve_tpu.models import MerlotReservePretrainer
    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.training.optimization import construct_train_state
    from merlot_reserve_tpu.training.pretrain import evaluate_loss

    def _cfg(**model_overrides):
        c = mr.load_config("base", hidden_size=64, joint_num_layers=2,
                           vit_num_layers=2, audio_num_layers=2,
                           span_num_layers=2, size_per_head=32,
                           output_grid=(4, 4), use_bfloat16=False,
                           **model_overrides)
        return c.replace_data(num_segments=4, num_segment_groups=2, seq_len=80,
                              lang_seq_len=40, num_text_spans_to_include=8)

    base_cfg = _cfg()
    model = MerlotReservePretrainer.from_config(base_cfg)
    batch = make_dummy_batch(base_cfg, batch_size=2, seed=0, num_text_spans=16)
    params = model.init_params(batch)
    state = construct_train_state(base_cfg.optimizer, model, params)

    mesh_dp = make_mesh(dp=1, tp=1, devices=jax.devices("cpu")[:1])
    ref = evaluate_loss(base_cfg, state, _batches(base_cfg, 2), num_batches=2,
                        mesh=mesh_dp)

    sharded_cfg = _cfg(seq_shard_axis="sp", pipeline_axis="pp",
                       pipeline_microbatches=2)
    mesh_sppp = make_mesh(dp=1, sp=2, pp=2, devices=jax.devices("cpu")[:4])
    info = evaluate_loss(sharded_cfg, state, _batches(base_cfg, 2),
                         num_batches=2, mesh=mesh_sppp)
    for k in ref:
        assert abs(ref[k] - info[k]) < 1e-4, (k, ref[k], info[k])


import pytest  # noqa: E402

# heavy tier: full-model / multi-device / subprocess tests
pytestmark = pytest.mark.slow
