"""Utility subsystems: TPU-VM orchestration (dry-run), profiling meters,
checkpoint converters on a full model tree."""

import json
import os

import numpy as np

from merlot_reserve_tpu.utils.profiling import ThroughputMeter, log_jsonl
from merlot_reserve_tpu.utils.tpu_run import TPUCreator


def test_tpu_creator_dry_run():
    tpu = TPUCreator(name="test-pod", zone="us-east1-d",
                     accelerator_type="v5litepod-16", dry_run=True)
    tpu.create()
    assert tpu.wait_until_ready()
    tpu.push_code("/root/repo")
    tpu.install_dependencies()
    tpu.launch_training("configs/base.yaml", extra_args="-train_fns 'x*'")
    tpu.delete()
    cmds = tpu.issued_commands
    assert any("create" in c and "v5litepod-16" in c for c in cmds)
    assert any("scp" in c and "--worker=all" in c for c in cmds)
    # provisioning (tpu_startup_script.sh equivalent) runs on all workers
    assert any("jax[tpu]" in c and "--worker=all" in c for c in cmds)
    assert any("TCMALLOC_LARGE_ALLOC_REPORT_THRESHOLD" in c for c in cmds)
    assert any("scripts/pretrain.py" in c for c in cmds)
    assert any("delete" in c for c in cmds)


def test_throughput_meter():
    m = ThroughputMeter(window=3, batch_size=8)
    assert m.step() is None
    assert m.step() is None
    out = m.step()
    assert out is not None and out["it_per_sec"] > 0
    assert out["examples_per_sec"] == out["it_per_sec"] * 8


def test_log_jsonl(tmp_path):
    p = os.path.join(tmp_path, "m.jsonl")
    log_jsonl(p, {"step": 1, "loss": 2.5})
    log_jsonl(p, {"step": 2, "loss": 2.0})
    lines = [json.loads(l) for l in open(p)]
    assert lines[1]["loss"] == 2.0


def test_checkpoint_save_load_roundtrip(tmp_path):
    import jax.numpy as jnp
    from flax.training import train_state
    import optax

    from merlot_reserve_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
              "b": jnp.ones(3, jnp.float32)}
    state = train_state.TrainState.create(
        apply_fn=lambda *a: None, params=params, tx=optax.sgd(0.1))
    out = str(tmp_path / "ck")
    os.makedirs(out)
    save_checkpoint(state, out)
    files = os.listdir(out)
    assert any(f.startswith("ckpt_") for f in files)

    restored = load_checkpoint(out, state=state)
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(params["w"]))
    # f16 compression round trip preserves f32 dtype on load
    assert restored.params["w"].dtype == np.float32


def test_orbax_backend_roundtrip_sharded(tmp_path):
    """Orbax backend: save a ZeRO-1-sharded train state from a dp=2 mesh and
    restore it into fresh device-placed buffers (the pod-scale path — each
    shard written/read in place, no host-0 full gather)."""
    import jax
    import jax.numpy as jnp
    import optax
    from flax.training import train_state

    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.parallel.sharding import state_shardings
    from merlot_reserve_tpu.utils.checkpoint import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    mesh = make_mesh(dp=2, devices=jax.devices("cpu")[:2])
    params = {"w": jnp.arange(12, dtype=jnp.float32).reshape(4, 3)}
    state = train_state.TrainState.create(
        apply_fn=lambda *a: None, params=params, tx=optax.adam(1e-3))
    state = jax.device_put(state, state_shardings(mesh, state, zero1=True))

    out = str(tmp_path / "orbax_ck")
    save_checkpoint_orbax(state, out, wait=True)

    fresh = train_state.TrainState.create(
        apply_fn=lambda *a: None,
        params={"w": jnp.zeros((4, 3), jnp.float32)}, tx=optax.adam(1e-3))
    fresh = jax.device_put(fresh, state_shardings(mesh, fresh, zero1=True))
    restored = load_checkpoint_orbax(out, fresh)
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(params["w"]))
    # moments restored too (zeros at step 0 but structure/placement intact)
    assert jax.tree_util.tree_structure(restored.opt_state) == \
        jax.tree_util.tree_structure(fresh.opt_state)


def test_async_checkpointer_matches_sync(tmp_path):
    """Async save (background serialization) must produce the same loadable
    checkpoint, and be donation-safe: mutating the live state after save()
    returns must not corrupt the written snapshot."""
    import jax
    import jax.numpy as jnp
    import optax
    from flax.training import train_state

    from merlot_reserve_tpu.utils.checkpoint import (
        AsyncCheckpointer,
        load_checkpoint,
    )

    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)}
    state = train_state.TrainState.create(
        apply_fn=lambda *a: None, params=params, tx=optax.sgd(0.1))
    out = str(tmp_path / "ck_async")
    os.makedirs(out)

    ck = AsyncCheckpointer()
    original_leaves = jax.tree_util.tree_leaves(state)
    ck.save(state, out)
    # the train loop donates the state buffers into the next step the moment
    # save() returns: simulate with real buffer deletion — the snapshot the
    # writer fetches must be independent of the live buffers
    for leaf in original_leaves:
        if isinstance(leaf, jax.Array):
            leaf.delete()
    state = state.replace(params={"w": jnp.zeros((2, 3), jnp.float32)})
    jax.block_until_ready(state.params["w"])
    ck.wait()

    restored = load_checkpoint(out)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]),
        np.arange(6, dtype=np.float32).reshape(2, 3))


def _write_fake_trace(log_dir):
    """Minimal Chrome-trace dump in jax.profiler's on-disk layout."""
    import gzip

    run = os.path.join(log_dir, "plugins", "profile", "2026_08_17")
    os.makedirs(run)
    events = [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0 (pf)"}},
        {"ph": "M", "pid": 2, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 1, "tid": 7, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "X", "pid": 1, "tid": 7, "name": "fusion.1",
         "ts": 100.0, "dur": 300.0},
        {"ph": "X", "pid": 1, "tid": 7, "name": "fusion.1",
         "ts": 500.0, "dur": 100.0},
        {"ph": "X", "pid": 1, "tid": 7, "name": "copy.2",
         "ts": 650.0, "dur": 50.0},
        {"ph": "X", "pid": 2, "tid": 1, "name": "host_thing",
         "ts": 0.0, "dur": 1000.0},
    ]
    with gzip.open(os.path.join(run, "host.trace.json.gz"), "wt") as f:
        json.dump({"traceEvents": events}, f)


def test_trace_op_table_and_wall(tmp_path):
    from merlot_reserve_tpu.utils.profiling import (load_trace_events,
                                                    op_time_table,
                                                    trace_wall_ms)

    _write_fake_trace(str(tmp_path))
    events = load_trace_events(str(tmp_path))
    assert len(events) == 4  # X events only
    table = op_time_table(events, lane_filter="tpu")
    assert [r["name"] for r in table] == ["fusion.1", "copy.2"]
    assert table[0]["count"] == 2
    np.testing.assert_allclose(table[0]["total_ms"], 0.4)
    np.testing.assert_allclose(table[0]["pct"] + table[1]["pct"], 100.0)
    # device lane spans ts 100 -> 700
    np.testing.assert_allclose(trace_wall_ms(events, "tpu"), 0.6)
    # unfiltered includes the host lane
    assert len(op_time_table(events, top=None)) == 3


def test_trace_live_roundtrip(tmp_path):
    """trace() -> real jax.profiler dump -> parses into events."""
    import jax
    import jax.numpy as jnp

    from merlot_reserve_tpu.utils.profiling import (find_trace_files,
                                                    load_trace_events,
                                                    op_time_table, trace)

    @jax.jit
    def f(x):
        return (x @ x).sum()

    x = jnp.ones((128, 128))
    float(f(x))  # compile outside the trace
    with trace(str(tmp_path)):
        float(f(x))
    assert find_trace_files(str(tmp_path))
    events = load_trace_events(str(tmp_path))
    assert events, "no complete events in live trace"
    assert op_time_table(events, top=5)


def test_metrics_queue_delay_semantics():
    """A metric materializes exactly `delay` pushes after its own; delay=0
    is synchronous."""
    import jax.numpy as jnp

    from merlot_reserve_tpu.training.trainer import MetricsQueue

    q0 = MetricsQueue(delay=0)
    got = q0.push(0, {"loss": jnp.float32(1.5)})
    assert got is not None and got[0] == 0 and got[1]["loss"] == 1.5

    q2 = MetricsQueue(delay=2)
    assert q2.push(0, {"loss": jnp.float32(0.0)}) is None
    assert q2.push(1, {"loss": jnp.float32(1.0)}) is None
    step, m = q2.push(2, {"loss": jnp.float32(2.0)})
    assert step == 0 and m["loss"] == 0.0
    assert sorted(s for s, _ in q2.drain()) == [1, 2]


def test_tpu_push_code_removes_stale_tree_first():
    """scp --recurse copies INTO an existing dir (second push would nest and
    relaunches would run stale code) — push_code must rm -rf first, and the
    TCMALLOC bashrc entry must be parenthesized so its || can't mask a
    failed jax install."""
    tpu = TPUCreator(name="test-pod", zone="us-east1-d",
                     accelerator_type="v5litepod-16", dry_run=True)
    tpu.push_code("/root/repo")
    cmds = tpu.issued_commands
    rm_idx = next(i for i, c in enumerate(cmds) if "rm -rf" in c)
    scp_idx = next(i for i, c in enumerate(cmds) if "scp" in c)
    assert rm_idx < scp_idx
    deps = " && ".join(TPUCreator.STARTUP_DEPS)
    assert "&& (grep -q TCMALLOC" in deps and deps.endswith(")")
