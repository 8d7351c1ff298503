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
    ck.save(state, out)
    # simulate the train loop donating/overwriting the state immediately
    state = state.replace(params={"w": jnp.zeros((2, 3), jnp.float32)})
    jax.block_until_ready(state.params["w"])
    ck.wait()

    restored = load_checkpoint(out)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]),
        np.arange(6, dtype=np.float32).reshape(2, 3))
