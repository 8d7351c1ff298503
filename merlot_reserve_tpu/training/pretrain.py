"""Pretraining driver: the /root/reference/pretrain/train.py:55-145 loop as a
library function over the pjit trainer.

Differences from the reference by design:
  * one jit over an explicit Mesh instead of pmap (multi-host via
    jax.distributed.initialize + the same global mesh);
  * checkpoint/resume through utils/checkpoint (same msgpack format);
  * async metrics via MetricsQueue (the copy_to_host_async pattern);
  * deterministic data seeding is available (seed=None reproduces the
    reference's time()-seeded restart behavior).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from merlot_reserve_tpu.config import MerlotConfig
from merlot_reserve_tpu.models.pretrainer import MerlotReservePretrainer
from merlot_reserve_tpu.parallel.mesh import make_mesh
from merlot_reserve_tpu.training.optimization import construct_train_state
from merlot_reserve_tpu.training.trainer import MetricsQueue, make_jit_train_step
from merlot_reserve_tpu.utils import checkpoint as ckpt_lib


def run_pretraining(
    cfg: MerlotConfig,
    batch_iterator: Iterable[Dict[str, np.ndarray]],
    num_steps: Optional[int] = None,
    output_dir: Optional[str] = None,
    mesh=None,
    log_every: int = 50,
    save_every: Optional[int] = None,
    log_fn: Callable[[int, Dict[str, float]], None] = None,
    zero1: bool = True,
    tracker=None,
    fused_builder=None,
    data_seed: int = 0,
):
    """Run (or resume) pretraining; returns the final TrainState.

    :param batch_iterator: yields collated global batches (data/loader.py)
    :param num_steps: overrides cfg.optimizer.num_train_steps
    :param output_dir: checkpoint directory (no checkpointing if None)
    :param tracker: utils.experiment.Tracker (the reference's wandb slot,
        train.py:74-78). Defaults to a JsonlTracker under output_dir on
        host 0; pass a tracker (or NullTracker()) to override.
    :param fused_builder: a data.device_builder.DeviceExampleBuilder —
        batch_iterator then yields RAW host arrays
        (``DevicePretrainLoader(fused=True)``) and example assembly runs
        inside the jitted train step (one dispatch per step; mask PRNG
        folded from state.step with ``data_seed``).
    """
    num_steps = num_steps or cfg.optimizer.num_train_steps
    save_every = save_every or cfg.device.iterations_per_loop
    output_dir = output_dir or (cfg.device.output_dir or None)
    mesh = mesh or make_mesh(dp=cfg.device.dp, tp=cfg.device.tp,
                             sp=cfg.device.sp, pp=cfg.device.pp,
                             dcn_dp=cfg.device.dcn_dp)

    if tracker is None:
        from merlot_reserve_tpu.utils.experiment import make_tracker

        spec = f"jsonl:{os.path.join(output_dir, 'run')}" if output_dir else None
        tracker = make_tracker(spec, host_index=jax.process_index())
    import dataclasses

    try:
        tracker.log_config(dataclasses.asdict(cfg))
    except TypeError:
        tracker.log_config({"config": repr(cfg)})

    model = MerlotReservePretrainer.from_config(cfg)

    # resumable data position: if the iterator supports it (PretrainLoader),
    # restore its position from the sidecar written with each checkpoint —
    # the restart continues the exact record sequence (the reference
    # deliberately re-seeds with time() instead, dataloader.py:922-924)
    loader_state_path = (os.path.join(output_dir, "loader_state.json")
                         if output_dir else None)
    if (loader_state_path and os.path.exists(loader_state_path)
            and hasattr(batch_iterator, "load_state_dict")):
        import json as _json

        with open(loader_state_path) as f:
            try:
                batch_iterator.load_state_dict(_json.load(f))
                print("restored loader position", flush=True)
            except ValueError as e:
                print(f"loader state ignored: {e}", flush=True)

    def _save_loader_state():
        if loader_state_path and hasattr(batch_iterator, "state_dict"):
            import json as _json

            tmp = loader_state_path + ".tmp"
            with open(tmp, "w") as f:
                _json.dump(batch_iterator.state_dict(), f)
            os.replace(tmp, loader_state_path)

    batch_iter = iter(batch_iterator)
    first_batch = next(batch_iter)
    if fused_builder is not None:
        # raw arrays -> one eager build for shape-complete param init
        # (with on_device_frames the raw dict carries frames_u8/frame_hw
        # and build_batch assembles "images" in-graph)
        raw0 = dict(first_batch)
        images0 = raw0.pop("images", None)
        b0 = dict(jax.device_get(fused_builder.build_batch(
            jax.random.PRNGKey(data_seed),
            jax.tree.map(jnp.asarray, raw0))))
        if images0 is not None:
            b0["images"] = images0
        params = model.init_params(b0)
    else:
        params = model.init_params(first_batch)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(params))
    print(f"initialized {n_params:,d} params", flush=True)
    state = construct_train_state(cfg.optimizer, model, params)

    if output_dir and os.path.isdir(output_dir):
        if jax.process_count() > 1:
            try:  # orbax layout (the multi-process writer, below)
                latest = ckpt_lib.load_checkpoint_orbax(output_dir, state)
            except Exception:
                latest = None
        else:
            latest = ckpt_lib.load_checkpoint(output_dir, state=state)
        if latest is not None:
            state = latest

    if fused_builder is not None:
        from merlot_reserve_tpu.training.trainer import \
            make_jit_fused_data_train_step

        step_fn, state = make_jit_fused_data_train_step(
            mesh, state, fused_builder, data_seed=data_seed, zero1=zero1)
    else:
        step_fn, state = make_jit_train_step(mesh, state, zero1=zero1)

    metrics_q = MetricsQueue(delay=log_every)
    # multi-process: the state is ZeRO-sharded ACROSS processes, so the
    # msgpack host-0-gather writer cannot serialize it — orbax writes each
    # process's shards in parallel instead (and restores them in place)
    use_orbax = jax.process_count() > 1
    async_ckpt = None if use_orbax else ckpt_lib.AsyncCheckpointer()

    def _save_state(st):
        if use_orbax:
            ckpt_lib.save_checkpoint_orbax(st, output_dir)
        else:
            async_ckpt.save(st, output_dir)

    start_step = int(jax.device_get(state.step))
    t_block = time.time()

    # Preemption handling (beyond the reference's crash-only design,
    # SURVEY.md §5): TPU-VM preemptions deliver SIGTERM with a grace
    # window — finish the in-flight step, checkpoint, and exit cleanly so
    # the restart loses zero work instead of up to save_every steps.
    import signal as _signal

    preempted = {"flag": False}

    def _on_term(signum, frame):
        preempted["flag"] = True
        print(f"signal {signum}: checkpointing and exiting after the "
              f"current step", flush=True)

    restore_handlers = []
    try:
        for _sig in (_signal.SIGTERM, _signal.SIGINT):
            restore_handlers.append((_sig, _signal.signal(_sig, _on_term)))
    except ValueError:
        pass  # not the main thread (tests/embedded use); flag stays usable

    # multi-host-correct feed: each host's loader yields its slice of the
    # global batch; form_global_batch assembles the dp-sharded global Array
    # (single-process it's a plain sharded device_put)
    from merlot_reserve_tpu.parallel.sharding import form_global_batch

    batch = first_batch
    for step in range(start_step, num_steps):
        batch_dev = form_global_batch(mesh, batch)
        state, metrics = step_fn(state, batch_dev)

        ready = metrics_q.push(step, metrics)
        if ready is not None:
            tracker.log(*ready)
            if log_fn is not None:
                log_fn(*ready)

        if output_dir and (step + 1) % save_every == 0:
            _save_state(state)
            _save_loader_state()
            # contrastive temperature health print (train.py:134-139)
            scales = np.asarray(jax.device_get(
                state.params["contrastive_scales"]), np.float32)
            print(f"step {step + 1} contrastive temps: "
                  f"{np.exp(scales / 2.0).round(3).tolist()}", flush=True)

        if (step + 1) % 100 == 0:
            dt = time.time() - t_block
            print(f"steps {step - 98}..{step + 1}: {dt:.1f}s "
                  f"({100 / dt:.2f} it/s)", flush=True)
            t_block = time.time()

        if preempted["flag"]:
            break

        if step + 1 < num_steps:
            try:
                batch = next(batch_iter)
            except StopIteration:
                print("input exhausted; stopping", flush=True)
                break

    for _sig, _old in restore_handlers:
        _signal.signal(_sig, _old)
    for ready in metrics_q.drain():
        if ready is not None:
            tracker.log(*ready)
            if log_fn is not None:
                log_fn(*ready)
    tracker.finish()
    if async_ckpt is not None:
        async_ckpt.wait()
    if output_dir:
        if use_orbax:
            ckpt_lib.save_checkpoint_orbax(state, output_dir)
        else:
            ckpt_lib.save_checkpoint(state, output_dir)
        _save_loader_state()
    return state


def evaluate_loss(cfg: MerlotConfig, state, batch_iterator, num_batches: int,
                  mesh=None) -> Dict[str, float]:
    """validate.py equivalent (/root/reference/pretrain/validate.py:94-158):
    accumulate forward outputs over several batches, then compute the
    contrastive loss once over the concatenated megabatch so the denominator
    matches training's global-batch semantics.

    Mesh-aware: the forward jits with batches sharded over dp and runs under
    ``activate_mesh`` (so seq_shard_axis constraints and the pipeline
    shard_map resolve — the same wrapper make_jit_train_step uses), preds
    stay on device until the single megabatch loss, and only scalars come
    back to the host."""
    from merlot_reserve_tpu.models.pretrainer import loss_fn_given_preds
    from merlot_reserve_tpu.parallel.mesh import activate_mesh
    from merlot_reserve_tpu.parallel.sharding import (batch_sharding,
                                                      form_global_batch,
                                                      param_shardings)

    mesh = mesh or make_mesh(dp=cfg.device.dp, tp=cfg.device.tp,
                             sp=cfg.device.sp, pp=cfg.device.pp,
                             dcn_dp=cfg.device.dcn_dp)
    model = MerlotReservePretrainer.from_config(cfg)

    p_shardings = param_shardings(mesh, state.params)
    fwd = jax.jit(lambda p, b: model.apply({"params": p}, b),
                  in_shardings=(p_shardings, batch_sharding(mesh)))
    loss_jit = jax.jit(loss_fn_given_preds)

    it = iter(batch_iterator)
    preds_acc = []
    with activate_mesh(mesh):
        for _ in range(num_batches):
            batch = form_global_batch(mesh, next(it))
            preds_acc.append(fwd(state.params, batch))
        preds_cat = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, 0) if xs[0].ndim > 0 else xs[0],
            *preds_acc)
        loss, info = loss_jit(preds_cat)
    info = {k: float(v) for k, v in info.items()}
    info["total"] = float(loss)
    return info
