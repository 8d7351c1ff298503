"""Checkpointing, compatible with gs://merlotreserve/ckpts/* (flax msgpack).

Conventions mirrored from /root/reference/mreserve/checkpoint.py:29-119:
  * on save, f32 leaves compress to f16 (more mantissa than bf16);
  * on load, f16 leaves decompress to f32;
  * Adam mu is stored bf16 and nu in a cube-root bf16 encoding (see
    training/optimization.py), so a full train state is ~params x 4 bytes;
  * prefix 'ckpt_', host-0-only writes.

The reference pairs this with pmap-replicated states (grabbing replica 0).
In the pjit world states are not replicated python-side, so save/load operate
on the addressable global state directly.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax.training import checkpoints


def _treemap_cast(from_dtype, to_dtype, tree):
    def _cast(x):
        if not hasattr(x, "dtype"):
            return x
        if x.dtype == from_dtype:
            return x.astype(to_dtype)
        return x

    return jax.tree.map(_cast, tree)


def compress_state(tree):
    return _treemap_cast(jnp.float32, jnp.float16, tree)


def decompress_state(tree):
    return _treemap_cast(jnp.float16, jnp.float32, tree)


def bf16_to_f32(tree):
    return _treemap_cast(jnp.bfloat16, jnp.float32, tree)


def f32_to_bf16(tree):
    return _treemap_cast(jnp.float32, jnp.bfloat16, tree)


def save_checkpoint(state, path: str, keep: Optional[int] = None, overwrite: bool = True,
                    no_optimizer: bool = False):
    """Write a compressed checkpoint (host 0 only). ``state`` may be a
    TrainState or any pytree with a ``step`` attr/key."""
    if isinstance(state, dict):
        step = int(jax.device_get(state.get("step", 0) or 0))
    else:
        step = int(jax.device_get(getattr(state, "step", 0)))
    if keep is None:
        keep = 100_000_000

    if jax.process_count() > 1:
        # ZeRO-1 shards masters/moments across processes — device_get here
        # would throw on non-addressable shards (and gathering a full train
        # state to host 0 is exactly what pod checkpointing must avoid).
        for leaf in jax.tree_util.tree_leaves(state):
            if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
                raise ValueError(
                    "save_checkpoint (msgpack, host-0 gather) cannot write a "
                    "cross-process-sharded train state; use "
                    "save_checkpoint_orbax / orbax_manager (per-shard "
                    "parallel writes) — run_pretraining selects it "
                    "automatically on multi-process meshes.")

    if jax.process_index() != 0:
        return None

    state = jax.device_get(state)
    if no_optimizer and hasattr(state, "replace"):
        state = state.replace(opt_state=None)
    state = compress_state(state)
    return checkpoints.save_checkpoint(path, state, step=step, prefix="ckpt_",
                                       keep=keep, overwrite=overwrite)


class AsyncCheckpointer:
    """Checkpoint writes off the training critical path.

    ``save`` snapshots the state ON DEVICE (one jitted buffer copy — HBM
    bandwidth, no host round trip) and returns immediately; the
    device->host fetch, compression, serialization, and file IO all run in
    a background thread against the snapshot. The snapshot is what makes
    this donation-safe: the train loop donates the live state buffers into
    the next step, but the copies fetched by the writer are independent.
    The reference blocks training for the whole ``device_get`` + GCS write
    every 7500 steps (train.py:131-132); the earlier design here still
    blocked on the fetch, which costs minutes per save on slow
    device->host links (measured ~300 s for a base-scale train state
    through this box's TPU relay — BASELINE.md soak run).

    Costs one transient extra copy of the train state in HBM until the
    background fetch completes. If the d2d snapshot cannot be taken
    (e.g. no memory headroom), falls back to the blocking-fetch path.

    One save may be in flight at a time (a second ``save`` joins the first —
    checkpoint ordering is preserved). Call ``wait()`` before exiting."""

    def __init__(self):
        import threading

        self._threading = threading
        self._thread: Optional[Any] = None
        self._snap_fn = None

    def _snapshot(self, state):
        """Device-side copy of every array leaf; non-array leaves (ints,
        None, …) pass through outside the jit so their types are preserved
        in the written tree."""
        if self._snap_fn is None:
            self._snap_fn = jax.jit(lambda xs: [jnp.copy(x) for x in xs])
        leaves, treedef = jax.tree_util.tree_flatten(state)
        arr_idx = [i for i, l in enumerate(leaves)
                   if isinstance(l, jax.Array)]
        copied = self._snap_fn([leaves[i] for i in arr_idx])
        for i, c in zip(arr_idx, copied):
            leaves[i] = c
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def save(self, state, path: str, **kw):
        self.wait()
        try:
            to_fetch = self._snapshot(state)
        except Exception:  # no HBM headroom / non-jittable leaf: block on d2h
            for leaf in jax.tree_util.tree_leaves(state):
                if hasattr(leaf, "copy_to_host_async"):
                    leaf.copy_to_host_async()
            to_fetch = jax.device_get(state)

        def _write():
            save_checkpoint(jax.device_get(to_fetch), path, **kw)

        self._thread = self._threading.Thread(target=_write, daemon=True)
        self._thread.start()

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None


def load_checkpoint(path: str, state: Any = None, step: Optional[int] = None,
                    use_bfloat16_weights: bool = False):
    """Load a checkpoint written by this module or by the reference release
    (same msgpack layout). With state=None returns a raw nested dict."""
    if state is not None:
        state = compress_state(state)
    state = checkpoints.restore_checkpoint(ckpt_dir=path, target=state, step=step,
                                           prefix="ckpt_", parallel=True)
    state = decompress_state(state)
    if use_bfloat16_weights:
        if hasattr(state, "replace"):
            state = state.replace(params=f32_to_bf16(state.params))
        elif isinstance(state, dict) and "params" in state:
            state = dict(state, params=f32_to_bf16(state["params"]))
    return state


# ---------------------------------------------------------------------------
# orbax backend (pod-scale: per-shard parallel writes, async, atomic)
# ---------------------------------------------------------------------------


def orbax_manager(path: str, keep: Optional[int] = None, async_save: bool = True):
    """A CheckpointManager for ``path``. Unlike the msgpack path (host-0
    gathers the full replica and writes one file, matching the reference's
    checkpoint.py:61-99 for gs://merlotreserve compat), orbax writes each
    host's shards in parallel, asynchronously, with atomic finalization —
    the right backend for sharded TrainStates on real pods. Close or
    ``wait_until_finished()`` before exit."""
    import orbax.checkpoint as ocp

    options = ocp.CheckpointManagerOptions(
        max_to_keep=keep, enable_async_checkpointing=async_save)
    return ocp.CheckpointManager(path, options=options)


def save_checkpoint_orbax(state, path: str, keep: Optional[int] = None,
                          wait: bool = False):
    """One-shot orbax save of a (possibly sharded) train state."""
    import orbax.checkpoint as ocp

    step = int(jax.device_get(getattr(state, "step", 0)))
    with orbax_manager(path, keep=keep) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            mgr.wait_until_finished()
    return step


def load_checkpoint_orbax(path: str, state: Any, step: Optional[int] = None):
    """Restore into ``state``'s structure/shardings (pass the freshly built,
    device-placed TrainState — orbax restores each shard onto its device)."""
    import orbax.checkpoint as ocp

    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state)
    with orbax_manager(path) as mgr:
        if step is None:
            step = mgr.latest_step()
        return mgr.restore(step, args=ocp.args.StandardRestore(abstract))


_LAYER_RE = __import__("re").compile(r"^layer_(\d+)$")


def stack_layer_params(tree):
    """Convert per-layer 'layer_NN' subtrees (the reference checkpoint layout,
    modeling.py:365) into a stacked 'layers' subtree ([num_layers, ...] leaves)
    for scan_layers=True models. Recurses over the whole tree."""
    import numpy as _np

    if not isinstance(tree, dict):
        return tree
    layer_keys = sorted((k for k in tree if _LAYER_RE.match(k)),
                        key=lambda k: int(_LAYER_RE.match(k).group(1)))
    out = {k: stack_layer_params(v) for k, v in tree.items()
           if not _LAYER_RE.match(k)}
    if layer_keys:
        subtrees = [tree[k] for k in layer_keys]
        out["layers"] = jax.tree.map(lambda *leaves: jnp.stack(leaves, 0), *subtrees)
    return out


def unstack_layer_params(tree):
    """Inverse of stack_layer_params: 'layers' ([L, ...]) -> 'layer_NN'."""
    if not isinstance(tree, dict):
        return tree
    out = {}
    for k, v in tree.items():
        if k == "layers" and isinstance(v, dict):
            num_layers = jax.tree_util.tree_leaves(v)[0].shape[0]
            for i in range(num_layers):
                out[f"layer_{i:02d}"] = jax.tree.map(lambda x: x[i], v)
        else:
            out[k] = unstack_layer_params(v)
    return out


def param_overview(params) -> str:
    """Human-readable table of the param tree (name, shape, size, dtype)."""
    lines = []
    total = 0
    flat = _flatten("", params)
    for name, leaf in flat:
        size = int(getattr(leaf, "size", 0))
        total += size
        lines.append(f"{name:<80s} {str(getattr(leaf, 'shape', ())):>20s} "
                     f"{size:>12,d} {str(getattr(leaf, 'dtype', '?')):>10s}")
    lines.append(f"TOTAL: {total:,d} params")
    return "\n".join(lines)


def _flatten(prefix, tree):
    if isinstance(tree, dict):
        out = []
        for k in sorted(tree.keys()):
            out.extend(_flatten(f"{prefix}/{k}" if prefix else str(k), tree[k]))
        return out
    return [(prefix, tree)]
