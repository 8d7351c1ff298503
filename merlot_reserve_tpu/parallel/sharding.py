"""Sharding rules: how params, optimizer state, and batches lay out on the mesh.

Replaces two hand-rolled mechanisms in the reference:
  * per-host batch slicing + pmap replication (dataloader.py:920-930,
    train.py:104-107) -> ``batch_sharding`` (dim 0 over dp);
  * ZeRO-1 optimizer sharding via device_put_sharded + grouped all_gather
    (finetune/optimization.py:37-52,148-171) -> ``opt_state_shardings``:
    Adam mu/nu leaves get dim-0 NamedSharding over dp and GSPMD inserts the
    dynamic-slice / all-gather pair around the (sharded) update computation.

Tensor parallelism (absent in the reference) hooks in here: 2D param rules
shard the MLP/attention matmuls over tp. With tp=1 these are no-ops.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh):
    """Batches shard over the data-parallel axes on dim 0 (replicated over
    tp): ("dcn", "dp") on the 5-axis mesh, so multi-slice batches split
    slice-major and gradient reductions are the only DCN traffic."""
    from merlot_reserve_tpu.parallel.mesh import batch_axes

    return NamedSharding(mesh, P(batch_axes(mesh)))


def form_global_batch(mesh: Mesh, batch, sharding=None):
    """Assemble the global on-mesh batch from this process's local slice.

    The reference divides the global batch across hosts in tf.data and lets
    pmap consume each host's slice locally (dataloader.py:920-930,
    train.py:106). Under one jit over a global mesh the equivalent is a
    global ``jax.Array`` per leaf: each host's loader yields its
    1/num_hosts rows (data/loader.py file+batch sharding) and
    ``jax.make_array_from_process_local_data`` stitches the slices into one
    dim-0-dp-sharded array without any cross-host transfer — every chip
    receives only rows its own host read. Feeding host-local numpy straight
    into a jit with dp in_shardings works only in single-process; this is
    the multi-host-correct feed for every batch entering the mesh.

    Single-process this is exactly ``jax.device_put(batch, batch_sharding)``.
    Leaves whose dim 0 is not the (local) batch dim follow the same sharding
    rule as the jit expects, so no resharding happens at dispatch.
    """
    sharding = sharding or batch_sharding(mesh)

    def _one(v):
        if jax.process_count() == 1:
            if isinstance(v, jax.Array):  # device-builder output: already on mesh
                return v if v.sharding == sharding else jax.device_put(v, sharding)
            return jax.device_put(np.asarray(v), sharding)
        if isinstance(v, jax.Array):
            # device-builder output on a pod: assemble the global array from
            # per-device slices WITHOUT a device->host->device round trip
            # (np.asarray here would pull the just-built batch back to host
            # every step — the exact cost the on-device builder removes)
            return _global_from_local_device_array(v, sharding)
        return jax.make_array_from_process_local_data(sharding, np.asarray(v))

    return jax.tree.map(_one, batch)


def _global_from_local_device_array(v, sharding):
    """Multi-process: turn this process's local device array (its slice of
    the global batch, dim 0) into a global jax.Array under ``sharding``,
    staying on device. Each addressable device receives its global-sharding
    slice via a device-to-device copy."""
    pc = jax.process_count()
    global_shape = (v.shape[0] * pc,) + tuple(v.shape[1:])
    idx_map = sharding.addressable_devices_indices_map(global_shape)
    starts = [(idx[0].start or 0) for idx in idx_map.values()]
    offset = min(starts)
    assert max((idx[0].stop if idx[0].stop is not None else global_shape[0])
               for idx in idx_map.values()) - offset == v.shape[0], (
        "local array rows don't match this process's share of the global "
        "sharding — is the per-host batch size global_batch/num_hosts?")
    shards = []
    for dev, idx in idx_map.items():
        sl0 = idx[0]
        lo = (sl0.start or 0) - offset
        hi = (sl0.stop if sl0.stop is not None else global_shape[0]) - offset
        shards.append(jax.device_put(v[lo:hi], dev))
    return jax.make_array_from_single_device_arrays(global_shape, sharding,
                                                    shards)


def _tp_spec_for(path: str, leaf, ndim: int = None) -> "P":
    """Tensor-parallel partition spec for a param leaf, by name pattern.

    Megatron-style pairing: the MLP up-projection and the QKV head dim shard
    over tp (column parallel); the MLP down-projection and attention output
    projection shard the contracting dim (row parallel), so each pair needs
    only one psum.

    ``ndim`` overrides the leaf's rank — pipeline-stacked leaves
    ([num_layers, ...]) pass ``leaf.ndim - 1`` so the per-layer patterns
    still match (:func:`_pp_spec_for` then prepends the "pp" entry).
    """
    if ndim is None:
        ndim = getattr(leaf, "ndim", 0)
    if ndim < 2:
        return P()
    if re.search(r"intermediate/kernel$", path):
        return P(None, "tp")  # [H, 4H] column
    if re.search(r"mlp_layer/out/kernel$", path):
        return P("tp", None)  # [4H, H] row
    if re.search(r"qkv/kernel$", path) and ndim == 3:
        return P(None, "tp", None)  # [H, 3*heads, d] heads over tp
    if re.search(r"attn_proj/kernel$", path) and ndim == 3:
        return P("tp", None, None)  # [heads, d, H] heads over tp
    if re.search(r"Embed_0/embedding$", path):
        return P("tp", None)  # vocab over tp; gather is cheap
    return P()


def _zero1_spec_for(path: str, leaf, dp_size: int) -> "P":
    """ZeRO-1: shard moment leaves over dp on the largest divisible dim."""
    shape = getattr(leaf, "shape", ())
    if not shape:
        return P()
    for dim in range(len(shape)):
        if shape[dim] % dp_size == 0 and shape[dim] >= dp_size:
            spec = [None] * len(shape)
            spec[dim] = "dp"
            return P(*spec)
    return P()


def _tree_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    paths = ["/".join(_key_str(k) for k in path) for path, _ in flat]
    leaves = [leaf for _, leaf in flat]
    return paths, leaves, treedef


def _key_str(k) -> str:
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "name"):
        return str(k.name)
    if hasattr(k, "idx"):
        return str(k.idx)
    return str(k)


def _pp_spec_for(path: str, leaf, tp: bool = False) -> "P":
    """Pipeline parallelism: scan-stacked joint layer params ([num_layers,
    ...] leaves under joint_transformer/layers) live sharded over pp — each
    stage holds only its own layers (parallel/pipeline.py consumes them with
    matching in_specs, so no resharding happens at the shard_map boundary).

    With ``tp`` the per-layer tensor-parallel spec composes onto the
    non-stacked dims (P("pp", ...Megatron dims...)): the pipeline's
    shard_map is partial-manual over pp only, so the tp shardings flow into
    the region as auto axes and each stage's layer matmuls run
    tensor-parallel."""
    if re.search(r"joint_transformer/layers/", path) and getattr(leaf, "ndim", 0) >= 1:
        if tp:
            inner = _tp_spec_for(path, leaf, ndim=leaf.ndim - 1)
            if any(e is not None for e in inner):
                return P("pp", *inner)
        return P("pp")
    return P()


def param_shardings(mesh: Mesh, params, zero1_dp: bool = False) -> Any:
    """NamedShardings for the param tree: tp/pp rules apply; everything else
    replicated — unless ``zero1_dp``, where remaining leaves shard over dp
    on the largest divisible dim.

    ``zero1_dp`` is ZeRO-1 master-param sharding (used by train-state
    storage, not inference): the f32 master copy lives 1/dp per chip and
    the train step gathers a BF16 cast for compute
    (:func:`constrain_params_for_use`). The round-4 pod collective audit
    showed the alternative — replicated masters reassembled after the
    sharded update — moves the full f32 param set over ICI every step
    (~1.35 GiB at base on dp8); gathering the bf16 cast instead halves the
    bytes and drops per-chip master storage dp-fold. Compute never sees dp
    on weight dims (the constraint below removes it), so matmul shardings
    are unchanged."""
    tp_size = mesh.shape.get("tp", 1)
    pp_size = mesh.shape.get("pp", 1)
    dp_size = mesh.shape.get("dp", 1)
    paths, leaves, treedef = _tree_paths(params)
    specs = []
    for path, leaf in zip(paths, leaves):
        spec = P()
        if pp_size > 1:
            spec = _pp_spec_for(path, leaf, tp=tp_size > 1)
        if spec == P() and tp_size > 1:
            spec = _tp_spec_for(path, leaf)
        if spec == P() and zero1_dp and dp_size > 1:
            spec = _zero1_spec_for(path, leaf, dp_size)
        specs.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, specs)


def constrain_params_for_use(params, stored_zero1: bool = True) -> Any:
    """Pin an in-step param copy to its COMPUTE sharding: tp/pp specs where
    they apply, replicated otherwise (i.e. the ZeRO-1 dp sharding of the
    stored masters is removed here, nowhere else).

    Called inside the differentiated step function AFTER the bf16 cast.
    Each leaf gets TWO constraints: first its STORAGE spec (the ZeRO-1 dp
    sharding), pinning the convert_element_type to run shard-local — the
    partitioner otherwise prefers gather-then-cast, which moves f32 (seen
    in HLO metadata ``jvp()/convert_element_type``) — then its compute
    spec, so the all-gather GSPMD inserts moves bf16, and its backward is
    the matching bf16 reduce-scatter landing on each chip's own param
    shard. No-op without an active mesh (single-device paths, CPU tests)."""
    from merlot_reserve_tpu.parallel.mesh import current_mesh

    mesh = current_mesh()
    if mesh is None:
        return params
    tp_size = mesh.shape.get("tp", 1)
    pp_size = mesh.shape.get("pp", 1)
    dp_size = mesh.shape.get("dp", 1)
    paths, leaves, treedef = _tree_paths(params)
    out = []
    any_gathered = False
    for path, leaf in zip(paths, leaves):
        spec = P()
        if pp_size > 1:
            spec = _pp_spec_for(path, leaf, tp=tp_size > 1)
        if spec == P() and tp_size > 1:
            spec = _tp_spec_for(path, leaf)
        if spec == P() and stored_zero1 and dp_size > 1:
            stored = _zero1_spec_for(path, leaf, dp_size)
            if stored != P():
                leaf = jax.lax.with_sharding_constraint(
                    leaf, NamedSharding(mesh, stored))
                any_gathered = True
        out.append(jax.lax.with_sharding_constraint(
            leaf, NamedSharding(mesh, spec)))
    if any_gathered:
        # Pin ONE gathered copy: without the barrier the SPMD partitioner
        # re-materializes the param all-gather at every use site (fwd scan,
        # bwd scan, linearization residuals) — measured 4.1 bf16 param sets
        # (2,308 MiB/step) on the dp8 base AOT compile vs 1.2 sets
        # (669 MiB) with it, at the same HBM high-water (8.90 vs 8.99 GiB:
        # the kept copy is cheaper than the partitioner's gather temps).
        # Differentiable (transpose of optimization_barrier is a barrier);
        # skipped whenever no leaf was ZeRO-gathered so single-device /
        # tp-only graphs keep their exact fusion structure.
        out = list(jax.lax.optimization_barrier(tuple(out)))
    return jax.tree_util.tree_unflatten(treedef, out)


def opt_state_shardings(mesh: Mesh, opt_state, zero1: bool = True) -> Any:
    """Shardings for the optax chain state. Adam moment leaves (anything with
    the same shape family as params, >= dp elements on some dim) shard over
    dp when ``zero1``; scalars/counters replicate."""
    dp_size = mesh.shape.get("dp", 1)
    pp_size = mesh.shape.get("pp", 1)
    tp_size = mesh.shape.get("tp", 1)

    def _leaf_sharding(path_leaf):
        path, leaf = path_leaf
        if pp_size > 1:
            spec = _pp_spec_for(path, leaf, tp=tp_size > 1)
            if spec != P():
                # moments of pipeline-stage layers live with their stage
                return NamedSharding(mesh, spec)
        if tp_size > 1:
            spec = _tp_spec_for(path, leaf)
            if spec != P():
                # moments of Megatron-sharded leaves live WITH the shard:
                # misaligned (dp-only) moments force the partitioner to
                # reshard f32 master-sized buffers through the optimizer
                # update every step — the round-5 large dp4xtp2 AOT audit
                # showed 192 MiB f32[24,512,4096] all-gathers that vanish
                # once moment and master shardings agree (same precedence
                # as param_shardings: pp -> tp -> zero1-dp)
                return NamedSharding(mesh, spec)
        if not zero1 or dp_size == 1:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _zero1_spec_for(path, leaf, dp_size))

    paths, leaves, treedef = _tree_paths(opt_state)
    shardings = [_leaf_sharding(pl) for pl in zip(paths, leaves)]
    return jax.tree_util.tree_unflatten(treedef, shardings)


def state_shardings(mesh: Mesh, state, zero1: bool = True):
    """Shardings for a full flax TrainState. With ``zero1`` BOTH the Adam
    moments and the f32 master params shard over dp (canonical
    mixed-precision ZeRO-1; the step consumes a gathered bf16 cast)."""
    return state.replace(
        step=NamedSharding(mesh, P()),
        apply_fn=state.apply_fn,
        params=param_shardings(mesh, state.params, zero1_dp=zero1),
        tx=state.tx,
        opt_state=opt_state_shardings(mesh, state.opt_state, zero1=zero1),
    )
