"""Device mesh construction.

The reference's only compute parallelism is pmap data-parallel over all pod
cores with per-host input sharding (/root/reference/pretrain/train.py:106-107,
pretrain/dataloader.py:920-930). Here the equivalent is an explicit
``jax.sharding.Mesh`` with named axes:

  * ``dp`` — data parallel; batches shard over it, gradients psum over it,
    contrastive negatives all-gather over it (all on ICI).
  * ``sp`` — sequence parallel: joint-transformer activations shard their
    sequence dim over it (``TransformerEncoder.seq_shard_axis``); the ring
    collectives live in ops/ring_attention.py.
  * ``pp`` — pipeline parallel: the stacked layer dim of scan-layout
    transformer params shards over it and microbatches flow through the
    stages (parallel/pipeline.py).
  * ``tp`` — tensor parallel for the big joint transformer (weights shard
    over it); size 1 reproduces the reference's pure-DP world.

Axis order is (dp, sp, pp, tp): tp innermost so its collectives ride
adjacent-chip ICI links, dp outermost so gradient psums tolerate the
slower hops (multi-slice DCN). Size-1 axes are kept in the mesh — specs
mentioning them are no-ops, so one sharding rule set serves every layout.

Multi-host: ``jax.distributed.initialize`` + the same global mesh; pjit
handles cross-host addressability. Tests use a CPU mesh via
``XLA_FLAGS=--xla_force_host_platform_device_count=N``.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: int = -1, tp: int = 1, sp: int = 1, pp: int = 1,
              devices: Optional[Sequence] = None,
              dcn_dp: Optional[int] = None) -> Mesh:
    """Build a (dcn, dp, sp, pp, tp) mesh. dp=-1 means all remaining
    devices; ``dp`` counts the TOTAL data-parallel ways (so recipes keep
    reading "dp=16, dcn_dp=2": 2 slices x 8-way ICI dp).

    Multi-slice: ``dcn_dp`` = number of slices. The slice dimension is its
    OWN mesh axis (``dcn``, size 1 on single-slice meshes — specs
    mentioning it are then no-ops, like every other size-1 axis): batches
    and gradient reductions span ``("dcn", "dp")``, while ZeRO-1
    master/moment shards live on ``dp`` alone, keeping their per-step
    all-gathers on intra-slice ICI. Round 4 found the alternative (one
    fused dp axis) ships the full bf16 param set over DCN every step —
    the MegaScale transfer audit (parallel/comm.py split_ici_dcn, which
    parses per-slice modules' send/recv pairs) showed 160 cross-slice
    ALL_GATHER transfers per step at base scale.

    Device order on real multi-slice topologies comes from
    ``mesh_utils.create_hybrid_device_mesh`` so only the dcn axis crosses
    DCN (sp/pp/tp collectives stay on intra-slice ICI).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    rest = sp * pp * tp
    if dp == -1:
        assert n % rest == 0, f"{n} devices not divisible by sp*pp*tp={rest}"
        dp = n // rest
    assert dp * rest == n, f"dp({dp})*sp({sp})*pp({pp})*tp({tp}) != {n} devices"
    axis_names = ("dcn", "dp", "sp", "pp", "tp")

    if dcn_dp is not None and dcn_dp > 1:
        from jax.experimental import mesh_utils

        assert dp % dcn_dp == 0, f"dp={dp} not divisible by {dcn_dp} slices"
        if any(getattr(d, "slice_index", None) is not None for d in devices):
            # real multi-slice topology: order devices so that only the
            # dcn axis crosses DCN. Errors here (e.g. dcn_dp not matching
            # the actual slice count) must PROPAGATE — a silent contiguous
            # fallback would route sp/pp/tp collectives over DCN while
            # looking like a working config.
            hybrid = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(dp // dcn_dp, sp, pp, tp),
                dcn_mesh_shape=(dcn_dp, 1, 1, 1),
                devices=devices)
        else:
            # virtual/CPU devices carry no slice_index attribute — there is
            # no DCN topology to order against, so the plain contiguous
            # reshape (dcn = outermost blocks) is equivalent
            hybrid = np.asarray(devices)
        return Mesh(hybrid.reshape(dcn_dp, dp // dcn_dp, sp, pp, tp),
                    axis_names=axis_names)

    dev_array = np.asarray(devices).reshape(1, dp, sp, pp, tp)
    return Mesh(dev_array, axis_names=axis_names)


def dp_size(mesh: Mesh) -> int:
    """Total data-parallel ways: dcn (slices) x dp (intra-slice)."""
    return mesh.shape.get("dcn", 1) * mesh.shape.get("dp", 1)


def batch_axes(mesh: Mesh):
    """The axis names batch dim 0 shards over, as a PartitionSpec entry:
    ("dcn", "dp") when both exist (sizes of 1 are no-ops), else "dp"."""
    names = [a for a in ("dcn", "dp") if a in mesh.axis_names]
    return tuple(names) if len(names) > 1 else (names[0] if names else None)


_ACTIVE_MESH: contextvars.ContextVar[Optional[Mesh]] = contextvars.ContextVar(
    "merlot_active_mesh", default=None)


def current_mesh() -> Optional[Mesh]:
    """The mesh most recently activated with :func:`activate_mesh` (the mesh
    model internals — sharding constraints, the pipeline shard_map — resolve
    named axes against)."""
    return _ACTIVE_MESH.get()


def dp_anchor(*arrays):
    """Constrain each array's dim 0 to the active mesh's ``dp`` axis.

    A one-line sharding ANCHOR for row-major batch tensors whose provenance
    GSPMD cannot track (row concats across streams, data-dependent gathers
    like the span top-k): without it the partitioner invents arbitrary
    tilings that leak collectives INTO the transformer layer stacks (found
    by the round-4 pod collective audit — full attention-score all-gathers
    in a pure-dp program). No-op when no mesh is active, the mesh has no
    dp axis, or dp does not divide dim 0."""
    mesh = current_mesh()
    if mesh is None or "dp" not in mesh.axis_names:
        return arrays if len(arrays) > 1 else arrays[0]
    dp = dp_size(mesh)
    bax = batch_axes(mesh)
    from jax.sharding import PartitionSpec as P

    out = tuple(
        jax.lax.with_sharding_constraint(a, P(bax))
        if (hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] % dp == 0)
        else a
        for a in arrays)
    return out if len(out) > 1 else out[0]


def rows_anchor(*arrays, extra_axis: Optional[str] = None):
    """:func:`dp_anchor` plus one extra mesh axis on dim 0.

    For row-major tensors whose dim 0 is (batch x per-example rows) — the
    modality-tower inputs at [B*segments, ...] — the rows are INDEPENDENT
    (towers never mix segments), so dim 0 can shard over the batch axes AND
    an otherwise tower-idle axis like ``sp``. This is the long-video memory
    fix (ModelConfig.segment_shard_axis): joint-sequence sharding alone
    leaves every sp shard holding the full per-example tower activations,
    which dominate at many segments/video (BASELINE.md "long-video
    recipe"). Falls back to :func:`dp_anchor` when ``extra_axis`` is None,
    absent from the mesh, size 1, or does not divide dim 0 together with
    the batch axes; no-op without an active mesh."""
    mesh = current_mesh()
    if mesh is None:
        return arrays if len(arrays) > 1 else arrays[0]
    n = mesh.shape.get(extra_axis, 1) if extra_axis else 1
    if n <= 1 or extra_axis == "dp":
        return dp_anchor(*arrays)
    dp = dp_size(mesh)
    bax = batch_axes(mesh)
    parts = (list(bax) if isinstance(bax, tuple)
             else ([bax] if bax else [])) + [extra_axis]
    from jax.sharding import PartitionSpec as P

    spec = P(tuple(parts))
    out = tuple(
        jax.lax.with_sharding_constraint(a, spec)
        if (hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] % (dp * n) == 0)
        else (dp_anchor(a) if hasattr(a, "ndim") else a)
        for a in arrays)
    return out if len(out) > 1 else out[0]


@contextlib.contextmanager
def activate_mesh(mesh: Mesh):
    """Make ``mesh`` the ambient mesh for tracing/execution.

    Enters ``jax.sharding.use_mesh`` (so bare-PartitionSpec
    ``with_sharding_constraint`` resolves) and records the concrete mesh for
    :func:`current_mesh` (shard_map call sites need the Mesh object itself).
    """
    token = _ACTIVE_MESH.set(mesh)
    try:
        use_mesh = getattr(jax.sharding, "use_mesh", None)
        if use_mesh is not None:
            with use_mesh(mesh):
                yield mesh
        else:  # older JAX: sharding constraints fall back to mesh ctx manager
            with mesh:
                yield mesh
    finally:
        _ACTIVE_MESH.reset(token)
