"""Compiled-HLO collective audit: account every cross-chip transfer.

The reference's communication story is three hand-placed pmap collectives
(pmean grads, all_gather negatives, grouped all_gather for its local Adam
shards — SURVEY.md §2.13); nothing verifies what actually hits the
interconnect. Here every collective is emitted by GSPMD/shard_map from
sharding specs, so the compiled program is the single source of truth:
lower the jitted step, parse the optimized HLO, and get per-kind counts
and buffer bytes — before renting a pod. This is how the structural
contracts are enforced in tests (dp emits exactly the grad all-reduce;
ZeRO-1 adds the update all-gather; a ring layout emits its n−1
collective-permutes; Ulysses its all_to_alls) and how a production layout
is sanity-checked against the ICI budget.

Bytes reported are RESULT-BUFFER bytes per executed op, not wire bytes:
wire cost depends on the lowered algorithm (e.g. a ring all-reduce moves
2·(n−1)/n × buffer per link). Ops inside while/scan bodies are counted
once per appearance in the HLO, not per trip — combine with trip counts
(e.g. `pipeline_microbatches`) when budgeting.

No reference counterpart (the reference can't: pmap hides the lowering).
"""

from __future__ import annotations

import re
from collections import defaultdict
from typing import Any, Dict, List, Optional

import numpy as np

from merlot_reserve_tpu.parallel.mesh import activate_mesh

COLLECTIVE_OPS = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
    "collective-broadcast",
)

_DTYPE_BYTES = {
    "pred": 1, "s4": 1, "u4": 1, "s8": 1, "u8": 1, "f8e4m3fn": 1,
    "f8e5m2": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16,
}

# `%name = f32[8,64]{1,0} all-gather(...)` / `= (f32[2]{0}, f32[2]{0})
# all-reduce-start(...)`; the result type token precedes the op name. The
# token may be a tuple with ONE level of nesting — variadic async forms,
# e.g. `((f32[2,8], f32[3,8]), (f32[4,8], f32[6,8])) all-gather-start`.
_OP_RE = re.compile(
    r"=\s*(\((?:[^()]|\([^()]*\))*\)|[a-z0-9]+\[[^\]]*\]\S*)\s+("
    + "|".join(COLLECTIVE_OPS) + r")(-start|-done)?\(")
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def _top_level_elements(tuple_token: str) -> List[str]:
    """Split a tuple type token into its top-level elements (one nesting
    level is enough for HLO async forms)."""
    inner, depth, cur, out = tuple_token.strip()[1:-1], 0, "", []
    for ch in inner:
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        if ch == "," and depth == 0:
            out.append(cur)
            cur = ""
        else:
            cur += ch
    if cur.strip():
        out.append(cur)
    return out


def _shape_bytes(shape_token: str) -> List[int]:
    """Byte sizes of every array in a result-type token (tuple or single)."""
    out = []
    for dtype, dims in _SHAPE_RE.findall(shape_token):
        if dtype not in _DTYPE_BYTES:
            continue  # e.g. token/opaque types
        n = 1
        if dims:
            n = int(np.prod([int(d) for d in dims.split(",")]))
        out.append(n * _DTYPE_BYTES[dtype])
    return out


def parse_hlo_collectives(hlo_text: str) -> List[Dict[str, Any]]:
    """Every collective in an optimized-HLO dump, one record per op.

    Async pairs are counted once (at the ``-start``; the matching ``-done``
    is skipped), and bytes match the sync form of the same op:

    * ``all-reduce-start`` / ``reduce-scatter-start`` results do NOT alias
      operands — the whole result tuple is output buffers (the TPU combiner
      pass merges many tensors into one variadic op), so ALL elements count;
    * ``all-gather-start`` / ``collective-permute-start`` results are
      ``(input(s), output(s), ...)`` — only top-level element 1 (which may
      itself be a tuple in the variadic form) counts.
    """
    records = []
    for line in hlo_text.splitlines():
        m = _OP_RE.search(line)
        if not m:
            continue
        shape_token, op, suffix = m.group(1), m.group(2), m.group(3)
        if suffix == "-done":
            continue
        if (suffix == "-start" and shape_token.startswith("(")
                and op in ("all-gather", "collective-permute")):
            parts = _top_level_elements(shape_token)
            shape_token = parts[1] if len(parts) > 1 else shape_token
        sizes = _shape_bytes(shape_token)
        if not sizes:
            continue
        nbytes = sum(sizes)
        records.append({"op": op, "bytes": nbytes,
                        "shape": shape_token, "line": line.strip()})
    return records


def summarize_collectives(hlo_text: str) -> Dict[str, Any]:
    """Aggregate :func:`parse_hlo_collectives` into per-kind counts/bytes."""
    per_op: Dict[str, Dict[str, int]] = defaultdict(
        lambda: {"count": 0, "bytes": 0})
    for rec in parse_hlo_collectives(hlo_text):
        per_op[rec["op"]]["count"] += 1
        per_op[rec["op"]]["bytes"] += rec["bytes"]
    summary = dict(per_op)
    summary["total_bytes"] = sum(v["bytes"] for v in per_op.values())
    summary["total_count"] = sum(v["count"] for v in per_op.values())
    return summary


_GROUPS_RE = re.compile(r"replica_groups=(\{(?:\{[^}]*\},?)*\}|\[[^\]]*\]<=\[[0-9,]+\])")
_IOTA_RE = re.compile(r"\[([0-9,]+)\]<=\[([0-9,]+)\]")


def _parse_replica_groups(line: str):
    """Device groups of a collective, from either HLO form: explicit
    ``{{0,1},{2,3}}`` lists or iota ``[2,4]<=[8]`` (reshape [8] to [2,4];
    groups are the rows, i.e. along the last dim)."""
    m = _GROUPS_RE.search(line)
    if not m:
        return None
    token = m.group(1)
    if re.search(re.escape(token) + r"T\(", line):
        return None  # transposed iota form: don't guess the permutation
    it = _IOTA_RE.match(token)
    if it:
        shape = [int(x) for x in it.group(1).split(",")]
        total = int(np.prod([int(x) for x in it.group(2).split(",")]))
        ids = np.arange(total).reshape(shape)
        return [list(map(int, row)) for row in ids.reshape(-1, shape[-1])]
    groups = []
    for g in re.findall(r"\{([0-9,\s]*)\}", token[1:-1]):
        if g.strip():
            groups.append([int(x) for x in g.split(",")])
    return groups or None


_MEGASCALE_RE = re.compile(
    r"%send[.\d]* = \((\([^()]*\)|[a-z0-9]+\[[^\]]*\]\S*)"
    r".*megascale_transfer_type=\"([A-Z_0-9]+)\"")


def parse_megascale_transfers(hlo_text: str) -> List[Dict[str, Any]]:
    """Cross-slice (DCN) transfers in a multi-slice TPU module.

    XLA compiles one module PER SLICE (``num_partitions`` = chips/slice):
    intra-slice collectives are normal HLO ops, but cross-slice traffic is
    MegaScale send/recv custom transfers
    (``_xla_host_transfer_handler_name="xla_megascale_runtime"`` with a
    ``megascale_transfer_type`` of ALL_REDUCE / ALL_GATHER / ALL_TO_ALL /
    ONE_TO_ONE). An audit that only parses collectives silently reports a
    multi-slice program as DCN-free (round-4 finding). One record per send;
    bytes are the send buffer (element 0 of the result tuple)."""
    records = []
    for line in hlo_text.splitlines():
        m = _MEGASCALE_RE.search(line)
        if not m:
            continue
        sizes = _shape_bytes(m.group(1))
        if not sizes:
            continue
        records.append({"op": f"megascale_{m.group(2).lower()}",
                        "bytes": sizes[0], "shape": m.group(1),
                        "line": line.strip()})
    return records


def split_ici_dcn(records: List[Dict[str, Any]], slice_size: int,
                  hlo_text: Optional[str] = None) -> Dict[str, Dict[str, int]]:
    """Split collective result bytes by whether any device group spans a
    slice boundary (device i lives in slice i // slice_size — the AOT
    topology and TPUv4+/v5 runtimes number devices slice-major).

    Pass ``hlo_text`` for multi-slice modules: their cross-slice traffic
    rides MegaScale send/recv transfers (:func:`parse_megascale_transfers`),
    which land in the ``dcn`` bucket — the collectives in ``records`` are
    then per-slice ops whose groups never span slices.

    DCN links are ~50-100x thinner than ICI, so a layout is only
    pod-viable when the DCN bucket holds little beyond the cross-slice grad
    reduction (the scaling-book recipe; see docs/PARALLELISM.md)."""
    out = {"ici": {"count": 0, "bytes": 0}, "dcn": {"count": 0, "bytes": 0},
           "unknown": {"count": 0, "bytes": 0}}
    for rec in records:
        groups = _parse_replica_groups(rec.get("line", ""))
        if groups is None:
            bucket = "unknown"
        else:
            crosses = any(len({d // slice_size for d in g}) > 1
                          for g in groups)
            bucket = "dcn" if crosses else "ici"
        out[bucket]["count"] += 1
        out[bucket]["bytes"] += rec["bytes"]
    if hlo_text is not None:
        for rec in parse_megascale_transfers(hlo_text):
            out["dcn"]["count"] += 1
            out["dcn"]["bytes"] += rec["bytes"]
    return out


def collective_records(step_fn, *args, mesh: Optional[Any] = None,
                       donate_argnums=()) -> List[Dict[str, Any]]:
    """Lower+compile a jitted function on its example args and return the
    raw per-op collective records (:func:`parse_hlo_collectives`).

    Accepts the wrapped step functions returned by the trainer factories
    (their ``__wrapped__`` is the underlying ``jax.jit``); pass ``mesh`` so
    in-model sharding constraints / shard_map regions resolve their named
    axes during trace, exactly as at execution time.
    """
    fn = getattr(step_fn, "__wrapped__", step_fn)
    if not hasattr(fn, "lower"):
        import jax

        fn = jax.jit(fn, donate_argnums=donate_argnums)
    if mesh is not None:
        with activate_mesh(mesh):
            compiled = fn.lower(*args).compile()
    else:
        compiled = fn.lower(*args).compile()
    return parse_hlo_collectives(compiled.as_text())


def collective_summary(step_fn, *args, mesh: Optional[Any] = None,
                       donate_argnums=()) -> Dict[str, Any]:
    """Per-kind counts/bytes aggregate of :func:`collective_records`."""
    per_op: Dict[str, Dict[str, int]] = defaultdict(
        lambda: {"count": 0, "bytes": 0})
    for rec in collective_records(step_fn, *args, mesh=mesh,
                                  donate_argnums=donate_argnums):
        per_op[rec["op"]]["count"] += 1
        per_op[rec["op"]]["bytes"] += rec["bytes"]
    summary = dict(per_op)
    summary["total_bytes"] = sum(v["bytes"] for v in per_op.values())
    summary["total_count"] = sum(v["count"] for v in per_op.values())
    return summary
