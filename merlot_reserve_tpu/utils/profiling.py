"""Profiling & observability helpers — the structured upgrade of the
reference's printf-tracing (SURVEY.md §5: `jax_log_compiles` + flush prints).
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace context; view with TensorBoard or xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def log_compiles(enabled: bool = True) -> Iterator[None]:
    import jax

    prev = jax.config.read("jax_log_compiles")
    jax.config.update("jax_log_compiles", enabled)
    try:
        yield
    finally:
        jax.config.update("jax_log_compiles", prev)


class ThroughputMeter:
    """Rolling it/sec + examples/sec meter (train.py:141-145's loop print,
    structured)."""

    def __init__(self, window: int = 100, batch_size: Optional[int] = None):
        self.window = window
        self.batch_size = batch_size
        self._t0 = time.time()
        self._count = 0

    def step(self) -> Optional[Dict[str, float]]:
        self._count += 1
        if self._count % self.window:
            return None
        dt = time.time() - self._t0
        self._t0 = time.time()
        out = {"it_per_sec": self.window / dt}
        if self.batch_size:
            out["examples_per_sec"] = self.window * self.batch_size / dt
        return out


def log_jsonl(path: str, record: Dict):
    """Append one JSON line (metrics stream consumable by any dashboard)."""
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")


# ---------------------------------------------------------------------------
# Device-event trace analysis: jax.profiler trace.json.gz -> op-time tables.
#
# This formalizes the methodology used to verify the per-step numbers on
# real hardware (BASELINE.md: "profile-verified 54.2 ms/step"): run work
# under ``trace(log_dir)``, then aggregate the device-lane events of the
# Chrome-trace dump into a per-op table. The reference has no profiling
# subsystem at all (SURVEY.md §5 — printf tracing); this is the
# first-class replacement, and it works through the axon relay.
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class TraceEvent:
    """One complete ('ph'=='X') Chrome-trace event."""

    name: str
    lane: str        # process name (e.g. '/device:TPU:0 …' or host lane)
    thread: str
    start_us: float
    dur_us: float
    args: Dict


def find_trace_files(log_dir: str):
    """All *.trace.json.gz files under a ``trace(log_dir)`` dump, newest
    first (jax.profiler writes log_dir/plugins/profile/<run>/<host>.trace.json.gz)."""
    import glob
    import os

    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    return sorted(paths, key=os.path.getmtime, reverse=True)


def load_trace_events(log_dir: str):
    """Parse the newest trace dump under ``log_dir`` into TraceEvents.

    Resolves pid/tid metadata ('M' events) to human lane/thread names so
    callers can filter device lanes by substring."""
    import gzip

    paths = find_trace_files(log_dir)
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {log_dir}")
    with gzip.open(paths[0], "rt") as f:
        raw = json.load(f)
    trace_events = (raw.get("traceEvents", [])
                    if isinstance(raw, dict) else raw)

    pid_names, tid_names = {}, {}
    for ev in trace_events:
        if ev.get("ph") == "M":
            if ev.get("name") == "process_name":
                pid_names[ev.get("pid")] = ev.get("args", {}).get("name", "")
            elif ev.get("name") == "thread_name":
                tid_names[(ev.get("pid"), ev.get("tid"))] = (
                    ev.get("args", {}).get("name", ""))

    out = []
    for ev in trace_events:
        if ev.get("ph") != "X":
            continue
        pid = ev.get("pid")
        out.append(TraceEvent(
            name=ev.get("name", ""),
            lane=pid_names.get(pid, str(pid)),
            thread=tid_names.get((pid, ev.get("tid")), str(ev.get("tid"))),
            start_us=float(ev.get("ts", 0.0)),
            dur_us=float(ev.get("dur", 0.0)),
            args=ev.get("args", {}) or {}))
    return out


def op_time_table(events, lane_filter: Optional[str] = None,
                  top: Optional[int] = 20):
    """Aggregate events into a per-op-name table sorted by total time.

    :param events: TraceEvents (or a log_dir string — loaded for you)
    :param lane_filter: case-insensitive substring of the lane name
        ('tpu' selects the device lanes on hardware; None = all lanes)
    :param top: keep the top-N rows (None = all)
    :returns: list of dicts {name, total_ms, count, mean_us, pct} where
        pct is of the filtered lanes' summed event time.
    """
    if isinstance(events, str):
        events = load_trace_events(events)
    if lane_filter is not None:
        needle = lane_filter.lower()
        events = [e for e in events if needle in e.lane.lower()]
    agg: Dict[str, list] = {}
    for e in events:
        slot = agg.setdefault(e.name, [0.0, 0])
        slot[0] += e.dur_us
        slot[1] += 1
    total_us = sum(v[0] for v in agg.values()) or 1.0
    rows = [{"name": name, "total_ms": dur / 1e3, "count": n,
             "mean_us": dur / n, "pct": 100.0 * dur / total_us}
            for name, (dur, n) in agg.items()]
    rows.sort(key=lambda r: -r["total_ms"])
    return rows[:top] if top else rows


def trace_wall_ms(events, lane_filter: Optional[str] = None) -> float:
    """Wall-clock span (max end - min start) of the filtered lanes —
    the per-step device time when the trace brackets exactly one step."""
    if isinstance(events, str):
        events = load_trace_events(events)
    if lane_filter is not None:
        needle = lane_filter.lower()
        events = [e for e in events if needle in e.lane.lower()]
    if not events:
        return 0.0
    start = min(e.start_us for e in events)
    end = max(e.start_us + e.dur_us for e in events)
    return (end - start) / 1e3


# ---------------------------------------------------------------------------
# Analytic FLOP accounting (for MFU reporting; matmul terms only, forward).
# ---------------------------------------------------------------------------

TPU_PEAK_FLOPS = {
    # bf16 dense peak per chip
    "v4": 275e12,
    "v5 lite": 197e12,  # v5e
    "v5e": 197e12,
    "v5p": 459e12,
    "v6 lite": 918e12,  # trillium
}


def device_peak_flops(device=None) -> Optional[float]:
    """bf16 peak FLOP/s for the current accelerator, or None if unknown."""
    import jax

    if device is None:
        devs = jax.devices()
        if not devs:
            return None
        device = devs[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in TPU_PEAK_FLOPS.items():
        if key in kind:
            return peak
    return None


def transformer_layer_flops(seq_len: int, hidden: int, mlp_ratio: int = 4) -> float:
    """Forward matmul FLOPs of one pre-LN transformer layer on seq_len
    tokens: QKV+out projections (8*S*H^2), attention score+mix (4*S^2*H),
    MLP (2 * 2*S*H*rH)."""
    s, h = float(seq_len), float(hidden)
    return 8 * s * h * h + 4 * s * s * h + 2 * 2 * s * h * (mlp_ratio * h)


def encode_flops(cfg, n_videos: int, n_segments: int,
                 include_preprocess: bool = False) -> float:
    """Analytic forward FLOPs of embed_video (modeling.py:806-843 workload):
    vision tower over every segment, audio tower over every subsegment,
    joint transformer per video. Matmul terms only (layernorms/softmax/GELU
    are bandwidth-, not FLOP-, relevant)."""
    m = cfg.model
    h = float(m.hidden_size)
    flops = 0.0

    # vision tower: [n_videos*n_segments] x (CLS + grid tokens)
    s_vit = m.vit_seq_len + 1
    n_seg_total = n_videos * n_segments
    flops += n_seg_total * m.vit_num_layers * transformer_layer_flops(s_vit, h)
    flops += n_seg_total * 2 * m.vit_seq_len * (16 * 16 * 3) * h  # patch embed
    # 2x2 attention pool: one MHA layer over the grid
    flops += n_seg_total * (4 * m.vit_seq_len * h * h
                            + 4 * m.vit_seq_len * (m.vit_seq_len / 4) * h)

    # audio tower: [n_videos*n_segments*3 subsegments] x (CLS + patched frames)
    s_aud = m.audio_seq_length // m.audio_patch_size + 1
    n_sub = n_seg_total * 3
    flops += n_sub * m.audio_num_layers * transformer_layer_flops(s_aud, h)
    flops += n_sub * 2 * (s_aud - 1) * (m.audio_patch_size * 65) * h
    flops += n_sub * (4 * (s_aud - 1) * h * h
                      + 4 * (s_aud - 1) * m.audio_token_length * h)  # attnpool

    # joint transformer: per video, lang + pooled vision tokens
    s_joint = (cfg.data.lang_seq_len
               + n_segments * m.vit_pooled_seq_len)
    flops += n_videos * m.joint_num_layers * transformer_layer_flops(s_joint, h)
    flops += n_videos * 2 * s_joint * h * h  # joint_proj head

    if include_preprocess:
        # mel matmul-DFT: frames [188, n_fft] @ cos/sin [n_fft, n_bins]
        n_fft, n_bins, n_frames = 1536, 769, 188
        flops += n_seg_total * (2 * 2 * n_frames * n_fft * n_bins
                                + 2 * n_frames * n_bins * 64)
    return flops


def pretrain_step_flops(cfg, batch_size: int) -> float:
    """Analytic matmul FLOPs of one full pretraining train step
    (pretrain_model.py:38-258 workload): vision tower over every segment,
    audio tower over every subsegment, span tower over the text-span
    targets, the fused 4-stream joint call, x3 for forward+backward."""
    m, d = cfg.model, cfg.data
    h = float(m.hidden_size)
    B = batch_size
    f = 0.0

    # vision tower over B * num_segments frames (+ patch embed + attnpool)
    n_seg = B * d.num_segments
    s_vit = m.vit_seq_len + 1
    f += n_seg * m.vit_num_layers * transformer_layer_flops(s_vit, h)
    f += n_seg * 2 * m.vit_seq_len * (16 * 16 * 3) * h
    f += n_seg * (4 * m.vit_seq_len * h * h
                  + 4 * m.vit_seq_len * (m.vit_seq_len / 4) * h)

    # audio tower over every subsegment
    s_aud = m.audio_seq_length // m.audio_patch_size + 1
    n_sub = n_seg * d.num_audio_subsegments
    f += n_sub * m.audio_num_layers * transformer_layer_flops(s_aud, h)
    f += n_sub * 2 * (s_aud - 1) * (m.audio_patch_size * 65) * h
    f += n_sub * (4 * (s_aud - 1) * h * h
                  + 4 * (s_aud - 1) * m.audio_token_length * h)

    # span tower over the text-span targets (+CLS)
    n_spans = B * d.num_text_spans_to_include
    f += n_spans * m.span_num_layers * transformer_layer_flops(
        m.text_span_length + 1, h)

    # the ONE fused joint call: per example, num_segment_groups rows each for
    # audio2text/text2audio (x their seq multipliers) + matching + random_text
    rows = B * (d.num_segment_groups * (d.num_audio2text_seqs
                                        + d.num_text2audio_seqs)
                + 1 + d.num_text_seqs)
    f += rows * m.joint_num_layers * transformer_layer_flops(d.seq_len, h)
    f += rows * 2 * d.seq_len * h * h  # joint_proj

    return 3.0 * f  # backward ~= 2x forward for matmul-dominated graphs
