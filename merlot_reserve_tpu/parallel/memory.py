"""Analytic HBM planning for training layouts.

Three compiles OOM'd on a 16G v5e while benchmarking round 2 (base batch-2
scan: 16.3G, base batch-4: 31.9G, large batch-1 remat: 18.3G — BASELINE.md);
this module predicts that before a compile is ever attempted, so operators
can size batch / remat / ZeRO / mesh axes analytically.

The model is deliberately coarse (fusion, layout padding, and XLA temp
buffers move real numbers ±20-30%) but reproduces the measured points'
ordering and magnitude. All terms in bytes.
"""

from __future__ import annotations

from typing import Dict

# Calibrated overhead coefficients (see estimate_train_hbm's docstring for
# the calibration corpus; scripts/fit_memory_model.py refits them whenever
# scripts/pod_readiness.py adds ground-truth rows).
_C_STATE = 1.3          # XLA temps/fragmentation on the param-state terms
_C_ACT = 0.7            # fusion discount on saved seq-major activations
_C_PROBS = 1.9          # f32 softmax temps on materialized attention probs
_NONREMAT_TENSORS = 10.0  # saved seq-major tensors per layer, no remat
_REMAT_TENSORS = 19.0   # effective saved tensors per layer under nn.scan+remat
_GSPMD_SP_PENALTY = 1.4  # whole-step cost of seq_shard_axis GSPMD sharding
_PP_STREAM_TENSORS = 18.0  # full-batch seq-major buffers the pipeline carries
_CALIBRATED_MAX_SEGMENTS = 32  # beyond this: long-video regime, use AOT


def param_count(cfg) -> int:
    """Approximate trainable parameter count from the config shapes."""
    m = cfg.model
    h = m.hidden_size

    def layer(n):  # qkv + attn_proj + 2 LN + mlp(4x)
        return n * (4 * h * h + 8 * h * h + 8 * h)

    p = 0
    p += m.vocab_size * h                                # token embedding
    p += layer(m.joint_num_layers)
    p += layer(m.vit_num_layers) + (16 * 16 * 3) * h     # patch embed
    p += layer(m.audio_num_layers) + (m.audio_patch_size * 65) * h
    p += layer(m.span_num_layers)
    p += 3 * (h * h)                                     # attnpools / heads (coarse)
    p += h * h                                           # joint_proj
    return int(p)


def estimate_train_hbm(cfg, batch_size: int, remat: bool = False,
                       zero1_dp: int = 1, pp: int = 1,
                       flash_joint: bool = False, sp: int = 1,
                       tp: int = 1, dcn: int = 1,
                       sp_impl: str = "gspmd",
                       tower_remat: "bool | None" = None,
                       segment_sp: int = 1) -> Dict[str, float]:
    """Per-chip HBM estimate (bytes) for one pretraining step.

    Calibrated (round 5) against the chipless-AOT ground truth: XLA's
    memory analysis for every pod_readiness layout, base AND large configs,
    remat and not (docs/pod_readiness_results.jsonl — 12 layouts, all
    within 25%, pinned by tests/test_memory.py::
    test_aot_ground_truth_within_25pct; refit via
    scripts/fit_memory_model.py) plus the six measured single-chip v5e
    OOM/fit classifications.

    :param batch_size: per-DP-SHARD batch (activations replicate over tp).
    :param zero1_dp: dp size the ZeRO-1 master params + Adam moments shard
        over. Only the tp/pp-UNsharded remainder divides by it: per
        parallel/sharding.py::param_shardings, a leaf that carries a tp/pp
        spec never also shards over dp.
    :param pp: pipeline stages — joint-layer params/moments and joint
        activations shard 1/pp per stage, plus the pipeline's microbatch
        stream buffers (parallel/pipeline.py).
    :param tp: Megatron tensor-parallel size — every tower's matmul
        kernels (qkv/attn_proj/mlp pairs, 12h^2/layer) and the vocab
        embedding shard 1/tp (parallel/sharding.py::_tp_spec_for);
        biases/LN stay replicated. Activation terms are NOT scaled:
        residual-stream activations stay tp-replicated under Megatron
        sharding. Calibrated on the large dp4xtp2 AOT points (round 5).
    :param sp: sequence-parallel shard count for the JOINT tower.
    :param sp_impl: HOW the sequence is sharded — the memory behavior is
        OPPOSITE between the two families. 'gspmd' (seq_shard_axis; the
        default, what pod_readiness compiles): measured at sp=2 the whole
        step costs ~1.5x MORE than the unsharded dp layout (base 13.36 vs
        8.90 GiB, large-remat 20.56 vs 13.41 — GSPMD all-gathers K/V per
        layer and saves full-seq buffers for backward), so the total gets
        a x1.5 penalty and NO activation division. 'ring'/'ulysses':
        explicit collectives keep saved residuals and score rows ~1/sp
        per device — activations divide by sp (no AOT calibration point;
        ordering only).
    :param dcn: number of slices the dp axis spans (multi-slice). Adds one
        param-set of cross-slice staging (MegaScale send/recv buffers) —
        calibrated on the base and large dcn16 AOT points.
    :param flash_joint: joint tower uses the Pallas flash kernels — no
        materialized attention probabilities in HBM (only the [rows, H, L]
        log-sum-exp, negligible). Validated point: base batch-4 no-remat
        needs 31.9G with XLA dense attention (OOM) but RUNS with flash
        (BASELINE.md round-3 measurement).
    :param tower_remat: ModelConfig.tower_gradient_checkpoint — the
        vision/audio/span towers remat (the long-video lever: tower saves
        scale with segments/video and dominate there — measured 80-segment
        flash single-chip 21.29G OOM without vs 5.77G AOT with, BASELINE.md
        "long-video recipe"). Default None follows ``remat`` — the 13-row
        AOT calibration predates the knob and was fit with that coupling;
        pass the truthful value for long-video planning (at base shapes the
        tower terms are small either way).
    :param segment_sp: ModelConfig.segment_shard_axis shard count — tower
        rows (B x segments etc.) shard over this many ways IN ADDITION to
        dp, dividing the tower activation terms.
    :return: breakdown dict incl. 'total'. Compare against ~15.75e9 usable
        on a v5e (16G minus runtime reserves).

    Layout caveat: the calibration points are scan_layers=True compiles —
    the estimate is for the scan layout. Unrolled graphs schedule slightly
    leaner (measured: base batch-2 unrolled FITS while batch-2 scan OOMs at
    16.28G), so a borderline "does not fit" verdict may still fit unrolled.
    """
    m, d = cfg.model, cfg.data
    h = m.hidden_size
    P = param_count(cfg)

    def layer(n):
        return n * (4 * h * h + 8 * h * h + 8 * h)

    # pipeline shards the joint stack's params/moments over stages; tp
    # shards each layer's matmul kernels (12h^2 of the 12h^2+8h) and the
    # vocab embedding across every tower (the two compose on the joint
    # stack: stacked leaves are P("pp", ...tp...), parallel/sharding.py)
    pp = max(pp, 1)
    tp = max(tp, 1)
    sp = max(sp, 1)
    dcn = max(dcn, 1)
    matmuls = 12 * h * h  # qkv 3h^2 + attn_proj h^2 + mlp up/down 8h^2
    n_other = m.vit_num_layers + m.audio_num_layers + m.span_num_layers
    # split the param set by HOW it shards (ADVICE r4): tp/pp-sharded
    # leaves (matmul kernels + vocab embedding + the joint stack) never
    # ALSO shard over dp — only the remainder is ZeRO-1-divisible.
    P_tp_pp = 0.0
    P_rest = float(P)
    if pp > 1:
        # whole joint stack is pp-stacked (tp composes on its matmul dims)
        P_tp_pp += (layer(m.joint_num_layers) / pp
                    - (m.joint_num_layers / pp) * matmuls * (1 - 1.0 / tp))
        P_rest -= layer(m.joint_num_layers)
    elif tp > 1:
        P_tp_pp += m.joint_num_layers * matmuls / tp
        P_rest -= m.joint_num_layers * matmuls
    if tp > 1:
        P_tp_pp += (n_other * matmuls + m.vocab_size * h) / tp
        P_rest -= n_other * matmuls + m.vocab_size * h
    P_local = P_tp_pp + P_rest              # per-chip compute copy
    P_state = P_tp_pp + P_rest / max(zero1_dp, 1)

    # persistent train state: f32 master params + bf16 Adam mu/nu (cube-root
    # nu is still 2 bytes). Under ZeRO-1 the dp-divisible remainder shards
    # over dp (round 4: masters shard alongside the moments; the step
    # gathers a bf16 cast — parallel/sharding.py).
    state = 4 * P_state + 2 * P_state + 2 * P_state

    # step transients: bf16 param compute copy (gathered/cast, per-chip
    # tp-sharded size), bf16 grads, f32 grad upcast reduce-scattered onto
    # the ZeRO owner shard (tp-sharded grads update in place — the AOT tp
    # points reject a full per-chip f32 grad set)
    step_transients = 2 * P_local + 2 * P_local + 4 * P_rest / max(zero1_dp, 1)

    # pod overhead: collective staging (the in-flight bf16 param gathers /
    # grad reduce-scatters the audit counts in the high-water) — one bf16
    # param set whenever the step runs on a mesh; multi-slice adds one more
    # (MegaScale cross-slice send/recv buffers). Calibrated round 5.
    on_mesh = max(zero1_dp, tp, pp, sp) > 1 or dcn > 1
    pod_overhead = (2 * P_local if on_mesh else 0.0) \
        + (2 * P_local if dcn > 1 else 0.0)

    # activations saved for backward (bf16). Per transformer layer the
    # backward needs ~6 seq-major tensors (x, ln(x), qkv, attn out, mlp
    # hidden 4x counts as 4) ~= 10 * S * H, plus the materialized attention
    # probabilities rows * heads * S * S on the XLA path.
    heads = h // m.size_per_head

    def tower_act(rows, seq, layers, flash=False, do_remat=None):
        # ~10 seq-major bf16 tensors per layer + the materialized attention
        # probabilities, which XLA keeps f32 on the softmax path (absent
        # entirely on the flash path). Returned separately: the probs
        # allocations carry their own softmax-temp overhead coefficient.
        # do_remat: None = the joint tower's global `remat`; the modality
        # towers pass tower_remat (separate knob since round 5).
        do_remat = remat if do_remat is None else do_remat
        probs = 0.0 if flash else 4 * (rows * heads * seq * seq)
        per_layer = 2 * (_NONREMAT_TENSORS * rows * seq * h)
        if do_remat:
            # remat's real saving is the attention-probability buffers
            # (probs -> 0 below); the seq-major side barely shrinks and is
            # FIT larger than the non-remat count — under nn.scan + nn.remat
            # XLA stacks per-layer tensors across ALL scan iterations AND
            # double-buffers the recompute (the large-remat AOT compiles
            # show ~190 MB [layers, rows, seq, heads, d] AllocateBuffers
            # plus recompute temps the non-remat schedule doesn't carry).
            # _REMAT_TENSORS is fit on the seven large remat AOT rows (r5).
            per_layer = 2 * (_REMAT_TENSORS * rows * seq * h)
            probs = 0.0
        return per_layer * layers, probs * layers

    B = batch_size
    act = 0.0
    probs_act = 0.0

    def add(t):
        nonlocal act, probs_act
        act += t[0]
        probs_act += t[1]

    seg_sp = max(segment_sp, 1)
    if tower_remat is None:
        tower_remat = remat  # legacy coupling the calibration was fit with
    add(tower_act(B * d.num_segments / seg_sp, m.vit_seq_len + 1,
                  m.vit_num_layers, do_remat=tower_remat))
    add(tower_act(B * d.num_segments * d.num_audio_subsegments / seg_sp,
                  m.audio_seq_length // m.audio_patch_size + 1,
                  m.audio_num_layers, do_remat=tower_remat))
    add(tower_act(B * d.num_text_spans_to_include / seg_sp,
                  m.text_span_length + 1,
                  m.span_num_layers, do_remat=tower_remat))
    joint_rows = B * (d.num_segment_groups * (d.num_audio2text_seqs
                                              + d.num_text2audio_seqs)
                      + 1 + d.num_text_seqs)
    # sequence sharding: ring/ulysses genuinely hold 1/sp of the saved
    # residuals and score rows per device; the GSPMD path does NOT (it
    # all-gathers K/V per layer and saves full-seq buffers — handled as a
    # whole-step penalty below, measured x1.5 at sp=2)
    act_sp = sp if (sp > 1 and sp_impl != "gspmd") else 1
    j_act, j_probs = tower_act(joint_rows, d.seq_len,
                               m.joint_num_layers // pp, flash=flash_joint)
    add((j_act / act_sp, j_probs / act_sp))
    if pp > 1:
        # pipeline stream buffers: x_mb + outputs + carried state, each
        # [M, rows/M, L, H] bf16 per stage (dp-sharded rows), PLUS the
        # per-tick inputs lax.scan saves for backward across all
        # T = M + S - 1 ticks (remat recomputes the stage interior but the
        # tick boundaries persist) — fit on the large pp AOT row (round 5)
        act += _PP_STREAM_TENSORS * 2 * joint_rows * d.seq_len * h

    # Per-term overheads (XLA temporaries / fragmentation / stream-concat
    # copies): the 1.3/0.7/1.9 coefficients were calibrated on six measured
    # single-chip v5e points (BASELINE.md: base b1 scan fits, b2 scan
    # 16.28G OOM, b4 31.9G OOM, b4 remat fits, large b1 remat 18.28G OOM,
    # base b4 FLASH fits — all still classify correctly) and the round-5
    # terms (param split, pod/dcn staging, remat tensor count, gspmd-sp
    # penalty) on the 12 chipless-AOT pod layouts
    # (docs/pod_readiness_results.jsonl), every one within 25% of XLA's
    # memory analysis — pinned by tests/test_memory_plan.py.
    total = (_C_STATE * (state + step_transients + pod_overhead)
             + _C_ACT * act + _C_PROBS * probs_act)
    if sp > 1 and sp_impl == "gspmd":
        # measured whole-step penalty at sp=2 (base 13.36 vs dp8's 8.90,
        # large-remat 20.56 vs 13.41); scaling beyond sp=2 is uncalibrated
        total *= _GSPMD_SP_PENALTY
    out = {
        "params": float(P),
        "state_bytes": float(state),
        "step_transient_bytes": float(step_transients),
        "pod_overhead_bytes": float(pod_overhead),
        "activation_bytes": float(act + probs_act),
        "total": float(total),
    }
    # Long-video regime guard (round 5, measured): every calibration point
    # has <= 16 segments/video. At 80 segments the analytic model misses in
    # BOTH directions — XLA's tower-buffer reuse collapses when the
    # [layers, B*segments, seq, ...] scan stacks get large (measured ~34
    # saved h-units/layer vs the <=16-segment regime's ~10: flash no-remat
    # predicted 16.1 vs 30.9 G measured, the DANGEROUS direction), while
    # with tower_remat the model over-predicts ~2-3x (conservative).
    # Chipless AOT is the planner for this regime: exact, minutes, no chip
    # (scripts/pod_readiness.py --layouts longvideo; BASELINE.md
    # "long-video recipe" has the recipe + all six measured points).
    if d.num_segments > _CALIBRATED_MAX_SEGMENTS:
        out["uncalibrated_regime"] = (
            f"num_segments={d.num_segments} > calibrated max "
            f"{_CALIBRATED_MAX_SEGMENTS}: analytic estimate unreliable "
            "(misses up to ~2x either direction at 80 segments, "
            "BASELINE.md 'long-video recipe') — plan long-video shapes "
            "with chipless AOT: scripts/pod_readiness.py --layouts "
            "longvideo, or the aot recipe in docs/PARALLELISM.md")
    return out


def fits_v5e(cfg, batch_size: int, remat: bool = False,
             zero1_dp: int = 1, hbm_bytes: float = 15.75e9) -> bool:
    return estimate_train_hbm(cfg, batch_size, remat, zero1_dp)["total"] <= hbm_bytes
