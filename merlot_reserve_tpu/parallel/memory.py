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
                       tp: int = 1) -> Dict[str, float]:
    """Per-chip HBM estimate (bytes) for one pretraining step.

    :param zero1_dp: dp size the Adam moments are ZeRO-1-sharded over.
    :param pp: pipeline stages — joint-layer params/moments and joint
        activations shard 1/pp per stage, plus the pipeline's microbatch
        stream buffers (parallel/pipeline.py).
    :param tp: Megatron tensor-parallel size — every tower's matmul
        kernels (qkv/attn_proj/mlp pairs, 12h^2/layer) and the vocab
        embedding shard 1/tp (parallel/sharding.py::_tp_spec_for);
        biases/LN stay replicated. Composes with pp on the joint stack
        (stacked leaves carry P("pp", ...tp...)). Activation terms are
        NOT scaled: residual-stream activations stay tp-replicated under
        Megatron sharding (only the intra-pair intermediates shard, and
        those are transient). Coarse — no tp calibration point exists on
        this 1-chip box; treat tp > 1 verdicts as ordering.
    :param sp: sequence-parallel shard count for the JOINT tower
        (seq_shard_axis GSPMD sharding, ring, or ulysses attention): the
        saved seq-major residuals and the attention score rows both scale
        ~1/sp per device (the ring materializes per-hop [Lq/sp, Lk/sp]
        scores; ulysses holds full-L scores but only heads/sp of them).
        Coarse — no calibration point exists on this 1-chip box; treat
        sp > 1 verdicts as ordering, not boundaries.
    :param flash_joint: joint tower uses the Pallas flash kernels — no
        materialized attention probabilities in HBM (only the [rows, H, L]
        log-sum-exp, negligible). Validated point: base batch-4 no-remat
        needs 31.9G with XLA dense attention (OOM) but RUNS with flash
        (BASELINE.md round-3 measurement).
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
    matmuls = 12 * h * h  # qkv 3h^2 + attn_proj h^2 + mlp up/down 8h^2
    n_other = m.vit_num_layers + m.audio_num_layers + m.span_num_layers
    P_eff = (P - layer(m.joint_num_layers) * (1 - 1.0 / pp)
             - m.joint_num_layers / pp * matmuls * (1 - 1.0 / tp)
             - n_other * matmuls * (1 - 1.0 / tp)
             - m.vocab_size * h * (1 - 1.0 / tp))

    # persistent train state: f32 master params + bf16 Adam mu/nu (cube-root
    # nu is still 2 bytes). Under ZeRO-1 ALL of it shards over dp (round 4:
    # masters shard alongside the moments; the step gathers a bf16 cast —
    # parallel/sharding.py). At zero1_dp=1 this reduces to the original
    # replicated terms, so the six single-chip calibration points are
    # unchanged. Pod cross-check: dp8 base batch-1 scan predicts 6.7 GiB vs
    # XLA's memory analysis 9.0 GiB (pod_readiness, round 4) — the ~1.3x
    # pod underprediction documented in docs/PARALLELISM.md still applies;
    # use the AOT compile to confirm boundary verdicts.
    state = (4 * P_eff + 2 * P_eff + 2 * P_eff) / max(zero1_dp, 1)

    # step transients: bf16 param cast (the gathered compute copy is full-
    # size regardless of dp), bf16 grads, f32 grad upcast (reduce-scattered
    # onto the shard under ZeRO-1)
    step_transients = 2 * P_eff + 2 * P_eff + 4 * P_eff / max(zero1_dp, 1)

    # activations saved for backward (bf16). Per transformer layer the
    # backward needs ~6 seq-major tensors (x, ln(x), qkv, attn out, mlp
    # hidden 4x counts as 4) ~= 10 * S * H, plus the materialized attention
    # probabilities rows * heads * S * S on the XLA path.
    heads = h // m.size_per_head

    def tower_act(rows, seq, layers, flash=False):
        # ~10 seq-major bf16 tensors per layer + the materialized attention
        # probabilities, which XLA keeps f32 on the softmax path (absent
        # entirely on the flash path). Returned separately: the probs
        # allocations carry their own softmax-temp overhead coefficient.
        probs = 0.0 if flash else 4 * (rows * heads * seq * seq)
        per_layer = 2 * (10 * rows * seq * h)
        if remat:
            # only layer inputs are kept; everything else recomputed
            per_layer = 2 * (2 * rows * seq * h)
            probs = 0.0
        return per_layer * layers, probs * layers

    B = batch_size
    act = 0.0
    probs_act = 0.0

    def add(t):
        nonlocal act, probs_act
        act += t[0]
        probs_act += t[1]

    add(tower_act(B * d.num_segments, m.vit_seq_len + 1, m.vit_num_layers))
    add(tower_act(B * d.num_segments * d.num_audio_subsegments,
                  m.audio_seq_length // m.audio_patch_size + 1,
                  m.audio_num_layers))
    add(tower_act(B * d.num_text_spans_to_include, m.text_span_length + 1,
                  m.span_num_layers))
    joint_rows = B * (d.num_segment_groups * (d.num_audio2text_seqs
                                              + d.num_text2audio_seqs)
                      + 1 + d.num_text_seqs)
    sp = max(sp, 1)
    j_act, j_probs = tower_act(joint_rows, d.seq_len,
                               m.joint_num_layers // pp, flash=flash_joint)
    add((j_act / sp, j_probs / sp))
    if pp > 1:
        # pipeline stream buffers: x_mb + outputs + carried state, each
        # [M, rows/M, L, H] bf16 per stage (dp-sharded rows)
        act += 3 * 2 * joint_rows * d.seq_len * h

    # Per-term overheads (XLA temporaries / fragmentation / stream-concat
    # copies), calibrated on six measured v5e points (BASELINE.md): base b1
    # scan fits, b2 scan 16.28G OOM, b4 31.9G OOM, b4 remat fits, large b1
    # remat 18.28G OOM, and (r3) base b4 FLASH fits. The softmax probs
    # allocations carry their own larger coefficient (f32 temps on the
    # softmax path); a single global factor cannot classify the flash point.
    # All six classify correctly; point estimates are +-30%.
    # (the flash point pins these tightly: it sits ~0.1G under the 15.75G
    # line, exactly as the real compile barely fits)
    total = 1.3 * (state + step_transients) + 0.7 * act + 1.9 * probs_act
    return {
        "params": float(P),
        "state_bytes": float(state),
        "step_transient_bytes": float(step_transients),
        "activation_bytes": float(act + probs_act),
        "total": float(total),
    }


def fits_v5e(cfg, batch_size: int, remat: bool = False,
             zero1_dp: int = 1, hbm_bytes: float = 15.75e9) -> bool:
    return estimate_train_hbm(cfg, batch_size, remat, zero1_dp)["total"] <= hbm_bytes
