"""Pretraining objective: three symmetric InfoNCE heads over one fused
joint-transformer call.

Capability-parity surface: /root/reference/pretrain/pretrain_model.py:8-303
(numerical parity is pinned by tests/test_pretrainer_parity.py). The
implementation is organized as four named stages, each with its own design
rationale:

  1. ``encode_towers``     — every frame / audio subsegment / token stream
                             encoded exactly once, batched for the MXU;
  2. ``fuse_streams``      — the four task streams concatenated into ONE
                             joint-transformer call;
  3. ``pool_*_targets``    — contrastive (x, y) pairs pooled out of the
                             joint outputs;
  4. ``contrastive_heads`` — learned temperatures + unit normalization.

Two structural differences from the reference by design:

  * The trainer is a single jit over a device mesh (no pmap), so stage-4
    outputs are *global* arrays; the loss's ``x @ y^T`` against the full
    target set makes XLA insert the all-gather over the dp axis on ICI
    automatically — the same global-negative denominator the reference
    builds with an explicit ``lax.all_gather(y, 'batch')``
    (pretrain_model.py:290), without hand-placed collectives.
  * Attention masking is carried as per-position (is_valid, segment_ids)
    labels end to end (see models/model.py), so stream packing works on
    both the XLA and the Pallas flash attention paths.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from merlot_reserve_tpu.models.model import MerlotReserve
from merlot_reserve_tpu.ops.pooling import one_hot_pool, unit_normalize
from merlot_reserve_tpu.tokenizer import LTOVPOOL, MASK, MASKAUDIO, PADDING

# multimodal spans are preferred 4:1 over text-only spans when drawing
# contrastive span targets (pretrain_model.py:216)
_MULTIMODAL_PREFERENCE = float(np.log(4))

# pseudo-video ids offset far past any real video_src_index so a split can
# never collide with another packed video's id (pretrain_model.py:30-33)
_SPLIT_ID_STRIDE = 4


class MerlotReservePretrainer(MerlotReserve):
    """The 4-stream contrastive pretrainer head over the MerlotReserve towers."""

    # ------------------------------------------------------------------
    # stage 1: modality towers
    # ------------------------------------------------------------------

    def encode_towers(self, batch: Dict[str, jnp.ndarray]):
        """Run each modality tower exactly once over the whole batch.

        Frames ([B*segments] through the ViT) and audio subsegments
        ([B*segments*3] through the audio tower) are encoded in single
        batched calls — large MXU-friendly matmuls instead of per-stream
        re-encodes — and all five token streams share one fused embedding
        lookup. Returns the tower outputs plus the flattened token streams
        every later stage consumes.
        """
        data = self.data
        B, num_segments_nvpatch0, patch_dim = batch["images"].shape
        patches_per_frame = self.output_grid_h * self.output_grid_w
        num_segments = num_segments_nvpatch0 // patches_per_frame
        segs_per_group = num_segments // data.num_segment_groups

        # segment sharding (long-video): tower rows are independent, so the
        # [B*segments, ...] dim can shard over segment_shard_axis in
        # addition to dp — without it a dp x sp mesh replicates the tower
        # work+saves per sp shard (parallel/mesh.py::rows_anchor)
        from merlot_reserve_tpu.parallel.mesh import rows_anchor

        seg_ax = self.config.segment_shard_axis

        vision = self.vision_encoder(rows_anchor(batch["images"].reshape(
            (B * num_segments, patches_per_frame, patch_dim)),
            extra_axis=seg_ax))
        pooled_per_frame = patches_per_frame // (self.config.vit_pooling_ratio ** 2)
        # frames regrouped by segment group: each group's frames form the
        # vision context its token streams attend over
        frames_by_group = vision["seq_attnpool"].reshape(
            [B, data.num_segment_groups, segs_per_group * pooled_per_frame,
             self.hidden_size])

        audio = self.audio_encoder(rows_anchor(batch["audio_clips"].reshape(
            (B * num_segments * data.num_audio_subsegments,
             self.audio_seq_length, -1)), extra_axis=seg_ax))
        num_audio_spans = num_segments * data.num_audio_subsegments
        audio_span_tokens = audio["seq_attnpool"].reshape(
            [B, num_audio_spans, self.audio_token_length, self.hidden_size])
        audio_span_cls = audio["cls"].reshape([B, num_audio_spans, self.hidden_size])

        # flatten the [B, n_seqs, L(,3)] token streams to [rows, L] — the
        # row axis is what the joint transformer batches over
        flat = dict(batch)
        for stream in ("text2audio", "audio2text"):
            for suffix in ("", "/audio_ptr", "/text_ptr"):
                flat[stream + suffix] = flat[stream + suffix].reshape(
                    (-1, data.lang_seq_len))
        for key in ("random_text", "random_text/text_ptr",
                    "audio_text_matching", "audio_text_matching/audio_ptr"):
            flat[key] = flat[key].reshape((-1, data.seq_len))
        flat["text_spans"] = flat["text_spans"].reshape(
            (-1, self.config.text_span_length))
        flat["video_src_index"] = flat["video_src_index"].reshape(
            -1, segs_per_group)

        token_embs = self.token_encoder(
            {k: flat[k] for k in ("text2audio", "audio2text",
                                  "audio_text_matching", "text_spans",
                                  "random_text")})

        return {
            "batch_size": B,
            "num_segments": num_segments,
            "segs_per_group": segs_per_group,
            "num_audio_spans": num_audio_spans,
            "vision_cls": vision["cls"],
            "frames_by_group": frames_by_group,
            "audio_span_tokens": audio_span_tokens,
            "audio_span_cls": audio_span_cls,
            "token_embs": token_embs,
            "flat": flat,
        }

    # ------------------------------------------------------------------
    # stage 2: stream fusion
    # ------------------------------------------------------------------

    def _split_packed_videos(self, video_src_idx, key):
        """Data augmentation: with prob ~0.1 split a packed video's segments
        into two pseudo-videos (ids offset past any real id) so short-clip
        attention patterns appear during training (pretrain_model.py:9-36)."""
        B, L = video_src_idx.shape
        if L == 1:
            return video_src_idx
        split_prob = 0.1
        probs = [split_prob / (L - 1)] * (L - 1) + [1.0 - split_prob]
        split_at = 1 + jax.random.choice(key, a=L, shape=[B], p=np.array(probs))
        is_tail = split_at[:, None] <= jnp.arange(L)[None]
        return lax.select(is_tail, video_src_idx + _SPLIT_ID_STRIDE * L,
                          video_src_idx)

    def content_keys(self, towers):
        """Content-derived PRNG: deterministic per batch, no threading of a
        host rng through the input pipeline (pretrain_model.py:96-97).
        Returns 3 keys: packed-video splits for the two vision streams, and
        the span-target Gumbel draw."""
        # jnp.asarray: under eager numpy inputs, numpy's sum would promote
        # uint32 -> uint64, which jax.random.split rejects as key data
        content_key = jnp.asarray(
            towers["flat"]["audio2text/text_ptr"], jnp.uint32
        ).sum()[None].repeat(2)
        return jax.random.split(content_key, num=3)

    def fuse_streams(self, towers, aug_keys):
        """Assemble the four task streams and run them through ONE joint
        call.

        Concatenating audio2text + audio_text_matching + text2audio +
        random_text along the row axis gives the joint transformer a single
        big batch (pretrain_model.py:140-151 does the same): one compiled
        attention/MLP schedule, full MXU tiles, and one set of collectives
        under sharding — instead of four skinny calls.
        """
        data = self.data
        flat = towers["flat"]
        B = towers["batch_size"]
        segs_per_group = towers["segs_per_group"]
        frames = towers["frames_by_group"]
        vis_len = frames.shape[-2]

        def packed_ids(n_seqs, key):
            tiled = jnp.tile(
                flat["video_src_index"].reshape(B, data.num_segment_groups,
                                                segs_per_group),
                [1, n_seqs, 1]).reshape(-1, segs_per_group)
            return self._split_packed_videos(tiled, key)

        token_embs = towers["token_embs"]
        streams = {}
        streams["audio2text"] = self.prepare_multimodal_inputs(
            tokens=flat["audio2text"],
            token_segment_idx=(flat["audio2text/audio_ptr"]
                               // data.num_audio_subsegments) % segs_per_group,
            token_embs=token_embs["audio2text"],
            vision_input=jnp.tile(frames, [1, data.num_audio2text_seqs, 1, 1]
                                  ).reshape(-1, vis_len, self.hidden_size),
            audio_spans=towers["audio_span_tokens"].repeat(
                data.num_segment_groups * data.num_audio2text_seqs, axis=0),
            audio_pointers=flat["audio2text/audio_ptr"],
            padding_len=data.seq_len,
            video_src_idx=packed_ids(data.num_audio2text_seqs, aug_keys[0]),
        )
        streams["audio_text_matching"] = self.prepare_multimodal_inputs(
            tokens=flat["audio_text_matching"],
            token_segment_idx=jnp.cumsum(
                (flat["audio_text_matching"] == LTOVPOOL).astype(jnp.int32), -1),
            token_embs=token_embs["audio_text_matching"],
            audio_spans=towers["audio_span_tokens"],
            audio_pointers=flat["audio_text_matching/audio_ptr"],
            padding_len=data.seq_len,
        )
        streams["text2audio"] = self.prepare_multimodal_inputs(
            tokens=flat["text2audio"],
            token_segment_idx=(flat["text2audio/audio_ptr"]
                               // data.num_audio_subsegments) % segs_per_group,
            token_embs=token_embs["text2audio"],
            vision_input=jnp.tile(frames, [1, data.num_text2audio_seqs, 1, 1]
                                  ).reshape(-1, vis_len, self.hidden_size),
            audio_pointers=flat["text2audio/audio_ptr"],
            padding_len=data.seq_len,
            video_src_idx=packed_ids(data.num_text2audio_seqs, aug_keys[1]),
        )
        streams["random_text"] = self.prepare_multimodal_inputs(
            tokens=flat["random_text"], padding_len=data.seq_len)

        order = sorted(streams.keys())
        rows_per_ex = [streams[k]["x"].shape[0] // B for k in order]

        # B-MAJOR fusion: every stream tensor is [B*n_k, ...] with B major,
        # so concatenating as [B, n_k, ...] along the PER-EXAMPLE axis keeps
        # dim 0 = the dp-sharded batch. A plain row-axis concat of
        # dp-sharded operands has no valid shard-local form — GSPMD
        # replicates the operands to reshard, and that mis-anchoring
        # propagated INTO the joint layer scan (full attention-score
        # all-gathers in the dp8 pod program — found by
        # scripts/pod_readiness.py's collective audit, round 4). Per-row
        # math is unchanged: same rows, same per-stream order.
        def bmajor_concat(key):
            parts = [streams[k][key].reshape((B, n) + streams[k][key].shape[1:])
                     for k, n in zip(order, rows_per_ex)]
            cat = jnp.concatenate(parts, 1)
            return cat.reshape((-1,) + cat.shape[2:])

        x = bmajor_concat("x")
        coords = bmajor_concat("rotary_coords") if self.config.do_rotary else None
        is_valid = bmajor_concat("is_valid")
        segment_ids = bmajor_concat("segment_ids")

        # anchor: rows are the dp-sharded batch dim. One constraint here
        # gives GSPMD a solid reference for the whole joint stack (the
        # analogue of the seq_shard_axis constraint in layers.py:268-275).
        if not self.is_initializing():
            from merlot_reserve_tpu.parallel.mesh import dp_anchor

            x, is_valid, segment_ids = dp_anchor(x, is_valid, segment_ids)
            if coords is not None:
                coords = dp_anchor(coords)

        fused = self.joint_transformer(
            x, rotary_coords=coords, is_valid=is_valid,
            segment_ids=segment_ids)["seq"]
        fused = self.joint_proj(fused)

        R = sum(rows_per_ex)
        fused = fused.reshape((B, R) + fused.shape[1:])
        parts = jnp.split(fused, np.cumsum(rows_per_ex)[:-1], axis=1)
        outputs = {k: p.reshape((-1,) + p.shape[2:])
                   for k, p in zip(order, parts)}
        # language positions only for the two span-target streams
        outputs["text2audio"] = outputs["text2audio"][:, :data.lang_seq_len]
        outputs["audio2text"] = outputs["audio2text"][:, :data.lang_seq_len]
        return outputs

    # ------------------------------------------------------------------
    # stage 3: target pooling
    # ------------------------------------------------------------------

    def pool_matching_targets(self, towers, stream_out):
        """imgs <-> audio head inputs: the joint state at each LTOVPOOL
        token (one per segment) against that segment's vision CLS
        (pretrain_model.py:160-166)."""
        flat = towers["flat"]
        at_pool_token = flat["audio_text_matching"] == LTOVPOOL
        segment_slot = jnp.cumsum(at_pool_token.astype(jnp.int32), -1) - 1
        pooled = one_hot_pool(
            at_pool_token, idx=segment_slot,
            v=stream_out["audio_text_matching"],
            num_segments=towers["num_segments"])["x"]
        return pooled.reshape(
            (towers["batch_size"] * towers["num_segments"], self.hidden_size))

    def pool_audio_span_targets(self, towers, stream_out):
        """text -> audio head inputs.

        Joint states pool at MASKAUDIO positions into their audio-span slot;
        of the num_audio_spans slots only the actually-masked ones carry
        signal, so the masked slots are ranked first and the top
        ``mask_rate`` fraction become (x, y) pairs against their audio CLS —
        while every *unmasked* span's CLS still joins the denominator as an
        extra negative (pretrain_model.py:170-190)."""
        data = self.data
        flat = towers["flat"]
        B = towers["batch_size"]
        num_audio_spans = towers["num_audio_spans"]

        pooled = one_hot_pool(
            do_pool=flat["text2audio"] == MASKAUDIO,
            idx=flat["text2audio/audio_ptr"],
            v=stream_out["text2audio"],
            num_segments=num_audio_spans,
            real_bsize=B,
        )
        num_targets = int(num_audio_spans * data.mask_rate) * data.num_text2audio_seqs
        times_masked = pooled["idx_oh"].sum(1)
        masked_first = jnp.argsort(-times_masked, -1)

        target_slots = masked_first[:, :num_targets].reshape(B * num_targets)
        target_rows = jnp.arange(B).repeat(num_targets)
        masked_states = pooled["x"][target_rows, target_slots]
        masked_audio_cls = towers["audio_span_cls"][target_rows, target_slots]

        negative_slots = masked_first[:, num_targets:].reshape(
            B * (num_audio_spans - num_targets))
        negative_rows = jnp.arange(B).repeat(num_audio_spans - num_targets)
        negative_audio_cls = towers["audio_span_cls"][negative_rows, negative_slots]
        return masked_states, masked_audio_cls, negative_audio_cls

    def pool_text_span_targets(self, towers, stream_out, select_key):
        """stuff -> span head inputs.

        MASK-position joint states from the three text streams sum into
        per-span slots (a span masked in several streams accumulates all of
        them); valid slots are drawn by Gumbel top-k across the WHOLE
        per-device batch with multimodal spans preferred 4:1, and the drawn
        spans' raw tokens go through the span tower as the target side
        (pretrain_model.py:196-236). Also returns each drawn span's source
        stream for the per-source diagnostic losses."""
        data = self.data
        flat = towers["flat"]
        B = towers["batch_size"]
        spans_per_example = towers["token_embs"]["text_spans"].shape[0] // B

        pools = {}
        for stream in ("audio2text", "text2audio", "random_text"):
            pools[stream] = one_hot_pool(
                flat[stream] == MASK,
                idx=flat[f"{stream}/text_ptr"],
                v=stream_out[stream],
                num_segments=spans_per_example,
                real_bsize=B,
            )
            pools[stream]["count"] = pools[stream].pop("idx_oh").sum(1)

        summed_states = (pools["text2audio"]["x"] + pools["audio2text"]["x"]
                         + pools["random_text"]["x"])
        mask_counts = (pools["text2audio"]["count"] + pools["audio2text"]["count"]
                       + pools["random_text"]["count"])
        # source id per slot: 0/1/2 = text2audio/audio2text/random_text,
        # -1 = never masked (argmax over a leading zeros column, shifted)
        source_id = jnp.stack(
            [jnp.zeros_like(mask_counts), pools["text2audio"]["count"],
             pools["audio2text"]["count"], pools["random_text"]["count"]],
            -1).argmax(-1) - 1

        span_usable = (flat["text_spans"] != PADDING).any(-1).reshape(
            B, spans_per_example)
        span_usable &= mask_counts > 0.0
        span_usable = span_usable.astype(jnp.float32)

        # Gumbel top-k without replacement over the whole per-device batch
        selection_logits = span_usable * 1e6 + _MULTIMODAL_PREFERENCE * (
            pools["text2audio"]["count"] + pools["audio2text"]["count"])
        gumbel = -jnp.log(-jnp.log(jax.random.uniform(
            key=select_key, shape=[B, spans_per_example],
            dtype=jnp.float32, minval=0.0, maxval=1.0)))

        num_drawn = data.num_text_spans_to_include
        assert num_drawn <= spans_per_example
        drawn = lax.top_k((selection_logits + gumbel).reshape(-1),
                          k=num_drawn * B)[1]

        drawn_states = summed_states.reshape(
            [B * spans_per_example, self.hidden_size])[drawn]
        drawn_sources = source_id.reshape([B * spans_per_example])[drawn]
        span_x = towers["token_embs"]["text_spans"][drawn]
        span_valid = flat["text_spans"][drawn] != PADDING
        if not self.is_initializing():
            # the global top-k gather erases row provenance; re-anchor the
            # drawn rows to dp (+ segment_shard_axis — span rows are as
            # independent as segments) so the span tower's compute shards
            # cleanly (the gather itself is the only resharding left — tiny)
            from merlot_reserve_tpu.parallel.mesh import rows_anchor

            drawn_states, span_x, span_valid = rows_anchor(
                drawn_states, span_x, span_valid,
                extra_axis=self.config.segment_shard_axis)
        span_targets = self.span_encoder(x=span_x, x_isvalid=span_valid)
        return drawn_states, span_targets, drawn_sources

    # ------------------------------------------------------------------
    # stage 4: heads
    # ------------------------------------------------------------------

    def contrastive_heads(self, head_inputs):
        """Apply the three learned temperatures (clipped at log 100, split
        exp(s/2) onto both sides) and unit-normalize, casting bf16 on TPU so
        the loss's global gather moves half the bytes
        (pretrain_model.py:239-258)."""
        log_scales = jnp.clip(self.scale_params.astype(jnp.float32),
                              max=np.log(100.0))
        scale_slot = {"imgs_to_audio": 0, "text_to_audio": 1,
                      "stuff_to_span": 2}
        for name, head in head_inputs.items():
            temp = jnp.exp(log_scales[scale_slot[name]] / 2.0)
            for side in ("x", "y", "x_extra", "y_extra"):
                if side in head:
                    v = unit_normalize(head[side]) * temp
                    if self.config.use_bfloat16:
                        v = v.astype(jnp.bfloat16)
                    head[side] = v
        return head_inputs

    # ------------------------------------------------------------------

    def __call__(self, batch: Dict[str, jnp.ndarray]):
        towers = self.encode_towers(batch)
        aug_keys = self.content_keys(towers)
        stream_out = self.fuse_streams(towers, aug_keys)

        seg_states = self.pool_matching_targets(towers, stream_out)
        t2a_x, t2a_y, t2a_negatives = self.pool_audio_span_targets(
            towers, stream_out)
        span_x, span_y, span_sources = self.pool_text_span_targets(
            towers, stream_out, aug_keys[2])

        return self.contrastive_heads({
            "imgs_to_audio": {"x": seg_states, "y": towers["vision_cls"]},
            "text_to_audio": {"x": t2a_x, "y": t2a_y, "y_extra": t2a_negatives},
            "stuff_to_span": {"x": span_x, "y": span_y,
                              "_sources": span_sources},
        })


def loss_fn_given_preds(preds: Dict) -> tuple:
    """Symmetric InfoNCE per head over the full global batch of targets
    (pretrain_model.py:262-303). Keys prefixed '_' are diagnostics excluded
    from the total."""
    loss_info = {}
    for c_type, c_dict in preds.items():
        numer_logits = (c_dict["x"] * c_dict["y"]).sum(-1)
        loss_info[c_type] = 0.0
        if "_sources" in c_dict:
            for k in ["text2audio", "audio2text", "random_text"]:
                loss_info[f"_{c_type}_from_{k}"] = 0.0

        for k1, k2 in ("xy", "yx"):
            x = c_dict[k1]
            y = c_dict[k2]
            if f"{k2}_extra" in c_dict:
                y = jnp.concatenate([y, c_dict[f"{k2}_extra"]])
            # y is global under jit — XLA all-gathers it over the dp axis to
            # build the full-denominator logits, same as the reference's
            # explicit lax.all_gather(y, 'batch').
            denom_logits = jnp.einsum("lh,vh->lv", x, y)
            denom_lse = jax.nn.logsumexp(denom_logits.astype(jnp.float32), axis=-1)
            loss_info[c_type] += (denom_lse - numer_logits).mean() / 2.0
            if "_sources" in c_dict:
                for i, type_i in enumerate(["text2audio", "audio2text", "random_text"]):
                    does_match = (c_dict["_sources"] == i).astype(jnp.float32)
                    loss_match = ((denom_lse - numer_logits) * does_match).sum() / (
                        does_match.sum() + 1e-5)
                    loss_info[f"_{c_type}_from_{type_i}"] += loss_match / 2.0

    loss = sum(v for k, v in loss_info.items() if not k.startswith("_"))
    return loss, loss_info
