"""Pretraining objective: three symmetric InfoNCE heads over one fused
joint-transformer call.

Behavior matches /root/reference/pretrain/pretrain_model.py:8-303 with one
structural difference: the reference runs under pmap and explicitly
``lax.all_gather``s contrastive targets across the 'batch' axis
(pretrain_model.py:290) to build the global-negative denominator. Here the
trainer is a single jit over a device mesh, so ``x`` and ``y`` are *global*
arrays; the einsum ``x @ y_all^T`` against the full target set makes XLA
insert the all-gather over the dp axis on ICI automatically, with the same
semantics (every chip sees the full global batch of negatives).

The four token streams (audio2text, audio_text_matching, text2audio,
random_text) are still concatenated into ONE joint-transformer call
(pretrain_model.py:140-151) — a single big MXU-friendly batch instead of four
small ones.
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


class MerlotReservePretrainer(MerlotReserve):
    def _augment_video_src_idx(self, video_src_idx, prng_key):
        """With prob ~0.1 split a packed video's segments into two pseudo-videos
        (offset +4L) so short-clip attention patterns appear in training
        (pretrain_model.py:9-36)."""
        B, L = video_src_idx.shape
        if L == 1:
            return video_src_idx
        split_prob = 0.1
        probs = [split_prob / (L - 1)] * (L - 1) + [1.0 - split_prob]
        split_from_here = 1 + jax.random.choice(prng_key, a=L, shape=[B], p=np.array(probs))
        split_mask = split_from_here[:, None] <= jnp.arange(L)[None]
        return lax.select(split_mask, video_src_idx + 4 * L, video_src_idx)

    def __call__(self, batch: Dict[str, jnp.ndarray]):
        data = self.data
        num_segment_groups = data.num_segment_groups
        num_audio_subsegments = data.num_audio_subsegments
        lang_seq_len = data.lang_seq_len
        seq_len = data.seq_len
        text_span_length = self.config.text_span_length

        batch_size, num_segments_nvpatch0, pp3 = batch["images"].shape
        nvpatch0 = self.output_grid_h * self.output_grid_w
        num_segments = num_segments_nvpatch0 // nvpatch0
        num_segments_per_group = num_segments // num_segment_groups

        # ---- encode every frame once, every audio subsegment once ----
        imgs_enc = self.vision_encoder(
            batch["images"].reshape((batch_size * num_segments, nvpatch0, pp3)))
        nvpatch1 = nvpatch0 // (self.config.vit_pooling_ratio ** 2)
        imgs_seq = imgs_enc["seq_attnpool"].reshape(
            [batch_size, num_segment_groups, num_segments_per_group * nvpatch1,
             self.hidden_size])
        vis_seq_length = imgs_seq.shape[-2]

        audio_enc = self.audio_encoder(batch["audio_clips"].reshape(
            (batch_size * num_segments * num_audio_subsegments, self.audio_seq_length, -1)))
        num_audio_spans = num_segments * num_audio_subsegments
        audio_seq = audio_enc["seq_attnpool"].reshape(
            [batch_size, num_audio_spans, self.audio_token_length, self.hidden_size])
        audio_cls = audio_enc["cls"].reshape([batch_size, num_audio_spans, self.hidden_size])

        # ---- flatten the token streams ----
        batch = dict(batch)
        for k1 in ["text2audio", "audio2text"]:
            for k2 in ["", "/audio_ptr", "/text_ptr"]:
                batch[k1 + k2] = batch[k1 + k2].reshape((-1, lang_seq_len))
        for k in ["random_text", "random_text/text_ptr", "audio_text_matching",
                  "audio_text_matching/audio_ptr"]:
            batch[k] = batch[k].reshape((-1, seq_len))
        batch["text_spans"] = batch["text_spans"].reshape((-1, text_span_length))

        txt_embs = self.token_encoder(
            {k: batch[k] for k in ["text2audio", "audio2text", "audio_text_matching",
                                   "text_spans", "random_text"]})

        batch["video_src_index"] = batch["video_src_index"].reshape(-1, num_segments_per_group)

        # content-derived PRNG (pretrain_model.py:96-97): deterministic per batch
        prng_0 = batch["audio2text/text_ptr"].astype(jnp.uint32).sum()[None].repeat(2)
        prngs = jax.random.split(prng_0, num=3)

        num_audio2text_seqs = data.num_audio2text_seqs
        num_text2audio_seqs = data.num_text2audio_seqs

        def group_src_idx(n_seqs, prng):
            tiled = jnp.tile(
                batch["video_src_index"].reshape(batch_size, num_segment_groups,
                                                 num_segments_per_group),
                [1, n_seqs, 1]).reshape(-1, num_segments_per_group)
            return self._augment_video_src_idx(tiled, prng)

        mm_inputs = {}
        mm_inputs["audio2text"] = self.prepare_multimodal_inputs(
            tokens=batch["audio2text"],
            token_segment_idx=(batch["audio2text/audio_ptr"] // num_audio_subsegments)
            % num_segments_per_group,
            token_embs=txt_embs["audio2text"],
            vision_input=jnp.tile(imgs_seq, [1, num_audio2text_seqs, 1, 1]).reshape(
                -1, vis_seq_length, self.hidden_size),
            audio_spans=audio_seq.repeat(num_segment_groups * num_audio2text_seqs, axis=0),
            audio_pointers=batch["audio2text/audio_ptr"],
            padding_len=seq_len,
            video_src_idx=group_src_idx(num_audio2text_seqs, prngs[0]),
        )
        mm_inputs["audio_text_matching"] = self.prepare_multimodal_inputs(
            tokens=batch["audio_text_matching"],
            token_segment_idx=jnp.cumsum(
                (batch["audio_text_matching"] == LTOVPOOL).astype(jnp.int32), -1),
            token_embs=txt_embs["audio_text_matching"],
            audio_spans=audio_seq,
            audio_pointers=batch["audio_text_matching/audio_ptr"],
            padding_len=seq_len,
        )
        mm_inputs["text2audio"] = self.prepare_multimodal_inputs(
            tokens=batch["text2audio"],
            token_segment_idx=(batch["text2audio/audio_ptr"] // num_audio_subsegments)
            % num_segments_per_group,
            token_embs=txt_embs["text2audio"],
            vision_input=jnp.tile(imgs_seq, [1, num_text2audio_seqs, 1, 1]).reshape(
                -1, vis_seq_length, self.hidden_size),
            audio_pointers=batch["text2audio/audio_ptr"],
            padding_len=seq_len,
            video_src_idx=group_src_idx(num_text2audio_seqs, prngs[1]),
        )
        mm_inputs["random_text"] = self.prepare_multimodal_inputs(
            tokens=batch["random_text"], padding_len=seq_len)

        # ---- ONE joint transformer call over all four streams ----
        keys = sorted(mm_inputs.keys())
        x = jnp.concatenate([mm_inputs[k]["x"] for k in keys], 0)
        coords = jnp.concatenate([mm_inputs[k]["rotary_coords"] for k in keys], 0)
        is_valid = jnp.concatenate([mm_inputs[k]["is_valid"] for k in keys], 0)
        segment_ids = jnp.concatenate([mm_inputs[k]["segment_ids"] for k in keys], 0)
        real_bsizes = [mm_inputs[k]["x"].shape[0] for k in keys]

        joint_enc = self.joint_transformer(
            x,
            rotary_coords=coords if self.config.do_rotary else None,
            is_valid=is_valid,
            segment_ids=segment_ids)["seq"]
        joint_enc = self.joint_proj(joint_enc)
        mm_outputs = {k: z for k, z in zip(keys, jnp.split(joint_enc, np.cumsum(real_bsizes),
                                                           axis=0))}
        mm_outputs["text2audio"] = mm_outputs["text2audio"][:, :lang_seq_len]
        mm_outputs["audio2text"] = mm_outputs["audio2text"][:, :lang_seq_len]

        # ---- pool targets (pretrain_model.py:157-236) ----
        # imgs <-> audio: pool at LTOVPOOL vs vision CLS
        is_pool = batch["audio_text_matching"] == LTOVPOOL
        v2a_idx = jnp.cumsum(is_pool.astype(jnp.int32), -1) - 1
        a2v = one_hot_pool(is_pool, idx=v2a_idx, v=mm_outputs["audio_text_matching"],
                           num_segments=num_segments)["x"].reshape(
            (batch_size * num_segments, self.hidden_size))

        # text -> audio: pool at MASKAUDIO by audio_ptr; top-k to the spans that
        # were actually masked, leftover audio CLS become extra negatives
        t2a_sel = one_hot_pool(
            do_pool=batch["text2audio"] == MASKAUDIO,
            idx=batch["text2audio/audio_ptr"],
            v=mm_outputs["text2audio"],
            num_segments=num_audio_spans,
            real_bsize=batch_size,
        )
        num_audio_spans_trg = int(num_audio_spans * data.mask_rate) * num_text2audio_seqs
        is_selected = t2a_sel["idx_oh"].sum(1)
        idx_sort = jnp.argsort(-is_selected, -1)

        best_idxs = idx_sort[:, :num_audio_spans_trg].reshape(batch_size * num_audio_spans_trg)
        batch_indexer = jnp.arange(batch_size).repeat(num_audio_spans_trg)
        t2a_x = t2a_sel["x"][batch_indexer, best_idxs]
        a2t_y = audio_cls[batch_indexer, best_idxs]

        extra_idxs = idx_sort[:, num_audio_spans_trg:].reshape(
            batch_size * (num_audio_spans - num_audio_spans_trg))
        batch_indexer = jnp.arange(batch_size).repeat(num_audio_spans - num_audio_spans_trg)
        a2t_extra = audio_cls[batch_indexer, extra_idxs]

        # stuff -> span: sum pooled MASK positions from the 3 text streams
        num_text_spans = txt_embs["text_spans"].shape[0] // batch_size
        t2sp = {}
        for k in ["audio2text", "text2audio", "random_text"]:
            t2sp[k] = one_hot_pool(
                batch[k] == MASK,
                idx=batch[f"{k}/text_ptr"],
                v=mm_outputs[k],
                num_segments=num_text_spans,
                real_bsize=batch_size,
            )
            t2sp[k]["count"] = t2sp[k].pop("idx_oh").sum(1)
        t2sp_sel = t2sp["text2audio"]["x"] + t2sp["audio2text"]["x"] + t2sp["random_text"]["x"]
        t2sp_ct = t2sp["text2audio"]["count"] + t2sp["audio2text"]["count"] + t2sp["random_text"]["count"]
        t2sp_src = jnp.stack(
            [jnp.zeros_like(t2sp["text2audio"]["count"]), t2sp["text2audio"]["count"],
             t2sp["audio2text"]["count"], t2sp["random_text"]["count"]], -1).argmax(-1) - 1

        is_valid_span = (batch["text_spans"] != PADDING).any(-1).reshape(
            batch_size, num_text_spans)
        is_valid_span &= t2sp_ct > 0.0
        is_valid_span = is_valid_span.astype(jnp.float32)

        # Gumbel-top-k without replacement; multimodal spans preferred 4x
        prefer_multimodal = np.log(4)
        logits_for_pred = is_valid_span * 1e6 + prefer_multimodal * (
            t2sp["text2audio"]["count"] + t2sp["audio2text"]["count"])
        z = -jnp.log(-jnp.log(jax.random.uniform(
            key=prngs[2], shape=[batch_size, num_text_spans], dtype=jnp.float32,
            minval=0.0, maxval=1.0)))
        gumbel_scores = logits_for_pred + z

        num_to_include = data.num_text_spans_to_include
        assert num_to_include <= num_text_spans
        best_idxs = lax.top_k(gumbel_scores.reshape(-1), k=num_to_include * batch_size)[1]

        t2sp_x = t2sp_sel.reshape([batch_size * num_text_spans, self.hidden_size])[best_idxs]
        t2sp_source = t2sp_src.reshape([batch_size * num_text_spans])[best_idxs]
        sp2t_y = self.span_encoder(
            x=txt_embs["text_spans"][best_idxs],
            x_isvalid=batch["text_spans"][best_idxs] != PADDING)

        # ---- scale + normalize the three heads ----
        log_scales = jnp.clip(self.scale_params.astype(jnp.float32), max=np.log(100.0))
        outputs = {
            "imgs_to_audio": {"x": a2v, "y": imgs_enc["cls"], "log_scale": log_scales[0]},
            "text_to_audio": {"x": t2a_x, "y": a2t_y, "y_extra": a2t_extra,
                              "log_scale": log_scales[1]},
            "stuff_to_span": {"x": t2sp_x, "y": sp2t_y, "log_scale": log_scales[2],
                              "_sources": t2sp_source},
        }
        for k, out_k in outputs.items():
            temp = jnp.exp(out_k.pop("log_scale") / 2.0)
            for k2 in ("x", "y", "x_extra", "y_extra"):
                if k2 in out_k:
                    v = unit_normalize(out_k[k2]) * temp
                    if self.config.use_bfloat16:
                        v = v.astype(jnp.bfloat16)
                    out_k[k2] = v
        return outputs


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
