"""Finetuning task heads: VCR (QA + QA->R jointly) and TVQA (subtitles vs
audio streams). Behavior matches /root/reference/finetune/vcr/
qa_qar_joint_finetune.py:144-170 and finetune/tvqa/tvqa_finetune.py:156-258,
with masks carried as per-position labels (the reference's dense
attention-mask splicing becomes 1-D slices here).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from merlot_reserve_tpu.models.model import MerlotReserve
from merlot_reserve_tpu.ops.pooling import unit_normalize
from merlot_reserve_tpu.tokenizer import AUDIOSPAN, MASK


class MerlotReserveVCR(MerlotReserve):
    """One image, 2 tasks x 4 options, each option ending in MASK; logit =
    proj(hidden at MASK)."""

    def setup(self):
        super().setup()
        self.proj = nn.Dense(features=1, dtype=self.dtype,
                             kernel_init=jax.nn.initializers.normal(stddev=0.02),
                             name="proj", use_bias=False)

    def __call__(self, batch: Dict) -> jnp.ndarray:
        batch_size, two_, num_ans_per, token_length = batch["answers"].shape
        answers2d = batch["answers"].reshape(batch_size * 2 * num_ans_per, token_length)

        imgs_enc = self.vision_encoder(batch["image"])["seq_attnpool"].repeat(
            2 * num_ans_per, axis=0)

        mm_inputs = self.prepare_multimodal_inputs(
            tokens=answers2d,
            token_segment_idx=jnp.zeros_like(answers2d),
            vision_input=imgs_enc,
        )
        joint = self._run_joint(mm_inputs)["seq"][:, :token_length]

        pool_idx = jnp.argmax((answers2d == MASK).astype(jnp.float32), 1)
        pooled = joint[jnp.arange(batch_size * 2 * num_ans_per), pool_idx]
        return self.proj(pooled).reshape([batch_size, 2, num_ans_per])


def tvqa_pool_mask_hidden(model: MerlotReserve, batch: Dict
                          ) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """The TVQA two-stream fusion shared by the finetune head and zero-shot
    ranking: encode 7 frames (+ a zero question slot) and audio once, fuse
    the subtitles-as-text and audio-as-AUDIOSPAN streams through one joint
    call, and pool the hidden state at each sequence's MASK.

    Returns ``(pooled [batch*2*num_ans, H], (batch_size, num_ans))`` with the
    audio-stream rows first (tvqa_finetune.py:156-258 ordering).
    """
    batch_size, images_per_batch, seq_size, img_dim = batch["images"].shape
    imgs_enc = model.vision_encoder(
        batch["images"].reshape(batch_size * images_per_batch, seq_size, img_dim)
    )["seq_attnpool"]
    imgs_enc = imgs_enc.reshape(batch_size, images_per_batch, seq_size // 4,
                                model.hidden_size)
    # zero "first image" slot for the question segment
    imgs_enc = jnp.concatenate(
        [jnp.zeros([batch_size, 1, seq_size // 4, model.hidden_size],
                   dtype=imgs_enc.dtype), imgs_enc], 1)
    images_per_batch += 1

    batch_size, num_ans_per, joint_seq_len, _two = batch["textonly_seqs"].shape
    imgs_enc = imgs_enc.reshape(
        batch_size, images_per_batch * seq_size // 4, model.hidden_size
    ).repeat(num_ans_per, axis=0)

    text_toks = batch["textonly_seqs"][..., 0].reshape(-1, joint_seq_len)
    textonly_inputs = model.prepare_multimodal_inputs(
        tokens=text_toks,
        token_segment_idx=batch["textonly_seqs"][..., 1].reshape(-1, joint_seq_len),
        vision_input=imgs_enc,
    )

    bs_, num_segments, nsub, audio_seq_len, num_mels = batch["audio_clips"].shape
    audio_enc = model.audio_encoder(
        batch["audio_clips"].reshape(-1, audio_seq_len, num_mels))["seq_attnpool"]
    _n, audio_token_len, hsz = audio_enc.shape
    num_audio_spans = num_segments * nsub
    audio_enc = audio_enc.reshape(batch_size, num_audio_spans, audio_token_len, hsz)
    audio_enc = audio_enc.repeat(num_ans_per, axis=0)

    audio_toks = batch["audio_seqs"][..., 0].reshape(-1, joint_seq_len)
    audio_pointers = (jnp.cumsum((audio_toks == AUDIOSPAN).astype(jnp.int32), -1)
                      - 1) // audio_token_len
    audio_pointers = audio_pointers % num_audio_spans

    audio_inputs = model.prepare_multimodal_inputs(
        tokens=audio_toks,
        token_segment_idx=batch["audio_seqs"][..., 1].reshape(-1, joint_seq_len),
        vision_input=imgs_enc,
        audio_spans=audio_enc,
        audio_pointers=audio_pointers,
    )

    # splice out the dummy first image's pooled tokens — with label-based
    # masks this is a plain 1-D slice per field (the reference slices a
    # dense [L, L] mask, tvqa_finetune.py:211-224)
    start_imgs = joint_seq_len + seq_size // 4

    def splice(d):
        return {k: jnp.concatenate([v[:, :joint_seq_len], v[:, start_imgs:]], 1)
                for k, v in d.items()}

    textonly_inputs = splice(textonly_inputs)
    audio_inputs = splice(audio_inputs)

    x = jnp.concatenate([audio_inputs["x"], textonly_inputs["x"]], 0)
    coords = jnp.concatenate(
        [audio_inputs["rotary_coords"], textonly_inputs["rotary_coords"]], 0)
    is_valid = jnp.concatenate(
        [audio_inputs["is_valid"], textonly_inputs["is_valid"]], 0)
    segment_ids = jnp.concatenate(
        [audio_inputs["segment_ids"], textonly_inputs["segment_ids"]], 0)

    joint = model.joint_transformer(
        x, rotary_coords=coords if model.config.do_rotary else None,
        is_valid=is_valid, segment_ids=segment_ids)["seq"]
    joint = joint[:, :joint_seq_len].reshape(
        batch_size * 2 * num_ans_per, joint_seq_len, model.hidden_size)

    pool_idx = jnp.argmax(
        (jnp.concatenate([audio_toks, text_toks], 0) == MASK).astype(jnp.float32), 1)
    pooled = joint[jnp.arange(batch_size * 2 * num_ans_per), pool_idx]
    return pooled, (batch_size, num_ans_per)


class MerlotReserveTVQA(MerlotReserve):
    """7 frames with audio + subtitles; two parallel streams (subtitles-as-text
    and audio-as-AUDIOSPAN) answered jointly. A zero 'first image' slot holds
    the question segment and is spliced out of the joint sequence."""

    def setup(self):
        super().setup()
        self.proj = nn.Dense(features=1, dtype=self.dtype,
                             kernel_init=jax.nn.initializers.normal(stddev=0.02),
                             name="proj", use_bias=False)

    def __call__(self, batch: Dict) -> Tuple[jnp.ndarray, jnp.ndarray]:
        pooled, (batch_size, num_ans_per) = tvqa_pool_mask_hidden(self, batch)
        logits = jnp.squeeze(self.proj(pooled), -1)

        logits_from_audio, logits_from_text = jnp.split(logits, 2, axis=0)
        return (logits_from_audio.reshape(batch_size, num_ans_per),
                logits_from_text.reshape(batch_size, num_ans_per))


class MerlotReserveTVQAZeroShot(MerlotReserve):
    """Batched zero-shot TVQA (BASELINE.json config 2): no finetuned head.

    Each example carries ONE statement sequence per stream — the question +
    'answer:' ending in MASK (the answer slot), with subtitles or AUDIOSPAN
    context rows — instead of the finetune model's 5 per-answer sequences.
    The MASK hidden state goes through the PRETRAINED ``joint_proj`` (the
    mask-infilling head the contrastive objective trained,
    modeling.py:806-843) and is ranked against the 5 candidate answers
    embedded by the span encoder — per-question ``get_label_space``
    semantics (modeling.py:1024-1032), batched. 5x cheaper per example than
    the finetune forward (one joint row per stream, not one per answer).
    """

    def __call__(self, batch: Dict) -> Tuple[jnp.ndarray, jnp.ndarray]:
        pooled, (batch_size, num_ans_per) = tvqa_pool_mask_hidden(self, batch)
        # num_ans_per is 1 here: one MASK statement per stream
        h = unit_normalize(self.joint_proj(pooled)).reshape(
            2, batch_size * num_ans_per, self.hidden_size)

        n_opt, span_len = batch["answers"].shape[-2:]
        opts = self.embed_text_spans_only(
            batch["answers"].reshape(-1, span_len)
        ).reshape(batch_size, n_opt, self.hidden_size)

        logits = jnp.einsum("sbh,boh->sbo", h, opts)
        return logits[0], logits[1]  # audio stream, text stream (cosine)


class MerlotReserveVCRZeroShot(MerlotReserve):
    """Batched zero-shot VCR: one image, two MASK statements per example
    (QA: question + 'answer: <MASK>'; QA->R: question+answer +
    'rationale: <MASK>'); the 4 choices per task are span-encoded and ranked
    against the joint_proj'd MASK hidden state."""

    def __call__(self, batch: Dict) -> jnp.ndarray:
        batch_size, n_tasks, token_length = batch["statements"].shape
        stmts = batch["statements"].reshape(batch_size * n_tasks, token_length)

        imgs_enc = self.vision_encoder(batch["image"])["seq_attnpool"].repeat(
            n_tasks, axis=0)
        mm_inputs = self.prepare_multimodal_inputs(
            tokens=stmts,
            token_segment_idx=jnp.zeros_like(stmts),
            vision_input=imgs_enc,
        )
        joint = self._run_joint(mm_inputs)["seq"][:, :token_length]

        pool_idx = jnp.argmax((stmts == MASK).astype(jnp.float32), 1)
        pooled = joint[jnp.arange(batch_size * n_tasks), pool_idx]
        h = unit_normalize(self.joint_proj(pooled)).reshape(
            batch_size, n_tasks, self.hidden_size)

        n_opt, span_len = batch["answers"].shape[-2:]
        opts = self.embed_text_spans_only(
            batch["answers"].reshape(-1, span_len)
        ).reshape(batch_size, n_tasks, n_opt, self.hidden_size)
        return jnp.einsum("bth,btoh->bto", h, opts)  # cosine logits


def adapt_pretrained_params(params: Dict, hidden_size: int, drop_audio: bool = False,
                            seed: int = 123456) -> Dict:
    """Prepare pretrained params for finetuning: drop unused towers, add the
    proj head (qa_qar_joint_finetune.py:181-185)."""
    params = dict(params)
    for k in (["audio_encoder"] if drop_audio else []) + ["head", "span_encoder"]:
        params.pop(k, None)
    rng = np.random.RandomState(seed)
    params["proj"] = {"kernel": (rng.randn(hidden_size, 1) * 0.01).astype(np.float32)}
    return params
