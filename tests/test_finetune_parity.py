"""Finetune-head parity: VCR and TVQA logits against the reference's own
modules driven by the same params (CPU, f32).

The reference's task classes live in scripts that run argparse + dataset IO
at import time (finetune/vcr/qa_qar_joint_finetune.py,
finetune/tvqa/tvqa_finetune.py), so they cannot be imported; the thin task
heads (~20 glue lines each) are reconstructed here ON TOP OF the reference's
own ``mreserve.modeling.MerlotReserve`` (vision/audio encoders,
prepare_multimodal_inputs with its dense attention_mask, joint transformer —
all the reference's code). Mirrors qa_qar_joint_finetune.py:144-170 and
tvqa_finetune.py:155-264.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import merlot_reserve_tpu as mr
from merlot_reserve_tpu.finetune.models import (
    MerlotReserveTVQA,
    MerlotReserveVCR,
    adapt_pretrained_params,
)
from merlot_reserve_tpu.tokenizer import AUDIOSPAN, MASK

ATOL = 2e-4


def _tiny_cfg(**data_overrides):
    cfg = mr.load_config("base", hidden_size=64, joint_num_layers=2,
                         vit_num_layers=2, audio_num_layers=2, span_num_layers=2,
                         size_per_head=32, output_grid=(4, 4), use_bfloat16=False,
                         scan_layers=False)
    return cfg.replace_data(**data_overrides)


_REF_CFG_MODEL = {
    "hidden_size": 64, "joint_num_layers": 2, "use_bfloat16": False,
    "audio_num_layers": 2, "audio_patch_size": 2, "audio_seq_length": 60,
    "audio_token_length": 6, "output_grid": [4, 4], "vit_patch_size": 16,
    "vit_pooling_ratio": 2, "vit_num_layers": 2, "span_num_layers": 2,
    "text_span_length": 15, "size_per_head": 32,
}


def test_vcr_logits_parity(reference_modeling):
    import flax.linen as nn

    class RefVCR(reference_modeling.MerlotReserve):
        # qa_qar_joint_finetune.py:144-170
        def setup(self):
            super().setup()
            self.proj = nn.Dense(features=1, dtype=self.dtype,
                                 kernel_init=jax.nn.initializers.normal(stddev=0.02),
                                 name="proj", use_bias=False)

        def __call__(self, batch):
            batch_size, two_, num_ans_per, token_length = batch["answers"].shape
            answers2d = batch["answers"].reshape(
                batch_size * 2 * num_ans_per, token_length)
            imgs_enc = self.vision_encoder(batch["image"])["seq_attnpool"].repeat(
                2 * num_ans_per, axis=0)
            mm_inputs = self.prepare_multimodal_inputs(
                tokens=answers2d,
                token_segment_idx=jnp.zeros(
                    [batch_size * 2 * num_ans_per, token_length], dtype=jnp.int32),
                vision_input=imgs_enc,
            )
            joint_encoding = self.joint_transformer(**mm_inputs)["seq"]
            joint_encoding = joint_encoding[:, :token_length].reshape(
                batch_size * 2 * num_ans_per, token_length, self.hidden_size)
            pool_idx = jnp.argmax((answers2d == MASK).astype(jnp.float32), 1)
            pooled_h = joint_encoding[
                jnp.arange(batch_size * 2 * num_ans_per), pool_idx]
            return self.proj(pooled_h).reshape([batch_size, 2, num_ans_per])

    cfg = _tiny_cfg(lang_seq_len=24)
    mine = MerlotReserveVCR.from_config(cfg)
    ref = RefVCR.from_config({"data": {}, "model": dict(_REF_CFG_MODEL)})

    rng = np.random.RandomState(0)
    answers = rng.randint(10, 30000, (2, 2, 4, 24)).astype(np.int32)
    answers[..., -1] = MASK
    batch = {
        "image": rng.randn(2, 16, 768).astype(np.float32),
        "answers": answers,
        "labels": rng.randint(0, 4, (2, 2)).astype(np.int32),
    }
    params = mine.init_params(batch)
    params = adapt_pretrained_params(dict(params), cfg.model.hidden_size,
                                     drop_audio=True)

    bd = {k: jnp.asarray(v) for k, v in batch.items()}
    out_mine = mine.apply({"params": params}, bd)
    out_ref = ref.apply({"params": params}, bd)
    assert out_mine.shape == out_ref.shape == (2, 2, 4)
    np.testing.assert_allclose(np.asarray(out_mine), np.asarray(out_ref),
                               atol=ATOL)


def test_tvqa_logits_parity(reference_modeling):
    import flax.linen as nn

    class RefTVQA(reference_modeling.MerlotReserve):
        # tvqa_finetune.py:155-264
        def setup(self):
            super().setup()
            self.proj = nn.Dense(features=1, dtype=self.dtype,
                                 kernel_init=jax.nn.initializers.normal(stddev=0.02),
                                 name="proj", use_bias=False)

        def __call__(self, batch):
            batch_size, images_per_batch, seq_size, img_dim = batch["images"].shape
            imgs_enc = self.vision_encoder(batch["images"].reshape(
                batch_size * images_per_batch, seq_size, img_dim))["seq_attnpool"]
            imgs_enc = imgs_enc.reshape(batch_size, images_per_batch,
                                        seq_size // 4, self.hidden_size)
            imgs_enc = jnp.concatenate([
                jnp.zeros([batch_size, 1, seq_size // 4, self.hidden_size],
                          dtype=imgs_enc.dtype), imgs_enc], 1)
            images_per_batch += 1
            batch_size, num_ans_per, joint_seq_len, two_ = batch["textonly_seqs"].shape
            imgs_enc = imgs_enc.reshape(
                batch_size, images_per_batch * seq_size // 4,
                self.hidden_size).repeat(num_ans_per, axis=0)

            text_toks = batch["textonly_seqs"][..., 0].reshape(
                batch_size * num_ans_per, joint_seq_len)
            textonly_inputs = self.prepare_multimodal_inputs(
                tokens=text_toks,
                token_segment_idx=batch["textonly_seqs"][..., 1].reshape(
                    batch_size * num_ans_per, joint_seq_len),
                vision_input=imgs_enc,
            )

            bsz, n_seg, n_sub, audio_seq_len, num_mels = batch["audio_clips"].shape
            audio_enc = self.audio_encoder(batch["audio_clips"].reshape(
                -1, audio_seq_len, num_mels))["seq_attnpool"]
            _, audio_token_len, hidden_size = audio_enc.shape
            num_audio_spans = n_seg * n_sub
            audio_enc = audio_enc.reshape(bsz, num_audio_spans, audio_token_len,
                                          hidden_size).repeat(num_ans_per, axis=0)

            audio_toks = batch["audio_seqs"][..., 0].reshape(
                batch_size * num_ans_per, joint_seq_len)
            audio_pointers = (jnp.cumsum(
                (audio_toks == AUDIOSPAN).astype(jnp.int32), -1) - 1) // audio_token_len
            audio_pointers = audio_pointers % num_audio_spans
            audio_inputs = self.prepare_multimodal_inputs(
                tokens=audio_toks,
                token_segment_idx=batch["audio_seqs"][..., 1].reshape(
                    batch_size * num_ans_per, joint_seq_len),
                vision_input=imgs_enc,
                audio_spans=audio_enc,
                audio_pointers=audio_pointers,
            )
            start_imgs = joint_seq_len + seq_size // 4
            for k in ["x", "rotary_coords", "attention_mask"]:
                textonly_inputs[k] = jnp.concatenate(
                    [textonly_inputs[k][:, :joint_seq_len],
                     textonly_inputs[k][:, start_imgs:]], 1)
                audio_inputs[k] = jnp.concatenate(
                    [audio_inputs[k][:, :joint_seq_len],
                     audio_inputs[k][:, start_imgs:]], 1)
            textonly_inputs["attention_mask"] = jnp.concatenate(
                [textonly_inputs["attention_mask"][:, :, :joint_seq_len],
                 textonly_inputs["attention_mask"][:, :, start_imgs:]], 2)
            audio_inputs["attention_mask"] = jnp.concatenate(
                [audio_inputs["attention_mask"][:, :, :joint_seq_len],
                 audio_inputs["attention_mask"][:, :, start_imgs:]], 2)

            x = jnp.concatenate([audio_inputs["x"], textonly_inputs["x"]], 0)
            coords = jnp.concatenate([audio_inputs["rotary_coords"],
                                      textonly_inputs["rotary_coords"]], 0)
            attnmask = jnp.concatenate([audio_inputs["attention_mask"],
                                        textonly_inputs["attention_mask"]], 0)
            joint_enc = self.joint_transformer(
                x, rotary_coords=coords, attention_mask=attnmask)["seq"]
            joint_enc = joint_enc[:, :joint_seq_len].reshape(
                batch_size * 2 * num_ans_per, joint_seq_len, self.hidden_size)
            pool_idx = jnp.argmax((jnp.concatenate([audio_toks, text_toks], 0)
                                   == MASK).astype(jnp.float32), 1)
            pooled_h = joint_enc[jnp.arange(batch_size * 2 * num_ans_per), pool_idx]
            joint_enc = jnp.squeeze(self.proj(pooled_h), -1)
            logits_from_audio, logits_from_text = jnp.split(joint_enc, 2, axis=0)
            return (logits_from_audio.reshape(batch_size, num_ans_per),
                    logits_from_text.reshape(batch_size, num_ans_per))

    num_segments, lang_seq = 3, 32
    cfg = _tiny_cfg(lang_seq_len=lang_seq, num_segments=num_segments)
    mine = MerlotReserveTVQA.from_config(cfg)
    ref = RefTVQA.from_config({"data": {}, "model": dict(_REF_CFG_MODEL)})

    rng = np.random.RandomState(0)
    bsz = 2
    text = rng.randint(10, 30000, (bsz, 5, lang_seq)).astype(np.int32)
    text[:, :, 5] = MASK
    seg_ids = np.minimum(np.arange(lang_seq) // (lang_seq // (num_segments + 1)),
                         num_segments).astype(np.int32)
    textonly = np.stack([text, np.broadcast_to(seg_ids, text.shape)], -1)
    audio = text.copy()
    audio[:, :, 8:8 + 12] = AUDIOSPAN
    audio_seqs = np.stack([audio, np.broadcast_to(seg_ids, audio.shape)], -1)
    batch = {
        "images": rng.randn(bsz, num_segments, 16, 768).astype(np.float32),
        "audio_clips": rng.randn(bsz, num_segments, 3, 60, 65).astype(np.float32),
        "textonly_seqs": textonly.astype(np.int32),
        "audio_seqs": audio_seqs.astype(np.int32),
        "labels": rng.randint(0, 5, (bsz,)).astype(np.int32),
    }
    params = mine.init_params(batch)
    params = adapt_pretrained_params(dict(params), cfg.model.hidden_size)

    bd = {k: jnp.asarray(v) for k, v in batch.items()}
    a_mine, t_mine = mine.apply({"params": params}, bd)
    a_ref, t_ref = ref.apply({"params": params}, bd)
    np.testing.assert_allclose(np.asarray(a_mine), np.asarray(a_ref), atol=ATOL)
    np.testing.assert_allclose(np.asarray(t_mine), np.asarray(t_ref), atol=ATOL)


def test_tvqa_zero_shot_logits_parity(reference_modeling):
    """Batched zero-shot TVQA (BASELINE config 2): our span-ranking model vs
    the same computation on the reference's own modules — two-stream fusion
    per tvqa_finetune.py:155-264 with ONE MASK statement per stream, then
    modeling.py:806-843's joint_proj and :1024-1032's label-space ranking."""
    from merlot_reserve_tpu.finetune.models import MerlotReserveTVQAZeroShot

    class RefTVQAZeroShot(reference_modeling.MerlotReserve):
        def __call__(self, batch):
            batch_size, images_per_batch, seq_size, img_dim = batch["images"].shape
            imgs_enc = self.vision_encoder(batch["images"].reshape(
                batch_size * images_per_batch, seq_size, img_dim))["seq_attnpool"]
            imgs_enc = imgs_enc.reshape(batch_size, images_per_batch,
                                        seq_size // 4, self.hidden_size)
            imgs_enc = jnp.concatenate([
                jnp.zeros([batch_size, 1, seq_size // 4, self.hidden_size],
                          dtype=imgs_enc.dtype), imgs_enc], 1)
            images_per_batch += 1
            batch_size, num_ans_per, joint_seq_len, two_ = batch["textonly_seqs"].shape
            imgs_enc = imgs_enc.reshape(
                batch_size, images_per_batch * seq_size // 4,
                self.hidden_size).repeat(num_ans_per, axis=0)

            text_toks = batch["textonly_seqs"][..., 0].reshape(
                batch_size * num_ans_per, joint_seq_len)
            textonly_inputs = self.prepare_multimodal_inputs(
                tokens=text_toks,
                token_segment_idx=batch["textonly_seqs"][..., 1].reshape(
                    batch_size * num_ans_per, joint_seq_len),
                vision_input=imgs_enc,
            )

            bsz, n_seg, n_sub, audio_seq_len, num_mels = batch["audio_clips"].shape
            audio_enc = self.audio_encoder(batch["audio_clips"].reshape(
                -1, audio_seq_len, num_mels))["seq_attnpool"]
            _, audio_token_len, hidden_size = audio_enc.shape
            num_audio_spans = n_seg * n_sub
            audio_enc = audio_enc.reshape(bsz, num_audio_spans, audio_token_len,
                                          hidden_size).repeat(num_ans_per, axis=0)

            audio_toks = batch["audio_seqs"][..., 0].reshape(
                batch_size * num_ans_per, joint_seq_len)
            audio_pointers = (jnp.cumsum(
                (audio_toks == AUDIOSPAN).astype(jnp.int32), -1) - 1) // audio_token_len
            audio_pointers = audio_pointers % num_audio_spans
            audio_inputs = self.prepare_multimodal_inputs(
                tokens=audio_toks,
                token_segment_idx=batch["audio_seqs"][..., 1].reshape(
                    batch_size * num_ans_per, joint_seq_len),
                vision_input=imgs_enc,
                audio_spans=audio_enc,
                audio_pointers=audio_pointers,
            )
            start_imgs = joint_seq_len + seq_size // 4
            for k in ["x", "rotary_coords", "attention_mask"]:
                textonly_inputs[k] = jnp.concatenate(
                    [textonly_inputs[k][:, :joint_seq_len],
                     textonly_inputs[k][:, start_imgs:]], 1)
                audio_inputs[k] = jnp.concatenate(
                    [audio_inputs[k][:, :joint_seq_len],
                     audio_inputs[k][:, start_imgs:]], 1)
            for d in (textonly_inputs, audio_inputs):
                d["attention_mask"] = jnp.concatenate(
                    [d["attention_mask"][:, :, :joint_seq_len],
                     d["attention_mask"][:, :, start_imgs:]], 2)

            x = jnp.concatenate([audio_inputs["x"], textonly_inputs["x"]], 0)
            coords = jnp.concatenate([audio_inputs["rotary_coords"],
                                      textonly_inputs["rotary_coords"]], 0)
            attnmask = jnp.concatenate([audio_inputs["attention_mask"],
                                        textonly_inputs["attention_mask"]], 0)
            joint_enc = self.joint_transformer(
                x, rotary_coords=coords, attention_mask=attnmask)["seq"]
            joint_enc = joint_enc[:, :joint_seq_len].reshape(
                batch_size * 2 * num_ans_per, joint_seq_len, self.hidden_size)
            pool_idx = jnp.argmax((jnp.concatenate([audio_toks, text_toks], 0)
                                   == MASK).astype(jnp.float32), 1)
            pooled = joint_enc[jnp.arange(batch_size * 2 * num_ans_per), pool_idx]
            h = reference_modeling.unit_normalize(self.joint_proj(pooled)).reshape(
                2, batch_size * num_ans_per, self.hidden_size)

            n_opt, span_len = batch["answers"].shape[-2:]
            opts = self.embed_text_spans_only(
                batch["answers"].reshape(-1, span_len)
            ).reshape(batch_size, n_opt, self.hidden_size)
            logits = jnp.einsum("sbh,boh->sbo", h, opts)
            return logits[0], logits[1]

    num_segments, lang_seq = 3, 32
    cfg = _tiny_cfg(lang_seq_len=lang_seq, num_segments=num_segments)
    mine = MerlotReserveTVQAZeroShot.from_config(cfg)
    ref = RefTVQAZeroShot.from_config({"data": {}, "model": dict(_REF_CFG_MODEL)})

    rng = np.random.RandomState(0)
    bsz = 2
    text = rng.randint(10, 30000, (bsz, 1, lang_seq)).astype(np.int32)
    text[:, :, 5] = MASK
    seg_ids = np.minimum(np.arange(lang_seq) // (lang_seq // (num_segments + 1)),
                         num_segments).astype(np.int32)
    textonly = np.stack([text, np.broadcast_to(seg_ids, text.shape)], -1)
    audio = text.copy()
    audio[:, :, 8:8 + 12] = AUDIOSPAN
    audio_seqs = np.stack([audio, np.broadcast_to(seg_ids, audio.shape)], -1)
    batch = {
        "images": rng.randn(bsz, num_segments, 16, 768).astype(np.float32),
        "audio_clips": rng.randn(bsz, num_segments, 3, 60, 65).astype(np.float32),
        "textonly_seqs": textonly.astype(np.int32),
        "audio_seqs": audio_seqs.astype(np.int32),
        "answers": rng.randint(
            10, 30000, (bsz, 5, cfg.model.text_span_length)).astype(np.int32),
    }
    params = mine.init_params(batch)

    bd = {k: jnp.asarray(v) for k, v in batch.items()}
    a_mine, t_mine = mine.apply({"params": params}, bd)
    a_ref, t_ref = ref.apply({"params": params}, bd)
    assert a_mine.shape == a_ref.shape == (bsz, 5)
    np.testing.assert_allclose(np.asarray(a_mine), np.asarray(a_ref), atol=ATOL)
    np.testing.assert_allclose(np.asarray(t_mine), np.asarray(t_ref), atol=ATOL)


def test_vcr_zero_shot_logits_parity(reference_modeling):
    """Batched zero-shot VCR: our two-statement span-ranking model vs the
    same computation on the reference's modules (qa_qar_joint_finetune.py's
    single-image fusion with MASK statements + label-space ranking)."""
    from merlot_reserve_tpu.finetune.models import MerlotReserveVCRZeroShot

    class RefVCRZeroShot(reference_modeling.MerlotReserve):
        def __call__(self, batch):
            batch_size, n_tasks, token_length = batch["statements"].shape
            stmts = batch["statements"].reshape(batch_size * n_tasks, token_length)
            imgs_enc = self.vision_encoder(batch["image"])["seq_attnpool"].repeat(
                n_tasks, axis=0)
            mm_inputs = self.prepare_multimodal_inputs(
                tokens=stmts,
                token_segment_idx=jnp.zeros_like(stmts),
                vision_input=imgs_enc,
            )
            joint = self.joint_transformer(**mm_inputs)["seq"][:, :token_length]
            pool_idx = jnp.argmax((stmts == MASK).astype(jnp.float32), 1)
            pooled = joint[jnp.arange(batch_size * n_tasks), pool_idx]
            h = reference_modeling.unit_normalize(self.joint_proj(pooled)).reshape(
                batch_size, n_tasks, self.hidden_size)
            n_opt, span_len = batch["answers"].shape[-2:]
            opts = self.embed_text_spans_only(
                batch["answers"].reshape(-1, span_len)
            ).reshape(batch_size, n_tasks, n_opt, self.hidden_size)
            return jnp.einsum("bth,btoh->bto", h, opts)

    cfg = _tiny_cfg(lang_seq_len=24)
    mine = MerlotReserveVCRZeroShot.from_config(cfg)
    ref = RefVCRZeroShot.from_config({"data": {}, "model": dict(_REF_CFG_MODEL)})

    rng = np.random.RandomState(0)
    stmts = rng.randint(10, 30000, (2, 2, 24)).astype(np.int32)
    stmts[..., 6] = MASK
    stmts[..., 7:] = 0
    batch = {
        "image": rng.randn(2, 16, 768).astype(np.float32),
        "statements": stmts,
        "answers": rng.randint(
            10, 30000, (2, 2, 4, cfg.model.text_span_length)).astype(np.int32),
    }
    params = mine.init_params(batch)

    bd = {k: jnp.asarray(v) for k, v in batch.items()}
    out_mine = mine.apply({"params": params}, bd)
    out_ref = ref.apply({"params": params}, bd)
    assert out_mine.shape == out_ref.shape == (2, 2, 4)
    np.testing.assert_allclose(np.asarray(out_mine), np.asarray(out_ref),
                               atol=ATOL)


import pytest  # noqa: E402

# heavy tier: full-model / multi-device / subprocess tests
pytestmark = pytest.mark.slow
