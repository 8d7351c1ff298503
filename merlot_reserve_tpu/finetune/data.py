"""Finetuning data preprocessors (numpy), mirroring
/root/reference/finetune/common_dataloader.py:9-239.

Record schemas:
  * VCR: pre-rendered normal + left-right-flipped JPEGs with drawn boxes,
    qa_/qar_ query + 4 choices + label each;
  * TVQA: 7 frames (JPEG) each with a [3, 60, 65] spectrogram (one JPEG,
    magic-number quantized) and subtitle tokens; one query + 5 choices.
"""

from __future__ import annotations

import io
from typing import Dict, Iterator, List, Optional

import numpy as np

from merlot_reserve_tpu.config import MerlotConfig
from merlot_reserve_tpu.data.tfrecord import parse_example, read_records
from merlot_reserve_tpu.tokenizer import AUDIOSPAN, MASK, PADDING, get_tokenizer


def _decode_jpeg(data: bytes, channels: int = 3) -> np.ndarray:
    from PIL import Image

    img = Image.open(io.BytesIO(data))
    img = img.convert("RGB" if channels == 3 else "L")
    return np.asarray(img)


def _img_to_patches(data: bytes, cfg: MerlotConfig) -> np.ndarray:
    # host path (PIL+numpy): loaders must not touch the accelerator
    from merlot_reserve_tpu.data.pretrain_pipeline import host_image_to_patches

    return host_image_to_patches(_decode_jpeg(data), tuple(cfg.model.output_grid))


def _pad_to(x: np.ndarray, length: int, pad_value: int = 0) -> np.ndarray:
    x = np.asarray(x, np.int32)[:length]
    out = np.full(length, pad_value, np.int32)
    out[:len(x)] = x
    return out


# ---------------------------------------------------------------------------
# VCR
# ---------------------------------------------------------------------------


def preprocess_vcr(raw: Dict, cfg: MerlotConfig, rng: np.random.Generator,
                   num_answers: int = 4, is_training: bool = True) -> Dict:
    """QA and QA->R jointly (common_dataloader.py:86-137):
    answers [2, num_answers, lang_seq_len] each ending in MASK, labels [2]."""
    enc = get_tokenizer()
    lang_len = cfg.data.lang_seq_len

    img_key = "image"
    if is_training and rng.uniform() < 0.5 and "image_fliplr" in raw:
        img_key = "image_fliplr"
    image = _img_to_patches(bytes(raw[img_key][0]), cfg)

    sep = {"qa": enc.encode("answer: ").ids, "qar": enc.encode("rationale: ").ids}
    answers = []
    for prefix in ["qa", "qar"]:
        query = np.asarray(raw[f"{prefix}_query"], np.int64)
        for i in range(num_answers):
            choice = np.asarray(raw[f"{prefix}_choice_{i}"], np.int64)
            option = np.concatenate([query, sep[prefix], choice])
            option = np.concatenate([option[:lang_len - 1], [MASK]])
            answers.append(_pad_to(option, lang_len))
    return {
        "image": image,
        "answers": np.stack(answers).reshape(2, num_answers, lang_len),
        "labels": np.asarray([int(raw["qa_label"][0]), int(raw["qar_label"][0])],
                             np.int32),
    }


# ---------------------------------------------------------------------------
# TVQA
# ---------------------------------------------------------------------------


def preprocess_tvqa(raw: Dict, cfg: MerlotConfig, rng: np.random.Generator,
                    num_answers: int = 5, num_segments: int = 7,
                    is_training: bool = True) -> Dict:
    """7 frames + audio + subtitles -> two parallel streams
    (common_dataloader.py:139-239)."""
    enc = get_tokenizer()
    lang_len = cfg.data.lang_seq_len
    atl = cfg.model.audio_token_length

    images = np.stack([
        _img_to_patches(bytes(raw[f"c{i:02d}/image_encoded"][0]), cfg)
        for i in range(num_segments)])

    magic = float(np.asarray(raw["magic_number"]).reshape(-1)[0])
    audio = np.stack([
        _decode_jpeg(bytes(raw[f"c{i:02d}/spec_encoded"][0]), channels=1)
        for i in range(num_segments)])
    audio = audio.reshape(num_segments, 3, 60, 65).astype(np.float32) / magic

    query = np.concatenate([np.asarray(raw["qa_query"], np.int64),
                            enc.encode("answer: ").ids])
    subs = [np.asarray(raw[f"c{i:02d}/sub"], np.int64) for i in range(num_segments)]

    textonly_seqs, audio_seqs = [], []
    audio_full = np.full(3 * atl, AUDIOSPAN, np.int64)
    for i in range(num_answers):
        choice = np.asarray(raw[f"qa_choice_{i}"], np.int64)
        option = np.concatenate([query, choice])
        option = np.concatenate([option[:lang_len - 1], [MASK]])

        def seq_with(rows: List[np.ndarray]) -> np.ndarray:
            rows = [option] + rows
            toks = np.concatenate(rows)
            seg = np.repeat(np.arange(len(rows)), [len(r) for r in rows])
            out = np.stack([toks, seg], -1).astype(np.int32)[:lang_len]
            pad = np.zeros((lang_len - len(out), 2), np.int32)
            return np.concatenate([out, pad], 0)

        textonly_seqs.append(seq_with(subs))
        audio_seqs.append(seq_with([audio_full] * num_segments))

    features = {
        "images": images,
        "audio_clips": audio,
        "textonly_seqs": np.stack(textonly_seqs),
        "audio_seqs": np.stack(audio_seqs),
        "labels": np.asarray(int(raw["qa_label"][0]), np.int32),
    }

    num_frames = int(np.asarray(raw.get("num_frames", [num_segments])).reshape(-1)[0])
    frame_valid = (np.arange(num_segments) < num_frames)
    features["images"] = features["images"] * frame_valid[:, None, None]

    if is_training:
        # audio jitter: re-pad the valid window sequence with mel-statistics
        # noise and a random offset (common_dataloader.py:218-239)
        ac = features["audio_clips"]
        old_shape = ac.shape
        old_nwindow = old_shape[0] * old_shape[1] * old_shape[2]
        num_mels = old_shape[3]
        giant = ac[:num_frames].reshape(-1, num_mels)
        avg, std = giant.mean(0), giant.std(0)
        start = rng.normal(avg, std, (4, num_mels))
        end_n = 4 + (old_nwindow - len(giant))
        end = rng.normal(avg, std, (end_n, num_mels))
        seq = np.concatenate([start, giant, end], 0)
        s = int(rng.integers(0, 5))
        features["audio_clips"] = seq[s:s + old_nwindow].reshape(old_shape).astype(np.float32)

    features["audio_clips"] = features["audio_clips"] * frame_valid[:, None, None, None]
    # playback-speed channel is always exactly 1
    features["audio_clips"][..., -1] = 1.0
    return features


# ---------------------------------------------------------------------------
# zero-shot variants: MASK in the answer slot + span-encoder answer tables
# ---------------------------------------------------------------------------


def _answer_table(raw: Dict, prefix: str, num_answers: int,
                  span_len: int) -> np.ndarray:
    """[num_answers, span_len] candidate tokens for the span encoder — the
    per-question label space (get_label_space pads options to the span
    length, modeling.py:1024-1032)."""
    return np.stack([
        _pad_to(np.asarray(raw[f"{prefix}_choice_{i}"], np.int64), span_len,
                pad_value=PADDING)
        for i in range(num_answers)])


def preprocess_vcr_zero_shot(raw: Dict, cfg: MerlotConfig,
                             rng: np.random.Generator, num_answers: int = 4,
                             is_training: bool = False) -> Dict:
    """Zero-shot VCR: per task one statement ending in MASK (the answer
    slot) instead of 4 per-answer sequences; choices become the label space.
    statements [2, lang_seq_len], answers [2, num_answers, span_len]."""
    enc = get_tokenizer()
    lang_len = cfg.data.lang_seq_len
    span_len = cfg.model.text_span_length

    image = _img_to_patches(bytes(raw["image"][0]), cfg)

    sep = {"qa": enc.encode("answer: ").ids, "qar": enc.encode("rationale: ").ids}
    statements, answers = [], []
    for prefix in ["qa", "qar"]:
        query = np.asarray(raw[f"{prefix}_query"], np.int64)
        stmt = np.concatenate([query, sep[prefix]])
        stmt = np.concatenate([stmt[:lang_len - 1], [MASK]])
        statements.append(_pad_to(stmt, lang_len))
        answers.append(_answer_table(raw, prefix, num_answers, span_len))
    return {
        "image": image,
        "statements": np.stack(statements),
        "answers": np.stack(answers),
        "labels": np.asarray([int(raw["qa_label"][0]), int(raw["qar_label"][0])],
                             np.int32),
    }


def preprocess_tvqa_zero_shot(raw: Dict, cfg: MerlotConfig,
                              rng: np.random.Generator, num_answers: int = 5,
                              num_segments: int = 7,
                              is_training: bool = False) -> Dict:
    """Zero-shot TVQA: ONE statement sequence per stream — question +
    'answer:' + MASK with subtitle / AUDIOSPAN context rows — plus the
    5 choices as a span-encoder answer table. Context decode (frames,
    spectrograms, frame-validity zeroing, playback channel) is shared with
    the finetune preprocessor."""
    enc = get_tokenizer()
    lang_len = cfg.data.lang_seq_len
    atl = cfg.model.audio_token_length
    span_len = cfg.model.text_span_length

    # num_answers=1: reuse the frame/spectrogram decode without assembling
    # the per-answer finetune sequences we'd throw away
    ctx = preprocess_tvqa(raw, cfg, rng, num_answers=1,
                          num_segments=num_segments, is_training=False)

    statement = np.concatenate([np.asarray(raw["qa_query"], np.int64),
                                enc.encode("answer: ").ids])
    statement = np.concatenate([statement[:lang_len - 1], [MASK]])
    subs = [np.asarray(raw[f"c{i:02d}/sub"], np.int64) for i in range(num_segments)]
    audio_full = np.full(3 * atl, AUDIOSPAN, np.int64)

    def seq_with(rows: List[np.ndarray]) -> np.ndarray:
        rows = [statement] + rows
        toks = np.concatenate(rows)
        seg = np.repeat(np.arange(len(rows)), [len(r) for r in rows])
        out = np.stack([toks, seg], -1).astype(np.int32)[:lang_len]
        pad = np.zeros((lang_len - len(out), 2), np.int32)
        return np.concatenate([out, pad], 0)

    return {
        "images": ctx["images"],
        "audio_clips": ctx["audio_clips"],
        # num_ans dim of 1: one MASK statement per stream (the model fuses
        # the same way as the finetune per-answer layout)
        "textonly_seqs": seq_with(subs)[None],
        "audio_seqs": seq_with([audio_full] * num_segments)[None],
        "answers": _answer_table(raw, "qa", num_answers, span_len),
        "labels": ctx["labels"],
    }


# ---------------------------------------------------------------------------
# loader
# ---------------------------------------------------------------------------


def finetune_batches(file_paths: List[str], cfg: MerlotConfig, task: str,
                     batch_size: int, seed: Optional[int] = 0,
                     is_training: bool = True, repeat: bool = True,
                     return_ids: bool = False) -> Iterator:
    """Stream collated batches for 'vcr' or 'tvqa'. With return_ids, yields
    (ids, batch) where padded slots carry id 'pad' (the reference's val
    convention, common_dataloader.py:346-363)."""
    prep = {"vcr": preprocess_vcr, "tvqa": preprocess_tvqa,
            "vcr_zero_shot": preprocess_vcr_zero_shot,
            "tvqa_zero_shot": preprocess_tvqa_zero_shot}[task]
    rng = np.random.default_rng(seed)

    def emit(examples, ids):
        batch = {k: np.stack([e[k] for e in examples]) for k in examples[0]}
        return (ids, batch) if return_ids else batch

    while True:
        examples, ids = [], []
        for path in file_paths:
            for record in read_records(path):
                raw = parse_example(record)
                ids.append(bytes(raw.get("id", [b""])[0]).decode() or "?")
                examples.append(prep(raw, cfg, rng, is_training=is_training))
                if len(examples) == batch_size:
                    yield emit(examples, ids)
                    examples, ids = [], []
        if not repeat:
            if examples:  # pad the final partial batch ('pad' ids)
                while len(examples) < batch_size:
                    examples.append(examples[0])
                    ids.append("pad")
                yield emit(examples, ids)
            return
