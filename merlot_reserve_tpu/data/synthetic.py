"""Synthetic TFRecord corpus generator with the exact pretraining schema
(/root/reference/pretrain/dataloader.py:30-60 `segment_k2f`) — used by tests,
the bench harness, and as executable documentation of the record format."""

from __future__ import annotations

import io
from typing import Dict, List, Optional

import numpy as np

from merlot_reserve_tpu.config import MerlotConfig
from merlot_reserve_tpu.data import tfrecord as T


def _jpeg_bytes(arr: np.ndarray, mode: str) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr, mode=mode).save(buf, format="JPEG", quality=90)
    return buf.getvalue()


def make_segment_features(cfg: MerlotConfig, rng: np.random.Generator,
                          segment_idx: int, video_src_index: int = 1,
                          n_tokens: int = 20) -> Dict[str, bytes]:
    """One segment's features (prefixed later with c{i:02d}/)."""
    d, m = cfg.data, cfg.model

    img = rng.integers(0, 256, (180, 320, 3), dtype=np.uint8)
    spec = rng.integers(0, 256, (d.num_mels, d.spec_size), dtype=np.uint8)

    start_time = 5.0 * segment_idx
    end_time = start_time + 5.0
    tok_ids = rng.integers(100, m.vocab_size, n_tokens)
    # word timings spread over the segment, relative to segment start
    starts = np.sort(rng.uniform(0, 4.5, n_tokens)).astype(np.float32)
    ends = starts + rng.uniform(0.05, 0.4, n_tokens).astype(np.float32)

    return {
        "image/encoded": T.bytes_feature([_jpeg_bytes(img, "RGB")]),
        "image/format": T.bytes_feature([b"jpeg"]),
        "image/key/sha256": T.bytes_feature([b""]),
        "image/height": T.int64_feature([img.shape[0]]),
        "image/width": T.int64_feature([img.shape[1]]),
        "spectrogram/encoded": T.bytes_feature([_jpeg_bytes(spec, "L")]),
        "spectrogram/format": T.bytes_feature([b"jpeg"]),
        "spectrogram/key/sha256": T.bytes_feature([b""]),
        "spectrogram/height": T.int64_feature([spec.shape[0]]),
        "spectrogram/width": T.int64_feature([spec.shape[1]]),
        "spectrogram/magic_number": T.float_feature([float(rng.uniform(20, 60))]),
        "youtube_id": T.bytes_feature([b"synthetic000"]),
        "video_src_index": T.int64_feature([video_src_index]),
        "title": T.int64_feature(rng.integers(100, 1000, 4).tolist()),
        "tags": T.int64_feature(rng.integers(100, 1000, 3).tolist()),
        "description": T.int64_feature(rng.integers(100, 1000, 6).tolist()),
        "meta": T.bytes_feature([b""]),
        "playback_speed": T.int64_feature([1]),
        "start_time": T.float_feature([start_time]),
        "end_time": T.float_feature([end_time]),
        "tok_ids": T.int64_feature(tok_ids.tolist()),
        "tok_start_times": T.float_feature(starts.tolist()),
        "tok_end_times": T.float_feature(ends.tolist()),
        "random_text": T.int64_feature(
            rng.integers(100, m.vocab_size, 1200).tolist()),
    }


def make_video_record(cfg: MerlotConfig, rng: np.random.Generator,
                      packed_videos: Optional[List[int]] = None) -> bytes:
    """One 16-segment example; ``packed_videos`` gives segment counts of
    packed clips (summing to num_segments) for video_src_index variety."""
    n = cfg.data.num_segments
    if packed_videos is None:
        packed_videos = [n]
    assert sum(packed_videos) == n
    src_idx = np.repeat(1 + np.arange(len(packed_videos)), packed_videos)

    features: Dict[str, bytes] = {}
    for i in range(n):
        seg = make_segment_features(cfg, rng, i, video_src_index=int(src_idx[i]))
        features.update({f"c{i:02d}/{k}": v for k, v in seg.items()})
    return T.encode_example(features)


def make_vcr_record(cfg: MerlotConfig, rng: np.random.Generator,
                    num_answers: int = 4) -> bytes:
    """Synthetic VCR example (finetune/common_dataloader.py:86-137 schema)."""
    img = rng.integers(0, 256, (200, 300, 3), dtype=np.uint8)
    feats = {
        "image": T.bytes_feature([_jpeg_bytes(img, "RGB")]),
        "image_fliplr": T.bytes_feature([_jpeg_bytes(img[:, ::-1], "RGB")]),
        "id": T.bytes_feature([b"vcr-0"]),
    }
    for prefix in ("qa", "qar"):
        feats[f"{prefix}_query"] = T.int64_feature(
            rng.integers(100, 1000, 12).tolist())
        for i in range(num_answers):
            feats[f"{prefix}_choice_{i}"] = T.int64_feature(
                rng.integers(100, 1000, 8).tolist())
        feats[f"{prefix}_label"] = T.int64_feature([int(rng.integers(0, num_answers))])
    return T.encode_example(feats)


def make_tvqa_record(cfg: MerlotConfig, rng: np.random.Generator,
                     num_answers: int = 5, num_segments: int = 7) -> bytes:
    """Synthetic TVQA example (finetune/common_dataloader.py:139-239 schema)."""
    feats = {
        "id": T.bytes_feature([b"tvqa-0"]),
        "magic_number": T.float_feature([float(rng.uniform(20, 60))]),
        "qa_query": T.int64_feature(rng.integers(100, 1000, 10).tolist()),
        "qa_label": T.int64_feature([int(rng.integers(0, num_answers))]),
        "num_frames": T.int64_feature([num_segments]),
    }
    for i in range(num_answers):
        feats[f"qa_choice_{i}"] = T.int64_feature(
            rng.integers(100, 1000, 6).tolist())
    for i in range(num_segments):
        img = rng.integers(0, 256, (180, 320, 3), dtype=np.uint8)
        # one JPEG holding the [3, 60, 65] spectrogram as [3*60, 65]
        spec = rng.integers(0, 256, (3 * 60, 65), dtype=np.uint8)
        feats[f"c{i:02d}/image_encoded"] = T.bytes_feature([_jpeg_bytes(img, "RGB")])
        feats[f"c{i:02d}/spec_encoded"] = T.bytes_feature([_jpeg_bytes(spec, "L")])
        feats[f"c{i:02d}/sub"] = T.int64_feature(
            rng.integers(100, 1000, 8).tolist())
    return T.encode_example(feats)


def write_synthetic_finetune_corpus(path: str, cfg: MerlotConfig, task: str,
                                    num_records: int = 4, seed: int = 0):
    rng = np.random.default_rng(seed)
    make = {"vcr": make_vcr_record, "tvqa": make_tvqa_record}[task]
    T.write_records(path, [make(cfg, rng) for _ in range(num_records)])
    return path


def write_synthetic_corpus(path: str, cfg: MerlotConfig, num_records: int = 4,
                           seed: int = 0):
    rng = np.random.default_rng(seed)
    records = []
    for r in range(num_records):
        packed = [cfg.data.num_segments] if r % 2 == 0 else (
            [cfg.data.num_segments // 2, cfg.data.num_segments -
             cfg.data.num_segments // 2])
        records.append(make_video_record(cfg, rng, packed))
    T.write_records(path, records)
    return path
