"""Dataset creation: videos (frames + PCM + timed ASR words) -> 16-segment
pretraining TFRecords — the capability of /root/reference/data/process.py
(offline, CPU). Decode-independent: callers provide arrays (ffmpeg decode via
merlot_reserve_tpu.preprocess when available).

Pipeline (process.py:318-764 semantics):
  * ASR timing fix through the offset model;
  * adaptive ~5 s windows; when a window holds too few words the playback
    speed rises to 2-3x (audio fast-forwarded, spectrogram hop scaled);
  * per-window: JPEG frame (resized shorter-side 288 / max 512), JPEG
    log-mel spectrogram with percentile-99 magic number, BPE tokens with
    per-token times;
  * chunks from short videos pack into records of exactly 16 segments with
    per-segment video_src_index;
  * a raw-text stream (e.g. The Pile) interleaves one blob per segment.
"""

from __future__ import annotations

import io
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from merlot_reserve_tpu.data import tfrecord as T
from merlot_reserve_tpu.dataset_creation.spectrogram import quantize_spectrogram
from merlot_reserve_tpu.tokenizer import get_tokenizer

SEGMENT_LENGTH = 5.0
MIN_WORDS_PER_WINDOW = 3
MAX_PLAYBACK_SPEED = 3


def resize_image_for_storage(img: np.ndarray, shorter_side: int = 288,
                             max_side: int = 512, quality: int = 90) -> bytes:
    """Resize (shorter side 288, longest capped at 512) and JPEG-encode
    (process.py frame storage convention)."""
    from PIL import Image

    pil = Image.fromarray(img)
    w, h = pil.size
    scale = shorter_side / min(w, h)
    scale = min(scale, max_side / max(w, h))
    if scale < 1.0:
        pil = pil.resize((max(int(w * scale), 1), max(int(h * scale), 1)),
                         Image.BILINEAR)
    buf = io.BytesIO()
    pil.save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def split_into_windows(words: List[Dict], duration: float,
                       segment_length: float = SEGMENT_LENGTH) -> List[Dict]:
    """Timed words -> adaptive windows. A window starts at the current cursor
    and spans segment_length * playback_speed seconds, picking the smallest
    speed (1..3) that captures >= MIN_WORDS_PER_WINDOW words
    (process.py:333-391 behavior)."""
    windows = []
    cursor = 0.0
    i = 0
    n = len(words)
    while cursor + segment_length <= duration:
        chosen = None
        for speed in range(1, MAX_PLAYBACK_SPEED + 1):
            end = cursor + segment_length * speed
            if end > duration:
                break
            in_window = [w for w in words[i:]
                         if cursor <= (w["start"] + w["end"]) / 2 < end]
            if len(in_window) >= MIN_WORDS_PER_WINDOW or speed == MAX_PLAYBACK_SPEED:
                chosen = {"start_time": cursor, "end_time": end,
                          "playback_speed": speed, "words": in_window}
                break
        if chosen is None:
            break
        windows.append(chosen)
        cursor = chosen["end_time"]
        while i < n and (words[i]["start"] + words[i]["end"]) / 2 < cursor:
            i += 1
    return windows


@dataclass
class VideoChunk:
    """One processed 5-second segment ready for packing."""

    frame_jpeg: bytes
    spectrogram_jpeg: bytes
    magic_number: float
    tok_ids: List[int]
    tok_start_times: List[float]
    tok_end_times: List[float]
    start_time: float
    end_time: float
    playback_speed: int
    youtube_id: str = ""
    title_toks: List[int] = field(default_factory=list)
    description_toks: List[int] = field(default_factory=list)
    tags_toks: List[int] = field(default_factory=list)
    meta: bytes = b""


def build_chunk(frame: np.ndarray, waveform: np.ndarray, window: Dict,
                sr: int = 22050, youtube_id: str = "",
                title: str = "", description: str = "", tags: str = "",
                encoder=None) -> VideoChunk:
    """One window -> VideoChunk: spectrogram over the (possibly fast-forwarded)
    waveform slice, BPE-encoded words with times relative to window start."""
    from merlot_reserve_tpu.ops.audio import mel_power_spectrogram

    enc = encoder or get_tokenizer()
    speed = window["playback_speed"]
    s0 = int(window["start_time"] * sr)
    s1 = int(window["end_time"] * sr)
    wav = waveform[s0:s1]
    target = int(SEGMENT_LENGTH * sr) * speed
    if wav.size < target:
        wav = np.concatenate([wav, np.zeros(target - wav.size, np.float32)])

    mel = np.asarray(mel_power_spectrogram(
        wav[:target], sr=sr, n_fft=1536 * speed, hop_length=588 * speed,
        fmax=sr / 2.0))
    log_mel = np.log(mel + 0.1) - np.log(0.1)  # [T, num_mels]
    spec_jpeg, magic = quantize_spectrogram(log_mel.T)  # stored [num_mels, T]

    tok_ids, tok_starts, tok_ends = [], [], []
    for w in window["words"]:
        ids = enc.encode(" " + w["word"]).ids
        rel_s = (w["start"] - window["start_time"]) / speed
        rel_e = (w["end"] - window["start_time"]) / speed
        for tid in ids:
            tok_ids.append(tid)
            tok_starts.append(rel_s)
            tok_ends.append(rel_e)

    return VideoChunk(
        frame_jpeg=resize_image_for_storage(frame),
        spectrogram_jpeg=spec_jpeg,
        magic_number=magic,
        tok_ids=tok_ids,
        tok_start_times=tok_starts,
        tok_end_times=tok_ends,
        start_time=window["start_time"],
        end_time=window["end_time"],
        playback_speed=speed,
        youtube_id=youtube_id,
        title_toks=enc.encode(title).ids if title else [],
        description_toks=enc.encode(description).ids if description else [],
        tags_toks=enc.encode(tags).ids if tags else [],
    )


def pack_chunks(video_chunks: Iterator[List[VideoChunk]],
                group_size: int = 16) -> Iterator[List[VideoChunk]]:
    """Pack per-video chunk lists into groups of exactly ``group_size``
    segments; short videos share a record, video_src_index marks ownership
    (process.py:506-578 behavior, simplified buffer heuristics)."""
    buffer: List[List[VideoChunk]] = []
    buffered = 0
    for chunks in video_chunks:
        while len(chunks) >= group_size:
            yield chunks[:group_size]
            chunks = chunks[group_size:]
        if chunks:
            buffer.append(chunks)
            buffered += len(chunks)
        while buffered >= group_size:
            group: List[VideoChunk] = []
            new_buffer: List[List[VideoChunk]] = []
            for b in buffer:
                take = min(group_size - len(group), len(b))
                group.extend(b[:take])
                if take < len(b):
                    new_buffer.append(b[take:])
                if len(group) == group_size:
                    break
            buffer = new_buffer + buffer[len(buffer):]
            # drop pieces already consumed
            buffer = [b for b in buffer if b]
            buffered = sum(len(b) for b in buffer)
            yield group


def chunks_to_record(group: List[VideoChunk], random_texts: Sequence[List[int]],
                     group_size: int = 16) -> bytes:
    """16 chunks (+ per-segment raw-text token blobs) -> one tf.Example."""
    assert len(group) == group_size
    # video_src_index: consecutive chunks of the same video share an index
    src_idx = []
    current = 0
    last_id = None
    for c in group:
        if c.youtube_id != last_id:
            current += 1
            last_id = c.youtube_id
        src_idx.append(current)

    feats: Dict[str, bytes] = {}
    for i, (c, s) in enumerate(zip(group, src_idx)):
        p = f"c{i:02d}/"
        rt = list(random_texts[i]) if i < len(random_texts) else []
        feats.update({
            p + "image/encoded": T.bytes_feature([c.frame_jpeg]),
            p + "image/format": T.bytes_feature([b"jpeg"]),
            p + "image/key/sha256": T.bytes_feature([b""]),
            p + "image/height": T.int64_feature([0]),
            p + "image/width": T.int64_feature([0]),
            p + "spectrogram/encoded": T.bytes_feature([c.spectrogram_jpeg]),
            p + "spectrogram/format": T.bytes_feature([b"jpeg"]),
            p + "spectrogram/key/sha256": T.bytes_feature([b""]),
            p + "spectrogram/height": T.int64_feature([64]),
            p + "spectrogram/width": T.int64_feature([188]),
            p + "spectrogram/magic_number": T.float_feature([c.magic_number]),
            p + "youtube_id": T.bytes_feature([c.youtube_id.encode()]),
            p + "video_src_index": T.int64_feature([s]),
            p + "title": T.int64_feature(c.title_toks),
            p + "tags": T.int64_feature(c.tags_toks),
            p + "description": T.int64_feature(c.description_toks),
            p + "meta": T.bytes_feature([c.meta]),
            p + "playback_speed": T.int64_feature([c.playback_speed]),
            p + "start_time": T.float_feature([c.start_time]),
            p + "end_time": T.float_feature([c.end_time]),
            p + "tok_ids": T.int64_feature(c.tok_ids),
            p + "tok_start_times": T.float_feature(c.tok_start_times),
            p + "tok_end_times": T.float_feature(c.tok_end_times),
            p + "random_text": T.int64_feature(rt),
        })
    return T.encode_example(feats)


def process_video_arrays(frames: np.ndarray, waveform: np.ndarray,
                         words: List[Dict], duration: float,
                         youtube_id: str = "", sr: int = 22050,
                         fix_asr_timing: bool = False,
                         **meta_kw) -> List[VideoChunk]:
    """Full per-video path: (frames at ~window midpoints, PCM, timed words)
    -> chunks. ``frames`` must align 1:1 with the produced windows (callers
    decoding lazily can use split_into_windows first)."""
    if fix_asr_timing:
        from merlot_reserve_tpu.dataset_creation.offset_model import apply_offsets

        words = apply_offsets(words)
    windows = split_into_windows(words, duration)
    assert len(frames) >= len(windows), "need one frame per window"
    return [build_chunk(frames[i], waveform, w, sr=sr, youtube_id=youtube_id,
                        **meta_kw)
            for i, w in enumerate(windows)]
