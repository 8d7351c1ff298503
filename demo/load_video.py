#!/usr/bin/env python
"""Fetch a YouTube video + word-timed transcript and cut it into model-ready
segments with subtitles attached — the capability of
/root/reference/demo/load_video.py:276-397 (download_transcript /
download_video / load_video) composed from this framework's pieces:
yt-dlp fetch (`dataset_creation/youtube.py`, gated on the binary), WebVTT
word timing (`utils/subtitles.py`), ffmpeg segmentation
(`preprocess.video_to_segments`).

Library use:
    from demo.load_video import load_video
    segments = load_video("abc123XYZ", start_time=0.0)   # 8 x 5-s segments
    # each segment dict gains segment['sub'] = its midpoint-bucketed words

CLI: python demo/load_video.py VIDEO_ID [-start 0.0] [-cache cache/]
"""

from __future__ import annotations

import json
import os
import sys
from typing import Dict, List

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from merlot_reserve_tpu.utils.subtitles import words_to_segments  # noqa: E402


def load_video_info(video_id: str, cache_dir: str = "cache") -> Dict:
    """Word-timed transcript + metadata, cached as JSON
    (load_video.py:276-325 behavior: fetch once, reuse)."""
    from merlot_reserve_tpu.dataset_creation.youtube import (
        fetch_metadata, load_subtitle_words)

    os.makedirs(cache_dir, exist_ok=True)
    cache_fn = os.path.join(cache_dir, f"{video_id}.json")
    if os.path.exists(cache_fn):
        with open(cache_fn) as f:
            return json.load(f)
    meta = fetch_metadata(video_id)
    words = load_subtitle_words(cache_dir, video_id)
    info = {"id": video_id, "title": meta.get("title", ""),
            "transcript": words}
    if words:  # don't freeze an empty transcript (VTT not downloaded yet)
        with open(cache_fn, "w") as f:
            json.dump(info, f)
    return info


def load_video(video_id: str, start_time: float = 0.0,
               cache_dir: str = "cache", num_segments_max: int = 8) -> List[Dict]:
    """Download (cached), segment, and attach subtitles
    (load_video.py:386-397): each 5-s segment gets ``sub`` = the transcript
    words whose midpoint falls inside it."""
    from merlot_reserve_tpu.dataset_creation.youtube import download_video
    from merlot_reserve_tpu.preprocess import video_to_segments

    os.makedirs(cache_dir, exist_ok=True)
    # yt-dlp may merge to .mp4/.mkv/.webm — reuse whatever container exists.
    # Exact names only: a crashed pre-merge run leaves per-format fragments
    # ({id}.f137.mp4 = video-only, silent) that must NOT pass as cached.
    cached = [fn for ext in ("mp4", "mkv", "webm")
              for fn in [os.path.join(cache_dir, f"{video_id}.{ext}")]
              if os.path.exists(fn)]
    mp4_fn = cached[0] if cached else download_video(video_id, cache_dir)

    info = load_video_info(video_id, cache_dir)
    if cached and not info["transcript"]:
        # the video was cached but its VTT was never fetched (subs download
        # happens inside download_video, which the cache hit skipped) —
        # re-run the downloader (yt-dlp skips the existing media file) and
        # re-read; load_video_info never froze the empty transcript
        download_video(video_id, cache_dir)
        info = load_video_info(video_id, cache_dir)
    segments = video_to_segments(mp4_fn, time_interval=5.0,
                                 segment_start_time=start_time,
                                 num_segments_max=num_segments_max)
    return attach_subtitles(segments, info["transcript"])


def attach_subtitles(segments: List[Dict], words: List[Dict]) -> List[Dict]:
    """Midpoint-bucket transcript words into segments (pure; tested)."""
    subs = words_to_segments(words, segments)
    for seg, sub in zip(segments, subs):
        seg["sub"] = sub
    return segments


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("video_id")
    ap.add_argument("-start", type=float, default=0.0)
    ap.add_argument("-cache", default="cache")
    args = ap.parse_args()
    segs = load_video(args.video_id, start_time=args.start, cache_dir=args.cache)
    for s in segs:
        print(f"[{s['start_time']:.1f}-{s['end_time']:.1f}] {s.get('sub', '')}")
