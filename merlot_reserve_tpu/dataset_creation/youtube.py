"""YouTube acquisition for dataset creation — the capability of
/root/reference/data/download_youtube.py (yt-dlp wrapper with rate-limit
handling, language filtering, subtitle fetch). External tools are gated with
clear errors; everything downstream (VTT parsing, cleaning, alignment) is in
utils/subtitles.py and dataset_creation/.
"""

from __future__ import annotations

import json
import os
import subprocess
import time
from shutil import which
from typing import Dict, List, Optional


def _ytdlp() -> str:
    for name in ("yt-dlp", "youtube-dl"):
        if which(name):
            return name
    raise RuntimeError("yt-dlp/youtube-dl not found on PATH — required for "
                       "YouTube acquisition (offline tooling).")


def download_video(video_id: str, out_dir: str, max_height: int = 360,
                   rate_limit: Optional[str] = "1M", retries: int = 3) -> str:
    """Download one video at <=max_height with auto-subtitles; returns the
    video path. Retries with backoff on rate limiting."""
    tool = _ytdlp()
    out_tmpl = os.path.join(out_dir, f"{video_id}.%(ext)s")
    cmd = [tool, f"https://www.youtube.com/watch?v={video_id}",
           "-f", f"bestvideo[height<={max_height}]+bestaudio/best[height<={max_height}]",
           "--write-auto-subs", "--sub-langs", "en", "--sub-format", "vtt",
           "-o", out_tmpl, "--no-playlist"]
    if rate_limit:
        cmd += ["--limit-rate", rate_limit]
    for attempt in range(retries):
        res = subprocess.run(cmd, capture_output=True, text=True)
        if res.returncode == 0:
            for ext in ("mp4", "mkv", "webm"):
                p = os.path.join(out_dir, f"{video_id}.{ext}")
                if os.path.exists(p):
                    return p
            raise FileNotFoundError(f"download reported success but no file for {video_id}")
        if "429" in res.stderr or "rate" in res.stderr.lower():
            time.sleep(30 * (attempt + 1))
            continue
        raise RuntimeError(f"download failed for {video_id}: {res.stderr[-500:]}")
    raise RuntimeError(f"rate-limited out of retries for {video_id}")


def fetch_metadata(video_id: str) -> Dict:
    """Title/description/tags/duration via yt-dlp -J."""
    tool = _ytdlp()
    res = subprocess.run(
        [tool, f"https://www.youtube.com/watch?v={video_id}", "-J",
         "--no-playlist", "--skip-download"],
        capture_output=True, text=True)
    if res.returncode != 0:
        raise RuntimeError(f"metadata fetch failed: {res.stderr[-300:]}")
    meta = json.loads(res.stdout)
    return {
        "title": meta.get("title", ""),
        "description": meta.get("description", ""),
        "tags": " ".join(meta.get("tags", []) or []),
        "duration": float(meta.get("duration") or 0.0),
        "language": meta.get("language") or "",
    }


def is_probably_english(meta: Dict) -> bool:
    """Cheap language gate (the reference used CLD3; unavailable here): accept
    declared English or mostly-ASCII titles."""
    lang = (meta.get("language") or "").lower()
    if lang.startswith("en"):
        return True
    title = meta.get("title", "")
    if not title:
        return False
    ascii_frac = sum(c.isascii() for c in title) / len(title)
    return ascii_frac > 0.9


GAMING_KEYWORDS = ("gameplay", "playthrough", "walkthrough", "fortnite",
                   "minecraft", "speedrun", "let's play", "lets play")


def is_gaming_video(meta: Dict) -> bool:
    text = (meta.get("title", "") + " " + meta.get("tags", "")).lower()
    return any(k in text for k in GAMING_KEYWORDS)


def load_subtitle_words(out_dir: str, video_id: str) -> List[Dict]:
    """Parse the downloaded auto-sub VTT into timed words."""
    from merlot_reserve_tpu.utils.subtitles import parse_vtt

    for suffix in (".en.vtt", ".en-US.vtt", ".vtt"):
        p = os.path.join(out_dir, f"{video_id}{suffix}")
        if os.path.exists(p):
            with open(p) as f:
                return parse_vtt(f.read())
    return []
