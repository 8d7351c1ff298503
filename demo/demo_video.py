#!/usr/bin/env python
"""Zero-shot video mask-infilling demo — the /root/reference/demo/demo_video.py
surface: 8 segments (one text prompt ending in <|MASK|>, the rest audio),
embed the video, rank a label space against the MASK hidden states.

Usage: python demo/demo_video.py VIDEO.mp4 [--model large] [--grid 18,32] \
           --prompt "in this video i'll be<|MASK|>" --options "making coffee,going backpacking"
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from merlot_reserve_tpu.models.model import PretrainedMerlotReserve
from merlot_reserve_tpu.preprocess import preprocess_video, video_to_segments
from merlot_reserve_tpu.tokenizer import MASK


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("video")
    ap.add_argument("--model", default="large", choices=["base", "large"])
    ap.add_argument("--grid", default="18,32")
    ap.add_argument("--prompt", default="in this video i'll be<|MASK|>")
    ap.add_argument("--options", required=True,
                    help="comma-separated label space")
    ap.add_argument("--start_segment", type=int, default=0)
    args = ap.parse_args()

    grid = tuple(int(x) for x in args.grid.split(","))
    model = PretrainedMerlotReserve.from_pretrained(args.model, image_grid_size=grid)

    segments = video_to_segments(args.video)
    segments = segments[args.start_segment:args.start_segment + 8]
    segments[0]["text"] = args.prompt
    segments[0]["use_text_as_input"] = True
    for seg in segments[1:]:
        seg["use_text_as_input"] = False

    video_pre = preprocess_video(segments, output_grid_size=grid, verbose=True)
    out_h = model.embed_video(**{k: jnp.asarray(v) for k, v in video_pre.items()})
    out_h = out_h[jnp.asarray(video_pre["tokens"]) == MASK]

    options = [o.strip() for o in args.options.split(",")]
    label_space = model.get_label_space(options)
    logits = 100.0 * jnp.einsum("bh,lh->bl", out_h, label_space)

    for i, logits_i in enumerate(logits):
        print(f"MASK {i}:")
        probs = jax.nn.softmax(logits_i, -1)
        for idx in jnp.argsort(-probs)[:10]:
            print(f"  {float(probs[idx]) * 100:5.1f}%  {options[int(idx)]}")


if __name__ == "__main__":
    main()
