#!/usr/bin/env python
"""MSRVTT-QA style zero-shot video QA — the pipeline of
/root/reference/demo/zero_shot_qa/: rewrite questions into statements with a
<|MASK|> slot (offline GPT-3 in the reference; a heuristic fallback here),
build the answer vocabulary from the top-k train answers, extract video
segments, and rank the vocabulary against the MASK hidden state.

``--qa`` accepts the reference's precomputed ``{split}_infill.json``
directly (questions already rewritten to <|MASK|> statements by its GPT-3
pass) — those rewrites are consumed as-is for benchmark-comparable
accuracy; the heuristic rewrite only kicks in for questions without a
mask slot.

Usage:
  python demo/zero_shot_qa.py build_vocab --train_qa train_qa.json --out vocab.txt
  python demo/zero_shot_qa.py infer --videos DIR --qa val_qa.json --vocab vocab.txt
"""

import argparse
import collections
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def cmd_build_vocab(args):
    with open(args.train_qa) as f:
        qa = json.load(f)
    counts = collections.Counter(x["answer"] for x in qa)
    vocab = [w for w, _ in counts.most_common(args.top_k)]
    with open(args.out, "w") as f:
        f.write("\n".join(vocab))
    print(f"wrote {len(vocab)} answers to {args.out}")


def cmd_infer(args):
    import jax.numpy as jnp

    from merlot_reserve_tpu.models.model import PretrainedMerlotReserve
    from merlot_reserve_tpu.preprocess import preprocess_video, video_to_segments
    from merlot_reserve_tpu.tokenizer import MASK
    from merlot_reserve_tpu.zero_shot import rank_options, statement_for_qa_item

    with open(args.vocab) as f:
        vocab = [l.strip() for l in f if l.strip()]
    with open(args.qa) as f:
        qa = json.load(f)

    model = PretrainedMerlotReserve.from_pretrained(args.model,
                                                    image_grid_size=(12, 20))
    n_correct = 0
    n_total = 0
    for item in qa[:args.limit] if args.limit else qa:
        video_fn = os.path.join(args.videos, f"video{item['video_id']}.mp4")
        try:
            segments = video_to_segments(video_fn, num_segments_max=8)
        except Exception as e:
            print(f"skip {video_fn}: {e}")
            continue
        statement = statement_for_qa_item(item)
        segments[0]["text"] = statement
        segments[0]["use_text_as_input"] = True
        for seg in segments[1:]:
            seg["use_text_as_input"] = False
        video_pre = preprocess_video(segments, output_grid_size=(12, 20),
                                     verbose=False)
        probs = rank_options(model, video_pre, vocab)
        pred = vocab[int(np.argmax(probs[0]))]
        n_correct += int(pred == item["answer"])
        n_total += 1
    print(f"accuracy: {n_correct}/{n_total} = {n_correct / max(n_total, 1):.4f}")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    pb = sub.add_parser("build_vocab")
    pb.add_argument("--train_qa", required=True)
    pb.add_argument("--out", required=True)
    pb.add_argument("--top_k", type=int, default=1500)
    pi = sub.add_parser("infer")
    pi.add_argument("--videos", required=True)
    pi.add_argument("--qa", required=True)
    pi.add_argument("--vocab", required=True)
    pi.add_argument("--model", default="base")
    pi.add_argument("--limit", type=int, default=0)
    args = ap.parse_args()
    {"build_vocab": cmd_build_vocab, "infer": cmd_infer}[args.cmd](args)


if __name__ == "__main__":
    main()
