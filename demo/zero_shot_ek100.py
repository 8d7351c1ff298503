#!/usr/bin/env python
"""EPIC-Kitchens-100 zero-shot action anticipation — the two-stage pipeline of
/root/reference/demo/zero_shot_ek/{extract_ek100_feat,zero_shot_eval_ek100}.py:

stage 1 (extract): for each annotation, take 8 x 2-second observed segments
ending at the anticipation boundary, feed them as audio, append a text
segment "My next action is <|MASK|>", cache the MASK hidden state;
stage 2 (eval): rank the 3806-way 'verb noun' label space, report
top-1/5 verb/noun/action accuracy.

Usage:
  python demo/zero_shot_ek100.py extract --videos DIR --annotations CSV --out feats.pkl
  python demo/zero_shot_ek100.py eval --feats feats.pkl --annotations CSV \
      --verb_classes CSV --noun_classes CSV
"""

import argparse
import csv
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_annotations(path):
    with open(path) as f:
        return list(csv.DictReader(f))


def cmd_extract(args):
    from merlot_reserve_tpu.models.model import PretrainedMerlotReserve
    from merlot_reserve_tpu.preprocess import preprocess_video, video_to_segments_zero_shot
    from merlot_reserve_tpu.zero_shot import extract_mask_features

    model = PretrainedMerlotReserve.from_pretrained(args.model,
                                                    image_grid_size=(12, 20))
    annotations = load_annotations(args.annotations)

    feats, ids = [], []
    batch_pres = []
    for ann in annotations:
        video_fn = os.path.join(args.videos, ann["video_id"] + ".mp4")
        t_end = float(ann.get("start_frame", 0)) / float(ann.get("fps", 30)) - 1.0
        times = [{"start_time": max(t_end - 2.0 * (8 - i), 0.0),
                  "end_time": max(t_end - 2.0 * (7 - i), 0.5),
                  "mid_time": max(t_end - 2.0 * (7.5 - i), 0.25)}
                 for i in range(8)]
        segments = video_to_segments_zero_shot(video_fn, times=times)
        for seg in segments[:-1]:
            seg["use_text_as_input"] = False
        segments[-1]["text"] = "My next action is<|MASK|>"
        segments[-1]["use_text_as_input"] = True
        batch_pres.append(preprocess_video(segments, output_grid_size=(12, 20),
                                           verbose=False))
        ids.append(ann.get("narration_id", ann["video_id"]))
        if len(batch_pres) == args.batch_size:
            feats.append(extract_mask_features(model, batch_pres))
            batch_pres = []
    if batch_pres:
        feats.append(extract_mask_features(model, batch_pres))

    with open(args.out, "wb") as f:
        pickle.dump({"ids": ids, "features": np.concatenate(feats)}, f)
    print(f"wrote {len(ids)} features to {args.out}")


def cmd_eval(args):
    from merlot_reserve_tpu.models.model import PretrainedMerlotReserve
    from merlot_reserve_tpu.zero_shot import score_label_space, verb_noun_action_accuracy

    with open(args.feats, "rb") as f:
        cache = pickle.load(f)
    annotations = {a.get("narration_id", a["video_id"]): a
                   for a in load_annotations(args.annotations)}
    verbs = {int(r["id"]): r["key"].replace("-", " ")
             for r in load_annotations(args.verb_classes)}
    nouns = {int(r["id"]): r["key"].split(":")[0].replace("-", " ")
             for r in load_annotations(args.noun_classes)}

    # label space = all (verb, noun) pairs present in the annotations
    pairs = sorted({(int(a["verb_class"]), int(a["noun_class"]))
                    for a in annotations.values()})
    options = [f"{verbs[v]} {nouns[n]}" for v, n in pairs]
    action_to_verb = np.asarray([v for v, _ in pairs])
    action_to_noun = np.asarray([n for _, n in pairs])
    pair_index = {p: i for i, p in enumerate(pairs)}

    model = PretrainedMerlotReserve.from_pretrained(args.model,
                                                    image_grid_size=(12, 20))
    logits = score_label_space(model, cache["features"], options)
    labels = np.asarray([
        pair_index[(int(annotations[i]["verb_class"]),
                    int(annotations[i]["noun_class"]))]
        for i in cache["ids"]])
    metrics = verb_noun_action_accuracy(logits, labels, action_to_verb,
                                        action_to_noun)
    for k, v in sorted(metrics.items()):
        print(f"{k}: {v * 100:.2f}%")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    pe = sub.add_parser("extract")
    pe.add_argument("--videos", required=True)
    pe.add_argument("--annotations", required=True)
    pe.add_argument("--out", required=True)
    pe.add_argument("--model", default="base")
    pe.add_argument("--batch_size", type=int, default=8)
    pv = sub.add_parser("eval")
    pv.add_argument("--feats", required=True)
    pv.add_argument("--annotations", required=True)
    pv.add_argument("--verb_classes", required=True)
    pv.add_argument("--noun_classes", required=True)
    pv.add_argument("--model", default="base")
    args = ap.parse_args()
    {"extract": cmd_extract, "eval": cmd_eval}[args.cmd](args)


if __name__ == "__main__":
    main()
