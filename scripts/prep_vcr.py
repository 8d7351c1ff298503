#!/usr/bin/env python
"""Build VCR finetuning TFRecords — the capability of
/root/reference/finetune/vcr/prep_data.py: for each annotation, render the
referenced detection boxes into the image (name-colored, semi-transparent),
pre-render the left-right flip, rewrite detection tags to text, tokenize
Q/A/R options, and write records in the schema finetune/data.py parses.

Input manifest: jsonl with per-line
  {"id", "image_path", "boxes": [[x1,y1,x2,y2],...], "names": [...],
   "qa_query": [mixed tokens], "qa_choices": [[...]x4], "qa_label": int,
   "qar_query": [...], "qar_choices": [[...]x4], "qar_label": int}
where mixed tokens are words or detection-index lists (VCR's format).
"""

import argparse
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-manifest", required=True)
    ap.add_argument("-out", required=True)
    ap.add_argument("-max_records", type=int, default=0)
    args = ap.parse_args()

    from PIL import Image

    from merlot_reserve_tpu.data import tfrecord as T
    from merlot_reserve_tpu.finetune.prep_data import (
        draw_boxes_on_image,
        rewrite_detection_tags,
    )
    from merlot_reserve_tpu.tokenizer import get_tokenizer

    enc = get_tokenizer()

    def jpeg_bytes(arr):
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=90)
        return buf.getvalue()

    records = []
    with open(args.manifest) as f:
        for line in f:
            ann = json.loads(line)
            img = np.asarray(Image.open(ann["image_path"]).convert("RGB"))
            img = draw_boxes_on_image(img, ann.get("boxes", []),
                                      ann.get("names", []))
            feats = {
                "id": T.bytes_feature([ann["id"].encode()]),
                "image": T.bytes_feature([jpeg_bytes(img)]),
                "image_fliplr": T.bytes_feature([jpeg_bytes(img[:, ::-1])]),
            }
            for prefix in ("qa", "qar"):
                query = rewrite_detection_tags(ann[f"{prefix}_query"],
                                               ann.get("names", []))
                feats[f"{prefix}_query"] = T.int64_feature(enc.encode(query).ids)
                for i, choice in enumerate(ann[f"{prefix}_choices"]):
                    text = rewrite_detection_tags(choice, ann.get("names", []))
                    feats[f"{prefix}_choice_{i}"] = T.int64_feature(
                        enc.encode(text).ids)
                feats[f"{prefix}_label"] = T.int64_feature([ann[f"{prefix}_label"]])
            records.append(T.encode_example(feats))
            if args.max_records and len(records) >= args.max_records:
                break

    T.write_records(args.out, records)
    print(f"wrote {len(records)} records to {args.out}")


if __name__ == "__main__":
    main()
