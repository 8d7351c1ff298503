#!/usr/bin/env python
"""Build TVQA finetuning TFRecords — the capability of
/root/reference/finetune/tvqa/prep_data.py:134-338: 7 ~4.667-second segments
centered on the localized QA span, frames + one JPEG-quantized [3, 60, 65]
spectrogram per segment, subtitles bucketed by midpoint, relative
localization tokens prepended to the query.

Input manifest: jsonl with per-line
  {"id", "video_path", "ts_start", "ts_end", "question",
   "answers": [...x5], "label": int,
   "subtitles": [{"word","start","end"}, ...]  (optional; else none)}
"""

import argparse
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NUM_SEGMENTS = 7
SEGMENT_LEN = 4.6667


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-manifest", required=True)
    ap.add_argument("-out", required=True)
    ap.add_argument("-max_records", type=int, default=0)
    args = ap.parse_args()

    from PIL import Image

    from merlot_reserve_tpu import preprocess as P
    from merlot_reserve_tpu.data import tfrecord as T
    from merlot_reserve_tpu.dataset_creation.spectrogram import quantize_spectrogram
    from merlot_reserve_tpu.finetune.prep_data import (
        relative_localization_tokens,
        tvqa_segment_times,
    )
    from merlot_reserve_tpu.ops.audio import batch_make_spectrogram
    from merlot_reserve_tpu.tokenizer import get_tokenizer
    from merlot_reserve_tpu.utils.subtitles import words_to_segments

    enc = get_tokenizer()
    sr = 22050

    def jpeg_bytes(arr, mode="RGB"):
        buf = io.BytesIO()
        Image.fromarray(arr, mode=mode).save(buf, format="JPEG", quality=90)
        return buf.getvalue()

    records = []
    with open(args.manifest) as f:
        for line in f:
            ann = json.loads(line)
            duration = P.video_duration(ann["video_path"])
            seg_times = tvqa_segment_times(ann["ts_start"], ann["ts_end"],
                                           duration, NUM_SEGMENTS, SEGMENT_LEN)
            frames = P.extract_frames_from_video(
                ann["video_path"], [t["mid_time"] for t in seg_times])
            if frames is None:
                print(f"skip {ann['id']}: frame extraction failed")
                continue
            waveform = P.extract_audio_waveform(ann["video_path"], sr=sr)

            # spectrograms: resample each 4.667 s window onto the 5 s
            # 188-frame grid by padding (the reference resamples the audio
            # instead; padding keeps hop semantics with our on-device DSP)
            seg_len_samples = int(sr * 5.0)
            clips = []
            for t in seg_times:
                s0 = int(t["start_time"] * sr)
                wav = waveform[s0:s0 + int(SEGMENT_LEN * sr)]
                pad = seg_len_samples - len(wav)
                wav = np.concatenate([wav, np.zeros(max(pad, 0), np.float32)])
                clips.append(wav[:seg_len_samples])
            specs = np.asarray(batch_make_spectrogram(np.stack(clips)))  # [7,3,60,65]

            subs = words_to_segments(ann.get("subtitles", []), seg_times)

            # one magic number per record (the reference stores one)
            flat = specs[..., :64].reshape(NUM_SEGMENTS, 3 * 60, 64)
            magic = 255.0 / max(np.percentile(flat, 99), 1.0)

            query_toks = relative_localization_tokens(
                ann["ts_start"], ann["ts_end"], seg_times, enc) + \
                enc.encode(ann["question"]).ids

            feats = {
                "id": T.bytes_feature([ann["id"].encode()]),
                "magic_number": T.float_feature([float(magic)]),
                "qa_query": T.int64_feature(query_toks),
                "qa_label": T.int64_feature([ann["label"]]),
                "num_frames": T.int64_feature([NUM_SEGMENTS]),
            }
            for i, answer in enumerate(ann["answers"]):
                feats[f"qa_choice_{i}"] = T.int64_feature(enc.encode(answer).ids)
            for i in range(NUM_SEGMENTS):
                spec_u8 = np.minimum(flat[i] * magic, 255.0).astype(np.uint8)
                feats[f"c{i:02d}/image_encoded"] = T.bytes_feature(
                    [jpeg_bytes(frames[i])])
                feats[f"c{i:02d}/spec_encoded"] = T.bytes_feature(
                    [jpeg_bytes(spec_u8, mode="L")])
                feats[f"c{i:02d}/sub"] = T.int64_feature(
                    enc.encode(subs[i]).ids if subs[i] else [])
            records.append(T.encode_example(feats))
            if args.max_records and len(records) >= args.max_records:
                break

    T.write_records(args.out, records)
    print(f"wrote {len(records)} records to {args.out}")


if __name__ == "__main__":
    main()
