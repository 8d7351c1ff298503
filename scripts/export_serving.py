"""Build an AOT serving artifact from a checkpoint.

    python scripts/export_serving.py base.yaml -ckpt /path/ckpt_750000 \
        -out /path/artifact -batch_size 8 -num_segments 8

The artifact directory (StableHLO + f16 params + manifest) then serves via
merlot_reserve_tpu.export.load_serving_artifact on any host with jax —
no model code, no re-trace, platform-checked (TPU with CPU fallback by
default). See merlot_reserve_tpu/export.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("-ckpt", required=True)
    ap.add_argument("-out", required=True)
    ap.add_argument("-batch_size", type=int, default=8)
    ap.add_argument("-num_segments", type=int, default=8)
    ap.add_argument("-num_options", type=int, default=64)
    ap.add_argument("-output_grid_h", type=int, default=12)
    ap.add_argument("-output_grid_w", type=int, default=20)
    ap.add_argument("-platforms", default="tpu,cpu")
    args = ap.parse_args()

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache"))

    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.export import export_serving_artifact
    from merlot_reserve_tpu.models import MerlotReserve
    from merlot_reserve_tpu.tokenizer import AUDIOSPAN
    from merlot_reserve_tpu.utils.checkpoint import load_checkpoint, stack_layer_params

    grid = (args.output_grid_h, args.output_grid_w)
    cfg = mr.load_config(args.config, output_grid=grid)
    model = MerlotReserve.from_config(cfg)
    params = load_checkpoint(args.ckpt)["params"]
    if cfg.model.scan_layers:
        params = stack_layer_params(params)

    # shape-defining example (preprocess_video contract: per-segment either
    # text or 18 AUDIOSPAN tokens; the exported graph only needs the shapes)
    n = args.num_segments
    lang = cfg.data.lang_seq_len
    tokens = np.zeros(lang, np.int32)
    tokens[:18] = AUDIOSPAN
    subseg = np.zeros(lang, np.int32)
    subseg[:18] = np.arange(18) // 6
    example = {
        "images": np.zeros((n, grid[0] * grid[1], 768), np.float32),
        "audio_clips": np.zeros((3 * n, 60, 65), np.float32),
        "tokens": tokens, "subseg_idxs": subseg,
    }
    manifest = export_serving_artifact(
        model, params, example, args.out, batch_size=args.batch_size,
        num_options=args.num_options,
        platforms=tuple(args.platforms.split(",")))
    print(f"wrote {args.out}: {manifest}")


if __name__ == "__main__":
    main()
