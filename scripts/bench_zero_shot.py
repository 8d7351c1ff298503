"""Batched zero-shot TVQA inference throughput (BASELINE.json config 2).

Three ways to answer a TVQA question with a pretrained checkpoint, all on
this chip, full `base` towers, the finetune recipe's shapes (7 segments,
lang_seq 256, grid 12x20):

  1. `ours_zs`   — MerlotReserveTVQAZeroShot (finetune/models.py): ONE
     MASK-statement sequence per stream; the MASK hidden state goes through
     the pretrained ``joint_proj`` and is ranked against the 5 span-encoded
     answers (per-question ``get_label_space`` semantics, batched).
  2. `ours_ft`   — MerlotReserveTVQA forward (the standard checkpoint-eval
     path, tvqa_finetune.py:155-264 semantics): 5 per-answer sequences per
     stream through the joint tower. This is what the reference's own val
     loop runs per example.
  3. `ref_zs`    — the SAME zero-shot computation reconstructed on the
     reference's own ``mreserve.modeling`` modules (read-only import; its
     TVQA script cannot be imported — module-level argparse + dataset IO).
     Labeled oracle-harness code, like scripts/bench_finetune.py:167-258.
     Expected ~1.0x vs `ours_zs` (checkpoint-identical math); it anchors the
     comparison so the `ours_zs` vs `ours_ft` ratio reads as an
     architectural win, not a measurement artifact.

Inference-only (no grads); params are donated and threaded through each
call (CLAUDE.md: non-donated args re-upload ~1.5 GB/s per execution).
Timing chains N invocations inside one jit with a data dependency and
reports (t(N)-t(1))/(N-1) (cancels the dev relay's per-execution overhead).
Prints one JSON line per path.
"""

import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

ZS_BATCH = int(os.environ.get("ZS_BATCH", "8"))
FT_BATCH = int(os.environ.get("FT_BATCH", "8"))
N_CHAIN = int(os.environ.get("BENCH_CHAIN", "8"))
NUM_SEGMENTS = 7
LANG_SEQ = 256
GRID = (12, 20)
NUM_OPTIONS = 5
SPAN_LEN = 15


def _tvqa_batch_np(bsz, num_ans_per, rng, with_answer_table):
    """Synthetic batch at the finetune recipe's shapes; `num_ans_per` is 5
    for the finetune forward (one sequence per answer) and 1 for the
    zero-shot statement."""
    from merlot_reserve_tpu.tokenizer import AUDIOSPAN, MASK

    hw = GRID[0] * GRID[1]
    text = rng.randint(10, 30000, (bsz, num_ans_per, LANG_SEQ)).astype(np.int32)
    text[:, :, 24] = MASK
    seg_ids = np.minimum(np.arange(LANG_SEQ) // (LANG_SEQ // (NUM_SEGMENTS + 1)),
                         NUM_SEGMENTS).astype(np.int32)
    textonly = np.stack([text, np.broadcast_to(seg_ids, text.shape)], -1)
    audio = text.copy()
    audio[:, :, 32:32 + 18 * NUM_SEGMENTS // 2] = AUDIOSPAN
    audio_seqs = np.stack([audio, np.broadcast_to(seg_ids, audio.shape)], -1)
    batch = {
        "images": rng.randn(bsz, NUM_SEGMENTS, hw, 768).astype(np.float32),
        "audio_clips": rng.randn(bsz, NUM_SEGMENTS, 3, 60, 65).astype(np.float32),
        "textonly_seqs": textonly.astype(np.int32),
        "audio_seqs": audio_seqs.astype(np.int32),
    }
    if with_answer_table:
        batch["answers"] = rng.randint(
            10, 30000, (bsz, NUM_OPTIONS, SPAN_LEN)).astype(np.int32)
    return batch


def _time_chained_fwd(apply_fn, params, batch):
    """(t(N)-t(1))/(N-1) for a forward; params donated and threaded."""
    import jax
    import jax.numpy as jnp

    def make(n):
        def chained(p, b):
            def one(b_):
                out = apply_fn(p, b_)
                leaves = jax.tree.leaves(out)
                return leaves[0].astype(jnp.float32).reshape(-1)[0]

            s = one(b)

            def body(i, s):
                return s + one({**b, "images": b["images"] + s * 1e-20}) * 0.0

            s = jax.lax.fori_loop(0, n - 1, body, s)
            return p, s

        return jax.jit(chained, donate_argnums=(0,))

    times = {}
    for n in (1, N_CHAIN):
        fn = make(n)
        params, out = fn(params, batch)
        np.asarray(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            params, out = fn(params, batch)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    return max((times[N_CHAIN] - times[1]) / (N_CHAIN - 1), 1e-9), params


def _our_model(cls):
    import jax

    import merlot_reserve_tpu as mr

    cfg = mr.load_config("base", output_grid=GRID,
                         use_bfloat16=jax.default_backend() == "tpu",
                         scan_layers=False)
    cfg = cfg.replace_data(lang_seq_len=LANG_SEQ, num_segments=NUM_SEGMENTS)
    return cls.from_config(cfg)


def bench_ours_zero_shot():
    import jax.numpy as jnp

    from merlot_reserve_tpu.finetune.models import MerlotReserveTVQAZeroShot

    model = _our_model(MerlotReserveTVQAZeroShot)
    rng = np.random.RandomState(0)
    batch_np = _tvqa_batch_np(ZS_BATCH, 1, rng, with_answer_table=True)
    params = model.init_params(batch_np)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    def apply_fn(p, b):
        return model.apply({"params": p}, b)

    dt, _ = _time_chained_fwd(apply_fn, params, batch)
    return dt


def bench_ours_finetune_fwd():
    import jax.numpy as jnp

    from merlot_reserve_tpu.finetune.models import (
        MerlotReserveTVQA,
        adapt_pretrained_params,
    )

    model = _our_model(MerlotReserveTVQA)
    rng = np.random.RandomState(0)
    batch_np = _tvqa_batch_np(FT_BATCH, NUM_OPTIONS, rng, with_answer_table=False)
    params = model.init_params(batch_np)
    params = adapt_pretrained_params(dict(params), 768, drop_audio=False)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    def apply_fn(p, b):
        return model.apply({"params": p}, b)

    dt, _ = _time_chained_fwd(apply_fn, params, batch)
    return dt


def bench_reference_zero_shot():
    import jax
    import jax.numpy as jnp
    import yaml

    if not hasattr(jax, "tree_map"):
        jax.tree_map = jax.tree.map
    sys.path.insert(1, "/root/reference")
    if "tensorflow_datasets" not in sys.modules:
        sys.modules["tensorflow_datasets"] = types.ModuleType("tensorflow_datasets")
    import mreserve.modeling as ref_modeling

    from merlot_reserve_tpu.tokenizer import AUDIOSPAN, MASK

    # The zero-shot ranking computation on the reference's OWN modules
    # (two-stream fusion per tvqa_finetune.py:155-264 with num_ans_per=1,
    # then modeling.py:806-843's joint_proj + :1024-1032's label space).
    class RefTVQAZeroShot(ref_modeling.MerlotReserve):
        def __call__(self, batch):
            batch_size, images_per_batch, seq_size, img_dim = batch["images"].shape
            imgs_enc = self.vision_encoder(batch["images"].reshape(
                batch_size * images_per_batch, seq_size, img_dim))["seq_attnpool"]
            imgs_enc = imgs_enc.reshape(batch_size, images_per_batch,
                                        seq_size // 4, self.hidden_size)
            imgs_enc = jnp.concatenate([
                jnp.zeros([batch_size, 1, seq_size // 4, self.hidden_size],
                          dtype=imgs_enc.dtype), imgs_enc], 1)
            images_per_batch += 1
            batch_size, num_ans_per, joint_seq_len, _ = batch["textonly_seqs"].shape
            imgs_enc = imgs_enc.reshape(
                batch_size, images_per_batch * seq_size // 4,
                self.hidden_size).repeat(num_ans_per, axis=0)

            text_toks = batch["textonly_seqs"][..., 0].reshape(
                batch_size * num_ans_per, joint_seq_len)
            textonly_inputs = self.prepare_multimodal_inputs(
                tokens=text_toks,
                token_segment_idx=batch["textonly_seqs"][..., 1].reshape(
                    batch_size * num_ans_per, joint_seq_len),
                vision_input=imgs_enc,
            )

            bsz, n_seg, n_sub, audio_seq_len, num_mels = batch["audio_clips"].shape
            audio_enc = self.audio_encoder(batch["audio_clips"].reshape(
                -1, audio_seq_len, num_mels))["seq_attnpool"]
            _, audio_token_len, hidden_size = audio_enc.shape
            num_audio_spans = n_seg * n_sub
            audio_enc = audio_enc.reshape(
                bsz, num_audio_spans, audio_token_len, hidden_size
            ).repeat(num_ans_per, axis=0)

            audio_toks = batch["audio_seqs"][..., 0].reshape(
                batch_size * num_ans_per, joint_seq_len)
            audio_pointers = (jnp.cumsum(
                (audio_toks == AUDIOSPAN).astype(jnp.int32), -1) - 1
            ) // audio_token_len
            audio_pointers = audio_pointers % num_audio_spans
            audio_inputs = self.prepare_multimodal_inputs(
                tokens=audio_toks,
                token_segment_idx=batch["audio_seqs"][..., 1].reshape(
                    batch_size * num_ans_per, joint_seq_len),
                vision_input=imgs_enc,
                audio_spans=audio_enc,
                audio_pointers=audio_pointers,
            )
            start_imgs = joint_seq_len + seq_size // 4
            for k in ["x", "rotary_coords", "attention_mask"]:
                textonly_inputs[k] = jnp.concatenate(
                    [textonly_inputs[k][:, :joint_seq_len],
                     textonly_inputs[k][:, start_imgs:]], 1)
                audio_inputs[k] = jnp.concatenate(
                    [audio_inputs[k][:, :joint_seq_len],
                     audio_inputs[k][:, start_imgs:]], 1)
            for d in (textonly_inputs, audio_inputs):
                d["attention_mask"] = jnp.concatenate(
                    [d["attention_mask"][:, :, :joint_seq_len],
                     d["attention_mask"][:, :, start_imgs:]], 2)

            x = jnp.concatenate([audio_inputs["x"], textonly_inputs["x"]], 0)
            coords = jnp.concatenate([audio_inputs["rotary_coords"],
                                      textonly_inputs["rotary_coords"]], 0)
            attnmask = jnp.concatenate([audio_inputs["attention_mask"],
                                        textonly_inputs["attention_mask"]], 0)
            joint_enc = self.joint_transformer(
                x, rotary_coords=coords, attention_mask=attnmask)["seq"]
            joint_enc = joint_enc[:, :joint_seq_len].reshape(
                batch_size * 2 * num_ans_per, joint_seq_len, self.hidden_size)
            pool_idx = jnp.argmax((jnp.concatenate([audio_toks, text_toks], 0)
                                   == MASK).astype(jnp.float32), 1)
            pooled = joint_enc[jnp.arange(batch_size * 2 * num_ans_per), pool_idx]
            h = ref_modeling.unit_normalize(self.joint_proj(pooled)).reshape(
                2, batch_size * num_ans_per, self.hidden_size)

            n_opt, span_len = batch["answers"].shape[-2:]
            opts = self.embed_text_spans_only(
                batch["answers"].reshape(-1, span_len)
            ).reshape(batch_size, n_opt, self.hidden_size)
            logits = jnp.einsum("sbh,boh->sbo", h, opts)
            return logits[0], logits[1]

    with open("/root/reference/pretrain/configs/base.yaml") as f:
        config = yaml.safe_load(f)
    config["model"]["output_grid"] = list(GRID)
    config["data"]["lang_seq_len"] = LANG_SEQ
    config["data"]["num_segments"] = NUM_SEGMENTS
    config["model"]["use_bfloat16"] = jax.default_backend() == "tpu"
    model = RefTVQAZeroShot.from_config(config)

    rng = np.random.RandomState(0)
    batch_np = _tvqa_batch_np(ZS_BATCH, 1, rng, with_answer_table=True)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    with jax.default_device(jax.devices("cpu")[0]):
        params = model.init(jax.random.PRNGKey(0), batch)["params"]
    params = jax.device_put(dict(params))

    def apply_fn(p, b):
        return model.apply({"params": p}, b)

    dt, _ = _time_chained_fwd(apply_fn, params, batch)
    return dt


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    tasks = sys.argv[1:] or ["ours_zs", "ref_zs", "ours_ft"]
    results = {}
    for task in tasks:
        if task == "ours_zs":
            dt = bench_ours_zero_shot()
            bsz = ZS_BATCH
        elif task == "ours_ft":
            dt = bench_ours_finetune_fwd()
            bsz = FT_BATCH
        elif task == "ref_zs":
            dt = bench_reference_zero_shot()
            bsz = ZS_BATCH
        else:
            raise SystemExit(f"unknown task {task!r}")
        results[task] = bsz / dt
        print(json.dumps({
            "metric": "tvqa_zero_shot_inference", "impl": task,
            "batch": bsz, "ms_per_batch": round(dt * 1000, 2),
            "examples_per_sec_chip": round(bsz / dt, 2),
        }), flush=True)

    if "ours_zs" in results and "ref_zs" in results:
        print(json.dumps({
            "metric": "tvqa_zero_shot_vs_reference_modules",
            "ratio": round(results["ours_zs"] / results["ref_zs"], 3)}),
            flush=True)
    if "ours_zs" in results and "ours_ft" in results:
        print(json.dumps({
            "metric": "tvqa_zero_shot_vs_finetune_forward",
            "ratio": round(results["ours_zs"] / results["ours_ft"], 3)}),
            flush=True)


if __name__ == "__main__":
    main()
