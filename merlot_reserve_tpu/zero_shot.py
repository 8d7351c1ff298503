"""Zero-shot inference toolkit: mask-infilling ranking and batched feature
extraction — the library core behind /root/reference/demo/ (demo_video.py,
zero_shot_ek/extract_ek100_feat.py + zero_shot_eval_ek100.py,
zero_shot_qa/inference.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from merlot_reserve_tpu.tokenizer import MASK


def rank_options(model, video_pre: Dict, options: Sequence[str],
                 temperature: float = 100.0) -> np.ndarray:
    """Embed one preprocessed video and rank ``options`` at each MASK position.

    :param model: PretrainedMerlotReserve
    :param video_pre: preprocess_video output
    :return: [num_masks, num_options] probabilities
    """
    args = {k: jnp.asarray(v) for k, v in video_pre.items()}
    out_h = model.embed_video(**args)
    out_h = out_h[args["tokens"] == MASK]
    label_space = model.get_label_space(list(options))
    logits = temperature * jnp.einsum("bh,lh->bl", out_h, label_space)
    return np.asarray(jax.nn.softmax(logits, -1))


def extract_mask_features(model, video_pres: List[Dict]) -> np.ndarray:
    """Batch-embed videos and return the hidden state at the FIRST MASK of
    each (the EK-100 extract stage, extract_ek100_feat.py:17-158). All videos
    must share shapes."""
    # stack only the embed inputs — video_pre dicts may carry extra metadata
    # (ids, subtitle lists) that isn't stackable
    batch = {k: jnp.stack([jnp.asarray(v[k]) for v in video_pres])
             for k in ("images", "audio_clips", "tokens", "subseg_idxs")}
    out = model.batch_embed_video(batch["images"], batch["audio_clips"],
                                  batch["tokens"], batch["subseg_idxs"])
    feats = []
    for i, vp in enumerate(video_pres):
        mask_pos = int(np.argmax(np.asarray(vp["tokens"]) == MASK))
        feats.append(np.asarray(out[i, mask_pos]))
    return np.stack(feats)


def score_label_space(model, mask_features: np.ndarray, options: Sequence[str],
                      temperature: float = 100.0) -> np.ndarray:
    """[N, H] precomputed MASK features x label space -> [N, num_options]
    logits (the EK-100/MSRVTT eval stage)."""
    label_space = model.get_label_space(list(options))
    return np.asarray(temperature * jnp.einsum(
        "bh,lh->bl", jnp.asarray(mask_features), label_space))


def topk_accuracy(logits: np.ndarray, labels: np.ndarray, ks=(1, 5)) -> Dict[str, float]:
    """Top-k accuracies (zero_shot_eval_ek100.py metric surface)."""
    order = np.argsort(-logits, axis=-1)
    out = {}
    for k in ks:
        hit = (order[:, :k] == labels[:, None]).any(-1)
        out[f"top{k}"] = float(hit.mean())
    return out


def verb_noun_action_accuracy(logits: np.ndarray, labels: np.ndarray,
                              action_to_verb: np.ndarray,
                              action_to_noun: np.ndarray,
                              ks=(1, 5)) -> Dict[str, float]:
    """EK-100 style: action logits are over 'verb noun' strings; verb/noun
    accuracy marginalizes over the other factor by max."""
    out = {}
    for name, mapping in [("action", None), ("verb", action_to_verb),
                          ("noun", action_to_noun)]:
        if mapping is None:
            lg, lb = logits, labels
        else:
            n_classes = int(mapping.max()) + 1
            lg = np.full((logits.shape[0], n_classes), -1e9, logits.dtype)
            np.maximum.at(lg.T, mapping, logits.T)
            lb = mapping[labels]
        for k, v in topk_accuracy(lg, lb, ks).items():
            out[f"{name}_{k}"] = v
    return out


def _local_batch_rows(arr) -> np.ndarray:
    """Global dim-0 positions this process's loader filled when
    form_global_batch assembled ``arr`` — ascending, matching the local
    batch's row order (make_array_from_process_local_data places local rows
    into the process's addressable shards in index order)."""
    if jax.process_count() == 1:
        return np.arange(arr.shape[0])
    pid = jax.process_index()
    spans = set()
    for d, idx in arr.sharding.devices_indices_map(arr.shape).items():
        if d.process_index != pid:
            continue
        sl = idx[0]
        spans.add((sl.start or 0,
                   arr.shape[0] if sl.stop is None else sl.stop))
    return np.concatenate([np.arange(a, b) for a, b in sorted(spans)])


def zero_shot_qa_eval(model, params, batches, task: str,
                      temperature: float = 100.0, mesh=None):
    """Batched zero-shot TVQA / VCR evaluation (BASELINE.json config 2).

    :param model: MerlotReserveTVQAZeroShot or MerlotReserveVCRZeroShot
    :param params: pretrained param tree (device-resident; donated and
        threaded across batches so they upload once — see CLAUDE.md)
    :param batches: iterator of ``(ids, batch)`` from
        ``finetune_batches(..., task='{tvqa,vcr}_zero_shot', return_ids=True,
        repeat=False)``; padded slots carry id ``'pad'`` and are skipped
    :param task: 'tvqa' (two streams; joint = softmax sum as in
        tvqa_finetune.py:308) or 'vcr' (qa + qar tasks)
    :param mesh: optional ``jax.sharding.Mesh`` — batches enter dp-sharded
        through ``form_global_batch`` (multi-host: each process feeds its
        slice and iterates its OWN ids; the forward is one SPMD program and
        predictions come back replicated, then each process keeps the rows
        it contributed). Metrics/rows are PER-PROCESS on a pod — aggregate
        across hosts if you need the global number.
    :return: (metrics dict, per-example prediction rows)
    """
    from contextlib import nullcontext
    from functools import partial

    # donation below consumes the tree we place; copy so the CALLER's params
    # survive (device_put alone is a no-op for already-committed arrays and
    # the donated buffer would be the caller's)
    params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)

    if mesh is not None:
        from merlot_reserve_tpu.parallel.mesh import activate_mesh
        from merlot_reserve_tpu.parallel.sharding import (batch_sharding,
                                                          form_global_batch,
                                                          param_shardings)
        from jax.sharding import NamedSharding, PartitionSpec

        p_shardings = param_shardings(mesh, params)
        # outputs replicated: on a pod every process then holds a full copy
        # and can read it (a dp-sharded output spans non-addressable devices
        # and np.asarray on it would throw)
        fn = jax.jit(lambda p, b: (p, model.apply({"params": p}, b)),
                     in_shardings=(p_shardings, batch_sharding(mesh)),
                     out_shardings=(p_shardings,
                                    NamedSharding(mesh, PartitionSpec())),
                     donate_argnums=(0,))
        params = jax.device_put(params, p_shardings)
        scope = activate_mesh(mesh)
    else:
        @partial(jax.jit, donate_argnums=(0,))
        def fn(p, batch):
            return p, model.apply({"params": p}, batch)

        params = jax.device_put(params)
        scope = nullcontext()

    rows, hits = [], []
    with scope:
        for ids, batch in batches:
            bd = {k: jnp.asarray(v) for k, v in batch.items() if k != "labels"}
            if mesh is not None:
                bd = form_global_batch(mesh, bd)
            params, out = fn(params, bd)
            # rows THIS process contributed (global preds are replicated):
            # every row single-process, the local slice on a pod
            sel = (_local_batch_rows(next(iter(bd.values())))
                   if mesh is not None else slice(None))
            if task == "tvqa":
                la, lt = (np.asarray(x, np.float32)[sel] * temperature
                          for x in out)
                joint = jax.nn.softmax(la, -1) + jax.nn.softmax(lt, -1)
                preds = {"audio": la.argmax(-1), "text": lt.argmax(-1),
                         "joint": np.asarray(joint).argmax(-1)}
            else:
                lg = np.asarray(out, np.float32)[sel]  # [B, 2, num_answers]
                preds = {"qa": lg[:, 0].argmax(-1), "qar": lg[:, 1].argmax(-1)}
            labels = np.asarray(batch["labels"])
            for i, ex_id in enumerate(ids):
                if ex_id == "pad":
                    continue
                row = {"id": ex_id}
                hit = {}
                for name, p in preds.items():
                    row[f"pred_{name}"] = int(p[i])
                    lab = labels[i] if labels.ndim == 1 else \
                        labels[i, 0 if name == "qa" else 1]
                    hit[name] = float(p[i] == lab)
                if task == "vcr":
                    hit["joint"] = hit["qa"] * hit["qar"]
                rows.append(row)
                hits.append(hit)
    metrics = {f"acc_{k}": float(np.mean([h[k] for h in hits]))
               for k in hits[0]} if hits else {}
    metrics["n"] = len(hits)
    return metrics, rows


_WARNED_HEURISTIC_REWRITE = False


def statement_for_qa_item(item: dict, answer_slot: str = "<|MASK|>") -> str:
    """Pick the mask-infill statement for one MSRVTT-QA-style item.

    Priority: an explicit ``statement`` field; then a ``question`` that
    already carries the answer slot — the reference's ``{split}_infill.json``
    format, where qa_to_infill.py writes its GPT-3 rewrite back into
    ``question`` with ``_`` -> ``<|MASK|>`` (qa_to_infill.py:59-63), so
    precomputed reference rewrites are consumed verbatim for
    benchmark-comparable accuracy; finally the heuristic
    :func:`question_to_statement` fallback (which warns: NOT comparable)."""
    if item.get("statement"):
        return item["statement"]
    if answer_slot in item["question"]:
        return item["question"]
    return question_to_statement(item["question"], answer_slot)


def question_to_statement(question: str, answer_slot: str = "<|MASK|>") -> str:
    """Heuristic question->statement rewrite for mask infilling.

    WARNING: the reference produced its MSRVTT-QA numbers with offline
    GPT-3 rewrites (qa_to_infill.py); this 5-template fallback is NOT
    comparable — accuracy measured through it will differ from published
    MSRVTT-QA results. Supply your own rewrites for benchmark parity."""
    global _WARNED_HEURISTIC_REWRITE
    if not _WARNED_HEURISTIC_REWRITE:
        import warnings

        warnings.warn(
            "question_to_statement uses a heuristic template rewrite; the "
            "reference's MSRVTT-QA numbers used offline GPT-3 rewrites "
            "(qa_to_infill.py) — accuracies are NOT comparable. Supply your "
            "own statement rewrites for benchmark parity.")
        _WARNED_HEURISTIC_REWRITE = True
    q = question.strip().rstrip("?").lower()
    for prefix, template in [
        ("what is ", "{rest} is " + answer_slot),
        ("what are ", "{rest} are " + answer_slot),
        ("what color is ", "{rest} is " + answer_slot),
        ("what colour is ", "{rest} is " + answer_slot),
        ("who is ", "{rest} is " + answer_slot),
        ("who are ", "{rest} are " + answer_slot),
        ("where is ", "{rest} is in " + answer_slot),
        ("where are ", "{rest} are in " + answer_slot),
        ("when is ", "{rest} is at " + answer_slot),
        ("how many ", "there are " + answer_slot + " {rest}"),
    ]:
        if q.startswith(prefix):
            return template.format(rest=q[len(prefix):])
    return q + " " + answer_slot
