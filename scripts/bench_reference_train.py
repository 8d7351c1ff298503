"""Measure the reference's pretraining-step throughput on this chip.

VERDICT r1 item #4: the reference publishes no throughput numbers and its
tf.data path needs tfds, but its *compute* path — pretrain_model.train_step
(/root/reference/pretrain/pretrain_model.py:306-340) pmap'd with the full
base config and bf16-Adam (/root/reference/pretrain/optimization.py:158) —
runs fine on synthetic in-memory batches. This script runs it UNMODIFIED
(read-only import; only a jax.tree_map -> jax.tree.map process shim for
JAX 0.9) and times it with the same chained methodology bench.py uses:
steps are chained inside one pmap'd lax.scan so per-step time is
(t(N) - t(1)) / (N - 1), free of the ~30 ms relay per-execution overhead.

Usage: python scripts/bench_reference_train.py [per_chip_batch ...]
Prints one JSON line per batch size:
  {"metric": "reference_train_segments_per_sec_per_chip", ...}
"""

import functools
import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(1, "/root/reference")

import numpy as np
import yaml


def _shim_legacy_jax():
    """JAX 0.9 removed jax.tree_map/jax.tree_multimap; the reference (pinned
    to jax 0.2.x) uses them. Shim in-process — reference files stay
    untouched."""
    import jax

    if not hasattr(jax, "tree_map"):
        jax.tree_map = jax.tree.map
    if not hasattr(jax, "tree_multimap"):
        jax.tree_multimap = jax.tree.map


def main():
    batch_sizes = [int(a) for a in sys.argv[1:]] or [1, 2]
    n_chain = int(os.environ.get("BENCH_CHAIN", "8"))

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    _shim_legacy_jax()
    import jax.numpy as jnp

    if "tensorflow_datasets" not in sys.modules:
        sys.modules["tensorflow_datasets"] = types.ModuleType(
            "tensorflow_datasets")

    import pretrain.optimization as ref_opt
    import pretrain.pretrain_model as ref_pm

    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.data.dummy import make_dummy_batch

    with open("/root/reference/pretrain/configs/base.yaml") as f:
        ref_cfg = yaml.safe_load(f)

    ref_model = ref_pm.MerlotReservePretrainer.from_config(ref_cfg)

    # our config mirrors the same shapes; make_dummy_batch is parity-tested
    # to feed the reference module (tests/test_pretrainer_parity.py)
    cfg = mr.load_config("base")
    n_spans = ref_cfg["data"]["num_text_spans_to_include"]

    devices = jax.devices()[:1]
    print(f"device: {devices[0]}", file=sys.stderr)

    batch_np = make_dummy_batch(cfg, batch_size=batch_sizes[0], seed=0,
                                num_text_spans=n_spans)

    # CPU init (full base params, f32), as the reference's
    # init_from_dummy_batch does (modeling.py:636-649)
    with jax.default_device(jax.devices("cpu")[0]):
        params = ref_model.init(
            jax.random.PRNGKey(0),
            {k: jnp.asarray(v) for k, v in batch_np.items()})["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"reference base params: {n_params/1e6:.1f}M", file=sys.stderr)

    state = ref_opt.construct_train_state(ref_cfg["optimizer"], ref_model,
                                          params)
    del params

    def multi_step(n):
        def fn(state, batch):
            def body(s, _):
                s2, info = ref_pm.train_step(s, batch,
                                             use_bfloat16_grads=True)
                return s2, info
            state, infos = jax.lax.scan(body, state, None, length=n)
            return state, jax.tree.map(lambda x: x[-1], infos)
        return jax.pmap(fn, axis_name="batch", donate_argnums=(0,),
                        devices=devices)

    def sync(tree):
        # block_until_ready is unreliable through the relay; fetch a scalar
        leaf = jax.tree.leaves(tree)[0]
        return float(np.asarray(leaf).reshape(-1)[0])

    results = []
    for bsz in batch_sizes:
        batch_np = make_dummy_batch(cfg, batch_size=bsz, seed=0,
                                    num_text_spans=n_spans)
        batch = {k: jnp.asarray(v)[None] for k, v in batch_np.items()}

        rep_state = jax.device_put_replicated(state, devices)

        p1, pN = multi_step(1), multi_step(n_chain)

        # best-of-3 each: one slow host-side stall (this is a 1-core box
        # behind a relay) would otherwise poison the subtraction
        rep_state, info = p1(rep_state, batch)  # compile + warmup
        sync(info)
        t1 = float("inf")
        for _ in range(3):
            t0 = time.time()
            rep_state, info = p1(rep_state, batch)
            sync(info)
            t1 = min(t1, time.time() - t0)

        rep_state, info = pN(rep_state, batch)  # compile + warmup
        sync(info)
        tN = float("inf")
        loss = None
        for _ in range(3):
            t0 = time.time()
            rep_state, info = pN(rep_state, batch)
            loss = sync(info)
            tN = min(tN, time.time() - t0)

        print(f"# bsz={bsz}: t1={t1:.3f}s tN={tN:.3f}s", file=sys.stderr)
        step_s = (tN - t1) / (n_chain - 1)
        segs = bsz * cfg.data.num_segments / step_s
        rec = {
            "metric": "reference_train_segments_per_sec_per_chip",
            "value": round(segs, 1), "unit": "segments/s/chip",
            "per_chip_batch": bsz, "step_ms": round(step_s * 1e3, 1),
            "loss_probe": loss, "chain": n_chain,
        }
        print(json.dumps(rec), flush=True)
        results.append(rec)
        del rep_state

    return results


if __name__ == "__main__":
    main()
