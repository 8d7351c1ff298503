"""Attention op microbench: Pallas flash vs XLA dense at a sweep of lengths.

Reproduces BASELINE.md's long-context table (flash beats XLA 1.8x fwd /
3.4x fwd+bwd at L>=4096 on v5e; XLA wins below ~2048 — the basis for
_FLASH_MIN_LEN) and the flash-at-640 table, on demand. The reference has
no long-context capability to race (it materializes O(L^2) probs and caps
the joint sequence at 1024, /root/reference/mreserve/modeling.py:188-202,
/root/reference/pretrain/train_fixres.py:87); XLA dense attention on the
same chip is the baseline.

Methodology (CLAUDE.md): N data-chained invocations inside one jit,
per-op = (t(N)-t(1))/(N-1), best of 3; bf16 throughout.

Usage:
  python scripts/bench_attention.py [--lengths=640,2048,4096,8192]
      [--impls=xla,flash] [--bwd] [--rows=8] [--heads=12] [--dim=64]
      [--chain=8]

One JSON line per (impl, L) point.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    lengths = [640, 2048, 4096, 8192]
    impls = ["xla", "flash"]
    bwd = "--bwd" in sys.argv
    rows, heads, dim, chain = 8, 12, 64, 8
    for a in sys.argv[1:]:
        if a.startswith("--lengths="):
            lengths = [int(x) for x in a.split("=")[1].split(",")]
        if a.startswith("--impls="):
            impls = a.split("=")[1].split(",")
        if a.startswith("--rows="):
            rows = int(a.split("=")[1])
        if a.startswith("--heads="):
            heads = int(a.split("=")[1])
        if a.startswith("--dim="):
            dim = int(a.split("=")[1])
        if a.startswith("--chain="):
            chain = int(a.split("=")[1])

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    from merlot_reserve_tpu.ops.attention import attention

    rng = np.random.RandomState(0)

    def sync(x):
        return float(np.asarray(x.reshape(-1)[:8])[0])

    for L in lengths:
        q = jnp.asarray(rng.randn(rows, L, heads, dim), jnp.bfloat16)
        k = jnp.asarray(rng.randn(rows, L, heads, dim), jnp.bfloat16)
        v = jnp.asarray(rng.randn(rows, L, heads, dim), jnp.bfloat16)
        valid = jnp.asarray(rng.rand(rows, L) > 0.1)
        segs = jnp.asarray(np.sort(rng.randint(0, 3, (rows, L)), -1))

        for impl in impls:
            def op(q_, k_, v_):
                return attention(q_, k_, v_, is_valid=valid,
                                 segment_ids=segs, impl=impl)

            if bwd:
                def one(q_, k_, v_):
                    def f(q2, k2, v2):
                        return (op(q2, k2, v2).astype(jnp.float32) ** 2).sum()
                    g = jax.grad(f, argnums=(0, 1, 2))(q_, k_, v_)
                    # chain through the grads so invocations serialize
                    return g
            else:
                def one(q_, k_, v_):
                    return op(q_, k_, v_)

            def chained(n):
                @jax.jit
                def fn(q_, k_, v_):
                    def body(carry, _):
                        cq, ck, cv = carry
                        out = one(cq, ck, cv)
                        # fold the result back in with a small FINITE scale:
                        # a 0.0 multiplier would let XLA fold the term away
                        # and break the serializing data dependence
                        if bwd:
                            gq, gk, gv = out
                            cq = cq + 1e-3 * gq
                            ck = ck + 1e-3 * gk
                            cv = cv + 1e-3 * gv
                        else:
                            cq = cq + 1e-3 * out
                        return (cq, ck, cv), None
                    (cq, _, _), _ = jax.lax.scan(
                        body, (q_, k_, v_), None, length=n)
                    return cq
                return fn

            # short lengths are sub-ms per op: chain enough of them that
            # (t(N)-t(1)) clears the relay's per-execution noise
            n_chain = chain if L >= 2048 else max(chain, 64)
            f1, fN = chained(1), chained(n_chain)
            try:
                out = f1(q, k, v); sync(out)
            except Exception as e:
                print(json.dumps({"impl": impl, "L": L,
                                  "error": f"{type(e).__name__}: {e}"[:200]}),
                      flush=True)
                continue
            t1 = float("inf")
            for _ in range(3):
                t0 = time.time(); sync(f1(q, k, v)); t1 = min(t1, time.time() - t0)
            sync(fN(q, k, v))
            tN = float("inf")
            for _ in range(3):
                t0 = time.time(); sync(fN(q, k, v)); tN = min(tN, time.time() - t0)
            per = (tN - t1) / (n_chain - 1)
            # 2 matmuls fwd (QK^T, PV) + 3 bwd-side at 2*L^2*D each
            flops = rows * heads * (2 * 2 * L * L * dim) * (1 + (1.5 if bwd else 0))
            print(json.dumps({
                "impl": impl, "L": L, "rows": rows, "heads": heads, "dim": dim,
                "mode": "fwd+bwd" if bwd else "fwd",
                "ms": round(per * 1e3, 2),
                "tflops_s": round(flops / per / 1e12, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
