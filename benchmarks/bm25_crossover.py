"""Measure the postings-walk cost vs candidate count to calibrate
BM25Index.POSTINGS_CANDIDATE_BUDGET (the postings->scan fallback).

Times bm25_postings_topk at several per-query candidate counts M on a
synthetic uniform-df corpus (N=100k, the scan engine's cost is fixed at
this N) and prints per-query microseconds next to the scan engine's
measured per-query cost, so the budget can be set at the crossover.

Run on the real chip:  python benchmarks/bm25_crossover.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import _device_time_delta  # noqa: E402
from sdag_tpu.ops.bm25 import PAD_TERM, bm25_postings_topk  # noqa: E402
from sdag_tpu.retrieval.sparse import _csr_from_packed  # noqa: E402


def main():
    rng = np.random.default_rng(7)
    N, T, Q, K, W = 100_000, 128, 32, 10, 512
    QT = 8

    for target_m in (4096, 16384, 65536, 262144):
        # uniform corpus whose per-term df makes each slot need
        # target_m / QT candidates
        per_slot = target_m // QT
        df = per_slot  # windows sized exactly
        v = max(N * T // df, QT + 1)
        term_ids = rng.integers(0, v, size=(N, T), dtype=np.int32)
        order = np.argsort(term_ids, axis=1, kind="stable")
        srt = np.take_along_axis(term_ids, order, axis=1)
        dup = np.concatenate([np.zeros((N, 1), bool),
                              srt[:, 1:] == srt[:, :-1]], axis=1)
        rows = np.repeat(np.arange(N), T).reshape(N, T)
        term_ids[rows[dup], order[dup]] = PAD_TERM
        impacts = rng.random((N, T)).astype(np.float32)
        impacts[term_ids == PAD_TERM] = 0.0
        docs, imps, offsets, max_df = _csr_from_packed(term_ids, impacts, v)
        q_terms = rng.integers(0, v, size=(Q, QT), dtype=np.int32)
        q_weights = np.ones((Q, QT), np.float32)
        ws_need = -(-int(max_df) // W)
        ws = 1
        while ws < ws_need:
            ws *= 2
        w_slots = (ws,) * QT
        m = sum(w_slots) * W
        dj, pj, oj = jnp.asarray(docs), jnp.asarray(imps), \
            jnp.asarray(offsets)
        qj, wj = jnp.asarray(q_terms), jnp.asarray(q_weights)

        def make_loop(n):
            @jax.jit
            def loop(dj, pj, oj, qj, wj):
                def body(i, acc):
                    vals, _ = bm25_postings_topk(dj, pj, oj, qj,
                                                 wj + acc * 1e-9, K,
                                                 w_slots=w_slots, window=W)
                    return acc + vals[0, 0]
                return jax.lax.fori_loop(0, n, body, 0.0)
            return loop

        iters = max(20, min(400, int(4e8 // m)))
        t0 = time.time()
        dt = _device_time_delta(make_loop, dj, pj, oj, qj, wj, iters=iters)
        print(f"M/query={m:>8} (max_df={max_df}, windows={ws}): "
              f"{dt / Q * 1e6:8.1f} us/query  ({Q / dt:9.0f} QPS)  "
              f"[wall {time.time() - t0:.0f}s, iters={iters}]",
              flush=True)


if __name__ == "__main__":
    main()
