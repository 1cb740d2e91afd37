"""Focused follow-up to probe_prefill_variants: does a larger q-block
(fewer grid steps, same resident-KV schedule) close more of the 4k gap?

The main probe showed per-grid-step fixed cost dominates (kvres_tiles
1.066 ms vs a 0.16 ms FLOP floor; every dynamic-trip schedule slower).
Grid steps = B*H*nq, so block_q=1024/2048 quarters/halves the step count
at the price of coarser block-kind granularity (a q block spanning
several docs keeps more k tiles live).  Mask-tile VMEM strips scale as
nk*bq*bk — at bq=1024, bk=512 a strip is 4MB (fits the 16MB scoped
budget with K+V's 2MB + q/out).

Usage: python benchmarks/probe_prefill_blockq.py [L [n_docs [doc_len]]]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from sdag_tpu.ops.attention import sdag_flash_attention_kvres


def metadata(L, n_docs, doc_len, sys_len):
    doc_id = np.full(L, -1, np.int32)
    nbr = np.zeros(L, np.int32)
    for d in range(n_docs):
        s = sys_len + d * doc_len
        doc_id[s:s + doc_len] = d
        bits = 0
        for n in (d - 1, d + 1):
            if 0 <= n < min(n_docs, 32):
                bits |= 1 << n
        nbr[s:s + doc_len] = bits
    return jnp.asarray(doc_id)[None], jnp.asarray(nbr)[None]


def timed_delta(make_loop, *args, iters=10, scale=4, repeats=3):
    lo, hi = make_loop(iters), make_loop(iters * scale)
    np.asarray(lo(*args))
    np.asarray(hi(*args))
    best_lo = best_hi = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        np.asarray(lo(*args))
        best_lo = min(best_lo, time.time() - t0)
        t0 = time.time()
        np.asarray(hi(*args))
        best_hi = min(best_hi, time.time() - t0)
    return max(best_hi - best_lo, 1e-9) / (iters * (scale - 1)) * 1e3


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    doc_len = int(sys.argv[3]) if len(sys.argv) > 3 else 176
    sys_len = 256
    B, H, KV, Dh = 1, 16, 8, 128
    key = jax.random.PRNGKey(0)
    kq, kk, kvk = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, L, Dh), jnp.bfloat16)
    k = jax.random.normal(kk, (B, KV, L, Dh), jnp.bfloat16)
    v = jax.random.normal(kvk, (B, KV, L, Dh), jnp.bfloat16)
    print("backend:", jax.default_backend(), " L:", L, flush=True)

    doc_id, nbr = metadata(L, n_docs, doc_len, sys_len)
    causal_id = jnp.full((B, L), -1, jnp.int32)
    zeros = jnp.zeros((B, L), jnp.int32)

    def bench(name, fn, di, nb, sul):
        def make_loop(n):
            @jax.jit
            def loop(q, k, v, di, nb):
                def body(i, acc):
                    o = fn(q * (1.0 + acc * 1e-9) + i * 1e-6, k, v, di, nb,
                           sul)
                    return acc + o[0, 0, 0, 0].astype(jnp.float32)
                return jax.lax.fori_loop(0, n, body, 0.0)
            return loop
        t0 = time.time()
        try:
            ms = timed_delta(make_loop, q, k, v, di, nb)
        except Exception as e:
            print(f"[variant] {name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            return float("inf")
        print(f"[variant] {name}: {ms:.3f} ms   (section {time.time()-t0:.0f}s)",
              flush=True)
        return ms

    res = {}
    for bq, bk, tiles in ((1024, 512, True), (2048, 512, True),
                          (1024, 512, False), (512, 256, True),
                          (1024, 1024, True)):
        tag = f"kvres_bq{bq}_bk{bk}_{'tiles' if tiles else 'rule'}"
        res[tag] = bench(
            tag,
            lambda q, k, v, di, nb, s, bq=bq, bk=bk, tiles=tiles:
                sdag_flash_attention_kvres(q, k, v, di, nb, s, block_q=bq,
                                           block_k=bk, use_mask_tiles=tiles),
            doc_id, nbr, sys_len)
        res["causal_" + tag] = bench(
            "causal_" + tag,
            lambda q, k, v, di, nb, s, bq=bq, bk=bk:
                sdag_flash_attention_kvres(q, k, v, di, nb, s, block_q=bq,
                                           block_k=bk),
            causal_id, zeros, 0)

    print("\n=== summary (sdag ms / causal ms) ===")
    for tag in list(res):
        if tag.startswith("causal_"):
            continue
        c = res.get("causal_" + tag, float("inf"))
        print(f"  {tag:32s} {res[tag]:7.3f} / {c:7.3f}  "
              f"ratio {c / res[tag]:5.2f}x")


if __name__ == "__main__":
    main()
