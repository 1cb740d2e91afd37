"""On-chip decomposition probe for the SDAG prefill ratio (VERDICT r2 #6).

Questions it answers on the real chip, using the bench geometry
(L=4096, 20 docs x 176 tokens, sys 256, 2-NN neighbors, block 512/128):

  1. tile accounting: how many SKIP/FULL/PARTIAL tiles do SDAG vs causal
     metadata produce at each block size?  (upper bound on the ratio)
  2. mask cost: kvres kernel time with the real SDAG metadata vs the
     same schedule with mask arithmetic ablated (env knob) — how much of
     the tile time is VPU mask work vs MXU?

Usage:  python benchmarks/probe_prefill_mask.py [block_q block_k]
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

from sdag_tpu.ops.attention import (BLOCK_CAUSAL, BLOCK_FULL, BLOCK_PARTIAL,
                                    BLOCK_SKIP, compute_block_kinds,
                                    sdag_flash_attention_kvres)

RTT = 0.03


def metadata(L=4096, n_docs=20, doc_len=176, sys_len=256):
    doc_id = np.full(L, -1, np.int32)
    nbr = np.zeros(L, np.int32)
    for d in range(n_docs):
        s = sys_len + d * doc_len
        doc_id[s:s + doc_len] = d
        bits = 0
        for n in (d - 1, d + 1):
            if 0 <= n < n_docs:
                bits |= 1 << n
        nbr[s:s + doc_len] = bits
    return jnp.asarray(doc_id)[None], jnp.asarray(nbr)[None]


def tile_accounting(doc_id, nbr, sul, L, bq, bk):
    kinds = np.asarray(compute_block_kinds(
        doc_id, nbr, jnp.asarray([sul]), jnp.asarray([L]), bq, bk))[0]
    u, c = np.unique(kinds, return_counts=True)
    d = dict(zip(u.tolist(), c.tolist()))
    names = {BLOCK_SKIP: "skip", BLOCK_FULL: "full",
             BLOCK_PARTIAL: "partial", BLOCK_CAUSAL: "causal"}
    return {names.get(k, str(k)): v for k, v in d.items()}


def timed(fn, *args, iters=20):
    @jax.jit
    def loop(q, k, v, di, nb):
        def body(i, acc):
            o = fn(q * (1.0 + acc * 1e-9) + i * 1e-6, k, v, di, nb)
            return acc + o[0, 0, 0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, 0.0)

    np.asarray(loop(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(loop(*args))
        best = min(best, time.time() - t0 - RTT)
    return best / iters * 1e3


def main():
    bq = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    bk = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    L, sul = 4096, 256
    B, H, KV, Dh = 1, 16, 8, 128
    key = jax.random.PRNGKey(0)
    kq, kk, kvk = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, H, L, Dh), jnp.bfloat16)
    k = jax.random.normal(kk, (B, KV, L, Dh), jnp.bfloat16)
    v = jax.random.normal(kvk, (B, KV, L, Dh), jnp.bfloat16)

    doc_id, nbr = metadata(L=L)
    causal_id = jnp.full((B, L), -1, jnp.int32)
    zeros = jnp.zeros((B, L), jnp.int32)

    for name, di, nb, s in (("sdag", doc_id, nbr, sul),
                            ("causal", causal_id, zeros, 0)):
        for tq, tk in ((128, 128), (256, 256), (512, 512)):
            print(f"[tiles] {name} bq={tq} bk={tk}: "
                  f"{tile_accounting(di, nb, s, L, tq, tk)}")

    def run(di, nb, s):
        def fn(q, k, v, di, nb):
            return sdag_flash_attention_kvres(q, k, v, di, nb, s,
                                              block_q=bq, block_k=bk)
        return timed(fn, q, k, v, di, nb)

    sdag_ms = run(doc_id, nbr, sul)
    causal_ms = run(causal_id, zeros, 0)
    print(f"[kvres b{bq}x{bk}] sdag {sdag_ms:.3f} ms  causal "
          f"{causal_ms:.3f} ms  ratio {causal_ms / sdag_ms:.3f}x")


if __name__ == "__main__":
    main()
