"""On-chip shoot-out of prefill schedules at the bench geometry (VERDICT r3
item 4: close the 4k gap or prove it fundamental).

Variants, all on L=4096 / 20 docs x 176 tokens / sys 256 / 2-NN neighbors
(B=1, H=16, KV=8, Dh=128, bf16):

  kvres_tiles   production ISO dispatch (KV-resident + int8 mask tiles)
  kvres_rule    KV-resident, in-kernel mask rule (no tile streaming)
  splash_512    manual-DMA worklist schedule, 512 blocks
  splash_256    manual-DMA worklist schedule, 256 blocks
  grid_128      tile-streaming grid kernel (128 blocks, its default)
  causal_kvres  plain-causal prompt on the kvres schedule (the baseline
                the bench ratio divides by)
  causal_splash plain causal on splash (is splash strictly worse dense?)

Timing: two-point fori_loop delta (bench.py convention — cancels relay
RTT/dispatch exactly).

Usage: python benchmarks/probe_prefill_variants.py [L [n_docs [doc_len]]]
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

from sdag_tpu.ops.attention import (sdag_flash_attention,
                                    sdag_flash_attention_kvres,
                                    sdag_splash_attention)


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
        except Exception as e:  # one broken variant must not kill the probe
            print(f"[variant] {name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            return float("inf")
        print(f"[variant] {name}: {ms:.3f} ms   (section {time.time()-t0:.0f}s)",
              flush=True)
        return ms

    res = {}
    res["kvres_tiles"] = bench(
        "kvres_tiles",
        lambda q, k, v, di, nb, s: sdag_flash_attention_kvres(
            q, k, v, di, nb, s, block_q=512, block_k=512,
            use_mask_tiles=True),
        doc_id, nbr, sys_len)
    res["kvres_rule"] = bench(
        "kvres_rule",
        lambda q, k, v, di, nb, s: sdag_flash_attention_kvres(
            q, k, v, di, nb, s, block_q=512, block_k=512),
        doc_id, nbr, sys_len)
    res["splash_512"] = bench(
        "splash_512",
        lambda q, k, v, di, nb, s: sdag_splash_attention(
            q, k, v, di, nb, s, block_q=512, block_k=512),
        doc_id, nbr, sys_len)
    res["splash_256"] = bench(
        "splash_256",
        lambda q, k, v, di, nb, s: sdag_splash_attention(
            q, k, v, di, nb, s, block_q=256, block_k=256),
        doc_id, nbr, sys_len)
    res["grid_128"] = bench(
        "grid_128",
        lambda q, k, v, di, nb, s: sdag_flash_attention(
            q, k, v, di, nb, s, block_q=128, block_k=128),
        doc_id, nbr, sys_len)
    res["causal_kvres"] = bench(
        "causal_kvres",
        lambda q, k, v, di, nb, s: sdag_flash_attention_kvres(
            q, k, v, di, nb, s, block_q=512, block_k=512),
        causal_id, zeros, 0)
    res["causal_splash"] = bench(
        "causal_splash",
        lambda q, k, v, di, nb, s: sdag_splash_attention(
            q, k, v, di, nb, s, block_q=512, block_k=512),
        causal_id, zeros, 0)
    # r4: KV-resident + packed live-tile worklist (fori_loop over live
    # tiles only — no SKIP branches, kernel body emitted once)
    res["kvres_wl_512"] = bench(
        "kvres_wl_512",
        lambda q, k, v, di, nb, s: sdag_flash_attention_kvres(
            q, k, v, di, nb, s, block_q=512, block_k=512, worklist=True),
        doc_id, nbr, sys_len)
    res["kvres_wl_256"] = bench(
        "kvres_wl_256",
        lambda q, k, v, di, nb, s: sdag_flash_attention_kvres(
            q, k, v, di, nb, s, block_q=256, block_k=256, worklist=True),
        doc_id, nbr, sys_len)
    res["causal_kvres_wl"] = bench(
        "causal_kvres_wl",
        lambda q, k, v, di, nb, s: sdag_flash_attention_kvres(
            q, k, v, di, nb, s, block_q=512, block_k=512, worklist=True),
        causal_id, zeros, 0)

    base = res["causal_kvres"]
    print("\n=== ratios vs causal_kvres ===")
    for name, ms in res.items():
        print(f"  {name:14s} {ms:7.3f} ms   {base / ms:5.2f}x")


if __name__ == "__main__":
    main()
