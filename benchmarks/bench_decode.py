"""Decode-throughput benchmark (the reference's hottest loop,
``SDAG.py:191-208``).

Times ONLY the decode hot loop — prefill builds the KV cache once, then a
jitted ``fori_loop`` runs N decode steps with the sampled token feeding the
next step (a real data-dependency chain; through the axon relay,
``block_until_ready`` on a single dispatch under-reports, see CLAUDE.md).

Model: ~1.0B-param Llama-geometry bf16 (d=2048, 16 layers, GQA 16/8,
V=128256 tied) — big enough that weight streaming dominates, small enough
to init fast.  Reports tok/s and the HBM roofline fraction
(bytes_per_step = weights + live KV) so regressions are attributable.

Usage: python benchmarks/bench_decode.py [--batch 8] [--prompt 1024]
       [--steps 32] [--top_p 1.0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_config(model: str = "1b"):
    import jax.numpy as jnp
    from sdag_tpu.models.llama import DecoderConfig
    if model == "small":
        # ~40M-param canary: compiles in seconds so the decode section can
        # emit one metric before risking the contended 1B compile
        return DecoderConfig(vocab_size=32768, d_model=512, n_layers=8,
                             n_heads=8, n_kv_heads=4, d_ff=1376,
                             rope_theta=500000.0, dtype=jnp.bfloat16,
                             tie_embeddings=True)
    return DecoderConfig(vocab_size=128256, d_model=2048, n_layers=16,
                         n_heads=16, n_kv_heads=8, d_ff=5504,
                         rope_theta=500000.0, dtype=jnp.bfloat16,
                         tie_embeddings=True)


def run(batch: int, prompt: int, steps: int, temperature: float,
        top_p: float, iters: int = 3, max_new: int = 128,
        kv_dtype: str = "native", model: str = "1b",
        weights: str = "native") -> dict:
    import jax
    import jax.numpy as jnp
    from sdag_tpu.models.llama import (count_params, decode_step,
                                       init_decoder_params, prefill,
                                       quantize_decoder_params_int8)
    from sdag_tpu.ops.sampling import sample_tokens

    cfg = bench_config(model)
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    n_params = count_params(params)
    if weights == "int8":
        # weight-only int8 serving format: per-channel scales, dequant
        # fused into the matmul operand read — halves weight streaming
        params = jax.block_until_ready(quantize_decoder_params_int8(params))

    cache_size = prompt + max_new
    ids = jax.random.randint(jax.random.PRNGKey(1), (batch, prompt), 0,
                             cfg.vocab_size, jnp.int32)

    @jax.jit
    def make_cache(params, ids):
        _, cache = prefill(params, cfg, ids, cache_size=cache_size,
                           attn_impl="auto", block_q=512, block_k=512,
                           kv_dtype=kv_dtype)
        return cache

    cache = jax.block_until_ready(make_cache(params, ids))
    slot_iota = jnp.arange(cache_size, dtype=jnp.int32)[None, :]

    @jax.jit
    def decode_n(params, cache, cur, key):
        def body(t, state):
            cur, cache, key, acc = state
            mask = slot_iota < (prompt + t + 1)
            logits, cache = decode_step(params, cfg, cur,
                                        jnp.full((batch,), prompt, jnp.int32)
                                        + t,
                                        cache, write_index=prompt + t,
                                        cache_mask=jnp.broadcast_to(
                                            mask, (batch, cache_size)))
            key, sub = jax.random.split(key)
            cur = sample_tokens(sub, logits, temperature, top_p)
            return cur, cache, key, acc + cur[0]
        cur, cache, key, acc = jax.lax.fori_loop(
            0, steps, body, (cur, cache, key, jnp.int32(0)))
        return acc

    cur0 = jnp.zeros((batch,), jnp.int32)
    np.asarray(decode_n(params, cache, cur0, jax.random.PRNGKey(2)))  # warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        np.asarray(decode_n(params, cache, cur0, jax.random.PRNGKey(2)))
        best = min(best, time.time() - t0 - 0.03)
    step_s = best / steps
    toks = batch * steps / best

    # roofline: every step streams the weights once + the live KV once
    # (sum actual leaf bytes: int8 weight trees carry f32 scale vectors)
    w_bytes = sum(int(x.size) * x.dtype.itemsize
                  for x in jax.tree.leaves(params))
    kv_itemsize = 1 if kv_dtype == "int8" else 2
    kv_slots = 2 * cfg.n_layers * batch * cfg.n_kv_heads \
        * (prompt + steps // 2)
    kv_bytes = kv_slots * cfg.head_dim * kv_itemsize
    if kv_dtype == "int8":
        kv_bytes += kv_slots * 4  # per-slot f32 scales are streamed too
    hbm = 820e9  # v5e
    roof_tok_s = batch / ((w_bytes + kv_bytes) / hbm)
    return {"batch": batch, "prompt": prompt, "steps": steps,
            "params": n_params, "tok_s": round(toks, 1),
            "step_ms": round(step_s * 1e3, 3),
            "roofline_tok_s": round(roof_tok_s, 1),
            "roofline_frac": round(toks / roof_tok_s, 3)}


def run_speculative(batch: int, prompt: int, g: int, steps: int,
                    iters: int = 3, kv_dtype: str = "native") -> dict:
    """Time speculative verification rounds: each round is ONE forward
    over a G-token window (decode_window) advancing G slots — the
    full-acceptance pattern of prompt-lookup decoding.  The window step
    stays KV-bandwidth-bound like single-token decode, so the measured
    per-round time vs a plain decode step gives the verification
    overhead, and G/overhead the end-to-end speedup ceiling; actual
    speedup is (1 + E[accepted]) / overhead at the workload's
    acceptance rate (RAG answers quoting retrieved passages accept
    most drafts).  Correctness (speculative == greedy, token for token)
    is pinned by tests/test_decoder.py.
    """
    import jax
    import jax.numpy as jnp
    from sdag_tpu.models.llama import (decode_window, init_decoder_params,
                                       prefill)

    cfg = bench_config()
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    cache_size = prompt + steps * g + g
    ids = jax.random.randint(jax.random.PRNGKey(1), (batch, prompt), 0,
                             cfg.vocab_size, jnp.int32)

    @jax.jit
    def make_cache(params, ids):
        _, cache = prefill(params, cfg, ids, cache_size=cache_size,
                           attn_impl="auto", block_q=512, block_k=512,
                           kv_dtype=kv_dtype)
        return cache

    cache = jax.block_until_ready(make_cache(params, ids))
    slot_iota = jnp.arange(cache_size, dtype=jnp.int32)
    iota_g = jnp.arange(g, dtype=jnp.int32)

    @jax.jit
    def rounds(params, cache, cur):
        def body(r, state):
            cur, cache, acc = state
            base = prompt + r * g
            w = (cur[:, None] + iota_g[None, :]) % cfg.vocab_size
            pos = jnp.broadcast_to(base + iota_g[None, :], (batch, g))
            hist = (slot_iota < base)[None, None, :]
            win = ((slot_iota[None, None, :] >= base) &
                   (slot_iota[None, None, :] <= base + iota_g[None, :,
                                                              None]))
            mask3 = jnp.broadcast_to(hist | win, (batch, g, cache_size))
            logits, cache = decode_window(
                params, cfg, w, pos, cache,
                jnp.full((batch,), base, jnp.int32), mask3)
            cur = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return cur, cache, acc + cur[0]
        _, _, acc = jax.lax.fori_loop(
            0, steps, body, (cur, cache, jnp.int32(0)))
        return acc

    cur0 = jnp.zeros((batch,), jnp.int32)
    np.asarray(rounds(params, cache, cur0))  # warm/compile
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        np.asarray(rounds(params, cache, cur0))
        best = min(best, time.time() - t0 - 0.03)
    return {"batch": batch, "g": g, "kv_dtype": kv_dtype,
            "round_ms": round(best / steps * 1e3, 3),
            "tok_s_fullaccept": round(batch * g * steps / best, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--temperature", type=float, default=0.1)
    ap.add_argument("--top_p", type=float, default=1.0)
    ap.add_argument("--kv", default="native", choices=["native", "int8"])
    ap.add_argument("--weights", default="native",
                    choices=["native", "int8"])
    args = ap.parse_args()
    out = run(args.batch, args.prompt, args.steps, args.temperature,
              args.top_p, kv_dtype=args.kv, weights=args.weights)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
