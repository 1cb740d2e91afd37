"""Weight-only int8 serving quantization (models/llama.py).

The quantized tree is a drop-in replacement for the float tree in
prefill/decode_step/decode_window; decode at small batch is
weight-streaming-bound, so int8 weights halve the bytes (the bench's
``weights=int8`` mode measures it).  These tests pin:

  1. exactness — when every weight is an exact int8 multiple of its
     per-channel scale, the quantized forward equals the float forward
     (the dequant commutes with the matmul);
  2. fidelity — per-element dequantization error is bounded by s/2;
  3. drop-in — prefill + teacher-forced decode_step agree on the
     quantized tree just like the float tree, and decode_window
     (speculative verification) matches step-by-step decode on it;
  4. the end-to-end Generator runs greedily on a quantized tree.

Replaces the reference's fp16-only HF serving path
(``content_generation.py:19-41``) with a TPU-idiomatic int8 format.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdag_tpu.models.llama import (DecoderConfig, decode_step, decode_window,
                                   init_decoder_params, prefill,
                                   quantize_decoder_params_int8)

CFG = DecoderConfig.tiny()


@pytest.fixture(scope="module")
def params():
    return init_decoder_params(jax.random.PRNGKey(7), CFG)


@pytest.fixture(scope="module")
def qparams(params):
    return quantize_decoder_params_int8(params)


def _snap_to_int8_grid(params):
    """Project every dense weight onto its own int8 quantization grid, so
    quantize() then dequantize reproduces it exactly."""
    def snap(w, axis):
        w32 = np.asarray(w, np.float32)
        s = np.maximum(np.abs(w32).max(axis=axis, keepdims=True), 1e-8) / 127
        return jnp.asarray((np.clip(np.round(w32 / s), -127, 127) * s
                            ).astype(np.float32))

    out = {"embed": snap(params["embed"], 1),
           "final_norm": params["final_norm"], "layers": []}
    if "lm_head" in params:
        out["lm_head"] = snap(params["lm_head"], 0)
    for layer in params["layers"]:
        out["layers"].append({
            "attn": {k: snap(v, 0) for k, v in layer["attn"].items()},
            "mlp": {k: snap(v, 0) for k, v in layer["mlp"].items()},
            "ln1": layer["ln1"], "ln2": layer["ln2"]})
    return out


def test_quantized_forward_exact_on_grid_weights(params):
    snapped = _snap_to_int8_grid(params)
    q = quantize_decoder_params_int8(snapped)
    ids = (jnp.arange(32, dtype=jnp.int32).reshape(2, 16) * 7) % 500
    ref, _ = prefill(snapped, CFG, ids, with_cache=False)
    got, _ = prefill(q, CFG, ids, with_cache=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=1e-3)


def test_dequant_error_bounded_by_half_scale(params, qparams):
    w = np.asarray(params["layers"][0]["mlp"]["gate"], np.float32)
    qw = qparams["layers"][0]["mlp"]["gate"]
    deq = np.asarray(qw["w"], np.float32) * np.asarray(qw["s"])[None, :]
    err = np.abs(deq - w)
    assert (err <= 0.5 * np.asarray(qw["s"])[None, :] + 1e-7).all()
    # embedding quantizes per ROW (the tied unembed's output channels)
    emb = qparams["embed"]
    deq_e = np.asarray(emb["w"], np.float32) * np.asarray(emb["s"])[:, None]
    err_e = np.abs(deq_e - np.asarray(params["embed"], np.float32))
    assert (err_e <= 0.5 * np.asarray(emb["s"])[:, None] + 1e-7).all()


def test_quantized_decode_matches_quantized_prefill(qparams):
    """Teacher-forced decode on the int8 tree must equal its own prefill
    position by position — the drop-in property that generation relies on."""
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, 500, size=(1, 10)).astype(np.int32))
    logits_all, _ = prefill(qparams, CFG, ids)
    _, cache = prefill(qparams, CFG, ids[:, :1], cache_size=10)
    slot_iota = jnp.arange(10)[None, :]
    got = []
    for t in range(1, 10):
        lg, cache = decode_step(qparams, CFG, ids[:, t],
                                positions=jnp.array([t]), cache=cache,
                                write_index=t, cache_mask=slot_iota <= t)
        got.append(np.asarray(lg))
    np.testing.assert_allclose(np.concatenate(got, axis=0),
                               np.asarray(logits_all)[0, 1:],
                               atol=2e-4, rtol=1e-3)


def test_quantized_window_matches_stepwise(qparams):
    """decode_window over a G-token window on the int8 tree == G sequential
    decode_steps (the speculative-verification invariant)."""
    B, P, G = 1, 8, 4
    rng = np.random.default_rng(5)
    prompt = jnp.asarray(rng.integers(0, 500, size=(B, P)).astype(np.int32))
    win = jnp.asarray(rng.integers(0, 500, size=(B, G)).astype(np.int32))
    size = P + G

    _, cache_w = prefill(qparams, CFG, prompt, cache_size=size)
    slot = jnp.arange(size)
    iota_g = jnp.arange(G)
    hist = (slot < P)[None, None, :]
    wmask = ((slot[None, None, :] >= P) &
             (slot[None, None, :] <= P + iota_g[None, :, None]))
    mask3 = jnp.broadcast_to(hist | wmask, (B, G, size))
    pos = jnp.broadcast_to(P + iota_g[None, :], (B, G))
    logits_w, _ = decode_window(qparams, CFG, win, pos, cache_w,
                                jnp.full((B,), P, jnp.int32), mask3)

    _, cache_s = prefill(qparams, CFG, prompt, cache_size=size)
    slot_iota = slot[None, :]
    for t in range(G):
        lg, cache_s = decode_step(qparams, CFG, win[:, t],
                                  positions=jnp.array([P + t]),
                                  cache=cache_s, write_index=P + t,
                                  cache_mask=slot_iota <= P + t)
        np.testing.assert_allclose(np.asarray(logits_w)[:, t], np.asarray(lg),
                                   atol=2e-4, rtol=1e-3)


def test_generator_runs_greedy_on_quantized_tree(qparams):
    from sdag_tpu.models.tokenizer import ByteTokenizer
    from sdag_tpu.sdag.generate import Generator
    from sdag_tpu.sdag.spans import build_rag_prompt_plan
    tok = ByteTokenizer()
    gen = Generator(qparams, CFG, tok, temperature=0.0)
    plan = build_rag_prompt_plan(tok, "which letters?",
                                 ["alpha beta gamma", "delta epsilon"])
    outs = gen.generate_plans([plan], max_new_tokens=8)
    assert len(outs) == 1 and isinstance(outs[0], str)
    assert outs == gen.generate_plans([plan], max_new_tokens=8)  # greedy
