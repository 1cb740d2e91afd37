"""Llama-class decoder, written functionally in JAX.

TPU-native generator replacing the reference's HF ``AutoModelForCausalLM``
(``content_generation.py:19-41``, ``SDAG.py:130-213``): RMSNorm, RoPE, GQA
attention, SwiGLU MLP.  The prefill runs the SDAG block-sparse flash kernel
when document metadata is given (plain causal when not); decode attends the
whole KV cache causally, exactly matching the reference's decode semantics
(``SDAG.py:191-208``).

Parameters are a plain pytree (dict) so pjit sharding rules and HF weight
conversion are simple data transformations (see parallel/sharding.py and
models/hf_convert.py).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from sdag_tpu.ops.attention import (masked_decode_attention,
                                    masked_decode_attention_int8,
                                    masked_decode_window_attention,
                                    masked_decode_window_attention_int8,
                                    quantize_kv_heads_int8,
                                    sdag_prefill_attention)


@dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 512
    d_model: int = 256
    n_layers: int = 4
    n_heads: int = 4
    n_kv_heads: int = 2
    d_ff: int = 512
    rope_theta: float = 500000.0
    norm_eps: float = 1e-5
    dtype: Any = jnp.float32
    tie_embeddings: bool = True
    # HF "llama3" RoPE frequency scaling (Llama-3.1+): (factor,
    # low_freq_factor, high_freq_factor, original_max_position). None = off.
    rope_scaling: Optional[Tuple[float, float, float, int]] = None

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @staticmethod
    def tiny() -> "DecoderConfig":
        return DecoderConfig(vocab_size=512, d_model=64, n_layers=2,
                             n_heads=4, n_kv_heads=2, d_ff=128)

    @staticmethod
    def llama3_8b() -> "DecoderConfig":
        """meta-llama/Llama-3.1-8B-Instruct geometry (reference
        ``config.py:43``)."""
        return DecoderConfig(vocab_size=128256, d_model=4096, n_layers=32,
                             n_heads=32, n_kv_heads=8, d_ff=14336,
                             rope_theta=500000.0, dtype=jnp.bfloat16,
                             tie_embeddings=False,
                             rope_scaling=(8.0, 1.0, 4.0, 8192))


def init_decoder_params(key: jax.Array, cfg: DecoderConfig) -> Dict[str, Any]:
    d, hd = cfg.d_model, cfg.head_dim
    n_q, n_kv = cfg.n_heads, cfg.n_kv_heads
    keys = jax.random.split(key, cfg.n_layers + 2)

    def dense(k, shape):
        scale = (shape[0]) ** -0.5
        return (jax.random.normal(k, shape, jnp.float32) * scale
                ).astype(cfg.dtype)

    layers = []
    for li in range(cfg.n_layers):
        lk = jax.random.split(keys[li], 7)
        layers.append({
            "attn": {
                "wq": dense(lk[0], (d, n_q * hd)),
                "wk": dense(lk[1], (d, n_kv * hd)),
                "wv": dense(lk[2], (d, n_kv * hd)),
                "wo": dense(lk[3], (n_q * hd, d)),
            },
            "mlp": {
                "gate": dense(lk[4], (d, cfg.d_ff)),
                "up": dense(lk[5], (d, cfg.d_ff)),
                "down": dense(lk[6], (cfg.d_ff, d)),
            },
            "ln1": jnp.ones((d,), cfg.dtype),
            "ln2": jnp.ones((d,), cfg.dtype),
        })

    params: Dict[str, Any] = {
        "embed": dense(keys[-2], (cfg.vocab_size, d)),
        "layers": layers,
        "final_norm": jnp.ones((d,), cfg.dtype),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = dense(keys[-1], (d, cfg.vocab_size))
    return params


def _mm(x: jax.Array, w) -> jax.Array:
    """Matmul against a plain weight or a weight-only-int8 dict.

    Quantized weights are ``{"w": int8 [in, out], "s": f32 [out]}``
    (per-output-channel symmetric scales).  The int8 operand is converted
    to x.dtype at the dot's operand read — XLA fuses the convert into the
    MXU feed, so HBM streams the int8 bytes (half of bf16), which is the
    whole win for weight-streaming-bound decode.  Math:
    ``x @ (W_q * s) == (x @ W_q) * s`` because s is constant along the
    contraction axis.
    """
    if isinstance(w, dict):
        return (x @ w["w"].astype(x.dtype)) * w["s"].astype(x.dtype)
    return x @ w


def _embed_rows(embed, ids: jax.Array, dtype) -> jax.Array:
    """Embedding-table gather for a plain or quantized table.

    Quantized tables are ``{"w": int8 [V, d], "s": f32 [V]}`` (per-ROW
    scales, so the same tensor serves the gather here and the tied
    unembed matmul in :func:`_unembed`, whose output channels are rows).
    """
    if isinstance(embed, dict):
        rows = embed["w"][ids].astype(dtype)
        return rows * embed["s"][ids][..., None].astype(dtype)
    return embed[ids].astype(dtype)


def quantize_decoder_params_int8(params: Dict[str, Any]) -> Dict[str, Any]:
    """Weight-only int8 quantization for serving (per-channel symmetric).

    Every dense matrix becomes ``{"w": int8, "s": f32[out]}`` with the
    scale axis chosen per tensor so dequantization commutes with the
    matmul it feeds: projection/MLP weights [in, out] scale per column;
    the embedding [V, d] scales per row (it is both a gather table and,
    when tied, the unembed's [d, V] operand with vocab as the output
    axis).  Norm gains stay in float.  Decode at batch<=8 is
    weight-streaming-bound (see benchmarks/bench_decode.py roofline), so
    halving the weight bytes is ~2x decode throughput; quality impact is
    the standard int8 PTQ error (per-channel, symmetric).

    The quantized tree is a drop-in for prefill/decode_step/decode_window
    (the forwards dispatch on leaf type).  It is a single-chip serving
    format: parallel/sharding.py's decoder_param_specs address the float
    tree layout.  Replaces the reference's fp16/bf16-only HF serving path
    (``content_generation.py:19-41``) with the TPU-idiomatic int8
    weight-streaming trick.
    """
    def quant(w: jax.Array, axis: int) -> Dict[str, jax.Array]:
        w32 = w.astype(jnp.float32)
        amax = jnp.max(jnp.abs(w32), axis=axis, keepdims=True)
        s = jnp.maximum(amax, 1e-8) / 127.0
        wq = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
        return {"w": wq, "s": jnp.squeeze(s, axis=axis)}

    out: Dict[str, Any] = {
        "embed": quant(params["embed"], axis=1),
        "final_norm": params["final_norm"],
        "layers": [],
    }
    if "lm_head" in params:
        out["lm_head"] = quant(params["lm_head"], axis=0)
    for layer in params["layers"]:
        out["layers"].append({
            "attn": {k: quant(v, axis=0) for k, v in layer["attn"].items()},
            "mlp": {k: quant(v, axis=0) for k, v in layer["mlp"].items()},
            "ln1": layer["ln1"],
            "ln2": layer["ln2"],
        })
    return out


def rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def _llama3_scale_freqs(freqs: jax.Array, scaling) -> jax.Array:
    """HF 'llama3' rope_type frequency rescaling (Llama-3.1)."""
    factor, low_ff, high_ff, orig_max = scaling
    low_wl = orig_max / low_ff
    high_wl = orig_max / high_ff
    wavelen = 2.0 * jnp.pi / freqs
    scaled = jnp.where(wavelen > low_wl, freqs / factor, freqs)
    smooth = (orig_max / wavelen - low_ff) / (high_ff - low_ff)
    smoothed = (1.0 - smooth) / factor * freqs + smooth * freqs
    is_medium = (wavelen <= low_wl) & (wavelen >= high_wl)
    return jnp.where(is_medium, smoothed, scaled)


def rope(x: jax.Array, positions: jax.Array, theta: float,
         rope_scaling=None) -> jax.Array:
    """Rotary embedding.  x: [B, H, L, Dh]; positions: [B, L]."""
    dh = x.shape[-1]
    half = dh // 2
    freqs = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    if rope_scaling is not None:
        freqs = _llama3_scale_freqs(freqs, rope_scaling)
    angles = positions[:, None, :, None].astype(jnp.float32) * freqs  # B1Lh
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    x1, x2 = x[..., :half], x[..., half:]
    rot = jnp.concatenate([
        x1 * cos - x2 * sin,
        x2 * cos + x1 * sin,
    ], axis=-1)
    return rot.astype(x.dtype)


def _project_qkv(attn: Dict[str, jax.Array], x: jax.Array,
                 cfg: DecoderConfig):
    """Head counts are inferred from the weight shapes, so under tensor
    parallelism (head-sharded wq/wk/wv inside shard_map) this yields the
    device's local head slice with no code change."""
    B, L, _ = x.shape
    hd = cfg.head_dim
    q = _mm(x, attn["wq"])
    k = _mm(x, attn["wk"])
    v = _mm(x, attn["wv"])
    q = q.reshape(B, L, q.shape[-1] // hd, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, L, k.shape[-1] // hd, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, L, v.shape[-1] // hd, hd).transpose(0, 2, 1, 3)
    return q, k, v


def _mlp(mlp: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
    return _mm(jax.nn.silu(_mm(x, mlp["gate"])) * _mm(x, mlp["up"]),
               mlp["down"])


def _unembed(params: Dict[str, Any], cfg: DecoderConfig, x: jax.Array,
             tp_axis: Optional[str] = None):
    """Project to vocab logits.  Under tensor parallelism (inside a
    shard_map over `tp_axis`), lm_head arrives vocab-sharded
    (decoder_param_specs: P(None, 'model')) — each device computes its
    vocab slice and the slices are all-gathered so sampling sees full
    logits; tied embeddings are replicated, so no collective is needed.
    """
    if cfg.tie_embeddings:
        emb = params["embed"]
        if isinstance(emb, dict):  # per-row scales == unembed out-channels
            return (x @ emb["w"].T.astype(x.dtype)) * emb["s"].astype(x.dtype)
        return x @ emb.T
    logits = _mm(x, params["lm_head"])
    if tp_axis is not None:
        logits = jax.lax.all_gather(logits, tp_axis, axis=-1, tiled=True)
    return logits


def _maybe_psum(x: jax.Array, tp_axis: Optional[str]) -> jax.Array:
    """Sum partial activations across the tensor-parallel axis (Megatron:
    wo and mlp.down are input-sharded, so their matmul outputs are
    partial sums).  No-op outside shard_map."""
    return x if tp_axis is None else jax.lax.psum(x, tp_axis)


def layer_forward(layer: Dict[str, Any], cfg: DecoderConfig, x: jax.Array,
                  positions: jax.Array, doc_id: jax.Array,
                  nbr_bits: jax.Array, sys_user_len: jax.Array,
                  valid_len: jax.Array, attn_impl: str = "auto",
                  block_q: int = 128, block_k: int = 128,
                  with_kv: bool = False, tp_axis: Optional[str] = None,
                  use_mask_tiles: bool = False, mask_plan=None):
    """One decoder layer (attention + MLP with residuals).  Shared by the
    prefill loop and the pipeline-parallel stage scan (parallel/pipeline.py).
    Returns (x, (k, v)) — k/v only when with_kv.

    tp_axis: tensor-parallel axis name when running inside a shard_map
    with Megatron-sharded weights (parallel/sharding.py) — attention runs
    on this device's head slice, MLP on its ff slice; wo/down outputs are
    partial and psum'ed here.  The per-head math is unchanged, so q/k/v
    and the kv cache are simply the local head slices.
    """
    B, L, _ = x.shape
    h = rms_norm(x, layer["ln1"], cfg.norm_eps)
    q, k, v = _project_qkv(layer["attn"], h, cfg)
    q = rope(q, positions, cfg.rope_theta, cfg.rope_scaling)
    k = rope(k, positions, cfg.rope_theta, cfg.rope_scaling)
    # GQA handled inside the attention op (kv never repeated in memory)
    attn_out = sdag_prefill_attention(
        q, k, v, doc_id, nbr_bits, sys_user_len, valid_len=valid_len,
        impl=attn_impl, block_q=block_q, block_k=block_k,
        use_mask_tiles=use_mask_tiles, mask_plan=mask_plan)
    attn_out = attn_out.transpose(0, 2, 1, 3).reshape(B, L, -1)
    x = x + _maybe_psum(_mm(attn_out, layer["attn"]["wo"]), tp_axis)
    x = x + _maybe_psum(
        _mlp(layer["mlp"], rms_norm(x, layer["ln2"], cfg.norm_eps)), tp_axis)
    return x, ((k, v) if with_kv else None)


def make_kv_cache(cfg: DecoderConfig, batch: int, size: int,
                  kv_dtype: str = "native",
                  n_kv_heads: Optional[int] = None) -> Dict[str, Any]:
    """kv_dtype 'native' stores cfg.dtype; 'int8' stores int8 values with
    per-(layer, batch, head, slot) f32 scales (halved decode KV traffic,
    ~8-bit quantization error; opt-in).  n_kv_heads overrides the config
    count for tensor-parallel shards (local kv-head slice)."""
    shape = (cfg.n_layers, batch, n_kv_heads or cfg.n_kv_heads, size,
             cfg.head_dim)
    if kv_dtype == "int8":
        sshape = shape[:-1]
        return {"k": jnp.zeros(shape, jnp.int8),
                "v": jnp.zeros(shape, jnp.int8),
                "k_scale": jnp.zeros(sshape, jnp.float32),
                "v_scale": jnp.zeros(sshape, jnp.float32)}
    return {"k": jnp.zeros(shape, cfg.dtype), "v": jnp.zeros(shape, cfg.dtype)}


def positions_from_doc_id(doc_id: jax.Array) -> jax.Array:
    """RoPE positions counting only *active* tokens, so block-aligned hole
    padding (doc_id == HOLE_DOC_ID, sdag/mask.py) does not shift
    downstream positions — aligned and unaligned layouts are numerically
    identical.  Single source for the serving prefill AND the
    pipeline-parallel trainer (parallel/pipeline.py): a drifted copy
    would give pipeline-trained models different positions than serving
    sees (silent train/serve skew)."""
    from sdag_tpu.sdag.mask import HOLE_DOC_ID
    active = doc_id != HOLE_DOC_ID
    return jnp.maximum(jnp.cumsum(active.astype(jnp.int32), axis=1) - 1, 0)


def prefill(params: Dict[str, Any], cfg: DecoderConfig,
            input_ids: jax.Array,
            doc_id: Optional[jax.Array] = None,
            nbr_bits: Optional[jax.Array] = None,
            sys_user_len: Optional[jax.Array] = None,
            valid_len: Optional[jax.Array] = None,
            cache_size: Optional[int] = None,
            attn_impl: str = "auto",
            block_q: int = 128, block_k: int = 128,
            with_cache: bool = True,
            positions: Optional[jax.Array] = None,
            kv_dtype: str = "native",
            tp_axis: Optional[str] = None,
            logits_last_only: bool = False,
            use_mask_tiles: Optional[bool] = None,
            ) -> Tuple[jax.Array, Optional[Dict[str, Any]]]:
    """Full-prompt forward.  input_ids: [B, L] right-padded.

    With doc metadata -> SDAG block-sparse prefill; without -> plain causal
    (doc_id all -1).  Returns (logits [B, L, V], kv cache sized cache_size).
    logits_last_only=True unembeds only the (valid_len-1) position —
    logits [B, 1, V] — which drops the L*V prefill matmul generation
    doesn't need (and under TP, the [B, L, V] vocab all-gather).
    """
    B, L = input_ids.shape
    cache_size = cache_size or L
    # precomputed mask tiles pay off only with real doc structure (ISO
    # prefill); the NO-ISO/causal path computes nothing per tile anyway.
    # Callers that pass filled-with--1 doc_id (the generator compiles one
    # fn per shape) override explicitly.
    if use_mask_tiles is None:
        use_mask_tiles = doc_id is not None
    if doc_id is None:
        doc_id = jnp.full((B, L), -1, jnp.int32)
    if nbr_bits is None:
        nbr_bits = jnp.zeros((B, L), jnp.int32)
    if sys_user_len is None:
        sys_user_len = jnp.zeros((B,), jnp.int32)
    if valid_len is None:
        valid_len = jnp.full((B,), L, jnp.int32)

    if positions is None:
        positions = positions_from_doc_id(doc_id)
    x = _embed_rows(params["embed"], input_ids, cfg.dtype)

    # layer-invariant mask metadata (block kinds + int8 mask tiles) is
    # computed ONCE here — XLA does not CSE it across per-layer attention
    # calls, so without the plan an n-layer prefill pays n x the O(L^2)
    # mask derivation (shapes/dtypes suffice to resolve the plan)
    from sdag_tpu.ops.attention import prefill_mask_plan
    q_spec = jax.ShapeDtypeStruct((B, cfg.n_heads, L, cfg.head_dim),
                                  cfg.dtype)
    k_spec = jax.ShapeDtypeStruct((B, cfg.n_kv_heads, L, cfg.head_dim),
                                  cfg.dtype)
    mask_plan = prefill_mask_plan(q_spec, k_spec, doc_id, nbr_bits,
                                  sys_user_len, valid_len, impl=attn_impl,
                                  use_mask_tiles=use_mask_tiles,
                                  block_q=block_q, block_k=block_k)

    ks, vs = [], []
    for layer in params["layers"]:
        x, kv = layer_forward(layer, cfg, x, positions, doc_id, nbr_bits,
                              sys_user_len, valid_len, attn_impl=attn_impl,
                              block_q=block_q, block_k=block_k,
                              with_kv=with_cache, tp_axis=tp_axis,
                              use_mask_tiles=use_mask_tiles,
                              mask_plan=mask_plan)
        if with_cache:
            ks.append(kv[0])
            vs.append(kv[1])

    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    if logits_last_only:
        x = jnp.take_along_axis(
            x, jnp.maximum(valid_len - 1, 0)[:, None, None], axis=1)
    logits = _unembed(params, cfg, x, tp_axis=tp_axis).astype(jnp.float32)

    if not with_cache:
        return logits, None

    # under TP the cache holds this device's local kv-head slice
    cache = make_kv_cache(cfg, B, cache_size, kv_dtype=kv_dtype,
                          n_kv_heads=ks[0].shape[1])
    k_stack = jnp.stack(ks)  # [n_layers, B, Hkv, L, Dh]
    v_stack = jnp.stack(vs)
    if kv_dtype == "int8":
        k_q, k_s = quantize_kv_heads_int8(k_stack)
        v_q, v_s = quantize_kv_heads_int8(v_stack)
        z5, z4 = (0, 0, 0, 0, 0), (0, 0, 0, 0)
        cache = {
            "k": jax.lax.dynamic_update_slice(cache["k"], k_q, z5),
            "v": jax.lax.dynamic_update_slice(cache["v"], v_q, z5),
            "k_scale": jax.lax.dynamic_update_slice(cache["k_scale"],
                                                    k_s, z4),
            "v_scale": jax.lax.dynamic_update_slice(cache["v_scale"],
                                                    v_s, z4),
        }
    else:
        cache = {
            "k": jax.lax.dynamic_update_slice(
                cache["k"], k_stack.astype(cfg.dtype), (0, 0, 0, 0, 0)),
            "v": jax.lax.dynamic_update_slice(
                cache["v"], v_stack.astype(cfg.dtype), (0, 0, 0, 0, 0)),
        }
    return logits, cache


def decode_step(params: Dict[str, Any], cfg: DecoderConfig,
                tokens: jax.Array,            # [B] current input token
                positions: jax.Array,         # [B] true (RoPE) positions
                cache: Dict[str, Any],
                write_index,                   # scalar cache slot to write
                cache_mask: jax.Array,        # [B, S] valid cache slots
                tp_axis: Optional[str] = None,
                ) -> Tuple[jax.Array, Dict[str, Any]]:
    """One decode step.  Plain causal attention over all valid cache slots
    (reference decode semantics — no isolation after prefill).

    Returns (logits [B, V], updated cache).  cache_mask must already include
    the slot being written.
    """
    B = tokens.shape[0]
    x = _embed_rows(params["embed"], tokens, cfg.dtype)[:, None, :]  # B,1,d
    pos = positions[:, None]
    int8_kv = "k_scale" in cache

    new_cache = dict(cache)
    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["ln1"], cfg.norm_eps)
        q, k, v = _project_qkv(layer["attn"], h, cfg)   # [B, H, 1, hd]
        q = rope(q, pos, cfg.rope_theta, cfg.rope_scaling)
        k = rope(k, pos, cfg.rope_theta, cfg.rope_scaling)

        if int8_kv:
            k_q, k_s = quantize_kv_heads_int8(k)
            v_q, v_s = quantize_kv_heads_int8(v)
            new_cache["k"] = jax.lax.dynamic_update_slice(
                new_cache["k"], k_q[None], (li, 0, 0, write_index, 0))
            new_cache["v"] = jax.lax.dynamic_update_slice(
                new_cache["v"], v_q[None], (li, 0, 0, write_index, 0))
            new_cache["k_scale"] = jax.lax.dynamic_update_slice(
                new_cache["k_scale"], k_s[None], (li, 0, 0, write_index))
            new_cache["v_scale"] = jax.lax.dynamic_update_slice(
                new_cache["v_scale"], v_s[None], (li, 0, 0, write_index))
            attn_out = masked_decode_attention_int8(
                q[:, :, 0, :], new_cache["k"][li], new_cache["v"][li],
                new_cache["k_scale"][li], new_cache["v_scale"][li],
                cache_mask)
        else:
            new_cache["k"] = jax.lax.dynamic_update_slice(
                new_cache["k"], k[None].astype(cfg.dtype),
                (li, 0, 0, write_index, 0))
            new_cache["v"] = jax.lax.dynamic_update_slice(
                new_cache["v"], v[None].astype(cfg.dtype),
                (li, 0, 0, write_index, 0))
            # GQA groups contract inside the op; kv never repeated in memory
            attn_out = masked_decode_attention(q[:, :, 0, :],
                                               new_cache["k"][li],
                                               new_cache["v"][li],
                                               cache_mask)
        x = x + _maybe_psum(_mm(attn_out.reshape(B, 1, -1),
                                layer["attn"]["wo"]), tp_axis)
        x = x + _maybe_psum(
            _mlp(layer["mlp"], rms_norm(x, layer["ln2"], cfg.norm_eps)),
            tp_axis)

    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    logits = _unembed(params, cfg, x,
                      tp_axis=tp_axis)[:, 0, :].astype(jnp.float32)
    return logits, new_cache


def _update_rows_at(cache_layer: jax.Array, new: jax.Array,
                    slots: jax.Array) -> jax.Array:
    """Write G consecutive slots per batch row at per-row base offsets.

    cache_layer: [B, Hkv, S, Dh]; new: [B, Hkv, G, Dh]; slots: [B] base
    slot per row.  Speculative decoding advances each row by its own
    accepted-token count, so rows write at diverging offsets — a vmapped
    dynamic_update_slice (one per row) instead of the uniform-slot write
    of :func:`decode_step`.
    """
    return jax.vmap(
        lambda c, n, s: jax.lax.dynamic_update_slice(c, n, (0, s, 0))
    )(cache_layer, new, slots)


def _update_scale_rows_at(scale_layer: jax.Array, new: jax.Array,
                          slots: jax.Array) -> jax.Array:
    """Per-row scale companion of :func:`_update_rows_at`:
    scale_layer [B, Hkv, S], new [B, Hkv, G], slots [B]."""
    return jax.vmap(
        lambda c, n, s: jax.lax.dynamic_update_slice(c, n, (0, s))
    )(scale_layer, new, slots)


def decode_window(params: Dict[str, Any], cfg: DecoderConfig,
                  tokens: jax.Array,        # [B, G] window tokens
                  positions: jax.Array,     # [B, G] true (RoPE) positions
                  cache: Dict[str, Any],
                  write_slots: jax.Array,   # [B] per-row base cache slot
                  cache_mask: jax.Array,    # [B, G, S] valid slots per row
                  tp_axis: Optional[str] = None,
                  ) -> Tuple[jax.Array, Dict[str, Any]]:
    """Speculative verification step: one forward over a G-token window.

    Each window row attends the cache slots marked in its ``cache_mask``
    row (history + within-window causal prefix — the caller builds this).
    K/V of all G tokens are written at ``write_slots[b] .. +G-1``; the
    caller is responsible for treating only the accepted prefix as valid
    history afterwards (rejected slots are overwritten by the next
    window, which always starts at or before them — with the int8 cache
    the per-slot scales are overwritten alongside the values, so the
    same property holds).

    Returns (logits [B, G, V], updated cache).
    """
    B, G = tokens.shape
    x = _embed_rows(params["embed"], tokens, cfg.dtype)  # [B, G, d]
    int8_kv = "k_scale" in cache

    new_cache = dict(cache)
    for li, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["ln1"], cfg.norm_eps)
        q, k, v = _project_qkv(layer["attn"], h, cfg)   # [B, H|Hkv, G, hd]
        q = rope(q, positions, cfg.rope_theta, cfg.rope_scaling)
        k = rope(k, positions, cfg.rope_theta, cfg.rope_scaling)
        if int8_kv:
            k_q, k_s = quantize_kv_heads_int8(k)
            v_q, v_s = quantize_kv_heads_int8(v)
            new_cache["k"] = new_cache["k"].at[li].set(
                _update_rows_at(new_cache["k"][li], k_q, write_slots))
            new_cache["v"] = new_cache["v"].at[li].set(
                _update_rows_at(new_cache["v"][li], v_q, write_slots))
            new_cache["k_scale"] = new_cache["k_scale"].at[li].set(
                _update_scale_rows_at(new_cache["k_scale"][li], k_s,
                                      write_slots))
            new_cache["v_scale"] = new_cache["v_scale"].at[li].set(
                _update_scale_rows_at(new_cache["v_scale"][li], v_s,
                                      write_slots))
            attn_out = masked_decode_window_attention_int8(
                q, new_cache["k"][li], new_cache["v"][li],
                new_cache["k_scale"][li], new_cache["v_scale"][li],
                cache_mask)
        else:
            new_cache["k"] = new_cache["k"].at[li].set(
                _update_rows_at(new_cache["k"][li], k.astype(cfg.dtype),
                                write_slots))
            new_cache["v"] = new_cache["v"].at[li].set(
                _update_rows_at(new_cache["v"][li], v.astype(cfg.dtype),
                                write_slots))
            attn_out = masked_decode_window_attention(
                q, new_cache["k"][li], new_cache["v"][li], cache_mask)
        attn_out = attn_out.transpose(0, 2, 1, 3).reshape(B, G, -1)
        x = x + _maybe_psum(_mm(attn_out, layer["attn"]["wo"]), tp_axis)
        x = x + _maybe_psum(
            _mlp(layer["mlp"], rms_norm(x, layer["ln2"], cfg.norm_eps)),
            tp_axis)

    x = rms_norm(x, params["final_norm"], cfg.norm_eps)
    logits = _unembed(params, cfg, x, tp_axis=tp_axis).astype(jnp.float32)
    return logits, new_cache


def count_params(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
