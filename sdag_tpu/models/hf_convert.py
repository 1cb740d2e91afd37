"""HF checkpoint conversion: torch state dicts -> our JAX param trees.

Offline weight loading for the reference's two models — the Llama-class
generator (``config.py:43``, meta-llama/Llama-3.1-8B-Instruct) and the
BERT-class E5 ranker (``config.py:41``, intfloat/e5-large-v2).  torch (CPU)
is used only as a file reader; no network access is attempted (checkpoints
must already be on disk).

Note: Llama-3.1 applies HF "llama3" RoPE frequency scaling; pass
``rope_scaling`` through DecoderConfig when converting such checkpoints
(plain RoPE otherwise).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from sdag_tpu.models.e5 import EncoderConfig
from sdag_tpu.models.llama import DecoderConfig


def _t(x) -> np.ndarray:
    import torch
    if isinstance(x, torch.Tensor):
        return x.detach().to(torch.float32).cpu().numpy()
    return np.asarray(x, np.float32)


# ----------------------------------------------------------------- Llama
def convert_llama_state_dict(sd: Dict[str, Any], cfg: DecoderConfig
                             ) -> Dict[str, Any]:
    """HF LlamaForCausalLM state dict -> our decoder param tree.

    HF stores projections as [out, in]; ours are applied as x @ w, so every
    weight is transposed.
    """
    def w(name):
        return _t(sd[name]).T.astype(np.float32)

    layers = []
    for i in range(cfg.n_layers):
        p = f"model.layers.{i}."
        layers.append({
            "attn": {
                "wq": jnp.asarray(w(p + "self_attn.q_proj.weight"),
                                  cfg.dtype),
                "wk": jnp.asarray(w(p + "self_attn.k_proj.weight"),
                                  cfg.dtype),
                "wv": jnp.asarray(w(p + "self_attn.v_proj.weight"),
                                  cfg.dtype),
                "wo": jnp.asarray(w(p + "self_attn.o_proj.weight"),
                                  cfg.dtype),
            },
            "mlp": {
                "gate": jnp.asarray(w(p + "mlp.gate_proj.weight"), cfg.dtype),
                "up": jnp.asarray(w(p + "mlp.up_proj.weight"), cfg.dtype),
                "down": jnp.asarray(w(p + "mlp.down_proj.weight"), cfg.dtype),
            },
            "ln1": jnp.asarray(_t(sd[p + "input_layernorm.weight"]),
                               cfg.dtype),
            "ln2": jnp.asarray(_t(sd[p + "post_attention_layernorm.weight"]),
                               cfg.dtype),
        })

    params: Dict[str, Any] = {
        "embed": jnp.asarray(_t(sd["model.embed_tokens.weight"]), cfg.dtype),
        "layers": layers,
        "final_norm": jnp.asarray(_t(sd["model.norm.weight"]), cfg.dtype),
    }
    if not cfg.tie_embeddings:
        lm_head = sd.get("lm_head.weight", sd["model.embed_tokens.weight"])
        params["lm_head"] = jnp.asarray(_t(lm_head).T, cfg.dtype)
    return params


def decoder_config_from_hf(hf_cfg) -> DecoderConfig:
    scaling = getattr(hf_cfg, "rope_scaling", None)
    rope_scaling = None
    if isinstance(scaling, dict) and scaling.get("rope_type") == "llama3":
        rope_scaling = (float(scaling["factor"]),
                        float(scaling["low_freq_factor"]),
                        float(scaling["high_freq_factor"]),
                        int(scaling["original_max_position_embeddings"]))
    return DecoderConfig(
        vocab_size=hf_cfg.vocab_size,
        d_model=hf_cfg.hidden_size,
        n_layers=hf_cfg.num_hidden_layers,
        n_heads=hf_cfg.num_attention_heads,
        n_kv_heads=getattr(hf_cfg, "num_key_value_heads",
                           hf_cfg.num_attention_heads),
        d_ff=hf_cfg.intermediate_size,
        rope_theta=getattr(hf_cfg, "rope_theta", 10000.0),
        norm_eps=getattr(hf_cfg, "rms_norm_eps", 1e-5),
        tie_embeddings=getattr(hf_cfg, "tie_word_embeddings", False),
        rope_scaling=rope_scaling,
    )


def load_decoder_checkpoint(checkpoint_dir: str
                            ) -> Tuple[Dict[str, Any], DecoderConfig]:
    """Load a local HF Llama checkpoint dir into (params, config).

    Memory discipline for the 8B target: the torch model loads at its
    STORED dtype (bf16 for Llama-3.1, not a 32GB f32 promotion) and the
    converted arrays are committed to the host CPU backend — eager
    placement on the default TPU device would OOM a 16GB v5e before
    shard_params/TP sharding ever runs; tensors move to devices with
    their proper shardings at first use."""
    import jax
    from transformers import AutoConfig, AutoModelForCausalLM
    hf_cfg = AutoConfig.from_pretrained(checkpoint_dir)
    cfg = decoder_config_from_hf(hf_cfg)
    model = AutoModelForCausalLM.from_pretrained(
        checkpoint_dir, torch_dtype="auto", low_cpu_mem_usage=True)
    with jax.default_device(jax.devices("cpu")[0]):
        params = convert_llama_state_dict(model.state_dict(), cfg)
    del model
    return params, cfg


# ------------------------------------------------------------------ BERT/E5
def convert_bert_state_dict(sd: Dict[str, Any], cfg: EncoderConfig,
                            prefix: str = "") -> Dict[str, Any]:
    """HF BertModel state dict -> our encoder param tree."""
    def w(name):
        return jnp.asarray(_t(sd[prefix + name]).T, cfg.dtype)

    def b(name):
        return jnp.asarray(_t(sd[prefix + name]), cfg.dtype)

    layers = []
    for i in range(cfg.n_layers):
        p = f"encoder.layer.{i}."
        layers.append({
            "attn": {
                "wq": w(p + "attention.self.query.weight"),
                "bq": b(p + "attention.self.query.bias"),
                "wk": w(p + "attention.self.key.weight"),
                "bk": b(p + "attention.self.key.bias"),
                "wv": w(p + "attention.self.value.weight"),
                "bv": b(p + "attention.self.value.bias"),
                "wo": w(p + "attention.output.dense.weight"),
                "bo": b(p + "attention.output.dense.bias"),
            },
            "ln1": {"w": b(p + "attention.output.LayerNorm.weight"),
                    "b": b(p + "attention.output.LayerNorm.bias")},
            "mlp": {
                "w1": w(p + "intermediate.dense.weight"),
                "b1": b(p + "intermediate.dense.bias"),
                "w2": w(p + "output.dense.weight"),
                "b2": b(p + "output.dense.bias"),
            },
            "ln2": {"w": b(p + "output.LayerNorm.weight"),
                    "b": b(p + "output.LayerNorm.bias")},
        })

    return {
        "word_emb": b("embeddings.word_embeddings.weight"),
        "pos_emb": b("embeddings.position_embeddings.weight"),
        "type_emb": b("embeddings.token_type_embeddings.weight"),
        "emb_ln": {"w": b("embeddings.LayerNorm.weight"),
                   "b": b("embeddings.LayerNorm.bias")},
        "layers": layers,
    }


def encoder_config_from_hf(hf_cfg) -> EncoderConfig:
    return EncoderConfig(
        vocab_size=hf_cfg.vocab_size,
        d_model=hf_cfg.hidden_size,
        n_layers=hf_cfg.num_hidden_layers,
        n_heads=hf_cfg.num_attention_heads,
        d_ff=hf_cfg.intermediate_size,
        max_position=hf_cfg.max_position_embeddings,
        norm_eps=getattr(hf_cfg, "layer_norm_eps", 1e-12),
    )


def load_encoder_checkpoint(checkpoint_dir: str
                            ) -> Tuple[Dict[str, Any], EncoderConfig]:
    """Load a local HF BERT/E5 checkpoint dir into (params, config).

    Same memory discipline as load_decoder_checkpoint: stored dtype,
    host-side conversion."""
    import jax
    from transformers import AutoConfig, AutoModel
    hf_cfg = AutoConfig.from_pretrained(checkpoint_dir)
    cfg = encoder_config_from_hf(hf_cfg)
    model = AutoModel.from_pretrained(checkpoint_dir, torch_dtype="auto",
                                      low_cpu_mem_usage=True)
    with jax.default_device(jax.devices("cpu")[0]):
        params = convert_bert_state_dict(model.state_dict(), cfg)
    del model
    return params, cfg
