"""Parameter/activation sharding rules for pjit over a ('data','model') mesh.

New design surface (the reference is single-device, SURVEY.md §2.10):
Megatron-style tensor parallelism for the decoder — attention qkv and MLP
gate/up shard their output dim on 'model', wo and MLP down shard their input
dim (XLA inserts the psum on 'model'), lm_head shards the vocab dim; batch
activations shard on 'data'.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sdag_tpu.models.llama import DecoderConfig


def decoder_param_specs(cfg: DecoderConfig) -> Dict[str, Any]:
    """PartitionSpec pytree matching init_decoder_params' structure."""
    layer_spec = {
        "attn": {
            "wq": P(None, "model"),
            "wk": P(None, "model"),
            "wv": P(None, "model"),
            "wo": P("model", None),
        },
        "mlp": {
            "gate": P(None, "model"),
            "up": P(None, "model"),
            "down": P("model", None),
        },
        "ln1": P(None),
        "ln2": P(None),
    }
    specs: Dict[str, Any] = {
        "embed": P(None, None),
        "layers": [layer_spec for _ in range(cfg.n_layers)],
        "final_norm": P(None),
    }
    if not cfg.tie_embeddings:
        specs["lm_head"] = P(None, "model")
    return specs


def shard_params(params, cfg: DecoderConfig, mesh: Mesh):
    specs = decoder_param_specs(cfg)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda x: isinstance(x, P))


def batch_specs() -> Dict[str, P]:
    """Input shardings for a training/inference batch."""
    return {
        "input_ids": P("data", None),
        "targets": P("data", None),
        "doc_id": P("data", None),
        "nbr_bits": P("data", None),
        "sys_user_len": P("data"),
        "valid_len": P("data"),
        "loss_mask": P("data", None),
    }
