"""Native (non-HF) decoder checkpoints.

The reference is inference-only over pretrained HF weights; this repo also
*trains* (parallel/train.py), so it needs its own checkpoint format for
models that never existed as HF checkpoints — e.g. the tiny synthetic-QA
decoder that demonstrates the ISO-vs-NO-ISO poisoning effect
(pipeline/train_qa.py).  Format: ``native_decoder.json`` (DecoderConfig)
next to ``params.npz`` (flattened pytree, '/'-joined key paths).  The
pipeline's ``LLM_CHECKPOINT`` accepts such a directory transparently
(pipeline/resources.py); the tokenizer is the deterministic byte fallback.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdag_tpu.models.llama import DecoderConfig

MANIFEST = "native_decoder.json"

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def _flatten(params: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(
            str(p.key) if hasattr(p, "key") else str(p.idx) for p in path)
        flat[key] = np.asarray(leaf, dtype=np.float32)
    return flat


def is_native_checkpoint(path: str) -> bool:
    return bool(path) and os.path.isfile(os.path.join(path, MANIFEST))


def save_decoder(params: Any, cfg: DecoderConfig, out_dir: str,
                 extra: Dict[str, Any] | None = None) -> None:
    os.makedirs(out_dir, exist_ok=True)
    cfg_dict = dataclasses.asdict(cfg)
    cfg_dict["dtype"] = np.dtype(cfg.dtype).name if cfg.dtype != jnp.bfloat16 \
        else "bfloat16"
    with open(os.path.join(out_dir, MANIFEST), "w") as fh:
        json.dump({"config": cfg_dict, "extra": extra or {}}, fh, indent=1)
    np.savez(os.path.join(out_dir, "params.npz"), **_flatten(params))


def load_decoder(ckpt_dir: str) -> Tuple[Any, DecoderConfig]:
    with open(os.path.join(ckpt_dir, MANIFEST)) as fh:
        man = json.load(fh)
    cfg_dict = dict(man["config"])
    cfg_dict["dtype"] = _DTYPES.get(cfg_dict.get("dtype", "float32"),
                                    jnp.float32)
    if cfg_dict.get("rope_scaling") is not None:
        cfg_dict["rope_scaling"] = tuple(cfg_dict["rope_scaling"])
    cfg = DecoderConfig(**cfg_dict)
    data = np.load(os.path.join(ckpt_dir, "params.npz"))

    # rebuild the init-shaped pytree, then fill leaves by key path
    from sdag_tpu.models.llama import init_decoder_params
    template = init_decoder_params(jax.random.PRNGKey(0), cfg)
    leaves = jax.tree_util.tree_flatten_with_path(template)[0]
    filled = {}
    for path, leaf in leaves:
        key = "/".join(
            str(p.key) if hasattr(p, "key") else str(p.idx) for p in path)
        arr = jnp.asarray(data[key]).astype(cfg.dtype)
        if arr.shape != leaf.shape:
            raise ValueError(f"{key}: checkpoint shape {arr.shape} != "
                             f"config shape {leaf.shape}")
        filled[key] = arr

    def rebuild(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in tree.items()}
        if isinstance(tree, list):
            return [rebuild(v, f"{prefix}{i}/") for i, v in enumerate(tree)]
        return filled[prefix[:-1]]

    return rebuild(template), cfg
