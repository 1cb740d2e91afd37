"""E5-family text encoder (BERT architecture), functional JAX.

TPU-native replacement for the reference's SentenceTransformer ranker
(``main.py:231``, ``dense.py:44-65``, ``malicious_selection.py:12-35``,
``SDAG.py:14-65``).  Preserves the E5 conventions: "query: " / "passage: "
prefixes when the model name contains "e5", mean pooling over the attention
mask, and L2-normalized outputs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 512
    d_model: int = 128
    n_layers: int = 2
    n_heads: int = 4
    d_ff: int = 256
    max_position: int = 512
    norm_eps: float = 1e-12
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @staticmethod
    def tiny() -> "EncoderConfig":
        return EncoderConfig()

    @staticmethod
    def e5_large_v2() -> "EncoderConfig":
        """intfloat/e5-large-v2 geometry (reference ``config.py:41``)."""
        return EncoderConfig(vocab_size=30522, d_model=1024, n_layers=24,
                             n_heads=16, d_ff=4096, max_position=512,
                             dtype=jnp.bfloat16)


def init_encoder_params(key: jax.Array, cfg: EncoderConfig) -> Dict[str, Any]:
    d = cfg.d_model
    keys = jax.random.split(key, cfg.n_layers + 3)

    def dense(k, shape, scale=None):
        scale = scale or shape[0] ** -0.5
        return (jax.random.normal(k, shape, jnp.float32) * scale
                ).astype(cfg.dtype)

    layers = []
    for li in range(cfg.n_layers):
        lk = jax.random.split(keys[li], 8)
        layers.append({
            "attn": {
                "wq": dense(lk[0], (d, d)), "bq": jnp.zeros((d,), cfg.dtype),
                "wk": dense(lk[1], (d, d)), "bk": jnp.zeros((d,), cfg.dtype),
                "wv": dense(lk[2], (d, d)), "bv": jnp.zeros((d,), cfg.dtype),
                "wo": dense(lk[3], (d, d)), "bo": jnp.zeros((d,), cfg.dtype),
            },
            "ln1": {"w": jnp.ones((d,), cfg.dtype),
                    "b": jnp.zeros((d,), cfg.dtype)},
            "mlp": {
                "w1": dense(lk[4], (d, cfg.d_ff)),
                "b1": jnp.zeros((cfg.d_ff,), cfg.dtype),
                "w2": dense(lk[5], (cfg.d_ff, d)),
                "b2": jnp.zeros((d,), cfg.dtype),
            },
            "ln2": {"w": jnp.ones((d,), cfg.dtype),
                    "b": jnp.zeros((d,), cfg.dtype)},
        })

    return {
        "word_emb": dense(keys[-3], (cfg.vocab_size, d), scale=0.02),
        "pos_emb": dense(keys[-2], (cfg.max_position, d), scale=0.02),
        "type_emb": jnp.zeros((2, d), cfg.dtype),
        "emb_ln": {"w": jnp.ones((d,), cfg.dtype),
                   "b": jnp.zeros((d,), cfg.dtype)},
        "layers": layers,
    }


def _layer_norm(x, ln, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) \
        * ln["w"] + ln["b"]


def fuse_qkv_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Precompute per-layer fused QKV weights (wqkv [d, 3d], bqkv [3d]):
    one MXU matmul replaces three in the forward.  Done once at encoder
    construction — never per call."""
    out = dict(params)
    layers = []
    for layer in params["layers"]:
        a = layer["attn"]
        a2 = dict(a)
        a2["wqkv"] = jnp.concatenate([a["wq"], a["wk"], a["wv"]], axis=1)
        a2["bqkv"] = jnp.concatenate([a["bq"], a["bk"], a["bv"]])
        for key in ("wq", "wk", "wv", "bq", "bk", "bv"):
            del a2[key]
        l2 = dict(layer)
        l2["attn"] = a2
        layers.append(l2)
    out["layers"] = layers
    return out


def encoder_forward(params: Dict[str, Any], cfg: EncoderConfig,
                    input_ids: jax.Array, attention_mask: jax.Array,
                    fused_attention: bool = False,
                    gelu: str = "erf") -> jax.Array:
    """Mean-pooled, L2-normalized sentence embeddings.

    input_ids, attention_mask: [B, L].  Returns [B, d] float32.
    Accepts plain params (wq/wk/wv) or :func:`fuse_qkv_params` output.
    fused_attention=True routes attention through the Pallas fused kernel
    (ops/encoder_attention.py; TPU) — requires the mask rows to be
    contiguous prefixes, which :meth:`E5Encoder._tokenize` guarantees.
    When combined with fused-QKV params the packed projection output
    feeds the kernel directly ([B, L, 3H, Dh] view, no split copies).
    gelu: "erf" (exact, BERT/HF-parity) or "tanh" (the standard tanh
    approximation; 14 ms faster per e5-large forward on v5e, embedding
    cosine vs erf pinned >= 0.9999 in tests).
    """
    B, L = input_ids.shape
    pos = jnp.arange(L, dtype=jnp.int32)
    x = (params["word_emb"][input_ids] + params["pos_emb"][pos][None]
         + params["type_emb"][0][None, None])
    x = _layer_norm(x, params["emb_ln"], cfg.norm_eps)

    if fused_attention:
        valid_len = jnp.sum(attention_mask.astype(jnp.int32), axis=1)
        bias = None
    else:
        neg = jnp.finfo(jnp.float32).min * 0.5
        bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)

    hd = cfg.head_dim
    for layer in params["layers"]:
        a = layer["attn"]
        if fused_attention and "wqkv" in a:
            from sdag_tpu.ops.encoder_attention import \
                encoder_attention_fused_qkv
            qkv = x @ a["wqkv"] + a["bqkv"]     # [B, L, 3d], fed as-is
            ctx = encoder_attention_fused_qkv(qkv, valid_len,
                                              n_heads=cfg.n_heads)
        else:
            if "wqkv" in a:
                qkv = x @ a["wqkv"] + a["bqkv"]
                q, k, v = jnp.split(qkv, 3, axis=-1)
                q = q.reshape(B, L, cfg.n_heads, hd)
                k = k.reshape(B, L, cfg.n_heads, hd)
                v = v.reshape(B, L, cfg.n_heads, hd)
            else:
                q = (x @ a["wq"] + a["bq"]).reshape(B, L, cfg.n_heads, hd)
                k = (x @ a["wk"] + a["bk"]).reshape(B, L, cfg.n_heads, hd)
                v = (x @ a["wv"] + a["bv"]).reshape(B, L, cfg.n_heads, hd)
            if fused_attention:
                from sdag_tpu.ops.encoder_attention import \
                    encoder_attention_fused
                # [B, L, H, Dh] in, [B, L, d] out — no HBM transposes
                ctx = encoder_attention_fused(q, k, v, valid_len)
            else:
                scores = jnp.einsum(
                    "bihd,bjhd->bhij", q, k,
                    preferred_element_type=jnp.float32) * hd ** -0.5
                probs = jax.nn.softmax(scores + bias,
                                       axis=-1).astype(x.dtype)
                ctx = jnp.einsum("bhij,bjhd->bihd", probs,
                                 v).reshape(B, L, -1)
        x = _layer_norm(x + (ctx @ a["wo"] + a["bo"]), layer["ln1"],
                        cfg.norm_eps)
        m = layer["mlp"]
        h = jax.nn.gelu(x @ m["w1"] + m["b1"],
                        approximate=(gelu == "tanh"))
        x = _layer_norm(x + (h @ m["w2"] + m["b2"]), layer["ln2"],
                        cfg.norm_eps)

    mask = attention_mask[..., None].astype(jnp.float32)
    pooled = jnp.sum(x.astype(jnp.float32) * mask, axis=1) / \
        jnp.maximum(jnp.sum(mask, axis=1), 1e-9)
    return pooled / jnp.maximum(
        jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)


class E5Encoder:
    """Batched encoder with E5 prefixing rules and shape-bucketed jit."""

    def __init__(self, params, cfg: EncoderConfig, tokenizer,
                 model_name: str = "e5", max_length: int = 512,
                 pad_multiple: int = 64, dp_mesh=None,
                 fused: Optional[bool] = None,
                 gelu: Optional[str] = None) -> None:
        # fused=None: fuse QKV + Pallas attention on TPU, plain XLA
        # elsewhere (the kernel's mask contract is met by _tokenize's
        # contiguous-prefix padding; parity is test-pinned)
        # gelu=None: tanh approximation on TPU (14 ms/forward faster at
        # e5-large, cosine vs erf pinned >= 0.9999), exact erf elsewhere
        if fused is None:
            fused = jax.default_backend() == "tpu"
        if gelu is None:
            gelu = "tanh" if jax.default_backend() == "tpu" else "erf"
        self.fused = fused
        self.gelu = gelu
        self.params = fuse_qkv_params(params) if fused else params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.is_e5 = "e5" in model_name.lower()
        self.max_length = min(max_length, cfg.max_position)
        self.pad_multiple = pad_multiple
        self._fwd = jax.jit(
            lambda p, ids, m: encoder_forward(p, cfg, ids, m,
                                              fused_attention=fused,
                                              gelu=gelu))
        # Data-parallel index-build encoding: batch rows sharded over the
        # mesh 'data' axis, params replicated — the build-side mirror of
        # the sharded search path (SURVEY §2.10). Output-identical to the
        # single-device forward (pure batch parallelism, no collectives
        # in the forward itself).
        self.dp_mesh = None
        self._dp_n = 1
        if dp_mesh is not None and "data" in dp_mesh.shape \
                and dp_mesh.shape["data"] > 1:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P
            self.dp_mesh = dp_mesh
            self._dp_n = dp_mesh.shape["data"]
            # shard_map (not sharded jit) so the per-device forward is the
            # SAME function as the single-device path — including the
            # fused Pallas attention kernel on TPU.  The forward is purely
            # row-parallel (no collectives), so each device computes its
            # batch slice exactly as a single device would: build-side and
            # query-side embeddings stay numerically identical.
            self._fwd_dp = jax.jit(shard_map(
                lambda p, ids, m: encoder_forward(p, cfg, ids, m,
                                                  fused_attention=fused,
                                                  gelu=gelu),
                mesh=dp_mesh,
                in_specs=(jax.tree.map(lambda _: P(), self.params),
                          P("data"), P("data")),
                out_specs=P("data"), check_vma=False))

    @property
    def dim(self) -> int:
        return self.cfg.d_model

    def _prefix(self, texts: List[str], kind: str) -> List[str]:
        if not self.is_e5 or kind == "raw":
            return list(texts)
        return [f"{kind}: {t}" for t in texts]

    def encode(self, texts: List[str], kind: str = "passage",
               batch_size: int = 32) -> np.ndarray:
        """kind: 'query' | 'passage' | 'raw' (controls the E5 prefix,
        cf. reference ``dense.py:59`` / ``malicious_selection.py:32``)."""
        if not texts:
            return np.zeros((0, self.dim), np.float32)
        prefixed = self._prefix([t or "" for t in texts], kind)
        out = []
        for i in range(0, len(prefixed), batch_size):
            chunk = prefixed[i:i + batch_size]
            ids, mask = self._tokenize(chunk)
            if self.dp_mesh is not None:
                # pad rows to a multiple of the data-axis size; all-zero
                # mask rows pool to the zero vector and are dropped below
                pad = (-len(chunk)) % self._dp_n
                if pad:
                    ids = np.pad(ids, ((0, pad), (0, 0)))
                    mask = np.pad(mask, ((0, pad), (0, 0)))
                emb = self._fwd_dp(self.params, jnp.asarray(ids),
                                   jnp.asarray(mask))
                out.append(np.asarray(emb, np.float32)[:len(chunk)])
            else:
                emb = self._fwd(self.params, jnp.asarray(ids),
                                jnp.asarray(mask))
                out.append(np.asarray(emb, np.float32))
        return np.vstack(out)

    def _tokenize(self, texts: List[str]):
        # BERT-family tokenizers (SentenceTransformer path, reference
        # dense.py:44-65) wrap every sequence as [CLS] ids[:max-2] [SEP];
        # E5 mean-pools over those specials too, so they must be present
        # for real-checkpoint embedding parity.  Tokenizers without
        # cls/sep (the byte fallback) keep the plain truncation rule.
        cls_id = getattr(self.tokenizer, "cls_token_id", None)
        sep_id = getattr(self.tokenizer, "sep_token_id", None)
        if cls_id is not None and sep_id is not None:
            body = self.max_length - 2
            rows = [[cls_id]
                    + self.tokenizer.encode(t, add_special_tokens=False)[:body]
                    + [sep_id] for t in texts]
        else:
            rows = [self.tokenizer.encode(t, add_special_tokens=False)
                    [: self.max_length] for t in texts]
        lp = max(1, max(len(r) for r in rows))
        lp = min(((lp + self.pad_multiple - 1) // self.pad_multiple)
                 * self.pad_multiple, self.max_length)
        ids = np.zeros((len(rows), lp), np.int32)
        mask = np.zeros((len(rows), lp), np.int32)
        for i, r in enumerate(rows):
            r = r[:lp]
            ids[i, :len(r)] = r
            mask[i, :len(r)] = 1
        return ids, mask
