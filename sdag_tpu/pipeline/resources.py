"""Heavy-resource initialization: models, indexes, mesh.

Mirrors the reference's ``init_resources`` (``main.py:201-243``) but
TPU-native: the encoder/generator are JAX models (random-init at a named
architecture, or converted from a local HF checkpoint), and the dense/sparse
indexes are device-resident, built from a corpus JSONL when no prebuilt
index dir exists.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Tuple

import jax

from sdag_tpu.config import Config
from sdag_tpu.core.mesh import make_index_mesh
from sdag_tpu.datamodels import Resources
from sdag_tpu.models.e5 import E5Encoder, EncoderConfig, init_encoder_params
from sdag_tpu.models.llama import DecoderConfig, init_decoder_params
from sdag_tpu.models.tokenizer import load_tokenizer
from sdag_tpu.retrieval.dense import DenseIndex, DenseRetriever
from sdag_tpu.retrieval.hybrid import HybridRetriever
from sdag_tpu.retrieval.sparse import BM25Index, SparseRetriever
from sdag_tpu.sdag.generate import Generator


def _encoder_config(arch: str) -> EncoderConfig:
    if arch == "e5-large-v2":
        return EncoderConfig.e5_large_v2()
    if arch == "tiny":
        return EncoderConfig.tiny()
    # a typo must not silently run the experiment on a random toy model
    # and write plausible-looking garbage metrics
    raise ValueError(f"Unknown RANKER_ARCH {arch!r}: expected "
                     "'e5-large-v2' or 'tiny'")


def _decoder_config(arch: str) -> DecoderConfig:
    if arch == "llama3-8b":
        return DecoderConfig.llama3_8b()
    if arch == "tiny":
        return DecoderConfig.tiny()
    raise ValueError(f"Unknown LLM_ARCH {arch!r}: expected 'llama3-8b' "
                     "or 'tiny'")


def load_corpus_jsonl(path: str) -> Tuple[List[str], List[str]]:
    texts, ids = [], []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            obj = json.loads(line)
            ids.append(str(obj.get("id", len(ids))))
            texts.append(str(obj.get("text", obj.get("contents", ""))))
    return texts, ids


def build_encoder(cfg: Config) -> E5Encoder:
    enc_cfg = _encoder_config(cfg.RANKER_ARCH)
    tok = load_tokenizer(cfg.RANKER_CHECKPOINT)
    if cfg.RANKER_CHECKPOINT:
        from sdag_tpu.models.hf_convert import load_encoder_checkpoint
        params, enc_cfg = load_encoder_checkpoint(cfg.RANKER_CHECKPOINT)
    else:
        params = init_encoder_params(jax.random.PRNGKey(cfg.SEED), enc_cfg)
    dp_mesh = None
    if cfg.MESH_DATA != 1:
        # index-build / query encoding sharded over the data axis,
        # mirroring the sharded search path (SURVEY §2.10).  MESH_DATA=0
        # keeps its documented "all local devices" semantics (config.py)
        # — it used to be silently ignored here, so the default build ran
        # single-device; E5Encoder itself no-ops on a 1-device mesh
        from sdag_tpu.core.mesh import make_mesh
        dp_mesh = make_mesh(data=cfg.MESH_DATA, model=1)
    return E5Encoder(params, enc_cfg, tok, model_name=cfg.RANKER_MODEL_NAME,
                     dp_mesh=dp_mesh)


def build_generator(cfg: Config) -> Generator:
    from sdag_tpu.models.native_ckpt import is_native_checkpoint
    dec_cfg = _decoder_config(cfg.LLM_ARCH)
    if is_native_checkpoint(cfg.LLM_CHECKPOINT):
        # trained-in-repo checkpoint (e.g. the synthetic-QA decoder from
        # pipeline/train_qa.py): npz params + the tokenizer trained with
        # (word_tokenizer.json if present, byte fallback else)
        from sdag_tpu.models.native_ckpt import load_decoder
        tok = load_tokenizer(cfg.LLM_CHECKPOINT)
        params, dec_cfg = load_decoder(cfg.LLM_CHECKPOINT)
    elif cfg.LLM_CHECKPOINT:
        from sdag_tpu.models.hf_convert import load_decoder_checkpoint
        tok = load_tokenizer(cfg.LLM_CHECKPOINT)
        params, dec_cfg = load_decoder_checkpoint(cfg.LLM_CHECKPOINT)
    else:
        tok = load_tokenizer("")
        params = init_decoder_params(jax.random.PRNGKey(cfg.SEED + 1),
                                     dec_cfg)
    if cfg.LLM_WEIGHTS_DTYPE == "int8":
        # weight-only int8 serving: quantize once at load; the decoder
        # forwards dispatch on leaf type (models/llama.py _mm)
        from sdag_tpu.models.llama import quantize_decoder_params_int8
        params = quantize_decoder_params_int8(params)
    tp_mesh = None
    if cfg.MESH_MODEL > 1 or cfg.MESH_DATA > 1:
        # sharded serving: 'model' = tensor parallelism (required for
        # models that don't fit one chip, e.g. Llama-3.1-8B bf16 on
        # v5e); 'data' = batch sharding composed on top
        from sdag_tpu.core.mesh import make_mesh
        # MESH_DATA=0 keeps its documented "fill with all remaining
        # devices" semantics (make_mesh)
        tp_mesh = make_mesh(data=cfg.MESH_DATA,
                            model=max(cfg.MESH_MODEL, 1))
    return Generator(params, dec_cfg, tok, temperature=cfg.TEMPERATURE,
                     top_p=cfg.TOP_P, seed=cfg.SEED,
                     kv_cache_dtype=cfg.KV_CACHE_DTYPE,
                     speculative_draft=cfg.SPECULATIVE_DRAFT_LEN,
                     tp_mesh=tp_mesh, batch_bucket=cfg.LLM_BATCH_SIZE)


def init_resources(cfg: Config) -> Resources:
    mesh = make_index_mesh()
    encoder = build_encoder(cfg)
    generator = build_generator(cfg)

    dense_index = None
    sparse_index = None
    need_dense = cfg.RETRIEVER_BACKEND in {"dense", "sparse_and_dense"}
    need_sparse = cfg.RETRIEVER_BACKEND in {"sparse", "sparse_and_dense"}

    # one corpus read shared by both build paths (sparse_and_dense used
    # to parse a multi-GB JSONL twice back-to-back)
    corpus_cache: Dict[str, Tuple[List[str], List[str]]] = {}

    def corpus():
        if cfg.CORPUS_JSONL_PATH not in corpus_cache:
            corpus_cache[cfg.CORPUS_JSONL_PATH] = load_corpus_jsonl(
                cfg.CORPUS_JSONL_PATH)
        return corpus_cache[cfg.CORPUS_JSONL_PATH]

    if need_dense:
        import jax.numpy as jnp
        dtypes = {"bfloat16": jnp.bfloat16, "int8": jnp.int8,
                  "float32": jnp.float32}
        if cfg.DENSE_INDEX_DTYPE not in dtypes:
            # membership-checked like every other config enum — 'bf16'
            # silently loading a float32 index ignores the user's
            # quantization choice at 2x the HBM
            raise ValueError(f"Unknown DENSE_INDEX_DTYPE "
                             f"{cfg.DENSE_INDEX_DTYPE!r}: expected one of "
                             f"{sorted(dtypes)}")
        idx_dtype = dtypes[cfg.DENSE_INDEX_DTYPE]
        if os.path.isdir(cfg.DENSE_INDEX_PATH):
            print(f"[resources] loading dense index: {cfg.DENSE_INDEX_PATH}")
            meta_path = cfg.META_JSONL_PATH \
                if os.path.exists(cfg.META_JSONL_PATH) else None
            dense_index = DenseIndex.load(cfg.DENSE_INDEX_PATH, mesh=mesh,
                                          meta_path=meta_path,
                                          dtype=idx_dtype,
                                          search_mode=cfg.DENSE_SEARCH_MODE,
                                          int8_rescore=cfg.DENSE_INT8_RESCORE)
        elif cfg.CORPUS_JSONL_PATH:
            print("[resources] building dense index from corpus "
                  f"{cfg.CORPUS_JSONL_PATH}")
            texts, ids = corpus()
            dense_index = DenseIndex.from_texts(
                texts, ids, encoder, mesh=mesh,
                batch_size=cfg.BATCH_SIZE_EMBED_Q, dtype=idx_dtype,
                search_mode=cfg.DENSE_SEARCH_MODE,
                int8_rescore=cfg.DENSE_INT8_RESCORE)
            if cfg.DENSE_INDEX_PATH:
                dense_index.save(cfg.DENSE_INDEX_PATH)
        else:
            raise FileNotFoundError(
                f"No dense index at {cfg.DENSE_INDEX_PATH} and no "
                "CORPUS_JSONL_PATH to build one")

    if need_sparse:
        sp = cfg.SPARSE_INDEX_NAME_OR_PATH
        if sp and os.path.isdir(sp):
            print(f"[resources] loading sparse index: {sp}")
            sparse_index = BM25Index.load(sp, engine=cfg.BM25_ENGINE)
        elif cfg.CORPUS_JSONL_PATH:
            print("[resources] building BM25 index from corpus "
                  f"{cfg.CORPUS_JSONL_PATH}")
            texts, ids = corpus()
            sparse_index = BM25Index.from_texts(texts, ids, k1=cfg.BM25_K1,
                                                b=cfg.BM25_B,
                                                engine=cfg.BM25_ENGINE)
            if sp:
                sparse_index.save(sp)
        else:
            raise FileNotFoundError(
                "No sparse index and no CORPUS_JSONL_PATH to build one")

    return Resources(ranker=encoder, tokenizer=generator.tokenizer,
                     generator=generator, dense_index=dense_index,
                     sparse_index=sparse_index, mesh=mesh)


def build_retriever(cfg: Config, res: Resources):
    """Factory keyed on RETRIEVER_BACKEND (reference ``main.py:246-267``)."""
    if cfg.RETRIEVER_BACKEND == "dense":
        return DenseRetriever(res.ranker, res.dense_index)
    if cfg.RETRIEVER_BACKEND == "sparse":
        return SparseRetriever(res.sparse_index)
    if cfg.RETRIEVER_BACKEND == "sparse_and_dense":
        return HybridRetriever(DenseRetriever(res.ranker, res.dense_index),
                               SparseRetriever(res.sparse_index),
                               seed=cfg.SEED)
    raise ValueError(f"Unknown RETRIEVER_BACKEND: {cfg.RETRIEVER_BACKEND}")


def build_defense(cfg: Config, res: Resources):
    """Factory keyed on DEFENSE_BACKEND (reference ``main.py:270-286``)."""
    if cfg.DEFENSE_BACKEND == "none":
        from sdag_tpu.defenses.none import NoDefense
        return NoDefense()
    if cfg.DEFENSE_BACKEND == "ragdefender":
        from sdag_tpu.defenses.ragdefender import EmbeddingFilterDefense
        return EmbeddingFilterDefense(res.ranker)
    if cfg.DEFENSE_BACKEND == "discern_and_answer":
        from sdag_tpu.defenses.discern import (DiscernAndAnswerDefense,
                                               make_local_batch_classifier,
                                               make_local_classifier,
                                               make_openai_classifier)
        classify_batch = None
        if cfg.DISCERN_OPENAI_API_KEY:
            classify = make_openai_classifier(
                cfg.DISCERN_OPENAI_API_KEY, cfg.DISCERN_CLASSIFIER_MODEL,
                cfg.DISCERN_CLASSIFY_TEMPERATURE)
        else:
            classify = make_local_classifier(res.generator)
            classify_batch = make_local_batch_classifier(res.generator)
        return DiscernAndAnswerDefense(
            classify, max_docs_to_classify=cfg.DISCERN_MAX_DOCS_TO_CLASSIFY,
            classify_batch=classify_batch)
    raise ValueError(f"Unknown DEFENSE_BACKEND: {cfg.DEFENSE_BACKEND}")
