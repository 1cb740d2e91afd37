"""Dense retrieval: HBM-resident embedding index + fused top-k search.

TPU-native replacement for the reference's FAISS flat index
(``src/pipeline/retrieval/dense.py:15-178``): the corpus embedding matrix is
device-resident (optionally row-sharded over a mesh), queries are scored with
the fused Pallas matmul+top-k kernel, and hits are materialized from a JSONL
metadata manifest with the same ""/"NA" fallbacks for invalid indices
(``dense.py:122-125``).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdag_tpu.core.mesh import make_index_mesh, shard_rows
from sdag_tpu.datamodels import RetrievalBatch
from sdag_tpu.ops.topk import (approx_topk_matmul_int8,
                               fused_topk_matmul_int8, quantize_rows_int8,
                               quantize_rows_int8_residual,
                               rescored_topk_int8, topk_search)
from sdag_tpu.parallel.collectives import sharded_topk_search
from sdag_tpu.retrieval.retriever import Retriever, materialize_hits


from sdag_tpu.utils.mathutil import round_up as _round_up


class DenseIndex:
    """Flat exact inner-product index over normalized embeddings.

    Rows are padded to a multiple of (block_n * num_devices) and sharded
    along the 'index' mesh axis; search merges per-shard top-k over ICI.
    """

    def __init__(self, embeddings: np.ndarray, meta: List[Dict[str, Any]],
                 mesh=None, block_n: int = 1024,
                 dtype: jnp.dtype = jnp.float32,
                 search_mode: str = "approx",
                 int8_rescore: bool = True) -> None:
        if embeddings.ndim != 2:
            raise ValueError("embeddings must be [N, D]")
        if len(meta) != embeddings.shape[0]:
            raise ValueError("meta length must match embedding rows")
        if search_mode not in {"approx", "exact"}:
            raise ValueError(f"Unknown search_mode: {search_mode}")
        self.meta = meta
        self.valid_n = embeddings.shape[0]
        self.dim = embeddings.shape[1]
        self.block_n = block_n
        self.mesh = mesh if mesh is not None else make_index_mesh()
        self.n_shards = self.mesh.shape["index"]
        self.quantized = dtype == jnp.int8
        # "approx": matmul + lax.approx_max_k two-stage (TPU PartialReduce,
        # ~2.2x kernel QPS at >=0.99 recall@10; exact fallback off-TPU).
        # "exact": fused Pallas kernel, exact (score desc, index asc).
        self.search_mode = search_mode

        # max(., 1): an empty corpus still builds a 1-row padded index
        # whose searches return all -1/-inf instead of a 0-tile kernel
        # error (same guard as BM25Index)
        n_pad = _round_up(max(self.valid_n, 1), block_n * self.n_shards)
        padded = np.zeros((n_pad, self.dim), dtype=np.float32)
        padded[: self.valid_n] = np.asarray(embeddings, dtype=np.float32)
        self.resid = None
        self.resid_scales = None
        # rescore exists only on the approx path (the exact kernel scores
        # from the int8 base alone) — building residuals in exact mode
        # would double index HBM for arrays search() never reads
        self.int8_rescore = (bool(int8_rescore) and self.quantized
                             and search_mode == "approx")
        if bool(int8_rescore) and self.quantized and search_mode == "exact":
            print("[dense] Note: DENSE_INT8_RESCORE has no effect with "
                  "DENSE_SEARCH_MODE=exact (the exact kernel scores the "
                  "int8 base directly, ~0.98 recall); residuals are not "
                  "built. Use search_mode='approx' for rescored ~0.999 "
                  "recall.", flush=True)
        if self.int8_rescore:
            # int8 base + int8 residual: the coarse scan reads only the
            # base (1/4 of f32 HBM traffic) and candidates are rescored at
            # ~15-bit precision -> recall@10 ~1.0 at int8-scan speed.
            # Total index HBM equals bf16.
            qvals, scales, rvals, rscales = quantize_rows_int8_residual(
                padded)
            self.embeddings = shard_rows(jnp.asarray(qvals), self.mesh,
                                         "index")
            self.scales = shard_rows(jnp.asarray(scales), self.mesh, "index")
            self.resid = shard_rows(jnp.asarray(rvals), self.mesh, "index")
            self.resid_scales = shard_rows(jnp.asarray(rscales), self.mesh,
                                           "index")
        elif self.quantized:
            # pure int8: 4x less HBM than f32; recall@10 ~0.98 on
            # adversarial random data, higher on real embeddings
            qvals, scales = quantize_rows_int8(padded)
            self.embeddings = shard_rows(jnp.asarray(qvals), self.mesh,
                                         "index")
            self.scales = shard_rows(jnp.asarray(scales), self.mesh, "index")
        else:
            self.embeddings = shard_rows(jnp.asarray(padded, dtype=dtype),
                                         self.mesh, "index")
            self.scales = None

    # ------------------------------------------------------------- search
    def search(self, query_embeddings: np.ndarray, top_k: int
               ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k inner-product search.  Returns (indices [Q,k], scores [Q,k]);
        same return convention as the reference's ``search_index``."""
        q = jnp.asarray(np.asarray(query_embeddings, dtype=np.float32))
        if self.n_shards > 1:
            vals, idx = sharded_topk_search(
                q, self.embeddings, top_k, valid_n=self.valid_n,
                mesh=self.mesh, block_n=self.block_n, scales=self.scales,
                mode=self.search_mode, resid=self.resid,
                resid_scales=self.resid_scales)
        elif self.quantized:
            if self.search_mode == "approx" and self.int8_rescore:
                vals, idx = rescored_topk_int8(
                    q, self.embeddings, self.scales, self.resid,
                    self.resid_scales, top_k, valid_n=self.valid_n)
            elif self.search_mode == "approx":
                vals, idx = approx_topk_matmul_int8(
                    q, self.embeddings, self.scales, top_k,
                    valid_n=self.valid_n)
            else:
                vals, idx = fused_topk_matmul_int8(
                    q, self.embeddings, self.scales, top_k,
                    valid_n=self.valid_n, block_n=self.block_n,
                    interpret=jax.default_backend() != "tpu")
        else:
            vals, idx = topk_search(q, self.embeddings, top_k,
                                    valid_n=self.valid_n,
                                    block_n=self.block_n,
                                    mode=self.search_mode)
        return np.asarray(idx), np.asarray(vals)

    def materialize(self, indices: Sequence[Sequence[int]],
                    scores: Sequence[Sequence[float]]
                    ) -> Tuple[List[List[str]], List[List[str]], List[List[float]]]:
        """Turn raw (index, score) hits into texts/ids/scores with ""/"NA"
        fallbacks for invalid rows."""
        return materialize_hits(self.meta, indices, scores)

    # --------------------------------------------------------------- I/O
    def save(self, index_dir: str) -> None:
        """Persist as embeddings.npy + meta.jsonl (shard-manifest style)."""
        os.makedirs(index_dir, exist_ok=True)
        # always persist float32 (bf16/int8 are HBM storage choices, and
        # numpy round-trips ml_dtypes poorly)
        if self.quantized:
            emb = (np.asarray(self.embeddings)[: self.valid_n].astype(
                np.float32) * np.asarray(self.scales)[: self.valid_n, None])
            if self.resid is not None:
                emb = emb + (np.asarray(self.resid)[: self.valid_n].astype(
                    np.float32)
                    * np.asarray(self.resid_scales)[: self.valid_n, None])
        else:
            emb = np.asarray(
                self.embeddings[: self.valid_n].astype(jnp.float32))
        np.save(os.path.join(index_dir, "embeddings.npy"), emb)
        with open(os.path.join(index_dir, "meta.jsonl"), "w",
                  encoding="utf-8") as f:
            for m in self.meta:
                f.write(json.dumps(m, ensure_ascii=False) + "\n")
        with open(os.path.join(index_dir, "manifest.json"), "w") as f:
            json.dump({"n": self.valid_n, "dim": self.dim,
                       "block_n": self.block_n}, f)

    @classmethod
    def load(cls, index_dir: str, mesh=None, meta_path: Optional[str] = None,
             dtype: jnp.dtype = jnp.float32,
             search_mode: str = "approx",
             int8_rescore: bool = True) -> "DenseIndex":
        emb = np.load(os.path.join(index_dir, "embeddings.npy"))
        meta = load_meta_jsonl(meta_path or os.path.join(index_dir, "meta.jsonl"))
        manifest_path = os.path.join(index_dir, "manifest.json")
        block_n = 1024
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                block_n = json.load(f).get("block_n", 1024)
        return cls(emb, meta, mesh=mesh, block_n=block_n, dtype=dtype,
                   search_mode=search_mode, int8_rescore=int8_rescore)

    @classmethod
    def from_texts(cls, texts: List[str], ids: List[str], encoder,
                   mesh=None, batch_size: int = 64, block_n: int = 1024,
                   dtype: jnp.dtype = jnp.float32,
                   search_mode: str = "approx",
                   int8_rescore: bool = True) -> "DenseIndex":
        """Build the index by encoding passages (E5 'passage: ' rule lives in
        the encoder)."""
        emb = encoder.encode(texts, kind="passage", batch_size=batch_size)
        meta = [{"id": i, "text": t} for i, t in zip(ids, texts)]
        return cls(np.asarray(emb), meta, mesh=mesh, block_n=block_n,
                   dtype=dtype, search_mode=search_mode,
                   int8_rescore=int8_rescore)


def load_meta_jsonl(path: str) -> List[Dict[str, Any]]:
    if not os.path.exists(path):
        raise FileNotFoundError(f"Metadata jsonl not found at {path}")
    meta: List[Dict[str, Any]] = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                meta.append(json.loads(line))
    return meta


class DenseRetriever(Retriever):
    """Encode queries -> fused top-k search -> materialized hits."""

    def __init__(self, encoder, index: DenseIndex) -> None:
        self.encoder = encoder
        self.index = index

    def retrieve_batch(self, queries: Sequence[str], max_k_needed: int,
                       embed_batch_size: int) -> RetrievalBatch:
        q_embs = self.encoder.encode(list(queries), kind="query",
                                     batch_size=embed_batch_size)
        q_embs = np.asarray(q_embs, dtype=np.float32)
        indices, scores = self.index.search(q_embs, top_k=max_k_needed)
        texts, ids_, scs = self.index.materialize(indices, scores)
        return RetrievalBatch(q_embs=list(q_embs), docs_texts_full=texts,
                              ids_full=ids_, scores_full=scs)
