"""Hybrid retrieval: reciprocal-rank fusion of dense + sparse rankings.

Behavioral parity with ``src/pipeline/retrieval/hybrid.py:10-225``: k split
half/half with a seeded coin flip for odd k, RRF score 1/(k0+rank) with
k0=60, dedup by id (doc text as fallback key for missing/"NA" ids), and the
dense retriever's query embeddings kept on the fused batch.
"""

from __future__ import annotations

import random
from typing import List, Sequence, Tuple

from sdag_tpu.datamodels import RetrievalBatch
from sdag_tpu.retrieval.retriever import Retriever

RRF_K0 = 60


def split_k_between_sparse_and_dense(top_k: int, rng: random.Random) -> Tuple[int, int]:
    """k/2 each; for odd k a seeded coin flip decides who gets the extra."""
    k_half = top_k // 2
    if top_k % 2 == 0:
        return k_half, k_half
    if rng.random() < 0.5:
        return k_half + 1, k_half
    return k_half, k_half + 1


def _key_for(doc_id: str, doc_text: str) -> str:
    if doc_id is not None and doc_id not in ("", "NA"):
        return doc_id
    return doc_text


def rrf_fuse_one_query(
    sparse_docs: List[str], sparse_ids: List[str],
    dense_docs: List[str], dense_ids: List[str],
    k0: int = RRF_K0,
) -> Tuple[List[str], List[str], List[float]]:
    """Fuse two rankings by RRF score sum; ties by score descending."""
    sparse_rank = {}
    for i, (d, did) in enumerate(zip(sparse_docs, sparse_ids), start=1):
        sparse_rank.setdefault(_key_for(did, d), i)
    dense_rank = {}
    for i, (d, did) in enumerate(zip(dense_docs, dense_ids), start=1):
        dense_rank.setdefault(_key_for(did, d), i)

    rep = {}
    for d, did in list(zip(sparse_docs, sparse_ids)) + list(zip(dense_docs, dense_ids)):
        rep.setdefault(_key_for(did, d), (d, did))

    fused = []
    for key in set(sparse_rank) | set(dense_rank):
        score = 0.0
        if key in sparse_rank:
            score += 1.0 / (k0 + sparse_rank[key])
        if key in dense_rank:
            score += 1.0 / (k0 + dense_rank[key])
        doc, did = rep[key]
        fused.append((score, doc, did))

    fused.sort(key=lambda x: x[0], reverse=True)
    return ([d for _, d, _ in fused], [i for _, _, i in fused],
            [s for s, _, _ in fused])


def fuse_sparse_and_dense_batch(
    sparse_texts: List[List[str]], sparse_ids: List[List[str]],
    dense_texts: List[List[str]], dense_ids: List[List[str]],
    top_k: int, seed: int, k0: int = RRF_K0,
) -> Tuple[List[List[str]], List[List[str]], List[List[float]]]:
    rng = random.Random(seed)
    out_texts, out_ids, out_scores = [], [], []
    for s_docs, s_ids, d_docs, d_ids in zip(sparse_texts, sparse_ids,
                                            dense_texts, dense_ids):
        k_sparse, k_dense = split_k_between_sparse_and_dense(top_k, rng)
        docs, ids_, scores = rrf_fuse_one_query(
            s_docs[:k_sparse], s_ids[:k_sparse],
            d_docs[:k_dense], d_ids[:k_dense], k0=k0)
        out_texts.append(docs[:top_k])
        out_ids.append(ids_[:top_k])
        out_scores.append(scores[:top_k])
    return out_texts, out_ids, out_scores


class HybridRetriever(Retriever):
    """Runs dense and sparse children, fuses by RRF, keeps dense q_embs."""

    def __init__(self, dense_retriever: Retriever, sparse_retriever: Retriever,
                 seed: int, k0: int = RRF_K0) -> None:
        self.dense = dense_retriever
        self.sparse = sparse_retriever
        self.seed = seed
        self.k0 = k0

    def retrieve_batch(self, queries: Sequence[str], max_k_needed: int,
                       embed_batch_size: int) -> RetrievalBatch:
        dense = self.dense.retrieve_batch(queries, max_k_needed, embed_batch_size)
        sparse = self.sparse.retrieve_batch(queries, max_k_needed, embed_batch_size)
        texts, ids_, scores = fuse_sparse_and_dense_batch(
            sparse.docs_texts_full, sparse.ids_full,
            dense.docs_texts_full, dense.ids_full,
            top_k=max_k_needed, seed=self.seed, k0=self.k0)
        return RetrievalBatch(q_embs=dense.q_embs, docs_texts_full=texts,
                              ids_full=ids_, scores_full=scores)
