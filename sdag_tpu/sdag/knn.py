"""Document-document KNN for neighbor windows (DOC_NEIGHBORS_K).

Batched device op replacing the reference's numpy argsort loop
(``SDAG.py:14-65``): embed docs (E5 'passage:' rule), cosine sims on the MXU,
neighbors per doc sorted most-similar-first with self excluded.  Empty /
whitespace docs are skipped exactly like the reference.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np


def knn_from_embeddings(emb: np.ndarray, k_neighbors: int) -> List[List[int]]:
    """Neighbors per row of a normalized embedding matrix [N, D]."""
    n = emb.shape[0]
    if n <= 1 or k_neighbors <= 0:
        return [[] for _ in range(n)]
    k = min(k_neighbors, n - 1)
    sims = jnp.asarray(emb) @ jnp.asarray(emb).T
    # exclude self on the diagonal, then top-k per row
    sims = sims - 2.0 * jnp.eye(n, dtype=sims.dtype)
    _, idx = jax.lax.top_k(sims, k)
    return [list(map(int, row)) for row in np.asarray(idx)]


def compute_doc_knn_for_docs(encoder, docs: List[str], k_neighbors: int
                             ) -> List[List[int]]:
    """Reference-contract wrapper (``SDAG.py:14``): returns one neighbor list
    per input doc; empty docs get [] and are excluded from others' lists."""
    n = len(docs)
    if k_neighbors <= 0 or n == 0:
        return [[] for _ in range(n)]
    nonempty = [(i, d) for i, d in enumerate(docs) if d and d.strip()]
    if len(nonempty) <= 1:
        return [[] for _ in range(n)]
    idxs = [i for i, _ in nonempty]
    emb = encoder.encode([d for _, d in nonempty], kind="passage")
    local = knn_from_embeddings(emb, k_neighbors)
    out: List[List[int]] = [[] for _ in range(n)]
    for row, i_full in enumerate(idxs):
        out[i_full] = [idxs[j] for j in local[row]]
    return out
