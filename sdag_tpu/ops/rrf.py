"""Device-side reciprocal-rank fusion (hybrid retrieval north-star item).

Fuses dense and sparse rankings as a small jitted op over global corpus
indices — no host round-trip between the two searches and the fused
ranking.  Semantics match the host fuser (``retrieval/hybrid.py``):
RRF score sum 1/(k0+rank), dedup by doc identity (global index here),
order (score desc, sparse-candidates-first stable), invalid slots
(index < 0, Lucene no-match padding) excluded.
Reference behavior: ``src/pipeline/retrieval/hybrid.py:30-105``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BIG = jnp.int32(1 << 30)


def _first_rank(cands: jax.Array, ranked: jax.Array, k_take: jax.Array):
    """For each candidate, its 1-based rank in `ranked` (only the first
    k_take slots count), or 0 when absent.  cands: [Q, T]; ranked: [Q, K];
    k_take: [Q]."""
    Q, K = ranked.shape
    pos_iota = jnp.arange(K, dtype=jnp.int32)[None, None, :]        # 1,1,K
    eq = (ranked[:, None, :] == cands[:, :, None]) \
        & (ranked[:, None, :] >= 0) \
        & (pos_iota < k_take[:, None, None])                         # Q,T,K
    pos = jnp.min(jnp.where(eq, pos_iota, BIG), axis=-1)             # Q,T
    has = jnp.any(eq, axis=-1)
    return jnp.where(has, pos + 1, 0)


@functools.partial(jax.jit, static_argnames=("k0", "top_k"))
def rrf_fuse_topk(sparse_idx: jax.Array, dense_idx: jax.Array,
                  k_sparse: jax.Array, k_dense: jax.Array,
                  k0: int = 60, top_k: int = 10):
    """Fuse per-query rankings of global corpus indices.

    sparse_idx/dense_idx: [Q, K] int32, -1 = no hit; k_sparse/k_dense: [Q]
    per-query rank cutoffs (the seeded odd-k split happens on host).
    Returns (fused_idx [Q, top_k] with -1 padding, fused_scores [Q, top_k]
    with -inf padding).
    """
    Q, Ks = sparse_idx.shape
    Kd = dense_idx.shape[1]
    s_cut = jnp.minimum(jnp.asarray(k_sparse, jnp.int32), Ks)
    d_cut = jnp.minimum(jnp.asarray(k_dense, jnp.int32), Kd)

    cand = jnp.concatenate([sparse_idx, dense_idx], axis=1)          # Q,T
    T = Ks + Kd
    slot = jnp.arange(T, dtype=jnp.int32)[None, :]
    in_window = jnp.where(slot < Ks, slot < s_cut[:, None],
                          (slot - Ks) < d_cut[:, None])
    valid = (cand >= 0) & in_window

    r_s = _first_rank(cand, jnp.where(
        jnp.arange(Ks)[None, :] < s_cut[:, None], sparse_idx, -1), s_cut)
    r_d = _first_rank(cand, jnp.where(
        jnp.arange(Kd)[None, :] < d_cut[:, None], dense_idx, -1), d_cut)
    score = (jnp.where(r_s > 0, 1.0 / (k0 + r_s), 0.0)
             + jnp.where(r_d > 0, 1.0 / (k0 + r_d), 0.0))

    # dedup: keep only the first slot holding each index
    same = (cand[:, :, None] == cand[:, None, :]) & valid[:, None, :]
    first_pos = jnp.min(jnp.where(same, slot[:, None, :], BIG), axis=-1)
    keep = valid & (first_pos == slot)

    score = jnp.where(keep, score, -jnp.inf)
    order = jnp.argsort(-score, axis=-1, stable=True)[:, :top_k]
    fused_scores = jnp.take_along_axis(score, order, axis=1)
    fused_idx = jnp.where(jnp.isfinite(fused_scores),
                          jnp.take_along_axis(cand, order, axis=1), -1)
    return fused_idx, fused_scores
