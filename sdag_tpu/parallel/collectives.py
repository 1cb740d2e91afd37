"""Sharded-index collectives: per-shard top-k + ICI all-gather merge.

TPU-native replacement for FAISS's single-node search when the corpus is
sharded over devices (SURVEY.md §2.10): each shard runs the fused
matmul+top-k kernel on its rows, candidates ride the ICI via
``jax.lax.all_gather``, and the merge is exactly order-stable
(score desc, global index asc) so sharded results are bit-identical to a
single-device exact scan.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sdag_tpu.ops.topk import (approx_topk_matmul_int8,
                               fused_topk_matmul_int8, merge_topk,
                               rescored_topk_int8, topk_search)


def _gather_merge(vals, idx, row0, k: int, axis: str, hit=None):
    """The ONE sentinel/all-gather/merge convention every sharded engine
    shares: map per-shard (vals, idx) to global candidates (real slots
    keep their score, empty slots become (-inf, INT_MAX)), all-gather
    along the candidate axis, merge (score desc, global index asc), and
    map still-empty slots to -1.  Changing the convention here changes
    all engines in lockstep (CLAUDE.md BM25 invariant).

    hit: bool [Q, k] marking real candidates; default idx >= 0 (the
    dense/postings contract); the scan engine passes vals > 0 (docs with
    no query-term match score 0 there)."""
    if hit is None:
        hit = idx >= 0
    gvals = jnp.where(hit, vals, -jnp.inf)
    gidx = jnp.where(hit, idx + row0, jnp.iinfo(jnp.int32).max)
    vals_all = jax.lax.all_gather(gvals, axis, axis=1, tiled=True)
    gidx_all = jax.lax.all_gather(gidx, axis, axis=1, tiled=True)
    mv, mi = merge_topk(vals_all, gidx_all, k)
    return mv, jnp.where(jnp.isneginf(mv), -1, mi)


def sharded_topk_search(queries: jax.Array, corpus: jax.Array, k: int,
                        valid_n: int, mesh: Mesh, axis: str = "index",
                        use_pallas: bool | None = None,
                        block_n: int = 1024, scales=None,
                        mode: str = "exact", resid=None, resid_scales=None
                        ) -> Tuple[jax.Array, jax.Array]:
    """Top-k over a row-sharded corpus.

    queries: [Q, D] replicated; corpus: [N_pad, D] sharded on rows along
    `axis` (N_pad divisible by the axis size); valid_n: number of real rows.
    With `scales` [N_pad], the corpus is int8-quantized (per-row scales).
    mode="exact" runs the fused kernel per shard (bit-identical to a
    single-device stable scan); mode="approx" runs the approx_max_k
    two-stage per shard (each shard's candidates cover its local top-k at
    >=0.99 recall, so the merged result keeps the same recall).
    Returns replicated (scores [Q, k], global indices [Q, k]).
    """
    if resid is not None or resid_scales is not None:
        # guard every incomplete combination, not just mode: resid with
        # scales=None would fall into the f32 branch below and silently
        # drop the residuals the caller paid HBM for
        if mode != "approx":
            raise ValueError(
                "resid/resid_scales require mode='approx': the exact int8 "
                "kernel scores the base alone, so a silent fall-through "
                "would return ~0.98-recall results while the caller paid "
                "HBM for the ~1.0 rescored path")
        if scales is None or resid is None or resid_scales is None:
            raise ValueError(
                "the rescored path needs ALL of scales/resid/resid_scales "
                "(int8 base + int8 residual, per-row scales); a partial "
                "set would silently score the base alone")
    n_pad = corpus.shape[0]
    n_shards = mesh.shape[axis]
    shard_rows = n_pad // n_shards

    def finish(vals, idx, row0):
        return _gather_merge(vals, idx, row0, k, axis)

    if scales is None:
        def local_search(q, c_shard):
            shard_id = jax.lax.axis_index(axis)
            row0 = shard_id * shard_rows
            local_valid = jnp.clip(valid_n - row0, 0, shard_rows)
            vals, idx = topk_search(q, c_shard, k, valid_n=local_valid,
                                    use_pallas=use_pallas, block_n=block_n,
                                    mode=mode)
            return finish(vals, idx, row0)

        fn = shard_map(
            local_search, mesh=mesh,
            in_specs=(P(), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(queries, corpus)

    if resid is not None and mode == "approx":
        # int8 + residual rescore per shard (recall ~1.0 at int8-scan cost)
        def local_search_i8r(q, c_shard, s_shard, r_shard, rs_shard):
            shard_id = jax.lax.axis_index(axis)
            row0 = shard_id * shard_rows
            local_valid = jnp.clip(valid_n - row0, 0, shard_rows)
            vals, idx = rescored_topk_int8(q, c_shard, s_shard, r_shard,
                                           rs_shard, k,
                                           valid_n=local_valid)
            return finish(vals, idx, row0)

        fn = shard_map(
            local_search_i8r, mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(queries, corpus, scales, resid, resid_scales)

    def local_search_i8(q, c_shard, s_shard):
        shard_id = jax.lax.axis_index(axis)
        row0 = shard_id * shard_rows
        local_valid = jnp.clip(valid_n - row0, 0, shard_rows)
        if mode == "approx":
            vals, idx = approx_topk_matmul_int8(q, c_shard, s_shard, k,
                                                valid_n=local_valid)
        else:
            interp = jax.default_backend() != "tpu"
            vals, idx = fused_topk_matmul_int8(q, c_shard, s_shard, k,
                                               block_n=block_n,
                                               valid_n=local_valid,
                                               interpret=interp)
        return finish(vals, idx, row0)

    fn = shard_map(
        local_search_i8, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(queries, corpus, scales)


def sharded_bm25_topk(term_ids: jax.Array, impacts: jax.Array,
                      q_terms: jax.Array, q_weights: jax.Array, k: int,
                      valid_n: int, mesh: Mesh, axis: str = "index",
                      block_n: int = 512, use_pallas: bool | None = None
                      ) -> Tuple[jax.Array, jax.Array]:
    """Exact BM25 top-k over row-sharded packed postings (mirrors
    ``sharded_topk_search``; SURVEY §2.10 / VERDICT r1 item 6).

    term_ids/impacts: [N_pad, T] sharded on rows along `axis`; queries
    replicated.  Per-shard impact scoring + top-k, candidates all-gathered
    over ICI, merged (score desc, global index asc).  Docs with no query
    term match score 0 in the kernel and are mapped to (-inf, -1) exactly
    like the single-device path (Lucene returns only matching docs).
    """
    from sdag_tpu.ops.bm25 import bm25_topk_dispatch

    n_pad = term_ids.shape[0]
    n_shards = mesh.shape[axis]
    shard_rows_n = n_pad // n_shards

    def local_search(qt, qw, t_shard, i_shard):
        shard_id = jax.lax.axis_index(axis)
        row0 = shard_id * shard_rows_n
        local_valid = jnp.clip(valid_n - row0, 0, shard_rows_n)
        vals, idx = bm25_topk_dispatch(t_shard, i_shard, qt, qw, k,
                                       valid_n=local_valid, block_n=block_n,
                                       use_pallas=use_pallas)
        return _gather_merge(vals, idx, row0, k, axis, hit=vals > 0.0)

    fn = shard_map(local_search, mesh=mesh,
                   in_specs=(P(), P(), P(axis), P(axis)),
                   out_specs=(P(), P()),
                   check_vma=False)
    return fn(q_terms, q_weights, term_ids, impacts)


def sharded_bm25_postings_topk(post_docs: jax.Array, post_imps: jax.Array,
                               offsets: jax.Array, q_terms: jax.Array,
                               q_weights: jax.Array, k: int, w_slots,
                               mesh: Mesh, rows_per_shard: int,
                               window: int = 512, axis: str = "index"
                               ) -> Tuple[jax.Array, jax.Array]:
    """Exact BM25 top-k over per-shard CSR postings (the O(sum df)
    engine): each shard owns the postings of its doc-row block with LOCAL
    doc ids, runs ``bm25_postings_topk``, maps ids to global with its row
    offset, and candidates are all-gathered + merged like the dense path.

    post_docs/post_imps: [n_shards, P_pad] row-sharded; offsets:
    [n_shards, V+1] row-sharded; shard s covers global doc rows
    [s*rows_per_shard, (s+1)*rows_per_shard) — uniform by construction
    (BM25Index pads N to a multiple of n_shards*block_n).
    """
    from sdag_tpu.ops.bm25 import bm25_postings_topk

    def local(qt, qw, docs, imps, offs):
        vals, idx = bm25_postings_topk(docs[0], imps[0], offs[0], qt, qw,
                                       k, w_slots=w_slots, window=window)
        shard_id = jax.lax.axis_index(axis)
        row0 = shard_id * rows_per_shard
        return _gather_merge(vals, idx, row0, k, axis)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(), P(), P(axis), P(axis), P(axis)),
                   out_specs=(P(), P()),
                   check_vma=False)
    return fn(q_terms, q_weights, post_docs, post_imps, offsets)


def sharded_bm25_hybrid_topk(post_docs: jax.Array, post_imps: jax.Array,
                             offsets: jax.Array, heavy_cols: jax.Array,
                             heavy_rows: jax.Array, q_terms: jax.Array,
                             q_weights: jax.Array, q_heavy_idx: jax.Array,
                             k: int, w_slots, mesh: Mesh,
                             rows_per_shard: int, window: int = 512,
                             axis: str = "index"
                             ) -> Tuple[jax.Array, jax.Array]:
    """Sharded heavy/light hybrid BM25 (ops/bm25.py bm25_hybrid_topk):
    each shard scores its doc-row block — heavy terms against its dense
    sidecar slice, tail terms against its local CSR — then candidates
    are all-gathered + merged like the dense path.
    heavy_cols: [n_shards, rows_per_shard, H_pad] row-sharded;
    heavy_rows: [n_shards, H_pad, rows_per_shard] (same impacts,
    term-major for the matmul leg)."""
    from sdag_tpu.ops.bm25 import bm25_hybrid_topk

    def local(qt, qw, qh, docs, imps, offs, hcols, hrows):
        vals, idx = bm25_hybrid_topk(docs[0], imps[0], offs[0], hcols[0],
                                     hrows[0], qt, qw, qh, k,
                                     w_slots=w_slots, window=window)
        shard_id = jax.lax.axis_index(axis)
        row0 = shard_id * rows_per_shard
        return _gather_merge(vals, idx, row0, k, axis)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(), P(), P(), P(axis), P(axis), P(axis),
                             P(axis), P(axis)),
                   out_specs=(P(), P()),
                   check_vma=False)
    return fn(q_terms, q_weights, q_heavy_idx, post_docs, post_imps,
              offsets, heavy_cols, heavy_rows)

