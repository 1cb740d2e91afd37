"""Impact-scored BM25 over device-packed postings.

TPU-native replacement for Lucene/Pyserini BM25 scoring
(``src/pipeline/retrieval/sparse.py:36-108``): each document is packed as
padded (term_id, impact) pairs where impact(t, d) is the full per-term BM25
contribution precomputed at index-build time; query scoring is then a sparse
dot product — a Pallas kernel streams doc tiles through VMEM, matches query
terms on the VPU, and feeds the same running top-k merge as dense search.

BM25 variant: Lucene's (as Anserini/Pyserini uses) —
idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
tf_norm = tf / (tf + k1 * (1 - b + b * dl/avgdl)), defaults k1=0.9, b=0.4.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdag_tpu.ops.topk import NEG_INF, _INT_MAX, _merge_topk_tile

PAD_TERM = -1


def bm25_scores_xla(term_ids: jax.Array, impacts: jax.Array,
                    q_terms: jax.Array, q_weights: jax.Array) -> jax.Array:
    """Reference scoring (XLA): [Q, N] = sum of impacts where doc term
    matches a query term, weighted by query-term multiplicity.

    term_ids: [N, Lp] int32 (PAD_TERM padded); impacts: [N, Lp] f32;
    q_terms: [Q, T] int32 (PAD_TERM padded); q_weights: [Q, T] f32.
    """
    match = (term_ids[None, :, :, None] == q_terms[:, None, None, :]) \
        & (q_terms[:, None, None, :] != PAD_TERM)
    contrib = impacts[None, :, :, None] * q_weights[:, None, None, :]
    return jnp.sum(jnp.where(match, contrib, 0.0), axis=(2, 3))


def _bm25_topk_kernel(valid_ref, qt_ref, qw_ref, terms_ref, impacts_ref,
                      out_vals_ref, out_idx_ref, vals_scratch, idx_scratch,
                      *, k: int, block_n: int, n_qterms: int):
    """Grid: (num_n_tiles,).  Scores one doc tile against all queries and
    merges into the running top-k (same merge as ops/topk.py)."""
    j = pl.program_id(0)
    num_tiles = pl.num_programs(0)
    valid_n = valid_ref[0]

    @pl.when(j == 0)
    def _init():
        vals_scratch[:] = jnp.full_like(vals_scratch, NEG_INF)
        idx_scratch[:] = jnp.full_like(idx_scratch, _INT_MAX)

    qp = vals_scratch.shape[0]
    bn = terms_ref.shape[0]
    lp = terms_ref.shape[1]

    # scores [qp, block_n]: static loops over query-term slots and doc-term
    # chunks.  Tiles are transposed once so every 3D intermediate keeps
    # block_n on the minor (lane) axis — [qp, CH, block_n] at CH=16 is
    # ~1MB and tiles cleanly; the naive [qp, block_n, Lp] form needed 50MB
    # of scoped VMEM and a 32-minor layout spilled ~250MB of registers.
    termsT = terms_ref[:].T      # [Lp, block_n] int32
    impactsT = impacts_ref[:].T  # [Lp, block_n] f32
    CH = min(16, lp)
    scores = jnp.zeros((qp, bn), jnp.float32)
    for t in range(n_qterms):
        qt = qt_ref[:, t].reshape(qp, 1)          # [qp, 1]
        qw = qw_ref[:, t].reshape(qp, 1)
        contrib = jnp.zeros_like(scores)
        for c in range(0, lp, CH):
            # lax.slice (static) — fancy indexing lowers to an unsupported
            # gather under Mosaic; clamp the tail chunk when CH doesn't
            # divide lp
            hi = min(c + CH, lp)
            t_c = jax.lax.slice(termsT, (c, 0), (hi, bn))
            i_c = jax.lax.slice(impactsT, (c, 0), (hi, bn))
            hit = t_c[None, :, :] == qt[:, :, None]
            contrib = contrib + jnp.sum(
                jnp.where(hit, i_c[None, :, :], 0.0), axis=1)
        scores = scores + jnp.where(qt != PAD_TERM, qw * contrib, 0.0)

    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    gcol = col + j * block_n
    _merge_topk_tile(scores, gcol, valid_n, vals_scratch, idx_scratch, k)

    @pl.when(j == num_tiles - 1)
    def _flush():
        out_vals_ref[:] = vals_scratch[:]
        out_idx_ref[:] = jnp.where(idx_scratch[:] == _INT_MAX, -1,
                                   idx_scratch[:])


from sdag_tpu.utils.mathutil import round_up as _round_up


@functools.partial(jax.jit, static_argnames=("k", "block_n", "interpret"))
def bm25_topk(term_ids: jax.Array, impacts: jax.Array, q_terms: jax.Array,
              q_weights: jax.Array, k: int, valid_n=None,
              block_n: int = 512, interpret: bool = False
              ) -> Tuple[jax.Array, jax.Array]:
    """Fused BM25 scoring + top-k.  Returns (scores [Q,k], doc ids [Q,k]);
    rows with no match get score 0 ranked naturally (Lucene returns only
    matches; callers pad with ""/"NA"/-inf like the reference)."""
    n, lp = term_ids.shape
    q, t = q_terms.shape
    if valid_n is None:
        valid_n = n
    valid_arr = jnp.asarray(valid_n, jnp.int32).reshape((1,))

    qp = _round_up(max(q, 8), 8)
    k_pad = _round_up(max(k, 128), 128)
    n_pad = _round_up(n, block_n)
    if qp != q:
        q_terms = jnp.pad(q_terms, ((0, qp - q), (0, 0)),
                          constant_values=PAD_TERM)
        q_weights = jnp.pad(q_weights, ((0, qp - q), (0, 0)))
    if n_pad != n:
        term_ids = jnp.pad(term_ids, ((0, n_pad - n), (0, 0)),
                           constant_values=PAD_TERM)
        impacts = jnp.pad(impacts, ((0, n_pad - n), (0, 0)))

    num_tiles = n_pad // block_n
    grid_spec = pl.GridSpec(
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((qp, t), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qp, t), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, lp), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, lp), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qp, k_pad), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qp, k_pad), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((qp, k_pad), jnp.float32),
            pltpu.VMEM((qp, k_pad), jnp.int32),
        ],
    )
    out_vals, out_idx = pl.pallas_call(
        functools.partial(_bm25_topk_kernel, k=k, block_n=block_n,
                          n_qterms=t),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((qp, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((qp, k_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(valid_arr, q_terms, q_weights, term_ids, impacts)
    return out_vals[:q, :k], out_idx[:q, :k]


def bm25_topk_dispatch(term_ids, impacts, q_terms, q_weights, k,
                       valid_n=None, block_n: int = 512,
                       use_pallas: bool | None = None):
    """Pallas on TPU; XLA scoring + lax.top_k elsewhere."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return bm25_topk(term_ids, impacts, q_terms, q_weights, k,
                         valid_n=valid_n, block_n=block_n)
    scores = bm25_scores_xla(term_ids, impacts, q_terms, q_weights)
    if valid_n is not None:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < valid_n, scores, NEG_INF)
    vals, idx = jax.lax.top_k(scores, k)
    # k > valid_n: -inf (masked/padded) slots report -1, matching the
    # Pallas kernel's flush and the postings engine's contract
    idx = jnp.where(jnp.isneginf(vals), -1, idx)
    return vals, idx.astype(jnp.int32)


# ------------------------------------------------- postings (CSR) engine
#
# The dense-scan kernel above compares every doc term against every query
# term: O(N * Lp * T) VPU work per query batch, independent of how rare the
# query terms are.  Lucene itself never does that — it walks the postings
# lists of the query's terms, O(sum df(t)).  This engine is the TPU-native
# restatement of that walk (reference: Pyserini/Lucene search,
# ``src/pipeline/retrieval/sparse.py:36-108``):
#
#   * postings live in HBM as CSR: docs [P] / impacts [P] ordered by term,
#     offsets [V+1] — the same triples Lucene keeps per segment;
#   * each query-term SLOT s reads its list with w_slots[s] windowed
#     contiguous gathers of S entries — the per-slot counts are static and
#     sized from the actual dfs of the batch's terms (callers sort each
#     query's terms by df descending, so slot s's windows only need to
#     cover the batch's s-th-largest df, NOT the global max df: per-query
#     cost is O(sum df of the query's own terms), Lucene's cost model,
#     even on Zipfian corpora where one ubiquitous term would otherwise
#     inflate every query);
#   * per-doc totals are formed WITHOUT scatter (TPU scatter-add is
#     serial): candidates are sorted by doc id, and since a doc can appear
#     at most once per query term, a run has length <= T — T static shifted
#     adds collapse each run onto its first element;
#   * lax.top_k over run totals; sorted-by-doc order makes equal scores
#     resolve to the smaller doc id — the same (score desc, id asc)
#     tie-break as the scan kernel.
#
# Exact for every doc (no truncation): each slot's windows cover that
# slot's max df across the batch.

_DOC_SENTINEL = jnp.iinfo(jnp.int32).max


def _postings_runs(post_docs, post_imps, offsets, q_terms, q_weights,
                   w_slots: Tuple[int, ...], window: int, skip_mask=None,
                   heavy_cols=None, w_dense=None):
    """Shared candidate walk: windowed CSR gathers -> doc-sorted
    candidates with per-run (per-doc) summed contributions.

    Returns (docs_s [Q, M], run_scores [Q, M]) where run_scores holds the
    doc's summed contribution at the run start and NEG_INF elsewhere, or
    None when no slot has windows.  skip_mask [Q, T] bool marks slots to
    exclude (their terms are scored elsewhere — the heavy/dense path).

    With heavy_cols [N_pad, H] + w_dense [Q, H], each candidate's heavy
    contribution w_dense[q]·heavy_cols[doc] is gathered PRE-sort (chunked
    contiguous-row gathers fused with the windowed walk, ~0.03 ms at
    M=5120) and carried through the sort as a third payload; run_scores
    then hold the FULL totals.  Gathering post-sort instead hit a
    pathological XLA lowering: 4.0 ms for the identical [Q, M] row
    gather when its indices came from the sort output.
    """
    qn, t = q_terms.shape
    p_pad = post_docs.shape[0]
    safe_t = jnp.clip(q_terms, 0, offsets.shape[0] - 2)
    starts = offsets[safe_t]                      # [Q, T]
    lens = offsets[safe_t + 1] - starts
    lens = jnp.where(q_terms == PAD_TERM, 0, lens)
    if skip_mask is not None:
        lens = jnp.where(skip_mask, 0, lens)

    # windowed contiguous gathers -> candidates [Q, M],
    # M = sum(w_slots)*window.  Slots are grouped by window count (pow2
    # bucketing upstream keeps the group count tiny) and each group runs
    # ONE vectorized [Q, G, ws*window] gather — T separate gathers ran at
    # ~half the throughput.
    groups: dict = {}
    for s, ws in enumerate(w_slots):
        if ws > 0:
            groups.setdefault(ws, []).append(s)
    if not groups:
        return None
    docs_parts, contrib_parts = [], []
    for ws, slots in sorted(groups.items()):
        st = starts[:, slots]                       # [Q, G] (static cols)
        ln = lens[:, slots]
        qw = q_weights[:, slots]
        span = jax.lax.iota(jnp.int32, ws * window)
        pos = st[:, :, None] + span[None, None, :]
        valid = span[None, None, :] < ln[:, :, None]
        pos = jnp.clip(pos, 0, p_pad - 1)
        g = len(slots) * ws * window
        docs_parts.append(
            jnp.where(valid, post_docs[pos], _DOC_SENTINEL).reshape(qn, g))
        contrib_parts.append(
            jnp.where(valid, post_imps[pos] * qw[:, :, None],
                      0.0).reshape(qn, g))
    docs = jnp.concatenate(docs_parts, axis=1) if len(docs_parts) > 1 \
        else docs_parts[0]
    contrib = (jnp.concatenate(contrib_parts, axis=1)
               if len(contrib_parts) > 1
               else contrib_parts[0]).astype(jnp.float32)
    m = docs.shape[1]

    if heavy_cols is not None:
        n_pad = heavy_cols.shape[0]
        sd = jnp.clip(docs, 0, n_pad - 1)
        parts = []
        for s in range(0, m, 1024):
            rows = heavy_cols[sd[:, s:s + 1024]]     # [Q, chunk, H]
            parts.append(jnp.einsum("qmh,qh->qm", rows, w_dense,
                                    precision=jax.lax.Precision.HIGHEST))
        dense_c = (jnp.concatenate(parts, axis=1) if len(parts) > 1
                   else parts[0])
        # sort candidates by doc id; payloads: light contrib + the doc's
        # heavy total (identical for every entry of a run)
        docs_s, contrib_s, dense_s = jax.lax.sort(
            (docs, contrib, dense_c), dimension=1, num_keys=1,
            is_stable=True)
    else:
        # sort candidates by doc id (payload: contrib); stable so the
        # float-add order within a run is deterministic
        docs_s, contrib_s = jax.lax.sort((docs, contrib), dimension=1,
                                         num_keys=1, is_stable=True)
        dense_s = None
    # collapse runs (length <= #active slots) onto their first element
    n_active = sum(1 for ws in w_slots if ws > 0)
    total = contrib_s
    for j in range(1, min(n_active, m)):
        same = jax.lax.slice_in_dim(docs_s, j, m, axis=1) == \
            jax.lax.slice_in_dim(docs_s, 0, m - j, axis=1)
        shifted = jax.lax.slice_in_dim(contrib_s, j, m, axis=1)
        total = total.at[:, : m - j].add(jnp.where(same, shifted, 0.0))
    if dense_s is not None:
        total = total + dense_s
    is_start = jnp.concatenate(
        [jnp.ones((qn, 1), bool),
         docs_s[:, 1:] != docs_s[:, :-1]], axis=1)
    run_scores = jnp.where(is_start & (docs_s != _DOC_SENTINEL),
                           total, NEG_INF)
    return docs_s, run_scores


@functools.partial(jax.jit, static_argnames=("k", "w_slots", "window"))
def bm25_postings_topk(post_docs: jax.Array, post_imps: jax.Array,
                       offsets: jax.Array, q_terms: jax.Array,
                       q_weights: jax.Array, k: int,
                       w_slots: int | Tuple[int, ...],
                       window: int = 512
                       ) -> Tuple[jax.Array, jax.Array]:
    """Exact BM25 top-k via device CSR postings.

    post_docs/post_imps: [P_pad] int32/f32 (term-major CSR, padded);
    offsets: [V+1] int32; q_terms: [Q, T] (PAD_TERM padded);
    q_weights: [Q, T] f32 (term multiplicity); w_slots: per-slot window
    counts (tuple of length T; slots with 0 windows contribute nothing) —
    w_slots[s]*window must be >= the max df of any term placed in slot s.
    An int w_slots means that count for every slot (global-max sizing).
    Returns (scores [Q, k], doc ids [Q, k]); empty slots are (-inf, -1).
    """
    qn, t = q_terms.shape
    if isinstance(w_slots, int):
        w_slots = (w_slots,) * t
    if len(w_slots) != t:
        raise ValueError(f"w_slots has {len(w_slots)} entries for {t} slots")
    runs = _postings_runs(post_docs, post_imps, offsets, q_terms, q_weights,
                          w_slots, window)
    if runs is None:
        return (jnp.full((qn, k), NEG_INF, jnp.float32),
                jnp.full((qn, k), -1, jnp.int32))
    docs_s, run_scores = runs
    if docs_s.shape[1] < k:            # fewer candidates than k slots
        pad = k - docs_s.shape[1]
        docs_s = jnp.pad(docs_s, ((0, 0), (0, pad)),
                         constant_values=_DOC_SENTINEL)
        run_scores = jnp.pad(run_scores, ((0, 0), (0, pad)),
                             constant_values=NEG_INF)
    vals, posk = jax.lax.top_k(run_scores, k)
    idx = jnp.take_along_axis(docs_s, posk, axis=1)
    idx = jnp.where(jnp.isneginf(vals), -1, idx)
    return vals, jnp.where(idx == _DOC_SENTINEL, -1, idx)


def bm25_hybrid_topk(post_docs: jax.Array, post_imps: jax.Array,
                     offsets: jax.Array, heavy_cols: jax.Array,
                     heavy_rows: jax.Array, q_terms: jax.Array,
                     q_weights: jax.Array, q_heavy_idx: jax.Array, k: int,
                     w_slots: Tuple[int, ...], window: int = 512
                     ) -> Tuple[jax.Array, jax.Array]:
    """Exact BM25 top-k with heavy terms on the MXU, tail terms on CSR.

    On Zipfian corpora a handful of ubiquitous terms dominate Σdf: their
    postings walks blow the candidate sort (measured 58 QPS at 860k
    candidates/query vs 212k QPS at 4k).  Lucene prunes those with
    BlockMax-WAND; the TPU-native restatement is to score them DENSELY —
    heavy_cols [N_pad, H_pad] f32 holds each heavy term's full impact
    column (built once at index time), so a batch's heavy top-k is
    inner-product search over query-weight vectors, and light candidates
    pick up their heavy contribution via chunked contiguous-row gathers
    fused into the postings walk PRE-sort, carried through the sort as a
    payload (see _postings_runs — post-sort the same gather lowered
    pathologically).  Tail terms keep the O(sum df) postings walk.

    Exactness: total(d) = dense(d) + light(d), and every light-matching
    doc is a candidate, so the true top-k is contained in
    (light candidates) ∪ (top-k of dense scores): a doc outside both has
    total = dense(d) below k docs whose totals are >= their own dense
    scores.  Ties resolve (score desc, id asc) like the scan kernel
    because light contributions are strictly positive.

    heavy_cols [N_pad, H_pad] (doc-major, feeds the candidate row
    gathers) and heavy_rows [H_pad, N_pad] (term-major, feeds the
    matmul) hold the SAME impacts twice: one buffer serving both roles
    made XLA's layout assignment quadruple the batch cost (4.4 vs
    1.0 ms measured — the gather forces a layout the matmul then pays
    to undo every batch), so the build spends 2x sidecar HBM instead.

    q_heavy_idx [Q, T]: row of the slot's term in heavy_cols' minor axis,
    or -1 when the term is light/PAD.  w_slots must cover the LIGHT dfs
    only.  Returns (scores [Q,k], doc ids [Q,k]); empty = (-inf, -1).
    """
    return _bm25_hybrid_topk(post_docs, post_imps, offsets, heavy_cols,
                             heavy_rows, q_terms, q_weights, q_heavy_idx,
                             k=k, w_slots=tuple(w_slots), window=window)


@functools.partial(jax.jit, static_argnames=("k", "w_slots", "window"))
def _bm25_hybrid_topk(post_docs, post_imps, offsets, heavy_cols,
                      heavy_rows, q_terms, q_weights, q_heavy_idx, k: int,
                      w_slots: Tuple[int, ...], window: int):
    qn, t = q_terms.shape
    n_pad, h_pad = heavy_cols.shape
    if len(w_slots) != t:
        raise ValueError(f"w_slots has {len(w_slots)} entries for {t} slots")

    # heavy-term weights per query: one-hot slot->sidecar-row, so the
    # dense leg is inner-product search with W as the "query embedding".
    # HIGHEST keeps f32 accuracy (engine-equality tests pin rtol<=1e-5).
    oh = jax.nn.one_hot(q_heavy_idx, h_pad,
                        dtype=jnp.float32)            # [Q, T, H]; -1 -> 0s
    w_dense = jnp.einsum("qt,qth->qh", q_weights, oh,
                         precision=jax.lax.Precision.HIGHEST)
    scores = jax.lax.dot(w_dense, heavy_rows,
                         precision=jax.lax.Precision.HIGHEST)  # [Q, N]
    # impacts are strictly positive, so dense == 0 <=> no heavy match
    # (padded doc rows are zero and stay non-matches)
    dvals, didx = jax.lax.top_k(jnp.where(scores > 0.0, scores, NEG_INF),
                                k)                    # id-asc tie-break
    didx = jnp.where(jnp.isneginf(dvals), -1, didx.astype(jnp.int32))

    runs = _postings_runs(post_docs, post_imps, offsets, q_terms, q_weights,
                          w_slots, window, skip_mask=q_heavy_idx >= 0,
                          heavy_cols=heavy_cols, w_dense=w_dense)
    if runs is None:
        return dvals, didx
    docs_s, cand_total = runs          # run starts already hold full totals
    if docs_s.shape[1] < k:            # fewer candidates than k slots
        pad = k - docs_s.shape[1]
        docs_s = jnp.pad(docs_s, ((0, 0), (0, pad)),
                         constant_values=_DOC_SENTINEL)
        cand_total = jnp.pad(cand_total, ((0, 0), (0, pad)),
                             constant_values=NEG_INF)
    lvals, lpos = jax.lax.top_k(cand_total, k)        # id-asc (docs sorted)
    lidx = jnp.take_along_axis(docs_s, lpos, axis=1)
    lidx = jnp.where(lidx == _DOC_SENTINEL, -1, lidx)

    # dedup: a dense-top doc that also matched light terms already has its
    # (larger) full total in the light list — drop the dense entry.
    # Probing the light TOP-K alone is sufficient: a light-matching doc
    # outside it has k totals >= its total > its dense value (light
    # contributions are strictly positive), so its dense entry can never
    # reach the final k — only the double-listed top-k docs can.
    present = (didx[:, :, None] == lidx[:, None, :]).any(-1)
    dvals = jnp.where(present, NEG_INF, dvals)

    # merge the two k-lists with an explicit (score desc, id asc) sort
    cat_v = jnp.concatenate([lvals, dvals], axis=1)
    cat_i = jnp.concatenate(
        [lidx, jnp.where(jnp.isneginf(dvals), _INT_MAX, didx)], axis=1)
    _, _, sv, si = jax.lax.sort(
        (-cat_v, cat_i, cat_v, cat_i), dimension=1, num_keys=2)
    vals = jax.lax.slice_in_dim(sv, 0, k, axis=1)
    idx = jax.lax.slice_in_dim(si, 0, k, axis=1)
    return vals, jnp.where(jnp.isneginf(vals) | (idx == _INT_MAX), -1, idx)
