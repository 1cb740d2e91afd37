"""Fused matmul + top-k for dense retrieval.

TPU-native replacement for FAISS flat inner-product search (reference loads
and queries a faiss index at ``src/pipeline/retrieval/dense.py:36,83``).  The
corpus embedding matrix lives in HBM; a Pallas kernel streams corpus tiles
through VMEM, scores them on the MXU, and maintains a running top-k per query
in VMEM scratch — the full [Q, N] score matrix is never materialized.

Tie-breaking is exact: equal scores resolve to the smaller corpus index, so
results are order-identical to a stable exact scan (faiss-flat parity).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")
_INT_MAX = jnp.iinfo(jnp.int32).max


from sdag_tpu.utils.mathutil import round_up as _round_up


def exact_topk_xla(queries: jax.Array, corpus: jax.Array, k: int,
                   valid_n: int | None = None) -> Tuple[jax.Array, jax.Array]:
    """Reference exact search: full matmul + top-k (tie-break by index).

    Used for parity testing and as a small-N fallback.  Returns
    (scores [Q,k], indices [Q,k]) sorted by descending score.
    """
    scores = jnp.dot(queries, corpus.T, preferred_element_type=jnp.float32)
    if valid_n is not None:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < valid_n, scores, NEG_INF)
    # jax.lax.top_k breaks ties by lower index already (stable).
    vals, idxs = jax.lax.top_k(scores, k)
    idxs = jnp.where(jnp.isneginf(vals), -1, idxs)
    return vals, idxs.astype(jnp.int32)


def _select_next(vals: jax.Array, gidx: jax.Array):
    """One selection step: per row, the max value with smallest global index
    among ties.  Returns (max_val [Q,1], sel_idx [Q,1], selection mask)."""
    m = jnp.max(vals, axis=1, keepdims=True)
    is_max = vals == m
    sel = jnp.min(jnp.where(is_max, gidx, _INT_MAX), axis=1, keepdims=True)
    chosen = is_max & (gidx == sel)
    return m, sel, chosen


def _merge_topk_tile(scores, gcol, valid_n, vals_scratch, idx_scratch,
                     k: int):
    """Fold one [Qp, block_n] score tile into the running top-k scratch
    (descending, ties to the smaller global index).  Shared by the f32 and
    int8 dense kernels and the BM25 scan kernel — the engines' merge rule
    stays in lockstep by construction.

    Masked/padded columns (gcol >= valid_n) carry _INT_MAX indices so
    that when k exceeds the valid rows the flush converts them to -1
    (the documented contract, matching exact_topk_xla/approx paths)
    instead of leaking real padded-row ids into retrieval."""
    invalid = gcol >= valid_n
    scores = jnp.where(invalid, NEG_INF, scores)
    gcol = jnp.where(invalid, _INT_MAX, gcol)

    cv = jnp.concatenate([vals_scratch[:], scores], axis=1)
    ci = jnp.concatenate([idx_scratch[:], gcol], axis=1)

    # k is static and small: unroll selection in Python so every scratch
    # column store has a static lane index.
    new_vals, new_idx = [], []
    for _ in range(k):
        m, sel, chosen = _select_next(cv, ci)
        new_vals.append(m)
        new_idx.append(sel)
        cv = jnp.where(chosen, NEG_INF, cv)
        ci = jnp.where(chosen, _INT_MAX, ci)

    qp, k_pad = vals_scratch.shape
    pad = k_pad - k
    vals_row = jnp.concatenate(new_vals, axis=1)
    idx_row = jnp.concatenate(new_idx, axis=1)
    if pad:
        vals_row = jnp.concatenate(
            [vals_row, jnp.full((qp, pad), NEG_INF, jnp.float32)], axis=1)
        idx_row = jnp.concatenate(
            [idx_row, jnp.full((qp, pad), _INT_MAX, jnp.int32)], axis=1)
    vals_scratch[:] = vals_row
    idx_scratch[:] = idx_row


def _topk_kernel(valid_ref, q_ref, c_ref, out_vals_ref, out_idx_ref,
                 vals_scratch, idx_scratch, *, k: int, block_n: int):
    """Grid: (num_n_tiles,).  q_ref: [Qp, D] (resident); c_ref: [block_n, D]
    tile; scratch holds the running top-k (descending, index tie-broken).
    valid_ref: SMEM scalar — number of real (unpadded) corpus rows; dynamic
    so SPMD shards with different remainders share one compiled kernel."""
    j = pl.program_id(0)
    num_tiles = pl.num_programs(0)
    valid_n = valid_ref[0]

    @pl.when(j == 0)
    def _init():
        vals_scratch[:] = jnp.full_like(vals_scratch, NEG_INF)
        idx_scratch[:] = jnp.full_like(idx_scratch, _INT_MAX)

    # MXU: [Qp, D] x [D, block_n] -> [Qp, block_n] in f32.
    scores = jax.lax.dot_general(
        q_ref[:], c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    gcol = col + j * block_n
    _merge_topk_tile(scores, gcol, valid_n, vals_scratch, idx_scratch, k)

    @pl.when(j == num_tiles - 1)
    def _flush():
        out_vals_ref[:] = vals_scratch[:]
        out_idx_ref[:] = jnp.where(idx_scratch[:] == _INT_MAX, -1,
                                   idx_scratch[:])


@functools.partial(jax.jit, static_argnames=("k", "block_n", "interpret"))
def fused_topk_matmul(queries: jax.Array, corpus: jax.Array, k: int,
                      block_n: int = 1024, valid_n=None,
                      interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Pallas fused inner-product search.

    queries: [Q, D]; corpus: [N, D] (N padded to block_n by caller or here).
    valid_n may be a traced scalar (rows >= valid_n are masked out).
    Returns (scores [Q, k], indices [Q, k]); indices of padded/invalid rows
    are -1 with -inf scores.

    Perf profile (v5e, Q=256, N=100k, D=1024, k=10, bf16 corpus): 1.38 ms
    per batch = ~185k QPS — 29x XLA matmul + lax.top_k (40 ms, sort-based
    on TPU) and ~1000x a faiss-flat-equivalent CPU scan.  The matmul floor
    is ~0.27 ms; the remainder is the running top-k merge, which is
    inherently k sequential max+select passes over each score tile on the
    VPU (O(k*N*Q) element ops; per-query early-exit is not vectorizable,
    and group-max two-level selection needs per-query gathers Mosaic
    doesn't support).  Closing the gap further would need a genuinely
    different selection algorithm (e.g. histogram thresholding).
    """
    q, n = queries.shape[0], corpus.shape[0]
    d = queries.shape[1]
    if valid_n is None:
        valid_n = n
    valid_arr = jnp.asarray(valid_n, jnp.int32).reshape((1,))

    qp = _round_up(max(q, 8), 8)
    k_pad = _round_up(max(k, 128), 128)  # lane-aligned scratch
    n_pad = _round_up(n, block_n)

    if qp != q:
        queries = jnp.pad(queries, ((0, qp - q), (0, 0)))
    if n_pad != n:
        corpus = jnp.pad(corpus, ((0, n_pad - n), (0, 0)))

    queries = queries.astype(corpus.dtype)
    num_tiles = n_pad // block_n

    grid_spec = pl.GridSpec(
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((qp, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda j: (j, 0),
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
        functools.partial(_topk_kernel, k=k, block_n=block_n),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((qp, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((qp, k_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * n_pad * d,
            bytes_accessed=n_pad * d * corpus.dtype.itemsize + qp * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(valid_arr, queries, corpus)

    return out_vals[:q, :k], out_idx[:q, :k]


def quantize_last_axis_int8(x: jax.Array):
    """Symmetric int8 quantization over the last axis (traced-safe):
    returns (int8 values, f32 scales [...]) with x ~= values *
    scales[..., None].  Single source of the quantization rule for the
    retrieval index and the KV cache."""
    xf = x.astype(jnp.float32)
    scales = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / scales[..., None]), -127, 127
                 ).astype(jnp.int8)
    return q, scales


def quantize_rows_int8(x):
    """Host (numpy) wrapper of quantize_last_axis_int8 for index builds."""
    import numpy as np
    q, s = quantize_last_axis_int8(jnp.asarray(np.asarray(x, np.float32)))
    return np.asarray(q), np.asarray(s)


def quantize_rows_int8_residual(x):
    """Two-level int8 quantization for the rescored dense index:
    x ~= base*sb[:,None] + resid*sr[:,None] with ~15-bit effective
    precision (resid max is sb/2, so the combined step is sb/508).
    Same total HBM as bf16, but the coarse scan reads only `base`
    (1/4 of f32 traffic).  Returns (base i8, sb f32, resid i8, sr f32)."""
    import numpy as np
    xf = np.asarray(x, np.float32)
    base, sb = quantize_rows_int8(xf)
    resid = xf - base.astype(np.float32) * sb[:, None]
    rq, sr = quantize_rows_int8(resid)
    return base, sb, rq, sr


def _topk_kernel_int8(valid_ref, q_ref, qs_ref, c_ref, scale_ref,
                      out_vals_ref, out_idx_ref, vals_scratch, idx_scratch,
                      *, k: int, block_n: int):
    """int8-corpus variant of _topk_kernel: queries are int8 too, so the
    dot runs natively on the MXU int8 path (int8 x int8 -> int32) and both
    per-row scales are applied to the products (linearity).  HBM reads are
    1/4 of f32; converting the int8 tile to bf16 in-kernel instead cost a
    55x slowdown in VPU relayout work."""
    j = pl.program_id(0)
    num_tiles = pl.num_programs(0)
    valid_n = valid_ref[0]

    @pl.when(j == 0)
    def _init():
        vals_scratch[:] = jnp.full_like(vals_scratch, NEG_INF)
        idx_scratch[:] = jnp.full_like(idx_scratch, _INT_MAX)

    scores = jax.lax.dot_general(
        q_ref[:], c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * qs_ref[:] * scale_ref[0, :][None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    gcol = col + j * block_n
    _merge_topk_tile(scores, gcol, valid_n, vals_scratch, idx_scratch, k)

    @pl.when(j == num_tiles - 1)
    def _flush():
        out_vals_ref[:] = vals_scratch[:]
        out_idx_ref[:] = jnp.where(idx_scratch[:] == _INT_MAX, -1,
                                   idx_scratch[:])


@functools.partial(jax.jit, static_argnames=("k", "block_n", "interpret"))
def fused_topk_matmul_int8(queries: jax.Array, corpus_i8: jax.Array,
                           scales: jax.Array, k: int, block_n: int = 1024,
                           valid_n=None, interpret: bool = False
                           ) -> Tuple[jax.Array, jax.Array]:
    """Fused top-k over an int8-quantized corpus (per-row scales)."""
    q, n = queries.shape[0], corpus_i8.shape[0]
    d = queries.shape[1]
    if valid_n is None:
        valid_n = n
    valid_arr = jnp.asarray(valid_n, jnp.int32).reshape((1,))

    qp = _round_up(max(q, 8), 8)
    k_pad = _round_up(max(k, 128), 128)
    n_pad = _round_up(n, block_n)
    if qp != q:
        queries = jnp.pad(queries, ((0, qp - q), (0, 0)))
    if n_pad != n:
        corpus_i8 = jnp.pad(corpus_i8, ((0, n_pad - n), (0, 0)))
        scales = jnp.pad(scales, ((0, n_pad - n),))
    # quantize queries per-row so the kernel dot stays on the int8 MXU path
    q_i8, q_scales = quantize_last_axis_int8(queries)
    q_scales2d = q_scales.reshape(qp, 1)
    scales2d = scales.reshape(1, n_pad).astype(jnp.float32)

    num_tiles = n_pad // block_n
    grid_spec = pl.GridSpec(
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((qp, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qp, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda j: (0, j),
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
        functools.partial(_topk_kernel_int8, k=k, block_n=block_n),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((qp, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((qp, k_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(valid_arr, q_i8, q_scales2d, corpus_i8, scales2d)
    return out_vals[:q, :k], out_idx[:q, :k]


def merge_topk(scores: jax.Array, indices: jax.Array, k: int
               ) -> Tuple[jax.Array, jax.Array]:
    """Merge candidate lists [Q, M] -> top-k with exact (score desc, index
    asc) ordering.  Used to combine per-shard results."""
    order = jnp.lexsort((indices, -scores), axis=-1)
    top = order[:, :k]
    return (jnp.take_along_axis(scores, top, axis=1),
            jnp.take_along_axis(indices, top, axis=1))


def _approx_candidates(k: int, n: int, m: int | None) -> int:
    """Candidate-list depth for the two-stage approx search.  M=4k (floor
    40) makes candidate coverage of the true top-k effectively 1 (measured
    1.0 at M=16 for k=10 on adversarial random embeddings; the extra
    margin costs ~nothing in the merge)."""
    return min(m if m is not None else max(4 * k, 40), n)


@functools.partial(jax.jit, static_argnames=("k", "m", "recall_target"))
def approx_topk_matmul(queries: jax.Array, corpus: jax.Array, k: int,
                       valid_n=None, m: int | None = None,
                       recall_target: float = 0.99
                       ) -> Tuple[jax.Array, jax.Array]:
    """Two-stage search on XLA's TPU-native partial reduce: matmul ->
    ``lax.approx_max_k`` over M >= 4k candidates -> exact (score desc,
    index asc) merge of the candidates.

    ``approx_max_k`` lowers to the TPU PartialReduce op, which replaces
    the fused kernel's k sequential VPU selection passes with a single
    hardware-assisted pass — measured 373k QPS vs the kernel's 173k
    (v5e, Q=256, N=100k, D=1024, k=10, bf16 corpus) at recall@10 0.992
    (the bf16 score ceiling is 0.993; candidate coverage of the true
    top-k is ~1.0 at M=40, so the approximation is the PartialReduce
    binning, bounded by recall_target).  Candidate scores are the real
    matmul scores, so the final k are ordered exactly like the fused
    kernel orders them.  On CPU/GPU ``approx_max_k`` falls back to exact
    top-k, making this path deterministic-exact in tests.
    """
    n = corpus.shape[0]
    mm = _approx_candidates(k, n, m)
    scores = jax.lax.dot_general(
        queries.astype(corpus.dtype), corpus,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if valid_n is not None:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < valid_n, scores, NEG_INF)
    vals, idx = jax.lax.approx_max_k(scores, mm,
                                     recall_target=recall_target)
    mv, mi = merge_topk(vals, idx.astype(jnp.int32), k)
    return mv, jnp.where(jnp.isneginf(mv), -1, mi)


@functools.partial(jax.jit, static_argnames=("k", "m", "recall_target"))
def approx_topk_matmul_int8(queries: jax.Array, corpus_i8: jax.Array,
                            scales: jax.Array, k: int, valid_n=None,
                            m: int | None = None,
                            recall_target: float = 0.99
                            ) -> Tuple[jax.Array, jax.Array]:
    """int8-corpus variant of :func:`approx_topk_matmul`: native int8 MXU
    matmul (1/4 the HBM traffic of f32) + approx_max_k + exact merge.
    Measured 452k QPS at recall@10 0.977 (the int8 quantization ceiling)
    on the probe geometry — vs 265k for the fused int8 kernel."""
    n = corpus_i8.shape[0]
    mm = _approx_candidates(k, n, m)
    q_i8, q_scales = quantize_last_axis_int8(queries)
    scores = jax.lax.dot_general(
        q_i8, corpus_i8, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32
    ).astype(jnp.float32) * q_scales[:, None] * scales[None, :]
    if valid_n is not None:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < valid_n, scores, NEG_INF)
    vals, idx = jax.lax.approx_max_k(scores, mm,
                                     recall_target=recall_target)
    mv, mi = merge_topk(vals, idx.astype(jnp.int32), k)
    return mv, jnp.where(jnp.isneginf(mv), -1, mi)


@functools.partial(jax.jit, static_argnames=("k", "m", "recall_target"))
def rescored_topk_int8(queries: jax.Array, base_i8: jax.Array,
                       base_scales: jax.Array, resid_i8: jax.Array,
                       resid_scales: jax.Array, k: int, valid_n=None,
                       m: int | None = None, recall_target: float = 0.99
                       ) -> Tuple[jax.Array, jax.Array]:
    """int8 coarse scan + int8-residual candidate rescore.

    Stage 1 is :func:`approx_topk_matmul_int8`'s coarse pass over the int8
    base (native int8 MXU, 1/4 the f32 HBM traffic) keeping M candidates.
    Stage 2 gathers the M base+residual rows per query and rescores them
    against the *f32* query: score = sb[i]*(q.base_i) + sr[i]*(q.resid_i),
    i.e. the reconstruction has ~15-bit precision vs int8's 7.  Measured on
    adversarial random embeddings (N=100k, D=1024): candidate coverage of
    the true top-10 is 1.0 already at M=40 — the int8 engine's 0.977
    recall@10 was candidate *ordering* error, which the rescore removes —
    so recall@10 goes to ~1.0 while the scan cost stays the int8 engine's.
    M defaults to max(4k, 40), same as the plain approx engine: measured
    on-chip, approx_max_k's PartialReduce cost grows superlinearly in M
    (0.36 ms at M=40 vs 3.5 ms at M=160 on the probe geometry) while the
    gather+rescore is <0.05 ms — small M + rescore wins on both axes.
    """
    n = base_i8.shape[0]
    mm = _approx_candidates(k, n, m)
    q_i8, q_scales = quantize_last_axis_int8(queries)
    scores = jax.lax.dot_general(
        q_i8, base_i8, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32
    ).astype(jnp.float32) * q_scales[:, None] * base_scales[None, :]
    if valid_n is not None:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < valid_n, scores, NEG_INF)
    cvals, cidx = jax.lax.approx_max_k(scores, mm,
                                       recall_target=recall_target)
    cidx = cidx.astype(jnp.int32)
    safe = jnp.clip(cidx, 0, n - 1)
    qf = queries.astype(jnp.float32)
    dot_b = jnp.einsum("qd,qmd->qm", qf,
                       base_i8[safe].astype(jnp.float32),
                       preferred_element_type=jnp.float32)
    dot_r = jnp.einsum("qd,qmd->qm", qf,
                       resid_i8[safe].astype(jnp.float32),
                       preferred_element_type=jnp.float32)
    rec = dot_b * base_scales[safe] + dot_r * resid_scales[safe]
    rec = jnp.where(jnp.isneginf(cvals), NEG_INF, rec)
    mv, mi = merge_topk(rec, cidx, k)
    return mv, jnp.where(jnp.isneginf(mv), -1, mi)


def topk_search(queries: jax.Array, corpus: jax.Array, k: int,
                valid_n: int | None = None, block_n: int = 1024,
                use_pallas: bool | None = None, mode: str = "exact"
                ) -> Tuple[jax.Array, jax.Array]:
    """Dispatch.  mode="exact": Pallas fused kernel on TPU (exact
    tie-break), XLA scan elsewhere.  mode="approx": matmul + approx_max_k
    two-stage (TPU PartialReduce; exact fallback off-TPU) — ~2.2x the
    kernel's QPS at >=0.99 recall@10."""
    if mode == "approx":
        return approx_topk_matmul(queries, corpus, k, valid_n=valid_n)
    platform = jax.default_backend()
    if use_pallas is None:
        use_pallas = platform == "tpu"
    if use_pallas:
        return fused_topk_matmul(queries, corpus, k, block_n=block_n,
                                 valid_n=valid_n)
    return exact_topk_xla(queries, corpus, k, valid_n=valid_n)
