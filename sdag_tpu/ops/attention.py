"""SDAG block-sparse flash attention (prefill) + causal decode attention.

TPU-native replacement for the reference's dense-masked HF attention
(``SDAG.py:167-178`` builds a [1,1,L,L] additive mask and runs one prefill
forward).  The Pallas kernel computes the isolation mask *inside each tile*
from O(L) metadata (see sdag/mask.py) with online softmax — the L x L mask
never exists in HBM — and skips the MXU work of fully-masked tiles.

Decode keeps reference semantics: generated tokens attend the whole cache
with plain causal attention (``SDAG.py:191-208``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


HOLE = -2  # inactive padding (block-aligned packing); see sdag/mask.py


def _tile_mask(i, j, dq, dk, nbr_q, sys_user_len, valid_len):
    """Token-level SDAG attention rule for a [BQ, BK] tile.

    i, j: global row/col indices; dq, dk: doc ids (-1 = non-doc, -2 = hole);
    nbr_q: neighbor bitmask of the q rows; sys_user_len/valid_len scalars.
    Hole keys are never visible; hole rows behave causally (outputs unused).
    """
    causal = j <= i
    is_doc_q = dq >= 0
    same_doc = (dq == dk) & is_doc_q
    prefix = (dk == -1) & (j < sys_user_len)
    # neighbor windows only address docs 0..31 (int32 bitmask); higher doc
    # ids are valid for isolation (exact dq==dk) but never neighbors, and
    # the shift must stay < 32 (>= bitwidth is undefined)
    nbr = (dk >= 0) & (dk < 32) & (jnp.bitwise_and(
        jax.lax.shift_right_logical(nbr_q, jnp.clip(dk, 0, 31)), 1) == 1)
    doc_row = (causal & (same_doc | prefix)) | nbr
    nondoc_row = causal & (dk != HOLE)
    mask = (is_doc_q & doc_row) | (jnp.logical_not(is_doc_q) & nondoc_row)
    return mask & (j < valid_len) & (i < valid_len)


def sdag_attention_reference(q, k, v, doc_id, nbr_bits, sys_user_len,
                             valid_len=None, scale: Optional[float] = None,
                             q_offset=0, doc_id_q=None, nbr_bits_q=None):
    """Dense-mask reference attention (XLA).  q: [B, H, Lq, Dh]; k/v may
    have fewer (grouped) kv heads — repeated here; doc_id/nbr_bits describe
    the KEY sequence [B, Lk]; sys_user_len: [B] or scalar.

    Context parallelism: when q covers rows [q_offset, q_offset+Lq) of the
    key sequence, pass q_offset and the q rows' own metadata slices
    (doc_id_q/nbr_bits_q; default = full arrays for the Lq == Lk case).
    Parity target for the Pallas kernel and the CPU fallback path."""
    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    if k.shape[1] != H:
        rep = H // k.shape[1]
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    scale = scale if scale is not None else Dh ** -0.5
    sys_user_len = jnp.broadcast_to(jnp.asarray(sys_user_len), (B,))
    valid_len = (jnp.broadcast_to(jnp.asarray(valid_len), (B,))
                 if valid_len is not None else jnp.full((B,), Lk))
    if doc_id_q is None:
        doc_id_q = doc_id
    if nbr_bits_q is None:
        nbr_bits_q = nbr_bits

    # q_offset may be scalar or per-batch [B] (the Pallas kernels accept
    # both); vmapping it keeps the two paths parity-comparable either way
    q_offset = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (B,))
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (Lq, Lk), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (Lq, Lk), 1)

    def one(qb, kb, vb, db_q, db_k, nb_q, sul, vl, qo):
        mask = _tile_mask(qo + iota_i, j, db_q[:, None], db_k[None, :],
                          nb_q[:, None], sul, vl)
        scores = jnp.einsum("hid,hjd->hij", qb, kb,
                            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(mask[None], scores, DEFAULT_MASK_VALUE)
        probs = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("hij,hjd->hid", probs.astype(vb.dtype), vb)

    return jax.vmap(one)(q, k, v, doc_id_q, doc_id, nbr_bits_q,
                         sys_user_len, valid_len, q_offset)


BLOCK_SKIP, BLOCK_FULL, BLOCK_PARTIAL, BLOCK_CAUSAL = 0, 1, 2, 3


def _pick_block(length: int) -> int:
    """Largest MXU-friendly tile dividing the length (lengths are
    128-multiples by the dispatcher's contract)."""
    for cand in (512, 256, 128):
        if length % cand == 0:
            return cand
    return min(length, 128)


def _mask_tiles_fit(Lk: int, block_q: int) -> bool:
    """A (b, q-row) int8 mask strip is Lk*block_q bytes and must fit VMEM
    staging (2MB cap → L=4096 is the last enabled size at 512-blocks)."""
    return Lk * block_q <= 2 ** 21


def compute_block_kinds(doc_id, nbr_bits, sys_user_len, valid_len,
                        block_q: int, block_k: int,
                        doc_id_q=None, nbr_bits_q=None, q_offset=0):
    """Classify every (q-block, kv-block) tile from O(L) metadata:

    0 = SKIP (no visible pair — the kernel does no work),
    1 = FULL (every pair visible — no per-token mask needed),
    2 = PARTIAL (compute the full SDAG token mask in-tile),
    3 = CAUSAL (mask is EXACTLY causal&valid: all q rows non-doc, no hole
        keys — the kernel applies the 3-op causal mask instead of the
        ~13-op SDAG rule; on a plain-causal prompt every live diagonal
        tile takes this path).

    Classification is conservative toward PARTIAL: SKIP/FULL/CAUSAL are
    exact guarantees, heterogenous tiles fall back to PARTIAL.  This is
    the splash-attention-style structure precompute, O(nQ*nK) cheap XLA
    work.

    Context parallelism: doc_id/nbr_bits describe the KEY sequence; when the
    q rows are a slice [q_offset, q_offset+Lq), pass their metadata as
    doc_id_q/nbr_bits_q (defaults cover Lq == Lk).
    """
    B, L = doc_id.shape
    if doc_id_q is None:
        doc_id_q = doc_id
    if nbr_bits_q is None:
        nbr_bits_q = nbr_bits
    Lq = doc_id_q.shape[1]
    nq, nk = Lq // block_q, L // block_k
    big = jnp.int32(2**30)
    q_offset = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (B,))

    def one(did_q, nbr_q, did, sul, vl, qoff):
        dqb = did_q.reshape(nq, block_q)
        nbrb = nbr_q.reshape(nq, block_q)
        q_min_d = dqb.min(1)
        q_max_d = dqb.max(1)
        q_homo_doc = (q_min_d == q_max_d) & (q_min_d >= 0)
        # hole rows (-2) behave like non-doc (causal) rows
        q_all_nondoc = q_max_d < 0
        q_has_doc = q_max_d >= 0
        q_has_nondoc = q_min_d < 0
        # ids > 31 alias onto bit 31: the summaries stay conservative
        # (spurious any_vis -> PARTIAL evaluates the exact in-tile mask)
        q_doc_bits = jnp.bitwise_or.reduce(
            jnp.where(dqb >= 0, jnp.left_shift(1, jnp.clip(dqb, 0, 31)), 0),
            axis=1)
        q_nbr_or = jnp.bitwise_or.reduce(nbrb, axis=1)
        # bits set in EVERY row of the block — FULL must hold for all rows,
        # so an AND-reduce keeps the guarantee exact even if nbr_bits vary
        # per token within a doc-homogeneous block (row 0 alone would
        # over-claim FULL and leak cross-document attention)
        q_nbr_all = jnp.bitwise_and.reduce(nbrb, axis=1)
        qmin_i = qoff + jnp.arange(nq, dtype=jnp.int32) * block_q
        qmax_i = qmin_i + block_q - 1
        q_any_valid = qmin_i < vl
        q_all_valid = qmax_i < vl

        dkb = did.reshape(nk, block_k)
        k_min_d = dkb.min(1)
        k_max_d = dkb.max(1)
        k_homo_doc = (k_min_d == k_max_d) & (k_min_d >= 0)
        # keys: holes are invisible, so "all nondoc" must exclude them
        k_all_nondoc = (k_min_d == -1) & (k_max_d == -1)
        k_all_active = k_min_d >= -1
        k_any_active = k_max_d >= -1
        k_doc_bits = jnp.bitwise_or.reduce(
            jnp.where(dkb >= 0, jnp.left_shift(1, jnp.clip(dkb, 0, 31)), 0),
            axis=1)
        pos = jnp.arange(L, dtype=jnp.int32).reshape(nk, block_k)
        k_nondoc_min_j = jnp.min(jnp.where(dkb == -1, pos, big), axis=1)
        kmin_j = jnp.arange(nk, dtype=jnp.int32) * block_k
        kmax_j = kmin_j + block_k - 1
        k_any_valid = (kmin_j < vl) & k_any_active
        k_all_valid = (kmax_j < vl) & k_all_active

        causal_any = kmin_j[None, :] <= qmax_i[:, None]
        same_any = (k_doc_bits[None, :] & q_doc_bits[:, None]) != 0
        prefix_any = (k_nondoc_min_j < sul)[None, :]
        nbr_any = (k_doc_bits[None, :] & q_nbr_or[:, None]) != 0
        any_vis = q_any_valid[:, None] & k_any_valid[None, :] & (
            (q_has_nondoc[:, None] & causal_any)
            | (q_has_doc[:, None]
               & ((causal_any & (prefix_any | same_any)) | nbr_any)))

        below = kmax_j[None, :] <= qmin_i[:, None]
        k_prefix_all = (k_all_nondoc & (kmax_j < sul))[None, :]
        same_doc_homo = (q_homo_doc[:, None] & k_homo_doc[None, :]
                         & (q_min_d[:, None] == k_min_d[None, :]))
        nbr_full = (q_homo_doc[:, None] & k_homo_doc[None, :]
                    & (k_min_d < 32)[None, :]
                    & (jnp.bitwise_and(jax.lax.shift_right_logical(
                        q_nbr_all[:, None],
                        jnp.clip(k_min_d, 0, 31)[None, :]), 1) == 1))
        full = q_all_valid[:, None] & k_all_valid[None, :] & (
            (q_all_nondoc[:, None] & below)
            | (q_homo_doc[:, None] & k_prefix_all & below)
            | (same_doc_homo & below)
            | nbr_full)

        # exactly-causal tiles: every q row is non-doc/hole (causal rows)
        # and no key in the tile is a hole -> _tile_mask reduces to
        # causal & valid
        causal_exact = (q_all_nondoc[:, None]
                        & (k_min_d >= -1)[None, :])
        return jnp.where(~any_vis, BLOCK_SKIP,
                         jnp.where(full, BLOCK_FULL,
                                   jnp.where(causal_exact, BLOCK_CAUSAL,
                                             BLOCK_PARTIAL))
                         ).astype(jnp.int32)

    return jax.vmap(one)(doc_id_q, nbr_bits_q, doc_id,
                         jnp.asarray(sys_user_len, jnp.int32),
                         jnp.asarray(valid_len, jnp.int32), q_offset)


def tile_masks_from_metadata(doc_id, nbr_bits, sys_user_len, valid_len,
                             block_q: int, block_k: int,
                             doc_id_q=None, nbr_bits_q=None, q_offset=None):
    """Materialize the exact SDAG mask as int8 TILES
    [B, nQ, nK, block_q, block_k] (XLA, once per prefill).

    Why: the in-kernel ~13-op mask rule is VPU work comparable to a
    tile's MXU time at Dh=128, and it is recomputed per (layer, head,
    tile) even though the mask depends only on (batch, tile).  Computing
    it once and streaming int8 tiles costs ~bq*bk bytes of DMA per tile
    — an order of magnitude cheaper than recomputing — and amortizes
    over every head and layer of the prefill.  HBM cost: B * Lq * Lk
    bytes (16 MB per row at L=4096); the dispatcher gates this path to
    geometries where a row's mask tiles also fit VMEM staging.
    """
    B, Lk = doc_id.shape
    if doc_id_q is None:
        doc_id_q = doc_id
    if nbr_bits_q is None:
        nbr_bits_q = nbr_bits
    Lq = doc_id_q.shape[1]
    sys_user_len = jnp.broadcast_to(jnp.asarray(sys_user_len, jnp.int32),
                                    (B,))
    valid_len = (jnp.broadcast_to(jnp.asarray(valid_len, jnp.int32), (B,))
                 if valid_len is not None else jnp.full((B,), Lk, jnp.int32))
    q_offset = (jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (B,))
                if q_offset is not None else jnp.zeros((B,), jnp.int32))

    def one(dq, nbq, dk, sul, vl, qoff):
        i = qoff + jax.lax.broadcasted_iota(jnp.int32, (Lq, Lk), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (Lq, Lk), 1)
        m = _tile_mask(i, j, dq[:, None], dk[None, :], nbq[:, None],
                       sul, vl)
        return m.astype(jnp.int8)

    full = jax.vmap(one)(doc_id_q, nbr_bits_q, doc_id, sys_user_len,
                         valid_len, q_offset)              # [B, Lq, Lk]
    nq, nk = Lq // block_q, Lk // block_k
    return full.reshape(B, nq, block_q, nk, block_k).transpose(0, 1, 3, 2, 4)


def _flash_kernel(b, kind, sys_user_len, valid_len, q_offset,
                  q_ref, k_ref, v_ref, dq_ref, dk_ref, nbr_ref,
                  out_ref, m_scratch, l_scratch, acc_scratch,
                  *, block_q: int, block_k: int, scale: float):
    """Grid: (B*H, nQ, nK) — kv innermost; online-softmax flash attention.
    `kind` selects SKIP / FULL (no mask work) / PARTIAL (in-tile SDAG mask
    from metadata)."""
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    @pl.when(kind > BLOCK_SKIP)
    def _compute():
        # bf16 MXU inputs, f32 accumulate (standard flash precision).
        s = jax.lax.dot_general(
            q_ref[0].astype(jnp.bfloat16), k_ref[0].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

        def apply_mask(s):
            i = q_offset + qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            j = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            # metadata blocks carry the whole batch dim (TPU tiling needs
            # the sublane dim to match the array); select row b dynamically
            dq = dq_ref[b, :].reshape(block_q, 1)
            dk = dk_ref[b, :].reshape(1, block_k)
            nbr_q = nbr_ref[b, :].reshape(block_q, 1)
            mask = _tile_mask(i, j, dq, dk, nbr_q, sys_user_len, valid_len)
            return jnp.where(mask, s, -jnp.inf)

        # Measured on v5e: applying the mask unconditionally is faster than
        # branching on FULL tiles (Mosaic's lax.cond costs more than the
        # VPU mask work it would save); kinds are used for SKIP only here.
        s = apply_mask(s)

        m_prev = m_scratch[:]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # Rows with no visible keys so far keep m=-inf; exp(-inf - -inf)
        # would be NaN, so guard the shift.
        safe_m = jnp.where(jnp.isneginf(m_new), 0.0, m_new)
        alpha = jnp.where(jnp.isneginf(m_prev), 0.0,
                          jnp.exp(m_prev - safe_m))
        p = jnp.exp(s - safe_m)  # fully-masked entries: exp(-inf) == 0

        l_scratch[:] = l_scratch[:] * alpha + jnp.sum(p, axis=1,
                                                      keepdims=True)
        acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot_general(
            p.astype(jnp.bfloat16), v_ref[0].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scratch[:] = m_new

    @pl.when(ki == nk - 1)
    def _flush():
        l = l_scratch[:]
        out_ref[0, :] = (acc_scratch[:] /
                         jnp.where(l == 0.0, 1.0, l)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "scale",
                                             "interpret"))
def sdag_flash_attention(q, k, v, doc_id, nbr_bits, sys_user_len,
                         valid_len=None, block_q: int = 128,
                         block_k: int = 128, scale: Optional[float] = None,
                         interpret: bool = False,
                         doc_id_q=None, nbr_bits_q=None, q_offset=None,
                         kinds=None):
    """Pallas block-sparse flash attention.

    q: [B, H, Lq, Dh]; k/v: [B, Hkv, Lk, Dh] (GQA groups mapped via the
    BlockSpec); lengths multiples of the block sizes (caller pads; padded
    rows must have doc_id=-1 and be >= valid_len).  doc_id/nbr_bits describe
    the KEY sequence [B, Lk]; for context parallelism pass the q rows'
    metadata (doc_id_q/nbr_bits_q [B, Lq]) and their global row offset
    q_offset [B] (defaults cover Lq == Lk, offset 0).
    """
    B, H, Lq, Dh = q.shape
    L = k.shape[2]
    n_kv = k.shape[1]
    if H % n_kv:
        raise ValueError(f"q heads {H} not a multiple of kv heads {n_kv}")
    n_rep = H // n_kv
    scale = scale if scale is not None else Dh ** -0.5
    block_q = min(block_q, Lq)
    block_k = min(block_k, L)
    if Lq % block_q or L % block_k:
        raise ValueError(f"Lq={Lq}/Lk={L} must divide the block sizes")
    if doc_id_q is None:
        doc_id_q = doc_id
    if nbr_bits_q is None:
        nbr_bits_q = nbr_bits

    sys_user_len = jnp.broadcast_to(jnp.asarray(sys_user_len, jnp.int32), (B,))
    valid_len = (jnp.broadcast_to(jnp.asarray(valid_len, jnp.int32), (B,))
                 if valid_len is not None
                 else jnp.full((B,), L, jnp.int32))
    q_offset = (jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (B,))
                if q_offset is not None else jnp.zeros((B,), jnp.int32))
    meta = jnp.stack([sys_user_len, valid_len, q_offset], axis=1)  # [B, 3]
    if kinds is None:  # callers with many layers precompute once (see
        # prefill_mask_plan) — XLA does NOT CSE this across layer calls
        kinds = compute_block_kinds(doc_id, nbr_bits, sys_user_len,
                                    valid_len, block_q, block_k,
                                    doc_id_q=doc_id_q,
                                    nbr_bits_q=nbr_bits_q,
                                    q_offset=q_offset)  # [B, nQ, nK]

    qf = q.reshape(B * H, Lq, Dh)
    # GQA: kv stays grouped; the BlockSpec maps each q head to its shared kv
    # head (no repeat materialization, 1/n_rep the kv bandwidth).
    kf = k.reshape(B * n_kv, L, Dh)
    vf = v.reshape(B * n_kv, L, Dh)

    def kv_index(bh, qi, ki, meta, kinds):
        return ((bh // H) * n_kv + (bh % H) // n_rep, ki, 0)

    nq, nk = Lq // block_q, L // block_k

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B * H, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, Dh),
                         lambda bh, qi, ki, meta, kinds: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, Dh), kv_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, Dh), kv_index,
                         memory_space=pltpu.VMEM),
            # metadata blocks keep the full batch dim: TPU tiling requires
            # the sublane dim be divisible by 8 or equal the array dim
            pl.BlockSpec((B, block_q),
                         lambda bh, qi, ki, meta, kinds: (0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, block_k),
                         lambda bh, qi, ki, meta, kinds: (0, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, block_q),
                         lambda bh, qi, ki, meta, kinds: (0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dh),
                               lambda bh, qi, ki, meta, kinds: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, Dh), jnp.float32),
        ],
    )

    def kernel(meta_smem, kinds_smem, q_ref, k_ref, v_ref, dq_ref, dk_ref,
               nbr_ref, out_ref, m_s, l_s, acc_s):
        bh = pl.program_id(0)
        qi = pl.program_id(1)
        ki = pl.program_id(2)
        b = bh // H
        _flash_kernel(b, kinds_smem[b, qi, ki],
                      meta_smem[b, 0], meta_smem[b, 1], meta_smem[b, 2],
                      q_ref, k_ref, v_ref, dq_ref, dk_ref,
                      nbr_ref, out_ref, m_s, l_s, acc_s,
                      block_q=block_q, block_k=block_k, scale=scale)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * H, Lq, Dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(meta, kinds, qf, kf, vf, doc_id_q, doc_id, nbr_bits_q)

    return out.reshape(B, H, Lq, Dh)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "scale",
                                             "interpret", "use_mask_tiles",
                                             "worklist"))
def sdag_flash_attention_kvres(q, k, v, doc_id, nbr_bits, sys_user_len,
                               valid_len=None,
                               block_q: Optional[int] = None,
                               block_k: Optional[int] = None,
                               scale: Optional[float] = None,
                               interpret: bool = False,
                               doc_id_q=None, nbr_bits_q=None, q_offset=None,
                               use_mask_tiles: bool = False,
                               kinds=None, mask_tiles=None,
                               worklist: bool = False):
    """KV-resident block-sparse flash attention.

    Same contract as ``sdag_flash_attention``, different schedule: the grid
    is (B*H, nQ) and each step keeps the head's FULL K/V resident in VMEM,
    looping over key tiles inside the kernel.  The grid kernel's BlockSpec
    prefetch DMAs every K/V tile even for SKIP tiles, so block sparsity
    saves MXU work but not HBM traffic — at prefill sizes the op is
    DMA-bound, which is why SDAG only measured ~1.1x plain causal despite
    2-3x fewer live tiles.  Here K/V ride the ICI->VMEM path once per
    (batch, kv-head) (the index map is constant in qi, so Pallas revisits
    the same block without re-fetching) and SKIP tiles cost nothing.

    Requires K+V for one (b, kv-head) to fit VMEM: L*Dh*itemsize*2 ⪅ 8MB
    (L=16k bf16 at Dh=128 is 8MB).  Callers should fall back to
    ``sdag_flash_attention`` beyond that.

    ``worklist=True`` swaps the static unroll over all nk key tiles for a
    ``fori_loop`` over a packed per-(b, q-block) list of LIVE tiles (the
    splash worklist, but against VMEM-resident K/V — no DMA machinery).
    The static unroll pays one branch per SKIP tile and emits nk copies of
    the tile body; the worklist visits exactly the live tiles, so compute
    scales with visible area.  Measured on-chip (benchmarks/
    PREFILL_VARIANTS.md): the dynamic trip count defeats Mosaic's static
    pipelining — 2.5 ms vs the unrolled schedule's 1.07 ms at L=4096/20
    docs, and 35% slower even on DENSE causal — so this stays a
    measured-and-rejected alternative; production dispatch keeps the
    unrolled kernel.  Incompatible with use_mask_tiles (dynamic tile
    index vs streamed strip); the in-kernel rule is used.
    """
    B, H, Lq, Dh = q.shape
    L = k.shape[2]
    n_kv = k.shape[1]
    if H % n_kv:
        raise ValueError(f"q heads {H} not a multiple of kv heads {n_kv}")
    n_rep = H // n_kv
    scale = scale if scale is not None else Dh ** -0.5

    block_q = min(block_q, Lq) if block_q else _pick_block(Lq)
    block_k = min(block_k, L) if block_k else _pick_block(L)
    if Lq % block_q or L % block_k:
        raise ValueError(f"Lq={Lq}/Lk={L} must divide the block sizes")
    if use_mask_tiles and not _mask_tiles_fit(L, block_q):
        # beyond the staging budget sparsity already wins big and the
        # in-kernel rule is fine
        use_mask_tiles = False
    if doc_id_q is None:
        doc_id_q = doc_id
    if nbr_bits_q is None:
        nbr_bits_q = nbr_bits

    sys_user_len = jnp.broadcast_to(jnp.asarray(sys_user_len, jnp.int32),
                                    (B,))
    valid_len = (jnp.broadcast_to(jnp.asarray(valid_len, jnp.int32), (B,))
                 if valid_len is not None
                 else jnp.full((B,), L, jnp.int32))
    q_offset = (jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (B,))
                if q_offset is not None else jnp.zeros((B,), jnp.int32))
    meta = jnp.stack([sys_user_len, valid_len, q_offset], axis=1)  # [B, 3]
    if kinds is None:  # callers with many layers precompute once (see
        # prefill_mask_plan) — XLA does NOT CSE this across layer calls
        kinds = compute_block_kinds(doc_id, nbr_bits, sys_user_len,
                                    valid_len, block_q, block_k,
                                    doc_id_q=doc_id_q,
                                    nbr_bits_q=nbr_bits_q, q_offset=q_offset)

    qf = q.reshape(B * H, Lq, Dh)
    kf = k.reshape(B * n_kv, L, Dh)
    vf = v.reshape(B * n_kv, L, Dh)
    nq, nk = Lq // block_q, L // block_k

    if worklist:
        return _kvres_worklist_call(
            qf, kf, vf, meta, kinds, doc_id, doc_id_q, nbr_bits_q,
            B=B, H=H, n_kv=n_kv, n_rep=n_rep, Lq=Lq, L=L, Dh=Dh,
            block_q=block_q, block_k=block_k, scale=scale,
            interpret=interpret, out_dtype=q.dtype)

    def kv_index(bh, qi, meta, kinds):
        return ((bh // H) * n_kv + (bh % H) // n_rep, 0, 0)

    in_specs = [
        pl.BlockSpec((1, block_q, Dh),
                     lambda bh, qi, meta, kinds: (bh, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L, Dh), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, L, Dh), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((B, block_q),
                     lambda bh, qi, meta, kinds: (0, qi),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, L),
                     lambda bh, qi, meta, kinds: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, block_q),
                     lambda bh, qi, meta, kinds: (0, qi),
                     memory_space=pltpu.VMEM),
    ]
    if use_mask_tiles:
        # precomputed int8 mask tiles: one (b, q-row) strip [nk, bq, bk]
        # per grid step (head-independent — the strip re-streams per
        # head, which is still ~10x cheaper than recomputing the rule
        # per tile on the VPU)
        in_specs.append(pl.BlockSpec(
            (1, 1, nk, block_q, block_k),
            lambda bh, qi, meta, kinds: (bh // H, qi, 0, 0, 0),
            memory_space=pltpu.VMEM))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B * H, nq),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, Dh),
                               lambda bh, qi, meta, kinds: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, Dh), jnp.float32),
        ],
    )

    def kernel(meta_smem, kinds_smem, q_ref, k_ref, v_ref, dq_ref, dk_ref,
               nbr_ref, *rest):
        if use_mask_tiles:
            mtiles_ref, out_ref, m_s, l_s, acc_s = rest
        else:
            out_ref, m_s, l_s, acc_s = rest
            mtiles_ref = None
        bh = pl.program_id(0)
        qi = pl.program_id(1)
        b = bh // H
        sul = meta_smem[b, 0]
        vl = meta_smem[b, 1]
        qoff = meta_smem[b, 2]

        m_s[:] = jnp.full_like(m_s, -jnp.inf)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

        qb = q_ref[0].astype(jnp.bfloat16)
        dq = dq_ref[b, :].reshape(block_q, 1)
        nbr_q = nbr_ref[b, :].reshape(block_q, 1)
        # load the whole key doc-id row once (dynamic sublane index with
        # lane offset 0 — Mosaic rejects dynamic loads at non-zero lane
        # offsets); per-tile slices below are value-level ops
        dk_all = dk_ref[b, :]
        i = qoff + qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)

        for ki in range(nk):  # static unroll; SKIP tiles cost one branch
            kind = kinds_smem[b, qi, ki]

            def online_update(s, vb):
                m_prev = m_s[:]
                m_new = jnp.maximum(m_prev, jnp.max(s, axis=1,
                                                    keepdims=True))
                safe_m = jnp.where(jnp.isneginf(m_new), 0.0, m_new)
                alpha = jnp.where(jnp.isneginf(m_prev), 0.0,
                                  jnp.exp(m_prev - safe_m))
                p = jnp.exp(s - safe_m)
                l_s[:] = l_s[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
                acc_s[:] = acc_s[:] * alpha + jax.lax.dot_general(
                    p.astype(jnp.bfloat16), vb.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                m_s[:] = m_new

            def scores(ki):
                kb = k_ref[0, ki * block_k:(ki + 1) * block_k, :]
                vb = v_ref[0, ki * block_k:(ki + 1) * block_k, :]
                s = jax.lax.dot_general(
                    qb, kb.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                return s, vb

            # per-kind mask specialization: the ~13-op SDAG rule is VPU
            # work comparable to the tile's MXU time at Dh=128, so FULL
            # tiles skip it and exactly-causal tiles use the 3-op form
            @pl.when(kind == BLOCK_PARTIAL)
            def _tile_partial(ki=ki):
                s, vb = scores(ki)
                if use_mask_tiles:
                    mask = mtiles_ref[0, 0, ki] != 0
                else:
                    j = ki * block_k + jax.lax.broadcasted_iota(
                        jnp.int32, (block_q, block_k), 1)
                    dk = jax.lax.slice(
                        dk_all, (ki * block_k,),
                        ((ki + 1) * block_k,)).reshape(1, block_k)
                    mask = _tile_mask(i, j, dq, dk, nbr_q, sul, vl)
                online_update(jnp.where(mask, s, -jnp.inf), vb)

            @pl.when(kind == BLOCK_CAUSAL)
            def _tile_causal(ki=ki):
                s, vb = scores(ki)
                j = ki * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1)
                mask = (j <= i) & (j < vl) & (i < vl)
                online_update(jnp.where(mask, s, -jnp.inf), vb)

            @pl.when(kind == BLOCK_FULL)
            def _tile_full(ki=ki):
                s, vb = scores(ki)
                online_update(s, vb)

        l = l_s[:]
        out_ref[0, :] = (acc_s[:] /
                         jnp.where(l == 0.0, 1.0, l)).astype(out_ref.dtype)

    args = [meta, kinds, qf, kf, vf, doc_id_q, doc_id, nbr_bits_q]
    if use_mask_tiles:
        if mask_tiles is None:  # precomputable once per prefill, like kinds
            mask_tiles = tile_masks_from_metadata(
                doc_id, nbr_bits, sys_user_len, valid_len, block_q, block_k,
                doc_id_q=doc_id_q, nbr_bits_q=nbr_bits_q, q_offset=q_offset)
        if mask_tiles.shape != (B, nq, nk, block_q, block_k):
            raise ValueError(
                f"mask_tiles shape {mask_tiles.shape} does not match the "
                f"resolved blocks {(B, nq, nk, block_q, block_k)} — build "
                "it with prefill_mask_plan so block choices agree")
        args.append(mask_tiles)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * H, Lq, Dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)

    return out.reshape(B, H, Lq, Dh)


def _kvres_worklist_call(qf, kf, vf, meta, kinds, doc_id, doc_id_q,
                         nbr_bits_q, *, B, H, n_kv, n_rep, Lq, L, Dh,
                         block_q, block_k, scale, interpret, out_dtype):
    """KV-resident schedule driven by a packed live-tile worklist — the
    ``worklist=True`` body of :func:`sdag_flash_attention_kvres`.  K/V for
    the (b, kv-head) stay resident in VMEM exactly like the unrolled kvres
    kernel; the inner loop is a dynamic ``fori_loop`` over only the tiles
    `_pack_kv_lists` marked live, so SKIP tiles cost zero branches and the
    kernel body is emitted once instead of nk times."""
    counts, kv_list, kind_list = _pack_kv_lists(kinds)
    nq, nk = Lq // block_q, L // block_k

    def kv_index(bh, qi, *_):
        return ((bh // H) * n_kv + (bh % H) // n_rep, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # meta, counts, kv_list, kind_list
        grid=(B * H, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, Dh), lambda bh, qi, *_: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, Dh), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, Dh), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, block_q), lambda bh, qi, *_: (0, qi),
                         memory_space=pltpu.VMEM),
            # KEY doc_id pre-tiled [B, nK, block_k]: the dynamic kv_idx
            # lookup lands on a sublane dim at lane offset 0 (same Mosaic
            # rule the splash kernel obeys)
            pl.BlockSpec((B, nk, block_k), lambda bh, qi, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, block_q), lambda bh, qi, *_: (0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dh),
                               lambda bh, qi, *_: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, Dh), jnp.float32),
        ],
    )

    def kernel(meta_smem, counts_smem, kvlist_smem, kindlist_smem,
               q_ref, k_ref, v_ref, dq_ref, dall_ref, nbr_ref,
               out_ref, m_s, l_s, acc_s):
        bh = pl.program_id(0)
        qi = pl.program_id(1)
        b = bh // H
        cnt = counts_smem[b, qi]
        sul = meta_smem[b, 0]
        vl = meta_smem[b, 1]
        qoff = meta_smem[b, 2]

        m_s[:] = jnp.full_like(m_s, -jnp.inf)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

        qb = q_ref[0].astype(jnp.bfloat16)
        dq = dq_ref[b, :].reshape(block_q, 1)
        nbr_q = nbr_ref[b, :].reshape(block_q, 1)
        i = qoff + qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)

        def body(t, _):
            kv_idx = kvlist_smem[b, qi, t]
            kind = kindlist_smem[b, qi, t]
            kb = k_ref[0, pl.ds(kv_idx * block_k, block_k), :]
            vb = v_ref[0, pl.ds(kv_idx * block_k, block_k), :]
            s = jax.lax.dot_general(
                qb, kb.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale

            def apply_mask(s):
                j = kv_idx * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1)
                dk = dall_ref[b, kv_idx, :].reshape(1, block_k)
                mask = _tile_mask(i, j, dq, dk, nbr_q, sul, vl)
                return jnp.where(mask, s, -jnp.inf)

            # PARTIAL and CAUSAL both evaluate the exact rule (it subsumes
            # causal&valid); only FULL skips the VPU mask work
            s = jax.lax.cond(kind != BLOCK_FULL, apply_mask, lambda s: s, s)

            m_prev = m_s[:]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            safe_m = jnp.where(jnp.isneginf(m_new), 0.0, m_new)
            alpha = jnp.where(jnp.isneginf(m_prev), 0.0,
                              jnp.exp(m_prev - safe_m))
            p = jnp.exp(s - safe_m)
            l_s[:] = l_s[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc_s[:] = acc_s[:] * alpha + jax.lax.dot_general(
                p.astype(jnp.bfloat16), vb.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_s[:] = m_new
            return 0

        jax.lax.fori_loop(0, cnt, body, 0)
        l = l_s[:]
        out_ref[0, :] = (acc_s[:] /
                         jnp.where(l == 0.0, 1.0, l)).astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * H, Lq, Dh), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(meta, counts, kv_list, kind_list, qf, kf, vf, doc_id_q,
      doc_id.reshape(B, nk, block_k), nbr_bits_q)
    return out.reshape(B, H, Lq, Dh)


def _pack_kv_lists(kinds: jax.Array):
    """From block kinds [B, nQ, nK] build per-(b, q-block) worklists:
    counts [B, nQ], kv indices [B, nQ, nK] (needed tiles packed to the
    front in ascending kv order), and their kinds."""
    needed = kinds > BLOCK_SKIP
    order = jnp.argsort(~needed, axis=-1, stable=True)
    kv_list = order.astype(jnp.int32)
    kind_list = jnp.take_along_axis(kinds, order, axis=-1)
    counts = jnp.sum(needed, axis=-1).astype(jnp.int32)
    return counts, kv_list, kind_list


def _splash_kernel(meta_ref, counts_ref, kvlist_ref, kindlist_ref,
                   q_ref, k_hbm, v_hbm, dq_ref, dall_ref, nbr_ref,
                   out_ref, k_buf, v_buf, sems, m_scratch, l_scratch,
                   acc_scratch, *, block_q: int, block_k: int, scale: float,
                   n_heads: int, n_rep: int):
    """Grid: (B*H, nQ).  Only the kv tiles on this q-block's worklist are
    DMA'd from HBM (double-buffered) and computed — the splash design: block
    sparsity saves bandwidth, not just MXU work.  GQA-native: k/v stay
    grouped in HBM ([B*n_kv, L, Dh]); each q head DMAs from its shared kv
    head, so grouped heads never materialize the repeat."""
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    b = bh // n_heads
    kvh = b * (n_heads // n_rep) + (bh % n_heads) // n_rep
    cnt = counts_ref[b, qi]
    sys_user_len = meta_ref[b, 0]
    valid_len = meta_ref[b, 1]
    q_offset = meta_ref[b, 2]

    m_scratch[:] = jnp.full_like(m_scratch, -jnp.inf)
    l_scratch[:] = jnp.zeros_like(l_scratch)
    acc_scratch[:] = jnp.zeros_like(acc_scratch)

    def start_dma(slot, t):
        kv_idx = kvlist_ref[b, qi, t]
        start = kv_idx * block_k
        pltpu.make_async_copy(
            k_hbm.at[kvh, pl.ds(start, block_k), :], k_buf.at[slot],
            sems.at[slot, 0]).start()
        pltpu.make_async_copy(
            v_hbm.at[kvh, pl.ds(start, block_k), :], v_buf.at[slot],
            sems.at[slot, 1]).start()

    def wait_dma(slot, t):
        kv_idx = kvlist_ref[b, qi, t]
        start = kv_idx * block_k
        pltpu.make_async_copy(
            k_hbm.at[kvh, pl.ds(start, block_k), :], k_buf.at[slot],
            sems.at[slot, 0]).wait()
        pltpu.make_async_copy(
            v_hbm.at[kvh, pl.ds(start, block_k), :], v_buf.at[slot],
            sems.at[slot, 1]).wait()

    NBUF = 4

    @pl.when(cnt > 0)
    def _run():
        # warm up: issue up to NBUF-1 DMAs ahead
        for w in range(NBUF - 1):
            @pl.when(w < cnt)
            def _warm(w=w):
                start_dma(w % NBUF, w)

        def body(t, _):
            slot = jax.lax.rem(t, NBUF)

            @pl.when(t + NBUF - 1 < cnt)
            def _prefetch():
                start_dma(jax.lax.rem(t + NBUF - 1, NBUF), t + NBUF - 1)

            wait_dma(slot, t)
            kv_idx = kvlist_ref[b, qi, t]
            kind = kindlist_ref[b, qi, t]

            s = jax.lax.dot_general(
                q_ref[0].astype(jnp.bfloat16),
                k_buf[slot].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale

            def apply_mask(s):
                i = q_offset + qi * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0)
                j = kv_idx * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1)
                dq = dq_ref[b, :].reshape(block_q, 1)
                # dall_ref is pre-tiled [B, nK, block_k] so this dynamic
                # load sits at lane offset 0 (Mosaic rejects dynamic loads
                # at non-zero lane offsets — same rule as the kvres kernel)
                dk = dall_ref[b, kv_idx, :].reshape(1, block_k)
                nbr_q = nbr_ref[b, :].reshape(block_q, 1)
                mask = _tile_mask(i, j, dq, dk, nbr_q, sys_user_len,
                                  valid_len)
                return jnp.where(mask, s, -jnp.inf)

            # PARTIAL and CAUSAL both evaluate the exact rule here (the
            # full rule subsumes causal&valid); only FULL skips it
            s = jax.lax.cond(kind != BLOCK_FULL, apply_mask,
                             lambda s: s, s)

            m_prev = m_scratch[:]
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            safe_m = jnp.where(jnp.isneginf(m_new), 0.0, m_new)
            alpha = jnp.where(jnp.isneginf(m_prev), 0.0,
                              jnp.exp(m_prev - safe_m))
            p = jnp.exp(s - safe_m)
            l_scratch[:] = l_scratch[:] * alpha + jnp.sum(p, axis=1,
                                                          keepdims=True)
            acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot_general(
                p.astype(jnp.bfloat16), v_buf[slot].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_scratch[:] = m_new
            return 0

        jax.lax.fori_loop(0, cnt, body, 0)

    l = l_scratch[:]
    out_ref[0, :] = (acc_scratch[:] /
                     jnp.where(l == 0.0, 1.0, l)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "scale",
                                             "interpret"))
def sdag_splash_attention(q, k, v, doc_id, nbr_bits, sys_user_len,
                          valid_len=None, block_q: int = 256,
                          block_k: int = 256, scale: Optional[float] = None,
                          interpret: bool = False,
                          doc_id_q=None, nbr_bits_q=None, q_offset=None,
                          kinds=None):
    """Splash-style SDAG flash attention: per-q-block worklists of needed kv
    tiles, manual double-buffered HBM->VMEM DMA.  Bandwidth and compute both
    scale with the *visible* attention area — the large-L regime where the
    kvres schedule no longer fits VMEM and the grid kernel would DMA every
    tile including SKIPs (``SDAG.py:68-127``: the mask is the long-context
    mechanism).

    Same contract as sdag_flash_attention: GQA kv heads stay grouped (each
    q head DMAs from its shared kv head), and context-parallel q-row slices
    pass doc_id_q/nbr_bits_q/q_offset.
    """
    B, H, Lq, Dh = q.shape
    L = k.shape[2]
    n_kv = k.shape[1]
    if H % n_kv:
        raise ValueError(f"q heads {H} not a multiple of kv heads {n_kv}")
    n_rep = H // n_kv
    scale = scale if scale is not None else Dh ** -0.5
    block_q = min(block_q, Lq)
    block_k = min(block_k, L)
    if Lq % block_q or L % block_k:
        raise ValueError(f"Lq={Lq}/Lk={L} must divide the block sizes")
    if doc_id_q is None:
        doc_id_q = doc_id
    if nbr_bits_q is None:
        nbr_bits_q = nbr_bits

    sys_user_len = jnp.broadcast_to(jnp.asarray(sys_user_len, jnp.int32),
                                    (B,))
    valid_len = (jnp.broadcast_to(jnp.asarray(valid_len, jnp.int32), (B,))
                 if valid_len is not None
                 else jnp.full((B,), L, jnp.int32))
    q_offset = (jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (B,))
                if q_offset is not None else jnp.zeros((B,), jnp.int32))
    meta = jnp.stack([sys_user_len, valid_len, q_offset], axis=1)
    if kinds is None:  # multi-layer callers precompute via prefill_mask_plan
        kinds = compute_block_kinds(doc_id, nbr_bits, sys_user_len,
                                    valid_len, block_q, block_k,
                                    doc_id_q=doc_id_q,
                                    nbr_bits_q=nbr_bits_q, q_offset=q_offset)
    counts, kv_list, kind_list = _pack_kv_lists(kinds)

    qf = q.reshape(B * H, Lq, Dh)
    kf = k.reshape(B * n_kv, L, Dh)
    vf = v.reshape(B * n_kv, L, Dh)
    nq = Lq // block_q

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # meta, counts, kv_list, kind_list
        grid=(B * H, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, Dh),
                         lambda bh, qi, *_: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # k stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # v stays in HBM
            pl.BlockSpec((B, block_q), lambda bh, qi, *_: (0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, L // block_k, block_k),
                         lambda bh, qi, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),  # KEY doc_id, kv-tiled
            pl.BlockSpec((B, block_q), lambda bh, qi, *_: (0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dh),
                               lambda bh, qi, *_: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            # staging buffers receive raw HBM bytes of k/v — they must be
            # typed k/v dtype, not q dtype (a bf16-q/f32-kv call would
            # otherwise DMA into a mismatched buffer)
            pltpu.VMEM((4, block_k, Dh), k.dtype),
            pltpu.VMEM((4, block_k, Dh), v.dtype),
            pltpu.SemaphoreType.DMA((4, 2)),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, Dh), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_splash_kernel, block_q=block_q, block_k=block_k,
                          scale=scale, n_heads=H, n_rep=n_rep),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * H, Lq, Dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(meta, counts, kv_list, kind_list, qf, kf, vf, doc_id_q,
      doc_id.reshape(B, L // block_k, block_k), nbr_bits_q)
    return out.reshape(B, H, Lq, Dh)


# One (b, kv-head)'s K+V must fit comfortably in VMEM for the KV-resident
# schedule (16MB scoped limit; leave room for q/out/scratch).
def _kvres_fits_vmem(k: jax.Array) -> bool:
    """KV-resident schedule auto-pick: one head's K+V staging must fit
    scoped VMEM.  Mosaic pads the minor (lane) dim to 128, so Dh < 128
    inflates the staged block 128/Dh-fold (measured: L=15360/Dh=16/f32
    allocated 31.75M, exactly the lane-padded size), and stage buffers
    are double-buffered (~2.2x measured at L=16384/Dh=128/bf16 ->
    17.81M vs 8M raw).  Budget = 14MB of the 16MB scoped limit."""
    L, dh = k.shape[2], k.shape[3]
    staged = 2 * L * max(dh, 128) * k.dtype.itemsize
    return staged * 2.2 <= 14 * 1024 * 1024


def _resolve_prefill_impl(q, k, impl: str, block_q=None,
                          block_k=None) -> str:
    """The dispatcher's impl choice, shared with prefill_mask_plan.

    block_q/block_k: caller block-size overrides — the divisibility
    fallback tests against the actual kernel granularity, so e.g. a
    64-row context-parallel shard with block_q=64 stays on Pallas."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl in ("pallas", "pallas_kvres", "pallas_splash") and (
            q.shape[2] % (block_q or 128) or k.shape[2] % (block_k or 128)):
        impl = "xla"  # unpadded lengths fall back to the dense-mask path
    if impl == "pallas":
        # KV-resident schedule while one head's K+V fits VMEM; beyond that
        # (L ≳ 16k bf16) the splash schedule, whose manual per-worklist DMA
        # skips the HBM traffic of SKIP tiles — the grid kernel would DMA
        # every tile in exactly the regime sparsity should save bandwidth
        impl = ("pallas_kvres" if _kvres_fits_vmem(k) else "pallas_splash")
    return impl


def prefill_mask_plan(q, k, doc_id, nbr_bits, sys_user_len, valid_len=None,
                      impl: str = "auto", use_mask_tiles: bool = False,
                      doc_id_q=None, nbr_bits_q=None, q_offset=None,
                      block_q=None, block_k=None):
    """Precompute the LAYER-INVARIANT prefill mask metadata once.

    The block kinds ([B, nQ, nK]) and optional int8 mask tiles depend
    only on (doc layout, lengths), yet every per-layer attention call
    re-derives them — and XLA does NOT CSE the duplication across layer
    subgraphs (measured: compiled-HLO iota count scales linearly with
    n_layers), so an n-layer prefill pays n× the O(L²) mask work and,
    with mask tiles, n× the [B, Lq, Lk] materialization.  Callers with
    multiple layers (``models/llama.py prefill``) call this once and
    pass the result to every ``sdag_prefill_attention(mask_plan=...)``.

    Resolves impl/block sizes exactly like the dispatcher; returns None
    when the resolved path is XLA (the reference builds its own mask).
    """
    impl = _resolve_prefill_impl(q, k, impl, block_q, block_k)
    if impl == "xla":
        return None
    Lq, L = q.shape[2], k.shape[2]
    if impl == "pallas_kvres":  # kvres auto-picks large MXU tiles
        bq = min(block_q, Lq) if block_q else _pick_block(Lq)
        bk = min(block_k, L) if block_k else _pick_block(L)
    elif impl == "pallas_splash":  # splash defaults mirror its signature
        bq = min(block_q or 256, Lq)
        bk = min(block_k or 256, L)
    else:  # the grid kernel defaults to 128 blocks — keep that choice
        bq = min(block_q or 128, Lq)
        bk = min(block_k or 128, L)
    use_mask_tiles = (use_mask_tiles and impl == "pallas_kvres"
                      and _mask_tiles_fit(L, bq))
    B = q.shape[0]
    sul = jnp.broadcast_to(jnp.asarray(sys_user_len, jnp.int32), (B,))
    vl = (jnp.broadcast_to(jnp.asarray(valid_len, jnp.int32), (B,))
          if valid_len is not None else jnp.full((B,), L, jnp.int32))
    qo = (jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (B,))
          if q_offset is not None else jnp.zeros((B,), jnp.int32))
    kinds = compute_block_kinds(doc_id, nbr_bits, sul, vl, bq, bk,
                                doc_id_q=doc_id_q, nbr_bits_q=nbr_bits_q,
                                q_offset=qo)
    tiles = None
    if use_mask_tiles:
        tiles = tile_masks_from_metadata(doc_id, nbr_bits, sul, vl, bq, bk,
                                         doc_id_q=doc_id_q,
                                         nbr_bits_q=nbr_bits_q, q_offset=qo)
    return {"impl": impl, "block_q": bq, "block_k": bk,
            "use_mask_tiles": use_mask_tiles, "kinds": kinds,
            "mask_tiles": tiles}


def sdag_prefill_attention(q, k, v, doc_id, nbr_bits, sys_user_len,
                           valid_len=None, impl: str = "auto", **kw):
    """Dispatch: Pallas flash kernel on TPU (KV-resident schedule when one
    head's K+V fits VMEM — ~10% faster, zero DMA for skipped tiles; the
    manual-DMA splash schedule beyond that, where skipping a tile must save
    HBM bandwidth, not just MXU work), XLA reference elsewhere.

    use_mask_tiles=True (callers with real doc structure, e.g. the ISO
    prefill) streams precomputed int8 mask tiles instead of recomputing
    the SDAG rule per (layer, head, tile) — measured 1.59 -> 1.11 ms on
    the L=4096/20-doc bench geometry; kvres-only, auto-disabled when a
    mask strip exceeds the VMEM budget.

    mask_plan: a ``prefill_mask_plan`` result (or None) — multi-layer
    callers precompute the layer-invariant kinds/tiles once instead of
    paying the O(L²) derivation per layer."""
    use_mask_tiles = bool(kw.pop("use_mask_tiles", False))
    plan = kw.pop("mask_plan", None)
    if plan is not None:
        impl = plan["impl"]
        use_mask_tiles = plan["use_mask_tiles"]
        # the plan's kinds/tiles are derived for the plan's block sizes —
        # a caller override would make the kernel index kinds_smem out of
        # bounds and silently mis-kind live tiles, so reject it loudly
        # (mask_tiles already get a shape check inside the kernel wrapper)
        for name in ("block_q", "block_k"):
            if kw.setdefault(name, plan[name]) != plan[name]:
                raise ValueError(
                    f"{name}={kw[name]} conflicts with mask_plan's "
                    f"{plan[name]} — rebuild the plan with prefill_mask_plan"
                    f"({name}=...) instead of overriding it per call")
        kw.setdefault("kinds", plan["kinds"])
        if use_mask_tiles:
            kw.setdefault("mask_tiles", plan["mask_tiles"])
    else:
        impl = _resolve_prefill_impl(q, k, impl, kw.get("block_q"),
                                     kw.get("block_k"))
    if impl == "pallas_kvres":
        return sdag_flash_attention_kvres(q, k, v, doc_id, nbr_bits,
                                          sys_user_len, valid_len=valid_len,
                                          use_mask_tiles=use_mask_tiles,
                                          **kw)
    if impl == "pallas_splash":
        kw.pop("mask_tiles", None)  # tiles are a kvres-only optimization
        return sdag_splash_attention(q, k, v, doc_id, nbr_bits, sys_user_len,
                                     valid_len=valid_len, **kw)
    if impl == "pallas":
        return sdag_flash_attention(q, k, v, doc_id, nbr_bits, sys_user_len,
                                    valid_len=valid_len, **kw)
    # XLA fallback: forward the SEMANTIC kwargs (context-parallel q-slice
    # metadata + scale) — dropping them would silently compute the wrong
    # mask for CP callers; kernel tuning knobs (block_q/block_k/...) have
    # no XLA meaning and are discarded.
    xla_kw = {name: kw[name] for name in
              ("scale", "q_offset", "doc_id_q", "nbr_bits_q") if name in kw}
    return sdag_attention_reference(q, k, v, doc_id, nbr_bits, sys_user_len,
                                    valid_len=valid_len, **xla_kw)


def masked_decode_attention(q, k_cache, v_cache, cache_mask):
    """Single-step decode attention over a KV cache.

    q: [B, H, Dh]; caches: [B, Hkv, S, Dh] with Hkv dividing H (GQA groups
    contract directly — the repeated kv is never materialized, which is the
    difference between O(cache) and O(cache * n_rep) HBM traffic per step);
    cache_mask: [B, S] marks valid slots.  Plain causal over the whole cache
    — reference decode semantics (``SDAG.py:191-208``).
    """
    B, H, Dh = q.shape
    hkv = k_cache.shape[1]
    rep = H // hkv
    qg = q.reshape(B, hkv, rep, Dh)
    scores = jnp.einsum("bgrd,bgjd->bgrj", qg, k_cache,
                        preferred_element_type=jnp.float32) * Dh ** -0.5
    scores = jnp.where(cache_mask[:, None, None, :], scores,
                       DEFAULT_MASK_VALUE)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bgrj,bgjd->bgrd", probs.astype(v_cache.dtype), v_cache)
    return out.reshape(B, H, Dh)


def masked_decode_attention_int8(q, k_i8, v_i8, k_scale, v_scale,
                                 cache_mask):
    """masked_decode_attention over an int8-quantized KV cache.

    Caches are int8 [B, Hkv, S, Dh] with per-(slot, head) f32 scales
    [B, Hkv, S] (absmax over Dh).  Both scales fold linearly: the k scale
    multiplies the dot products, the v scale folds into the probabilities
    before the value contraction — numerics differ from bf16 only by the
    8-bit quantization error.  Halves decode KV HBM traffic (the dominant
    stream at serving batch sizes: B=32 reads 3GB/step of KV vs 2GB of
    weights on the 1B bench model).
    """
    B, H, Dh = q.shape
    hkv = k_i8.shape[1]
    rep = H // hkv
    qg = q.reshape(B, hkv, rep, Dh)
    scores = jnp.einsum("bgrd,bgjd->bgrj", qg,
                        k_i8.astype(q.dtype),
                        preferred_element_type=jnp.float32)
    scores = scores * k_scale[:, :, None, :] * Dh ** -0.5
    scores = jnp.where(cache_mask[:, None, None, :], scores,
                       DEFAULT_MASK_VALUE)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = probs * v_scale[:, :, None, :]
    out = jnp.einsum("bgrj,bgjd->bgrd", probs.astype(q.dtype),
                     v_i8.astype(q.dtype),
                     preferred_element_type=jnp.float32)
    return out.reshape(B, H, Dh).astype(q.dtype)


def masked_decode_window_attention(q, k_cache, v_cache, cache_mask):
    """Multi-token decode attention for speculative verification windows.

    q: [B, H, G, Dh] (G window tokens per row); caches: [B, Hkv, S, Dh];
    cache_mask: [B, G, S] — per window row, the valid cache slots (history
    plus the within-window causal prefix).  Same GQA group contraction as
    :func:`masked_decode_attention`; G is small (the draft length), so the
    step stays KV-bandwidth-bound like single-token decode — the whole
    point of speculative decoding on TPU.
    """
    B, H, G, Dh = q.shape
    hkv = k_cache.shape[1]
    rep = H // hkv
    qg = q.reshape(B, hkv, rep, G, Dh)
    scores = jnp.einsum("bgrtd,bgjd->bgrtj", qg, k_cache,
                        preferred_element_type=jnp.float32) * Dh ** -0.5
    scores = jnp.where(cache_mask[:, None, None, :, :], scores,
                       DEFAULT_MASK_VALUE)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bgrtj,bgjd->bgrtd", probs.astype(v_cache.dtype),
                     v_cache)
    return out.reshape(B, H, G, Dh)


def masked_decode_window_attention_int8(q, k_i8, v_i8, k_scale, v_scale,
                                        cache_mask):
    """:func:`masked_decode_window_attention` over an int8 KV cache.

    Same scale folding as :func:`masked_decode_attention_int8` (k scale
    into the dots, v scale into the probabilities), with the window's
    [B, G, S] per-row mask — the speculative verification step keeps the
    int8 cache's halved KV traffic.
    """
    B, H, G, Dh = q.shape
    hkv = k_i8.shape[1]
    rep = H // hkv
    qg = q.reshape(B, hkv, rep, G, Dh)
    scores = jnp.einsum("bgrtd,bgjd->bgrtj", qg, k_i8.astype(q.dtype),
                        preferred_element_type=jnp.float32)
    scores = scores * k_scale[:, :, None, None, :] * Dh ** -0.5
    scores = jnp.where(cache_mask[:, None, None, :, :], scores,
                       DEFAULT_MASK_VALUE)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = probs * v_scale[:, :, None, None, :]
    out = jnp.einsum("bgrtj,bgjd->bgrtd", probs.astype(q.dtype),
                     v_i8.astype(q.dtype),
                     preferred_element_type=jnp.float32)
    return out.reshape(B, H, G, Dh).astype(q.dtype)


def quantize_kv_heads_int8(x):
    """Per-(.., slot) symmetric int8 quantization over the head dim.
    x: [..., S, Dh] -> (int8 values, f32 scales [..., S]).  Shares the
    quantization rule with the retrieval index (ops/topk.py)."""
    from sdag_tpu.ops.topk import quantize_last_axis_int8
    return quantize_last_axis_int8(x)

