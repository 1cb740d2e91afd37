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


def _tile_mask(i, j, dq, dk, nbr_q, sys_user_len, valid_len):
    """Token-level SDAG attention rule for a [BQ, BK] tile.

    i, j: global row/col indices; dq, dk: doc ids (-1 = non-doc);
    nbr_q: neighbor bitmask of the q rows; sys_user_len/valid_len scalars.
    """
    causal = j <= i
    is_doc_q = dq >= 0
    same_doc = (dq == dk) & is_doc_q
    prefix = (dk == -1) & (j < sys_user_len)
    nbr = (dk >= 0) & (jnp.bitwise_and(
        jax.lax.shift_right_logical(nbr_q, jnp.maximum(dk, 0)), 1) == 1)
    doc_row = (causal & (same_doc | prefix)) | nbr
    mask = (is_doc_q & doc_row) | (jnp.logical_not(is_doc_q) & causal)
    return mask & (j < valid_len) & (i < valid_len)


def sdag_attention_reference(q, k, v, doc_id, nbr_bits, sys_user_len,
                             valid_len=None, scale: Optional[float] = None):
    """Dense-mask reference attention (XLA).  q,k,v: [B, H, L, Dh];
    doc_id/nbr_bits: [B, L]; sys_user_len: [B] or scalar.  Parity target for
    the Pallas kernel and the CPU fallback path."""
    B, H, L, Dh = q.shape
    scale = scale if scale is not None else Dh ** -0.5
    sys_user_len = jnp.broadcast_to(jnp.asarray(sys_user_len), (B,))
    valid_len = (jnp.broadcast_to(jnp.asarray(valid_len), (B,))
                 if valid_len is not None else jnp.full((B,), L))

    i = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)

    def one(qb, kb, vb, db, nb, sul, vl):
        mask = _tile_mask(i, j, db[:, None], db[None, :], nb[:, None],
                          sul, vl)
        scores = jnp.einsum("hid,hjd->hij", qb, kb,
                            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(mask[None], scores, DEFAULT_MASK_VALUE)
        probs = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("hij,hjd->hid", probs.astype(vb.dtype), vb)

    return jax.vmap(one)(q, k, v, doc_id, nbr_bits, sys_user_len, valid_len)


def _flash_kernel(sys_user_len, valid_len,
                  q_ref, k_ref, v_ref, dq_ref, dk_ref, nbr_ref,
                  out_ref, m_scratch, l_scratch, acc_scratch,
                  *, block_q: int, block_k: int, scale: float):
    """Grid: (B*H, nQ, nK) — kv innermost; online-softmax flash attention
    with the SDAG mask computed in-tile from metadata."""
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    i = qi * block_q + jax.lax.broadcasted_iota(jnp.int32,
                                                (block_q, block_k), 0)
    j = ki * block_k + jax.lax.broadcasted_iota(jnp.int32,
                                                (block_q, block_k), 1)
    dq = dq_ref[0, :].reshape(block_q, 1)
    dk = dk_ref[0, :].reshape(1, block_k)
    nbr_q = nbr_ref[0, :].reshape(block_q, 1)
    mask = _tile_mask(i, j, dq, dk, nbr_q, sys_user_len, valid_len)

    # Skip tiles with no visible pairs entirely (block-sparsity win).
    @pl.when(jnp.any(mask))
    def _compute():
        # bf16 MXU inputs, f32 accumulate (standard flash precision).
        s = jax.lax.dot_general(
            q_ref[0].astype(jnp.bfloat16), k_ref[0].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = jnp.where(mask, s, -jnp.inf)

        m_prev = m_scratch[:]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # Rows with no visible keys so far keep m=-inf; exp(-inf - -inf)
        # would be NaN, so guard the shift.
        safe_m = jnp.where(jnp.isneginf(m_new), 0.0, m_new)
        alpha = jnp.where(jnp.isneginf(m_prev), 0.0,
                          jnp.exp(m_prev - safe_m))
        p = jnp.where(mask, jnp.exp(s - safe_m), 0.0)

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
                         interpret: bool = False):
    """Pallas block-sparse flash attention.

    q,k,v: [B, H, L, Dh] with L a multiple of max(block_q, block_k)
    (caller pads; padded rows must have doc_id=-1 and be >= valid_len).
    doc_id/nbr_bits: [B, L] int32; sys_user_len, valid_len: [B] int32.
    """
    B, H, L, Dh = q.shape
    if k.shape[1] != H:
        raise ValueError("repeat kv heads to H before calling (GQA handled "
                         "by caller)")
    scale = scale if scale is not None else Dh ** -0.5
    block_q = min(block_q, L)
    block_k = min(block_k, L)
    if L % block_q or L % block_k:
        raise ValueError(f"L={L} must be divisible by block sizes")

    sys_user_len = jnp.broadcast_to(jnp.asarray(sys_user_len, jnp.int32), (B,))
    valid_len = (jnp.broadcast_to(jnp.asarray(valid_len, jnp.int32), (B,))
                 if valid_len is not None
                 else jnp.full((B,), L, jnp.int32))
    meta = jnp.stack([sys_user_len, valid_len], axis=1)  # [B, 2]

    qf = q.reshape(B * H, L, Dh)
    kf = k.reshape(B * H, L, Dh)
    vf = v.reshape(B * H, L, Dh)

    nq, nk = L // block_q, L // block_k

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * H, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, Dh), lambda bh, qi, ki, meta: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, Dh), lambda bh, qi, ki, meta: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, Dh), lambda bh, qi, ki, meta: (bh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q), lambda bh, qi, ki, meta: (bh // H, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k), lambda bh, qi, ki, meta: (bh // H, ki),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q), lambda bh, qi, ki, meta: (bh // H, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, Dh),
                               lambda bh, qi, ki, meta: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, Dh), jnp.float32),
        ],
    )

    def kernel(meta_smem, q_ref, k_ref, v_ref, dq_ref, dk_ref, nbr_ref,
               out_ref, m_s, l_s, acc_s):
        bh = pl.program_id(0)
        b = bh // H
        _flash_kernel(meta_smem[b, 0], meta_smem[b, 1],
                      q_ref, k_ref, v_ref, dq_ref, dk_ref,
                      nbr_ref, out_ref, m_s, l_s, acc_s,
                      block_q=block_q, block_k=block_k, scale=scale)

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * H, L, Dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(meta, qf, kf, vf, doc_id, doc_id, nbr_bits)

    return out.reshape(B, H, L, Dh)


def sdag_prefill_attention(q, k, v, doc_id, nbr_bits, sys_user_len,
                           valid_len=None, impl: str = "auto", **kw):
    """Dispatch: Pallas flash kernel on TPU, XLA reference elsewhere."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        return sdag_flash_attention(q, k, v, doc_id, nbr_bits, sys_user_len,
                                    valid_len=valid_len, **kw)
    return sdag_attention_reference(q, k, v, doc_id, nbr_bits, sys_user_len,
                                    valid_len=valid_len)


def causal_decode_attention(q, k_cache, v_cache, cache_len):
    """Single-step decode attention over a KV cache.

    q: [B, H, Dh]; k_cache/v_cache: [B, H, Lmax, Dh]; cache_len: [B] number
    of valid cache entries (the new token's k/v must already be written).
    Plain causal over the whole cache — reference decode semantics.
    """
    B, H, Lmax, Dh = k_cache.shape
    scale = Dh ** -0.5
    scores = jnp.einsum("bhd,bhjd->bhj", q, k_cache,
                        preferred_element_type=jnp.float32) * scale
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, 1, Lmax), 2)
    mask = pos < cache_len[:, None, None]
    scores = jnp.where(mask, scores, DEFAULT_MASK_VALUE)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhj,bhjd->bhd", probs.astype(v_cache.dtype), v_cache)
