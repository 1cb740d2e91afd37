"""Context parallelism: shard the SDAG prefill sequence over devices.

The reference never shards sequences (SURVEY.md §5), but the doc-block axis
is a natural context-parallel dimension: each device owns a contiguous slice
of q rows (and its slice of k/v), all-gathers k/v + key metadata over ICI,
and runs the block-sparse flash kernel on its slice with a global row
offset.  Outputs land already sharded on the sequence axis.

Block-kind skipping still applies per shard, so devices owning only doc
blocks do ~O(own-doc + prefix) work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from sdag_tpu.ops.attention import (DEFAULT_MASK_VALUE, _tile_mask,
                                    sdag_prefill_attention)


def context_parallel_prefill_attention(
    q, k, v, doc_id, nbr_bits, sys_user_len, valid_len, mesh: Mesh,
    axis: str = "model", impl: str = "auto",
    block_q=None, block_k=None,
    kv_exchange: str = "all_gather",
):
    """SDAG prefill attention with the sequence axis sharded over `axis`.

    q/k/v: [B, H|Hkv, L, Dh] with L divisible by (mesh[axis] * block size);
    doc_id/nbr_bits: [B, L]; sys_user_len/valid_len: [B].
    Returns [B, H, L, Dh] sharded on the sequence axis.

    kv_exchange:
      "all_gather" — keys ride the ICI once into every device; fastest,
        but per-device live KV is O(L).
      "ring" — ring attention: each device streams the n KV chunks via
        ``ppermute`` while folding them into running flash statistics;
        per-device live KV stays O(L/n) (VERDICT r1 item 7).  Chunk
        attention runs as XLA einsums with CHUNK-level block-kind
        skipping (``chunk_needed``) — ``impl``/``block_q``/``block_k``
        do not apply and an explicit Pallas request is rejected rather
        than silently ignored.
    """
    if kv_exchange == "ring":
        if impl not in ("auto", "xla"):
            raise ValueError(
                "kv_exchange='ring' computes chunk attention as XLA "
                f"einsums (chunk-level skipping); impl={impl!r} and "
                "block sizes do not apply — use kv_exchange='all_gather' "
                "for the Pallas tile kernel")
        return ring_prefill_attention(q, k, v, doc_id, nbr_bits,
                                      sys_user_len, valid_len, mesh, axis)
    n = mesh.shape[axis]
    L = q.shape[2]
    if L % n:
        raise ValueError(f"L={L} must divide the {axis} axis size {n}")
    shard_len = L // n

    def local(q_s, k_s, v_s, did_s, nbr_s, sul, vl):
        idx = jax.lax.axis_index(axis)
        offset = (idx * shard_len).astype(jnp.int32)
        # keys ride the ICI once; queries stay sharded
        k_full = jax.lax.all_gather(k_s, axis, axis=2, tiled=True)
        v_full = jax.lax.all_gather(v_s, axis, axis=2, tiled=True)
        did_full = jax.lax.all_gather(did_s, axis, axis=1, tiled=True)
        nbr_full = jax.lax.all_gather(nbr_s, axis, axis=1, tiled=True)
        # reuse the production dispatcher on the local shard — one impl
        # resolution (incl. the divisibility fallback and the kvres
        # schedule) instead of a drifting inline copy; it forwards the
        # CP kwargs (q_offset/doc_id_q/nbr_bits_q) to every path and
        # drops kernel knobs on the XLA fallback
        kernel_kw = {}
        if block_q is not None:
            kernel_kw["block_q"] = block_q
        if block_k is not None:
            kernel_kw["block_k"] = block_k
        return sdag_prefill_attention(
            q_s, k_full, v_full, did_full, nbr_full, sul, vl, impl=impl,
            doc_id_q=did_s, nbr_bits_q=nbr_s,
            q_offset=jnp.full((q_s.shape[0],), offset, jnp.int32),
            interpret=jax.default_backend() != "tpu", **kernel_kw)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, axis, None), P(None, None, axis, None),
                  P(None, None, axis, None), P(None, axis), P(None, axis),
                  P(None), P(None)),
        out_specs=P(None, None, axis, None),
        check_vma=False,
    )
    return fn(q, k, v, doc_id, nbr_bits, sys_user_len, valid_len)


def chunk_needed(did_q, nbr_q, did_k, i_max, j0, col_k, sys_user_len,
                 valid_len):
    """Chunk-level SDAG skip predicate for ring attention (per batch row).

    True iff ANY (q row, k col) pair between this device's q shard and
    the incoming k chunk can be visible under the ``_tile_mask`` rule —
    a conservative summary (doc-id bitmask overlap, neighbor-union
    overlap, causal extent, prefix presence), so predicate False implies
    the full tile mask is all-False (property-tested).

    did_q/nbr_q: [Ls] q-shard metadata; did_k: [Lc] chunk doc ids;
    i_max: last global q row; j0: chunk start col; col_k: [Lc] global
    cols of the chunk; scalars sys_user_len/valid_len.
    """
    valid_k = col_k < valid_len
    doc_k = (did_k >= 0) & valid_k
    docs_k_bits = jnp.bitwise_or.reduce(
        jnp.where(doc_k, jnp.left_shift(1, jnp.clip(did_k, 0, 31)), 0))
    has_nonhole_k = jnp.any((did_k != -2) & valid_k)
    has_prefix_k = jnp.any((did_k == -1) & (col_k < sys_user_len) & valid_k)

    doc_q = did_q >= 0
    docs_q_bits = jnp.bitwise_or.reduce(
        jnp.where(doc_q, jnp.left_shift(1, jnp.clip(did_q, 0, 31)), 0))
    nbr_union = jnp.bitwise_or.reduce(jnp.where(doc_q, nbr_q, 0))
    has_nondoc_q = jnp.any(jnp.logical_not(doc_q))

    causal_overlap = (j0 <= i_max) & (j0 < valid_len)
    causal_need = causal_overlap & (
        (has_nondoc_q & has_nonhole_k)            # non-doc rows: causal all
        | ((docs_q_bits & docs_k_bits) != 0)      # same-doc diagonal
        | has_prefix_k)                           # doc rows -> sys/user
    nbr_need = (nbr_union & docs_k_bits) != 0     # full-span neighbors
    return causal_need | nbr_need


def ring_prefill_attention(q, k, v, doc_id, nbr_bits, sys_user_len,
                           valid_len, mesh: Mesh, axis: str = "model"):
    """Memory-scalable context parallelism: ring attention with the SDAG
    mask rule.

    Each device keeps its q slice and streams the n KV chunks around the
    ring (``jax.lax.ppermute``), folding every chunk into running online
    softmax statistics (m, l, acc) — the standard flash combine.  Peak live
    KV per device is one chunk, O(L/n), instead of the all-gather's O(L).
    Numerics are f32 accumulators, identical to the flash kernels; parity
    with ``sdag_attention_reference`` is tested on an 8-device mesh.
    """
    n = mesh.shape[axis]
    L = q.shape[2]
    if L % n:
        raise ValueError(f"L={L} must divide the {axis} axis size {n}")
    shard_len = L // n

    def local(q_s, k_s, v_s, did_s, nbr_s, sul, vl):
        idx = jax.lax.axis_index(axis)
        B, H, Ls, Dh = q_s.shape
        hkv = k_s.shape[1]
        rep = H // hkv
        scale = Dh ** -0.5

        i = (idx * shard_len
             + jax.lax.broadcasted_iota(jnp.int32, (Ls, shard_len), 0))
        j_local = jax.lax.broadcasted_iota(jnp.int32, (Ls, shard_len), 1)

        qg = (q_s.reshape(B, hkv, rep, Ls, Dh).astype(jnp.float32) * scale)
        m0 = jnp.full((B, hkv, rep, Ls), DEFAULT_MASK_VALUE, jnp.float32)
        l0 = jnp.zeros((B, hkv, rep, Ls), jnp.float32)
        acc0 = jnp.zeros((B, hkv, rep, Ls, Dh), jnp.float32)
        perm = [(d, (d + 1) % n) for d in range(n)]

        def fold(s, k_c, v_c, did_c, m, l, acc):
            src = (idx - s) % n
            j = src * shard_len + j_local
            col_k = src * shard_len + jnp.arange(shard_len, dtype=jnp.int32)
            i_max = idx * shard_len + Ls - 1

            # chunk-level block-kind skip: when no (q row, k col) pair of
            # this (shard, chunk) can be visible under the SDAG rule, skip
            # the O(Ls^2*Dh) score/update work entirely (the ppermute
            # still runs — the ring must keep moving).  chunk_needed=False
            # implies the full tile mask is all-False (property-tested).
            needed = jnp.any(jax.vmap(
                lambda dq, nq, dk, sul_b, vl_b: chunk_needed(
                    dq, nq, dk, i_max, src * shard_len, col_k, sul_b, vl_b)
            )(did_s, nbr_s, did_c, sul, vl))

            def compute(mla):
                m, l, acc = mla

                def mask_b(did_q_b, did_k_b, nbr_q_b, sul_b, vl_b):
                    return _tile_mask(i, j, did_q_b[:, None],
                                      did_k_b[None, :], nbr_q_b[:, None],
                                      sul_b, vl_b)

                mask = jax.vmap(mask_b)(did_s, did_c, nbr_s, sul, vl)
                s_raw = jnp.einsum("bgrld,bgjd->bgrlj", qg,
                                   k_c.astype(jnp.float32))
                s_msk = jnp.where(mask[:, None, None], s_raw,
                                  DEFAULT_MASK_VALUE)
                m_new = jnp.maximum(m, jnp.max(s_msk, axis=-1))
                p = jnp.exp(s_msk - m_new[..., None])
                p = jnp.where(mask[:, None, None], p, 0.0)
                corr = jnp.exp(m - m_new)
                l_new = l * corr + jnp.sum(p, axis=-1)
                acc_new = acc * corr[..., None] + jnp.einsum(
                    "bgrlj,bgjd->bgrld", p, v_c.astype(jnp.float32))
                return m_new, l_new, acc_new

            return jax.lax.cond(needed, compute, lambda mla: mla,
                                (m, l, acc))

        def body(s, carry):
            k_c, v_c, did_c, m, l, acc = carry
            m, l, acc = fold(s, k_c, v_c, did_c, m, l, acc)
            k_c = jax.lax.ppermute(k_c, axis, perm)
            v_c = jax.lax.ppermute(v_c, axis, perm)
            did_c = jax.lax.ppermute(did_c, axis, perm)
            return k_c, v_c, did_c, m, l, acc

        # only n-1 rotations are needed: the last chunk is folded outside
        # the loop so its three ppermutes (pure discarded ICI traffic,
        # ~1/n of the ring's exchange volume) never run
        k_c, v_c, did_c, m, l, acc = jax.lax.fori_loop(
            0, n - 1, body, (k_s, v_s, did_s, m0, l0, acc0))
        _, l, acc = fold(n - 1, k_c, v_c, did_c, m, l, acc)
        out = acc / jnp.maximum(l, 1e-30)[..., None]
        return out.reshape(B, H, Ls, Dh).astype(q_s.dtype)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, axis, None), P(None, None, axis, None),
                  P(None, None, axis, None), P(None, axis), P(None, axis),
                  P(None), P(None)),
        out_specs=P(None, None, axis, None),
        check_vma=False,
    )
    return fn(q, k, v, doc_id, nbr_bits, sys_user_len, valid_len)
