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

from sdag_tpu.ops.attention import (sdag_attention_reference,
                                    sdag_flash_attention)


def context_parallel_prefill_attention(
    q, k, v, doc_id, nbr_bits, sys_user_len, valid_len, mesh: Mesh,
    axis: str = "model", impl: str = "auto",
    block_q: int = 128, block_k: int = 128,
):
    """SDAG prefill attention with the sequence axis sharded over `axis`.

    q/k/v: [B, H|Hkv, L, Dh] with L divisible by (mesh[axis] * block size);
    doc_id/nbr_bits: [B, L]; sys_user_len/valid_len: [B].
    Returns [B, H, L, Dh] sharded on the sequence axis.
    """
    n = mesh.shape[axis]
    L = q.shape[2]
    if L % n:
        raise ValueError(f"L={L} must divide the {axis} axis size {n}")
    shard_len = L // n
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"

    def local(q_s, k_s, v_s, did_s, nbr_s, sul, vl):
        idx = jax.lax.axis_index(axis)
        offset = (idx * shard_len).astype(jnp.int32)
        # keys ride the ICI once; queries stay sharded
        k_full = jax.lax.all_gather(k_s, axis, axis=2, tiled=True)
        v_full = jax.lax.all_gather(v_s, axis, axis=2, tiled=True)
        did_full = jax.lax.all_gather(did_s, axis, axis=1, tiled=True)
        nbr_full = jax.lax.all_gather(nbr_s, axis, axis=1, tiled=True)
        if impl == "pallas":
            return sdag_flash_attention(
                q_s, k_full, v_full, did_full, nbr_full, sul, vl,
                block_q=block_q, block_k=block_k,
                doc_id_q=did_s, nbr_bits_q=nbr_s,
                q_offset=jnp.full((q_s.shape[0],), offset, jnp.int32),
                interpret=jax.default_backend() != "tpu")
        return sdag_attention_reference(
            q_s, k_full, v_full, did_full, nbr_full, sul, vl,
            q_offset=offset, doc_id_q=did_s, nbr_bits_q=nbr_s)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, axis, None), P(None, None, axis, None),
                  P(None, None, axis, None), P(None, axis), P(None, axis),
                  P(None), P(None)),
        out_specs=P(None, None, axis, None),
        check_vma=False,
    )
    return fn(q, k, v, doc_id, nbr_bits, sys_user_len, valid_len)
