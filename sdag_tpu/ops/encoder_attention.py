"""Fused bidirectional (encoder) attention for the E5 ranker.

The naive BERT attention materializes the [B, H, L, L] score and prob
tensors in HBM every layer — at e5-large geometry (B=64, H=16, L=256)
that's ~270 MB of f32 round-trips per layer, and an on-chip ablation
(round 3) put the full attention block at 33 ms of the 102 ms forward
(~8x its ideal FLOP cost).  This kernel keeps one batch row's scores
entirely in VMEM: q@k^T, prefix mask, softmax and probs@v fuse into a
single Pallas program per batch row.

Layout contract: the packed entry takes the QKV projection output
[B, L, 3d] AS-IS (column order [q heads | k heads | v heads], i.e.
models.e5.fuse_qkv_params layout), so the caller pays neither the
jnp.split copies (3x [B, L, d], measured 8 ms/forward) nor the
[B,L,H,Dh] -> [B,H,L,Dh] HBM transpose round-trips (~8 ms/forward).
Heads are carved out in-kernel with static lax.slice on the lane axis
(VPU lane rotates — cheap next to the HBM passes they replace; Mosaic
rejects per-head BlockSpecs here, block last-two-dims rule).  The output
is assembled [L, d] in VMEM and written once, ready for the output
projection with no reshape/transpose.

Softmax economics (VPU-bound at this geometry): the division is deferred
past the PV matmul — normalize the [L, Dh] context instead of the [L, L]
probs — and the full-row case (valid_len == L, the common bucketed-batch
case) skips the mask select pass entirely via pl.when specialization.

Encoder sequences here are short (L <= 512 after bucketing), so a full
[L, L] score tile fits VMEM comfortably (512^2 f32 = 1 MB) — no
streaming flash decomposition is needed, just fusion.

Masking contract: attention_mask rows are CONTIGUOUS PREFIXES (the
tokenizer right-pads), so the mask is carried as one valid-length scalar
per batch row (SMEM) instead of an [L] vector.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _one_head(q, k, v, vl, *, scale: float, masked: bool):
    # q/k/v: [L, Dh] (already per-head).  Scale folds into q ([L, Dh]
    # pass, 4x cheaper than scaling the [L, L] scores).
    q = q * jnp.asarray(scale, q.dtype)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if masked:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < vl, s, _NEG)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return o / denom


def _kernel(valid_ref, qkv_ref, o_ref, *, n_heads: int, dh: int,
            seq_len: int, scale: float):
    b = pl.program_id(0)
    vl = valid_ref[b]
    qkv = qkv_ref[0]          # [L, 3*H*Dh], one VMEM-resident row
    L = seq_len
    d = n_heads * dh

    def head_slice(base, h):
        lo = base + h * dh
        return jax.lax.slice(qkv, (0, lo), (L, lo + dh))

    def run(masked: bool):
        outs = []
        for h in range(n_heads):
            o = _one_head(head_slice(0, h), head_slice(d, h),
                          head_slice(2 * d, h), vl,
                          scale=scale, masked=masked)
            outs.append(o.astype(o_ref.dtype))
        o_ref[0] = jnp.concatenate(outs, axis=1)

    @pl.when(vl >= seq_len)
    def _():
        run(masked=False)

    @pl.when(vl < seq_len)
    def _():
        run(masked=True)


@functools.partial(jax.jit, static_argnames=("n_heads", "interpret"))
def encoder_attention_fused_qkv(qkv: jax.Array, valid_len: jax.Array,
                                n_heads: int, interpret: bool = False
                                ) -> jax.Array:
    """Packed-projection entry: qkv [B, L, 3d] — the fused QKV matmul
    output, untouched.  valid_len: [B] int32 prefix lengths.  Returns
    [B, L, d] in qkv's dtype, ready for the output projection.  Rows
    past valid_len attend the valid prefix uniformly (softmax over
    unmasked cols) — harmless, they are dropped by mean pooling."""
    B, L, d3 = qkv.shape
    d = d3 // 3
    dh = d // n_heads
    scale = dh ** -0.5
    return pl.pallas_call(
        functools.partial(_kernel, n_heads=n_heads, dh=dh, seq_len=L,
                          scale=scale),
        grid_spec=pl.GridSpec(
            grid=(B,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((1, L, d3), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, L, d), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((B, L, d), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(valid_len.astype(jnp.int32), qkv)


@functools.partial(jax.jit, static_argnames=("interpret",))
def encoder_attention_fused(q: jax.Array, k: jax.Array, v: jax.Array,
                            valid_len: jax.Array, interpret: bool = False
                            ) -> jax.Array:
    """Separate-tensor entry (test/compat surface): q/k/v [B, L, H, Dh].
    Packs to the [B, L, 3d] projection layout (one host concat) and runs
    the same kernel.  Production (models.e5) calls the packed entry
    directly and skips the concat.  Returns [B, L, H*Dh]."""
    B, L, H, Dh = q.shape
    packed = jnp.concatenate(
        [t.reshape(B, L, H * Dh) for t in (q, k, v)], axis=-1)
    return encoder_attention_fused_qkv(packed, valid_len, n_heads=H,
                                       interpret=interpret)


def encoder_attention_reference(q, k, v, valid_len):
    """XLA reference: identical math with the [B, H, L, L] materialized.
    q/k/v: [B, H, L, Dh] (head-major, for test readability)."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhid,bhjd->bhij", q, k,
                   preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
    s = jnp.where(col < valid_len[:, None, None, None], s, _NEG)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
