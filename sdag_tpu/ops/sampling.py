"""Token sampling: temperature + nucleus (top-p).

JAX-PRNG replacement for the reference's ``torch.multinomial`` sampling
(``SDAG.py:182-187``, ``content_generation.py:79-88``): temperature 0 means
greedy argmax, otherwise softmax sampling after top-p truncation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def top_p_filter(logits: jax.Array, top_p: float) -> jax.Array:
    """Mask logits outside the nucleus: keep the smallest set of tokens whose
    cumulative probability reaches top_p.  logits: [..., V].

    Exact (full-sort) variant — O(V log V) per call; the decode loop uses
    the top-k-bounded ``sample_tokens`` path instead (a full 128k-vocab sort
    costs ~1.7 ms/step on v5e, ~45% of a 1B-model decode step).
    """
    if top_p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # token ranked r is kept iff cumulative prob *before* it is < top_p
    keep_sorted = (cum - probs) < top_p
    # threshold = smallest kept logit
    threshold = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(logits >= threshold, logits, -jnp.inf)


@functools.partial(jax.jit,
                   static_argnames=("temperature", "top_p", "nucleus_topk"))
def sample_tokens(key: jax.Array, logits: jax.Array,
                  temperature: float = 0.0, top_p: float = 1.0,
                  nucleus_topk: int = 64) -> jax.Array:
    """Sample next tokens from [..., V] logits.  temperature==0 -> greedy.

    top_p < 1 uses a top-k-bounded nucleus: rank only the ``nucleus_topk``
    highest logits (``lax.top_k``, O(V*k)) instead of sorting the vocabulary.
    Identical to the exact filter whenever the nucleus fits in the top-k —
    for top_p <= 0.95 at sane temperatures the top-64 carries the nucleus;
    in the (vanishingly rare) flat-distribution case the sample is truncated
    to the top-``nucleus_topk`` tokens.
    """
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_p >= 1.0:
        return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
    kk = min(nucleus_topk, logits.shape[-1])
    vals, idx = jax.lax.top_k(logits, kk)          # sorted descending
    # True probabilities: normalize by the FULL-vocab partition function —
    # softmax over the top-k alone inflates the CDF and narrows the kept
    # set relative to the exact filter.
    vals, idx = _nucleus_vals_idx(logits, top_p, kk, presorted=(vals, idx))
    choice = jax.random.categorical(key, vals, axis=-1)
    return jnp.take_along_axis(idx, choice[..., None],
                               axis=-1)[..., 0].astype(jnp.int32)


def _nucleus_vals_idx(logits: jax.Array, top_p: float, nucleus_topk: int,
                      presorted=None):
    """Shared bounded-nucleus candidate set: (vals, idx) of the top-k
    logits with outside-nucleus entries masked to -inf — THE candidate
    set every sampler here draws from (same keep rule, full-vocab
    partition function for the CDF).  Single source of the rule:
    ``sample_tokens`` and the speculative accept/residual pair
    (``draft_accept_probs`` / ``sample_excluding``) must stay
    distribution-identical."""
    if presorted is not None:
        vals, idx = presorted
    else:
        kk = min(nucleus_topk, logits.shape[-1])
        vals, idx = jax.lax.top_k(logits, kk)
    logz = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    probs = jnp.exp(vals - logz)
    cum = jnp.cumsum(probs, axis=-1)
    keep = (cum - probs) < top_p                   # rank 0 always kept
    return jnp.where(keep, vals, -jnp.inf), idx


@functools.partial(jax.jit,
                   static_argnames=("temperature", "top_p", "nucleus_topk"))
def draft_accept_probs(logits: jax.Array, drafts: jax.Array,
                       temperature: float, top_p: float = 1.0,
                       nucleus_topk: int = 64) -> jax.Array:
    """P(draft token) under ``sample_tokens``' distribution, per position.

    logits: [..., V]; drafts: [...] token ids.  Used by speculative
    sampling: a deterministic (prob-1) draft is accepted with probability
    p(draft), which keeps the output distribution exactly equal to
    sampling from ``sample_tokens`` step by step.
    """
    logits = logits / temperature
    if top_p >= 1.0:
        logz = jax.nn.logsumexp(logits, axis=-1)
        ld = jnp.take_along_axis(logits, drafts[..., None], axis=-1)[..., 0]
        return jnp.exp(ld - logz)
    vals, idx = _nucleus_vals_idx(logits, top_p, nucleus_topk)
    # renormalize over the kept set (what the categorical in sample_tokens
    # does); a draft outside the kept set has probability 0
    logz = jax.nn.logsumexp(vals, axis=-1)
    hit = idx == drafts[..., None]
    ld = jnp.max(jnp.where(hit, vals, -jnp.inf), axis=-1)
    return jnp.exp(ld - logz)


@functools.partial(jax.jit,
                   static_argnames=("temperature", "top_p", "nucleus_topk"))
def sample_excluding(key: jax.Array, logits: jax.Array, excl: jax.Array,
                     temperature: float, top_p: float = 1.0,
                     nucleus_topk: int = 64) -> jax.Array:
    """Sample like ``sample_tokens`` but with token ``excl[b]`` removed
    (excl == -1 disables exclusion for that row).  logits: [B, V].

    This is the residual draw of speculative sampling with a prob-1
    draft: on rejection of d, the residual distribution max(p - δ_d, 0)
    renormalized is exactly p restricted to x != d.
    """
    logits = logits / temperature
    if top_p >= 1.0:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        masked = jnp.where(col == excl[:, None], -jnp.inf, logits)
        return jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)
    vals, idx = _nucleus_vals_idx(logits, top_p, nucleus_topk)
    vals = jnp.where(idx == excl[:, None], -jnp.inf, vals)
    choice = jax.random.categorical(key, vals, axis=-1)
    return jnp.take_along_axis(idx, choice[:, None],
                               axis=-1)[:, 0].astype(jnp.int32)
