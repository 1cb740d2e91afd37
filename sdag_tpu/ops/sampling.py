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
    cumulative probability reaches top_p.  logits: [..., V]."""
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


@functools.partial(jax.jit, static_argnames=("temperature", "top_p"))
def sample_tokens(key: jax.Array, logits: jax.Array,
                  temperature: float = 0.0, top_p: float = 1.0) -> jax.Array:
    """Sample next tokens from [..., V] logits.  temperature==0 -> greedy."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    logits = top_p_filter(logits, top_p)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
