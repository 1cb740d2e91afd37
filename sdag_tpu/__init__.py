"""sdag_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for Sparse
Document-Attention RAG (SDAG) under corpus knowledge-poisoning attacks.

Re-designed from scratch for TPU hardware with the capabilities of the
reference pipeline (sagie-dekel/Sparse-Document-Attention-RAG-):

- dense retrieval   : HBM-resident embedding matrix + fused Pallas matmul/top-k
- sparse retrieval  : device-packed impact-scored postings + sparse-dot kernel
- hybrid retrieval  : seeded-split reciprocal-rank fusion
- SDAG generation   : block-sparse flash-attention prefill (Pallas) + causal
                      KV-cache decode under jax.lax control flow
- attacks           : PoisonedRAG-style injection, centroid-based selection,
                      doc corruption, on-the-fly content generation
- defenses          : none / embedding filter (ragdefender-equivalent) /
                      discern-and-answer (LLM classifier + JSONL cache)
- eval              : ACC/ASR metric tree with schema parity to the reference
"""

__version__ = "0.1.0"
