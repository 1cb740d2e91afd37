"""Retriever interface.

Same contract as the reference ABC (``src/pipeline/retrieval/retriever.py:9-19``):
``retrieve_batch(queries, max_k_needed, embed_batch_size) -> RetrievalBatch``.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Sequence

from sdag_tpu.datamodels import RetrievalBatch


class Retriever(ABC):
    @abstractmethod
    def retrieve_batch(self, queries: Sequence[str], max_k_needed: int,
                       embed_batch_size: int) -> RetrievalBatch:
        """Retrieve the top-max_k_needed docs for each query."""
        raise NotImplementedError
