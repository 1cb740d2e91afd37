"""Defense interface.

Same contract as the reference ABC (``src/pipeline/defenses/base.py:9-26``):
take the (k+1)-doc corpus pool plus (oracle) malicious docs, return a
filtered ranking, surviving malicious docs, and optional labels.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Dict, List, Optional, Tuple

from sdag_tpu.datamodels import DefenseOutput


class Defense(ABC):
    @abstractmethod
    def apply(
        self,
        query_id: str,
        query: str,
        corpus_docs: List[str],
        corpus_ids: List[str],
        corpus_scores: Optional[List[float]],
        malicious_docs: List[str],
        does_oracle: bool,
        persistent_cache: Optional[Dict[Tuple[str, str], str]] = None,
    ) -> DefenseOutput:
        raise NotImplementedError
