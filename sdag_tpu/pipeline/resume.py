"""Resumable per-batch result logs.

The reference's only resume affordances are the sampled-query JSON caches
and the discern label cache (SURVEY.md §5); a crashed experiment loses all
generated answers.  Here every completed query batch is appended to a JSONL
log per (top_k, attacker_pos) pair, and a rerun with the same config skips
completed batches and reuses their rows.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Set


class BatchResultLog:
    """Append-only JSONL: row lines ``{"batch": i, "row": {...}}`` and
    completion markers ``{"batch": i, "done": true}``.  Rows of batches
    without a done marker (crash mid-batch) are discarded on load."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._rows_by_batch: Dict[int, List[Dict[str, Any]]] = {}
        self._done: Set[int] = set()
        if os.path.exists(path):
            with open(path, "r", encoding="utf-8") as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        obj = json.loads(line)
                    except Exception:
                        continue
                    b = int(obj.get("batch", -1))
                    if obj.get("done"):
                        self._done.add(b)
                    elif "row" in obj:
                        self._rows_by_batch.setdefault(b, []).append(
                            obj["row"])
            if self._done:
                print(f"[resume] {path}: {len(self._done)} completed "
                      "batches found")
        out_dir = os.path.dirname(path)
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)

    def is_done(self, batch_idx: int) -> bool:
        return batch_idx in self._done

    def rows_for(self, batch_idx: int) -> List[Dict[str, Any]]:
        if batch_idx not in self._done:
            return []
        return list(self._rows_by_batch.get(batch_idx, []))

    def append_batch(self, batch_idx: int,
                     rows: List[Dict[str, Any]]) -> None:
        with open(self.path, "a", encoding="utf-8") as f:
            for r in rows:
                f.write(json.dumps({"batch": batch_idx, "row": r},
                                   ensure_ascii=False) + "\n")
            f.write(json.dumps({"batch": batch_idx, "done": True}) + "\n")
            f.flush()
            os.fsync(f.fileno())
        self._rows_by_batch[batch_idx] = list(rows)
        self._done.add(batch_idx)
