"""Model / training-state checkpointing (orbax).

The reference has no model checkpointing at all (inference-only, SURVEY.md
§5).  The TPU build trains (parallel/train.py), so training state is
checkpointed with orbax — sharded params restore onto the same mesh layout —
and converted HF weights can be cached as a native checkpoint to skip torch
conversion on later runs.
"""

from __future__ import annotations

import os
from typing import Any, Optional



def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_pytree(path: str, tree: Any) -> None:
    """Save a param/state pytree (overwrites)."""
    path = os.path.abspath(path)
    ckpt = _checkpointer()
    ckpt.save(path, tree, force=True)


def load_pytree(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree; pass `target` (matching structure, possibly with
    sharded arrays) to restore with placement."""
    path = os.path.abspath(path)
    ckpt = _checkpointer()
    if target is None:
        return ckpt.restore(path)
    return ckpt.restore(path, item=target)


def save_train_state(path: str, state) -> None:
    """Persist a parallel.train.TrainState (params + optimizer + step)."""
    save_pytree(path, {"params": state.params,
                       "opt_state": state.opt_state,
                       "step": state.step})


def restore_train_state(path: str, state):
    """Restore into an existing TrainState template (keeps shardings)."""
    from sdag_tpu.parallel.train import TrainState
    restored = load_pytree(path, target={"params": state.params,
                                         "opt_state": state.opt_state,
                                         "step": state.step})
    return TrainState(params=restored["params"],
                      opt_state=restored["opt_state"],
                      step=restored["step"])
