"""Device mesh construction and distributed initialization.

The reference is single-process/single-device (SURVEY.md §2.10); all
multi-chip structure here is new design surface.  Axes:

- ``data``  : batch/data parallelism (queries, generation batches)
- ``model`` : tensor parallelism inside the encoder/decoder
- ``index`` : corpus-row sharding for the dense/sparse indexes

The ``index`` axis is a 1D view over *all* devices (corpus shards never need
to align with model shards); ``data``×``model`` is a 2D mesh over the same
devices for compute.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> bool:
    """Initialize jax.distributed when launched multi-host (DCN; exercised
    by the 2-process CPU test, tests/test_distributed_dcn.py).  No-op in
    single-process runs.  Config via the standard env vars:
    JAX_COORDINATOR_ADDRESS (+ JAX_NUM_PROCESSES / JAX_PROCESS_ID where the
    cluster environment doesn't auto-detect them).  Returns True when the
    distributed runtime is (now) initialized."""
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return False
    from jax._src import distributed as _dist
    if _dist.global_state.client is not None:
        return True  # already initialized
    kw = {"coordinator_address": addr}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kw["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        pid = os.environ.get("JAX_PROCESS_ID")
        if pid is None:
            # defaulting to 0 would give the coordinator a duplicate
            # process id and hang the whole cluster at the first barrier
            raise ValueError(
                "JAX_NUM_PROCESSES is set but JAX_PROCESS_ID is not; "
                "every process must export its unique id")
        kw["process_id"] = int(pid)
    jax.distributed.initialize(**kw)
    return True


def make_mesh(data: int = 0, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """2D compute mesh ('data', 'model').  data=0 means 'fill with all
    remaining devices'."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model <= 0:
        model = 1
    if data <= 0:
        data = max(1, n // model)
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data*model} devices, "
                         f"have {n}")
    arr = np.array(devices[:data * model]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def make_index_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1D mesh over all devices for corpus-row sharding."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), axis_names=("index",))


def shard_rows(x, mesh: Mesh, axis: str = "index"):
    """Place array x with rows sharded along `axis` of `mesh`."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
