"""Multi-host (DCN) path: 2-process jax.distributed on CPU.

SURVEY §2.10 names DCN multi-host sharding a first-class component; this
exercises ``maybe_init_distributed`` (core/mesh.py) end to end without TPU
hardware: two subprocesses with 4 virtual CPU devices each form one
8-device distributed runtime, run (a) the sharded dense search over a
corpus row-sharded ACROSS HOSTS and (b) the pjit-sharded train step, and
their results must match the single-process reference computed in this
test's own 8-virtual-device process."""

import json
import os
import socket
import subprocess
import sys

import numpy as np


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
from sdag_tpu.core.mesh import maybe_init_distributed, make_index_mesh, \
    make_mesh
assert maybe_init_distributed()
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

pid = int(os.environ["JAX_PROCESS_ID"])
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4, jax.local_device_count()
assert jax.process_count() == 2

# ---- sharded dense search over a corpus row-sharded across the two hosts
rng = np.random.default_rng(0)
corpus = rng.standard_normal((512, 64)).astype(np.float32)
queries = rng.standard_normal((8, 64)).astype(np.float32)
imesh = make_index_mesh()
garr = jax.make_array_from_callback(
    corpus.shape, NamedSharding(imesh, P("index")), lambda i: corpus[i])
q = jax.make_array_from_callback(
    queries.shape, NamedSharding(imesh, P()), lambda i: queries[i])
from sdag_tpu.parallel.collectives import sharded_topk_search
vals, idx = sharded_topk_search(q, garr, 10, 500, imesh)
vals = np.asarray(jax.device_get(vals))
idx = np.asarray(jax.device_get(idx))
scores = queries @ corpus[:500].T
ref_idx = np.argsort(-scores, axis=1, kind="stable")[:, :10]
assert (idx == ref_idx).all()
np.testing.assert_allclose(vals, np.take_along_axis(scores, ref_idx, 1),
                           rtol=1e-5)

# ---- sharded train step: batch data-sharded across hosts
from sdag_tpu.models.llama import DecoderConfig, init_decoder_params
from sdag_tpu.parallel.train import (make_dummy_batch,
                                     make_sharded_train_step)
cfg = DecoderConfig(vocab_size=512, d_model=32, n_layers=2, n_heads=4,
                    n_kv_heads=2, d_ff=64)
mesh = make_mesh(data=8, model=1)
init_state, step_fn = make_sharded_train_step(cfg, mesh)
state = init_state(init_decoder_params(jax.random.PRNGKey(0), cfg))
host_batch = make_dummy_batch(cfg, batch=8, seq_len=128)
batch = {
    k: jax.make_array_from_callback(
        v.shape, NamedSharding(mesh, P("data", *([None] * (v.ndim - 1)))),
        lambda i, v=v: np.asarray(v)[i])
    for k, v in host_batch.items()}
losses = []
for _ in range(3):
    state, loss = step_fn(state, batch)
    losses.append(float(jax.device_get(loss)))

if pid == 0:
    with open(os.environ["DCN_OUT"], "w") as fh:
        json.dump({"losses": losses}, fh)
print("WORKER_OK", pid, flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dcn_matches_single_process(tmp_path):
    # single-process reference (this process: 8 virtual devices, conftest)
    import jax
    from sdag_tpu.core.mesh import make_mesh
    from sdag_tpu.models.llama import DecoderConfig, init_decoder_params
    from sdag_tpu.parallel.train import (make_dummy_batch,
                                         make_sharded_train_step)
    cfg = DecoderConfig(vocab_size=512, d_model=32, n_layers=2, n_heads=4,
                        n_kv_heads=2, d_ff=64)
    mesh = make_mesh(data=8, model=1)
    init_state, step_fn = make_sharded_train_step(cfg, mesh)
    state = init_state(init_decoder_params(jax.random.PRNGKey(0), cfg))
    batch = make_dummy_batch(cfg, batch=8, seq_len=128)
    ref_losses = []
    for _ in range(3):
        state, loss = step_fn(state, batch)
        ref_losses.append(float(loss))

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    out_json = tmp_path / "losses.json"
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            PYTHONPATH=REPO,
            DCN_OUT=str(out_json),
        )
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER_OK {pid}" in out

    dcn_losses = json.loads(out_json.read_text())["losses"]
    # same 8-way data sharding, same deterministic batch/params: the
    # cross-host psum must reproduce the single-process losses
    np.testing.assert_allclose(dcn_losses, ref_losses, rtol=2e-4, atol=1e-5)
