"""Sharded training step: next-token LM loss through the SDAG mask.

New capability beyond the reference (which is inference-only): fine-tune the
generator *under document isolation* so the model is trained with the same
attention structure it serves with.  The step pjit-shards parameters with
the tensor-parallel rules (parallel/sharding.py) and the batch over 'data';
XLA inserts the ICI collectives.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sdag_tpu.models.llama import DecoderConfig, prefill
from sdag_tpu.parallel.sharding import batch_specs, shard_params


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def lm_loss(params, cfg: DecoderConfig, batch: Dict[str, jax.Array],
            attn_impl: str = "xla") -> jax.Array:
    """Mean next-token cross-entropy over loss-masked positions, with the
    SDAG block mask applied at the prefill."""
    logits, _ = prefill(
        params, cfg, batch["input_ids"], doc_id=batch["doc_id"],
        nbr_bits=batch["nbr_bits"], sys_user_len=batch["sys_user_len"],
        valid_len=batch["valid_len"], attn_impl=attn_impl, with_cache=False)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt_logp = jnp.take_along_axis(logp, batch["targets"][..., None],
                                   axis=-1)[..., 0]
    mask = batch["loss_mask"].astype(jnp.float32)
    return -(tgt_logp * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01
                   ) -> optax.GradientTransformation:
    return optax.adamw(lr, weight_decay=weight_decay)


def _make_init_state(cfg: DecoderConfig, mesh: Mesh,
                     optimizer: optax.GradientTransformation):
    """Shared init for both train-step factories: param shardings are
    established HERE (shard_params) and then propagated by jit — the
    steps' in_shardings only pin the batch."""
    def init_state(params) -> TrainState:
        params = shard_params(params, cfg, mesh)
        opt_state = optimizer.init(params)
        return TrainState(params=params, opt_state=opt_state,
                          step=jnp.zeros((), jnp.int32))
    return init_state


def make_sharded_train_step(cfg: DecoderConfig, mesh: Mesh,
                            optimizer: Optional[
                                optax.GradientTransformation] = None,
                            attn_impl: str = "xla"):
    """Returns (init_state_fn, step_fn) pjit-sharded over the mesh."""
    optimizer = optimizer or make_optimizer()
    bspecs = batch_specs()

    init_state = _make_init_state(cfg, mesh, optimizer)

    def step_fn(state: TrainState, batch: Dict[str, jax.Array]
                ) -> Tuple[TrainState, jax.Array]:
        loss, grads = jax.value_and_grad(lm_loss)(state.params, cfg, batch,
                                                  attn_impl)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    sharded_batch = {k: NamedSharding(mesh, v) for k, v in bspecs.items()}

    jit_step = jax.jit(
        step_fn,
        in_shardings=(None, sharded_batch),
        out_shardings=(None, NamedSharding(mesh, P())),
        donate_argnums=(0,),
    )
    return init_state, jit_step


def make_sharded_train_scan(cfg: DecoderConfig, mesh: Mesh,
                            optimizer: Optional[
                                optax.GradientTransformation] = None,
                            attn_impl: str = "xla",
                            preprocess=None):
    """Compile-amortized variant of :func:`make_sharded_train_step`:
    returns (init_state_fn, scan_fn) where ``scan_fn(state, stacked)``
    runs ``lax.scan`` over a [S, ...]-stacked dict of S batches in ONE
    jitted call and returns (state, losses [S]).

    Motivation: on a remote-relay TPU link (axon), per-dispatch RTT plus
    per-batch host->device upload dominate small-model training steps
    (~1.5-2.4 s/step measured for a 2.8M-param model whose compute is
    <5 ms); scanning S steps per dispatch amortizes both.  ``preprocess``
    (optional) maps each per-step batch inside the scan body — e.g.
    decompressing int16/int8 wire dtypes back to int32/f32 so the host
    uploads ~4x fewer bytes."""
    optimizer = optimizer or make_optimizer()

    init_state = _make_init_state(cfg, mesh, optimizer)

    def one_step(state: TrainState, batch):
        if preprocess is not None:
            batch = preprocess(batch)
        loss, grads = jax.value_and_grad(lm_loss)(state.params, cfg, batch,
                                                  attn_impl)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def scan_fn(state: TrainState, stacked):
        return jax.lax.scan(one_step, state, stacked)

    bspecs = batch_specs()
    stacked_sh = {k: NamedSharding(mesh, P(None, *v))
                  for k, v in bspecs.items()}
    jit_scan = jax.jit(scan_fn,
                       in_shardings=(None, stacked_sh),
                       out_shardings=(None, NamedSharding(mesh, P())),
                       donate_argnums=(0,))
    return init_state, jit_scan


def make_dummy_batch(cfg: DecoderConfig, batch: int, seq_len: int,
                     num_docs: int = 2):
    """Tiny synthetic SDAG-masked LM batch for dry runs and tests."""
    import numpy as np
    rng = np.random.default_rng(0)
    ids = rng.integers(1, cfg.vocab_size - 1,
                       size=(batch, seq_len)).astype(np.int32)
    targets = np.roll(ids, -1, axis=1)
    doc_id = np.full((batch, seq_len), -1, np.int32)
    sys_len = seq_len // 4
    span = max(1, (seq_len // 2) // max(num_docs, 1))
    for d in range(num_docs):
        s = sys_len + d * span
        doc_id[:, s:s + span - 1] = d
    loss_mask = np.ones((batch, seq_len), np.float32)
    loss_mask[:, -1] = 0.0
    return {
        "input_ids": jnp.asarray(ids),
        "targets": jnp.asarray(targets),
        "doc_id": jnp.asarray(doc_id),
        "nbr_bits": jnp.zeros((batch, seq_len), jnp.int32),
        "sys_user_len": jnp.full((batch,), sys_len, jnp.int32),
        "valid_len": jnp.full((batch,), seq_len, jnp.int32),
        "loss_mask": jnp.asarray(loss_mask),
    }
