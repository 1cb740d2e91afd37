"""Pipeline parallelism: GPipe-style microbatched training over a 'pipe'
mesh axis.

New design surface beyond the reference (inference-only, single device —
SURVEY §2.10): the decoder's layers are split into contiguous stages, one
per device along 'pipe'; microbatches stream through the ring via
``jax.lax.ppermute`` inside a ``lax.scan`` schedule of n_micro + n_stages-1
ticks (the classic GPipe bubble).  Embedding and unembedding weights are
replicated; each device holds only its stage's layer stack, so per-device
parameter memory is O(n_layers / n_stages).

Composable with the tensor-parallel rules (parallel/sharding.py) by nesting
axes; the dryrun and tests exercise 'pipe' alone for clarity.  Autodiff
goes straight through scan + ppermute (its transpose is the reverse
permute), so one ``jax.value_and_grad`` gives pipelined backward for free.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sdag_tpu.models.llama import (DecoderConfig, layer_forward,
                                   positions_from_doc_id, rms_norm)
from sdag_tpu.ops.attention import prefill_mask_plan
from sdag_tpu.parallel.train import TrainState, make_optimizer


def stack_layer_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """[{layer0}, {layer1}, ...] -> one tree with leading layer axis."""
    layers = params["layers"]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    out = {"embed": params["embed"], "final_norm": params["final_norm"],
           "layers": stacked}
    if "lm_head" in params:
        out["lm_head"] = params["lm_head"]
    return out


def stacked_layer_specs(axis: str = "pipe",
                        tp_axis: Optional[str] = None) -> Dict[str, Any]:
    """PartitionSpecs for the stacked layer tree: layer axis over `axis`;
    with tp_axis, Megatron column/row splits over it (heads and d_ff)."""
    t = tp_axis
    return {
        "attn": {"wq": P(axis, None, t), "wk": P(axis, None, t),
                 "wv": P(axis, None, t), "wo": P(axis, t, None)},
        "mlp": {"gate": P(axis, None, t), "up": P(axis, None, t),
                "down": P(axis, t, None)},
        "ln1": P(axis), "ln2": P(axis),
    }


def shard_stacked_params(stacked: Dict[str, Any], mesh: Mesh,
                         axis: str = "pipe",
                         tp_axis: Optional[str] = None) -> Dict[str, Any]:
    """Layer stacks sharded on the layer axis over `axis` (plus Megatron
    tensor splits over tp_axis when given); embed/norm/head replicated."""
    out = {k: jax.device_put(v, NamedSharding(mesh, P()))
           for k, v in stacked.items() if k != "layers"}
    specs = stacked_layer_specs(axis, tp_axis)
    out["layers"] = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        stacked["layers"], specs,
        is_leaf=lambda x: isinstance(x, P))
    return out


def make_pp_train_step(cfg: DecoderConfig, mesh: Mesh, n_micro: int,
                       optimizer: Optional[
                           optax.GradientTransformation] = None,
                       attn_impl: str = "xla", axis: str = "pipe",
                       tp_axis: Optional[str] = None):
    """Returns (init_state_fn, step_fn, loss_fn) for pipeline-parallel
    training.

    init_state_fn takes the *plain* (list-of-layers) param tree and returns
    a TrainState with stage-stacked, pipe-sharded params.

    With tp_axis (a second mesh axis), every stage's layers are ALSO
    Megatron-split over it: attention heads and d_ff columns shard across
    tp_axis with explicit psums inside the stage — 2D pipe x model
    parallel training (scaling-book composition; both head counts must
    divide the tp size).
    """
    optimizer = optimizer or make_optimizer()
    n_stages = mesh.shape[axis]
    if cfg.n_layers % n_stages:
        raise ValueError(f"{axis} axis size {n_stages} must divide "
                         f"n_layers={cfg.n_layers}")
    if tp_axis is not None:
        tp = mesh.shape[tp_axis]
        if cfg.n_heads % tp or cfg.n_kv_heads % tp or cfg.d_ff % tp:
            raise ValueError(
                f"tp={tp} must divide n_heads={cfg.n_heads}, "
                f"n_kv_heads={cfg.n_kv_heads}, and d_ff={cfg.d_ff}")

    def pp_loss(stacked, batch):
        B = batch["input_ids"].shape[0]
        if B % n_micro:
            raise ValueError(f"n_micro={n_micro} must divide batch {B}")

        def to_micro(x):
            return x.reshape((n_micro, B // n_micro) + x.shape[1:])

        mb = {k: to_micro(v) for k, v in batch.items()}
        tied = "lm_head" not in stacked
        lm_head = stacked["embed"] if tied else stacked["lm_head"]

        def local(layers_stage, embed, final_norm, head, mb):
            stage = jax.lax.axis_index(axis)
            S = n_stages
            ticks = n_micro + S - 1
            mbsz, L = mb["input_ids"].shape[1], mb["input_ids"].shape[2]

            def get_micro(m):
                mc = jnp.clip(m, 0, n_micro - 1)
                return {k: jax.lax.dynamic_index_in_dim(v, mc, 0,
                                                        keepdims=False)
                        for k, v in mb.items()}

            perm = [(i, (i + 1) % S) for i in range(S)]
            h0 = jnp.zeros((mbsz, L, cfg.d_model), cfg.dtype)

            def tick(carry, t):
                h_in, loss_sum, cnt = carry
                m = t - stage  # microbatch index this stage works on
                data = get_micro(m)
                in_window = (m >= 0) & (m < n_micro)

                positions = positions_from_doc_id(data["doc_id"])
                # the [mbsz, L, d_model] embedding gather only feeds
                # stage 0 — lax.cond keeps the other S-1 stages from
                # paying its HBM traffic every tick (jnp.where computed
                # both branches)
                x = jax.lax.cond(
                    stage == 0,
                    lambda: embed[data["input_ids"]].astype(cfg.dtype),
                    lambda: h_in)

                # layer-invariant mask metadata once per tick, not once
                # per layer of the stage scan (same hoist as
                # models/llama.py prefill — XLA does not CSE it)
                q_spec = jax.ShapeDtypeStruct(
                    (mbsz, cfg.n_heads, L, cfg.head_dim), cfg.dtype)
                k_spec = jax.ShapeDtypeStruct(
                    (mbsz, cfg.n_kv_heads, L, cfg.head_dim), cfg.dtype)
                # block sizes must match layer_forward's defaults (128) —
                # an auto-picked kvres plan (256/512 blocks) would conflict
                # with the per-call override and raise at trace time
                plan = prefill_mask_plan(
                    q_spec, k_spec, data["doc_id"], data["nbr_bits"],
                    data["sys_user_len"], data["valid_len"],
                    impl=attn_impl, block_q=128, block_k=128)

                def layer_step(xc, layer):
                    # layer_forward handles the tensor-parallel local
                    # slices natively (head counts inferred from weight
                    # shapes; wo/down psum'ed over tp_axis)
                    xc, _ = layer_forward(
                        layer, cfg, xc, positions, data["doc_id"],
                        data["nbr_bits"], data["sys_user_len"],
                        data["valid_len"], attn_impl=attn_impl,
                        tp_axis=tp_axis, mask_plan=plan)
                    return xc, None

                x, _ = jax.lax.scan(layer_step, x, layers_stage)

                def last_stage_loss(_):
                    xn = rms_norm(x, final_norm, cfg.norm_eps)
                    w = head.T if tied else head
                    logits = (xn @ w).astype(jnp.float32)
                    logp = jax.nn.log_softmax(logits, axis=-1)
                    tgt = jnp.take_along_axis(
                        logp, data["targets"][..., None], axis=-1)[..., 0]
                    lmask = data["loss_mask"].astype(jnp.float32) \
                        * in_window.astype(jnp.float32)
                    return -(tgt * lmask).sum(), lmask.sum()

                dl, dc = jax.lax.cond(
                    stage == S - 1, last_stage_loss,
                    lambda _: (jnp.float32(0.0), jnp.float32(0.0)), None)
                h_next = jax.lax.ppermute(x, axis, perm)
                return (h_next, loss_sum + dl, cnt + dc), None

            (h, loss_sum, cnt), _ = jax.lax.scan(
                tick, (h0, jnp.float32(0.0), jnp.float32(0.0)),
                jnp.arange(ticks))
            del h
            loss_sum = jax.lax.psum(loss_sum, axis)
            cnt = jax.lax.psum(cnt, axis)
            return loss_sum / jnp.maximum(cnt, 1.0)

        fn = shard_map(
            local, mesh=mesh,
            in_specs=(stacked_layer_specs(axis, tp_axis),
                      P(), P(), P(), P()),
            out_specs=P(),
            check_vma=False)
        return fn(stacked["layers"], stacked["embed"],
                  stacked["final_norm"], lm_head, mb)

    def init_state(params) -> TrainState:
        stacked = shard_stacked_params(stack_layer_params(params), mesh,
                                       axis, tp_axis=tp_axis)
        opt_state = optimizer.init(stacked)
        return TrainState(params=stacked, opt_state=opt_state,
                          step=jnp.zeros((), jnp.int32))

    def step_fn(state: TrainState, batch) -> Tuple[TrainState, jax.Array]:
        loss, grads = jax.value_and_grad(pp_loss)(state.params, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    jit_step = jax.jit(step_fn, donate_argnums=(0,))
    return init_state, jit_step, pp_loss
