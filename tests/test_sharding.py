"""Multi-device (8 virtual CPU) sharded training/inference tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdag_tpu.core.mesh import make_mesh
from sdag_tpu.models.llama import DecoderConfig, init_decoder_params, prefill
from sdag_tpu.parallel.sharding import decoder_param_specs, shard_params
from sdag_tpu.parallel.train import (make_dummy_batch,
                                     make_sharded_train_step)

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")

CFG = DecoderConfig(vocab_size=512, d_model=64, n_layers=2, n_heads=4,
                    n_kv_heads=4, d_ff=128)


def test_param_specs_match_tree():
    params = init_decoder_params(jax.random.PRNGKey(0), CFG)
    specs = decoder_param_specs(CFG)
    # identical tree structure (so tree.map works)
    from jax.sharding import PartitionSpec as P
    jax.tree.map(lambda x, s: None, params, specs,
                 is_leaf=lambda x: isinstance(x, P))


def test_sharded_train_step_runs_and_matches_single_device():
    mesh = make_mesh(data=2, model=4)
    params = init_decoder_params(jax.random.PRNGKey(0), CFG)
    init_state, step = make_sharded_train_step(CFG, mesh)
    state = init_state(params)
    batch = make_dummy_batch(CFG, batch=4, seq_len=32)
    state2, loss = step(state, batch)
    loss = float(loss)
    assert np.isfinite(loss) and loss > 0

    # single-device reference loss on the same params/batch
    from sdag_tpu.parallel.train import lm_loss
    params_ref = init_decoder_params(jax.random.PRNGKey(0), CFG)
    ref = float(lm_loss(params_ref, CFG, batch))
    np.testing.assert_allclose(loss, ref, rtol=2e-4)

    # a second step decreases loss on this toy batch (optimizer works)
    _, loss2 = step(state2, batch)
    assert float(loss2) < loss


def test_sharded_prefill_matches_replicated():
    mesh = make_mesh(data=1, model=8)
    params = init_decoder_params(jax.random.PRNGKey(1), CFG)
    sharded = shard_params(params, CFG, mesh)
    ids = jnp.arange(64, dtype=jnp.int32).reshape(2, 32) % 500
    ref_logits, _ = prefill(params, CFG, ids, with_cache=False)
    got_logits, _ = prefill(sharded, CFG, ids, with_cache=False)
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               atol=2e-4, rtol=1e-3)
