"""Orbax checkpointing of params and training state."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdag_tpu.core.mesh import make_mesh
from sdag_tpu.models.llama import DecoderConfig, init_decoder_params
from sdag_tpu.parallel.checkpoint import (load_pytree, restore_train_state,
                                          save_pytree, save_train_state)
from sdag_tpu.parallel.train import make_dummy_batch, make_sharded_train_step

CFG = DecoderConfig(vocab_size=512, d_model=64, n_layers=2, n_heads=4,
                    n_kv_heads=4, d_ff=128)


def test_pytree_roundtrip(tmp_path):
    params = init_decoder_params(jax.random.PRNGKey(0), CFG)
    path = str(tmp_path / "params_ckpt")
    save_pytree(path, params)
    restored = load_pytree(path)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, restored)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_train_state_roundtrip_sharded(tmp_path):
    mesh = make_mesh(data=2, model=4)
    params = init_decoder_params(jax.random.PRNGKey(0), CFG)
    init_state, step = make_sharded_train_step(CFG, mesh)
    state = init_state(params)
    batch = make_dummy_batch(CFG, batch=4, seq_len=32)
    state, loss1 = step(state, batch)

    path = str(tmp_path / "train_ckpt")
    save_train_state(path, state)
    # fresh state template, restore into it, training continues identically
    state2 = init_state(init_decoder_params(jax.random.PRNGKey(7), CFG))
    restored = restore_train_state(path, state2)
    assert int(restored.step) == 1
    _, loss_a = step(restored, batch)
    _, loss_b = step(state, batch)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
