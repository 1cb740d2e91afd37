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


def test_pp_train_state_roundtrip(tmp_path):
    """Pipeline-parallel (stage-stacked, pipe-sharded) train state must
    round-trip through orbax and restore onto the mesh placement."""
    import numpy as np
    from jax.sharding import Mesh
    from sdag_tpu.models.llama import DecoderConfig, init_decoder_params
    from sdag_tpu.parallel.checkpoint import load_pytree, save_pytree
    from sdag_tpu.parallel.pipeline import make_pp_train_step
    from sdag_tpu.parallel.train import make_dummy_batch

    cfg = DecoderConfig(vocab_size=128, d_model=32, n_layers=4, n_heads=4,
                        n_kv_heads=2, d_ff=64)
    mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("pipe",))
    init_state, step, pp_loss = make_pp_train_step(cfg, mesh, n_micro=2)
    state = init_state(init_decoder_params(jax.random.PRNGKey(0), cfg))
    state, _ = step(state, make_dummy_batch(cfg, batch=4, seq_len=16))

    path = str(tmp_path / "pp_state")
    save_pytree(path, state.params)
    restored = load_pytree(path, target=state.params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b)), state.params, restored)
    # restored params drive the loss identically
    a = float(pp_loss(state.params, make_dummy_batch(cfg, batch=4,
                                                     seq_len=16)))
    b = float(pp_loss(restored, make_dummy_batch(cfg, batch=4, seq_len=16)))
    np.testing.assert_allclose(a, b, rtol=1e-6)
