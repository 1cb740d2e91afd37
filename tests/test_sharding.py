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


def test_context_parallel_prefill_matches_single_device():
    """Sequence-sharded SDAG attention over 8 devices == single-device."""
    import numpy as np
    from jax.sharding import Mesh
    from sdag_tpu.ops.attention import sdag_attention_reference
    from sdag_tpu.parallel.context import context_parallel_prefill_attention
    from sdag_tpu.sdag.mask import BlockLayout, layout_to_metadata

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("model",))
    rng = np.random.default_rng(0)
    B, H, Hkv, L, Dh = 2, 4, 2, 512, 32
    layout = BlockLayout(480, 64, ((64, 180), (200, 330), (340, 460)), 460)
    doc_id, bits, sul = layout_to_metadata(layout, doc_neighbors=[[1], [], [0]],
                                           pad_to=L)
    doc_id = np.stack([doc_id] * B)
    bits = np.stack([bits] * B)
    q = jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, L, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, L, Dh)), jnp.float32)
    sul_a = jnp.array([sul] * B)
    vl_a = jnp.array([480, 512])

    ref = np.asarray(sdag_attention_reference(
        q, k, v, jnp.asarray(doc_id), jnp.asarray(bits), sul_a, vl_a))
    out = np.asarray(context_parallel_prefill_attention(
        q, k, v, jnp.asarray(doc_id), jnp.asarray(bits), sul_a, vl_a,
        mesh=mesh, axis="model", impl="xla"))
    np.testing.assert_allclose(out[:, :, :480], ref[:, :, :480],
                               atol=2e-4, rtol=1e-3)

    # pallas path in interpreter mode through the same shard_map
    out2 = np.asarray(context_parallel_prefill_attention(
        q, k, v, jnp.asarray(doc_id), jnp.asarray(bits), sul_a, vl_a,
        mesh=mesh, axis="model", impl="pallas", block_q=64, block_k=64))
    np.testing.assert_allclose(out2[:, :, :480], ref[:, :, :480],
                               atol=3e-2)


def test_ring_context_parallel_matches_single_device():
    """Ring-KV context parallelism (O(L/n) live KV per device) must match
    the single-device reference; peak temp memory must be well below the
    all-gather variant's (VERDICT r1 item 7)."""
    import numpy as np
    from jax.sharding import Mesh
    from sdag_tpu.ops.attention import sdag_attention_reference
    from sdag_tpu.parallel.context import context_parallel_prefill_attention
    from sdag_tpu.sdag.mask import BlockLayout, layout_to_metadata

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("model",))
    rng = np.random.default_rng(1)
    B, H, Hkv, L, Dh = 2, 4, 2, 512, 32
    layout = BlockLayout(480, 64, ((64, 180), (200, 330), (340, 460)), 460)
    doc_id, bits, sul = layout_to_metadata(layout,
                                           doc_neighbors=[[1], [], [0]],
                                           pad_to=L)
    doc_id = jnp.asarray(np.stack([doc_id] * B))
    bits = jnp.asarray(np.stack([bits] * B))
    q = jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, L, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, L, Dh)), jnp.float32)
    sul_a = jnp.array([sul] * B)
    vl_a = jnp.array([480, 512])

    ref = np.asarray(sdag_attention_reference(q, k, v, doc_id, bits,
                                              sul_a, vl_a))
    out = np.asarray(context_parallel_prefill_attention(
        q, k, v, doc_id, bits, sul_a, vl_a, mesh=mesh, axis="model",
        kv_exchange="ring"))
    np.testing.assert_allclose(out[:, :, :480], ref[:, :, :480],
                               atol=2e-4, rtol=1e-3)

    # live-KV scaling: the ring variant must never materialize a
    # full-length [.., L, ..] KV array per device
    def peak_temp(kv_exchange):
        fn = jax.jit(lambda *a: context_parallel_prefill_attention(
            *a, mesh=mesh, axis="model", impl="xla",
            kv_exchange=kv_exchange))
        compiled = fn.lower(q, k, v, doc_id, bits, sul_a, vl_a).compile()
        ma = compiled.memory_analysis()
        return None if ma is None else ma.temp_size_in_bytes

    ring_t, ag_t = peak_temp("ring"), peak_temp("all_gather")
    if ring_t is not None and ag_t is not None and ag_t > 0:
        # all_gather holds full K+V (+metadata) per device; ring holds one
        # chunk. Require a clear reduction in KV-related temps.
        kv_full = 2 * B * Hkv * L * Dh * 4
        assert ring_t <= ag_t - kv_full // 2, (ring_t, ag_t)


def test_tp_generation_matches_single_device():
    """Tensor-parallel generation (shard_map + Megatron-sharded weights)
    must emit exactly the single-device greedy continuation — tied and
    untied (vocab-sharded lm_head + all-gather) variants, basic and
    speculative engines."""
    import numpy as np
    from jax.sharding import Mesh
    from sdag_tpu.models.llama import DecoderConfig, init_decoder_params
    from sdag_tpu.models.tokenizer import ByteTokenizer
    from sdag_tpu.sdag.generate import Generator

    mesh = Mesh(np.array(jax.devices()[:2]), axis_names=("model",))
    tok = ByteTokenizer()
    ids = [np.asarray(tok.encode("abc abc abc abc"), np.int32),
           np.asarray(tok.encode("a longer prompt with words"), np.int32)]
    for tie in (True, False):
        cfg = DecoderConfig(vocab_size=512, d_model=64, n_layers=2,
                            n_heads=4, n_kv_heads=2, d_ff=128,
                            tie_embeddings=tie)
        params = init_decoder_params(jax.random.PRNGKey(0), cfg)
        g0 = Generator(params, cfg, tok, temperature=0.0)
        g_tp = Generator(params, cfg, tok, temperature=0.0, tp_mesh=mesh)
        a = g0.generate_ids(ids, max_new_tokens=10)
        assert g_tp.generate_ids(ids, max_new_tokens=10) == a, tie
        if not tie:
            g_spec = Generator(params, cfg, tok, temperature=0.0,
                               speculative_draft=4, tp_mesh=mesh)
            assert g_spec.generate_ids(ids, max_new_tokens=10) == a
            # speculative x int8 KV x TP == single-device int8 decode
            g_i8 = Generator(params, cfg, tok, temperature=0.0,
                             kv_cache_dtype="int8")
            g_spec_i8 = Generator(params, cfg, tok, temperature=0.0,
                                  speculative_draft=4,
                                  kv_cache_dtype="int8", tp_mesh=mesh)
            assert g_spec_i8.generate_ids(ids, max_new_tokens=10) == \
                g_i8.generate_ids(ids, max_new_tokens=10)
    # axis size must divide the head/ff/vocab dims
    import pytest
    bad = DecoderConfig(vocab_size=512, d_model=64, n_layers=1, n_heads=4,
                        n_kv_heads=1, d_ff=128)
    with pytest.raises(ValueError):
        Generator(init_decoder_params(jax.random.PRNGKey(1), bad), bad, tok,
                  temperature=0.0, tp_mesh=mesh)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 devices")
def test_dp_tp_generation_matches_single_device():
    """Composed batch (data) x tensor (model) parallel generation over a
    2x2 mesh == single-device, including a batch that needs padding to
    the data-axis multiple."""
    import numpy as np
    from jax.sharding import Mesh
    from sdag_tpu.models.llama import DecoderConfig, init_decoder_params
    from sdag_tpu.models.tokenizer import ByteTokenizer
    from sdag_tpu.sdag.generate import Generator

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                axis_names=("data", "model"))
    cfg = DecoderConfig(vocab_size=512, d_model=64, n_layers=2, n_heads=4,
                        n_kv_heads=2, d_ff=128, tie_embeddings=False)
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    tok = ByteTokenizer()
    g0 = Generator(params, cfg, tok, temperature=0.0)
    g_dp = Generator(params, cfg, tok, temperature=0.0, tp_mesh=mesh)
    assert g_dp.dp_axis == "data"
    ids4 = [np.asarray(tok.encode(t), np.int32)
            for t in ("abc abc abc", "xy", "hello world", "zzz zzz")]
    assert g_dp.generate_ids(ids4, max_new_tokens=8) == \
        g0.generate_ids(ids4, max_new_tokens=8)
    # odd batch -> padded to the data-axis multiple, outputs trimmed
    assert g_dp.generate_ids(ids4[:3], max_new_tokens=8) == \
        g0.generate_ids(ids4[:3], max_new_tokens=8)
    # speculative decoding composes with dp x tp (greedy-exact)
    gs0 = Generator(params, cfg, tok, temperature=0.0, speculative_draft=3)
    gs_dp = Generator(params, cfg, tok, temperature=0.0,
                      speculative_draft=3, tp_mesh=mesh)
    assert gs_dp.generate_ids(ids4, max_new_tokens=8) == \
        gs0.generate_ids(ids4, max_new_tokens=8)


def test_ring_chunk_skip_predicate_sound():
    """Soundness of the ring block-kind skip: whenever ``chunk_needed`` is
    False for a (q shard, k chunk) pair, the exact ``_tile_mask`` over
    that tile must be all-False — randomized layouts, shards, and chunk
    positions.  Also checks the predicate actually fires (skips exist)
    on isolated multi-doc layouts."""
    import numpy as np
    from sdag_tpu.ops.attention import _tile_mask
    from sdag_tpu.parallel.context import chunk_needed

    rng = np.random.default_rng(7)
    L, n = 256, 8
    ls = L // n
    skipped = 0
    for trial in range(40):
        sul = int(rng.integers(8, 48))
        did = np.full(L, -1, np.int32)
        nbr = np.zeros(L, np.int32)
        pos = sul
        d = 0
        while pos < L - 24 and d < 12:
            dl = int(rng.integers(8, 40))
            did[pos:pos + dl] = d
            if rng.random() < 0.4 and d > 0:   # random neighbor window
                nbr[pos:pos + dl] = 1 << int(rng.integers(0, d))
            pos += dl + int(rng.integers(0, 6))
            d += 1
        vl = int(rng.integers(min(pos, L), L + 1))

        didj = jnp.asarray(did)
        nbrj = jnp.asarray(nbr)
        for si in range(n):
            for sj in range(n):
                i0, j0 = si * ls, sj * ls
                col_k = jnp.arange(j0, j0 + ls, dtype=jnp.int32)
                need = bool(chunk_needed(
                    didj[i0:i0 + ls], nbrj[i0:i0 + ls], didj[j0:j0 + ls],
                    i0 + ls - 1, j0, col_k, sul, vl))
                if not need:
                    skipped += 1
                    i = np.arange(i0, i0 + ls)[:, None]
                    j = np.arange(j0, j0 + ls)[None, :]
                    mask = np.asarray(_tile_mask(
                        jnp.asarray(i), jnp.asarray(j),
                        didj[i0:i0 + ls][:, None], didj[j0:j0 + ls][None, :],
                        nbrj[i0:i0 + ls][:, None], sul, vl))
                    assert not mask.any(), (trial, si, sj)
    assert skipped > 100  # the predicate must actually skip work


def test_ring_chunk_skip_predicate_sound_exhaustive():
    """EXHAUSTIVE soundness of ``chunk_needed`` on a small world: every
    doc-id sequence over {-2 hole, -1 non-doc, 0, 1}^6, every neighbor
    bitmask assignment for the two docs, sys_user_len in {0, 3},
    valid_len in {4, 6}, and all four (q shard, k chunk) pairs — so every
    clause of the predicate (holes, prefix, causal extent, doc diagonal,
    neighbor union, valid cutoff) is hit, not just the ones random
    layouts reach.  skip => the exact tile mask is all-False."""
    import itertools

    import numpy as np

    from sdag_tpu.ops.attention import _tile_mask
    from sdag_tpu.parallel.context import chunk_needed

    L, ls = 6, 3
    dids = np.array(list(itertools.product([-2, -1, 0, 1], repeat=L)),
                    np.int32)                       # [4096, 6]
    did_all = np.repeat(dids, 16, axis=0)           # x16 nbr assignments
    combo = np.tile(np.arange(16, dtype=np.int32), len(dids))
    nbr_all = np.zeros_like(did_all)
    nbr_all[did_all == 0] = (combo % 4)[:, None].repeat(L, 1)[did_all == 0]
    nbr_all[did_all == 1] = (combo // 4)[:, None].repeat(L, 1)[did_all == 1]
    did_j = jnp.asarray(did_all)
    nbr_j = jnp.asarray(nbr_all)

    total_skips = 0
    for sul in (0, 3):
        for vl in (4, 6):
            for si in (0, 1):
                for sj in (0, 1):
                    i0, j0 = si * ls, sj * ls
                    col_k = jnp.arange(j0, j0 + ls, dtype=jnp.int32)
                    need = np.asarray(jax.jit(jax.vmap(
                        lambda dq, nq, dk: chunk_needed(
                            dq, nq, dk, i0 + ls - 1, j0, col_k, sul, vl)
                    ))(did_j[:, i0:i0 + ls], nbr_j[:, i0:i0 + ls],
                       did_j[:, j0:j0 + ls]))
                    ii = jnp.arange(i0, i0 + ls)[:, None]
                    jj = jnp.arange(j0, j0 + ls)[None, :]
                    vis = np.asarray(jax.jit(jax.vmap(
                        lambda dq, dk, nq: _tile_mask(
                            ii, jj, dq[:, None], dk[None, :], nq[:, None],
                            sul, vl).any()
                    ))(did_j[:, i0:i0 + ls], did_j[:, j0:j0 + ls],
                       nbr_j[:, i0:i0 + ls]))
                    unsound = ~need & vis
                    assert not unsound.any(), (sul, vl, si, sj,
                                               int(unsound.sum()))
                    total_skips += int((~need).sum())
    assert total_skips > 100_000  # the predicate skips real work


def test_pipeline_parallel_loss_matches_single_device():
    """GPipe-style pipeline parallelism over 4 stages: microbatched,
    ppermute-scheduled loss must equal the plain single-device LM loss,
    and one optimizer step must run."""
    import numpy as np
    from jax.sharding import Mesh
    from sdag_tpu.models.llama import DecoderConfig, init_decoder_params
    from sdag_tpu.parallel.pipeline import make_pp_train_step
    from sdag_tpu.parallel.train import lm_loss, make_dummy_batch

    cfg = DecoderConfig(vocab_size=256, d_model=64, n_layers=4, n_heads=4,
                        n_kv_heads=2, d_ff=128)
    params = init_decoder_params(jax.random.PRNGKey(2), cfg)
    mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("pipe",))

    batch = make_dummy_batch(cfg, batch=8, seq_len=32)
    ref = float(lm_loss(params, cfg, batch))

    init_state, step, pp_loss = make_pp_train_step(cfg, mesh, n_micro=4)
    state = init_state(params)
    got = float(pp_loss(state.params, batch))
    np.testing.assert_allclose(got, ref, rtol=2e-5)
    embed_before = np.array(params["embed"], copy=True)

    state2, loss = step(state, batch)  # donates `state`
    assert np.isfinite(float(loss))
    assert int(state2.step) == 1
    # params actually moved (compare against the pre-step snapshot)
    assert not np.allclose(np.asarray(state2.params["embed"]),
                           embed_before)


def test_pipeline_plus_tensor_parallel_loss_matches():
    """2D pipe x model parallelism: 4 stages x 2-way Megatron TP (explicit
    in-stage psums) must reproduce the single-device LM loss."""
    import numpy as np
    from jax.sharding import Mesh
    from sdag_tpu.models.llama import DecoderConfig, init_decoder_params
    from sdag_tpu.parallel.pipeline import make_pp_train_step
    from sdag_tpu.parallel.train import lm_loss, make_dummy_batch

    cfg = DecoderConfig(vocab_size=256, d_model=64, n_layers=4, n_heads=4,
                        n_kv_heads=2, d_ff=128)
    params = init_decoder_params(jax.random.PRNGKey(7), cfg)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                axis_names=("pipe", "model"))

    batch = make_dummy_batch(cfg, batch=8, seq_len=32)
    ref = float(lm_loss(params, cfg, batch))

    init_state, step, pp_loss = make_pp_train_step(cfg, mesh, n_micro=4,
                                                   tp_axis="model")
    state = init_state(params)
    got = float(pp_loss(state.params, batch))
    np.testing.assert_allclose(got, ref, rtol=2e-5)

    state2, loss = step(state, batch)
    assert np.isfinite(float(loss)) and int(state2.step) == 1


def test_ring_chunk_skip_predicate_sound_beyond_31_docs():
    """Doc ids above 31 alias onto bit 31 in chunk_needed's summaries
    (conservative) and are never neighbors in _tile_mask: skip must still
    imply an all-False tile on a 40-doc isolation layout."""
    import numpy as np

    from sdag_tpu.ops.attention import _tile_mask
    from sdag_tpu.parallel.context import chunk_needed

    L, ls, sul = 256, 32, 16
    n_docs, dl = 40, (256 - 16) // 40
    did = np.full(L, -1, np.int32)
    for d in range(n_docs):
        did[sul + d * dl: sul + (d + 1) * dl] = d
    nbr = np.zeros(L, np.int32)
    nbr[did >= 0] = 1 << 30  # highest legal neighbor bit everywhere
    didj, nbrj = jnp.asarray(did), jnp.asarray(nbr)
    vl = L
    skipped = 0
    for si in range(L // ls):
        for sj in range(L // ls):
            i0, j0 = si * ls, sj * ls
            col_k = jnp.arange(j0, j0 + ls, dtype=jnp.int32)
            need = bool(chunk_needed(
                didj[i0:i0 + ls], nbrj[i0:i0 + ls], didj[j0:j0 + ls],
                i0 + ls - 1, j0, col_k, sul, vl))
            if not need:
                skipped += 1
                i = np.arange(i0, i0 + ls)[:, None]
                j = np.arange(j0, j0 + ls)[None, :]
                mask = np.asarray(_tile_mask(
                    jnp.asarray(i), jnp.asarray(j),
                    didj[i0:i0 + ls][:, None], didj[j0:j0 + ls][None, :],
                    nbrj[i0:i0 + ls][:, None], sul, vl))
                assert not mask.any(), (si, sj)
    assert skipped > 0
