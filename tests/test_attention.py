"""Flash kernel parity (interpret mode) and block-kind classification
soundness against the dense mask ground truth."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdag_tpu.ops.attention import (BLOCK_CAUSAL, BLOCK_FULL,
                                    BLOCK_PARTIAL, BLOCK_SKIP,
                                    compute_block_kinds,
                                    sdag_attention_reference,
                                    sdag_flash_attention)
from sdag_tpu.sdag.mask import (BlockLayout, layout_to_metadata,
                                mask_from_metadata)

LAYOUTS = [
    # (L, layout, neighbors)
    (256, BlockLayout(230, 40, ((40, 80), (85, 130), (132, 180)), 185),
     [[1], [], [0]]),
    (256, BlockLayout(230, 40, ((40, 80), (85, 130), (132, 180)), 185),
     None),
    (256, BlockLayout(256, 16, ((16, 128), (128, 240)), 240), [[], []]),
    (128, BlockLayout(100, 30, (), 30), None),  # no docs: plain causal
]


@pytest.mark.parametrize("L,layout,nbrs", LAYOUTS)
@pytest.mark.parametrize("bq,bk", [(32, 32), (64, 32), (32, 64)])
def test_block_kinds_sound(L, layout, nbrs, bq, bk):
    doc_id, bits, sul = layout_to_metadata(layout, doc_neighbors=nbrs,
                                           pad_to=L)
    vl = layout.seq_len
    dense = mask_from_metadata(doc_id, bits, sul, valid_len=vl)
    kinds = np.asarray(compute_block_kinds(
        jnp.asarray(doc_id[None]), jnp.asarray(bits[None]),
        jnp.asarray([sul]), jnp.asarray([vl]), bq, bk))[0]
    nq, nk = L // bq, L // bk
    n_skip = n_full = 0
    for qi in range(nq):
        for ki in range(nk):
            tile = dense[qi * bq:(qi + 1) * bq, ki * bk:(ki + 1) * bk]
            kind = kinds[qi, ki]
            if kind == BLOCK_SKIP:
                assert not tile.any(), (qi, ki)
                n_skip += 1
            elif kind == BLOCK_FULL:
                assert tile.all(), (qi, ki)
                n_full += 1
            elif kind == BLOCK_CAUSAL:
                # exactness guarantee: tile mask == causal & valid
                ii = np.arange(qi * bq, (qi + 1) * bq)[:, None]
                jj = np.arange(ki * bk, (ki + 1) * bk)[None, :]
                exp = (jj <= ii) & (jj < vl) & (ii < vl)
                assert (tile == exp).all(), (qi, ki)
            else:
                assert kind == BLOCK_PARTIAL
    # classification actually fires (not everything partial)
    if layout.num_docs >= 2:
        assert n_skip > 0
    assert n_full + n_skip > 0


def test_flash_matches_reference_with_kinds():
    rng = np.random.default_rng(0)
    B, H, L, Dh = 2, 2, 256, 64
    layout = BlockLayout(230, 40, ((40, 80), (85, 130), (132, 180)), 185)
    doc_id, bits, sul = layout_to_metadata(layout, doc_neighbors=[[1], [], [0]],
                                           pad_to=L)
    doc_id = np.stack([doc_id] * B)
    bits = np.stack([bits] * B)
    q = rng.standard_normal((B, H, L, Dh)).astype(np.float32)
    k = rng.standard_normal((B, H, L, Dh)).astype(np.float32)
    v = rng.standard_normal((B, H, L, Dh)).astype(np.float32)
    args = [jnp.asarray(x) for x in (q, k, v, doc_id, bits)]
    sul_a = jnp.array([sul] * B)
    vl_a = jnp.array([230] * B)
    ref = np.asarray(sdag_attention_reference(*args, sys_user_len=sul_a,
                                              valid_len=vl_a))
    for bq, bk in [(64, 64), (128, 128), (64, 128)]:
        out = np.asarray(sdag_flash_attention(
            *args, sys_user_len=sul_a, valid_len=vl_a, block_q=bq,
            block_k=bk, interpret=True))
        d = np.abs(ref - out)[:, :, :230]
        assert d.max() < 3e-2, (bq, bk, d.max())  # bf16 MXU path


def test_flash_no_docs_equals_causal():
    rng = np.random.default_rng(1)
    B, H, L, Dh = 1, 2, 128, 32
    q = rng.standard_normal((B, H, L, Dh)).astype(np.float32)
    k = rng.standard_normal((B, H, L, Dh)).astype(np.float32)
    v = rng.standard_normal((B, H, L, Dh)).astype(np.float32)
    doc_id = np.full((B, L), -1, np.int32)
    bits = np.zeros((B, L), np.int32)
    args = [jnp.asarray(x) for x in (q, k, v, doc_id, bits)]
    ref = np.asarray(sdag_attention_reference(
        *args, sys_user_len=jnp.array([0]), valid_len=jnp.array([L])))
    out = np.asarray(sdag_flash_attention(
        *args, sys_user_len=jnp.array([0]), valid_len=jnp.array([L]),
        block_q=64, block_k=64, interpret=True))
    assert np.abs(ref - out).max() < 3e-2


def test_splash_matches_reference():
    """Manual-DMA splash kernel parity (interpret mode)."""
    from sdag_tpu.ops.attention import sdag_splash_attention
    rng = np.random.default_rng(0)
    B, H, L, Dh = 2, 2, 256, 64
    layout = BlockLayout(230, 40, ((40, 80), (85, 130), (132, 180)), 185)
    doc_id, bits, sul = layout_to_metadata(layout, doc_neighbors=[[1], [], [0]],
                                           pad_to=L)
    doc_id = np.stack([doc_id] * B)
    bits = np.stack([bits] * B)
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
               for _ in range(3))
    sul_a, vl_a = jnp.array([sul] * B), jnp.array([230] * B)
    ref = np.asarray(sdag_attention_reference(q, k, v, jnp.asarray(doc_id),
                                              jnp.asarray(bits), sul_a, vl_a))
    out = np.asarray(sdag_splash_attention(q, k, v, jnp.asarray(doc_id),
                                           jnp.asarray(bits), sul_a, vl_a,
                                           block_q=64, block_k=64,
                                           interpret=True))
    assert np.abs(ref - out)[:, :, :230].max() < 3e-2


def test_splash_gqa_and_qoffset_matches_reference():
    """Splash with grouped kv heads (no repeat materialization) and a
    context-parallel q-row slice (doc_id_q/nbr_bits_q/q_offset) — the
    capabilities that let the dispatcher route any prefill to splash."""
    from sdag_tpu.ops.attention import (prefill_mask_plan,
                                        sdag_prefill_attention,
                                        sdag_splash_attention)
    rng = np.random.default_rng(6)
    B, H, Hkv, L, Dh = 2, 4, 2, 512, 64
    layout = BlockLayout(480, 64, ((64, 180), (200, 330), (340, 460)), 460)
    d, nb, sul = layout_to_metadata(layout, doc_neighbors=[[1], [2], [0]],
                                    pad_to=L)
    d = jnp.asarray(np.stack([d] * B))
    nb = jnp.asarray(np.stack([nb] * B))
    q = jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, L, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, L, Dh)), jnp.float32)
    sul_a = jnp.array([sul] * B)
    vl_a = jnp.array([480, 512])

    ref = np.asarray(sdag_attention_reference(q, k, v, d, nb, sul_a, vl_a))
    out = np.asarray(sdag_splash_attention(
        q, k, v, d, nb, sul_a, vl_a, block_q=64, block_k=64,
        interpret=True))
    np.testing.assert_allclose(out[:, :, :480], ref[:, :, :480], atol=3e-2)

    # q-slice with global offset (context-parallel shard shape)
    s, e = 128, 256
    part = np.asarray(sdag_splash_attention(
        q[:, :, s:e], k, v, d, nb, sul_a, vl_a,
        doc_id_q=d[:, s:e], nbr_bits_q=nb[:, s:e],
        q_offset=jnp.full((B,), s, jnp.int32),
        block_q=64, block_k=64, interpret=True))
    np.testing.assert_allclose(part, ref[:, :, s:e], atol=3e-2)

    # dispatcher route: a prefill_mask_plan resolved to splash carries the
    # precomputed kinds through sdag_prefill_attention
    plan = prefill_mask_plan(q, k, d, nb, sul_a, valid_len=vl_a,
                             impl="pallas_splash", block_q=64, block_k=64)
    assert plan["impl"] == "pallas_splash" and plan["mask_tiles"] is None
    via = np.asarray(sdag_prefill_attention(
        q, k, v, d, nb, sul_a, valid_len=vl_a, mask_plan=plan,
        interpret=True))
    np.testing.assert_allclose(via[:, :, :480], ref[:, :, :480], atol=3e-2)


def test_prefill_dispatch_picks_splash_beyond_kvres_budget():
    """Beyond the KV-resident VMEM budget the auto dispatcher must choose
    the splash schedule, not the tile-streaming grid kernel (VERDICT r3
    item 4: the grid kernel DMAs every tile including SKIPs — exactly the
    regime splash exists for)."""
    from sdag_tpu.ops.attention import _resolve_prefill_impl
    small = jax.ShapeDtypeStruct((1, 16, 4096, 128), jnp.bfloat16)
    big = jax.ShapeDtypeStruct((1, 16, 32768, 128), jnp.bfloat16)
    assert _resolve_prefill_impl(small, small, "pallas") == "pallas_kvres"
    assert _resolve_prefill_impl(big, big, "pallas") == "pallas_splash"


def test_block_kinds_q_offset_slices():
    """Kinds for a q-row slice with offset == the matching rows of the full
    classification."""
    L, bq, bk = 256, 32, 32
    layout = BlockLayout(230, 40, ((40, 80), (85, 130), (132, 180)), 185)
    doc_id, bits, sul = layout_to_metadata(layout, doc_neighbors=[[1], [], [0]],
                                           pad_to=L)
    full = np.asarray(compute_block_kinds(
        jnp.asarray(doc_id[None]), jnp.asarray(bits[None]),
        jnp.asarray([sul]), jnp.asarray([230]), bq, bk))[0]
    # slice rows [128, 256) => q-blocks 4..8
    sl = slice(128, 256)
    part = np.asarray(compute_block_kinds(
        jnp.asarray(doc_id[None]), jnp.asarray(bits[None]),
        jnp.asarray([sul]), jnp.asarray([230]), bq, bk,
        doc_id_q=jnp.asarray(doc_id[None, sl]),
        nbr_bits_q=jnp.asarray(bits[None, sl]),
        q_offset=jnp.asarray([128])))[0]
    np.testing.assert_array_equal(part, full[4:8])


def test_kvres_kernel_matches_reference():
    """KV-resident schedule (interpret mode) == dense-mask reference,
    including the context-parallel q_offset path."""
    from sdag_tpu.ops.attention import (sdag_attention_reference,
                                        sdag_flash_attention_kvres)
    from sdag_tpu.sdag.mask import BlockLayout, layout_to_metadata

    rng = np.random.default_rng(4)
    B, H, Hkv, L, Dh = 2, 4, 2, 512, 64
    layout = BlockLayout(480, 64, ((64, 180), (200, 330), (340, 460)), 460)
    d, nb, sul = layout_to_metadata(layout, doc_neighbors=[[1], [2], [0]],
                                    pad_to=L)
    d = jnp.asarray(np.stack([d] * B))
    nb = jnp.asarray(np.stack([nb] * B))
    q = jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, L, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, L, Dh)), jnp.float32)
    sul_a = jnp.array([sul] * B)
    vl_a = jnp.array([480, 512])

    ref = np.asarray(sdag_attention_reference(q, k, v, d, nb, sul_a, vl_a))
    out = np.asarray(sdag_flash_attention_kvres(
        q, k, v, d, nb, sul_a, vl_a, block_q=64, block_k=64,
        interpret=True))
    np.testing.assert_allclose(out[:, :, :480], ref[:, :, :480], atol=3e-2)

    # q-slice with global offset (context-parallel shard shape)
    s, e = 128, 256
    part = np.asarray(sdag_flash_attention_kvres(
        q[:, :, s:e], k, v, d, nb, sul_a, vl_a,
        doc_id_q=d[:, s:e], nbr_bits_q=nb[:, s:e],
        q_offset=jnp.full((B,), s, jnp.int32),
        block_q=64, block_k=64, interpret=True))
    np.testing.assert_allclose(part, ref[:, :, s:e], atol=3e-2)


def test_kvres_worklist_matches_reference():
    """worklist=True (fori_loop over packed live tiles against VMEM-resident
    K/V) == dense-mask reference, incl. GQA heads, random layouts and the
    context-parallel q_offset path."""
    from sdag_tpu.ops.attention import (sdag_attention_reference,
                                        sdag_flash_attention_kvres)
    from sdag_tpu.sdag.mask import BlockLayout, layout_to_metadata

    rng = np.random.default_rng(11)
    B, H, Hkv, L, Dh = 2, 4, 2, 512, 64
    layout = BlockLayout(480, 64, ((64, 180), (200, 330), (340, 460)), 460)
    d, nb, sul = layout_to_metadata(layout, doc_neighbors=[[1], [2], [0]],
                                    pad_to=L)
    d = jnp.asarray(np.stack([d] * B))
    nb = jnp.asarray(np.stack([nb] * B))
    q = jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, L, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, L, Dh)), jnp.float32)
    sul_a = jnp.array([sul] * B)
    vl_a = jnp.array([480, 512])

    ref = np.asarray(sdag_attention_reference(q, k, v, d, nb, sul_a, vl_a))
    out = np.asarray(sdag_flash_attention_kvres(
        q, k, v, d, nb, sul_a, vl_a, block_q=64, block_k=64,
        interpret=True, worklist=True))
    np.testing.assert_allclose(out[:, :, :480], ref[:, :, :480], atol=3e-2)

    # q-slice with global offset (context-parallel shard shape)
    s, e = 128, 256
    part = np.asarray(sdag_flash_attention_kvres(
        q[:, :, s:e], k, v, d, nb, sul_a, vl_a,
        doc_id_q=d[:, s:e], nbr_bits_q=nb[:, s:e],
        q_offset=jnp.full((B,), s, jnp.int32),
        block_q=64, block_k=64, interpret=True, worklist=True))
    np.testing.assert_allclose(part, ref[:, :, s:e], atol=3e-2)

    # plain causal (no docs): worklist must reduce to exact causal too
    causal_id = jnp.full((B, L), -1, jnp.int32)
    zeros = jnp.zeros((B, L), jnp.int32)
    ref_c = np.asarray(sdag_attention_reference(
        q, k, v, causal_id, zeros, jnp.zeros((B,), jnp.int32), vl_a))
    out_c = np.asarray(sdag_flash_attention_kvres(
        q, k, v, causal_id, zeros, jnp.zeros((B,), jnp.int32), vl_a,
        block_q=64, block_k=64, interpret=True, worklist=True))
    np.testing.assert_allclose(out_c[0, :, :480], ref_c[0, :, :480],
                               atol=3e-2)
    np.testing.assert_allclose(out_c[1], ref_c[1], atol=3e-2)


def test_flash_kernel_beyond_31_docs():
    """Isolation-only layouts with >31 docs (ids alias onto bit 31 in the
    block-kind summaries, conservatively) must still produce exact kernel
    output, and the block-kind classification must stay sound."""
    rng = np.random.default_rng(11)
    n_docs, dl, sul = 40, 12, 32
    L = 640  # sul + 40*12 + tail, padded
    spans = tuple((sul + d * dl, sul + (d + 1) * dl) for d in range(n_docs))
    layout = BlockLayout(sul + n_docs * dl + 16, sul, spans,
                         qa_start=sul + n_docs * dl)
    doc_id, bits, _ = layout_to_metadata(layout, pad_to=L)
    B, H, Dh = 1, 2, 32
    vl = layout.seq_len
    doc_id_b = np.stack([doc_id] * B)
    bits_b = np.stack([bits] * B)
    q = rng.standard_normal((B, H, L, Dh)).astype(np.float32)
    k = rng.standard_normal((B, H, L, Dh)).astype(np.float32)
    v = rng.standard_normal((B, H, L, Dh)).astype(np.float32)
    args = [jnp.asarray(x) for x in (q, k, v, doc_id_b, bits_b)]
    sul_a, vl_a = jnp.array([sul]), jnp.array([vl])
    ref = np.asarray(sdag_attention_reference(*args, sys_user_len=sul_a,
                                              valid_len=vl_a))
    out = np.asarray(sdag_flash_attention(
        *args, sys_user_len=sul_a, valid_len=vl_a, block_q=64, block_k=64,
        interpret=True))
    assert np.abs(ref - out)[:, :, :vl].max() < 3e-2

    # block-kind soundness at >31 docs: SKIP tiles must be all-invisible,
    # FULL tiles all-visible, per the exact dense mask
    mask = mask_from_metadata(doc_id, bits, sul, valid_len=vl)
    kinds = np.asarray(compute_block_kinds(
        jnp.asarray(doc_id_b), jnp.asarray(bits_b), sul_a, vl_a,
        block_q=64, block_k=64))[0]
    for qi in range(kinds.shape[0]):
        for ki in range(kinds.shape[1]):
            tile = mask[qi * 64:(qi + 1) * 64, ki * 64:(ki + 1) * 64]
            if kinds[qi, ki] == BLOCK_SKIP:
                assert not tile.any(), (qi, ki)
            elif kinds[qi, ki] == BLOCK_FULL:
                assert tile.all(), (qi, ki)


def test_kvres_mask_tiles_matches_reference():
    """Precomputed-mask-tile path (use_mask_tiles=True): identical to the
    reference; masks are streamed as int8 tiles instead of recomputed
    per (layer, head, tile) on the VPU."""
    from sdag_tpu.ops.attention import sdag_flash_attention_kvres
    rng = np.random.default_rng(3)
    B, H, L, Dh = 2, 4, 256, 64
    layout = BlockLayout(230, 40, ((40, 80), (85, 130), (132, 180)), 185)
    doc_id, bits, sul = layout_to_metadata(layout, doc_neighbors=[[1], [], [0]],
                                           pad_to=L)
    doc_id = np.stack([doc_id] * B)
    bits = np.stack([bits] * B)
    q = rng.standard_normal((B, H, L, Dh)).astype(np.float32)
    k = rng.standard_normal((B, 2, L, Dh)).astype(np.float32)  # GQA
    v = rng.standard_normal((B, 2, L, Dh)).astype(np.float32)
    args = [jnp.asarray(x) for x in (q, k, v, doc_id, bits)]
    sa, va = jnp.array([sul] * B), jnp.array([230, 200])
    ref = np.asarray(sdag_attention_reference(*args, sys_user_len=sa,
                                              valid_len=va))
    out = np.asarray(sdag_flash_attention_kvres(
        *args, sys_user_len=sa, valid_len=va, block_q=64, block_k=64,
        interpret=True, use_mask_tiles=True))
    for b, vl in enumerate([230, 200]):
        assert np.abs(ref[b] - out[b])[:, :vl].max() < 3e-2


def test_prefill_mask_plan_computes_metadata_once():
    """The layer-invariant kinds/mask tiles must be derived ONCE per
    prefill, not once per layer: XLA does not CSE the duplication across
    layer subgraphs (measured: compiled-HLO iota count scaled linearly
    with n_layers before the hoist).  Also pins plan == no-plan output
    bit-identity through a 4-layer model."""
    from unittest import mock

    import sdag_tpu.ops.attention as A
    from sdag_tpu.models.llama import (DecoderConfig, init_decoder_params,
                                       prefill)

    calls = {"kinds": 0, "tiles": 0, "kernel": 0}
    orig_kinds = A.compute_block_kinds
    orig_tiles = A.tile_masks_from_metadata
    orig_kvres = A.sdag_flash_attention_kvres

    def k_wrap(*a, **kw):
        calls["kinds"] += 1
        return orig_kinds(*a, **kw)

    def t_wrap(*a, **kw):
        calls["tiles"] += 1
        return orig_tiles(*a, **kw)

    def kv_wrap(*a, **kw):
        calls["kernel"] += 1
        kw["interpret"] = True
        return orig_kvres(*a, **kw)

    cfg = DecoderConfig(vocab_size=512, d_model=64, n_layers=4,
                        n_heads=4, n_kv_heads=2, d_ff=128,
                        dtype=jnp.float32)
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    B, L = 2, 256
    ids = jnp.zeros((B, L), jnp.int32)
    rng = np.random.default_rng(0)
    doc_id = jnp.asarray(rng.integers(-1, 4, size=(B, L)), jnp.int32)
    nbr = jnp.zeros((B, L), jnp.int32)
    kw = dict(cache_size=L + 8, doc_id=doc_id, nbr_bits=nbr,
              sys_user_len=jnp.asarray([32, 16]),
              valid_len=jnp.asarray([L, L - 64]),
              attn_impl="pallas_kvres")
    with mock.patch.object(A, "compute_block_kinds", k_wrap), \
            mock.patch.object(A, "tile_masks_from_metadata", t_wrap), \
            mock.patch.object(A, "sdag_flash_attention_kvres", kv_wrap):
        with_plan, _ = prefill(params, cfg, ids, **kw)
        assert calls == {"kinds": 1, "tiles": 1, "kernel": 4}, calls
        with mock.patch.object(A, "prefill_mask_plan",
                               lambda *a, **k: None):
            no_plan, _ = prefill(params, cfg, ids, **kw)
    assert bool(jnp.all(with_plan == no_plan))


def test_xla_fallback_forwards_cp_metadata():
    """sdag_prefill_attention's XLA fallback must forward the semantic
    kwargs (q_offset/doc_id_q/nbr_bits_q/scale) — dropping them computed
    the wrong mask for context-parallel callers — and the reference must
    accept per-batch [B] q_offset like the Pallas kernels do."""
    from sdag_tpu.ops.attention import sdag_prefill_attention
    rng = np.random.default_rng(5)
    B, H, L, Dh = 2, 2, 128, 32
    Lq, off = 64, 64                      # second half of the q rows
    doc_id, bits, sul = layout_to_metadata(
        BlockLayout(120, 24, ((24, 60), (62, 100)), 104),
        doc_neighbors=[[1], [0]], pad_to=L)
    doc_id = np.stack([doc_id] * B)
    bits = np.stack([bits] * B)
    q = rng.standard_normal((B, H, L, Dh)).astype(np.float32)
    k = rng.standard_normal((B, H, L, Dh)).astype(np.float32)
    v = rng.standard_normal((B, H, L, Dh)).astype(np.float32)
    sa = jnp.array([sul] * B)
    vl = jnp.array([120, 110])
    full = sdag_attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(doc_id), jnp.asarray(bits), sa, vl)
    # q-slice through the DISPATCHER on the xla path, array q_offset
    sliced = sdag_prefill_attention(
        jnp.asarray(q[:, :, off:off + Lq]), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(doc_id), jnp.asarray(bits), sa, valid_len=vl,
        impl="xla", q_offset=jnp.full((B,), off, jnp.int32),
        doc_id_q=jnp.asarray(doc_id[:, off:off + Lq]),
        nbr_bits_q=jnp.asarray(bits[:, off:off + Lq]))
    np.testing.assert_allclose(np.asarray(sliced),
                               np.asarray(full)[:, :, off:off + Lq],
                               rtol=2e-5, atol=2e-5)


def test_block_kinds_per_token_nbr_bits_not_full():
    """FULL must hold for EVERY row of a tile: if nbr_bits vary per token
    within a doc-homogeneous q block (legal for _tile_mask, which reads
    nbr per row), a row-0-only summary would over-claim FULL and leak
    cross-document attention.  The classifier AND-reduces the block's
    bits, so this tile must stay PARTIAL, and the kernel must match the
    dense reference row-for-row."""
    from sdag_tpu.ops.attention import sdag_flash_attention_kvres

    L, bq, bk = 128, 64, 64
    doc_id = np.concatenate([np.zeros(64, np.int32),
                             np.ones(64, np.int32)])
    bits = np.zeros(L, np.int32)
    bits[64] = 1          # ONLY the first row of doc-1's block sees doc 0
    kinds = np.asarray(compute_block_kinds(
        jnp.asarray(doc_id[None]), jnp.asarray(bits[None]),
        jnp.asarray([0]), jnp.asarray([L]), bq, bk))[0]
    assert kinds[1, 0] == BLOCK_PARTIAL  # not FULL: rows 65.. see nothing

    rng = np.random.default_rng(7)
    B, H, Dh = 1, 2, 32
    q = jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
    args = (q, k, v, jnp.asarray(doc_id[None]), jnp.asarray(bits[None]),
            jnp.array([0]), jnp.array([L]))
    ref = np.asarray(sdag_attention_reference(*args))
    out = np.asarray(sdag_flash_attention(*args, block_q=bq, block_k=bk,
                                          interpret=True))
    np.testing.assert_allclose(out, ref, atol=3e-2)
    out2 = np.asarray(sdag_flash_attention_kvres(
        *args, block_q=bq, block_k=bk, interpret=True))
    np.testing.assert_allclose(out2, ref, atol=3e-2)


def test_prefill_plan_block_override_rejected():
    """A mask_plan's kinds/tiles are derived for the plan's block sizes;
    a conflicting per-call override would index kinds out of bounds in
    SMEM and silently mis-kind live tiles, so the dispatcher rejects it."""
    from sdag_tpu.ops.attention import (prefill_mask_plan,
                                        sdag_prefill_attention)

    rng = np.random.default_rng(3)
    B, H, L, Dh = 1, 2, 256, 32
    layout = BlockLayout(230, 40, ((40, 80), (85, 130), (132, 180)), 185)
    doc_id, bits, sul = layout_to_metadata(layout,
                                           doc_neighbors=[[1], [], [0]],
                                           pad_to=L)
    q = jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, Dh)), jnp.float32)
    plan = prefill_mask_plan(q, k, jnp.asarray(doc_id[None]),
                             jnp.asarray(bits[None]), jnp.array([sul]),
                             impl="pallas", block_q=128, block_k=128)
    assert plan is not None and plan["block_q"] == 128
    with pytest.raises(ValueError, match="conflicts with mask_plan"):
        sdag_prefill_attention(
            q, k, v, jnp.asarray(doc_id[None]), jnp.asarray(bits[None]),
            jnp.array([sul]), mask_plan=plan, block_q=64, interpret=True)
