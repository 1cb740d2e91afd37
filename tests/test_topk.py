"""Kernel-parity tests: fused Pallas matmul+top-k vs exact XLA search, and
the sharded (8 virtual devices) path vs single-device (SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdag_tpu.core.mesh import make_index_mesh
from sdag_tpu.ops.topk import (approx_topk_matmul, approx_topk_matmul_int8,
                               exact_topk_xla, fused_topk_matmul, merge_topk)
from sdag_tpu.parallel.collectives import sharded_topk_search
from sdag_tpu.retrieval.dense import DenseIndex, DenseRetriever


def _rand(q, n, d, seed=0):
    rng = np.random.default_rng(seed)
    qe = rng.standard_normal((q, d)).astype(np.float32)
    ce = rng.standard_normal((n, d)).astype(np.float32)
    qe /= np.linalg.norm(qe, axis=1, keepdims=True)
    ce /= np.linalg.norm(ce, axis=1, keepdims=True)
    return qe, ce


def test_fused_matches_exact_interpret():
    qe, ce = _rand(7, 900, 128)
    v_ref, i_ref = exact_topk_xla(jnp.array(qe), jnp.array(ce), 10)
    v, i = fused_topk_matmul(jnp.array(qe), jnp.array(ce), 10,
                             block_n=256, interpret=True)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_fused_tie_break_lowest_index():
    c = np.zeros((16, 8), np.float32)
    c[3] = c[9] = c[12] = 1.0
    q = np.ones((1, 8), np.float32)
    _, i = fused_topk_matmul(jnp.array(q), jnp.array(c), 3,
                             block_n=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(i)[0], [3, 9, 12])


def test_fused_valid_n_masks_padding():
    qe, ce = _rand(2, 64, 32)
    ce[50:] = 10.0  # rows beyond valid_n would dominate if unmasked
    v, i = fused_topk_matmul(jnp.array(qe), jnp.array(ce), 5,
                             block_n=32, valid_n=50, interpret=True)
    assert np.asarray(i).max() < 50


def test_exact_recall_vs_numpy():
    """recall@k == 1.0 vs a plain numpy exact scan (faiss-flat stand-in)."""
    qe, ce = _rand(20, 2000, 64, seed=3)
    scores = qe @ ce.T
    ref_idx = np.argsort(-scores, axis=1, kind="stable")[:, :10]
    _, i = exact_topk_xla(jnp.array(qe), jnp.array(ce), 10)
    recall = np.mean([
        len(set(ref_idx[r]) & set(np.asarray(i)[r])) / 10
        for r in range(20)
    ])
    assert recall == 1.0


def test_merge_topk_orders_by_score_then_index():
    v, i = merge_topk(jnp.array([[1.0, 2.0, 2.0, 0.5]]),
                      jnp.array([[9, 7, 3, 1]]), 3)
    np.testing.assert_array_equal(np.asarray(i)[0], [3, 7, 9])


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_search_matches_single_device():
    mesh = make_index_mesh()
    qe, ce = _rand(6, 1000, 64, seed=5)
    k = 10
    v_ref, i_ref = exact_topk_xla(jnp.array(qe), jnp.array(ce), k)

    block_n = 32
    n_pad = ((1000 + block_n * 8 - 1) // (block_n * 8)) * (block_n * 8)
    ce_pad = np.zeros((n_pad, 64), np.float32)
    ce_pad[:1000] = ce
    from sdag_tpu.core.mesh import shard_rows
    c_sharded = shard_rows(jnp.array(ce_pad), mesh, "index")

    v, i = sharded_topk_search(jnp.array(qe), c_sharded, k, valid_n=1000,
                               mesh=mesh, block_n=block_n)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_search_matches_single_device_at_1m_aggregate():
    """HBM-scale sharding equality (VERDICT r2 item 2): 8 virtual shards
    holding an aggregate N=1,048,576 corpus must reproduce the
    single-device exact search bit-for-bit.  Corpus is generated on
    device (like the on-chip 1M bench) to keep the test's host footprint
    one shard, not eight."""
    mesh = make_index_mesh()
    N, D, Q, k = 1 << 20, 128, 8, 10
    corpus = jax.random.normal(jax.random.PRNGKey(0), (N, D), jnp.float32)
    qe = jax.random.normal(jax.random.PRNGKey(1), (Q, D), jnp.float32)
    v_ref, i_ref = exact_topk_xla(qe, corpus, k)

    from sdag_tpu.core.mesh import shard_rows
    c_sharded = shard_rows(corpus, mesh, "index")
    v, i = sharded_topk_search(qe, c_sharded, k, valid_n=N, mesh=mesh,
                               block_n=4096)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-4)


def test_dense_index_end_to_end(tmp_path):
    qe, ce = _rand(4, 300, 32, seed=9)
    meta = [{"id": f"doc{i}", "text": f"text {i}"} for i in range(300)]
    index = DenseIndex(ce, meta, block_n=32)
    idx, scores = index.search(qe, top_k=5)
    assert idx.shape == (4, 5)
    # parity with exact scan
    ref = np.argsort(-(qe @ ce.T), axis=1, kind="stable")[:, :5]
    np.testing.assert_array_equal(idx, ref)
    texts, ids_, scs = index.materialize(idx, scores)
    assert ids_[0][0] == f"doc{ref[0][0]}"
    # save / load round-trip
    index.save(str(tmp_path / "idx"))
    index2 = DenseIndex.load(str(tmp_path / "idx"))
    idx2, _ = index2.search(qe, top_k=5)
    np.testing.assert_array_equal(idx2, idx)


class _FakeEncoder:
    """Deterministic hash-based encoder for retriever-level tests."""

    def __init__(self, dim=32):
        self.dim = dim

    def encode(self, texts, kind="query", batch_size=32):
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            rng = np.random.default_rng(abs(hash((kind != "raw", t))) % (2**32))
            out[i] = rng.standard_normal(self.dim)
        out /= np.linalg.norm(out, axis=1, keepdims=True) + 1e-9
        return out


def test_dense_retriever_contract():
    enc = _FakeEncoder()
    texts = [f"document number {i}" for i in range(100)]
    index = DenseIndex.from_texts(texts, [f"d{i}" for i in range(100)],
                                  enc, block_n=32)
    r = DenseRetriever(enc, index)
    batch = r.retrieve_batch(["q one", "q two"], max_k_needed=3,
                             embed_batch_size=8)
    assert len(batch.docs_texts_full) == 2
    assert len(batch.docs_texts_full[0]) == 3
    assert len(batch.ids_full[0]) == 3
    assert len(batch.q_embs) == 2
    # scores descending
    assert batch.scores_full[0] == sorted(batch.scores_full[0], reverse=True)


def test_approx_topk_matches_exact_off_tpu():
    """approx_max_k falls back to exact top-k off-TPU, and the candidate
    merge applies the exact (score desc, index asc) tie-break — so the
    approx path is deterministic-exact in CPU tests, incl. valid_n
    masking and -1 mapping of invalid rows."""
    qe, ce = _rand(5, 700, 64, seed=13)
    v_ref, i_ref = exact_topk_xla(jnp.array(qe), jnp.array(ce), 10,
                                  valid_n=600)
    v, i = approx_topk_matmul(jnp.array(qe), jnp.array(ce), 10, valid_n=600)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    assert np.asarray(i).max() < 600


def test_approx_topk_k_exceeds_valid_rows():
    qe, ce = _rand(2, 64, 32, seed=14)
    v, i = approx_topk_matmul(jnp.array(qe), jnp.array(ce), 8, valid_n=4)
    i = np.asarray(i)
    v = np.asarray(v)
    assert set(i[0, :4]) <= set(range(4))
    np.testing.assert_array_equal(i[:, 4:], -1)
    assert np.all(np.isneginf(v[:, 4:]))


def test_approx_topk_int8_matches_quantized_scan():
    from sdag_tpu.ops.topk import quantize_rows_int8
    qe, ce = _rand(6, 800, 64, seed=15)
    ci8, sc = quantize_rows_int8(ce)
    v, i = approx_topk_matmul_int8(jnp.asarray(qe), jnp.asarray(ci8),
                                   jnp.asarray(sc), 10)
    # host replication of the quantized scoring rule
    qs = np.maximum(np.abs(qe).max(axis=1), 1e-12) / 127.0
    qi = np.clip(np.round(qe / qs[:, None]), -127, 127).astype(np.int32)
    s_host = (qi @ ci8.astype(np.int32).T).astype(np.float32) \
        * qs[:, None].astype(np.float32) * sc[None, :].astype(np.float32)
    ref = np.argsort(-s_host, axis=1, kind="stable")[:, :10]
    recall = np.mean([len(set(ref[r]) & set(np.asarray(i)[r])) / 10
                      for r in range(6)])
    assert recall == 1.0
    np.testing.assert_allclose(
        np.asarray(v), np.take_along_axis(s_host, ref, axis=1), rtol=1e-5)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_search_approx_matches_single_device():
    mesh = make_index_mesh()
    qe, ce = _rand(6, 1000, 64, seed=16)
    k = 10
    v_ref, i_ref = exact_topk_xla(jnp.array(qe), jnp.array(ce), k)
    block_n = 32
    n_pad = ((1000 + block_n * 8 - 1) // (block_n * 8)) * (block_n * 8)
    ce_pad = np.zeros((n_pad, 64), np.float32)
    ce_pad[:1000] = ce
    from sdag_tpu.core.mesh import shard_rows
    c_sharded = shard_rows(jnp.array(ce_pad), mesh, "index")
    v, i = sharded_topk_search(jnp.array(qe), c_sharded, k, valid_n=1000,
                               mesh=mesh, block_n=block_n, mode="approx")
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_dense_index_search_mode_exact_matches_approx_off_tpu(tmp_path):
    qe, ce = _rand(4, 300, 32, seed=17)
    meta = [{"id": f"doc{i}", "text": f"t{i}"} for i in range(300)]
    idx_a, _ = DenseIndex(ce, meta, block_n=32,
                          search_mode="approx").search(qe, top_k=5)
    idx_e, _ = DenseIndex(ce, meta, block_n=32,
                          search_mode="exact").search(qe, top_k=5)
    np.testing.assert_array_equal(idx_a, idx_e)


def test_rescored_int8_recall_vs_exact_f32():
    """int8 coarse + residual rescore recovers the exact f32 top-k: the
    reconstruction is ~15-bit precise, so on random normalized embeddings
    recall@10 vs the exact f32 scan is ~1.0 (pure int8 sits at ~0.98)."""
    from sdag_tpu.ops.topk import (quantize_rows_int8_residual,
                                   rescored_topk_int8)
    qe, ce = _rand(16, 2000, 128, seed=21)
    b, sb, r, sr = quantize_rows_int8_residual(ce)
    v, i = rescored_topk_int8(jnp.asarray(qe), jnp.asarray(b),
                              jnp.asarray(sb), jnp.asarray(r),
                              jnp.asarray(sr), 10)
    ref = np.argsort(-(qe @ ce.T), axis=1, kind="stable")[:, :10]
    recall = np.mean([len(set(ref[q]) & set(np.asarray(i)[q])) / 10
                      for q in range(16)])
    assert recall >= 0.99
    # rescored scores are the ~15-bit reconstruction of the true scores
    true = np.take_along_axis(qe @ ce.T, np.asarray(i), axis=1)
    np.testing.assert_allclose(np.asarray(v), true, atol=2e-3)


def test_rescored_int8_valid_n_and_short_rows():
    from sdag_tpu.ops.topk import (quantize_rows_int8_residual,
                                   rescored_topk_int8)
    qe, ce = _rand(3, 64, 32, seed=22)
    ce[50:] = 10.0  # would dominate if unmasked
    b, sb, r, sr = quantize_rows_int8_residual(ce)
    v, i = rescored_topk_int8(jnp.asarray(qe), jnp.asarray(b),
                              jnp.asarray(sb), jnp.asarray(r),
                              jnp.asarray(sr), 8, valid_n=4)
    i = np.asarray(i)
    v = np.asarray(v)
    assert set(i[0, :4]) <= set(range(4))
    np.testing.assert_array_equal(i[:, 4:], -1)
    assert np.all(np.isneginf(v[:, 4:]))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_rescored_int8_matches_exact():
    from sdag_tpu.core.mesh import shard_rows
    from sdag_tpu.ops.topk import quantize_rows_int8_residual
    mesh = make_index_mesh()
    qe, ce = _rand(6, 1000, 64, seed=23)
    k = 10
    block_n = 32
    n_pad = ((1000 + block_n * 8 - 1) // (block_n * 8)) * (block_n * 8)
    ce_pad = np.zeros((n_pad, 64), np.float32)
    ce_pad[:1000] = ce
    b, sb, r, sr = quantize_rows_int8_residual(ce_pad)
    v, i = sharded_topk_search(
        jnp.asarray(qe), shard_rows(jnp.asarray(b), mesh, "index"), k,
        valid_n=1000, mesh=mesh, block_n=block_n,
        scales=shard_rows(jnp.asarray(sb), mesh, "index"), mode="approx",
        resid=shard_rows(jnp.asarray(r), mesh, "index"),
        resid_scales=shard_rows(jnp.asarray(sr), mesh, "index"))
    ref = np.argsort(-(qe @ ce.T), axis=1, kind="stable")[:, :k]
    recall = np.mean([len(set(ref[q]) & set(np.asarray(i)[q])) / k
                      for q in range(6)])
    assert recall >= 0.99
    assert np.asarray(i).max() < 1000


def test_dense_index_int8_rescore_end_to_end(tmp_path):
    """DenseIndex int8 default (rescore on) matches the exact f32 scan on
    CPU; rescore off falls back to the pure-int8 engine."""
    qe, ce = _rand(8, 600, 64, seed=24)
    meta = [{"id": f"d{i}", "text": f"t{i}"} for i in range(600)]
    index = DenseIndex(ce, meta, block_n=64, dtype=jnp.int8)
    assert index.int8_rescore and index.resid is not None
    idx, _ = index.search(qe, top_k=10)
    ref = np.argsort(-(qe @ ce.T), axis=1, kind="stable")[:, :10]
    recall = np.mean([len(set(ref[q]) & set(idx[q])) / 10 for q in range(8)])
    assert recall >= 0.99
    # save() reconstructs base+resid (15-bit) -> reload as f32 agrees
    index.save(str(tmp_path / "i8r"))
    idx2, _ = DenseIndex.load(str(tmp_path / "i8r")).search(qe, top_k=10)
    overlap = np.mean([len(set(idx[q]) & set(idx2[q])) / 10
                       for q in range(8)])
    assert overlap >= 0.99
    plain = DenseIndex(ce, meta, block_n=64, dtype=jnp.int8,
                       int8_rescore=False)
    assert plain.resid is None and not plain.int8_rescore
    assert plain.search(qe, top_k=10)[0].shape == (8, 10)


def test_int8_index_recall_and_roundtrip(tmp_path):
    from sdag_tpu.ops.topk import fused_topk_matmul_int8, quantize_rows_int8
    qe, ce = _rand(10, 1500, 64, seed=11)
    ci8, sc = quantize_rows_int8(ce)
    v, i = fused_topk_matmul_int8(jnp.asarray(qe), jnp.asarray(ci8),
                                  jnp.asarray(sc), 10, block_n=256,
                                  interpret=True)
    ref = np.argsort(-(qe @ ce.T), axis=1, kind="stable")[:, :10]
    recall = np.mean([len(set(ref[r]) & set(np.asarray(i)[r])) / 10
                      for r in range(10)])
    assert recall >= 0.9  # approximate mode

    # DenseIndex int8 end-to-end + save restores dequantized f32
    meta = [{"id": f"d{i}", "text": f"t{i}"} for i in range(1500)]
    index = DenseIndex(ce, meta, block_n=256, dtype=jnp.int8)
    idx, scores = index.search(qe, top_k=5)
    assert idx.shape == (10, 5)
    index.save(str(tmp_path / "i8"))
    index2 = DenseIndex.load(str(tmp_path / "i8"))  # loads as f32
    idx2, _ = index2.search(qe, top_k=5)
    overlap = np.mean([len(set(idx[r]) & set(idx2[r])) / 5 for r in range(10)])
    assert overlap >= 0.8


def test_fused_topk_k_exceeds_valid_rows_reports_minus1():
    """Contract pin (kernel audit): when k > valid_n the fused kernels
    must report -1 indices for the -inf slots — leaking the real ids of
    masked/padded rows would feed garbage documents to retrieval.  All
    engines (exact / fused f32 / fused int8) agree slot-for-slot."""
    from sdag_tpu.ops.topk import fused_topk_matmul_int8, quantize_rows_int8
    qe, ce = _rand(2, 64, 32, seed=14)
    v_ref, i_ref = exact_topk_xla(jnp.array(qe), jnp.array(ce), 8, valid_n=4)
    v, i = fused_topk_matmul(jnp.array(qe), jnp.array(ce), 8, block_n=32,
                             valid_n=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_array_equal(np.asarray(i)[:, 4:], -1)
    assert np.all(np.isneginf(np.asarray(v)[:, 4:]))

    ci8, sc = quantize_rows_int8(ce)
    v8, i8 = fused_topk_matmul_int8(jnp.asarray(qe), jnp.asarray(ci8),
                                    jnp.asarray(sc), 8, block_n=32,
                                    valid_n=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(i8)[:, 4:], -1)
    assert np.all(np.isneginf(np.asarray(v8)[:, 4:]))
    assert set(np.asarray(i8)[0, :4]) <= set(range(4))
