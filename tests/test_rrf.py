"""Golden cases for reciprocal-rank fusion (reference ``hybrid.py:10-107``)."""

import random

from sdag_tpu.retrieval.hybrid import (
    fuse_sparse_and_dense_batch, rrf_fuse_one_query,
    split_k_between_sparse_and_dense)


def test_split_even():
    rng = random.Random(0)
    assert split_k_between_sparse_and_dense(10, rng) == (5, 5)


def test_split_odd_seeded():
    rng = random.Random(42)
    ks, kd = split_k_between_sparse_and_dense(5, rng)
    assert ks + kd == 5 and {ks, kd} == {2, 3}
    # deterministic for a given seed state
    rng2 = random.Random(42)
    assert split_k_between_sparse_and_dense(5, rng2) == (ks, kd)


def test_rrf_scores_and_dedup():
    docs, ids_, scores = rrf_fuse_one_query(
        sparse_docs=["A", "B"], sparse_ids=["a", "b"],
        dense_docs=["B", "C"], dense_ids=["b", "c"])
    # B appears in both lists: 1/(60+2) + 1/(60+1)
    by_id = dict(zip(ids_, scores))
    assert abs(by_id["b"] - (1 / 62 + 1 / 61)) < 1e-12
    assert abs(by_id["a"] - 1 / 61) < 1e-12
    assert abs(by_id["c"] - 1 / 62) < 1e-12
    assert ids_[0] == "b"  # highest fused score first
    assert len(ids_) == 3  # deduped


def test_rrf_text_fallback_key():
    # "NA"/empty ids fall back to doc text as the dedup key.
    docs, ids_, _ = rrf_fuse_one_query(
        sparse_docs=["same text"], sparse_ids=["NA"],
        dense_docs=["same text"], dense_ids=[""])
    assert len(docs) == 1


def test_fuse_batch_truncates_to_top_k():
    texts, ids_, scores = fuse_sparse_and_dense_batch(
        sparse_texts=[["s1", "s2", "s3"]], sparse_ids=[["1", "2", "3"]],
        dense_texts=[["d1", "d2", "d3"]], dense_ids=[["4", "5", "6"]],
        top_k=2, seed=7)
    assert len(texts[0]) <= 2 and len(ids_[0]) <= 2 and len(scores[0]) <= 2


def test_device_rrf_matches_host_fuser():
    """Device-side RRF (ops/rrf.py via HybridRetriever) must reproduce the
    host fuser exactly: same seeded odd-k split, same dedup, same
    (score desc, sparse-first) order (VERDICT r1 item 10)."""
    import numpy as np
    from sdag_tpu.models.e5 import (E5Encoder, EncoderConfig,
                                    init_encoder_params)
    from sdag_tpu.models.tokenizer import ByteTokenizer
    from sdag_tpu.retrieval.dense import DenseIndex, DenseRetriever
    from sdag_tpu.retrieval.hybrid import (HybridRetriever,
                                           fuse_sparse_and_dense_batch)
    from sdag_tpu.retrieval.sparse import BM25Index, SparseRetriever
    import jax

    rng = np.random.default_rng(5)
    words = [f"tok{i}" for i in range(60)]
    docs = [" ".join(rng.choice(words, size=rng.integers(4, 15)))
            for _ in range(40)]
    ids = [f"doc{i}" for i in range(40)]
    queries = [" ".join(rng.choice(words, size=3)) for _ in range(6)]

    cfg = EncoderConfig.tiny()
    enc = E5Encoder(init_encoder_params(jax.random.PRNGKey(0), cfg), cfg,
                    ByteTokenizer(), model_name="e5")
    dense = DenseRetriever(enc, DenseIndex.from_texts(docs, ids, enc))
    sparse = SparseRetriever(BM25Index.from_texts(docs, ids))
    hybrid = HybridRetriever(dense, sparse, seed=11)
    assert hybrid._same_corpus()

    k = 7  # odd: exercises the seeded coin flip
    got = hybrid.retrieve_batch(queries, max_k_needed=k, embed_batch_size=8)

    d_batch = dense.retrieve_batch(queries, k, 8)
    s_batch = sparse.retrieve_batch(queries, k, 8)
    texts, ids_, scores = fuse_sparse_and_dense_batch(
        s_batch.docs_texts_full, s_batch.ids_full,
        d_batch.docs_texts_full, d_batch.ids_full,
        top_k=k, seed=11)

    assert got.ids_full == ids_
    assert got.docs_texts_full == texts
    for a, b in zip(got.scores_full, scores):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_same_corpus_requires_positive_unique_ids():
    """Corpus identity must be POSITIVE: meta rows without ids compare
    None == None, and duplicate ids make the host fuser merge rows the
    device fuser keeps separate — both cases must route to the host
    path (review audit)."""

    class _FakeIndex:
        def __init__(self, meta):
            self.meta = meta

    class _Fake:
        def __init__(self, meta):
            self.index = _FakeIndex(meta)

    from sdag_tpu.retrieval.hybrid import HybridRetriever

    def same(dm, sm):
        h = HybridRetriever(_Fake(dm), _Fake(sm), seed=0)
        return h._same_corpus()

    with_ids = [{"id": "a", "text": "x"}, {"id": "b", "text": "y"}]
    assert same(with_ids, list(with_ids))
    # no ids on either side: NOT identical (None == None must not match)
    no_ids = [{"text": "x"}, {"text": "y"}]
    assert not same(no_ids, list(no_ids))
    # duplicate ids: host-path only (host dedups by id, device by index)
    dup = [{"id": "a", "text": "x"}, {"id": "a", "text": "y"}]
    assert not same(dup, list(dup))
    # different ids
    other = [{"id": "a", "text": "x"}, {"id": "c", "text": "y"}]
    assert not same(with_ids, other)
