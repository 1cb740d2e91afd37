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
