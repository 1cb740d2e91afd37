"""Defense layer: passthrough, discern classify/cache semantics,
embedding-filter (ragdefender-equivalent), label cache IO, KNN, selection."""

import random

import numpy as np

from sdag_tpu.attack.selection import select_malicious_docs_for_batch
from sdag_tpu.datamodels import make_mal_id
from sdag_tpu.defenses.cache import (load_discern_labels_jsonl,
                                     save_discern_labels_jsonl)
from sdag_tpu.defenses.discern import (DiscernAndAnswerDefense, parse_label)
from sdag_tpu.defenses.none import NoDefense
from sdag_tpu.defenses.ragdefender import EmbeddingFilterDefense
from sdag_tpu.sdag.knn import compute_doc_knn_for_docs


class HashEncoder:
    """Deterministic encoder; identical texts -> identical embeddings."""

    def __init__(self, dim=32):
        self.dim = dim

    def encode(self, texts, kind="passage", batch_size=32):
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            rng = np.random.default_rng(abs(hash(t)) % (2**32))
            out[i] = rng.standard_normal(self.dim)
        out /= np.linalg.norm(out, axis=1, keepdims=True) + 1e-9
        return out


def test_no_defense_oracle_and_not():
    d = NoDefense()
    out = d.apply("q1", "query", ["a", "b"], ["1", "2"], [0.5, 0.4],
                  ["mal"], does_oracle=True)
    assert out.ranked_docs == ["a", "b"]
    assert out.malicious_docs_survived == ["mal"]
    out2 = d.apply("q1", "query", ["a"], ["1"], None, ["mal"],
                   does_oracle=False)
    assert out2.malicious_docs_survived == []
    assert out2.ranked_scores is None


def test_parse_label_fallbacks():
    assert parse_label('{"label":"clean"}') == "clean"
    assert parse_label('{"label":"perturbed"}') == "perturbed"
    assert parse_label('{"label":"banana"}') == "perturbed"  # invalid label
    assert parse_label("not json at all") == "clean"          # parse failure


def test_discern_defense_filters_and_caches():
    calls = []

    def classify(query, passage):
        calls.append(passage)
        return "perturbed" if "EVIL" in passage else "clean"

    d = DiscernAndAnswerDefense(classify, max_docs_to_classify=32)
    cache = {}
    out = d.apply("q7", "what?", ["good doc", "EVIL doc"], ["c1", "c2"],
                  [0.9, 0.8], ["EVIL mal", "sneaky mal"], does_oracle=True,
                  persistent_cache=cache)
    # malicious-first joint list; survivors split corpus vs malicious
    assert out.ranked_docs == ["good doc"]
    assert out.ranked_ids == ["c1"]
    assert out.malicious_docs_survived == ["sneaky mal"]
    assert out.doc_labels[make_mal_id(0)] == "perturbed"
    assert out.doc_labels["c2"] == "perturbed"
    assert cache[("q7", "c1")] == "clean"
    # cache hit: no second classify call
    n = len(calls)
    d.apply("q7", "what?", ["good doc", "EVIL doc"], ["c1", "c2"],
            [0.9, 0.8], ["EVIL mal", "sneaky mal"], does_oracle=True,
            persistent_cache=cache)
    assert len(calls) == n


def test_discern_cap_limits_classification():
    seen = []

    def classify(query, passage):
        seen.append(passage)
        return "clean"

    d = DiscernAndAnswerDefense(classify, max_docs_to_classify=2)
    out = d.apply("q", "x", ["a", "b", "c"], ["1", "2", "3"], None, [],
                  does_oracle=True)
    assert len(seen) == 2
    assert out.ranked_docs == ["a", "b"]  # uncapped docs dropped from output


def test_label_cache_roundtrip(tmp_path):
    path = str(tmp_path / "labels.jsonl")
    cache = {("q1", "d1"): "clean", ("q1", "d2"): "perturbed"}
    save_discern_labels_jsonl(path, cache)
    loaded = load_discern_labels_jsonl(path)
    assert loaded == cache
    assert load_discern_labels_jsonl(str(tmp_path / "missing.jsonl")) == {}


def test_embedding_filter_drops_duplicates():
    enc = HashEncoder()
    d = EmbeddingFilterDefense(enc, z_threshold=10.0, duplicate_sim=0.99)
    # two identical malicious docs form a duplicate cluster -> dropped
    out = d.apply("q", "question", ["alpha doc", "beta doc", "gamma doc"],
                  ["1", "2", "3"], [0.3, 0.2, 0.1],
                  ["copy of claim", "copy of claim"], does_oracle=True)
    assert out.malicious_docs_survived == []
    assert set(out.ranked_docs) == {"alpha doc", "beta doc", "gamma doc"}


def test_embedding_filter_small_pool_passthrough():
    d = EmbeddingFilterDefense(HashEncoder())
    out = d.apply("q", "question", ["one"], ["1"], [0.1], [],
                  does_oracle=True)
    assert out.ranked_docs == ["one"]


def test_knn_semantics():
    enc = HashEncoder()
    docs = ["aaa", "bbb", "", "aaa"]  # duplicate texts are nearest neighbors
    nbrs = compute_doc_knn_for_docs(enc, docs, k_neighbors=1)
    assert nbrs[2] == []            # empty doc gets no neighbors
    assert nbrs[0] == [3]           # identical doc is the closest
    assert nbrs[3] == [0]
    assert compute_doc_knn_for_docs(enc, docs, 0) == [[], [], [], []]
    assert compute_doc_knn_for_docs(enc, ["only", ""], 2) == [[], []]


def test_selection_strategies():
    enc = HashEncoder()
    rng = random.Random(0)
    retrieved = [["doc a", "doc b"]]
    cands = [["x", "y", "z"]]
    out = select_malicious_docs_for_batch(enc, retrieved, cands, "random", 2,
                                          rng=rng)
    assert len(out[0]) == 2 and set(out[0]) <= {"x", "y", "z"}
    close = select_malicious_docs_for_batch(enc, retrieved, cands,
                                            "closest_to_centroid", 1,
                                            rng=rng)[0]
    far = select_malicious_docs_for_batch(enc, retrieved, cands,
                                          "furthest_from_centroid", 1,
                                          rng=rng)[0]
    # deterministic + consistent with direct centroid math
    emb_r = enc.encode(retrieved[0])
    centroid = emb_r.mean(0, keepdims=True)
    sims = (enc.encode(cands[0]) @ centroid.T).reshape(-1)
    assert close == [cands[0][int(np.argmax(sims))]]
    assert far == [cands[0][int(np.argmin(sims))]]
    # empty candidates / empty retrieved
    assert select_malicious_docs_for_batch(enc, [[]], [[]], "random", 1)[0] == []
    got = select_malicious_docs_for_batch(enc, [[]], [["m"]],
                                          "closest_to_centroid", 1,
                                          rng=rng)[0]
    assert got == ["m"]  # random fallback when no retrieved docs


def test_discern_batched_classifier_matches_sequential():
    """The batched classify path must produce the same labels/survivors as
    the per-doc path and fill the persistent cache identically."""
    from sdag_tpu.defenses.discern import DiscernAndAnswerDefense

    def classify(query, doc):
        return "perturbed" if "LIE" in doc else "clean"

    def classify_batch(pairs):
        return [classify(q, d) for q, d in pairs]

    docs = ["good one", "has LIE inside", "fine"]
    ids = ["a", "b", "c"]
    mals = ["LIE doc", "benign-looking"]
    kw = dict(query_id="q1", query="q?", corpus_docs=docs, corpus_ids=ids,
              corpus_scores=[3.0, 2.0, 1.0], malicious_docs=mals,
              does_oracle=True)

    cache_a, cache_b = {}, {}
    seq = DiscernAndAnswerDefense(classify).apply(
        **kw, persistent_cache=cache_a)
    bat = DiscernAndAnswerDefense(classify, classify_batch=classify_batch
                                  ).apply(**kw, persistent_cache=cache_b)
    assert seq.doc_labels == bat.doc_labels
    assert seq.ranked_docs == bat.ranked_docs
    assert seq.malicious_docs_survived == bat.malicious_docs_survived
    assert cache_a == cache_b
    # cached entries short-circuit the classifier on a second apply
    bat2 = DiscernAndAnswerDefense(
        lambda q, d: "clean", classify_batch=lambda p: ["clean"] * len(p)
    ).apply(**kw, persistent_cache=cache_b)
    assert bat2.doc_labels == bat.doc_labels
