"""Golden tests for ranked-list injection (reference ``ranked_list.py:8-139``
branch coverage) and doc corruption ops."""

import random

from sdag_tpu.attack.corruption import (
    build_docs_for_attack, doc_contains_any_gt, replace_gt_with_false)
from sdag_tpu.attack.injection import (
    apply_ranked_list_order, attack_config_requests_docs,
    inject_malicious_docs_into_ranked_list)

BASE = ["d1", "d2", "d3"]


def test_attack_config_requests_docs():
    assert attack_config_requests_docs(1)
    assert attack_config_requests_docs(-1)
    assert not attack_config_requests_docs(0)
    assert attack_config_requests_docs([0, 2])
    assert not attack_config_requests_docs([0, 0])
    assert not attack_config_requests_docs([None, 0])
    assert not attack_config_requests_docs("x")


def test_inject_pos_zero_noop():
    assert inject_malicious_docs_into_ranked_list(BASE, ["m"], 0) == BASE


def test_inject_empty_mals():
    assert inject_malicious_docs_into_ranked_list(BASE, [], 5) == BASE


def test_inject_fixed_contiguous():
    out = inject_malicious_docs_into_ranked_list(BASE, ["m1", "m2"], 2)
    assert out == ["d1", "m1", "m2", "d2", "d3"]


def test_inject_fixed_beyond_end_clamps():
    out = inject_malicious_docs_into_ranked_list(BASE, ["m"], 99)
    assert out == ["d1", "d2", "d3", "m"]


def test_inject_random_deterministic_with_rng():
    rng = random.Random(0)
    out = inject_malicious_docs_into_ranked_list(BASE, ["m"], -1, rng=rng)
    assert sorted(out) == sorted(BASE + ["m"])
    assert len(out) == 4


def test_inject_position_list_mixed():
    rng = random.Random(0)
    out = inject_malicious_docs_into_ranked_list(
        BASE, ["m1", "m2"], [1, 3], rng=rng)
    # fixed inserted high-to-low: pos 3 first => d1 d2 m2 d3, then pos 1
    assert out == ["m1", "d1", "d2", "m2", "d3"]


def test_inject_position_list_padded_with_random():
    rng = random.Random(1)
    out = inject_malicious_docs_into_ranked_list(BASE, ["m1", "m2"], [2], rng=rng)
    assert "m1" in out and "m2" in out
    assert len(out) == 5
    # m1 was inserted at rank 2 first; a later random insert may only push it
    # further down, never up.
    assert out.index("m1") in (1, 2)


def test_inject_position_list_none_dropped():
    out = inject_malicious_docs_into_ranked_list(BASE, ["m1"], [None])
    assert out == BASE


def test_apply_order():
    assert apply_ranked_list_order(BASE, "top_down") == BASE
    assert apply_ranked_list_order(BASE, "bottom_up") == list(reversed(BASE))
    out = apply_ranked_list_order(BASE, "random", rng=random.Random(3))
    assert sorted(out) == sorted(BASE)
    assert apply_ranked_list_order(BASE, "unknown") == BASE


def test_doc_contains_any_gt():
    assert doc_contains_any_gt("The capital is Paris.", ["paris"])
    assert not doc_contains_any_gt("", ["paris"])
    assert not doc_contains_any_gt("London calling", ["Paris", "  "])


def test_replace_gt_with_false():
    out = replace_gt_with_false("Paris is in France. PARIS!", ["paris"], "Rome")
    assert out == "Rome is in France. Rome!"
    assert replace_gt_with_false("", ["x"], "y") == ""
    assert replace_gt_with_false("abc", ["b"], "") == "abc"


def test_build_docs_for_attack_positions():
    docs = ["a", "b", "c", "d"]
    assert build_docs_for_attack(docs, 2, 0, 4) == docs          # no-op
    assert build_docs_for_attack(docs, 2, 1, 4) == ["c", "a", "b", "d"]
    assert build_docs_for_attack(docs, 0, 3, 4) == ["b", "c", "a", "d"]
    out = build_docs_for_attack(docs, 1, -1, 4, rng=random.Random(0))
    assert sorted(out) == sorted(docs)
    assert build_docs_for_attack([], 0, 1, 4) == []
    # truncation to top_k
    assert len(build_docs_for_attack(docs, 0, 1, 2)) == 2
