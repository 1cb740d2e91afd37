"""Metrics tree fixtures (reference ``metrics.py:51-423`` schema parity)."""

from sdag_tpu.eval.metrics import (
    build_pair_metrics, compute_answer_overlap_and_attack_stats,
    compute_false_answer_stats_for_results,
    compute_retrieval_ground_truth_stats)


def _row(retrieved, gts, iso_gt=False, noiso_gt=False, iso_f=False,
         noiso_f=False, fa="wrong"):
    return {
        "short_answers": gts,
        "retrieved_docs": retrieved,
        "false_answer": fa,
        "ground_truth_match_iso": iso_gt,
        "ground_truth_match_noiso": noiso_gt,
        "false_match_iso": iso_f,
        "false_match_noiso": noiso_f,
    }


def test_retrieval_stats_buckets_hand_computed():
    results = [
        # query 1: docs at rank 1 and 3 contain GT -> bucket k=2
        _row(["the answer is X", "nothing", "X again", "no"], ["X"], iso_gt=True),
        # query 2: exactly one GT doc at rank 2 -> bucket k=1
        _row(["no", "has X here", "no", "no"], ["X"], noiso_gt=True),
        # query 3: no GT doc
        _row(["no", "no", "no", "no"], ["X"]),
    ]
    stats = compute_retrieval_ground_truth_stats(results, top_k=4)
    assert stats["total_queries"] == 3
    assert stats["any_ground_truth_doc_in_list_count"] == 2
    b1 = stats["per_k_exact_match_buckets"]["1"]
    b2 = stats["per_k_exact_match_buckets"]["2"]
    assert b1["queries_with_exactly_k_ground_truth_docs_count"] == 1
    assert b2["queries_with_exactly_k_ground_truth_docs_count"] == 1
    assert b2["average_rank_of_relevant_docs_in_bucket"] == {
        "relevant_doc_1_avg_rank": 1.0, "relevant_doc_2_avg_rank": 3.0}
    # k=1 rank distribution: single GT doc at rank 2
    dist = b1["single_relevant_doc_rank_distribution"]
    assert dist["2"]["queries_with_single_ground_truth_doc_at_this_rank_count"] == 1
    assert dist["2"]["noiso_answer_match_stats"]["ground_truth_match_rate"] == 1.0
    # bucket-conditioned iso stats
    assert b2["iso_answer_match_stats"]["ground_truth_match_count"] == 1


def test_retrieval_stats_empty():
    stats = compute_retrieval_ground_truth_stats([], top_k=5)
    assert stats["total_queries"] == 0
    assert stats["per_k_exact_match_buckets"] == {}


def test_overlap_contingency():
    results = [
        _row([], [], iso_gt=True, noiso_gt=True),
        _row([], [], iso_gt=True),
        _row([], [], noiso_f=True, iso_gt=True),
        _row([], [], iso_f=True, noiso_f=True),
    ]
    s = compute_answer_overlap_and_attack_stats(results)
    gt = s["ground_truth_overlap"]
    assert gt["iso_correct_count"] == 3
    assert gt["both_iso_and_noiso_correct_count"] == 1
    assert gt["only_iso_correct_count"] == 2
    assert gt["neither_correct_count"] == 1
    f = s["false_answer_overlap"]
    assert f["noiso_false_match_count"] == 2
    assert f["both_iso_and_noiso_false_match_count"] == 1
    # special case: noiso false, iso not false, iso correct
    assert s["noiso_false_only_and_iso_ground_truth"]["count"] == 1


def test_build_pair_metrics_schema():
    results = [_row(["X doc"], ["X"], iso_gt=True, noiso_f=True)]
    m = build_pair_metrics(results, top_k_val=3, attack_pos_val=1)
    assert m["top_k"] == 3 and m["attack_position_in_rank"] == 1
    assert m["num_queries"] == 1
    iso = m["answer_match_stats"]["iso"]
    assert iso["ground_truth_match_rate"] == 1.0
    assert "retrieval_ground_truth_stats_when_correct" in iso
    assert "retrieval_ground_truth_stats_when_false" in iso
    assert m["answer_match_stats"]["no_iso"]["false_answer_match_rate"] == 1.0
    assert "iso_vs_noiso_answer_overlap_and_attack_stats" in m


def test_false_answer_stats():
    results = [_row([], [], fa="w1"), _row([], [], fa="w1"),
               _row([], [], fa=["w2", "w3"]), _row([], [], fa="")]
    s = compute_false_answer_stats_for_results(results)
    assert s["unique_false_answers"] == 3
    assert s["top_10"][0] == {"false_answer": "w1", "count": 2}
