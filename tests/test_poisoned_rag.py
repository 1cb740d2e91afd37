"""Offline PoisonedRAG CLI: sampler caching, avoid-lists, preset CSVs,
bucket sampling, CSV round-trip into the pipeline's ingest."""

import json

import numpy as np

from sdag_tpu.attack.poisoned_rag import (build_false_answer_prompt,
                                          collect_short_answers_nq,
                                          generate_false_answers_and_docs,
                                          load_avoid_false_answers_from_csvs,
                                          load_false_answers_csv, main,
                                          save_results_to_csv,
                                          uniform_take_per_bucket)
from sdag_tpu.utils.parsing import load_from_csv

SAMPLES = [
    {"id": "q1", "question": "capital of france?", "short_answers": ["Paris"]},
    {"id": "q2", "question": "author of hamlet?",
     "short_answers": ["Shakespeare", "William Shakespeare"]},
]


def fake_clients(log):
    def fa(system, user, max_tokens):
        log.append(("fa", user))
        return "Lyon\n"
    def doc(system, user, max_tokens):
        log.append(("doc", user))
        return " A supporting doc. "
    return {"false_answer": fa, "false_doc": doc}


def test_generate_and_csv_roundtrip(tmp_path):
    log = []
    rows = generate_false_answers_and_docs(SAMPLES, fake_clients(log))
    assert len(rows) == 2
    assert rows[0]["false_answer"] == "Lyon"
    assert rows[0]["malicious_document"] == "A supporting doc."
    # GT answers embedded in the false-answer prompt
    fa_prompts = [u for kind, u in log if kind == "fa"]
    assert "Paris" in fa_prompts[0]
    assert "William Shakespeare" in fa_prompts[1]

    out_csv = str(tmp_path / "attack.csv")
    save_results_to_csv(rows, out_csv)
    qd = load_from_csv(out_csv)          # round-trips into pipeline ingest
    assert qd.questions == ["capital of france?", "author of hamlet?"]
    assert qd.short_answers[1] == ["Shakespeare", "William Shakespeare"]
    assert qd.false_answer_groups[0] == ["Lyon"]


def test_avoid_list_reaches_prompt(tmp_path):
    prev = tmp_path / "prev.csv"
    prev.write_text("query,false_answer\ncapital of france?,Marseille\n")
    avoid = load_avoid_false_answers_from_csvs([str(prev)])
    log = []
    generate_false_answers_and_docs(SAMPLES, fake_clients(log),
                                    avoid_false_by_key=avoid)
    fa_prompt = [u for kind, u in log if kind == "fa"][0]
    assert "Marseille" in fa_prompt and "Paris" in fa_prompt


def test_preset_false_answers_skip_generation(tmp_path):
    preset = tmp_path / "preset.csv"
    preset.write_text("query,false_answer\ncapital of france?,Nice\n")
    presets = load_false_answers_csv(str(preset), key_field="query")
    log = []
    rows = generate_false_answers_and_docs(
        SAMPLES, fake_clients(log), csv_false_answers=presets,
        json_query_id_field="question")
    # q2 has no preset -> skipped; no false-answer generation calls at all
    assert len(rows) == 1
    assert rows[0]["false_answer"] == "Nice"
    assert not any(kind == "fa" for kind, _ in log)


def test_uniform_take_per_bucket():
    buckets = {"easy": list(range(0, 10)), "medium": list(range(10, 13)),
               "hard": list(range(20, 40))}
    out = uniform_take_per_bucket({k: list(v) for k, v in buckets.items()},
                                  total=12, seed=0)
    assert len(out) == 12 and len(set(out)) == 12
    # medium bucket exhausted (3), shortage refilled from leftovers
    assert sum(1 for i in out if 10 <= i < 13) == 3


def test_collect_short_answers_nq_variants():
    assert collect_short_answers_nq(
        {"annotations": {"short_answers": [{"text": ["a", "b"]}]}}) == ["a", "b"]
    assert collect_short_answers_nq(
        {"annotations": [{"short_answers": [{"text": "c"}]}]}) == ["c"]
    assert collect_short_answers_nq({"short_answers": ["d", "d"]}) == ["d"]
    assert collect_short_answers_nq({}) == []


def test_cli_with_cached_samples_and_local_backend(tmp_path, monkeypatch):
    samples_json = tmp_path / "samples.json"
    samples_json.write_text(json.dumps(SAMPLES))
    out_csv = tmp_path / "out.csv"
    main(["--dataset", "nq", "--samples_json", str(samples_json),
          "--out_csv", str(out_csv), "--backend", "local",
          "--max_tokens_false", "3", "--max_tokens_doc", "4",
          "--temperature", "0"])
    qd = load_from_csv(str(out_csv))
    assert len(qd) == 2


def test_false_answer_prompt_format():
    p = build_false_answer_prompt("q?", ["A", "B"])
    assert "- A" in p and "- B" in p and "q?" in p
