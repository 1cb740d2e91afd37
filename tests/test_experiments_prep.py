"""Unit tests for the reference-scale experiment prep (experiments/
run_full_scale.py): Excel-mangled id remapping, doc truncation, corpus
construction with cross-dataset distractors."""

import csv
import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "run_full_scale", os.path.join(REPO, "experiments", "run_full_scale.py"))
rfs = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(rfs)

REF = "/root/reference/data"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference data absent")
def test_prepare_nq_remaps_ids_and_builds_corpus(tmp_path):
    rfs.prepare(str(tmp_path), sample_size=7, dataset="nq")

    with open(tmp_path / "attack.csv", encoding="utf-8") as f:
        rows = list(csv.DictReader(f))
    assert rows, "no attack rows"
    # 5 malicious docs per query, ids remapped from the query JSON (the
    # shipped CSV's query_id column is Excel-mangled and collides)
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query"], set()).add(r["query_id"])
        assert len(r["malicious_document"]) <= rfs.DOC_TRUNC
        assert not r["query_id"].upper().endswith("E+16")
    assert len(by_q) == 7
    assert all(len(ids) == 1 for ids in by_q.values())
    qids = {next(iter(v)) for v in by_q.values()}
    assert len(qids) == 7  # unique after remap

    corpus = [json.loads(line) for line in
              open(tmp_path / "corpus.jsonl", encoding="utf-8")]
    gt = [c for c in corpus if c["id"].startswith("gt_")]
    dist = [c for c in corpus if c["id"].startswith("dist_")]
    assert len(gt) == 7
    assert len(dist) > 1000  # cross-dataset distractor pool
    assert {f"gt_{q}" for q in qids} == {c["id"] for c in gt}
