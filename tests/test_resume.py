"""Resumable batch result logs: crash-safe load, skip-completed reruns."""

import json

from sdag_tpu.pipeline.resume import BatchResultLog


def test_log_roundtrip(tmp_path):
    path = str(tmp_path / "rows.jsonl")
    log = BatchResultLog(path)
    assert not log.is_done(0)
    log.append_batch(0, [{"query_id": "a"}, {"query_id": "b"}])
    log.append_batch(1, [{"query_id": "c"}])

    log2 = BatchResultLog(path)
    assert log2.is_done(0) and log2.is_done(1) and not log2.is_done(2)
    assert log2.rows_for(0) == [{"query_id": "a"}, {"query_id": "b"}]
    assert log2.rows_for(1) == [{"query_id": "c"}]


def test_incomplete_batch_discarded(tmp_path):
    path = str(tmp_path / "rows.jsonl")
    # simulate a crash: rows written but no done marker
    with open(path, "w") as f:
        f.write(json.dumps({"batch": 0, "row": {"query_id": "x"}}) + "\n")
    log = BatchResultLog(path)
    assert not log.is_done(0)
    assert log.rows_for(0) == []


def test_orphan_rows_from_crashed_append_not_double_counted(tmp_path):
    """A crash INSIDE append_batch leaves orphan row lines with no done
    marker; the rerun re-appends the full batch.  Only the last n rows
    (recorded in the done marker) may count, or every later resume
    double-counts the batch's ACC/ASR rows."""
    path = str(tmp_path / "rows.jsonl")
    # crashed attempt: 2 of 3 rows written, no marker
    with open(path, "w") as f:
        f.write(json.dumps({"batch": 0, "row": {"query_id": "a"}}) + "\n")
        f.write(json.dumps({"batch": 0, "row": {"query_id": "b"}}) + "\n")
    # rerun: the full batch is re-appended through the API
    log = BatchResultLog(path)
    assert not log.is_done(0)
    full = [{"query_id": "a"}, {"query_id": "b"}, {"query_id": "c"}]
    log.append_batch(0, full)
    # a later resume must see exactly the 3 re-appended rows, not 5
    log2 = BatchResultLog(path)
    assert log2.is_done(0)
    assert log2.rows_for(0) == full


def test_orchestrator_resume(tmp_path, monkeypatch):
    """Second run with RESUME_LOGS skips generation entirely."""
    import tests.test_pipeline_e2e as e2e
    from sdag_tpu.pipeline import orchestrator

    corpus_path, csv_path = e2e._write_inputs(tmp_path)
    cfg = e2e._base_config(tmp_path, corpus_path, csv_path)
    cfg.RESUME_LOGS = True
    m1 = orchestrator.run_experiment(cfg)

    calls = {"n": 0}
    real = orchestrator.generate_iso_batch

    def spy(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(orchestrator, "generate_iso_batch", spy)
    m2 = orchestrator.run_experiment(cfg)
    assert calls["n"] == 0, "resumed run must not regenerate"
    assert m2[(3, 1)]["num_queries"] == m1[(3, 1)]["num_queries"]
    k1 = m1[(3, 1)]["answer_match_stats"]["iso"]["ground_truth_match_rate"]
    k2 = m2[(3, 1)]["answer_match_stats"]["iso"]["ground_truth_match_rate"]
    assert k1 == k2


def test_partial_pair_crash_does_not_duplicate_rows(tmp_path, monkeypatch):
    """Crash BETWEEN two pairs' log appends: the next run must not
    re-append the completed pair's rows (the log would hold the batch
    twice and every later resume would double-count it in ACC/ASR)."""
    import tests.test_pipeline_e2e as e2e
    from sdag_tpu.pipeline import orchestrator

    corpus_path, csv_path = e2e._write_inputs(tmp_path)
    cfg = e2e._base_config(tmp_path, corpus_path, csv_path)
    cfg.TOP_K = [3, 3]
    cfg.ADD_ATTACK_IN_RANK = [1, 2]   # two pairs
    cfg.RESUME_LOGS = True

    # run 1: crash after the FIRST pair's rows are logged
    real = orchestrator.run_pair_malicious_doc_attack_for_batch
    state = {"calls": 0}

    def crashing(**kw):
        rows = real(**kw)
        state["calls"] += 1
        if state["calls"] == 1:
            # let the orchestrator append pair 1's rows, then die before
            # pair 2 by raising on ITS computation
            return rows
        raise RuntimeError("simulated crash before second pair logged")

    monkeypatch.setattr(orchestrator,
                        "run_pair_malicious_doc_attack_for_batch", crashing)
    try:
        orchestrator.run_experiment(cfg)
    except RuntimeError:
        pass
    monkeypatch.setattr(orchestrator,
                        "run_pair_malicious_doc_attack_for_batch", real)

    # run 2 completes; run 3 resumes everything — row counts must be exact
    m2 = orchestrator.run_experiment(cfg)
    m3 = orchestrator.run_experiment(cfg)
    for key in ((3, 1), (3, 2)):
        assert m2[key]["num_queries"] == 2, m2[key]["num_queries"]
        assert m3[key]["num_queries"] == 2, m3[key]["num_queries"]
