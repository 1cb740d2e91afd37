"""BM25 path: analyzer agreement, kernel vs reference scorer parity,
retriever contract, save/load."""

import numpy as np
import jax.numpy as jnp

from sdag_tpu.ops.bm25 import PAD_TERM, bm25_scores_xla, bm25_topk
from sdag_tpu.retrieval.analyzer import (_build_native, _NativeAnalyzer,
                                         _PythonAnalyzer, analyze_texts)
from sdag_tpu.retrieval.sparse import (BM25Index, SparseRetriever,
                                       bm25_score_reference)

CORPUS = [
    "The quick brown fox jumps over the lazy dog",
    "A fast auburn fox leaped over sleeping hounds",
    "Quantum computing uses qubits for parallel computation",
    "Dogs are loyal companions and love running",
    "The stock market closed higher on strong earnings",
    "Foxes are small wild canines found worldwide",
    "Machine learning models require training data",
    "The lazy dog slept under the warm sun all day",
]


def test_native_python_analyzer_agree():
    so = _build_native()
    if so is None:
        return  # toolchain unavailable; python fallback covers analysis
    na = _NativeAnalyzer(so)
    pa = _PythonAnalyzer()
    assert na.analyze_batch(CORPUS) == pa.analyze_batch(CORPUS)


def test_analyzer_stopwords_and_stemming():
    out = analyze_texts(["The foxes are running and jumping"])[0]
    assert "the" not in out and "are" not in out and "and" not in out
    assert "fox" in out and "run" in out and "jump" in out


def test_index_matches_reference_scorer():
    index = BM25Index.from_texts(CORPUS, [f"d{i}" for i in range(len(CORPUS))])
    queries = ["quick fox", "lazy dog sleeping", "quantum training data"]
    doc_tokens = analyze_texts(CORPUS)
    idx, scores = index.search(queries, top_k=4)
    for qi, q in enumerate(queries):
        q_toks = analyze_texts([q])[0]
        ref = bm25_score_reference(doc_tokens, q_toks)
        order = np.argsort(-ref, kind="stable")
        matching = [int(i) for i in order if ref[i] > 0][:4]
        got = [int(i) for i in idx[qi] if i >= 0]
        assert got == matching, (q, got, matching)
        for rank, d in enumerate(got):
            np.testing.assert_allclose(scores[qi][rank], ref[d], rtol=1e-5)


def test_kernel_interpret_matches_xla():
    rng = np.random.default_rng(0)
    n, lp, q, t = 300, 128, 5, 8
    term_ids = rng.integers(0, 50, size=(n, lp)).astype(np.int32)
    term_ids[:, 100:] = PAD_TERM
    impacts = rng.random((n, lp)).astype(np.float32)
    impacts[term_ids == PAD_TERM] = 0.0
    q_terms = rng.integers(0, 50, size=(q, t)).astype(np.int32)
    q_terms[:, 6:] = PAD_TERM
    q_weights = np.ones((q, t), np.float32)
    q_weights[q_terms == PAD_TERM] = 0.0

    scores = np.asarray(bm25_scores_xla(
        jnp.asarray(term_ids), jnp.asarray(impacts), jnp.asarray(q_terms),
        jnp.asarray(q_weights)))
    ref_idx = np.argsort(-scores, axis=1, kind="stable")[:, :5]
    vals, idx = bm25_topk(jnp.asarray(term_ids), jnp.asarray(impacts),
                          jnp.asarray(q_terms), jnp.asarray(q_weights), 5,
                          block_n=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(
        np.asarray(vals), np.take_along_axis(scores, ref_idx, 1), rtol=1e-5)


def test_short_results_padded_like_reference():
    index = BM25Index.from_texts(CORPUS, [f"d{i}" for i in range(len(CORPUS))])
    r = SparseRetriever(index)
    batch = r.retrieve_batch(["quantum"], max_k_needed=5, embed_batch_size=1)
    texts, ids_, scores = (batch.docs_texts_full[0], batch.ids_full[0],
                           batch.scores_full[0])
    assert len(texts) == 5
    assert ids_[0] == "d2"
    # only one doc matches 'quantum' -> rest padded ""/"NA"/-inf
    assert texts[1] == "" and ids_[1] == "NA" and scores[1] == float("-inf")
    assert batch.q_embs == [None]


def test_index_save_load(tmp_path):
    index = BM25Index.from_texts(CORPUS, [f"d{i}" for i in range(len(CORPUS))])
    idx1, s1 = index.search(["fox jumps"], top_k=3)
    index.save(str(tmp_path / "bm25"))
    index2 = BM25Index.load(str(tmp_path / "bm25"))
    idx2, s2 = index2.search(["fox jumps"], top_k=3)
    np.testing.assert_array_equal(idx1, idx2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)


def test_postings_engine_matches_scan_engine():
    """The CSR postings walk (O(sum df), default) and the dense-scan
    kernel must rank identically with matching scores."""
    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(150)]
    docs = [" ".join(rng.choice(words, size=rng.integers(5, 30)))
            for _ in range(400)]
    ids = [f"d{i}" for i in range(len(docs))]
    queries = [" ".join(rng.choice(words, size=5)) for _ in range(7)]
    ip = BM25Index.from_texts(docs, ids, engine="postings")
    isc = BM25Index.from_texts(docs, ids, engine="scan")
    i1, s1 = ip.search(queries, top_k=10)
    i2, s2 = isc.search(queries, top_k=10)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_postings_multi_window(monkeypatch):
    """w_max > 1: a term whose df exceeds the gather window must still be
    scored over its full postings list (no truncation)."""
    monkeypatch.setattr(BM25Index, "POSTINGS_WINDOW", 8)
    docs = [f"common filler{i % 5} extra{i}" for i in range(40)]
    ids = [f"d{i}" for i in range(len(docs))]
    index = BM25Index.from_texts(docs, ids, engine="postings")
    assert int(index.term_df_bound.max()) == 40  # 'common': df=40 > window=8
    scan = BM25Index.from_texts(docs, ids, engine="scan")
    i1, s1 = index.search(["common extra7"], top_k=10)
    i2, s2 = scan.search(["common extra7"], top_k=10)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_postings_windows_sized_by_query_df(monkeypatch):
    """ADVICE r2 (medium): per-slot gather windows must be bounded by the
    QUERY's own term dfs, not the global max df — a ubiquitous corpus term
    absent from the query must not inflate its candidate set."""
    monkeypatch.setattr(BM25Index, "POSTINGS_WINDOW", 8)
    # 'ubiq' appears in all 200 docs; rare terms in ~4 each
    docs = [f"ubiq rare{i % 50} tail{i}" for i in range(200)]
    ids = [f"d{i}" for i in range(len(docs))]
    index = BM25Index.from_texts(docs, ids, engine="postings")
    qt, qw = index.encode_queries(["rare7 tail3"])
    _, _, w_slots, _ = index._order_slots_by_df(qt, qw)
    # rare7 df=4, tail3 df=1 -> one window each; no slot sized for df=200
    assert sum(w_slots) * index.POSTINGS_WINDOW < 200
    # and a query WITH the ubiquitous term still scores exactly
    scan = BM25Index.from_texts(docs, ids, engine="scan")
    i1, s1 = index.search(["ubiq rare7"], top_k=5)
    i2, s2 = scan.search(["ubiq rare7"], top_k=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_window_profile_reuses_one_compile_signature(monkeypatch):
    """w_slots is a STATIC jit arg, so every distinct tuple is a fresh
    kernel compile — through the axon relay that cost the full-scale
    hotpotqa sparse run 88s PER RETRIEVE BATCH (1413.5s total; VERDICT r3
    weak #3).  The per-index window profile must absorb batches with
    smaller needs into the already-compiled signature, stay exact, and
    never grow past the candidate budget."""
    monkeypatch.setattr(BM25Index, "POSTINGS_WINDOW", 8)
    # df tiers: big df=32, mid df=8, rare df=1 — different queries need
    # different per-slot windows, and all needs fit the per-shard budget
    # (4096/8 shards -> 256 candidates)
    docs = [f"big{i % 128} mid{i % 512} rare{i}" for i in range(4096)]
    ids = [f"d{i}" for i in range(len(docs))]
    index = BM25Index.from_texts(docs, ids, engine="postings")
    scan = BM25Index.from_texts(docs, ids, engine="scan")

    # batch 1: wide need (big term) seeds the profile
    i1, s1 = index.search(["big3 mid5"], top_k=5)
    prof1 = tuple(index._w_profile)
    assert sum(prof1) * index.POSTINGS_WINDOW <= index._candidate_budget()
    # batch 2: strictly smaller need -> profile (and so the compiled
    # signature) must be unchanged
    qt, qw = index.encode_queries(["rare7 rare9"])
    _, _, need2, _ = index._order_slots_by_df(qt, qw)
    assert tuple(index._merge_window_profile(need2)) == prof1
    i2, s2 = index.search(["rare7 rare9"], top_k=5)
    assert tuple(index._w_profile) == prof1
    # both exact vs the scan engine
    for (ii, ss), q in [((i1, s1), "big3 mid5"), ((i2, s2), "rare7 rare9")]:
        ei, es = scan.search([q], top_k=5)
        np.testing.assert_array_equal(ii, ei)
        np.testing.assert_allclose(ss, es, rtol=1e-5)

    # a need the merged profile cannot absorb within budget runs at its
    # own size and leaves the profile untouched
    monkeypatch.setattr(BM25Index, "POSTINGS_CANDIDATE_BUDGET",
                        sum(prof1) * index.POSTINGS_WINDOW)
    index.valid_n = 10 ** 9  # budget = POSTINGS_CANDIDATE_BUDGET
    wide = tuple(w + 1 for w in prof1)
    assert index._merge_window_profile(wide) == wide
    assert tuple(index._w_profile) == prof1


def test_postings_budget_falls_back_to_scan(monkeypatch, capsys):
    """When the batch's summed query-term dfs exceed the candidate budget
    the postings walk is costlier than a flat scan: search must fall back
    to the scan engine (same ranking) and say so."""
    monkeypatch.setattr(BM25Index, "POSTINGS_CANDIDATE_BUDGET", 64)
    docs = [f"common extra{i}" for i in range(300)]
    ids = [f"d{i}" for i in range(len(docs))]
    index = BM25Index.from_texts(docs, ids, engine="postings")
    scan = BM25Index.from_texts(docs, ids, engine="scan")
    i1, s1 = index.search(["common extra5"], top_k=5)
    assert "falling back to the scan engine" in capsys.readouterr().out
    i2, s2 = scan.search(["common extra5"], top_k=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_candidate_budget_is_per_shard():
    """The postings->scan crossover compares the walk's candidate count
    against the SCAN'S per-device cost: on an n-shard mesh each shard
    only scans valid_n/n rows, so the budget must shrink with the shard
    count (a global-N budget kept the walk ~n/2x past the measured
    crossover on sharded meshes)."""
    docs = [f"word{i} filler" for i in range(64)]
    ids = [f"d{i}" for i in range(len(docs))]
    index = BM25Index.from_texts(docs, ids, engine="postings")
    assert index._candidate_budget() == min(
        BM25Index.POSTINGS_CANDIDATE_BUDGET,
        max(index.valid_n // index.n_shards, 2) >> 1)
    # the budget rule is pure arithmetic over (valid_n, n_shards):
    # simulate shapes without needing more devices
    index.valid_n, index.n_shards = 8_000_000, 8
    assert index._candidate_budget() == (8_000_000 // 8) >> 1  # per shard
    index.n_shards = 1
    assert index._candidate_budget() == \
        BM25Index.POSTINGS_CANDIDATE_BUDGET  # global cap binds at 8M x 1


def test_postings_fewer_than_k_matches_pins_na_slots():
    """ADVICE r2 (low): when a query matches fewer than top_k docs the
    postings engine returns (-1, -inf) slots — materialized as ''/'NA'
    rows, matching Lucene's only-matching-docs contract
    (reference ``sparse.py:99-102``) — NOT arbitrary zero-score docs.
    Pinned for both engines: search() masks score<=0 slots identically."""
    docs = ["alpha beta", "alpha gamma", "delta epsilon", "zeta eta"]
    ids = [f"d{i}" for i in range(len(docs))]
    for engine in ("postings", "scan"):
        index = BM25Index.from_texts(docs, ids, engine=engine)
        idx, scores = index.search(["alpha"], top_k=4)
        assert (idx[0, :2] >= 0).all() and set(idx[0, :2]) == {0, 1}
        assert (idx[0, 2:] == -1).all(), engine
        assert np.isneginf(scores[0, 2:]).all(), engine
        texts, ids_out, scs = index.materialize(idx, scores)
        assert texts[0][2:] == ["", ""] and ids_out[0][2:] == ["NA", "NA"]


def test_postings_op_matches_xla_scorer():
    """Op-level: bm25_postings_topk over CSR built from random packed
    postings == dense XLA scoring + top-k (incl. tie-break by doc id)."""
    from sdag_tpu.ops.bm25 import bm25_postings_topk
    from sdag_tpu.retrieval.sparse import _csr_from_packed
    rng = np.random.default_rng(1)
    n, lp, q, t, v = 300, 64, 5, 8, 50
    # distinct terms per doc (CSR assumes one posting per (term, doc))
    term_ids = np.full((n, lp), PAD_TERM, np.int32)
    impacts = np.zeros((n, lp), np.float32)
    for i in range(n):
        terms = rng.choice(v, size=rng.integers(3, 20), replace=False)
        term_ids[i, :len(terms)] = terms
        impacts[i, :len(terms)] = rng.random(len(terms)) + 0.01
    q_terms = rng.integers(0, v, size=(q, t)).astype(np.int32)
    q_terms[:, 6:] = PAD_TERM
    q_weights = np.ones((q, t), np.float32) * 2.0
    q_weights[q_terms == PAD_TERM] = 0.0

    docs, imps, offsets, max_df = _csr_from_packed(term_ids, impacts, v)
    w = 16
    w_max = -(-max_df // w)
    vals, idx = bm25_postings_topk(
        jnp.asarray(docs), jnp.asarray(imps), jnp.asarray(offsets),
        jnp.asarray(q_terms), jnp.asarray(q_weights), 5, w_slots=w_max,
        window=w)
    scores = np.asarray(bm25_scores_xla(
        jnp.asarray(term_ids), jnp.asarray(impacts), jnp.asarray(q_terms),
        jnp.asarray(q_weights)))
    ref_idx = np.argsort(-scores, axis=1, kind="stable")[:, :5]
    # postings returns only matching docs; compare on positive-score slots
    for qi in range(q):
        matching = [int(d) for d in ref_idx[qi] if scores[qi, d] > 0]
        got = [int(d) for d in np.asarray(idx)[qi] if d >= 0][:len(matching)]
        assert got == matching
        for rank, d in enumerate(got):
            np.testing.assert_allclose(np.asarray(vals)[qi, rank],
                                       scores[qi, d], rtol=1e-5)


def test_sharded_bm25_matches_single_device():
    """8-way row-sharded BM25 (per-shard top-k + all-gather merge) must be
    bit-identical to the single-device search (VERDICT r1 item 6)."""
    import jax
    from sdag_tpu.core.mesh import make_index_mesh
    from sdag_tpu.retrieval.sparse import BM25Index

    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(200)]
    docs = [" ".join(rng.choice(words, size=rng.integers(5, 40)))
            for _ in range(700)]
    ids = [f"d{i}" for i in range(len(docs))]
    queries = [" ".join(rng.choice(words, size=4)) for _ in range(9)]

    mesh8 = make_index_mesh()
    assert mesh8.shape["index"] == 8
    mesh1 = make_index_mesh(devices=[jax.devices()[0]])

    idx8 = BM25Index.from_texts(docs, ids, mesh=mesh8)
    idx1 = BM25Index.from_texts(docs, ids, mesh=mesh1)
    i8, s8 = idx8.search(queries, top_k=10)
    i1, s1 = idx1.search(queries, top_k=10)
    np.testing.assert_array_equal(i8, i1)
    np.testing.assert_allclose(s8, s1, rtol=1e-6)


def _zipfish_corpus(n_docs=300, seed=11):
    """Corpus with two ubiquitous terms (heavy under a lowered threshold),
    mid-df terms, and a rare tail — exercises every hybrid split."""
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n_docs):
        toks = ["ubiq"]
        if i % 2 == 0:
            toks.append("halfish")
        toks.append(f"mid{i % 12}")
        toks.append(f"rare{i % 60}")
        toks.append(f"tail{i}")
        rng.shuffle(toks)
        docs.append(" ".join(toks))
    ids = [f"d{i}" for i in range(n_docs)]
    return docs, ids


def test_hybrid_heavy_terms_match_scan_engine(monkeypatch):
    """Heavy-term dense sidecar (MXU path) must stay in lockstep with the
    scan engine across heavy-only, mixed, light-only, no-match, and
    fewer-than-k queries."""
    monkeypatch.setattr(BM25Index, "HEAVY_DF_MIN", 64)
    monkeypatch.setattr(BM25Index, "POSTINGS_WINDOW", 8)
    docs, ids = _zipfish_corpus()
    index = BM25Index.from_texts(docs, ids, engine="postings")
    scan = BM25Index.from_texts(docs, ids, engine="scan")
    # ubiq df=300 and halfish df=150 cross the lowered threshold
    assert index.heavy_cols is not None
    assert int((index.heavy_row_of >= 0).sum()) == 2
    queries = ["ubiq halfish",          # heavy-only
               "ubiq rare7",            # mixed heavy + light
               "rare7 tail3",           # light-only
               "zzzunknown",            # no match at all
               "halfish tail4 mid3",    # heavy + two light
               "tail5"]                 # single rare: fewer than k matches
    q_heavy = index._order_slots_by_df(*index.encode_queries(queries))[3]
    assert bool((q_heavy >= 0).any())
    i1, s1 = index.search(queries, top_k=5)
    i2, s2 = scan.search(queries, top_k=5)
    np.testing.assert_array_equal(i1, i2)
    finite = np.isfinite(s2)
    np.testing.assert_array_equal(np.isfinite(s1), finite)
    np.testing.assert_allclose(s1[finite], s2[finite], rtol=1e-5)


def test_hybrid_sidecar_budget_cap(monkeypatch, capsys):
    """When the sidecar budget can't hold every over-threshold term, the
    highest-df terms are kept and the rest stay on the postings walk —
    ranking still matches the scan engine."""
    monkeypatch.setattr(BM25Index, "HEAVY_DF_MIN", 64)
    monkeypatch.setattr(BM25Index, "POSTINGS_WINDOW", 8)
    # budget of one dual-layout f32 row at the padded shard width (512
    # rows/shard for this corpus under 1- and 8-device meshes) -> cap 1
    monkeypatch.setattr(BM25Index, "HEAVY_SIDECAR_BUDGET_MB",
                        8 * 512 / (1 << 20))
    docs, ids = _zipfish_corpus()
    index = BM25Index.from_texts(docs, ids, engine="postings")
    assert "sidecar capped" in capsys.readouterr().out
    assert int((index.heavy_row_of >= 0).sum()) == 1
    # the kept row is the highest-df term (ubiq, df=300)
    kept = int(np.flatnonzero(index.heavy_row_of >= 0)[0])
    assert kept == index.vocab["ubiq"]
    scan = BM25Index.from_texts(docs, ids, engine="scan")
    i1, s1 = index.search(["ubiq halfish rare7"], top_k=5)
    i2, s2 = scan.search(["ubiq halfish rare7"], top_k=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_hybrid_sharded_matches_single_device(monkeypatch):
    """8-way sharded hybrid (per-shard dense sidecar slice + CSR) must
    match the single-device hybrid and the scan engine."""
    import jax
    from sdag_tpu.core.mesh import make_index_mesh

    monkeypatch.setattr(BM25Index, "HEAVY_DF_MIN", 64)
    monkeypatch.setattr(BM25Index, "POSTINGS_WINDOW", 8)
    docs, ids = _zipfish_corpus(n_docs=500, seed=13)
    queries = ["ubiq rare7", "halfish tail9 mid2", "rare3 rare4", "ubiq"]

    mesh8 = make_index_mesh()
    mesh1 = make_index_mesh(devices=[jax.devices()[0]])
    idx8 = BM25Index.from_texts(docs, ids, mesh=mesh8, engine="postings")
    idx1 = BM25Index.from_texts(docs, ids, mesh=mesh1, engine="postings")
    assert idx8.heavy_cols is not None and idx1.heavy_cols is not None
    scan = BM25Index.from_texts(docs, ids, mesh=mesh1, engine="scan")
    i8, s8 = idx8.search(queries, top_k=10)
    i1, s1 = idx1.search(queries, top_k=10)
    isc, ssc = scan.search(queries, top_k=10)
    np.testing.assert_array_equal(i8, i1)
    np.testing.assert_array_equal(i8, isc)
    finite = np.isfinite(ssc)
    np.testing.assert_allclose(np.where(finite, s8, 0.0),
                               np.where(finite, s1, 0.0), rtol=1e-6)
    np.testing.assert_allclose(np.where(finite, s8, 0.0),
                               np.where(finite, ssc, 0.0), rtol=1e-5)


def test_native_build_counts_matches_python():
    """The one-pass C++ analyze+count must agree exactly with the Python
    counter over analyzer output: same vocab (first-appearance order),
    pairs, df, and doc lengths."""
    from sdag_tpu.retrieval.analyzer import build_counts_native
    from sdag_tpu.retrieval.sparse import _counts_from_tokens
    texts = CORPUS + ["The fox's den — naïve déjà-vu 2,500 miles",
                      "", "running RUNNING runs"]
    native = build_counts_native(texts)
    if native is None:
        return  # toolchain unavailable; python path covers builds
    py = _counts_from_tokens(analyze_texts(texts))
    assert native["terms"] == py["terms"]
    for k in ("doc_offsets", "doc_len", "df", "pair_tid", "pair_tf"):
        np.testing.assert_array_equal(native[k], py[k], err_msg=k)


def test_from_texts_native_matches_token_path():
    """BM25Index.from_texts (native fast path) must rank and score
    identically to construction from analyzed token lists."""
    ids = [f"d{i}" for i in range(len(CORPUS))]
    a = BM25Index.from_texts(CORPUS, ids)
    b = BM25Index(analyze_texts(CORPUS),
                  [{"id": i, "text": t} for i, t in zip(ids, CORPUS)])
    assert a.vocab == b.vocab
    queries = ["quick fox", "lazy dog sleeping", "quantum training data"]
    ia, sa = a.search(queries, top_k=5)
    ib, sb = b.search(queries, top_k=5)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(sa, sb, rtol=1e-6)


def test_scan_engines_k_exceeds_valid_n_reports_minus1():
    """Contract pin (kernel audit): both scan paths (Pallas kernel and the
    XLA fallback) must report -1 doc ids for -inf slots when k exceeds
    valid_n, in lockstep with the postings engine — not the real ids of
    masked (padded-shard) docs."""
    from sdag_tpu.ops.bm25 import bm25_topk, bm25_topk_dispatch
    rng = np.random.default_rng(3)
    n, lp, t, v = 8, 4, 3, 10
    term_ids = rng.integers(0, v, size=(n, lp)).astype(np.int32)
    impacts = (rng.random((n, lp)) + 0.1).astype(np.float32)
    q_terms = term_ids[:1, :3].copy()     # guaranteed matches in rows 0..1
    q_weights = np.ones_like(q_terms, np.float32)
    args = (jnp.asarray(term_ids), jnp.asarray(impacts),
            jnp.asarray(q_terms), jnp.asarray(q_weights))
    for name, (vals, idx) in {
        "pallas": bm25_topk(*args, k=4, valid_n=2, interpret=True),
        "xla": bm25_topk_dispatch(*args, 4, valid_n=2, use_pallas=False),
    }.items():
        idx, vals = np.asarray(idx), np.asarray(vals)
        assert set(idx[0, :2]) == {0, 1}, name
        np.testing.assert_array_equal(idx[:, 2:], -1, err_msg=name)
        assert np.all(np.isneginf(vals[:, 2:])), name


def test_from_packed_save_load_roundtrip(tmp_path):
    """from_packed leaves idf=None; save() must not pickle the None into
    an object array that load() cannot read (review audit)."""
    rng = np.random.default_rng(9)
    n, lp, v = 6, 4, 12
    term_ids = rng.integers(0, v, size=(n, lp)).astype(np.int32)
    impacts = (rng.random((n, lp)) + 0.1).astype(np.float32)
    vocab = {f"t{i}": i for i in range(v)}
    meta = [{"id": f"d{i}", "text": f"doc {i}"} for i in range(n)]
    idx = BM25Index.from_packed(term_ids, impacts, vocab, meta=meta)
    idx.save(str(tmp_path / "bm"))
    idx2 = BM25Index.load(str(tmp_path / "bm"))
    assert idx2.idf is None and idx2.valid_n == n
    q = ["t0 t1"]
    i1, s1 = idx.search(q, top_k=3)
    i2, s2 = idx2.search(q, top_k=3)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)
