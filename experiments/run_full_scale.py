"""Reference-scale experiment on the reference's shipped data (VERDICT r1
item 4): 1000 NQ queries x TOP_K [5,10] x ADD_ATTACK_IN_RANK [1,3], one run
per malicious-doc selection strategy (random / closest / furthest), through
the production CLI on the real TPU chip.

Data: /root/reference/data/poisonedRAG_attack_results_GPT4_NQ_5_mal_docs_
per_query.csv (5000 rows = 1000 queries x 5 GPT-4 malicious docs; shipped
query_id column is Excel-mangled and collides, so ids are remapped from
sampled_nq_1000_queries.json by query text) + a 6000-doc corpus of the 1000
ground-truth pseudo-passages and the 5000 malicious passages from *other*
queries as distractors (the real Wikipedia index is not shipped).

Scale notes (documented, not hidden): models are random-weight tiny configs
(no checkpoints/egress in this environment), so ACC/ASR measure pipeline
mechanics, not model quality; docs are truncated to 400 chars to keep
byte-tokenizer prompt lengths near the reference's BPE budget.  What this
run demonstrates: the full pipeline at reference scale, end-to-end, with
committed metrics + phase timings (reference flow: src/pipeline/main.py:
764-858).

Usage: python experiments/run_full_scale.py [--strategies random ...]
       [--sample-size 1000] [--out experiments/results]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
DATASETS = {
    "nq": ("poisonedRAG_attack_results_GPT4_NQ_5_mal_docs_per_query.csv",
           "sampled_nq_1000_queries.json"),
    "hotpotqa": ("poisonedRAG_attack_results_GPT4_hotpotQA_5_mal_docs_"
                 "per_query.csv",
                 "sampled_hotpotQA_1000_queries.json"),
    # The reference's TriviaQA attack CSV is a missing large blob
    # (.MISSING_LARGE_BLOBS); we regenerate it offline with the local-TPU
    # backend of attack/poisoned_rag.py from the shipped query JSON.
    "triviaqa": (None, "sampled_triviaQA_1000_queries.json"),
}
# Neutral corpus distractors come from the OTHER dataset's malicious-doc
# pool (wiki-style passages unrelated to the eval queries) — the real
# Wikipedia index the reference retrieves from is not shipped.
DISTRACTOR_SOURCE = {"nq": "hotpotqa", "hotpotqa": "nq", "triviaqa": "nq"}
DOC_TRUNC = 400


def prepare(workdir: str, sample_size: int, dataset: str) -> None:
    os.makedirs(workdir, exist_ok=True)
    csv_name, json_name = DATASETS[dataset]
    ref_json = os.path.join("/root/reference/data", json_name)
    if csv_name is None:  # regenerate the missing blob with our CLI
        ref_csv = os.path.join(workdir, "attack_generated.csv")
        if not os.path.exists(ref_csv):
            from sdag_tpu.attack.poisoned_rag import main as prag_main
            prag_main(["--dataset", dataset, "--backend", "local",
                       "--samples_json", ref_json, "--out_csv", ref_csv,
                       "--sample_size", str(sample_size),
                       "--batch_size", "32"])
    else:
        ref_csv = os.path.join("/root/reference/data", csv_name)
    with open(ref_json, encoding="utf-8") as f:
        qmeta = json.load(f)
    id_by_question = {q["question"]: str(q["id"]) for q in qmeta}
    gt_by_question = {q["question"]: q.get("short_answers", []) for q in qmeta}

    rows = []
    with open(ref_csv, encoding="utf-8") as f:
        for row in csv.DictReader(f):
            rows.append(row)

    # group rows by query text, keep the JSON's 1000-query order
    by_q: dict = {}
    for row in rows:
        by_q.setdefault(row["query"], []).append(row)
    questions = [q["question"] for q in qmeta if q["question"] in by_q]
    questions = questions[:sample_size]

    csv_path = os.path.join(workdir, "attack.csv")
    with open(csv_path, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(["query", "query_id", "ground_truth_answers",
                    "false_answer", "malicious_document"])
        for q in questions:
            qid = id_by_question[q]
            for row in by_q[q]:
                w.writerow([q, qid, row["ground_truth_answers"],
                            row["false_answer"],
                            row["malicious_document"][:DOC_TRUNC]])

    corpus_path = os.path.join(workdir, "corpus.jsonl")
    with open(corpus_path, "w", encoding="utf-8") as f:
        for q in questions:  # ground-truth pseudo-passages
            gts = gt_by_question.get(q, [])
            text = f"{q}? The answer is {'; '.join(map(str, gts))}."
            f.write(json.dumps({"id": f"gt_{id_by_question[q]}",
                                "text": text[:DOC_TRUNC]},
                               ensure_ascii=False) + "\n")
        n_dist = 0
        src_csv = os.path.join(
            "/root/reference/data", DATASETS[DISTRACTOR_SOURCE[dataset]][0])
        with open(src_csv, encoding="utf-8") as sf:
            for row in csv.DictReader(sf):
                f.write(json.dumps(
                    {"id": f"dist_{n_dist}",
                     "text": row["malicious_document"][:DOC_TRUNC]},
                    ensure_ascii=False) + "\n")
                n_dist += 1
    print(f"[prep] {len(questions)} queries, corpus at {corpus_path} "
          f"({len(questions)} GT + {n_dist} distractor docs)")


def run_one(workdir: str, out_root: str, strategy: str,
            sample_size: int, dataset: str, defense: str = "none",
            attack_variant: str = "malicious_doc",
            kv_dtype: str = "native", retriever: str = "dense",
            speculative: int = 0) -> dict:
    tag = f"{dataset}{sample_size}_{strategy}"
    if defense != "none":
        tag += f"_{defense}"
    if attack_variant != "malicious_doc":
        tag += f"_{attack_variant}"
    if kv_dtype != "native":
        tag += f"_kv{kv_dtype}"
    if retriever != "dense":
        tag += f"_{retriever}"
    if speculative:
        tag += f"_spec{speculative}"
    out_dir = os.path.join(out_root, tag)
    os.makedirs(out_dir, exist_ok=True)
    cfg = {
        "SAMPLE_SIZE": sample_size,
        # full 2x2 grid; pairs zip elementwise (reference semantics,
        # pipeline/orchestrator.build_pair_specs)
        "TOP_K": [5, 5, 10, 10],
        "ADD_ATTACK_IN_RANK": [1, 3, 1, 3],
        "MALICIOUS_DOC_SELECTION_STRATEGY": strategy,
        "ATTACK_VARIANT": attack_variant,
        "KV_CACHE_DTYPE": kv_dtype,
        "SPECULATIVE_DRAFT_LEN": speculative,
        "DEFENSE_BACKEND": defense,
        "RETRIEVER_BACKEND": retriever,
        "DENSE_INDEX_DTYPE": "bfloat16",
        "CSV_INPUT_PATH": os.path.join(workdir, "attack.csv"),
        "CORPUS_JSONL_PATH": os.path.join(workdir, "corpus.jsonl"),
        "DENSE_INDEX_PATH": os.path.join(workdir, "dense.index"),
        "SPARSE_INDEX_NAME_OR_PATH": os.path.join(workdir, "bm25.index")
        if retriever in ("sparse", "sparse_and_dense") else "",
        "OUTPUT_CSV_BASE": os.path.join(out_dir, "results"),
        "LLM_BATCH_SIZE": 8,
        "BATCH_SIZE_EMBED_Q": 64,
        "MAX_GEN_TOKENS_RAG": 64,
        "TEMPERATURE": 0.1,
        "TOP_P": 1.0,
        "SEED": 42,
    }
    cfg_path = os.path.join(out_dir, "config.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f, indent=1)

    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_cache")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "sdag_tpu.pipeline.cli", cfg_path],
        cwd=REPO, env=env, capture_output=True, text=True)
    wall = time.time() - t0
    log_path = os.path.join(out_dir, "run.log")
    with open(log_path, "w") as f:
        f.write(proc.stdout)
        f.write("\n--- stderr ---\n")
        f.write(proc.stderr[-20000:])
    status = {"strategy": strategy, "rc": proc.returncode,
              "wall_s": round(wall, 1)}
    for line in proc.stdout.splitlines():
        # orchestrator end-of-run speculation report -> wall.json
        if line.startswith("[spec] "):
            status["spec_report"] = line
    with open(os.path.join(out_dir, "wall.json"), "w") as f:
        json.dump(status, f)
    print(f"[run] {strategy}: rc={proc.returncode} wall={wall:.0f}s "
          f"-> {out_dir}")
    return status


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--strategies", nargs="+",
                    default=["random", "closest_to_centroid",
                             "furthest_from_centroid"])
    ap.add_argument("--sample-size", type=int, default=1000)
    ap.add_argument("--out", default=os.path.join(REPO, "experiments",
                                                  "results"))
    ap.add_argument("--workdir", default="/tmp/sdag_full_scale")
    ap.add_argument("--dataset", default="nq", choices=sorted(DATASETS))
    ap.add_argument("--defense", default="none",
                    choices=["none", "ragdefender", "discern_and_answer"])
    ap.add_argument("--attack-variant", default="malicious_doc",
                    choices=["malicious_doc", "doc_corruption"])
    ap.add_argument("--kv-dtype", default="native",
                    choices=["native", "int8"])
    ap.add_argument("--retriever", default="dense",
                    choices=["dense", "sparse", "sparse_and_dense"])
    ap.add_argument("--speculative", type=int, default=0,
                    help="SPECULATIVE_DRAFT_LEN (0 = off); the measured "
                         "accepted-drafts/round lands in wall.json")
    args = ap.parse_args()

    from sdag_tpu.utils.chipjobs import register_chip_job
    register_chip_job("full_scale")

    if args.attack_variant == "doc_corruption" and len(args.strategies) > 1:
        # corruption never selects malicious docs; one run covers it
        print("[run] doc_corruption ignores selection strategies; "
              "running once with 'random'")
        args.strategies = ["random"]
    workdir = os.path.join(args.workdir, args.dataset)
    prepare(workdir, args.sample_size, args.dataset)
    summary = []
    for s in args.strategies:
        summary.append(run_one(workdir, args.out, s, args.sample_size,
                               args.dataset, defense=args.defense,
                               attack_variant=args.attack_variant,
                               kv_dtype=args.kv_dtype,
                               retriever=args.retriever,
                               speculative=args.speculative))
    suffix = args.dataset if args.defense == "none" \
        else f"{args.dataset}_{args.defense}"
    if args.attack_variant != "malicious_doc":
        suffix += f"_{args.attack_variant}"
    if args.kv_dtype != "native":
        suffix += f"_kv{args.kv_dtype}"
    if args.retriever != "dense":
        suffix += f"_{args.retriever}"
    if args.speculative:
        suffix += f"_spec{args.speculative}"
    sp = os.path.join(args.out, f"summary_{suffix}.json")
    with open(sp, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
