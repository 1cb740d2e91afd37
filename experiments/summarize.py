"""Regenerate experiments/results/RESULTS.md from the committed result
JSONs (all datasets/strategies found under experiments/results/)."""

from __future__ import annotations

import glob
import json
import os

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")


def main() -> None:
    lines = [
        "# Reference-scale runs on TPU v5e (2026-08-16)",
        "",
        "Produced by `experiments/run_full_scale.py` on the reference's",
        "shipped data: 1000 queries per dataset, full TOP_K {5,10} x",
        "ADD_ATTACK_IN_RANK {1,3} grid, one run per malicious-doc selection",
        "strategy, through the production CLI on the real chip.  Corpus =",
        "1000 ground-truth pseudo-passages + ~5000 wiki-style distractors",
        "(the other dataset's malicious-doc pool; the real Wikipedia index",
        "is not shipped).  The TriviaQA attack CSV (a missing large blob",
        "upstream) is regenerated offline with the local-TPU backend of",
        "`attack/poisoned_rag.py`.",
        "",
        "**Interpretation caveat (by design):** models are random-weight",
        "tiny configs — no checkpoints exist in this offline environment —",
        "so ACC/ASR are near zero and measure pipeline mechanics",
        "(injection, defense, span isolation, eval schema) at reference",
        "scale, not model quality.",
        "",
        "| run | top_k | rank | queries | ISO ACC | ISO ASR |"
        " NOISO ACC | NOISO ASR |",
        "|---|---|---|---|---|---|---|---|",
    ]
    timing = ["", "## Wall time & phase totals (per strategy run)", "",
              "| run | grid wall (s) | init (s) | retrieve (s) |"
              " gen ISO (s) | gen NOISO (s) |",
              "|---|---|---|---|---|---|"]
    spec_reports = []


    for run_dir in sorted(glob.glob(os.path.join(ROOT, "*_*"))):
        if not os.path.isdir(run_dir):
            continue
        run = os.path.basename(run_dir)
        t = {"init_resources": 0.0, "retrieve": 0.0, "generate_iso": 0.0,
             "generate_noiso": 0.0}
        rows = 0
        for p in sorted(glob.glob(os.path.join(run_dir, "results_*.json"))):
            d = json.load(open(p))
            a = d["answer_match_stats"]
            iso, noiso = a["iso"], a.get("noiso", a.get("no_iso", {}))
            lines.append(
                "| {} | {} | {} | {} | {:.3f} | {:.3f} | {:.3f} | {:.3f} |"
                .format(run, d["top_k"], d["attack_position_in_rank"],
                        d["num_queries"],
                        iso["ground_truth_match_rate"],
                        iso["false_answer_match_rate"],
                        noiso.get("ground_truth_match_rate", float("nan")),
                        noiso.get("false_answer_match_rate", float("nan"))))
            for k in t:
                t[k] = max(t[k], d["phase_timings"].get(
                    k, {}).get("total_s", 0.0))
            rows += 1
        if rows:
            wall = float("nan")
            wp = os.path.join(run_dir, "wall.json")
            if os.path.exists(wp):
                w = json.load(open(wp))
                wall = w.get("wall_s", float("nan"))
                if "spec_report" in w:
                    spec_reports.append((run, w["spec_report"]))
            timing.append(
                "| {} | {} | {:.1f} | {:.1f} | {:.1f} | {:.1f} |".format(
                    run, wall, t["init_resources"], t["retrieve"],
                    t["generate_iso"], t["generate_noiso"]))

    spec = []
    if spec_reports:
        spec = [
            "", "## Measured speculative acceptance (VERDICT r2 item 3)",
            "",
            "Observed accepted-drafts-per-round from the production",
            "orchestrator (`Generator` counters), NOT a full-acceptance",
            "ceiling:", ""]
        spec += [f"- `{run}`: `{rep}`" for run, rep in spec_reports]
        spec += [
            "",
            "On the random-weight grids acceptance is ~0 by construction",
            "(prompt-lookup drafts can't match garbage continuations), and",
            "the verify-window overhead makes generation SLOWER than plain",
            "decode — speculation only pays when the model actually copies",
            "from the prompt (see the trained-model sdag_effect spec run).",
        ]

    out = os.path.join(ROOT, "RESULTS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines + timing + spec) + "\n")
    print(f"wrote {out}: {len(lines)} result lines")


if __name__ == "__main__":
    main()
