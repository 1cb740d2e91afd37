"""Paired (per-query) ISO vs NO-ISO analysis of an sdag_effect results dir.

The headline ACC/ASR tables compare marginal rates; the sharper test is the
paired one: on how many queries does exactly ONE of the two attention modes
emit the false answer?  Under H0 (isolation has no effect) a discordant
query is equally likely to fall either way, so the one-sided binomial
p-value over the discordant pairs is the reference claim's significance
test (NO-ISO fooled more often than ISO; reference README.md:47-69).

Usage::

    python experiments/paired_analysis.py experiments/results/sdag_effect_v4

Walks every ``nmal*/results_*.csv`` below the dir and prints a markdown
table (one row per attack cell; pos=0 clean cells are skipped).
"""

from __future__ import annotations

import csv
import glob
import math
import os
import re
import sys


def binom_one_sided(k: int, n: int) -> float:
    """P(X >= k) for X ~ Binomial(n, 0.5)."""
    return sum(math.comb(n, i) for i in range(k, n + 1)) / 2.0 ** n


def analyze(csv_path: str):
    fooled_noiso_only = fooled_iso_only = 0
    acc_iso_only = acc_noiso_only = 0
    with open(csv_path) as fh:
        for row in csv.DictReader(fh):
            fi = row["false_match_iso"] in ("1", "True")
            fn = row["false_match_noiso"] in ("1", "True")
            gi = row["ground_truth_match_iso"] in ("1", "True")
            gn = row["ground_truth_match_noiso"] in ("1", "True")
            fooled_noiso_only += (fn and not fi)
            fooled_iso_only += (fi and not fn)
            acc_iso_only += (gi and not gn)
            acc_noiso_only += (gn and not gi)
    return fooled_noiso_only, fooled_iso_only, acc_iso_only, acc_noiso_only


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else \
        "experiments/results/sdag_effect_v4"
    rows = []
    for path in sorted(glob.glob(os.path.join(root, "nmal*",
                                              "results_*pos=*.csv"))):
        run = os.path.basename(os.path.dirname(path))
        pos = int(re.search(r"pos=(\d+)", path).group(1))
        if pos == 0:
            continue  # clean cell: no false answer to be fooled by
        fn_only, fi_only, ai_only, an_only = analyze(path)
        n_disc = fn_only + fi_only
        p = binom_one_sided(fn_only, n_disc) if n_disc else float("nan")
        rows.append((run, pos, fn_only, fi_only, p, ai_only, an_only))

    print("| cell | pos | fooled NO-ISO only | fooled ISO only | "
          "one-sided p | correct ISO only | correct NO-ISO only |")
    print("|---|---|---|---|---|---|---|")
    for run, pos, fn_only, fi_only, p, ai, an in rows:
        ptxt = f"{p:.3f}" if p == p else "–"
        print(f"| {run} | {pos} | {fn_only} | {fi_only} | {ptxt} "
              f"| {ai} | {an} |")


if __name__ == "__main__":
    main()
