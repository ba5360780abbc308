"""Dump full ``.explain('formatted')`` output for round-12-touched queries.

Writes ``plans/r12/<query>_<suffix>.txt`` at the repo root for each query
named on the command line (default: every query whose plan changed in the
r12 optimization round). Run once with ``after`` on the optimized tree and
once with ``before`` from a worktree checked out at the round-11 commit
(copy this script there; the import path decides which code version plans).

Usage:
    python tools/dump_r12_plans.py after [outdir] [name1,name2,...]
    python tools/dump_r12_plans.py before /root/repo/plans/r12   # from r11 worktree
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stream_processing_pipeline_spark.plans import REGISTRY  # noqa: E402
from stream_processing_pipeline_spark.session import build_session  # noqa: E402

SF = "/root/testdata/sf0.01"

# Queries whose physical plan changed in the r12 optimization round
# (either the query function itself or a shared operator it calls).
R12_TOUCHED = [
    "bm25_topk_docs",
    "customer_inflight_order_overlaps",
    "dedup_ngram_jaccard",
    "dedup_winnow_pairs",
    "kcore_part_affinity",
    "lm_bigram_perplexity_filter",
    "lsh_cap_recall_audit",
    "part_affinity_pairs",
    "part_affinity_triangles",
    "supplier_part_transit_overlaps",
    "winnow_recall_audit",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    outdir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            "r12",
        )
    )
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else R12_TOUCHED
    os.makedirs(outdir, exist_ok=True)

    spark = build_session(app_name=f"dump_r12_plans_{suffix}")
    spark.sparkContext.setLogLevel("FATAL")
    for name in names:
        if name not in REGISTRY:
            print(f"SKIP {name}: not in this tree's registry", file=sys.stderr)
            continue
        df = REGISTRY[name].fn(spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(
                f"-- {name} ({suffix}) -- explain('formatted') at sf0.01,"
                " engine session defaults (AQE on; initial plan,"
                " isFinalPlan=false)\n\n"
            )
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
