"""Dump full ``.explain('formatted')`` output for round-13-touched queries.

Writes ``plans/r13/<query>_<suffix>.txt`` at the repo root for each query
named on the command line (default: every query whose plan changed in the
r13 optimization round — keep R13_TOUCHED in sync with OPTIMIZATION_r13.md).
Run once with ``before`` BEFORE editing a query (or from a worktree of the
pre-change commit) and once with ``after`` on the optimized tree.

Usage:
    python tools/dump_r13_plans.py after [outdir] [name1,name2,...]
    python tools/dump_r13_plans.py before /root/repo/plans/r13 name1,name2
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

# Queries whose physical plan changed in the r13 optimization round
# (either the query function itself or a shared operator it calls).
R13_TOUCHED = [
    "customer_inflight_order_overlaps",
    "dedup_edit_distance",
    "sim_recall_ivfpq_rerank_at_k",
    "sim_topk_ivfpq_rerank",
    "source_curation_report",
    "source_token_divergence",
    "supplier_part_transit_overlaps",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    outdir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            "r13",
        )
    )
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else R13_TOUCHED
    os.makedirs(outdir, exist_ok=True)

    spark = build_session(app_name=f"dump_r13_plans_{suffix}")
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
