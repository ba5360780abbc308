"""Regenerate REGISTRY.md: every registered query, its tags, oracle status,
and verification surface — the line-by-line inventory the coverage story
points at. Usage: python tools/dump_registry.py"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stream_processing_pipeline_spark.plans import REGISTRY  # noqa: E402


def main() -> None:
    lines = [
        "# REGISTRY — all registered queries (auto-generated)",
        "",
        "One row per `__spark_entry__.queries()` entry, in registration order",
        "(the external gate's evaluation order). Oracle column: `value-hash`",
        "= full DuckDB value-hash comparison at sf0.01; `rows-only` = result",
        "shape checked, semantics pinned by the named invariant tests.",
        "The two `rows-only` sketch queries are DELIBERATELY excluded from",
        "the ~50-slot gate prefix forever: a slot spent on them can never",
        "turn hash-green (the driver records `no_oracle`), so `rows-only`",
        "here means locally-pinned invariants, NOT an external driver row",
        "(VERDICT r7 #8). Regenerate with `python tools/dump_registry.py`.",
        "",
        "| # | query | tags | oracle |",
        "|---|---|---|---|",
    ]
    for i, (name, q) in enumerate(REGISTRY.items(), 1):
        oracle = "value-hash" if q.oracle else "rows-only"
        tags = ", ".join(q.tags) if q.tags else ""
        lines.append(f"| {i} | `{name}` | {tags} | {oracle} |")
    n = len(REGISTRY)
    n_oracled = sum(1 for q in REGISTRY.values() if q.oracle)
    lines += [
        "",
        f"**{n} queries, {n_oracled} value-hash oracles, "
        f"{n - n_oracled} rows-only** (rows-only: engine-specific sketch "
        "binaries and iterative k-means training — each pinned by invariant "
        "tests; see COVERAGE.md).",
        "",
    ]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "REGISTRY.md"), "w") as fh:
        fh.write("\n".join(lines))
    print(f"REGISTRY.md written ({n} queries)")


if __name__ == "__main__":
    main()
