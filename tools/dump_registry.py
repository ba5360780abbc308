"""Regenerate REGISTRY.md: every registered query, its tags, oracle status,
verification surface, and external-evidence VINTAGE (the newest
CORRECTNESS_r*.json round carrying a driver row for the query — the
per-query evidence-rotation ledger the gate-head ordering runs on).
Usage: python tools/dump_registry.py"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stream_processing_pipeline_spark.plans import REGISTRY  # noqa: E402

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_external_rows() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        for name in json.load(open(path)):
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> None:
    latest = newest_external_rows()
    lines = [
        "# REGISTRY — all registered queries (auto-generated)",
        "",
        "One row per `__spark_entry__.queries()` entry, in registration order",
        "(the external gate's evaluation order). Oracle column: `value-hash`",
        "= full DuckDB value-hash comparison at sf0.01; `rows-only` = result",
        "shape checked, semantics pinned by the named invariant tests.",
        "The `rows-only` class is EMPTY as of round 11: the HLL pair's",
        "engine-private Datasketches sketches were replaced with explicit",
        "h60-derived registers (VERDICT r10 #2), so every registered query",
        "now carries a full value-hash oracle and is gate-eligible.",
        "Vintage column: the newest round whose external",
        "driver gate recorded this query (`CORRECTNESS_r{N}.json`); `—` =",
        "registered after the last recorded gate, mirror-verified at 3 SFs",
        "and queued in the declared next-round head",
        "(tests/test_registry_gate.py names each one's in-prefix sibling).",
        "Regenerate with `python tools/dump_registry.py`.",
        "",
        "| # | query | tags | oracle | newest external row |",
        "|---|---|---|---|---|",
    ]
    for i, (name, q) in enumerate(REGISTRY.items(), 1):
        oracle = "value-hash" if q.oracle else "rows-only"
        tags = ", ".join(q.tags) if q.tags else ""
        vint = f"r{latest[name]}" if name in latest else "—"
        lines.append(f"| {i} | `{name}` | {tags} | {oracle} | {vint} |")
    n = len(REGISTRY)
    n_oracled = sum(1 for q in REGISTRY.values() if q.oracle)
    from collections import Counter

    counts = Counter(
        f"r{latest[name]}" if name in latest else "unrecorded"
        for name in REGISTRY
    )
    dist = ", ".join(
        f"{k}: {v}" for k, v in sorted(counts.items(), key=lambda kv: kv[0])
    )
    lines += [
        "",
        f"**{n} queries, {n_oracled} value-hash oracles, "
        f"{n - n_oracled} rows-only** (rows-only: engine-specific sketch "
        "binaries and iterative k-means training — each pinned by invariant "
        "tests; see COVERAGE.md).",
        "",
        f"Vintage distribution (newest external row per query): {dist}.",
        "",
    ]
    with open(os.path.join(_ROOT, "REGISTRY.md"), "w") as fh:
        fh.write("\n".join(lines))
    print(f"REGISTRY.md written ({n} queries)")


if __name__ == "__main__":
    main()
