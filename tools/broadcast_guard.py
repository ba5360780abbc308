"""Registry-wide broadcast-hint audit (script form of
tests/test_plans.py::test_no_broadcast_hint_on_fact_grain).

A ``broadcast()`` hint is honored unconditionally by Spark, overriding
AQE's size check — so a hint on a side that grows with scale factor is an
executor OOM at the 100 TB design point even when it is fast at test SF
(VERDICT r3 "What's wrong" #1). The rules live in
``stream_processing_pipeline_spark.audit``; this script applies them to
every registered query's analyzed logical plan.

Usage: python tools/broadcast_guard.py [name1,name2|N]
Prints one line per offending (query, hint) and exits 1 on any.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import SparkSession

    from stream_processing_pipeline_spark.audit import (
        BROADCAST_HINT_ALLOWED,
        broadcast_hint_violations,
    )
    from stream_processing_pipeline_spark.plans import REGISTRY

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    names = list(REGISTRY)
    if len(sys.argv) > 1:
        arg = sys.argv[1]
        names = names[: int(arg)] if arg.isdigit() else arg.split(",")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    failures = {}
    for name in names:
        if name in BROADCAST_HINT_ALLOWED:
            continue
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            bad = broadcast_hint_violations(df)
        except Exception as e:  # noqa: BLE001
            bad = [f"ERROR {type(e).__name__}: {e}"]
        finally:
            spark.catalog.clearCache()
        if bad:
            failures[name] = bad
            for b in bad:
                print(f"VIOLATION {name}: {b[:140]}")
    print(f'{{"n": {len(names)}, "violations": {len(failures)}}}')
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
