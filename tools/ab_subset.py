"""Alternating A/B subset bench: median-of-N per side (round-13 tooling).

Runs ``bench.py`` in subset mode (``SPARK_GRAFT_BENCH_ONLY``) alternating
between two checkouts — side A (this repo) and side B (a worktree of the
baseline commit) — so ambient drift hits both sides equally, and reports
the per-query median of each side plus the ratio. This is the adjudication
regime OPTIMIZATION_r12.md used, packaged so every r13 A/B quotes the same
methodology.

Usage::

    python tools/ab_subset.py q1[,q2...] N_RUNS [B_DIR]

With no ``B_DIR`` it just runs side A N_RUNS times (median-of-N probe).
Each run is a fresh JVM with the bench's standard warm-ups; SF dir and CPU
count come from the usual ``SPARK_GRAFT_SF_DIR`` / ``SPARK_GRAFT_CPUS``.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(bench_dir: str, queries: str) -> dict[str, float]:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_ONLY"] = queries
    env.pop("SPARK_GRAFT_BENCH_OUT", None)
    out = subprocess.run(
        [sys.executable, os.path.join(bench_dir, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    try:
        doc = json.loads(line)
    except json.JSONDecodeError:
        raise SystemExit(
            f"bench in {bench_dir} produced no JSON line; stderr tail:\n"
            + out.stderr[-2000:]
        )
    if doc.get("failures"):
        raise SystemExit(f"bench failures in {bench_dir}: {doc['failures']}")
    return doc["queries"]


def main() -> None:
    queries = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    b_dir = sys.argv[3] if len(sys.argv) > 3 else None

    sides: dict[str, list[dict[str, float]]] = {"A": []}
    if b_dir:
        sides["B"] = []
    for i in range(n_runs):
        for label, bench_dir in (("A", REPO),) + (
            (("B", b_dir),) if b_dir else ()
        ):
            t0 = time.time()
            timings = run_once(bench_dir, queries)
            sides[label].append(timings)
            print(
                f"run {i + 1}/{n_runs} side {label}: "
                + ", ".join(f"{k}={v:.2f}" for k, v in sorted(timings.items()))
                + f"  (wall {time.time() - t0:.0f}s)",
                file=sys.stderr,
                flush=True,
            )

    names = sorted(sides["A"][0])
    print(f"{'query':40s} " + " ".join(f"{s}_median" for s in sides) + "  ratio")
    for n in names:
        meds = {
            s: statistics.median(r[n] for r in runs) for s, runs in sides.items()
        }
        ratio = (
            f"{meds['A'] / meds['B']:.3f}" if "B" in meds and meds["B"] else ""
        )
        print(
            f"{n:40s} "
            + " ".join(f"{meds[s]:8.3f}" for s in sides)
            + f"  {ratio}"
        )
    for s, runs in sides.items():
        for n in names:
            vals = [f"{r[n]:.2f}" for r in runs]
            print(f"  {s} {n}: [{', '.join(vals)}]")


if __name__ == "__main__":
    main()
