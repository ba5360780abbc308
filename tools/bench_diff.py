"""Cross-round bench attribution: diff two bench JSON files.

Usage::

    python tools/bench_diff.py BENCH_LOCAL_r8.json BENCH_LOCAL_r9.json
    python tools/bench_diff.py old.json new.json --threshold 1.5

Both inputs are the one-line JSON that ``bench.py`` prints (and that the
per-round ``BENCH_LOCAL_r{N}.json`` / driver ``BENCH_r{N}.json`` files
persist): ``{"queries": {name: seconds, ...}, ...}``. Ambient machine
drift (cache state, background load, JVM warm-up luck) moves EVERY query
by roughly the same factor, so raw per-query ratios conflate real
regressions with noise. The tool therefore normalizes by the median
ratio over the common query set — the median is the ambient factor
(robust to the handful of genuinely changed queries) — and reports
queries whose *normalized* ratio crosses the threshold, plus
added/removed queries and the headline wall numbers.

Exit status is 0 when nothing crosses the threshold, 2 otherwise, so the
closing-cert script can gate on it. Sub-0.2 s timings on both sides are
reported but never counted as movers: at that scale the timer resolution
and per-query session overhead dominate any plan change.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys

#: Below this many seconds on BOTH sides a ratio is noise, not a mover.
NOISE_FLOOR_SEC = 0.2


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        doc = json.load(f)
    if "queries" not in doc and isinstance(doc.get("parsed"), dict):
        doc = doc["parsed"]  # driver BENCH_r{N}.json wrapper
    queries = doc.get("queries")
    if not isinstance(queries, dict) or not queries:
        raise SystemExit(
            f"{path}: no 'queries' dict — need a bench.py output line "
            f"(BENCH_LOCAL_r*.json) or a driver wrapper with 'parsed'"
        )
    return {k: float(v) for k, v in queries.items() if float(v) >= 0}


def diff(
    old: dict[str, float], new: dict[str, float], threshold: float
) -> dict:
    common = sorted(set(old) & set(new))
    if not common:
        raise SystemExit("no common queries between the two files")
    ratios = {n: new[n] / old[n] for n in common if old[n] > 0}
    solid = [
        r
        for n, r in ratios.items()
        if old[n] >= NOISE_FLOOR_SEC or new[n] >= NOISE_FLOOR_SEC
    ]
    ambient = statistics.median(solid or list(ratios.values()))
    movers = []
    for name in common:
        if old[name] <= 0:
            continue
        if old[name] < NOISE_FLOOR_SEC and new[name] < NOISE_FLOOR_SEC:
            continue
        norm = ratios[name] / ambient
        if norm >= threshold or norm <= 1.0 / threshold:
            movers.append(
                {
                    "query": name,
                    "old_sec": old[name],
                    "new_sec": new[name],
                    "raw_ratio": round(ratios[name], 3),
                    "normalized_ratio": round(norm, 3),
                }
            )
    movers.sort(key=lambda m: -m["normalized_ratio"])
    return {
        "common": len(common),
        "ambient_median_ratio": round(ambient, 3),
        "threshold": threshold,
        "movers": movers,
        "added": sorted(set(new) - set(old)),
        "removed": sorted(set(old) - set(new)),
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old", help="earlier bench JSON (e.g. BENCH_LOCAL_r8.json)")
    ap.add_argument("new", help="later bench JSON")
    ap.add_argument(
        "--threshold",
        type=float,
        default=1.5,
        help="normalized ratio that counts as a mover (default 1.5; "
        "speedups past 1/threshold are reported too)",
    )
    args = ap.parse_args(argv)

    report = diff(load_queries(args.old), load_queries(args.new), args.threshold)

    print(
        f"common={report['common']}  ambient(median ratio)="
        f"{report['ambient_median_ratio']}  threshold={report['threshold']}"
    )
    if report["added"]:
        print(f"added ({len(report['added'])}): {', '.join(report['added'])}")
    if report["removed"]:
        print(f"removed ({len(report['removed'])}): {', '.join(report['removed'])}")
    if not report["movers"]:
        print("no movers past threshold after ambient normalization")
    for m in report["movers"]:
        direction = "SLOWER" if m["normalized_ratio"] > 1 else "faster"
        print(
            f"  {m['query']:<40s} {m['old_sec']:7.3f}s -> {m['new_sec']:7.3f}s"
            f"  raw {m['raw_ratio']:.2f}x  norm {m['normalized_ratio']:.2f}x  {direction}"
        )
    print(json.dumps(report, separators=(",", ":")))
    return 2 if any(m["normalized_ratio"] > 1 for m in report["movers"]) else 0


if __name__ == "__main__":
    sys.exit(main())
