"""Registry-wide shuffle-evidence coverage (VERDICT r9 #2).

Round 9 shipped seven post-certification queries without shuffle-audit
roster lines — the per-query evidence discipline silently skipped. These
tests make the roster structural: every registered query must be measured
(AUDITED), covered by a named measured sibling (COVERED_BY), or a verified
zero-exchange plan (ZERO_EXCHANGE). A future addition that skips all three
fails the suite, not a review.
"""

from __future__ import annotations

import importlib.util
import os

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_audit_module():
    spec = importlib.util.spec_from_file_location(
        "shuffle_audit", os.path.join(_ROOT, "tools", "shuffle_audit.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


SA = _load_audit_module()


def test_every_registered_query_has_shuffle_evidence():
    """AUDITED + COVERED_BY + ZERO_EXCHANGE must partition the registry:
    full coverage, no name in two evidence classes, no stale names for
    queries that no longer exist."""
    from stream_processing_pipeline_spark.plans import REGISTRY

    audited = set(SA.AUDITED)
    covered = set(SA.COVERED_BY)
    zero = set(SA.ZERO_EXCHANGE)
    reg = set(REGISTRY)

    uncovered = sorted(reg - audited - covered - zero)
    assert not uncovered, (
        "registered queries with NO shuffle evidence (add an AUDITED row, "
        f"a COVERED_BY sibling, or a ZERO_EXCHANGE entry): {uncovered}"
    )
    overlaps = sorted(
        (audited & covered) | (audited & zero) | (covered & zero)
    )
    assert not overlaps, f"names in more than one evidence class: {overlaps}"
    stale = sorted((audited | covered | zero) - reg)
    assert not stale, f"evidence entries for unregistered queries: {stale}"


def test_covered_by_points_at_measured_rows():
    """Every COVERED_BY sibling must itself be a measured AUDITED row, and
    every entry must carry a non-empty reason the judge can check."""
    for name, (sibling, reason) in SA.COVERED_BY.items():
        assert sibling in SA.AUDITED, (
            f"{name} names sibling {sibling!r} that has no AUDITED row"
        )
        assert reason.strip(), f"{name} lacks a coverage reason"


def test_zero_exchange_claims_hold(spark):
    """The ZERO_EXCHANGE class is a structural claim — rebuild each plan
    and assert no Exchange operator appears in the executed plan."""
    from stream_processing_pipeline_spark.plans import REGISTRY

    sf_dir = "/root/testdata/sf0.001"
    offenders = []
    for name in sorted(SA.ZERO_EXCHANGE):
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "Exchange" in plan:
            offenders.append(name)
    assert not offenders, (
        f"ZERO_EXCHANGE queries whose plans contain an Exchange: {offenders}"
    )
