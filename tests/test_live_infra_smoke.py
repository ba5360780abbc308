"""Compose-gated live-infra smoke (skips without Kafka+Postgres) and the
config.ini layer for the operational entry point."""

from __future__ import annotations

import configparser

import pytest

from tools.smoke_live_infra import (
    SINK_TABLES,
    infra_status,
    jdbc_hostport,
    parse_hostport,
    run_smoke,
)


def _cfg(text: str) -> configparser.ConfigParser:
    cfg = configparser.ConfigParser()
    cfg.read_string(text)
    return cfg


_SMOKE_CFG = """
[kafka]
brokers=localhost:9094
topic=yellow_tripdata
[postgres]
url=jdbc:postgresql://localhost:5432/taxi
user=postgres
password=postgres
[engine]
checkpoint_root=tmp/checkpoints
"""


def test_live_smoke_or_skip(tmp_path):
    """When the reference's docker-compose stack is up, replay->topology->
    tables-fill runs for real; in the sandbox this records an explicit SKIP
    (the honest marker that the Kafka/JDBC paths executed only in unit
    tests)."""
    cfg = _cfg(_SMOKE_CFG)
    status = infra_status(cfg)
    if not all(status.values()):
        pytest.skip(f"live infra unreachable: {status}")
    cfg_path = tmp_path / "config.ini"
    cfg_path.write_text(_SMOKE_CFG)
    assert run_smoke(cfg, str(cfg_path), n_rows=200) == 0  # pragma: no cover


def test_infra_status_shape():
    status = infra_status(_cfg(_SMOKE_CFG))
    assert set(status) == {"kafka", "postgres"}
    assert all(isinstance(v, bool) for v in status.values())


def test_hostport_parsing():
    assert parse_hostport("broker1:9092", 9094) == ("broker1", 9092)
    assert parse_hostport("broker1", 9094) == ("broker1", 9094)
    assert jdbc_hostport("jdbc:postgresql://db.internal:5433/taxi") == (
        "db.internal",
        5433,
    )
    assert jdbc_hostport("jdbc:postgresql://db/taxi") == ("db", 5432)


def test_sink_tables_match_reference():
    """The six tables are the reference's exact sink surface
    (/root/reference/src/spark_streaming.py:133,184,229,264,293,333)."""
    assert SINK_TABLES == [
        "yellow_tripdata",
        "abnormal_duration",
        "abnormal_fee",
        "avg_revenue_per_hour",
        "trip_count_per_hour",
        "trip_count_by_borough",
    ]


def test_config_defaults_and_precedence():
    """config.ini precedence in the operational tools: explicit values win,
    documented defaults fill gaps (zone_lookup, smoke settings, alerts
    optional -> LogAlerter)."""
    cfg = _cfg(_SMOKE_CFG)
    # engine defaults used by run_reference_topology
    assert (
        cfg["engine"].get("zone_lookup", "data/taxi_zone_lookup.csv")
        == "data/taxi_zone_lookup.csv"
    )
    # explicit value wins over fallback
    assert cfg.get("kafka", "brokers", fallback="other:1") == "localhost:9094"
    # absent section -> fallback path (alerts -> LogAlerter branch)
    assert not (cfg.has_section("alerts") and cfg["alerts"].get("smtp_host"))
    cfg2 = _cfg(_SMOKE_CFG + "\n[alerts]\nsmtp_host=smtp.example.com\n"
                "smtp_port=2525\nsender=a@b\npassword=x\nrecipients=c@d,e@f\n")
    assert cfg2.has_section("alerts") and cfg2["alerts"].get("smtp_host")
    assert cfg2["alerts"].getint("smtp_port", 587) == 2525
    assert cfg2["alerts"].get("recipients", "").split(",") == ["c@d", "e@f"]
