"""LIVE JDBC sink test against a real embedded PostgreSQL (K1 evidence).

The reference appends every micro-batch to Postgres
(`/root/reference/src/spark_streaming.py:116-124`); `streaming/sinks.py:
JdbcSink` is this engine's twin and was previously pinned only by unit
tests because the sandbox ships no database SERVER container. The sandbox
DOES ship the PostgreSQL server binaries (initdb/pg_ctl/postgres 15) and
the public JDBC driver jar (org.postgresql:postgresql:42.5.4, the Maven
Central artifact, present read-only under /root/reference/), so this test
runs the real thing:

- boots a throwaway Postgres cluster in tmp (as user ``nobody`` when root,
  since postgres refuses to run as root),
- runs a CHILD Python process with its own SparkSession configured with
  the JDBC jar (the suite's shared JVM can't load a jar post-hoc), which
  (1) appends a batch through ``JdbcSink``, (2) replays an epoch with
  ``epoch_idempotent=True`` + a psql-backed ``delete_epoch_fn`` and
  (3) streams a file source through ``run_available_now`` into the DB,
- verifies row counts and epoch-exactly-once from the parent via psql.

Skips cleanly (with the reason recorded) when any piece is missing —
same contract as tests/test_live_infra_smoke.py.
"""

from __future__ import annotations

import os
import pwd
import shutil
import subprocess
import sys
import textwrap

import pytest

PG_JAR = os.environ.get(
    "SPARK_GRAFT_PG_JAR", "/root/reference/postgresql-42.5.4.jar"
)
PG_PORT = 54000 + (os.getpid() % 900)
PG_USER = "spark"
PG_DB = "postgres"


def _have_prereqs() -> str | None:
    for tool in ("initdb", "pg_ctl", "psql"):
        if shutil.which(tool) is None:
            return f"{tool} not on PATH"
    if not os.path.exists(PG_JAR):
        return f"JDBC driver jar missing: {PG_JAR}"
    if os.getuid() == 0:
        try:
            pwd.getpwnam("nobody")
        except KeyError:
            return "running as root and no 'nobody' user to run postgres as"
    return None


def _as_pg_user(cmd: str) -> list[str]:
    """Postgres refuses root; wrap through nobody when needed."""
    if os.getuid() == 0:
        return ["su", "-s", "/bin/bash", "nobody", "-c", f"cd /tmp && {cmd}"]
    return ["/bin/bash", "-c", cmd]


def _psql(sql: str) -> str:
    out = subprocess.run(
        ["psql", "-h", "127.0.0.1", "-p", str(PG_PORT), "-U", PG_USER,
         "-d", PG_DB, "-tAc", sql],
        capture_output=True, text=True, timeout=30,
    )
    assert out.returncode == 0, out.stderr
    return out.stdout.strip()


@pytest.fixture(scope="module")
def live_pg():
    reason = _have_prereqs()
    if reason:
        pytest.skip(f"live postgres unavailable: {reason}")
    import pathlib
    import tempfile

    # Directly under /tmp: pytest's tmp roots are 0700 and the postgres
    # process runs as 'nobody', which must traverse every parent.
    d = pathlib.Path(tempfile.mkdtemp(prefix="live_pg_", dir="/tmp"))
    os.chmod(d, 0o777)
    if os.getuid() == 0:
        subprocess.run(["chown", "-R", "nobody", str(d)], check=True)
    data = d / "data"
    r = subprocess.run(
        _as_pg_user(f"initdb -D {data} -U {PG_USER} --no-sync"),
        capture_output=True, text=True, timeout=120,
    )
    if r.returncode != 0:
        pytest.skip(f"initdb failed: {r.stderr[-300:]}")
    r = subprocess.run(
        _as_pg_user(
            f"pg_ctl -D {data} -l {d}/log -o '-p {PG_PORT} "
            f"-c listen_addresses=127.0.0.1 -k {d}' start"
        ),
        capture_output=True, text=True, timeout=60,
    )
    if r.returncode != 0:
        pytest.skip(f"pg_ctl start failed: {r.stderr[-300:]}")
    try:
        yield f"jdbc:postgresql://127.0.0.1:{PG_PORT}/{PG_DB}"
    finally:
        subprocess.run(
            _as_pg_user(f"pg_ctl -D {data} -m fast stop"),
            capture_output=True, timeout=60,
        )
        shutil.rmtree(d, ignore_errors=True)


_CHILD = textwrap.dedent(
    """
    import os, subprocess, sys
    sys.path.insert(0, os.environ["REPO"])
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    url = os.environ["PG_URL"]
    props = {"user": os.environ["PG_USER"], "driver": "org.postgresql.Driver"}
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("live-jdbc")
        .config("spark.jars", os.environ["PG_JAR"])
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    from stream_processing_pipeline_spark.streaming.sinks import JdbcSink

    # 1. plain append path (reference parity)
    df = spark.range(50).select(
        F.col("id"), (F.col("id") * 10).alias("v")
    )
    JdbcSink(url=url, table="t_plain", properties=props)(df, 0)

    # 2. epoch-idempotent path: same epoch delivered twice must not double
    def delete_epoch(epoch_id: int) -> None:
        subprocess.run(
            ["psql", "-h", "127.0.0.1", "-p", os.environ["PG_PORT"],
             "-U", os.environ["PG_USER"], "-d", os.environ["PG_DB"], "-c",
             f'DELETE FROM t_epoch WHERE "__epoch_id" = {epoch_id}'],
            capture_output=True, timeout=30,
        )

    sink = JdbcSink(
        url=url, table="t_epoch", properties=props,
        epoch_idempotent=True, delete_epoch_fn=delete_epoch,
    )
    sink(spark.range(20), 7)
    sink(spark.range(20), 7)  # redelivery of epoch 7

    # 3. real streaming query -> foreachBatch -> JDBC
    src = os.environ["SRC_DIR"]
    spark.range(30).select("id").coalesce(1).write.parquet(src + "/chunk=0")
    from pyspark.sql.types import LongType, StructField, StructType

    stream = spark.readStream.schema(
        StructType([StructField("id", LongType())])
    ).parquet(src + "/chunk=*")
    from stream_processing_pipeline_spark.streaming.runner import (
        run_available_now,
    )

    run_available_now(
        stream,
        JdbcSink(url=url, table="t_stream", properties=props),
        checkpoint=os.environ["CKPT"],
    )
    spark.stop()
    print("CHILD_OK")
    """
)


def test_jdbc_sink_live_roundtrip(live_pg, tmp_path):
    env = dict(
        os.environ,
        REPO=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        PG_URL=live_pg,
        PG_JAR=PG_JAR,
        PG_PORT=str(PG_PORT),
        PG_USER=PG_USER,
        PG_DB=PG_DB,
        SRC_DIR=str(tmp_path / "src"),
        CKPT=str(tmp_path / "ckpt"),
    )
    r = subprocess.run(
        [sys.executable, "-c", _CHILD],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert r.returncode == 0 and "CHILD_OK" in r.stdout, (
        r.stdout[-1000:] + r.stderr[-2000:]
    )
    # plain append landed every row
    assert _psql("SELECT count(*) FROM t_plain") == "50"
    assert _psql("SELECT sum(v) FROM t_plain") == str(sum(i * 10 for i in range(50)))
    # epoch redelivery replaced, not duplicated
    assert _psql("SELECT count(*) FROM t_epoch") == "20"
    assert _psql('SELECT count(DISTINCT "__epoch_id") FROM t_epoch') == "1"
    # streaming availableNow run appended the file batch exactly once
    assert _psql("SELECT count(*) FROM t_stream") == "30"
