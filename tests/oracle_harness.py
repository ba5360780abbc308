"""Local mirror of the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle SQL over the same
fixture directory, then compares row count, column names, and values
(column-name-sorted, order-insensitive) — the same shape of check the driver
records in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from stream_processing_pipeline_spark import TABLES

__all__ = ["run_oracle", "compare_frames", "check_query"]


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            # tz-naive microseconds either way
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: str(v) if not isinstance(v, (list, tuple, bytes)) else repr(v),
                na_action="ignore",
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare_frames(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
    s_cols, o_cols = sorted(spark_df.columns), sorted(oracle_df.columns)
    if s_cols != o_cols:
        problems.append(f"columns: spark={s_cols} oracle={o_cols}")
        return problems
    if problems:
        return problems
    # dtype-kind mismatch (e.g. Spark DECIMAL arriving as object vs DuckDB
    # DOUBLE) is a schema divergence the driver's gate would flag — don't
    # let the float cast below mask it.
    for c in spark_df.columns:
        sk = spark_df[c].dtype.kind
        ok_ = oracle_df[c].dtype.kind
        numeric = {"i", "u", "f"}
        if (sk in numeric) != (ok_ in numeric):
            problems.append(
                f"column {c}: dtype kind mismatch spark={spark_df[c].dtype} "
                f"oracle={oracle_df[c].dtype}"
            )
    if problems:
        return problems
    s, o = _normalize(spark_df), _normalize(oracle_df)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            mism = ~(
                (sv.isna() & ov.isna())
                | (sv.astype(float) == ov.astype(float))
            )
        else:
            mism = ~((sv.isna() & ov.isna()) | (sv == ov))
        n_bad = int(mism.sum())
        if n_bad:
            idx = mism[mism].index[:5]
            examples = [(c, i, sv[i], ov[i]) for i in idx]
            problems.append(f"column {c}: {n_bad} mismatched values, e.g. {examples}")
    return problems


def check_query(spark, name: str, sf_dir: str) -> list[str]:
    from stream_processing_pipeline_spark.plans import REGISTRY

    q = REGISTRY[name]
    spark_pdf = q.fn(spark, sf_dir).toPandas()
    if q.oracle is None:
        return [] if len(spark_pdf) >= 0 else ["no rows"]
    oracle_pdf = run_oracle(q.oracle, sf_dir)
    return compare_frames(spark_pdf, oracle_pdf)


def _is_nan(v) -> bool:
    return isinstance(v, float) and math.isnan(v)
