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

__all__ = [
    "run_oracle",
    "run_oracle_arrow",
    "compare_frames",
    "compare_arrow_types",
    "check_query",
]


def _connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    return _connect(sf_dir).execute(sql).df()


def run_oracle_arrow(sql: str, sf_dir: str):
    """Oracle result as a pyarrow Table — the *uncoerced* DuckDB types.

    ``.df()`` silently coerces DECIMAL(38,0) (what DuckDB returns for
    ``sum(BIGINT)``) to float64, which made the r2 driver hash-FAIL on
    ``mm_format_stats`` invisible to this mirror. Arrow preserves the decimal
    so :func:`compare_arrow_types` can flag it before the driver does.
    """
    return _connect(sf_dir).execute(sql).fetch_arrow_table()


def _canon_arrow(t) -> object:
    """Collapse an arrow type to the category the driver's value-hash is
    sensitive to: decimal-vs-int64 diverge, string-vs-large_string don't."""
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_null(t):
        return "null"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return ("list", _canon_arrow(t.value_type))
    if pa.types.is_map(t):
        return ("map", _canon_arrow(t.key_type), _canon_arrow(t.item_type))
    if pa.types.is_struct(t):
        return ("struct", tuple((f.name, _canon_arrow(f.type)) for f in t))
    return str(t)


def _canon_spark(dt) -> object:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, (T.StringType, getattr(T, "VarcharType", T.StringType),
                       getattr(T, "CharType", T.StringType))):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.TimestampType, getattr(T, "TimestampNTZType", T.TimestampType))):
        return "timestamp"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.NullType):
        return "null"
    if isinstance(dt, T.ArrayType):
        return ("list", _canon_spark(dt.elementType))
    if isinstance(dt, T.MapType):
        return ("map", _canon_spark(dt.keyType), _canon_spark(dt.valueType))
    if isinstance(dt, T.StructType):
        return ("struct", tuple((f.name, _canon_spark(f.dataType)) for f in dt.fields))
    return str(dt)


def compare_arrow_types(spark_schema, arrow_schema) -> list[str]:
    """Flag per-column type-category divergence between a Spark result schema
    and the DuckDB oracle's arrow schema — the class of bug pandas coercion
    masks (r2: ``sum(BIGINT)`` → DECIMAL(38,0) vs Spark int64, hash FAIL with
    rows/schema green). Columns are matched by name; both sides' column-name
    sets are checked by :func:`compare_frames` already, so only shared names
    are compared here."""
    spark_types = {f.name: _canon_spark(f.dataType) for f in spark_schema.fields}
    arrow_types = {
        arrow_schema.field(i).name: _canon_arrow(arrow_schema.field(i).type)
        for i in range(len(arrow_schema))
    }
    problems = []
    for name in sorted(set(spark_types) & set(arrow_types)):
        if spark_types[name] != arrow_types[name]:
            problems.append(
                f"column {name}: arrow-level type divergence "
                f"spark={spark_types[name]} oracle={arrow_types[name]}"
            )
    return problems


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
    spark_df = q.fn(spark, sf_dir)
    spark_pdf = spark_df.toPandas()
    if q.oracle is None:
        return [] if len(spark_pdf) >= 0 else ["no rows"]
    oracle_tbl = run_oracle_arrow(q.oracle, sf_dir)
    return compare_arrow_types(spark_df.schema, oracle_tbl.schema) + compare_frames(
        spark_pdf, run_oracle(q.oracle, sf_dir)
    )


def _is_nan(v) -> bool:
    return isinstance(v, float) and math.isnan(v)
