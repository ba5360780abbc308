"""Engine-portable deterministic hashing.

``h60(expr)`` maps any string expression to a 60-bit non-negative int64 by
parsing the first 15 hex chars of its md5. md5 is available and identical in
Spark, DuckDB, and Python, which makes every hash-derived operator (exact
dedup keys, MinHash signatures, SimHash bit votes, LSH bucket ids, document
fingerprints) verifiable against an independent SQL oracle — unlike
``xxhash64``/``hash`` whose implementations are engine-private.

Used at scale: md5 is ~2x slower than xxhash64 per row but both are memory-
bandwidth-bound inside whole-stage codegen; hashing is never the bottleneck
next to the shuffle it feeds.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["h60", "h60_sql", "stable_bucket", "stable_bucket_sql"]


def h60(col: Column | str) -> Column:
    """60-bit stable hash of a string column (non-negative int64)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    """DuckDB twin of :func:`h60` (byte-identical results)."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def stable_bucket(col: Column | str, n_buckets: int, salt: str = "") -> Column:
    """Deterministic bucket id in ``[0, n_buckets)`` for partitioning/blocking."""
    c = F.col(col) if isinstance(col, str) else col
    salted = F.concat(F.lit(salt), c.cast("string")) if salt else c.cast("string")
    return (h60(salted) % F.lit(n_buckets)).cast("int")


def stable_bucket_sql(expr: str, n_buckets: int, salt: str = "") -> str:
    salted = f"concat('{salt}', CAST({expr} AS VARCHAR))" if salt else f"CAST({expr} AS VARCHAR)"
    return f"CAST({h60_sql(salted)} % {n_buckets} AS INTEGER)"
