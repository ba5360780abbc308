"""Portable column-expression helpers.

Every helper here has an exact DuckDB-SQL twin (see the ``*_sql`` functions),
so queries built from them can be verified bit-for-bit against an independent
oracle. Determinism across engines is a design requirement at 100 TB scale:
distributed floating-point sums are order-dependent, so money aggregation goes
through exact integer cents, and hashing goes through md5 (stable everywhere)
rather than engine-private hash functions.
"""

from .hashing import h60, h60_sql, stable_bucket, stable_bucket_sql
from .money import (
    avg_money,
    avg_money_sql,
    cents,
    cents_sql,
    sum_money,
    sum_money_sql,
)
from .rounding import pround, pround_sql
from .vectors import cosine_similarity, cosine_similarity_sql, dot_product, l2_norm
from .windows import flatten_window, tumbling_window

__all__ = [
    "h60",
    "h60_sql",
    "stable_bucket",
    "stable_bucket_sql",
    "cents",
    "cents_sql",
    "avg_money",
    "sum_money",
    "avg_money_sql",
    "sum_money_sql",
    "pround",
    "pround_sql",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "cosine_similarity_sql",
    "flatten_window",
    "tumbling_window",
]
