"""Declarative schema contracts: wire schema -> typed schema.

Generalizes the reference's two-phase typing (SURVEY.md §1.2): all fields
arrive as strings off the wire (``/root/reference/src/spark_streaming.py:
60-80``), then each column is cast with an empty-string->NULL normalization
rule, renamed to snake_case, or dropped
(``/root/reference/src/spark_streaming.py:92-111``). Here that becomes a
data-driven contract compiled to Column expressions — one ``select`` (a single
Catalyst Project node), no UDFs, fully codegen'd.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

__all__ = ["ColumnRule", "SchemaContract"]


@dataclass(frozen=True)
class ColumnRule:
    """How one wire column becomes one typed column.

    - ``source``: wire column name (e.g. ``VendorID``)
    - ``name``: typed output name (e.g. ``vendor_id``); defaults to ``source``
    - ``dtype``: Spark SQL type string (``int``, ``double``, ``timestamp`` ...)
    - ``null_sentinels``: wire values normalized to NULL before the cast
      (the reference uses the empty string,
      ``/root/reference/src/spark_streaming.py:92``)
    - ``ts_format``: optional ``to_timestamp`` format for timestamp targets
    """

    source: str
    dtype: str = "string"
    name: str | None = None
    null_sentinels: tuple[str, ...] = ("",)
    ts_format: str | None = None

    @property
    def out_name(self) -> str:
        return self.name or self.source

    def expr(self) -> Column:
        c = F.col(self.source)
        if self.null_sentinels:
            cond = c.isin(*self.null_sentinels)
            c = F.when(cond, F.lit(None)).otherwise(F.col(self.source))
        if self.dtype in ("timestamp", "timestamp_ntz"):
            cast = (
                F.to_timestamp(c, self.ts_format) if self.ts_format else F.to_timestamp(c)
            )
        else:
            cast = c.cast(self.dtype)
        return cast.alias(self.out_name)


@dataclass
class SchemaContract:
    """An ordered set of :class:`ColumnRule` plus dropped wire columns.

    ``drop`` names wire columns intentionally excluded from the typed output
    (the reference silently drops ``store_and_fwd_flag``,
    ``/root/reference/src/spark_streaming.py:67`` vs ``:92-111``).
    """

    rules: list[ColumnRule] = field(default_factory=list)
    drop: tuple[str, ...] = ()

    def wire_schema(self) -> StructType:
        """All-string StructType for the wire format (JSON/CSV payloads)."""
        names = [r.source for r in self.rules] + list(self.drop)
        return StructType([StructField(n, StringType(), True) for n in names])

    def apply(self, df: DataFrame) -> DataFrame:
        """One Project node: cast + normalize + rename every contracted column."""
        return df.select(*[r.expr() for r in self.rules])

    def parse_json(self, df: DataFrame, payload_col: str = "value") -> DataFrame:
        """Kafka-style pipeline: binary payload -> JSON -> typed columns.

        Mirrors ``CAST(value AS STRING)`` + ``from_json`` + star-flatten
        (``/root/reference/src/spark_streaming.py:82-84``) followed by the
        typed projection, as a reusable operator.
        """
        parsed = df.select(
            F.from_json(F.col(payload_col).cast("string"), self.wire_schema()).alias("data")
        ).select("data.*")
        return self.apply(parsed)
