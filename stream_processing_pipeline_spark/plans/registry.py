"""Query registry.

A :class:`Query` couples a Spark implementation with an equivalent DuckDB
oracle SQL string (ANSI SQL over the pre-registered fixture views). Column
names are part of the contract: the correctness harness sorts columns by name
and hash-compares values, so Spark aliases and SQL ``AS`` names must agree.

Queries without an oracle (``oracle=None``) are genuinely non-SQL-expressible
(custom stateful streaming, approximate/iterative algorithms) and get a
weaker rows-only check — kept to a minimum by design.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

__all__ = ["Query", "REGISTRY", "register", "all_queries", "all_oracles"]

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    description: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name, fn, oracle, description or (fn.__doc__ or ""), tags)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
