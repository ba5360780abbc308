"""Query plans: the engine's registered query set.

Every query is a named pair (Spark callable, DuckDB oracle SQL) registered in
:mod:`.registry`; the driver contract (``__spark_entry__.py``) exposes them
verbatim. Modules:

- :mod:`.parity`     — the six reference queries (SURVEY.md §2.10) mapped onto
  the synthetic ``events`` star schema
- :mod:`.batch`      — batch analytics widening the operator surface: TPC-H-
  style aggregation/join/top-k, analytic window functions, set ops
- :mod:`.dedupq`     — deduplication suite over ``documents``
- :mod:`.textq`      — text-analysis suite over ``documents``
- :mod:`.similarq`   — embedding similarity search over ``embeddings``
- :mod:`.multimodalq`— multimodal binary-column plumbing queries
"""

from .registry import REGISTRY, Query, all_oracles, all_queries, register

from . import parity  # noqa: E402,F401  (imports populate the registry)
from . import batch  # noqa: E402,F401
from . import streamq  # noqa: E402,F401
from . import dedupq  # noqa: E402,F401
from . import textq  # noqa: E402,F401
from . import similarq  # noqa: E402,F401
from . import multimodalq  # noqa: E402,F401

__all__ = ["REGISTRY", "Query", "register", "all_queries", "all_oracles"]
