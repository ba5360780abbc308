"""stream_processing_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the query and data-processing
capabilities of the reference pipeline ``lnynhi02/Stream-Processing-Pipeline``
(studied read-only at ``/root/reference``; see SURVEY.md).  The reference is a
single hard-coded streaming script (Kafka JSON -> parse/cast -> 6 concurrent
streaming queries -> JDBC sinks, ``/root/reference/src/spark_streaming.py``);
this package generalizes every one of its operators into a reusable library:

- :mod:`.session`   — SparkSession factory (cf. reference ``spark_streaming.py:27-35``)
- :mod:`.schema`    — declarative schema contracts: cast + empty-string->NULL
  normalization (cf. ``spark_streaming.py:92-111``)
- :mod:`.sources`   — batch/streaming sources: parquet/csv/json/kafka/memory + a
  named-table catalog over a fixture directory
- :mod:`.operators` — reusable relational + streaming operators (projections,
  filters, windowed conditional aggregations, broadcast dim joins) and the
  beyond-parity LLM-data-pipeline operators (dedup, similarity search, text
  analysis, multimodal columns)
- :mod:`.functions` — portable column-expression helpers (hashing, vectors,
  money-exact aggregation, event-time window flattening)
- :mod:`.plans`     — the query registry: the six reference queries re-expressed
  on the synthetic ``events`` table, TPC-H-style batch analytics, and the
  extension query suite; every query carries a DuckDB oracle SQL string
- :mod:`.streaming` — managed streaming topology: watermarks, foreachBatch
  sinks (JDBC/parquet/memory), alert hooks, checkpointed multi-query runner

Everything is built on the public PySpark DataFrame/SQL API; no code is copied
from the reference.
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
