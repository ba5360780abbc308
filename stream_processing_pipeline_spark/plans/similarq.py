"""Similarity-search query suite over ``embeddings`` (beyond-parity).

Brute-force exact top-k as the baseline, random-hyperplane LSH as the scale
path. Both oracle-verified: scores are bit-identical across engines (vector
kernels fold in DuckDB's order) and the LSH construction is deterministic
(hyperplanes seeded from the portable hash, inlined as literals on both
sides), so even the *approximate* result is reproducible and checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity_sql
from ..operators.similarity import (
    lsh_bucket_sql,
    topk_bruteforce,
    topk_lsh,
    topk_lsh_multiprobe,
    with_lsh_bucket,
)
from .common import catalog
from .registry import register

_N_QUERIES = 5  # vec_id < 5 are the query vectors
_K = 10
_N_PLANES = 4  # 16 buckets; ~n/16 candidates per probe

_COS = cosine_similarity_sql("c.embedding", "q.embedding")


@register(
    "sim_topk_bruteforce",
    oracle=f"""
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {_COS} AS cosine,
           CAST(row_number() OVER (
             PARTITION BY q.vec_id ORDER BY {_COS} DESC, c.vec_id
           ) AS INTEGER) AS rank
    FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
    WHERE q.vec_id < {_N_QUERIES}
    QUALIFY rank <= {_K}
    """,
    tags=("similarity", "brute-force"),
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for each query vector: broadcast query set x
    partitioned corpus -> ranked window. The exact baseline every ANN result
    is measured against."""
    emb = catalog(spark, sf_dir).embeddings
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    out = topk_bruteforce(emb, queries, k=_K)
    return out.withColumn("rank", F.col("rank").cast("int"))


@register(
    "sim_lsh_buckets",
    oracle=f"""
    SELECT vec_id, label, {lsh_bucket_sql('embedding', _N_PLANES)} AS bucket
    FROM embeddings
    """,
    tags=("similarity", "lsh"),
)
def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket assignment — the one-pass corpus
    partitioning that makes ANN probes bucket-local at 100 TB."""
    emb = catalog(spark, sf_dir).embeddings
    return with_lsh_bucket(emb, n_planes=_N_PLANES).select("vec_id", "label", "bucket")


@register(
    "sim_topk_lsh",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, {lsh_bucket_sql('embedding', _N_PLANES)} AS bucket
      FROM embeddings
    )
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {_COS} AS cosine,
           CAST(row_number() OVER (
             PARTITION BY q.vec_id ORDER BY {_COS} DESC, c.vec_id
           ) AS INTEGER) AS rank
    FROM b q JOIN b c ON c.bucket = q.bucket AND c.vec_id != q.vec_id
    WHERE q.vec_id < {_N_QUERIES}
    QUALIFY rank <= {_K}
    """,
    tags=("similarity", "lsh", "ann"),
)
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10: candidates restricted to the query's LSH bucket
    (~1/16 of the corpus per probe at 4 planes). Deterministic construction
    -> verifiable against the same algorithm in SQL.

    Recall is data-dependent: the fixture embeddings are near-uniform (max
    pairwise cosine ~0.47), so bucket-collision probability for a pair at
    angle theta is (1 - theta/pi)^4 ~= 0.13 — measured top-10 recall ~0.10
    matches that theory. On real clustered embeddings (near-dup pairs at
    cosine > 0.9) collision probability is > 0.8; add multi-probe (flip one
    plane bit per probe) to push recall higher at the same index."""
    emb = catalog(spark, sf_dir).embeddings
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    out = topk_lsh(emb, queries, k=_K, n_planes=_N_PLANES)
    return out.withColumn("rank", F.col("rank").cast("int"))


_PROBE_MASKS = [0] + [1 << p for p in range(_N_PLANES)]


@register(
    "sim_topk_lsh_multiprobe",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, {lsh_bucket_sql('embedding', _N_PLANES)} AS bucket
      FROM embeddings
    ),
    p AS (
      SELECT q.vec_id, q.embedding, xor(q.bucket, m.m) AS bucket
      FROM b q, (VALUES {', '.join(f'({m})' for m in _PROBE_MASKS)}) m(m)
      WHERE q.vec_id < {_N_QUERIES}
    )
    SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
           {cosine_similarity_sql('c.embedding', 'p.embedding')} AS cosine,
           CAST(row_number() OVER (
             PARTITION BY p.vec_id
             ORDER BY {cosine_similarity_sql('c.embedding', 'p.embedding')} DESC,
                      c.vec_id
           ) AS INTEGER) AS rank
    FROM p JOIN b c ON c.bucket = p.bucket AND c.vec_id != p.vec_id
    QUALIFY rank <= {_K}
    """,
    tags=("similarity", "lsh", "ann", "multi-probe"),
)
def sim_topk_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH top-10: each query also probes the 4 buckets one
    plane-flip away (5/16 of the corpus scanned vs 1/16 single-probe),
    recovering the neighbors that landed just across one hyperplane — the
    recall/cost dial for hyperplane LSH. Deterministic construction, so the
    approximate result is still oracle-verified value-for-value."""
    emb = catalog(spark, sf_dir).embeddings
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    out = topk_lsh_multiprobe(emb, queries, k=_K, n_planes=_N_PLANES)
    return out.withColumn("rank", F.col("rank").cast("int"))


@register(
    "sim_label_centroid_norms",
    oracle="""
    WITH ex AS (
      SELECT label, d,
             CAST(round(CAST(embedding[d] AS DOUBLE) * 1000000) AS BIGINT) AS x
      FROM embeddings, range(1, 65) t(d)
    ),
    dims AS (SELECT label, d, sum(x) AS s FROM ex GROUP BY label, d),
    sq AS (SELECT label, CAST(sum(s * s) AS BIGINT) AS sq_sum FROM dims GROUP BY label),
    counts AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label)
    SELECT counts.label, n,
           floor(sqrt(CAST(sq_sum AS DOUBLE)) / 1000000.0 / n * 1000000.0 + 0.5)
             / 1000000.0 AS centroid_norm
    FROM counts JOIN sq ON counts.label = sq.label
    """,
    tags=("similarity", "aggregation"),
)
def sim_label_centroid_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid magnitude — the vector-aggregation pattern (the
    IVF coarse-quantizer training step): element-wise sums across a grouped
    vector column. Components are scaled to exact integer micro-units before
    summing, so the two-level distributed aggregation (per-dim, then across
    dims) is order-independent — floating sums would not be."""
    emb = catalog(spark, sf_dir).embeddings
    ex = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("d", "x")
    ).select("label", "d", F.round(F.col("x") * 1000000).cast("long").alias("xs"))
    dims = ex.groupBy("label", "d").agg(F.sum("xs").alias("s"))
    per_label = dims.groupBy("label").agg(
        F.sum(F.col("s") * F.col("s")).alias("sq_sum")
    )
    counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    from ..functions.rounding import pround

    return counts.join(per_label, "label").select(
        "label",
        "n",
        pround(F.sqrt("sq_sum") / 1000000.0 / F.col("n"), 6).alias("centroid_norm"),
    )


_CENTROIDS: dict[tuple[int, str], list[list[float]]] = {}


def _trained_centroids(spark: SparkSession, sf_dir: str) -> list[list[float]]:
    """Train once per (session, fixture) — k-means is deterministic, so the
    cached index is exactly what retraining would produce (at scale this is
    the persisted IVF index, trained offline and reused by every probe)."""
    key = (id(spark), sf_dir)
    if key not in _CENTROIDS:
        from ..operators.similarity import kmeans_fit

        _CENTROIDS[key] = kmeans_fit(
            catalog(spark, sf_dir).embeddings, k=8, iterations=3
        )
    return _CENTROIDS[key]


@register(
    "sim_ivf_assignments",
    oracle=None,  # iterative k-means training — non-SQL-expressible; pinned
    # instead by invariant tests (tests/test_ivf.py): assignments are
    # nearest-centroid, centroids equal member means, training reproducible.
    tags=("similarity", "ivf", "iterative"),
)
def sim_ivf_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantizer: deterministic distributed Lloyd's k-means
    (k=8, 3 iterations, exact scaled-integer centroid updates) + nearest-
    centroid assignment of the corpus. The training step of the IVF index;
    reproducible run-to-run by construction."""
    from ..operators.similarity import assign_clusters

    emb = catalog(spark, sf_dir).embeddings
    out = assign_clusters(emb, _trained_centroids(spark, sf_dir))
    from ..functions.rounding import pround

    return out.select(
        "vec_id", "cluster", pround(F.col("dist2"), 6).alias("dist2")
    )


@register(
    "sim_topk_ivf",
    oracle=None,  # depends on the trained (iterative) index; invariant-tested
    tags=("similarity", "ivf", "ann"),
)
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe search: each query scans only its 2 nearest clusters
    (~k/4 of the corpus at k=8) — the ANN pattern that scales past LSH when
    the corpus clusters well. Exact re-ranking inside the probed clusters."""
    from ..operators.similarity import topk_ivf

    emb = catalog(spark, sf_dir).embeddings
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return topk_ivf(emb, queries, _trained_centroids(spark, sf_dir), k=_K, n_probe=2)
