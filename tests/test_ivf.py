"""IVF k-means invariants.

The trained pair (sim_ivf_assignments / sim_topk_ivf) is value-hash-verified
against a DuckDB oracle that replays the full integer-exact training loop in
SQL (plans/similarq._kmeans_cte), so these tests pin the *semantic* contract
the oracle replay alone would not catch if both sides drifted together:
assignments are truly nearest-centroid, centroids are truly member means,
training is reproducible, probes return true cosines.
"""

from __future__ import annotations

import numpy as np

from stream_processing_pipeline_spark.operators.similarity import (
    assign_clusters_static,
    kmeans_fit,
    topk_bruteforce,
    topk_ivf,
)

from .conftest import SF_MED


def _emb(spark):
    from stream_processing_pipeline_spark.plans.common import catalog

    return catalog(spark, SF_MED).embeddings


def test_kmeans_deterministic(spark):
    emb = _emb(spark)
    c1 = kmeans_fit(emb, k=8, iterations=3)
    c2 = kmeans_fit(emb, k=8, iterations=3)
    assert c1 == c2  # bit-identical training (pure integer arithmetic)


def test_assignments_are_nearest_centroid(spark):
    emb = _emb(spark)
    cents = kmeans_fit(emb, k=8, iterations=3)
    C = np.array([v for _, v in cents], dtype=np.int64)
    assigned = assign_clusters_static(emb, cents).toPandas()
    vecs = {
        r.vec_id: np.floor(np.array(r.embedding, dtype=np.float64) * 1e6 + 0.5).astype(
            np.int64
        )
        for r in emb.collect()
    }
    for _, row in assigned.sample(n=100, random_state=7).iterrows():
        d2 = ((C - vecs[row.vec_id]) ** 2).sum(axis=1)
        assert d2.argmin() == row.cluster
        assert d2.min() == row.dist2  # exact integer distances


def test_centroids_are_member_means(spark):
    """Each final centroid is the floor-half-up integer mean of the members
    assigned under the penultimate centroids (the documented update rule)."""
    emb = _emb(spark)
    final = dict(kmeans_fit(emb, k=8, iterations=3))
    prev = kmeans_fit(emb, k=8, iterations=2)
    assigned = assign_clusters_static(emb, prev).toPandas()
    vecs = {
        r.vec_id: np.floor(np.array(r.embedding, dtype=np.float64) * 1e6 + 0.5).astype(
            np.int64
        )
        for r in emb.collect()
    }
    for c in range(8):
        members = [vecs[v] for v in assigned[assigned.cluster == c].vec_id]
        if not members:
            continue
        n = len(members)
        sums = np.array(members).sum(axis=0)
        expect = [(2 * int(s) + n) // (2 * n) for s in sums]
        assert expect == final[c], f"cluster {c}"


def test_ivf_topk_subset_of_bruteforce_scores(spark):
    """IVF results are true cosines (exact within probed clusters): every
    (query, neighbor, cosine) triple must appear in the brute-force scan."""
    emb = _emb(spark)
    cents = kmeans_fit(emb, k=8, iterations=3)
    queries = emb.filter("vec_id < 5")
    ivf = topk_ivf(emb, queries, cents, k=10, n_probe=2).toPandas()
    bf = topk_bruteforce(emb, queries, k=500).toPandas()
    bf_scores = {(r.query_id, r.neighbor_id): r.cosine for _, r in bf.iterrows()}
    assert len(ivf) == 50
    for _, r in ivf.iterrows():
        assert bf_scores.get((r.query_id, r.neighbor_id)) == r.cosine


def test_partitioned_index_prunes_probed_cells(spark, tmp_path):
    """The persisted-index shape topk_ivf's docstring promises at scale:
    write the corpus partitioned by assigned cell, and a probe that touches
    2 cells must PRUNE the others at the file-listing level (plan shows
    cluster in PartitionFilters, not as a post-scan Filter) while returning
    exactly the rows a full-scan filter would."""
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.operators.similarity import (
        seed_centroids_int,
    )

    emb = _emb(spark)
    cent = seed_centroids_int(emb, k=8)
    assigned = assign_clusters_static(emb, cent).join(emb, "vec_id")
    idx_path = str(tmp_path / "ivf_index")
    assigned.select("vec_id", "embedding", "cluster").write.partitionBy(
        "cluster"
    ).parquet(idx_path)

    index = spark.read.parquet(idx_path)
    probed = index.filter(F.col("cluster").isin(2, 5))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cluster" in plan.split("PartitionFilters")[1][:120]

    got = sorted(r.vec_id for r in probed.collect())
    want = sorted(
        r.vec_id
        for r in assigned.filter(F.col("cluster").isin(2, 5)).collect()
    )
    assert got == want and len(got) > 0


# ------------------------------------------------------------------ IVF-PQ


def test_ivfpq_code_properties(spark):
    """Independent numpy replay of the IVFADC encoding: cell is the argmin
    coarse centroid, codes are per-subspace argmins over the RESIDUAL, and
    distortion is the sum of the winning subspace distances. Also pins the
    honest fixture note in sim_ivfpq_codes' docstring: on these
    near-uniform vectors residual coding measures ~1.4x the distortion of
    plain PQ (no cluster structure for the coarse step to exploit) — the
    band below fails if either side of that documented trade drifts."""
    import pandas as pd

    from stream_processing_pipeline_spark.operators.similarity import (
        pq_codebooks_int,
        residual_codebooks_int,
        seed_centroids_int,
        with_ivfpq_codes,
        with_pq_codes,
    )

    emb = _emb(spark)
    cents = seed_centroids_int(emb, k=8)
    books = residual_codebooks_int(emb, cents, m=8, k=16)
    coded = with_ivfpq_codes(emb, cents, books).toPandas()

    C = np.array([v for _, v in cents], dtype=np.int64)
    vecs = {
        r.vec_id: np.floor(
            np.array(r.embedding, dtype=np.float64) * 1e6 + 0.5
        ).astype(np.int64)
        for r in emb.collect()
    }
    B = [np.array([cw for _, cw in cb], dtype=np.int64) for cb in books]
    for _, row in coded.sample(n=50, random_state=11).iterrows():
        v = vecs[row.vec_id]
        d2 = ((C - v) ** 2).sum(axis=1)
        assert d2.argmin() == row.cluster
        r = v - C[row.cluster]
        distortion = 0
        for j in range(8):
            sub = r[j * 8 : (j + 1) * 8]
            dj = ((B[j] - sub) ** 2).sum(axis=1)
            assert dj.argmin() == row[f"code_{j}"]
            distortion += int(dj.min())
        assert distortion == row.distortion

    plain = with_pq_codes(emb, pq_codebooks_int(emb, m=8, k=16)).toPandas()
    ratio = coded.distortion.mean() / plain.distortion.mean()
    assert 1.1 < ratio < 1.7  # documented fixture trade-off band


def test_ivfpq_probe_confined_to_probed_cells(spark):
    """Every neighbor an IVFADC probe returns lives in one of the query's
    n_probe nearest coarse cells — the pruning contract that makes the
    cell-partitioned coded index skip unprobed files at 100 TB."""
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.operators.similarity import (
        residual_codebooks_int,
        seed_centroids_int,
        topk_ivfpq_adc,
        with_ivfpq_codes,
    )

    emb = _emb(spark)
    cents = seed_centroids_int(emb, k=8)
    books = residual_codebooks_int(emb, cents, m=8, k=16)
    queries = emb.filter(F.col("vec_id") < 5)
    got = topk_ivfpq_adc(emb, queries, cents, books, k=10, n_probe=2).toPandas()
    assert len(got) == 50

    C = np.array([v for _, v in cents], dtype=np.int64)
    vecs = {
        r.vec_id: np.floor(
            np.array(r.embedding, dtype=np.float64) * 1e6 + 0.5
        ).astype(np.int64)
        for r in queries.collect()
    }
    cell_of = {
        r.vec_id: r.cluster
        for r in with_ivfpq_codes(emb, cents, books).collect()
    }
    for qid, grp in got.groupby("query_id"):
        d2 = ((C - vecs[qid]) ** 2).sum(axis=1)
        probed = set(np.argsort(d2, kind="stable")[:2].tolist())
        assert {cell_of[n] for n in grp.neighbor_id} <= probed
