"""LSH bucketing invariants: dimension parameterization and content-blocked
embedding dedup (round-2 hardening — the dim=64 hard-code regression and the
label-vs-content blocking finding from VERDICT.md)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream_processing_pipeline_spark.operators.similarity import (
    cosine_pairs,
    hyperplanes,
    with_lsh_bucket,
)
from stream_processing_pipeline_spark.plans.common import catalog

from .conftest import SF_SMALL


def _py_bucket(vec: list[float], n_planes: int, dim: int) -> int:
    planes = hyperplanes(n_planes, dim)
    bucket = 0
    for p, plane in enumerate(planes):
        acc = 0.0
        for x, w in zip(vec, plane):
            acc += float(x) * w
        if acc > 0:
            bucket |= 1 << p
    return bucket


@pytest.mark.parametrize("dim", [8, 16, 100])
def test_lsh_bucket_non_64_dims(spark, dim):
    """Buckets must be computed against hyperplanes of the *vector's*
    dimension — a plane/vector length mismatch null-pads the zip_with fold
    and silently degenerates every bucket (the round-1 dim=64 hard-code)."""
    vecs = [
        (i, [((i * 31 + d * 7) % 19 - 9) / 9.0 for d in range(dim)])
        for i in range(20)
    ]
    df = spark.createDataFrame(vecs, "vec_id: long, embedding: array<double>")
    got = {
        r.vec_id: r.bucket
        for r in with_lsh_bucket(df, n_planes=4, dim=dim).collect()
    }
    want = {i: _py_bucket(v, 4, dim) for i, v in vecs}
    assert got == want
    assert len(set(got.values())) > 1, "degenerate bucketing (all equal)"


def test_lsh_bucket_dim_mismatch_degenerates(spark):
    """Documents the failure mode the dim parameter exists to avoid: planes
    longer than the vectors null out the fold and every bucket collapses."""
    df = spark.createDataFrame(
        [(i, [float(i + d) for d in range(8)]) for i in range(10)],
        "vec_id: long, embedding: array<double>",
    )
    buckets = {r.bucket for r in with_lsh_bucket(df, n_planes=4, dim=64).collect()}
    assert buckets == {0}


def test_embedding_cosine_lsh_pairs_subset_of_exact(spark):
    """Content-blocked pairs are exactly the all-pairs result restricted to
    bucket-equal pairs: a subset at the same threshold, found without the
    O(n^2) join. Recall on the near-uniform fixture is theory-bound
    ((1 - theta/pi)^4 at ~0.35-0.47 cosine => ~0.1-0.2); clustered real
    corpora sit far higher. The measured number lands in SCALING.md."""
    emb = catalog(spark, SF_SMALL).embeddings
    exact = {
        (r.vec_a, r.vec_b)
        for r in cosine_pairs(emb, threshold=0.35, block_col=None).collect()
    }
    blocked = {
        (r.vec_a, r.vec_b)
        for r in cosine_pairs(
            with_lsh_bucket(emb, n_planes=4), threshold=0.35, block_col="bucket"
        ).collect()
    }
    assert blocked <= exact
    if exact:
        recall = len(blocked) / len(exact)
        assert 0.0 <= recall <= 1.0


def test_int8_quantization_error_bound(spark):
    """Reconstruction error of symmetric int8 codes is bounded by half a
    quantization step per dimension (scale/254 with the 127-level grid),
    and codes stay in [-127, 127] — the invariants that make the 4x
    compression safe for ranking."""
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.operators.similarity import with_int8_codes
    from stream_processing_pipeline_spark.plans.common import catalog

    emb = catalog(spark, SF_SMALL).embeddings
    coded = with_int8_codes(emb)
    bounds = coded.select(
        F.array_min("codes").alias("lo"), F.array_max("codes").alias("hi")
    ).agg(F.min("lo").alias("lo"), F.max("hi").alias("hi")).first()
    assert -127 <= bounds.lo and bounds.hi <= 127

    # per-dim scales recomputed locally for the error check
    rows = emb.select("embedding").collect()
    dim = len(rows[0][0])
    scales = [
        max(max(abs(float(r[0][d])) for r in rows), 1e-12) for d in range(dim)
    ]
    codes = coded.select("embedding", "codes").collect()
    worst = 0.0
    for r in codes:
        for d in range(dim):
            recon = r.codes[d] * scales[d] / 127.0
            err = abs(float(r.embedding[d]) - recon)
            worst = max(worst, err / (scales[d] / 127.0))
    assert worst <= 0.5 + 1e-9  # half a step, up to float epsilon


def test_int8_topk_recall_vs_exact(spark):
    """Quantized ranking recovers most of the exact float top-10 — pins that
    int8 scoring is a usable ANN path, not just internally consistent."""
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.operators.similarity import (
        topk_bruteforce,
        topk_int8,
    )
    from stream_processing_pipeline_spark.plans.common import catalog

    emb = catalog(spark, SF_SMALL).embeddings
    queries = emb.filter(F.col("vec_id") < 3)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in topk_bruteforce(emb, queries, k=10).collect()
    }
    quant = {
        (r.query_id, r.neighbor_id) for r in topk_int8(emb, queries, k=10).collect()
    }
    recall = len(exact & quant) / len(exact)
    # int8 dot is unnormalized (no per-vector norm division), so it ranks
    # by dot product, not cosine; on the near-uniform fixture that still
    # recovers a solid majority of the cosine top-10.
    assert recall >= 0.5, recall


def test_pq_adc_recall_vs_exact(spark):
    """PQ-ADC recovers a nontrivial slice of the exact top-10 even on the
    worst-case near-uniform fixture (cf. the LSH story: recall on
    unstructured data is bounded by theory — measured 0.17 here vs 0.10
    single-probe LSH — while clustered production embeddings sit in the
    high-recall regime). The floor pins that the 32x-compressed path stays
    a usable candidate generator, with exact re-ranking downstream."""
    from pyspark.sql import functions as F

    from stream_processing_pipeline_spark.operators.similarity import (
        pq_codebooks_int,
        topk_bruteforce,
        topk_pq_adc,
    )
    from stream_processing_pipeline_spark.plans.common import catalog

    emb = catalog(spark, SF_SMALL).embeddings
    queries = emb.filter(F.col("vec_id") < 3)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in topk_bruteforce(emb, queries, k=10).collect()
    }
    books = pq_codebooks_int(emb, m=8, k=16)
    pq = {
        (r.query_id, r.neighbor_id)
        for r in topk_pq_adc(emb, queries, books, k=10).collect()
    }
    assert len(exact & pq) / len(exact) >= 0.1


def test_cosine_pairs_dense_equals_fold(spark):
    """The dense-matmul verify stage must be BIT-identical to the
    fold-expression reference on both blocking keys — the regression pin
    that lets the registered dedup queries use the fast path while the
    oracle stays the exact-arithmetic SQL."""
    from stream_processing_pipeline_spark.operators.similarity import (
        cosine_pairs,
        cosine_pairs_dense,
        with_lsh_bucket,
    )
    from stream_processing_pipeline_spark.plans.common import catalog

    from .conftest import SF_MED

    emb = catalog(spark, SF_MED).embeddings
    fold = sorted(map(tuple, cosine_pairs(emb, 0.35, "label").collect()))
    dense = sorted(map(tuple, cosine_pairs_dense(emb, 0.35, "label").collect()))
    assert fold == dense and len(fold) > 0

    bucketed = with_lsh_bucket(emb, n_planes=4)
    fold_b = sorted(map(tuple, cosine_pairs(bucketed, 0.35, "bucket").collect()))
    dense_b = sorted(
        map(tuple, cosine_pairs_dense(bucketed, 0.35, "bucket").collect())
    )
    assert fold_b == dense_b


def test_margin_mining_accept_rule_is_selective(spark):
    """The margin rule must actually discriminate on the fixture: some
    queries accepted, some rejected, and every accepted row satisfies both
    thresholds while every rejected row fails at least one."""
    from stream_processing_pipeline_spark.plans.registry import REGISTRY

    from .conftest import SF_MED

    rows = REGISTRY["sim_margin_mined_pairs"].fn(spark, SF_MED).collect()
    assert rows
    acc = [r for r in rows if r.accepted == 1]
    rej = [r for r in rows if r.accepted == 0]
    assert acc and rej, "thresholds must split the fixture"
    for r in acc:
        assert r.best_cos >= 0.32 and r.margin >= 0.024
    for r in rej:
        assert r.best_cos < 0.32 or r.margin < 0.024
    assert all(r.margin >= 0 for r in rows)
