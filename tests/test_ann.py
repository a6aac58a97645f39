"""ANN operator tests beyond the driver-gate oracles: the production
(broadcast/numpy) IVF assignment path must agree with the portable
CASE-cascade path and must handle codebooks far beyond the expression-
tree limit."""

import math

import pyspark.sql.functions as F

from subont.ann import ivf_assign, ivf_assign_broadcast

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_broadcast_assign_matches_case_cascade(spark):
    centroids = {
        c: [round(math.cos((i + 1) * (c + 2)), 6) for i in range(64)] for c in range(4)
    }
    emb = _emb(spark)
    a = ivf_assign(emb, centroids)
    b = ivf_assign_broadcast(emb, centroids)
    diff = a.withColumnRenamed("cluster", "ca").join(
        b.withColumnRenamed("cluster", "cb"), "vec_id"
    ).filter(F.col("ca") != F.col("cb"))
    assert diff.isEmpty(), diff.take(5)
    assert b.count() == emb.count()


def test_broadcast_assign_large_codebook(spark):
    """k=512 centroids: the CASE cascade would be a ~512×64×512-term
    expression tree (Catalyst blowup); the broadcast path plans in
    constant size and assigns every row to a valid centroid id."""
    import numpy as np

    rng = np.random.default_rng(7)
    centroids = {c: rng.standard_normal(64).tolist() for c in range(512)}
    emb = _emb(spark)
    out = ivf_assign_broadcast(emb, centroids)
    assert out.count() == emb.count()
    stats = out.agg(F.min("cluster").alias("lo"), F.max("cluster").alias("hi")).head()
    assert 0 <= stats.lo and stats.hi <= 511
    # plan stays constant-size: no per-centroid expressions
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 20_000


def test_ivf_search_auto_selects_assignment(spark):
    """The probe search and near-dup blocking auto-select the numpy
    broadcast assignment above IVF_BROADCAST_THRESHOLD centroids; both
    strategies must return identical results on the same codebook."""
    from subont.ann import embedding_neardup_pairs, ivf_search, query_vector

    centroids = {
        c: [round(math.cos((i + 1) * (c + 2)), 6) for i in range(64)] for c in range(4)
    }
    emb = _emb(spark)
    q = query_vector(emb, 0)
    cascade = ivf_search(emb, centroids, q, k=8, broadcast_threshold=1000)
    bcast = ivf_search(emb, centroids, q, k=8, broadcast_threshold=0)
    assert [tuple(r) for r in cascade.orderBy("rank").collect()] == [
        tuple(r) for r in bcast.orderBy("rank").collect()
    ]

    p1 = embedding_neardup_pairs(emb, centroids, threshold=0.9, broadcast_threshold=1000)
    p2 = embedding_neardup_pairs(emb, centroids, threshold=0.9, broadcast_threshold=0)
    assert {(r.vec_a, r.vec_b) for r in p1.collect()} == {
        (r.vec_a, r.vec_b) for r in p2.collect()
    }
