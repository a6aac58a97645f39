"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; IVF-style bucketed
assignment is the scale path (search only the best cluster's bucket).

Portability discipline for the DuckDB oracles: all dot products are
expanded to an explicit left-associative 64-term sum over
``element_at`` (1-based in both engines) with every operand cast to
double first — bit-identical IEEE evaluation order in both engines, so
even ranking comparisons are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot_expr(col: str, vec: list[float]) -> str:
    """Left-associative explicit dot-product SQL (portable)."""
    terms = [
        f"(cast(element_at({col}, {i + 1}) as double) * {v!r})" for i, v in enumerate(vec)
    ]
    return "(" + " + ".join(terms) + ")"


def _norm_expr(col: str, dim: int) -> str:
    terms = [
        f"(cast(element_at({col}, {i + 1}) as double) * cast(element_at({col}, {i + 1}) as double))"
        for i in range(dim)
    ]
    return "sqrt(" + " + ".join(terms) + ")"


def cosine_expr(col: str, vec: list[float]) -> str:
    qnorm = sum(v * v for v in vec) ** 0.5
    return f"({_dot_expr(col, vec)} / ({_norm_expr(col, len(vec))} * {qnorm!r}))"


def query_vector(embeddings: DataFrame, vec_id: int = 0) -> list[float]:
    row = embeddings.filter(F.col("vec_id") == vec_id).select("embedding").head()
    return [float(x) for x in row[0]]


def cosine_topk(embeddings: DataFrame, qvec: list[float], k: int = 10) -> DataFrame:
    """Brute-force cosine top-k: (vec_id, rank).  Deterministic
    tie-break on vec_id (exact-precision portable arithmetic makes even
    the ranking engine-identical).

    Scale shape: ``orderBy().limit(k)`` plans TakeOrderedAndProject — a
    distributed per-partition top-k merged on the driver — instead of a
    global unpartitioned window that would funnel every row through one
    task.  The row_number window that assigns ranks afterwards sees at
    most k rows (bounded by the limit, not by data size)."""
    scored = embeddings.withColumn("cos", F.expr(cosine_expr("embedding", qvec)))
    topk = scored.orderBy(F.col("cos").desc(), F.col("vec_id").asc()).limit(k)
    # constant partition key: input here is ≤k rows (post-limit), the
    # explicit partitionBy documents that and keeps plans warning-free
    w = Window.partitionBy(F.lit(0)).orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select("vec_id", "rank")
    )


def _cos_py(a: list[float], b: list[float]) -> float:
    dot = sum(x * y for x, y in zip(a, b))
    na = sum(x * x for x in a) ** 0.5
    nb = sum(y * y for y in b) ** 0.5
    return dot / (na * nb)


def probe_clusters(centroids: dict[int, list[float]], qvec: list[float], nprobe: int) -> list[int]:
    """Best-N clusters for a query — centroids are a driver-side literal
    dimension, so probe selection is plain arithmetic, not a Spark job."""
    return sorted(sorted(centroids), key=lambda c: (-_cos_py(centroids[c], qvec), c))[:nprobe]


# above this many centroids the CASE-cascade assignment plan (k×dim
# expression terms, copied through every Catalyst rule) is slower to
# PLAN than the data is to score — switch to the numpy broadcast path.
# Both paths are tie-break-identical (lowest centroid id).
IVF_BROADCAST_THRESHOLD = 256


def select_ivf_assign(
    embeddings: DataFrame,
    centroids: dict[int, list[float]],
    broadcast_threshold: int = IVF_BROADCAST_THRESHOLD,
) -> DataFrame:
    """Pick the IVF assignment strategy by codebook size: CASE cascade
    (DuckDB-oracle-portable, small plans) below the threshold, numpy
    broadcast scoring (constant-size plan) above it."""
    if len(centroids) > broadcast_threshold:
        return ivf_assign_broadcast(embeddings, centroids)
    return ivf_assign(embeddings, centroids)


def ivf_search(
    embeddings: DataFrame,
    centroids: dict[int, list[float]],
    qvec: list[float],
    k: int = 10,
    nprobe: int = 2,
    broadcast_threshold: int = IVF_BROADCAST_THRESHOLD,
) -> DataFrame:
    """IVF probe path: search only the best-``nprobe`` clusters' buckets.

    Scale shape: the cluster filter prunes the scan to nprobe/|C| of the
    data BEFORE any scoring; scoring + TakeOrderedAndProject top-k run
    only over the probed buckets.  At production scale the assignment is
    precomputed and the table is partitioned by cluster, so the filter
    becomes partition pruning.  Large codebooks auto-select the numpy
    broadcast assignment (constant-size plan)."""
    probes = probe_clusters(centroids, qvec, nprobe)
    assigned = select_ivf_assign(embeddings, centroids, broadcast_threshold)
    bucketed = embeddings.join(
        assigned.filter(F.col("cluster").isin(probes)), "vec_id", "left_semi"
    )
    scored = bucketed.withColumn("cos", F.expr(cosine_expr("embedding", qvec)))
    topk = scored.orderBy(F.col("cos").desc(), F.col("vec_id").asc()).limit(k)
    w = Window.partitionBy(F.lit(0)).orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return topk.withColumn("rank", F.row_number().over(w)).select("vec_id", "rank")


def _pair_cos_expr(dim: int) -> str:
    """Portable cosine between two embedding columns ``a_emb``/``b_emb``
    (explicit left-associative sums, like cosine_expr)."""
    dot = " + ".join(
        f"(cast(element_at(a_emb, {i + 1}) as double) * cast(element_at(b_emb, {i + 1}) as double))"
        for i in range(dim)
    )
    na = " + ".join(
        f"(cast(element_at(a_emb, {i + 1}) as double) * cast(element_at(a_emb, {i + 1}) as double))"
        for i in range(dim)
    )
    nb = " + ".join(
        f"(cast(element_at(b_emb, {i + 1}) as double) * cast(element_at(b_emb, {i + 1}) as double))"
        for i in range(dim)
    )
    return f"(({dot}) / (sqrt({na}) * sqrt({nb})))"


def embedding_neardup_pairs(
    embeddings: DataFrame,
    centroids: dict[int, list[float]],
    dim: int = 64,
    threshold: float = 0.95,
    broadcast_threshold: int = IVF_BROADCAST_THRESHOLD,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, IVF-bucketed.

    Scale shape: candidate pairs are generated ONLY within an IVF
    cluster (the ANN blocking step — near-duplicates land in the same
    cluster for thresholds near 1), so the join is per-bucket quadratic,
    never corpus-quadratic; the shuffle partitions by cluster.  Exact
    cosine is then verified per candidate pair (no false positives;
    recall bounded by the blocking like any LSH-family dedup)."""
    # materialize the (vec_id, cluster) assignment before the self-join:
    # the assignment expression is an ~8×dim-term CASE cascade, and
    # inlining it into BOTH join sides makes Catalyst copy a multi-
    # thousand-node expression tree through every optimizer rule (driver
    # memory blowup observed at default heap).  The assignment table
    # itself is two columns — checkpointing it costs one tiny job and
    # keeps the join plan linear in dim.
    assigned = select_ivf_assign(
        embeddings, centroids, broadcast_threshold
    ).localCheckpoint(eager=False)
    side = embeddings.join(assigned, "vec_id")
    a = side.select(
        F.col("cluster"), F.col("vec_id").alias("vec_a"), F.col("embedding").alias("a_emb")
    )
    b = side.select(
        F.col("cluster"), F.col("vec_id").alias("vec_b"), F.col("embedding").alias("b_emb")
    )
    pairs = a.join(b, "cluster").filter(F.col("vec_a") < F.col("vec_b"))
    return (
        pairs.withColumn("cos", F.expr(_pair_cos_expr(dim)))
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", "cos")
    )


def ivf_assign_broadcast(
    embeddings: DataFrame, centroids: dict[int, list[float]]
) -> DataFrame:
    """Production IVF assignment for LARGE codebooks: the centroid
    matrix ships to executors inside the Arrow-batched function closure
    (broadcast semantics) and scoring is one numpy matmul per batch —
    no k×dim Catalyst expression tree, so k≫1000 codebooks plan in
    constant size.  Ties break to the lowest centroid id like
    ``ivf_assign`` (np.argmax returns the first maximum over the
    id-sorted matrix).

    ``ivf_assign`` (the CASE-cascade twin) stays the small-codebook /
    DuckDB-oracle-portable variant; this is the scale path."""
    import numpy as np

    ids = sorted(centroids)
    cmat = np.array([centroids[i] for i in ids], dtype=np.float64)
    cmat = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
    id_arr = np.array(ids, dtype=np.int64)

    def score(batches):
        import pandas as pd

        for pdf in batches:
            emb = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            # clamp zero-norm vectors: NaN similarities would make
            # argmax silently pick centroid ids[0], diverging from the
            # CASE-cascade twin this function is documented to match
            norms = np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-300)
            sims = (emb / norms) @ cmat.T
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].values,
                    "cluster": id_arr[np.argmax(sims, axis=1)].astype("int32"),
                }
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        score, "vec_id long, cluster int"
    )


def ivf_assign(embeddings: DataFrame, centroids: dict[int, list[float]]) -> DataFrame:
    """IVF bucket assignment: nearest centroid by cosine (argmax via a
    portable greatest/CASE cascade).  At scale, queries probe only their
    bucket — the shuffle partitions by cluster.  For codebooks beyond a
    few hundred centroids use ``ivf_assign_broadcast`` (numpy scoring,
    constant-size plan).

    The per-centroid cosine columns are computed in their OWN persisted
    stage and the argmax CASE references them as plain column refs.
    Without the barrier, CollapseProject inlines every k×dim-term cosine
    into each of the k·(k-1) cascade comparisons and the single
    generated method blows past Janino's limits: whole-stage codegen
    then FAILS (slowly — multi-second compile attempt, re-paid for
    every fresh plan because the codegen cache keys on source text with
    new expression ids) and falls back to interpreted eval.  Measured
    round 6 on ivf_search: 11.4 s → 0.94 s, identical rows.  The
    cached stage is (vec_id, k cosines) — linear in N, and codebooks
    past IVF_BROADCAST_THRESHOLD use the numpy path anyway."""
    cid_sorted = sorted(centroids)
    cos_cols = [
        F.expr(cosine_expr("embedding", centroids[cid])).alias(f"c{cid}")
        for cid in cid_sorted
    ]
    scored = embeddings.select("vec_id", *cos_cols).persist()
    best = None
    for cid in cid_sorted:
        # ≥ vs later ids, strict > vs earlier ids → ties go to the
        # lowest centroid id, deterministically
        conds = [
            (F.col(f"c{cid}") >= F.col(f"c{other}")) if cid < other else (F.col(f"c{cid}") > F.col(f"c{other}"))
            for other in cid_sorted
            if other != cid
        ]
        allc = conds[0]
        for c in conds[1:]:
            allc = allc & c
        best = F.when(allc, F.lit(cid)) if best is None else best.when(allc, F.lit(cid))
    return scored.select("vec_id", best.alias("cluster"))
