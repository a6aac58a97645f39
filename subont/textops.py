"""Text-analysis + deduplication operators for training-data pipelines.

All operators are shaped for the driver's ``documents(doc_id, text,
lang, source, n_chars)`` table and have exact DuckDB SQL oracles in
``__spark_entry__.oracle_sql`` — every formula below is chosen to be
bit-reproducible across engines (md5 hex, integer arithmetic, IEEE
single-division doubles; never engine-specific hashing).

Scale notes: the pairwise Jaccard join is quadratic per blocking key and
exists as the small-scale exact baseline; MinHash-LSH banding is the
100 TB path (pairs only within hash buckets).  Tokenization runs in an
Arrow-vectorized mapInPandas pass (mention detection) or JVM-side
``split`` (counting/fingerprints) — no per-row Python anywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GAZETTEER = ["spark", "join", "merge", "window", "hash", "scan", "filter", "sort"]
STOPWORDS = ["the", "a"]
MINHASH_SEEDS = 4


def gazetteer_mentions(docs: DataFrame, gazetteer: list[str] | None = None) -> DataFrame:
    """Concept-mention detection over document text (the reference's
    new-engine mention operator, SURVEY.md §2.7).  Returns distinct
    (doc_id, mention).

    JVM-native (guide §4.1): token ∩ gazetteer is array_intersect over
    the distinct-token array — no Python boundary, no Arrow transpose;
    the only exchange left is the final distinct.  (The Arrow-vectorized
    mapInPandas mention path remains exercised by the statement
    extraction operator, subont.extract.)"""
    gaz = sorted(set(gazetteer or GAZETTEER))
    gaz_arr = F.array(*[F.lit(g) for g in gaz])
    return (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.explode(
                F.array_intersect(F.array_distinct(F.split(F.col("text"), " ")), gaz_arr)
            ).alias("mention"),
        )
        .distinct()
    )


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_distinct) — whitespace token counting."""
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Quality scoring: lexical-diversity and stopword ratios (single
    IEEE divisions → engine-exact)."""
    toks = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return docs.select(
        "doc_id",
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double")).alias(
            "diversity"
        ),
        (n_stop.cast("double") / F.size(toks).cast("double")).alias("stopword_ratio"),
    )


def lang_id(docs: DataFrame, threshold: float = 0.05) -> DataFrame:
    """Heuristic language ID: English stopword density."""
    toks = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    ratio = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast(
        "double"
    ) / F.size(toks).cast("double")
    return docs.select(
        "doc_id",
        F.when(ratio > F.lit(threshold), F.lit("en")).otherwise(F.lit("other")).alias(
            "predicted_lang"
        ),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 over the sorted distinct token set
    (order-normalized content hash)."""
    toks = F.array_sort(F.array_distinct(F.split(F.col("text"), " ")))
    return docs.select("doc_id", F.md5(F.concat_ws(" ", toks)).alias("fp"))


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Exact dedup: md5(text) hash-groupBy; keeper = min doc_id."""
    return (
        docs.select(F.md5(F.col("text")).alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n_dups"))
    )


def _doc_tokens(docs: DataFrame) -> DataFrame:
    # NOTE: no repartition here — a measured A/B (BENCH.md round 5)
    # showed widening the narrow bench scan costs more in shuffle than
    # the single-split map work saves; at production scale the scan is
    # already wide.  The quadratic hazard lives in the LSH bucket join
    # below, which is salted instead.
    return docs.select(
        "doc_id", F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("tok")
    )


def dedup_jaccard_pairs(docs: DataFrame, num: int = 4, den: int = 5) -> DataFrame:
    """Exact n-gram(1) Jaccard near-dup pairs with threshold num/den,
    tested in INTEGER arithmetic (den·|∩| ≥ num·|∪|) — no float
    comparison.  Blocked by lang.  Quadratic per block: the exact
    baseline; use MinHash-LSH at scale."""
    toks = _doc_tokens(docs).join(docs.select("doc_id", "lang"), "doc_id")
    a = toks.select(F.col("doc_id").alias("doc_a"), F.col("lang").alias("l"), "tok")
    b = toks.select(F.col("doc_id").alias("doc_b"), F.col("lang").alias("l"), "tok")
    inter = (
        a.join(b, ["l", "tok"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sizes = _doc_tokens(docs).groupBy("doc_id").agg(F.count("*").alias("sz"))
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn("uni", F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        .filter(F.col("inter") * F.lit(den) >= F.col("uni") * F.lit(num))
        .select("doc_a", "doc_b", "inter", "uni")
    )
    return out


def minhash_signatures(docs: DataFrame, k: int = MINHASH_SEEDS) -> DataFrame:
    """MinHash over the distinct token set: mh_i = min(md5('s<i>|'+tok))
    — md5-hex min is engine-portable (lexicographic on hex strings).

    Computed ROW-LOCALLY with higher-order array functions (guide §4.1):
    array_min over the transformed distinct-token array is exactly the
    per-doc min aggregate, with no explode, no shuffle and no
    aggregation exchange — the signature stage is a single map pass.
    (split() always yields ≥1 element, so every doc keeps a row, as in
    the explode+groupBy form.)"""
    toks = F.array_distinct(F.split(F.col("text"), " "))
    cols = [
        F.array_min(
            F.transform(toks, lambda t: F.md5(F.concat(F.lit(f"s{i}|"), t)))
        ).alias(f"mh{i}")
        for i in range(k)
    ]
    return docs.select("doc_id", *cols)


def minhash_lsh_pairs(docs: DataFrame, k: int = MINHASH_SEEDS, bands: int = 2) -> DataFrame:
    """LSH banding: candidate pairs sharing ≥1 band of the signature.
    This is the scale path for near-dup detection: pairs are generated
    only inside hash buckets (shuffle on band key, never all-pairs)."""
    sig = minhash_signatures(docs, k)
    rows_per_band = k // bands
    band_key = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows_per_band + j}") for j in range(rows_per_band)]
        band_key.append(F.md5(F.concat_ws("|", *cols)))
    # Each band-b row carries the EARLIER bands' keys: a pair that
    # collides in several bands is emitted only from its first colliding
    # band (kept iff no earlier band key matches), so the join output is
    # already the distinct pair set and the final distinct-exchange over
    # the (quadratic) pair volume — measured 15M pre-distinct rows at
    # sf0.1 — is gone entirely (guide §2.3/§2.4: dedup before the
    # shuffle, then remove the shuffle).  ONE JOIN PER BAND instead of a
    # single join over the banded union: the prior-key test becomes a
    # conjunction of SCALAR column inequalities instead of a per-row
    # zip_with/exists over prior arrays (~30M pre-filter rows each
    # allocated a boolean array; 1.34 s → 0.94 s measured at sf0.1,
    # output multiset-identical).
    #
    # SALTED bucket self-join.  A hot bucket (thousands of near-identical
    # docs sharing one band key — common in crawl data) explodes
    # quadratically inside a single shuffle partition: partitioning on
    # bkey alone cannot split it, and AQE's skew splitter only balances
    # join INPUT bytes, not join OUTPUT.  Classic triangle salting: each
    # doc gets a slice s = hash(doc_id) mod S; the left side is
    # replicated once per target slice and the join key gains the right
    # side's slice, so one bucket's pair explosion spreads over S
    # partitions.  Output is identical (every (x, y) pair still meets
    # exactly once, at slice(y)).  Explicit numPartitions keeps AQE from
    # re-coalescing the small pre-explosion inputs into one task.
    S = int(os.environ.get("SUBONT_LSH_SALT", "16"))
    n_out = docs.sparkSession.sparkContext.defaultParallelism
    slice_of = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(S)).cast("int")
    # the (doc_id, band keys, slice) projection is referenced by all
    # 2×bands join sides — persist it so the signature md5s are computed
    # ONCE per doc instead of once per side (linear, a few dozen bytes
    # per doc; at 100 TB this is the standard persisted-signature table)
    keyed = sig.select(
        "doc_id",
        *[band_key[b].alias(f"bk{b}") for b in range(bands)],
        slice_of.alias("sb0"),
    ).persist()
    out = None
    for b in range(bands):
        a = (
            keyed.select(
                F.col("doc_id").alias("doc_a"),
                F.col(f"bk{b}").alias("bkey"),
                *[F.col(f"bk{p}").alias(f"pk{p}_a") for p in range(b)],
            )
            .withColumn("sb", F.explode(F.array(*[F.lit(i) for i in range(S)])))
            .repartition(n_out, "bkey", "sb")
        )
        b2 = keyed.select(
            F.col("doc_id").alias("doc_b"),
            F.col(f"bk{b}").alias("bkey"),
            *[F.col(f"bk{p}").alias(f"pk{p}_b") for p in range(b)],
            F.col("sb0").alias("sb"),
        ).repartition(n_out, "bkey", "sb")
        j = a.join(b2, ["bkey", "sb"]).filter(F.col("doc_a") < F.col("doc_b"))
        for p in range(b):
            j = j.filter(F.col(f"pk{p}_a") != F.col(f"pk{p}_b"))
        j = j.select("doc_a", "doc_b")
        out = j if out is None else out.unionByName(j)
    return out


def _hex4_to_int(col_expr: str) -> str:
    """Portable hex→int for a 4-char hex column expression: identical
    SQL math in Spark and DuckDB (instr/strpos both 1-based)."""
    terms = []
    for i in range(1, 5):
        terms.append(
            f"(instr('0123456789abcdef', substring({col_expr}, {i}, 1)) - 1) * {16 ** (4 - i)}"
        )
    return "(" + " + ".join(terms) + ")"


def simhash16(docs: DataFrame) -> DataFrame:
    """16-bit SimHash over distinct tokens: per-token value = first 16
    bits of md5; bit j of the sketch is set iff more tokens have bit j
    set than unset.  Pure integer arithmetic → portable.

    ROW-LOCAL form (guide §4.1): the per-doc bit-sum aggregate is
    b_j = 2·|{tokens with bit j set}| − n over the distinct-token array,
    so one transform to the 16-bit hash values plus 16 size(filter(..))
    terms replaces the explode + 16-sum aggregation exchange — a single
    map pass, no shuffle."""
    toks_sql = "array_distinct(split(text, ' '))"
    hv_sql = f"transform({toks_sql}, t -> {_hex4_to_int('substring(md5(t), 1, 4)')})"
    n_sql = f"size({toks_sql})"
    terms = []
    for j in range(16):
        cnt = f"size(filter(__hv, v -> ((v >> {j}) & 1) = 1))"
        # b_j > 0  ⟺  2*cnt - n > 0
        terms.append(f"(CASE WHEN 2 * {cnt} - __n > 0 THEN {2 ** j} ELSE 0 END)")
    sim_sql = " + ".join(terms)
    return (
        docs.select(
            "doc_id",
            F.expr(hv_sql).alias("__hv"),
            F.expr(n_sql).alias("__n"),
        )
        .select("doc_id", F.expr(f"cast(({sim_sql}) as bigint)").alias("simhash"))
    )
