"""Deterministic synthetic source-code corpus (BASELINE.json input_hint).

Schema: (repo, path, commit, lang, content, sha256) — the engine's
primary input shape ("Iceberg table of source-code repositories").  At
test/bench scale the table is synthesized *distributed and seed-free*
(pure hash functions of the row id — Date.now/rand would break resume),
with planted knowledge statements whose expected triple set is known by
construction:

    isa(C<i>_a<k>, C<j>)       subsumption mention (alias form)
    attr(C<i>, R<r>, C<j>)     attribute mention
    same(C<i>_a<k>, C<i>_a<m>) alias-equivalence mention

Skew is planted deliberately: 3 mega-repos hold ~30% of files
(FIXTURES.md §1), exercising the salted/AQE skew paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["java", "py", "md", "go", "rs", "ts", "c", "rb", "scala", "sql"]
FILLER = ["the", "fast", "key", "order", "sort", "table", "scan", "merge", "batch", "stream"]
FANOUT = 8          # is-a tree fanout: parent(c) = c // FANOUT
N_ALIASES = 3       # aliases per concept: C<i>_a0..a2
N_ROLES = 4


def concept_parent(c: int) -> int | None:
    return c // FANOUT if c >= FANOUT else None


def stmt_hash16(salt: str):
    """16-bit md5 hash of (file id, salt) — drives the planted-statement
    selection.  md5 + instr arithmetic so a DuckDB oracle can recompute
    the exact statement set (__spark_entry__.ORACLE_KG)."""
    from .textops import _hex4_to_int

    return F.expr(
        _hex4_to_int(f"substring(md5(concat('f', cast(id as string), '|{salt}')), 1, 4)")
    )


def synth_corpus(
    spark: SparkSession,
    n_files: int,
    n_concepts: int = 1000,
    statements_per_file: int = 3,
    filler_words: int = 8,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic corpus: every column a pure function of the file id.

    The statement-selection hashes (concept/kind/alias/role) are
    engine-portable md5 arithmetic; presentation-only columns (repo,
    path, filler) stay on the cheaper xxhash64."""
    df = spark.range(0, n_files, 1, partitions or spark.sparkContext.defaultParallelism)
    h = lambda salt: F.abs(F.xxhash64(F.col("id"), F.lit(salt)))  # noqa: E731
    repo_idx = h("repo") % 1000
    df = df.withColumn(
        "repo",
        F.when(repo_idx < 300, F.concat(F.lit("org/mega-"), (repo_idx % 3).cast("string")))
        .otherwise(F.concat(F.lit("org/repo-"), repo_idx.cast("string"))),
    )
    df = df.withColumn(
        "path",
        F.concat(
            F.lit("src/"),
            (h("dir") % 100).cast("string"),
            F.lit("/f"),
            F.col("id").cast("string"),
            F.lit("."),
            F.element_at(F.array(*[F.lit(x) for x in LANGS]), (h("lang") % len(LANGS) + 1).cast("int")),
        ),
    )
    df = df.withColumn("commit", F.substring(F.sha2(F.concat(F.lit("commit"), F.col("id").cast("string")), 256), 1, 40))
    df = df.withColumn(
        "lang", F.element_at(F.array(*[F.lit(x) for x in LANGS]), (h("lang") % len(LANGS) + 1).cast("int"))
    )

    # planted statements, deterministic per (file, slot) — portable hashes
    stmts = []
    for s in range(statements_per_file):
        c = stmt_hash16(f"c{s}") % n_concepts
        kind = stmt_hash16(f"k{s}") % 3
        alias = (stmt_hash16(f"a{s}") % N_ALIASES).cast("string")
        alias2 = ((stmt_hash16(f"a{s}") + 1) % N_ALIASES).cast("string")
        role = (stmt_hash16(f"r{s}") % N_ROLES).cast("string")
        tgt = (c * 7 + 13) % n_concepts
        parent = (c / FANOUT).cast("long")
        cs, ts = c.cast("string"), F.lit("")
        stmt = (
            F.when(
                (kind == 0) & (c >= FANOUT),
                F.concat(F.lit("isa(C"), cs, F.lit("_a"), alias, F.lit(", C"), parent.cast("string"), F.lit(")")),
            )
            .when(
                kind == 1,
                F.concat(F.lit("attr(C"), cs, F.lit(", R"), role, F.lit(", C"), tgt.cast("string"), F.lit(")")),
            )
            .when(
                kind == 2,
                F.concat(F.lit("same(C"), cs, F.lit("_a"), alias, F.lit(", C"), cs, F.lit("_a"), alias2, F.lit(")")),
            )
            .otherwise(F.concat(F.lit("mention C"), cs))
        )
        stmts.append(stmt)
    # bulk filler: a repeated word block sized by a per-file hash — cheap
    # to generate but realistic content volume for the extraction scan
    word = F.element_at(F.array(*[F.lit(x) for x in FILLER]), (h("wsel") % len(FILLER) + 1).cast("int"))
    filler = F.concat_ws(
        " ",
        F.array_repeat(word, (h("wlen") % filler_words + filler_words // 2 + 1).cast("int")),
    )
    df = df.withColumn("content", F.concat_ws(" ", filler, F.concat_ws(" ; ", *stmts)))
    df = df.withColumn("sha256", F.sha2(F.col("content"), 256))
    return df.select("repo", "path", "commit", "lang", "content", "sha256")


def repartition_for_scale(df: DataFrame, by: tuple[str, ...] = ("repo", "lang")) -> DataFrame:
    """Ingest-time range repartitioning on (repo, lang) — co-locates the
    per-repo joins and bounds mega-repo partition width (SURVEY.md §2.7)."""
    return df.repartitionByRange(*[F.col(c) for c in by])
