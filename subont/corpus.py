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


def stmt_hash16(salt: str) -> str:
    """SQL text of the 16-bit md5 hash of (file id, salt) — drives the
    planted-statement selection.  md5 + instr arithmetic so a DuckDB
    oracle can recompute the exact statement set
    (__spark_entry__.ORACLE_KG)."""
    from .textops import _hex4_to_int

    return _hex4_to_int(f"substring(md5(concat('f', cast(id as string), '|{salt}')), 1, 4)")


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
    path, filler) stay on the cheaper xxhash64.

    The whole projection is assembled as TWO selectExpr strings (one
    parse each) instead of per-column Column-API calls: the previous
    withColumn/F.expr chain cost ~0.4 s of driver-side plan
    construction per call (~150 py4j round-trips), measured round 6 —
    pure setup latency on every bench sample and every test.  Output is
    row-identical (A/B exceptAll both ways on three param sets)."""
    df = spark.range(0, n_files, 1, partitions or spark.sparkContext.defaultParallelism)
    h = lambda salt: f"abs(xxhash64(id, '{salt}'))"  # noqa: E731
    langs_arr = "array(" + ", ".join(f"'{x}'" for x in LANGS) + ")"
    filler_arr = "array(" + ", ".join(f"'{x}'" for x in FILLER) + ")"
    repo_idx = f"({h('repo')} % 1000)"
    repo = (
        f"CASE WHEN {repo_idx} < 300 THEN concat('org/mega-', cast(({repo_idx} % 3) as string)) "
        f"ELSE concat('org/repo-', cast({repo_idx} as string)) END"
    )
    lang = f"element_at({langs_arr}, cast((({h('lang')} % {len(LANGS)}) + 1) as int))"
    path = f"concat('src/', cast(({h('dir')} % 100) as string), '/f', cast(id as string), '.', {lang})"
    commit = "substring(sha2(concat('commit', cast(id as string)), 256), 1, 40)"

    # planted statements, deterministic per (file, slot) — portable hashes
    stmts = []
    for s in range(statements_per_file):
        c = f"({stmt_hash16(f'c{s}')} % {n_concepts})"
        kind = f"({stmt_hash16(f'k{s}')} % 3)"
        alias = f"cast(({stmt_hash16(f'a{s}')} % {N_ALIASES}) as string)"
        alias2 = f"cast((({stmt_hash16(f'a{s}')} + 1) % {N_ALIASES}) as string)"
        role = f"cast(({stmt_hash16(f'r{s}')} % {N_ROLES}) as string)"
        tgt = f"((({c} * 7) + 13) % {n_concepts})"
        parent = f"cast(({c} / {FANOUT}) as bigint)"
        cs = f"cast({c} as string)"
        stmt = (
            f"CASE WHEN ({kind} = 0) AND ({c} >= {FANOUT}) THEN "
            f"concat('isa(C', {cs}, '_a', {alias}, ', C', cast({parent} as string), ')') "
            f"WHEN {kind} = 1 THEN concat('attr(C', {cs}, ', R', {role}, ', C', cast({tgt} as string), ')') "
            f"WHEN {kind} = 2 THEN concat('same(C', {cs}, '_a', {alias}, ', C', {cs}, '_a', {alias2}, ')') "
            f"ELSE concat('mention C', {cs}) END"
        )
        stmts.append(stmt)
    # bulk filler: a repeated word block sized by a per-file hash — cheap
    # to generate but realistic content volume for the extraction scan
    word = f"element_at({filler_arr}, cast((({h('wsel')} % {len(FILLER)}) + 1) as int))"
    rep_n = f"cast((({h('wlen')} % {filler_words}) + {filler_words // 2 + 1}) as int)"
    filler = f"concat_ws(' ', array_repeat({word}, {rep_n}))"
    content = f"concat_ws(' ', {filler}, concat_ws(' ; ', {', '.join(stmts)}))"
    df = df.selectExpr(
        f"{repo} AS repo", f"{path} AS path", f"{commit} AS commit",
        f"{lang} AS lang", f"{content} AS content",
    )
    return df.selectExpr("repo", "path", "commit", "lang", "content", "sha2(content, 256) AS sha256")


def repartition_for_scale(df: DataFrame, by: tuple[str, ...] = ("repo", "lang")) -> DataFrame:
    """Ingest-time range repartitioning on (repo, lang) — co-locates the
    per-repo joins and bounds mega-repo partition width (SURVEY.md §2.7)."""
    return df.repartitionByRange(*[F.col(c) for c in by])
