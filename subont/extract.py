"""Concept-mention detection + entity-link scoring (SURVEY.md §2.7).

The only Python execution in the corpus path, and it is Arrow-vectorized
end-to-end (BASELINE.json input_hint: "no per-row Python"): a
``mapInPandas`` pass runs pandas ``str.extractall`` over whole record
batches, emitting one row per detected statement.  Everything downstream
is JVM-side DataFrame ops.

Statement grammar (see subont.corpus):
    isa(<ent>, <ent>)  |  attr(<ent>, R<k>, <ent>)  |  same(<ent>, <ent>)
where <ent> = C<i> (canonical) or C<i>_a<k> (alias surface form).

Entity-link scoring: canonical mention → 1.0; alias form → 0.9; the
caller thresholds.  (A real linker would score lexical context — the
plumbing, batching and schema here are the scale-relevant parts.)
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql import functions as F

STATEMENT_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("stype", T.StringType(), False),   # isa | attr | same
        T.StructField("arg1", T.StringType(), False),
        T.StructField("role", T.StringType(), True),     # attr only
        T.StructField("arg2", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

_STMT_RE = re.compile(
    r"(?P<stype>isa|attr|same)\((?P<arg1>C\d+(?:_a\d+)?)"
    r"(?:,\s*(?P<role>R\d+))?,\s*(?P<arg2>C\d+(?:_a\d+)?)\)"
)


def _make_statement_scan():
    """Build the mapInPandas scan function.  The scan and everything it
    references are serialized BY VALUE (nested defs + captured locals,
    no module-level function references): the executor python workers
    need pandas but NOT the subont package, so the UDF runs even when
    the SparkSession predates the import / no --py-files shipped the
    package.  tests/test_pickle_by_value.py unpickles it with subont
    unimportable."""
    stmt_re = _STMT_RE

    def _link_score(ent: pd.Series) -> pd.Series:
        # canonical surface form scores 1.0, alias forms 0.9
        return pd.Series(1.0, index=ent.index).where(~ent.str.contains("_a"), 0.9)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = pdf["content"].str.extractall(stmt_re)
            if m.empty:
                continue
            m = m.reset_index(level=1, drop=True)
            out = pdf.loc[m.index, ["repo", "path", "commit"]].copy()
            out["stype"] = m["stype"].values
            out["arg1"] = m["arg1"].values
            out["role"] = m["role"].values
            out["arg2"] = m["arg2"].values
            out["score"] = (
                (_link_score(m["arg1"]) + _link_score(m["arg2"])) / 2.0
            ).values
            yield out

    return scan


def extract_statements(src: DataFrame, min_score: float = 0.5) -> DataFrame:
    """mapInPandas batch extraction: (repo,path,commit,lang,content) →
    statement rows.  Batches stay in Arrow; regex runs vectorized.

    Only the four columns the scan reads are passed through the Python
    boundary (guide §4.1: Spark cannot see which columns an opaque
    function touches — an explicit select is what lets column pruning
    reach the source scan, and keeps unused payload columns like sha256
    out of the Arrow transpose)."""
    stmts = src.select("repo", "path", "commit", "content").mapInPandas(
        _make_statement_scan(), STATEMENT_SCHEMA
    )
    return stmts.filter(F.col("score") >= F.lit(min_score))


def entity_tokens(statements: DataFrame) -> DataFrame:
    """Distinct entity surface forms appearing in any statement."""
    return (
        statements.select(F.col("arg1").alias("ent"))
        .unionByName(statements.select(F.col("arg2").alias("ent")))
        .distinct()
    )
