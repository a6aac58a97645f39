"""RF2 snapshot scans + input-subset handling (SURVEY.md §2.1 S2-S5).

S2  snapshot scan with loading profile — the reference streams zipped
    TSVs with per-row callbacks that drop inactive rows at scan time
    (RF2ExtractionService.java:27-42); here ``active == '1'`` is a
    DataFrame filter that Catalyst pushes into the CSV scan.
S3  relationship-only light profile: active inferred IS-A rows as
    (parent, child) pairs (RF2ExtractionService.java:44-55,
    RelationshipComponentFactory.java:18-23).
S4  input-subset parse: newline SCTIDs, ``<<`` descendants flag,
    ``|term|`` comments (tools/InputSignatureHandler.java:59-176).
S5  subset descendants expansion = frontier semi-join over the
    (parent, child) pairs (InputSignatureHandler.java:178-266) — the
    same kernel as the closure (subont.closure.transitive_closure).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .closure import transitive_closure
from .model import IS_A

INFERRED = 900000000000011006
STATED = 900000000000010007


def read_rf2_tsv(spark: SparkSession, path: str, active_only: bool = True) -> DataFrame:
    """S2: one RF2 snapshot TSV → DataFrame.  The active filter reaches
    the scan via predicate pushdown (verified in tests/test_plans.py)."""
    # RF2 is raw tab-split: fields are never quoted and may legitimately
    # contain double quotes (Description terms).  Disable quote handling
    # (quote=NUL) so '"' passes through verbatim, matching the
    # reference's line.split("\t") semantics.
    df = (
        spark.read.option("sep", "\t")
        .option("header", True)
        .option("inferSchema", False)
        .option("quote", "\u0000")
        .csv(path)
    )
    if active_only and "active" in df.columns:
        df = df.filter(F.col("active") == "1")
    return df


def isa_pairs_from_relationships(rels: DataFrame, characteristic: int = INFERRED) -> DataFrame:
    """S3: light profile — (parent, child) from active IS-A rows."""
    return (
        rels.filter(
            (F.col("active") == "1")
            & (F.col("typeId") == str(IS_A))
            & (F.col("characteristicTypeId") == str(characteristic))
        )
        .select(
            F.col("destinationId").cast("long").alias("parent"),
            F.col("sourceId").cast("long").alias("child"),
        )
        .distinct()
    )


_SUBSET_LINE = re.compile(r"^\s*(<<)?\s*(\d+)\s*(?:\|[^|]*\|)?\s*$")


def parse_subset_text(text: str) -> list[tuple[int, bool]]:
    """S4: subset file body → [(concept_id, with_descendants)].
    Tolerates blank lines, whitespace, |term| comments and the ``<<``
    descendants marker, like InputSignatureHandler.java:120-176."""
    out = []
    for line in text.splitlines():
        if not line.strip():
            continue
        m = _SUBSET_LINE.match(line)
        if not m:
            raise ValueError(f"bad subset line: {line!r}")
        out.append((int(m.group(2)), m.group(1) is not None))
    return out


def parse_subset_json(text: str) -> list[tuple[int, bool]]:
    """S4 ``.json`` variant (InputSignatureHandler.readRefsetJson,
    tools/InputSignatureHandler.java:81-96): the FIRST line is skipped
    (header), every following non-blank line is one concept id verbatim;
    no ``<<`` descendants flag in this format."""
    out = []
    for line in text.splitlines()[1:]:
        line = line.strip()
        if not line:
            continue
        out.append((int(line), False))
    return out


def load_subset(spark: SparkSession, path: str) -> DataFrame:
    with open(path, encoding="utf-8") as f:
        text = f.read()
    rows = parse_subset_json(text) if path.endswith(".json") else parse_subset_text(text)
    return spark.createDataFrame(rows, "concept_id long, with_descendants boolean")


def expand_subset(subset: DataFrame, isa_pairs: DataFrame) -> DataFrame:
    """S5: add all descendants of ``<<``-flagged concepts.  Uses the
    shared closure kernel on the (child→parent) edges restricted by a
    frontier — at SNOMED scale this is a handful of semi-join rounds."""
    plain = subset.select("concept_id")
    roots = subset.filter(F.col("with_descendants")).select("concept_id")
    if roots.isEmpty():
        return plain.distinct()
    edges = isa_pairs.select(F.col("child"), F.col("parent"))
    closure = transitive_closure(edges)
    descendants = (
        closure.join(roots.withColumnRenamed("concept_id", "anc"), "anc", "left_semi")
        .select(F.col("desc").alias("concept_id"))
    )
    return plain.unionByName(descendants).distinct()
