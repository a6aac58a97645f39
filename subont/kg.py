"""Corpus → knowledge-graph triples, end to end (the north-rule pipeline).

Stages (each one a resumable DataFrame job; lineage recorded by
subont.lineage):

1. extract   — pandas-UDF statement/mention detection + link scoring
2. canon     — salted connected-components entity canonicalization
3. assemble  — canonical statements → concept table + stated IS-A edge
               table + attribute (PV-like) triples
4. closure   — semi-naive transitive closure of IS-A (subont.closure)
5. material  — RF2-style (subj, pred, obj, group) triple table:
               direct (non-redundant) IS-A rows — the NNF 'nearest
               parent' semantics of the reference
               (DefinitionGeneratorNNF.java:24-78) — plus attribute rows
               de-duplicated per (subj, role) to the most specific filler
               (eliminateWeakerClasses applied to fillers,
               OntologyReasoningService.java:143-157)

Entity ids: content hashes (xxhash64 of canonical surface form) — stable
across runs, partitions and resumes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .canon import canonical_map, canonicalize_statements, entity_id
from .closure import derive_direct_edges, transitive_closure
from .extract import extract_statements
from .model import IS_A
from .reduce import eliminate_weaker

MENTIONS_PRED = 900000000000999999  # synthetic "mentioned-in" predicate id


@dataclass
class KGResult:
    statements: DataFrame     # canonicalized statements
    concepts: DataFrame       # (concept_id, ent)
    isa_direct: DataFrame     # stated (child, parent) after canon
    isa_closure: DataFrame    # (desc, anc)
    triples: DataFrame        # (subj, pred, obj, rel_group)


def role_id(col):
    return F.xxhash64(F.concat(F.lit("role|"), col))


def build_kg(spark: SparkSession, src: DataFrame, min_score: float = 0.5) -> KGResult:
    # one materialization, not three: the extraction scan (the python
    # stage) is materialized once; the canonical map is broadcast-sized;
    # the canonicalized view is two broadcast joins over the stored
    # statements — re-evaluating it per consumer is cheaper than another
    # full materialization of the statement volume.
    #
    # Store choice: columnar persist (InMemoryRelation), NOT
    # localCheckpoint — the row-based checkpoint store of the fat
    # provenance strings was the measured anti-scaling cost (compressed
    # columnar is ~10× smaller to write and 4× faster to re-scan; at
    # cluster scale this is the same choice as caching the extraction
    # output serialized).
    from pyspark import StorageLevel

    stmts = extract_statements(src, min_score=min_score).persist(StorageLevel.MEMORY_AND_DISK)
    stmts.count()  # materialize eagerly (like the checkpoint it replaces)
    cmap = canonical_map(stmts).localCheckpoint(eager=False)
    canon = canonicalize_statements(stmts, cmap)

    # the concept dimension is broadcast-sized (distinct canonical
    # surface forms); materialize it ONCE — downstream name joins
    # (subject + object sides) otherwise re-derive the union+distinct
    # over the statement store per consumer
    concepts = (
        canon.select(F.col("arg1").alias("ent"))
        .unionByName(canon.select(F.col("arg2").alias("ent")))
        .distinct()
        .withColumn("concept_id", entity_id(F.col("ent")))
        .localCheckpoint(eager=False)
    )

    # the edge relation is the `hop` side of EVERY closure round and the
    # witness side of direct-edge derivation — checkpoint it once instead
    # of re-deriving (scan + 2 broadcast joins + distinct) per round
    isa_edges = (
        canon.filter(F.col("stype") == "isa")
        .select(entity_id(F.col("arg1")).alias("child"), entity_id(F.col("arg2")).alias("parent"))
        .filter(F.col("child") != F.col("parent"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    closure = transitive_closure(isa_edges)
    direct = derive_direct_edges(closure, edges=isa_edges)

    attr = (
        canon.filter(F.col("stype") == "attr")
        .select(
            entity_id(F.col("arg1")).alias("subj"),
            role_id(F.col("role")).alias("pred"),
            entity_id(F.col("arg2")).alias("obj"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    # most-specific filler per (subj, pred): antichain reduction over the
    # IS-A closure, the reference's PV redundancy elimination semantics
    attr_reduced = eliminate_weaker(
        attr.select(F.xxhash64("subj", "pred").alias("set_id"), F.col("obj").alias("cls"), "subj", "pred"),
        closure,
    ).select("subj", "pred", F.col("cls").alias("obj"))

    triples = (
        direct.select(
            F.col("child").alias("subj"),
            F.lit(IS_A).cast("long").alias("pred"),
            F.col("parent").alias("obj"),
            F.lit(0).alias("rel_group"),
        )
        .unionByName(attr_reduced.withColumn("rel_group", F.lit(0)))
        .distinct()
    )
    return KGResult(
        statements=canon,
        concepts=concepts,
        isa_direct=isa_edges,
        isa_closure=closure,
        triples=triples,
    )


def build_kg_resumable(spark: SparkSession, src: DataFrame, workdir: str, min_score: float = 0.5):
    """Checkpointed variant of build_kg: every stage goes through
    subont.lineage.StageRunner — killed runs resume from the last
    completed stage with identical output (content-hash ids).

    Returns (triples DataFrame, StageRunner) — runner.metrics() has the
    per-stage rows/wall/partition lineage."""
    from .lineage import StageRunner

    runner = StageRunner(spark, workdir)
    stmts = runner.run("01_statements", lambda: extract_statements(src, min_score=min_score))
    cmap = runner.run("02_canonical_map", lambda: canonical_map(stmts), ["01_statements"])
    canon = runner.run(
        "03_canon_statements", lambda: canonicalize_statements(stmts, cmap), ["01_statements", "02_canonical_map"]
    )

    def _isa_edges():
        return (
            canon.filter(F.col("stype") == "isa")
            .select(entity_id(F.col("arg1")).alias("child"), entity_id(F.col("arg2")).alias("parent"))
            .filter(F.col("child") != F.col("parent"))
            .distinct()
            .localCheckpoint(eager=False)
        )

    def _closure():
        return transitive_closure(_isa_edges())

    closure = runner.run("04_isa_closure", _closure, ["03_canon_statements"])

    def _triples():
        direct = derive_direct_edges(closure, edges=_isa_edges())
        attr = (
            canon.filter(F.col("stype") == "attr")
            .select(
                entity_id(F.col("arg1")).alias("subj"),
                role_id(F.col("role")).alias("pred"),
                entity_id(F.col("arg2")).alias("obj"),
            )
            .distinct()
        )
        attr_reduced = eliminate_weaker(
            attr.select(
                F.xxhash64("subj", "pred").alias("set_id"), F.col("obj").alias("cls"), "subj", "pred"
            ),
            closure,
        ).select("subj", "pred", F.col("cls").alias("obj"))
        return (
            direct.select(
                F.col("child").alias("subj"),
                F.lit(IS_A).cast("long").alias("pred"),
                F.col("parent").alias("obj"),
                F.lit(0).alias("rel_group"),
            )
            .unionByName(attr_reduced.withColumn("rel_group", F.lit(0)))
            .distinct()
        )

    triples = runner.run("05_triples", _triples, ["03_canon_statements", "04_isa_closure"])
    return triples, runner
