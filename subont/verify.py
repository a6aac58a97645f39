"""Verification operators (SURVEY.md §2.5, V1-V3) as Spark jobs.

The reference ships these as a metamorphic test oracle behind
``-verify-subontology`` (SubontologyExtraction.java:141-188):

V1  focus-concept equivalence — reference clones the subontology with
    the focus concept renamed, unions into the source and re-classifies
    per concept (VerificationChecker.java:35-181).  For the EL fragment
    the same property holds iff the *normalized authoring definition* of
    each focus concept is identical when generated from the source and
    from the subontology — a batched definition comparison instead of N
    reclassifications (the rename-union construction stays available as
    a slow fallback oracle per SURVEY.md §2.5).

V2  transitive-closure equality — per class, direct children in the
    subontology must equal the source's "nearest children within the
    subontology signature" (skip-over-out-of-signature BFS + strongest-
    class reduction, VerificationChecker.java:183-258).

V3  axiom integrity — every destination/type id referenced by emitted
    triples must exist as a concept/role in the subontology signature
    (manualtests/SubontologyAxiomIntegrityChecker.java:31-109).

Each returns a DIFF DataFrame — empty means the property holds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .closure import Classified
from .definitions import RedundancyOptions, abstract_definitions
from .model import IS_A, Ontology
from .reduce import eliminate_stronger


def _chk(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def _normalized_defs(ont: Ontology, cl: Classified, focus: DataFrame, options) -> DataFrame:
    defs = abstract_definitions(ont, cl, focus.withColumnRenamed("concept_id", "sub_id"), options)
    return (
        defs.rows.groupBy("sub_id", "axiom_id", "is_equiv")
        .agg(F.array_sort(F.collect_set(F.concat(F.col("kind"), F.col("ref_id")))).alias("conds"))
        .select("sub_id", "is_equiv", F.concat_ws("&", "conds").alias("def_sig"))
        .distinct()
    )


def verify_focus_equivalence(
    src_ont: Ontology,
    src_cl: Classified,
    sub_ont: Ontology,
    sub_cl: Classified,
    focus: DataFrame,
    options: RedundancyOptions | None = None,
) -> DataFrame:
    """V1: per focus concept, the set of normalized authoring definitions
    must agree between source and subontology.  Returns rows
    (sub_id, def_sig, side) present on one side only."""
    options = options or RedundancyOptions()
    d_src = _normalized_defs(src_ont, src_cl, focus, options)
    d_sub = _normalized_defs(sub_ont, sub_cl, focus, options)
    only_src = d_src.join(d_sub, ["sub_id", "is_equiv", "def_sig"], "left_anti").withColumn(
        "side", F.lit("source_only")
    )
    only_sub = d_sub.join(d_src, ["sub_id", "is_equiv", "def_sig"], "left_anti").withColumn(
        "side", F.lit("subontology_only")
    )
    return only_src.unionByName(only_sub)


def nearest_in_signature_children(
    src_cl: Classified, signature: DataFrame, max_depth: int = 64
) -> DataFrame:
    """Source-side 'nearest children within signature': walk down the
    source direct hierarchy, skipping classes outside the signature
    (VerificationChecker.java:208-224), then keep the most-general
    antichain (:226).  Returns (parent, child) for parents ∈ signature."""
    sig = signature.select(F.col("concept_id").alias("id"))
    start = (
        sig.join(src_cl.direct, sig.id == src_cl.direct.parent)
        .select(F.col("id").alias("root"), F.col("child").alias("node"))
    )
    collected = None
    frontier = start
    for _ in range(max_depth):
        in_sig = frontier.join(sig.withColumnRenamed("id", "node"), "node", "left_semi")
        out_sig = frontier.join(sig.withColumnRenamed("id", "node"), "node", "left_anti")
        collected = in_sig if collected is None else collected.unionByName(in_sig)
        if out_sig.isEmpty():
            break
        frontier = _chk(
            out_sig.join(src_cl.direct, out_sig.node == src_cl.direct.parent)
            .select("root", F.col("child").alias("node"))
            .distinct()
        )
    else:
        raise RuntimeError("nearest_in_signature_children: max_depth exceeded")
    cand = collected.select(F.col("root").alias("set_id"), F.col("node").alias("cls")).distinct()
    reduced = eliminate_stronger(cand, src_cl.closure)
    return reduced.select(F.col("set_id").alias("parent"), F.col("cls").alias("child"))


def verify_transitive_closure_equal(
    src_cl: Classified, sub_cl: Classified, signature: DataFrame
) -> DataFrame:
    """V2: sub direct children vs source nearest-in-signature children,
    per signature class.  Returns (parent, child, side) diffs."""
    sig = signature.select(F.col("concept_id").alias("id"))
    sub_children = (
        sig.join(sub_cl.direct, sig.id == sub_cl.direct.parent)
        .select(F.col("id").alias("parent"), F.col("child"))
        .join(sig.withColumnRenamed("id", "child"), "child", "left_semi")
        .distinct()
    )
    src_children = nearest_in_signature_children(src_cl, signature)
    only_src = src_children.join(sub_children, ["parent", "child"], "left_anti").withColumn(
        "side", F.lit("source_only")
    )
    only_sub = sub_children.join(src_children, ["parent", "child"], "left_anti").withColumn(
        "side", F.lit("subontology_only")
    )
    return only_src.unionByName(only_sub)


def detect_complex_nesting(ont: Ontology) -> DataFrame:
    """V4 (tools/CheckComplexNesting.java:40-111): flag PVs whose filler
    nests another restriction OUTSIDE a role-group wrapper — the shape
    the EL pipeline assumes away (max nesting RG(R some C)).
    Returns offending (pv_id, role_id)."""
    from .model import ROLE_GROUP

    nested = (
        ont.pvs.filter(F.col("filler_concept").isNull())
        .select("pv_id", "role_id", F.explode("filler_refs").alias("r"))
        .filter(F.col("r.kind") == "p")
        .filter(F.col("role_id") != ROLE_GROUP)
        .select("pv_id", "role_id")
        .distinct()
    )
    return nested


def verify_triple_integrity(triples: DataFrame, signature: DataFrame, roles: DataFrame) -> DataFrame:
    """V3: every obj and every non-IS-A pred of the emitted triples must
    be a signature concept / role.  Returns (entity_id, kind) orphans."""
    sig = signature.select(F.col("concept_id").alias("entity_id"))
    rids = roles.select(F.col("role_id").alias("entity_id"))
    objs = triples.select(F.col("obj").alias("entity_id")).distinct().join(sig, "entity_id", "left_anti")
    preds = (
        triples.filter(F.col("pred") != IS_A)
        .select(F.col("pred").alias("entity_id"))
        .distinct()
        .join(rids, "entity_id", "left_anti")
    )
    return objs.withColumn("kind", F.lit("object")).unionByName(
        preds.withColumn("kind", F.lit("predicate"))
    )
