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
    return df.localCheckpoint(eager=False)


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


def _hash60_col(s) -> F.Column:
    """Spark-side model._hash60 (content-hash negative long)."""
    return -F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long").bitwiseOR(F.lit(1))


def _ref_map(ren: DataFrame, pv_map: DataFrame):
    """Column expressions mapping a (kind, ref_id) struct through the
    concept renaming + the pv re-minting maps."""
    return ren.select(F.col("old_id").alias("_c_old"), F.col("new_id").alias("_c_new")), \
        pv_map.select(F.col("old_pv").alias("_p_old"), F.col("new_pv").alias("_p_new"))


def rename_union_ontology(
    src_ont: Ontology, sub_ont: Ontology, focus: DataFrame
) -> tuple[Ontology, DataFrame]:
    """The V1 rename-union construction (VerificationChecker.java:35-110),
    batched over ALL focus concepts at once: clone the subontology with
    every focus concept renamed to a fresh content-hash id, keep the
    axioms that mention a renamed entity, and union them into the source.

    PV names are content hashes of (role, filler), so every PV whose
    filler (transitively) mentions a focus concept is re-minted with the
    renamed filler — the distributed analogue of OWLEntityRenamer
    rewriting class IRIs inside restrictions.

    Returns (union ontology, renaming map (old_id, new_id)).

    Divergence note: the reference renames one focus concept per
    reclassification; renaming all simultaneously is monotonically
    stronger (extra renamed axioms can only ADD entailments), so a PASS
    here is implied by the reference's per-class pass; tests cover the
    single-focus case where both constructions coincide exactly."""
    spark = src_ont.axioms.sparkSession
    ren = _chk(
        focus.select(F.col("concept_id").alias("old_id")).distinct().withColumn(
            "new_id", _hash60_col(F.concat(F.lit("v1ren|"), F.col("old_id").cast("string")))
        )
    )

    # ---- transitively-affected PVs (filler mentions a focus concept) ----
    pvs = sub_ont.pvs
    direct_aff = (
        pvs.filter(F.col("filler_concept").isNotNull())
        .join(ren, pvs.filler_concept == ren.old_id, "left_semi")
        .select("pv_id")
        .unionByName(
            pvs.filter(F.col("filler_concept").isNull())
            .select("pv_id", F.explode("filler_refs").alias("r"))
            .filter(F.col("r.kind") == "c")
            .join(ren, F.col("r.ref_id") == ren.old_id, "left_semi")
            .select("pv_id")
        )
        .distinct()
    )
    affected = _chk(direct_aff)
    for _ in range(8):
        up = (
            pvs.filter(F.col("filler_concept").isNull())
            .select("pv_id", F.explode("filler_refs").alias("r"))
            .filter(F.col("r.kind") == "p")
            .join(affected.withColumnRenamed("pv_id", "apv"), F.col("r.ref_id") == F.col("apv"), "left_semi")
            .select("pv_id")
            .distinct()
            .join(affected, "pv_id", "left_anti")
        )
        if up.isEmpty():
            break
        affected = _chk(affected.unionByName(up))

    # ---- re-mint affected PVs bottom-up (content-hash ids) ---------------
    pv_map = spark.createDataFrame([], "old_pv long, new_pv long")
    new_pv_rows = pvs.limit(0)
    pending = pvs.join(affected, "pv_id", "left_semi")
    for _ in range(8):
        if pending.isEmpty():
            break
        cmap, pmap = _ref_map(ren, pv_map)
        simple = (
            pending.filter(F.col("filler_concept").isNotNull())
            .join(cmap, F.col("filler_concept") == F.col("_c_old"))
            .select(
                F.col("pv_id").alias("old_pv"),
                "role_id",
                F.col("_c_new").alias("new_filler"),
            )
            .withColumn(
                "new_pv",
                _hash60_col(
                    F.concat(F.lit("pv|"), F.col("role_id").cast("string"), F.lit("|c"),
                             F.col("new_filler").cast("string"))
                ),
            )
        )
        # complex PVs: every affected nested p-ref must already be mapped
        refs = pending.filter(F.col("filler_concept").isNull()).select(
            "pv_id", "role_id", F.explode("filler_refs").alias("r")
        )
        mapped = (
            refs.join(cmap, (F.col("r.kind") == "c") & (F.col("r.ref_id") == F.col("_c_old")), "left")
            .join(pmap, (F.col("r.kind") == "p") & (F.col("r.ref_id") == F.col("_p_old")), "left")
            .join(
                affected.select(F.col("pv_id").alias("_apv")).withColumn("_aff", F.lit(True)),
                F.col("r.ref_id") == F.col("_apv"),
                "left",
            )
            .select(
                "pv_id",
                "role_id",
                F.col("r.kind").alias("kind"),
                F.coalesce("_c_new", "_p_new", F.col("r.ref_id")).alias("ref_id"),
                # blocked: nested pv is affected but its new id isn't known yet
                (
                    (F.col("r.kind") == "p") & F.coalesce(F.col("_aff"), F.lit(False))
                    & F.col("_p_new").isNull()
                ).alias("blocked"),
            )
        )
        agg = mapped.groupBy("pv_id", "role_id").agg(
            F.max(F.col("blocked").cast("int")).alias("any_blocked"),
            F.array_sort(F.collect_list(F.struct("kind", "ref_id"))).alias("refs"),
        )
        done_complex = agg.filter(F.col("any_blocked") == 0).select(
            F.col("pv_id").alias("old_pv"),
            "role_id",
            "refs",
            _hash60_col(
                F.concat(
                    F.lit("pv|"),
                    F.col("role_id").cast("string"),
                    F.lit("|"),
                    F.concat_ws(
                        "&", F.expr("transform(refs, x -> concat(x.kind, cast(x.ref_id as string)))")
                    ),
                )
            ).alias("new_pv"),
        )
        # data PVs are never 'affected' (their literal mentions no
        # concept), so re-minted rows are always object PVs
        new_simple_rows = simple.select(
            F.col("new_pv").alias("pv_id"),
            "role_id",
            F.col("new_filler").alias("filler_concept"),
            F.lit(None).cast(pvs.schema["filler_refs"].dataType).alias("filler_refs"),
            F.lit(False).alias("is_data"),
            F.lit(None).cast("string").alias("value"),
        )
        new_complex_rows = done_complex.select(
            F.col("new_pv").alias("pv_id"),
            "role_id",
            F.lit(None).cast("long").alias("filler_concept"),
            F.col("refs").alias("filler_refs"),
            F.lit(False).alias("is_data"),
            F.lit(None).cast("string").alias("value"),
        )
        step_map = simple.select("old_pv", "new_pv").unionByName(
            done_complex.select("old_pv", "new_pv")
        )
        if step_map.isEmpty():
            break
        pv_map = _chk(pv_map.unionByName(step_map).distinct())
        new_pv_rows = _chk(new_pv_rows.unionByName(new_simple_rows).unionByName(new_complex_rows))
        pending = pending.join(pv_map.withColumnRenamed("old_pv", "pv_id"), "pv_id", "left_anti")

    # ---- renamed axioms ---------------------------------------------------
    cmap, pmap = _ref_map(ren, pv_map)
    ax_refs = sub_ont.axioms.select(
        "axiom_id", "sub_id", "is_equiv", "is_gci", "gci_super", F.explode("rhs").alias("r")
    )
    ax_mapped = (
        ax_refs.join(cmap, (F.col("r.kind") == "c") & (F.col("r.ref_id") == F.col("_c_old")), "left")
        .join(pmap, (F.col("r.kind") == "p") & (F.col("r.ref_id") == F.col("_p_old")), "left")
        .select(
            "axiom_id", "sub_id", "is_equiv", "is_gci", "gci_super",
            F.col("r.kind").alias("kind"),
            F.coalesce("_c_new", "_p_new", F.col("r.ref_id")).alias("ref_id"),
            (F.col("_c_new").isNotNull() | F.col("_p_new").isNotNull()).alias("touched"),
        )
    )
    per_ax = ax_mapped.groupBy("axiom_id", "sub_id", "is_equiv", "is_gci", "gci_super").agg(
        F.array_sort(F.collect_set(F.struct("kind", "ref_id"))).alias("rhs"),
        F.max(F.col("touched").cast("int")).alias("rhs_touched"),
    )
    per_ax = (
        per_ax.join(cmap.withColumnRenamed("_c_old", "sub_id").withColumnRenamed("_c_new", "_sub_new"), "sub_id", "left")
        .join(cmap.withColumnRenamed("_c_old", "gci_super").withColumnRenamed("_c_new", "_sup_new"), "gci_super", "left")
    )
    tokens = F.concat_ws(
        "&", F.expr("transform(rhs, x -> concat(x.kind, cast(x.ref_id as string)))")
    )
    # a renamed GCI needs a re-minted content-hash name (same scheme as
    # model.gci_id_for) — reusing the old name would alias two different
    # LHS definitions in the union
    new_sub = F.when(
        F.col("is_gci"),
        _hash60_col(
            F.concat(
                F.lit("gci|"), F.coalesce("_sup_new", "gci_super").cast("string"),
                F.lit("|"), tokens,
            )
        ),
    ).otherwise(F.coalesce("_sub_new", "sub_id"))
    renamed = per_ax.filter(
        (F.col("rhs_touched") == 1) | F.col("_sub_new").isNotNull() | F.col("_sup_new").isNotNull()
    ).select(
        _hash60_col(
            F.concat_ws(
                "|",
                F.lit("v1ax"),
                new_sub.cast("string"),
                F.col("is_equiv").cast("string"),
                F.col("is_gci").cast("string"),
                F.coalesce(F.coalesce("_sup_new", "gci_super").cast("string"), F.lit("-")),
                tokens,
            )
        ).alias("axiom_id"),
        new_sub.alias("sub_id"),
        "is_equiv",
        "is_gci",
        F.coalesce("_sup_new", "gci_super").alias("gci_super"),
        "rhs",
    )

    union = replace_ontology_for_rename(src_ont, sub_ont, renamed, new_pv_rows)
    return union, ren


def replace_ontology_for_rename(
    src_ont: Ontology, sub_ont: Ontology, renamed_axioms: DataFrame, new_pv_rows: DataFrame
) -> Ontology:
    from dataclasses import replace as _replace

    return _replace(
        src_ont,
        axioms=_chk(src_ont.axioms.unionByName(renamed_axioms)),
        pvs=_chk(
            src_ont.pvs.unionByName(sub_ont.pvs).unionByName(new_pv_rows)
            .dropDuplicates(["pv_id"])
        ),
        subprops=src_ont.subprops.unionByName(sub_ont.subprops).distinct(),
        transitive_roles=src_ont.transitive_roles.unionByName(sub_ont.transitive_roles).distinct(),
        reflexive_roles=src_ont.reflexive_roles.unionByName(sub_ont.reflexive_roles).distinct(),
        role_chains=src_ont.role_chains.unionByName(sub_ont.role_chains).distinct(),
    )


def verify_focus_equivalence_rename(
    src_ont: Ontology, sub_ont: Ontology, focus: DataFrame
) -> DataFrame:
    """V1 slow-path oracle (VerificationChecker.java:35-110): classify
    source ∪ renamed-subontology and require each NAMED (non-primitive)
    focus concept to be equivalent to its renamed copy.  Returns the
    failing (old_id, new_id) rows — empty means verified.

    This is the semantic fallback for the fast normalized-definition
    proxy (verify_focus_equivalence): a definition that is syntactically
    different but semantically equal passes here."""
    from .closure import classify

    union, ren = rename_union_ontology(src_ont, sub_ont, focus)
    cl = classify(union, allow_equivalences=True)
    named = ren.join(
        sub_ont.axioms.filter(F.col("is_equiv") & ~F.col("is_gci"))
        .select(F.col("sub_id").alias("old_id")),
        "old_id",
        "left_semi",
    )
    fwd = cl.closure.select(F.col("desc").alias("old_id"), F.col("anc").alias("new_id"))
    bwd = cl.closure.select(F.col("anc").alias("old_id"), F.col("desc").alias("new_id"))
    ok = named.join(fwd, ["old_id", "new_id"], "left_semi").join(
        bwd, ["old_id", "new_id"], "left_semi"
    )
    return named.join(ok, ["old_id", "new_id"], "left_anti")


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
    objs = (
        triples.select(F.col("obj").alias("entity_id"))
        .filter(F.col("entity_id").isNotNull())  # concrete rows carry value, not obj
        .distinct()
        .join(sig, "entity_id", "left_anti")
    )
    preds = (
        triples.filter(F.col("pred") != IS_A)
        .select(F.col("pred").alias("entity_id"))
        .distinct()
        .join(rids, "entity_id", "left_anti")
    )
    return objs.withColumn("kind", F.lit("object")).unionByName(
        preds.withColumn("kind", F.lit("predicate"))
    )
