"""Batched definition generation (SURVEY.md §2.3, D3-D13).

The reference generates definitions class-by-class
(DefinitionGeneratorAbstract.java:26-155, DefinitionGeneratorNNF.java:24-78);
here each generator is ONE multi-stage DataFrame job over a *batch* of
classes — the reformulation where Spark wins at scale.

Definition rows are kept exploded:
    defs(sub_id, axiom_id, is_equiv, kind, ref_id)
with kind ∈ {'c','p'}; an empty condition set after reduction yields a
row in ``undefined`` instead (constructDefinition,
DefinitionGenerator.java:160-199: records ⊤ ⊑ C and emits nothing).

Role-group rebuilds (D6) may mint new PV ids (content-hashed); the
returned ``new_pvs`` rows must be unioned into the pvs dimension by the
caller.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .closure import Classified
from .model import Ontology, PVS_SCHEMA
from .reduce import eliminate_weaker

DEF_SCHEMA = T.StructType(
    [
        T.StructField("sub_id", T.LongType(), False),
        T.StructField("axiom_id", T.LongType(), False),
        T.StructField("is_equiv", T.BooleanType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("ref_id", T.LongType(), False),
    ]
)


@dataclass
class RedundancyOptions:
    """definitiongeneration/RedundancyOptions.java — default all on
    (SubOntologyExtractionHandler.java:86-93)."""

    less_specific: bool = True
    reflexive_pv: bool = True
    role_group: bool = True
    sufficient_proximal_gcis: bool = True


@dataclass
class Defs:
    rows: DataFrame          # DEF_SCHEMA
    undefined: DataFrame     # (sub_id)
    new_pvs: DataFrame       # PVS_SCHEMA rows minted by D6 rebuilds


from .util import chk as _chk
from .util import chk_n as _chk_n


def _closest_prim_map(cl: Classified) -> DataFrame:
    """Per-classification (node → closest primitive ancestor) map.

    The D4 BFS walks cl.direct from a node, skipping named PVs,
    collecting the FIRST primitive on each path and recursing only
    through non-primitive parents.  That is a pure function of the
    taxonomy — loop-INVARIANT across the expansion loop's rounds and
    across every abstract_definitions batch over the same ``cl`` — so
    it is computed ONCE and cached on the Classified object:

        e         = direct edges whose parent is not a PV name
        prim_par  = e restricted to primitive parents      (node, prim)
        np_edges  = e restricted to non-primitive parents
        cp        = prim_par ∪ (TC(np_edges) ⋈ prim_par)

    Every node on a TC(np_edges) path is non-primitive by construction
    (each hop's parent is), which is exactly the BFS's recursion
    condition; the identity part covers primitives among the node's own
    direct parents.  Equivalence vs the per-group BFS is gated in
    tests/test_definitions.py."""
    cached = getattr(cl, "_cp_map", None)
    if cached is not None:
        return cached
    from .closure import transitive_closure

    pv_ids = cl.pv_names.select(F.col("pv_id").alias("id"))
    nonprim = cl.non_primitive.select(F.col("id"))
    e = cl.direct.join(pv_ids, cl.direct.parent == F.col("id"), "left_anti")
    prim_par = e.join(nonprim, e.parent == F.col("id"), "left_anti").select(
        F.col("child").alias("node"), F.col("parent").alias("prim")
    )
    np_edges = e.join(nonprim, e.parent == F.col("id"), "left_semi").select("child", "parent")
    reach = transitive_closure(np_edges)  # (desc, anc), every anc non-primitive
    cp = (
        prim_par.unionByName(
            reach.join(prim_par, reach.anc == prim_par.node)
            .select(F.col("desc").alias("node"), "prim")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    cl._cp_map = cp
    return cp


def closest_primitive_ancestors(start: DataFrame, cl: Classified) -> DataFrame:
    """D4: closest primitive ancestors per (gid, node), skipping named
    PVs (DefinitionGeneratorAbstract.java:158-183).  Returns (gid, prim).
    (The BFS twin below keeps a ``max_depth`` bound; the map form closes
    the whole non-primitive subgraph once, so no depth knob exists here.)

    One join against the cached per-classification map — the expansion
    loop calls this every round; the map is computed once per ``cl``."""
    cp = _closest_prim_map(cl)
    return (
        start.select("gid", "node").distinct()
        .join(cp, "node")
        .select("gid", "prim")
        .distinct()
    )


def _closest_primitive_ancestors_bfs(
    start: DataFrame, cl: Classified, max_depth: int = 64
) -> DataFrame:
    """Reference twin of D4: per-group BFS up the direct hierarchy, one
    frontier round per taxonomy level (kept as the equivalence oracle
    for the precomputed-map form above)."""
    pv_ids = cl.pv_names.select(F.col("pv_id").alias("id"))
    nonprim = cl.non_primitive.select(F.col("id"))
    out = None
    frontier = start.select("gid", "node").distinct()
    visited = frontier
    for _ in range(max_depth):
        parents = (
            frontier.join(cl.direct, frontier.node == cl.direct.child)
            .select("gid", F.col("parent").alias("node"))
            .distinct()
            .join(pv_ids, F.col("node") == F.col("id"), "left_anti")
        )
        prim = parents.join(nonprim, F.col("node") == F.col("id"), "left_anti")
        nonprim_parents = parents.join(prim, ["gid", "node"], "left_anti")
        out = prim if out is None else out.unionByName(prim)
        frontier, n = _chk_n(nonprim_parents.join(visited, ["gid", "node"], "left_anti"))
        if n == 0:
            break
        visited = visited.unionByName(frontier)  # lazy union of checkpointed deltas
    else:
        raise RuntimeError("closest_primitive_ancestors: max_depth exceeded")
    return out.select("gid", F.col("node").alias("prim")).distinct()


def _rebuild_role_groups(
    pv_rows: DataFrame, ont: Ontology, cl: Classified
) -> tuple[DataFrame, DataFrame]:
    """D6: reduce the PV set nested in each role-group filler with A5,
    then rebuild (DefinitionGenerator.java:41-69).  pv_rows: (sub_id,
    axiom_id, is_equiv, pv_id).  Returns (pv_rows', new_pvs).

    Bug-compatible: named classes found inside a group are dropped from
    the rebuilt filler, as the reference only re-adds PV fillers
    (DefinitionGenerator.java:49-62 'NAMED CLASS FOUND IN ROLE GROUP!')."""
    joined = pv_rows.join(ont.pvs, "pv_id")
    # data PVs have a NULL filler but are NOT groups — pass through like
    # simple PVs (the reference's group walk only descends object
    # restrictions, DefinitionGenerator.java:41-69)
    simple = joined.filter(
        F.col("filler_concept").isNotNull() | F.col("is_data")
    ).select("sub_id", "axiom_id", "is_equiv", "pv_id")
    groups = joined.filter(F.col("filler_concept").isNull() & ~F.col("is_data"))
    # hoisted ontology-level gate (cached, one job ever) before the
    # per-batch probe: rebuilt groups derive from existing group PVs, so
    # a group-free ontology can never produce a non-empty `groups` here
    if not ont.has_group_pvs() or groups.isEmpty():
        return pv_rows, ont.pvs.limit(0)

    members = groups.select(
        "sub_id", "axiom_id", "is_equiv", "pv_id", "role_id", F.explode("filler_refs").alias("r")
    ).filter(F.col("r.kind") == "p")
    # group key = occurrence of the group pv in a definition
    members = members.withColumn(
        "set_id", F.xxhash64(F.col("sub_id"), F.col("axiom_id"), F.col("pv_id"))
    ).withColumn("cls", F.col("r.ref_id"))
    kept = eliminate_weaker(
        members.select("set_id", "cls", "sub_id", "axiom_id", "is_equiv", "pv_id", "role_id"),
        cl.closure,
    )
    # rebuild: new pv id = hash of (role, sorted surviving member ids);
    # matches model.pv_id_for's canonical form for nested-pv fillers.
    rebuilt = (
        kept.groupBy("sub_id", "axiom_id", "is_equiv", "pv_id", "role_id")
        .agg(F.sort_array(F.collect_set("cls")).alias("member_ids"))
    )
    # id formula must equal model._hash60(model.pv_hash_input(role, refs)):
    # -(int(md5("pv|<role>|p<id1>&p<id2>…")[:15], 16) | 1), members sorted
    # ascending (all members are PVs → kind token 'p').
    hash_input = F.concat(
        F.lit("pv|"),
        F.col("role_id").cast("string"),
        F.lit("|"),
        F.concat_ws("&", F.expr("transform(member_ids, x -> concat('p', cast(x as string)))")),
    )
    rebuilt = rebuilt.withColumn(
        "new_pv_id",
        -F.conv(F.substring(F.md5(hash_input), 1, 15), 16, 10).cast("long").bitwiseOR(F.lit(1)),
    )
    # unchanged groups keep their original id (same member set)
    orig_members = groups.select(
        "pv_id", F.sort_array(F.expr("transform(filter(filler_refs, x -> x.kind = 'p'), x -> x.ref_id)")).alias("orig_ids")
    ).distinct()
    rebuilt = rebuilt.join(orig_members, "pv_id").withColumn(
        "final_pv_id",
        F.when(F.col("member_ids") == F.col("orig_ids"), F.col("pv_id")).otherwise(F.col("new_pv_id")),
    )
    out_rows = simple.unionByName(
        rebuilt.select("sub_id", "axiom_id", "is_equiv", F.col("final_pv_id").alias("pv_id"))
    )
    new_pvs = (
        rebuilt.filter(F.col("final_pv_id") != F.col("pv_id"))
        .select(
            F.col("final_pv_id").alias("pv_id"),
            F.col("role_id"),
            F.lit(None).cast("long").alias("filler_concept"),
            F.expr("transform(member_ids, x -> struct('p' as kind, x as ref_id))").alias("filler_refs"),
            F.lit(False).alias("is_data"),
            F.lit(None).cast("string").alias("value"),
        )
        .distinct()
    )
    return out_rows, new_pvs


def _eliminate_reflexive(
    pv_rows: DataFrame, ont: Ontology
) -> DataFrame:
    """D7, bug-compatible: only the self-filler branch of the reference
    ever fires (DefinitionGenerator.java:104-123; the ancestor check at
    :114 compares OWLClass to OWLClassExpression and is always false —
    FIXME in source).  Drop pv when role is reflexive and
    filler_concept == sub_id."""
    refl = ont.reflexive_roles.select(F.col("role_id").alias("__r"))
    drop = (
        pv_rows.join(ont.pvs, "pv_id")
        .join(refl, F.col("role_id") == F.col("__r"), "left_semi")
        .filter(F.col("filler_concept") == F.col("sub_id"))
        .select("sub_id", "axiom_id", "is_equiv", "pv_id")
    )
    return pv_rows.join(drop, ["sub_id", "axiom_id", "is_equiv", "pv_id"], "left_anti")


def _finish_definition(
    cls_rows: DataFrame,
    pv_rows: DataFrame,
    all_subjects: DataFrame,
    ont: Ontology,
    cl: Classified,
    options: RedundancyOptions,
) -> Defs:
    """Shared tail of D3/D10: role-group + reflexive reduction on the PV
    side, assemble rows, detect undefined classes."""
    new_pvs = ont.pvs.limit(0)
    if options.role_group:
        pv_rows, new_pvs = _rebuild_role_groups(pv_rows, ont, cl)
    if options.reflexive_pv:
        pv_rows = _eliminate_reflexive(pv_rows, ont)
    rows = cls_rows.select(
        "sub_id", "axiom_id", "is_equiv", F.lit("c").alias("kind"), F.col("cls").alias("ref_id")
    ).unionByName(
        pv_rows.select(
            "sub_id", "axiom_id", "is_equiv", F.lit("p").alias("kind"), F.col("pv_id").alias("ref_id")
        )
    )
    rows = _chk(rows)
    undefined = all_subjects.join(
        rows.select("sub_id").distinct(), "sub_id", "left_anti"
    ).select("sub_id")
    return Defs(rows=rows, undefined=undefined, new_pvs=new_pvs)


def abstract_definitions(
    ont: Ontology,
    cl: Classified,
    classes: DataFrame,
    options: RedundancyOptions | None = None,
) -> Defs:
    """D3: abstract (authoring-form) definitions for a batch of classes
    (DefinitionGeneratorAbstract.java:26-155).

    classes: (sub_id).  GCI names must go through
    ``gci_authoring_definitions`` instead (reference dispatches at :29-31).
    """
    options = options or RedundancyOptions()
    src = ont.axioms.filter(~F.col("is_gci")).join(classes, "sub_id", "left_semi")
    # stated direct parents per (class, axiom): conjuncts, PVs as names
    parents = src.select(
        "sub_id", "axiom_id", "is_equiv", F.explode("rhs").alias("r")
    ).select(
        "sub_id", "axiom_id", "is_equiv", F.col("r.kind").alias("kind"), F.col("r.ref_id").alias("pid")
    )
    parents = _chk(parents)
    gkey = F.xxhash64(F.col("sub_id"), F.col("axiom_id"))

    # ancestors of stated parents (incl. the parents themselves)
    anc = parents.select("sub_id", "axiom_id", "is_equiv", F.col("pid").alias("aid")).unionByName(
        parents.join(cl.closure, parents.pid == cl.closure.desc)
        .select("sub_id", "axiom_id", "is_equiv", F.col("anc").alias("aid"))
    ).distinct()
    anc = _chk(anc)
    pv_ids = cl.pv_names.select(F.col("pv_id").alias("aid"))
    ancestor_pvs = anc.join(pv_ids, "aid", "left_semi")

    # proximal primitives: primitive non-PV stated parents directly;
    # others via D4 BFS (DefinitionGeneratorAbstract.java:76-90)
    nonprim = cl.non_primitive.select(F.col("id").alias("pid"))
    prim_parents = (
        parents.filter(F.col("kind") == "c")
        .join(nonprim, "pid", "left_anti")
        .select("sub_id", "axiom_id", "is_equiv", F.col("pid").alias("prim"))
    )
    other_parents = parents.join(
        prim_parents.select("sub_id", "axiom_id", F.col("prim").alias("pid")),
        ["sub_id", "axiom_id", "pid"],
        "left_anti",
    )
    bfs_start = other_parents.select(
        F.xxhash64(F.col("sub_id"), F.col("axiom_id")).alias("gid"), F.col("pid").alias("node")
    )
    group_keys = parents.select(
        "sub_id", "axiom_id", "is_equiv", gkey.alias("gid")
    ).distinct()
    # no emptiness probe: the map form is a single join, safe (and free
    # of per-round jobs) on an empty start set
    bfs_prims = closest_primitive_ancestors(bfs_start, cl)
    closest = prim_parents.select(
        F.xxhash64(F.col("sub_id"), F.col("axiom_id")).alias("gid"), "prim"
    ).unionByName(bfs_prims).distinct()
    # remove any PV names (can't occur: BFS skips PVs, prim parents are 'c')
    # remove GCI names (non-primitive → never collected)  — both no-ops by
    # construction, mirroring DefinitionGeneratorAbstract.java:92-95.

    if options.less_specific:
        closest = eliminate_weaker(
            closest.select(F.col("gid").alias("set_id"), F.col("prim").alias("cls")), cl.closure
        ).select(F.col("set_id").alias("gid"), F.col("cls").alias("prim"))
        if options.sufficient_proximal_gcis:
            closest = _eliminate_sufficient_proximal_gcis(closest, group_keys, ont, cl)
            closest = eliminate_weaker(
                closest.select(F.col("gid").alias("set_id"), F.col("prim").alias("cls")), cl.closure
            ).select(F.col("set_id").alias("gid"), F.col("cls").alias("prim"))
        # NOTE: the reference's follow-up "eliminate PVs inherited from
        # type-1 GCI parents" (DefinitionGeneratorAbstract.java:117-135)
        # is a no-op: it tests retained parents against the removed set,
        # which can never intersect.  Bug-compatible: skipped.
        ancestor_pvs = eliminate_weaker(
            ancestor_pvs.select(gkey.alias("set_id"), F.col("aid").alias("cls"),
                                "sub_id", "axiom_id", "is_equiv"),
            cl.closure,
        ).withColumnRenamed("cls", "aid").drop("set_id")

    cls_rows = closest.join(group_keys, "gid").select(
        "sub_id", "axiom_id", "is_equiv", F.col("prim").alias("cls")
    )
    pv_rows = ancestor_pvs.select("sub_id", "axiom_id", "is_equiv", F.col("aid").alias("pv_id"))
    return _finish_definition(cls_rows, pv_rows, classes, ont, cl, options)


def _eliminate_sufficient_proximal_gcis(
    closest: DataFrame, group_keys: DataFrame, ont: Ontology, cl: Classified
) -> DataFrame:
    """D8 (DefinitionGeneratorAbstract.java:188-227): a parent with
    associated GCIs is *type 1* for class C iff C ⊑ some GCI name of the
    parent; replace it by the parent's proximal primitives (iterating, as
    replacements may themselves be GCI parents)."""
    if not ont.has_gcis():  # cached ontology-level gate, no per-call job
        return closest
    gci_of_super = ont.axioms.filter(F.col("is_gci")).select(
        F.col("gci_super").alias("prim"), F.col("sub_id").alias("gci_name")
    )
    out = None
    frontier = closest.join(group_keys.select("gid", "sub_id").distinct(), "gid")
    for _ in range(16):
        with_gci = frontier.join(gci_of_super, "prim")
        type1 = (
            with_gci.join(
                cl.closure,
                (with_gci.sub_id == cl.closure.desc) & (with_gci.gci_name == cl.closure.anc),
                "left_semi",
            )
            .select("gid", "sub_id", "prim")
            .distinct()
        )
        keep = frontier.select("gid", "sub_id", "prim").join(type1, ["gid", "sub_id", "prim"], "left_anti")
        out = keep if out is None else out.unionByName(keep)
        if type1.isEmpty():
            break
        repl = closest_primitive_ancestors(
            type1.select(F.xxhash64("gid", "sub_id").alias("bfsgid"), F.col("prim").alias("node"))
            .withColumnRenamed("bfsgid", "gid"),
            cl,
        )
        key_map = type1.select(
            F.xxhash64("gid", "sub_id").alias("bfs_gid"), "gid", "sub_id"
        ).distinct()
        frontier = _chk(
            repl.join(key_map, repl.gid == key_map.bfs_gid)
            .select(key_map.gid.alias("gid"), "sub_id", F.col("prim"))
            .distinct()
        )
        if frontier.isEmpty():
            break
    return out.select("gid", "prim").distinct()


def gci_authoring_definitions(
    ont: Ontology, cl: Classified, gci_names: DataFrame, options: RedundancyOptions | None = None
) -> DataFrame:
    """D9 (DefinitionGeneratorAbstract.java:229-297): authoring form of a
    GCI LHS — replace non-primitive LHS concepts by their definitions'
    necessary conditions, reduce concept & PV sets, return rows shaped
    like DEF_SCHEMA with is_equiv=false and sub_id = gci name.

    The caller emits these as  ⋀conditions ⊑ super(gci)
    (SubOntologyExtractionHandler.java:209-215)."""
    options = options or RedundancyOptions()
    gaxioms = ont.axioms.filter(F.col("is_gci")).join(
        gci_names.withColumnRenamed("gci_id", "sub_id"), "sub_id", "left_semi"
    )
    conj = gaxioms.select("sub_id", F.explode("rhs").alias("r")).select(
        "sub_id", F.col("r.kind").alias("kind"), F.col("r.ref_id").alias("ref_id")
    )
    nonprim = cl.non_primitive.select(F.col("id").alias("ref_id"))
    cls_conj = conj.filter(F.col("kind") == "c")
    defined_cls = cls_conj.join(nonprim, "ref_id", "left_semi")
    primitive_cls = cls_conj.join(nonprim, "ref_id", "left_anti")
    pv_conj = conj.filter(F.col("kind") == "p")

    # replace defined concepts by their abstract definition conditions
    if defined_cls.isEmpty():
        replaced = conj.limit(0)
    else:
        inner = abstract_definitions(
            ont, cl, defined_cls.select(F.col("ref_id").alias("sub_id")).distinct(), options
        )
        replaced = defined_cls.join(
            inner.rows.select(F.col("sub_id").alias("ref_id"), F.col("kind").alias("nkind"),
                              F.col("ref_id").alias("nref")),
            "ref_id",
        ).select("sub_id", F.col("nkind").alias("kind"), F.col("nref").alias("ref_id"))

    cand = primitive_cls.select("sub_id", "kind", "ref_id").unionByName(replaced).unionByName(
        pv_conj.select("sub_id", "kind", "ref_id")
    ).distinct()
    # reduce concept and PV sets separately (reference reduces each)
    cand_c = eliminate_weaker(
        cand.filter(F.col("kind") == "c").select(F.col("sub_id").alias("set_id"), F.col("ref_id").alias("cls")),
        cl.closure,
    ).select(F.col("set_id").alias("sub_id"), F.lit("c").alias("kind"), F.col("cls").alias("ref_id"))
    cand_p = eliminate_weaker(
        cand.filter(F.col("kind") == "p").select(F.col("sub_id").alias("set_id"), F.col("ref_id").alias("cls")),
        cl.closure,
    ).select(F.col("set_id").alias("sub_id"), F.lit("p").alias("kind"), F.col("cls").alias("ref_id"))
    return (
        cand_c.unionByName(cand_p)
        .withColumn("axiom_id", F.lit(0).cast("long"))
        .withColumn("is_equiv", F.lit(False))
        .select("sub_id", "axiom_id", "is_equiv", "kind", "ref_id")
    )


def nnf_definitions(
    ont: Ontology,
    cl: Classified,
    classes: DataFrame,
    options: RedundancyOptions | None = None,
) -> Defs:
    """D10 (DefinitionGeneratorNNF.java:24-78): NNF definition per class —
    direct ancestors split into named classes vs PV names, GCI names
    bypassed (replaced by their non-PV direct ancestors, iteratively),
    reductions applied, always emitted as ⊑ (axiom_id=0)."""
    options = options or RedundancyOptions()
    pv_ids = cl.pv_names.select(F.col("pv_id").alias("aid"))
    gci_ids = cl.gci_names.select(F.col("gci_id").alias("aid"))

    anc = classes.join(cl.closure, classes.sub_id == cl.closure.desc).select(
        "sub_id", F.col("anc").alias("aid")
    )
    ancestor_pvs = anc.join(pv_ids, "aid", "left_semi").distinct()

    parents = classes.join(cl.direct, classes.sub_id == cl.direct.child).select(
        "sub_id", F.col("parent").alias("aid")
    ).join(pv_ids, "aid", "left_anti")
    # GCI-name bypass (DefinitionGeneratorNNF.java:37-51); the cached
    # classification-level gate skips the whole loop (and its per-batch
    # probe job) when no GCI names exist at all
    if cl.has_gci_names():
        for _ in range(16):
            gci_parents = parents.join(gci_ids, "aid", "left_semi")
            if gci_parents.isEmpty():
                break
            parents = parents.join(gci_ids, "aid", "left_anti")
            lifted = (
                gci_parents.join(cl.direct, gci_parents.aid == cl.direct.child)
                .select("sub_id", F.col("parent").alias("aid"))
                .join(pv_ids, "aid", "left_anti")
            )
            parents = _chk(parents.unionByName(lifted).distinct())
        else:
            raise RuntimeError("nnf_definitions: GCI bypass did not terminate")

    if options.less_specific:
        parents = eliminate_weaker(
            parents.select(F.col("sub_id").alias("set_id"), F.col("aid").alias("cls")), cl.closure
        ).select(F.col("set_id").alias("sub_id"), F.col("cls").alias("aid"))
        ancestor_pvs = eliminate_weaker(
            ancestor_pvs.select(F.col("sub_id").alias("set_id"), F.col("aid").alias("cls")), cl.closure
        ).select(F.col("set_id").alias("sub_id"), F.col("cls").alias("aid"))

    zero = F.lit(0).cast("long")
    cls_rows = parents.select(
        "sub_id", zero.alias("axiom_id"), F.lit(False).alias("is_equiv"), F.col("aid").alias("cls")
    )
    pv_rows = ancestor_pvs.select(
        "sub_id", zero.alias("axiom_id"), F.lit(False).alias("is_equiv"), F.col("aid").alias("pv_id")
    )
    return _finish_definition(cls_rows, pv_rows, classes, ont, cl, options)


def property_definitions(ont: Ontology, roles: DataFrame) -> DataFrame:
    """D12 (DefinitionGenerator.java:234-278): r ⊑ s rows for each direct
    stated super-property s of r.

    Divergence note: the reference's directness check is order-dependent
    over a HashSet and only correct for single-parent properties (the
    code comments 'We expect properties to have just one parent').  We
    use the order-free semantics: s is non-direct iff another stated
    super q of r has q ⊑ s stated.  Identical on single-parent RBoxes.
    Returns (child, parent)."""
    supers = ont.subprops.join(roles.withColumnRenamed("role_id", "child"), "child", "left_semi")
    dominated = (
        supers.select(F.col("child").alias("r"), F.col("parent").alias("q"))
        .join(
            ont.subprops.select(F.col("child").alias("q"), F.col("parent").alias("s")), "q"
        )
        .join(
            supers.select(F.col("child").alias("r"), F.col("parent").alias("s")),
            ["r", "s"],
            "left_semi",
        )
        .select(F.col("r").alias("child"), F.col("s").alias("parent"))
        .distinct()
    )
    return supers.join(dominated, ["child", "parent"], "left_anti")
