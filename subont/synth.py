"""Seeded synthetic SNOMED-scale ontology generator — distributed.

The reference targets the full SNOMED CT release (~360k concepts,
≈1M axioms; README.md:60 sizes the JVM heap for it), but its CI fixture
has 12 concepts.  This module emits a deterministic ontology AT
production scale so ``classify`` and ``compute_subontology`` can be
profiled where the reference actually runs.  Generation is pure
DataFrame algebra over ``spark.range`` — no driver-side lists — so the
same generator emits a 100×-scale ontology unchanged on a cluster.

Shape (SNOMED-like):
* concept 1 is the root; a MAIN branch holds clinical-style concepts and
  a VALUE branch (own sub-root, like SNOMED's qualifier-value hierarchy)
  holds every PV filler, so attribute values live outside the branch
  they qualify.
* parents divide the child id by ~1.25-2.0 → expected depth
  ≈ log₁.₆(N) (~27 at 360k), matching SNOMED's deep chains.
* ~20% of main concepts are fully defined (A ≡ parent ⊓ ∃R.F); defined
  definitions are DEDUPED on (parent, role, filler) so no two concepts
  are accidentally equivalent (classify rejects equivalence cycles,
  mirroring the reference's no-equivalent-classes assumption).
* ~30% of concepts carry a second stated axiom with another PV; a small
  GCI fraction exercises the GCI naming machinery; a 40-role hierarchy
  with two transitive roles and one chain (T∘R ⊑ T) drives R-chain.

All ids are content-derived or range-derived — rerunning with the same
(n_concepts, seed) yields bit-identical tables (resume/retry safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .model import AXIOMS_SCHEMA, PVS_SCHEMA, Ontology

ROLE0 = 2_000_000_000  # role-id range, disjoint from concept ids


def _h(col, seed: int, k: int):
    """Deterministic 63-bit pseudo-random stream k, keyed by a column."""
    return F.abs(F.xxhash64(col, F.lit(seed), F.lit(k)))


def _pv_id(role_col, filler_col):
    """Spark twin of model.pv_id_for(Some(role, filler)) — the round-1
    invariant formula: -(int(md5('pv|<role>|c<filler>')[:15], 16) | 1)."""
    return (
        -F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("pv|"), role_col.cast("string"), F.lit("|c"),
                        filler_col.cast("string"),
                    )
                ),
                1, 15,
            ),
            16, 10,
        ).cast("long").bitwiseOR(F.lit(1))
    )


def synthetic_ontology(
    spark: SparkSession,
    n_concepts: int = 360_000,
    seed: int = 0,
    n_roles: int = 40,
    gci_every: int = 512,
    n_partitions: int | None = None,
) -> Ontology:
    value_min = max(3, (n_concepts * 4) // 5)  # value branch: [value_min, N]
    rng = spark.range(2, n_concepts + 1, numPartitions=n_partitions).select(
        F.col("id").alias("cid")
    )
    h = lambda k: _h(F.col("cid"), seed, k)  # noqa: E731

    is_value = F.col("cid") >= value_min
    # parent: child id ÷ U(1.25, 4.0) → expected depth ≈ log₂.₁(N)
    # (~17 at 360k) with ~20-40 ancestors per concept — SNOMED-like
    # density (the release's transitive closure averages ~30 ancestors)
    div1 = F.lit(1250) + (h(1) % 2750)
    div2 = F.lit(1250) + (h(2) % 2750)
    main_p1 = F.greatest(F.lit(1), (F.col("cid") * 1000 / div1).cast("long"))
    main_p2 = F.greatest(F.lit(1), (F.col("cid") * 1000 / div2).cast("long"))
    val_off = F.col("cid") - value_min
    val_p1 = F.lit(value_min) + (val_off * 1000 / div1).cast("long")
    val_p2 = F.lit(value_min) + (val_off * 1000 / div2).cast("long")
    # PV fillers: main concepts draw any value concept; VALUE concepts
    # draw only fillers STRICTLY BELOW their own id — the invariant that
    # keeps the chain rule's filler-hop graph strictly decreasing, hence
    # free of derived pv ⊑ pv cycles (see the acyclicity note below).
    val_filler = F.lit(value_min) + (
        h(5) % F.greatest(F.lit(1), F.col("cid") - value_min)
    )
    any_filler = F.lit(value_min) + (h(5) % (n_concepts - value_min + 1))
    base = rng.select(
        "cid",
        is_value.alias("is_value"),
        F.when(is_value, F.when(val_off == 0, F.lit(1)).otherwise(val_p1))
        .otherwise(main_p1).alias("p1"),
        F.when(is_value, val_p2).otherwise(main_p2).alias("p2"),
        (h(3) % 10 < 2).alias("has_p2"),
        (ROLE0 + (h(4) % n_roles)).alias("role"),
        F.when(is_value, val_filler).otherwise(any_filler).alias("filler"),
        ((h(6) % 5 == 0) & ~is_value & (F.col("cid") > 10)).alias("want_def"),
        ((h(7) % 2 == 0) & (~is_value | (F.col("cid") > value_min))).alias("has_pv"),
        (h(8) % 3 == 0).alias("extra_axiom"),
        (ROLE0 + (h(9) % n_roles)).alias("role2"),
        (F.lit(value_min) + (h(10) % (n_concepts - value_min + 1))).alias("filler2"),
    )

    # Cycle-freedom by construction (classify rejects equivalence
    # cycles, mirroring the reference's no-equivalent-classes
    # assumption):
    # 1. Every definition carries a UNIQUE reserved-leaf conjunct
    #    ∃role2.(2N + cid), so no existing concept can accidentally
    #    satisfy it — in particular not the defined concept's own
    #    parent (the cycle mode a plain parent ⊓ ∃R.F definition hits
    #    as soon as the parent inherits a compatible PV).
    # 2. Each definition/GCI gets one FRESH leaf instance concept
    #    (3N+cid / 4N+cid) stating the full LHS, so every equivalence
    #    and GCI actually FIRES; instances have no descendants, so
    #    nothing else can slip under the definition.
    # 3. Value concepts state PVs only with fillers strictly below
    #    their own id, and value hierarchy parents are strictly
    #    smaller — every pv membership a value concept can acquire
    #    (inherited, R-pv-weakened with ancestor fillers, or
    #    chain-derived) keeps filler < concept by induction, so the
    #    chain rule's filler-hop graph strictly decreases and derived
    #    pv ⊑ pv cycles are impossible.
    base = base.withColumn("is_defined", F.col("want_def")).withColumn(
        "def_leaf", F.lit(n_concepts) * 2 + F.col("cid")
    ).withColumn("def_inst", F.lit(n_concepts) * 3 + F.col("cid"))

    pv1 = _pv_id(F.col("role"), F.col("filler"))
    pv2 = _pv_id(F.col("role2"), F.col("filler2"))
    pvL = _pv_id(F.col("role2"), F.col("def_leaf"))
    use_pv = F.col("is_defined") | F.col("has_pv")
    rhs = F.array_distinct(
        F.concat(
            F.array(F.struct(F.lit("c").alias("kind"), F.col("p1").alias("ref_id"))),
            F.when(
                F.col("has_p2") & (F.col("p2") != F.col("p1")) & ~F.col("is_defined"),
                F.array(F.struct(F.lit("c").alias("kind"), F.col("p2").alias("ref_id"))),
            ).otherwise(F.array()),
            F.when(
                use_pv,
                F.array(F.struct(F.lit("p").alias("kind"), pv1.alias("ref_id"))),
            ).otherwise(F.array()),
            F.when(
                F.col("is_defined"),
                F.array(F.struct(F.lit("p").alias("kind"), pvL.alias("ref_id"))),
            ).otherwise(F.array()),
        )
    )
    primary = base.select(
        (F.col("cid") * 4).alias("axiom_id"),
        F.col("cid").alias("sub_id"),
        F.col("is_defined").alias("is_equiv"),
        F.lit(False).alias("is_gci"),
        F.lit(None).cast("long").alias("gci_super"),
        rhs.alias("rhs"),
    )
    defined = base.filter("is_defined")
    def_leaves = defined.select(  # unique leaf under the value root
        (F.lit(n_concepts) * 7 + F.col("cid")).alias("axiom_id"),
        F.col("def_leaf").alias("sub_id"),
        F.lit(False).alias("is_equiv"),
        F.lit(False).alias("is_gci"),
        F.lit(None).cast("long").alias("gci_super"),
        F.array(
            F.struct(F.lit("c").alias("kind"), F.lit(value_min).cast("long").alias("ref_id"))
        ).alias("rhs"),
    )
    def_instances = defined.select(  # Y ⊑ p1 ⊓ ∃role.F ⊓ ∃role2.leaf
        (F.lit(n_concepts) * 6 + F.col("cid")).alias("axiom_id"),
        F.col("def_inst").alias("sub_id"),
        F.lit(False).alias("is_equiv"),
        F.lit(False).alias("is_gci"),
        F.lit(None).cast("long").alias("gci_super"),
        F.array(
            F.struct(F.lit("c").alias("kind"), F.col("p1").alias("ref_id")),
            F.struct(F.lit("p").alias("kind"), pv1.alias("ref_id")),
            F.struct(F.lit("p").alias("kind"), pvL.alias("ref_id")),
        ).alias("rhs"),
    )
    extra = base.filter(F.col("extra_axiom") & ~F.col("is_value")).select(
        (F.col("cid") * 4 + 1).alias("axiom_id"),
        F.col("cid").alias("sub_id"),
        F.lit(False).alias("is_equiv"),
        F.lit(False).alias("is_gci"),
        F.lit(None).cast("long").alias("gci_super"),
        F.array(
            F.struct(F.lit("c").alias("kind"), F.col("p1").alias("ref_id")),
            F.struct(F.lit("p").alias("kind"), pv2.alias("ref_id")),
        ).alias("rhs"),
    )
    # GCIs: (p1 ⊓ ∃role2.L) ⊑ cid for every ~gci_every-th main concept,
    # where L = n_concepts + cid is a RESERVED leaf value concept used by
    # no other PV, and one designated value-branch "instance" concept Y
    # states Y ⊑ p1 ⊓ ∃role2.L.  This makes every GCI actually fire
    # (Y ⊑ GCI_name ⊑ cid) while being structurally cycle-free: the only
    # concepts below ∃role2.L are Y and its value-branch descendants, and
    # no main concept is ever below a value concept (main closure targets
    # are main ids / defined names / GCI names / pv names only).
    # sub_id is the content hash gci_id_for would produce ('c' tokens
    # sort before 'p'; pv ids are negative).
    gci_base = base.filter(
        (F.col("cid") % gci_every == 7) & ~F.col("is_value") & (F.col("cid") > 10)
    ).select(
        "cid", "p1", "role2",
        (F.lit(n_concepts) + F.col("cid")).alias("leaf"),
        (F.lit(n_concepts) * 4 + F.col("cid")).alias("inst"),
    )
    pv3 = _pv_id(F.col("role2"), F.col("leaf"))
    gci_hash_in = F.concat(
        F.lit("gci|"), F.col("cid").cast("string"), F.lit("|c"),
        F.col("p1").cast("string"), F.lit("&p"), pv3.cast("string"),
    )
    gci_rhs = F.array(
        F.struct(F.lit("c").alias("kind"), F.col("p1").alias("ref_id")),
        F.struct(F.lit("p").alias("kind"), pv3.alias("ref_id")),
    )
    gcis = gci_base.select(
        (F.col("cid") * 4 + 3).alias("axiom_id"),
        (
            -F.conv(F.substring(F.md5(gci_hash_in), 1, 15), 16, 10)
            .cast("long").bitwiseOR(F.lit(1))
        ).alias("sub_id"),
        F.lit(True).alias("is_equiv"),
        F.lit(True).alias("is_gci"),
        F.col("cid").alias("gci_super"),
        gci_rhs.alias("rhs"),
    )
    gci_leaves = gci_base.select(  # leaf value concept under the value root
        (F.col("cid") * 4 + 2).alias("axiom_id"),
        F.col("leaf").alias("sub_id"),
        F.lit(False).alias("is_equiv"),
        F.lit(False).alias("is_gci"),
        F.lit(None).cast("long").alias("gci_super"),
        F.array(
            F.struct(F.lit("c").alias("kind"), F.lit(value_min).cast("long").alias("ref_id"))
        ).alias("rhs"),
    )
    gci_instances = gci_base.select(  # Y ⊑ p1 ⊓ ∃role2.L — makes the GCI fire
        (F.lit(n_concepts) * 5 + F.col("cid")).alias("axiom_id"),
        F.col("inst").alias("sub_id"),
        F.lit(False).alias("is_equiv"),
        F.lit(False).alias("is_gci"),
        F.lit(None).cast("long").alias("gci_super"),
        gci_rhs.alias("rhs"),
    )
    axioms = spark.createDataFrame([], AXIOMS_SCHEMA).unionByName(
        primary.unionByName(extra).unionByName(gcis)
        .unionByName(gci_leaves).unionByName(gci_instances)
        .unionByName(def_leaves).unionByName(def_instances)
    )

    pv_pairs = (
        base.filter(use_pv).select(F.col("role"), F.col("filler"))
        .unionByName(
            base.filter(F.col("extra_axiom") & ~F.col("is_value"))
            .select(F.col("role2").alias("role"), F.col("filler2").alias("filler"))
        )
        .unionByName(gci_base.select(F.col("role2").alias("role"), F.col("leaf").alias("filler")))
        .unionByName(defined.select(F.col("role2").alias("role"), F.col("def_leaf").alias("filler")))
        .distinct()
    )
    pvs = spark.createDataFrame([], PVS_SCHEMA).unionByName(
        pv_pairs.select(
            _pv_id(F.col("role"), F.col("filler")).alias("pv_id"),
            F.col("role").alias("role_id"),
            F.col("filler").alias("filler_concept"),
            F.lit(None).cast(PVS_SCHEMA["filler_refs"].dataType).alias("filler_refs"),
            F.lit(False).alias("is_data"),
            F.lit(None).cast("string").alias("value"),
        )
    )

    roles = [ROLE0 + i for i in range(n_roles)]
    subprops = [(r, r - 1) for r in roles if (r - ROLE0) % 3 == 2]
    return Ontology(
        axioms=axioms,
        pvs=pvs,
        concepts=spark.range(1, n_concepts + 1)
        .select(F.col("id").alias("concept_id"))
        .unionByName(gci_base.select(F.col("leaf").alias("concept_id")))
        .unionByName(gci_base.select(F.col("inst").alias("concept_id")))
        .unionByName(defined.select(F.col("def_leaf").alias("concept_id")))
        .unionByName(defined.select(F.col("def_inst").alias("concept_id"))),
        subprops=spark.createDataFrame(subprops, "child long, parent long"),
        transitive_roles=spark.createDataFrame([(ROLE0,), (ROLE0 + 1,)], "role_id long"),
        reflexive_roles=spark.createDataFrame([], "role_id long"),
        role_chains=spark.createDataFrame(
            [(ROLE0 + 2, ROLE0 + 2, ROLE0)],
            "super_role long, left_role long, right_role long",
        ),
        annotations=spark.createDataFrame([], "entity_id long, prop string, value string"),
        object_properties=spark.createDataFrame([(r,) for r in roles], "role_id long"),
        data_properties=spark.createDataFrame([], "role_id long"),
    )
