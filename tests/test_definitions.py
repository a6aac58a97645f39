"""D4 closest-primitive-ancestors: the precomputed per-classification
map (prim-parents ∪ TC(non-primitive subgraph) ⋈ prim-parents) must
equal the reference-shaped per-group BFS on every input — the map is
what the expansion loop uses every round; the BFS is the semantic twin
of DefinitionGeneratorAbstract.java:158-183."""

import pyspark.sql.functions as F

from subont import fixtures
from subont.closure import classify
from subont.definitions import (
    _closest_primitive_ancestors_bfs,
    closest_primitive_ancestors,
)


def _assert_equiv(start, cl):
    fast = closest_primitive_ancestors(start, cl)
    slow = _closest_primitive_ancestors_bfs(start, cl)
    assert fast.exceptAll(slow).isEmpty(), "map ⊃ bfs"
    assert slow.exceptAll(fast).isEmpty(), "bfs ⊃ map"


def test_cp_map_equals_bfs_dummy(spark):
    ont = fixtures.dummy_ontology(spark)
    cl = classify(ont)
    # every named class as its own group
    start = (
        ont.axioms.select(F.col("sub_id").alias("node"))
        .distinct()
        .withColumn("gid", F.col("node"))
    )
    _assert_equiv(start, cl)


def test_cp_map_equals_bfs_synthetic(spark):
    """Deep DAG + firing definitions + PV names: multi-level BFS walks
    through non-primitive intermediates, PV-name skipping, diamond
    paths."""
    from subont.synth import synthetic_ontology

    ont = synthetic_ontology(spark, 600, seed=3)
    cl = classify(ont)
    start = (
        ont.axioms.select(F.col("sub_id").alias("node"))
        .unionByName(ont.pvs.select(F.col("pv_id").alias("node")))
        .distinct()
        .withColumn("gid", F.col("node") % 7)  # shared groups across nodes
    )
    _assert_equiv(start, cl)


def test_cp_map_cached_on_classified(spark):
    ont = fixtures.dummy_ontology(spark)
    cl = classify(ont)
    start = ont.axioms.select(
        F.col("sub_id").alias("node"), F.col("sub_id").alias("gid")
    ).distinct()
    closest_primitive_ancestors(start, cl)
    m1 = cl._cp_map
    closest_primitive_ancestors(start, cl)
    assert cl._cp_map is m1  # computed once, reused
