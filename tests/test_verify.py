"""V1/V2/V3 verification on the dummy-fixture extraction — the
reference's -verify-subontology property suite as Spark jobs."""

import pyspark.sql.functions as F

from subont import fixtures
from subont.rf2 import triples_from_nnf
from subont.verify import (
    verify_focus_equivalence,
    verify_transitive_closure_equal,
    verify_triple_integrity,
)


def test_v1_focus_equivalence(spark, dummy_extraction):
    ont, res = dummy_extraction
    focus = spark.createDataFrame([(fixtures.FOCUS,)], "concept_id long")
    diff = verify_focus_equivalence(ont, res.src_cl, res.sub, res.sub_cl, focus)
    assert diff.isEmpty(), diff.collect()


def test_v2_closure_equality(spark, dummy_extraction):
    ont, res = dummy_extraction
    sig = res.sub.class_signature()
    diff = verify_transitive_closure_equal(res.src_cl, res.sub_cl, sig)
    assert diff.isEmpty(), diff.collect()


def test_v3_triple_integrity(spark, dummy_extraction):
    ont, res = dummy_extraction
    triples = triples_from_nnf(res.nnf_rows, res.prop_defs, res.sub)
    sig = res.sub.class_signature()
    roles = res.sub.role_signature().unionByName(
        res.sub.subprops.select(F.col("child").alias("role_id"))
    ).unionByName(res.sub.subprops.select(F.col("parent").alias("role_id"))).distinct()
    orphans = verify_triple_integrity(triples, sig, roles)
    assert orphans.isEmpty(), orphans.collect()
