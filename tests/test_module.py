"""A10 module extraction tests (ModuleExtractionHandler.java:18-37 /
ExtractModuleTest.java:18-34 semantics, restricted to the EL fragment).

Oracle: the defining property of locality modules — every subsumption
between entities of Σ ∪ sig(M) holds in the module iff it holds in the
full ontology (checked with the closure kernel on both sides)."""

import pyspark.sql.functions as F

from subont import fixtures
from subont.closure import classify
from subont.model import OntologyBuilder, Some
from subont.module import locality_module, star_module


def _tiny(spark):
    b = OntologyBuilder()
    b.add_subclass(1, 2)
    b.add_subclass(2, 3)
    b.add_subclass(4, 5)
    b.add_equiv(6, Some(100, 1))
    b.add_subclass(7, Some(101, 4))
    return b.build(spark)


def _sig(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def _axiom_keys(ont):
    return {
        (r.sub_id, r.is_equiv, tuple((x["kind"], x["ref_id"]) for x in r.rhs))
        for r in ont.axioms.collect()
    }


def test_bot_module_chain(spark):
    ont = _tiny(spark)
    m = locality_module(ont, _sig(spark, [1]), "bot")
    keys = _axiom_keys(m)
    # 1 ⊑ 2 pulls 2 ⊑ 3 in; nothing else is non-local
    assert {k[0] for k in keys} == {1, 2}
    # ⊥-local equivalence (6 ≡ ∃r.1 with r ∉ Σ) stays out
    assert all(not k[1] for k in keys)


def test_star_module_definition(spark):
    ont = _tiny(spark)
    m = star_module(ont, _sig(spark, [6]))
    keys = _axiom_keys(m)
    # the definition of 6 is kept; the ⊤-pass drops the 1 ⊑ 2 chain
    assert {k[0] for k in keys} == {6}
    assert all(k[1] for k in keys)


def test_module_is_subset_and_monotone(spark):
    ont = _tiny(spark)
    m1 = star_module(ont, _sig(spark, [1]))
    all_keys = _axiom_keys(ont)
    assert _axiom_keys(m1) <= all_keys
    m2 = locality_module(ont, _sig(spark, [1, 6, 7]), "bot")
    assert _axiom_keys(m1).issubset(_axiom_keys(m2) | _axiom_keys(m1))
    assert len(_axiom_keys(m2)) >= len(_axiom_keys(locality_module(ont, _sig(spark, [1]), "bot")))


def test_locality_rounds_are_delta_bounded(spark):
    """Semi-naive discipline: each round tests only axioms whose
    signature meets the Σ-delta — never the whole axiom table again."""
    b = OntologyBuilder()
    # chain 1⊑2⊑…⊑6 forces multiple signature-growth rounds
    for i in range(1, 6):
        b.add_subclass(i, i + 1)
    # 20 axioms fully disjoint from the chain's signature
    for i in range(100, 120):
        b.add_subclass(i, 999)
    ont = b.build(spark)
    stats: list[int] = []
    m = locality_module(ont, _sig(spark, [1]), "bot", round_stats=stats)
    assert {r.sub_id for r in m.axioms.collect()} == {1, 2, 3, 4, 5}
    # round 1 candidates: only the axioms touching Σ0={1} (1 axiom),
    # and NO round re-tests the 20 disjoint axioms
    assert stats[0] == 1
    assert max(stats) <= 2  # per-round work ∝ delta, not |axioms|=25
    assert sum(stats) < ont.axioms.count()


def test_star_module_preserves_entailments_dummy(spark):
    """Module property on the reference CI fixture: subsumptions over the
    module's named signature agree between module and full ontology."""
    ont = fixtures.dummy_ontology(spark)
    sig = _sig(spark, [fixtures.FOCUS])
    m = star_module(ont, sig)

    full_cl = classify(ont)
    mod_cl = classify(m)
    mod_sig = m.class_signature().withColumnRenamed("concept_id", "id")

    def restricted(cl):
        return (
            cl.closure.filter((F.col("desc") > 0) & (F.col("anc") > 0))
            .join(mod_sig.withColumnRenamed("id", "desc"), "desc", "left_semi")
            .join(mod_sig.withColumnRenamed("id", "anc"), "anc", "left_semi")
        )

    full_r = restricted(full_cl)
    mod_r = restricted(mod_cl)
    assert full_r.exceptAll(mod_r).isEmpty(), "module loses entailments"
    assert mod_r.exceptAll(full_r).isEmpty(), "module invents entailments"
    # the focus definition made it into the module
    assert m.axioms.filter(F.col("sub_id") == fixtures.FOCUS).count() >= 1
    # module is a strict subset of the source ontology here
    assert m.axioms.count() < ont.axioms.count()
