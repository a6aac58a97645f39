"""SNOMED-scale synthetic generator gates (subont/synth.py).

The generator exists to stress classify/compute_subontology at the
reference's production scale (README.md:60); these tests pin its
correctness contract at small n: determinism, structural
cycle-freedom, semi-naive ≡ brute-force classification, and that the
generated definitions/GCIs actually fire (a generator whose
equivalences never fire would not exercise R-equiv at scale)."""

import pyspark.sql.functions as F

from subont.closure import classify
from subont.synth import synthetic_ontology


def test_synth_classifies_and_matches_naive(spark, monkeypatch):
    monkeypatch.setenv("SUBONT_LOCAL_CLASSIFY", "off")  # gate the DISTRIBUTED semi-naive path
    ont = synthetic_ontology(spark, n_concepts=400, seed=0, gci_every=64)
    cl = classify(ont)  # raises on equivalence cycles → cycle-freedom gate
    slow = classify(ont, naive=True)
    assert cl.closure.exceptAll(slow.closure).isEmpty()
    assert slow.closure.exceptAll(cl.closure).isEmpty()

    # every GCI and every defined concept has a real subscriber
    sup = ont.axioms.filter("is_gci").select(F.col("sub_id").alias("g"), "gci_super")
    assert sup.count() > 0
    fired = sup.join(
        cl.closure,
        (cl.closure.desc != sup.gci_super) & (cl.closure.anc == sup.g),
        "left_semi",
    )
    assert fired.count() == sup.count()
    eq = ont.axioms.filter("is_equiv and not is_gci").select(F.col("sub_id").alias("a"))
    assert eq.count() > 0
    ehit = eq.join(cl.closure, cl.closure.anc == eq.a, "left_semi")
    assert ehit.count() == eq.count()


def test_synth_deterministic_and_seed_sensitive(spark):
    a = synthetic_ontology(spark, n_concepts=300, seed=7)
    b = synthetic_ontology(spark, n_concepts=300, seed=7)
    assert a.axioms.exceptAll(b.axioms).isEmpty()
    assert b.axioms.exceptAll(a.axioms).isEmpty()
    c = synthetic_ontology(spark, n_concepts=300, seed=8)
    assert not a.axioms.exceptAll(c.axioms).isEmpty()
