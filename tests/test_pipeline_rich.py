"""Extraction on a richer synthetic ontology exercising the paths the
dummy CI fixture doesn't: GCIs (D8/D9/P3/P7), expansion rule 2 via
role chains and transitivity (P6), multi-level supporting definitions
(P4/P5), closure completion over deeper hierarchies (P10) and shrink
(P11).  The oracle is the reference's own -verify-subontology property
pair (V1/V2) plus targeted structural assertions.

Ontology recipe follows manualtests/CreateTestOntology.java:29-52."""

import pyspark.sql.functions as F
import pytest

from subont.model import And, IS_A, OntologyBuilder, Some
from subont.pipeline import compute_subontology
from subont.rf2 import triples_from_nnf
from subont.verify import verify_focus_equivalence, verify_transitive_closure_equal

TOP = 138875005
R, S, T_ROLE = 100100, 100200, 100300


@pytest.fixture(scope="module")
def rich(spark):
    b = OntologyBuilder()
    # primitive backbone
    b.add_subclass(10, TOP)      # grouper branch A
    b.add_subclass(11, 10)
    b.add_subclass(12, 11)
    b.add_subclass(20, TOP)      # grouper branch B (fillers)
    b.add_subclass(21, 20)
    b.add_subclass(22, 21)
    # defined supporting concept above the focus: 30 ≡ 11 ⊓ ∃R.21
    b.add_equiv(30, And([11, Some(R, 21)]))
    # focus: 40 ≡ 30 ⊓ ∃S.22  (pulls 30's definition via rule 1)
    b.add_equiv(40, And([30, Some(S, 22)]))
    # GCI attached to 11: 12 ⊓ ∃R.22 ⊑ 11 — names rank under 11
    b.add_gci(And([12, Some(R, 22)]), 11)
    # role chain R∘S ⊑ R and transitive T: rule-2 triggers
    b.role_chains.append(dict(super_role=R, left_role=R, right_role=S))
    b.transitive_roles.add(T_ROLE)
    # 50 ≡ 21 ⊓ ∃S.12 : filler definition demanded by the chain when 40
    # (via ∃R.21) is expanded?  21 primitive → rule 2 checks its def
    # 60 ≡ 22 ⊓ ∃T.61, 61 ≡ 21 ⊓ ∃T.22: transitive-role filler pair
    b.add_subclass(61, 21)
    b.add_equiv(60, And([22, Some(T_ROLE, 61)]))
    b.add_subclass(70, And([10, Some(T_ROLE, 60)]))  # focus 2, primitive w/ ∃T
    return b.build(spark)


@pytest.fixture(scope="module")
def rich_extraction(spark, rich):
    return compute_subontology(spark, rich, [40, 70], compute_rf2=True)


def test_rich_v1_v2_properties(spark, rich, rich_extraction):
    res = rich_extraction
    focus = spark.createDataFrame([(40,), (70,)], "concept_id long")
    d1 = verify_focus_equivalence(rich, res.src_cl, res.sub, res.sub_cl, focus)
    assert d1.isEmpty(), d1.collect()
    d2 = verify_transitive_closure_equal(res.src_cl, res.sub_cl, res.sub.class_signature())
    assert d2.isEmpty(), d2.collect()


def test_rich_supporting_definitions(rich_extraction):
    res = rich_extraction
    defined = {r.concept_id for r in res.defined_supporting.collect()}
    # 60 is the transitive-role filler of focus 70's ∃T.60 → rule 2
    assert 60 in defined
    # 30 is NOT defined: the authoring form inlines non-primitive stated
    # parents via proximal primitives (DefinitionGeneratorAbstract.java:76-90),
    # so 30 never enters the subontology signature — reference-faithful
    assert 30 not in defined


def test_rich_triples_sound(spark, rich_extraction):
    res = rich_extraction
    triples = triples_from_nnf(res.nnf_rows, res.prop_defs, res.sub)
    isa = {(r.subj, r.obj) for r in triples.filter(F.col("pred") == IS_A).collect()}
    # IS-A rows must be entailed by the source ontology
    pairs = spark.createDataFrame(list(isa), "sub_id long, super_id long")
    bad = res.src_cl.entails(pairs).filter(~F.col("entailed"))
    assert bad.isEmpty(), bad.collect()
    # focus 40's nearest named parent is 11 (30 was inlined away by the
    # authoring form; 11 is the proximal primitive)
    assert (40, 11) in isa
    assert (40, 30) not in isa
    # attribute rows present for the focus defs
    attrs = {(r.subj, r.pred, r.obj) for r in triples.filter(F.col("pred") != IS_A).collect()}
    assert (40, S, 22) in attrs
