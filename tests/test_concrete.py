"""Concrete-domain (data-has-value) values end-to-end.

The reference names OWLDataHasValue restrictions like object PVs
(IntroducedNameHandler.java:77), carries them through definition
generation (DefinitionGenerator.java:52-53,
DefinitionGeneratorAbstract.java:53-54) and routes their relationship
rows to the sct2_RelationshipConcreteValues file with a `value` column
in place of destinationId (RF2Printer.java:207-254, rel.isConcrete()).
"""

import pyspark.sql.functions as F
import pytest

from subont import fixtures
from subont.closure import classify
from subont.definitions import nnf_definitions
from subont.model import Has, OntologyBuilder, Some, pv_id_for
from subont.owl_io import parse_functional, render_axioms
from subont.rf2 import relationship_rf2_files, triples_from_nnf


@pytest.fixture(scope="module")
def concrete(spark):
    ont = fixtures.concrete_ontology(spark)
    cl = classify(ont)
    return ont, cl


def test_data_pv_reified_with_value(spark, concrete):
    ont, _ = concrete
    data_rows = {r.value for r in ont.pvs.filter(F.col("is_data")).collect()}
    assert data_rows == {fixtures.CONCRETE_STRENGTH, fixtures.CONCRETE_COUNT}
    # object PVs unchanged: is_data false, value null
    obj = ont.pvs.filter(~F.col("is_data"))
    assert obj.filter(F.col("value").isNotNull()).isEmpty()


def test_data_pv_subsumption_role_hierarchy(spark):
    """Has(r1,v) ⊑ Has(r2,v) iff r1 ⊑* r2 and values are EQUAL."""
    b = OntologyBuilder()
    b.add_subproperty(101, 102, data=True)
    b.add_subclass(1, Has(101, '"5"^^xsd:decimal'))
    b.add_subclass(2, Has(102, '"5"^^xsd:decimal'))
    b.add_subclass(3, Has(102, '"6"^^xsd:decimal'))
    ont = b.build(spark)
    cl = classify(ont)
    pv_r2_v5 = pv_id_for(Has(102, '"5"^^xsd:decimal'))
    pv_r2_v6 = pv_id_for(Has(102, '"6"^^xsd:decimal'))
    anc1 = {r.anc for r in cl.closure.filter(F.col("desc") == 1).collect()}
    assert pv_r2_v5 in anc1          # role-subsumed, same value
    assert pv_r2_v6 not in anc1      # different value never subsumes
    anc3 = {r.anc for r in cl.closure.filter(F.col("desc") == 3).collect()}
    assert pv_r2_v5 not in anc3


def test_nnf_concrete_triples(spark, concrete):
    ont, cl = concrete
    focus = spark.createDataFrame([(fixtures.CONCRETE_FOCUS,)], "sub_id long")
    nnf = nnf_definitions(ont, cl, focus)
    assert nnf.new_pvs.isEmpty()  # no role-group rebuild on this fixture
    triples = triples_from_nnf(
        nnf.rows, ont.subprops.limit(0), ont
    ).filter(F.col("subj") == fixtures.CONCRETE_FOCUS)
    got = {(r.subj, r.pred, r.obj, r.rel_group, r.value) for r in triples.collect()}
    assert got == set(fixtures.EXPECTED_CONCRETE_TRIPLES)


def test_relationship_files_split_shared_sequence(spark, concrete):
    ont, cl = concrete
    focus = spark.createDataFrame([(fixtures.CONCRETE_FOCUS,)], "sub_id long")
    nnf = nnf_definitions(ont, cl, focus)
    triples = triples_from_nnf(nnf.rows, ont.subprops.limit(0), ont)
    standard, concrete_rows = relationship_rf2_files(triples)
    s = standard.collect()
    c = concrete_rows.collect()
    assert len(s) + len(c) == triples.count()
    assert {r.value for r in c} == {"#250", "#1"}
    assert "destinationId" in standard.columns and "value" not in standard.columns
    assert "value" in concrete_rows.columns and "destinationId" not in concrete_rows.columns
    # one shared id sequence across both files (RF2Printer.java:204,230)
    ids = [r.id for r in s] + [r.id for r in c]
    assert len(set(ids)) == len(ids)
    bodies = sorted(int(i[: -len("100000302") - 1]) for i in ids)
    assert bodies == list(range(101, 101 + len(ids)))


def test_parse_and_render_data_has_value(spark):
    text = """
Ontology(<http://snomed.info/sct/900000000000207008>
SubClassOf(:763158003 :138875005)
EquivalentClasses(:781087000 ObjectIntersectionOf(:763158003 DataHasValue(:1142139005 "2 mg"^^xsd:string)))
SubDataPropertyOf(:1142139005 :762706009)
)
"""
    b = parse_functional(text)
    ont = b.build(spark)
    pv = ont.pvs.filter(F.col("is_data")).collect()
    assert len(pv) == 1 and pv[0].value == '"2 mg"^^xsd:string'
    rendered = "\n".join(render_axioms(ont))
    assert 'DataHasValue(<http://snomed.info/id/1142139005> "2 mg"^^xsd:string)' in rendered
    # string (non-numeric) literals keep quotes in the RF2 encoding
    from subont.rf2 import _rf2_value_col

    row = (
        spark.createDataFrame([('"2 mg"^^xsd:string',)], "v string")
        .select(_rf2_value_col(F.col("v")).alias("rf2"))
        .collect()[0]
    )
    assert row.rf2 == '"2 mg"'


def test_concrete_extraction_pipeline(spark):
    """Full P1-P15 pipeline over the concrete fixture: the data PVs
    survive expansion/NNF and split into the two relationship files."""
    from subont.pipeline import compute_subontology

    ont = fixtures.concrete_ontology(spark)
    res = compute_subontology(
        spark, ont, [fixtures.CONCRETE_FOCUS], compute_rf2=False
    )
    triples = triples_from_nnf(res.nnf_rows, res.prop_defs, res.sub)
    focus_rows = {
        (r.pred, r.obj, r.rel_group, r.value)
        for r in triples.filter(F.col("subj") == fixtures.CONCRETE_FOCUS).collect()
    }
    assert (1142135004, None, 1, "#250") in focus_rows
    assert (1142139005, None, 0, "#1") in focus_rows
    assert (732943007, 372687004, 1, None) in focus_rows
    # property definitions include the data attribute hierarchy
    prop_pairs = {(r.subj, r.obj) for r in triples.filter(F.col("pred") == 116680003).collect()}
    assert (1142135004, 762706009) in prop_pairs
