"""Test fixtures mirroring the reference CI resources.

``dummy_ontology`` re-encodes src/test/resources/dummy-sct-ontology.owl
(12 concepts, one EquivalentClasses with a nested restriction at :80,
rest SubClassOf + one SubObjectPropertyOf).  ``EXPECTED_TRIPLES`` is the
full relationship set the reference emits for subset {362969004} with
-output-rf2, derived from the assertions in
SubontologyExtractionTest.java:56-69 plus the NNF semantics
(generated relationship ids and group numbers are throw-away per the
reference README.md:69; comparison is on (subj, pred, obj, group)).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .model import And, Ontology, OntologyBuilder, Some

FOCUS = 362969004

# concept labels from the dummy ontology (for annotations / RF2 descriptions)
DUMMY_LABELS = {
    113331007: "Structure of endocrine system (body structure)",
    116680003: "Is a (attribute)",
    138875005: "SNOMED CT Concept (SNOMED RT+CTV3)",
    362969004: "Disorder of endocrine system (disorder)",
    404684003: "Clinical finding (finding)",
    410662002: "Concept model attribute (attribute)",
    723594008: "All precoordinated SNOMED CT content (foundation metadata concept)",
    723596005: "All SNOMED CT content (foundation metadata concept)",
    762705008: "Concept model object attribute (attribute)",
    762706009: "Concept model data attribute (attribute)",
    900000000000441003: "SNOMED CT Model Component (metadata)",
    363698007: "Finding site (attribute)",
}


def dummy_ontology(spark: SparkSession) -> Ontology:
    b = OntologyBuilder()
    b.add_subclass(113331007, 138875005)
    b.add_subclass(116680003, 900000000000441003)
    b.add_equiv(
        362969004,
        And([404684003, Some(609096000, Some(363698007, 113331007))]),
    )
    b.add_subclass(404684003, 138875005)
    b.add_subclass(410662002, 900000000000441003)
    b.add_subclass(723594008, 900000000000441003)
    b.add_subclass(723596005, 723594008)
    b.add_subclass(762705008, 410662002)
    b.add_subclass(762706009, 410662002)
    b.add_subclass(900000000000441003, 138875005)
    b.add_subproperty(363698007, 762705008)
    for cid, label in DUMMY_LABELS.items():
        b.add_annotation(cid, "rdfs:label", label)
    return b.build(spark)


# (subj, pred, obj, group) — IS-A rows asserted by the reference test,
# plus the focus concept's NNF rows (IS-A to proximal parent + grouped
# attribute) and the 113331007 closure-completion row.
EXPECTED_TRIPLES = frozenset(
    {
        (362969004, 116680003, 404684003, 0),
        (362969004, 363698007, 113331007, 1),
        (404684003, 116680003, 138875005, 0),
        (113331007, 116680003, 138875005, 0),
        (900000000000441003, 116680003, 138875005, 0),
        (410662002, 116680003, 900000000000441003, 0),
        (762705008, 116680003, 410662002, 0),
        (762706009, 116680003, 410662002, 0),
        (363698007, 116680003, 762705008, 0),
    }
)

# Parent map asserted verbatim at SubontologyExtractionTest.java:60-69.
EXPECTED_PARENTS = {
    404684003: {138875005},
    363698007: {762705008},
    762705008: {410662002},
    410662002: {900000000000441003},
    900000000000441003: {138875005},
}
