"""subont — a PySpark-native knowledge-graph construction engine.

Re-creates the computation of IHTSDO/snomed-subontology-extraction
(reference at /root/reference, v2.1.0, Java/OWL-API/ELK) as distributed
DataFrame operators:

* ``subont.closure``      — EL classification as iterative closure joins
                            (replaces ELK, OntologyReasoningService.java)
* ``subont.reduce``       — antichain redundancy elimination
                            (OntologyReasoningService.eliminateWeakerClasses)
* ``subont.model``        — relational ontology encoding + reification
                            (IntroducedNameHandler.java)
* ``subont.definitions``  — abstract / NNF definition generation
                            (DefinitionGenerator*.java)
* ``subont.pipeline``     — subontology extraction orchestration
                            (SubOntologyExtractionHandler.java)
* ``subont.rf2``          — RF2-style triple materialization + sinks
                            (RF2Printer.java, RF2ExtractionWriter.java)
* ``subont.corpus`` / ``subont.extract`` / ``subont.canon``
                          — corpus-scale front-end: mention detection,
                            entity linking, connected-component
                            canonicalization (new-engine only)
* ``subont.textops`` / ``subont.ann``
                          — dedup / text-quality / similarity-search
                            operators for training-data pipelines
"""

__version__ = "0.1.0"
