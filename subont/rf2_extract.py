"""S7/S9: full RF2 snapshot extraction + OWL→RF2 browser conversion.

S7 — signature-filtered five-file extraction mirroring the reference's
streaming RF2ExtractionWriter (services/RF2ExtractionWriter.java:51-149)
driven by SubOntologyRF2ConversionService.convertSubOntologytoRF2
(services/SubOntologyRF2ConversionService.java:40-70):

* Concept          — active rows gated on entity ids
* Description      — active rows gated on conceptId ∈ entity ids,
                     typeId ≠ 900000000000550004
* TextDefinition   — same gate, typeId = 900000000000550004
* LanguageRefset   — active rows gated on referencedComponentId ∈ the
                     KEPT description ids (the second semi-join the
                     reference realises via its descriptionIds set,
                     RF2ExtractionWriter.java:108-137)
* OWL-axiom refset — active rows gated on referencedComponentId ∈
                     entity ids (RF2ExtractionWriter.java:138-148)

Every gate is a semi-join: entity ids are broadcast (subontology-sized
dimension vs a 100 TB-scale fact scan); the description-id gate is a
plain shuffle semi-join (both sides scale with the extract).

S9 — OWLtoRF2Service parity (writers/OWLtoRF2Service.java:38-226):
concept/description/textdef/langrefset/owl-refset tables derived from
the ontology's axioms and rdfs:label / skos:prefLabel annotations, with
the reference's hard-coded metadata rows.  Member/description ids are
deterministic (uuid5 / rank-based dummy sequence) instead of the
reference's random UUIDs and HashMap-iteration counters — documented
divergence for retry-stability; the reference itself calls these ids
throw-away.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .model import CORE_MODULE, Ontology
from .rf2 import _global_row_number, uuid5_col, write_rf2_named
from .rf2_io import read_rf2_tsv

TEXT_DEFINITION_TYPE = 900000000000550004   # Definition (core metadata concept)
FSN_TYPE = 900000000000003001               # Fully specified name
SYNONYM_TYPE = 900000000000013009           # Synonym
FULLY_DEFINED = 900000000000073002
PRIMITIVE = 900000000000074008
PREFERRED = 900000000000548007
US_LANG_REFSET = 900000000000509007
CASE_INSENSITIVE = 900000000000448009
OBJECT_ATTRIBUTE_TOP = 762705008

# Metadata concept ids force-included in every extraction
# (SubOntologyRF2ConversionService.java:83-120)
RF2_EXTRACTION_METADATA = [
    138875005, 900000000000441003, 106237007, 246061005, 116680003, 410662002,
    900000000000444006, 900000000000074008, 900000000000073002,
    900000000000446008, 900000000000003001, 900000000000550004, 900000000000013009,
    900000000000447004, 900000000000448009, 900000000000020002, 900000000000017005,
    900000000000449001, 900000000000006009, 900000000000010007, 900000000000011006,
    900000000000225001, 900000000000227009,
    900000000000450001, 900000000000451002, 900000000000452009,
    900000000000511003, 900000000000548007, 900000000000549004,
]

CONCEPT_HEADER = ["id", "effectiveTime", "active", "moduleId", "definitionStatusId"]
DESCRIPTION_HEADER = [
    "id", "effectiveTime", "active", "moduleId", "conceptId",
    "languageCode", "typeId", "term", "caseSignificanceId",
]
LANG_REFSET_HEADER = [
    "id", "effectiveTime", "active", "moduleId", "refsetId",
    "referencedComponentId", "acceptabilityId",
]
OWL_REFSET_HEADER = [
    "id", "effectiveTime", "active", "moduleId", "refsetId",
    "referencedComponentId", "owlExpression",
]


def _empty(spark: SparkSession, header: list[str]) -> DataFrame:
    return spark.createDataFrame([], ", ".join(f"`{c}` string" for c in header))


def _find(snapshot_dir: str, *patterns: str) -> list[str]:
    """Locate RF2 files under a snapshot root (handles both a bare
    Terminology directory and a Snapshot root with Terminology/ +
    Refset/Language/ subdirs — the reference reads a whole archive)."""
    hits: list[str] = []
    for pat in patterns:
        hits += glob.glob(os.path.join(snapshot_dir, pat))
        hits += glob.glob(os.path.join(snapshot_dir, "**", pat), recursive=True)
    return sorted(set(hits))


def _gate(df: DataFrame, ids: DataFrame, col: str, broadcast: bool = True) -> DataFrame:
    dim = ids.select(F.col(ids.columns[0]).cast("string").alias(col)).distinct()
    if broadcast:
        dim = F.broadcast(dim)
    # re-select the input column order: a USING-column join moves the
    # key first, which would scramble the RF2 header column order
    return df.join(dim, col, "left_semi").select(*df.columns)


def extract_rf2_snapshot(
    spark: SparkSession,
    snapshot_dir: str,
    entity_ids: DataFrame,
    out_dir: str,
    include_metadata: bool = True,
    date: str | None = None,
) -> dict[str, DataFrame]:
    """S7: five-file signature-filtered extraction.  Returns the five
    gated DataFrames and writes them under ``out_dir`` in the
    reference's Snapshot/ layout with date-stamped single-file names
    (``*_INT_<yyyyMMdd>.txt``, RF2ExtractionWriter.java:51-75).
    ``entity_ids`` is a one-column DataFrame of concept ids
    (sub ∪ NNF signature)."""
    ids = entity_ids.select(F.col(entity_ids.columns[0]).cast("long").alias("cid"))
    if include_metadata:
        meta = spark.createDataFrame([(i,) for i in RF2_EXTRACTION_METADATA], "cid long")
        ids = ids.unionByName(meta).distinct()

    def read_all(paths: list[str], header: list[str]) -> DataFrame:
        if not paths:
            return _empty(spark, header)
        df = read_rf2_tsv(spark, paths[0])
        for p in paths[1:]:
            df = df.unionByName(read_rf2_tsv(spark, p))
        return df

    concepts = _gate(
        read_all(_find(snapshot_dir, "sct2_Concept_*"), CONCEPT_HEADER), ids, "id"
    )
    all_desc = read_all(
        _find(snapshot_dir, "sct2_Description_*") + _find(snapshot_dir, "sct2_TextDefinition_*"),
        DESCRIPTION_HEADER,
    )
    kept_desc = _gate(all_desc, ids, "conceptId")
    descriptions = kept_desc.filter(F.col("typeId") != str(TEXT_DEFINITION_TYPE))
    textdefs = kept_desc.filter(F.col("typeId") == str(TEXT_DEFINITION_TYPE))
    kept_desc_ids = kept_desc.select(F.col("id").alias("did")).distinct()

    lang = read_all(_find(snapshot_dir, "der2_cRefset_Language*"), LANG_REFSET_HEADER)
    # description ids scale with the extract, not with the corpus →
    # plain (non-broadcast) semi-join; AQE converts when small
    lang_kept = _gate(lang, kept_desc_ids, "referencedComponentId", broadcast=False)

    owl = read_all(_find(snapshot_dir, "sct2_sRefset_OWL*"), OWL_REFSET_HEADER)
    owl_kept = _gate(owl, ids, "referencedComponentId")

    tables = {
        "Snapshot/Terminology/sct2_Concept_Snapshot": concepts,
        "Snapshot/Terminology/sct2_Description_Snapshot-en": descriptions,
        "Snapshot/Terminology/sct2_TextDefinition_Snapshot-en": textdefs,
        "Snapshot/Refset/Language/der2_cRefset_LanguageSnapshot-en": lang_kept,
        "Snapshot/Terminology/sct2_sRefset_OWLExpressionSnapshot": owl_kept,
    }
    # dated single-file names matching RF2ExtractionWriter.java:51-75
    # (keys above stay the undated logical names for callers/tests)
    import datetime as _dt

    date = date or _dt.date.today().strftime("%Y%m%d")
    for rel, df in tables.items():
        write_rf2_named(
            df,
            os.path.join(out_dir, os.path.dirname(rel)),
            f"{os.path.basename(rel)}_INT_{date}.txt",
        )
    return tables


# ---------------------------------------------------------------------------
# S9: OWL → RF2 browser tables (OWLtoRF2Service.java parity)
# ---------------------------------------------------------------------------

def _label_table(ont: Ontology, prop: str) -> DataFrame:
    """(concept_id, term) for one annotation property; one row per
    concept (min(term) breaks duplicate-annotation ties, where the
    reference's HashMap.put keeps an arbitrary last one)."""
    return (
        ont.annotations.filter(F.col("prop") == prop)
        .groupBy(F.col("entity_id").alias("concept_id"))
        .agg(F.min("value").alias("term"))
    )


def _all_roles(ont: Ontology) -> DataFrame:
    """Object properties in signature: PV roles + subproperty-axiom
    endpoints (OWLOntology.getObjectPropertiesInSignature semantics)."""
    return (
        ont.role_signature()
        .unionByName(ont.subprops.select(F.col("child").alias("role_id")))
        .unionByName(ont.subprops.select(F.col("parent").alias("role_id")))
        .distinct()
    )


def _described_concepts(ont: Ontology, rendered: DataFrame | None = None) -> DataFrame:
    """Concept ids keyed by an axiom in the OWL refset — the reference's
    conceptAxioms.keySet() (OWLtoRF2Service.java:68-95) plus the four
    hard-coded metadata ids (:111-118).  ``rendered`` lets the caller
    pass a checkpointed render_axioms_df so the (expensive) axiom render
    is evaluated once per conversion, not once per referencing table."""
    from .owl_io import render_axioms_df

    spark = ont.axioms.sparkSession
    meta = spark.createDataFrame(
        [(138875005,), (900000000000441003,), (410662002,), (762705008,)], "ref_id long"
    )
    if rendered is None:
        rendered = render_axioms_df(ont)
    return (
        rendered.select("ref_id").unionByName(
            _all_roles(ont).select(F.col("role_id").alias("ref_id"))
        ).unionByName(meta).filter(F.col("ref_id") > 0).distinct()
    )


_RF2_TABLE_KEYS = {
    "concept": "SnomedCT/Snapshot/Terminology/sct2_Concept_Snapshot",
    "description": "SnomedCT/Snapshot/Terminology/sct2_Description_Snapshot-en",
    "textdef": "SnomedCT/Snapshot/Terminology/sct2_TextDefinition_Snapshot-en",
    "lang": "SnomedCT/Snapshot/Refset/Language/der2_cRefset_LanguageSnapshot-en",
    "owl": "SnomedCT/Snapshot/Terminology/sct2_sRefset_OWLExpressionSnapshot",
    "rel": "SnomedCT/Snapshot/Terminology/sct2_Relationship_Snapshot",
}

RELATIONSHIP_HEADER = [
    "id", "effectiveTime", "active", "moduleId", "sourceId", "destinationId",
    "relationshipGroup", "typeId", "characteristicTypeId", "modifierId",
]


def _maybe_local_owl_rf2_tables(ont: Ontology, effective_time: str):
    """Size-gated in-process twin of owl_to_rf2_tables: every input is
    subontology-bounded (axioms/PVs/subprops/labels), and the distributed
    plan otherwise pays ~10-20 s of per-table planning + scheduling for
    kilobyte outputs.  Returns {key: (header, sorted row tuples)} or None
    (over-cap / unrenderable → caller uses the distributed path).  Row
    CONTENT is identical to the distributed tables (equivalence-gated in
    tests/test_rf2_extract.py); local rows are additionally fully sorted,
    making the zip byte-stable run-over-run."""
    import os as _os
    import uuid as _uuid

    if _os.environ.get("SUBONT_LOCAL_RF2", "auto") == "off":
        return None
    from .owl_io import _local_ontology_frames, _local_render_rows
    frames = _local_ontology_frames(ont)
    if frames is None:
        return None
    rendered = _local_render_rows(*frames)
    if rendered is None:
        return None
    ax, pv, sp = frames
    from .closure import _LOCAL_CLASSIFY_MAX_AXIOMS

    an = ont.annotations.filter(
        F.col("prop").isin("rdfs:label", "skos:prefLabel")
    ).limit(_LOCAL_CLASSIFY_MAX_AXIOMS + 1).toPandas()
    if len(an) > _LOCAL_CLASSIFY_MAX_AXIOMS:
        return None

    et, module = effective_time, str(CORE_MODULE)

    def u5(name: str) -> str:
        return str(_uuid.uuid5(_uuid.NAMESPACE_URL, name))

    # ---- signature roles: PV roles reachable from axioms + subprop ends
    pvrow = {int(r.pv_id): r for r in pv.itertuples(index=False)}
    used: set = set()
    frontier: list = []
    for rhs in ax["rhs"]:
        for ref in rhs:
            if ref["kind"] == "p":
                rid = int(ref["ref_id"])
                if rid not in used:
                    used.add(rid)
                    frontier.append(rid)
    while frontier:
        nxt: list = []
        for pid in frontier:
            row = pvrow.get(pid)
            if row is None:
                continue
            refs = row.filler_refs
            if refs is None or (isinstance(refs, float) and refs != refs):
                continue
            for ref in refs:
                if ref["kind"] == "p":
                    rid = int(ref["ref_id"])
                    if rid not in used:
                        used.add(rid)
                        nxt.append(rid)
        frontier = nxt
    roles = {int(pvrow[p].role_id) for p in used if p in pvrow}
    for r in sp.itertuples(index=False):
        roles.add(int(r.child))
        roles.add(int(r.parent))

    # ---- concept table ---------------------------------------------------
    defined = {
        int(r.sub_id)
        for r in ax.itertuples(index=False)
        if r.is_equiv and not r.is_gci
    }
    described = {rid for rid, _ in rendered} | roles | {
        138875005, 900000000000441003, 410662002, 762705008,
    }
    concepts = sorted(
        (str(i), et, "1", module,
         str(FULLY_DEFINED) if i in defined else str(PRIMITIVE))
        for i in described if i > 0
    )

    # ---- descriptions / textdefs / language refset ------------------------
    def labels(prop: str) -> list:
        best: dict = {}
        for r in an.itertuples(index=False):
            if r.prop == prop:
                cid = int(r.entity_id)
                if cid not in best or r.value < best[cid]:
                    best[cid] = r.value
        return sorted(best.items())  # rank by concept_id (= _global_row_number)

    def desc_rows(src: list, type_id: int, offset: int) -> list:
        return [
            (str(100000000 - 1 + offset + i) + "011", et, "1", module,
             str(cid), "en", str(type_id), term, str(CASE_INSENSITIVE))
            for i, (cid, term) in enumerate(src, start=1)
        ]

    fsn_rows = desc_rows(labels("rdfs:label"), FSN_TYPE, 0)
    syn_rows = desc_rows(labels("skos:prefLabel"), SYNONYM_TYPE, len(fsn_rows))
    meta_desc = [
        ("517382016", et, "1", module, "138875005", "en", str(FULLY_DEFINED),
         "SNOMED CT Concept (SNOMED RT+CTV3)", str(CASE_INSENSITIVE)),
        ("900000000000952015", et, "1", module, "900000000000441003", "en",
         str(FULLY_DEFINED), "SNOMED CT Model Component (metadata)", "900000000000017005"),
        ("2466114012", et, "1", module, "410662002", "en", str(FULLY_DEFINED),
         "Concept model attribute (attribute)", str(CASE_INSENSITIVE)),
        ("3635487013", et, "1", module, "762705008", "en", str(FULLY_DEFINED),
         "Concept model object attribute (attribute)", str(CASE_INSENSITIVE)),
        ("3635487013", et, "1", module, "762705008", "en", str(FULLY_DEFINED),
         "Concept model object attribute", str(CASE_INSENSITIVE)),
        ("680946014", et, "1", module, "116680003", "en", str(FULLY_DEFINED),
         "Is a (attribute)", str(CASE_INSENSITIVE)),
    ]
    descriptions = sorted(fsn_rows + syn_rows + meta_desc)
    textdefs = sorted(fsn_rows)
    lang = sorted(
        (u5("lang|" + r[0]), et, "1", module, str(US_LANG_REFSET), r[0], str(PREFERRED))
        for r in fsn_rows
    )

    # ---- OWL expression refset --------------------------------------------
    owl_pairs = {
        (str(rid), expr.replace("<http://snomed.info/id/", ":").replace(">", ""))
        for rid, expr in rendered
    }
    owl_pairs |= {
        (str(r), f"SubObjectPropertyOf(:{r} :{OBJECT_ATTRIBUTE_TOP})")
        for r in roles if r != OBJECT_ATTRIBUTE_TOP
    }
    owl_pairs |= {
        ("762705008", "SubClassOf(:762705008 :410662002)"),
        ("410662002", "SubClassOf(:410662002 :900000000000441003)"),
        ("900000000000441003", "SubClassOf(:900000000000441003 :138875005)"),
    }
    owl_refset = sorted(
        (u5(f"{rc}|{expr}"), et, "1", module, "733073007", rc, expr)
        for rc, expr in owl_pairs
    )

    return {
        "concept": (CONCEPT_HEADER, concepts),
        "description": (DESCRIPTION_HEADER, descriptions),
        "textdef": (DESCRIPTION_HEADER, textdefs),
        "lang": (LANG_REFSET_HEADER, lang),
        "owl": (OWL_REFSET_HEADER, owl_refset),
        "rel": (RELATIONSHIP_HEADER, []),
    }


def owl_to_rf2_tables(
    ont: Ontology, effective_time: str = "0", _probe_local: bool = True
) -> dict[str, DataFrame]:
    """Every RF2 file of the reference's OWL→RF2 zip as a DataFrame
    (OWLtoRF2Service.java:97-226).  Fully distributed; deterministic ids.
    ``_probe_local=False`` skips the local-kernel probe when the caller
    already probed (the probe costs three bounded limit-collect jobs)."""
    from .owl_io import render_axioms_df
    from .util import chk

    spark = ont.axioms.sparkSession
    local = _maybe_local_owl_rf2_tables(ont, effective_time) if _probe_local else None
    if local is not None:
        import pandas as pd

        out: dict[str, DataFrame] = {}
        for key, (header, rows) in local.items():
            schema = ", ".join(f"`{c}` string" for c in header)
            out[_RF2_TABLE_KEYS[key]] = (
                spark.createDataFrame(pd.DataFrame(rows, columns=header), schema)
                if rows else spark.createDataFrame([], schema)
            )
        return out
    et = F.lit(effective_time)
    module = F.lit(str(CORE_MODULE))

    # the axiom render is the most expensive subtree here and is probed
    # by BOTH the concept table (ref ids) and the OWL refset (expression
    # text) — checkpoint once, evaluate once
    rendered_ax = chk(render_axioms_df(ont))

    defined = (
        ont.axioms.filter(F.col("is_equiv") & ~F.col("is_gci"))
        .select(F.col("sub_id").alias("ref_id"))
        .distinct()
    )
    concepts = (
        _described_concepts(ont, rendered=rendered_ax)
        .join(defined.withColumn("_d", F.lit(True)), "ref_id", "left")
        .select(
            F.col("ref_id").cast("string").alias("id"),
            et.alias("effectiveTime"),
            F.lit("1").alias("active"),
            module.alias("moduleId"),
            F.when(F.col("_d"), F.lit(str(FULLY_DEFINED)))
            .otherwise(F.lit(str(PRIMITIVE)))
            .alias("definitionStatusId"),
        )
    )

    # label-derived description rows with the reference's dummy-sequence
    # ids "<100000000+n>011" (OWLtoRF2Service.java:125-146) — numbered by
    # concept-id rank (deterministic) instead of HashMap iteration order
    # fsn is re-read by descriptions, textdefs AND the language refset;
    # chk() pins it so the range-partition + window runs once
    fsn = chk(_global_row_number(_label_table(ont, "rdfs:label"), ["concept_id"]))
    n_fsn = fsn.count()
    syn = _global_row_number(_label_table(ont, "skos:prefLabel"), ["concept_id"]).withColumn(
        "rn", F.col("rn") + F.lit(n_fsn)
    )

    def desc_rows(src: DataFrame, type_id: int) -> DataFrame:
        return src.select(
            F.concat((F.col("rn") + F.lit(100000000 - 1)).cast("string"), F.lit("011")).alias("id"),
            et.alias("effectiveTime"),
            F.lit("1").alias("active"),
            module.alias("moduleId"),
            F.col("concept_id").cast("string").alias("conceptId"),
            F.lit("en").alias("languageCode"),
            F.lit(str(type_id)).alias("typeId"),
            F.col("term").alias("term"),
            F.lit(str(CASE_INSENSITIVE)).alias("caseSignificanceId"),
        )

    meta_desc = spark.createDataFrame(
        [
            ("517382016", effective_time, "1", str(CORE_MODULE), "138875005", "en",
             str(FULLY_DEFINED), "SNOMED CT Concept (SNOMED RT+CTV3)", str(CASE_INSENSITIVE)),
            ("900000000000952015", effective_time, "1", str(CORE_MODULE), "900000000000441003",
             "en", str(FULLY_DEFINED), "SNOMED CT Model Component (metadata)", "900000000000017005"),
            ("2466114012", effective_time, "1", str(CORE_MODULE), "410662002", "en",
             str(FULLY_DEFINED), "Concept model attribute (attribute)", str(CASE_INSENSITIVE)),
            ("3635487013", effective_time, "1", str(CORE_MODULE), "762705008", "en",
             str(FULLY_DEFINED), "Concept model object attribute (attribute)", str(CASE_INSENSITIVE)),
            ("3635487013", effective_time, "1", str(CORE_MODULE), "762705008", "en",
             str(FULLY_DEFINED), "Concept model object attribute", str(CASE_INSENSITIVE)),
            ("680946014", effective_time, "1", str(CORE_MODULE), "116680003", "en",
             str(FULLY_DEFINED), "Is a (attribute)", str(CASE_INSENSITIVE)),
        ],
        ", ".join(f"`{c}` string" for c in DESCRIPTION_HEADER),
    )
    descriptions = desc_rows(fsn, FSN_TYPE).unionByName(desc_rows(syn, SYNONYM_TYPE)).unionByName(meta_desc)

    # the reference's TextDefinition file re-emits the FSN rows with the
    # same restarted sequence (OWLtoRF2Service.java:163-177)
    textdefs = desc_rows(fsn, FSN_TYPE)

    lang = desc_rows(fsn, FSN_TYPE).select(
        uuid5_col(F.concat(F.lit("lang|"), F.col("id"))).alias("id"),
        et.alias("effectiveTime"),
        F.lit("1").alias("active"),
        module.alias("moduleId"),
        F.lit(str(US_LANG_REFSET)).alias("refsetId"),
        F.col("id").alias("referencedComponentId"),
        F.lit(str(PREFERRED)).alias("acceptabilityId"),
    )

    # OWL refset: rendered axioms + the property→top-property axioms the
    # reference injects for toolkit-NNF (:56-65) + hard-coded metadata
    compact = F.regexp_replace(
        F.regexp_replace(F.col("expr"), "<http://snomed\\.info/id/", ":"), ">", ""
    )
    rendered = rendered_ax.select(
        F.col("ref_id").cast("string").alias("referencedComponentId"),
        compact.alias("owlExpression"),
    )
    top_prop = (
        _all_roles(ont)
        .filter(F.col("role_id") != OBJECT_ATTRIBUTE_TOP)
        .select(
            F.col("role_id").cast("string").alias("referencedComponentId"),
            F.concat(
                F.lit("SubObjectPropertyOf(:"),
                F.col("role_id").cast("string"),
                F.lit(f" :{OBJECT_ATTRIBUTE_TOP})"),
            ).alias("owlExpression"),
        )
    )
    meta_owl = spark.createDataFrame(
        [
            ("762705008", "SubClassOf(:762705008 :410662002)"),
            ("410662002", "SubClassOf(:410662002 :900000000000441003)"),
            ("900000000000441003", "SubClassOf(:900000000000441003 :138875005)"),
        ],
        "referencedComponentId string, owlExpression string",
    )
    owl_refset = (
        rendered.unionByName(top_prop).unionByName(meta_owl).distinct()
        .select(
            uuid5_col(F.concat_ws("|", "referencedComponentId", "owlExpression")).alias("id"),
            et.alias("effectiveTime"),
            F.lit("1").alias("active"),
            module.alias("moduleId"),
            F.lit("733073007").alias("refsetId"),
            "referencedComponentId",
            "owlExpression",
        )
    )

    relationships = spark.createDataFrame(
        [],
        "`id` string, `effectiveTime` string, `active` string, `moduleId` string, "
        "`sourceId` string, `destinationId` string, `relationshipGroup` string, "
        "`typeId` string, `characteristicTypeId` string, `modifierId` string",
    )

    return {
        "SnomedCT/Snapshot/Terminology/sct2_Concept_Snapshot": concepts,
        "SnomedCT/Snapshot/Terminology/sct2_Description_Snapshot-en": descriptions,
        "SnomedCT/Snapshot/Terminology/sct2_TextDefinition_Snapshot-en": textdefs,
        "SnomedCT/Snapshot/Refset/Language/der2_cRefset_LanguageSnapshot-en": lang,
        "SnomedCT/Snapshot/Terminology/sct2_sRefset_OWLExpressionSnapshot": owl_refset,
        "SnomedCT/Snapshot/Terminology/sct2_Relationship_Snapshot": relationships,
    }


def write_owl_rf2_zip(ont: Ontology, zip_path: str, date_string: str = "20180731") -> None:
    """S9 sink: the reference's RF2 zip (OWLtoRF2Service.java:98-225).
    Below the local gate the tables are assembled straight from the
    kernel rows; above it each table is written by the DISTRIBUTED TSV
    sink into a staging dir and the part file is streamed into the
    archive in 64 KB chunks — the largest inputs are exactly the ones
    that take this path, so nothing ever materializes a full table as
    one driver-side string (guide §5: the driver does no data work)."""
    local = _maybe_local_owl_rf2_tables(ont, "0")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        if local is not None:  # assemble straight from the local rows
            for key, (header, rows) in local.items():
                txt = "\n".join(
                    ["\t".join(header)] + ["\t".join(r) for r in rows]
                ) + "\n"
                zf.writestr(f"{_RF2_TABLE_KEYS[key]}_INT_{date_string}.txt", txt)
            return
        from .rf2 import write_rf2_tsv

        # single probe: the kernel gate said no, so skip the re-probe
        # inside owl_to_rf2_tables (it costs three bounded collect jobs)
        tables = owl_to_rf2_tables(ont, _probe_local=False)
        staging = tempfile.mkdtemp(prefix="owlrf2zip_")
        try:
            for i, (rel, df) in enumerate(tables.items()):
                d = os.path.join(staging, f"t{i}")
                write_rf2_tsv(df, d)
                part = glob.glob(os.path.join(d, "part-*"))[0]
                with zf.open(f"{rel}_INT_{date_string}.txt", "w") as dst, open(
                    part, "rb"
                ) as srcf:
                    shutil.copyfileobj(srcf, dst, 64 * 1024)
                shutil.rmtree(d, ignore_errors=True)
        finally:
            shutil.rmtree(staging, ignore_errors=True)


def read_rf2_zip(zip_path: str) -> str:
    """Zip snapshot input (SubontologyExtraction.java:72-79 reads a
    zipped RF2 archive): extract to a temp dir and return its path for
    the directory-based readers.  The extracted copy is removed at
    process exit (atexit) so repeated CLI runs don't leak snapshot
    copies under /tmp.  At production scale archives are pre-exploded
    to object storage; this is CLI-parity only."""
    import atexit

    tmp = tempfile.mkdtemp(prefix="rf2zip_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(tmp)
    return tmp
