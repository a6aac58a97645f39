"""A10: syntactic-locality module extraction (⊥ / ⊤ / STAR).

The reference delegates to the OWL-API's SyntacticLocalityModuleExtractor
(tools/ModuleExtractionHandler.java:18-37, exercised by
manualtests/ExtractModuleTest.java:18-34 with ModuleType.STAR).  Here the
same semantics are a distributed fixpoint over the relational axiom
tables, restricted to the EL fragment the engine models:

⊥-locality (w.r.t. signature Σ): an axiom is local iff interpreting
every symbol outside Σ as ⊥ (concepts) / the empty role makes it a
tautology.  For EL this reduces to per-axiom tests over the reified
conjunct lists:

* ``A ⊑ C``        local iff A ∉ Σ
* ``A ≡ C``        local iff A ∉ Σ and some conjunct of C ⊥-reduces
* GCI ``C ⊑ A``    local iff some conjunct of C ⊥-reduces
* ``r ⊑ s``        local iff r ∉ Σ
* ``r∘s ⊑ t``      local iff r ∉ Σ or s ∉ Σ
* ``Trans(r)``     local iff r ∉ Σ
* ``Reflexive(r)`` never ⊥-local (an empty role is not reflexive)

where ``∃R.F`` ⊥-reduces iff R ∉ Σ or F ⊥-reduces, and a conjunction
⊥-reduces iff ANY member does.

⊤-locality: symbols outside Σ become ⊤ / the universal role:

* ``A ⊑ C``        local iff every conjunct of C ⊤-reduces
* ``A ≡ C``        local iff A ∉ Σ and every conjunct of C ⊤-reduces
* GCI ``C ⊑ A``    local iff A ∉ Σ
* ``r ⊑ s``        local iff s ∉ Σ;  ``r∘s ⊑ t`` local iff t ∉ Σ
* ``Trans(r)``     local iff r ∉ Σ;  ``Reflexive(r)`` local iff r ∉ Σ

where ``∃R.F`` ⊤-reduces iff R ∉ Σ and F ⊤-reduces, and a conjunction
⊤-reduces iff ALL members do.

A module is the least fixpoint: add every non-local axiom, grow Σ by the
added axioms' signatures, repeat.  STAR alternates ⊥ and ⊤ extraction
until stable — the classic nested-module construction.  Correctness
oracle (tests/test_module.py): for all A,B ∈ Σ the module entails
A ⊑ B iff the full ontology does (module property), checked via the
closure kernel on both sides.
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .model import Ontology


from .util import chk as _chk
from .util import chk_n as _chk_n


def _pv_reducible(pvs: DataFrame, sigma: DataFrame, mode: str, max_depth: int = 8) -> DataFrame:
    """(pv_id, red) for every PV: does ``∃R.F`` ⊥-reduce (mode='bot') /
    ⊤-reduce (mode='top') w.r.t. Σ?  Bottom-up over nesting depth."""
    s_role = sigma.withColumnRenamed("id", "role_id").withColumn("_rin", F.lit(True))
    s_cls = sigma.withColumnRenamed("id", "filler_concept").withColumn("_cin", F.lit(True))
    base = (
        pvs.filter(F.col("filler_concept").isNotNull())
        .join(s_role, "role_id", "left")
        .join(s_cls, "filler_concept", "left")
    )
    role_out = F.col("_rin").isNull()
    filler_red = F.col("_cin").isNull()
    if mode == "bot":
        red = role_out | filler_red
    else:
        red = role_out & filler_red
    # data PVs: DataHasValue(r, v) ⊥-reduces iff r ∉ Σ (empty data role →
    # unsatisfiable restriction); it never ⊤-reduces (a fixed literal is
    # not trivialized by the universal interpretation)
    data = pvs.filter(F.col("is_data")).join(s_role, "role_id", "left").select(
        "pv_id",
        (F.col("_rin").isNull() if mode == "bot" else F.lit(False)).alias("red"),
    )
    resolved = base.select("pv_id", red.alias("red")).unionByName(data)
    pending = pvs.filter(F.col("filler_concept").isNull() & ~F.col("is_data"))
    for _ in range(max_depth):
        if pending.isEmpty():
            break
        refs = pending.select("pv_id", "role_id", F.explode("filler_refs").alias("r"))
        named = refs.filter(F.col("r.kind") == "c").join(
            sigma.select(F.col("id").alias("ref_id")).withColumn("_in", F.lit(True)),
            refs["r.ref_id"] == F.col("ref_id"),
            "left",
        ).select("pv_id", "role_id", F.col("_in").isNull().alias("m_red"))
        nested = refs.filter(F.col("r.kind") == "p").join(
            resolved.select(F.col("pv_id").alias("_rid"), F.col("red").alias("m_red")),
            refs["r.ref_id"] == F.col("_rid"),
            "left",
        ).select("pv_id", "role_id", "m_red")
        members = named.unionByName(nested)
        agg = members.groupBy("pv_id", "role_id").agg(
            F.max(F.col("m_red").isNull().cast("int")).alias("unresolved"),
            F.max(F.col("m_red").cast("int")).alias("any_red"),
            F.min(F.coalesce(F.col("m_red").cast("int"), F.lit(0))).alias("all_red"),
        )
        done = agg.filter(F.col("unresolved") == 0)
        if done.isEmpty():
            break
        # conjunction: bot-reduces iff ANY member does; top iff ALL do
        filler_red = (F.col("any_red") == 1) if mode == "bot" else (F.col("all_red") == 1)
        role_out2 = (
            done.join(s_role, "role_id", "left").select(
                "pv_id",
                (
                    (F.col("_rin").isNull() | filler_red)
                    if mode == "bot"
                    else (F.col("_rin").isNull() & filler_red)
                ).alias("red"),
            )
        )
        resolved = resolved.unionByName(role_out2)
        pending = pending.join(done.select("pv_id"), "pv_id", "left_anti")
    return resolved


def _axiom_signature(axioms: DataFrame, ont: Ontology) -> DataFrame:
    """(axiom_id, id) — every named class AND role an axiom mentions."""
    from .pipeline import _axiom_occurrences

    classes = _axiom_occurrences(axioms, ont).withColumnRenamed("entity_id", "id")
    # roles: PV roles reachable from the axiom's rhs refs
    pv_refs = axioms.select("axiom_id", F.explode("rhs").alias("r")).filter(
        F.col("r.kind") == "p"
    ).select("axiom_id", F.col("r.ref_id").alias("pv_id"))
    roles = None
    for _ in range(8):
        if pv_refs.isEmpty():
            break
        j = pv_refs.join(ont.pvs, "pv_id")
        rr = j.select("axiom_id", F.col("role_id").alias("id"))
        roles = rr if roles is None else roles.unionByName(rr)
        pv_refs = (
            j.filter(F.col("filler_concept").isNull())
            .select("axiom_id", F.explode("filler_refs").alias("r"))
            .filter(F.col("r.kind") == "p")
            .select("axiom_id", F.col("r.ref_id").alias("pv_id"))
        )
    out = classes if roles is None else classes.unionByName(roles)
    return out.filter(F.col("id") > 0).distinct()


def _reachable_pvs(axioms: DataFrame, ont: Ontology, max_depth: int = 8) -> DataFrame:
    """(pv_id) transitively referenced by the given axioms — bounds the
    per-round _pv_reducible evaluation to the candidate neighborhood."""
    pv_ids = (
        axioms.select(F.explode("rhs").alias("r"))
        .filter(F.col("r.kind") == "p")
        .select(F.col("r.ref_id").alias("pv_id"))
        .distinct()
    )
    seen = pv_ids
    for _ in range(max_depth):
        if pv_ids.isEmpty():
            break
        nested = (
            ont.pvs.join(pv_ids, "pv_id", "left_semi")
            .filter(F.col("filler_concept").isNull() & ~F.col("is_data"))
            .select(F.explode("filler_refs").alias("r"))
            .filter(F.col("r.kind") == "p")
            .select(F.col("r.ref_id").alias("pv_id"))
            .distinct()
            .join(seen, "pv_id", "left_anti")
        )
        pv_ids = nested
        seen = seen.unionByName(nested)
    return seen


def _nonlocal_axioms(
    ont: Ontology, sigma: DataFrame, mode: str, candidates: DataFrame | None = None
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame, DataFrame]:
    """Non-local members of each axiom family w.r.t. Σ.  Returns
    (class_axioms, subprops, role_chains, transitive, reflexive).

    ``candidates``: restrict the class-axiom locality test (and the
    nested _pv_reducible fixpoint) to these axiom_ids — the semi-naive
    path: only axioms whose signature meets the round's Σ-delta can
    change locality, so each round's work is proportional to the delta's
    neighborhood, not |axioms| (the frontier discipline of closure.py)."""
    axioms = ont.axioms
    pvs = ont.pvs
    if candidates is not None:
        axioms = axioms.join(candidates, "axiom_id", "left_semi")
        pvs = pvs.join(_reachable_pvs(axioms, ont), "pv_id", "left_semi")
    pv_red = _pv_reducible(pvs, sigma, mode)
    conj = axioms.select(
        "axiom_id", "sub_id", "is_equiv", "is_gci", "gci_super",
        F.explode("rhs").alias("r"),
    )
    named = conj.filter(F.col("r.kind") == "c").join(
        sigma.select(F.col("id").alias("ref_id")).withColumn("_in", F.lit(True)),
        conj["r.ref_id"] == F.col("ref_id"),
        "left",
    ).select("axiom_id", F.col("_in").isNull().alias("m_red"))
    pvm = conj.filter(F.col("r.kind") == "p").join(
        pv_red.select(F.col("pv_id").alias("_pid"), F.col("red").alias("m_red")),
        conj["r.ref_id"] == F.col("_pid"),
        "left",
    ).select("axiom_id", F.coalesce("m_red", F.lit(False)).alias("m_red"))
    per_ax = named.unionByName(pvm).groupBy("axiom_id").agg(
        F.max(F.col("m_red").cast("int")).alias("any_red"),
        F.min(F.col("m_red").cast("int")).alias("all_red"),
    )
    sin = sigma.withColumn("_in", F.lit(True))
    meta = (
        axioms.select("axiom_id", "sub_id", "is_equiv", "is_gci", "gci_super")
        .join(per_ax, "axiom_id", "left")
        .join(sin.withColumnRenamed("id", "sub_id").withColumnRenamed("_in", "_sub_in"), "sub_id", "left")
        .join(sin.withColumnRenamed("id", "gci_super").withColumnRenamed("_in", "_sup_in"), "gci_super", "left")
    )
    sub_in = F.coalesce(F.col("_sub_in"), F.lit(False))
    sup_in = F.coalesce(F.col("_sup_in"), F.lit(False))
    any_red = F.coalesce(F.col("any_red") == 1, F.lit(False))
    all_red = F.coalesce(F.col("all_red") == 1, F.lit(False))
    if mode == "bot":
        nonlocal_pred = (
            F.when(F.col("is_gci"), ~any_red)
            .when(F.col("is_equiv"), sub_in | ~any_red)
            .otherwise(sub_in)
        )
    else:
        nonlocal_pred = (
            F.when(F.col("is_gci"), sup_in)
            .when(F.col("is_equiv"), sub_in | ~all_red)
            .otherwise(~all_red)
        )
    class_ax = meta.filter(nonlocal_pred).select("axiom_id")

    sp = ont.subprops.join(
        sin.withColumnRenamed("id", "child" if mode == "bot" else "parent"),
        "child" if mode == "bot" else "parent",
        "left_semi",
    )
    if mode == "bot":
        rc = (
            ont.role_chains.join(sin.withColumnRenamed("id", "left_role"), "left_role", "left_semi")
            .join(sin.withColumnRenamed("id", "right_role"), "right_role", "left_semi")
        )
    else:
        rc = ont.role_chains.join(sin.withColumnRenamed("id", "super_role"), "super_role", "left_semi")
    tr = ont.transitive_roles.join(sin.withColumnRenamed("id", "role_id"), "role_id", "left_semi")
    rf = ont.reflexive_roles if mode == "bot" else ont.reflexive_roles.join(
        sin.withColumnRenamed("id", "role_id"), "role_id", "left_semi"
    )
    return class_ax, sp, rc, tr, rf


def locality_module(
    ont: Ontology,
    signature: DataFrame,
    mode: str = "bot",
    max_rounds: int = 64,
    round_stats: list | None = None,
) -> Ontology:
    """⊥- or ⊤-module: least set M of axioms s.t. every axiom non-local
    w.r.t. Σ ∪ sig(M) is in M.  ``signature``: one long column of entity
    ids.

    Semi-naive: locality only depends on sig(axiom) ∩ Σ, and Σ grows
    monotonically, so an axiom disjoint from the round's Σ-DELTA cannot
    change status — each round tests only axioms whose signature meets
    the delta (never the full axiom table; old shape was
    O(rounds × |axioms|) with _pv_reducible's nested fixpoint inside).
    ``round_stats`` (optional) collects the per-round candidate count —
    the per-round work bound asserted in tests/test_module.py."""
    spark = ont.axioms.sparkSession
    sigma = _chk(signature.select(F.col(signature.columns[0]).alias("id")).distinct())
    ax_sig = _chk(_axiom_signature(ont.axioms, ont))  # (axiom_id, id), once
    mod_ax = spark.createDataFrame([], "axiom_id long")
    delta = sigma
    sp = rc = tr = rf = None
    for _ in range(max_rounds):
        cand, n_cand = _chk_n(
            ax_sig.join(delta, "id", "left_semi")
            .select("axiom_id")
            .distinct()
            .join(mod_ax, "axiom_id", "left_anti")
        )
        if round_stats is not None:
            round_stats.append(n_cand)
        new_ax, sp, rc, tr, rf = _nonlocal_axioms(ont, sigma, mode, candidates=cand)
        new_sig_parts = [
            sp.select(F.col("child").alias("id")),
            sp.select(F.col("parent").alias("id")),
            rc.select(F.col("super_role").alias("id")),
            rc.select(F.col("left_role").alias("id")),
            rc.select(F.col("right_role").alias("id")),
            tr.select(F.col("role_id").alias("id")),
            rf.select(F.col("role_id").alias("id")),
        ]
        new_ax, n_new = _chk_n(new_ax)
        if n_new:
            # sig(added axioms) via the precomputed ax_sig (gci supers
            # are included — _axiom_occurrences collects them)
            new_sig_parts.append(
                ax_sig.join(new_ax, "axiom_id", "left_semi").select("id")
            )
            mod_ax = mod_ax.unionByName(new_ax)  # disjoint: cand excluded mod_ax
        nsig = new_sig_parts[0]
        for p in new_sig_parts[1:]:
            nsig = nsig.unionByName(p)
        nsig, n_sig = _chk_n(nsig.filter(F.col("id") > 0).distinct().join(sigma, "id", "left_anti"))
        if n_sig == 0:
            if n_new == 0:
                break
            delta = nsig  # axioms added but Σ unchanged: one empty-cand round to confirm
        else:
            sigma = sigma.unionByName(nsig)  # lazy union of checkpointed deltas
            delta = nsig
    else:
        raise RuntimeError("module extraction did not converge")

    # sp/rc/tr/rf were last evaluated against the FINAL Σ (the loop only
    # exits on a round that added no Σ entities), so no extra full pass
    return replace(
        ont,
        axioms=_chk(ont.axioms.join(mod_ax, "axiom_id", "left_semi")),
        subprops=_chk(sp),
        role_chains=_chk(rc),
        transitive_roles=_chk(tr.select("role_id")),
        reflexive_roles=_chk(rf.select("role_id")),
        annotations=ont.annotations.join(
            sigma.withColumnRenamed("id", "entity_id"), "entity_id", "left_semi"
        ),
    )


def star_module(ont: Ontology, signature: DataFrame, max_alternations: int = 16) -> Ontology:
    """STAR module (ModuleType.STAR): alternate ⊥- and ⊤-extraction until
    the axiom set is stable — the standard nested-locality construction."""
    cur = ont
    prev_count = -1
    for _ in range(max_alternations):
        cur = locality_module(cur, signature, "bot")
        cur = locality_module(cur, signature, "top")
        # stability must cover EVERY axiom family the extraction can
        # shrink — omitting transitive/reflexive roles would stop the
        # alternation one pass early when only those shrank.  All five
        # counts fused into ONE union-count job per alternation.
        one = F.lit(1).alias("one")
        n = (
            cur.axioms.select(one)
            .unionByName(cur.subprops.select(one))
            .unionByName(cur.role_chains.select(one))
            .unionByName(cur.transitive_roles.select(one))
            .unionByName(cur.reflexive_roles.select(one))
            .count()
        )
        if n == prev_count:
            break
        prev_count = n
    return cur
