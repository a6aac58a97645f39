"""Entity canonicalization via connected components (SURVEY.md §2.7).

Alias-equivalence mentions form an undirected graph over entity surface
forms; each component is one canonical entity (id = min member id).  The
algorithm is the alternating large-star/small-star map-reduce CC
(Kiveris et al., "Connected Components in MapReduce and Beyond" — public
algorithm), expressed as DataFrame joins with per-round
localCheckpoint.  Hot hub nodes are handled by the large-star step
itself (every neighbor > v links to min(neighborhood), so hubs shrink
exponentially); AQE skew-join covers residual shuffle skew.

Surface forms also link to their lexical canonical form (C<i>_a<k> → C<i>)
when the canonical form is itself mentioned — plus every surface form
maps to a stable 64-bit entity id via xxhash64 (content-addressed like
PV reification ids, never an insertion counter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _chk(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def connected_components(edges: DataFrame, max_rounds: int = 32) -> DataFrame:
    """(a, b) undirected edges over long ids → (id, component) with
    component = min id in the component.

    Alternating star contraction; converges in O(log n) rounds."""
    # symmetrize
    e = edges.select(F.col("a"), F.col("b")).unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).filter(F.col("a") != F.col("b")).distinct()
    e = _chk(e)
    for _ in range(max_rounds):
        # large-star: for each node, link every strictly-larger neighbor
        # to the minimum of the closed neighborhood
        nbr_min = e.groupBy("a").agg(F.min("b").alias("mn")).select(
            "a", F.least(F.col("mn"), F.col("a")).alias("m")
        )
        large = (
            e.join(nbr_min, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
        )
        # small-star: link node and smaller neighbors to the min
        small_nbrs = e.filter(F.col("b") <= F.col("a"))
        small_min = small_nbrs.groupBy("a").agg(F.min("b").alias("m"))
        small = (
            small_nbrs.join(small_min, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .unionByName(small_min.select("a", F.col("m").alias("b")))
        )
        new_e = large.unionByName(small).filter(F.col("a") != F.col("b")).distinct()
        new_e = _chk(new_e)
        # converged when the edge set is a stable star forest: every 'a'
        # has exactly one neighbor 'b' < a and no changes occur
        if new_e.exceptAll(e).isEmpty() and e.exceptAll(new_e).isEmpty():
            e = new_e
            break
        e = new_e
    else:
        raise RuntimeError("connected_components did not converge")
    comp = e.filter(F.col("a") > F.col("b")).select(F.col("a").alias("id"), F.col("b").alias("component"))
    return comp


def entity_id(col):
    """Stable 64-bit id for an entity surface form (content hash)."""
    return F.xxhash64(col)


def canonical_map(statements: DataFrame) -> DataFrame:
    """(ent, canonical_ent) for every surface form seen in statements.

    Components come from ``same(x, y)`` statements plus lexical
    alias→canonical edges (C<i>_a<k> ↔ C<i>); the canonical
    representative is the lexicographically/numerically minimal surface
    id, then mapped back to its string form."""
    ents = (
        statements.select(F.col("arg1").alias("ent"))
        .unionByName(statements.select(F.col("arg2").alias("ent")))
        .distinct()
    )
    ents = ents.withColumn("eid", entity_id(F.col("ent")))
    same_edges = (
        statements.filter(F.col("stype") == "same")
        .select(entity_id(F.col("arg1")).alias("a"), entity_id(F.col("arg2")).alias("b"))
    )
    lex_edges = ents.filter(F.col("ent").contains("_a")).select(
        F.col("eid").alias("a"),
        entity_id(F.regexp_extract(F.col("ent"), r"^(C\d+)_a\d+$", 1)).alias("b"),
    )
    edges = same_edges.unionByName(lex_edges)
    comp = connected_components(edges)
    mapped = ents.join(comp, ents.eid == comp.id, "left").select(
        "ent", "eid", F.coalesce(F.col("component"), F.col("eid")).alias("component")
    )
    # canonical representative per component: prefer the canonical lexical
    # form (no _a suffix), then smallest entity string — deterministic.
    reps = (
        mapped.withColumn("is_canon", (~F.col("ent").contains("_a")).cast("int"))
        .groupBy("component")
        .agg(F.max(F.struct(F.col("is_canon"), F.col("ent").alias("rep"))).alias("best"))
        .select("component", F.col("best.rep").alias("canonical_ent"))
    )
    return mapped.join(reps, "component").select("ent", "canonical_ent")


def canonicalize_statements(statements: DataFrame) -> DataFrame:
    """Rewrite statement args to canonical entities (broadcastable map)."""
    cmap = canonical_map(statements)
    c1 = cmap.select(F.col("ent").alias("arg1"), F.col("canonical_ent").alias("c1"))
    c2 = cmap.select(F.col("ent").alias("arg2"), F.col("canonical_ent").alias("c2"))
    return (
        statements.join(c1, "arg1", "left")
        .join(c2, "arg2", "left")
        .select(
            "repo",
            "path",
            "commit",
            "stype",
            F.coalesce("c1", "arg1").alias("arg1"),
            "role",
            F.coalesce("c2", "arg2").alias("arg2"),
            "score",
        )
    )
