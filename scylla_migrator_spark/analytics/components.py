"""Connected components over a pair graph — dedup GROUP ASSIGNMENT.

The near-dup detectors (minhash/simhash/jaccard, analytics/dedup.py) emit
PAIRS; corpus dedup needs each document mapped to a canonical representative,
i.e. the connected component of the similarity graph. The reference has no
graph operator at all (its validator joins are key-equality only,
m/alternator/AlternatorValidator.scala:41-89); this is part of our
training-data-pipeline extension surface.

Algorithm: iterative min-label propagation, expressed entirely in DataFrame
joins (no RDDs, no GraphX — Catalyst plans each round, AQE sizes the
shuffles):

    comp(v)  <-  min(comp(v), min over neighbors u of comp(u))

repeated until a fixpoint. Each round is one shuffle join (edges x labels) +
one aggregation; rounds needed = graph diameter (near-dup graphs are
shallow — cliques and short chains, typically <= ~6 rounds). For
adversarially long chains at 100 TB, switch to the large-star/small-star
variant (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) which converges in O(log^2 n) rounds with the same join-per-round
plan shape; the fixture graphs converge faster with plain propagation.

Scale notes:
- labels are localCheckpoint()ed each round: the iterative plan would
  otherwise grow lineage linearly and re-execute the whole prefix per round.
- convergence is detected with a cheap `changed == 0` aggregate on the
  already-materialized labels frame, not a separate recomputation.
- edges are canonicalized small-to-large once up front; the per-round join
  sends min-labels in both directions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (id, component) for every vertex of `edges`, where `component`
    is the minimum vertex id reachable in the undirected pair graph.

    Vertices are taken from the edge set (isolated vertices don't appear —
    callers union them back with comp=id if needed)."""
    spark = edges.sparkSession
    # pre-partition the (static) edge side on the join key once: every
    # round's join then reuses this layout and only the (small) labels side
    # shuffles
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .repartition(F.col("b"))
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select(F.col("a").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("comp"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # (1) gossip step: min over each vertex's neighbors' current labels
        nbr_min = (
            und.join(labels, und["b"] == labels["id"])
            .groupBy(F.col("a").alias("id2"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = labels.join(nbr_min, labels["id"] == F.col("id2"), "left_outer").select(
            "id",
            F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias("comp"),
            F.col("comp").alias("old_comp"),
        )
        # (2) path-halving: comp(v) <- comp(comp(v)). Labels are always vertex
        # ids, so the label frame self-joins; this pointer jump turns the
        # linear one-hop spread into O(log diameter) convergence (a long
        # chain halves every round instead of shrinking by one).
        l2 = stepped.select(F.col("id").alias("cid"), F.col("comp").alias("ccomp"))
        jumped = (
            stepped.join(l2, stepped["comp"] == l2["cid"], "left_outer")
            .select(
                stepped["id"],
                F.least(stepped["comp"], F.coalesce(l2["ccomp"], stepped["comp"])).alias(
                    "new_comp"
                ),
                "old_comp",
            )
            .localCheckpoint(eager=True)
        )
        changed = jumped.filter(F.col("new_comp") < F.col("old_comp")).limit(1).count()
        labels = jumped.select("id", F.col("new_comp").alias("comp"))
        if changed == 0:
            break
    return labels
