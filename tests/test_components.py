"""Unit tests for analytics/components.py — iterative connected components."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from scylla_migrator_spark.analytics.components import connected_components


def _cc(spark, pairs):
    edges = spark.createDataFrame(pairs, "src long, dst long")
    rows = connected_components(edges).collect()
    return {r["id"]: r["comp"] for r in rows}


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: diameter 4, everything labels 1
    comp = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_separate_cliques_stay_separate(spark):
    comp = _cc(spark, [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12)])
    assert {comp[1], comp[2], comp[3]} == {1}
    assert {comp[10], comp[11], comp[12]} == {10}


def test_bridge_merges_components(spark):
    comp = _cc(spark, [(1, 2), (10, 11), (2, 10)])
    assert set(comp.values()) == {1}


def test_edge_direction_is_irrelevant(spark):
    fwd = _cc(spark, [(1, 5), (5, 9)])
    rev = _cc(spark, [(9, 5), (5, 1)])
    assert fwd == rev == {1: 1, 5: 1, 9: 1}


def test_long_chain_converges_within_max_iter(spark):
    # 40-node path: needs ~39 propagation rounds with naive one-hop gossip;
    # must still converge because each round's min spreads from both ends
    n = 40
    comp = _cc(spark, [(i, i + 1) for i in range(n)])
    assert set(comp.values()) == {0}
    assert len(comp) == n + 1


def test_random_graph_matches_union_find(spark):
    """200-edge random graph: Spark CC must equal a union-find oracle."""
    import random

    rng = random.Random(42)
    edges = [(rng.randrange(120), rng.randrange(120)) for _ in range(200)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expected = {v: find(v) for v in parent}
    # canonical representative = min id in component
    comp_min = {}
    for v, r in expected.items():
        comp_min.setdefault(find(r), set()).add(v)
    truth = {v: min(members) for root, members in comp_min.items() for v in members}

    got = _cc(spark, edges)
    assert got == truth


@pytest.mark.slow
def test_two_phase_matches_label_propagation_random(spark):
    """large-star/small-star equals min-label propagation on random graphs,
    long chains (the adversarial case it exists for), and cliques."""
    import random

    from scylla_migrator_spark.analytics.components import (
        connected_components,
        connected_components_two_phase,
    )

    rng = random.Random(7)
    cases = [
        [(i, i + 1) for i in range(40)],  # one long chain
        [(0, i) for i in range(1, 12)] + [(100, 101)],  # star + island
        [(a, b) for a in range(6) for b in range(a + 1, 6)],  # clique
        [(rng.randint(0, 30), rng.randint(0, 30)) for _ in range(40)],
    ]
    for i, pairs in enumerate(cases):
        pairs = [(a, b) for a, b in pairs if a != b]
        df = spark.createDataFrame(pairs, "src long, dst long")
        lp = {r["id"]: r["comp"] for r in connected_components(df).collect()}
        tp = {r["id"]: r["comp"] for r in connected_components_two_phase(df).collect()}
        assert tp == lp, f"case {i}: two-phase diverged from propagation"


def test_two_phase_raises_when_fixpoint_not_reached(spark):
    """Exhausting max_iter without the star fixpoint must raise, never
    silently return wrong labels (a non-fixpoint edge set reads off
    garbage components)."""
    import pytest as _pt

    from scylla_migrator_spark.analytics.components import (
        connected_components_two_phase,
    )

    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    with _pt.raises(RuntimeError, match="max_iter"):
        connected_components_two_phase(df, max_iter=0).collect()


def test_k_core_peels_pendant_edges(spark):
    """Hand graph: a triangle (1,2,3) with a pendant chain 3-4-5. The
    2-core is exactly the triangle: vertex 5 (deg 1) peels in round 1,
    which drops 4 to deg 1 so it peels in round 2; every triangle vertex
    keeps degree 2."""
    from scylla_migrator_spark.analytics.components import k_core

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], ["id_a", "id_b"]
    )
    got = {r["v"]: r["core_degree"] for r in k_core(pairs, "id_a", "id_b", k=2, rounds=4).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_k_core_empty_when_forest(spark):
    """A tree has no 2-core — everything peels."""
    from scylla_migrator_spark.analytics.components import k_core

    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["id_a", "id_b"])
    assert k_core(pairs, "id_a", "id_b", k=2, rounds=4).count() == 0


def test_incremental_components_equals_full_recompute(spark):
    """Property pin for the ingest contract: old graph labelled, a batch
    of edges each touching >= 1 new vertex arrives; the incremental
    update must equal connected_components on the union edge set —
    including chains that merge several old components through one new
    vertex, old vertices first seen in the batch, and isolated merges."""
    import hashlib

    from scylla_migrator_spark.analytics.components import (
        connected_components,
        incremental_components_update,
    )

    def h(i, j):
        return int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:6], 16)

    old_edges = [
        (i, j)
        for i in range(150)
        for j in range(i + 1, 150)
        if h(i, j) % 97 == 0
    ]
    new_vertices = set(range(150, 200))
    new_edges = [
        (i, j)
        for i in range(200)
        for j in range(max(i + 1, 150), 200)  # j always new -> contract holds
        if h(i, j) % 61 == 0
    ]
    # plus a new vertex bridging two old vertices (merges two old comps)
    new_edges += [(0, 199), (1, 199)]
    old_df = spark.createDataFrame(old_edges, "id_a long, id_b long")
    new_df = spark.createDataFrame(new_edges, "id_a long, id_b long")
    base = connected_components(old_df, "id_a", "id_b")
    got = {
        (r["id"], r["comp"])
        for r in incremental_components_update(base, new_df, "id_a", "id_b").collect()
    }
    full = connected_components(
        old_df.unionByName(new_df), "id_a", "id_b"
    )
    want = {(r["id"], r["comp"]) for r in full.collect()}
    assert got == want and len(got) > 100


def test_components_upsert_three_batches_matches_full(spark, tmp_path):
    """The streaming maintainer's invariant over THREE batches, driven
    directly through the foreachBatch body: after every prefix the paired
    labelling equals the batch closure over documents seen so far,
    including merges of components created in different earlier batches."""
    from scylla_migrator_spark.analytics.components import connected_components
    from scylla_migrator_spark.streaming.components_cdc import (
        components_upsert_batch,
    )

    texts = {
        # batch 0: two near-dup families (a/b) in one source
        1: "alpha beta gamma delta epsilon zeta",
        2: "alpha beta gamma delta epsilon eta",
        3: "one two three four five six seven",
        # batch 1: extends family a, starts family c
        11: "alpha beta gamma delta epsilon zeta",
        13: "red orange yellow green blue indigo",
        # batch 2: bridges families via a doc near both 3 and 13? keep it
        # simple: exact dup of 3 and of 13 (each merges into its family)
        23: "one two three four five six seven",
        24: "red orange yellow green blue indigo",
    }
    batches = [[1, 2, 3], [11, 13], [23, 24]]
    serving = str(tmp_path / "cc_serving")
    seen: list[int] = []
    for ids in batches:
        bdf = spark.createDataFrame(
            [(i, "s0", texts[i]) for i in ids], "doc_id long, source string, text string"
        )
        components_upsert_batch(bdf, serving)
        seen += ids
        # full recompute over everything seen so far
        full_docs = spark.createDataFrame(
            [(i, "s0", texts[i]) for i in seen],
            "doc_id long, source string, text string",
        )
        from scylla_migrator_spark.analytics import dedup as D
        from pyspark.sql import functions as F

        fp = D.simhash_fingerprints(
            full_docs, "text", "doc_id", carry_cols=["source"], bits=32
        )
        a, b = fp.alias("a"), fp.alias("b")
        pairs = (
            a.join(
                b,
                on=[
                    F.col("a.source") == F.col("b.source"),
                    F.col("a.doc_id") < F.col("b.doc_id"),
                ],
            )
            .filter(F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))) <= 8)
            .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        )
        want = {
            (r["id"], r["comp"])
            for r in connected_components(pairs, "id_a", "id_b").collect()
        }
        got = {
            (r["id"], r["comp"])
            for r in spark.read.parquet(serving).filter("paired").collect()
        }
        assert got == want, f"prefix {seen}"
    # families actually formed (1,2,11), (3,23), (13,24)
    final = {
        r["id"]: r["comp"] for r in spark.read.parquet(serving).filter("paired").collect()
    }
    assert final == {1: 1, 2: 1, 11: 1, 3: 3, 23: 3, 13: 13, 24: 13}
