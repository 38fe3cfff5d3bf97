"""operators/graph.py — connected components + representative dedup."""

import pytest
from pyspark.sql import functions as F

from img2dataset_spark.operators.graph import (
    connected_components,
    connected_components_two_phase,
    dedup_representatives,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def _comp(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_chain_and_separate_component(spark):
    # chain 1-2-3-4 (diameter 3: needs multiple propagation rounds)
    # plus a separate pair 10-11; node 99 absent (singleton, not listed)
    cc = _comp(
        connected_components(
            _edges(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
        )
    )
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    n = 16
    cc = _comp(connected_components(_edges(spark, [(i, i + 1) for i in range(n)])))
    assert set(cc.values()) == {0}
    assert len(cc) == n + 1


def test_max_iter_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            _edges(spark, [(i, i + 1) for i in range(12)]), max_iter=2
        )


def test_two_phase_matches_label_propagation(spark):
    # mixed topology: a chain, a triangle, an isolated pair, shared nodes
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (7, 8), (8, 9), (7, 9), (20, 21)]
    edges = _edges(spark, pairs)
    assert _comp(connected_components_two_phase(edges)) == _comp(
        connected_components(edges)
    )


def test_two_phase_long_chain_logarithmic_rounds(spark):
    # 64-node chain: label propagation needs ~diameter rounds (64);
    # large-star/small-star must finish within O(log^2 n) — 10 rounds
    # is generous for n=65 and far below the diameter bound.
    n = 64
    cc = _comp(
        connected_components_two_phase(
            _edges(spark, [(i, i + 1) for i in range(n)]), max_iter=10
        )
    )
    assert set(cc.values()) == {0}
    assert len(cc) == n + 1


def test_two_phase_empty_edges(spark):
    out = connected_components_two_phase(_edges(spark, []))
    assert out.columns == ["node", "component"]
    assert out.count() == 0


def test_reliable_checkpoint_path(spark, tmp_path):
    """checkpoint_dir= switches lineage truncation to a reliable
    df.checkpoint(): same answer, and checkpoint files actually land
    in the given directory (so executor loss on a cluster is survivable)."""
    ckpt = str(tmp_path / "cc_ckpt")
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    assert _comp(connected_components(edges, checkpoint_dir=ckpt)) == {
        1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
    }
    assert _comp(
        connected_components_two_phase(edges, checkpoint_dir=ckpt)
    ) == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    import os

    written = [
        os.path.join(root, f)
        for root, _, files in os.walk(ckpt)
        for f in files
    ]
    assert written, "no reliable checkpoint files were written"


def test_dedup_representatives(spark):
    docs = spark.range(6).select(F.col("id").alias("doc_id"))
    comps = connected_components(_edges(spark, [(1, 2), (2, 3)]))
    kept = sorted(
        r["doc_id"] for r in dedup_representatives(docs, comps).collect()
    )
    # cluster {1,2,3} keeps only 1; singletons 0,4,5 all survive
    assert kept == [0, 1, 4, 5]


# -- round-5: frontier LP + the budgeted hybrid dispatch --------------------


def test_auto_converged_within_budget_matches_lp(spark):
    from img2dataset_spark.operators.graph import connected_components_auto

    edges = _edges(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)])
    assert _comp(connected_components_auto(edges)) == _comp(
        connected_components(edges)
    )


def test_auto_dispatch_boundary_hands_off_to_two_phase(spark):
    """A chain longer than the LP budget must still produce the exact
    min-id components via the contract-and-two-phase handoff."""
    from img2dataset_spark.operators.graph import connected_components_auto

    n = 40  # diameter 40 >> lp_rounds=3
    edges = _edges(spark, [(i, i + 1) for i in range(n)])
    cc = _comp(connected_components_auto(edges, lp_rounds=3))
    assert cc == {i: 0 for i in range(n + 1)}


def test_auto_handoff_multiple_components_and_singleton_labels(spark):
    """Handoff composition: components that already converged inside the
    budget coexist with ones the quotient pass finishes."""
    from img2dataset_spark.operators.graph import connected_components_auto

    chain = [(i, i + 1) for i in range(100, 130)]  # needs the handoff
    dense = [(1, 2), (1, 3), (2, 3)]  # converges in round 1
    cc = _comp(connected_components_auto(_edges(spark, chain + dense), lp_rounds=2))
    expect = {i: 100 for i in range(100, 131)} | {1: 1, 2: 1, 3: 1}
    assert cc == expect


def test_frontier_lp_equals_full_lp_on_random_graph(spark):
    """The frontier optimization must not change the fixpoint: compare
    against two-phase (independent algorithm) on a pseudo-random graph."""
    import hashlib

    pairs = []
    for i in range(300):
        h = int(hashlib.md5(f"g:{i}".encode()).hexdigest()[:8], 16)
        pairs.append((h % 97, (h // 97) % 97))
    edges = _edges(spark, [(a, b) for a, b in pairs if a != b])
    assert _comp(connected_components(edges)) == _comp(
        connected_components_two_phase(edges)
    )


def test_auto_handoff_with_reliable_checkpoint(spark, tmp_path):
    """The hybrid's two-phase handoff must thread checkpoint_dir through
    (reliable checkpoints on a real cluster) and still produce exact
    min-id components."""
    from img2dataset_spark.operators.graph import connected_components_auto

    edges = _edges(spark, [(i, i + 1) for i in range(25)])
    cc = _comp(
        connected_components_auto(
            edges, lp_rounds=2, checkpoint_dir=str(tmp_path / "ckpt")
        )
    )
    assert cc == {i: 0 for i in range(26)}


# -- r14: driver-local union-find ceiling in connected_components_auto ------


def test_auto_local_gate_matches_distributed_paths(spark, monkeypatch):
    """Under LOCAL_CC_MAX_EDGES the auto variant closes the graph with a
    driver-local union-find; forcing the gate off must give the exact
    same (node, component) map — pinned against BOTH distributed
    algorithms on a pseudo-random multi-component graph."""
    import hashlib

    from img2dataset_spark.operators import graph as G

    pairs = []
    for i in range(200):
        h = int(hashlib.md5(f"lg:{i}".encode()).hexdigest()[:8], 16)
        pairs.append((h % 83, (h // 83) % 83))
    edges = _edges(spark, [(a, b) for a, b in pairs if a != b])
    local = _comp(G.connected_components_auto(edges))
    monkeypatch.setattr(G, "LOCAL_CC_MAX_EDGES", -1)
    distributed = _comp(G.connected_components_auto(edges))
    assert local == distributed
    assert local == _comp(connected_components_two_phase(edges))


def test_auto_local_gate_handoff_still_exact_when_forced_off(spark, monkeypatch):
    """The forced-distributed path still exercises the LP->two-phase
    handoff (a chain longer than the budget) — keeps the hybrid's
    distributed machinery covered now that tiny fixtures take the
    local path by default."""
    from img2dataset_spark.operators import graph as G

    monkeypatch.setattr(G, "LOCAL_CC_MAX_EDGES", -1)
    n = 40
    edges = _edges(spark, [(i, i + 1) for i in range(n)])
    cc = _comp(G.connected_components_auto(edges, lp_rounds=3))
    assert cc == {i: 0 for i in range(n + 1)}


def test_auto_local_gate_empty_edges(spark):
    from img2dataset_spark.operators.graph import connected_components_auto

    out = connected_components_auto(_edges(spark, []))
    assert out.columns == ["node", "component"]
    assert out.count() == 0


def test_auto_local_gate_string_ids(spark):
    """Union-find min must agree with the SQL least/min semantics on
    STRING ids (lexicographic), not just longs."""
    from img2dataset_spark.operators import graph as G

    edges = spark.createDataFrame(
        [("b", "c"), ("c", "a"), ("x", "y")], "id_a string, id_b string"
    )
    assert _comp(G.connected_components_auto(edges)) == {
        "a": "a", "b": "a", "c": "a", "x": "x", "y": "x",
    }
