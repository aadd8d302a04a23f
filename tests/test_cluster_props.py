"""Randomized property tests for the connected-components composed plan
(llm/dedup.py connected_components): Spark's iterative min-label
propagation vs a driver-side union-find model on random graphs, plus plan
assertions that the subquery operators decorrelated (no per-row nested
re-execution — the 100 TB posture for §2 subqueries)."""

from __future__ import annotations

import contextlib
import io

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_realtime_spark import registry
from flink_realtime_spark.llm.dedup import cc_rounds, connected_components
from tests.conftest import SF_DIR
import pytest

# iterative CC / cluster property runs — excluded from the fast gate (pytest.ini)
pytestmark = pytest.mark.slow


registry.load_all()

_node = st.integers(min_value=0, max_value=24)

edges_strategy = st.lists(
    st.tuples(_node, _node), min_size=0, max_size=40
)
nodes_strategy = st.sets(_node, min_size=1, max_size=25)


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # normalize: every node -> min member of its component
    comp = {}
    for n in nodes:
        r = find(n)
        comp.setdefault(r, []).append(n)
    out = {}
    for members in comp.values():
        m = min(members)
        for n in members:
            out[n] = m
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(nodes=nodes_strategy, raw_edges=edges_strategy)
def test_connected_components_matches_union_find(spark, nodes, raw_edges):
    # keep only edges between generated nodes, drop self-loops
    edges = [(u, v) for u, v in raw_edges if u != v and u in nodes and v in nodes]
    nodes_df = spark.createDataFrame(
        [(n,) for n in sorted(nodes)], "doc_id long"
    )
    pairs_df = spark.createDataFrame(
        edges or [(0, 0)], "doc_a long, doc_b long"
    )
    if not edges:  # placeholder row must not connect anything real
        pairs_df = pairs_df.filter("doc_a <> doc_b")
    got = {
        r["doc_id"]: r["rep_id"]
        for r in connected_components(nodes_df, pairs_df, max_iter=30).collect()
    }
    assert got == _union_find(nodes, edges)


def test_chain_graph_converges_in_log_rounds(spark):
    """The adversarial-diameter case: a 64-node path graph has diameter 63,
    so min-label propagation needs ~63 rounds; large-star/small-star must
    contract it in O(log n). Also asserts the labels are exact."""
    n = 64
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    rounds = cc_rounds(chain)
    assert rounds <= 10, rounds  # ~log2(64)=6 plus slack; far below 63
    got = {
        r["doc_id"]: r["rep_id"]
        for r in connected_components(nodes, chain).collect()
    }
    assert got == {i: 0 for i in range(n)}


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_subqueries_decorrelate_no_nested_loops(spark):
    """Every subquery key must plan as joins — never a per-outer-row
    re-execution (BroadcastNestedLoopJoin/CartesianProduct would be the
    scale-breaking shapes)."""
    for key in (
        "subq_scalar_corr",
        "subq_exists_delayed",
        "subq_not_exists_dormant",
        "subq_in_having",
    ):
        plan = _plan_of(registry.QUERIES[key](spark, SF_DIR))
        assert "CartesianProduct" not in plan, key
        assert "BroadcastNestedLoopJoin" not in plan, key
        assert "Join" in plan, key  # decorrelated into real joins


def test_pagerank_matches_numpy_power_iteration(spark):
    """plans/graph.pagerank vs dense numpy power iteration on a fixed
    random directed graph with dangling nodes — same beta, same rounds,
    same uniform dangling redistribution; ranks must agree to float
    tolerance and sum to 1."""
    import numpy as np

    rng = np.random.RandomState(7)
    n = 30
    edges = sorted(
        {
            (int(a), int(b))
            for a, b in rng.randint(0, n, size=(120, 2))
            if a != b and a % 7 != 0  # nodes ≡0 mod 7 are dangling
        }
    )
    nodes_df = spark.createDataFrame([(i,) for i in range(n)], "id LONG")
    edges_df = spark.createDataFrame(edges, "src LONG, dst LONG")

    from flink_realtime_spark.plans.graph import pagerank

    got = {
        r.id: r.rank for r in pagerank(nodes_df, edges_df, 0.85, 10).collect()
    }

    # numpy reference
    beta, r = 0.85, np.full(n, 1.0 / n)
    out_deg = np.zeros(n)
    for a, _ in edges:
        out_deg[a] += 1
    for _ in range(10):
        inflow = np.zeros(n)
        for a, b in edges:
            inflow[b] += r[a] / out_deg[a]
        dangling = r[out_deg == 0].sum()
        r = (1 - beta) / n + beta * dangling / n + beta * inflow
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-9, (i, got[i], r[i])


def test_leakage_safe_split_properties(spark):
    """pipe_split_leakage_safe invariants on the fixture corpus:
    (1) split is constant within every near-dup cluster — the property the
        per-doc hash split lacks, and the whole point of the operator;
    (2) singleton docs keep exactly the split pipe_split_assign gives them
        (same salt, same bucket arithmetic — corpus growth or clustering
        changes never move an unclustered doc across splits);
    (3) `resplit` is true iff the member's naive split differs from its
        representative's, and is always false for representatives."""
    safe = registry.QUERIES["pipe_split_leakage_safe"](spark, SF_DIR)
    naive = registry.QUERIES["pipe_split_assign"](spark, SF_DIR)
    rows = safe.collect()
    naive_split = {r["doc_id"]: r["split"] for r in naive.collect()}

    by_rep: dict[int, set[str]] = {}
    for r in rows:
        by_rep.setdefault(r["rep_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_rep.values()), {
        k: v for k, v in by_rep.items() if len(v) > 1
    }

    for r in rows:
        if r["doc_id"] == r["rep_id"]:  # representative (incl. singletons)
            assert r["split"] == naive_split[r["doc_id"]]
            assert not r["resplit"]
        else:
            assert r["resplit"] == (
                naive_split[r["doc_id"]] != naive_split[r["rep_id"]]
            )
    # the fixture's clusters actually exercise the resplit flag
    assert any(r["resplit"] for r in rows)
