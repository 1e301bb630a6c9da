"""PageRank vs a dense numpy power-iteration reference (same formulation)."""

from __future__ import annotations

import numpy as np
import pytest

from crowdsorsa_etl_spark.operators.graph import pagerank


def _numpy_pagerank(edges, n, iterations=10, damping=0.85):
    """Dense reference with uniform dangling redistribution."""
    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[s] += 1
    rank = np.full(n, 1.0 / n)
    for _ in range(iterations):
        dangling = rank[out_deg == 0].sum()
        incoming = np.zeros(n)
        for s, d in edges:
            incoming[d] += rank[s] / out_deg[s]
        rank = (1 - damping) / n + damping * (incoming + dangling / n)
    return rank


EDGES = [
    (0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (4, 2), (4, 0),
    (5, 4), (6, 4), (7, 4), (2, 5),
    # node 8 is dangling (appears only as dst)
    (5, 8),
]


class TestPageRank:
    def test_matches_numpy_reference(self, spark):
        df = spark.createDataFrame(EDGES, "src long, dst long")
        got = {
            r.node: r.rank
            for r in pagerank(df, iterations=10, damping=0.85).collect()
        }
        want = _numpy_pagerank(EDGES, 9, iterations=10, damping=0.85)
        assert set(got) == set(range(9))
        for v in range(9):
            assert got[v] == pytest.approx(want[v], abs=1e-9)

    def test_ranks_sum_to_one(self, spark):
        df = spark.createDataFrame(EDGES, "src long, dst long")
        total = sum(r.rank for r in pagerank(df, iterations=6).collect())
        assert total == pytest.approx(1.0, abs=1e-9)

    def test_star_graph_center_dominates(self, spark):
        star = [(i, 0) for i in range(1, 8)]
        df = spark.createDataFrame(star, "src long, dst long")
        got = {r.node: r.rank for r in pagerank(df, iterations=10).collect()}
        assert got[0] == max(got.values())
        leaf_ranks = [got[i] for i in range(1, 8)]
        assert max(leaf_ranks) - min(leaf_ranks) < 1e-12
