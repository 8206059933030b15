"""PageRank over pair graphs: pure-Python replay with the same
per-round rounding, symmetry/self-loop handling, convergence sanity,
guards."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pytest

from stock_bars_data_engineering_project_spark.operators.graph import pagerank

PAIRS = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (5, 6)]


def _r9(x: float) -> float:
    # round_half_up routes through decimal(30,10) BEFORE the 9dp round
    # (functions/scalars.py) — the replay must double-round the same
    # way or ~5% of values land 1e-9 off and iteration amplifies it
    d10 = Decimal(repr(x)).quantize(Decimal("1e-10"), ROUND_HALF_UP)
    return float(d10.quantize(Decimal("1e-9"), ROUND_HALF_UP))


def _pr_ref(pairs, n_iter=3, d=0.85):
    edges = set()
    for a, b in pairs:
        edges.add((a, b))
        edges.add((b, a))
    nodes = sorted({s for s, _ in edges})
    n = float(len(nodes))
    deg = {v: sum(1 for s, _ in edges if s == v) for v in nodes}
    pr = {v: _r9(1.0 / n) for v in nodes}
    for _ in range(n_iter):
        nxt = {}
        for v in nodes:
            s = sum(pr[u] / deg[u] for u, w in sorted(edges) if w == v)
            nxt[v] = _r9(0.15 / n + d * s)
        pr = nxt
    return pr


def test_pagerank_matches_python_replay(spark):
    df = spark.createDataFrame(PAIRS, ["doc_a", "doc_b"])
    got = {r.node: r.pr for r in pagerank(df).collect()}
    want = _pr_ref(PAIRS)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 2e-9, (v, got[v], want[v])
    # centrality sanity: nodes 1 and 3 (degree 3) out-rank 2 and 4
    # (degree 2) in the square-with-diagonal component
    assert got[1] > got[2] and got[3] > got[4]
    # disconnected 2-cycle holds its uniform mass
    assert got[5] == got[6]


def test_pagerank_mass_is_conserved(spark):
    df = spark.createDataFrame(PAIRS, ["doc_a", "doc_b"])
    total = sum(r.pr for r in pagerank(df, n_iter=2).collect())
    assert abs(total - 1.0) < 1e-6  # symmetric graph: no dangling leak


def test_pagerank_guard(spark):
    df = spark.createDataFrame(PAIRS, ["doc_a", "doc_b"])
    with pytest.raises(ValueError):
        pagerank(df, n_iter=0)
