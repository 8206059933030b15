"""Graded ranking metrics: hand-computed values, laws, and a pure-Python
replay on pseudo-random runs."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from stock_bars_data_engineering_project_spark.operators.retrieval_eval import (
    macro_metrics,
    ranking_metrics,
    ranks_from_scores,
)


def _run(spark, rows):
    return spark.createDataFrame(rows, "query_id string, doc_id long, rank int")


def _qrels(spark, rows):
    return spark.createDataFrame(rows, "query_id string, doc_id long, rel int")


def test_hand_computed_graded_example(spark):
    # q1 judgments: d1 rel 3, d2 rel 1, d3 rel 0, d9 rel 2 (not retrieved)
    # run top-3: d3 (rank 1, rel 0), d1 (rank 2, rel 3), d5 (rank 3, unjudged)
    run = _run(spark, [("q1", 3, 1), ("q1", 1, 2), ("q1", 5, 3)])
    qrels = _qrels(spark, [("q1", 1, 3), ("q1", 2, 1), ("q1", 3, 0), ("q1", 9, 2)])
    r = ranking_metrics(run, qrels, k=3).first()
    assert r["n_rel"] == 3  # d1, d2, d9
    assert r["n_hit"] == 1  # only d1 retrieved
    assert r["recall"] == pytest.approx(1 / 3)
    assert r["mrr"] == pytest.approx(1 / 2)  # first relevant at rank 2
    dcg = (2**3 - 1) / math.log2(2 + 1)
    idcg = (
        (2**3 - 1) / math.log2(1 + 1)
        + (2**2 - 1) / math.log2(2 + 1)
        + (2**1 - 1) / math.log2(3 + 1)
    )
    assert r["dcg"] == pytest.approx(dcg)
    assert r["idcg"] == pytest.approx(idcg)
    assert r["ndcg"] == pytest.approx(dcg / idcg)


def test_perfect_ranking_scores_one(spark):
    qrels = _qrels(spark, [("q", d, rel) for d, rel in [(1, 3), (2, 2), (3, 1)]])
    run = _run(spark, [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)])
    r = ranking_metrics(run, qrels, k=3).first()
    assert r["recall"] == 1.0 and r["mrr"] == 1.0
    assert r["ndcg"] == pytest.approx(1.0)


def test_judged_query_without_run_rows_scores_zero(spark):
    qrels = _qrels(spark, [("q1", 1, 1), ("q2", 1, 2)])
    run = _run(spark, [("q1", 1, 1), ("q3", 7, 1)])  # q3 unjudged -> ignored
    rows = {r["query_id"]: r for r in ranking_metrics(run, qrels, k=5).collect()}
    assert set(rows) == {"q1", "q2"}  # judged set only
    assert rows["q2"]["recall"] == 0.0
    assert rows["q2"]["mrr"] == 0.0
    assert rows["q2"]["ndcg"] == 0.0
    assert rows["q1"]["recall"] == 1.0


def test_all_rel_zero_query_is_null_and_macro_skips_it(spark):
    qrels = _qrels(spark, [("q1", 1, 1), ("q2", 5, 0)])
    run = _run(spark, [("q1", 1, 1), ("q2", 5, 1)])
    per_q = ranking_metrics(run, qrels, k=5)
    q2 = per_q.filter(F.col("query_id") == "q2").first()
    assert q2["recall"] is None and q2["ndcg"] is None and q2["mrr"] is None
    m = macro_metrics(per_q).first()
    assert m["n_queries"] == 2 and m["n_scored"] == 1
    assert m["macro_recall"] == 1.0 and m["macro_ndcg"] == pytest.approx(1.0)


def test_rank_cut_respected(spark):
    qrels = _qrels(spark, [("q", 1, 2)])
    run = _run(spark, [("q", 9, 1), ("q", 8, 2), ("q", 1, 3)])
    r2 = ranking_metrics(run, qrels, k=2).first()
    assert r2["recall"] == 0.0 and r2["mrr"] == 0.0 and r2["ndcg"] == 0.0
    r3 = ranking_metrics(run, qrels, k=3).first()
    assert r3["recall"] == 1.0 and r3["mrr"] == pytest.approx(1 / 3)


def test_duplicate_rows_refuse_loudly(spark):
    qrels = _qrels(spark, [("q", 1, 1)])
    dup = _run(spark, [("q", 1, 1), ("q", 1, 2)])
    with pytest.raises(ValueError, match="duplicate"):
        ranking_metrics(dup, qrels)
    with pytest.raises(ValueError, match="duplicate"):
        ranking_metrics(_run(spark, [("q", 1, 1)]), _qrels(spark, [("q", 1, 1), ("q", 1, 0)]))
    with pytest.raises(ValueError, match="positive"):
        ranking_metrics(_run(spark, [("q", 1, 1)]), qrels, k=0)


def test_ranks_from_scores_deterministic_tiebreak(spark):
    run = spark.createDataFrame(
        [("q", 5, 1.0), ("q", 3, 1.0), ("q", 9, 2.0)],
        "query_id string, doc_id long, score double",
    )
    got = {
        r["doc_id"]: r["rank"] for r in ranks_from_scores(run).collect()
    }
    assert got == {9: 1, 3: 2, 5: 3}  # tie at 1.0 broken by doc_id asc


def test_python_replay_pseudo_random(spark):
    # deterministic pseudo-random run/qrels from md5; replay every
    # metric in pure Python
    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest(), 16)

    queries = [f"q{i}" for i in range(7)]
    qrel_rows, run_rows = [], []
    for q in queries:
        for d in range(20):
            if h(f"j|{q}|{d}") % 3 == 0:
                qrel_rows.append((q, d, h(f"r|{q}|{d}") % 4))  # grades 0-3
        ranked = sorted(range(20), key=lambda d: (h(f"s|{q}|{d}"), d))
        run_rows += [(q, d, i + 1) for i, d in enumerate(ranked[:12])]
    k = 5
    got = {
        r["query_id"]: r
        for r in ranking_metrics(
            _run(spark, run_rows), _qrels(spark, qrel_rows), k=k
        ).collect()
    }
    qrels_by_q, run_by_q = {}, {}
    for q, d, rel in qrel_rows:
        qrels_by_q.setdefault(q, {})[d] = rel
    for q, d, rank in run_rows:
        if rank <= k:
            run_by_q.setdefault(q, {})[d] = rank
    assert set(got) == set(qrels_by_q)
    for q, judged in qrels_by_q.items():
        rels = sorted((r for r in judged.values()), reverse=True)
        n_rel = sum(1 for r in rels if r > 0)
        row = got[q]
        if n_rel == 0:
            assert row["recall"] is None
            continue
        top = run_by_q.get(q, {})
        hit_ranks = [rank for d, rank in top.items() if judged.get(d, 0) > 0]
        assert row["n_rel"] == n_rel
        assert row["n_hit"] == len(hit_ranks)
        assert row["recall"] == pytest.approx(len(hit_ranks) / n_rel)
        assert row["mrr"] == pytest.approx(
            1 / min(hit_ranks) if hit_ranks else 0.0
        )
        dcg = sum(
            (2 ** judged.get(d, 0) - 1) / math.log2(rank + 1)
            for d, rank in top.items()
        )
        idcg = sum(
            (2**r - 1) / math.log2(i + 2) for i, r in enumerate(rels[:k]) if r > 0
        )
        assert row["ndcg"] == pytest.approx(dcg / idcg)


def test_null_keyed_rows_do_not_trip_duplicate_guard(spark):
    # count_distinct over a struct keeps NULL-keyed rows: a run with a
    # NULL doc_id placeholder is clean data, not a duplicate
    run = spark.createDataFrame(
        [("q1", None, 1), ("q1", 5, 2)], "query_id string, doc_id long, rank int"
    )
    qrels = _qrels(spark, [("q1", 5, 1)])
    r = ranking_metrics(run, qrels, k=5).first()
    assert r["recall"] == 1.0 and r["mrr"] == 0.5
