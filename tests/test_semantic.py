"""SemDeDup-style semantic dedup: within-cluster pruning laws."""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from stock_bars_data_engineering_project_spark.operators.semantic import semantic_dedup
from stock_bars_data_engineering_project_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def _brute_reference(rows, threshold, centroids_of):
    """Python replay: within-cell cosine pairs -> union-find -> min-id
    keeper."""
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    parent = {r.vec_id: r.vec_id for r in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in itertools.combinations(rows, 2):
        if centroids_of[a.vec_id] != centroids_of[b.vec_id]:
            continue
        c = round(cos(a.embedding, b.embedding), 6)
        if c >= threshold or math.isclose(c, threshold, abs_tol=5e-7):
            ra, rb = find(a.vec_id), find(b.vec_id)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    # full path compress; label = min reachable == find (min-merged)
    return {r.vec_id: find(r.vec_id) for r in rows}


def test_semantic_dedup_matches_python_union_find(spark):
    emb = load_table(spark, SF, "embeddings").limit(300)
    out = semantic_dedup(emb, threshold=0.4, centroid_stride=50)
    got = {r.vec_id: (r.cluster_id, r.keep) for r in out.collect()}

    cids = {
        r.vec_id: r.cid
        for r in out.select("vec_id", "cid").collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    labels = _brute_reference(rows, 0.4, cids)
    assert {v: l for v, (l, _) in got.items()} == labels
    # keep = exactly the min-id member of each label group
    keepers = {v for v, (l, k) in got.items() if k}
    assert keepers == set(labels.values())
    # every vector labeled, exactly once
    assert set(got) == {r.vec_id for r in rows}


def test_semantic_dedup_identical_vectors_collapse(spark):
    """Duplicated vectors sharing a cell collapse to one keeper; a
    vector in another cell survives (the documented boundary trade)."""
    base = [float(i) for i in range(8)]
    rows = [(0, base), (1, base), (2, base)]  # same cell (centroid = id 0)
    rows.append((50, [x + 0.001 for x in base]))  # other cell: centroid 50
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r.vec_id: (r.cid, r.cluster_id, r.keep)
        for r in semantic_dedup(emb, threshold=0.999, centroid_stride=50).collect()
    }
    # 0,1,2 share centroid 0's cell and are identical -> one keeper (0)
    assert out[0][2] and not out[1][2] and not out[2][2]
    assert out[0][1] == out[1][1] == out[2][1] == 0
    # 50 seeds its own centroid -> own cell -> survives despite cosine≈1
    assert out[50] == (50, 50, True)

    with pytest.raises(ValueError, match="threshold"):
        semantic_dedup(emb, threshold=1.5)


# ---------------------------------------------------------------------------
# Embedding-space decontamination
# ---------------------------------------------------------------------------


def _np_best(train_rows, eval_rows):
    """Python replay of semantic_decontaminate's exact arm: per train
    vector the max cosine over the eval set, ties -> lowest eval id.
    Sequential-fold sums like the engine (order matters only at the
    ulp level, absorbed by the rounded compares below)."""
    import math

    def cos(a, b):
        d = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) ** 2 for x in a))
        nb = math.sqrt(sum(float(x) ** 2 for x in b))
        return d / (na * nb)

    best = {}
    for t in train_rows:
        scored = sorted(
            ((cos(t.embedding, e.embedding), e.vec_id) for e in eval_rows),
            key=lambda p: (-p[0], p[1]),
        )
        best[t.vec_id] = scored[0]
    return best


def test_semantic_decontaminate_matches_python_argmax(spark):
    from stock_bars_data_engineering_project_spark.operators.semantic import (
        semantic_decontaminate,
    )

    emb = load_table(spark, SF, "embeddings").limit(200)
    train = emb.filter(F.col("vec_id") % 20 != 0)
    ev = emb.filter(F.col("vec_id") % 20 == 0)
    out = semantic_decontaminate(train, ev, threshold=0.3)
    got = {r.vec_id: r for r in out.collect()}

    expect = _np_best(train.collect(), ev.collect())
    assert set(got) == set(expect)
    for vid, (c, eid) in expect.items():
        r = got[vid]
        assert r.near_eval_id == eid, vid
        assert abs(r.cos - round(c, 4)) <= 1e-9, vid
        assert r.contaminated == (round(c, 6) >= 0.3), vid


def test_semantic_decontaminate_blocked_is_subset_of_exact(spark):
    from stock_bars_data_engineering_project_spark.operators.semantic import (
        semantic_decontaminate,
        semantic_decontaminate_blocked,
    )

    emb = load_table(spark, SF, "embeddings")
    train = emb.filter(F.col("vec_id") % 20 != 0)
    ev = emb.filter(F.col("vec_id") % 20 == 0)
    exact = {r.vec_id: r for r in semantic_decontaminate(train, ev).collect()}
    blocked = semantic_decontaminate_blocked(train, ev).collect()

    assert blocked, "blocking pruned everything at hamming<=2 — wrong"
    assert set(r.vec_id for r in blocked) <= set(exact)
    for r in blocked:
        # the candidate max can only be <= the global max
        assert r.cos <= exact[r.vec_id].cos + 1e-9
        # and a blocked CONTAMINATED flag never fires where exact didn't:
        # cos_blocked <= cos_exact, so flag implies flag
        if r.contaminated:
            assert exact[r.vec_id].contaminated


def test_semantic_decontaminate_empty_eval_and_guards(spark):
    from stock_bars_data_engineering_project_spark.operators.semantic import (
        semantic_decontaminate,
        semantic_decontaminate_blocked,
    )

    emb = load_table(spark, SF, "embeddings").limit(50)
    none = emb.filter(F.lit(False))
    assert semantic_decontaminate(emb, none).count() == 0

    with pytest.raises(ValueError, match="threshold"):
        semantic_decontaminate(emb, emb, threshold=1.5)
    with pytest.raises(ValueError, match="hamming"):
        semantic_decontaminate_blocked(emb, emb, hamming=3)
    with pytest.raises(ValueError, match="reserved"):
        semantic_decontaminate(emb.withColumn("cos", F.lit(1.0)), emb)
