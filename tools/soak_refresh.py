"""Refresh-vs-corpus-size soak: is the composed incremental refresh
really O(batch)?

Builds the persisted corpus state at growing scales (replicated sf0.1
documents with id offsets + per-replica vowel rotation — the soak.py
perturbation, so near-dup structure grows linearly) and then times
``refresh_corpus`` for a FIXED-size batch of brand-new monotone-id
documents against each corpus. The claim under test: batch cost is
flat in corpus size (the band-index candidate join and the pack-base
partial-agg are the only corpus-touching stages, and both are skinny),
which is the entire reason the refresh path exists.

Usage: python tools/soak_refresh.py [scales ...] [--hot] [--no-skewjoin]
(default scales 2 4 8). One JSON line per scale: corpus size, build
seconds (untimed-quality, context only), refresh seconds.

``--hot`` (round 10): additionally time an ADVERSARIALLY SKEWED batch
— half the documents are near-dup perturbations of ONE template drawn
from the corpus itself (the Zipf-headed crawl shape: one boilerplate
template dominating the batch AND matching corpus band keys), so the
band-index candidate join concentrates on the template's band keys and
the in-batch pair expansion gets one dense cluster. ``--no-skewjoin``
disables AQE skew-join handling for the A/B that shows where it kicks
in. The hot refresh runs after the uniform one against the same state
(+600 published docs — noise at every measured scale).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from stock_bars_data_engineering_project_spark.pipeline.corpus_pipeline import (  # noqa: E402
    refresh_corpus,
)
from stock_bars_data_engineering_project_spark.session import get_spark  # noqa: E402
from stock_bars_data_engineering_project_spark.sinks.warehouse import (  # noqa: E402
    ParquetWarehouse,
)
from stock_bars_data_engineering_project_spark.sources.readers import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BATCH_DOCS = 600
ID_STRIDE = 10_000_000  # replica id offset, far above any real doc_id

_ALPHA = "abcdefghijklmnopqrst"  # 20-letter rotation — see period note


def _replica(docs, r: int, tag: str | None = None):
    """Replica r: ids offset by r*ID_STRIDE; text perturbed TWO-LEVEL
    so the period exceeds any soak scale — the round-9 lesson struck
    AGAIN at round 10's x64 (soak.py's vowel trick has period 5;
    the 20-letter rotation alone has period 20, so the first x64
    attempt collapsed replicas 20..63 onto 0..19 AND exact-killed the
    rotation-19 batch): level 1 rotates the 20-letter alphabet by
    r%%20 (most shingles change between rotations), level 2 prefixes
    EVERY word with a group letter from r//20 (every shingle changes
    between groups). Period 20*26 = 520. ``tag`` overrides the group
    letter — the refresh batches use reserved letters ('z', 'y') no
    corpus replica can take below scale 500, so batch-vs-corpus
    near-dup structure comes only from the template arm that WANTS it.
    ALWAYS check the perturbation period > max scale before trusting a
    replicated-corpus soak."""
    rot = _ALPHA[r % 20 :] + _ALPHA[: r % 20]
    tag = tag or chr(ord("a") + (r // 20) % 26)
    text = F.regexp_replace(
        F.translate(F.col("text"), _ALPHA, rot), r"(^|\s)", "$1" + tag
    )
    return docs.select(
        (F.col("doc_id") + F.lit(r * ID_STRIDE)).alias("doc_id"),
        text.alias("text"),
        "lang",
        "source",
        "n_chars",
    )


# batch ids sit above ANY corpus replica at any soak scale (replica r
# tops out near r*ID_STRIDE + 10^4; scales beyond ~999 are not a soak)
BATCH_ID_BASE = 1000 * ID_STRIDE


def _hot_batch(spark, docs):
    """The Zipf-headed batch: half fresh documents, half one-token
    perturbations of ONE corpus-resident template (the longest base
    doc — present verbatim as replica 0 at every scale), so the hot
    half is a near-dup of the template, of each other, AND of the
    corpus: its band keys concentrate the index candidate join."""
    half = BATCH_DOCS // 2
    # template drawn AS IT EXISTS IN THE CORPUS — replica 0's transform
    # applied — else the hot half would near-dup nothing
    tmpl = (
        _replica(docs.orderBy(F.col("n_chars").desc(), "doc_id").limit(1), 0)
        .collect()[0]
    )
    n_chars_t = docs.schema["n_chars"].dataType
    text = F.concat(
        F.lit(tmpl.text + " uniq"), F.col("id").cast("string")
    )
    hot_half = spark.range(half).select(
        (F.lit(BATCH_ID_BASE + 5_000_000) + F.col("id")).alias("doc_id"),
        text.alias("text"),
        F.lit(tmpl.lang).alias("lang"),
        F.lit(tmpl.source).alias("source"),
        F.length(text).cast(n_chars_t).alias("n_chars"),
    )
    # the fresh half uses its OWN rotation + id range: the hot refresh
    # runs after the uniform one against the same state, so reusing the
    # uniform batch's rows would replay-dedup them away and the hot
    # batch would degenerate to 300 docs
    fresh_half = _replica(docs.limit(half), 18, tag="y").withColumn(
        "doc_id", F.col("doc_id") - 18 * ID_STRIDE + BATCH_ID_BASE + 2_000_000
    )
    return fresh_half.unionByName(hot_half)


def main() -> None:
    args = list(sys.argv[1:])
    hot = "--hot" in args
    noskew = "--no-skewjoin" in args
    scales = [int(a) for a in args if not a.startswith("--")] or [2, 4, 8]
    conf = {"spark.sql.adaptive.skewJoin.enabled": "false"} if noskew else None
    spark = get_spark("soak-refresh", extra_conf=conf)
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    # frozen benchmark: the base replica's %20 slice (fixed size at
    # every scale — a pinned eval release does not grow with the crawl)
    benchmark = docs.filter(F.col("doc_id") % 20 == 0)
    # the fixed refresh batch: a perturbed slice with ids ABOVE every
    # corpus replica (monotone-ingest contract)
    batch = (
        _replica(docs.limit(BATCH_DOCS), 19, tag="z")
        .withColumn(
            "doc_id", F.col("doc_id") - 19 * ID_STRIDE + BATCH_ID_BASE
        )
        .persist()
    )
    batch.count()
    hot_b = None
    if hot:
        hot_b = _hot_batch(spark, docs).persist()
        hot_b.count()

    for s in scales:
        corpus = _replica(docs, 0)
        for r in range(1, s):
            corpus = corpus.unionByName(_replica(docs, r))
        root = tempfile.mkdtemp(prefix=f"refresh_soak_x{s}_")
        wh = ParquetWarehouse(spark, root)
        t0 = time.time()
        refresh_corpus(spark, wh, corpus, benchmark)  # corpus-sized build
        t_build = time.time() - t0
        n_corpus = wh.read("corpus_docs").count()

        # timed: the fixed batch against the scale-s persisted state.
        # First call does the real work; the replay (empty delta) is
        # reported separately as the no-op floor.
        t0 = time.time()
        counts = refresh_corpus(spark, wh, batch, benchmark)
        t_refresh = time.time() - t0
        t0 = time.time()
        refresh_corpus(spark, wh, batch, benchmark)
        t_replay = time.time() - t0
        extra = {}
        if hot_b is not None:
            t0 = time.time()
            hot_counts = refresh_corpus(spark, wh, hot_b, benchmark)
            extra = {
                "refresh_hot_s": round(time.time() - t0, 2),
                "hot_survivors": hot_counts.get("survivors", 0),
                "hot_published": hot_counts.get("published", 0),
                "skewjoin": not noskew,
            }
        print(
            json.dumps(
                {
                    "scale": s,
                    "corpus_docs": n_corpus,
                    "build_s": round(t_build, 1),
                    "refresh_s": round(t_refresh, 2),
                    "replay_noop_s": round(t_replay, 2),
                    "batch_published": counts.get("published", 0),
                    **extra,
                }
            ),
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
