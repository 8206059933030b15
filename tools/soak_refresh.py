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

Usage: python tools/soak_refresh.py [scales ...]   (default 2 4 8)
One JSON line per scale: corpus size, build seconds (untimed-quality,
context only), refresh seconds (min of 2).
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

_ALPHA = "abcdefghijklmnopqrst"  # period-20 rotation: soak.py's vowel
# trick has period 5, which made replica 5 an EXACT copy of replica 0
# (and the fixed batch an exact copy of replica 4) — the x8 point then
# measured dedup collapsing duplicates, not refresh cost


def _replica(docs, r: int):
    """Replica r: ids offset by r*ID_STRIDE, first 20 letters rotated
    by r so most shingles change (near-dup growth stays linear) and no
    two replicas under r=20 collide exactly."""
    rot = _ALPHA[r % 20 :] + _ALPHA[: r % 20]
    return docs.select(
        (F.col("doc_id") + F.lit(r * ID_STRIDE)).alias("doc_id"),
        F.translate(F.col("text"), _ALPHA, rot).alias("text"),
        "lang",
        "source",
        "n_chars",
    )


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [2, 4, 8]
    spark = get_spark("soak-refresh")
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    # frozen benchmark: the base replica's %20 slice (fixed size at
    # every scale — a pinned eval release does not grow with the crawl)
    benchmark = docs.filter(F.col("doc_id") % 20 == 0)
    # the fixed refresh batch: a perturbed slice with ids ABOVE every
    # corpus replica (monotone-ingest contract)
    batch = _replica(docs.limit(BATCH_DOCS), 19).persist()
    batch.count()

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
        print(
            json.dumps(
                {
                    "scale": s,
                    "corpus_docs": n_corpus,
                    "build_s": round(t_build, 1),
                    "refresh_s": round(t_refresh, 2),
                    "replay_noop_s": round(t_replay, 2),
                    "batch_published": counts.get("published", 0),
                }
            ),
            flush=True,
        )
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
