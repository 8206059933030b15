"""Training-corpus preparation pipeline — the composed product path.

The reference's pipeline (stock_pipeline.py) shows the orchestration
shape: extract -> transform -> load -> derived rebuild, checkpointed.
This module applies the same shape to the engine's training-data
operators, in the order a real corpus build runs them:

    raw documents
      0. optional Gopher rule gate (map-only heuristic filter — the
                                   cheapest stage, so it runs FIRST,
                                   before anything shuffles;
                                   off by default)
      1. exact dedup              (drop byte-identical copies)
      2. near-dup dedup           (MinHash-LSH pairs -> connected
                                   components -> canonical_selection
                                   keeps each cluster's BEST-quality
                                   member, not the lowest id)
      3. benchmark decontamination (drop docs overlapping the eval split)
      3b. optional boilerplate scrub (remove corpus-repeated k-gram
                                   spans from the surviving text —
                                   off by default)
      4. PII scrub                 (regex replace, audited)
      5. optional surprisal gate   (drop the worst tail by corpus-
                                   unigram-LM surprisal — off by default)
      5b. optional classifier gate (hashed linear quality classifier
                                   score floor — off by default)
      5c. optional alpha mixture   (temperature-rebalance the per-source
                                   mass — off by default; sits BEFORE
                                   the quality gate so the gate's
                                   observe() stays on a consumed-once
                                   linear chain)
      6. quality gate              (composite score threshold)
      7. stable train/val/test split
      8. token counts + sequence packing per (split, source) shard
      9. snapshot write, partitioned by split, + run-log row

Every stage is a pure DataFrame transform from the operator library —
the pipeline adds only ordering and bookkeeping, so it scales exactly
as its operators do. Stage row counts are collected once per stage
(driver-side scalars, the same pattern as the reference's A2 logging).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..materialize import materialize

from ..functions.quality_model import quality_scores
from ..functions.text import quality_score, token_count
from ..operators.contamination import boilerplate_scrub, contamination_overlap
from ..operators.dedup import (
    canonical_selection,
    dedup_clusters,
    exact_dedup,
    minhash_lsh_pairs,
)
from ..operators.quality import (
    bigram_surprisal,
    gopher_panel,
    unigram_surprisal,
)
from ..operators.sampling import alpha_mixture_sample, stable_split
from ..sinks.warehouse import ParquetWarehouse
from ..sources.readers import load_table

_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
_PHONE = r"\d{3}[-.]\d{3,4}[-.]\d{4}"


def prepare_corpus(
    docs: DataFrame,
    min_quality: float = 0.3,
    max_contamination: float = 0.5,
    pack_budget: int = 2048,
    surprisal_keep_frac: float | None = None,
    surprisal_model: str = "unigram",
    boilerplate_df_cap: int | None = None,
    classifier_min_score: float | None = None,
    mixture_alpha: float | None = None,
    gopher: dict | None = None,
) -> tuple[DataFrame, dict[str, int]]:
    """Run stages 1-8 and return (final corpus frame, per-stage counts).

    The benchmark used for decontamination is the deterministic
    doc_id % 20 == 0 slice (standing in for a real eval suite); those
    docs never enter the training corpus themselves.

    ``surprisal_keep_frac`` (e.g. 0.9) switches on the unigram-LM gate:
    keep the fraction of documents with the LOWEST corpus-unigram
    surprisal (operators/quality.py), dropping the most-unusual tail —
    including token-less documents, which have no defined surprisal and
    nothing to train on. ``None`` (default) skips the stage entirely,
    leaving the plan untouched.

    ``boilerplate_df_cap`` (e.g. 5) switches on the corpus-level
    repeated-span scrub: 3-token spans appearing in >= cap distinct
    surviving docs are removed from every document's text
    (operators/contamination.boilerplate_scrub) BEFORE PII scrub and
    quality scoring, so downstream gates judge the cleaned text.

    ``classifier_min_score`` (e.g. 0.4) switches on the hashed linear
    quality-classifier gate (functions/quality_model.py): drop docs
    scoring below the floor. Feature-less docs have no score row and
    drop — same contract as the surprisal gate.

    ``mixture_alpha`` (e.g. 0.5) temperature-rebalances the per-source
    token mass right before splitting (operators/sampling.py
    alpha_mixture_sample) — 1.0 is a no-op natural distribution,
    smaller boosts rare sources toward parity.

    ``gopher`` (a threshold-override dict, ``{}`` for the paper's
    defaults) switches on the Gopher heuristic rule gate
    (operators/quality.gopher_panel) as stage 0: it is map-only, so it
    runs before anything shuffles and every later stage pays only for
    documents that pass. The paper thresholds assume prose; corpora
    like the synthetic test tables need overrides (e.g. lower
    ``min_words``, ``min_distinct_stopwords=0``).
    """
    counts: dict[str, int] = {"raw": docs.count()}

    if gopher is not None:
        docs = (
            gopher_panel(docs, **gopher)
            .filter(F.col("keep"))
            .select(*docs.columns)
        )
        counts["gopher_gated"] = docs.count()

    deduped = exact_dedup(docs)
    counts["exact_dedup"] = deduped.count()

    # keep each near-dup cluster's best-quality member (longest text),
    # not merely the lowest id — canonical_selection's keeper window
    clusters = dedup_clusters(minhash_lsh_pairs(deduped))
    near_drops = canonical_selection(
        clusters, deduped, quality_col="n_chars"
    ).filter(~F.col("keep")).select("doc_id")
    # truncate lineage here: everything upstream (shingling, 16-seed
    # MinHash, cluster iterations) would otherwise recompute on every
    # later stage count
    deduped = deduped.join(near_drops, "doc_id", "left_anti").transform(
        materialize
    )
    counts["near_dedup"] = deduped.count()

    benchmark = deduped.filter(F.col("doc_id") % 20 == 0)
    corpus = deduped.filter(F.col("doc_id") % 20 != 0)
    contaminated = (
        contamination_overlap(corpus, benchmark)
        .filter(F.col("contamination") > max_contamination)
        .select("doc_id")
    )
    corpus = corpus.join(contaminated, "doc_id", "left_anti").transform(
        materialize
    )
    counts["decontaminated"] = corpus.count()

    if boilerplate_df_cap is not None:
        # corpus-level repeated-span removal on the SURVIVING corpus
        # (hot spans are counted after dedup/decontam so dropped docs
        # don't vote); the text column is replaced by the rebuilt clean
        # text. Two consumers of `corpus` (gram counting + the join
        # back), so checkpoint + explicit count like the other funnel
        # stages.
        clean = boilerplate_scrub(corpus, k=3, df_cap=boilerplate_df_cap).select(
            "doc_id", F.col("clean_text").alias("_clean")
        )
        corpus = (
            corpus.join(clean, "doc_id")
            .withColumn("text", F.col("_clean"))
            .drop("_clean")
            .transform(materialize)
        )
        counts["boilerplate_scrubbed"] = corpus.count()

    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL, "<EMAIL>"), _PHONE, "<PHONE>"
    )
    corpus = corpus.withColumn("text", scrubbed)

    if surprisal_keep_frac is not None:
        # corpus-unigram surprisal gate: keep the keep_frac least-
        # surprising documents (scored on the SCRUBBED text, the text
        # that will actually train). The threshold is one broadcast
        # scalar from the mergeable percentile sketch; the gate itself
        # is a semi-join on doc_id. Token-less docs have no score row
        # and are dropped by the semi-join — documented contract.
        if surprisal_model == "bigram":
            scores = bigram_surprisal(corpus).drop("n_bigrams")
        elif surprisal_model == "unigram":
            scores = unigram_surprisal(corpus)
        else:
            raise ValueError(
                f"surprisal_model must be 'unigram' or 'bigram', got "
                f"{surprisal_model!r}"
            )
        thr = scores.agg(
            F.expr(
                f"percentile_approx(score, {surprisal_keep_frac}D, 10000)"
            ).alias("_thr")
        )
        keep_ids = (
            scores.crossJoin(F.broadcast(thr))
            .filter(F.col("score") <= F.col("_thr"))
            .select("doc_id")
        )
        # this stage consumes `corpus` twice (model + gate), so it keeps
        # an explicit count on a checkpointed frame like the earlier
        # funnel stages, not an observe()
        corpus = corpus.join(keep_ids, "doc_id", "left_semi").transform(
            materialize
        )
        counts["surprisal_gated"] = corpus.count()

    if classifier_min_score is not None:
        # hashed-classifier floor: one explode + partial-agg scoring
        # pass, gate as a semi-join (feature-less docs drop — contract)
        keep_ids = (
            quality_scores(corpus)
            .filter(F.col("qscore") >= classifier_min_score)
            .select("doc_id")
        )
        corpus = corpus.join(keep_ids, "doc_id", "left_semi").transform(
            materialize
        )
        counts["classifier_gated"] = corpus.count()

    if mixture_alpha is not None:
        # temperature rebalance of per-source token mass; map-only
        # membership once the tiny per-stratum threshold table exists
        corpus = alpha_mixture_sample(
            corpus, alpha=mixture_alpha, size=token_count(F.col("text"))
        ).transform(materialize)
        counts["alpha_mixture"] = corpus.count()

    # quality_gated rides the FINAL count's job as an observe() metric:
    # from here to the end the frame is a linear chain consumed exactly
    # once, so the observation is correct and saves one full pass over
    # the corpus (the earlier funnel stages are each consumed twice in
    # their job — pair-generation + anti-join — where an observed count
    # would double-fire, so those keep explicit counts on checkpointed
    # frames).
    from pyspark.sql import Observation

    quality_obs = Observation("quality_gated")
    corpus = corpus.filter(quality_score(F.col("text")) >= min_quality).observe(
        quality_obs, F.count(F.lit(1)).alias("n")
    )

    corpus = stable_split(corpus)
    w = (
        Window.partitionBy("split", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    corpus = (
        corpus.withColumn("n_tokens", token_count(F.col("text")))
        .withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn(
            "pack_id",
            F.floor((F.col("cum") - F.col("n_tokens")) / pack_budget).cast("long"),
        )
        .drop("cum")
    )
    # Materialize ONCE: the scrub/score/split/pack tail is the most
    # expensive stage chain; counting it and then letting the caller's
    # snapshot write recompute it would run that tail twice. The eager
    # checkpoint runs the chain (firing the observation), the count is
    # then a cheap pass over checkpointed partitions, and the caller's
    # write reuses them too.
    corpus = materialize(corpus)
    final_n = corpus.count()
    counts["quality_gated"] = int(quality_obs.get["n"])
    counts["final"] = final_n
    return corpus, counts


def run_corpus_pipeline(
    spark: SparkSession,
    sf_dir: str,
    warehouse_root: str,
    table: str = "training_corpus",
    export_jsonl_dir: str | None = None,
    **kwargs,
) -> dict[str, int]:
    """End-to-end: prepare, snapshot-write partitioned by split, log —
    and, when ``export_jsonl_dir`` is set, deliver the train split as
    gzip JSONL shards (the interchange format the training stack pulls;
    sinks/export.py)."""
    docs = load_table(spark, sf_dir, "documents")
    corpus, counts = prepare_corpus(docs, **kwargs)
    wh = ParquetWarehouse(spark, warehouse_root)
    wh.overwrite(corpus, table, partition_by=("split",))
    if export_jsonl_dir:
        from ..sinks.export import export_jsonl

        train = wh.read(table).filter("split = 'train'")
        export_jsonl(train, export_jsonl_dir, n_shards=8)
        counts["exported_train"] = train.count()
    wh.log(
        f"{table}_runs",
        " -> ".join(f"{k}:{v}" for k, v in counts.items()),
    )
    return counts
