"""CLI entry — reference parity with ``python -m
etl_project.pipelines.stock_bars`` (Dockerfile:13): run the full/
incremental pipeline against a local warehouse directory.

    python -m stock_bars_data_engineering_project_spark.pipeline \
        [--warehouse DIR] [--config stock_bars.yaml]

First run: full load (table absent). Every later run: incremental from
the checkpoint with overlap healing + idempotent merge, then the
analysis rebuild. Prints one JSON status line.
"""

from __future__ import annotations

import argparse
import json

from ..session import get_spark
from ..sinks import ParquetWarehouse
from ..sources.readers import read_csv_dim
from .stock_pipeline import PipelineConfig, default_dim, run


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--warehouse", default="/tmp/stock_bars_warehouse")
    ap.add_argument("--config", default=None, help="YAML config (PipelineConfig)")
    ap.add_argument(
        "--corpus",
        metavar="SF_DIR",
        default=None,
        help="run the training-corpus preparation pipeline over SF_DIR instead",
    )
    ap.add_argument(
        "--export-jsonl",
        metavar="DIR",
        default=None,
        help="with --corpus: also deliver the train split as gzip JSONL shards",
    )
    ap.add_argument(
        "--surprisal-keep-frac",
        type=float,
        default=None,
        metavar="FRAC",
        help="with --corpus: keep only the FRAC least-surprising documents "
        "under the corpus unigram model (e.g. 0.9 drops the worst 10%%)",
    )
    ap.add_argument(
        "--surprisal-model",
        choices=("unigram", "bigram"),
        default="unigram",
        help="with --surprisal-keep-frac: LM for the surprisal gate "
        "(bigram = stupid-backoff transition model)",
    )
    ap.add_argument(
        "--boilerplate-df-cap",
        type=int,
        default=None,
        metavar="N",
        help="with --corpus: scrub 3-token spans appearing in >= N "
        "distinct documents from every text (C4-style boilerplate removal)",
    )
    ap.add_argument(
        "--classifier-min-score",
        type=float,
        default=None,
        metavar="S",
        help="with --corpus: drop documents under S on the hashed "
        "linear quality classifier (functions/quality_model.py)",
    )
    ap.add_argument(
        "--mixture-alpha",
        type=float,
        default=None,
        metavar="A",
        help="with --corpus: temperature-rebalance per-source token mass "
        "(A=1 natural, smaller boosts rare sources toward parity)",
    )
    ap.add_argument(
        "--gopher",
        metavar="JSON",
        default=None,
        help="with --corpus: run the Gopher heuristic rule gate first; "
        "value is a JSON threshold-override dict ('{}' for the paper "
        "defaults, e.g. '{\"min_words\": 10}' for short-doc corpora)",
    )
    args = ap.parse_args()

    spark = get_spark("stock-bars-pipeline")
    if args.corpus:
        from .corpus_pipeline import run_corpus_pipeline

        counts = run_corpus_pipeline(
            spark,
            args.corpus,
            args.warehouse,
            export_jsonl_dir=args.export_jsonl,
            surprisal_keep_frac=args.surprisal_keep_frac,
            surprisal_model=args.surprisal_model,
            boilerplate_df_cap=args.boilerplate_df_cap,
            classifier_min_score=args.classifier_min_score,
            mixture_alpha=args.mixture_alpha,
            gopher=json.loads(args.gopher) if args.gopher is not None else None,
        )
        print(json.dumps({"pipeline": "corpus", "warehouse": args.warehouse, **counts}))
        return

    cfg = PipelineConfig.from_yaml(args.config) if args.config else PipelineConfig()
    wh = ParquetWarehouse(spark, args.warehouse)
    dim = (
        read_csv_dim(spark, cfg.symbols_csv)
        if cfg.symbols_csv
        else default_dim(spark)
    )
    info = run(spark, wh, cfg, dim)
    info["warehouse"] = args.warehouse
    info["analysis_rows"] = (
        wh.read(cfg.analysis_table).count() if wh.exists(cfg.analysis_table) else 0
    )
    print(json.dumps(info))


if __name__ == "__main__":
    main()
