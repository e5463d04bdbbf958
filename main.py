"""spark-submit entrypoint: run the parse→enrich→route→aggregate job.

Cluster launch (north rule):
    zip -r pipeline.zip -j src weblog_pipeline  # or: cd src && zip -r ../pipeline.zip weblog_pipeline
    spark-submit --master <cluster> --py-files pipeline.zip main.py \
        --input <webpages table/path> --output <sink namespace/dir>

Sandbox launch:
    python main.py --generate 10000 --output /tmp/weblog_out
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "src"))

from weblog_pipeline.config import PipelineConfig
from weblog_pipeline.pipeline import build_pipeline, run_to_sinks
from weblog_pipeline.session import build_session
from weblog_pipeline.tableio import TableIO
from weblog_pipeline.webpages import generate_webpages


def main() -> None:
    ap = argparse.ArgumentParser(description="weblog parse→enrich→route→aggregate")
    ap.add_argument("--input", help="webpages table (Iceberg name or parquet path)")
    ap.add_argument("--input-warc", help="WARC directory (warc.write_warc_files layout)")
    ap.add_argument("--generate", type=int, default=0,
                    help="instead of --input, generate N synthetic pages")
    ap.add_argument("--output", required=True, help="sink namespace or directory")
    ap.add_argument("--config", help="JSON file with PipelineConfig fields")
    ap.add_argument("--cpus", type=int, default=None, help="local[N] parallelism")
    ap.add_argument("--write-texts", action="store_true")
    args = ap.parse_args()

    cfg = PipelineConfig()
    if args.config:
        with open(args.config) as fh:
            raw = fh.read()
        try:
            parsed = json.loads(raw)
        except json.JSONDecodeError:
            try:
                import yaml  # the reference configures via YAML; optional here
            except ImportError as exc:
                raise SystemExit(
                    f"{args.config} is not JSON and pyyaml is unavailable"
                ) from exc
            parsed = yaml.safe_load(raw)
        cfg = PipelineConfig.from_dict(parsed)

    spark = build_session(app_name="weblog-pipeline", parallelism=args.cpus)
    io = TableIO(spark, args.output)

    if args.generate:
        webpages = generate_webpages(spark, args.generate)
    elif args.input_warc:
        from pyspark.sql import functions as F

        from weblog_pipeline.warc import read_warc_files

        # crawl container ingest: lang is not a WARC field; downstream
        # treats it as metadata-optional
        webpages = read_warc_files(spark, args.input_warc).withColumn(
            "lang", F.lit(None).cast("string")
        )
    elif args.input:
        if os.path.sep in args.input or args.input.endswith(".parquet"):
            webpages = spark.read.parquet(args.input)
        else:
            # dotted name = Iceberg table (catalog must be configured)
            webpages = spark.read.format("iceberg").load(args.input)
    else:
        ap.error("one of --input / --input-warc / --generate is required")
        return

    t0 = time.time()
    result = build_pipeline(webpages, cfg)
    counts = run_to_sinks(spark, result, io, write_texts=args.write_texts)
    elapsed = time.time() - t0

    n_docs = args.generate or webpages.count()
    # per_sink_counts / observed_records come from the df.observe
    # Observation riding the sink write (O23) — the same counters the
    # run_metrics ledger persists, printed so an operator sees them
    # without querying the ledger table
    print(json.dumps({
        "per_sink_counts": counts,
        "observed_records": int(result.metrics.get("records", 0)),
        "run_metrics_table": f"{args.output}/run_metrics",
        "elapsed_sec": round(elapsed, 3),
        "docs_per_sec": round(n_docs / elapsed, 1),
        "output": args.output,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
