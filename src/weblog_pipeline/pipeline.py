"""End-to-end job: parse -> enrich -> route -> aggregate (+ sinks, metrics).

One single scan of the input feeds everything: the parse UDF is the only
Python stage; enrichment and routing are codegen'd projections fused into
the same stage as the UDF output; only the final aggregations shuffle.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .aggregate import domain_counts, sink_counts
from .config import DEFAULT_ROUTES, DEFAULT_SINK, PipelineConfig, SinkRoute
from .enrich import enrich_events
from .parse import event_rows, page_texts, parse_events
from .route import with_sink


@dataclass
class PipelineResult:
    logs: DataFrame
    texts: DataFrame
    per_sink: DataFrame
    per_domain: DataFrame
    observed_ts_us: int
    sink_names: tuple[str, ...] = ()
    metrics: dict = field(default_factory=dict)


def build_pipeline(
    webpages: DataFrame,
    cfg: PipelineConfig,
    routes: tuple[SinkRoute, ...] = DEFAULT_ROUTES,
    default_sink: str = DEFAULT_SINK,
    observed_ts_us: int | None = None,
) -> PipelineResult:
    """Declare the full logical plan (no execution happens here)."""
    if observed_ts_us is None:
        observed_ts_us = int(time.time() * 1_000_000)

    # cheap prunes BEFORE the opaque UDF (Catalyst can't push through it)
    scanned = webpages.where(F.col("html").isNotNull())

    parsed = parse_events(scanned)
    events = event_rows(parsed)

    # O3 predicate filter: empty list = pass-all (connector.go:103-109,220-224)
    if cfg.include_event_names:
        events = events.where(
            F.col("event_name").isin(list(cfg.include_event_names))
        )

    logs = enrich_events(events, cfg, observed_ts_us)
    logs = with_sink(logs, routes, default_sink)

    return PipelineResult(
        logs=logs,
        texts=page_texts(parsed),
        per_sink=sink_counts(logs),
        per_domain=domain_counts(logs),
        observed_ts_us=observed_ts_us,
        # dedupe: a route reusing default_sink (or two routes sharing a
        # sink) must not double-count in the Observation / run_metrics
        sink_names=tuple(
            dict.fromkeys(tuple(r.sink for r in routes) + (default_sink,))
        ),
    )


def run_to_sinks(
    spark: SparkSession,
    result: PipelineResult,
    io,
    write_texts: bool = False,
) -> dict[str, int]:
    """Materialize: ONE partitioned write fans records out to all sinks
    (sink=<name> partition dirs == per-sink Iceberg tables); per-sink
    counts ride along as an Observation on the same pass (O23 counters)
    instead of a second execution of the DAG. Returns {sink: records}."""
    from pyspark.sql import Observation

    if write_texts:
        io.append(result.texts, "page_texts")

    # per-sink counts are algebraic count_if aggregates over the statically
    # known sink set, so they ride the write as an Observation
    obs = Observation("pipeline")
    obs_exprs = [F.count(F.lit(1)).alias("records")] + [
        F.count_if(F.col("sink") == s).alias(f"n_{s}") for s in result.sink_names
    ]
    observed = result.logs.observe(obs, *obs_exprs)

    # single pass, partitioned by sink (O20 fan-out without N scans)
    io.append(observed, "log_records", partition_by=["sink"])

    got = obs.get
    counts = {s: got[f"n_{s}"] for s in result.sink_names if got[f"n_{s}"] > 0}
    result.metrics["per_sink_counts"] = counts
    result.metrics["records"] = got["records"]

    # persist run-level counters (O23 observability; north rule: metrics
    # checkpointed alongside lineage) — one row per (run, sink)
    metrics_rows = [
        (result.observed_ts_us, s, int(got[f"n_{s}"])) for s in result.sink_names
    ]
    metrics_df = spark.createDataFrame(
        metrics_rows, "run_ts_us long, sink string, records long"
    )
    io.append(metrics_df.coalesce(1), "run_metrics")
    return counts
