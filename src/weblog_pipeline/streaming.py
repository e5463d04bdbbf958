"""Structured Streaming variant of the pipeline: continuous webpage ingest
-> parse -> enrich -> route -> partitioned sink + windowed per-sink counts.

The reference consumes discrete trace batches statelessly
(ConsumeTraces per batch, no cross-batch state — connector.go:120-144), so
every pipeline stage here is a stateless streaming transform; exactly-once
delivery to the file sink comes from Spark's checkpoint + file-sink
manifest. The windowed aggregate adds the collector-style observability
counters over event time with a watermark for late data.

At scale this runs as readStream over an Iceberg/file source with
maxFilesPerTrigger bounding micro-batch size; the same compiled plan
(identical code path as batch) serves both modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import DEFAULT_ROUTES, DEFAULT_SINK, PipelineConfig, SinkRoute
from .enrich import enrich_events
from .parse import event_rows, parse_events
from .route import with_sink
from .webpages import WEBPAGES_SCHEMA


def streaming_logs(
    spark: SparkSession,
    input_path: str,
    cfg: PipelineConfig,
    observed_ts_us: int,
    routes: tuple[SinkRoute, ...] = DEFAULT_ROUTES,
    default_sink: str = DEFAULT_SINK,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """Streaming DataFrame of routed log records from a file source."""
    stream = (
        spark.readStream.schema(WEBPAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    stream = stream.where(F.col("html").isNotNull())
    events = event_rows(parse_events(stream))
    if cfg.include_event_names:
        events = events.where(
            F.col("event_name").isin(list(cfg.include_event_names))
        )
    logs = enrich_events(events, cfg, observed_ts_us)
    return with_sink(logs, routes, default_sink)


def start_sink_writer(
    logs: DataFrame,
    output_path: str,
    checkpoint_path: str,
    trigger_available_now: bool = True,
):
    """Exactly-once partitioned fan-out write (one stream, all sinks)."""
    writer = (
        logs.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .partitionBy("sink")
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_sink_counts(logs: DataFrame, window: str = "1 hour",
                         watermark: str = "2 hours") -> DataFrame:
    """Per-sink counts over event-time windows with late-data watermark."""
    return (
        logs.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "sink")
        .agg(F.count(F.lit(1)).alias("records"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "sink",
            "records",
        )
    )


def start_counts_writer(
    counts: DataFrame,
    output_path: str,
    checkpoint_path: str,
    trigger_available_now: bool = True,
):
    writer = (
        counts.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
