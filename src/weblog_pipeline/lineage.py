"""Per-partition lineage ledger + resumable re-runs (north-rule obligation).

Unit of work = one input file of the webpages table (Iceberg data file /
parquet part-file). A run manifest row records (run_id, unit_id, status,
rows_in, rows_out, duration_ms, finished_at_us). On restart with the same
run_id, completed units are anti-joined away and only pending units are
re-processed; each unit's sink output lands under a unit-scoped directory
(dynamic partition by unit) so a re-run overwrites its own partial output
idempotently — no duplicates, no missing rows.

At 100 TB the ledger stays tiny (one row per input file, ~10^5 rows for
10^12 docs), so resume planning is a driver-side broadcast anti-join.
"""

from __future__ import annotations

import hashlib
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("unit_id", T.StringType()),
        T.StructField("input_file", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("rows_in", T.LongType()),
        T.StructField("rows_out", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("finished_at_us", T.LongType()),
    ]
)


def unit_id_for(input_file: str) -> str:
    return hashlib.md5(input_file.encode()).hexdigest()[:16]


#: sentinel unit_id for the run's frozen input manifest row
MANIFEST_UNIT = "__manifest__"


def chunk_unit_id(chunk_no: int) -> str:
    """Sentinel unit_id of a chunk-grain ledger row (status 'chunk_done'):
    rows_in/rows_out are observed per CHUNK (the execution unit), so they
    live on one row per chunk — unit rows carry -1 there. Sum rows_in over
    status='chunk_done' rows; use status='done' rows for resume planning."""
    return f"__chunk__{chunk_no:06d}"


def manifest_digest(units: list[tuple[str, str]]) -> str:
    """Digest of the sorted unit list — resume is only valid against the
    exact same input file set (chunk numbering is positional)."""
    return hashlib.md5("\n".join(u for u, _ in units).encode()).hexdigest()


def list_units(spark: SparkSession, input_path: str) -> list[tuple[str, str]]:
    """(unit_id, input_file) for every data file of the input table.

    Enumerated from the file index (a metadata operation — Spark's
    InMemoryFileIndex / Iceberg's files table), NOT by scanning rows:
    resume planning must stay O(#files), not O(data)."""
    files = list(spark.read.parquet(input_path).inputFiles())
    return sorted((unit_id_for(f), f) for f in files)


@dataclass
class LineageStore:
    spark: SparkSession
    path: str

    def completed_units(self, run_id: str) -> set[str]:
        if not os.path.exists(self.path):
            return set()
        df = self.spark.read.parquet(self.path)
        rows = (
            df.where((F.col("run_id") == run_id) & (F.col("status") == "done"))
            .select("unit_id")
            .collect()
        )
        return {r["unit_id"] for r in rows}

    def manifest(self, run_id: str) -> str | None:
        """The frozen input-list digest recorded on the run's first attempt."""
        if not os.path.exists(self.path):
            return None
        rows = (
            self.spark.read.parquet(self.path)
            .where((F.col("run_id") == run_id) & (F.col("unit_id") == MANIFEST_UNIT))
            .select("input_file")
            .collect()
        )
        return rows[0]["input_file"] if rows else None

    def record(self, rows: list[dict]) -> None:
        df = self.spark.createDataFrame(
            [tuple(r[f.name] for f in LEDGER_SCHEMA.fields) for r in rows],
            LEDGER_SCHEMA,
        )
        df.coalesce(1).write.mode("append").parquet(self.path)


def run_resumable(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    run_id: str,
    build_logs,
    ledger: LineageStore,
    unit_batch: int = 8,
) -> dict:
    """Process pending input files in unit batches; each batch's output is
    written under run_id/unit partition dirs (idempotent overwrite), then
    the ledger commits the units as done.

    build_logs: callable(webpages_df) -> logs_df (the compiled pipeline).
    Returns summary metrics.
    """
    units = list_units(spark, input_path)

    # freeze the input file list on first attempt: chunk numbering is
    # positional, so resuming against an input set that gained/lost files
    # would mis-map ledger rows to on-disk chunk=N outputs (dups or gaps)
    digest = manifest_digest(units)
    prior = ledger.manifest(run_id)
    if prior is None:
        ledger.record(
            [
                {
                    "run_id": run_id,
                    "unit_id": MANIFEST_UNIT,
                    "input_file": digest,
                    "status": "manifest",
                    "rows_in": len(units),
                    "rows_out": -1,
                    "duration_ms": -1,
                    "finished_at_us": int(time.time() * 1_000_000),
                }
            ]
        )
    elif prior != digest:
        raise ValueError(
            f"run {run_id}: input file list changed since the first attempt "
            f"(manifest {prior} != current {digest}); start a new run_id"
        )

    done = ledger.completed_units(run_id)

    # deterministic fixed chunking over the FULL sorted unit list — chunk
    # membership never depends on what already completed, so a crashed
    # chunk always re-forms identically and its overwrite is idempotent
    chunks = [units[i : i + unit_batch] for i in range(0, len(units), unit_batch)]

    n_rows_out = 0
    n_chunks_skipped = 0
    for chunk_no, chunk in enumerate(chunks):
        if all(u in done for u, _ in chunk):
            n_chunks_skipped += 1
            continue
        t0 = time.time()
        files = [f for _, f in chunk]
        webpages = spark.read.parquet(*files)
        # rows_in/rows_out ride the write as Observations — a separate
        # count() would execute the whole parse pipeline a second time
        from pyspark.sql import Observation

        obs_in = Observation(f"chunk_{chunk_no}_in")
        webpages = webpages.observe(obs_in, F.count(F.lit(1)).alias("rows_in"))
        logs = build_logs(webpages)
        obs = Observation(f"chunk_{chunk_no}")
        observed = logs.observe(obs, F.count(F.lit(1)).alias("rows_out"))
        # chunk-scoped overwrite: a re-run of this chunk replaces exactly
        # its own prior (possibly partial) output — no dups, no gaps
        observed.write.mode("overwrite").partitionBy("sink").parquet(
            os.path.join(output_path, f"run={run_id}", f"chunk={chunk_no:06d}")
        )
        rows_out = obs.get["rows_out"]
        rows_in = obs_in.get["rows_in"]
        dur = int((time.time() - t0) * 1000)
        now_us = int(time.time() * 1_000_000)
        # rows_in/rows_out are CHUNK-grain observations (the chunk is the
        # unit of execution), so they are recorded on ONE chunk-grain row —
        # duplicating them onto each unit row would make a naive
        # SUM(rows_in) over 'done' rows overcount by the chunk width
        ledger.record(
            [
                {
                    "run_id": run_id,
                    "unit_id": chunk_unit_id(chunk_no),
                    "input_file": f"chunk={chunk_no:06d}",
                    "status": "chunk_done",
                    "rows_in": rows_in,
                    "rows_out": rows_out,
                    "duration_ms": dur,
                    "finished_at_us": now_us,
                }
            ]
            + [
                {
                    "run_id": run_id,
                    "unit_id": u,
                    "input_file": f,
                    "status": "done",
                    "rows_in": -1,  # tracked at chunk grain, see above
                    "rows_out": -1,
                    "duration_ms": dur,
                    "finished_at_us": now_us,
                }
                for u, f in chunk
            ]
        )
        n_rows_out += rows_out

    return {
        "run_id": run_id,
        "units_total": len(units),
        "units_done_before": len(done),
        "chunks_total": len(chunks),
        "chunks_skipped": n_chunks_skipped,
        "rows_out": n_rows_out,
    }
