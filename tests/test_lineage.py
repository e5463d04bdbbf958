"""Checkpoint/resume: kill-and-rerun produces no duplicates and no missing
rows; completed chunks are skipped on resume."""

import os

import pytest

from weblog_pipeline.config import PipelineConfig
from weblog_pipeline.driver_queries import OBSERVED_TS_US
from weblog_pipeline.lineage import LineageStore, run_resumable
from weblog_pipeline.pipeline import build_pipeline
from weblog_pipeline.webpages import generate_webpages

CFG = PipelineConfig()


def _build_logs(webpages):
    return build_pipeline(webpages, CFG, observed_ts_us=OBSERVED_TS_US).logs


@pytest.fixture()
def input_path(spark, tmp_path):
    path = str(tmp_path / "webpages")
    generate_webpages(spark, 120, partitions=4).write.parquet(path)
    return path


def expected_rows(spark, input_path):
    return _build_logs(spark.read.parquet(input_path)).count()


def read_output(spark, out):
    return spark.read.option("basePath", out).parquet(out + "/run=r1/*")


def test_full_run_then_noop_resume(spark, tmp_path, input_path):
    out = str(tmp_path / "out")
    ledger = LineageStore(spark, str(tmp_path / "ledger"))

    s1 = run_resumable(spark, input_path, out, "r1", _build_logs, ledger, unit_batch=2)
    assert s1["chunks_skipped"] == 0 and s1["units_total"] == 4
    n = expected_rows(spark, input_path)
    assert s1["rows_out"] == n
    assert read_output(spark, out).count() == n

    # resume with nothing pending: all chunks skipped, output unchanged
    s2 = run_resumable(spark, input_path, out, "r1", _build_logs, ledger, unit_batch=2)
    assert s2["chunks_skipped"] == s2["chunks_total"] == 2
    assert s2["rows_out"] == 0
    assert read_output(spark, out).count() == n


def test_crash_mid_run_resumes_exactly(spark, tmp_path, input_path):
    out = str(tmp_path / "out")
    ledger = LineageStore(spark, str(tmp_path / "ledger"))

    calls = {"n": 0}

    def flaky_build(webpages):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated executor loss")
        return _build_logs(webpages)

    with pytest.raises(RuntimeError):
        run_resumable(spark, input_path, out, "r1", flaky_build, ledger, unit_batch=2)

    # chunk 0 committed, chunk 1 not: resume completes only chunk 1
    s = run_resumable(spark, input_path, out, "r1", _build_logs, ledger, unit_batch=2)
    assert s["chunks_skipped"] == 1

    n = expected_rows(spark, input_path)
    got = read_output(spark, out)
    assert got.count() == n  # no dups, no gaps
    assert got.select("url", "event_name", "ts_ns").distinct().count() == n

def test_crash_between_sink_write_and_ledger_commit(spark, tmp_path, input_path):
    """Chaos test for the sink-boundary window: the process dies AFTER a
    chunk's multi-sink output is on disk but BEFORE the ledger records it
    — and worse, one sink partition of that chunk is only half there
    (mid-write kill). The rerun must re-execute exactly that chunk and
    its static chunk-dir overwrite must replace the partial output, so
    every sink ends with exactly its expected rows — no duplicates, no
    gaps, per sink (SURVEY §4 overwrite-by-filter idempotency)."""
    import shutil

    out = str(tmp_path / "out")
    ledger = LineageStore(spark, str(tmp_path / "ledger"))

    class CrashAfterWrite(LineageStore):
        # record() is called once for the manifest, then once per chunk
        # AFTER that chunk's sink write: dying inside call 3 leaves chunk
        # 1's output committed on disk with no ledger row
        calls = 0

        def record(self, rows):
            CrashAfterWrite.calls += 1
            if CrashAfterWrite.calls == 3:
                raise RuntimeError("simulated kill between write and ledger")
            super().record(rows)

    crashy = CrashAfterWrite(spark, str(tmp_path / "ledger"))
    with pytest.raises(RuntimeError, match="between write and ledger"):
        run_resumable(spark, input_path, out, "r1", _build_logs, crashy, unit_batch=2)

    # chunk 1's output exists but is unrecorded; amputate one sink
    # partition of it to simulate the kill landing mid-write
    chunk1 = os.path.join(out, "run=r1", "chunk=000001")
    sink_dirs = sorted(
        d for d in os.listdir(chunk1) if d.startswith("sink=")
    )
    assert len(sink_dirs) >= 2, "fixture must route to multiple sinks"
    shutil.rmtree(os.path.join(chunk1, sink_dirs[0]))

    # rerun with a healthy ledger: only chunk 0 is skipped; chunk 1
    # re-executes and its overwrite replaces the amputated output
    s = run_resumable(spark, input_path, out, "r1", _build_logs, ledger, unit_batch=2)
    assert s["chunks_skipped"] == 1

    expected = (
        _build_logs(spark.read.parquet(input_path))
        .groupBy("sink")
        .count()
        .collect()
    )
    got = {
        r["sink"]: r["count"]
        for r in read_output(spark, out).groupBy("sink").count().collect()
    }
    assert got == {r["sink"]: r["count"] for r in expected}
    # and no row-level duplicates hiding inside equal counts
    o = read_output(spark, out)
    assert o.count() == o.select("url", "event_name", "ts_ns").distinct().count()


def test_resume_refuses_changed_input_list(spark, tmp_path, input_path):
    out = str(tmp_path / "out")
    ledger = LineageStore(spark, str(tmp_path / "ledger"))
    run_resumable(spark, input_path, out, "r1", _build_logs, ledger, unit_batch=2)

    # add a file: chunk numbering would shift -> resume must refuse
    extra = str(tmp_path / "webpages")
    generate_webpages(spark, 30, partitions=1).write.mode("append").parquet(extra)
    with pytest.raises(ValueError, match="input file list changed"):
        run_resumable(spark, input_path, out, "r1", _build_logs, ledger, unit_batch=2)
    # a fresh run_id accepts the new list
    s = run_resumable(spark, input_path, out, "r2", _build_logs, ledger, unit_batch=2)
    assert s["chunks_skipped"] == 0


def test_ledger_records_real_rows_in(spark, tmp_path, input_path):
    """rows_in/rows_out live on chunk-grain rows (status='chunk_done'),
    one per chunk, so a plain SUM over them equals the input row count —
    even with multiple units per chunk (unit_batch=2 -> 2 chunks of 2
    units here, the multi-chunk case where grain duplication would
    overcount)."""
    out = str(tmp_path / "out")
    ledger = LineageStore(spark, str(tmp_path / "ledger"))
    run_resumable(spark, input_path, out, "r1", _build_logs, ledger, unit_batch=2)
    ledger_df = spark.read.parquet(str(tmp_path / "ledger"))
    chunk_rows = ledger_df.where("status = 'chunk_done'").collect()
    assert chunk_rows and all(r["rows_in"] >= 0 for r in chunk_rows)
    assert sum(r["rows_in"] for r in chunk_rows) == 120
    # unit rows exist for resume planning and carry no counts (chunk grain)
    unit_rows = ledger_df.where("status = 'done'").collect()
    assert unit_rows and all(r["rows_in"] == -1 for r in unit_rows)
    assert all(not r["unit_id"].startswith("__") for r in unit_rows)
