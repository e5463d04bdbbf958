"""Streaming pipeline: availableNow micro-batch run equals the batch result;
restart from checkpoint is exactly-once."""

from collections import Counter

from weblog_pipeline.config import PipelineConfig
from weblog_pipeline.driver_queries import OBSERVED_TS_US
from weblog_pipeline.generate import gen_page
from weblog_pipeline.oracle import process_page
from weblog_pipeline.streaming import start_sink_writer, streaming_logs
from weblog_pipeline.webpages import generate_webpages

CFG = PipelineConfig(add_level=True)
N = 90


def _oracle_sink_counts():
    c: Counter = Counter()
    for i in range(N):
        page = gen_page(i)
        _, recs = process_page(CFG, page.url, page.html, OBSERVED_TS_US)
        c.update(r.sink for r in recs)
    return dict(c)


def test_streaming_matches_batch_and_is_exactly_once(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    generate_webpages(spark, N, partitions=3).write.parquet(inp)

    logs = streaming_logs(spark, inp, CFG, OBSERVED_TS_US, max_files_per_trigger=1)
    q = start_sink_writer(logs, out, ckpt)
    q.awaitTermination(120)

    got = {
        r["sink"]: r["n"]
        for r in spark.read.parquet(out).groupBy("sink").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert got == _oracle_sink_counts()

    # restart with no new input: checkpoint prevents reprocessing
    q2 = start_sink_writer(
        streaming_logs(spark, inp, CFG, OBSERVED_TS_US, max_files_per_trigger=1),
        out, ckpt,
    )
    q2.awaitTermination(120)
    got2 = {
        r["sink"]: r["n"]
        for r in spark.read.parquet(out).groupBy("sink").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert got2 == got