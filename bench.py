"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

  python bench.py               # single run at SPARK_GRAFT_CPUS (default 32)
  python bench.py --scaling     # local[8] vs local[32] subprocess runs +
                                # BENCH/BASELINE.md scaling-efficiency report

The timed unit is the north-rule pipeline — webpages parquet scan ->
mapInPandas parse -> enrich -> route -> per-sink + per-domain aggregates —
plus the headline training-data operators. Webpage materialization (input
table construction) is cached to parquet and excluded from timing, mirroring
production where the Iceberg input already exists.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "src"))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CACHE_ROOT = os.environ.get("WEBLOG_BENCH_CACHE", "/tmp/weblog_bench_cache")
#: deterministic synthetic webpages (seed folded into per-index hashing),
#: sized so the local[8] e2e run amortizes Spark startup (>=60 s)
N_PAGES = int(os.environ.get("WEBLOG_BENCH_PAGES", "1000000"))


def _webpages_cache(spark, n_pages: int) -> str:
    """Materialize the synthetic webpages input once (not timed — in
    production the Iceberg input table already exists)."""
    from weblog_pipeline.webpages import generate_webpages

    path = os.path.join(CACHE_ROOT, f"webpages_n{n_pages}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        generate_webpages(spark, n_pages, partitions=128).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def run_bench(sf_dir: str, cpus: int) -> dict:
    from pyspark.sql import functions as F

    from weblog_pipeline.config import PipelineConfig
    from weblog_pipeline.driver_queries import OBSERVED_TS_US
    from weblog_pipeline.ops import dedup, similarity, textstats
    from weblog_pipeline.pipeline import build_pipeline
    from weblog_pipeline.session import build_session

    spark = build_session(app_name="weblog-bench", parallelism=cpus,
                          shuffle_partitions=max(cpus, 16),
                          files_max_partition_bytes="8m")

    # warm the JVM AND the python-worker pool before timing: a tiny
    # mapInPandas across `cpus` partitions forks every worker once
    def _noop(it):
        yield from it

    spark.range(cpus * 4, numPartitions=cpus).mapInPandas(
        _noop, schema="id long"
    ).count()
    pages_path = _webpages_cache(spark, N_PAGES)
    webpages = spark.read.parquet(pages_path)
    n_docs = webpages.count()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    timings: dict[str, float] = {}

    def timed(name: str, fn, runs: int = 2):
        """Best-of-`runs` wall time. EVERY reported key defaults to
        best-of-2: this shared box swings single measurements by 2-4x
        under neighbor load (r3's parse_extract 'regression' was exactly
        such noise on a runs=1 key), and a best-of pair approximates
        steady-state capability the same way the e2e headline's
        best-of-five does. The e2e cold/warm keys pass runs=1 explicitly
        because the cold/warm split already serves that purpose."""
        best = None
        out = None
        for _ in range(runs):
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        return out

    # q1: flagship e2e (headline throughput). ONE pass: the salted
    # per-(sink,domain) aggregate is collected (<= |sinks|*|domains| rows)
    # and the per-sink totals roll up driver-side — no second execution.
    cfg = PipelineConfig(add_level=True)

    def e2e():
        result = build_pipeline(webpages, cfg, observed_ts_us=OBSERVED_TS_US)
        dom_rows = result.per_domain.collect()
        per_sink: dict[str, int] = {}
        for r in dom_rows:
            per_sink[r["sink"]] = per_sink.get(r["sink"], 0) + r["records"]
        return per_sink

    # first execution pays JIT/codegen warmup; the headline is the best of
    # FIVE warm runs (host noise on this shared box swings single runs by
    # ±40% — best-of approximates steady-state capability; every run is
    # reported in the JSON)
    timed("e2e_pipeline_cold", e2e, runs=1)
    warm_keys = [f"e2e_pipeline_warm{i}" for i in range(1, 6)]
    for k in warm_keys:
        timed(k, e2e, runs=1)
    timings["e2e_pipeline"] = min(timings[k] for k in warm_keys)

    extra: dict = {}

    def result() -> dict:
        e2e_sec = timings["e2e_pipeline"]
        return {
            "metric": "end-to-end parse→route→aggregate throughput (docs/sec)",
            "value": e2e_sec,
            "unit": "sec",
            "queries": timings,
            "sf": os.path.basename(os.path.normpath(sf_dir)),
            "docs": n_docs,
            "cpus": cpus,
            "docs_per_sec": round(n_docs / e2e_sec, 1) if e2e_sec else None,
            **extra,
        }

    # scaling sub-runs time only the headline: the efficiency claim is
    # about the PIPELINE, and a 2-core-pinned pass over every auxiliary
    # operator pushes one sub-run past an hour for no extra evidence
    if os.environ.get("SPARK_GRAFT_E2E_ONLY") == "1":
        spark.stop()
        return result()

    # q2: parse + text extraction only (UDF-bound stage)
    from weblog_pipeline.parse import page_texts, parse_events

    timed(
        "parse_extract",
        lambda: page_texts(parse_events(webpages))
        .agg(F.count("*"), F.sum(F.length("page_text")))
        .collect(),
    )

    # q3-q6: training-data operators
    timed("token_quality", lambda: textstats.quality_stats(docs).agg(
        F.sum("n_tokens"), F.sum("n_stopwords")).collect(), runs=2)
    timed("minhash_lsh", lambda: dedup.lsh_candidate_pairs(docs).count(), runs=2)
    timed("simhash",
          lambda: dedup.simhash(docs).agg(F.sum("simhash")).collect(), runs=2)

    def ann():
        q = embs.where(F.col("vec_id") % 500 == 0).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        return similarity.brute_force_topk(embs, q, k=5).count()

    timed("ann_topk", ann)

    def ann_hamming():
        q = embs.where(F.col("vec_id") % 500 == 0).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        return similarity.hamming_topk_queries(embs, q, k=5).count()

    timed("ann_hamming", ann_hamming)

    # q7-q9: round-over-round keys for the composed/scale-path operators
    # (same names as the CORRECTNESS queries so regressions line up)
    timed("dedup_pipeline", lambda: dedup.dedup_pipeline(docs).count(), runs=2)
    timed(
        "embedding_neardup",
        lambda: similarity.cosine_near_dup_pairs(embs, threshold=0.4).count(),
        runs=2,
    )

    def semdedup():
        emb_d = embs.select(
            "vec_id",
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
                "embedding"
            ),
        )
        return similarity.semantic_dedup(emb_d, threshold=0.4).count()

    timed("semantic_dedup", semdedup, runs=2)

    def ann_lsh():
        q = embs.where(F.col("vec_id") % 500 == 0).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        return similarity.lsh_topk(embs, q, k=5, probe_bits=1).count()

    timed("ann_lsh_topk", ann_lsh, runs=2)

    def ann_ivf():
        q = embs.where(F.col("vec_id") % 500 == 0).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        return similarity.ivf_topk(embs, q, k=5).count()

    timed("ann_ivf_topk", ann_ivf, runs=2)

    def pq_adc():
        q = embs.where(F.col("vec_id") % 500 == 0).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        return similarity.pq_adc_topk(embs, q, k=5).count()

    timed("pq_adc_topk", pq_adc, runs=2)

    # tracked recall@5 (basis points) per approximate ANN method against
    # brute force — the quality side of the speed/recall trade, recorded
    # every round so a bucket/centroid regression shows up as a NUMBER
    # drop, not just a red correctness row at the small SF. Denser query
    # sampling than the timing keys (%50, not %500): with 4 queries the
    # recall quantum is 500 bp and round-over-round comparison is noise.
    # Corpus side: the 1-in-3 audit slice (plus all queries) — mirrors
    # driver_queries.ann_recall, so the brute-force ground truth never
    # scans the full corpus at scale (recall on a uniform sub-corpus is an
    # unbiased estimate of full-corpus recall).
    def ann_recall_bp():
        audit = embs.where(
            (F.col("vec_id") % 3 == 0) | (F.col("vec_id") % 50 == 0)
        ).localCheckpoint()
        q = audit.where(F.col("vec_id") % 50 == 0).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        bf = (
            similarity.brute_force_topk(audit, q, k=5)
            .select("query_id", "neighbor_id")
            .localCheckpoint()
        )
        n_true = bf.count()
        # one centroid sample shared by both IVF variants, and the three
        # hit-counts submitted as CONCURRENT Spark jobs: each method's
        # wall cost at this SF is plan/codegen overhead, not scan, so the
        # key times the slowest method instead of the sum of all three
        seeds = similarity.sample_centroids(audit, similarity.IVF_TOPK_CELLS)
        methods = (
            ("ivf", similarity.ivf_topk(audit, q, k=5, seeds=seeds)),
            ("ivf_r", similarity.ivf_topk_refined(audit, q, k=5, n_iter=1,
                                                  seeds=seeds)),
            ("lsh", similarity.lsh_topk(audit, q, k=5, probe_bits=1)),
            ("pq", similarity.pq_adc_topk(audit, q, k=5)),
            ("pq_r", similarity.pq_adc_topk(audit, q, k=5,
                                            rerank=similarity.PQ_RERANK)),
            ("hamming", similarity.hamming_topk_queries(audit, q, k=5)),
        )

        def hits_of(item):
            mname, ap = item
            hits = bf.join(
                ap.select("query_id", "neighbor_id"),
                ["query_id", "neighbor_id"],
                "left_semi",
            ).count()
            return mname, (hits * 10000 // n_true if n_true else None)

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=5) as ex:
            out = dict(ex.map(hits_of, methods))
        return out

    extra["ann_recall_bp"] = timed("ann_recall", ann_recall_bp, runs=1)

    # tracked dedup-quality twin: LSH candidate recall/precision vs exact
    # Jaccard ground truth on the planted audit slice (same query the
    # correctness gate hashes)
    def dedup_recall_bp():
        from weblog_pipeline.driver_queries import q_dedup_lsh_recall

        row = q_dedup_lsh_recall(spark, sf_dir).collect()[0]
        return {
            "recall_bp": row["recall_bp"],
            "precision_bp": row["precision_bp"],
            "n_true": row["n_true"],
            "n_cand": row["n_cand"],
        }

    extra["dedup_recall_bp"] = timed("dedup_recall", dedup_recall_bp, runs=1)

    # q10: skew stress — bigram LM counts over a deterministic Zipf-ish
    # corpus (token rank log-uniform in [1, vocab): ~6% of all prefix
    # positions are the single hottest token). A reintroduced unbounded
    # window over w1 funnels that mass to ONE task and this number blows
    # up; the aggregate+join-back shape absorbs it map-side.
    zipf_path = os.path.join(CACHE_ROOT, "zipf_docs_500k")
    if not os.path.exists(os.path.join(zipf_path, "_SUCCESS")):
        toks = ", ".join(
            f"concat('t', cast(floor(power(100000.0D, "
            f"pmod(xxhash64(id * 37 + {j}), 1000000) / 1000000.0)) as long))"
            for j in range(12)
        )
        spark.range(500_000, numPartitions=cpus).selectExpr(
            "id as doc_id", f"concat_ws(' ', {toks}) as text"
        ).write.mode("overwrite").parquet(zipf_path)
    zipf_docs = spark.read.parquet(zipf_path)
    timed("zipf_stress", lambda: textstats.bigram_logprob(zipf_docs).count(), runs=2)

    # q11: image resize kernel — 64x48 -> 224x224 over 5k real BMPs; the
    # numpy gather keeps this Arrow-bound (a per-pixel Python loop is
    # ~250M interpreter iterations here and dominates the whole bench)
    from weblog_pipeline.ops import multimodal

    bmp_path = os.path.join(CACHE_ROOT, "bmp_64x48_5k")
    if not os.path.exists(os.path.join(bmp_path, "_SUCCESS")):
        def _gen_bmps(batches):
            import pandas as pd

            for pdf in batches:
                ids = [int(i) for i in pdf["id"]]
                yield pd.DataFrame(
                    {
                        "media_id": pd.array(ids, dtype="Int64"),
                        "payload": [
                            multimodal.encode_bmp(64, 48, i % 256) for i in ids
                        ],
                        "media_type": ["image"] * len(ids),
                    }
                )

        spark.range(5_000, numPartitions=cpus).mapInPandas(
            _gen_bmps, schema=multimodal.MEDIA_SCHEMA
        ).write.mode("overwrite").parquet(bmp_path)
    bmps = spark.read.parquet(bmp_path)
    timed(
        "resize_images",
        lambda: multimodal.resize_images(bmps, 224, 224)
        .agg(F.sum("n_bytes"))
        .collect(),
    )

    # q12: mixed-format media decode throughput — 4k real payloads cycling
    # BMP/PNG/GIF/JPEG/WAV/AVI through the fake=False decode path
    media_path = os.path.join(CACHE_ROOT, "media_mixed_4k")
    if not os.path.exists(os.path.join(media_path, "_SUCCESS")):
        def _gen_media(batches):
            import pandas as pd

            def pick(i):
                k = i % 6
                if k == 0:
                    return multimodal.encode_bmp(32, 24, i % 256), "image"
                if k == 1:
                    return multimodal.encode_png(24, 18, i % 256), "image"
                if k == 2:
                    return multimodal.encode_gif(24, 18, i % 256), "image"
                if k == 3:
                    return multimodal.encode_jpeg_color(24, 16, i % 200), "image"
                if k == 4:
                    return multimodal.encode_wav(64, i % 256, audio_format=7), "audio"
                return multimodal.encode_avi(16, 12, 2, i % 200), "video"

            for pdf in batches:
                ids = [int(i) for i in pdf["id"]]
                payloads, types = zip(*(pick(i) for i in ids))
                yield pd.DataFrame(
                    {
                        "media_id": pd.array(ids, dtype="Int64"),
                        "payload": list(payloads),
                        "media_type": list(types),
                    }
                )

        spark.range(4_000, numPartitions=cpus).mapInPandas(
            _gen_media, schema=multimodal.MEDIA_SCHEMA
        ).write.mode("overwrite").parquet(media_path)
    mixed = spark.read.parquet(media_path)
    timed(
        "media_decode",
        lambda: multimodal.extract_media_metadata(mixed, fake=False)
        .agg(F.sum("n_bytes"), F.sum("n_frames"))
        .collect(),
    )

    # q13-q14: round-3 text-pipeline operators over the documents table
    from weblog_pipeline.ops import corpus as corpus_ops

    timed(
        "dedup_lines",
        lambda: corpus_ops.dedup_lines(docs)
        .agg(F.sum("n_dropped"), F.sum(F.length("text")))
        .collect(),
    )
    timed(
        "tfidf_topk",
        lambda: textstats.tfidf_topk(docs, k=3).count(),
    )
    timed(
        "phrase_search",
        lambda: textstats.phrase_search(docs, ("table", "hash")).count(),
    )
    # q14b: iterative word-graph ranking — the session-5 graph family's
    # tracked representative (pagerank over the collocation vocabulary)
    from weblog_pipeline.ops import graph as graph_ops

    timed(
        "textrank",
        lambda: graph_ops.textrank_keywords(docs, k=30).count(),
    )

    # q15-q16: substring-grain CDC dedup + hashed linear classifier over
    # the 500k-doc zipf corpus (the position explode makes cdc the widest
    # text op in the suite: ~30M per-character rows through a per-doc
    # bounded window)
    # 100k-doc slice: the per-character position explode makes CDC ~10x
    # wider per doc than the token ops; 100k docs (~6M window rows) is
    # enough signal without dominating the pinned low-core scaling runs
    timed(
        "cdc_dedup",
        lambda: dedup.cdc_dup_stats(zipf_docs.where(F.col("doc_id") % 5 == 0))
        .agg(F.sum("n_dup_chunks"), F.sum("dup_bytes"))
        .collect(),
        runs=2,
    )
    timed(
        "quality_classifier",
        lambda: textstats.quality_classifier(
            zipf_docs, textstats.classifier_weights(spark)
        )
        .agg(F.sum("score"), F.count_if(F.col("label") == "keep"))
        .collect(),
    )

    # q17: the warehouse join family's tracked representative — the
    # Q5-shape star join (folded broadcast dims, one fact-fact shuffle)
    # over the sf dir's relational tables
    from weblog_pipeline.ops import relational

    timed(
        "star_join",
        lambda: relational.regional_revenue(
            spark.read.parquet(f"{sf_dir}/region.parquet"),
            spark.read.parquet(f"{sf_dir}/nation.parquet"),
            spark.read.parquet(f"{sf_dir}/customer.parquet"),
            spark.read.parquet(f"{sf_dir}/orders.parquet"),
            spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
        )
        .agg(F.sum("revenue_c"), F.sum("n_orders"))
        .collect(),
    )

    spark.stop()
    return result()


def _cpu_scaling_probe() -> dict:
    """Measure what the HARDWARE gives N busy processes (SMT/steal-aware
    context for interpreting Spark's N->4N numbers)."""
    import multiprocessing as mp
    import queue as queue_mod

    def burn(q):
        t0 = time.time()
        x = n = 0
        while time.time() - t0 < 2.0:
            for _ in range(100000):
                x += 1
            n += 1
        q.put(n)

    out = {}
    for nproc in (1, 2, 8, 32):
        q = mp.Queue()
        ps = [mp.Process(target=burn, args=(q,)) for _ in range(nproc)]
        [p.start() for p in ps]
        total = 0
        for _ in ps:
            try:
                total += q.get(timeout=30)
            except queue_mod.Empty:
                break
        [p.join() for p in ps]
        out[nproc] = total
    return out


def run_scaling(sf_dir: str) -> None:
    """N vs 4N cores on identical input -> BENCH/BASELINE.md.

    Primary pair: local[2] vs local[8] — both within the machine's
    physical-core budget, so it isolates the PIPELINE's scaling behavior.
    Secondary pair: local[8] vs local[32] — reported with a raw-CPU probe
    because 32 threads on this box share SMT siblings (the hardware itself
    only scales ~2.4x from 8 to 32 busy processes).
    """
    probe = _cpu_scaling_probe()
    results = {}
    # larger input than the default per-round bench: amortizes the fixed
    # per-job driver overhead that otherwise dominates the faster runs
    scaling_pages = os.environ.get("WEBLOG_BENCH_PAGES", "4000000")
    import shutil as _shutil

    have_taskset = _shutil.which("taskset") is not None
    # build the shared input caches UNPINNED first: cache construction is
    # excluded from timing, so generating 4M pages on a 2-core pin would
    # only waste an hour of wall-clock, not change any number
    subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--prepare"],
        env=dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
                 WEBLOG_BENCH_PAGES=scaling_pages),
        capture_output=True, text=True, timeout=3600, check=True,
    )
    for cpus in (2, 8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir,
                   WEBLOG_BENCH_PAGES=scaling_pages, SPARK_GRAFT_E2E_ONLY="1")
        cmd = [sys.executable, os.path.abspath(__file__)]
        if have_taskset:
            # pin the whole process tree to exactly `cpus` CPUs: an
            # unpinned local[N] lets JVM helper threads (GC, IO, codegen)
            # spill onto idle cores, inflating the small-N baseline — a
            # real N-core executor has no such free cores
            cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
        out = subprocess.run(
            cmd, env=env, capture_output=True, text=True, timeout=5400,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)

    def dps(c):
        return results[c]["docs_per_sec"]

    eff_2_8 = round((dps(8) / dps(2)) / 4, 3)
    eff_8_32 = round((dps(32) / dps(8)) / 4, 3)
    hw_8_32 = round((probe[32] / probe[8]) / 4, 3)
    os.makedirs("BENCH", exist_ok=True)
    # preserve hand-written measurement-notes sections ("## Round-...")
    # across regenerations — they carry root-cause context the generated
    # tables cannot
    notes = ""
    try:
        with open("BENCH/BASELINE.md") as fh:
            old = fh.read()
        idx = old.find("\n## Round-")
        if idx >= 0:
            notes = old[idx:]
    except FileNotFoundError:
        pass
    with open("BENCH/BASELINE.md", "w") as fh:
        fh.write(
            "# BENCH baseline — scaling evidence (N vs 4N cores)\n\n"
            f"Input: {results[8]['docs']} deterministic synthetic webpages "
            "(seed=42), identical parquet input for all runs; each run is "
            "CPU-pinned (taskset) to exactly its core budget, emulating an "
            "N-core executor; timed unit = full parse→enrich→route→aggregate "
            "job, steady-state (warm) execution; cold numbers in the JSON "
            "below.\n\n"
            "| parallelism | e2e sec (warm) | docs/sec |\n|---|---|---|\n"
            + "".join(
                f"| local[{c}] | {results[c]['queries']['e2e_pipeline']} | {dps(c)} |\n"
                for c in (2, 8, 32)
            )
            + f"\n**Primary (physical cores): local[2]→local[8] efficiency "
            f"(D8/D2)/4 = {eff_2_8}** (target >= 0.8)\n\n"
            f"Secondary: local[8]→local[32] efficiency = {eff_8_32}; for "
            f"context, raw CPU on this box gives {hw_8_32} efficiency over "
            f"the same 8→32 step (SMT sibling sharing — busy-process probe: "
            f"{probe}), so the 32-thread step is hardware-capped below the "
            f"0.8 target regardless of software.\n\n"
            f"Full query timings:\n\n```json\n"
            f"{json.dumps(results, indent=2)}\n```\n"
            + notes
        )
    print(json.dumps({
        "scaling_efficiency_2_8": eff_2_8,
        "scaling_efficiency_8_32": eff_8_32,
        "hw_ceiling_8_32": hw_8_32,
        "docs_per_sec": {c: dps(c) for c in (2, 8, 32)},
    }))


def prepare_caches(sf_dir: str) -> None:
    """Build the webpages parquet cache with full parallelism (untimed)."""
    from weblog_pipeline.session import build_session

    spark = build_session(app_name="weblog-bench-prepare")
    _webpages_cache(spark, N_PAGES)
    spark.stop()


def _pin_to_core_budget() -> None:
    """Re-exec under `taskset -c 0-(CPUS-1)` when running unpinned with
    more cores available than the budget — the same protocol the scaling
    sub-runs use, so single-run (driver) numbers are comparable to the
    scaling evidence. No-op if taskset is missing or already pinned."""
    import shutil

    if shutil.which("taskset") is None:
        return
    try:
        affinity = os.sched_getaffinity(0)
    except AttributeError:  # non-Linux
        return
    if len(affinity) <= CPUS:
        return
    os.execvp(
        "taskset", ["taskset", "-c", f"0-{CPUS - 1}", sys.executable] + sys.argv
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--prepare", action="store_true")
    args = ap.parse_args()
    if args.prepare:
        prepare_caches(SF_DIR)
    elif args.scaling:
        # scaling sub-runs pin themselves per core budget
        run_scaling(SF_DIR)
    else:
        _pin_to_core_budget()
        print(json.dumps(run_bench(SF_DIR, CPUS)))
