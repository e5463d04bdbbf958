"""Dump .explain('formatted') for every bench-timed query path into
plans/r07/<key>_<tag>.txt (tag = before/after), mirroring exactly the
DataFrames bench.py times. Usage:

    python scripts/plans_r07.py before [key ...]
    python scripts/plans_r07.py after  [key ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "src"))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CACHE_ROOT = os.environ.get("WEBLOG_BENCH_CACHE", "/tmp/weblog_bench_cache")


def main() -> None:
    tag = sys.argv[1]
    only = set(sys.argv[2:])
    out_dir = os.path.join(REPO, "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import functions as F

    from weblog_pipeline.config import PipelineConfig
    from weblog_pipeline.driver_queries import OBSERVED_TS_US
    from weblog_pipeline.ops import corpus as corpus_ops
    from weblog_pipeline.ops import dedup, graph, multimodal, relational, similarity, textstats
    from weblog_pipeline.parse import page_texts, parse_events
    from weblog_pipeline.pipeline import build_pipeline
    from weblog_pipeline.session import build_session

    spark = build_session(app_name="plans-r07", shuffle_partitions=32,
                          files_max_partition_bytes="8m")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    webpages = spark.read.parquet(os.path.join(CACHE_ROOT, "webpages_n1000000"))
    zipf_docs = spark.read.parquet(os.path.join(CACHE_ROOT, "zipf_docs_500k"))
    bmps = spark.read.parquet(os.path.join(CACHE_ROOT, "bmp_64x48_5k"))
    mixed = spark.read.parquet(os.path.join(CACHE_ROOT, "media_mixed_4k"))

    q = embs.where(F.col("vec_id") % 500 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    emb_d = embs.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("embedding"),
    )

    def dq_recall(s):
        from weblog_pipeline.driver_queries import q_dedup_lsh_recall
        return q_dedup_lsh_recall(s, SF_DIR)

    builders = {
        "e2e_pipeline": lambda: build_pipeline(
            webpages, PipelineConfig(add_level=True), observed_ts_us=OBSERVED_TS_US
        ).per_domain,
        "parse_extract": lambda: page_texts(parse_events(webpages)).agg(
            F.count("*"), F.sum(F.length("page_text"))
        ),
        "token_quality": lambda: textstats.quality_stats(docs).agg(
            F.sum("n_tokens"), F.sum("n_stopwords")
        ),
        "minhash_lsh": lambda: dedup.lsh_candidate_pairs(docs),
        "simhash": lambda: dedup.simhash(docs).agg(F.sum("simhash")),
        "ann_topk": lambda: similarity.brute_force_topk(embs, q, k=5),
        "ann_hamming": lambda: similarity.hamming_topk_queries(embs, q, k=5),
        "dedup_pipeline": lambda: dedup.dedup_pipeline(docs),
        "embedding_neardup": lambda: similarity.cosine_near_dup_pairs(
            embs, threshold=0.4
        ),
        "semantic_dedup": lambda: similarity.semantic_dedup(emb_d, threshold=0.4),
        "ann_lsh_topk": lambda: similarity.lsh_topk(embs, q, k=5, probe_bits=1),
        "ann_ivf_topk": lambda: similarity.ivf_topk(embs, q, k=5),
        "pq_adc_topk": lambda: similarity.pq_adc_topk(embs, q, k=5),
        "dedup_recall": lambda: dq_recall(spark),
        "zipf_stress": lambda: textstats.bigram_logprob(zipf_docs),
        "resize_images": lambda: multimodal.resize_images(bmps, 224, 224).agg(
            F.sum("n_bytes")
        ),
        "media_decode": lambda: multimodal.extract_media_metadata(
            mixed, fake=False
        ).agg(F.sum("n_bytes"), F.sum("n_frames")),
        "dedup_lines": lambda: corpus_ops.dedup_lines(docs).agg(
            F.sum("n_dropped"), F.sum(F.length("text"))
        ),
        "tfidf_topk": lambda: textstats.tfidf_topk(docs, k=3),
        "phrase_search": lambda: textstats.phrase_search(docs, ("table", "hash")),
        "textrank": lambda: graph.textrank_keywords(docs, k=30),
        "cdc_dedup": lambda: dedup.cdc_dup_stats(
            zipf_docs.where(F.col("doc_id") % 5 == 0)
        ).agg(F.sum("n_dup_chunks"), F.sum("dup_bytes")),
        "quality_classifier": lambda: textstats.quality_classifier(
            zipf_docs, textstats.classifier_weights(spark)
        ).agg(F.sum("score"), F.count_if(F.col("label") == "keep")),
        "star_join": lambda: relational.regional_revenue(
            spark.read.parquet(f"{SF_DIR}/region.parquet"),
            spark.read.parquet(f"{SF_DIR}/nation.parquet"),
            spark.read.parquet(f"{SF_DIR}/customer.parquet"),
            spark.read.parquet(f"{SF_DIR}/orders.parquet"),
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet"),
        ).agg(F.sum("revenue_c"), F.sum("n_orders")),
    }

    for name, build in builders.items():
        if only and name not in only:
            continue
        df = build()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(name, "->", f"plans/r07/{name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
