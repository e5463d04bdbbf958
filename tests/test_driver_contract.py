"""The __spark_entry__ driver contract: catalog consistency + flagship
entry smoke (sf0.001)."""

import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def entrymod():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_under_test", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_every_oracle_has_a_query(entrymod):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every cataloged query is value-oracled (no rows-only entries)
    rows_only = set(qs) - set(oracles)
    assert rows_only == set()
    assert len(qs) >= 25


def test_canaries_lead_the_correctness_window(entrymod):
    """The driver's correctness gate hashes the FIRST 50 queries() entries.
    The portability canaries must stay at the head (one official driver
    bit per divergence class, every round), and the window must hold
    exactly 50 entries before the documented cutoff queries."""
    keys = list(entrymod.queries())
    canaries = [k for k in keys if k.startswith("canary_")]
    assert keys[: len(canaries)] == canaries, "canaries must lead queries()"
    assert len(canaries) >= 8
    window = set(keys[:50])
    # the r4 hash-red rows must re-prove themselves officially
    assert {"charclass_census", "quality_classifier", "pack_sequences",
            "export_manifest", "cdc_chunks"} <= window
    # every query added in r5 gets its FIRST official row this round
    r5_new = {"multimodal_alaw_decode", "multimodal_adpcm_decode",
              "multimodal_dib_avi_decode", "length_quantiles",
              "mixture_weights", "token_windows", "cardinality_audit",
              "cross_neardup", "embedding_dim_stats", "source_boilerplate",
              "source_overlap", "embedding_covariance", "embedding_outliers",
              "event_key_skew", "posting_lists", "pmi_collocations",
              "continuation_counts", "outlink_graph", "domain_pagerank",
              "domain_hits", "anchor_text_topk", "gopher_quality_flags",
              "c4_quality_flags", "heavy_hitters", "bloom_prefilter",
              "bpe_train", "bpe_apply", "vocab_growth", "daily_quota",
              "mixture_sample", "domain_reach"}
    assert r5_new <= window, sorted(r5_new - window)
    # the r3-stale rotation block closes the window
    assert keys[48:50] == ["robots_decisions", "url_normalize"]


def test_canary_oracles_are_literal(entrymod):
    """Canary oracles must be fixture-independent (no table reads): a red
    canary then isolates an ENGINE semantic, never a data change."""
    oracles = entrymod.oracle_sql()
    for name, sql in oracles.items():
        if name.startswith("canary_"):
            low = sql.lower()
            for table in ("documents", "embeddings", "events", "lineitem"):
                assert table not in low, f"{name} reads {table}"


def test_entry_returns_sink_counts(spark, entrymod):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    sinks = {r["sink"] for r in rows}
    assert sinks <= {"sink_errors", "sink_db", "sink_retries", "sink_default"}
    assert sum(r["records"] for r in rows) > 0


def test_queries_callable_signature(spark, entrymod):
    qs = entrymod.queries()
    # spot-check one cheap catalog entry end-to-end
    df = qs["token_counts"](spark, "/root/testdata/sf0.001")
    assert df.count() == 500
    assert set(df.columns) == {"doc_id", "n_tokens", "n_chars", "n_pieces"}