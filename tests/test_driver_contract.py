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
    # r6 rotation: hashed_tf (only query with NO official row ever) leads
    # the rotating slots, followed by every query whose newest official
    # row is r3 — after this round no row may predate r4
    assert keys[len(canaries)] == "hashed_tf"
    r3_stale = {"span_sessions", "domain_route_counts", "ingest_increment",
                "bigram_logprob", "vocab_topk", "dedup_exact_planted",
                "minhash_signatures", "filter_include_names",
                "grouped_emission", "windowed_sink_counts",
                "parse_quarantine", "sitemap_coverage", "polite_crawl",
                "cdc_dup_stats", "length_histogram", "url_components",
                "span_rollup", "lang_length_stats", "label_centroids",
                "prototype_confusion", "token_counts", "quality_stats",
                "lang_id", "fingerprint", "winnow_fingerprints",
                "bpe_pair_counts", "dedup_stats", "lsh_candidate_pairs",
                "dedup_exact", "dedup_pipeline_planted"}
    assert r3_stale <= window, sorted(r3_stale - window)
    # remaining slots: oldest r4 greens / queries added in r6
    assert "e2e_sink_counts" in window and "e2e_records" in window


def test_canary_oracles_are_literal(entrymod):
    """Canary oracles must be fixture-independent (no table reads): a red
    canary then isolates an ENGINE semantic, never a data change."""
    oracles = entrymod.oracle_sql()
    for name, sql in oracles.items():
        # parity_* queries are canary-grade guards awaiting their r7
        # window slot — the same fixture-independence contract applies
        if name.startswith(("canary_", "parity_")):
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