"""HTML-shape metadata over the raw ``html`` byte column — the cheap
structural signals a Common-Crawl-style ingest computes before (or instead
of) full parsing: title, paragraph/marker counts, header-consistency, raw
byte size.

Pure Catalyst expressions over a single scan: one UTF-8 decode feeding
regexp extraction/counting, no Python, full whole-stage codegen. At 100 TB
this is scan-bound — exactly what a structural pre-filter should be.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: the telemetry-marker prefix (markers.py grammar) — counting occurrences
#: of the prefix is a structural census, not a parse.
MARKER_PREFIX = "<!--otel span_ctx="


def html_meta(pages: DataFrame) -> DataFrame:
    """url, title, n_paragraphs, n_markers, header_url_ok, html_bytes.

    header_url_ok cross-checks the header div's data-url attribute against
    the row's url column (1/0) — an ingest-integrity signal.
    """
    s = F.decode(F.col("html"), "UTF-8")
    title = F.regexp_extract(s, "<title>([^<]*)</title>", 1)
    header_url = F.regexp_extract(s, 'data-url="([^"]*)"', 1)
    n_par = F.array_size(F.regexp_extract_all(s, F.lit("<p>"), 0))
    n_markers = F.array_size(F.regexp_extract_all(s, F.lit(MARKER_PREFIX), 0))
    return pages.select(
        "url",
        title.alias("title"),
        n_par.cast("long").alias("n_paragraphs"),
        n_markers.cast("long").alias("n_markers"),
        (header_url == F.col("url")).cast("long").alias("header_url_ok"),
        F.length(F.col("html")).cast("long").alias("html_bytes"),
    )


def url_components(pages: DataFrame) -> DataFrame:
    """Decompose each page url into protocol/host/path with
    ``try_parse_url`` (NULL on malformed input instead of an ANSI-mode
    throw — one bad crawl row must not fail a 100 TB job). Single
    codegen'd scan, no shuffle."""
    u = F.col("url")
    return pages.select(
        "url",
        F.try_parse_url(u, F.lit("PROTOCOL")).alias("proto"),
        F.try_parse_url(u, F.lit("HOST")).alias("host"),
        F.try_parse_url(u, F.lit("PATH")).alias("path"),
    )
