"""Vectorized parse stage: webpages -> flattened span-event rows.

This is the engine's replacement for the reference's 4-deep nested-loop
flatten (connector.go:203-216), re-expressed as a `mapInPandas` Arrow UDF:
pages arrive as Arrow record batches, a precompiled byte-level regex
extracts every embedded telemetry marker plus the visible page text, and
one output row is emitted per span event (page-grain context denormalized
onto each row).

Scale notes (100 TB design):
  * The UDF is the ONLY Python stage in the pipeline; everything downstream
    is Catalyst-codegen'd Column expressions.
  * `html` is large — keep Arrow batches small (session.py caps
    maxRecordsPerBatch) so a batch of pages fits executor memory.
  * Catalyst cannot push predicates through the UDF, so callers must put
    cheap scan-level prunes (partition filters on warc_ts/lang,
    html IS NOT NULL) *before* this stage; the event-name filter runs
    *after* it as a codegen'd InSet.
  * Pages with zero events emit one sentinel row (event_idx = -1) so the
    byte-identical text invariant stays checkable in the same single scan
    of html — no second pass over the input.
  * Corrupt markers (invalid UTF-8 / JSON) don't fail the task: the page is
    quarantined via parse_error and contributes no event rows.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import types as T

from .markers import extract_text, parse_markers

if TYPE_CHECKING:
    import pandas as pd
    from pyspark.sql import DataFrame

#: Flattened event-row schema. One row per span event, plus one sentinel
#: row (event_idx=-1, event_name NULL) per zero-event page.
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("lang", T.StringType()),
        T.StructField("page_text", T.StringType()),
        T.StructField("n_page_events", T.IntegerType()),
        T.StructField("parse_error", T.StringType()),
        T.StructField("event_idx", T.IntegerType()),
        T.StructField("event_name", T.StringType()),
        T.StructField("ts_ns", T.LongType()),
        T.StructField("trace_id", T.StringType()),
        T.StructField("span_id", T.StringType()),
        T.StructField("span_name", T.StringType()),
        T.StructField("span_kind", T.StringType()),
        T.StructField("trace_state", T.StringType()),
        T.StructField("event_attrs_s", T.MapType(T.StringType(), T.StringType())),
        T.StructField("event_attrs_i", T.MapType(T.StringType(), T.LongType())),
        T.StructField("span_attrs", T.MapType(T.StringType(), T.StringType())),
        T.StructField("res_attrs", T.MapType(T.StringType(), T.StringType())),
    ]
)


_FIELD_NAMES = [f.name for f in EVENT_SCHEMA.fields]


def _split_attrs(attrs: dict) -> tuple[dict, dict]:
    """Partition a parsed attrs dict by value type (Str vs Int), mirroring
    the pcommon Value type-switch the reference performs
    (connector.go:275,284,301,350). Keys are disjoint by construction."""
    s: dict[str, str] = {}
    i: dict[str, int] = {}
    for k, v in attrs.items():
        if isinstance(v, bool):  # JSON bools render as strings
            s[k] = "true" if v else "false"
        elif isinstance(v, int):
            i[k] = v
        else:
            s[k] = str(v)
    return s, i


def _rows_for_page(url, warc_ts, lang, html: bytes) -> Iterator[dict]:
    try:
        text = extract_text(html)
        events = parse_markers(html)
        err = None
    except Exception as exc:  # corrupt marker -> quarantine the page
        text, events, err = None, [], f"{type(exc).__name__}: {exc}"

    base = {
        "url": url,
        "warc_ts": warc_ts,
        "lang": lang,
        # page_text rides only on the page-grain row (event_idx <= 0);
        # duplicating the full text onto every event row would triple the
        # Arrow transfer and any downstream shuffle of event rows.
        "page_text": text,
        "n_page_events": len(events),
        "parse_error": err,
    }
    if not events:
        yield {
            **base,
            "event_idx": -1,
            "event_name": None,
            "ts_ns": None,
            "trace_id": None,
            "span_id": None,
            "span_name": None,
            "span_kind": None,
            "trace_state": None,
            "event_attrs_s": None,
            "event_attrs_i": None,
            "span_attrs": None,
            "res_attrs": None,
        }
        return
    for idx, ev in enumerate(events):
        attrs_s, attrs_i = _split_attrs(ev.attrs)
        span_s, _ = _split_attrs(ev.span_attrs)
        res_s, _ = _split_attrs(ev.res_attrs)
        if idx == 1:
            base = {**base, "page_text": None, "parse_error": None}
        yield {
            **base,
            "event_idx": idx,
            "event_name": ev.name,
            "ts_ns": ev.ts_ns,
            "trace_id": ev.trace_id,
            "span_id": ev.span_id,
            "span_name": ev.span_name,
            "span_kind": ev.span_kind,
            "trace_state": ev.trace_state,
            "event_attrs_s": attrs_s,
            "event_attrs_i": attrs_i,
            "span_attrs": span_s,
            "res_attrs": res_s,
        }


def _parse_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    for pdf in batches:
        rows: list[dict] = []
        for url, warc_ts, html, lang in zip(
            pdf["url"], pdf["warc_ts"], pdf["html"], pdf["lang"]
        ):
            blob = bytes(html) if html is not None else b""
            rows.extend(_rows_for_page(url, warc_ts, lang, blob))
        if rows:
            # Column-wise construction with explicit nullable integer
            # dtypes: mixed None/int rows would otherwise be inferred as
            # float64 at DataFrame construction, whose 53-bit mantissa
            # silently corrupts int64 nanosecond timestamps.
            cols = {name: [r[name] for r in rows] for name in _FIELD_NAMES}
            cols["ts_ns"] = pd.array(cols["ts_ns"], dtype="Int64")
            cols["event_idx"] = pd.array(cols["event_idx"], dtype="Int32")
            cols["n_page_events"] = pd.array(cols["n_page_events"], dtype="Int32")
            yield pd.DataFrame(cols)


def parse_events(webpages: "DataFrame") -> "DataFrame":
    """webpages(url, warc_ts, html, text, lang) -> flattened event rows.

    Column-prunes to exactly the four columns the UDF consumes so the
    parquet/Iceberg scan never reads the (redundant) input `text` column.
    """
    pruned = webpages.select("url", "warc_ts", "html", "lang")
    return pruned.mapInPandas(_parse_batches, schema=EVENT_SCHEMA)


def event_rows(parsed: "DataFrame") -> "DataFrame":
    """Only real span-event rows (drops zero-event sentinels)."""
    return parsed.where(parsed.event_idx >= 0)


def page_texts(parsed: "DataFrame") -> "DataFrame":
    """Page-grain (url, page_text, n_page_events, parse_error) view."""
    return parsed.where(parsed.event_idx <= 0).select(
        "url", "warc_ts", "lang", "page_text", "n_page_events", "parse_error"
    )
