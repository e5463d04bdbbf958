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
_EVENT_FIELDS = [
    "event_name", "ts_ns", "trace_id", "span_id", "span_name", "span_kind",
    "trace_state", "event_attrs_s", "event_attrs_i", "span_attrs", "res_attrs",
]


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


def _stringify_attrs(attrs: dict) -> dict:
    """All-values-as-strings rendering for span/resource attrs: the
    reference copies these regardless of type (connector.go:233,382-385);
    our map<string,string> columns carry ints in their canonical string
    form (oracle._render_value twin)."""
    out: dict[str, str] = {}
    for k, v in attrs.items():
        if isinstance(v, bool):
            out[k] = "true" if v else "false"
        else:
            out[k] = str(v)
    return out


def _parse_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    """Hot path: direct column assembly (no per-row dicts) + batch-scoped
    memoization of repeated JSON payloads and their type-splits (span/
    resource attrs repeat per span; event attr payloads repeat across
    similar events)."""
    import pandas as pd

    for pdf in batches:
        json_cache: dict = {}
        split_cache: dict = {}  # id(shared dict) -> (ref, result) — ref pins id
        str_cache: dict = {}

        def split_cached(d: dict) -> tuple[dict, dict]:
            hit = split_cache.get(id(d))
            if hit is None:
                hit = (d, _split_attrs(d))
                split_cache[id(d)] = hit
            return hit[1]

        def stringify_cached(d: dict) -> dict:
            hit = str_cache.get(id(d))
            if hit is None:
                hit = (d, _stringify_attrs(d))
                str_cache[id(d)] = hit
            return hit[1]

        cols: dict[str, list] = {name: [] for name in _FIELD_NAMES}
        ap = {name: cols[name].append for name in _FIELD_NAMES}
        for url, warc_ts, html, lang in zip(
            pdf["url"], pdf["warc_ts"], pdf["html"], pdf["lang"]
        ):
            blob = bytes(html) if html is not None else b""
            try:
                text = extract_text(blob)
                events = parse_markers(blob, json_cache)
                err = None
            except Exception as exc:  # corrupt marker -> quarantine page
                text, events, err = None, [], f"{type(exc).__name__}: {exc}"

            n = len(events)
            if not events:
                ap["url"](url); ap["warc_ts"](warc_ts); ap["lang"](lang)
                ap["page_text"](text); ap["n_page_events"](0)
                ap["parse_error"](err); ap["event_idx"](-1)
                for name in _EVENT_FIELDS:
                    ap[name](None)
                continue
            for idx, ev in enumerate(events):
                attrs_s, attrs_i = split_cached(ev.attrs)
                span_s = stringify_cached(ev.span_attrs)
                res_s = stringify_cached(ev.res_attrs)
                ap["url"](url); ap["warc_ts"](warc_ts); ap["lang"](lang)
                # page_text rides only the first row per page (see above)
                ap["page_text"](text if idx == 0 else None)
                ap["n_page_events"](n)
                ap["parse_error"](None)
                ap["event_idx"](idx)
                ap["event_name"](ev.name); ap["ts_ns"](ev.ts_ns)
                ap["trace_id"](ev.trace_id); ap["span_id"](ev.span_id)
                ap["span_name"](ev.span_name); ap["span_kind"](ev.span_kind)
                ap["trace_state"](ev.trace_state)
                ap["event_attrs_s"](attrs_s); ap["event_attrs_i"](attrs_i)
                ap["span_attrs"](span_s); ap["res_attrs"](res_s)
        if cols["url"]:
            # explicit nullable integer dtypes: mixed None/int would be
            # inferred float64, whose 53-bit mantissa silently corrupts
            # int64 nanosecond timestamps
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
