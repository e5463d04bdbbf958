"""OTLP/JSON trace source + sink: the OpenTelemetry protocol's canonical
JSON file encoding of ResourceSpans, as published in the public OTLP spec
(proto3 JSON mapping: int64 and uint64 render as JSON strings; each typed
AnyValue carries exactly one of stringValue/intValue/...).

The reference consumes span events from an OTel collector pipeline
(reference: connector.go:51-75 receives ptrace.Traces); a standalone engine
needs the equivalent FILE form. This module maps the engine's flattened
span-event grain (parse.EVENT_SCHEMA columns) to and from OTLP/JSON lines
so that a real OTLP export (one ResourceSpans JSON document per line) can
feed the pipeline, and pipeline output can be re-emitted as valid OTLP.

Everything is built-in column expressions (`to_json`/`from_json` +
higher-order array functions) — JSON encode/decode stays JVM-side in
whole-stage codegen; no Python in the path, so the source scales like any
native file scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: public OTLP SpanKind enum (trace.proto): JSON carries the integer code.
SPAN_KIND_CODES: dict[str, int] = {
    "Unspecified": 0,
    "Internal": 1,
    "Server": 2,
    "Client": 3,
    "Producer": 4,
    "Consumer": 5,
}
_KIND_NAMES = [k for k, _ in sorted(SPAN_KIND_CODES.items(), key=lambda kv: kv[1])]


def _str_attrs(m: Column) -> Column:
    """map<string,string> -> OTLP attribute list [{key, value:{stringValue}}]."""
    return F.transform(
        F.map_entries(m),
        lambda e: F.struct(
            e["key"].alias("key"),
            F.struct(
                e["value"].alias("stringValue"),
                F.lit(None).cast("string").alias("intValue"),
            ).alias("value"),
        ),
    )


def _int_attrs(m: Column) -> Column:
    """map<string,long> -> OTLP attribute list; int64 renders as a JSON
    string per the proto3 JSON mapping."""
    return F.transform(
        F.map_entries(m),
        lambda e: F.struct(
            e["key"].alias("key"),
            F.struct(
                F.lit(None).cast("string").alias("stringValue"),
                e["value"].cast("string").alias("intValue"),
            ).alias("value"),
        ),
    )


def _kind_code(span_kind: Column) -> Column:
    code = F.lit(0)
    for name, c in SPAN_KIND_CODES.items():
        code = F.when(span_kind == name, F.lit(c)).otherwise(code)
    return code


def encode_otlp(events: DataFrame, out_col: str = "otlp") -> DataFrame:
    """One OTLP/JSON ResourceSpans document per span-event row.

    Input columns (parse.EVENT_SCHEMA subset): event_name, ts_ns, trace_id,
    span_id, span_name, span_kind, trace_state, event_attrs_s,
    event_attrs_i, span_attrs, res_attrs. `to_json` drops null struct
    fields (ignoreNullFields), so every AnyValue carries exactly one typed
    member — canonical OTLP.
    """
    ev_attrs = F.concat(
        _str_attrs(F.col("event_attrs_s")), _int_attrs(F.col("event_attrs_i"))
    )
    span = F.struct(
        F.col("trace_id").alias("traceId"),
        F.col("span_id").alias("spanId"),
        F.col("trace_state").alias("traceState"),
        F.col("span_name").alias("name"),
        _kind_code(F.col("span_kind")).alias("kind"),
        F.col("ts_ns").cast("string").alias("startTimeUnixNano"),
        _str_attrs(F.col("span_attrs")).alias("attributes"),
        F.array(
            F.struct(
                F.col("ts_ns").cast("string").alias("timeUnixNano"),
                F.col("event_name").alias("name"),
                ev_attrs.alias("attributes"),
            )
        ).alias("events"),
    )
    doc = F.struct(
        F.array(
            F.struct(
                F.struct(
                    _str_attrs(F.col("res_attrs")).alias("attributes")
                ).alias("resource"),
                F.array(
                    F.struct(F.array(span).alias("spans"))
                ).alias("scopeSpans"),
            )
        ).alias("resourceSpans")
    )
    return events.select(F.to_json(doc).alias(out_col))


def _attr_type() -> T.ArrayType:
    return T.ArrayType(
        T.StructType(
            [
                T.StructField("key", T.StringType()),
                T.StructField(
                    "value",
                    T.StructType(
                        [
                            T.StructField("stringValue", T.StringType()),
                            T.StructField("intValue", T.StringType()),
                        ]
                    ),
                ),
            ]
        )
    )


def otlp_schema() -> T.StructType:
    """from_json schema for one ResourceSpans JSON document."""
    span = T.StructType(
        [
            T.StructField("traceId", T.StringType()),
            T.StructField("spanId", T.StringType()),
            T.StructField("traceState", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("kind", T.IntegerType()),
            T.StructField("startTimeUnixNano", T.StringType()),
            T.StructField("attributes", _attr_type()),
            T.StructField(
                "events",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("timeUnixNano", T.StringType()),
                            T.StructField("name", T.StringType()),
                            T.StructField("attributes", _attr_type()),
                        ]
                    )
                ),
            ),
        ]
    )
    return T.StructType(
        [
            T.StructField(
                "resourceSpans",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField(
                                "resource",
                                T.StructType(
                                    [T.StructField("attributes", _attr_type())]
                                ),
                            ),
                            T.StructField(
                                "scopeSpans",
                                T.ArrayType(
                                    T.StructType(
                                        [
                                            T.StructField(
                                                "spans", T.ArrayType(span)
                                            )
                                        ]
                                    )
                                ),
                            ),
                        ]
                    )
                ),
            )
        ]
    )


def _map_of(attrs: Column, typed: str) -> Column:
    """OTLP attribute list -> map of the entries carrying `typed` values."""
    picked = F.filter(attrs, lambda a: a["value"][typed].isNotNull())
    entries = F.transform(
        picked,
        lambda a: F.struct(
            a["key"].alias("key"),
            (
                a["value"][typed].cast("long")
                if typed == "intValue"
                else a["value"][typed]
            ).alias("value"),
        ),
    )
    return F.map_from_entries(entries)


def decode_otlp(df: DataFrame, json_col: str = "otlp") -> DataFrame:
    """OTLP/JSON lines -> flattened span-event grain (the unnest the
    reference applies to ptrace span.Events(); reference connector.go:60-71
    iterates resource/scope/span/event). Three nested explodes — each is a
    Generate in the same stage as the scan, no shuffle."""
    parsed = df.select(
        F.from_json(F.col(json_col), otlp_schema()).alias("doc")
    )
    rs = parsed.select(F.explode("doc.resourceSpans").alias("rs"))
    sp = rs.select(
        F.col("rs.resource.attributes").alias("res_attr_list"),
        F.explode("rs.scopeSpans").alias("ss"),
    ).select("res_attr_list", F.explode("ss.spans").alias("sp"))
    ev = sp.select(
        "res_attr_list",
        "sp",
        F.explode("sp.events").alias("evt"),
    )
    return ev.select(
        F.col("evt.name").alias("event_name"),
        F.col("evt.timeUnixNano").cast("long").alias("ts_ns"),
        F.col("sp.traceId").alias("trace_id"),
        F.col("sp.spanId").alias("span_id"),
        F.col("sp.name").alias("span_name"),
        # canonical protojson omits zero-valued enums: an absent kind IS
        # SPAN_KIND_UNSPECIFIED, matching the proto twin's default.
        # try_element_at (not element_at): proto3 enums are open, so a
        # foreign exporter may ship kind codes outside 0-5 — under ANSI
        # mode element_at would throw INVALID_ARRAY_INDEX and kill the
        # whole batch; unknown kinds degrade to 'Unspecified' instead
        # (quarantine-never-fail convention). try_element_at also returns
        # NULL for a NULL index, which the same coalesce absorbs.
        # (the >= 0 guard stops negative codes from hitting element_at's
        # count-from-the-end indexing)
        F.coalesce(
            F.when(
                F.col("sp.kind") >= 0,
                F.try_element_at(
                    F.array(*[F.lit(n) for n in _KIND_NAMES]),
                    F.col("sp.kind").cast("int") + 1,
                ),
            ),
            F.lit("Unspecified"),
        ).alias("span_kind"),
        F.col("sp.traceState").alias("trace_state"),
        _map_of(F.col("evt.attributes"), "stringValue").alias("event_attrs_s"),
        _map_of(F.col("evt.attributes"), "intValue").alias("event_attrs_i"),
        _map_of(F.col("sp.attributes"), "stringValue").alias("span_attrs"),
        _map_of(F.col("res_attr_list"), "stringValue").alias("res_attrs"),
    )


def write_otlp_jsonl(events: DataFrame, path: str) -> None:
    """Emit span events as an OTLP/JSON-lines directory (text sink)."""
    encode_otlp(events).write.mode("overwrite").text(path)


def read_otlp_jsonl(spark, path: str) -> DataFrame:
    """Read an OTLP/JSON-lines export into the flattened span-event grain."""
    return decode_otlp(spark.read.text(path), json_col="value")
