"""Config -> Column-expression compiler: the enrich stage.

This is the Spark analogue of the reference's constructor-time folding
(newConnector precompiling lookup structures, connector.go:95-112 and the
package-init severity maps, connector.go:58-80): at driver time a validated
PipelineConfig is compiled into pure Catalyst Column expressions — literal
map lookups and `when` ladders — so the hot path is 100% JVM whole-stage
codegen with zero Python and zero shuffles.

Operators covered (SURVEY.md §2): O5-O18 (severity precedence chain, scalar
map_severity / severityNumberToText as literal maps, body fallback,
timestamp projection, attribute copies & merge order, event-name
preservation, add_level, span-context enrichment).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .config import PipelineConfig
from .severity import FULL_TEXT_DOMAIN, NUMBER_TO_TEXT, map_severity

# -- literal lookup tables (driver-side constant folding) --------------------


def _sev_num_map() -> Column:
    """map_severity's text->number domain as a literal MapType column."""
    pairs: list[Column] = []
    for text, num in sorted(FULL_TEXT_DOMAIN.items()):
        pairs.append(F.lit(text))
        pairs.append(F.lit(num))
    return F.create_map(*pairs)


def _num_text_map() -> Column:
    """Canonical number->text as a literal MapType column."""
    pairs: list[Column] = []
    for num, text in sorted(NUMBER_TO_TEXT.items()):
        pairs.append(F.lit(num))
        pairs.append(F.lit(text))
    return F.create_map(*pairs)


def parse_severity_num(col: Column) -> Column:
    """mapSeverity's number half as an expression: NULL when invalid
    (connector.go:418-444)."""
    return F.element_at(_sev_num_map(), F.lower(col))


def canonical_text(num_col: Column) -> Column:
    """Canonical text for a known-valid severity number (1..24)."""
    return F.element_at(_num_text_map(), num_col)


def severity_number_to_text_expr(num_col: Column) -> Column:
    """severityNumberToText: unknown numbers default to 'info'
    (connector.go:448-453)."""
    return F.coalesce(F.element_at(_num_text_map(), num_col.cast("int")), F.lit("info"))


EMPTY_STR_MAP = "cast(map() as map<string,string>)"


def _wrap_int32(col: Column) -> Column:
    """Two's-complement int64 -> int32 narrowing (Go int32(v) semantics),
    ANSI-safe: ((v mod 2^32) + 2^32 + 2^31) mod 2^32 - 2^31."""
    two32 = F.lit(4294967296)
    return (
        ((col % two32 + two32 + F.lit(2147483648)) % two32 - F.lit(2147483648))
        .cast("int")
    )


def _empty_map() -> Column:
    return F.expr(EMPTY_STR_MAP)


# -- severity precedence chain (connector.go:261-335) -------------------------


def severity_columns(
    cfg: PipelineConfig,
    event_name: Column,
    event_attrs_s: Column,
    event_attrs_i: Column,
) -> tuple[Column, Column]:
    """(severity_number, severity_text) columns for a flattened event row."""
    am = cfg.attribute_mappings

    n_attr = (
        F.element_at(event_attrs_i, F.lit(am.severity_number))
        if am.severity_number
        else F.lit(None).cast("long")
    )
    t_attr = (
        F.element_at(event_attrs_s, F.lit(am.severity_text))
        if am.severity_text
        else F.lit(None).cast("string")
    )
    parsed_t = parse_severity_num(t_attr)

    sa_parsed = (
        parse_severity_num(F.element_at(event_attrs_s, F.lit(cfg.severity_attribute)))
        if cfg.severity_attribute
        else F.lit(None).cast("int")
    )

    # severity_by_event_name: longest case-insensitive substring match.
    # Compile-time: drop runtime-invalid severities (connector.go:322-327),
    # order keys by length desc (strictly-longer wins) with lexicographic
    # tie-break (documented spec refinement; Go map order is undefined),
    # emit an ordered `when` ladder — first hit == longest match.
    name_num = F.lit(None).cast("int")
    valid_entries = []
    for key, sev in cfg.severity_by_event_name:
        num, _ = map_severity(sev)
        if num != 0:
            valid_entries.append((key, num))
    if valid_entries:
        valid_entries.sort(key=lambda kv: (-len(kv[0]), kv[0]))
        lower_name = F.lower(event_name)
        ladder: Column | None = None
        for key, num in valid_entries:
            cond = lower_name.contains(key.lower())
            ladder = (
                F.when(cond, F.lit(num))
                if ladder is None
                else ladder.when(cond, F.lit(num))
            )
        name_num = ladder.otherwise(F.lit(None).cast("int"))

    # Go narrows the attr to int32 with two's-complement wrap
    # (plog.SeverityNumber(attrValue.Int()), connector.go:276); a plain
    # cast would throw CAST_OVERFLOW under ANSI mode instead
    n_attr_i32 = _wrap_int32(n_attr)

    number = (
        F.when(n_attr.isNotNull(), n_attr_i32)
        .when(t_attr.isNotNull(), F.coalesce(parsed_t, F.lit(9)))
        .when(sa_parsed.isNotNull(), sa_parsed)
        .when(name_num.isNotNull(), name_num)
        .otherwise(F.lit(9))
    )
    text = (
        F.when(n_attr.isNotNull(), F.coalesce(t_attr, severity_number_to_text_expr(n_attr_i32)))
        .when(t_attr.isNotNull(), F.coalesce(canonical_text(parsed_t), t_attr))
        .when(sa_parsed.isNotNull(), canonical_text(sa_parsed))
        .when(name_num.isNotNull(), canonical_text(name_num))
        .otherwise(F.lit("info"))
    )
    return number, text


# -- full record population (connector.go:261-404) ----------------------------


def enrich_events(
    events: DataFrame,
    cfg: PipelineConfig,
    observed_ts_us: int,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Flattened event rows -> log-record rows (FIXTURES.md §6 schema).

    ``observed_ts_us`` is a job-level constant (resume-safe determinism;
    the reference stamps wall-clock per record, connector.go:341 — a
    per-query F.current_timestamp() would break row-equality testing).
    """
    am = cfg.attribute_mappings
    name = F.col("event_name")
    attrs_s = F.col("event_attrs_s")
    attrs_i = F.col("event_attrs_i")

    sev_num, sev_text = severity_columns(cfg, name, attrs_s, attrs_i)

    body = (
        F.coalesce(F.element_at(attrs_s, F.lit(am.body)), name) if am.body else name
    )

    # attribute merge, in the reference's exact write order; map_concat
    # under LAST_WIN reproduces pdata upsert-by-key semantics.
    parts: list[Column] = []
    if cfg.copies_from("event.attributes"):
        parts.append(F.coalesce(attrs_s, _empty_map()))
        parts.append(
            F.coalesce(
                F.transform_values(attrs_i, lambda _, v: v.cast("string")),
                _empty_map(),
            )
        )
    if am.event_name:
        parts.append(F.create_map(F.lit(am.event_name), name))
    if cfg.add_level:
        already = F.lit(False)
        if cfg.copies_from("event.attributes"):
            already = already | F.coalesce(
                F.map_contains_key(attrs_s, "level"), F.lit(False)
            ) | F.coalesce(F.map_contains_key(attrs_i, "level"), F.lit(False))
        if am.event_name == "level":
            already = F.lit(True)
        parts.append(
            F.when(~already, F.create_map(F.lit("level"), sev_text)).otherwise(
                _empty_map()
            )
        )
    if cfg.copies_from("span.attributes"):
        parts.append(F.coalesce(F.col("span_attrs"), _empty_map()))
    if cfg.include_span_context:
        parts.append(
            F.when(
                F.col("trace_state") != "",
                F.create_map(F.lit("trace.state"), F.col("trace_state")),
            ).otherwise(_empty_map())
        )
        parts.append(F.create_map(F.lit("span.name"), F.col("span_name")))
        parts.append(F.create_map(F.lit("span.kind"), F.col("span_kind")))
    attributes = F.map_concat(*parts) if parts else _empty_map()

    res_attributes = (
        F.coalesce(F.col("res_attrs"), _empty_map())
        if cfg.copies_from("resource.attributes")
        else _empty_map()
    )

    trace_id = F.col("trace_id") if cfg.include_span_context else F.lit("")
    span_id = F.col("span_id") if cfg.include_span_context else F.lit("")

    return events.select(
        *[F.col(c) for c in passthrough],
        F.col("url"),
        F.col("warc_ts"),
        F.col("lang"),
        name.alias("event_name"),
        # integer div: `/` promotes to double (53-bit mantissa) and rounds
        # current-epoch ns values off by 1us
        F.timestamp_micros(F.expr("ts_ns div 1000")).alias("ts"),
        F.col("ts_ns"),
        F.timestamp_micros(F.lit(observed_ts_us)).alias("observed_ts"),
        sev_num.cast("int").alias("severity_number"),
        sev_text.alias("severity_text"),
        body.alias("body"),
        attributes.alias("attributes"),
        res_attributes.alias("resource_attributes"),
        trace_id.alias("trace_id"),
        span_id.alias("span_id"),
        F.col("span_name"),
        F.col("span_kind"),
        F.coalesce(F.col("trace_state"), F.lit("")).alias("trace_state"),
    )


def attrs_rendered(attrs_col: Column) -> Column:
    """Order-insensitive canonical rendering of a map column: sorted
    'k=v' pairs joined by the unit separator (oracle.render_attrs twin)."""
    # sort_array on an array<struct<key,value>> orders by key then value —
    # matching Python's sorted(attrs.items()) in oracle.render_attrs.
    entries = F.transform(
        F.sort_array(F.map_entries(attrs_col)),
        lambda e: F.concat(e["key"], F.lit("="), e["value"]),
    )
    return F.array_join(entries, "\x1f")
