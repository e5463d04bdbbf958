"""Pure-Python reference oracle: the connector's exact record-population
semantics on plain Python objects. Used by pytest as ground truth for the
Spark pipeline, and as the executable spec for the SQL oracle generator.

Behavior mirrors /root/reference/spaneventtologconnector/connector.go:
  severity precedence chain  :261-335
  timestamp projection       :337-341
  body projection + fallback :347-358
  attribute copies/enrichment:360-403
  name filter                :219-224
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .config import DEFAULT_ROUTES, PipelineConfig, SinkRoute, route_event
from .markers import SpanEvent, extract_text, parse_markers
from .severity import map_severity, severity_number_to_text, wrap_int32

SEVERITY_DEFAULT_NUMBER = 9
SEVERITY_DEFAULT_TEXT = "info"


@dataclass
class LogRecord:
    """Flattened output log record (FIXTURES.md §6)."""

    url: str
    event_name: str
    ts_ns: int
    observed_ts_us: int
    severity_number: int
    severity_text: str
    body: str
    attributes: dict = field(default_factory=dict)  # str -> str
    resource_attributes: dict = field(default_factory=dict)
    trace_id: str = ""
    span_id: str = ""
    sink: str = ""


def resolve_severity(config: PipelineConfig, event: SpanEvent) -> tuple[int, str]:
    """The three-level precedence chain + default (connector.go:266-335)."""
    am = config.attribute_mappings
    number, text = SEVERITY_DEFAULT_NUMBER, SEVERITY_DEFAULT_TEXT
    found = False

    # 1. attribute_mappings (highest precedence)
    if am.severity_number or am.severity_text:
        if am.severity_number:
            v = event.attrs.get(am.severity_number)
            if isinstance(v, int) and not isinstance(v, bool):
                number = wrap_int32(v)  # Go int32 narrowing, connector.go:276
                text = severity_number_to_text(number)
                found = True
        if am.severity_text:
            v = event.attrs.get(am.severity_text)
            if isinstance(v, str):
                text = v  # verbatim, possibly non-canonical
                if not found:
                    parsed_n, parsed_t = map_severity(v)
                    if parsed_n != 0:
                        number, text = parsed_n, parsed_t
                found = True

    # 2. severity_attribute
    if not found and config.severity_attribute:
        v = event.attrs.get(config.severity_attribute)
        if isinstance(v, str):
            parsed_n, parsed_t = map_severity(v)
            if parsed_n != 0:
                number, text, found = parsed_n, parsed_t, True

    # 3. severity_by_event_name — longest case-insensitive substring match.
    # Spec refinement vs the reference (whose Go map iteration makes
    # equal-length key collisions nondeterministic): ties broken by
    # lexicographically smallest key.
    if not found and config.severity_by_event_name:
        lower_name = event.name.lower()
        best: tuple[int, str] | None = None  # (len, key)
        best_text = ""
        for key, sev in sorted(config.severity_by_event_name):
            if key.lower() in lower_name:
                parsed_n, parsed_t = map_severity(sev)
                if parsed_n != 0 and (best is None or len(key) > best[0]):
                    best = (len(key), key)
                    best_text = parsed_t
        if best_text:
            number, text = map_severity(best_text)
            found = True

    return number, text


def populate_log_record(
    config: PipelineConfig,
    event: SpanEvent,
    url: str,
    observed_ts_us: int,
    routes: tuple[SinkRoute, ...] = DEFAULT_ROUTES,
) -> LogRecord:
    """connector.go:261-404 on one flattened span event."""
    number, text = resolve_severity(config, event)

    body = event.name
    if config.attribute_mappings.body:
        v = event.attrs.get(config.attribute_mappings.body)
        if isinstance(v, str):
            body = v

    attrs: dict[str, str] = {}
    if config.copies_from("event.attributes"):
        for k, v in event.attrs.items():
            attrs[k] = _render_value(v)
    if config.attribute_mappings.event_name:
        attrs[config.attribute_mappings.event_name] = event.name
    if config.add_level and "level" not in attrs:
        attrs["level"] = text
    if config.copies_from("span.attributes"):
        for k, v in event.span_attrs.items():
            attrs[k] = _render_value(v)  # upsert: later write wins

    trace_id, span_id = "", ""
    if config.include_span_context:
        trace_id, span_id = event.trace_id, event.span_id
        if event.trace_state != "":
            attrs["trace.state"] = event.trace_state
        attrs["span.name"] = event.span_name
        attrs["span.kind"] = event.span_kind

    res_attrs: dict[str, str] = {}
    if config.copies_from("resource.attributes"):
        res_attrs = {k: _render_value(v) for k, v in event.res_attrs.items()}

    return LogRecord(
        url=url,
        event_name=event.name,
        ts_ns=event.ts_ns,
        observed_ts_us=observed_ts_us,
        severity_number=number,
        severity_text=text,
        body=body,
        attributes=attrs,
        resource_attributes=res_attrs,
        trace_id=trace_id,
        span_id=span_id,
        sink=route_event(event.name, routes),
    )


def _render_value(v) -> str:
    """Canonical string encoding for attr values (str|int only — the only
    types the reference consumes: connector.go:275,284,301,350)."""
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def render_attrs(attrs: dict) -> str:
    """Order-insensitive canonical rendering used in equality assertions
    and SQL-checked outputs: sorted 'k=v' pairs joined by unit separator."""
    return "\x1f".join(f"{k}={v}" for k, v in sorted(attrs.items()))


def process_page(
    config: PipelineConfig,
    url: str,
    html: bytes,
    observed_ts_us: int,
    routes: tuple[SinkRoute, ...] = DEFAULT_ROUTES,
) -> tuple[str, list[LogRecord]]:
    """Full per-page oracle: parse markers + extract text + populate records,
    applying the include_event_names filter (connector.go:219-224)."""
    text = extract_text(html)
    include = set(config.include_event_names)
    records = [
        populate_log_record(config, ev, url, observed_ts_us, routes)
        for ev in parse_markers(html)
        if not include or ev.name in include
    ]
    return text, records
