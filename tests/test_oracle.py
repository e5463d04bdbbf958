"""Pure-Python oracle tests mirroring the reference's behavioral unit tests
(connector_test.go:27-443) on the FIXTURES.md event templates E1-E5."""

import pytest

from weblog_pipeline.config import AttributeMappings, PipelineConfig
from weblog_pipeline.generate import (
    EVENT_TEMPLATES,
    event_for,
    gen_page,
    n_events_of,
    template_index,
)
from weblog_pipeline.markers import extract_text, parse_markers
from weblog_pipeline.oracle import populate_log_record, process_page, resolve_severity

OBS_US = 1_751_600_000_000_000


def ev(template_idx, i=0, j=0):
    """Build the span event for a given E-template index."""
    # find (i, j) with template_index(i, j) == template_idx
    return event_for(template_idx, 0)


E1, E2, E3, E4, E5 = (ev(k) for k in range(5))


def test_marker_roundtrip():
    page = gen_page(7)  # 7 % 6 = 1 event
    events = parse_markers(page.html)
    assert len(events) == n_events_of(7) == 1
    e = events[0]
    expected = event_for(7, 0)
    assert (e.name, e.ts_ns, e.attrs, e.span_attrs, e.res_attrs) == (
        expected.name, expected.ts_ns, expected.attrs, expected.span_attrs,
        expected.res_attrs,
    )
    assert e.trace_id == expected.trace_id and e.span_id == expected.span_id


def test_text_extraction_byte_identical():
    for i in [0, 1, 5, 11, 123, 9999]:
        page = gen_page(i)
        assert extract_text(page.html) == page.text


# C1 / happy path (connector_test.go:27-58): exception + custom -> 2 records,
# exception gets severity error via severity_by_event_name.
def test_happy_path_two_records():
    cfg = PipelineConfig(log_attributes_from=("event.attributes",))
    r1 = populate_log_record(cfg, E1, "u", OBS_US)
    r2 = populate_log_record(cfg, E2, "u", OBS_US)
    assert (r1.severity_number, r1.severity_text) == (17, "error")
    assert r1.body == "exception"
    assert r1.attributes["exception.type"] == "NullPointerException"
    assert (r2.severity_number, r2.severity_text) == (9, "info")
    assert r2.attributes["custom.count"] == "42"
    # span context on by default
    assert r1.trace_id == "0102030405060708090a0b0c0d0e0f10"
    assert r1.attributes["span.name"] == "test-span"
    assert r1.attributes["span.kind"] == "Server"
    assert "trace.state" not in r1.attributes  # empty -> omitted


# C2 (connector_test.go:238-261): non-matching include_event_names -> nothing
def test_include_event_names_filters_everything():
    cfg = PipelineConfig(include_event_names=("nonexistent_event",))
    page = gen_page(11)  # 5 events
    text, records = process_page(cfg, page.url, page.html, OBS_US)
    assert records == []
    assert text == page.text


# C3-C8: the six attribute_mappings cases on E3 (connector_test.go:264-402)
FULL = AttributeMappings(
    body="event.body",
    severity_number="event.severity_number",
    severity_text="event.severity_text",
    event_name="event.name",
)


def test_mapping_full():
    cfg = PipelineConfig(attribute_mappings=FULL)
    r = populate_log_record(cfg, E3, "u", OBS_US)
    assert r.body.startswith("Successfully wrote TODO")
    assert r.severity_number == 9
    assert r.severity_text == "INFO"  # verbatim from attr, not canonicalized
    assert r.attributes["event.name"] == "backend.db.write_item.success"


def test_mapping_partial_missing_attrs_fall_back():
    cfg = PipelineConfig(
        attribute_mappings=AttributeMappings(
            body="missing.body", severity_number="missing.num"
        )
    )
    r = populate_log_record(cfg, E3, "u", OBS_US)
    assert r.body == "backend.db.write_item.success"  # fallback to event name
    assert (r.severity_number, r.severity_text) == (9, "info")  # default


def test_mapping_text_only_parses_number():
    cfg = PipelineConfig(
        attribute_mappings=AttributeMappings(severity_text="event.severity_text")
    )
    r = populate_log_record(cfg, E3, "u", OBS_US)
    # "INFO" parses -> canonical (9, "info")
    assert (r.severity_number, r.severity_text) == (9, "info")


def test_mapping_text_unparseable_keeps_verbatim_and_default_number():
    e = ev(2)
    e = type(e)(**{**e.__dict__})
    e.attrs = dict(e.attrs, **{"event.severity_text": "NOTICE"})
    cfg = PipelineConfig(
        attribute_mappings=AttributeMappings(severity_text="event.severity_text")
    )
    r = populate_log_record(cfg, e, "u", OBS_US)
    assert (r.severity_number, r.severity_text) == (9, "NOTICE")


def test_mapping_number_derives_text():
    e = ev(2)
    e.attrs = dict(e.attrs)
    e.attrs["event.severity_number"] = 13
    cfg = PipelineConfig(
        attribute_mappings=AttributeMappings(severity_number="event.severity_number")
    )
    r = populate_log_record(cfg, e, "u", OBS_US)
    assert (r.severity_number, r.severity_text) == (13, "warn")


def test_mapping_number_out_of_range_text_defaults_info():
    e = ev(2)
    e.attrs = dict(e.attrs)
    e.attrs["event.severity_number"] = 99
    cfg = PipelineConfig(
        attribute_mappings=AttributeMappings(severity_number="event.severity_number")
    )
    r = populate_log_record(cfg, e, "u", OBS_US)
    assert (r.severity_number, r.severity_text) == (99, "info")


# C9 (connector_test.go:405-443): mappings beat severity_attribute & by-name
def test_precedence_mappings_win():
    cfg = PipelineConfig(
        attribute_mappings=FULL,
        severity_attribute="event.severity_text",
        severity_by_event_name=(("backend", "fatal"),),
    )
    r = populate_log_record(cfg, E3, "u", OBS_US)
    assert (r.severity_number, r.severity_text) == (9, "INFO")


# C10: severity_attribute on E4 (log.level=WARN) -> warn/13
def test_severity_attribute():
    cfg = PipelineConfig(severity_attribute="log.level")
    r = populate_log_record(cfg, E4, "u", OBS_US)
    assert (r.severity_number, r.severity_text) == (13, "warn")


def test_severity_attribute_invalid_falls_through_to_by_name():
    e = ev(3)
    e.attrs = dict(e.attrs, **{"log.level": "BOGUS"})
    cfg = PipelineConfig(
        severity_attribute="log.level",
        severity_by_event_name=(("retry", "warn3"),),
    )
    r = populate_log_record(cfg, e, "u", OBS_US)
    assert (r.severity_number, r.severity_text) == (15, "warn3")


def test_severity_attribute_int_typed_is_ignored():
    # the reference only accepts Str-typed values (connector.go:301)
    cfg = PipelineConfig(severity_attribute="attempt")
    r = populate_log_record(cfg, E4, "u", OBS_US)
    assert (r.severity_number, r.severity_text) == (9, "info")


# C11: longest substring wins (README.md:66)
def test_severity_by_event_name_longest_substring():
    cfg = PipelineConfig(
        severity_by_event_name=(("error", "error"), ("connection error", "fatal"))
    )
    r = populate_log_record(cfg, E5, "u", OBS_US)
    assert (r.severity_number, r.severity_text) == (21, "fatal")


def test_severity_by_event_name_invalid_entry_skipped():
    # "unspecified" is config-valid but runtime-invalid -> shorter valid key wins
    cfg = PipelineConfig(
        severity_by_event_name=(
            ("error", "warn"),
            ("connection error", "unspecified"),
        )
    )
    r = populate_log_record(cfg, E5, "u", OBS_US)
    assert (r.severity_number, r.severity_text) == (13, "warn")


def test_severity_by_event_name_case_insensitive():
    cfg = PipelineConfig(severity_by_event_name=(("EXCEPTION", "error2"),))
    r = populate_log_record(cfg, E1, "u", OBS_US)
    assert (r.severity_number, r.severity_text) == (18, "error2")


# C12: add_level (connector.go:371-378)
def test_add_level():
    cfg = PipelineConfig(add_level=True, log_attributes_from=("event.attributes",))
    r = populate_log_record(cfg, E1, "u", OBS_US)
    assert r.attributes["level"] == "error"


def test_add_level_never_overwrites():
    e = ev(1)
    e.attrs = dict(e.attrs, level="preexisting")
    cfg = PipelineConfig(add_level=True, log_attributes_from=("event.attributes",))
    r = populate_log_record(cfg, e, "u", OBS_US)
    assert r.attributes["level"] == "preexisting"


def test_span_attrs_upsert_wins_over_event_attrs():
    e = ev(1)
    e.attrs = dict(e.attrs, **{"http.method": "FROM_EVENT"})
    cfg = PipelineConfig(
        log_attributes_from=("event.attributes", "span.attributes")
    )
    r = populate_log_record(cfg, e, "u", OBS_US)
    assert r.attributes["http.method"] == "GET"  # span attr written later wins


def test_resource_attributes_copied_separately():
    cfg = PipelineConfig()  # default includes resource.attributes
    r = populate_log_record(cfg, E1, "u", OBS_US)
    assert r.resource_attributes == {"service.name": "test-service"}
    cfg2 = PipelineConfig(log_attributes_from=("event.attributes",))
    r2 = populate_log_record(cfg2, E1, "u", OBS_US)
    assert r2.resource_attributes == {}


def test_include_span_context_false():
    cfg = PipelineConfig(include_span_context=False)
    r = populate_log_record(cfg, E1, "u", OBS_US)
    assert r.trace_id == "" and r.span_id == ""
    assert "span.name" not in r.attributes


def test_default_config_event_attrs_not_copied_unless_listed():
    cfg = PipelineConfig(log_attributes_from=("resource.attributes",))
    r = populate_log_record(cfg, E2, "u", OBS_US)
    assert "custom.key" not in r.attributes


def test_template_distribution():
    # page i gets events j=0..(i%6-1), template (i+j)%5
    page = gen_page(9)  # 3 events, templates 4,0,1
    names = [e.name for e in parse_markers(page.html)]
    assert sorted(names) == sorted(
        EVENT_TEMPLATES[template_index(9, j)][0] for j in range(3)
    )
