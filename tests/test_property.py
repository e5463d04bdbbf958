"""Property-based tests (hypothesis): marker grammar round-trip, severity
scalar total-function properties, router totality. Pure Python — no Spark —
so they run in milliseconds and fuzz the byte-level grammar hard."""

import json
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from weblog_pipeline.config import DEFAULT_ROUTES, route_event
from weblog_pipeline.markers import SpanEvent, extract_text, parse_markers, render_marker
from weblog_pipeline.severity import (
    FULL_TEXT_DOMAIN,
    NUMBER_TO_TEXT,
    map_severity,
    severity_number_to_text,
)

# grammar-safe alphabets (documented constraints in markers.py)
_name_alphabet = string.ascii_letters + string.digits + "._- "
_names = st.text(_name_alphabet, min_size=1, max_size=40).filter(
    lambda s: " attrs=" not in s and not s.startswith(" ") and not s.endswith(" ")
)
_span_names = st.text(string.ascii_letters + string.digits + "._-", min_size=1, max_size=20)
_attr_keys = st.text(string.ascii_letters + ".", min_size=1, max_size=15)
_attr_vals = st.one_of(
    st.integers(min_value=-(2**31), max_value=2**31),
    st.text(string.ascii_letters + string.digits + " .,:;()/", max_size=40).filter(
        lambda s: "}" not in s
    ),
)
_attrs = st.dictionaries(_attr_keys, _attr_vals, max_size=5)


@st.composite
def span_events(draw):
    return SpanEvent(
        trace_id="0123456789abcdef0123456789abcdef",
        span_id="0123456789abcdef",
        span_name=draw(_span_names),
        span_kind=draw(st.sampled_from(["Server", "Client", "Internal"])),
        trace_state="",
        ts_ns=draw(st.integers(min_value=0, max_value=2**62)),
        name=draw(_names),
        attrs=draw(_attrs),
        span_attrs=draw(_attrs),
        res_attrs=draw(_attrs),
    )


@settings(max_examples=300)
@given(st.lists(span_events(), max_size=5), st.text(string.ascii_letters + " \n", max_size=100))
def test_marker_roundtrip_property(events, text):
    paragraphs = [p for p in text.split("\n")]
    html = (
        "<header>x</header>"
        + "".join(render_marker(e) for e in events)
        + "".join(f"<p>{p}</p>" for p in paragraphs)
    ).encode("utf-8")
    parsed = parse_markers(html)
    assert len(parsed) == len(events)
    for got, want in zip(parsed, events):
        assert got.name == want.name
        assert got.ts_ns == want.ts_ns
        assert got.attrs == want.attrs
        assert got.span_attrs == want.span_attrs
        assert got.res_attrs == want.res_attrs
        assert got.span_name == want.span_name
    assert extract_text(html) == "\n".join(paragraphs)


@settings(max_examples=500)
@given(st.text(max_size=30))
def test_map_severity_total_and_consistent(s):
    num, text = map_severity(s)
    if num == 0:
        assert text == ""
        assert s.lower() not in FULL_TEXT_DOMAIN
    else:
        assert 1 <= num <= 24
        assert text == NUMBER_TO_TEXT[num]
        # canonical texts are fixed points
        assert map_severity(text) == (num, text)


@settings(max_examples=500)
@given(st.integers(min_value=-(2**31), max_value=2**31))
def test_severity_number_to_text_total(n):
    t = severity_number_to_text(n)
    if 1 <= n <= 24:
        assert t == NUMBER_TO_TEXT[n]
    else:
        assert t == "info"


@settings(max_examples=300)
@given(_names)
def test_router_total(name):
    sink = route_event(name, DEFAULT_ROUTES)
    assert sink in {"sink_errors", "sink_db", "sink_retries", "sink_default"}