"""Deterministic synthetic webpages (FIXTURES.md §1-§3).

Everything is a pure function of the row index (or of a documents-table
row), never of a global RNG sequence — so generation is scale-independent,
partition-parallel, and reproducible from any engine (Python, Spark, SQL).

Two sources:
  * ``gen_page(i)``      — standalone synthetic page (unit tests / bench).
  * ``page_from_doc(..)`` — derive a webpage from a driver-testdata
    ``documents`` row; used by the SQL-checked parse round-trip and the
    flagship e2e query, because the DuckDB oracle can re-derive the same
    facts from ``documents`` with pure integer arithmetic.

Event fixtures E1–E5 mirror the reference's unit-test fixtures
(connector_test.go:210-222,468-473; README.md:66,81-88).
"""

from __future__ import annotations

import bisect
import hashlib
from dataclasses import dataclass

from .markers import SpanEvent, render_marker

# -- canonical span context (connector_test.go:190-207) ----------------------

TRACE_ID = "0102030405060708090a0b0c0d0e0f10"
SPAN_ID = "0102030405060708"
SPAN_NAME = "test-span"
SPAN_KIND = "Server"
SPAN_ATTRS = {"http.method": "GET", "http.url": "https://example.com"}
RES_ATTRS = {"service.name": "test-service"}

# -- event templates (FIXTURES.md §3) ----------------------------------------

EVENT_TEMPLATES: tuple[tuple[str, dict], ...] = (
    (
        "exception",
        {
            "exception.type": "NullPointerException",
            "exception.message": "Object was null",
            "exception.stacktrace": "at com.example.Test.method(Test.java:42)",
        },
    ),
    ("custom", {"custom.key": "custom value", "custom.count": 42}),
    (
        "backend.db.write_item.success",
        {
            "event.body": "Successfully wrote TODO 5770916c-3838-4443-b4a8-f2b90366e235 to DynamoDB",
            "event.severity_number": 9,
            "event.severity_text": "INFO",
        },
    ),
    ("retry", {"attempt": 3, "log.level": "WARN"}),
    ("database connection error", {"db.system": "postgres"}),
)

BASE_TS_NS = 1_751_587_200_000_000_000  # 2025-07-04T00:00:00Z

# -- Zipf(a=1.3) domain assignment, integer-only (cross-engine) --------------

N_DOMAINS = 50
_HASH_MULT = 2654435761  # Knuth multiplicative hash
_HASH_MOD = 2**32
_R_MOD = 100_000


def _zipf_thresholds(n: int = N_DOMAINS, a: float = 1.3, scale: int = _R_MOD) -> list[int]:
    weights = [1.0 / (k**a) for k in range(1, n + 1)]
    total = sum(weights)
    cum, acc = [], 0.0
    for w in weights:
        acc += w
        cum.append(int(round(acc / total * scale)))
    cum[-1] = scale  # exact upper bound
    return cum


#: cumulative thresholds in [0, 100000); domain d covers r in
#: [THRESHOLDS[d-1], THRESHOLDS[d]). Exported so the SQL oracle can emit an
#: identical CASE ladder.
ZIPF_THRESHOLDS: list[int] = _zipf_thresholds()


def domain_index(i: int) -> int:
    """Heavy-tailed deterministic domain for row i (integer arithmetic only)."""
    r = (i * _HASH_MULT) % _HASH_MOD % _R_MOD
    return bisect.bisect_right(ZIPF_THRESHOLDS, r)


def domain_of(i: int) -> str:
    return f"site{domain_index(i)}.example.com"


def n_events_of(i: int) -> int:
    """0–5 embedded telemetry markers per page."""
    return i % 6


def template_index(i: int, j: int) -> int:
    return (i + j) % 5


def event_for(i: int, j: int) -> SpanEvent:
    """The j-th span event of page i."""
    name, attrs = EVENT_TEMPLATES[template_index(i, j)]
    return SpanEvent(
        trace_id=TRACE_ID,
        span_id=SPAN_ID,
        span_name=SPAN_NAME,
        span_kind=SPAN_KIND,
        trace_state="",
        ts_ns=BASE_TS_NS + i * 37_000_000_000 + j * 1_000_000,
        name=name,
        attrs=dict(attrs),
        span_attrs=dict(SPAN_ATTRS),
        res_attrs=dict(RES_ATTRS),
    )


_LANGS = ("en", "de", "fr", "es", "it")

_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega"
).split()


def _page_text(i: int) -> str:
    """Deterministic word-salad paragraphs for page i (standalone mode)."""
    h = hashlib.md5(f"page-text-42-{i}".encode()).digest()
    n_words = 20 + h[0] % 60
    words = [_WORDS[(i + k * (1 + h[1] % 7)) % len(_WORDS)] for k in range(n_words)]
    # two paragraphs, newline-joined after extraction
    mid = n_words // 2
    return " ".join(words[:mid]) + "\n" + " ".join(words[mid:])


@dataclass
class Page:
    url: str
    warc_ts_us: int  # microseconds since epoch (TimestampType grain)
    html: bytes
    text: str
    lang: str


def _assemble_html(i: int, url: str, text: str, events: list[SpanEvent]) -> bytes:
    """Filler HTML + interleaved markers + <p>-wrapped paragraphs."""
    parts = [
        f"<html><head><title>page {i}</title></head><body>",
        f'<div class="hdr" data-url="{url}">filler {i % 97}</div>',
    ]
    paragraphs = text.split("\n")
    # interleave markers between paragraphs deterministically
    for k, para in enumerate(paragraphs):
        for j, ev in enumerate(events):
            if j % max(len(paragraphs), 1) == k:
                parts.append(render_marker(ev))
        parts.append(f"<p>{para}</p>")
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def gen_page(i: int) -> Page:
    """Standalone synthetic page for row index i (seed folded into hashes)."""
    url = f"https://{domain_of(i)}/path/{i}"
    text = _page_text(i)
    events = [event_for(i, j) for j in range(n_events_of(i))]
    return Page(
        url=url,
        warc_ts_us=(BASE_TS_NS // 1000) + i * 37_000_000,
        html=_assemble_html(i, url, text, events),
        text=text,
        lang=_LANGS[i % len(_LANGS)],
    )


def page_from_doc(doc_id: int, text: str, lang: str) -> Page:
    """Webpage derived from a driver ``documents`` row (SQL-rederivable)."""
    url = f"https://{domain_of(doc_id)}/page/{doc_id}"
    events = [event_for(doc_id, j) for j in range(n_events_of(doc_id))]
    return Page(
        url=url,
        warc_ts_us=(BASE_TS_NS // 1000) + doc_id * 37_000_000,
        html=_assemble_html(doc_id, url, text, events),
        text=text,
        lang=lang,
    )
