"""RFC 3986 URL normalization: canonical vectors, idempotence fuzz."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from weblog_pipeline.urlnorm import normalize_url

VECTORS = [
    ("HTTPS://Site.Example.COM:443/a/../b", "https://site.example.com/b"),
    ("http://h:80/x", "http://h/x"),
    ("http://h:8080/x", "http://h:8080/x"),
    ("https://h", "https://h/"),
    ("https://h/a/./b/../c", "https://h/a/c"),
    ("https://h/%41%2F%7e", "https://h/A%2F~"),
    ("https://h/p?b=2&a=1&a=0", "https://h/p?a=0&a=1&b=2"),
    ("https://h/p?x=", "https://h/p?x="),
    ("https://h/p#frag", "https://h/p"),
    ("https://h/a/..", "https://h/"),
    ("https://h/%3a", "https://h/%3A"),
    ("  https://h/x  ", "https://h/x"),
    # %2E is an unreserved '.', so encoded dot segments must resolve
    ("https://h/a/%2E%2E/b", "https://h/b"),
    ("https://h/a/%2e/b", "https://h/a/b"),
]


def test_canonical_vectors():
    for raw, want in VECTORS:
        assert normalize_url(raw) == want, raw


def test_unparseable_quarantined_not_raised():
    for bad in ("", "notaurl", "ftp://h/x", "https://", "http://h:bad/x",
                "http://[::1", None if False else "://x"):
        assert normalize_url(bad) is None, bad


@settings(max_examples=300, deadline=None)
@given(st.text(string.printable, max_size=80))
def test_total_and_idempotent(s):
    n = normalize_url(s)
    if n is not None:
        assert normalize_url(n) == n  # canonical forms are fixed points
