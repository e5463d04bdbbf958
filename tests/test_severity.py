"""Scalar-function tables mirroring the reference's exhaustive unit tests
(connector_test.go:479-561): severity_number_to_text and map_severity —
basics, *1 variants, *2 variants, case-insensitivity, aliases, invalids."""

import pytest

from weblog_pipeline.severity import (
    FULL_TEXT_DOMAIN,
    NUMBER_TO_TEXT,
    map_severity,
    severity_number_to_text,
)


# connector_test.go:479-502
@pytest.mark.parametrize(
    "number,expected",
    [
        (1, "trace"), (2, "trace2"), (3, "trace3"), (4, "trace4"),
        (5, "debug"), (6, "debug2"), (7, "debug3"), (8, "debug4"),
        (9, "info"), (10, "info2"), (11, "info3"), (12, "info4"),
        (13, "warn"), (14, "warn2"), (15, "warn3"), (16, "warn4"),
        (17, "error"), (18, "error2"), (19, "error3"), (20, "error4"),
        (21, "fatal"), (22, "fatal2"), (23, "fatal3"), (24, "fatal4"),
        (0, "info"),      # unspecified -> default
        (99, "info"),     # unknown -> default
        (-1, "info"),
    ],
)
def test_severity_number_to_text(number, expected):
    assert severity_number_to_text(number) == expected


# connector_test.go:505-561
@pytest.mark.parametrize(
    "text,exp_num,exp_text",
    [
        # basics
        ("trace", 1, "trace"), ("debug", 5, "debug"), ("info", 9, "info"),
        ("warn", 13, "warn"), ("error", 17, "error"), ("fatal", 21, "fatal"),
        # case-insensitivity
        ("INFO", 9, "info"), ("Error", 17, "error"), ("WARN", 13, "warn"),
        ("FaTaL", 21, "fatal"),
        # aliases
        ("warning", 13, "warn"), ("err", 17, "error"),
        ("WARNING", 13, "warn"), ("ERR", 17, "error"),
        # *1 variants resolve to base
        ("trace1", 1, "trace"), ("debug1", 5, "debug"), ("info1", 9, "info"),
        ("warn1", 13, "warn"), ("error1", 17, "error"), ("fatal1", 21, "fatal"),
        ("warning1", 13, "warn"), ("err1", 17, "error"),
        # *2..*4 variants are direct canonical texts
        ("trace2", 2, "trace2"), ("debug3", 7, "debug3"), ("info4", 12, "info4"),
        ("warn2", 14, "warn2"), ("error3", 19, "error3"), ("fatal4", 24, "fatal4"),
        # warningN -> warnN
        ("warning2", 14, "warn2"), ("warning3", 15, "warn3"),
        ("warning4", 16, "warn4"),
        # edge: "<canonicalN>1" resolves via suffix-trim to canonicalN
        ("trace21", 2, "trace2"),
        # invalids
        ("", 0, ""), ("bogus", 0, ""), ("critical", 0, ""),
        ("warn5", 0, ""), ("warning5", 0, ""), ("info5", 0, ""),
        ("unspecified", 0, ""), ("warning21", 0, ""),
    ],
)
def test_map_severity(text, exp_num, exp_text):
    assert map_severity(text) == (exp_num, exp_text)


def test_tables_are_consistent():
    assert len(NUMBER_TO_TEXT) == 24
    assert NUMBER_TO_TEXT[9] == "info"
    for key, num in FULL_TEXT_DOMAIN.items():
        assert key == key.lower()
        assert 1 <= num <= 24
