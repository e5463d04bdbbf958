"""Severity model: the closed 1-24 severity enum, text aliases, and the
``map_severity`` / ``severity_number_to_text`` scalar functions.

Semantics mirror the reference connector (behavior only, re-implemented):
  - canonical number<->text table: /root/reference/spaneventtologconnector/connector.go:27-55
  - aliases warning->warn, err->error:                        connector.go:71-78
  - "<base>1" suffix resolves to <base>:                      connector.go:427-432
  - "warningN" resolves to "warnN":                           connector.go:435-441
  - invalid input -> (0, ""):                                 connector.go:443
  - number->text with default "info":                         connector.go:448-453

Everything here is pure Python and import-time constant, so the Spark layer
can fold these tables into literal Column expressions (driver-side constant
folding) and the oracle layer can fold them into SQL CASE ladders.
"""

from __future__ import annotations

SEVERITY_UNSPECIFIED = 0

_LEVELS = ["trace", "debug", "info", "warn", "error", "fatal"]

#: canonical number -> text, numbers 1..24 in six bands of four.
NUMBER_TO_TEXT: dict[int, str] = {}
for _band, _level in enumerate(_LEVELS):
    for _i in range(4):
        _num = _band * 4 + _i + 1
        NUMBER_TO_TEXT[_num] = _level if _i == 0 else f"{_level}{_i + 1}"

#: canonical text -> number, plus the two aliases.
TEXT_TO_NUMBER: dict[str, int] = {t: n for n, t in NUMBER_TO_TEXT.items()}
TEXT_TO_NUMBER["warning"] = TEXT_TO_NUMBER["warn"]
TEXT_TO_NUMBER["err"] = TEXT_TO_NUMBER["error"]


def _build_full_domain() -> dict[str, int]:
    """The complete closed set of strings map_severity accepts, lowercased.

    The reference resolves three forms at runtime; since the domain is
    finite we enumerate it once so the Spark/SQL backends can use a single
    literal lookup table instead of runtime string surgery.
    """
    full: dict[str, int] = dict(TEXT_TO_NUMBER)
    # "<base>1" for every direct key (including aliases): trace1, warn1,
    # warning1, err1, trace21 (-> trace2), ...
    for key, num in list(TEXT_TO_NUMBER.items()):
        full.setdefault(key + "1", num)
    # "warningN" -> "warnN" for suffixes where warnN exists (N=2,3,4).
    for suffix in ("2", "3", "4"):
        full.setdefault("warning" + suffix, TEXT_TO_NUMBER["warn" + suffix])
    return full


#: lower(input) -> severity number, for every valid map_severity input.
FULL_TEXT_DOMAIN: dict[str, int] = _build_full_domain()

#: severities accepted by config validation (includes "unspecified",
#: which map_severity nevertheless resolves to invalid at runtime).
VALID_CONFIG_SEVERITIES: frozenset[str] = frozenset(
    list(NUMBER_TO_TEXT.values()) + ["unspecified"]
)


def wrap_int32(v: int) -> int:
    """Two's-complement int64 -> int32 narrowing (Go int32(v) semantics);
    the reference applies this to attribute-mapped severity numbers
    (plog.SeverityNumber(attrValue.Int()), connector.go:276)."""
    return ((v % 2**32) + 2**32 + 2**31) % 2**32 - 2**31


def severity_number_to_text(number: int) -> str:
    """Canonical text for a severity number; unknown -> "info"."""
    return NUMBER_TO_TEXT.get(number, "info")


def map_severity(severity: str) -> tuple[int, str]:
    """Case-insensitive text -> (number, canonical text); invalid -> (0, "")."""
    num = FULL_TEXT_DOMAIN.get(severity.lower())
    if num is None:
        return SEVERITY_UNSPECIFIED, ""
    return num, NUMBER_TO_TEXT[num]
