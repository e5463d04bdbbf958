"""OTLP/JSON source + sink: canonical-format pinning, file roundtrip, and
foreign-document decode (a hand-written OTLP line the encoder never saw)."""

import json

from pyspark.sql import Row

from weblog_pipeline import otlp


def _event_rows():
    return [
        Row(
            event_name="exception",
            ts_ns=1_751_587_200_000_000_123,
            trace_id="0102030405060708090a0b0c0d0e0f10",
            span_id="0102030405060708",
            span_name="test-span",
            span_kind="Server",
            trace_state="st=1",
            event_attrs_s={"exception.type": "NPE"},
            event_attrs_i={"count": 42},
            span_attrs={"http.method": "GET"},
            res_attrs={"service.name": "svc"},
        ),
        Row(
            event_name="custom",
            ts_ns=2,
            trace_id="f" * 32,
            span_id="e" * 16,
            span_name="s2",
            span_kind="Internal",
            trace_state="",
            event_attrs_s={},
            event_attrs_i={},
            span_attrs={},
            res_attrs={},
        ),
    ]


def test_encode_is_canonical_otlp_json(spark):
    df = spark.createDataFrame(_event_rows())
    line = otlp.encode_otlp(df).orderBy("otlp").collect()[-1]["otlp"]
    doc = json.loads(line)
    span = doc["resourceSpans"][0]["scopeSpans"][0]["spans"][0]
    assert span["kind"] == 2  # Server
    # proto3 JSON mapping: int64/uint64 are strings
    assert span["startTimeUnixNano"] == "1751587200000000123"
    evt = span["events"][0]
    assert evt["name"] == "exception"
    attrs = {a["key"]: a["value"] for a in evt["attributes"]}
    assert attrs["exception.type"] == {"stringValue": "NPE"}
    assert attrs["count"] == {"intValue": "42"}  # exactly one typed member
    res = {a["key"]: a["value"] for a in
           doc["resourceSpans"][0]["resource"]["attributes"]}
    assert res["service.name"] == {"stringValue": "svc"}


def test_file_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(_event_rows())
    path = str(tmp_path / "otlp")
    otlp.write_otlp_jsonl(df, path)
    back = otlp.read_otlp_jsonl(spark, path)
    want = {r["trace_id"]: r.asDict() for r in df.collect()}
    got = {r["trace_id"]: r.asDict() for r in back.collect()}
    assert set(got) == set(want)
    for tid, row in want.items():
        assert got[tid] == row, tid


def test_decode_foreign_document(spark):
    # a document the encoder never produced: two events on one span,
    # doubleValue attribute (ignored by the typed maps), missing traceState
    doc = {
        "resourceSpans": [
            {
                "resource": {
                    "attributes": [
                        {"key": "service.name", "value": {"stringValue": "x"}}
                    ]
                },
                "scopeSpans": [
                    {
                        "spans": [
                            {
                                "traceId": "ab" * 16,
                                "spanId": "cd" * 8,
                                "name": "sp",
                                "kind": 3,
                                "startTimeUnixNano": "7",
                                "attributes": [],
                                "events": [
                                    {
                                        "timeUnixNano": "8",
                                        "name": "e1",
                                        "attributes": [
                                            {
                                                "key": "pi",
                                                "value": {"doubleValue": 3.14},
                                            }
                                        ],
                                    },
                                    {
                                        "timeUnixNano": "9",
                                        "name": "e2",
                                        "attributes": [],
                                    },
                                ],
                            }
                        ]
                    }
                ],
            }
        ]
    }
    df = spark.createDataFrame([Row(otlp=json.dumps(doc))])
    rows = otlp.decode_otlp(df).orderBy("ts_ns").collect()
    assert [r["event_name"] for r in rows] == ["e1", "e2"]
    assert rows[0]["span_kind"] == "Client"
    assert rows[0]["trace_state"] is None  # absent field, not ""
    assert rows[0]["event_attrs_s"] == {}  # doubleValue not in typed maps
    assert rows[0]["res_attrs"] == {"service.name": "x"}


def test_absent_kind_decodes_to_unspecified(spark):
    # canonical protojson drops zero-valued enums — absent kind IS
    # SPAN_KIND_UNSPECIFIED
    doc = {
        "resourceSpans": [{
            "resource": {"attributes": []},
            "scopeSpans": [{"spans": [{
                "traceId": "00" * 16, "spanId": "00" * 8, "name": "s",
                "startTimeUnixNano": "1", "attributes": [],
                "events": [{"timeUnixNano": "1", "name": "e",
                            "attributes": []}],
            }]}],
        }]
    }
    df = spark.createDataFrame([Row(otlp=json.dumps(doc))])
    row = otlp.decode_otlp(df).collect()[0]
    assert row["span_kind"] == "Unspecified"
