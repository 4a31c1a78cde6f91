"""WARC parsing (net_spider_spark/pipeline/warc.py): golden archives
built in-test — plain and per-record-gzip layouts, HTTP splitting,
the per-row error channel, and the HTML->text extraction."""

import gzip

import pytest
from pyspark.sql import functions as F

from net_spider_spark.pipeline import warc as W


def _http(body: bytes, status: str = "200 OK") -> bytes:
    return (
        f"HTTP/1.1 {status}\r\nContent-Type: text/html\r\n\r\n".encode()
        + body
    )


def _rec(payload: bytes, uri="http://e/x", wtype="response",
         ctype="application/http; msgtype=response") -> bytes:
    head = (
        f"WARC/1.0\r\nWARC-Type: {wtype}\r\nWARC-Target-URI: {uri}\r\n"
        "WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"Content-Type: {ctype}\r\nContent-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _parse(spark, blobs):
    df = spark.createDataFrame(
        list(enumerate(blobs)), "file_id long, content binary"
    )
    return W.parse_warc_records(df).collect()


def test_single_response_record(spark):
    body = b"<html><body>hi</body></html>"
    rows = _parse(spark, [_rec(_http(body), uri="http://a/1")])
    assert len(rows) == 1
    r = rows[0]
    assert r["error"] is None and r["record_idx"] == 0
    assert r["warc_type"] == "response"
    assert r["target_uri"] == "http://a/1"
    assert r["warc_date"] == "2024-01-01T00:00:00Z"
    assert r["http_status"] == 200
    assert bytes(r["http_body"]) == body
    assert r["payload_bytes"] == len(_http(body))


def test_multi_record_archive_and_non_http_types(spark):
    info = _rec(b"software: test\r\n", wtype="warcinfo",
                ctype="application/warc-fields")
    req = _rec(b"GET / HTTP/1.1\r\n\r\n", wtype="request",
               ctype="application/http; msgtype=request")
    resp = _rec(_http(b"ok"), uri="http://a/2")
    rows = _parse(spark, [info + req + resp])
    assert [r["record_idx"] for r in rows] == [0, 1, 2]
    assert [r["warc_type"] for r in rows] == [
        "warcinfo", "request", "response"
    ]
    # warcinfo payload is not an HTTP message -> status/body NULL
    assert rows[0]["http_status"] is None and rows[0]["http_body"] is None
    # a request IS an HTTP message but not a response -> no status
    assert rows[1]["http_status"] is None
    assert rows[2]["http_status"] == 200


def test_per_record_gzip_members_equal_plain(spark):
    r1, r2 = _rec(_http(b"one"), uri="u1"), _rec(_http(b"two"), uri="u2")
    plain = _parse(spark, [r1 + r2])
    gz = _parse(spark, [gzip.compress(r1) + gzip.compress(r2)])
    strip = lambda rows: [  # noqa: E731
        (r["record_idx"], r["target_uri"], bytes(r["http_body"]))
        for r in rows
    ]
    assert strip(plain) == strip(gz) == [
        (0, "u1", b"one"), (1, "u2", b"two")
    ]


def test_error_channel_per_row(spark):
    good = _rec(_http(b"fine"), uri="ok")
    bad_magic = b"NOTAWARC" + b"\x00" * 16
    truncated = _rec(_http(b"x" * 50))[:-60]  # length past end
    rows = _parse(spark, [good, bad_magic, truncated, None])
    by_file = {}
    for r in rows:
        by_file.setdefault(r["file_id"], []).append(r)
    assert by_file[0][0]["error"] is None
    assert "WARC/ magic" in by_file[1][0]["error"]
    assert "Content-Length" in by_file[2][0]["error"]
    assert by_file[3][0]["error"] == "null archive"
    # errors never kill neighbouring archives
    assert len(rows) == 4


def test_warc_text_documents_extracts_and_filters(spark):
    html = (b"<html><head><style>b{color:red}</style>"
            b"<script>var x=1;</script></head>"
            b"<body><h1>Title</h1><p>hello &amp; goodbye</p></body></html>")
    ok = _rec(_http(html), uri="http://a/ok")
    missing = _rec(_http(b"gone", status="404 Not Found"),
                   uri="http://a/404")
    df = spark.createDataFrame(
        [(7, ok + missing)], "file_id long, content binary"
    )
    rows = W.warc_text_documents(df).collect()
    assert len(rows) == 1  # 404 filtered
    assert rows[0]["doc_id"] == 7 * 100000 + 0
    assert rows[0]["target_uri"] == "http://a/ok"
    assert rows[0]["text"] == "Title hello & goodbye"


def test_parse_plan_is_single_arrow_stage(spark):
    df = spark.createDataFrame(
        [(1, _rec(_http(b"x")))], "file_id long, content binary"
    )
    plan = (
        W.parse_warc_records(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    # html_to_text stays in expressions — no second python stage
    plan2 = (
        W.warc_text_documents(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan2.count("MapInPandas") == 1
