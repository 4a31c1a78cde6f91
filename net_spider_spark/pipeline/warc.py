"""WARC (ISO 28500) record parsing — the front door of a web-scale
text pipeline: WARC archives -> HTTP responses -> HTML/plain text ->
the documents table every downstream operator here consumes.

Shape: archives are opaque ``binary`` blobs in a DataFrame column
(exactly how the multimodal decoders treat images/audio —
pipeline/multimodal.py), and parsing runs inside an Arrow-batched
``mapInPandas`` with a per-row error channel: a malformed record
yields an ``error`` string on its own output row instead of failing
the task, so one corrupt archive in a 100 TB crawl costs one row, not
a stage retry loop. Record-at-a-time gzip (the Common Crawl layout:
each record its own gzip member) and plain concatenated WARC/1.x both
parse; the stdlib ``zlib`` handles multi-member streams.

Pure python + stdlib only, like the image/audio decoders; everything
before and after the parse (building projections, HTTP splitting
downstream filters) stays in Catalyst expressions.
"""
from __future__ import annotations

import zlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF2 = b"\r\n\r\n"


def _gunzip_members(blob: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream; raw bytes
    pass through untouched."""
    if not blob.startswith(b"\x1f\x8b"):
        return blob
    out = []
    data = blob
    while data.startswith(b"\x1f\x8b"):
        d = zlib.decompressobj(wbits=47)
        out.append(d.decompress(data))
        out.append(d.flush())
        data = d.unused_data
    return b"".join(out)


def _parse_warc_bytes(blob: bytes):
    """Yield (warc_type, target_uri, warc_date, content_type, payload)
    per record; raise ValueError on malformed input."""
    data = _gunzip_members(blob)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        if not data[pos:pos + 5] == b"WARC/":
            raise ValueError(f"expected WARC/ magic at offset {pos}")
        head_end = data.find(_CRLF2, pos)
        if head_end < 0:
            raise ValueError("unterminated WARC header block")
        headers: dict[str, str] = {}
        lines = data[pos:head_end].decode("utf-8", "replace").split("\r\n")
        for line in lines[1:]:
            key, sep, val = line.partition(":")
            if sep:
                headers[key.strip().lower()] = val.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("missing/bad Content-Length") from None
        body_start = head_end + len(_CRLF2)
        if body_start + length > n:
            raise ValueError("Content-Length past end of archive")
        payload = data[body_start:body_start + length]
        yield (
            headers.get("warc-type"),
            headers.get("warc-target-uri"),
            headers.get("warc-date"),
            headers.get("content-type"),
            payload,
        )
        pos = body_start + length


def _split_http(payload: bytes):
    """(status, body) when the payload is an HTTP response message,
    else (None, None)."""
    if not payload.startswith(b"HTTP/"):
        return None, None
    sep = payload.find(_CRLF2)
    if sep < 0:
        return None, None
    status_line = payload[:payload.find(b"\r\n")].decode("utf-8", "replace")
    parts = status_line.split()
    status = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else None
    return status, payload[sep + len(_CRLF2):]


def parse_warc_records(
    df: DataFrame,
    blob_col: str = "content",
    id_col: str = "file_id",
) -> DataFrame:
    """Explode WARC archives into records:
    (id_col, record_idx, warc_type, target_uri, warc_date,
    content_type, http_status, http_body, payload_bytes, error).

    ``http_status``/``http_body`` are filled for HTTP response
    payloads (the Common Crawl case); other record types (warcinfo,
    request, metadata) keep them NULL. A malformed archive emits ONE
    row with ``error`` set and everything else NULL — the same
    per-row error contract as the media decoders.
    """
    import pandas as pd

    id_field = df.select(id_col).schema.fields[0]

    def gen(batches) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows: list[tuple] = []
            for fid, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    rows.append((fid, None, None, None, None, None,
                                 None, None, None, "null archive"))
                    continue
                try:
                    for i, (wt, uri, date, ctype, payload) in enumerate(
                        _parse_warc_bytes(bytes(blob))
                    ):
                        status, body = _split_http(payload)
                        rows.append((fid, i, wt, uri, date, ctype,
                                     status, body, len(payload), None))
                except ValueError as e:
                    rows.append((fid, None, None, None, None, None,
                                 None, None, None, str(e)))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "record_idx", "warc_type",
                         "target_uri", "warc_date", "content_type",
                         "http_status", "http_body", "payload_bytes",
                         "error"],
            )

    schema = T.StructType([
        id_field,
        T.StructField("record_idx", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_body", T.BinaryType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("error", T.StringType()),
    ])
    return df.select(id_col, blob_col).mapInPandas(gen, schema=schema)


# Tag/entity stripping for the HTML -> text step: Catalyst
# expressions, NOT python — once the bodies are rows, everything is
# ordinary string processing Spark does in codegen.
_TAG_RE = r"<[^>]*>"
_SCRIPT_RE = r"(?is)<(script|style)\b[^>]*>.*?</\1>"


def html_to_text(body: F.Column) -> F.Column:
    """Crude but dependency-free HTML -> text: drop script/style
    blocks, strip tags, decode the common entities, collapse
    whitespace. For a real crawl swap in a proper extractor behind
    the same column contract."""
    txt = body.cast("string")
    txt = F.regexp_replace(txt, _SCRIPT_RE, " ")
    txt = F.regexp_replace(txt, _TAG_RE, " ")
    for ent, ch in (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " ")):
        txt = F.replace(txt, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(txt, r"\s+", " "))


def warc_text_documents(
    df: DataFrame,
    blob_col: str = "content",
    id_col: str = "file_id",
) -> DataFrame:
    """WARC archives -> (doc_id, target_uri, text): parse, keep HTTP
    200 responses, extract text (html_to_text). doc_id =
    id_col * 100000 + record_idx, unique while archives hold fewer
    than 100k records (Common Crawl segments hold far fewer)."""
    recs = parse_warc_records(df, blob_col=blob_col, id_col=id_col)
    return recs.where(
        F.col("error").isNull() & (F.col("http_status") == 200)
    ).select(
        (F.col(id_col).cast("long") * 100000
         + F.col("record_idx")).alias("doc_id"),
        "target_uri",
        html_to_text(F.col("http_body")).alias("text"),
    )
