"""WARC (ISO 28500) ingestion — the Common Crawl container format.

A web-scale training corpus arrives as ``.warc.gz`` files: gzip with
ONE MEMBER PER RECORD (so byte-range readers can seek), each record a
``WARC/1.0`` header block + payload, response records carrying a full
HTTP message.  This module implements the container from scratch on
stdlib zlib:

* ``iter_records`` — multi-member gunzip (decompressobj/unused_data
  loop), header parse (case-insensitive, tolerant of missing CRLF at
  EOF), Content-Length-driven payload slicing;
* ``split_http`` — HTTP status + headers + body split for response
  records (the body is the HTML that feeds operators/html.py);
* ``write_warc`` — conformant writer (member-per-record gzip) for
  fixtures and the interchange sink;
* ``warc_records`` — the Spark operator over blob rows with the crawl
  contract (corrupt records marked, never a task kill).

Composition is the point: warc_records → html_extract →
repetition_stats / substring_dup_spans / lang & quality scores is the
whole crawl-to-training-data front end, every stage a DataFrame op.
"""

from __future__ import annotations

import zlib
from typing import Iterator


class WarcError(ValueError):
    pass


def _gunzip_members(data: bytes) -> bytes:
    """Concatenated gzip members -> concatenated payload (stdlib)."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(31)
        out.append(d.decompress(data[pos:]))
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise WarcError("gzip member did not advance")
        pos += consumed
    return b"".join(out)


def iter_records(data: bytes) -> Iterator[dict]:
    """Parse a WARC (plain or .gz) byte blob into records:
    {headers: {lower-name: value}, payload: bytes}."""
    data = bytes(data)
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos:pos + 2] in (b"\r\n", b"\n\n") or \
                (pos < n and data[pos:pos + 1] == b"\n"):
            pos += 2 if data[pos:pos + 2] == b"\r\n" else 1
        if pos >= n:
            break
        if not data[pos:pos + 5].startswith(b"WARC/"):
            raise WarcError(f"expected WARC version at offset {pos}")
        hdr_end = data.find(b"\r\n\r\n", pos)
        sep = 4
        if hdr_end < 0:
            hdr_end = data.find(b"\n\n", pos)
            sep = 2
        if hdr_end < 0:
            raise WarcError("unterminated WARC header block")
        headers: dict[str, str] = {}
        lines = data[pos:hdr_end].split(b"\r\n" if sep == 4 else b"\n")
        for line in lines[1:]:
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.strip().lower().decode("latin1")] = \
                    v.strip().decode("utf-8", "replace")
        try:
            clen = int(headers.get("content-length", "0"))
        except ValueError:
            raise WarcError("bad Content-Length")
        body_start = hdr_end + sep
        payload = data[body_start:body_start + clen]
        if len(payload) < clen:
            raise WarcError("truncated record payload")
        yield {"headers": headers, "payload": payload}
        pos = body_start + clen


def split_http(payload: bytes) -> tuple[int, dict[str, str], bytes]:
    """(status, headers, body) of an HTTP response payload."""
    end = payload.find(b"\r\n\r\n")
    sep = 4
    if end < 0:
        end = payload.find(b"\n\n")
        sep = 2
    if end < 0:
        return 0, {}, payload
    lines = payload[:end].split(b"\r\n" if sep == 4 else b"\n")
    status = 0
    first = lines[0].split()
    if len(first) >= 2 and first[0].startswith(b"HTTP/"):
        try:
            status = int(first[1])
        except ValueError:
            status = 0
    headers = {}
    for line in lines[1:]:
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("latin1")] = \
                v.strip().decode("utf-8", "replace")
    return status, headers, payload[end + sep:]


def write_warc(records: list[dict], *, gzip_members: bool = True) -> bytes:
    """records: [{url, date, rec_type='response', payload | (html +
    status)}] -> .warc(.gz) bytes, one gzip member per record like
    Common Crawl."""
    out = []
    for i, r in enumerate(records):
        payload = r.get("payload")
        if payload is None:
            body = r.get("html", "").encode("utf-8")
            payload = (b"HTTP/1.1 %d OK\r\nContent-Type: text/html\r\n"
                       b"Content-Length: %d\r\n\r\n"
                       % (r.get("status", 200), len(body))) + body
        rec_type = r.get("rec_type", "response")
        hdr = (f"WARC/1.0\r\n"
               f"WARC-Type: {rec_type}\r\n"
               f"WARC-Record-ID: <urn:uuid:{i:032d}>\r\n"
               f"WARC-Date: {r.get('date', '2026-01-01T00:00:00Z')}\r\n"
               f"WARC-Target-URI: {r.get('url', '')}\r\n"
               f"Content-Type: application/http; msgtype=response\r\n"
               f"Content-Length: {len(payload)}\r\n\r\n").encode("latin1")
        rec = hdr + payload + b"\r\n\r\n"
        if gzip_members:
            c = zlib.compressobj(6, zlib.DEFLATED, 31)
            out.append(c.compress(rec) + c.flush())
        else:
            out.append(rec)
    return b"".join(out)


WARC_SCHEMA = ("doc_id long, rec_index int, rec_type string, url string, "
               "warc_date string, http_status int, content_type string, "
               "payload binary, ok boolean")


def warc_records(df, *, blob_col: str = "bytes", id_col: str = "doc_id"):
    """Blob rows (one .warc(.gz) each) -> one row per contained record,
    with HTTP responses split so ``payload`` is the message BODY (the
    HTML).  Corrupt archives yield a single ok=false row."""
    import pandas as pd

    def _run(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for did, blob in zip(pdf[id_col], pdf[blob_col]):
                did = int(did)
                try:
                    for ri, rec in enumerate(iter_records(bytes(blob))):
                        h = rec["headers"]
                        rec_type = h.get("warc-type", "")
                        status, hh, body = (0, {}, rec["payload"])
                        if rec_type == "response":
                            status, hh, body = split_http(rec["payload"])
                        rows.append((did, ri, rec_type,
                                     h.get("warc-target-uri"),
                                     h.get("warc-date"), status,
                                     hh.get("content-type"),
                                     body, True))
                except (WarcError, zlib.error, ValueError):
                    rows.append((did, -1, None, None, None, 0, None,
                                 None, False))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "rec_index", "rec_type", "url", "warc_date",
                "http_status", "content_type", "payload", "ok"])

    return df.select(id_col, blob_col).mapInPandas(_run, schema=WARC_SCHEMA)
