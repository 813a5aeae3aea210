"""WARC (Web ARChive) ingestion + HTML text extraction — the entry
point of a web-scale pretraining pipeline (Common Crawl ships WARC).

Pure stdlib: WARC/1.0 record framing per ISO 28500 (header block, CRLF
CRLF, Content-Length body, CRLF CRLF separator), the standard
member-per-record gzip packaging (each record its own gzip member,
concatenated — stdlib zlib consumes members sequentially), HTTP
response parsing, and a small state-machine HTML→text extractor
(drops script/style/comments, unescapes entities, normalizes
whitespace).

Spark shape (operators/multimodal.py convention): archives are opaque
binary payloads; `ingest_warc` explodes each archive into response
records inside an Arrow-batched mapInPandas — narrow, no shuffle, no
driver materialization. At 100 TB the unit of parallelism is the WARC
file (Common Crawl segments are ~1 GB), exactly how these corpora are
distributed.
"""

from __future__ import annotations

import gzip
import html as _html
import io
import re
import zlib


# ---------------------------------------------------------------------------
# Writer (tests / synthetic fixtures).
# ---------------------------------------------------------------------------
def warc_bytes(
    records: list[dict],
    *,
    compress: bool = True,
) -> bytes:
    """Serialize records ({uri, date, content_type, body: bytes,
    http_status}) as WARC/1.0 response records; `compress=True` gzips
    each record as its own member (the Common Crawl packaging)."""
    out = []
    for i, r in enumerate(records):
        body = r["body"] if isinstance(r["body"], bytes) else r["body"].encode()
        http = (
            f"HTTP/1.1 {r.get('http_status', 200)} OK\r\n"
            f"Content-Type: {r.get('content_type', 'text/html')}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        header = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:rec-{i}>\r\n"
            f"WARC-Target-URI: {r['uri']}\r\n"
            f"WARC-Date: {r.get('date', '2025-01-01T00:00:00Z')}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        rec = header + http + b"\r\n\r\n"
        out.append(gzip.compress(rec) if compress else rec)
    return b"".join(out)


# ---------------------------------------------------------------------------
# Parser.
# ---------------------------------------------------------------------------
def _gunzip_members(payload: bytes) -> bytes:
    """Decompress concatenated gzip members; returns raw bytes unchanged
    when the payload is not gzip."""
    if len(payload) < 2 or payload[:2] != b"\x1f\x8b":
        return payload
    out, pos = [], 0
    while pos < len(payload) and payload[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out.append(d.decompress(payload[pos:]))
        except zlib.error:
            break  # truncated member: keep what decompressed
        consumed = len(payload) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return b"".join(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:  # [0] is the version/status line
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1", "replace"
            )
    return headers


def parse_warc(payload: bytes) -> list[dict]:
    """All response records of a (possibly gzipped) WARC payload:
    [{uri, date, http_status, content_type, body: bytes}]. Malformed
    tail records are dropped (keep-what-parsed, the codec convention
    throughout operators/)."""
    buf = _gunzip_members(bytes(payload))
    records = []
    pos = 0
    while True:
        start = buf.find(b"WARC/", pos)
        if start < 0:
            break
        head_end = buf.find(b"\r\n\r\n", start)
        if head_end < 0:
            break
        headers = _parse_headers(buf[start:head_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = head_end + 4
            continue
        body_start = head_end + 4
        if body_start + length > len(buf):
            break  # truncated record
        block = buf[body_start : body_start + length]
        pos = body_start + length
        if headers.get("warc-type") != "response":
            continue
        http_end = block.find(b"\r\n\r\n")
        if http_end < 0:
            continue
        status_line = block[: block.find(b"\r\n")]
        parts = status_line.split()
        try:
            status = int(parts[1])
        except (IndexError, ValueError):
            continue
        http_headers = _parse_headers(block[:http_end])
        records.append(
            {
                "uri": headers.get("warc-target-uri", ""),
                "date": headers.get("warc-date", ""),
                "http_status": status,
                "content_type": http_headers.get("content-type", ""),
                "body": block[http_end + 4 :],
            }
        )
    return records


# ---------------------------------------------------------------------------
# HTML -> text.
# ---------------------------------------------------------------------------
_DROP_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>|<!--.*?-->",
    re.IGNORECASE | re.DOTALL,
)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")
_BLOCK_TAG_RE = re.compile(
    r"</?(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|section|article|header|"
    r"footer|blockquote|pre)\b[^>]*>",
    re.IGNORECASE,
)


def html_to_text(html_src: str) -> str:
    """Visible text of an HTML document: script/style/comment blocks
    dropped, block-level tags become newlines (so words don't fuse
    across structure), remaining tags stripped, entities unescaped,
    whitespace normalized to single spaces with newline-separated
    blocks collapsed."""
    s = _DROP_RE.sub(" ", html_src)
    s = _BLOCK_TAG_RE.sub("\n", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    lines = [_WS_RE.sub(" ", ln).strip() for ln in s.split("\n")]
    return "\n".join(ln for ln in lines if ln)


# ---------------------------------------------------------------------------
# Spark operator.
# ---------------------------------------------------------------------------
WARC_RECORD_SCHEMA = (
    "archive_id long, record_index int, uri string, warc_date string, "
    "http_status int, content_type string, body_bytes long, text string, "
    "n_text_chars long"
)


def ingest_warc(
    archives,  # DataFrame(archive_id long, payload binary)
    *,
    id_col: str = "archive_id",
    payload_col: str = "payload",
    extract_text: bool = True,
):
    """Explode WARC archive payloads into response-record rows with
    extracted visible text (for text/html records; other content types
    carry NULL text). One-to-many mapInPandas — narrow, Arrow-batched,
    bounded by records-per-archive."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            out = {k.split(" ")[0]: [] for k in WARC_RECORD_SCHEMA.split(", ")}
            for row in pdf.itertuples(index=False):
                payload = getattr(row, payload_col)
                for j, rec in enumerate(parse_warc(bytes(payload or b""))):
                    is_html = rec["content_type"].lower().startswith("text/html")
                    text = None
                    if extract_text and is_html:
                        text = html_to_text(
                            rec["body"].decode("utf-8", "replace")
                        )
                    out["archive_id"].append(getattr(row, id_col))
                    out["record_index"].append(j)
                    out["uri"].append(rec["uri"])
                    out["warc_date"].append(rec["date"])
                    out["http_status"].append(rec["http_status"])
                    out["content_type"].append(rec["content_type"])
                    out["body_bytes"].append(len(rec["body"]))
                    out["text"].append(text)
                    out["n_text_chars"].append(
                        len(text) if text is not None else None
                    )
            yield pd.DataFrame(out)

    return archives.mapInPandas(batches, schema=WARC_RECORD_SCHEMA)
