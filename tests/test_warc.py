"""WARC ingestion + HTML text extraction (operators/warc.py)."""

from __future__ import annotations

import gzip

from kwwhat_spark.operators.warc import (
    html_to_text,
    ingest_warc,
    parse_warc,
    warc_bytes,
)

HTML = (
    "<html><head><title>T</title><style>body{color:red}</style>"
    "<script>var x = '<p>not text</p>';</script></head>"
    "<body><h1>Header&nbsp;One</h1><p>First &amp; second.</p>"
    "<div>Item<br>Next</div><!-- hidden --></body></html>"
)


def _recs():
    return [
        {"uri": "https://a.example/x", "body": HTML, "content_type": "text/html"},
        {
            "uri": "https://a.example/img",
            "body": b"\x89PNG\r\n" + bytes(range(32)),
            "content_type": "image/png",
        },
        {
            "uri": "https://b.example/y",
            "body": "<p>Second page</p>",
            "content_type": "text/html; charset=utf-8",
            "http_status": 404,
        },
    ]


def test_warc_roundtrip_gzip_and_plain():
    for compress in (True, False):
        payload = warc_bytes(_recs(), compress=compress)
        got = parse_warc(payload)
        assert [r["uri"] for r in got] == [r["uri"] for r in _recs()]
        assert got[0]["content_type"] == "text/html"
        assert got[0]["body"].decode() == HTML
        assert got[1]["body"][:6] == b"\x89PNG\r\n"  # binary body intact
        assert got[2]["http_status"] == 404


def test_warc_truncation_keeps_parsed_records():
    payload = warc_bytes(_recs(), compress=True)
    cut = payload[: len(payload) - 40]  # inside the last gzip member
    got = parse_warc(cut)
    assert 1 <= len(got) < 3
    assert got[0]["uri"] == "https://a.example/x"
    assert parse_warc(b"") == []
    assert parse_warc(b"garbage" * 10) == []


def test_html_to_text_semantics():
    text = html_to_text(HTML)
    assert "not text" not in text           # script dropped
    assert "color:red" not in text          # style dropped
    assert "hidden" not in text             # comment dropped
    assert "Header One" in text             # &nbsp; unescaped, tag stripped
    assert "First & second." in text        # entity unescaped
    assert "Item\nNext" in text             # <br> breaks the block
    assert "<" not in text and ">" not in text


def test_html_script_with_attributes_and_case():
    s = '<SCRIPT type="text/javascript">alert("x")</script><p>ok</p>'
    assert html_to_text(s) == "ok"


def test_ingest_warc_explodes_and_extracts(spark):
    rows = [
        (1, bytearray(warc_bytes(_recs(), compress=True))),
        (2, bytearray(warc_bytes(_recs()[:1], compress=False))),
        (3, bytearray(b"not a warc")),
    ]
    df = spark.createDataFrame(rows, "archive_id long, payload binary")
    out = ingest_warc(df).collect()
    by_arch = {}
    for r in out:
        by_arch.setdefault(r.archive_id, []).append(r)
    assert len(by_arch[1]) == 3 and len(by_arch[2]) == 1
    assert 3 not in by_arch  # unparseable archive yields nothing
    rec0 = sorted(by_arch[1], key=lambda r: r.record_index)[0]
    assert rec0.uri == "https://a.example/x"
    assert "Header One" in rec0.text
    assert rec0.n_text_chars == len(rec0.text)
    png = [r for r in by_arch[1] if r.content_type == "image/png"][0]
    assert png.text is None and png.n_text_chars is None
    assert png.body_bytes == 6 + 32


def test_canonicalize_url_cases(spark):
    from kwwhat_spark.functions.text import canonicalize_url

    cases = [
        ("HTTP://WWW.Ex.COM:80/a/b/", "http://www.ex.com/a/b"),
        ("https://ex.com:443/", "https://ex.com/"),
        ("https://ex.com:8443/x", "https://ex.com:8443/x"),  # non-default kept
        ("https://ex.com//a///b//?b=2&a=1#frag", "https://ex.com/a/b?a=1&b=2"),
        ("https://ex.com/p?utm_source=x&utm_campaign=y", "https://ex.com/p"),
        ("https://ex.com/p?gclid=1&keep=2&fbclid=3", "https://ex.com/p?keep=2"),
        ("https://ex.com", "https://ex.com/"),
        ("https://ex.com/#only-frag", "https://ex.com/"),
        # userinfo stripped (host cannot contain '@'; greedy to last @)
        ("https://alice:pw@a.com/x", "https://a.com/x"),
        ("https://alice@pw@a.com:8443/x", "https://a.com:8443/x"),
        ("http://bob@b.com:80/y", "http://b.com/y"),
        # bracketed IPv6 literals kept whole; ports still recognized
        ("HTTP://[::1]:8080/v6", "http://[::1]:8080/v6"),
        ("https://[2001:DB8::1]:443/v6", "https://[2001:db8::1]/v6"),
        ("http://[2001:db8::7]/v6?b=2&a=1", "http://[2001:db8::7]/v6?a=1&b=2"),
        ("https://u:p@[::1]:9443/z", "https://[::1]:9443/z"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r[0] for r in df.select(canonicalize_url("u")).collect()]
    assert got == [c for _, c in cases]
