"""WARC ingestion + HTML-to-text extraction: generated archives
(plain and gzip, every record type) through the distributed reader,
byte-exact framing, and the extraction chain vs expected text."""

import gzip

import pytest
from pyspark.sql import functions as F

from opencosmo_spark.pipeline.web import (
    html_to_text,
    parse_warc_records,
    read_warc,
    split_http_response,
    warc_to_documents,
)

HTML_BODY = (
    b"<html><head><title>T</title><style>p{color:red}</style>\n"
    b"<script>var x = '<p>not text</p>';</script></head>\n"
    b"<body><!-- a comment --><h1>Heading</h1>\n"
    b"<p>First &amp; second &lt;line&gt;.</p>"
    b"<div>Item one</div><ul><li>alpha</li><li>beta</li></ul>"
    b"<p>Tom&#39;s &quot;quote&quot;&nbsp;here</p></body></html>"
)


def _record(rtype, rid, uri, payload, extra=b""):
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + rtype + b"\r\n"
        b"WARC-Record-ID: <urn:uuid:" + rid + b">\r\n"
        b"WARC-Date: 2024-01-15T10:00:00Z\r\n"
        + (b"WARC-Target-URI: " + uri + b"\r\n" if uri else b"")
        + extra
        + b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
    )
    return head + payload + b"\r\n\r\n"


def _http(status, ctype, body):
    return (
        b"HTTP/1.1 " + status + b"\r\n"
        b"Content-Type: " + ctype + b"\r\n"
        b"Server: test\r\n\r\n" + body
    )


def _archive():
    return (
        _record(b"warcinfo", b"0001", b"", b"software: test-crawler\r\n")
        + _record(
            b"request", b"0002", b"http://example.com/a",
            b"GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n",
        )
        + _record(
            b"response", b"0003", b"http://example.com/a",
            _http(b"200 OK", b"text/html; charset=utf-8", HTML_BODY),
        )
        + _record(
            b"response", b"0004", b"http://example.com/miss",
            _http(b"404 Not Found", b"text/html", b"<p>gone</p>"),
        )
        + _record(
            b"response", b"0005", b"http://example.com/img",
            _http(b"200 OK", b"image/png", b"\x89PNGfake"),
        )
        + _record(
            b"conversion", b"0006", b"http://example.com/wet",
            b"Pre-extracted plain text.\nSecond line.",
            extra=b"Content-Type: text/plain\r\n",
        )
    )


def test_parse_warc_records_byte_exact_framing():
    recs = parse_warc_records(_archive())
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "request", "response", "response", "response",
        "conversion",
    ]
    assert recs[2]["target_uri"] == "http://example.com/a"
    status, ctype, body = split_http_response(recs[2]["payload"])
    assert status == 200 and ctype.startswith("text/html")
    assert body == HTML_BODY  # exact Content-Length framing
    # a payload containing \r\n\r\n + WARC/ must NOT split the record
    tricky = _record(
        b"response", b"0007", b"http://example.com/t",
        _http(b"200 OK", b"text/plain", b"fake\r\n\r\nWARC/1.0\r\nboundary"),
    )
    got = parse_warc_records(tricky)
    assert len(got) == 1
    assert b"WARC/1.0" in got[0]["payload"]
    # gzip twin parses identically
    assert parse_warc_records(gzip.compress(_archive())) == recs
    # truncated archive: complete records parse, the torn one is dropped
    cut = _archive()[:-40]
    assert len(parse_warc_records(cut)) == 5


def test_read_warc_distributed(spark, tmp_path):
    (tmp_path / "seg-00.warc").write_bytes(_archive())
    (tmp_path / "seg-01.warc.gz").write_bytes(gzip.compress(_archive()))
    out = read_warc(spark, str(tmp_path), response_only=False).toPandas()
    assert len(out) == 12  # 6 records x 2 files
    resp = read_warc(spark, str(tmp_path)).toPandas()
    assert set(resp.warc_type) == {"response", "conversion"}
    assert len(resp) == 8
    r = resp[resp.record_id.str.contains("0003")].iloc[0]
    assert r.http_status == 200
    assert bytes(r.payload) == HTML_BODY


def test_html_to_text_extraction(spark):
    df = spark.createDataFrame(
        [(0, HTML_BODY.decode())], ["i", "html"]
    ).select(html_to_text("html").alias("text"))
    text = df.first()["text"]
    # scripts/styles/comments gone — including the tag-looking string
    # INSIDE the script
    assert "color:red" not in text and "not text" not in text
    assert "comment" not in text
    # entities decoded, block structure became lines
    lines = text.split("\n")
    assert "Heading" in lines
    assert "First & second <line>." in lines
    assert "alpha" in lines and "beta" in lines
    assert 'Tom\'s "quote" here' in lines
    # amp-encoded entity decodes to the LITERAL entity, not through it
    twice = spark.createDataFrame([("x &amp;lt; y",)], ["h"]).select(
        html_to_text("h").alias("t")
    )
    assert twice.first()["t"] == "x &lt; y"


def test_warc_to_documents_end_to_end(spark, tmp_path):
    (tmp_path / "seg.warc").write_bytes(_archive())
    docs = warc_to_documents(read_warc(spark, str(tmp_path))).toPandas()
    # 200-HTML and the WET conversion survive; 404 and image/png drop
    assert len(docs) == 2
    by_url = docs.set_index("url")
    assert "Heading" in by_url.loc["http://example.com/a", "text"]
    assert (
        by_url.loc["http://example.com/wet", "text"]
        == "Pre-extracted plain text.\nSecond line."
    )
    assert docs.doc_id.nunique() == 2
    assert (docs.fetch_date == "2024-01-15T10:00:00Z").all()
    # the composition the stage exists for: straight into the curator
    from opencosmo_spark.pipeline import curate_corpus

    curated, counts = curate_corpus(
        spark.createDataFrame(docs[["doc_id", "text"]]),
        min_quality=0.0,
        min_tokens=2,
    )
    assert counts["input"] == 2 and curated.count() == 2


URLS = [
    # (id, url)
    (0, "https://example.com/a/b"),
    (1, "http://sub.example.com/page?q=1"),
    (2, "https://ample.com/x"),           # NOT a suffix match of example.com
    (3, "http://news.bbc.co.uk/story"),
    (4, "https://good.example.com/ok"),
    (5, "http://192.168.0.1:8080/admin"),
    (6, "https://casino-winner.biz/free-POKER-now"),
    (7, "not a url at all"),
    (8, "https://shop.example.org:443/cart/items/view"),
]


def _url_df(spark):
    return spark.createDataFrame(URLS, ["doc_id", "url"])


def test_url_features(spark):
    from opencosmo_spark.pipeline.web import url_features

    out = (
        url_features(_url_df(spark))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "url_host"] == "sub.example.com"
    assert out.loc[1, "url_domain"] == "example.com"
    assert out.loc[3, "url_domain"] == "bbc.co.uk"  # compound ccTLD
    assert out.loc[3, "url_tld"] == "uk"
    assert out.loc[5, "url_is_ip"] and out.loc[5, "url_domain"] == "192.168.0.1"
    assert out.loc[5, "url_tld"] is None
    assert out.loc[8, "url_host"] == "shop.example.org"  # port stripped
    assert out.loc[8, "url_path_depth"] == 3
    assert out.loc[0, "url_path_depth"] == 2


def test_url_filter_domain_suffix_and_patterns(spark):
    from opencosmo_spark.pipeline.web import url_filter

    df = _url_df(spark)
    kept = url_filter(df, block_domains=["example.com"]).toPandas()
    # blocks the apex and every subdomain; ample.com and example.org
    # survive (label-aligned matching)
    assert sorted(kept.doc_id) == [2, 3, 5, 6, 7, 8]
    # allowlist punches through the block
    kept = url_filter(
        df,
        block_domains=["example.com"],
        allow_domains=["good.example.com"],
    ).toPandas()
    assert sorted(kept.doc_id) == [2, 3, 4, 5, 6, 7, 8]
    # patterns: case-insensitive over the whole URL
    kept = url_filter(df, block_patterns=[r"poker", r"casino"]).toPandas()
    assert 6 not in set(kept.doc_id) and len(kept) == len(URLS) - 1
    # unparseable rows survive by default, drop on request
    kept = url_filter(
        df, block_domains=["example.com"], drop_unparseable=True
    ).toPandas()
    assert 7 not in set(kept.doc_id)


def test_url_filter_dataframe_blocklist_matches_list_path(spark):
    from opencosmo_spark.pipeline.web import url_filter

    df = _url_df(spark)
    blk = ["example.com", "bbc.co.uk"]
    want = sorted(
        url_filter(df, block_domains=blk).toPandas().doc_id
    )
    blk_df = spark.createDataFrame([(d,) for d in blk], ["domain"])
    got = url_filter(df, block_domains=blk_df, id_col="doc_id").toPandas()
    assert sorted(got.doc_id) == want
    assert sorted(got.columns) == ["doc_id", "url"]
    # allowlist applies on the DataFrame path too
    got = url_filter(
        df,
        block_domains=blk_df,
        allow_domains=["good.example.com"],
        id_col="doc_id",
    ).toPandas()
    assert 4 in set(got.doc_id)
    # synthetic-id fallback (no id_col) returns the same survivors
    got = url_filter(df, block_domains=blk_df).toPandas()
    assert sorted(got.doc_id) == want


def test_curate_corpus_url_gate(spark):
    from opencosmo_spark.pipeline import curate_corpus

    rows = [
        (0, "https://example.com/a", "Good clean prose that passes the gate easily."),
        (1, "https://spam.biz/casino", "Good clean prose that also reads fine here."),
        (2, "https://other.org/b", "Completely fine document text for the pipeline."),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url", "text"])
    curated, counts = curate_corpus(
        df,
        min_quality=0.0,
        min_tokens=2,
        url_block_domains=["spam.biz"],
    )
    assert counts["url_gate"] == 2
    assert sorted(r.doc_id for r in curated.collect()) == [0, 2]
    # blocklist given but no url column -> loud failure
    import pytest as _pytest

    with _pytest.raises(ValueError, match="url"):
        curate_corpus(
            df.drop("url"), url_block_domains=["spam.biz"], min_quality=0.0
        )


def test_read_warc_stream_matches_batch(spark, tmp_path):
    from opencosmo_spark.pipeline.web import read_warc_stream
    from opencosmo_spark.streaming.events import run_stream_to_memory

    src = tmp_path / "crawl"
    src.mkdir()
    (src / "seg-00.warc").write_bytes(_archive())
    (src / "seg-01.warc.gz").write_bytes(gzip.compress(_archive()))

    stream = read_warc_stream(
        spark, str(src), max_files_per_trigger=1
    )
    assert stream.isStreaming
    got = run_stream_to_memory(stream, "warc_stream_t").toPandas()
    want = read_warc(spark, str(src)).toPandas()
    key = ["source_file", "record_id"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert got[key + ["warc_type", "http_status"]].equals(
        want[key + ["warc_type", "http_status"]]
    )
    assert [bytes(b) for b in got.payload] == [bytes(b) for b in want.payload]
    # the composition: streaming WARC -> documents stays streaming
    docs = warc_to_documents(
        read_warc_stream(spark, str(src))
    )
    assert docs.isStreaming
    out = run_stream_to_memory(docs, "warc_docs_t").toPandas()
    assert len(out) == 4  # 2 docs x 2 segment files


def test_url_filter_applies_to_streams(spark, tmp_path):
    """The list-path URL gate is a pure scan filter, so it must
    compose with the streaming WARC reader unchanged."""
    from opencosmo_spark.pipeline.web import read_warc_stream, url_filter
    from opencosmo_spark.streaming.events import run_stream_to_memory

    src = tmp_path / "crawl"
    src.mkdir()
    (src / "seg.warc").write_bytes(_archive())
    docs = warc_to_documents(read_warc_stream(spark, str(src)))
    gated = url_filter(docs, block_domains=["example.com"])
    assert gated.isStreaming
    out = run_stream_to_memory(gated, "url_gate_stream_t").toPandas()
    assert len(out) == 0  # both surviving docs are on example.com
    allow = url_filter(
        docs,
        block_domains=["example.com"],
        allow_domains=["example.com"],
    )
    out2 = run_stream_to_memory(allow, "url_gate_stream_t2").toPandas()
    assert len(out2) == 2


def test_split_http_response_chunked_and_compressed():
    """Crawl archives store response bytes verbatim: chunked framing
    and content-encoding must decode to the true body."""
    body = b"Hello chunked world of web archives"
    chunked = (
        b"%x\r\n%s\r\n" % (10, body[:10])
        + b"%x\r\n%s\r\n" % (len(body) - 10, body[10:])
        + b"0\r\n\r\n"
    )
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n" + chunked
    )
    status, ctype, got = split_http_response(payload)
    assert (status, got) == (200, body)
    # chunk extensions after ';' are ignored per RFC 9112
    ext = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"5;name=v\r\nabcde\r\n0\r\n\r\n"
    )
    assert split_http_response(ext)[2] == b"abcde"
    # malformed chunk framing: body passes through unmodified
    bad = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"ZZ\r\nnot hex"
    )
    assert split_http_response(bad)[2] == b"ZZ\r\nnot hex"
    # gzip content-encoding inflates; misdeclared gzip passes through
    gz = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
        + gzip.compress(body)
    )
    assert split_http_response(gz)[2] == body
    lie = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nplain"
    assert split_http_response(lie)[2] == b"plain"
    # chunked + gzip stack (decode order: transfer then content)
    both = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n"
    )
    z = gzip.compress(body)
    both += b"%x\r\n%s\r\n0\r\n\r\n" % (len(z), z)
    assert split_http_response(both)[2] == body
    # deflate (zlib-wrapped and raw)
    import zlib as _z

    raw_co = _z.compressobj(wbits=-15)
    raw_blob = raw_co.compress(body) + raw_co.flush()
    for blob in (_z.compress(body), raw_blob):
        d = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n" + blob
        )
        assert split_http_response(d)[2] == body


def test_url_host_fqdn_trailing_dot(spark):
    from opencosmo_spark.pipeline.web import url_filter, url_host

    df = spark.createDataFrame(
        [(0, "https://Example.COM./a"), (1, "https://h.example.com:8443/b")],
        ["doc_id", "url"],
    )
    hosts = [r[0] for r in df.select(url_host("url")).collect()]
    assert hosts == ["example.com", "h.example.com"]
    kept = url_filter(df, block_domains=["example.com"]).count()
    assert kept == 0  # both match despite dot / port / case


ARTICLE_HTML = """<html><head><title>T</title>
<script>var nav = "<p>fake</p>";</script>
<style>.x{color:red}</style></head><body>
<nav><ul>
<li><a href="/">Home</a></li><li><a href="/about">About us</a></li>
<li><a href="/contact">Contact</a></li><li><a href="/shop">Shop</a></li>
</ul></nav>
<div class="sidebar">
<p><a href="/r1">Related story one</a> <a href="/r2">Related two</a>
<a href="/r3">Related three</a></p>
</div>
<article>
<h2>The actual headline</h2>
<p>This is the first real paragraph of the article body with plenty of
genuine prose words that a reader actually came to this page for, and
it even cites <a href="/src">one source</a> inline without becoming a
link farm.</p>
<p>Second paragraph continues the long-form discussion with more
sentences of substantive content so the word count stays comfortably
above any threshold used by the classifier.</p>
</article>
<footer><p><a href="/tos">Terms</a> | <a href="/priv">Privacy</a> |
Copyright 2024</p></footer>
</body></html>"""


def test_html_main_text_drops_boilerplate(spark):
    """The boilerplate-block classifier: nav menus, link-farm
    sidebars, and footers (short, link-dense) are dropped; article
    prose (long, link-sparse) survives, including the heading rescued
    by the neighbor rule; an inline citation does NOT disqualify a
    long paragraph."""
    from opencosmo_spark.pipeline import html_main_text

    df = spark.createDataFrame([(0, ARTICLE_HTML)], ["i", "html"])
    got = html_main_text(df).first()["main_text"]
    assert "first real paragraph" in got
    assert "Second paragraph continues" in got
    assert "one source" in got          # inline link text kept
    assert "Home" not in got            # nav gone
    assert "Related story one" not in got  # sidebar gone
    assert "Terms" not in got and "Privacy" not in got  # footer gone
    assert "fake" not in got and "color:red" not in got
    # headline is short but sandwiched next to content -> rescued
    assert "The actual headline" in got

    # totality: empty / None / garbage never raise, yield ""
    edge = spark.createDataFrame(
        [(1, ""), (2, None), (3, "<<<>>> not html & junk")],
        ["i", "html"],
    )
    vals = [r["main_text"] for r in html_main_text(edge).collect()]
    assert all(isinstance(v, str) for v in vals)

    # link-farm-only page -> empty string (the quality gate's job)
    farm = "<body><p>" + " ".join(
        f'<a href="/{i}">link {i}</a>' for i in range(30)
    ) + "</p></body>"
    assert html_main_text(
        spark.createDataFrame([(0, farm)], ["i", "html"])
    ).first()["main_text"] == ""


def test_warc_to_documents_main_extraction(spark, tmp_path):
    """extract='main' runs the block classifier on HTML responses and
    passes WET plain text through untouched; extract mode validation
    is loud."""
    (tmp_path / "seg.warc").write_bytes(_archive())
    basic = warc_to_documents(read_warc(spark, str(tmp_path))).toPandas()
    main = warc_to_documents(
        read_warc(spark, str(tmp_path)), extract="main"
    ).toPandas()
    # same documents survive (the fixture page is all prose), WET
    # passthrough identical
    assert set(main.url) <= set(basic.url)
    wet = main.set_index("url").loc["http://example.com/wet", "text"]
    assert wet == "Pre-extracted plain text.\nSecond line."
    import pytest as _pytest

    with _pytest.raises(ValueError, match="extract"):
        warc_to_documents(read_warc(spark, str(tmp_path)), extract="x")


def test_charset_faithful_decoding(spark, tmp_path):
    """charset='faithful': legacy-charset pages decode as their real
    text (header param, or <meta charset> sniff, HTML5 latin-1 ->
    cp1252 aliasing), where the default JVM cast shows replacement
    characters; unknown labels fall back to UTF-8-replace."""
    cafe_1252 = "<p>café — déjà vu</p>".encode("cp1252")
    sjis_body = "<p>日本語</p>".encode("shift_jis")
    meta_page = (
        b'<html><head><meta charset="windows-1252"></head><body><p>'
        + "naïve".encode("cp1252")
        + b"</p></body></html>"
    )
    archive = (
        _record(
            b"response", b"1001", b"http://ex.com/latin",
            _http(b"200 OK", b"text/html; charset=iso-8859-1", cafe_1252),
        )
        + _record(
            b"response", b"1002", b"http://ex.com/sjis",
            _http(b"200 OK", b"text/html; charset=Shift_JIS", sjis_body),
        )
        + _record(
            b"response", b"1003", b"http://ex.com/meta",
            _http(b"200 OK", b"text/html", meta_page),
        )
        + _record(
            b"response", b"1004", b"http://ex.com/bogus",
            _http(b"200 OK", b"text/html; charset=klingon-8", b"<p>ok</p>"),
        )
    )
    (tmp_path / "cs.warc").write_bytes(archive)
    recs = read_warc(spark, str(tmp_path))

    faithful = warc_to_documents(recs, charset="faithful").toPandas()
    by_url = faithful.set_index("url")["text"]
    assert by_url["http://ex.com/latin"] == "café — déjà vu"
    assert by_url["http://ex.com/sjis"] == "日本語"
    assert by_url["http://ex.com/meta"] == "naïve"
    assert by_url["http://ex.com/bogus"] == "ok"

    # the default JVM cast mangles the legacy pages (that's the point)
    jvm = warc_to_documents(recs).toPandas().set_index("url")["text"]
    assert "café" not in jvm["http://ex.com/latin"]
    assert "�" in jvm["http://ex.com/latin"]

    # composes with main-content extraction
    both = warc_to_documents(
        recs, charset="faithful", extract="main"
    ).toPandas()
    assert set(both.url) <= set(faithful.url)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="charset"):
        warc_to_documents(recs, charset="nope")


def test_sniff_charset_unit():
    from opencosmo_spark.pipeline.web import _sniff_charset

    assert _sniff_charset("text/html; charset=UTF-8", b"") == "utf-8"
    assert _sniff_charset("text/html; charset=latin-1", b"") == "cp1252"
    assert _sniff_charset("text/html; charset=gb2312", b"") == "gb18030"
    assert _sniff_charset(None, b'<meta charset="euc-jp">') == "euc-jp"
    assert (
        _sniff_charset(
            None,
            b'<meta http-equiv="Content-Type" '
            b'content="text/html; charset=big5">',
        )
        == "big5"
    )
    assert _sniff_charset(None, b"no meta here") == "utf-8"
    assert _sniff_charset("text/html; charset=not-a-codec", b"") == "utf-8"


def test_canonical_url_normalization(spark):
    """RFC 3986 syntax normalization + tracking-param strip, against
    a hand-computed oracle; same-resource variants collapse to one
    canonical key, different resources stay distinct."""
    from opencosmo_spark.pipeline import canonical_url

    cases = [
        # (input, expected canonical)
        ("HTTP://Example.COM:80/a/b?x=1#frag", "http://example.com/a/b?x=1"),
        ("https://example.com:443/", "https://example.com/"),
        ("https://example.com", "https://example.com/"),
        ("https://example.com.:8443/p", "https://example.com:8443/p"),
        (
            "https://ex.com/p?utm_source=tw&b=2&a=1&fbclid=XYZ",
            "https://ex.com/p?a=1&b=2",
        ),
        ("https://ex.com/p?utm_campaign=x", "https://ex.com/p"),
        ("https://ex.com/p?b=2&a=1", "https://ex.com/p?a=1&b=2"),
        ("ftp://ex.com/file", None),          # non-http(s)
        ("not a url", None),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], ["i", "url"]
    ).select("i", canonical_url("url").alias("c"))
    got = {r["i"]: r["c"] for r in df.collect()}
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (u, got[i], want)

    # dedup collapse: all tracked/reordered variants share one key
    variants = [
        "https://ex.com/p?a=1&b=2",
        "https://EX.com/p?b=2&a=1",
        "https://ex.com/p?a=1&utm_medium=mail&b=2#top",
        "https://ex.com:443/p?a=1&b=2",
    ]
    vdf = spark.createDataFrame([(v,) for v in variants], ["url"])
    assert (
        vdf.select(canonical_url("url").alias("c")).distinct().count() == 1
    )


def test_warc_stream_main_and_faithful_compose(spark, tmp_path):
    """The round-11 ingestion options are stateless, so they compose
    with the WARC stream unchanged: extract='main' +
    charset='faithful' on a stream equals the batch run row-for-row."""
    from opencosmo_spark.pipeline.web import read_warc_stream
    from opencosmo_spark.streaming.events import run_stream_to_memory

    cafe = "<p>café article prose with plenty of words to keep the "
    page = (cafe + "classifier happy and the block long enough</p>").encode(
        "cp1252"
    )
    archive = _archive() + _record(
        b"response", b"2001", b"http://ex.com/legacy",
        _http(b"200 OK", b"text/html; charset=latin-1", page),
    )
    src = tmp_path / "crawl_m"
    src.mkdir()
    (src / "seg-00.warc").write_bytes(archive)

    docs = warc_to_documents(
        read_warc_stream(spark, str(src)),
        extract="main",
        charset="faithful",
    )
    assert docs.isStreaming
    got = (
        run_stream_to_memory(docs, "warc_docs_mf")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = (
        warc_to_documents(
            read_warc(spark, str(src)), extract="main", charset="faithful"
        )
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert got[["url", "text"]].equals(want[["url", "text"]])
    legacy = got.set_index("url")["text"]["http://ex.com/legacy"]
    assert legacy.startswith("café article prose")
