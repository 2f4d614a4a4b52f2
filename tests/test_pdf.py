"""PDF text extraction: differential tests on generated fixtures.

The builder assembles structurally valid PDF 1.4 files (catalog ->
page tree -> pages -> content streams, correct xref + trailer) so the
extractor is exercised against the real format, not against its own
assumptions.
"""

import zlib

import pytest
from pyspark.sql import functions as F

from opencosmo_spark.pipeline.pdf import extract_pdf_text, pdf_to_documents


def make_pdf(page_contents, compress=False, encrypted=False, image_page=False):
    """Build a minimal valid PDF. ``page_contents``: list of content-
    stream byte strings, one per page."""
    objs = {}  # num -> bytes (full object body, without N 0 obj/endobj)
    n_pages = len(page_contents)
    kid_nums = [4 + 2 * i for i in range(n_pages)]
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    kids = b" ".join(b"%d 0 R" % k for k in kid_nums)
    objs[2] = (
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    )
    objs[3] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>"
    )
    for i, content in enumerate(page_contents):
        pnum, cnum = 4 + 2 * i, 5 + 2 * i
        extra = b" /Resources << /XObject << /Im0 90 0 R >> >>" if image_page else b""
        objs[pnum] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents %d 0 R /Resources << /Font << /F1 3 0 R >> >>" % cnum
            + extra
            + b" >>"
        )
        body = zlib.compress(content) if compress else content
        filt = b"/Filter /FlateDecode " if compress else b""
        objs[cnum] = (
            b"<< " + filt + b"/Length %d >>\nstream\n" % len(body)
            + body
            + b"\nendstream"
        )
    if image_page:
        objs[90] = (
            b"<< /Type /XObject /Subtype /Image /Width 2 /Height 2 "
            b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length 4 >>"
            b"\nstream\n\x00\x01\x02\x03\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (max(objs) + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, max(objs) + 1):
        out += b"%010d 00000 n \n" % offsets.get(num, 0)
    enc = b" /Encrypt 99 0 R" if encrypted else b""
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R" % (max(objs) + 1)
        + enc
        + b" >>\nstartxref\n%d\n%%%%EOF\n" % xref_at
    )
    return bytes(out)


def test_single_page_tj():
    pdf = make_pdf([b"BT /F1 12 Tf 72 720 Td (Hello World) Tj ET"])
    text, n_pages, ex = extract_pdf_text(pdf)
    assert (text, n_pages, ex) == ("Hello World", 1, "pdf-text")


def test_flate_tj_array_kerning():
    # kern gaps < -180 become word spaces, small kerns vanish
    pdf = make_pdf(
        [b"BT /F1 12 Tf [(Hel) -50 (lo) -300 (World)] TJ ET"],
        compress=True,
    )
    text, n_pages, ex = extract_pdf_text(pdf)
    assert (text, n_pages, ex) == ("Hello World", 1, "pdf-text")


def test_multipage_tree_order_and_lines():
    pdf = make_pdf(
        [
            b"BT 72 720 Td (First page) Tj 0 -14 Td (second line) Tj ET",
            b"BT 72 720 Td (Second page) Tj ET",
        ]
    )
    text, n_pages, ex = extract_pdf_text(pdf)
    assert n_pages == 2 and ex == "pdf-text"
    assert text == "First page\nsecond line\n\nSecond page"


def test_escapes_hex_and_quote_ops():
    content = (
        rb"BT (a\(b\)c) Tj T* <48656C6C6F> Tj "
        rb"(line2) ' (oct\101al) Tj ET"
    )
    text, _, ex = extract_pdf_text(make_pdf([content]))
    assert ex == "pdf-text"
    assert text.splitlines() == ["a(b)c", "Hello", "line2octAal"]


def test_encrypted_ledger():
    pdf = make_pdf([b"BT (secret) Tj ET"], encrypted=True)
    text, n_pages, ex = extract_pdf_text(pdf)
    assert (text, n_pages, ex) == ("", 1, "pdf-encrypted")


def test_scanned_vs_no_text():
    scanned = make_pdf([b"q 612 0 0 792 0 0 cm /Im0 Do Q"], image_page=True)
    assert extract_pdf_text(scanned) == ("", 1, "pdf-scanned")
    empty = make_pdf([b"q Q"])
    assert extract_pdf_text(empty) == ("", 1, "pdf-no-text")


def test_not_a_pdf_is_stub():
    assert extract_pdf_text(b"GIF89a...")[2] == "stub"
    assert extract_pdf_text(None)[2] == "stub"
    assert extract_pdf_text(b"%PDF-1.4 truncated")[2] == "stub"


def test_junk_prefix_within_1024():
    pdf = b"\xef\xbb\xbfjunk header\n" + make_pdf([b"BT (x) Tj ET"])
    assert extract_pdf_text(pdf) == ("x", 1, "pdf-text")


def test_pdf_to_documents_binaryfile(spark, tmp_path):
    """End-to-end over the binaryFile source: one document row per
    file, honest extractor ledger, stable doc_id from the path."""
    d = tmp_path / "pdfs"
    d.mkdir()
    (d / "a.pdf").write_bytes(
        make_pdf([b"BT (alpha doc) Tj ET"], compress=True)
    )
    (d / "b.pdf").write_bytes(
        make_pdf([b"BT (secret) Tj ET"], encrypted=True)
    )
    (d / "c.pdf").write_bytes(b"not a pdf")
    src = spark.read.format("binaryFile").load(str(d))
    out = pdf_to_documents(src).toPandas()
    by_name = {u.rsplit("/", 1)[-1]: r for u, r in zip(out.url, out.itertuples())}
    assert by_name["a.pdf"].extractor == "pdf-text"
    assert by_name["a.pdf"].text == "alpha doc"
    assert by_name["b.pdf"].extractor == "pdf-encrypted"
    assert by_name["c.pdf"].extractor == "stub"
    assert out.doc_id.nunique() == 3

    # the ledger composes with the multimodal report idiom
    from opencosmo_spark.pipeline.multimodal import decoder_report

    rep = decoder_report(
        pdf_to_documents(src), mime_col="extractor", decoder_col="extractor"
    )
    assert rep.count() == 3


def test_pdf_documents_compose_with_curate(spark, tmp_path):
    """pdf_to_documents output slots into curate_corpus exactly like
    warc_to_documents: pdf-text rows with enough quality survive,
    encrypted/stub rows (empty text) fall at the quality gate."""
    from opencosmo_spark.pipeline.curate import curate_corpus

    d = tmp_path / "pdfs2"
    d.mkdir()
    good = (
        b"BT (The quick brown fox jumps over the lazy dog. "
        b"It then naps in the warm afternoon sun for hours.) Tj ET"
    )
    (d / "good.pdf").write_bytes(make_pdf([good]))
    (d / "enc.pdf").write_bytes(
        make_pdf([b"BT (hidden) Tj ET"], encrypted=True)
    )
    src = spark.read.format("binaryFile").load(str(d))
    docs = pdf_to_documents(src).select("doc_id", "url", "text")
    kept, counts = curate_corpus(docs, min_tokens=5)
    rows = kept.toPandas()
    assert len(rows) == 1
    assert rows.url.iloc[0].endswith("good.pdf")
