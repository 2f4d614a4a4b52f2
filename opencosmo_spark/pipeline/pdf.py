"""PDF text extraction — stdlib-only, Spark-batched.

PDFs are a major pretraining text source; this module lets the corpus
surface ingest them the same way ``web.warc_to_documents`` ingests
crawls: files parallelize across tasks via the ``binaryFile`` source,
extraction happens executor-side in one Arrow-batched ``mapInPandas``
pass, payload bytes never shuffle, and downstream (quality gates,
dedup, decontamination) is ordinary column work on the result.

The extractor itself is a pure-python pass over the public PDF format
(ISO 32000 / the classic PDF 1.x layout): object scan, zlib
FlateDecode of content streams, page-tree walk for page order, and a
content-stream tokenizer over the text operators (``BT/ET``, ``Tj``,
``TJ``, ``'``, ``"``, ``Td/TD/T*/Tm``) with layout-order line
assembly. Escapes in literal strings and hex strings are decoded per
spec; bytes map through latin-1 (exact for the standard simple-font
encodings on fixtures and most western PDFs; embedded CID fonts with
``/Identity-H`` CMaps would need the font's ToUnicode table — out of
scope, counted honestly).

The ``extractor`` column is the honest per-file ledger (the
``decoder_report`` idiom from ``multimodal``):

- ``pdf-text``      text extracted
- ``pdf-encrypted`` ``/Encrypt`` in a trailer: content streams are
  ciphertext, nothing readable without the key
- ``pdf-scanned``   valid PDF, no text operators, page images present
  (scanned document — needs OCR, which is out of scope)
- ``pdf-no-text``   valid PDF, no text operators, no page images
- ``stub``          not parseable as a PDF

Reference parity note: the reference engine has no PDF path; this is
part of the beyond-reference corpus-ingestion surface (SURVEY.md
LLM-pipeline addendum), same posture as WARC/WebDataset ingestion.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

__all__ = ["extract_pdf_text", "pdf_to_documents"]

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


def _find_objects(data: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """Scan for ``N G obj ... endobj`` spans. Returns
    ``{obj_num: (body_before_stream, raw_stream_bytes_or_None)}``.
    A linear scan instead of the xref table: xref offsets are wrong
    in incrementally-updated / mildly corrupt files far more often
    than the obj/endobj framing is, and the scan is one pass."""
    objects: dict[int, tuple[bytes, bytes | None]] = {}
    for m in _OBJ_RE.finditer(data):
        start = m.end()
        end = data.find(b"endobj", start)
        if end < 0:
            continue
        body = data[start:end]
        stream = None
        sm = re.search(rb"stream\r?\n", body)
        if sm is not None:
            head = body[: sm.start()]
            rest = body[sm.end():]
            se = rest.rfind(b"endstream")
            if se >= 0:
                # /Length may be an indirect ref; the endstream frame
                # is authoritative for this scan
                stream = rest[:se].rstrip(b"\r\n")
            body = head
        objects[int(m.group(1))] = (body, stream)
    return objects


def _inflate(head: bytes, stream: bytes) -> bytes | None:
    """Apply the object's /Filter to its raw stream bytes. Only
    FlateDecode (the overwhelmingly dominant filter for content
    streams) is implemented; anything else returns None and the file
    falls to the honest ledger."""
    filt = re.search(rb"/Filter\s*(\[?)\s*/(\w+)", head)
    if filt is None:
        return stream
    if filt.group(2) != b"FlateDecode":
        return None
    try:
        return zlib.decompress(stream)
    except zlib.error:
        return None


def _page_content_streams(data: bytes, objects) -> list[bytes] | None:
    """Walk Catalog -> /Pages -> /Kids to list page objects in
    document order, then collect each page's /Contents stream(s),
    inflated. Falls back to file order over /Type /Page objects when
    the tree is unresolvable. Returns None when the file has no page
    objects at all."""
    pages: list[int] = []

    def walk(num: int, depth: int = 0) -> None:
        if depth > 64 or num not in objects:
            return
        head, _ = objects[num]
        if re.search(rb"/Type\s*/Pages\b", head):
            kids = re.search(rb"/Kids\s*\[([^\]]*)\]", head)
            if kids:
                for km in re.finditer(rb"(\d+)\s+\d+\s+R", kids.group(1)):
                    walk(int(km.group(1)), depth + 1)
        elif re.search(rb"/Type\s*/Page\b", head):
            pages.append(num)

    root = None
    for num, (head, _) in objects.items():
        if re.search(rb"/Type\s*/Catalog\b", head):
            m = re.search(rb"/Pages\s+(\d+)\s+\d+\s+R", head)
            if m:
                root = int(m.group(1))
            break
    if root is not None:
        walk(root)
    if not pages:  # damaged tree: file order
        pages = [
            num
            for num, (head, _) in sorted(objects.items())
            if re.search(rb"/Type\s*/Page\b", head)
        ]
    if not pages:
        return None

    streams: list[bytes] = []
    for num in pages:
        head, _ = objects[num]
        refs: list[int] = []
        arr = re.search(rb"/Contents\s*\[([^\]]*)\]", head)
        if arr:
            refs = [
                int(m.group(1))
                for m in re.finditer(rb"(\d+)\s+\d+\s+R", arr.group(1))
            ]
        else:
            one = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", head)
            if one:
                refs = [int(one.group(1))]
        page_parts = []
        for r in refs:
            got = objects.get(r)
            if got is None or got[1] is None:
                continue
            inflated = _inflate(got[0], got[1])
            if inflated is not None:
                page_parts.append(inflated)
        # per spec, split /Contents arrays concatenate into ONE stream
        streams.append(b"\n".join(page_parts))
    return streams


_ESCAPES = {
    ord("n"): "\n", ord("r"): "\r", ord("t"): "\t", ord("b"): "\b",
    ord("f"): "\f", ord("("): "(", ord(")"): ")", ord("\\"): "\\",
}


def _literal_string(s: bytes, i: int) -> tuple[str, int]:
    """Parse a ``(...)`` literal string starting at the open paren.
    Handles nested parens, the escape set, and octal escapes."""
    out: list[str] = []
    depth = 1
    i += 1
    while i < len(s) and depth:
        c = s[i]
        if c == 0x5C and i + 1 < len(s):  # backslash
            nxt = s[i + 1]
            if 0x30 <= nxt <= 0x37:  # octal: up to 3 digits
                j = i + 1
                code = 0
                while j < len(s) and j < i + 4 and 0x30 <= s[j] <= 0x37:
                    code = code * 8 + (s[j] - 0x30)
                    j += 1
                out.append(chr(code & 0xFF))
                i = j
                continue
            if nxt in (0x0A, 0x0D):  # line continuation
                i += 2
                if nxt == 0x0D and i < len(s) and s[i] == 0x0A:
                    i += 1
                continue
            out.append(_ESCAPES.get(nxt, chr(nxt)))
            i += 2
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if not depth:
                i += 1
                break
        if depth:
            out.append(chr(c))
        i += 1
    return "".join(out), i


def _hex_string(s: bytes, i: int) -> tuple[str, int]:
    end = s.find(b">", i + 1)
    if end < 0:
        return "", len(s)
    hx = bytes(ch for ch in s[i + 1 : end] if not chr(ch).isspace())
    if len(hx) % 2:
        hx += b"0"  # spec: odd final digit implies trailing 0
    try:
        raw = bytes.fromhex(hx.decode("ascii"))
    except ValueError:
        return "", end + 1
    return raw.decode("latin-1"), end + 1


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")


def _content_text(stream: bytes) -> str:
    """Tokenize ONE content stream and assemble the shown text in
    layout order: ``Tj``/``TJ``/``'``/``\"`` emit onto the current
    line; ``Td``/``TD`` with a y move, ``T*``, and ``Tm`` with a y
    change start a new line; a big TJ kern gap becomes a space (the
    standard word-split heuristic for kerned text)."""
    lines: list[list[str]] = [[]]
    stack: list = []  # operands since the last operator
    last_ty: float | None = None
    i, n = 0, len(stream)

    def show(txt: str) -> None:
        if txt:
            lines[-1].append(txt)

    def newline() -> None:
        if lines[-1]:
            lines.append([])

    while i < n:
        c = stream[i]
        if c in b" \t\r\n\x00":
            i += 1
        elif c == 0x25:  # % comment to EOL
            j = stream.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c == 0x28:  # (
            txt, i = _literal_string(stream, i)
            stack.append(txt)
        elif c == 0x3C:  # < or <<
            if stream[i : i + 2] == b"<<":  # dict (e.g. inline image)
                j = stream.find(b">>", i + 2)
                i = n if j < 0 else j + 2
            else:
                txt, i = _hex_string(stream, i)
                stack.append(txt)
        elif c == 0x5B:  # [ TJ array: strings + kern numbers
            parts: list = []
            i += 1
            while i < n and stream[i] != 0x5D:
                cc = stream[i]
                if cc == 0x28:
                    txt, i = _literal_string(stream, i)
                    parts.append(txt)
                elif cc == 0x3C:
                    txt, i = _hex_string(stream, i)
                    parts.append(txt)
                else:
                    m = _NUM_RE.match(stream, i)
                    if m:
                        parts.append(float(m.group()))
                        i = m.end()
                    else:
                        i += 1
            i += 1
            stack.append(parts)
        elif c == 0x2F:  # /Name
            m = re.match(rb"/[^\s()<>\[\]{}/%]*", stream[i:])
            stack.append(m.group().decode("latin-1"))
            i += m.end()
        else:
            m = _NUM_RE.match(stream, i)
            if m:
                stack.append(float(m.group()))
                i = m.end()
                continue
            om = re.match(rb"[A-Za-z'\"*]+", stream[i:])
            if om is None:
                i += 1
                continue
            op = om.group()
            i += om.end()
            if op == b"BI":  # inline image: skip ID ... EI payload
                j = stream.find(b"EI", i)
                i = n if j < 0 else j + 2
            elif op == b"Tj" and stack and isinstance(stack[-1], str):
                show(stack[-1])
            elif op == b"TJ" and stack and isinstance(stack[-1], list):
                for part in stack[-1]:
                    if isinstance(part, str):
                        show(part)
                    elif part < -180:  # big kern gap = word space
                        show(" ")
            elif op in (b"'", b'"'):
                newline()
                if stack and isinstance(stack[-1], str):
                    show(stack[-1])
            elif op in (b"Td", b"TD"):
                if len(stack) >= 2 and isinstance(stack[-1], float):
                    if stack[-1] != 0:
                        newline()
            elif op == b"T*":
                newline()
            elif op == b"Tm":
                if len(stack) >= 6 and isinstance(stack[-1], float):
                    ty = stack[-1]
                    if last_ty is not None and ty != last_ty:
                        newline()
                    last_ty = ty
            elif op == b"BT":
                last_ty = None
            stack = []
    # segments concatenate verbatim: shown strings carry their own
    # spaces, and the TJ kern heuristic inserts the word gaps
    return "\n".join("".join(ln) for ln in lines if ln)


def extract_pdf_text(data: bytes | None) -> tuple[str, int, str]:
    """Extract text from one PDF payload. Returns
    ``(text, n_pages, extractor)`` — see the module docstring for the
    extractor ledger values. Never raises on dirty input."""
    if data is None or not data[:1024].startswith(b"%PDF-"):
        # spec allows junk before %PDF- only within the first 1024B
        head = data.find(b"%PDF-", 0, 1024) if data else -1
        if head < 0:
            return "", 0, "stub"
        data = data[head:]
    try:
        objects = _find_objects(data)
        if not objects:
            return "", 0, "stub"
        if re.search(rb"/Encrypt\s+\d+\s+\d+\s+R", data) or re.search(
            rb"/Encrypt\s*<<", data
        ):
            n_pages = len(
                [1 for h, _ in objects.values()
                 if re.search(rb"/Type\s*/Page\b", h)]
            )
            return "", n_pages, "pdf-encrypted"
        streams = _page_content_streams(data, objects)
        if streams is None:
            return "", 0, "stub"
        n_pages = len(streams)
        pages = [_content_text(s) for s in streams if s]
        text = "\n\n".join(p for p in pages if p).strip()
        if text:
            return text, n_pages, "pdf-text"
        has_image = any(
            re.search(rb"/Subtype\s*/Image\b", h)
            for h, _ in objects.values()
        )
        return "", n_pages, "pdf-scanned" if has_image else "pdf-no-text"
    except Exception:  # noqa: BLE001 - any dirty payload -> stub
        return "", 0, "stub"


def pdf_to_documents(
    df: DataFrame,
    payload_col: str = "content",
    path_col: str = "path",
    min_chars: int = 1,
) -> DataFrame:
    """PDF corpus ingestion: ``binaryFile`` rows in, one document row
    out per file — ``(doc_id, url, text, n_pages, extractor)``, the
    same shape ``warc_to_documents`` feeds ``curate_corpus``. Rows
    whose extractor produced fewer than ``min_chars`` characters are
    KEPT with their honest extractor label so the per-format ledger
    (``multimodal.decoder_report(out, mime_col='extractor')`` or a
    plain groupBy) can account for them; filter on
    ``extractor = 'pdf-text'`` for the training-text slice.

    One Arrow-batched ``mapInPandas`` pass; payload bytes never
    shuffle (extraction is row-local, file-per-task from the
    binaryFile source), matching the WARC/image/audio ingestion
    posture.
    """
    from .dedup import md5_lane

    out_schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("n_pages", T.IntegerType()),
            T.StructField("extractor", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows = [
                extract_pdf_text(p) for p in pdf_batch[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "url": pdf_batch[path_col],
                    "text": [t for t, _, _ in rows],
                    "n_pages": [n for _, n, _ in rows],
                    "extractor": [e for _, _, e in rows],
                }
            )

    extracted = df.select(path_col, payload_col).mapInPandas(
        run, out_schema
    )
    return extracted.select(
        md5_lane(F.col("url")).alias("doc_id"),
        "url",
        F.when(F.length("text") >= min_chars, F.col("text"))
        .otherwise(F.lit(""))
        .alias("text"),
        "n_pages",
        "extractor",
    )
