"""PDF text extraction — stdlib-only, Spark-batched.

PDFs are a major pretraining text source; this module lets the corpus
surface ingest them the same way ``web.warc_to_documents`` ingests
crawls: files parallelize across tasks via the ``binaryFile`` source,
extraction happens executor-side in one Arrow-batched ``mapInPandas``
pass, payload bytes never shuffle, and downstream (quality gates,
dedup, decontamination) is ordinary column work on the result.

The extractor itself is a pure-python pass over the public PDF format
(ISO 32000 / the classic PDF 1.x layout): object scan with PDF 1.5+
object-stream (``/ObjStm``) expansion, zlib FlateDecode of content
streams, page-tree walk for page order, and a content-stream
tokenizer over the text operators (``BT/ET``, ``Tj``, ``TJ``, ``'``,
``"``, ``Td/TD/T*/Tm``, ``Tf``) with layout-order line assembly.
Escapes in literal strings and hex strings are decoded per spec.
Simple-font strings map through latin-1 (exact for the standard
encodings); CID-keyed fonts (LaTeX/Word embedded subsets, Identity-H)
resolve through their ``/ToUnicode`` CMap — ``bfchar``, both
``bfrange`` forms, 1- and 2-byte codespaces — with ``Tf`` switching
the active map; unmapped glyph codes surface as U+FFFD rather than
silent garbage.

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
    than the obj/endobj framing is, and the scan is one pass.

    PDF 1.5+ object streams (``/Type /ObjStm``) are expanded: their
    FlateDecode payload holds ``N`` non-stream objects (catalog, page
    tree, pages — exactly the dictionaries the page walk needs) behind
    an ``(obj_num, offset)`` header table; each contained object joins
    the map unless a top-level object with the same number exists
    (incremental updates append replacements at top level)."""
    objects: dict[int, tuple[bytes, bytes | None]] = {}
    objstms: list[tuple[bytes, bytes]] = []
    consumed = 0  # end of the last fully-framed object: 'N G obj'
    # matches INSIDE a /Length-framed stream are data, not objects
    for m in _OBJ_RE.finditer(data):
        if m.start() < consumed:
            continue
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
            # a DIRECT /Length is authoritative (PDF 32000-1 §7.3.8.1)
            # — the byte-frame fallbacks below misframe a stream whose
            # compressed data happens to contain 'endobj'/'endstream'
            lm = re.search(rb"/Length\s+(\d+)(?!\s+\d+\s+R)", head)
            sabs = start + sm.end()  # absolute stream-data offset
            if lm is not None:
                ln = int(lm.group(1))
                tail = data[sabs + ln : sabs + ln + 16]
                if re.match(rb"\s{0,2}endstream", tail):
                    stream = data[sabs : sabs + ln]
                    end = data.find(b"endobj", sabs + ln)
                    if end < 0:
                        end = sabs + ln
            if stream is None:
                se = rest.rfind(b"endstream")
                if se < 0:
                    # first 'endobj' fell inside the stream data and
                    # /Length was absent/indirect: frame forward to
                    # the next 'endstream' in the file instead
                    se_abs = data.find(b"endstream", sabs)
                    if se_abs >= 0:
                        rest = data[sabs:se_abs]
                        se = len(rest)
                        end = data.find(b"endobj", se_abs)
                        if end < 0:
                            end = se_abs
                if se >= 0:
                    # Strip AT MOST the one EOL the spec puts before
                    # 'endstream' — a trailing data byte that happens
                    # to be 0x0A/0x0D (e.g. the last zlib checksum
                    # byte) must survive
                    stream = rest[:se]
                    if stream.endswith(b"\r\n"):
                        stream = stream[:-2]
                    elif stream.endswith((b"\n", b"\r")):
                        stream = stream[:-1]
            body = head
        objects[int(m.group(1))] = (body, stream)
        consumed = end
        if stream is not None and re.search(rb"/Type\s*/ObjStm\b", body):
            objstms.append((body, stream))
    for head, stream in objstms:
        for num, obody in _expand_objstm(head, stream):
            objects.setdefault(num, (obody, None))
    return objects


def _expand_objstm(head: bytes, stream: bytes):
    """Yield ``(obj_num, body_bytes)`` for each object inside one
    object stream. ``/N`` objects, ``/First`` = byte offset of the
    first object body; the header section is N pairs of integers
    ``obj_num offset`` (offset relative to First)."""
    n_m = re.search(rb"/N\s+(\d+)", head)
    f_m = re.search(rb"/First\s+(\d+)", head)
    if n_m is None or f_m is None:
        return
    inflated = _inflate(head, stream)
    if inflated is None:
        return
    n, first = int(n_m.group(1)), int(f_m.group(1))
    header = inflated[:first].split()
    if len(header) < 2 * n:
        return
    pairs = []
    try:
        for i in range(n):
            pairs.append((int(header[2 * i]), int(header[2 * i + 1])))
    except ValueError:
        return
    for i, (num, off) in enumerate(pairs):
        end = pairs[i + 1][1] if i + 1 < len(pairs) else len(inflated) - first
        yield num, inflated[first + off : first + end]


def _lzw_decode(data: bytes, early: int = 1) -> bytes | None:
    """PDF LZWDecode (ISO 32000 7.4.4): MSB-first variable-width
    codes, 9 -> 12 bits, clear=256, EOD=257, EarlyChange code-width
    bump (default 1)."""
    out = bytearray()
    table: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    size = 258
    width = 9
    prev: bytes | None = None
    bitpos = 0
    nbits = len(data) * 8
    while bitpos + width <= nbits:
        code = 0
        for _ in range(width):
            code = (code << 1) | (
                (data[bitpos >> 3] >> (7 - (bitpos & 7))) & 1
            )
            bitpos += 1
        if code == 257:  # EOD
            break
        if code == 256:  # clear table
            table = {i: bytes([i]) for i in range(256)}
            size = 258
            width = 9
            prev = None
            continue
        if code in table:
            entry = table[code]
        elif code == size and prev is not None:  # KwKwK
            entry = prev + prev[:1]
        else:
            return None
        out += entry
        if prev is not None:
            table[size] = prev + entry[:1]
            size += 1
        # PDF 7.4.4.2: the code width grows when the ENCODER adds
        # entry 2^width - EarlyChange (511/1023/2047 at the default
        # EarlyChange=1). The decoder's table lags the encoder's by
        # exactly one entry at each read position, so the DECODER
        # bumps one table-addition earlier: after adding entry 510,
        # size (next free) is 511 and 511 + 1 >= 512.
        if size + early >= (1 << width) and width < 12:
            width += 1
        prev = entry
    return bytes(out)


def _png_unpredict(data: bytes, columns: int, colors: int,
                   bpc: int) -> bytes | None:
    """Invert PNG row predictors (PDF Predictor >= 10 — common on
    ObjStm / xref streams)."""
    bpp = max(1, (colors * bpc + 7) // 8)
    stride = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytearray(stride)
    i = 0
    while i < len(data):
        ft = data[i]
        i += 1
        row = bytearray(data[i : i + stride])
        i += stride
        if len(row) < stride:
            row += bytes(stride - len(row))
        for x in range(stride):
            a = row[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ft == 1:
                row[x] = (row[x] + a) & 0xFF
            elif ft == 2:
                row[x] = (row[x] + b) & 0xFF
            elif ft == 3:
                row[x] = (row[x] + (a + b) // 2) & 0xFF
            elif ft == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (row[x] + pr) & 0xFF
            elif ft != 0:
                return None
        out += row
        prev = row
    return bytes(out)


def _decode_parms(head: bytes, n_filters: int) -> list[bytes | None]:
    """Per-filter /DecodeParms (or the /DP abbreviation) bodies,
    aligned with the /Filter chain. Handles BOTH spec forms: a single
    ``<<...>>`` dict (applies to the first filter) and the array form
    used with /Filter arrays — ``[null <</Predictor 12 ...>>]`` —
    where entry i parameterizes filter i (PDF 32000-1 §7.3.8.2)."""
    parms: list[bytes | None] = [None] * n_filters
    m = re.search(rb"/(?:DecodeParms|DP)\s*(<<|\[)", head)
    if m is None:
        return parms
    if m.group(1) == b"<<":
        dm = re.search(rb"/(?:DecodeParms|DP)\s*<<(.*?)>>", head, re.S)
        if dm and n_filters:
            # single-dict form: some writers pair one dict with a
            # filter ARRAY meaning "the filter that takes parms" —
            # replicate it (hex/85 filters ignore parms anyway)
            parms = [dm.group(1)] * n_filters
        return parms
    am = re.search(rb"/(?:DecodeParms|DP)\s*\[(.*?)\]", head, re.S)
    if am is None:
        return parms
    for i, em in enumerate(
        re.finditer(rb"null|<<(.*?)>>", am.group(1), re.S)
    ):
        if i >= n_filters:
            break
        if em.group(0) != b"null":
            parms[i] = em.group(1)
    return parms


def _predictor_parms(g: bytes | None) -> tuple[int, int, int, int, int]:
    """(predictor, columns, colors, bits-per-component, early-change)
    from one filter's parms dict body (defaults per the spec)."""
    if not g:
        return 0, 1, 1, 8, 1
    vals = []
    for key, dflt in ((rb"/Predictor", 0), (rb"/Columns", 1),
                      (rb"/Colors", 1), (rb"/BitsPerComponent", 8),
                      (rb"/EarlyChange", 1)):
        m = re.search(key + rb"\s+(\d+)", g)
        vals.append(int(m.group(1)) if m else dflt)
    return tuple(vals)  # type: ignore[return-value]


def _inflate(head: bytes, stream: bytes) -> bytes | None:
    """Apply the object's /Filter chain to its raw stream bytes:
    FlateDecode (+ optional PNG predictor from /DecodeParms),
    LZWDecode, ASCIIHexDecode, ASCII85Decode, and arrays chaining
    them — each filter paired with ITS OWN /DecodeParms entry when
    the array form is used. Unknown filters (DCTDecode, JBIG2, crypt
    filters) return None and the file falls to the honest ledger."""
    fm = re.search(rb"/Filter\s*(?:\[(.*?)\]|/([A-Za-z0-9]+))", head, re.S)
    if fm is None:
        return stream
    names = (
        re.findall(rb"/([A-Za-z0-9]+)", fm.group(1))
        if fm.group(1) is not None
        else [fm.group(2)]
    )
    all_parms = _decode_parms(head, len(names))
    data: bytes | None = stream
    for name, g in zip(names, all_parms):
        if data is None:
            return None
        pred, cols, colors, bpc, early = _predictor_parms(g)
        if name == b"FlateDecode":
            try:
                data = zlib.decompress(data)
            except zlib.error:
                return None
            if pred >= 10:
                data = _png_unpredict(data, cols, colors, bpc)
        elif name == b"LZWDecode":
            data = _lzw_decode(data, early)
            if data is not None and pred >= 10:
                data = _png_unpredict(data, cols, colors, bpc)
        elif name == b"ASCIIHexDecode":
            body = re.sub(rb"\s+", b"", data.split(b">", 1)[0])
            if len(body) % 2:
                body += b"0"
            try:
                data = bytes.fromhex(body.decode("ascii"))
            except (ValueError, UnicodeDecodeError):
                return None
        elif name == b"ASCII85Decode":
            import base64

            body = re.sub(rb"\s+", b"", data)
            if body.startswith(b"<~"):
                body = body[2:]
            if body.endswith(b"~>"):
                body = body[:-2]
            try:
                data = base64.a85decode(body)
            except ValueError:
                return None
        else:
            return None
    return data


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
        streams.append((b"\n".join(page_parts), _page_fonts(head, objects)))
    return streams


def _utf16be_hex(hx: bytes) -> str:
    try:
        return bytes.fromhex(hx.decode("ascii")).decode(
            "utf-16-be", "replace"
        )
    except ValueError:
        return "�"


def _parse_cmap(data: bytes) -> dict | None:
    """Parse a /ToUnicode CMap stream into
    ``{"len": code_bytes, "map": {font_code: unicode_str}}`` —
    ``bfchar`` pairs, ``bfrange`` in both the incrementing and the
    array destination forms, code width from the codespace range
    (2 bytes when absent: the Identity-H convention)."""
    code_len = 2
    m = re.search(rb"begincodespacerange\s*<([0-9A-Fa-f]+)>", data)
    if m:
        code_len = max(1, len(m.group(1)) // 2)
    mapping: dict[int, str] = {}
    for blk in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.S):
        for pm in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", blk.group(1)
        ):
            mapping[int(pm.group(1), 16)] = _utf16be_hex(pm.group(2))
    for blk in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.S):
        for rm in re.finditer(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
            rb"(\[[^\]]*\]|<[0-9A-Fa-f]+>)",
            blk.group(1),
        ):
            lo, hi = int(rm.group(1), 16), int(rm.group(2), 16)
            if hi - lo > 0x10000:  # malformed range: refuse the blowup
                continue
            dst = rm.group(3)
            if dst.startswith(b"["):
                hexes = re.findall(rb"<([0-9A-Fa-f]+)>", dst)
                for i, hx in enumerate(hexes):
                    if lo + i <= hi:
                        mapping[lo + i] = _utf16be_hex(hx)
            else:
                base_hex = dst.strip(b"<>")
                width = len(base_hex) // 2
                base = int(base_hex, 16)
                for i in range(hi - lo + 1):
                    try:
                        raw = (base + i).to_bytes(width, "big")
                    except OverflowError:
                        break
                    mapping[lo + i] = raw.decode("utf-16-be", "replace")
    if not mapping:
        return None
    return {"len": code_len, "map": mapping}


def _page_fonts(page_head: bytes, objects) -> dict[str, dict]:
    """Resolve the page's /Resources /Font table to
    ``{"/F1": cmap, ...}`` for the fonts that carry a /ToUnicode
    CMap (CID-keyed fonts — LaTeX/Word embedded subsets — whose
    shown strings are glyph ids, not character bytes). Simple fonts
    without a CMap are absent: their strings pass through latin-1,
    which is exact for the standard encodings."""
    res = page_head
    rm = re.search(rb"/Resources\s+(\d+)\s+\d+\s+R", page_head)
    if rm and int(rm.group(1)) in objects:
        res = objects[int(rm.group(1))][0]
    fm = re.search(rb"/Font\s*<<(.*?)>>", res, re.S)
    if fm is None:
        return {}
    fonts: dict[str, dict] = {}
    for m in re.finditer(rb"/([^\s/<>]+)\s+(\d+)\s+\d+\s+R", fm.group(1)):
        fnum = int(m.group(2))
        if fnum not in objects:
            continue
        tm = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", objects[fnum][0])
        if tm is None:
            continue
        tobj = objects.get(int(tm.group(1)))
        if tobj is None or tobj[1] is None:
            continue
        raw = _inflate(tobj[0], tobj[1])
        if raw is None:
            continue
        cmap = _parse_cmap(raw)
        if cmap is not None:
            fonts["/" + m.group(1).decode("latin-1")] = cmap
    return fonts


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


def _content_text(stream: bytes, fonts: dict[str, dict] | None = None) -> str:
    """Tokenize ONE content stream and assemble the shown text in
    layout order: ``Tj``/``TJ``/``'``/``\"`` emit onto the current
    line; ``Td``/``TD`` with a y move, ``T*``, and ``Tm`` with a y
    change start a new line; a big TJ kern gap becomes a space (the
    standard word-split heuristic for kerned text).

    ``fonts`` maps font resource names to parsed /ToUnicode CMaps;
    ``Tf`` switches the active font, and shown strings under a
    CMap-carrying font are decoded as ``code_len``-byte glyph codes
    through the CMap instead of latin-1 (the CID-keyed-font path)."""
    fonts = fonts or {}
    lines: list[list[str]] = [[]]
    stack: list = []  # operands since the last operator
    last_ty: float | None = None
    cmap: dict | None = None
    i, n = 0, len(stream)

    def show(txt: str) -> None:
        if not txt:
            return
        if cmap is not None:
            raw = txt.encode("latin-1", "replace")
            step = cmap["len"]
            table = cmap["map"]
            txt = "".join(
                table.get(
                    int.from_bytes(raw[j : j + step], "big"), "�"
                )
                for j in range(0, len(raw) - step + 1, step)
            )
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
            elif op == b"Tf":
                # operands: /FontName size — switch the active CMap
                if len(stack) >= 2 and isinstance(stack[-2], str):
                    cmap = fonts.get(stack[-2])
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


_ENCRYPT_RE = re.compile(rb"/Encrypt\s*(?:\d+\s+\d+\s+R|<<)")


def _is_encrypted(data: bytes, objects) -> bool:
    """True when a TRAILER dictionary carries /Encrypt — classic
    ``trailer << ... >>`` blocks and PDF 1.5+ cross-reference-stream
    dicts (``/Type /XRef``, which hold the trailer entries). Scanning
    the whole file instead would misclassify an unencrypted PDF whose
    uncompressed content stream or a comment merely CONTAINS the
    bytes ``/Encrypt 1 0 R``."""
    for m in re.finditer(rb"trailer", data):
        if _ENCRYPT_RE.search(data, m.end(), m.end() + 2048):
            return True
    for head, stream in objects.values():
        if stream is not None and re.search(rb"/Type\s*/XRef\b", head):
            if _ENCRYPT_RE.search(head):
                return True
    return False


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
        if _is_encrypted(data, objects):
            n_pages = len(
                [1 for h, _ in objects.values()
                 if re.search(rb"/Type\s*/Page\b", h)]
            )
            return "", n_pages, "pdf-encrypted"
        streams = _page_content_streams(data, objects)
        if streams is None:
            return "", 0, "stub"
        n_pages = len(streams)
        pages = [_content_text(s, f) for s, f in streams if s]
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
