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
- ``pdf-encrypted`` ``/Encrypt`` in a trailer and NOT decryptable
  with the standard security handler's empty user password. Files
  "encrypted" only to set owner permissions (the common crawl case)
  ARE decrypted — RC4 40/128 (R2-R4), AES-128 (V4/AESV2) and
  AES-256 (V5, R5 and R6 incl. the Algorithm 2.B hardened hash) per
  PDF 32000 §7.6, pure stdlib (hashlib + from-definition RC4/AES,
  the AES core pinned against the FIPS-197 known-answer vectors) —
  and extract under their real labels; real-user-password files
  keep the honest ledger
- ``pdf-images``    valid PDF, no text operators, and at least one
  page image is EXTRACTABLE by composition (DCTDecode streams are
  JPEG payloads as-is; Flate/LZW/raw samples — incl. /Indexed
  palettes — become binary PNM) —
  ``pdf_to_images`` turns these files into multimodal corpus rows
- ``pdf-scanned``   valid PDF, no text operators, page images present
  but none extractable (CCITT G4 / JBIG2 / JPX codecs — needs more
  than composition; OCR out of scope either way)
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

__all__ = [
    "extract_pdf_images",
    "extract_pdf_text",
    "pdf_to_documents",
    "pdf_to_images",
]

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
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    prev: bytes | None = None
    # int-accumulator code reader (a per-bit loop here dominated
    # whole-image TIFF LZW decode time)
    acc = 0
    navail = 0
    pos = 0
    n = len(data)
    while True:
        while navail < width:
            if pos >= n:
                return bytes(out)  # bits exhausted mid-code: done
            acc = (acc << 8) | data[pos]
            pos += 1
            navail += 8
        navail -= width
        code = (acc >> navail) & ((1 << width) - 1)
        acc &= (1 << navail) - 1
        if code == 257:  # EOD
            break
        if code == 256:  # clear table
            table = list(base)
            width = 9
            prev = None
            continue
        size = len(table)
        if code < size:
            entry = table[code]
        elif code == size and prev is not None:  # KwKwK
            entry = prev + prev[:1]
        else:
            return None
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
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


def _filter_chain(head: bytes) -> list[tuple[bytes, bytes | None]]:
    """The object's ``(filter name, parms dict body)`` pairs, in
    application order; empty when the stream is unfiltered."""
    fm = re.search(rb"/Filter\s*(?:\[(.*?)\]|/([A-Za-z0-9]+))", head, re.S)
    if fm is None:
        return []
    names = (
        re.findall(rb"/([A-Za-z0-9]+)", fm.group(1))
        if fm.group(1) is not None
        else [fm.group(2)]
    )
    return list(zip(names, _decode_parms(head, len(names))))


def _inflate(head: bytes, stream: bytes) -> bytes | None:
    """Apply the object's /Filter chain to its raw stream bytes:
    FlateDecode (+ optional PNG predictor from /DecodeParms),
    LZWDecode, ASCIIHexDecode, ASCII85Decode, and arrays chaining
    them — each filter paired with ITS OWN /DecodeParms entry when
    the array form is used. Unknown filters (DCTDecode, JBIG2, crypt
    filters) return None and the file falls to the honest ledger."""
    return _run_filters(_filter_chain(head), stream)


def _run_filters(pairs, stream: bytes) -> bytes | None:
    data: bytes | None = stream
    for name, g in pairs:
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


def _resolve_dict(head: bytes, key: bytes, objects) -> bytes | None:
    """The body of ``/key << ... >>``, following one level of
    indirection (``/key N 0 R`` -> object N's head)."""
    m = re.search(key + rb"\s*<<", head)
    if m is not None:
        # balanced << >> scan (resources/xobject dicts nest)
        i = m.end()
        depth = 1
        while i < len(head) - 1 and depth:
            if head[i : i + 2] == b"<<":
                depth += 1
                i += 2
            elif head[i : i + 2] == b">>":
                depth -= 1
                i += 2
            else:
                i += 1
        return head[m.end() : i - 2]
    m = re.search(key + rb"\s+(\d+)\s+\d+\s+R", head)
    if m is not None:
        got = objects.get(int(m.group(1)))
        if got is not None:
            return got[0]
    return None


def _unpack_samples(data: bytes, w: int, h: int, bpc: int):
    """(h, w) sample array from row-byte-padded packed samples at
    1/2/4/8 bits per sample (single component), or None on underrun."""
    import numpy as np

    if bpc == 8:
        if len(data) < w * h:
            return None
        return np.frombuffer(data[: w * h], np.uint8).reshape(h, w)
    rowbytes = (w * bpc + 7) >> 3
    if len(data) < rowbytes * h:
        return None
    bits = np.unpackbits(
        np.frombuffer(data[: rowbytes * h], np.uint8).reshape(h, rowbytes),
        axis=1,
    )[:, : w * bpc].reshape(h, w, bpc)
    weights = (1 << np.arange(bpc - 1, -1, -1)).astype(np.uint16)
    return (bits * weights).sum(axis=2).astype(np.uint8)


def _indexed_palette(head: bytes, objects):
    """(base_ncomp, hival, lookup bytes) for an ``/Indexed`` color
    space — array form with a hex/literal lookup string or an
    indirect reference to a lookup stream — or None."""
    im = re.search(
        rb"/ColorSpace\s*\[\s*/(?:Indexed|I)\s*"
        rb"/(DeviceRGB|CalRGB|DeviceGray|CalGray)\s+(\d+)\s*",
        head,
    )
    if im is None:
        return None
    ncomp = 3 if b"RGB" in im.group(1) else 1
    hival = int(im.group(2))
    if hival > 255:
        return None
    at = im.end()
    lookup = _string_bytes(head, at)
    if lookup is None:
        rm = re.match(rb"\s*(\d+)\s+\d+\s+R", head[at:])
        if rm is None or objects is None:
            return None
        got = objects.get(int(rm.group(1)))
        if got is None:
            return None
        ohead, ostream = got
        if ostream is not None:
            lookup = _inflate(ohead, ostream)
        else:
            lookup = _string_bytes(ohead, 0)
    if lookup is None or len(lookup) < (hival + 1) * ncomp:
        return None
    return ncomp, hival, lookup


def _xobject_image(head: bytes, stream: bytes, objects=None):
    """One ``/Subtype /Image`` XObject -> ``(fmt, payload)`` where the
    payload is directly decodable by the multimodal image ladder:

    - DCTDecode-filtered images ARE JPEG files — any preceding
      transport filters (hex/85) are applied and the JPEG bytes pass
      through untouched ('jpeg')
    - FlateDecode / LZW / unfiltered raw samples become binary PNM
      (P5 for /DeviceGray / /CalGray / 1-bit masks, P6 for
      /DeviceRGB / /CalRGB), which the ladder's PNM decoder reads
      ('pnm'); a ``/Decode [1 0]`` inversion is honored
    - ``/Indexed`` palettes over those bases (1/2/4/8-bit indices,
      lookup string or lookup stream) map through the palette to PNM

    Returns None for codecs needing more than composition (JPX,
    CCITT G4, JBIG2) or exotic color spaces (ICC, CMYK) — those stay
    in the honest pdf-scanned bucket."""
    import numpy as np

    wm = re.search(rb"/Width\s+(\d+)", head)
    hm = re.search(rb"/Height\s+(\d+)", head)
    if wm is None or hm is None:
        return None
    w, h = int(wm.group(1)), int(hm.group(1))
    if w <= 0 or h <= 0 or w * h > 50_000_000 // 3:
        return None
    pairs = _filter_chain(head)
    if pairs and pairs[-1][0] == b"DCTDecode":
        data = _run_filters(pairs[:-1], stream)
        if data is None or data[:2] != b"\xff\xd8":
            return None
        return "jpeg", data
    bm = re.search(rb"/BitsPerComponent\s+(\d+)", head)
    bpc = int(bm.group(1)) if bm else 8
    mask = re.search(rb"/ImageMask\s+true", head) is not None
    indexed = None if mask else _indexed_palette(head, objects)
    if mask:
        ncomp, bpc = 1, 1
    elif indexed is not None:
        ncomp = 1  # indices are single-component samples
    elif re.search(rb"/(?:DeviceRGB|CalRGB)\b", head):
        ncomp = 3
    elif re.search(rb"/(?:DeviceGray|CalGray)\b", head):
        ncomp = 1
    else:
        return None  # ICC/CMYK: out of compositional reach
    if bpc not in (1, 2, 4, 8) or (ncomp == 3 and bpc != 8):
        return None
    if bpc in (2, 4) and indexed is None and not mask:
        return None  # sub-byte gray without a palette: rare, skip
    data = _run_filters(pairs, stream)
    if data is None:
        return None
    if indexed is not None:
        bn, hival, lookup = indexed
        idx = _unpack_samples(data, w, h, bpc)
        if idx is None or int(idx.max(initial=0)) > hival:
            return None
        pal = np.frombuffer(
            lookup[: (hival + 1) * bn], np.uint8
        ).reshape(hival + 1, bn)
        body = pal[idx].tobytes()
        magic = b"P6" if bn == 3 else b"P5"
        return "pnm", magic + b"\n%d %d\n255\n" % (w, h) + body
    if bpc == 1:
        rowbytes = (w + 7) >> 3
        if len(data) < rowbytes * h:
            return None
        bits = np.unpackbits(
            np.frombuffer(data[: rowbytes * h], np.uint8).reshape(
                h, rowbytes
            ),
            axis=1,
        )[:, :w]
        if re.search(rb"/Decode\s*\[\s*1\s+0\s*\]", head) or mask:
            # ImageMask: sample 0 paints (dark); /Decode [1 0] inverts
            bits = 1 - bits
        body = (bits * 255).astype(np.uint8).tobytes()
    else:
        need = w * h * ncomp
        if len(data) < need:
            return None
        body = data[:need]
        if re.search(rb"/Decode\s*\[\s*1\s+0", head):
            body = bytes(255 - b for b in body)
    magic = b"P6" if ncomp == 3 else b"P5"
    return "pnm", magic + b"\n%d %d\n255\n" % (w, h) + body


def extract_pdf_images(data: bytes | None):
    """Page-image extraction for the scanned-PDF bucket: walk each
    page's ``/Resources /XObject`` entries (one level of indirection
    allowed on both dicts) in page-tree order and convert every
    ``/Subtype /Image`` stream the filter chains can reach into a
    ladder-decodable payload. Returns ``[(page_idx, fmt, payload)]``
    (possibly empty); never raises on dirty input. Images referenced
    by no page land at the end with page_idx -1 (damaged trees)."""
    if data is None or not data[:1024].startswith(b"%PDF-"):
        head = data.find(b"%PDF-", 0, 1024) if data else -1
        if head < 0:
            return []
        data = data[head:]
    try:
        objects, locked = _open_objects(data)
        if objects is None or locked:
            return []
        pages: list[int] = []

        # inherited_res: /Resources is inheritable from ancestor
        # /Pages nodes (PDF 32000-1 Table 29) — carry the nearest
        # ancestor's down so pages relying on inheritance still
        # resolve their XObjects
        inherited_res: dict[int, bytes | None] = {}

        def walk(num: int, depth: int = 0,
                 res: bytes | None = None) -> None:
            if depth > 64 or num not in objects:
                return
            hd, _ = objects[num]
            if re.search(rb"/Type\s*/Pages\b", hd):
                own = _resolve_dict(hd, rb"/Resources", objects)
                kids = re.search(rb"/Kids\s*\[([^\]]*)\]", hd)
                if kids:
                    for km in re.finditer(
                        rb"(\d+)\s+\d+\s+R", kids.group(1)
                    ):
                        walk(int(km.group(1)), depth + 1,
                             own if own is not None else res)
            elif re.search(rb"/Type\s*/Page\b", hd):
                pages.append(num)
                inherited_res[num] = res

        for num, (hd, _) in objects.items():
            if re.search(rb"/Type\s*/Catalog\b", hd):
                m = re.search(rb"/Pages\s+(\d+)\s+\d+\s+R", hd)
                if m:
                    walk(int(m.group(1)))
                break
        if not pages:
            pages = [
                num
                for num, (hd, _) in sorted(objects.items())
                if re.search(rb"/Type\s*/Page\b", hd)
            ]
        out = []
        seen: set[int] = set()
        for pi, num in enumerate(pages):
            hd, _ = objects[num]
            res = _resolve_dict(hd, rb"/Resources", objects)
            if res is None:
                res = inherited_res.get(num)
            if res is None:
                continue
            xo = _resolve_dict(res, rb"/XObject", objects)
            if xo is None:
                continue
            for m in re.finditer(rb"/\S+\s+(\d+)\s+\d+\s+R", xo):
                onum = int(m.group(1))
                got = objects.get(onum)
                if got is None or got[1] is None:
                    continue
                ohead, ostream = got
                if not re.search(rb"/Subtype\s*/Image\b", ohead):
                    continue
                seen.add(onum)
                img = _xobject_image(ohead, ostream, objects)
                if img is not None:
                    out.append((pi, img[0], img[1]))
        # orphaned image streams (broken resource dicts): still usable
        for onum, (ohead, ostream) in sorted(objects.items()):
            if onum in seen or ostream is None:
                continue
            if re.search(rb"/Subtype\s*/Image\b", ohead):
                img = _xobject_image(ohead, ostream, objects)
                if img is not None:
                    out.append((-1, img[0], img[1]))
        return out
    except Exception:  # noqa: BLE001 - dirty payload -> no images
        return []


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


# --- standard security handler (PDF 32000-1 §7.6.3, RC4 with the
# empty user password — the common crawl case: files "encrypted" only
# to set owner permissions) --------------------------------------------

_PW_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def _rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 255
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, b in enumerate(data):
        i = (i + 1) & 255
        j = (j + s[i]) & 255
        s[i], s[j] = s[j], s[i]
        out[k] = b ^ s[(s[i] + s[j]) & 255]
    return bytes(out)


def _aes_tables():
    """AES S-box / inverse S-box / GF(2^8) multiply tables, generated
    from the FIPS-197 definitions (x^8+x^4+x^3+x+1 field, affine
    transform) rather than embedded literals."""
    # GF(2^8) exp/log over generator 3
    exp = [0] * 512
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= (x << 1) ^ (0x11B if x & 0x80 else 0)
    for i in range(255, 512):
        exp[i] = exp[i - 255]

    def gmul(a, b):
        if a == 0 or b == 0:
            return 0
        return exp[log[a] + log[b]]

    sbox = [0] * 256
    for i in range(256):
        inv = 0 if i == 0 else exp[255 - log[i]]
        b = inv
        s = inv
        for _ in range(4):
            b = ((b << 1) | (b >> 7)) & 0xFF
            s ^= b
        sbox[i] = s ^ 0x63
    inv_sbox = [0] * 256
    for i, v in enumerate(sbox):
        inv_sbox[v] = i
    return sbox, inv_sbox, gmul


_AES_SBOX, _AES_INV_SBOX, _AES_GMUL = _aes_tables()


def _aes_expand(key: bytes):
    """FIPS-197 key expansion -> list of round-key words (4 bytes)."""
    nk = len(key) // 4
    nr = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_AES_SBOX[b] for b in t]
            t[0] ^= rcon
            rcon = _AES_GMUL(rcon, 2)
        elif nk > 6 and i % nk == 4:
            t = [_AES_SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    return words, nr


def _aes_decrypt_block(words, nr, blk: bytes) -> bytes:
    """FIPS-197 §5.3 inverse cipher on one 16-byte block."""
    s = [list(blk[r::4]) for r in range(4)]  # state[row][col]

    def add_rk(rnd):
        for c in range(4):
            w = words[4 * rnd + c]
            for r in range(4):
                s[r][c] ^= w[r]

    add_rk(nr)
    for rnd in range(nr - 1, -1, -1):
        # InvShiftRows
        for r in range(1, 4):
            s[r] = s[r][-r:] + s[r][:-r]
        # InvSubBytes
        for r in range(4):
            s[r] = [_AES_INV_SBOX[b] for b in s[r]]
        add_rk(rnd)
        if rnd:
            # InvMixColumns
            g = _AES_GMUL
            for c in range(4):
                a0, a1, a2, a3 = s[0][c], s[1][c], s[2][c], s[3][c]
                s[0][c] = g(a0, 14) ^ g(a1, 11) ^ g(a2, 13) ^ g(a3, 9)
                s[1][c] = g(a0, 9) ^ g(a1, 14) ^ g(a2, 11) ^ g(a3, 13)
                s[2][c] = g(a0, 13) ^ g(a1, 9) ^ g(a2, 14) ^ g(a3, 11)
                s[3][c] = g(a0, 11) ^ g(a1, 13) ^ g(a2, 9) ^ g(a3, 14)
    return bytes(s[r][c] for c in range(4) for r in range(4))


def _aes_encrypt_block(words, nr, blk: bytes) -> bytes:
    """FIPS-197 §5.1 forward cipher (needed only by the R6 key
    derivation hash, Algorithm 2.B)."""
    s = [list(blk[r::4]) for r in range(4)]

    def add_rk(rnd):
        for c in range(4):
            w = words[4 * rnd + c]
            for r in range(4):
                s[r][c] ^= w[r]

    add_rk(0)
    g = _AES_GMUL
    for rnd in range(1, nr + 1):
        for r in range(4):
            s[r] = [_AES_SBOX[b] for b in s[r]]
        for r in range(1, 4):
            s[r] = s[r][r:] + s[r][:r]
        if rnd < nr:
            for c in range(4):
                a0, a1, a2, a3 = s[0][c], s[1][c], s[2][c], s[3][c]
                s[0][c] = g(a0, 2) ^ g(a1, 3) ^ a2 ^ a3
                s[1][c] = a0 ^ g(a1, 2) ^ g(a2, 3) ^ a3
                s[2][c] = a0 ^ a1 ^ g(a2, 2) ^ g(a3, 3)
                s[3][c] = g(a0, 3) ^ a1 ^ a2 ^ g(a3, 2)
        add_rk(rnd)
    return bytes(s[r][c] for c in range(4) for r in range(4))


def _aes_cbc_encrypt_raw(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-CBC, NO padding and NO prepended IV — the exact form the
    R6 hash uses (data is always a multiple of 16 there)."""
    words, nr = _aes_expand(key)
    out = bytearray()
    prev = iv
    for at in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[at : at + 16], prev))
        prev = _aes_encrypt_block(words, nr, blk)
        out.extend(prev)
    return bytes(out)


def _hash_2b(pwd: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B (R6 hardened hash): iterated
    SHA-256/384/512 selected by an AES-CBC round, 64+ iterations."""
    import hashlib

    k = hashlib.sha256(pwd + salt + udata).digest()
    i = 0
    e = b"\xff"
    while i < 64 or e[-1] > i - 32:
        k1 = (pwd + k + udata) * 64
        e = _aes_cbc_encrypt_raw(k[:16], k[16:32], k1)
        m = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[m](
            e
        ).digest()
        i += 1
    return k[:32]


def _aes_cbc_decrypt(key: bytes, data: bytes,
                     strip_pad: bool = True) -> bytes | None:
    """AES-CBC per the PDF crypt filters: leading 16-byte IV, PKCS#7
    padding (stripped when ``strip_pad``). None on malformed sizes."""
    if len(data) < 32 or len(data) % 16:
        return None
    words, nr = _aes_expand(key)
    prev = data[:16]
    out = bytearray()
    for at in range(16, len(data), 16):
        blk = data[at : at + 16]
        plain = _aes_decrypt_block(words, nr, blk)
        out.extend(a ^ b for a, b in zip(plain, prev))
        prev = blk
    if strip_pad:
        pad = out[-1]
        if not 1 <= pad <= 16:
            return None
        del out[-pad:]
    return bytes(out)


def _string_bytes(body: bytes, at: int) -> bytes | None:
    """Raw bytes of the PDF string starting at ``at`` (``(...)`` with
    escapes, or ``<hex>``) — for binary dict entries like /O and /U."""
    while at < len(body) and body[at] in b" \t\r\n":
        at += 1
    if at >= len(body):
        return None
    if body[at] == 0x3C:  # <hex>
        s, _ = _hex_string(body, at)
        return s.encode("latin-1")
    if body[at] == 0x28:  # (literal)
        s, _ = _literal_string(body, at)
        return s.encode("latin-1")
    return None


def _parse_encrypt(data: bytes, objects):
    """The standard security handler's parameters from the trailer's
    /Encrypt entry, or None when absent / not /Standard / not RC4."""
    enc_head = None
    for m in re.finditer(rb"trailer", data):
        g = re.search(
            rb"/Encrypt\s+(\d+)\s+\d+\s+R", data[m.end() : m.end() + 2048]
        )
        if g:
            got = objects.get(int(g.group(1)))
            if got:
                enc_head = got[0]
            break
        g = re.search(
            rb"/Encrypt\s*<<(.*?)>>", data[m.end() : m.end() + 2048], re.S
        )
        if g:
            enc_head = g.group(1)
            break
    if enc_head is None:
        for head, stream in objects.values():
            if stream is not None and re.search(rb"/Type\s*/XRef\b", head):
                g = re.search(rb"/Encrypt\s+(\d+)\s+\d+\s+R", head)
                if g and int(g.group(1)) in objects:
                    enc_head = objects[int(g.group(1))][0]
                    break
    if enc_head is None:
        return None
    if not re.search(rb"/Filter\s*/Standard\b", enc_head):
        return None
    vm = re.search(rb"/V\s+(\d+)", enc_head)
    v = int(vm.group(1)) if vm else 0
    rm = re.search(rb"/R\s+(\d+)", enc_head)
    pm = re.search(rb"/P\s+(-?\d+)", enc_head)
    if rm is None or pm is None:
        return None
    r = int(rm.group(1))
    lm = re.search(rb"/Length\s+(\d+)", enc_head)
    length = int(lm.group(1)) if lm else 40
    em = re.search(rb"/EncryptMetadata\s+false", enc_head) is None
    if v in (1, 2) and r in (2, 3):
        cfm = "rc4"
    elif v == 4 and r == 4:
        # crypt filters: the streams' filter comes from /StmF
        if re.search(rb"/StmF\s*/Identity\b", enc_head):
            cfm = "identity"  # streams are NOT encrypted
        elif re.search(rb"/CFM\s*/AESV2\b", enc_head):
            cfm = "aes"
            length = 128
        elif re.search(rb"/CFM\s*/V2\b", enc_head):
            cfm = "rc4"
            clm = re.search(rb"/CF\b.*?/Length\s+(\d+)", enc_head, re.S)
            if clm:
                cl = int(clm.group(1))
                length = cl * 8 if cl <= 32 else cl  # bytes vs bits
        else:
            return None  # unknown crypt filter
    elif v == 5 and r in (5, 6):
        cfm = "aes5"
        length = 256
    else:
        return None
    om = re.search(rb"/O\s*", enc_head)
    um = re.search(rb"/U\s*", enc_head)
    if om is None or um is None:
        return None
    o = _string_bytes(enc_head, om.end())
    u = _string_bytes(enc_head, um.end())
    need_u = 48 if cfm == "aes5" else 32
    if o is None or u is None or len(o) < 32 or len(u) < need_u:
        return None
    ue = None
    if cfm == "aes5":
        uem = re.search(rb"/UE\s*", enc_head)
        if uem is None:
            return None
        ue = _string_bytes(enc_head, uem.end())
        if ue is None or len(ue) < 32:
            return None
    # first element of the trailer /ID array (may legally be absent)
    id0 = b""
    im = re.search(rb"/ID\s*\[", data)
    if im:
        got = _string_bytes(data, im.end())
        if got is not None:
            id0 = got
    return {
        "r": r, "length": length, "o": o[:48], "u": u[:need_u],
        "p": int(pm.group(1)), "id0": id0, "cfm": cfm, "em": em,
        "ue": ue[:32] if ue else None,
    }


def _empty_user_key(enc) -> bytes | None:
    """File encryption key from the EMPTY user password, validated
    against /U. R2/R3/R4: Algorithm 2 + Algorithm 6 (R2 compares the
    full 32 bytes, R3/R4 the first 16; R4 without /EncryptMetadata
    folds ffffffff into the hash). R5/R6 (AES-256): SHA-256 /
    Algorithm 2.B over the validation salt, file key unwrapped from
    /UE with AES-256-CBC (zero IV). Returns None when the file needs
    a real password."""
    import hashlib
    import struct

    if enc["cfm"] == "aes5":
        u = enc["u"]
        vsalt, ksalt = u[32:40], u[40:48]
        if enc["r"] == 5:
            h = hashlib.sha256(b"" + vsalt).digest()
            ik = hashlib.sha256(b"" + ksalt).digest()
        else:
            h = _hash_2b(b"", vsalt)
            ik = _hash_2b(b"", ksalt)
        if h != u[:32]:
            return None
        words, nr = _aes_expand(ik)
        prev = b"\x00" * 16
        key = bytearray()
        for at in range(0, 32, 16):
            blk = enc["ue"][at : at + 16]
            plain = _aes_decrypt_block(words, nr, blk)
            key.extend(a ^ b for a, b in zip(plain, prev))
            prev = blk
        return bytes(key)

    o = enc["o"][:32]
    n = 5 if enc["r"] == 2 else max(5, min(16, enc["length"] // 8))
    seed = _PW_PAD + o + struct.pack("<i", enc["p"]) + enc["id0"]
    if enc["r"] >= 4 and not enc["em"]:
        seed += b"\xff\xff\xff\xff"
    h = hashlib.md5(seed).digest()
    if enc["r"] >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    key = h[:n]
    if enc["r"] == 2:
        ok = _rc4(key, _PW_PAD) == enc["u"][:32]
    else:
        x = hashlib.md5(_PW_PAD + enc["id0"]).digest()
        x = _rc4(key, x)
        for i in range(1, 20):
            x = _rc4(bytes(b ^ i for b in key), x)
        ok = x == enc["u"][:16]
    return key if ok else None


def _decrypt_objects(data: bytes, objects, key: bytes, cfm: str):
    """New object map with every top-level stream decrypted — RC4 or
    AES-CBC under its per-object key (Algorithm 1; AESV2 appends the
    sAlT salt), or the file key directly for AES-256 (V5) — then
    /ObjStm re-expanded (their contained objects are not separately
    encrypted). XRef streams are never encrypted and pass through; a
    stream whose AES framing is malformed becomes None rather than
    garbage."""
    import hashlib

    gens = {}
    for m in _OBJ_RE.finditer(data):
        gens.setdefault(int(m.group(1)), int(m.group(2)))
    out = {}
    for num, (head, stream) in objects.items():
        if stream is not None and not re.search(
            rb"/Type\s*/XRef\b", head
        ):
            if cfm == "aes5":
                stream = _aes_cbc_decrypt(key, stream)
            else:
                gen = gens.get(num, 0)
                seed = (
                    key
                    + num.to_bytes(3, "little")
                    + gen.to_bytes(2, "little")
                )
                if cfm == "aes":
                    seed += b"sAlT"
                okey = hashlib.md5(seed).digest()[
                    : min(len(key) + 5, 16)
                ]
                if cfm == "aes":
                    stream = _aes_cbc_decrypt(okey, stream)
                else:
                    stream = _rc4(okey, stream)
        out[num] = (head, stream)
    for head, stream in list(out.values()):
        if stream is not None and re.search(rb"/Type\s*/ObjStm\b", head):
            for num, obody in _expand_objstm(head, stream):
                out.setdefault(num, (obody, None))
    return out


def _open_objects(data: bytes):
    """(objects, locked): the object map ready for extraction. For
    encrypted files the empty-user-password standard handler is
    tried — RC4 40/128 (R2-R4), AES-128 (V4/AESV2) and AES-256
    (V5/R5/R6); ``locked=True`` means content is ciphertext we
    cannot read (a real user password, or an unknown scheme)."""
    objects = _find_objects(data)
    if not objects:
        return None, False
    if not _is_encrypted(data, objects):
        return objects, False
    enc = _parse_encrypt(data, objects)
    if enc is None:
        return objects, True
    if enc["cfm"] == "identity":
        return objects, False  # /StmF /Identity: streams plaintext
    key = _empty_user_key(enc)
    if key is None:
        return objects, True
    return _decrypt_objects(data, objects, key, enc["cfm"]), False


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
        objects, locked = _open_objects(data)
        if objects is None:
            return "", 0, "stub"
        if locked:
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
        if not has_image:
            return "", n_pages, "pdf-no-text"
        # scanned document: 'pdf-images' when at least one page image
        # is extractable by composition (DCT -> JPEG payload, Flate ->
        # PNM) so pdf_to_images will yield corpus rows for this file;
        # 'pdf-scanned' stays the honest label for codecs out of
        # reach (CCITT G4, JBIG2, JPX)
        extractable = extract_pdf_images(data)
        return "", n_pages, "pdf-images" if extractable else "pdf-scanned"
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


def pdf_to_images(
    df: DataFrame,
    payload_col: str = "content",
    path_col: str = "path",
) -> DataFrame:
    """Scanned-PDF image ingestion: ``binaryFile`` rows in, one row
    out per extractable page image — ``(media_id, doc_id, url, page,
    img_idx, payload_format, payload)`` — the shape the multimodal
    operators consume directly: ``image_metadata`` reads the JPEG/PNM
    headers, ``decode_image_features`` / ``image_dhash`` decode the
    pixels with the real codec ladder (the extracted payloads ARE
    JPEG or binary PNM files; see ``extract_pdf_images``). This turns
    the ``pdf-images`` ledger bucket of ``pdf_to_documents`` into
    multimodal corpus rows instead of a dead end.

    One Arrow-batched ``mapInPandas`` pass with a row fan-out (a file
    yields 0..N images); payload bytes never shuffle."""
    from .dedup import md5_lane

    out_schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("page", T.IntegerType()),
            T.StructField("img_idx", T.IntegerType()),
            T.StructField("payload_format", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            urls, pgs, idxs, fmts, payloads = [], [], [], [], []
            for url, payload in zip(
                pdf_batch[path_col], pdf_batch[payload_col]
            ):
                for k, (pg, fmt, body) in enumerate(
                    extract_pdf_images(payload)
                ):
                    urls.append(url)
                    pgs.append(pg)
                    idxs.append(k)
                    fmts.append(fmt)
                    payloads.append(body)
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype=object),
                    "page": pd.Series(pgs, dtype="int32"),
                    "img_idx": pd.Series(idxs, dtype="int32"),
                    "payload_format": pd.Series(fmts, dtype=object),
                    "payload": pd.Series(payloads, dtype=object),
                }
            )

    out = df.select(path_col, payload_col).mapInPandas(run, out_schema)
    return out.select(
        F.concat_ws(
            "/", md5_lane(F.col("url")),
            F.col("page").cast("string"), F.col("img_idx").cast("string"),
        ).alias("media_id"),
        md5_lane(F.col("url")).alias("doc_id"),
        "url",
        "page",
        "img_idx",
        "payload_format",
        "payload",
    )
