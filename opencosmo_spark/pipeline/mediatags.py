"""Embedded metadata-tag extraction from crawl media payloads —
ID3v2.2/2.3/2.4 and ID3v1(.1) (mp3), Vorbis comments (FLAC metadata
blocks and Ogg Vorbis/Opus comment headers), and MP4/M4A iTunes-style
``ilst`` atoms. All public formats: the id3.org informal standards,
the Xiph VorbisComment spec, and the ISO-BMFF ``meta``/``ilst``
layout.

This is the audio/video twin of ``video_subtitles`` and
``pdf_to_documents``: tags are the highest-value text a crawl media
payload carries at zero codec cost — titles/artists/albums for
entity-keyed dedup and joins, dates for temporal slicing, genres for
domain mixing, and USLT/LYRICS frames which are genuine pretraining
text. Everything runs row-locally in one Arrow-batched
``mapInPandas``; payload bytes never shuffle.

Honesty posture: a payload with no recognized tag container yields
NULL columns (``tag_source`` NULL) — never fabricated values; parse
damage degrades to whatever decoded cleanly before the damage.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# canonical ID3v1 genre list (indices 0-79, from the public ID3v1
# spec); ID3v1 byte 127 and MP4 'gnre' atoms index into it
_ID3V1_GENRES = (
    "Blues", "Classic Rock", "Country", "Dance", "Disco", "Funk",
    "Grunge", "Hip-Hop", "Jazz", "Metal", "New Age", "Oldies",
    "Other", "Pop", "R&B", "Rap", "Reggae", "Rock", "Techno",
    "Industrial", "Alternative", "Ska", "Death Metal", "Pranks",
    "Soundtrack", "Euro-Techno", "Ambient", "Trip-Hop", "Vocal",
    "Jazz+Funk", "Fusion", "Trance", "Classical", "Instrumental",
    "Acid", "House", "Game", "Sound Clip", "Gospel", "Noise",
    "Alternative Rock", "Bass", "Soul", "Punk", "Space",
    "Meditative", "Instrumental Pop", "Instrumental Rock", "Ethnic",
    "Gothic", "Darkwave", "Techno-Industrial", "Electronic",
    "Pop-Folk", "Eurodance", "Dream", "Southern Rock", "Comedy",
    "Cult", "Gangsta", "Top 40", "Christian Rap", "Pop/Funk",
    "Jungle", "Native US", "Cabaret", "New Wave", "Psychedelic",
    "Rave", "Showtunes", "Trailer", "Lo-Fi", "Tribal", "Acid Punk",
    "Acid Jazz", "Polka", "Retro", "Musical", "Rock & Roll",
    "Hard Rock",
)

_MAX_TAG_BYTES = 16 << 20  # anti-bomb cap on any single tag region


# --- ID3v2 -----------------------------------------------------------

_ID3_ENCODINGS = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}

# frame id -> canonical key, per version family
_ID3V23_MAP = {
    "TIT2": "title", "TPE1": "artist", "TALB": "album",
    "TDRC": "date", "TYER": "date", "TCON": "genre",
    "COMM": "comment", "USLT": "lyrics",
}
_ID3V22_MAP = {
    "TT2": "title", "TP1": "artist", "TAL": "album", "TYE": "date",
    "TCO": "genre", "COM": "comment", "ULT": "lyrics",
}


def _syncsafe(b: bytes) -> int:
    v = 0
    for byte in b:
        if byte & 0x80:
            raise ValueError("non-syncsafe byte")
        v = (v << 7) | byte
    return v


def _id3_text(enc: int, raw: bytes) -> str:
    codec = _ID3_ENCODINGS.get(enc)
    if codec is None:
        raise ValueError("bad text encoding byte")
    s = raw.decode(codec, errors="replace")
    # v2.4 multi-value lists are NUL-separated; also strip padding
    parts = [p for p in s.split("\x00") if p]
    return "; ".join(parts)


def _id3_lang_text(enc: int, raw: bytes):
    """COMM/USLT layout: 3-byte language, short descriptor
    (NUL-terminated in the frame's encoding), then the text."""
    if len(raw) < 3:
        raise ValueError("short lang frame")
    lang = raw[:3].decode("latin-1", errors="replace")
    body = raw[3:]
    term = b"\x00\x00" if enc in (1, 2) else b"\x00"
    # descriptor terminator; UTF-16 terminators are 2-byte aligned
    if enc in (1, 2):
        at = 0
        while True:
            i = body.find(term, at)
            if i < 0:
                i = len(body)
                break
            if i % 2 == 0:
                break
            at = i + 1
        text_at = min(i + 2, len(body))
    else:
        i = body.find(term)
        if i < 0:
            i = len(body)
        text_at = min(i + 1, len(body))
    codec = _ID3_ENCODINGS.get(enc)
    if codec is None:
        raise ValueError("bad text encoding byte")
    text = body[text_at:].decode(codec, errors="replace").strip("\x00")
    return lang if lang.strip("\x00 ").isalpha() else None, text


def _id3v2_frames(data: bytes):
    """Shared ID3v2 tag walk: ``(major, [(frame_id, frame_bytes)])``
    or None when there is no well-formed ID3v2 header. Handles the
    syncsafe tag size, whole-tag (v2.2/2.3) and per-frame (v2.4)
    unsynchronisation, extended headers, and stops at padding or
    structural damage, keeping the frames that decoded cleanly."""
    if len(data) < 10 or data[:3] != b"ID3":
        return None
    major = data[3]
    if major not in (2, 3, 4):
        return None
    flags = data[5]
    try:
        size = _syncsafe(data[6:10])
    except ValueError:
        return None
    size = min(size, _MAX_TAG_BYTES, len(data) - 10)
    body = data[10 : 10 + size]
    if flags & 0x80 and major in (2, 3):
        # whole-tag unsynchronisation (v2.4 marks it per frame)
        body = body.replace(b"\xff\x00", b"\xff")
    frames: list[tuple[str, bytes]] = []
    p = 0
    # extended header
    if major == 3 and flags & 0x40:
        if len(body) < 4:
            return None
        p = 4 + int.from_bytes(body[:4], "big")
    elif major == 4 and flags & 0x40:
        try:
            p = _syncsafe(body[:4])
        except ValueError:
            return None
    idlen = 3 if major == 2 else 4
    szlen = 3 if major == 2 else 4
    while p + idlen + szlen <= len(body):
        fid_raw = body[p : p + idlen]
        if fid_raw.strip(b"\x00") == b"":  # padding reached
            break
        fid = fid_raw.decode("latin-1", errors="replace")
        if not all(c.isalnum() and not c.islower() for c in fid):
            break  # structure lost — keep what decoded cleanly
        raw_sz = body[p + idlen : p + idlen + szlen]
        try:
            fsize = _syncsafe(raw_sz) if major == 4 else int.from_bytes(
                raw_sz, "big"
            )
        except ValueError:
            break
        p += idlen + szlen
        fflags = 0
        if major != 2:
            fflags = int.from_bytes(body[p : p + 2], "big")
            p += 2
        if fsize <= 0 or p + fsize > len(body):
            break
        frame = body[p : p + fsize]
        p += fsize
        if major == 4 and fflags & 0x02:  # per-frame unsync
            frame = frame.replace(b"\xff\x00", b"\xff")
        # compressed/encrypted frames: the flag bits moved between
        # versions — v2.3 uses 0x0080/0x0040, v2.4 uses 0x0008/0x0004
        if major == 3 and fflags & 0x00C0:
            continue
        if major == 4 and fflags & 0x000C:
            continue
        if major == 4 and fflags & 0x0001 and len(frame) >= 4:
            # data-length indicator: 4 syncsafe bytes prefixed to body
            frame = frame[4:]
        frames.append((fid, frame))
    return major, frames


def _parse_id3v2(data: bytes):
    got = _id3v2_frames(data)
    if got is None:
        return None
    major, frames = got
    tags: dict[str, str] = {}
    out: dict[str, str] = {}
    fmap = _ID3V22_MAP if major == 2 else _ID3V23_MAP
    for fid, frame in frames:
        try:
            if fid in ("COMM", "COM", "USLT", "ULT"):
                lang, text = _id3_lang_text(frame[0], frame[1:])
                # .get is defensive: the id/version pairing makes a
                # miss impossible today, but a miss must never abort
                # the payload's other tags
                key = fmap.get(fid)
                if text and key and key not in out:
                    out[key] = text
                    if lang:
                        out.setdefault("language", lang)
                tags.setdefault(fid, text)
            elif fid.startswith("T") and len(frame) >= 1:
                text = _id3_text(frame[0], frame[1:])
                if not text:
                    continue
                tags.setdefault(fid, text)
                key = fmap.get(fid)
                if key and key not in out:
                    out[key] = text
        except (ValueError, IndexError):
            continue
    if not tags:
        return None
    return out, tags, "id3v2"


def _parse_id3v1(data: bytes):
    if len(data) < 128:
        return None
    tail = data[-128:]
    if tail[:3] != b"TAG":
        return None

    def txt(lo, hi):
        return tail[lo:hi].split(b"\x00")[0].decode(
            "latin-1", errors="replace"
        ).strip()

    out: dict[str, str] = {}
    tags: dict[str, str] = {}
    for key, lo, hi in (("title", 3, 33), ("artist", 33, 63),
                        ("album", 63, 93), ("date", 93, 97)):
        v = txt(lo, hi)
        if v:
            out[key] = v
            tags[key.upper()] = v
    # ID3v1.1: comment shrinks to 28 bytes, byte 125 = 0, 126 = track
    comment = txt(97, 125 if tail[125] == 0 and tail[126] != 0 else 127)
    if comment:
        out["comment"] = comment
        tags["COMMENT"] = comment
    if tail[127] < len(_ID3V1_GENRES):
        out["genre"] = _ID3V1_GENRES[tail[127]]
        tags["GENRE"] = out["genre"]
    if not tags:
        return None
    return out, tags, "id3v1"


# --- Vorbis comments (FLAC + Ogg) ------------------------------------

_VORBIS_MAP = {
    "TITLE": "title", "ARTIST": "artist", "ALBUM": "album",
    "DATE": "date", "GENRE": "genre", "COMMENT": "comment",
    "DESCRIPTION": "comment", "LYRICS": "lyrics",
    "LANGUAGE": "language",
}


def _parse_vorbis_comments(buf: bytes, at: int):
    """The shared VorbisComment structure: u32le vendor length,
    vendor, u32le count, then count length-prefixed ``KEY=value``
    UTF-8 entries. Returns (canonical, all_tags) or None."""
    if at + 8 > len(buf):
        return None
    vlen = int.from_bytes(buf[at : at + 4], "little")
    at += 4
    if vlen > _MAX_TAG_BYTES or at + vlen + 4 > len(buf):
        return None
    at += vlen
    count = int.from_bytes(buf[at : at + 4], "little")
    at += 4
    if count > 10000:
        return None
    out: dict[str, str] = {}
    tags: dict[str, str] = {}
    for _ in range(count):
        if at + 4 > len(buf):
            break
        ln = int.from_bytes(buf[at : at + 4], "little")
        at += 4
        if ln > _MAX_TAG_BYTES or at + ln > len(buf):
            break
        entry = buf[at : at + ln]
        at += ln
        eq = entry.find(b"=")
        if eq <= 0:
            continue
        key = entry[:eq].decode("ascii", errors="replace").upper()
        val = entry[eq + 1 :].decode("utf-8", errors="replace")
        if not val:
            continue
        tags.setdefault(key, val)
        ckey = _VORBIS_MAP.get(key)
        if ckey and ckey not in out:
            out[ckey] = val
    if not tags:
        return None
    return out, tags


def _parse_flac_tags(data: bytes):
    if len(data) < 8 or data[:4] != b"fLaC":
        return None
    p = 4
    while p + 4 <= len(data):
        hdr = data[p]
        size = int.from_bytes(data[p + 1 : p + 4], "big")
        if (hdr & 0x7F) == 4:  # VORBIS_COMMENT
            got = _parse_vorbis_comments(data[p + 4 : p + 4 + size], 0)
            if got is None:
                return None
            return got[0], got[1], "flac-vorbis"
        if hdr & 0x80:
            return None
        p += 4 + size
    return None


def _parse_ogg_tags(data: bytes):
    if len(data) < 58 or data[:4] != b"OggS":
        return None
    # reassemble the first pages' logical payload so a comment header
    # split across a page boundary still parses (comment headers are
    # small; 16 pages is far more than they span)
    payload = bytearray()
    p = 0
    for _ in range(16):
        if p + 27 > len(data) or data[p : p + 4] != b"OggS":
            break
        nseg = data[p + 26]
        seg_table = data[p + 27 : p + 27 + nseg]
        if len(seg_table) < nseg:
            break
        body_len = sum(seg_table)
        body_at = p + 27 + nseg
        payload += data[body_at : body_at + body_len]
        p = body_at + body_len
        if len(payload) > _MAX_TAG_BYTES:
            break
    buf = bytes(payload)
    for marker, source in ((b"\x03vorbis", "ogg-vorbis"),
                           (b"OpusTags", "ogg-opus")):
        i = buf.find(marker)
        if i >= 0:
            got = _parse_vorbis_comments(buf, i + len(marker))
            if got is not None:
                return got[0], got[1], source
    return None


# --- MP4 / M4A ilst --------------------------------------------------

_ILST_MAP = {
    b"\xa9nam": "title", b"\xa9ART": "artist", b"\xa9alb": "album",
    b"\xa9day": "date", b"\xa9gen": "genre", b"\xa9cmt": "comment",
    b"\xa9lyr": "lyrics",
}


def _parse_mp4_tags(data: bytes):
    from .multimodal import _mp4_boxes

    if data is None or len(data) < 16:
        return None
    top = list(_mp4_boxes(data, 0, len(data)))
    if not top or top[0][0] != b"ftyp":
        return None
    out: dict[str, str] = {}
    tags: dict[str, str] = {}

    def walk_ilst(b0, b1):
        for item, i0, i1 in _mp4_boxes(data, b0, b1):
            for sub, s0, s1 in _mp4_boxes(data, i0, i1):
                if sub != b"data" or s1 - s0 < 8:
                    continue
                dtype = int.from_bytes(data[s0 : s0 + 4], "big")
                body = data[s0 + 8 : s1]
                if dtype == 1:  # UTF-8 text
                    val = body.decode("utf-8", errors="replace").strip(
                        "\x00"
                    )
                elif item == b"gnre" and len(body) >= 2:
                    idx = int.from_bytes(body[:2], "big") - 1
                    if not 0 <= idx < len(_ID3V1_GENRES):
                        continue
                    val = _ID3V1_GENRES[idx]
                else:
                    continue
                if not val:
                    continue
                name = item.decode("latin-1", errors="replace")
                tags.setdefault(name, val)
                ckey = _ILST_MAP.get(item) or (
                    "genre" if item == b"gnre" else None
                )
                if ckey and ckey not in out:
                    out[ckey] = val

    for btype, b0, b1 in top:
        if btype != b"moov":
            continue
        for t2, c0, c1 in _mp4_boxes(data, b0, b1):
            if t2 != b"udta":
                continue
            for t3, d0, d1 in _mp4_boxes(data, c0, c1):
                if t3 != b"meta":
                    continue
                # 'meta' is a FULL box: 4 version/flags bytes precede
                # its children
                for t4, e0, e1 in _mp4_boxes(data, d0 + 4, d1):
                    if t4 == b"ilst":
                        walk_ilst(e0, e1)
    if not tags:
        return None
    return out, tags, "mp4-ilst"


_PARSERS = (_parse_id3v2, _parse_flac_tags, _parse_ogg_tags,
            _parse_mp4_tags, _parse_id3v1)


# --- embedded cover art ----------------------------------------------

def _skip_encoded_str(enc: int, body: bytes) -> int:
    """Offset just past a NUL-terminated string in the frame's
    encoding (UTF-16 terminators are 2-byte aligned)."""
    if enc in (1, 2):
        at = 0
        while True:
            i = body.find(b"\x00\x00", at)
            if i < 0:
                return len(body)
            if i % 2 == 0:
                return i + 2
            at = i + 1
    i = body.find(b"\x00")
    return len(body) if i < 0 else i + 1


def _flac_picture_block(block: bytes):
    """The FLAC PICTURE metadata block (also carried base64 inside
    Vorbis METADATA_BLOCK_PICTURE comments): (mime, kind, image
    bytes) or None."""
    if len(block) < 32:
        return None
    kind = int.from_bytes(block[0:4], "big")
    mlen = int.from_bytes(block[4:8], "big")
    if mlen > 255 or 8 + mlen + 4 > len(block):
        return None
    mime = block[8 : 8 + mlen].decode("latin-1", errors="replace")
    p = 8 + mlen
    dlen = int.from_bytes(block[p : p + 4], "big")
    p += 4 + dlen  # description
    p += 16  # width/height/depth/ncolors
    if p + 4 > len(block):
        return None
    ilen = int.from_bytes(block[p : p + 4], "big")
    p += 4
    if ilen == 0 or p + ilen > len(block):
        return None
    return mime, kind, block[p : p + ilen]


def _id3_art(data: bytes):
    got = _id3v2_frames(data)
    if got is None:
        return None
    _major, frames = got
    arts = []
    for fid, frame in frames:
        try:
            if fid == "APIC" and len(frame) > 4:
                enc = frame[0]
                rest = frame[1:]
                i = rest.find(b"\x00")
                if i < 0:
                    continue
                mime = rest[:i].decode("latin-1", errors="replace")
                rest = rest[i + 1 :]
                kind = rest[0]
                img_at = _skip_encoded_str(enc, rest[1:])
                img = rest[1 + img_at :]
                if img:
                    arts.append((mime, kind, bytes(img)))
            elif fid == "PIC" and len(frame) > 6:  # v2.2
                enc = frame[0]
                fmt3 = frame[1:4].decode("latin-1", errors="replace")
                kind = frame[4]
                img_at = _skip_encoded_str(enc, frame[5:])
                img = frame[5 + img_at :]
                if img:
                    arts.append((f"image/{fmt3.lower().strip()}",
                                 kind, bytes(img)))
        except (ValueError, IndexError):
            continue
    return arts or None


def _flac_art(data: bytes):
    if len(data) < 8 or data[:4] != b"fLaC":
        return None
    arts = []
    p = 4
    while p + 4 <= len(data):
        hdr = data[p]
        size = int.from_bytes(data[p + 1 : p + 4], "big")
        if (hdr & 0x7F) == 6:  # PICTURE
            got = _flac_picture_block(data[p + 4 : p + 4 + size])
            if got is not None:
                arts.append(got)
        if hdr & 0x80:
            break
        p += 4 + size
    return arts or None


def _ogg_art(data: bytes):
    got = _parse_ogg_tags(data)
    if got is None:
        return None
    _canon, tags, _src = got
    b64 = tags.get("METADATA_BLOCK_PICTURE")
    if not b64:
        return None
    import base64

    try:
        block = base64.b64decode(b64, validate=False)
    except Exception:  # noqa: BLE001 - bad base64 -> no art
        return None
    pic = _flac_picture_block(block)
    return [pic] if pic is not None else None


def _mp4_art(data: bytes):
    from .multimodal import _mp4_boxes

    if data is None or len(data) < 16:
        return None
    top = list(_mp4_boxes(data, 0, len(data)))
    if not top or top[0][0] != b"ftyp":
        return None
    arts = []
    for btype, b0, b1 in top:
        if btype != b"moov":
            continue
        for t2, c0, c1 in _mp4_boxes(data, b0, b1):
            if t2 != b"udta":
                continue
            for t3, d0, d1 in _mp4_boxes(data, c0, c1):
                if t3 != b"meta":
                    continue
                for t4, e0, e1 in _mp4_boxes(data, d0 + 4, d1):
                    if t4 != b"ilst":
                        continue
                    for item, i0, i1 in _mp4_boxes(data, e0, e1):
                        if item != b"covr":
                            continue
                        for sub, s0, s1 in _mp4_boxes(data, i0, i1):
                            if sub != b"data" or s1 - s0 < 9:
                                continue
                            dtype = int.from_bytes(
                                data[s0 : s0 + 4], "big"
                            )
                            mime = {13: "image/jpeg",
                                    14: "image/png"}.get(dtype)
                            if mime is None:
                                continue
                            arts.append(
                                (mime, 3, data[s0 + 8 : s1])
                            )  # kind 3 = front cover
    return arts or None


_ART_PARSERS = (
    ("id3v2", _id3_art),
    ("flac-picture", _flac_art),
    ("ogg-picture", _ogg_art),
    ("mp4-covr", _mp4_art),
)


def extract_media_art(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Embedded cover-art extraction — the cross-modal bridge from
    audio payloads to the image corpus: one output row per picture
    found in ID3v2 APIC/PIC frames, FLAC PICTURE metadata blocks,
    Vorbis ``METADATA_BLOCK_PICTURE`` comments (base64-wrapped FLAC
    PICTURE structure), or MP4 ``covr`` atoms. Columns appended:
    ``art_idx`` (int, per-file), ``art_mime`` (declared MIME),
    ``art_kind`` (the ID3/FLAC picture-type code; 3 = front cover),
    ``art_source``, and ``art_payload`` (binary — feed it straight to
    ``image_metadata`` / ``decode_image_features`` / ``image_dhash``).
    Files with no embedded art emit exactly one row with NULL art
    fields, keeping the per-file ledger honest (the
    ``video_subtitles`` posture). Row-local parse in one Arrow
    ``mapInPandas``; payload bytes never shuffle.
    """
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("art_idx", T.IntegerType()),
            T.StructField("art_mime", T.StringType()),
            T.StructField("art_kind", T.IntegerType()),
            T.StructField("art_source", T.StringType()),
            T.StructField("art_payload", T.BinaryType()),
        ]
    )

    def arts_of(p):
        if p is None:
            return None
        blob = bytes(p)
        for source, fn in _ART_PARSERS:
            try:
                got = fn(blob)
            except Exception:  # noqa: BLE001 - dirty payload -> next
                got = None
            if got:
                return source, got
        return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # fan-out via one positional take per batch instead of
            # re-boxing every column per row (wide media tables made
            # the old list(pdf.iloc[i]) loop the hot spot)
            take: list[int] = []
            art_idx: list = []
            mimes: list = []
            kinds: list = []
            sources: list = []
            arts_payload: list = []
            for i, p in enumerate(pdf[payload_col]):
                got = arts_of(p)
                if got is None:
                    take.append(i)
                    art_idx.append(None)
                    mimes.append(None)
                    kinds.append(None)
                    sources.append(None)
                    arts_payload.append(None)
                    continue
                source, arts = got
                for j, (mime, kind, img) in enumerate(arts):
                    take.append(i)
                    art_idx.append(j)
                    mimes.append(mime)
                    kinds.append(int(kind))
                    sources.append(source)
                    arts_payload.append(img)
            out = pdf.iloc[take].reset_index(drop=True)
            out["art_idx"] = art_idx
            out["art_mime"] = mimes
            out["art_kind"] = kinds
            out["art_source"] = sources
            out["art_payload"] = arts_payload
            yield out

    return df.mapInPandas(run, out_schema)

_CANON_COLS = ("title", "artist", "album", "date", "genre", "comment",
               "lyrics", "language")


def extract_media_tags(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Append embedded-tag columns to a binary media column:
    ``tag_title / tag_artist / tag_album / tag_date / tag_genre /
    tag_comment / tag_lyrics / tag_language`` (canonical fields,
    NULL when absent), ``tags_all`` (map of every decoded
    source-native key → value) and ``tag_source`` (``id3v2`` /
    ``id3v1`` / ``flac-vorbis`` / ``ogg-vorbis`` / ``ogg-opus`` /
    ``mp4-ilst``, NULL when no tag container is present).

    Container preference: ID3v2 > FLAC VorbisComment > Ogg comment
    header > MP4 ilst > ID3v1 (the weakest — fixed 30-byte latin-1
    fields). One Arrow-batched ``mapInPandas`` pass; payload bytes
    never shuffle. ``tag_lyrics`` (USLT / LYRICS / ©lyr) is real
    pretraining text and composes with ``curate_corpus`` the same way
    ``video_subtitles`` cues do.
    """
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(f"tag_{c}", T.StringType()) for c in _CANON_COLS]
        + [
            T.StructField(
                "tags_all", T.MapType(T.StringType(), T.StringType())
            ),
            T.StructField("tag_source", T.StringType()),
        ]
    )

    def one(p):
        if p is None:
            return (None,) * (len(_CANON_COLS) + 2)
        for parser in _PARSERS:
            try:
                got = parser(bytes(p))
            except Exception:  # noqa: BLE001 - dirty payload -> next
                got = None
            if got is None:
                continue
            canon, tags, source = got
            return tuple(canon.get(c) for c in _CANON_COLS) + (
                tags, source,
            )
        return (None,) * (len(_CANON_COLS) + 2)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f"tag_{c}" for c in _CANON_COLS] + [
            "tags_all", "tag_source",
        ]
        for pdf in batches:
            decoded = [one(p) for p in pdf[payload_col]]
            for i, c in enumerate(cols):
                pdf[c] = [d[i] for d in decoded]
            yield pdf

    return df.mapInPandas(run, out_schema)


def media_to_documents(
    df: DataFrame,
    payload_col: str = "content",
    path_col: str = "path",
    min_chars: int = 1,
) -> DataFrame:
    """Media corpus ingestion: ``binaryFile`` rows in, one document
    row out per file — ``(doc_id, url, text, title, artist, album,
    date, genre, language, extractor)`` — the shape
    ``warc_to_documents`` / ``pdf_to_documents`` feed
    ``curate_corpus``. ``text`` is the embedded lyrics (USLT /
    LYRICS / ©lyr — genuine pretraining text); files whose container
    parsed but carries no lyrics are KEPT with empty text under their
    honest ``extractor`` label (the tag source, or 'no-tags') so a
    ledger groupBy accounts for every input. The tag columns are
    entity keys for joins/dedup downstream.

    One Arrow-batched ``mapInPandas`` pass; payload bytes never
    shuffle (extraction is row-local, file-per-task from the
    binaryFile source).
    """
    from .dedup import md5_lane

    tagged = extract_media_tags(
        df.select(path_col, payload_col), payload_col
    )
    return tagged.select(
        md5_lane(F.col(path_col)).alias("doc_id"),
        F.col(path_col).alias("url"),
        F.when(
            F.length("tag_lyrics") >= min_chars, F.col("tag_lyrics")
        ).otherwise(F.lit("")).alias("text"),
        F.col("tag_title").alias("title"),
        F.col("tag_artist").alias("artist"),
        F.col("tag_album").alias("album"),
        F.col("tag_date").alias("date"),
        F.col("tag_genre").alias("genre"),
        F.col("tag_language").alias("language"),
        F.coalesce(F.col("tag_source"), F.lit("no-tags")).alias(
            "extractor"
        ),
    )
