"""Embedded media-tag extraction differentials
(`opencosmo_spark/pipeline/mediatags.py`). All fixtures are hand-built
from the public specs (id3.org ID3v1/v2, Xiph VorbisComment,
ISO-BMFF ilst) — independent of the parser's internals.
"""
from __future__ import annotations

import numpy as np

from opencosmo_spark.pipeline.mediatags import (
    _parse_flac_tags,
    _parse_id3v1,
    _parse_id3v2,
    _parse_mp4_tags,
    _parse_ogg_tags,
    extract_media_tags,
)


# ------------------------------------------------------------ builders

def _ss(v: int) -> bytes:
    """4-byte syncsafe integer."""
    return bytes([(v >> 21) & 0x7F, (v >> 14) & 0x7F,
                  (v >> 7) & 0x7F, v & 0x7F])


def id3v2(frames: list[tuple[str, bytes]], major=3, pad=16,
          unsync=False) -> bytes:
    body = b""
    for fid, content in frames:
        if major == 2:
            body += fid.encode() + len(content).to_bytes(3, "big") + content
        elif major == 3:
            body += (fid.encode() + len(content).to_bytes(4, "big")
                     + b"\x00\x00" + content)
        else:
            body += fid.encode() + _ss(len(content)) + b"\x00\x00" + content
    body += b"\x00" * pad
    flags = 0x80 if unsync else 0
    if unsync and major in (2, 3):
        body = body.replace(b"\xff", b"\xff\x00")
    return b"ID3" + bytes([major, 0, flags]) + _ss(len(body)) + body


def t_frame(text: str, enc=0) -> bytes:
    codecs = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}
    return bytes([enc]) + text.encode(codecs[enc])


def lang_frame(lang: str, desc: str, text: str, enc=0) -> bytes:
    if enc == 1:
        return (bytes([enc]) + lang.encode()
                + desc.encode("utf-16") + b"\x00\x00"
                + text.encode("utf-16"))
    return (bytes([enc]) + lang.encode() + desc.encode("latin-1")
            + b"\x00" + text.encode("latin-1"))


def id3v1(title="", artist="", album="", year="", comment="",
          genre=255, track=None) -> bytes:
    def f(s, n):
        return s.encode("latin-1")[:n].ljust(n, b"\x00")

    out = b"TAG" + f(title, 30) + f(artist, 30) + f(album, 30) + f(year, 4)
    if track is not None:
        out += f(comment, 28) + b"\x00" + bytes([track])
    else:
        out += f(comment, 30)
    return out + bytes([genre])


def vorbis_block(pairs: list[tuple[str, str]],
                 vendor=b"test vendor") -> bytes:
    out = len(vendor).to_bytes(4, "little") + vendor
    out += len(pairs).to_bytes(4, "little")
    for k, v in pairs:
        entry = f"{k}={v}".encode()
        out += len(entry).to_bytes(4, "little") + entry
    return out


def flac_with_tags(pairs) -> bytes:
    streaminfo = b"\x00" * 10 + (
        (44100 << 44) | (1 << 41) | (15 << 36) | 1000
    ).to_bytes(8, "big") + b"\x00" * 16
    vc = vorbis_block(pairs)
    return (b"fLaC"
            + bytes([0]) + len(streaminfo).to_bytes(3, "big") + streaminfo
            + bytes([0x80 | 4]) + len(vc).to_bytes(3, "big") + vc)


def ogg_page(body: bytes, seq=0, first=True, granule=0) -> bytes:
    segs = []
    rem = len(body)
    while rem >= 255:
        segs.append(255)
        rem -= 255
    segs.append(rem)
    hdr = (b"OggS\x00" + (b"\x02" if first and seq == 0 else b"\x00")
           + granule.to_bytes(8, "little")
           + b"\x01\x00\x00\x00"  # serial
           + seq.to_bytes(4, "little")
           + b"\x00" * 4  # crc unchecked
           + bytes([len(segs)]) + bytes(segs))
    return hdr + body


def ogg_vorbis_with_tags(pairs, split=False) -> bytes:
    ident = b"\x01vorbis" + bytes([0, 0, 0, 0]) + b"\x02" + \
        (44100).to_bytes(4, "little") + b"\x00" * 16
    comment = b"\x03vorbis" + vorbis_block(pairs)
    if split:
        mid = len(comment) // 2
        return (ogg_page(ident, 0) + ogg_page(comment[:mid], 1)
                + ogg_page(comment[mid:], 2))
    return ogg_page(ident, 0) + ogg_page(comment, 1)


def box(btype: bytes, payload: bytes) -> bytes:
    return (8 + len(payload)).to_bytes(4, "big") + btype + payload


def mp4_with_tags(items: list[tuple[bytes, bytes]]) -> bytes:
    ilst = b"".join(
        box(name, box(b"data",
                      (1 if not name == b"gnre" else 0).to_bytes(4, "big")
                      + b"\x00" * 4 + val))
        for name, val in items
    )
    meta = b"\x00" * 4 + box(b"ilst", ilst)  # meta is a FULL box
    moov = box(b"moov", box(b"udta", box(b"meta", meta)))
    return box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov


# -------------------------------------------------------------- tests

def test_id3v23_text_and_lang_frames():
    data = id3v2([
        ("TIT2", t_frame("A Title")),
        ("TPE1", t_frame("Some Artist")),
        ("TALB", t_frame("The Album")),
        ("TYER", t_frame("1997")),
        ("TCON", t_frame("Jazz")),
        ("COMM", lang_frame("eng", "", "a comment")),
        ("USLT", lang_frame("deu", "desc", "line one of the lyrics")),
    ]) + b"\xff\xfb\x90" + b"\x00" * 40  # mp3-ish junk after the tag
    canon, tags, source = _parse_id3v2(data)
    assert source == "id3v2"
    assert canon["title"] == "A Title"
    assert canon["artist"] == "Some Artist"
    assert canon["album"] == "The Album"
    assert canon["date"] == "1997"
    assert canon["genre"] == "Jazz"
    assert canon["comment"] == "a comment"
    assert canon["lyrics"] == "line one of the lyrics"
    assert canon["language"] == "eng"  # first lang frame wins
    assert tags["TIT2"] == "A Title"


def test_id3v24_syncsafe_utf8_multivalue():
    data = id3v2([
        ("TIT2", t_frame("Ünïcode title", enc=3)),
        ("TPE1", bytes([3]) + "first\x00second".encode()),
        ("TDRC", t_frame("2004-06-01", enc=3)),
    ], major=4)
    canon, tags, _ = _parse_id3v2(data)
    assert canon["title"] == "Ünïcode title"
    assert canon["artist"] == "first; second"
    assert canon["date"] == "2004-06-01"


def test_id3v22_three_byte_frames():
    data = id3v2([
        ("TT2", t_frame("Old Title")),
        ("TP1", t_frame("Old Artist")),
        ("ULT", lang_frame("fra", "", "vieux paroles")),
    ], major=2)
    canon, _, _ = _parse_id3v2(data)
    assert canon["title"] == "Old Title"
    assert canon["artist"] == "Old Artist"
    assert canon["lyrics"] == "vieux paroles"
    assert canon["language"] == "fra"


def test_id3v2_utf16_bom_text():
    data = id3v2([("TIT2", t_frame("utf sixteen ✓", enc=1))])
    canon, _, _ = _parse_id3v2(data)
    assert canon["title"] == "utf sixteen ✓"


def test_id3v2_unsynchronisation():
    # 0xFF bytes inside UTF-16 text force FF 00 stuffing when the
    # unsync flag is set; the parser must undo it
    data = id3v2([("TIT2", t_frame("ÿÿ title", enc=1))], unsync=True)
    canon, _, _ = _parse_id3v2(data)
    assert canon["title"] == "ÿÿ title"


def test_id3v1_and_v1_1():
    data = b"\xff\xfb" * 100 + id3v1(
        "Tail Title", "Tail Artist", "Tail Album", "1989",
        "short comment", genre=17, track=None,
    )
    canon, tags, source = _parse_id3v1(data)
    assert source == "id3v1"
    assert canon == {
        "title": "Tail Title", "artist": "Tail Artist",
        "album": "Tail Album", "date": "1989",
        "comment": "short comment", "genre": "Rock",
    }
    v11 = b"junk" + id3v1("T", comment="c", genre=8, track=7)
    canon2, _, _ = _parse_id3v1(v11)
    assert canon2["genre"] == "Jazz"
    assert canon2["comment"] == "c"
    assert _parse_id3v1(b"no tag here" * 20) is None


def test_flac_vorbis_comment_block():
    data = flac_with_tags([
        ("TITLE", "Flac Song"), ("ARTIST", "Flac Band"),
        ("DATE", "2011"), ("GENRE", "Ambient"),
        ("LYRICS", "la la la"), ("CUSTOMKEY", "kept in tags_all"),
    ])
    canon, tags, source = _parse_flac_tags(data)
    assert source == "flac-vorbis"
    assert canon["title"] == "Flac Song"
    assert canon["artist"] == "Flac Band"
    assert canon["lyrics"] == "la la la"
    assert tags["CUSTOMKEY"] == "kept in tags_all"
    assert _parse_flac_tags(b"fLaC") is None


def test_ogg_vorbis_tags_including_page_split():
    pairs = [("TITLE", "Ogg Song"), ("ARTIST", "Ogg Band"),
             ("DESCRIPTION", "a description"),
             ("LANGUAGE", "en")]
    for split in (False, True):
        canon, tags, source = _parse_ogg_tags(
            ogg_vorbis_with_tags(pairs, split=split)
        )
        assert source == "ogg-vorbis", f"split={split}"
        assert canon["title"] == "Ogg Song"
        assert canon["comment"] == "a description"
        assert canon["language"] == "en"


def test_opus_tags():
    ident = b"OpusHead" + bytes([1, 2]) + (312).to_bytes(2, "little") + \
        (48000).to_bytes(4, "little") + b"\x00" * 3
    comment = b"OpusTags" + vorbis_block([("TITLE", "Opus Song")])
    data = ogg_page(ident, 0) + ogg_page(comment, 1)
    canon, _, source = _parse_ogg_tags(data)
    assert source == "ogg-opus"
    assert canon["title"] == "Opus Song"


def test_mp4_ilst_atoms():
    data = mp4_with_tags([
        (b"\xa9nam", "Mp4 Title".encode()),
        (b"\xa9ART", "Mp4 Artist".encode()),
        (b"\xa9day", b"2015-03-02"),
        (b"\xa9lyr", "mp4 lyrics text".encode()),
        (b"gnre", (18).to_bytes(2, "big")),  # 1-based -> index 17 Rock
    ])
    canon, tags, source = _parse_mp4_tags(data)
    assert source == "mp4-ilst"
    assert canon["title"] == "Mp4 Title"
    assert canon["artist"] == "Mp4 Artist"
    assert canon["date"] == "2015-03-02"
    assert canon["lyrics"] == "mp4 lyrics text"
    assert canon["genre"] == "Rock"
    assert tags["\xa9nam"] == "Mp4 Title"


def test_source_priority_id3v2_over_id3v1():
    payload = id3v2([("TIT2", t_frame("Modern"))]) + b"x" * 50 + id3v1(
        "Legacy", genre=0
    )
    from opencosmo_spark.pipeline.mediatags import _PARSERS

    for parser in _PARSERS:
        got = parser(payload)
        if got is not None:
            break
    assert got[2] == "id3v2" and got[0]["title"] == "Modern"


def test_totality_on_mutations():
    rng = np.random.default_rng(5)
    seeds = [
        id3v2([("TIT2", t_frame("t")), ("USLT", lang_frame("eng", "", "l"))]),
        flac_with_tags([("TITLE", "t")]),
        ogg_vorbis_with_tags([("TITLE", "t")]),
        mp4_with_tags([(b"\xa9nam", b"t")]),
        id3v1("t", genre=1),
    ]
    parsers = (_parse_id3v2, _parse_flac_tags, _parse_ogg_tags,
               _parse_mp4_tags, _parse_id3v1)
    for seed in seeds:
        for _ in range(150):
            mut = bytearray(seed)
            for _ in range(int(rng.integers(1, 6))):
                mut[int(rng.integers(0, len(mut)))] = int(
                    rng.integers(0, 256)
                )
            blob = bytes(mut)
            for parse in parsers:
                try:
                    parse(blob)
                except Exception as exc:  # noqa: BLE001
                    raise AssertionError(
                        f"{parse.__name__} escaped on mutated seed"
                    ) from exc
        for cut in range(0, len(seed), max(1, len(seed) // 16)):
            for parse in parsers:
                parse(bytes(seed[:cut]))


def test_extract_media_tags_operator(spark):
    rows = [
        ("mp3", id3v2([
            ("TIT2", t_frame("Spark Song")),
            ("USLT", lang_frame("eng", "", "these are lyrics")),
        ]) + b"\xff\xfb" * 20),
        ("flac", flac_with_tags([("TITLE", "Flac Spark"),
                                 ("ARTIST", "FB")])),
        ("ogg", ogg_vorbis_with_tags([("TITLE", "Ogg Spark")])),
        ("m4a", mp4_with_tags([(b"\xa9nam", b"Mp4 Spark")])),
        ("v1", b"\x00" * 100 + id3v1("V1 Spark", genre=13)),
        ("junk", b"not a media file at all"),
        ("null", None),
    ]
    df = spark.createDataFrame(rows, "id string, payload binary")
    out = extract_media_tags(df).toPandas().set_index("id")
    assert out.loc["mp3"].tag_title == "Spark Song"
    assert out.loc["mp3"].tag_lyrics == "these are lyrics"
    assert out.loc["mp3"].tag_source == "id3v2"
    assert out.loc["flac"].tag_title == "Flac Spark"
    assert out.loc["flac"].tag_source == "flac-vorbis"
    assert out.loc["ogg"].tag_title == "Ogg Spark"
    assert out.loc["m4a"].tag_title == "Mp4 Spark"
    assert out.loc["v1"].tag_title == "V1 Spark"
    assert out.loc["v1"].tag_genre == "Pop"
    assert out.loc["junk"].tag_source is None
    assert out.loc["junk"].tag_title is None
    assert out.loc["null"].tag_source is None
    # tags_all carries the source-native keys
    assert out.loc["flac"].tags_all["ARTIST"] == "FB"


def test_real_flac_payload_tags_and_pcm_coexist(spark):
    """A FLAC file with both audio frames and a VorbisComment block:
    tags extract AND the native PCM decoder still decodes (the tag
    block sits between STREAMINFO and the frames)."""
    from test_flac import flac_file
    from opencosmo_spark.pipeline.flac import decode_flac_samples

    sig = list(range(-50, 50)) * 2
    base = flac_file([[sig]], 8000, 16, bs_mode="explicit8",
                     specs=[[{"type": "verbatim"}]])
    # splice a VorbisComment block in: clear the last-block flag on
    # STREAMINFO (byte 4), insert the comment block after it
    vc = vorbis_block([("TITLE", "Dual")])
    si_size = int.from_bytes(base[5:8], "big")
    cut = 8 + si_size
    data = (base[:4] + bytes([base[4] & 0x7F]) + base[5:cut]
            + bytes([0x80 | 4]) + len(vc).to_bytes(3, "big") + vc
            + base[cut:])
    canon, _, _ = _parse_flac_tags(data)
    assert canon["title"] == "Dual"
    samples, rate, _ = decode_flac_samples(data)
    assert rate == 8000 and list(samples[:, 0]) == sig


def test_media_to_documents_composes_with_curate(spark, tmp_path):
    """media_to_documents output slots into curate_corpus exactly
    like pdf_to_documents: lyric-bearing files survive the quality
    gate, tag-less or lyric-less files fall at it but stay countable
    in the ledger."""
    from opencosmo_spark.pipeline.curate import curate_corpus
    from opencosmo_spark.pipeline.mediatags import media_to_documents

    lyrics = ("The quick brown fox jumps over the lazy dog. "
              "It then naps in the warm afternoon sun for hours.")
    d = tmp_path / "media"
    d.mkdir()
    (d / "song.mp3").write_bytes(
        id3v2([("TIT2", t_frame("Song")),
               ("USLT", lang_frame("eng", "", lyrics))]) + b"\xff" * 64
    )
    (d / "instrumental.flac").write_bytes(
        flac_with_tags([("TITLE", "No Words")])
    )
    (d / "junk.bin").write_bytes(b"not media" * 10)
    src = spark.read.format("binaryFile").load(str(d))
    docs = media_to_documents(src)
    pdf = docs.toPandas().set_index("url")
    assert len(pdf) == 3
    song = pdf[pdf.index.str.endswith("song.mp3")].iloc[0]
    assert song.text == lyrics and song.extractor == "id3v2"
    inst = pdf[pdf.index.str.endswith("instrumental.flac")].iloc[0]
    assert inst.text == "" and inst.extractor == "flac-vorbis"
    assert inst.title == "No Words"
    junk = pdf[pdf.index.str.endswith("junk.bin")].iloc[0]
    assert junk.extractor == "no-tags"
    kept, counts = curate_corpus(
        docs.select("doc_id", "url", "text"), min_tokens=5
    )
    rows = kept.toPandas()
    assert len(rows) == 1 and rows.url.iloc[0].endswith("song.mp3")


# ---------------------------------------------------- cover art

def apic_frame(mime: str, kind: int, img: bytes, enc=0,
               desc=b"") -> bytes:
    return (bytes([enc]) + mime.encode() + b"\x00" + bytes([kind])
            + desc + (b"\x00\x00" if enc in (1, 2) else b"\x00") + img)


def flac_picture_block(mime: str, kind: int, img: bytes) -> bytes:
    m = mime.encode()
    return (kind.to_bytes(4, "big") + len(m).to_bytes(4, "big") + m
            + (0).to_bytes(4, "big")  # empty description
            + b"\x00" * 16  # w/h/depth/ncolors
            + len(img).to_bytes(4, "big") + img)


def test_id3_apic_and_pic_art():
    from opencosmo_spark.pipeline.mediatags import _id3_art

    png = b"\x89PNG\r\n\x1a\nfakepixels"
    jpg = b"\xff\xd8\xff\xe0fakejpeg"
    data = id3v2([
        ("TIT2", t_frame("T")),
        ("APIC", apic_frame("image/png", 3, png)),
        ("APIC", apic_frame("image/jpeg", 4, jpg, enc=1,
                            desc="desc ✓".encode("utf-16"))),
    ])
    arts = _id3_art(data)
    assert arts == [("image/png", 3, png), ("image/jpeg", 4, jpg)]
    # v2.2 PIC with 3-char format
    pic = (b"\x00" + b"PNG" + bytes([3]) + b"\x00" + png)
    data2 = id3v2([("PIC", pic)], major=2)
    assert _id3_art(data2) == [("image/png", 3, png)]
    assert _id3_art(id3v2([("TIT2", t_frame("x"))])) is None


def test_flac_and_ogg_picture_blocks():
    import base64

    from opencosmo_spark.pipeline.mediatags import _flac_art, _ogg_art

    img = b"\xff\xd8\xff\xe0" + bytes(range(64))
    block = flac_picture_block("image/jpeg", 3, img)
    streaminfo = b"\x00" * 10 + (
        (44100 << 44) | (15 << 36) | 100
    ).to_bytes(8, "big") + b"\x00" * 16
    flac = (b"fLaC" + bytes([0]) + len(streaminfo).to_bytes(3, "big")
            + streaminfo
            + bytes([0x80 | 6]) + len(block).to_bytes(3, "big") + block)
    assert _flac_art(flac) == [("image/jpeg", 3, img)]
    ogg = ogg_vorbis_with_tags([
        ("TITLE", "x"),
        ("METADATA_BLOCK_PICTURE",
         base64.b64encode(block).decode()),
    ])
    assert _ogg_art(ogg) == [("image/jpeg", 3, img)]


def test_mp4_covr_art():
    from opencosmo_spark.pipeline.mediatags import _mp4_art

    jpg = b"\xff\xd8\xff\xe0cover"
    ilst = box(b"covr", box(b"data",
                            (13).to_bytes(4, "big") + b"\x00" * 4 + jpg))
    meta = b"\x00" * 4 + box(b"ilst", ilst)
    moov = box(b"moov", box(b"udta", box(b"meta", meta)))
    data = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov
    assert _mp4_art(data) == [("image/jpeg", 3, jpg)]


def test_extract_media_art_operator_feeds_image_ladder(spark):
    from test_analysis_multimodal import _make_png

    from opencosmo_spark.pipeline.mediatags import extract_media_art
    from opencosmo_spark.pipeline.multimodal import image_metadata

    px = np.random.default_rng(1).integers(
        0, 256, (12, 10, 3)
    ).astype(np.uint8)
    real_png = _make_png(px, 2, [0] * 12)
    rows = [
        ("song", id3v2([("APIC", apic_frame("image/png", 3,
                                            real_png))])),
        ("bare", id3v2([("TIT2", t_frame("no art"))])),
        ("junk", b"nothing here"),
    ]
    df = spark.createDataFrame(rows, "id string, payload binary")
    out = extract_media_art(df)
    pdf = out.toPandas().set_index("id")
    assert pdf.loc["song"].art_source == "id3v2"
    assert pdf.loc["song"].art_mime == "image/png"
    assert pdf.loc["bare"].art_source is None  # honest NULL-art row
    assert pdf.loc["junk"].art_source is None
    assert len(pdf) == 3
    # the art payload is a REAL image: route it through the ladder
    arts = out.filter("art_payload is not null").selectExpr(
        "id", "art_payload as payload"
    )
    meta = image_metadata(arts).toPandas().iloc[0]
    assert (meta.img_format, meta.img_width, meta.img_height) == (
        "png", 10, 12,
    )


def _id3v2_flagged(frames, major, pad=16):
    """Like ``id3v2`` but frames are (fid, content, fflags)."""
    body = b""
    for fid, content, fflags in frames:
        sz = (_ss(len(content)) if major == 4
              else len(content).to_bytes(4, "big"))
        body += fid.encode() + sz + fflags.to_bytes(2, "big") + content
    body += b"\x00" * pad
    return b"ID3" + bytes([major, 0, 0]) + _ss(len(body)) + body


def test_id3v23_compressed_flag_masks():
    """v2.3 compressed/encrypted flags live at 0x0080/0x0040, not
    0x0C (review-found: they were parsed as plain text). A v2.3
    frame with 0x0C set is NEITHER compressed nor encrypted (those
    bits are grouping/unused there) and must still parse."""
    data = _id3v2_flagged(
        [("TIT2", t_frame("skipme"), 0x0080),   # compressed: skip
         ("TPE1", t_frame("keepme"), 0x0000),
         ("TALB", t_frame("also"), 0x000C)],    # v2.3: not comp/enc
        major=3,
    )
    canon, _, _ = _parse_id3v2(data)
    assert canon["artist"] == "keepme"
    assert canon["album"] == "also"
    assert "title" not in canon


def test_id3v24_compressed_flag_and_dli():
    """v2.4 compressed/encrypted at 0x0008/0x0004; flag 0x0001 means
    a 4-byte data-length indicator prefixes the body (review-found:
    it leaked into the text)."""
    body = t_frame("clean")
    data = _id3v2_flagged(
        [("TIT2", t_frame("skipme"), 0x0008),   # compressed: skip
         ("TPE1", _ss(len(body)) + body, 0x0001)],  # DLI stripped
        major=4,
    )
    canon, _, _ = _parse_id3v2(data)
    assert canon["artist"] == "clean"
    assert "title" not in canon
