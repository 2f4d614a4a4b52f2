"""End-to-end example: the document/media corpus path — synthesize a
small mixed drop of PDFs (born-digital text + a scanned one) and a
subtitled video, then run the r13 ingestion surface: text extraction
with the honest per-file ledger, scanned-page image extraction into
the multimodal ladder, and subtitle-track text with zero codec work.

    python examples/document_media_pipeline.py [work_dir]

Every step is the public package API; the same calls run on a real
crawl bucket unchanged (binaryFile parallelizes file-per-task).
"""

import sys
import tempfile
import zlib
from pathlib import Path

import numpy as np

sys.path.insert(0, ".")

from opencosmo_spark import get_spark  # noqa: E402
from opencosmo_spark.pipeline import (  # noqa: E402
    image_metadata,
    pdf_to_documents,
    pdf_to_images,
    video_subtitles,
)
from opencosmo_spark.pipeline.multimodal import (  # noqa: E402
    decode_image_features,
)

WORK = Path(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp())


# --- tiny fixture builders (a crawler would hand us real files) ------

def text_pdf(lines):
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        4: b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
    }
    content = b" ".join(b"BT (%s) Tj ET" % ln for ln in lines)
    body = zlib.compress(content)
    objs[5] = (
        b"<< /Filter /FlateDecode /Length %d >>\nstream\n" % len(body)
        + body + b"\nendstream"
    )
    out = bytearray(b"%PDF-1.4\n")
    for n in sorted(objs):
        out += b"%d 0 obj\n" % n + objs[n] + b"\nendobj\n"
    out += b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    return bytes(out)


def scanned_pdf(gray_page: np.ndarray):
    h, w = gray_page.shape
    body = zlib.compress(gray_page.tobytes())
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        4: (b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R "
            b"/Resources << /XObject << /Im0 6 0 R >> >> >>"),
        5: b"<< /Length 11 >>\nstream\nq /Im0 Do Q\nendstream",
        6: (
            b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
            b"/ColorSpace /DeviceGray /BitsPerComponent 8 "
            b"/Filter /FlateDecode /Length %d >>\nstream\n"
            % (w, h, len(body)) + body + b"\nendstream"
        ),
    }
    out = bytearray(b"%PDF-1.4\n")
    for n in sorted(objs):
        out += b"%d 0 obj\n" % n + objs[n] + b"\nendobj\n"
    out += b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    return bytes(out)


def subtitled_mp4(cues, timescale=1000):
    def box(t, p):
        return (8 + len(p)).to_bytes(4, "big") + t + p

    samples, deltas = [], []
    for text, dur in cues:
        enc = text.encode()
        samples.append(len(enc).to_bytes(2, "big") + enc)
        deltas.append(dur)

    def moov(mdat_at):
        stsd = box(b"stsd", b"\x00" * 4 + (1).to_bytes(4, "big")
                   + box(b"tx3g", b"\x00" * 32))
        stts = box(b"stts", b"\x00" * 4 + len(deltas).to_bytes(4, "big")
                   + b"".join((1).to_bytes(4, "big") + d.to_bytes(4, "big")
                              for d in deltas))
        stsc = box(b"stsc", b"\x00" * 4 + (1).to_bytes(4, "big")
                   + (1).to_bytes(4, "big")
                   + len(samples).to_bytes(4, "big")
                   + (1).to_bytes(4, "big"))
        stsz = box(b"stsz", b"\x00" * 4 + (0).to_bytes(4, "big")
                   + len(samples).to_bytes(4, "big")
                   + b"".join(len(s).to_bytes(4, "big") for s in samples))
        stco = box(b"stco", b"\x00" * 4 + (1).to_bytes(4, "big")
                   + mdat_at.to_bytes(4, "big"))
        mdhd = box(b"mdhd", b"\x00" * 12 + timescale.to_bytes(4, "big")
                   + sum(deltas).to_bytes(4, "big") + b"\x00" * 4)
        hdlr = box(b"hdlr", b"\x00" * 8 + b"text" + b"\x00" * 12)
        mdia = box(b"mdia", mdhd + hdlr
                   + box(b"minf", box(b"stbl", stsd + stts + stsc
                                      + stsz + stco)))
        return box(b"moov", box(b"trak", mdia))

    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    m = moov(0)
    m = moov(len(ftyp) + len(m) + 8)
    return ftyp + m + box(b"mdat", b"".join(samples))


def main():
    spark = get_spark("document_media_pipeline")
    drop = WORK / "drop"
    drop.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    (drop / "paper.pdf").write_bytes(
        text_pdf([b"Deep learning for cosmology.",
                  b"We present a new method."])
    )
    (drop / "scan.pdf").write_bytes(
        scanned_pdf(rng.integers(0, 256, (24, 32), dtype=np.uint8))
    )
    files = spark.read.format("binaryFile").load(str(drop))

    # 1) per-file honest ledger + training text
    docs = pdf_to_documents(files)
    print("\n== pdf ledger ==")
    docs.select("url", "n_pages", "extractor").show(truncate=60)

    # 2) scanned pages -> multimodal corpus rows through the ladder
    imgs = pdf_to_images(files)
    print("== extracted page images ==")
    image_metadata(imgs).select(
        "media_id", "payload_format", "img_format", "img_width",
        "img_height",
    ).show(truncate=40)
    decode_image_features(imgs).select("media_id", "decoder").show()

    # 2b) thumbnails through the same ladder (native codecs first
    # where the system libraries load — see pipeline/native_codecs):
    # area-average resize, lossless PNG back out
    from opencosmo_spark.pipeline import image_thumbnail

    print("== thumbnails ==")
    image_thumbnail(imgs, max_side=16).select(
        "media_id", "thumb_width", "thumb_height", "decoder"
    ).show(truncate=40)

    # 3) subtitle tracks -> timed text rows (zero codec work)
    from pyspark.sql import functions as F

    video = spark.createDataFrame(
        [("clip-1", subtitled_mp4([("Hello there.", 2000),
                                   ("General Kenobi!", 1500)]))],
        "media_id string, payload binary",
    )
    cues = video_subtitles(video)
    print("== subtitle cues ==")
    cues.show(truncate=40)
    text = cues.filter(F.col("text").isNotNull()).groupBy("media_id").agg(
        F.concat_ws("\n", F.collect_list("text")).alias("text")
    )
    print("== per-video training text ==")
    text.show(truncate=60)

    # 4) audio drop: real PCM features + embedded-tag text
    import struct

    from opencosmo_spark.pipeline import media_to_documents
    from opencosmo_spark.pipeline.multimodal import decode_audio_features

    audio = WORK / "audio"
    audio.mkdir(parents=True, exist_ok=True)
    tone = (12000 * np.sin(2 * np.pi * 440 * np.arange(8000) / 8000))
    au = (struct.pack(">4sIIIII", b".snd", 28, 16000, 3, 8000, 1)
          + b"\x00" * 4 + tone.astype(">i2").tobytes())
    (audio / "tone.au").write_bytes(au)

    def ss(v):  # ID3v2 syncsafe size
        return bytes([(v >> 21) & 0x7F, (v >> 14) & 0x7F,
                      (v >> 7) & 0x7F, v & 0x7F])

    lyric = b"\x00eng\x00Twinkle twinkle little star."
    frames = (b"TIT2" + len(b"\x00A Song").to_bytes(4, "big")
              + b"\x00\x00" + b"\x00A Song"
              + b"USLT" + len(lyric).to_bytes(4, "big") + b"\x00\x00"
              + lyric)
    # a real MPEG1 Layer III 128 kbps 44.1 kHz frame chain (417-byte
    # frames) so the metadata tier reports true duration
    mp3_frames = (b"\xff\xfb\x90\x00" + b"\x00" * 413) * 3
    (audio / "tagged.mp3").write_bytes(
        b"ID3\x03\x00\x00" + ss(len(frames)) + frames + mp3_frames
    )
    drops = spark.read.format("binaryFile").load(str(audio))
    print("== audio decode ledger ==")
    decode_audio_features(drops, payload_col="content").select(
        "path", "decoder", "sample_rate", "audio_duration_ms", "rms"
    ).show(truncate=40)
    print("== tag documents (lyrics as training text) ==")
    media_to_documents(drops).select(
        "url", "title", "extractor", "text"
    ).show(truncate=44)
    spark.stop()


if __name__ == "__main__":
    main()
