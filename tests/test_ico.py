"""ICO/CUR favicon decode differentials
(`multimodal.py::_decode_ico`). Directory/DIB fixtures hand-packed
from the public Windows icon layout; the embedded-PNG case reuses the
established PNG encoder twin from test_analysis_multimodal.
"""
from __future__ import annotations

import struct

import numpy as np

from opencosmo_spark.pipeline.multimodal import (
    _decode_ico,
    _image_header_meta,
)


def _dib(px: np.ndarray, bpp: int, palette=None) -> bytes:
    """Headerless icon DIB: BITMAPINFOHEADER with DOUBLED height,
    bottom-up XOR rows, then an all-zero AND mask."""
    h, w = px.shape[:2]
    hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, 2 * h, 1, bpp, 0, 0, 0, 0,
        len(palette) if palette is not None else 0, 0,
    )
    body = b""
    if palette is not None:
        body += b"".join(
            bytes([b, g, r, 0]) for r, g, b in palette
        )
    stride = ((w * bpp + 31) // 32) * 4
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        if bpp == 32:
            row = b"".join(
                bytes([px[y, x, 2], px[y, x, 1], px[y, x, 0], 255])
                for x in range(w)
            )
        elif bpp == 24:
            row = b"".join(
                bytes([px[y, x, 2], px[y, x, 1], px[y, x, 0]])
                for x in range(w)
            )
        elif bpp == 8:
            row = bytes(int(v) for v in px[y])
        elif bpp == 4:
            vals = [int(v) for v in px[y]]
            if len(vals) % 2:
                vals.append(0)
            row = bytes(
                (vals[i] << 4) | vals[i + 1]
                for i in range(0, len(vals), 2)
            )
        else:  # 1-bit
            row = np.packbits(px[y].astype(np.uint8)).tobytes()
        rows.append(row.ljust(stride, b"\x00"))
    and_stride = ((w + 31) // 32) * 4
    return hdr + body + b"".join(rows) + b"\x00" * (and_stride * h)


def ico_file(images: list[bytes], dims: list[tuple[int, int]],
             kind=1) -> bytes:
    n = len(images)
    out = struct.pack("<HHH", 0, kind, n)
    offset = 6 + 16 * n
    dir_entries = b""
    for img, (w, h) in zip(images, dims):
        dir_entries += struct.pack(
            "<BBBBHHII", w % 256, h % 256, 0, 0, 1, 32, len(img),
            offset,
        )
        offset += len(img)
    return out + dir_entries + b"".join(images)


def _img(h, w, seed):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3)
    ).astype(np.uint8)


def test_ico_dib_32_and_24_bit():
    for bpp in (32, 24):
        px = _img(16, 16, bpp)
        data = ico_file([_dib(px, bpp)], [(16, 16)])
        np.testing.assert_array_equal(_decode_ico(data), px)


def test_ico_palette_depths():
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    for bpp, ncol in ((8, 256), (4, 16), (1, 2)):
        idx = rng.integers(0, ncol, (8, 8)).astype(np.uint8)
        data = ico_file(
            [_dib(idx, bpp, palette=pal[:ncol])], [(8, 8)]
        )
        got = _decode_ico(data)
        np.testing.assert_array_equal(got, pal[:ncol][idx])


def test_ico_embedded_png_and_largest_entry_wins():
    from test_analysis_multimodal import _make_png

    big = _img(32, 32, 1)
    small = _img(8, 8, 2)
    png_big = _make_png(big, 2, [0] * 32)
    data = ico_file(
        [_dib(small, 32), png_big], [(8, 8), (32, 32)]
    )
    np.testing.assert_array_equal(_decode_ico(data), big)


def test_cur_kind_and_256_sentinel():
    from test_analysis_multimodal import _make_png

    px = _img(256, 256, 4)
    data = ico_file([_make_png(px, 2, [0] * 256)], [(256, 256)],
                    kind=2)
    np.testing.assert_array_equal(_decode_ico(data), px)
    assert _image_header_meta(data) == ("ico", 256, 256)


def test_metadata_and_totality():
    px = _img(16, 16, 5)
    data = ico_file([_dib(px, 24)], [(16, 16)])
    assert _image_header_meta(data) == ("ico", 16, 16)
    assert _image_header_meta(b"\x00\x00\x03\x00xxxx" * 4) is None
    rng = np.random.default_rng(0)
    for _ in range(300):
        mut = bytearray(data)
        for _ in range(int(rng.integers(1, 6))):
            mut[int(rng.integers(0, len(mut)))] = int(
                rng.integers(0, 256)
            )
        try:
            _decode_ico(bytes(mut))
            _image_header_meta(bytes(mut))
        except Exception as exc:  # noqa: BLE001
            raise AssertionError("ico decoder escaped") from exc
    for cut in range(0, len(data), 13):
        _decode_ico(data[:cut])


def test_ladder_integration(spark):
    from opencosmo_spark.pipeline.multimodal import (
        decode_image_features,
        image_metadata,
    )

    px = _img(16, 16, 6)
    data = ico_file([_dib(px, 32)], [(16, 16)])
    df = spark.createDataFrame([("i", data)], "id string, payload binary")
    assert decode_image_features(df).toPandas().iloc[0].decoder == "ico"
    meta = image_metadata(df).toPandas().iloc[0]
    assert (meta.img_format, meta.img_width, meta.img_height) == (
        "ico", 16, 16,
    )


def test_truncated_dib_palette_declines():
    """A DIB header claiming 256 palette colours backed by only 3
    bytes (review-found crash: ``reshape(-1, 4)`` ValueError) must
    decline, not raise."""
    w = h = 4
    hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, 2 * h, 1, 8, 0, 0, 0, 0, 256, 0
    )
    img = hdr + b"\x01\x02\x03"
    data = ico_file([img], [(w, h)])
    assert _decode_ico(data) is None
