"""AIFF/AIFF-C and Sun .au decode differentials
(`multimodal.py::_decode_aiff`, `_decode_au`). Fixtures hand-built
from the public EA-IFF-85 / NeXT header layouts with struct packing —
independent of the parsers. PCM codings are lossless, so round-trips
assert exact sample equality.
"""
from __future__ import annotations

import struct

import numpy as np

from opencosmo_spark.pipeline.multimodal import (
    _decode_aiff,
    _decode_au,
    _f80,
)


def f80(x: float) -> bytes:
    """Independent 80-bit extended-float encoder (sign, 15-bit
    exponent, explicit-integer-bit 64-bit mantissa)."""
    if x == 0:
        return b"\x00" * 10
    sign = 0x8000 if x < 0 else 0
    x = abs(x)
    exp = 16383 + 63
    m = int(x)
    assert m == x, "test rates are integers"
    while m < (1 << 63):
        m <<= 1
        exp -= 1
    while m >= (1 << 64):
        m >>= 1
        exp += 1
    return struct.pack(">HQ", sign | exp, m)


def aiff_file(chans, rate, bits, comp=None, extra_chunk=False) -> bytes:
    nch = len(chans)
    nframes = len(chans[0])
    inter = np.array(chans, dtype=np.int64).T.reshape(-1)
    if comp in (None, b"NONE"):
        if bits == 8:
            raw = inter.astype(np.int8).tobytes()
        elif bits == 16:
            raw = inter.astype(">i2").tobytes()
        elif bits == 24:
            raw = b"".join(
                int(v).to_bytes(3, "big", signed=True) for v in inter
            )
        else:
            raw = inter.astype(">i4").tobytes()
    elif comp == b"sowt":
        raw = inter.astype("<i2").tobytes()
    elif comp == b"fl32":
        raw = (inter.astype(np.float64) / 32768.0).astype(
            ">f4"
        ).tobytes()
    else:
        raise AssertionError(comp)
    is_aifc = comp is not None
    comm = struct.pack(">HIH", nch, nframes, bits) + f80(rate)
    if is_aifc:
        comm += comp + b"\x00\x00"  # pascal-string compression name
    body = b"COMM" + len(comm).to_bytes(4, "big") + comm
    if len(comm) % 2:
        body += b"\x00"
    if extra_chunk:  # unknown chunks must be skipped
        body += b"ANNO" + (5).to_bytes(4, "big") + b"hello\x00"
    ssnd = struct.pack(">II", 0, 0) + raw
    body += b"SSND" + len(ssnd).to_bytes(4, "big") + ssnd
    form_type = b"AIFC" if is_aifc else b"AIFF"
    return b"FORM" + (4 + len(body)).to_bytes(4, "big") + form_type + body


def au_file(chans, rate, enc, raw=None, unknown_size=False) -> bytes:
    nch = len(chans)
    inter = np.array(chans, dtype=np.int64).T.reshape(-1)
    if raw is None:
        if enc == 2:
            raw = inter.astype(np.int8).tobytes()
        elif enc == 3:
            raw = inter.astype(">i2").tobytes()
        elif enc == 4:
            raw = b"".join(
                int(v).to_bytes(3, "big", signed=True) for v in inter
            )
        elif enc == 5:
            raw = inter.astype(">i4").tobytes()
        else:
            raise AssertionError(enc)
    size = 0xFFFFFFFF if unknown_size else len(raw)
    hdr = struct.pack(">4sIIIII", b".snd", 28, size, enc, rate, nch)
    return hdr + b"\x00\x00\x00\x00" + raw  # 4 annotation bytes


def _sig(n, seed, lo=-20000, hi=20000):
    return np.random.default_rng(seed).integers(lo, hi, n).tolist()


def test_f80_roundtrip():
    for rate in (8000, 11025, 22050, 44100, 48000, 96000):
        assert _f80(f80(rate)) == rate
    assert _f80(b"\x00" * 10) == 0.0


def test_aiff_pcm_bit_depths():
    for bits, scale in ((8, 128.0), (16, 32768.0), (24, 8388608.0),
                        (32, 2147483648.0)):
        lim = int(scale / 2)
        sig = _sig(200, bits, -lim, lim)
        got = _decode_aiff(aiff_file([sig], 44100, bits))
        assert got is not None
        mono, rate = got
        assert rate == 44100
        np.testing.assert_allclose(
            mono, np.array(sig, dtype=np.float64) / scale, atol=1e-9
        )


def test_aiff_stereo_mixdown_and_unknown_chunk():
    l, r = _sig(128, 1), _sig(128, 2)
    got = _decode_aiff(aiff_file([l, r], 22050, 16, extra_chunk=True))
    mono, rate = got
    want = (np.array(l) + np.array(r)) / 2.0 / 32768.0
    np.testing.assert_allclose(mono, want, atol=1e-7)


def test_aifc_sowt_and_fl32():
    sig = _sig(150, 3)
    mono, rate = _decode_aiff(aiff_file([sig], 48000, 16, comp=b"sowt"))
    assert rate == 48000
    np.testing.assert_allclose(mono, np.array(sig) / 32768.0, atol=1e-7)
    mono2, _ = _decode_aiff(aiff_file([sig], 48000, 16, comp=b"fl32"))
    np.testing.assert_allclose(mono2, np.array(sig) / 32768.0,
                               atol=1e-6)


def test_aifc_compressed_coding_declined():
    sig = _sig(64, 4)
    data = aiff_file([sig], 44100, 16, comp=b"sowt")
    # rewrite the compression code to a genuinely compressed one
    data = data.replace(b"sowt", b"ima4")
    assert _decode_aiff(data) is None


def test_au_encodings():
    for enc, scale in ((2, 128.0), (3, 32768.0), (4, 8388608.0),
                       (5, 2147483648.0)):
        lim = int(scale / 2)
        sig = _sig(180, enc, -lim, lim)
        got = _decode_au(au_file([sig], 16000, enc))
        assert got is not None
        mono, rate = got
        assert rate == 16000
        np.testing.assert_allclose(
            mono, np.array(sig, dtype=np.float64) / scale, atol=1e-9
        )


def test_au_mulaw_against_wav_mulaw():
    """The same mu-law byte stream must decode identically through
    the .au path and the established WAV G.711 path."""
    from opencosmo_spark.pipeline.multimodal import _MULAW_TABLE

    raw = bytes(range(256))
    got = _decode_au(au_file([[0]], 8000, 1, raw=raw))
    mono, rate = got
    np.testing.assert_array_equal(
        mono, _MULAW_TABLE[np.frombuffer(raw, np.uint8)]
    )


def test_au_unknown_size_and_stereo():
    l, r = _sig(90, 5), _sig(90, 6)
    got = _decode_au(au_file([l, r], 44100, 3, unknown_size=True))
    mono, rate = got
    assert len(mono) == 90
    want = (np.array(l) + np.array(r)) / 2.0 / 32768.0
    np.testing.assert_allclose(mono, want, atol=1e-7)


def test_totality_and_ladder(spark):
    from opencosmo_spark.pipeline.multimodal import decode_audio_features

    sig = [int(9000 * np.sin(2 * np.pi * 440 * i / 8000))
           for i in range(400)]
    aiff = aiff_file([sig], 8000, 16)
    au = au_file([sig], 8000, 3)
    rng = np.random.default_rng(0)
    for seed in (aiff, au):
        for _ in range(200):
            mut = bytearray(seed)
            for _ in range(int(rng.integers(1, 6))):
                mut[int(rng.integers(0, len(mut)))] = int(
                    rng.integers(0, 256)
                )
            _decode_aiff(bytes(mut))
            _decode_au(bytes(mut))
        for cut in range(0, len(seed), 37):
            _decode_aiff(bytes(seed[:cut]))
            _decode_au(bytes(seed[:cut]))
    df = spark.createDataFrame(
        [("aiff", aiff), ("au", au)], "id string, payload binary"
    )
    out = decode_audio_features(df).toPandas().set_index("id")
    want = np.sqrt(np.mean((np.array(sig) / 32768.0) ** 2))
    for key in ("aiff", "au"):
        assert out.loc[key].decoder == key
        assert out.loc[key].sample_rate == 8000
        assert abs(out.loc[key].rms - want) < 1e-6


def test_f80_corrupt_exponent_declines():
    """Fuzz-found: a corrupt rate field with a huge exponent must
    decline (0.0 -> decoder returns None), not raise OverflowError."""
    assert _f80(b"\x7f\xfe" + b"\xff" * 8) == 0.0
    assert _f80(b"\x00\x01" + b"\xff" * 8) == 0.0
    # a normal rate still round-trips
    assert _f80(f80(44100)) == 44100
