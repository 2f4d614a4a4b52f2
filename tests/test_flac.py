"""FLAC decoder differentials (`opencosmo_spark/pipeline/flac.py`).

The encoder twin below is written independently from the decoder,
straight from the public spec (RFC 9639): its own bit writer, its own
bit-by-bit CRCs (the decoder uses table-driven CRCs), and residuals
computed with the direct polynomial predictor formula (the decoder
reconstructs fixed orders via iterated cumsum) — so a shared
misreading of the spec would have to be made twice in different
forms to slip through the bit-exact round-trips.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pytest

from opencosmo_spark.pipeline.flac import decode_flac, decode_flac_samples


# --------------------------------------------------------------- twin

class _W:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, v: int, n: int):
        assert 0 <= v < (1 << n), (v, n)
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def s(self, v: int, n: int):
        assert -(1 << (n - 1)) <= v < (1 << (n - 1)), (v, n)
        self.u(v & ((1 << n) - 1), n)

    def unary(self, q: int):
        self.bits.extend([0] * q)
        self.bits.append(1)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def to_bytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _crc8_slow(data: bytes) -> int:
    # bit-by-bit, polynomial x^8 + x^2 + x + 1
    r = 0
    for byte in data:
        r ^= byte
        for _ in range(8):
            r = ((r << 1) ^ 0x07) & 0xFF if r & 0x80 else (r << 1) & 0xFF
    return r


def _crc16_slow(data: bytes) -> int:
    # bit-by-bit, polynomial x^16 + x^15 + x^2 + 1
    r = 0
    for byte in data:
        r ^= byte << 8
        for _ in range(8):
            r = ((r << 1) ^ 0x8005) & 0xFFFF if r & 0x8000 else (r << 1) & 0xFFFF
    return r


def make_streaminfo(rate, ch, bits, total) -> bytes:
    w = _W()
    w.u(4096, 16)  # min block size
    w.u(4096, 16)  # max block size
    w.u(0, 24)  # min frame size (0 = unknown)
    w.u(0, 24)  # max frame size
    w.u(rate, 20)
    w.u(ch - 1, 3)
    w.u(bits - 1, 5)
    w.u(total, 36)
    body = w.to_bytes() + b"\x00" * 16  # md5 unset
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


_FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _coded_number(val: int) -> bytes:
    if val < 0x80:
        return bytes([val])
    # lead byte holds 6 - n_follow payload bits, each follow byte 6
    for n_follow in range(1, 7):
        if val < (1 << (6 - n_follow + 6 * n_follow)):
            break
    lead_ones = n_follow + 1
    lead = ((0xFF << (8 - lead_ones)) & 0xFF) | (
        val >> (6 * n_follow)
    )
    out = [lead]
    for i in range(n_follow - 1, -1, -1):
        out.append(0x80 | ((val >> (6 * i)) & 0x3F))
    return bytes(out)


def _residuals(samples, order, coefs, shift):
    """Direct polynomial predictor formula (independent of the
    decoder's cumsum reconstruction)."""
    out = []
    for i in range(order, len(samples)):
        pred = sum(coefs[j] * samples[i - 1 - j] for j in range(order))
        out.append(samples[i] - (pred >> shift))
    return out


def _write_residual(w, res, order, blocksize, part_order=0, rice2=False,
                    rice_k=4, escape_bits=None):
    w.u(1 if rice2 else 0, 2)
    plen = 5 if rice2 else 4
    escape = (1 << plen) - 1
    w.u(part_order, 4)
    nparts = 1 << part_order
    per = blocksize // nparts
    pos = 0
    for p in range(nparts):
        n = per - order if p == 0 else per
        chunk = res[pos : pos + n]
        pos += n
        if escape_bits is not None:
            w.u(escape, plen)
            w.u(escape_bits, 5)
            for x in chunk:
                if escape_bits:
                    w.s(x, escape_bits)
                else:
                    assert x == 0
        else:
            w.u(rice_k, plen)
            for x in chunk:
                zig = 2 * x if x >= 0 else -2 * x - 1
                w.unary(zig >> rice_k)
                if rice_k:
                    w.u(zig & ((1 << rice_k) - 1), rice_k)
    assert pos == len(res)


def _write_subframe(w, samples, bits, spec):
    kind = spec["type"]
    wasted = spec.get("wasted", 0)
    w.u(0, 1)  # pad
    if kind == "constant":
        w.u(0, 6)
    elif kind == "verbatim":
        w.u(1, 6)
    elif kind == "fixed":
        w.u(8 | spec["order"], 6)
    else:  # lpc
        w.u(32 | (spec["order"] - 1), 6)
    if wasted:
        w.u(1, 1)
        w.unary(wasted - 1)
        assert all(s % (1 << wasted) == 0 for s in samples)
        samples = [s >> wasted for s in samples]
    else:
        w.u(0, 1)
    eff = bits - wasted
    rice = dict(
        part_order=spec.get("part_order", 0),
        rice2=spec.get("rice2", False),
        rice_k=spec.get("rice_k", 4),
        escape_bits=spec.get("escape_bits"),
    )
    if kind == "constant":
        assert len(set(samples)) == 1
        w.s(samples[0], eff)
    elif kind == "verbatim":
        for s in samples:
            w.s(s, eff)
    elif kind == "fixed":
        order = spec["order"]
        for s in samples[:order]:
            w.s(s, eff)
        res = _residuals(samples, order, _FIXED[order], 0)
        _write_residual(w, res, order, len(samples), **rice)
    else:
        order = spec["order"]
        coefs, shift = spec["coefs"], spec["shift"]
        prec = spec.get("precision", 15)
        for s in samples[:order]:
            w.s(s, eff)
        w.u(prec - 1, 4)
        w.s(shift, 5)
        for c in coefs:
            w.s(c, prec)
        res = _residuals(samples, order, coefs, shift)
        _write_residual(w, res, order, len(samples), **rice)


_BS_TABLE = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5, 256: 8, 512: 9,
             1024: 10, 2048: 11, 4096: 12, 8192: 13, 16384: 14, 32768: 15}
_RATE_TABLE = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
               22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11}


def frame_bytes(channels, *, bits, number=0, variable=False,
                chan_mode="independent", specs, bs_mode="explicit16",
                rate=None, rate_mode="streaminfo"):
    """Encode one frame. `channels` = list of per-channel sample
    lists (the FINAL L/R signal for stereo decorrelation modes —
    side/mid are derived here)."""
    blocksize = len(channels[0])
    hdr = _W()
    hdr.u(0x3FFE, 14)
    hdr.u(0, 1)
    hdr.u(1 if variable else 0, 1)
    if bs_mode == "table":
        bs_code, bs_extra = _BS_TABLE[blocksize], None
    elif bs_mode == "explicit8":
        assert blocksize <= 256
        bs_code, bs_extra = 6, ("u8", blocksize - 1)
    else:
        bs_code, bs_extra = 7, ("u16", blocksize - 1)
    hdr.u(bs_code, 4)
    if rate_mode == "streaminfo":
        rate_code, rate_extra = 0, None
    elif rate_mode == "table":
        rate_code, rate_extra = _RATE_TABLE[rate], None
    elif rate_mode == "khz8":
        rate_code, rate_extra = 12, ("u8", rate // 1000)
    elif rate_mode == "hz16":
        rate_code, rate_extra = 13, ("u16", rate)
    else:  # daHz
        rate_code, rate_extra = 14, ("u16", rate // 10)
    hdr.u(rate_code, 4)
    if chan_mode == "independent":
        hdr.u(len(channels) - 1, 4)
        enc_chans = channels
        enc_bits = [bits] * len(channels)
    else:
        left, right = channels
        side = [l - r for l, r in zip(left, right)]
        if chan_mode == "left_side":
            hdr.u(8, 4)
            enc_chans = [left, side]
            enc_bits = [bits, bits + 1]
        elif chan_mode == "right_side":
            hdr.u(9, 4)
            enc_chans = [side, right]
            enc_bits = [bits + 1, bits]
        else:  # mid_side
            hdr.u(10, 4)
            mid = [(l + r) >> 1 for l, r in zip(left, right)]
            enc_chans = [mid, side]
            enc_bits = [bits, bits + 1]
    size_codes = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
    hdr.u(size_codes[bits], 3)
    hdr.u(0, 1)
    hdr_bytes = hdr.to_bytes() + _coded_number(number)
    extra = _W()
    for field in (bs_extra, rate_extra):
        if field is not None:
            extra.u(field[1], 8 if field[0] == "u8" else 16)
    hdr_bytes += extra.to_bytes()
    hdr_bytes += bytes([_crc8_slow(hdr_bytes)])
    body = _W()
    for ch, b, spec in zip(enc_chans, enc_bits, specs):
        _write_subframe(body, ch, b, spec)
    frame = hdr_bytes + body.to_bytes()
    return frame + _crc16_slow(frame).to_bytes(2, "big")


def flac_file(blocks, rate, bits, *, chan_mode="independent", specs=None,
              total=None, variable=False, **fkw):
    """blocks = list of per-frame channel lists."""
    nch = len(blocks[0])
    ntotal = sum(len(b[0]) for b in blocks)
    out = make_streaminfo(rate, nch, bits,
                          ntotal if total is None else total)
    pos = 0
    for i, block in enumerate(blocks):
        number = pos if variable else i
        sp = specs[i] if specs else [{"type": "verbatim"}] * nch
        out += frame_bytes(block, bits=bits, number=number,
                           variable=variable, chan_mode=chan_mode,
                           specs=sp, rate=rate, **fkw)
        pos += len(block[0])
    return out


def _sig(n, seed, lo, hi):
    rng = np.random.default_rng(seed)
    return rng.integers(lo, hi, n).tolist()


# ------------------------------------------------------------- tests

def _expect(data, channels_lr):
    got = decode_flac_samples(data)
    assert got is not None
    samples, _rate, _bits = got
    want = np.array(channels_lr, dtype=np.int64).T
    np.testing.assert_array_equal(samples, want)


def test_verbatim_and_constant_mono():
    smooth = [7] * 192
    noisy = _sig(192, 1, -2000, 2000)
    data = flac_file(
        [[noisy], [smooth]], 8000, 16,
        specs=[[{"type": "verbatim"}], [{"type": "constant"}]],
        bs_mode="table", rate_mode="table",
    )
    _expect(data, [noisy + smooth])
    got = decode_flac_samples(data)
    assert got[1] == 8000 and got[2] == 16


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_orders_roundtrip(order):
    # a smooth-ish ramp keeps residuals small but nonzero
    base = [int(100 * np.sin(i / 9) + i) for i in range(300)]
    data = flac_file(
        [[base]], 44100, 16,
        specs=[[{"type": "fixed", "order": order, "rice_k": 6}]],
    )
    _expect(data, [base])


@pytest.mark.parametrize("order,shift,prec", [
    (1, 0, 15), (2, 5, 12), (8, 9, 14), (32, 14, 15), (3, 0, 5),
])
def test_lpc_orders_roundtrip(order, shift, prec):
    rng = np.random.default_rng(order)
    coefs = rng.integers(-(1 << (prec - 1)), (1 << (prec - 1)),
                         order).tolist()
    sig = _sig(200, 40 + order, -900, 900)
    data = flac_file(
        [[sig]], 48000, 16,
        specs=[[{"type": "lpc", "order": order, "coefs": coefs,
                 "shift": shift, "precision": prec, "rice_k": 14}]],
    )
    _expect(data, [sig])


@pytest.mark.parametrize("mode", ["independent", "left_side",
                                  "right_side", "mid_side"])
def test_stereo_decorrelation(mode):
    left = _sig(256, 7, -5000, 5000)
    right = _sig(256, 8, -5000, 5000)
    data = flac_file(
        [[left, right]], 44100, 16, chan_mode=mode,
        specs=[[{"type": "verbatim"}, {"type": "verbatim"}]],
    )
    _expect(data, [left, right])


@pytest.mark.parametrize("bits", [8, 12, 16, 20, 24, 32])
def test_sample_sizes(bits):
    lim = 1 << (bits - 2)
    sig = _sig(64, bits, -lim, lim)
    data = flac_file(
        [[sig]], 32000, bits, bs_mode="explicit8",
        specs=[[{"type": "verbatim"}]],
    )
    _expect(data, [sig])
    got = decode_flac_samples(data)
    assert got[2] == bits


@pytest.mark.parametrize("part_order,rice2", [(0, False), (1, False),
                                              (2, True), (3, True)])
def test_rice_partitions(part_order, rice2):
    sig = [int(40 * np.sin(i / 5)) + (i % 17) for i in range(512)]
    data = flac_file(
        [[sig]], 44100, 16,
        specs=[[{"type": "fixed", "order": 2, "rice_k": 7,
                 "part_order": part_order, "rice2": rice2}]],
    )
    _expect(data, [sig])


def test_escape_partitions_including_zero_bits():
    sig = _sig(128, 3, -100, 100)
    data = flac_file(
        [[sig]], 44100, 16,
        specs=[[{"type": "fixed", "order": 0, "escape_bits": 9}]],
    )
    _expect(data, [sig])
    # n=0-bit escape: all residuals zero -> constant-by-prediction
    flat = list(range(100, 228))  # order-1 residuals after warm-up: all 1
    data2 = flac_file(
        [[flat]], 44100, 16,
        specs=[[{"type": "fixed", "order": 2, "escape_bits": 0}]],
    )
    _expect(data2, [flat])


def test_wasted_bits():
    sig = [x << 3 for x in _sig(96, 5, -500, 500)]
    data = flac_file(
        [[sig]], 44100, 16, bs_mode="explicit8",
        specs=[[{"type": "verbatim", "wasted": 3}]],
    )
    _expect(data, [sig])


def test_multi_frame_and_final_short_block():
    b1 = _sig(4096, 11, -3000, 3000)
    b2 = _sig(4096, 12, -3000, 3000)
    tail = _sig(123, 13, -3000, 3000)
    data = flac_file(
        [[b1], [b2], [tail]], 44100, 16,
        specs=[[{"type": "verbatim"}]] * 3,
    )
    _expect(data, [b1 + b2 + tail])


def test_variable_blocking_strategy_multibyte_number():
    b1 = _sig(4096, 21, -100, 100)
    b2 = _sig(700, 22, -100, 100)
    # sample numbers 0 and 4096: the second needs a 2-byte coded form
    data = flac_file([[b1], [b2]], 44100, 16, variable=True,
                     specs=[[{"type": "verbatim"}]] * 2)
    _expect(data, [b1 + b2])


@pytest.mark.parametrize("rate_mode,rate", [
    ("table", 96000), ("khz8", 12000), ("hz16", 11025), ("daHz", 64000),
])
def test_sample_rate_codes(rate_mode, rate):
    sig = _sig(64, 9, -50, 50)
    data = flac_file([[sig]], rate, 16, bs_mode="explicit8",
                     rate_mode=rate_mode,
                     specs=[[{"type": "verbatim"}]])
    got = decode_flac_samples(data)
    assert got is not None and got[1] == rate


def test_three_channel_independent():
    chans = [_sig(80, 30 + i, -400, 400) for i in range(3)]
    data = flac_file([chans], 44100, 16, bs_mode="explicit8",
                     specs=[[{"type": "verbatim"}] * 3])
    _expect(data, chans)


def test_streaminfo_only_shell_returns_none():
    # metadata shell with no frames must fall to the flac-meta tier
    assert decode_flac_samples(make_streaminfo(44100, 2, 16, 88200)) is None


def test_trailing_id3v1_tag_tolerated():
    sig = _sig(64, 44, -50, 50)
    data = flac_file([[sig]], 44100, 16, bs_mode="explicit8",
                     specs=[[{"type": "verbatim"}]])
    tag = b"TAG" + b"\x00" * 125
    _expect(data + tag, [sig])


def test_corruption_totality():
    sig = _sig(256, 55, -800, 800)
    data = flac_file([[sig]], 44100, 16,
                     specs=[[{"type": "fixed", "order": 2, "rice_k": 6}]])
    assert decode_flac_samples(data) is not None
    # truncations
    for cut in (10, 45, len(data) // 2, len(data) - 1):
        assert decode_flac_samples(data[:cut]) is None
    # single-byte mutations never raise; CRC guards reject header/frame
    # damage
    rng = np.random.default_rng(0)
    for _ in range(200):
        i = int(rng.integers(0, len(data)))
        mutated = bytearray(data)
        mutated[i] ^= int(rng.integers(1, 256))
        decode_flac_samples(bytes(mutated))  # must not raise
    # a flipped bit inside the frame body (post-header) is caught by
    # the frame CRC-16: find the frame start and damage its middle
    body_at = data.index(b"\xff\xf8", 42)
    mutated = bytearray(data)
    mutated[(body_at + len(data)) // 2] ^= 0x10
    assert decode_flac_samples(bytes(mutated)) is None


def test_declared_total_enforced():
    sig = _sig(64, 66, -50, 50)
    # STREAMINFO declares more samples than the frames provide
    data = flac_file([[sig]], 44100, 16, bs_mode="explicit8",
                     specs=[[{"type": "verbatim"}]], total=128)
    assert decode_flac_samples(data) is None


def test_mono_mixdown_and_normalization():
    left = [16384] * 100
    right = [-16384] * 100
    data = flac_file([[left, right]], 44100, 16, chan_mode="left_side",
                     specs=[[{"type": "verbatim"}, {"type": "verbatim"}]])
    mono, rate = decode_flac(data)
    assert rate == 44100
    np.testing.assert_allclose(mono, 0.0)
    data2 = flac_file([[left]], 44100, 16, bs_mode="explicit8",
                      specs=[[{"type": "verbatim"}]])
    mono2, _ = decode_flac(data2)
    np.testing.assert_allclose(mono2, 0.5)


def test_metadata_tier_agreement():
    from opencosmo_spark.pipeline.multimodal import _flac_metadata

    sig = _sig(4096 + 100, 77, -1000, 1000)
    data = flac_file([[sig[:4096]], [sig[4096:]]], 22050, 16,
                     specs=[[{"type": "verbatim"}]] * 2)
    samples, rate, _ = decode_flac_samples(data)
    meta = _flac_metadata(data)
    assert meta == (rate, 1, len(samples))


def test_ladder_integration_flac_pcm(spark):
    from opencosmo_spark.pipeline.multimodal import decode_audio_features

    sig = [int(8000 * np.sin(2 * np.pi * 440 * i / 8000))
           for i in range(192)]
    payload = flac_file([[sig]], 8000, 16, bs_mode="table",
                        specs=[[{"type": "fixed", "order": 2,
                                 "rice_k": 8}]])
    shell = make_streaminfo(44100, 2, 16, 88200)
    df = spark.createDataFrame(
        [("pcm", payload), ("shell", shell)], "id string, payload binary"
    )
    out = decode_audio_features(df).toPandas().set_index("id")
    assert out.loc["pcm"].decoder == "flac"
    assert out.loc["pcm"].sample_rate == 8000
    assert out.loc["pcm"].n_samples == 192
    # real signal stats, not NULLs: a 440 Hz tone has known RMS
    want = np.sqrt(np.mean((np.array(sig) / 32768.0) ** 2))
    assert abs(out.loc["pcm"].rms - want) < 1e-6
    assert out.loc["shell"].decoder == "flac-meta"
    assert out.loc["shell"].rms is None or np.isnan(out.loc["shell"].rms)


def test_deterministic_digest():
    """Pin the decode of a fixed stream so refactors can't silently
    change sample math."""
    sig = [int(3000 * np.sin(i / 7) + 200 * np.cos(i / 3))
           for i in range(1000)]
    left = sig
    right = [-(x // 2) for x in sig]
    data = flac_file(
        [[left[:512], right[:512]], [left[512:], right[512:]]],
        44100, 20, chan_mode="mid_side",
        specs=[[{"type": "fixed", "order": 3, "rice_k": 9,
                 "part_order": 2},
                {"type": "fixed", "order": 1, "rice_k": 9}]] * 2,
    )
    samples, rate, bits = decode_flac_samples(data)
    h = hashlib.sha256(samples.tobytes()).hexdigest()[:16]
    np.testing.assert_array_equal(samples[:, 0], left)
    np.testing.assert_array_equal(samples[:, 1], right)
    assert (rate, bits) == (44100, 20)
    assert h == hashlib.sha256(
        np.array([left, right], dtype=np.int64).T.copy().tobytes()
    ).hexdigest()[:16]


def test_spectral_features_on_flac(spark):
    from opencosmo_spark.pipeline.multimodal import audio_spectral_features

    rate, freq, n = 8000, 1000, 4096
    sig = [int(12000 * np.sin(2 * np.pi * freq * i / rate))
           for i in range(n)]
    payload = flac_file([[sig]], rate, 16,
                        specs=[[{"type": "verbatim"}]])
    df = spark.createDataFrame([("a", payload)],
                               "id string, payload binary")
    row = audio_spectral_features(df).toPandas().iloc[0]
    assert row.decoder == "flac"
    # a pure 1 kHz tone: centroid near 1 kHz, very low flatness
    assert abs(row.spectral_centroid - freq) < 50
    assert row.spectral_flatness < 0.05


def _split_streaminfo(base: bytes):
    si_size = int.from_bytes(base[5:8], "big")
    cut = 8 + si_size
    return base[:cut], base[cut:]


def test_id3v2_prefixed_flac_decodes():
    from test_mediatags import id3v2, t_frame

    sig = _sig(96, 91, -400, 400)
    base = flac_file([[sig]], 8000, 16, bs_mode="explicit8",
                     specs=[[{"type": "verbatim"}]])
    tagged = id3v2([("TIT2", t_frame("Prefixed"))]) + base
    got = decode_flac_samples(tagged)
    assert got is not None
    np.testing.assert_array_equal(got[0][:, 0], sig)
    from opencosmo_spark.pipeline.multimodal import _flac_metadata

    assert _flac_metadata(tagged) == (8000, 1, 96)


def test_ogg_encapsulated_flac_decodes():
    from test_mediatags import ogg_page, vorbis_block

    from opencosmo_spark.pipeline.multimodal import _ogg_metadata

    sig = _sig(512 + 77, 92, -2000, 2000)
    base = flac_file([[sig[:512]], [sig[512:]]], 22050, 16,
                     specs=[[{"type": "fixed", "order": 2,
                              "rice_k": 7}]] * 2)
    header, frames_blob = _split_streaminfo(base)
    # rebuild the two frames individually to place one per packet
    f1_end = frames_blob.index(b"\xff\xf8", 2)
    f1, f2 = frames_blob[:f1_end], frames_blob[f1_end:]
    assert f1 and f2
    # mapping header packet: 0x7F FLAC 1 0 nheaders=1, then the
    # native fLaC + STREAMINFO with the last-metadata flag CLEARED
    # (a vorbis-comment header packet follows)
    si = header[:4] + bytes([header[4] & 0x7F]) + header[5:]
    pkt0 = b"\x7fFLAC" + bytes([1, 0]) + (1).to_bytes(2, "big") + si
    vc = vorbis_block([("TITLE", "Oga")])
    pkt_vc = bytes([0x80 | 4]) + len(vc).to_bytes(3, "big") + vc
    data = (ogg_page(pkt0, 0)
            + ogg_page(pkt_vc, 1)
            + ogg_page(f1, 2, granule=512)
            # an audio frame split mid-bytes across two pages
            + ogg_page(f2[: len(f2) // 2], 3)
            + ogg_page(f2[len(f2) // 2 :], 4, granule=len(sig)))
    got = decode_flac_samples(data)
    assert got is not None
    samples, rate, bits = got
    np.testing.assert_array_equal(samples[:, 0], sig)
    assert rate == 22050
    # the ogg metadata tier reads the embedded STREAMINFO + granule
    assert _ogg_metadata(data) == (22050, 1, len(sig))
    # mixdown wrapper too
    mono, r = decode_flac(data)
    assert r == 22050 and len(mono) == len(sig)


def test_ogg_flac_rejects_damage():
    from test_mediatags import ogg_page

    sig = _sig(64, 93, -100, 100)
    base = flac_file([[sig]], 8000, 16, bs_mode="explicit8",
                     specs=[[{"type": "verbatim"}]])
    header, frames_blob = _split_streaminfo(base)
    pkt0 = b"\x7fFLAC" + bytes([1, 0]) + (0).to_bytes(2, "big") + header
    ok = ogg_page(pkt0, 0) + ogg_page(frames_blob, 1, granule=64)
    assert decode_flac_samples(ok) is not None
    # a vorbis ident packet is NOT a FLAC mapping
    notflac = ogg_page(b"\x01vorbis" + b"\x00" * 23, 0) + ogg_page(
        frames_blob, 1
    )
    assert decode_flac_samples(notflac) is None
    rng = np.random.default_rng(7)
    for _ in range(300):
        mut = bytearray(ok)
        for _ in range(int(rng.integers(1, 6))):
            mut[int(rng.integers(0, len(mut)))] = int(
                rng.integers(0, 256)
            )
        decode_flac_samples(bytes(mut))  # totality
