"""WAV ADPCM decode differentials (IMA/DVI format 0x11 and Microsoft
format 0x02 in `multimodal.py::_decode_wav`).

The encoder twins below are written independently from the decoder —
their own copies of the public step/index/adaptation tables and their
own reconstruction arithmetic — and track the exact reconstruction
their quantization produces. ADPCM is lossy against the input PCM,
but the DECODER must reproduce the encoder's reconstruction
bit-exactly, so the tests assert integer equality against that.
"""
from __future__ import annotations

import struct

import numpy as np

from opencosmo_spark.pipeline.multimodal import _decode_wav

# independent copies of the public tables (typos in either copy break
# the exact round-trips below)
STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]
INDEX_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]
ADAPT = [230, 230, 230, 230, 307, 409, 512, 614,
         768, 614, 512, 409, 307, 230, 230, 230]
MS_COEFS = [(256, 0), (512, -256), (0, 0), (192, 64), (240, 0),
            (460, -208), (392, -232)]


def _clamp16(v):
    return max(-32768, min(32767, v))


# ------------------------------------------------------------ IMA twin

def ima_encode(chans: list[list[int]], spb: int):
    """Encode per-channel PCM into IMA ADPCM blocks. Returns
    (block_bytes, reconstruction per channel). spb = samples per
    block, must be 1 + 8*g."""
    nch = len(chans)
    n = len(chans[0])
    groups = (spb - 1) // 8
    out = bytearray()
    recon = [[] for _ in range(nch)]
    index = [0] * nch
    pos = 0
    while pos < n:
        # header: first sample verbatim
        nibs = [[] for _ in range(nch)]
        for c in range(nch):
            first = chans[c][pos] if pos < n else 0
            out += struct.pack("<hBB", first, index[c], 0)
            recon[c].append(first)
            pred = first
            for i in range(1, spb):
                j = pos + i
                sample = chans[c][j] if j < n else pred
                step = STEPS[index[c]]
                diff = sample - pred
                nib = 0
                if diff < 0:
                    nib = 8
                    diff = -diff
                if diff >= step:
                    nib |= 4
                    diff -= step
                if diff >= step >> 1:
                    nib |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    nib |= 1
                # reconstruct exactly as a decoder would
                d = step >> 3
                if nib & 4:
                    d += step
                if nib & 2:
                    d += step >> 1
                if nib & 1:
                    d += step >> 2
                pred = _clamp16(pred - d if nib & 8 else pred + d)
                index[c] = max(0, min(88, index[c] + INDEX_ADJ[nib & 7]))
                if j < n:
                    recon[c].append(pred)
                nibs[c].append(nib)
        # data: interleaved 4-byte groups per channel, low nibble first
        for g in range(groups):
            for c in range(nch):
                eight = nibs[c][g * 8 : (g + 1) * 8]
                for k in range(0, 8, 2):
                    out.append(eight[k] | (eight[k + 1] << 4))
        pos += spb
    return bytes(out), recon


# ------------------------------------------------------------- MS twin

def ms_encode(chans: list[list[int]], spb: int, pred_idx=0,
              coefs=None, init_delta=512):
    coefs = coefs or MS_COEFS
    nch = len(chans)
    n = len(chans[0])
    out = bytearray()
    recon = [[] for _ in range(nch)]
    pos = 0
    while pos < n:
        c1 = [coefs[pred_idx][0]] * nch
        c2 = [coefs[pred_idx][1]] * nch
        delta = [max(16, init_delta)] * nch
        s2 = [chans[c][pos] if pos < n else 0 for c in range(nch)]
        s1 = [chans[c][pos + 1] if pos + 1 < n else 0
              for c in range(nch)]
        for c in range(nch):
            out.append(pred_idx)
        for c in range(nch):
            out += struct.pack("<h", delta[c])
        for c in range(nch):
            out += struct.pack("<h", s1[c])
        for c in range(nch):
            out += struct.pack("<h", s2[c])
        for c in range(nch):
            recon[c].append(s2[c])
            if pos + 1 < n:
                recon[c].append(s1[c])
        nibs = []
        for i in range(2, spb):
            for c in range(nch):
                j = pos + i
                sample = chans[c][j] if j < n else 0
                pred = (s1[c] * c1[c] + s2[c] * c2[c]) >> 8
                err = sample - pred
                nib = max(-8, min(7, int(np.fix(err / delta[c]))))
                val = _clamp16(pred + nib * delta[c])
                s2[c] = s1[c]
                s1[c] = val
                delta[c] = max(16, (ADAPT[nib & 15] * delta[c]) >> 8)
                if j < n:
                    recon[c].append(val)
                nibs.append(nib & 15)
        for k in range(0, len(nibs) - 1, 2):
            out.append((nibs[k] << 4) | nibs[k + 1])
        if len(nibs) % 2:
            out.append(nibs[-1] << 4)
        pos += spb
    return bytes(out), recon


# --------------------------------------------------------- wav wrapper

def wav_file(code, nch, rate, balign, spb, payload, *, fact=None,
             coefs=None):
    fmt = struct.pack("<HHIIHH", code, nch, rate,
                      rate * balign // spb, balign, 4)
    if code == 0x11:
        fmt += struct.pack("<HH", 2, spb)
    else:
        cs = coefs or MS_COEFS
        fmt += struct.pack("<HHH", 4 + 4 * len(cs), spb, len(cs))
        for a, b in cs:
            fmt += struct.pack("<hh", a, b)
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    if len(fmt) % 2:
        chunks += b"\x00"
    if fact is not None:
        chunks += b"fact" + (4).to_bytes(4, "little") + struct.pack(
            "<I", fact
        )
    chunks += b"data" + len(payload).to_bytes(4, "little") + payload
    if len(payload) % 2:
        chunks += b"\x00"
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" \
        + chunks


def _sig(n, seed, amp=9000):
    rng = np.random.default_rng(seed)
    # smooth-ish signal: ADPCM tracks it closely but not exactly
    t = np.arange(n)
    return (amp * np.sin(t / 11) + rng.integers(-500, 500, n)).astype(
        int
    ).tolist()


def _expect(data, recon, rate):
    got = _decode_wav(data)
    assert got is not None
    mono, r = got
    assert r == rate
    want = np.array(recon, dtype=np.float64).T.mean(axis=1) / 32768.0
    np.testing.assert_allclose(mono, want.astype(np.float32), atol=1e-7)


def test_ima_mono_multiblock():
    spb = 1 + 8 * 4  # 33 samples/block
    balign = 4 + 16  # header + 4 groups
    sig = _sig(spb * 3, 1)
    payload, recon = ima_encode([sig], spb)
    data = wav_file(0x11, 1, 8000, balign, spb, payload)
    _expect(data, recon, 8000)


def test_ima_stereo_and_partial_tail():
    spb = 1 + 8 * 2
    balign = (4 + 8) * 2
    n = spb * 3
    l, r = _sig(n, 2), _sig(n, 3, amp=4000)
    payload, recon = ima_encode([l, r], spb)
    # truncate the last block to its headers + ONE 4-byte group per
    # channel: the decoder's short-tail path must yield 1+8 samples
    cut = 2 * balign + 8 + 8
    kept = 2 * spb + 9
    data = wav_file(0x11, 2, 16000, balign, spb, payload[:cut],
                    fact=kept)
    _expect(data, [c[:kept] for c in recon], 16000)


def test_ima_fact_trims():
    spb = 1 + 8
    balign = 4 + 4
    sig = _sig(spb, 4)
    payload, recon = ima_encode([sig], spb)
    data = wav_file(0x11, 1, 8000, balign, spb, payload, fact=5)
    got, _ = _decode_wav(data)
    assert len(got) == 5
    np.testing.assert_allclose(
        got, (np.array(recon[0][:5]) / 32768.0).astype(np.float32)
    )


def test_ms_mono_multiblock():
    spb = 32
    balign = 7 + (spb - 2) // 2
    sig = _sig(spb * 4, 5)
    payload, recon = ms_encode([sig], spb)
    data = wav_file(2, 1, 11025, balign, spb, payload)
    _expect(data, recon, 11025)


def test_ms_stereo():
    spb = 16
    balign = 14 + (spb - 2)  # 2 channels, one byte per sample pair
    n = spb * 3
    l, r = _sig(n, 6), _sig(n, 7, amp=2000)
    payload, recon = ms_encode([l, r], spb)
    data = wav_file(2, 2, 22050, balign, spb, payload)
    _expect(data, recon, 22050)


def test_ms_nonzero_predictor_and_custom_coefs():
    spb = 24
    balign = 7 + (spb - 2) // 2
    sig = _sig(spb * 2, 8)
    # predictor 1 exercises the two-tap path (c2 != 0)
    payload, recon = ms_encode([sig], spb, pred_idx=1)
    data = wav_file(2, 1, 8000, balign, spb, payload)
    _expect(data, recon, 8000)
    # custom coefficient set in the fmt chunk must be honored
    custom = [(200, 50), (300, -100)]
    payload2, recon2 = ms_encode([sig], spb, pred_idx=1, coefs=custom)
    data2 = wav_file(2, 1, 8000, balign, spb, payload2, coefs=custom)
    _expect(data2, recon2, 8000)


def test_adpcm_totality_and_rejects():
    spb = 1 + 8
    sig = _sig(spb, 9)
    payload, _ = ima_encode([sig], spb)
    seed = wav_file(0x11, 1, 8000, 8, spb, payload)
    rng = np.random.default_rng(0)
    for _ in range(200):
        mut = bytearray(seed)
        for _ in range(int(rng.integers(1, 6))):
            mut[int(rng.integers(0, len(mut)))] = int(
                rng.integers(0, 256)
            )
        try:
            _decode_wav(bytes(mut))
        except Exception as exc:  # noqa: BLE001
            raise AssertionError("decoder escaped on mutation") from exc
    # block align smaller than the header is structurally invalid
    bad = wav_file(0x11, 1, 8000, 4, spb, payload)
    assert _decode_wav(bad) is None


def test_adpcm_in_audio_features_ladder(spark):
    from opencosmo_spark.pipeline.multimodal import decode_audio_features

    spb = 1 + 8 * 8
    balign = 4 + 32
    sig = [int(10000 * np.sin(2 * np.pi * 440 * i / 8000))
           for i in range(spb * 2)]
    payload, recon = ima_encode([sig], spb)
    data = wav_file(0x11, 1, 8000, balign, spb, payload)
    df = spark.createDataFrame([("a", data)], "id string, payload binary")
    row = decode_audio_features(df).toPandas().iloc[0]
    assert row.decoder == "wav"
    assert row.sample_rate == 8000
    assert row.n_samples == len(sig)
    # ADPCM tracks the tone closely: decoded RMS within 2% of the
    # encoder-reconstruction RMS, which is itself near the true RMS
    want = np.sqrt(np.mean((np.array(recon[0]) / 32768.0) ** 2))
    assert abs(row.rms - want) < 0.02 * want


def test_ms_adpcm_extreme_coefficients_no_overflow():
    """The int32 corner: coefficient pairs of -32768 with full-scale
    headers must clamp, not wrap (s1*c1 + s2*c2 = -2^31 - overflow by
    one in 32-bit arithmetic)."""
    spb = 8
    balign = 7 + (spb - 2) // 2
    custom = [(-32768, -32768)]
    # header: predictor 0, delta 32767, s1 = s2 = -32768
    payload = bytes([0]) + struct.pack("<hhh", 32767, -32768, -32768)
    payload += b"\x77\x77\x77"  # arbitrary nibbles
    data = wav_file(2, 1, 8000, balign, spb, payload, coefs=custom)
    got = _decode_wav(data)
    assert got is not None
    mono, _ = got
    # all samples clamp inside [-1, 1]; no silent wraparound artifacts
    assert np.all(np.abs(mono) <= 1.0)
    # prediction of two full-negative samples through double-negative
    # coefficients is strongly positive -> clamps at +32767
    assert mono[2] == 32767 / 32768.0


def wav_extensible_adpcm(nch, rate, balign, spb, payload,
                         channel_mask=3):
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapping MS ADPCM (subformat
    code 2). In this layout bytes [20:22] are the LOW WORD OF
    dwChannelMask, not a coefficient count — the review-found misread."""
    fmt = struct.pack("<HHIIHH", 0xFFFE, nch, rate,
                      rate * balign // spb, balign, 4)
    # cbSize=22, wSamplesPerBlock (union), dwChannelMask, GUID
    guid = struct.pack("<H", 2) + bytes.fromhex(
        "0000000010008000" + "00aa00389b71"
    )
    fmt += struct.pack("<HHI", 22, spb, channel_mask) + guid
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(payload).to_bytes(4, "little") + payload
    if len(payload) % 2:
        chunks += b"\x00"
    return (b"RIFF" + (4 + len(chunks)).to_bytes(4, "little")
            + b"WAVE" + chunks)


def test_extensible_adpcm_ignores_channel_mask_as_coefs():
    """EXTENSIBLE-wrapped MS ADPCM must use the standard coefficient
    table, never misread dwChannelMask/GUID bytes as a custom one:
    the decode must equal the plain code-2 file's decode exactly."""
    spb = 32
    balign = 14 + (spb - 2)  # 2 channels, one byte per sample pair
    chans = [_sig(2 * spb, 21), _sig(2 * spb, 22)]
    payload, recon = ms_encode(chans, spb)
    plain = wav_file(2, 2, 16000, balign, spb, payload)
    wrapped = wav_extensible_adpcm(2, 16000, balign, spb, payload,
                                   channel_mask=3)
    _expect(plain, recon, 16000)
    _expect(wrapped, recon, 16000)
    got_p = _decode_wav(plain)[0]
    got_w = _decode_wav(wrapped)[0]
    np.testing.assert_array_equal(got_p, got_w)
