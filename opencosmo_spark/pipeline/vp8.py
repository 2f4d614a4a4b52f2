"""VP8 (lossy WebP) intra-keyframe decoder — pure stdlib + numpy.

Lossy is the dominant WebP flavor in the wild, and every lossy WebP
still image is a single VP8 INTRA KEYFRAME, so this module closes the
multimodal ladder's biggest crawl-image coverage gap: with it, the
``VP8 `` chunk of a RIFF/WEBP container decodes to real pixels
without PIL, exactly like the VP8L (lossless) path in
``pipeline/vp8l.py``.

Implemented from RFC 6386 ("VP8 Data Format and Decoding Guide"):

- the boolean arithmetic decoder (§7) and tree-coded symbols (§8)
- keyframe frame header: segmentation (map + per-segment quant /
  loop-filter features), loop-filter header with per-mode/ref deltas,
  multiple token partitions, quantizer indices and deltas,
  coefficient-probability updates (§9)
- intra mode decoding with the keyframe trees — 16x16 Y modes,
  per-subblock B_PRED modes with above/left context, chroma modes
  (§11)
- DCT/WHT coefficient tokens: band/context-tracked probabilities,
  category extra bits, the no-EOB-after-zero tree skip (§13),
  dequantization with the Y2 / chroma factor rules (§14.1)
- inverse WHT for the Y2 block and the exact integer inverse DCT
  (§14.3-14.5)
- intra prediction: 16x16 and chroma DC/V/H/TM with the 127/129
  edge conventions, all ten 4x4 B_PRED modes with the above-right
  replication rules (§12)
- both loop filters (simple + normal/mbedge, §15), applied per
  macroblock in raster order with the per-MB level/limit/HEV rules,
  vectorized across each edge with numpy

The large constant tables (token probabilities, their update
probabilities, keyframe B-mode probabilities, quantizer lookups) live
in ``vp8_tables.py`` — they are the RFC 6386 published constants.

Differential-tested in ``tests/test_vp8.py`` against the system
libwebp (encode with libwebp, decode HERE, compare with libwebp's own
decode — exact YUV equality, loop filter and all) plus hand-built
bitstreams for paths a default encoder rarely emits (multiple token
partitions, simple filter, quantizer deltas, filter level 0) and a
byte-mutation fuzz pass (junk must return None, never raise).

Like the JPEG/VP8L decoders, the per-coefficient work is pure Python:
fine for the bounded test/triage sizes this ladder targets, with the
same anti-bomb pixel cap; at crawl scale the zero-decode
``image_metadata`` tier stays the triage path.
"""

from __future__ import annotations

import numpy as np

from .vp8_tables import (
    AC_QLOOKUP,
    COEFF_PROBS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    KF_BMODE_PROBS,
)

__all__ = ["decode_vp8_planes", "decode_vp8_rgb"]

_MAX_PIXELS = 50_000_000 // 3  # same budget as the VP8L / PNG decoders

# --- small spec constants (RFC 6386 §8, §11, §13) --------------------

# token tree: leaves stored as -(token + 1); tokens 0..4 = literal
# coefficient values, 5..10 = categories 1..6, 11 = end-of-block
_TOK_EOB = 11
_COEFF_TREE = (
    -12, 2,      # EOB
    -1, 4,       # 0
    -2, 6,       # 1
    8, 12,
    -3, 10,      # 2
    -4, -5,      # 3, 4
    14, 16,
    -6, -7,      # cat1, cat2
    18, 20,
    -8, -9,      # cat3, cat4
    -10, -11,    # cat5, cat6
)

_CAT_PROBS = (
    (159,),
    (165, 145),
    (173, 148, 140),
    (176, 155, 140, 135),
    (180, 157, 141, 134, 130),
    (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
)
_CAT_BASE = (5, 7, 11, 19, 35, 67)

_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# 16x16 Y modes 0..3 = DC/V/H/TM, 4 = B_PRED (per-subblock modes)
_DC, _V, _H, _TM, _B_PRED = 0, 1, 2, 3, 4
_KF_YMODE_TREE = (-(_B_PRED + 1), 2, 4, 6, -(_DC + 1), -(_V + 1),
                  -(_H + 1), -(_TM + 1))
_KF_YMODE_PROBS = (145, 156, 163, 128)
_UV_TREE = (-(_DC + 1), 2, -(_V + 1), 4, -(_H + 1), -(_TM + 1))
_KF_UV_PROBS = (142, 114, 183)

# 4x4 modes: 0 B_DC, 1 B_TM, 2 B_VE, 3 B_HE, 4 B_LD, 5 B_RD,
# 6 B_VR, 7 B_VL, 8 B_HD, 9 B_HU
_BMODE_TREE = (
    -1, 2,
    -2, 4,
    -3, 6,
    8, 12,
    -4, 10,
    -6, -7,
    -5, 14,
    -8, 16,
    -9, -10,
)
# context submode implied by a non-B_PRED 16x16 mode of a neighbor
_IMPLIED_SUB = {_DC: 0, _V: 2, _H: 3, _TM: 1}

_MB_SEG_TREE = (2, 4, -1, -2, -3, -4)


class _BoolDec:
    """RFC 6386 §7 boolean decoder. Reads past the end of its
    partition yield zero bytes (the spec permits a small overread);
    a hard cap guards against decoding forever on junk."""

    __slots__ = ("data", "pos", "n", "value", "range", "bit_count")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.pos = 2
        b0 = data[0] if self.n > 0 else 0
        b1 = data[1] if self.n > 1 else 0
        self.value = (b0 << 8) | b1
        self.range = 255
        self.bit_count = 0

    def bool(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < self.n:
                    self.value |= self.data[self.pos]
                elif self.pos > self.n + 32:
                    raise ValueError("bool decoder starved")
                self.pos += 1
        return ret

    def literal(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.bool(128)
        return v

    def signed(self, nbits: int) -> int:
        v = self.literal(nbits)
        return -v if self.bool(128) else v

    def flagged_signed(self, nbits: int) -> int:
        """An optional signed literal: flag bit, then value+sign."""
        return self.signed(nbits) if self.bool(128) else 0

    def tree(self, tree, probs) -> int:
        i = 0
        while True:
            v = tree[i + self.bool(probs[i >> 1])]
            if v <= 0:
                return -v - 1
            i = v


def _clamp_q(q: int) -> int:
    return 0 if q < 0 else (127 if q > 127 else q)


def _dequant_factors(qi, y_dc_d, y2_dc_d, y2_ac_d, uv_dc_d, uv_ac_d):
    """(y1, y2, uv) (dc, ac) dequant factor pairs per RFC 6386 §14.1:
    Y2 dc x2 / ac x155/100 (min 8), chroma dc capped at 132."""
    y1 = (DC_QLOOKUP[_clamp_q(qi + y_dc_d)], AC_QLOOKUP[_clamp_q(qi)])
    y2_dc = DC_QLOOKUP[_clamp_q(qi + y2_dc_d)] * 2
    y2_ac = AC_QLOOKUP[_clamp_q(qi + y2_ac_d)] * 155 // 100
    if y2_ac < 8:
        y2_ac = 8
    uv_dc = DC_QLOOKUP[_clamp_q(qi + uv_dc_d)]
    if uv_dc > 132:
        uv_dc = 132
    uv = (uv_dc, AC_QLOOKUP[_clamp_q(qi + uv_ac_d)])
    return y1, (y2_dc, y2_ac), uv


# --- inverse transforms (RFC 6386 §14.3-14.5, exact integer) ---------

def _iwht4x4(block):
    """Inverse Walsh-Hadamard for the Y2 block -> 16 Y DC values."""
    ip = [int(x) for x in block]
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[12 + i]
        b1 = ip[4 + i] + ip[8 + i]
        c1 = ip[4 + i] - ip[8 + i]
        d1 = ip[i] - ip[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        base = 4 * i
        a1 = tmp[base] + tmp[base + 3]
        b1 = tmp[base + 1] + tmp[base + 2]
        c1 = tmp[base + 1] - tmp[base + 2]
        d1 = tmp[base] - tmp[base + 3]
        out[base] = (a1 + b1 + 3) >> 3
        out[base + 1] = (c1 + d1 + 3) >> 3
        out[base + 2] = (a1 - b1 + 3) >> 3
        out[base + 3] = (d1 - c1 + 3) >> 3
    return out


_C1 = 20091  # sqrt(2) * cos(pi/8) in <<16 fixed point, minus 1.0
_C2 = 35468  # sqrt(2) * sin(pi/8) in <<16 fixed point


def _idct4x4(block) -> np.ndarray:
    """Exact integer inverse DCT (RFC 6386 §14.4) -> 4x4 int array."""
    ip = [int(x) for x in block]
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[8 + i]
        b1 = ip[i] - ip[8 + i]
        t1 = (ip[4 + i] * _C2) >> 16
        t2 = ip[12 + i] + ((ip[12 + i] * _C1) >> 16)
        c1 = t1 - t2
        t1 = ip[4 + i] + ((ip[4 + i] * _C1) >> 16)
        t2 = (ip[12 + i] * _C2) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = np.empty((4, 4), np.int32)
    for i in range(4):
        base = 4 * i
        a1 = tmp[base] + tmp[base + 2]
        b1 = tmp[base] - tmp[base + 2]
        t1 = (tmp[base + 1] * _C2) >> 16
        t2 = tmp[base + 3] + ((tmp[base + 3] * _C1) >> 16)
        c1 = t1 - t2
        t1 = tmp[base + 1] + ((tmp[base + 1] * _C1) >> 16)
        t2 = (tmp[base + 3] * _C2) >> 16
        d1 = t1 + t2
        out[i, 0] = (a1 + d1 + 4) >> 3
        out[i, 3] = (a1 - d1 + 4) >> 3
        out[i, 1] = (b1 + c1 + 4) >> 3
        out[i, 2] = (b1 - c1 + 4) >> 3
    return out


# --- header / mode / token decoding ----------------------------------

class _FrameState:
    """Everything the reconstruction pass needs, parsed from the
    first partition."""

    __slots__ = (
        "mbw", "mbh", "w", "h", "seg_enabled", "seg_update_map",
        "seg_abs", "seg_q", "seg_lf", "seg_probs", "use_simple",
        "filter_level", "sharpness", "lf_delta", "ref_deltas",
        "mode_deltas", "qi", "dq", "prob_skip", "use_skip",
        "coeff_probs", "partitions",
    )


def _parse_header(data: bytes) -> tuple[_FrameState, _BoolDec]:
    if len(data) < 10:
        raise ValueError("short frame")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise ValueError("not a keyframe")  # lossy WebP is always KF
    first_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad start code")
    wv = data[6] | (data[7] << 8)
    hv = data[8] | (data[9] << 8)
    st = _FrameState()
    st.w = wv & 0x3FFF
    st.h = hv & 0x3FFF
    if st.w == 0 or st.h == 0:
        raise ValueError("zero dimension")
    if st.w * st.h > _MAX_PIXELS:
        raise ValueError("image too large")
    st.mbw = (st.w + 15) >> 4
    st.mbh = (st.h + 15) >> 4
    if 10 + first_size > len(data):
        raise ValueError("truncated first partition")
    bd = _BoolDec(data[10 : 10 + first_size])

    bd.literal(1)  # color space (0 required for the defined profile)
    bd.literal(1)  # clamping type (decoder clamps unconditionally)

    # segmentation (§9.3)
    st.seg_enabled = bd.literal(1)
    st.seg_update_map = 0
    st.seg_abs = 0
    st.seg_q = [0, 0, 0, 0]
    st.seg_lf = [0, 0, 0, 0]
    st.seg_probs = (255, 255, 255)
    if st.seg_enabled:
        st.seg_update_map = bd.literal(1)
        update_data = bd.literal(1)
        if update_data:
            st.seg_abs = bd.literal(1)
            st.seg_q = [bd.flagged_signed(7) for _ in range(4)]
            st.seg_lf = [bd.flagged_signed(6) for _ in range(4)]
        if st.seg_update_map:
            st.seg_probs = tuple(
                bd.literal(8) if bd.literal(1) else 255 for _ in range(3)
            )

    # loop filter header (§9.4)
    st.use_simple = bd.literal(1)
    st.filter_level = bd.literal(6)
    st.sharpness = bd.literal(3)
    st.lf_delta = bd.literal(1)
    st.ref_deltas = [0, 0, 0, 0]
    st.mode_deltas = [0, 0, 0, 0]
    if st.lf_delta:
        if bd.literal(1):  # per-frame update flag
            st.ref_deltas = [bd.flagged_signed(6) for _ in range(4)]
            st.mode_deltas = [bd.flagged_signed(6) for _ in range(4)]

    n_parts = 1 << bd.literal(2)

    # quantizer (§9.6)
    st.qi = bd.literal(7)
    y_dc_d = bd.flagged_signed(4)
    y2_dc_d = bd.flagged_signed(4)
    y2_ac_d = bd.flagged_signed(4)
    uv_dc_d = bd.flagged_signed(4)
    uv_ac_d = bd.flagged_signed(4)
    st.dq = (y_dc_d, y2_dc_d, y2_ac_d, uv_dc_d, uv_ac_d)

    bd.literal(1)  # refresh entropy probs (no-op for a still image)

    # coefficient probability updates (§9.9/§13.4)
    probs = [
        [[list(COEFF_PROBS[t][b][c]) for c in range(3)] for b in range(8)]
        for t in range(4)
    ]
    for t in range(4):
        for b in range(8):
            for c in range(3):
                upd = COEFF_UPDATE_PROBS[t][b][c]
                row = probs[t][b][c]
                for p in range(11):
                    if bd.bool(upd[p]):
                        row[p] = bd.literal(8)
    st.coeff_probs = probs

    st.use_skip = bd.literal(1)
    st.prob_skip = bd.literal(8) if st.use_skip else 0

    # token partitions: sizes trail the first partition (§9.5)
    rest = data[10 + first_size :]
    sizes_len = 3 * (n_parts - 1)
    if len(rest) < sizes_len:
        raise ValueError("truncated partition sizes")
    st.partitions = []
    off = sizes_len
    for i in range(n_parts):
        if i < n_parts - 1:
            sz = int.from_bytes(rest[3 * i : 3 * i + 3], "little")
        else:
            sz = len(rest) - off
        if sz < 0 or off + sz > len(rest):
            raise ValueError("bad partition size")
        st.partitions.append(_BoolDec(rest[off : off + sz]))
        off += sz
    return st, bd


def _parse_modes(st: _FrameState, bd: _BoolDec):
    """Per-MB: segment id, skip flag, Y mode, 16 submodes, UV mode."""
    mbw, mbh = st.mbw, st.mbh
    n = mbw * mbh
    segment = [0] * n
    skip = [0] * n
    ymode = [0] * n
    uvmode = [0] * n
    submodes = [None] * n
    above_sub = [0] * (4 * mbw)  # bottom-row submodes of the MB above
    for mb_y in range(mbh):
        left_sub = [0, 0, 0, 0]  # right-column submodes of MB left
        for mb_x in range(mbw):
            i = mb_y * mbw + mb_x
            if st.seg_enabled and st.seg_update_map:
                segment[i] = bd.tree(_MB_SEG_TREE, st.seg_probs)
            if st.use_skip:
                skip[i] = bd.bool(st.prob_skip)
            ym = bd.tree(_KF_YMODE_TREE, _KF_YMODE_PROBS)
            ymode[i] = ym
            if ym == _B_PRED:
                subs = [0] * 16
                for sy in range(4):
                    for sx in range(4):
                        above = (above_sub[mb_x * 4 + sx] if sy == 0
                                 else subs[(sy - 1) * 4 + sx])
                        left = (left_sub[sy] if sx == 0
                                else subs[sy * 4 + sx - 1])
                        m = bd.tree(_BMODE_TREE,
                                    KF_BMODE_PROBS[above][left])
                        subs[sy * 4 + sx] = m
                submodes[i] = subs
            else:
                imp = _IMPLIED_SUB[ym]
                submodes[i] = [imp] * 16
            subs = submodes[i]
            for sx in range(4):
                above_sub[mb_x * 4 + sx] = subs[12 + sx]
            for sy in range(4):
                left_sub[sy] = subs[sy * 4 + 3]
            uvmode[i] = bd.tree(_UV_TREE, _KF_UV_PROBS)
    return segment, skip, ymode, uvmode, submodes


def _decode_coeffs(bd, probs, first, ctx, dq) -> tuple[np.ndarray, int]:
    """One 4x4 block's dequantized coefficients (raster order) and the
    context flag (1 when any token beyond an immediate EOB was read).
    ``probs`` = coeff_probs[plane] (8 bands x 3 ctx x 11)."""
    out = np.zeros(16, np.int32)
    n = first
    p = probs[_BANDS[n]][ctx]
    skip_eob = False
    tree = _COEFF_TREE
    start = n
    while n < 16:
        i = 2 if skip_eob else 0
        while True:
            v = tree[i + bd.bool(p[i >> 1])]
            if v <= 0:
                tok = -v - 1
                break
            i = v
        if tok == _TOK_EOB:
            break
        if tok == 0:
            n += 1
            skip_eob = True
            if n >= 16:
                break
            p = probs[_BANDS[n]][0]
            continue
        skip_eob = False
        if tok <= 4:
            val = tok
        else:
            cat = tok - 5
            val = 0
            for cp in _CAT_PROBS[cat]:
                val = (val << 1) | bd.bool(cp)
            val += _CAT_BASE[cat]
        if bd.bool(128):
            val = -val
        q = dq[0] if n == 0 else dq[1]
        out[_ZIGZAG[n]] = val * q
        nctx = 1 if (val == 1 or val == -1) else 2
        n += 1
        if n >= 16:
            break
        p = probs[_BANDS[n]][nctx]
    return out, 1 if n > start else 0


# --- intra prediction (§12) ------------------------------------------

def _pred16_or_8(buf, y0, x0, size, mode, have_above, have_left):
    """DC/V/H/TM whole-block prediction into an int32 array. ``buf``
    is the margin plane buffer; (y0, x0) the block's buffer coords."""
    above = buf[y0 - 1, x0 : x0 + size].astype(np.int32)
    left = buf[y0 : y0 + size, x0 - 1].astype(np.int32)
    if mode == _V:
        return np.repeat(above[None, :], size, 0)
    if mode == _H:
        return np.repeat(left[:, None], size, 1)
    if mode == _TM:
        al = int(buf[y0 - 1, x0 - 1])
        return np.clip(left[:, None] + above[None, :] - al, 0, 255)
    # DC with the availability rules
    if have_above and have_left:
        dc = (int(above.sum()) + int(left.sum()) + size) >> (
            5 if size == 16 else 4
        )
    elif have_above:
        dc = (int(above.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
    elif have_left:
        dc = (int(left.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
    else:
        dc = 128
    return np.full((size, size), dc, np.int32)


def _pred4(buf, y0, x0, mode, tr):
    """One 4x4 B_PRED subblock into a 4x4 int32 array. (y0, x0) are
    the subblock's top-left BUFFER coords; ``tr`` is the 4-pixel
    above-right array to use when the subblock is in the rightmost
    column (the whole-MB top-right rule)."""
    A = buf[y0 - 1, x0 : x0 + 4].astype(np.int32)
    L = buf[y0 : y0 + 4, x0 - 1].astype(np.int32)
    P = int(buf[y0 - 1, x0 - 1])
    if mode == 0:  # B_DC
        return np.full((4, 4), (int(A.sum()) + int(L.sum()) + 4) >> 3,
                       np.int32)
    if mode == 1:  # B_TM
        return np.clip(L[:, None] + A[None, :] - P, 0, 255)
    AR = tr.astype(np.int32)
    A8 = np.concatenate([A, AR])
    out = np.empty((4, 4), np.int32)
    if mode == 2:  # B_VE: filtered vertical
        e = np.empty(6, np.int32)
        e[0] = P
        e[1:5] = A
        e[5] = AR[0]
        row = (e[:-2] + 2 * e[1:-1] + e[2:] + 2) >> 2
        out[:] = row[None, :]
        return out
    if mode == 3:  # B_HE: filtered horizontal
        e = np.empty(6, np.int32)
        e[0] = P
        e[1:5] = L
        e[5] = L[3]
        col = (e[:-2] + 2 * e[1:-1] + e[2:] + 2) >> 2
        out[:] = col[:, None]
        return out
    if mode == 4:  # B_LD: down-left, diagonal over A8
        v = np.empty(7, np.int32)
        v[:6] = (A8[:6] + 2 * A8[1:7] + np.append(A8[2:8], 0)[:6] + 2) >> 2
        v[6] = (A8[6] + 3 * A8[7] + 2) >> 2
        for r in range(4):
            out[r] = v[r : r + 4]
        return out
    # edge array for the right-down family: L3 L2 L1 L0 P A0 A1 A2 A3
    pp = np.empty(9, np.int32)
    pp[0:4] = L[::-1]
    pp[4] = P
    pp[5:9] = A
    s3 = (pp[:-2] + 2 * pp[1:-1] + pp[2:] + 2) >> 2  # len 7, center k+1
    s2 = (pp[:-1] + pp[1:] + 1) >> 1  # len 8, avg of pp[k], pp[k+1]
    if mode == 5:  # B_RD: pred[r][c] = s3 centered at pp[3 + c - r + 1]
        for r in range(4):
            for c in range(4):
                out[r, c] = s3[3 + c - r]
        return out
    if mode == 6:  # B_VR
        out[3, 0] = s3[1]
        out[2, 0] = s3[2]
        out[3, 1] = out[1, 0] = s3[3]
        out[2, 1] = out[0, 0] = s2[4]
        out[3, 2] = out[1, 1] = s3[4]
        out[2, 2] = out[0, 1] = s2[5]
        out[3, 3] = out[1, 2] = s3[5]
        out[2, 3] = out[0, 2] = s2[6]
        out[1, 3] = s3[6]
        out[0, 3] = s2[7]
        return out
    if mode == 7:  # B_VL over A8
        a3 = (A8[:-2] + 2 * A8[1:-1] + A8[2:] + 2) >> 2  # len 6
        a2 = (A8[:-1] + A8[1:] + 1) >> 1  # len 7
        out[0, 0] = a2[0]
        out[1, 0] = a3[0]
        out[2, 0] = out[0, 1] = a2[1]
        out[1, 1] = out[3, 0] = a3[1]
        out[2, 1] = out[0, 2] = a2[2]
        out[3, 1] = out[1, 2] = a3[2]
        out[0, 3] = out[2, 2] = a2[3]
        out[1, 3] = out[3, 2] = a3[3]
        out[2, 3] = a3[4]
        out[3, 3] = a3[5]
        return out
    if mode == 8:  # B_HD
        out[3, 0] = s2[0]
        out[3, 1] = s3[0]
        out[2, 0] = out[3, 2] = s2[1]
        out[2, 1] = out[3, 3] = s3[1]
        out[2, 2] = out[1, 0] = s2[2]
        out[2, 3] = out[1, 1] = s3[2]
        out[1, 2] = out[0, 0] = s2[3]
        out[1, 3] = out[0, 1] = s3[3]
        out[0, 2] = s3[4]
        out[0, 3] = s3[5]
        return out
    # mode == 9, B_HU over L
    l2 = (L[:-1] + L[1:] + 1) >> 1  # len 3
    l3 = (L[:-2] + 2 * L[1:-1] + L[2:] + 2) >> 2  # len 2
    out[0, 0] = l2[0]
    out[0, 1] = l3[0]
    out[0, 2] = out[1, 0] = l2[1]
    out[0, 3] = out[1, 1] = l3[1]
    out[1, 2] = out[2, 0] = l2[2]
    out[1, 3] = out[2, 1] = (L[2] + 3 * L[3] + 2) >> 2
    out[2, 2] = out[2, 3] = out[3, 0] = out[3, 1] = out[3, 2] = \
        out[3, 3] = L[3]
    return out


# --- loop filter (§15), vectorized across each edge -------------------

def _s(x):
    """uint8 pixels -> signed domain (int32)."""
    return x.astype(np.int32) - 128


def _u(x, dst):
    """signed domain -> clamp to [-128, 127] -> back to uint8."""
    np.copyto(dst, (np.clip(x, -128, 127) + 128).astype(np.uint8))


def _c(x):
    return np.clip(x, -128, 127)


def _normal_mask(p3, p2, p1, p0, q0, q1, q2, q3, edge_lim, int_lim):
    return (
        (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= edge_lim)
        & (np.abs(p3 - p2) <= int_lim) & (np.abs(p2 - p1) <= int_lim)
        & (np.abs(p1 - p0) <= int_lim) & (np.abs(q1 - q0) <= int_lim)
        & (np.abs(q2 - q1) <= int_lim) & (np.abs(q3 - q2) <= int_lim)
    )


def _filter_normal(px, edge_lim, int_lim, hev_t, mbedge):
    """Normal loop filter on one edge. ``px`` = uint8 array (8, n):
    rows P3 P2 P1 P0 Q0 Q1 Q2 Q3 across the edge; modified in place."""
    p3, p2, p1, p0, q0, q1, q2, q3 = (_s(px[i]) for i in range(8))
    mask = _normal_mask(p3, p2, p1, p0, q0, q1, q2, q3, edge_lim, int_lim)
    if not mask.any():
        return
    hev = (np.abs(p1 - p0) > hev_t) | (np.abs(q1 - q0) > hev_t)
    # common adjust with outer taps where hev (both edge kinds)
    a = _c(_c(p1 - q1) + 3 * (q0 - p0))
    f = _c(a + 4) >> 3
    e = _c(a + 3) >> 3
    m_hev = mask & hev
    q0n = np.where(m_hev, _c(q0 - f), q0)
    p0n = np.where(m_hev, _c(p0 + e), p0)
    m = mask & ~hev
    if mbedge:
        w = _c(_c(p1 - q1) + 3 * (q0 - p0))
        a27 = _c((27 * w + 63) >> 7)
        a18 = _c((18 * w + 63) >> 7)
        a9 = _c((9 * w + 63) >> 7)
        q0n = np.where(m, _c(q0 - a27), q0n)
        p0n = np.where(m, _c(p0 + a27), p0n)
        q1n = np.where(m, _c(q1 - a18), q1)
        p1n = np.where(m, _c(p1 + a18), p1)
        q2n = np.where(m, _c(q2 - a9), q2)
        p2n = np.where(m, _c(p2 + a9), p2)
        _u(q2n, px[6])
        _u(p2n, px[1])
    else:
        # subblock edge: inner taps without hev use the halved F
        a2 = _c(3 * (q0 - p0))  # no outer taps
        f2 = _c(a2 + 4) >> 3
        e2 = _c(a2 + 3) >> 3
        q0n = np.where(m, _c(q0 - f2), q0n)
        p0n = np.where(m, _c(p0 + e2), p0n)
        f3 = (f2 + 1) >> 1
        q1n = np.where(m, _c(q1 - f3), q1)
        p1n = np.where(m, _c(p1 + f3), p1)
    _u(q0n, px[4])
    _u(p0n, px[3])
    _u(q1n, px[5])
    _u(p1n, px[2])


def _filter_simple(px, edge_lim):
    """Simple loop filter (§15.1): P1 P0 Q0 Q1 rows, in place."""
    p1, p0, q0, q1 = (_s(px[i]) for i in range(4))
    mask = np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= edge_lim
    if not mask.any():
        return
    a = _c(_c(p1 - q1) + 3 * (q0 - p0))
    f = _c(a + 4) >> 3
    e = _c(a + 3) >> 3
    _u(np.where(mask, _c(q0 - f), q0), px[2])
    _u(np.where(mask, _c(p0 + e), p0), px[1])


def _v_edge(plane, x, y0, n, fn, *args):
    """Filter the vertical edge at column x, rows y0..y0+n."""
    taps = 4 if fn is _filter_normal else 2
    seg = plane[y0 : y0 + n, x - taps : x + taps]
    px = np.ascontiguousarray(seg.T)
    fn(px, *args)
    seg[:] = px.T


def _h_edge(plane, y, x0, n, fn, *args):
    taps = 4 if fn is _filter_normal else 2
    seg = plane[y - taps : y + taps, x0 : x0 + n]
    px = np.ascontiguousarray(seg)
    fn(px, *args)
    seg[:] = px


def _loop_filter(st, yb, ub, vb, levels, inner_flags):
    """Apply the frame loop filter in MB raster order (§15.2)."""
    mbw, mbh = st.mbw, st.mbh
    W, H = mbw * 16, mbh * 16
    y = yb[1 : H + 1, 1 : W + 1]
    u = ub[1 : H // 2 + 1, 1 : W // 2 + 1]
    v = vb[1 : H // 2 + 1, 1 : W // 2 + 1]
    for mb_y in range(mbh):
        for mb_x in range(mbw):
            i = mb_y * mbw + mb_x
            lvl = levels[i]
            if lvl == 0:
                continue
            interior = lvl
            if st.sharpness:
                interior >>= 2 if st.sharpness > 4 else 1
                cap = 9 - st.sharpness
                if interior > cap:
                    interior = cap
            if interior < 1:
                interior = 1
            mb_lim = (lvl + 2) * 2 + interior
            sub_lim = lvl * 2 + interior
            hev_t = 2 if lvl >= 40 else (1 if lvl >= 15 else 0)
            inner = inner_flags[i]
            x0, y0 = mb_x * 16, mb_y * 16
            cx0, cy0 = mb_x * 8, mb_y * 8
            if st.use_simple:
                if mb_x:
                    _v_edge(y, x0, y0, 16, _filter_simple, mb_lim)
                if inner:
                    for dx in (4, 8, 12):
                        _v_edge(y, x0 + dx, y0, 16, _filter_simple,
                                sub_lim)
                if mb_y:
                    _h_edge(y, y0, x0, 16, _filter_simple, mb_lim)
                if inner:
                    for dy in (4, 8, 12):
                        _h_edge(y, y0 + dy, x0, 16, _filter_simple,
                                sub_lim)
                continue
            if mb_x:
                _v_edge(y, x0, y0, 16, _filter_normal, mb_lim,
                        interior, hev_t, True)
                _v_edge(u, cx0, cy0, 8, _filter_normal, mb_lim,
                        interior, hev_t, True)
                _v_edge(v, cx0, cy0, 8, _filter_normal, mb_lim,
                        interior, hev_t, True)
            if inner:
                for dx in (4, 8, 12):
                    _v_edge(y, x0 + dx, y0, 16, _filter_normal,
                            sub_lim, interior, hev_t, False)
                _v_edge(u, cx0 + 4, cy0, 8, _filter_normal, sub_lim,
                        interior, hev_t, False)
                _v_edge(v, cx0 + 4, cy0, 8, _filter_normal, sub_lim,
                        interior, hev_t, False)
            if mb_y:
                _h_edge(y, y0, x0, 16, _filter_normal, mb_lim,
                        interior, hev_t, True)
                _h_edge(u, cy0, cx0, 8, _filter_normal, mb_lim,
                        interior, hev_t, True)
                _h_edge(v, cy0, cx0, 8, _filter_normal, mb_lim,
                        interior, hev_t, True)
            if inner:
                for dy in (4, 8, 12):
                    _h_edge(y, y0 + dy, x0, 16, _filter_normal,
                            sub_lim, interior, hev_t, False)
                _h_edge(u, cy0 + 4, cx0, 8, _filter_normal, sub_lim,
                        interior, hev_t, False)
                _h_edge(v, cy0 + 4, cx0, 8, _filter_normal, sub_lim,
                        interior, hev_t, False)


# --- top-level decode --------------------------------------------------

def decode_vp8_planes(data: bytes):
    """Decode one VP8 keyframe payload (the body of a ``VP8 `` chunk)
    to ``(y, u, v)`` uint8 planes, cropped to the frame size (chroma
    at half resolution, ceil-divided). Raises ValueError on malformed
    input — callers wanting the honest-stub posture catch it."""
    st, bd = _parse_header(data)
    segment, skip, ymode, uvmode, submodes = _parse_modes(st, bd)
    mbw, mbh = st.mbw, st.mbh
    W, H = mbw * 16, mbh * 16

    # margin buffers: row 0 = above-frame 127s, col 0 = left 129s;
    # Y gets 4 extra right columns for the above-right rule
    yb = np.empty((H + 1, W + 5), np.uint8)
    ub = np.empty((H // 2 + 1, W // 2 + 1), np.uint8)
    vb = np.empty_like(ub)
    for b in (yb, ub, vb):
        b[:, 0] = 129
        b[0, :] = 127

    # per-segment dequant factors
    seg_dq = []
    for s in range(4):
        if st.seg_enabled:
            qi = st.seg_q[s] if st.seg_abs else st.qi + st.seg_q[s]
        else:
            qi = st.qi
        seg_dq.append(_dequant_factors(_clamp_q(qi), *st.dq))

    # per-segment base filter levels
    seg_lvl = []
    for s in range(4):
        if st.seg_enabled:
            lvl = (st.seg_lf[s] if st.seg_abs
                   else st.filter_level + st.seg_lf[s])
        else:
            lvl = st.filter_level
        seg_lvl.append(max(0, min(63, lvl)))

    n = mbw * mbh
    levels = [0] * n
    inner_flags = [False] * n

    # nonzero-context trackers
    above_y = [0] * (4 * mbw)
    above_u = [0] * (2 * mbw)
    above_v = [0] * (2 * mbw)
    above_y2 = [0] * mbw
    probs = st.coeff_probs
    nparts = len(st.partitions)

    for mb_y in range(mbh):
        td = st.partitions[mb_y % nparts]
        left_y = [0, 0, 0, 0]
        left_u = [0, 0]
        left_v = [0, 0]
        left_y2 = 0
        row_above = mb_y * 16  # buffer row of the pixel row above
        crow_above = mb_y * 8
        for mb_x in range(mbw):
            i = mb_y * mbw + mb_x
            seg = segment[i]
            ym = ymode[i]
            has_y2 = ym != _B_PRED
            dq_y1, dq_y2, dq_uv = seg_dq[seg]
            x0 = mb_x * 16
            cx0 = mb_x * 8

            # --- residual tokens
            ycoef = [None] * 16
            ucoef = [None] * 4
            vcoef = [None] * 4
            has_res = False
            if skip[i]:
                for k in range(4):
                    above_y[mb_x * 4 + k] = 0
                    left_y[k] = 0
                for k in range(2):
                    above_u[mb_x * 2 + k] = 0
                    left_u[k] = 0
                    above_v[mb_x * 2 + k] = 0
                    left_v[k] = 0
                if has_y2:
                    above_y2[mb_x] = 0
                    left_y2 = 0
                y2_dcs = None
            else:
                y2_dcs = None
                if has_y2:
                    ctx = above_y2[mb_x] + left_y2
                    blk, nz = _decode_coeffs(td, probs[1], 0, ctx, dq_y2)
                    above_y2[mb_x] = left_y2 = nz
                    has_res |= bool(nz)
                    y2_dcs = _iwht4x4(blk)
                plane = 0 if has_y2 else 3
                first = 1 if has_y2 else 0
                for sy in range(4):
                    for sx in range(4):
                        ctx = above_y[mb_x * 4 + sx] + left_y[sy]
                        blk, nz = _decode_coeffs(
                            td, probs[plane], first, ctx, dq_y1
                        )
                        above_y[mb_x * 4 + sx] = left_y[sy] = nz
                        has_res |= bool(nz)
                        ycoef[sy * 4 + sx] = blk
                for av, lf, store in (
                    (above_u, left_u, ucoef),
                    (above_v, left_v, vcoef),
                ):
                    for sy in range(2):
                        for sx in range(2):
                            ctx = av[mb_x * 2 + sx] + lf[sy]
                            blk, nz = _decode_coeffs(
                                td, probs[2], 0, ctx, dq_uv
                            )
                            av[mb_x * 2 + sx] = lf[sy] = nz
                            has_res |= bool(nz)
                            store[sy * 2 + sx] = blk
                if y2_dcs is not None:
                    for k in range(16):
                        ycoef[k][0] = y2_dcs[k]

            # --- luma reconstruction
            if ym == _B_PRED:
                # top-right rule: capture the MB's above-right pixels
                if mb_y > 0 and mb_x == mbw - 1:
                    yb[row_above, W + 1 : W + 5] = yb[row_above, W]
                tr = yb[row_above, x0 + 17 : x0 + 21].copy()
                for sy in range(4):
                    for sx in range(4):
                        by = row_above + 1 + sy * 4
                        bx = x0 + 1 + sx * 4
                        pred = _pred4(
                            yb, by, bx, submodes[i][sy * 4 + sx],
                            tr if sx == 3 else
                            yb[by - 1, bx + 4 : bx + 8],
                        )
                        blk = ycoef[sy * 4 + sx]
                        if blk is not None and blk.any():
                            pred = pred + _idct4x4(blk)
                        yb[by : by + 4, bx : bx + 4] = np.clip(
                            pred, 0, 255
                        )
            else:
                pred = _pred16_or_8(
                    yb, row_above + 1, x0 + 1, 16, ym,
                    mb_y > 0, mb_x > 0,
                ).copy()
                for sy in range(4):
                    for sx in range(4):
                        blk = ycoef[sy * 4 + sx]
                        if blk is not None and blk.any():
                            pred[sy * 4 : sy * 4 + 4,
                                 sx * 4 : sx * 4 + 4] += _idct4x4(blk)
                yb[row_above + 1 : row_above + 17,
                   x0 + 1 : x0 + 17] = np.clip(pred, 0, 255)

            # --- chroma reconstruction
            for cb, store in ((ub, ucoef), (vb, vcoef)):
                pred = _pred16_or_8(
                    cb, crow_above + 1, cx0 + 1, 8, uvmode[i],
                    mb_y > 0, mb_x > 0,
                ).copy()
                for sy in range(2):
                    for sx in range(2):
                        blk = store[sy * 2 + sx]
                        if blk is not None and blk.any():
                            pred[sy * 4 : sy * 4 + 4,
                                 sx * 4 : sx * 4 + 4] += _idct4x4(blk)
                cb[crow_above + 1 : crow_above + 9,
                   cx0 + 1 : cx0 + 9] = np.clip(pred, 0, 255)

            # --- loop filter level for this MB
            lvl = seg_lvl[seg]
            if st.lf_delta:
                lvl += st.ref_deltas[0]  # keyframe MBs are all intra
                if ym == _B_PRED:
                    lvl += st.mode_deltas[0]
                lvl = max(0, min(63, lvl))
            levels[i] = lvl
            inner_flags[i] = has_res or ym == _B_PRED

    if any(levels):
        _loop_filter(st, yb, ub, vb, levels, inner_flags)

    y = yb[1 : st.h + 1, 1 : st.w + 1].copy()
    cw, ch = (st.w + 1) >> 1, (st.h + 1) >> 1
    u = ub[1 : ch + 1, 1 : cw + 1].copy()
    v = vb[1 : ch + 1, 1 : cw + 1].copy()
    return y, u, v


def decode_vp8_rgb(data: bytes) -> np.ndarray:
    """Decode a VP8 keyframe payload to an (h, w, 3) uint8 RGB array.
    BT.601 studio-swing conversion with nearest-neighbor chroma
    upsampling (deterministic; libwebp's fancy bilinear upsampler
    differs by a few LSBs on chroma edges — the YUV planes themselves
    match it exactly, see decode_vp8_planes)."""
    y, u, v = decode_vp8_planes(data)
    h, w = y.shape
    uu = np.repeat(np.repeat(u, 2, 0), 2, 1)[:h, :w].astype(np.int32)
    vv = np.repeat(np.repeat(v, 2, 0), 2, 1)[:h, :w].astype(np.int32)
    yy = y.astype(np.int32)
    c = 298 * (yy - 16)
    r = (c + 409 * (vv - 128) + 128) >> 8
    g = (c - 100 * (uu - 128) - 208 * (vv - 128) + 128) >> 8
    b = (c + 516 * (uu - 128) + 128) >> 8
    return np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8)
