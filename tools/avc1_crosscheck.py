#!/usr/bin/env python3
"""Certification twin of graft.scale.Avc (H.264 baseline I-frame decode).

No system H.264 implementation exists in this container (ldconfig lists
HEVC/AV1 codecs only; no ffmpeg/x264/openh264/libavcodec), so the libwebp
pattern used for VP8 (tools/vp8_crosscheck.py) is impossible for avc1.
This file is the strongest available substitute: a SECOND decoder,
written independently from the published ITU-T H.264 spec text in pure
Python, sharing no code with the Scala implementation. It decodes every
fixture bitstream `graft.AvcCrosscheck gen` wrote and requires the luma
plane to equal the repo decoder's output byte-exactly.

Agreement certifies the algorithmic semantics end to end: NAL/RBSP
handling, Exp-Golomb, CAVLC level/run reconstruction, intra prediction
(all 9 4x4 modes, 4 16x16 modes, 4 chroma modes), scaling + inverse
transforms (4x4 core, luma DC Hadamard, chroma DC), QP chaining, and the
full in-loop deblocking filter. The static VLC code tables are published
constants carried by both implementations (independently typed; a shared
misreading of the published tables is the residual risk and is documented
in the Avc scaladoc).

Usage:
  sbt -batch "runMain graft.AvcCrosscheck gen /tmp/avc1check"
  python3 tools/avc1_crosscheck.py /tmp/avc1check
"""
import glob
import os
import sys

# --------------------------------------------------------------------
# Tables (ITU-T H.264, transcribed independently of the Scala source)
# --------------------------------------------------------------------

# Table 9-5 coeff_token: {code: (trailing_ones, total_coeff)} per context
def _ct(table_str):
    out = {}
    for line in table_str.strip().split("\n"):
        code, t1, tc = line.split()
        out[code] = (int(t1), int(tc))
    return out

COEFF_TOKEN_NC0 = _ct("""
1 0 0
000101 0 1
01 1 1
00000111 0 2
000100 1 2
001 2 2
000000111 0 3
00000110 1 3
0000101 2 3
00011 3 3
0000000111 0 4
000000110 1 4
00000101 2 4
000011 3 4
00000000111 0 5
0000000110 1 5
000000101 2 5
0000100 3 5
0000000001111 0 6
00000000110 1 6
0000000101 2 6
00000100 3 6
0000000001011 0 7
0000000001110 1 7
00000000101 2 7
000000100 3 7
0000000001000 0 8
0000000001010 1 8
0000000001101 2 8
0000000100 3 8
00000000001111 0 9
00000000001110 1 9
0000000001001 2 9
00000000100 3 9
00000000001011 0 10
00000000001010 1 10
00000000001101 2 10
0000000001100 3 10
000000000001111 0 11
000000000001110 1 11
00000000001001 2 11
00000000001100 3 11
000000000001011 0 12
000000000001010 1 12
000000000001101 2 12
00000000001000 3 12
0000000000001111 0 13
000000000000001 1 13
000000000001001 2 13
000000000001100 3 13
0000000000001011 0 14
0000000000001110 1 14
0000000000001101 2 14
000000000001000 3 14
0000000000000111 0 15
0000000000001010 1 15
0000000000001001 2 15
0000000000001100 3 15
0000000000000100 0 16
0000000000000110 1 16
0000000000000101 2 16
0000000000001000 3 16
""")

COEFF_TOKEN_NC2 = _ct("""
11 0 0
001011 0 1
10 1 1
000111 0 2
00111 1 2
011 2 2
0000111 0 3
001010 1 3
001001 2 3
0101 3 3
00000111 0 4
000110 1 4
000101 2 4
0100 3 4
00000100 0 5
0000110 1 5
0000101 2 5
00110 3 5
000000111 0 6
00000110 1 6
00000101 2 6
001000 3 6
00000001111 0 7
000000110 1 7
000000101 2 7
000100 3 7
00000001011 0 8
00000001110 1 8
00000001101 2 8
0000100 3 8
000000001111 0 9
00000001010 1 9
00000001001 2 9
000000100 3 9
000000001011 0 10
000000001110 1 10
000000001101 2 10
00000001100 3 10
000000001000 0 11
000000001010 1 11
000000001001 2 11
00000001000 3 11
0000000001111 0 12
0000000001110 1 12
0000000001101 2 12
000000001100 3 12
0000000001011 0 13
0000000001010 1 13
0000000001001 2 13
0000000001100 3 13
0000000000111 0 14
00000000001011 1 14
0000000000110 2 14
0000000001000 3 14
00000000001001 0 15
00000000001000 1 15
00000000001010 2 15
0000000000001 3 15
00000000000111 0 16
00000000000110 1 16
00000000000101 2 16
00000000000100 3 16
""")

COEFF_TOKEN_NC4 = _ct("""
1111 0 0
001111 0 1
1110 1 1
001011 0 2
01111 1 2
1101 2 2
001000 0 3
01100 1 3
01110 2 3
1100 3 3
0001111 0 4
01010 1 4
01011 2 4
1011 3 4
0001011 0 5
01000 1 5
01001 2 5
1010 3 5
0001001 0 6
001110 1 6
001101 2 6
1001 3 6
0001000 0 7
001010 1 7
001001 2 7
1000 3 7
00001111 0 8
0001110 1 8
0001101 2 8
01101 3 8
00001011 0 9
00001110 1 9
0001010 2 9
001100 3 9
000001111 0 10
00001010 1 10
00001101 2 10
0001100 3 10
000001011 0 11
000001110 1 11
00001001 2 11
00001100 3 11
000001000 0 12
000001010 1 12
000001101 2 12
00001000 3 12
0000001101 0 13
000000111 1 13
000001001 2 13
000001100 3 13
0000001001 0 14
0000001100 1 14
0000001011 2 14
0000001010 3 14
0000000101 0 15
0000001000 1 15
0000000111 2 15
0000000110 3 15
0000000001 0 16
0000000100 1 16
0000000011 2 16
0000000010 3 16
""")

COEFF_TOKEN_CDC = _ct("""
01 0 0
000111 0 1
1 1 1
000100 0 2
000110 1 2
001 2 2
000011 0 3
0000011 1 3
0000010 2 3
000101 3 3
000010 0 4
00000011 1 4
00000010 2 4
0000000 3 4
""")

# Table 9-7: total_zeros, 4x4 blocks, rows indexed by TotalCoeff 1..15
TOTAL_ZEROS = [
    "1 011 010 0011 0010 00011 00010 000011 000010 0000011 0000010 00000011 00000010 000000011 000000010 000000001",
    "111 110 101 100 011 0101 0100 0011 0010 00011 00010 000011 000010 000001 000000",
    "0101 111 110 101 0100 0011 100 011 0010 00011 00010 000001 00001 000000",
    "00011 111 0101 0100 110 101 100 0011 011 0010 00010 00001 00000",
    "0101 0100 0011 111 110 101 100 011 0010 00001 0001 00000",
    "000001 00001 111 110 101 100 011 010 0001 001 000000",
    "000001 00001 101 100 011 11 010 0001 001 000000",
    "000001 0001 00001 011 11 10 010 001 000000",
    "000001 000000 0001 11 10 001 01 00001",
    "00001 00000 001 11 10 01 0001",
    "0000 0001 001 010 1 011",
    "0000 0001 01 1 001",
    "000 001 1 01",
    "00 01 1",
    "0 1",
]
TOTAL_ZEROS = [
    {code: tz for tz, code in enumerate(row.split())} for row in TOTAL_ZEROS
]

# Table 9-9 (a): total_zeros for chroma DC (4:2:0)
TZ_CDC = [
    {"1": 0, "01": 1, "001": 2, "000": 3},
    {"1": 0, "01": 1, "00": 2},
    {"1": 0, "0": 1},
]

# Table 9-10: run_before, rows indexed by min(zerosLeft, 7)
RUN_BEFORE = [
    {"1": 0, "0": 1},
    {"1": 0, "01": 1, "00": 2},
    {"11": 0, "10": 1, "01": 2, "00": 3},
    {"11": 0, "10": 1, "01": 2, "001": 3, "000": 4},
    {"11": 0, "10": 1, "011": 2, "010": 3, "001": 4, "000": 5},
    {"11": 0, "000": 1, "001": 2, "011": 3, "010": 4, "101": 5, "100": 6},
    {"111": 0, "110": 1, "101": 2, "100": 3, "011": 4, "010": 5, "001": 6,
     "0001": 7, "00001": 8, "000001": 9, "0000001": 10, "00000001": 11,
     "000000001": 12, "0000000001": 13, "00000000001": 14},
]

# Table 9-4 me(v) -> coded_block_pattern, Intra_4x4 column
CBP_INTRA = [47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
             16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
             8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41]

# Table 9-4 me(v) -> coded_block_pattern, Inter column (P macroblocks)
CBP_INTER = [0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13,
             14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46,
             17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41]

ZIGZAG = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]

# normAdjust4x4 columns by position class (even/even, odd/odd, mixed)
NORM_ADJUST = [(10, 16, 13), (11, 18, 14), (13, 20, 16),
               (14, 23, 18), (16, 25, 20), (18, 29, 23)]

QPC_MAP = [29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37, 38,
           38, 38, 39, 39, 39, 39]

ALPHA = [0] * 16 + [4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28,
                    32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127,
                    144, 162, 182, 203, 226, 255, 255]
BETA = [0] * 16 + [2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8, 9, 9,
                   10, 10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16,
                   17, 17, 18, 18]
TC0_BS3 = [0] * 16 + [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2,
                      3, 3, 3, 4, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14,
                      16, 18, 20, 23]
# Table 8-17 rows for the inter boundary strengths (bS 1 and 2)
TC0_BS1 = [0] * 16 + [0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                      1, 1, 2, 2, 2, 2, 3, 3, 3, 4, 4, 4, 5, 6, 6, 7,
                      8, 9, 10, 11]
TC0_BS2 = [0] * 16 + [0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                      2, 2, 2, 2, 3, 3, 3, 4, 4, 5, 5, 6, 7, 8, 8, 10,
                      11, 12, 13, 15]
TC0 = {1: TC0_BS1, 2: TC0_BS2, 3: TC0_BS3}

# block index <-> position: z-scan of 4x4 blocks inside a macroblock
BLK_XY = []
for i in range(16):
    qx = ((i >> 2) & 1) * 8
    qy = ((i >> 3) & 1) * 8
    BLK_XY.append((qx + (i & 1) * 4, qy + ((i >> 1) & 1) * 4))
BLK_IDX = {}
for i, (x, y) in enumerate(BLK_XY):
    BLK_IDX[(x // 4, y // 4)] = i


def clip255(v):
    return 0 if v < 0 else (255 if v > 255 else v)


def pos_class(i, j):
    if i % 2 == 0 and j % 2 == 0:
        return 0
    if i % 2 == 1 and j % 2 == 1:
        return 1
    return 2


# --------------------------------------------------------------------
# Bit reading
# --------------------------------------------------------------------

class Bits:
    def __init__(self, data):
        self.d = data
        self.p = 0

    def bit(self):
        if self.p >= len(self.d) * 8:
            raise ValueError("rbsp overrun")
        v = (self.d[self.p >> 3] >> (7 - (self.p & 7))) & 1
        self.p += 1
        return v

    def bits(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def ue(self):
        z = 0
        while self.bit() == 0:
            z += 1
            if z > 31:
                raise ValueError("ue overrun")
        return (1 << z) - 1 + (self.bits(z) if z else 0)

    def se(self):
        k = self.ue()
        return -(k // 2) if k % 2 == 0 else (k + 1) // 2

    def align(self):
        self.p = (self.p + 7) & ~7

    def more_rbsp(self):
        if self.p >= len(self.d) * 8:
            return False
        last = len(self.d) * 8 - 1
        while last >= 0 and ((self.d[last >> 3] >> (7 - (last & 7))) & 1) == 0:
            last -= 1
        return self.p < last

    def vlc(self, table):
        code = ""
        for _ in range(20):
            code += "1" if self.bit() else "0"
            if code in table:
                return table[code]
        raise ValueError("bad vlc " + code)


def un_epb(data):
    out = bytearray()
    zeros = 0
    for b in data:
        if zeros >= 2 and b == 3:
            zeros = 0
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def nal_units(data):
    """Annex-B split: list of (nal_type, rbsp_payload_after_header)."""
    idx = []
    i = 0
    while i + 3 <= len(data):
        if data[i] == 0 and data[i + 1] == 0 and data[i + 2] == 1:
            idx.append(i + 3)
            i += 3
        else:
            i += 1
    out = []
    for k, s in enumerate(idx):
        e = idx[k + 1] - 3 if k + 1 < len(idx) else len(data)
        while e > s and data[e - 1] == 0:
            e -= 1
        hdr = data[s]
        out.append((hdr & 0x1F, (hdr >> 5) & 3, un_epb(data[s + 1:e])))
    return out


# --------------------------------------------------------------------
# Parameter sets
# --------------------------------------------------------------------

def parse_sps(r):
    profile = r.bits(8)
    r.bits(8)
    r.bits(8)
    sps_id = r.ue()
    if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134):
        assert r.ue() == 1
        assert r.ue() == 0 and r.ue() == 0
        r.bit()
        assert r.bit() == 0
    log2_max_frame_num = r.ue() + 4
    poc_type = r.ue()
    log2_max_poc = 0
    poc_delta_zero = True
    if poc_type == 0:
        log2_max_poc = r.ue() + 4
    elif poc_type == 1:
        poc_delta_zero = r.bit() == 1
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()
    r.bit()
    w_mbs = r.ue() + 1
    h_mbs = r.ue() + 1
    assert r.bit() == 1  # frame_mbs_only
    r.bit()
    crop = (0, 0, 0, 0)
    if r.bit():
        crop = (r.ue(), r.ue(), r.ue(), r.ue())
    return dict(id=sps_id, w_mbs=w_mbs, h_mbs=h_mbs, crop=crop,
                log2_max_frame_num=log2_max_frame_num, poc_type=poc_type,
                log2_max_poc=log2_max_poc, poc_delta_zero=poc_delta_zero)


def parse_pps(r):
    pps_id = r.ue()
    sps_id = r.ue()
    cabac = r.bit()
    pic_order_present = r.bit()
    assert r.ue() == 0  # one slice group
    num_ref_l0 = r.ue()
    r.ue()
    weighted = r.bit()
    r.bits(2)
    init_qp = r.se() + 26
    r.se()
    chroma_qp_off = r.se()
    deblock_ctrl = r.bit()
    constrained = r.bit()
    redundant = r.bit()
    return dict(id=pps_id, sps=sps_id, cabac=cabac, init_qp=init_qp,
                chroma_qp_off=chroma_qp_off, deblock_ctrl=deblock_ctrl,
                constrained=constrained, redundant=redundant,
                pic_order_present=pic_order_present,
                num_ref_l0=num_ref_l0, weighted=weighted)


# --------------------------------------------------------------------
# CAVLC residual block
# --------------------------------------------------------------------

def read_block(r, nc, max_coeff):
    out = [0] * max_coeff
    if nc == -1:
        t1s, tc = r.vlc(COEFF_TOKEN_CDC)
    elif nc < 2:
        t1s, tc = r.vlc(COEFF_TOKEN_NC0)
    elif nc < 4:
        t1s, tc = r.vlc(COEFF_TOKEN_NC2)
    elif nc < 8:
        t1s, tc = r.vlc(COEFF_TOKEN_NC4)
    else:
        v = r.bits(6)
        t1s, tc = (0, 0) if v == 3 else (v & 3, (v >> 2) + 1)
    if tc == 0:
        return out, 0
    levels = []
    for _ in range(t1s):
        levels.append(-1 if r.bit() else 1)
    suffix_len = 1 if tc > 10 and t1s < 3 else 0
    for i in range(t1s, tc):
        prefix = 0
        while r.bit() == 0:
            prefix += 1
        if prefix == 14 and suffix_len == 0:
            size = 4
        elif prefix >= 15:
            size = prefix - 3
        else:
            size = suffix_len
        code = min(15, prefix) << suffix_len
        if size:
            code += r.bits(size)
        if prefix >= 15 and suffix_len == 0:
            code += 15
        if prefix >= 16:
            code += (1 << (prefix - 3)) - 4096
        if i == t1s and t1s < 3:
            code += 2
        level = (code + 2) >> 1 if code % 2 == 0 else -((code + 1) >> 1)
        levels.append(level)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    total_zeros = 0
    if tc < max_coeff:
        if max_coeff == 4:
            total_zeros = r.vlc(TZ_CDC[tc - 1])
        else:
            total_zeros = r.vlc(TOTAL_ZEROS[tc - 1])
    zeros_left = total_zeros
    pos = tc - 1 + total_zeros
    for i in range(tc):
        out[pos] = levels[i]
        if i < tc - 1:
            run = r.vlc(RUN_BEFORE[min(zeros_left, 7) - 1]) if zeros_left else 0
            zeros_left -= run
            pos -= 1 + run
    return out, tc


# --------------------------------------------------------------------
# Transforms / scaling
# --------------------------------------------------------------------

def dequant(c, qp, i, j):
    ls = 16 * NORM_ADJUST[qp % 6][pos_class(i, j)]
    if qp >= 24:
        return (c * ls) << (qp // 6 - 4)
    return (c * ls + (1 << (3 - qp // 6))) >> (4 - qp // 6)


def itrans(d):
    e = [0] * 16
    for i in range(4):
        d0, d1, d2, d3 = d[4 * i:4 * i + 4]
        a, b = d0 + d2, d0 - d2
        c, f = (d1 >> 1) - d3, d1 + (d3 >> 1)
        e[4 * i:4 * i + 4] = [a + f, b + c, b - c, a - f]
    out = [0] * 16
    for j in range(4):
        d0, d1, d2, d3 = e[j], e[4 + j], e[8 + j], e[12 + j]
        a, b = d0 + d2, d0 - d2
        c, f = (d1 >> 1) - d3, d1 + (d3 >> 1)
        out[j] = (a + f + 32) >> 6
        out[4 + j] = (b + c + 32) >> 6
        out[8 + j] = (b - c + 32) >> 6
        out[12 + j] = (a - f + 32) >> 6
    return out


def luma_dc_dequant(c, qp):
    f = [0] * 16
    for i in range(4):
        d0, d1, d2, d3 = c[4 * i:4 * i + 4]
        a, b, cc, dd = d0 + d2, d0 - d2, d1 - d3, d1 + d3
        f[4 * i:4 * i + 4] = [a + dd, b + cc, b - cc, a - dd]
    g = [0] * 16
    for j in range(4):
        d0, d1, d2, d3 = f[j], f[4 + j], f[8 + j], f[12 + j]
        a, b, cc, dd = d0 + d2, d0 - d2, d1 - d3, d1 + d3
        g[j], g[4 + j], g[8 + j], g[12 + j] = a + dd, b + cc, b - cc, a - dd
    ls = 16 * NORM_ADJUST[qp % 6][0]
    if qp >= 36:
        return [(v * ls) << (qp // 6 - 6) for v in g]
    return [(v * ls + (1 << (5 - qp // 6))) >> (6 - qp // 6) for v in g]


def chroma_dc_dequant(c, qp):
    f = [c[0] + c[1] + c[2] + c[3], c[0] - c[1] + c[2] - c[3],
         c[0] + c[1] - c[2] - c[3], c[0] - c[1] - c[2] + c[3]]
    ls = 16 * NORM_ADJUST[qp % 6][0]
    return [((v * ls) << (qp // 6)) >> 5 for v in f]


def chroma_qp(qpy, off):
    qpi = max(0, min(51, qpy + off))
    return qpi if qpi < 30 else QPC_MAP[qpi - 30]


# --------------------------------------------------------------------
# Intra prediction
# --------------------------------------------------------------------

def pred_4x4(mode, pa, pl, pc, above, left, corner):
    out = [0] * 16

    def put(x, y, v):
        out[y * 4 + x] = v

    if mode == 0:
        assert above
        for y in range(4):
            for x in range(4):
                put(x, y, pa[x])
    elif mode == 1:
        assert left
        for y in range(4):
            for x in range(4):
                put(x, y, pl[y])
    elif mode == 2:
        if above and left:
            v = (sum(pa[:4]) + sum(pl) + 4) >> 3
        elif above:
            v = (sum(pa[:4]) + 2) >> 2
        elif left:
            v = (sum(pl) + 2) >> 2
        else:
            v = 128
        out = [v] * 16
    elif mode == 3:
        assert above
        for y in range(4):
            for x in range(4):
                if x == 3 and y == 3:
                    put(x, y, (pa[6] + 3 * pa[7] + 2) >> 2)
                else:
                    put(x, y, (pa[x + y] + 2 * pa[x + y + 1] + pa[x + y + 2] + 2) >> 2)
    elif mode == 4:
        assert above and left and corner
        a4 = lambda i: pc if i < 0 else pa[i]
        l4 = lambda j: pc if j < 0 else pl[j]
        for y in range(4):
            for x in range(4):
                if x > y:
                    put(x, y, (a4(x - y - 2) + 2 * a4(x - y - 1) + a4(x - y) + 2) >> 2)
                elif x < y:
                    put(x, y, (l4(y - x - 2) + 2 * l4(y - x - 1) + l4(y - x) + 2) >> 2)
                else:
                    put(x, y, (pa[0] + 2 * pc + pl[0] + 2) >> 2)
    elif mode == 5:
        assert above and left and corner
        a = lambda i: pc if i < 0 else pa[i]
        for y in range(4):
            for x in range(4):
                z = 2 * x - y
                if z >= 0 and z % 2 == 0:
                    put(x, y, (a(x - (y >> 1) - 1) + a(x - (y >> 1)) + 1) >> 1)
                elif z >= 0:
                    put(x, y, (a(x - (y >> 1) - 2) + 2 * a(x - (y >> 1) - 1) +
                               a(x - (y >> 1)) + 2) >> 2)
                elif z == -1:
                    put(x, y, (pl[0] + 2 * pc + pa[0] + 2) >> 2)
                else:
                    l5 = lambda j: pc if j < 0 else pl[j]
                    put(x, y, (l5(y - 1) + 2 * l5(y - 2) + l5(y - 3) + 2) >> 2)
    elif mode == 6:
        assert above and left and corner
        l = lambda j: pc if j < 0 else pl[j]
        for y in range(4):
            for x in range(4):
                z = 2 * y - x
                if z >= 0 and z % 2 == 0:
                    put(x, y, (l(y - (x >> 1) - 1) + l(y - (x >> 1)) + 1) >> 1)
                elif z >= 0:
                    put(x, y, (l(y - (x >> 1) - 2) + 2 * l(y - (x >> 1) - 1) +
                               l(y - (x >> 1)) + 2) >> 2)
                elif z == -1:
                    put(x, y, (pl[0] + 2 * pc + pa[0] + 2) >> 2)
                else:
                    a6 = lambda i: pc if i < 0 else pa[i]
                    put(x, y, (a6(x - 1) + 2 * a6(x - 2) + a6(x - 3) + 2) >> 2)
    elif mode == 7:
        assert above
        for y in range(4):
            for x in range(4):
                if y % 2 == 0:
                    put(x, y, (pa[x + (y >> 1)] + pa[x + (y >> 1) + 1] + 1) >> 1)
                else:
                    put(x, y, (pa[x + (y >> 1)] + 2 * pa[x + (y >> 1) + 1] +
                               pa[x + (y >> 1) + 2] + 2) >> 2)
    elif mode == 8:
        assert left
        for y in range(4):
            for x in range(4):
                z = x + 2 * y
                if z < 5 and z % 2 == 0:
                    put(x, y, (pl[y + (x >> 1)] + pl[y + (x >> 1) + 1] + 1) >> 1)
                elif z < 5:
                    put(x, y, (pl[y + (x >> 1)] + 2 * pl[y + (x >> 1) + 1] +
                               pl[y + (x >> 1) + 2] + 2) >> 2)
                elif z == 5:
                    put(x, y, (pl[2] + 3 * pl[3] + 2) >> 2)
                else:
                    put(x, y, pl[3])
    else:
        raise ValueError("bad i4 mode")
    return out


def pred_16x16(mode, top, left, corner, above_ok, left_ok, corner_ok):
    out = [0] * 256
    if mode == 0:
        assert above_ok
        for y in range(16):
            out[y * 16:y * 16 + 16] = top
    elif mode == 1:
        assert left_ok
        for y in range(16):
            out[y * 16:y * 16 + 16] = [left[y]] * 16
    elif mode == 2:
        if above_ok and left_ok:
            v = (sum(top) + sum(left) + 16) >> 5
        elif above_ok:
            v = (sum(top) + 8) >> 4
        elif left_ok:
            v = (sum(left) + 8) >> 4
        else:
            v = 128
        out = [v] * 256
    elif mode == 3:
        assert above_ok and left_ok and corner_ok
        hh = sum((i + 1) * (top[8 + i] - (top[6 - i] if 6 - i >= 0 else corner))
                 for i in range(8))
        vv = sum((i + 1) * (left[8 + i] - (left[6 - i] if 6 - i >= 0 else corner))
                 for i in range(8))
        a = 16 * (left[15] + top[15])
        b = (5 * hh + 32) >> 6
        c = (5 * vv + 32) >> 6
        for y in range(16):
            for x in range(16):
                out[y * 16 + x] = clip255((a + b * (x - 7) + c * (y - 7) + 16) >> 5)
    else:
        raise ValueError("bad i16 mode")
    return out


def pred_chroma(mode, top, left, corner, above_ok, left_ok, corner_ok):
    out = [0] * 64
    if mode == 0:
        for by in range(2):
            for bx in range(2):
                st = sum(top[bx * 4:bx * 4 + 4])
                sl = sum(left[by * 4:by * 4 + 4])
                if bx == by:
                    if above_ok and left_ok:
                        v = (st + sl + 4) >> 3
                    elif above_ok:
                        v = (st + 2) >> 2
                    elif left_ok:
                        v = (sl + 2) >> 2
                    else:
                        v = 128
                elif bx == 1:
                    v = (st + 2) >> 2 if above_ok else \
                        ((sl + 2) >> 2 if left_ok else 128)
                else:
                    v = (sl + 2) >> 2 if left_ok else \
                        ((st + 2) >> 2 if above_ok else 128)
                for j in range(4):
                    for i in range(4):
                        out[(by * 4 + j) * 8 + bx * 4 + i] = v
    elif mode == 1:
        assert left_ok
        for y in range(8):
            out[y * 8:y * 8 + 8] = [left[y]] * 8
    elif mode == 2:
        assert above_ok
        for y in range(8):
            out[y * 8:y * 8 + 8] = top
    elif mode == 3:
        assert above_ok and left_ok and corner_ok
        hh = sum((i + 1) * (top[4 + i] - (top[2 - i] if 2 - i >= 0 else corner))
                 for i in range(4))
        vv = sum((i + 1) * (left[4 + i] - (left[2 - i] if 2 - i >= 0 else corner))
                 for i in range(4))
        a = 16 * (left[7] + top[7])
        b = (17 * hh + 16) >> 5
        c = (17 * vv + 16) >> 5
        for y in range(8):
            for x in range(8):
                out[y * 8 + x] = clip255((a + b * (x - 3) + c * (y - 3) + 16) >> 5)
    else:
        raise ValueError("bad chroma mode")
    return out


# --------------------------------------------------------------------
# Picture decoder
# --------------------------------------------------------------------

class Picture:
    def __init__(self, sps, pps, ref=None):
        self.sps = sps
        self.pps = pps
        self.ref = ref  # previous decoded Picture (P-slice reference)
        self.wmb = sps["w_mbs"]
        self.hmb = sps["h_mbs"]
        self.ys = self.wmb * 16
        self.cs = self.wmb * 8
        self.y = bytearray(self.ys * self.hmb * 16)
        self.u = bytearray(self.cs * self.hmb * 8)
        self.v = bytearray(self.cs * self.hmb * 8)
        n = self.wmb * self.hmb
        self.mb_slice = [-1] * n
        self.mb_i4 = [False] * n
        self.mb_pcm = [False] * n
        self.mb_inter = [False] * n
        self.mb_qp = [0] * n
        # per-4x4 motion field: ref -2 = not yet decoded, -1 = intra, 0 =
        # inter (single reference); vectors in quarter luma samples
        self.blk_ref = [-2] * (n * 16)
        self.mv_x = [0] * (n * 16)
        self.mv_y = [0] * (n * 16)
        self.luma_nz = [0] * (n * 16)
        self.cb_nz = [0] * (n * 4)
        self.cr_nz = [0] * (n * 4)
        self.i4_modes = [-1] * (n * 16)
        self.mb_chroma_mode = [0] * n
        self.mb_cbp_luma = [0] * n
        self.mb_cbp_chroma = [0] * n
        self.luma_dc_nz = [0] * n
        self.cb_dc_nz = [0] * n
        self.cr_dc_nz = [0] * n
        self.slice_deblock = []

    def avail(self, mx, my, slc):
        return (0 <= mx < self.wmb and 0 <= my < self.hmb and
                self.mb_slice[my * self.wmb + mx] == slc)

    def luma_nc(self, bx, by, slc):
        def nz(x, y):
            mb = (y // 4) * self.wmb + x // 4
            if self.mb_pcm[mb]:
                return 16
            return self.luma_nz[mb * 16 + BLK_IDX[(x % 4, y % 4)]]
        a = bx > 0 and self.avail((bx - 1) // 4, by // 4, slc)
        b = by > 0 and self.avail(bx // 4, (by - 1) // 4, slc)
        if a and b:
            return (nz(bx - 1, by) + nz(bx, by - 1) + 1) >> 1
        if a:
            return nz(bx - 1, by)
        if b:
            return nz(bx, by - 1)
        return 0

    def chroma_nc(self, bx, by, is_cb, slc):
        def nz(x, y):
            mb = (y // 2) * self.wmb + x // 2
            if self.mb_pcm[mb]:
                return 16
            arr = self.cb_nz if is_cb else self.cr_nz
            return arr[mb * 4 + (y % 2) * 2 + x % 2]
        a = bx > 0 and self.avail((bx - 1) // 2, by // 2, slc)
        b = by > 0 and self.avail(bx // 2, (by - 1) // 2, slc)
        if a and b:
            return (nz(bx - 1, by) + nz(bx, by - 1) + 1) >> 1
        if a:
            return nz(bx - 1, by)
        if b:
            return nz(bx, by - 1)
        return 0

    # ---- slice + macroblock layer

    def decode_slice(self, r, first_mb, slice_qp, deblock):
        slc = len(self.slice_deblock)
        self.slice_deblock.append(deblock)
        qp_prev = slice_qp
        addr = first_mb
        while True:
            qp_prev = self.decode_mb(r, addr, qp_prev, slc)
            addr += 1
            if not r.more_rbsp():
                break

    def decode_mb(self, r, addr, qp_prev, slc):
        return self.decode_mb_intra(r, addr, r.ue(), qp_prev, slc)

    def decode_mb_intra(self, r, addr, mb_type, qp_prev, slc):
        wmb = self.wmb
        mx, my = addr % wmb, addr // wmb
        self.mb_slice[addr] = slc
        self.mark_intra(addr)
        if mb_type == 25:  # I_PCM
            self.mb_pcm[addr] = True
            self.mb_qp[addr] = 0
            r.align()
            for i in range(256):
                self.y[(my * 16 + i // 16) * self.ys + mx * 16 + i % 16] = r.bits(8)
            for i in range(64):
                self.u[(my * 8 + i // 8) * self.cs + mx * 8 + i % 8] = r.bits(8)
            for i in range(64):
                self.v[(my * 8 + i // 8) * self.cs + mx * 8 + i % 8] = r.bits(8)
            return qp_prev
        is_i4 = mb_type == 0
        self.mb_i4[addr] = is_i4
        modes = [0] * 16
        if is_i4:
            for b in range(16):
                ox, oy = BLK_XY[b]
                bx, by = mx * 4 + ox // 4, my * 4 + oy // 4

                def ctx(nx, ny):
                    if nx < 0 or ny < 0:
                        return -1
                    nmb = (ny // 4) * wmb + nx // 4
                    if not self.avail(nx // 4, ny // 4, slc):
                        return -1
                    if nmb == addr:
                        return modes[BLK_IDX[(nx % 4, ny % 4)]]
                    if not self.mb_i4[nmb]:
                        return 2
                    return self.i4_modes[nmb * 16 + BLK_IDX[(nx % 4, ny % 4)]]

                ma = ctx(bx - 1, by)
                mb_ = ctx(bx, by - 1)
                pred = 2 if (ma < 0 or mb_ < 0) else min(ma, mb_)
                if r.bit():
                    mode = pred
                else:
                    rem = r.bits(3)
                    mode = rem if rem < pred else rem + 1
                modes[b] = mode
                self.i4_modes[addr * 16 + b] = mode
        chroma_mode = r.ue()
        if is_i4:
            cbp = CBP_INTRA[r.ue()]
            cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
        else:
            v = mb_type - 1
            pred16 = v % 4
            cbp_chroma = (v // 4) % 3
            cbp_luma = 15 if v >= 12 else 0
        qp = qp_prev
        if cbp_luma or cbp_chroma or not is_i4:
            qp = (qp_prev + r.se() + 52) % 52
        self.mb_qp[addr] = qp
        luma_coef = [[0] * 16 for _ in range(16)]
        dc_coef = [0] * 16
        if not is_i4:
            dc_coef, _ = read_block(r, self.luma_nc(mx * 4, my * 4, slc), 16)
        for i8 in range(4):
            if cbp_luma & (1 << i8):
                for j in range(4):
                    b = i8 * 4 + j
                    ox, oy = BLK_XY[b]
                    nc = self.luma_nc(mx * 4 + ox // 4, my * 4 + oy // 4, slc)
                    if is_i4:
                        luma_coef[b], tc = read_block(r, nc, 16)
                    else:
                        ac, tc = read_block(r, nc, 15)
                        luma_coef[b] = [0] + ac
                    self.luma_nz[addr * 16 + b] = tc
        cb_dc = [0] * 4
        cr_dc = [0] * 4
        if cbp_chroma:
            cb_dc, _ = read_block(r, -1, 4)
            cr_dc, _ = read_block(r, -1, 4)
        cb_ac = [[0] * 16 for _ in range(4)]
        cr_ac = [[0] * 16 for _ in range(4)]
        if cbp_chroma == 2:
            for comp in range(2):
                for b in range(4):
                    nc = self.chroma_nc(mx * 2 + b % 2, my * 2 + b // 2,
                                        comp == 0, slc)
                    ac, tc = read_block(r, nc, 15)
                    if comp == 0:
                        cb_ac[b] = [0] + ac
                        self.cb_nz[addr * 4 + b] = tc
                    else:
                        cr_ac[b] = [0] + ac
                        self.cr_nz[addr * 4 + b] = tc
        # ---- reconstruction
        if is_i4:
            self.recon_i4(mx, my, modes, luma_coef, qp, slc)
        else:
            self.recon_i16(mx, my, pred16, dc_coef, luma_coef, cbp_luma, qp, slc)
        self.recon_chroma(mx, my, chroma_mode, cb_dc, cr_dc, cb_ac, cr_ac,
                          cbp_chroma, qp, slc)
        return qp


    # ---- motion (clause 8.4): field, prediction, skip, interpolation

    def mark_intra(self, addr):
        for i in range(addr * 16, addr * 16 + 16):
            self.blk_ref[i] = -1

    def blk_at(self, bx, by):
        return ((by // 4) * self.wmb + bx // 4) * 16 + (by % 4) * 4 + bx % 4

    def set_motion(self, x0, y0, w, h, mvx, mvy):
        for by in range(y0 // 4, (y0 + h) // 4):
            for bx in range(x0 // 4, (x0 + w) // 4):
                i = self.blk_at(bx, by)
                self.blk_ref[i] = 0
                self.mv_x[i] = mvx
                self.mv_y[i] = mvy

    def mv_neighbor(self, xn, yn, slc):
        """(available, ref, mvx, mvy) for the block holding luma (xn, yn)."""
        if xn < 0 or yn < 0 or xn >= self.wmb * 16 or yn >= self.hmb * 16:
            return (False, -1, 0, 0)
        if self.mb_slice[(yn // 16) * self.wmb + xn // 16] != slc:
            return (False, -1, 0, 0)
        i = self.blk_at(xn // 4, yn // 4)
        rf = self.blk_ref[i]
        if rf == -2:  # not yet decoded in block decode order
            return (False, -1, 0, 0)
        if rf < 0:  # intra: available, no motion
            return (True, -1, 0, 0)
        return (True, rf, self.mv_x[i], self.mv_y[i])

    def mv_predict(self, x0, y0, w, h, kind, slc):
        """8.4.1.3: median prediction with the directional MB-partition
        shortcuts; C falls back to D when unavailable."""
        a = self.mv_neighbor(x0 - 1, y0, slc)
        b = self.mv_neighbor(x0, y0 - 1, slc)
        c = self.mv_neighbor(x0 + w, y0 - 1, slc)
        if not c[0]:
            c = self.mv_neighbor(x0 - 1, y0 - 1, slc)
        if kind == "16x8top" and b[1] == 0:
            return (b[2], b[3])
        if kind == "16x8bot" and a[1] == 0:
            return (a[2], a[3])
        if kind == "8x16left" and a[1] == 0:
            return (a[2], a[3])
        if kind == "8x16right" and c[1] == 0:
            return (c[2], c[3])
        if not b[0] and not c[0] and a[0]:
            return (a[2], a[3])
        match = [n for n in (a, b, c) if n[1] == 0]
        if len(match) == 1:
            return (match[0][2], match[0][3])
        return (sorted([a[2], b[2], c[2]])[1], sorted([a[3], b[3], c[3]])[1])

    def mv_skip(self, mx, my, slc):
        """8.4.1.1: zero when a lateral neighbor is missing or still."""
        a = self.mv_neighbor(mx * 16 - 1, my * 16, slc)
        b = self.mv_neighbor(mx * 16, my * 16 - 1, slc)
        if (not a[0] or not b[0] or
                (a[1] == 0 and a[2] == 0 and a[3] == 0) or
                (b[1] == 0 and b[2] == 0 and b[3] == 0)):
            return (0, 0)
        return self.mv_predict(mx * 16, my * 16, 16, 16, "", slc)

    def interp_luma(self, x0, y0, w, h, mvx, mvy):
        """8.4.2.2.1 quarter-sample MC: 6-tap halves, averaged quarters."""
        ref = self.ref
        rs, rh = ref.ys, ref.hmb * 16
        fx, fy = mvx & 3, mvy & 3
        ox, oy = x0 + (mvx >> 2), y0 + (mvy >> 2)

        def s(x, y):
            x = 0 if x < 0 else (rs - 1 if x >= rs else x)
            y = 0 if y < 0 else (rh - 1 if y >= rh else y)
            return ref.y[y * rs + x]

        def hsum(x, y):
            return (s(x - 2, y) - 5 * s(x - 1, y) + 20 * s(x, y) +
                    20 * s(x + 1, y) - 5 * s(x + 2, y) + s(x + 3, y))

        def vsum(x, y):
            return (s(x, y - 2) - 5 * s(x, y - 1) + 20 * s(x, y) +
                    20 * s(x, y + 1) - 5 * s(x, y + 2) + s(x, y + 3))

        def half_h(x, y):
            return clip255((hsum(x, y) + 16) >> 5)

        def half_v(x, y):
            return clip255((vsum(x, y) + 16) >> 5)

        def half_j(x, y):
            acc = (vsum(x - 2, y) - 5 * vsum(x - 1, y) + 20 * vsum(x, y) +
                   20 * vsum(x + 1, y) - 5 * vsum(x + 2, y) + vsum(x + 3, y))
            return clip255((acc + 512) >> 10)

        out = []
        for j in range(h):
            y = oy + j
            row = []
            for i in range(w):
                x = ox + i
                if fx == 0 and fy == 0:
                    v = s(x, y)
                elif fy == 0:  # a, b, c
                    bb = half_h(x, y)
                    v = bb if fx == 2 else \
                        (bb + s(x + (1 if fx == 3 else 0), y) + 1) >> 1
                elif fx == 0:  # d, h, n
                    hh = half_v(x, y)
                    v = hh if fy == 2 else \
                        (hh + s(x, y + (1 if fy == 3 else 0)) + 1) >> 1
                elif fx == 2 and fy == 2:  # j
                    v = half_j(x, y)
                elif fy == 2:  # i, k: j averaged with the nearer column half
                    v = (half_j(x, y) + half_v(x + (1 if fx == 3 else 0), y) + 1) >> 1
                elif fx == 2:  # f, q: j averaged with the nearer row half
                    v = (half_j(x, y) + half_h(x, y + (1 if fy == 3 else 0)) + 1) >> 1
                else:  # e, g, p, r: the two nearest halves
                    v = (half_h(x, y + (1 if fy == 3 else 0)) +
                         half_v(x + (1 if fx == 3 else 0), y) + 1) >> 1
                row.append(v)
            out.append(row)
        return out

    def interp_chroma(self, ref_plane, x0, y0, w, h, mvx, mvy):
        """8.4.2.2.2 eighth-sample bilinear chroma MC."""
        cs, ch = self.cs, self.hmb * 8
        dx, dy = mvx & 7, mvy & 7
        ox, oy = x0 + (mvx >> 3), y0 + (mvy >> 3)

        def s(x, y):
            x = 0 if x < 0 else (cs - 1 if x >= cs else x)
            y = 0 if y < 0 else (ch - 1 if y >= ch else y)
            return ref_plane[y * cs + x]

        out = []
        for j in range(h):
            row = []
            for i in range(w):
                x, y = ox + i, oy + j
                row.append(((8 - dx) * (8 - dy) * s(x, y) +
                            dx * (8 - dy) * s(x + 1, y) +
                            (8 - dx) * dy * s(x, y + 1) +
                            dx * dy * s(x + 1, y + 1) + 32) >> 6)
            out.append(row)
        return out

    # ---- P slice (7.3.4 + 7.4.5): skip runs, inter partitions

    SUB_PARTS = {0: [(0, 0, 8, 8)],
                 1: [(0, 0, 8, 4), (0, 4, 8, 4)],
                 2: [(0, 0, 4, 8), (4, 0, 4, 8)],
                 3: [(0, 0, 4, 4), (4, 0, 4, 4), (0, 4, 4, 4), (4, 4, 4, 4)]}

    def decode_slice_p(self, r, first_mb, slice_qp, deblock):
        assert self.ref is not None, "P slice without reference"
        slc = len(self.slice_deblock)
        self.slice_deblock.append(deblock)
        qp_prev = slice_qp
        addr = first_mb
        while r.more_rbsp():
            for _ in range(r.ue()):  # mb_skip_run
                self.recon_skip(addr, qp_prev, slc)
                addr += 1
            if r.more_rbsp():
                qp_prev = self.decode_mb_p(r, addr, qp_prev, slc)
                addr += 1

    def recon_skip(self, addr, qp_prev, slc):
        mx, my = addr % self.wmb, addr // self.wmb
        self.mb_slice[addr] = slc
        self.mb_inter[addr] = True
        self.mb_qp[addr] = qp_prev
        mvx, mvy = self.mv_skip(mx, my, slc)
        self.set_motion(mx * 16, my * 16, 16, 16, mvx, mvy)
        pred = self.interp_luma(mx * 16, my * 16, 16, 16, mvx, mvy)
        for j in range(16):
            for i in range(16):
                self.y[(my * 16 + j) * self.ys + mx * 16 + i] = pred[j][i]
        for plane, rp in ((self.u, self.ref.u), (self.v, self.ref.v)):
            cp = self.interp_chroma(rp, mx * 8, my * 8, 8, 8, mvx, mvy)
            for j in range(8):
                for i in range(8):
                    plane[(my * 8 + j) * self.cs + mx * 8 + i] = cp[j][i]

    def decode_mb_p(self, r, addr, qp_prev, slc):
        mb_type = r.ue()
        if mb_type >= 5:  # intra in a P slice: types arrive offset by 5
            assert mb_type <= 30, "bad P mb_type"
            return self.decode_mb_intra(r, addr, mb_type - 5, qp_prev, slc)
        mx, my = addr % self.wmb, addr // self.wmb
        self.mb_slice[addr] = slc
        self.mb_inter[addr] = True
        x0, y0 = mx * 16, my * 16
        if mb_type == 0:
            px, py = self.mv_predict(x0, y0, 16, 16, "", slc)
            self.set_motion(x0, y0, 16, 16, px + r.se(), py + r.se())
        elif mb_type == 1:
            for part, kind in ((0, "16x8top"), (1, "16x8bot")):
                px, py = self.mv_predict(x0, y0 + part * 8, 16, 8, kind, slc)
                self.set_motion(x0, y0 + part * 8, 16, 8,
                                px + r.se(), py + r.se())
        elif mb_type == 2:
            for part, kind in ((0, "8x16left"), (1, "8x16right")):
                px, py = self.mv_predict(x0 + part * 8, y0, 8, 16, kind, slc)
                self.set_motion(x0 + part * 8, y0, 8, 16,
                                px + r.se(), py + r.se())
        else:  # 3 = P_8x8, 4 = P_8x8ref0 (identical with a single reference)
            subs = [r.ue() for _ in range(4)]
            assert all(t <= 3 for t in subs), "bad sub_mb_type"
            for b8 in range(4):
                ox, oy = x0 + (b8 % 2) * 8, y0 + (b8 // 2) * 8
                for dx, dy, pw, ph in self.SUB_PARTS[subs[b8]]:
                    px, py = self.mv_predict(ox + dx, oy + dy, pw, ph, "", slc)
                    self.set_motion(ox + dx, oy + dy, pw, ph,
                                    px + r.se(), py + r.se())
        code = r.ue()
        assert code <= 47, "bad inter cbp"
        cbp = CBP_INTER[code]
        cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
        qp = qp_prev
        if cbp:
            qp = (qp_prev + r.se() + 52) % 52
        self.mb_qp[addr] = qp
        luma_coef = [[0] * 16 for _ in range(16)]
        for i8 in range(4):
            if cbp_luma & (1 << i8):
                for j in range(4):
                    b = i8 * 4 + j
                    ox, oy = BLK_XY[b]
                    nc = self.luma_nc(mx * 4 + ox // 4, my * 4 + oy // 4, slc)
                    luma_coef[b], tc = read_block(r, nc, 16)
                    self.luma_nz[addr * 16 + b] = tc
        cb_dc = [0] * 4
        cr_dc = [0] * 4
        if cbp_chroma:
            cb_dc, _ = read_block(r, -1, 4)
            cr_dc, _ = read_block(r, -1, 4)
        cb_ac = [[0] * 16 for _ in range(4)]
        cr_ac = [[0] * 16 for _ in range(4)]
        if cbp_chroma == 2:
            for comp in range(2):
                for b in range(4):
                    nc = self.chroma_nc(mx * 2 + b % 2, my * 2 + b // 2,
                                        comp == 0, slc)
                    ac, tc = read_block(r, nc, 15)
                    if comp == 0:
                        cb_ac[b] = [0] + ac
                        self.cb_nz[addr * 4 + b] = tc
                    else:
                        cr_ac[b] = [0] + ac
                        self.cr_nz[addr * 4 + b] = tc
        self.recon_inter(mx, my, luma_coef, cbp_luma, cb_dc, cr_dc,
                         cb_ac, cr_ac, cbp_chroma, qp)
        return qp

    def recon_inter(self, mx, my, luma_coef, cbp_luma, cb_dc, cr_dc,
                    cb_ac, cr_ac, cbp_chroma, qp):
        for b4y in range(4):
            for b4x in range(4):
                i = self.blk_at(mx * 4 + b4x, my * 4 + b4y)
                pred = self.interp_luma(mx * 16 + b4x * 4, my * 16 + b4y * 4,
                                        4, 4, self.mv_x[i], self.mv_y[i])
                z = BLK_IDX[(b4x, b4y)]
                res = [0] * 16
                if cbp_luma & (1 << (z // 4)):
                    d = [0] * 16
                    for k in range(16):
                        if luma_coef[z][k]:
                            rp = ZIGZAG[k]
                            d[rp] = dequant(luma_coef[z][k], qp, rp // 4, rp % 4)
                    res = itrans(d)
                for j in range(4):
                    for i2 in range(4):
                        self.y[(my * 16 + b4y * 4 + j) * self.ys +
                               mx * 16 + b4x * 4 + i2] = \
                            clip255(pred[j][i2] + res[j * 4 + i2])
        qpc = chroma_qp(qp, self.pps["chroma_qp_off"])
        for comp in range(2):
            plane = self.u if comp == 0 else self.v
            ref_plane = self.ref.u if comp == 0 else self.ref.v
            # MC per 2x2 chroma sub-block: the chroma partition grid is
            # the luma grid at half size
            cpred = [[0] * 8 for _ in range(8)]
            for b4y in range(4):
                for b4x in range(4):
                    i = self.blk_at(mx * 4 + b4x, my * 4 + b4y)
                    sub = self.interp_chroma(ref_plane, mx * 8 + b4x * 2,
                                             my * 8 + b4y * 2, 2, 2,
                                             self.mv_x[i], self.mv_y[i])
                    for j in range(2):
                        for i2 in range(2):
                            cpred[b4y * 2 + j][b4x * 2 + i2] = sub[j][i2]
            dc_in = cb_dc if comp == 0 else cr_dc
            ac_in = cb_ac if comp == 0 else cr_ac
            dcv = chroma_dc_dequant(dc_in, qpc) if cbp_chroma else [0] * 4
            for b in range(4):
                ox, oy = (b % 2) * 4, (b // 2) * 4
                d = [0] * 16
                d[0] = dcv[b]
                if cbp_chroma == 2:
                    for k in range(1, 16):
                        if ac_in[b][k]:
                            rp = ZIGZAG[k]
                            d[rp] = dequant(ac_in[b][k], qpc, rp // 4, rp % 4)
                flat = itrans(d)
                for j in range(4):
                    for i2 in range(4):
                        plane[(my * 8 + oy + j) * self.cs + mx * 8 + ox + i2] = \
                            clip255(cpred[oy + j][ox + i2] + flat[j * 4 + i2])

    # ---- CABAC slice + macroblock layer

    def decode_slice_cabac(self, r, first_mb, slice_qp, deblock):
        slc = len(self.slice_deblock)
        self.slice_deblock.append(deblock)
        while r.p % 8:
            assert r.bit() == 1, "cabac alignment"
        cd = CabacDec(r, slice_qp)
        qp_prev = slice_qp
        prev_dqp = 0
        addr = first_mb
        while True:
            assert addr < self.wmb * self.hmb, "MB address overrun"
            qp_prev, prev_dqp = self.decode_mb_cabac(cd, addr, qp_prev,
                                                     slc, prev_dqp)
            addr += 1
            if cd.terminate():
                break

    def _cbf_luma_inc(self, bx, by, slc):
        def cond(x, y):
            if x < 0 or y < 0:
                return 1
            if not self.avail(x // 4, y // 4, slc):
                return 1
            nmb = (y // 4) * self.wmb + x // 4
            if self.mb_pcm[nmb]:
                return 1
            return 1 if self.luma_nz[nmb * 16 + BLK_IDX[(x % 4, y % 4)]] else 0
        return cond(bx - 1, by) + 2 * cond(bx, by - 1)

    def _cbf_mb_inc(self, mx, my, slc, flag_of):
        def cond(x, y):
            if x < 0 or y < 0 or not self.avail(x, y, slc):
                return 1
            nmb = y * self.wmb + x
            if self.mb_pcm[nmb]:
                return 1
            return flag_of(nmb)
        return cond(mx - 1, my) + 2 * cond(mx, my - 1)

    def _cbf_chroma_ac_inc(self, bx, by, is_cb, slc):
        def cond(x, y):
            if x < 0 or y < 0:
                return 1
            if not self.avail(x // 2, y // 2, slc):
                return 1
            nmb = (y // 2) * self.wmb + x // 2
            if self.mb_pcm[nmb]:
                return 1
            arr = self.cb_nz if is_cb else self.cr_nz
            return 1 if arr[nmb * 4 + (y % 2) * 2 + x % 2] else 0
        return cond(bx - 1, by) + 2 * cond(bx, by - 1)

    def decode_mb_cabac(self, cd, addr, qp_prev, slc, prev_dqp):
        wmb = self.wmb
        mx, my = addr % wmb, addr // wmb
        self.mb_slice[addr] = slc
        self.mark_intra(addr)

        def cond_not_i4(x, y):
            return 1 if self.avail(x, y, slc) and \
                not self.mb_i4[y * wmb + x] else 0

        mb_type = 0
        if cd.decision(3 + cond_not_i4(mx - 1, my) + cond_not_i4(mx, my - 1)):
            assert not cd.terminate(), "I_PCM in CABAC slice: out of subset"
            luma_bit = cd.decision(3 + 3)
            ch = 0
            if cd.decision(3 + 4):
                ch = 2 if cd.decision(3 + 5) else 1
            pm = (cd.decision(3 + 6) << 1) | cd.decision(3 + 7)
            mb_type = 1 + pm + 4 * ch + 12 * luma_bit
        is_i4 = mb_type == 0
        self.mb_i4[addr] = is_i4
        modes = [0] * 16
        if is_i4:
            for b in range(16):
                ox, oy = BLK_XY[b]
                bx, by = mx * 4 + ox // 4, my * 4 + oy // 4

                def ctx(nx, ny):
                    if nx < 0 or ny < 0:
                        return -1
                    nmb = (ny // 4) * wmb + nx // 4
                    if not self.avail(nx // 4, ny // 4, slc):
                        return -1
                    if nmb == addr:
                        return modes[BLK_IDX[(nx % 4, ny % 4)]]
                    if not self.mb_i4[nmb]:
                        return 2
                    return self.i4_modes[nmb * 16 + BLK_IDX[(nx % 4, ny % 4)]]

                ma = ctx(bx - 1, by)
                mb_ = ctx(bx, by - 1)
                pred = 2 if (ma < 0 or mb_ < 0) else min(ma, mb_)
                if cd.decision(68):
                    mode = pred
                else:
                    rem = 0
                    for j in range(3):  # FL, LSB first
                        rem |= cd.decision(69) << j
                    mode = rem if rem < pred else rem + 1
                modes[b] = mode
                self.i4_modes[addr * 16 + b] = mode

        def cond_chroma(x, y):
            if not self.avail(x, y, slc):
                return 0
            nmb = y * wmb + x
            if self.mb_pcm[nmb] or self.mb_chroma_mode[nmb] == 0:
                return 0
            return 1

        chroma_mode = 0
        if cd.decision(64 + cond_chroma(mx - 1, my) + cond_chroma(mx, my - 1)):
            chroma_mode = 1
            if cd.decision(67):
                chroma_mode = 3 if cd.decision(67) else 2
        if is_i4:
            cbp_luma = 0
            for b8 in range(4):
                if b8 % 2 == 1:
                    cond_a = 0 if (cbp_luma >> (b8 - 1)) & 1 else 1
                elif self.avail(mx - 1, my, slc):
                    nmb = my * wmb + mx - 1
                    cond_a = 0 if (self.mb_pcm[nmb] or
                                   (self.mb_cbp_luma[nmb] >> (b8 + 1)) & 1) else 1
                else:
                    cond_a = 0
                if b8 >= 2:
                    cond_b = 0 if (cbp_luma >> (b8 - 2)) & 1 else 1
                elif self.avail(mx, my - 1, slc):
                    nmb = (my - 1) * wmb + mx
                    cond_b = 0 if (self.mb_pcm[nmb] or
                                   (self.mb_cbp_luma[nmb] >> (b8 + 2)) & 1) else 1
                else:
                    cond_b = 0
                cbp_luma |= cd.decision(73 + cond_a + 2 * cond_b) << b8

            def cond_c(x, y, want2):
                if not self.avail(x, y, slc):
                    return 0
                nmb = y * wmb + x
                if self.mb_pcm[nmb]:
                    return 1
                c = self.mb_cbp_chroma[nmb]
                return 1 if (c == 2 if want2 else c != 0) else 0

            cbp_chroma = 0
            inc0 = cond_c(mx - 1, my, False) + 2 * cond_c(mx, my - 1, False)
            if cd.decision(77 + inc0):
                inc1 = 4 + cond_c(mx - 1, my, True) + 2 * cond_c(mx, my - 1, True)
                cbp_chroma = 2 if cd.decision(77 + inc1) else 1
        else:
            v = mb_type - 1
            pred16 = v % 4
            cbp_chroma = (v // 4) % 3
            cbp_luma = 15 if v >= 12 else 0
        qp = qp_prev
        dqp = 0
        if cbp_luma or cbp_chroma or not is_i4:
            mapped = 0
            if cd.decision(60 + (1 if prev_dqp else 0)):
                mapped = 1
                if cd.decision(62):
                    mapped = 2
                    while mapped <= 52 and cd.decision(63):
                        mapped += 1
                    assert mapped <= 52, "qp delta overrun"
            dqp = (mapped + 1) // 2 if mapped % 2 else -(mapped // 2)
            assert -26 <= dqp <= 25, "bad qp delta"
            qp = (qp_prev + dqp + 52) % 52
        self.mb_qp[addr] = qp
        self.mb_chroma_mode[addr] = chroma_mode
        self.mb_cbp_luma[addr] = cbp_luma
        self.mb_cbp_chroma[addr] = cbp_chroma
        luma_coef = [[0] * 16 for _ in range(16)]
        dc_coef = [0] * 16
        if not is_i4:
            inc = self._cbf_mb_inc(mx, my, slc, lambda nmb:
                                   1 if (not self.mb_i4[nmb] and
                                         self.luma_dc_nz[nmb]) else 0)
            dc_coef, dc_tc = read_block_cabac(cd, 0, inc, 16)
            self.luma_dc_nz[addr] = 1 if dc_tc else 0
        for i8 in range(4):
            if cbp_luma & (1 << i8):
                for j in range(4):
                    b = i8 * 4 + j
                    ox, oy = BLK_XY[b]
                    inc = self._cbf_luma_inc(mx * 4 + ox // 4,
                                             my * 4 + oy // 4, slc)
                    if is_i4:
                        luma_coef[b], tc = read_block_cabac(cd, 2, inc, 16)
                    else:
                        ac, tc = read_block_cabac(cd, 1, inc, 15)
                        luma_coef[b] = [0] + ac
                    self.luma_nz[addr * 16 + b] = tc
        cb_dc = [0] * 4
        cr_dc = [0] * 4
        if cbp_chroma:
            inc = self._cbf_mb_inc(mx, my, slc, lambda nmb: self.cb_dc_nz[nmb])
            cb_dc, cb_tc = read_block_cabac(cd, 3, inc, 4)
            self.cb_dc_nz[addr] = 1 if cb_tc else 0
            inc = self._cbf_mb_inc(mx, my, slc, lambda nmb: self.cr_dc_nz[nmb])
            cr_dc, cr_tc = read_block_cabac(cd, 3, inc, 4)
            self.cr_dc_nz[addr] = 1 if cr_tc else 0
        cb_ac = [[0] * 16 for _ in range(4)]
        cr_ac = [[0] * 16 for _ in range(4)]
        if cbp_chroma == 2:
            for comp in range(2):
                for b in range(4):
                    inc = self._cbf_chroma_ac_inc(mx * 2 + b % 2,
                                                  my * 2 + b // 2,
                                                  comp == 0, slc)
                    ac, tc = read_block_cabac(cd, 4, inc, 15)
                    if comp == 0:
                        cb_ac[b] = [0] + ac
                        self.cb_nz[addr * 4 + b] = tc
                    else:
                        cr_ac[b] = [0] + ac
                        self.cr_nz[addr * 4 + b] = tc
        if is_i4:
            self.recon_i4(mx, my, modes, luma_coef, qp, slc)
        else:
            self.recon_i16(mx, my, pred16, dc_coef, luma_coef, cbp_luma, qp, slc)
        self.recon_chroma(mx, my, chroma_mode, cb_dc, cr_dc, cb_ac, cr_ac,
                          cbp_chroma, qp, slc)
        return qp, (dqp if (cbp_luma or cbp_chroma or not is_i4) else 0)

    # ---- reconstruction helpers


    def recon_i4(self, mx, my, modes, coefs, qp, slc):
        ys = self.ys
        for b in range(16):
            ox, oy = BLK_XY[b]
            x0, y0 = mx * 16 + ox, my * 16 + oy
            above = y0 > 0 and self.avail(x0 // 16, (y0 - 1) // 16, slc)
            left = x0 > 0 and self.avail((x0 - 1) // 16, y0 // 16, slc)
            corner = (x0 > 0 and y0 > 0 and
                      self.avail((x0 - 1) // 16, (y0 - 1) // 16, slc))
            ar = False
            if y0 > 0 and x0 + 4 < self.wmb * 16:
                nmx, nmy = (x0 + 4) // 16, (y0 - 1) // 16
                if (nmx, nmy) == (mx, my):
                    ar = BLK_IDX[(((x0 + 4) % 16) // 4, ((y0 - 1) % 16) // 4)] < b \
                        and self.avail(nmx, nmy, slc)
                else:
                    ar = (nmy * self.wmb + nmx < my * self.wmb + mx and
                          self.avail(nmx, nmy, slc))
            pa = [0] * 8
            pl = [0] * 4
            pc = 0
            if above:
                for i in range(4):
                    pa[i] = self.y[(y0 - 1) * ys + x0 + i]
                if ar:
                    for i in range(4, 8):
                        pa[i] = self.y[(y0 - 1) * ys + x0 + i]
                else:
                    for i in range(4, 8):
                        pa[i] = pa[3]
            if left:
                for j in range(4):
                    pl[j] = self.y[(y0 + j) * ys + x0 - 1]
            if corner:
                pc = self.y[(y0 - 1) * ys + x0 - 1]
            pred = pred_4x4(modes[b], pa, pl, pc, above, left, corner)
            d = [0] * 16
            for k in range(16):
                if coefs[b][k]:
                    rp = ZIGZAG[k]
                    d[rp] = dequant(coefs[b][k], qp, rp // 4, rp % 4)
            res = itrans(d)
            for yy in range(4):
                for xx in range(4):
                    self.y[(y0 + yy) * ys + x0 + xx] = \
                        clip255(pred[yy * 4 + xx] + res[yy * 4 + xx])

    def recon_i16(self, mx, my, mode, dc, ac, cbp_luma, qp, slc):
        ys = self.ys
        x0, y0 = mx * 16, my * 16
        above = y0 > 0 and self.avail(mx, my - 1, slc)
        left = x0 > 0 and self.avail(mx - 1, my, slc)
        corner = left and above and self.avail(mx - 1, my - 1, slc)
        top = [self.y[(y0 - 1) * ys + x0 + i] for i in range(16)] if above else [0] * 16
        lft = [self.y[(y0 + i) * ys + x0 - 1] for i in range(16)] if left else [0] * 16
        cor = self.y[(y0 - 1) * ys + x0 - 1] if corner else 0
        pred = pred_16x16(mode, top, lft, cor, above, left, corner)
        dc_raster = [0] * 16
        for k in range(16):
            dc_raster[ZIGZAG[k]] = dc[k]
        dcv = luma_dc_dequant(dc_raster, qp)
        for b in range(16):
            ox, oy = BLK_XY[b]
            d = [0] * 16
            d[0] = dcv[(oy // 4) * 4 + ox // 4]
            if cbp_luma & (1 << (b // 4)):
                for k in range(1, 16):
                    if ac[b][k]:
                        rp = ZIGZAG[k]
                        d[rp] = dequant(ac[b][k], qp, rp // 4, rp % 4)
            res = itrans(d)
            for yy in range(4):
                for xx in range(4):
                    self.y[(y0 + oy + yy) * ys + x0 + ox + xx] = \
                        clip255(pred[(oy + yy) * 16 + ox + xx] + res[yy * 4 + xx])

    def recon_chroma(self, mx, my, mode, cb_dc, cr_dc, cb_ac, cr_ac,
                     cbp_chroma, qpy, slc):
        cs = self.cs
        qpc = chroma_qp(qpy, self.pps["chroma_qp_off"])
        x0, y0 = mx * 8, my * 8
        above = y0 > 0 and self.avail(mx, my - 1, slc)
        left = x0 > 0 and self.avail(mx - 1, my, slc)
        corner = left and above and self.avail(mx - 1, my - 1, slc)
        for comp in range(2):
            plane = self.u if comp == 0 else self.v
            top = [plane[(y0 - 1) * cs + x0 + i] for i in range(8)] if above else [0] * 8
            lft = [plane[(y0 + i) * cs + x0 - 1] for i in range(8)] if left else [0] * 8
            cor = plane[(y0 - 1) * cs + x0 - 1] if corner else 0
            pred = pred_chroma(mode, top, lft, cor, above, left, corner)
            dc_in = cb_dc if comp == 0 else cr_dc
            ac_in = cb_ac if comp == 0 else cr_ac
            dcv = chroma_dc_dequant(dc_in, qpc) if cbp_chroma else [0] * 4
            for b in range(4):
                ox, oy = (b % 2) * 4, (b // 2) * 4
                d = [0] * 16
                d[0] = dcv[b]
                if cbp_chroma == 2:
                    for k in range(1, 16):
                        if ac_in[b][k]:
                            rp = ZIGZAG[k]
                            d[rp] = dequant(ac_in[b][k], qpc, rp // 4, rp % 4)
                res = itrans(d)
                for yy in range(4):
                    for xx in range(4):
                        plane[(y0 + oy + yy) * cs + x0 + ox + xx] = \
                            clip255(pred[(oy + yy) * 8 + ox + xx] + res[yy * 4 + xx])

    # ---- deblocking

    def boundary_strength(self, p_bx, p_by, q_bx, q_by, mb_edge):
        """8.7.2.1 (frame pictures): intra sides keep the fixed 4/3; two
        inter sides compare coded residual then motion distance (single
        reference, so reference pictures never differ)."""
        p_mb = (p_by // 4) * self.wmb + p_bx // 4
        q_mb = (q_by // 4) * self.wmb + q_bx // 4
        if not self.mb_inter[p_mb] or not self.mb_inter[q_mb]:
            return 4 if mb_edge else 3
        p_nz = self.luma_nz[p_mb * 16 + BLK_IDX[(p_bx % 4, p_by % 4)]]
        q_nz = self.luma_nz[q_mb * 16 + BLK_IDX[(q_bx % 4, q_by % 4)]]
        if p_nz or q_nz:
            return 2
        pi = self.blk_at(p_bx, p_by)
        qi = self.blk_at(q_bx, q_by)
        if (abs(self.mv_x[pi] - self.mv_x[qi]) >= 4 or
                abs(self.mv_y[pi] - self.mv_y[qi]) >= 4):
            return 1
        return 0

    def deblock(self):
        for my in range(self.hmb):
            for mx in range(self.wmb):
                addr = my * self.wmb + mx
                db = self.slice_deblock[self.mb_slice[addr]]
                if db["disable"] == 1:
                    continue
                same_only = db["disable"] == 2

                def allowed(nmx, nmy):
                    n = nmy * self.wmb + nmx
                    return self.mb_slice[n] >= 0 and (
                        not same_only or self.mb_slice[n] == self.mb_slice[addr])

                qp_cur = self.mb_qp[addr]
                for e in range(4):
                    mb_edge = e == 0
                    if mb_edge and not (mx > 0 and allowed(mx - 1, my)):
                        continue
                    qp_n = self.mb_qp[addr - 1] if mb_edge else qp_cur
                    qav = (qp_n + qp_cur + 1) >> 1
                    qbx = mx * 4 + e
                    bs4 = [self.boundary_strength(qbx - 1, my * 4 + g, qbx,
                                                  my * 4 + g, mb_edge)
                           for g in range(4)]
                    for row in range(16):
                        if bs4[row // 4]:
                            self.filter_luma((my * 16 + row) * self.ys + mx * 16 + e * 4,
                                             1, bs4[row // 4], qav, db)
                    if e in (0, 2):
                        qcav = (chroma_qp(qp_n, self.pps["chroma_qp_off"]) +
                                chroma_qp(qp_cur, self.pps["chroma_qp_off"]) + 1) >> 1
                        for crow in range(8):
                            if bs4[crow // 2]:
                                base = (my * 8 + crow) * self.cs + mx * 8 + e * 2
                                self.filter_chroma(self.u, base, 1, bs4[crow // 2], qcav, db)
                                self.filter_chroma(self.v, base, 1, bs4[crow // 2], qcav, db)
                for e in range(4):
                    mb_edge = e == 0
                    if mb_edge and not (my > 0 and allowed(mx, my - 1)):
                        continue
                    qp_n = self.mb_qp[addr - self.wmb] if mb_edge else qp_cur
                    qav = (qp_n + qp_cur + 1) >> 1
                    qby = my * 4 + e
                    bs4 = [self.boundary_strength(mx * 4 + g, qby - 1,
                                                  mx * 4 + g, qby, mb_edge)
                           for g in range(4)]
                    for col in range(16):
                        if bs4[col // 4]:
                            self.filter_luma((my * 16 + e * 4) * self.ys + mx * 16 + col,
                                             self.ys, bs4[col // 4], qav, db)
                    if e in (0, 2):
                        qcav = (chroma_qp(qp_n, self.pps["chroma_qp_off"]) +
                                chroma_qp(qp_cur, self.pps["chroma_qp_off"]) + 1) >> 1
                        for ccol in range(8):
                            if bs4[ccol // 2]:
                                base = (my * 8 + e * 2) * self.cs + mx * 8 + ccol
                                self.filter_chroma(self.u, base, self.cs, bs4[ccol // 2], qcav, db)
                                self.filter_chroma(self.v, base, self.cs, bs4[ccol // 2], qcav, db)

    def filter_luma(self, base, step, bs, qav, db):
        px = self.y
        ia = max(0, min(51, qav + db["a"]))
        ib = max(0, min(51, qav + db["b"]))
        alpha, beta = ALPHA[ia], BETA[ib]
        p0, q0 = px[base - step], px[base]
        p1, q1 = px[base - 2 * step], px[base + step]
        if abs(p0 - q0) >= alpha or abs(p1 - p0) >= beta or abs(q1 - q0) >= beta:
            return
        p2, q2 = px[base - 3 * step], px[base + 2 * step]
        ap = abs(p2 - p0) < beta
        aq = abs(q2 - q0) < beta
        if bs == 4:
            small = abs(p0 - q0) < ((alpha >> 2) + 2)
            if ap and small:
                p3 = px[base - 4 * step]
                px[base - step] = (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3
                px[base - 2 * step] = (p2 + p1 + p0 + q0 + 2) >> 2
                px[base - 3 * step] = (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3
            else:
                px[base - step] = (2 * p1 + p0 + q1 + 2) >> 2
            if aq and small:
                q3 = px[base + 3 * step]
                px[base] = (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3
                px[base + step] = (q2 + q1 + q0 + p0 + 2) >> 2
                px[base + 2 * step] = (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3
            else:
                px[base] = (2 * q1 + q0 + p1 + 2) >> 2
        else:
            tc0 = TC0[bs][ia]
            tc = tc0 + (1 if ap else 0) + (1 if aq else 0)
            delta = (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3
            delta = max(-tc, min(tc, delta))
            px[base - step] = clip255(p0 + delta)
            px[base] = clip255(q0 - delta)
            if ap:
                dp = max(-tc0, min(tc0, (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1))
                px[base - 2 * step] = p1 + dp
            if aq:
                dq = max(-tc0, min(tc0, (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1))
                px[base + step] = q1 + dq

    def filter_chroma(self, px, base, step, bs, qcav, db):
        ia = max(0, min(51, qcav + db["a"]))
        ib = max(0, min(51, qcav + db["b"]))
        alpha, beta = ALPHA[ia], BETA[ib]
        p1, p0 = px[base - 2 * step], px[base - step]
        q0, q1 = px[base], px[base + step]
        if abs(p0 - q0) >= alpha or abs(p1 - p0) >= beta or abs(q1 - q0) >= beta:
            return
        if bs == 4:
            px[base - step] = (2 * p1 + p0 + q1 + 2) >> 2
            px[base] = (2 * q1 + q0 + p1 + 2) >> 2
        else:
            tc = TC0[bs][ia] + 1
            delta = (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3
            delta = max(-tc, min(tc, delta))
            px[base - step] = clip255(p0 + delta)
            px[base] = clip255(q0 - delta)



# --------------------------------------------------------------------
# CABAC (clause 9.3) — I-slice subset
# --------------------------------------------------------------------
# Engine tables (Tables 9-44 / 9-45). Shared published constants with
# the Scala side, same caveat as the VLC tables above.

RANGE_LPS = [
    (128, 176, 208, 240), (128, 167, 197, 227), (128, 158, 187, 216),
    (123, 150, 178, 205), (116, 142, 169, 195), (111, 135, 160, 185),
    (105, 128, 152, 175), (100, 122, 144, 166), (95, 116, 137, 158),
    (90, 110, 130, 150), (85, 104, 123, 142), (81, 99, 117, 135),
    (77, 94, 111, 128), (73, 89, 105, 122), (69, 85, 100, 116),
    (66, 80, 95, 110), (62, 76, 90, 104), (59, 72, 86, 99),
    (56, 69, 81, 94), (53, 65, 77, 89), (51, 62, 73, 85),
    (48, 59, 69, 80), (46, 56, 66, 76), (43, 53, 63, 72),
    (41, 50, 59, 69), (39, 48, 56, 65), (37, 45, 54, 62),
    (35, 43, 51, 59), (33, 41, 48, 56), (32, 39, 46, 53),
    (30, 37, 43, 50), (29, 35, 41, 48), (27, 33, 39, 45),
    (26, 31, 37, 43), (24, 30, 35, 41), (23, 28, 33, 39),
    (22, 27, 32, 37), (21, 26, 30, 35), (20, 24, 29, 33),
    (19, 23, 27, 31), (18, 22, 26, 30), (17, 21, 25, 28),
    (16, 20, 23, 27), (15, 19, 22, 25), (14, 18, 21, 24),
    (14, 17, 20, 23), (13, 16, 19, 22), (12, 15, 18, 21),
    (12, 14, 17, 20), (11, 14, 16, 19), (11, 13, 15, 18),
    (10, 12, 15, 17), (10, 12, 14, 16), (9, 11, 13, 15),
    (9, 11, 12, 14), (8, 10, 12, 14), (8, 9, 11, 13),
    (7, 9, 11, 12), (7, 9, 10, 12), (7, 8, 10, 11),
    (6, 8, 9, 11), (6, 7, 9, 10), (6, 7, 8, 9), (2, 2, 2, 2),
]

TRANS_LPS = [0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12,
             13, 13, 15, 15, 16, 16, 18, 18, 19, 19, 21, 21, 23, 22, 23, 24,
             24, 25, 26, 26, 27, 27, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33,
             33, 33, 34, 34, 35, 35, 35, 36, 36, 36, 37, 37, 37, 38, 38, 63]

# I-slice (m, n) init pairs for the ctxIdx subset the I-frame syntax uses
CTX_INIT_I = {}


def _init_pairs(base, pairs):
    for i, mn in enumerate(pairs):
        CTX_INIT_I[base + i] = mn


_init_pairs(0, [(20, -15), (2, 54), (3, 74), (20, -15), (2, 54), (3, 74),
                (-28, 127), (-23, 104), (-6, 53), (-1, 54), (7, 51)])
_init_pairs(60, [(0, 41), (0, 63), (0, 63), (0, 63)])
_init_pairs(64, [(0, 45), (-4, 78), (-3, 96), (-27, 126)])
_init_pairs(68, [(-28, 98), (-25, 101)])
_init_pairs(73, [(-16, 83), (-22, 110), (-21, 91), (-18, 102)])
_init_pairs(77, [(-13, 93), (-29, 127), (-7, 92), (-5, 89), (-7, 96),
                 (-13, 108), (-3, 46), (-1, 65)])
_init_pairs(85, [(-17, 123), (-12, 115), (-16, 122), (-11, 115),
                 (-12, 63), (-2, 68), (-15, 84), (-13, 104),
                 (-3, 70), (-8, 93), (-10, 90), (-30, 127),
                 (-1, 74), (-6, 97), (-7, 91), (-20, 127),
                 (-4, 56), (-5, 82), (-7, 76), (-22, 125)])
_init_pairs(105, [(-7, 93), (-11, 87), (-3, 77), (-5, 71), (-4, 63),
                  (-4, 68), (-12, 84), (-7, 62), (-7, 65), (8, 61),
                  (5, 56), (-2, 66), (1, 64), (0, 61), (-2, 78),
                  (1, 50), (7, 52), (10, 35), (0, 44), (11, 38),
                  (1, 45), (0, 46), (5, 44), (31, 17), (1, 51),
                  (7, 50), (28, 19), (16, 33), (14, 62), (-13, 108),
                  (-15, 100), (-13, 101), (-13, 91), (-12, 94), (-10, 88),
                  (-16, 84), (-10, 86), (-7, 83), (-13, 87), (-19, 94),
                  (1, 70), (0, 72), (-5, 74), (18, 59), (-8, 102),
                  (-15, 100), (0, 95), (-4, 75), (2, 72), (-11, 75),
                  (-3, 71), (15, 46), (-13, 69), (0, 62), (0, 65),
                  (21, 37), (-15, 72), (9, 57), (16, 54), (0, 62),
                  (12, 72)])
_init_pairs(166, [(24, 0), (15, 9), (8, 25), (13, 18), (15, 9),
                  (13, 19), (10, 37), (12, 18), (6, 29), (20, 33),
                  (15, 30), (4, 45), (1, 58), (0, 62), (7, 61),
                  (12, 38), (11, 45), (15, 39), (11, 42), (13, 44),
                  (16, 45), (12, 41), (10, 49), (30, 34), (18, 42),
                  (10, 55), (17, 51), (17, 46), (0, 89), (26, -19),
                  (22, -17), (26, -17), (30, -25), (28, -20), (33, -23),
                  (37, -27), (33, -23), (40, -28), (38, -17), (33, -11),
                  (40, -15), (41, -6), (38, 1), (41, 17), (30, -6),
                  (27, 3), (26, 22), (37, -16), (35, -4), (38, -8),
                  (38, -3), (37, 3), (38, 5), (42, 0), (35, 16),
                  (39, 22), (14, 48), (27, 37), (21, 60), (12, 68),
                  (2, 97)])
_init_pairs(227, [(-3, 71), (-6, 42), (-5, 50), (-3, 54), (-2, 62),
                  (0, 58), (1, 63), (-2, 72), (-1, 74), (-9, 91),
                  (-5, 67), (-4, 76), (-4, 77), (-4, 65), (-9, 88),
                  (-4, 66), (-3, 77), (-3, 76), (-6, 76), (10, 58),
                  (-1, 76), (-1, 83), (-7, 99), (-14, 95), (2, 95),
                  (0, 76), (-5, 74), (0, 70), (-11, 75), (1, 68),
                  (0, 65), (-14, 73), (3, 62), (4, 62), (-1, 68),
                  (-13, 75), (11, 55), (5, 64), (12, 70), (15, 6),
                  (6, 19), (7, 16), (12, 14), (18, 13), (13, 11),
                  (13, 15), (15, 16), (12, 23), (13, 23)])

CAT_OFF_CBF = (0, 4, 8, 12, 16)
CAT_OFF_SIG = (0, 15, 29, 44, 47)
CAT_OFF_ABS = (0, 10, 20, 30, 39)


class CabacDec:
    """Arithmetic decoder (9.3.3.2) with per-slice context bank."""

    def __init__(self, r, slice_qp):
        self.r = r
        qp = max(0, min(51, slice_qp))
        self.state = [0] * 277
        self.mps = [0] * 277
        for idx, (m, n) in CTX_INIT_I.items():
            pre = max(1, min(126, ((m * qp) >> 4) + n))
            if pre <= 63:
                self.state[idx], self.mps[idx] = 63 - pre, 0
            else:
                self.state[idx], self.mps[idx] = pre - 64, 1
        self.range = 510
        self.off = 0
        for _ in range(9):
            self.off = (self.off << 1) | self._bit()

    def _bit(self):
        # bits past the stream end read as 0 (trailing alignment supplies
        # the legitimate tail; truncation then fails a syntax check)
        if self.r.p < len(self.r.d) * 8:
            return self.r.bit()
        return 0

    def decision(self, idx):
        s = self.state[idx]
        r_lps = RANGE_LPS[s][(self.range >> 6) & 3]
        self.range -= r_lps
        if self.off >= self.range:
            bin_ = 1 - self.mps[idx]
            self.off -= self.range
            self.range = r_lps
            if s == 0:
                self.mps[idx] ^= 1
            self.state[idx] = TRANS_LPS[s]
        else:
            bin_ = self.mps[idx]
            if s < 62:
                self.state[idx] = s + 1
        while self.range < 256:
            self.range <<= 1
            self.off = (self.off << 1) | self._bit()
        return bin_

    def bypass(self):
        self.off = (self.off << 1) | self._bit()
        if self.off >= self.range:
            self.off -= self.range
            return 1
        return 0

    def terminate(self):
        self.range -= 2
        if self.off >= self.range:
            return 1
        while self.range < 256:
            self.range <<= 1
            self.off = (self.off << 1) | self._bit()
        return 0


def read_block_cabac(cd, cat, cbf_inc, max_coeff):
    """residual_block_cabac -> (coeffs in scan order, total_coeff)."""
    coeffs = [0] * max_coeff
    if not cd.decision(85 + CAT_OFF_CBF[cat] + cbf_inc):
        return coeffs, 0
    sig_base = 105 + CAT_OFF_SIG[cat]
    last_base = 166 + CAT_OFF_SIG[cat]
    sig = [False] * max_coeff
    done = False
    i = 0
    while i < max_coeff - 1 and not done:
        inc = min(i, 2) if cat == 3 else i
        if cd.decision(sig_base + inc):
            sig[i] = True
            if cd.decision(last_base + inc):
                done = True
        i += 1
    if not done:
        sig[max_coeff - 1] = True
    abs_base = 227 + CAT_OFF_ABS[cat]
    num_eq1 = num_gt1 = tc = 0
    for k in range(max_coeff - 1, -1, -1):
        if not sig[k]:
            continue
        inc0 = 0 if num_gt1 else min(4, 1 + num_eq1)
        inc_n = 5 + min(4 - (1 if cat == 3 else 0), num_gt1)
        m = 0
        if cd.decision(abs_base + inc0):
            m = 1
            while m < 14 and cd.decision(abs_base + inc_n):
                m += 1
            if m == 14:
                kk = 0
                while cd.bypass():
                    m += 1 << kk
                    kk += 1
                    if kk > 30:
                        raise ValueError("EG0 overrun")
                while kk:
                    kk -= 1
                    m += cd.bypass() << kk
        level = m + 1
        coeffs[k] = -level if cd.bypass() else level
        if level == 1:
            num_eq1 += 1
        else:
            num_gt1 += 1
        tc += 1
    return coeffs, tc


def crop_luma(pic):
    cl, cr, ct, cb = pic.sps["crop"]
    w = pic.wmb * 16 - 2 * (cl + cr)
    h = pic.hmb * 16 - 2 * (ct + cb)
    out = bytearray(w * h)
    for y in range(h):
        row = (y + 2 * ct) * pic.ys + 2 * cl
        out[y * w:(y + 1) * w] = pic.y[row:row + w]
    return w, h, bytes(out)


def decode(data):
    """Decode an Annex-B stream of one or more access units (an IDR
    picture, then optionally single-reference P pictures) ->
    (w, h, [luma frames]). A slice with first_mb_in_slice == 0 opens a
    new picture; the previous picture becomes the P reference."""
    sps_map = {}
    pps_map = {}
    frames = []
    dims = None
    pic = None
    ref = None

    def finish(p):
        nonlocal dims, ref
        assert all(s >= 0 for s in p.mb_slice), "partial picture"
        p.deblock()
        w, h, fr = crop_luma(p)
        assert dims is None or dims == (w, h)
        dims = (w, h)
        frames.append(fr)
        ref = p

    for typ, ref_idc, payload in nal_units(data):
        r = Bits(payload)
        if typ == 7:
            s = parse_sps(r)
            sps_map[s["id"]] = s
        elif typ == 8:
            p = parse_pps(r)
            pps_map[p["id"]] = p
        elif typ in (1, 5):
            first_mb = r.ue()
            if first_mb == 0 and pic is not None:
                finish(pic)
                pic = None
            slice_type = r.ue()
            assert slice_type in (0, 2, 5, 7), "I/P slices only"
            is_p = slice_type in (0, 5)
            if typ == 5:
                assert not is_p, "IDR pictures carry I slices"
            pps = pps_map[r.ue()]
            sps = sps_map[pps["sps"]]
            r.bits(sps["log2_max_frame_num"])
            if typ == 5:
                r.ue()  # idr_pic_id
            if sps["poc_type"] == 0:
                r.bits(sps["log2_max_poc"])
                if pps["pic_order_present"]:
                    r.se()
            elif sps["poc_type"] == 1 and not sps["poc_delta_zero"]:
                r.se()
                if pps["pic_order_present"]:
                    r.se()
            if pps["redundant"]:
                assert r.ue() == 0
            if is_p:
                assert not pps["cabac"], "CABAC P out of subset"
                assert not pps["weighted"], "weighted prediction out of subset"
                assert ref is not None, "P picture without reference"
                if r.bit():  # num_ref_idx_active_override_flag
                    assert r.ue() == 0, "one active reference only"
                else:
                    assert pps["num_ref_l0"] == 0, "one active reference only"
                assert r.bit() == 0, "ref list modification out of subset"
            if typ == 5:
                r.bit()  # no_output_of_prior_pics
                r.bit()  # long_term_reference_flag
            elif ref_idc != 0:
                assert r.bit() == 0, "adaptive marking out of subset"
            slice_qp = pps["init_qp"] + r.se()
            db = {"disable": 0, "a": 0, "b": 0}
            if pps["deblock_ctrl"]:
                db["disable"] = r.ue()
                if db["disable"] != 1:
                    db["a"] = 2 * r.se()
                    db["b"] = 2 * r.se()
            if pic is None:
                pic = Picture(sps, pps, ref if typ == 1 else None)
            if is_p:
                pic.decode_slice_p(r, first_mb, slice_qp, db)
            elif pps["cabac"]:
                pic.decode_slice_cabac(r, first_mb, slice_qp, db)
            else:
                pic.decode_slice(r, first_mb, slice_qp, db)
    assert pic is not None
    finish(pic)
    return dims[0], dims[1], frames


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/avc1check"
    files = sorted(glob.glob(os.path.join(d, "*.264")))
    if not files:
        print(f"no .264 fixtures in {d} — run `sbt \"runMain graft.AvcCrosscheck gen {d}\"` first")
        sys.exit(2)
    fails = 0
    for f in files:
        name = os.path.basename(f)[:-4]
        data = open(f, "rb").read()
        want = open(os.path.join(d, name + ".gray"), "rb").read()
        try:
            w, h, frames = decode(data)
            got = b"".join(frames)
        except Exception as e:
            print(f"FAIL {name}: python decode raised {e!r}")
            fails += 1
            continue
        if got != want:
            diff = sum(1 for a, b in zip(got, want) if a != b)
            mx = max(abs(a - b) for a, b in zip(got, want))
            print(f"FAIL {name}: {diff}/{len(want)} bytes differ (max delta {mx})")
            fails += 1
        else:
            print(f"OK   {name}: {w}x{h} x{len(frames)} frame(s), "
                  f"{len(data)} bytes, luma byte-exact")
    if fails:
        print(f"{fails}/{len(files)} FAILED")
        sys.exit(1)
    print(f"all {len(files)} fixtures byte-exact between the two independent decoders")


if __name__ == "__main__":
    main()
