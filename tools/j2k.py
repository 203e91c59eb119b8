#!/usr/bin/env python3
"""Independent pure-Python JPEG 2000 codec (ITU-T T.800): MQ-coded
EBCOT Tier-1, reversible 5/3 AND irreversible 9/7 wavelets, scalar
quantization (derived + expounded), multiple tiles (arbitrary origins
via the general-interval DWT), precinct partitions, multiple
tile-parts, SOP/EPH, RCT/ICT color; 1 layer, LRCP. Encoder AND
decoder, written from the published spec; the self-test roundtrips
both (exact for 5/3, bounded-error + deterministic for 9/7).
`make_j2k_fixture.py` uses the encoder for graft's committed
fixtures; the Scala decoder (`operators/Jpeg2k.scala`) is the
product surface and must match this decoder bit-for-bit (identical
double arithmetic, same operation order).
"""

import math

# ---------------------------------------------------------------- MQ

# T.88 probability state table: (Qe, NMPS, NLPS, SWITCH)
QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]

N_CX = 19
CX_UNI = 18   # uniform
CX_RL = 17    # run-length


def init_states():
    st = [[0, 0] for _ in range(N_CX)]  # [state index, mps]
    st[0][0] = 4       # all-zero-neighbor significance context
    st[CX_RL][0] = 3
    st[CX_UNI][0] = 46
    return st


class MQEncoder:
    def __init__(self, cx=None):
        self.out = bytearray([0])  # dummy first byte (never 0xFF)
        self.c = 0
        self.a = 0x8000
        self.ct = 12
        # context states may be SHARED across terminated segments
        # (code-block styles RESTART/BYPASS terminate the codeword but
        # keep probabilities unless RESET asks otherwise)
        self.cx = cx if cx is not None else init_states()

    def encode(self, cxi, d):
        st = self.cx[cxi]
        qe, nmps, nlps, sw = QE[st[0]]
        if d == st[1]:  # MPS
            self.a -= qe
            if (self.a & 0x8000) == 0:
                if self.a < qe:
                    self.a = qe
                else:
                    self.c += qe
                st[0] = nmps
                self._renorm()
            else:
                self.c += qe
        else:  # LPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if sw:
                st[1] = 1 - st[1]
            st[0] = nlps
            self._renorm()

    def _renorm(self):
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def _byteout(self):
        if self.out[-1] == 0xFF:
            self.out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        else:
            if self.c < 0x8000000:
                self.out.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8
            else:
                self.out[-1] += 1
                assert not (len(self.out) == 1 and self.out[0] == 1), \
                    "carry into dummy byte"
                if self.out[-1] == 0xFF:
                    self.c &= 0x7FFFFFF
                    self.out.append((self.c >> 20) & 0xFF)
                    self.c &= 0xFFFFF
                    self.ct = 7
                else:
                    self.out.append((self.c >> 19) & 0xFF)
                    self.c &= 0x7FFFF
                    self.ct = 8

    def flush(self):
        # SETBITS: force as many 1-bits into C as stay inside [C, C+A)
        temp = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= temp:
            self.c -= 0x8000
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        data = bytes(self.out[1:])
        while data and data[-1] == 0xFF:  # trailing FF is droppable
            data = data[:-1]
        return data


class MQDecoder:
    def __init__(self, data, cx=None):
        self.data = data
        self.bp = 0
        self.cx = cx if cx is not None else init_states()
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c <<= 7
        self.ct -= 7
        self.a = 0x8000

    def _byte(self, i):
        return self.data[i] if i < len(self.data) else 0xFF

    def _bytein(self):
        if self._byte(self.bp) == 0xFF:
            if self._byte(self.bp + 1) > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += self._byte(self.bp) << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += self._byte(self.bp) << 8
            self.ct = 8

    def decode(self, cxi):
        st = self.cx[cxi]
        qe, nmps, nlps, sw = QE[st[0]]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange
            if self.a < qe:
                d = st[1]
                st[0] = nmps
            else:
                d = 1 - st[1]
                if sw:
                    st[1] = 1 - st[1]
                st[0] = nlps
            self.a = qe
            self._renorm()
        else:
            self.c -= qe << 16
            if (self.a & 0x8000) == 0:
                if self.a < qe:
                    d = 1 - st[1]
                    if sw:
                        st[1] = 1 - st[1]
                    st[0] = nlps
                else:
                    d = st[1]
                    st[0] = nmps
                self._renorm()
            else:
                d = st[1]
        return d

    def _renorm(self):
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break


# ------------------------------------------------------------- Tier-1

# significance context (T.800 Table D.1), per subband orientation
def sig_ctx(band, h, v, d):
    if band in ("LL", "LH"):
        pass
    elif band == "HL":
        h, v = v, h
    else:  # HH
        hv = h + v
        if d >= 3:
            return 8
        if d == 2:
            return 7 if hv >= 1 else 6
        if d == 1:
            return 5 if hv >= 2 else (4 if hv == 1 else 3)
        return 2 if hv >= 2 else (1 if hv == 1 else 0)
    if h == 2:
        return 8
    if h == 1:
        if v >= 1:
            return 7
        return 6 if d >= 1 else 5
    if v == 2:
        return 4
    if v == 1:
        return 3
    return 2 if d >= 2 else (1 if d == 1 else 0)


SIGN_TBL = {  # (hc, vc) -> (context, xor)
    (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
    (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
    (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
}


class Block:
    """Shared Tier-1 state over one code-block of w x h coefficients."""

    def __init__(self, band, w, h):
        self.band = band
        self.w, self.h = w, h
        self.sig = [0] * (w * h)     # significance
        self.sgn = [0] * (w * h)     # sign (1 = negative)
        self.vis = [0] * (w * h)     # visited in current plane's sig-prop
        self.ref = [0] * (w * h)     # has been refined once
        # vertically stripe-causal boundary (style 0x08): while set,
        # rows >= ymax read as insignificant in context formation
        self.ymax = None

    def _at(self, x, y, arr):
        if x < 0 or y < 0 or x >= self.w or y >= self.h:
            return 0
        if self.ymax is not None and y >= self.ymax:
            return 0
        return arr[y * self.w + x]

    def neighborhood(self, x, y):
        s = lambda dx, dy: self._at(x + dx, y + dy, self.sig)
        h = s(-1, 0) + s(1, 0)
        v = s(0, -1) + s(0, 1)
        d = s(-1, -1) + s(1, -1) + s(-1, 1) + s(1, 1)
        return h, v, d

    def sign_ctx(self, x, y):
        def contrib(dx, dy):
            if not self._at(x + dx, y + dy, self.sig):
                return 0
            return -1 if self._at(x + dx, y + dy, self.sgn) else 1
        hc = max(-1, min(1, contrib(-1, 0) + contrib(1, 0)))
        vc = max(-1, min(1, contrib(0, -1) + contrib(0, 1)))
        return SIGN_TBL[(hc, vc)]

    def mag_ctx(self, x, y):
        if self._at(x, y, self.ref):
            return 16
        h, v, d = self.neighborhood(x, y)
        return 15 if h + v + d > 0 else 14


# Code-block styles (SPcod/SPcoc style byte, T.800 Table A.19):
#   0x01 BYPASS  selective arithmetic bypass: SPP/MRP of the 5th most
#                significant bitplane onward are RAW (bit-stuffed,
#                uncoded); cleanup stays MQ. Raw runs and the MQ runs
#                between them are separately terminated segments (D.7)
#   0x02 RESET   context probabilities reset at every pass boundary
#   0x04 RESTART the MQ coder terminates at every pass boundary (each
#                pass its own codeword segment)
#   0x08 CAUSAL  vertically stripe-causal contexts: coefficients below
#                the current 4-row stripe read as insignificant
#   0x10 ERTERM  predictable termination - a flush-side property; any
#                conformant termination decodes identically, so the
#                decoder accepts the flag with no behavior change
#   0x20 SEGSYM  a 1010 segmentation symbol (UNI context) ends every
#                cleanup pass; the decoder verifies it
STY_BYPASS, STY_RESET, STY_RESTART = 0x01, 0x02, 0x04
STY_CAUSAL, STY_ERTERM, STY_SEGSYM = 0x08, 0x10, 0x20


def pass_plane_type(nplanes, k):
    """(plane, passtype) of pass k: pass 0 is the MSB plane's cleanup,
    then (SPP, MRP, cleanup) triplets per lower plane."""
    if k == 0:
        return nplanes - 1, 2
    return nplanes - 2 - (k - 1) // 3, (k - 1) % 3


def pass_raw(nplanes, style, k):
    """True when pass k is RAW under BYPASS: SPP/MRP from the fifth
    most significant bitplane onward (D.7)."""
    p, pt = pass_plane_type(nplanes, k)
    return bool(style & STY_BYPASS) and pt != 2 and p <= nplanes - 5


def seg_end_after(nplanes, style, k):
    """True when pass k STRUCTURALLY ends a terminated codeword
    segment (RESTART: every pass; BYPASS: raw/MQ mode transitions) —
    the rule both the packet-header length signaling and segment
    assembly share. The stream's final flush additionally terminates
    whatever segment is open at the last pass."""
    if style & STY_RESTART:
        return True
    if style & STY_BYPASS:
        return pass_raw(nplanes, style, k) != pass_raw(nplanes, style, k + 1)
    return False


def pass_schedule(nplanes, npasses, style):
    """Per pass k: (plane, passtype, raw, term). term marks the END of
    a terminated codeword segment after pass k (structural rule plus
    the final flush)."""
    out = []
    for k in range(npasses):
        p, pt = pass_plane_type(nplanes, k)
        raw = pass_raw(nplanes, style, k)
        term = k == npasses - 1 or seg_end_after(nplanes, style, k)
        out.append((p, pt, raw, term))
    return out


class RawEncoder:
    """Bypass-mode bit packer (D.7.2): MSB-first, and the byte after
    an 0xFF carries only 7 bits (stuffed 0 in its MSB)."""

    def __init__(self):
        self.out = bytearray()
        self.c = 0
        self.nb = 0
        self.limit = 8

    def bit(self, b):
        self.c = (self.c << 1) | (b & 1)
        self.nb += 1
        if self.nb == self.limit:
            self.out.append(self.c)
            self.limit = 7 if self.c == 0xFF else 8
            self.c = 0
            self.nb = 0

    def flush(self):
        if self.nb:
            self.out.append(self.c << (self.limit - self.nb))
            self.c = 0
            self.nb = 0
        return bytes(self.out)


class RawDecoder:
    """Mirror of RawEncoder; reads 0 bits past the segment end."""

    def __init__(self, data):
        self.data = data
        self.pos = 0
        self.c = 0
        self.nb = 0
        self.prev_ff = False

    def bit(self):
        if self.nb == 0:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            if self.prev_ff:
                self.c = b & 0x7F
                self.nb = 7
            else:
                self.c = b
                self.nb = 8
            self.prev_ff = b == 0xFF
        self.nb -= 1
        return (self.c >> self.nb) & 1


def t1_encode(band, coefs, w, h, style=0):
    """Encode one code-block; returns (data, nplanes, npasses,
    pass_ends, pass_terms). pass_ends[k] is a byte offset after coding
    pass k - a valid LAYER cut point (exact at terminated boundaries,
    mid-codeword otherwise; the decoder concatenates pieces of one
    segment). pass_terms[k] marks terminated segment ends, which the
    packet header signals as separate codeword-segment lengths
    (B.10.7.2). coefs: signed ints, row-major w x h."""
    mags = [abs(c) for c in coefs]
    maxmag = max(mags) if mags else 0
    nplanes = max(1, maxmag.bit_length()) if maxmag else 0
    if nplanes == 0:
        return b"", 0, 0, [], []
    blk = Block(band, w, h)
    causal = bool(style & STY_CAUSAL)
    blk_sgn = [1 if c < 0 else 0 for c in coefs]
    npasses = 1 + 3 * (nplanes - 1)
    sched = pass_schedule(nplanes, npasses, style)
    cx = init_states()
    data = bytearray()
    pass_ends, pass_terms = [], []
    mq, raw = None, None
    for k, (p, pt, raw_mode, term) in enumerate(sched):
        bit = lambda i: (mags[i] >> p) & 1
        if raw_mode and raw is None:
            raw = RawEncoder()
        if not raw_mode and mq is None:
            mq = MQEncoder(cx)
        if pt == 0:  # significance propagation
            for y0 in range(0, h, 4):
                blk.ymax = y0 + 4 if causal else None
                for x in range(w):
                    for y in range(y0, min(y0 + 4, h)):
                        i = y * w + x
                        if blk.sig[i]:
                            continue
                        hh, vv, dd = blk.neighborhood(x, y)
                        if hh + vv + dd == 0:
                            continue
                        b = bit(i)
                        if raw_mode:
                            raw.bit(b)
                        else:
                            mq.encode(sig_ctx(band, hh, vv, dd), b)
                        blk.vis[i] = 1
                        if b:
                            if raw_mode:
                                raw.bit(blk_sgn[i])
                            else:
                                scx, sxor = blk.sign_ctx(x, y)
                                mq.encode(scx, blk_sgn[i] ^ sxor)
                            blk.sig[i] = 1
                            blk.sgn[i] = blk_sgn[i]
        elif pt == 1:  # magnitude refinement
            for y0 in range(0, h, 4):
                blk.ymax = y0 + 4 if causal else None
                for x in range(w):
                    for y in range(y0, min(y0 + 4, h)):
                        i = y * w + x
                        if not blk.sig[i] or blk.vis[i]:
                            continue
                        if raw_mode:
                            raw.bit(bit(i))
                        else:
                            mq.encode(blk.mag_ctx(x, y), bit(i))
                        blk.ref[i] = 1
        else:  # cleanup (always MQ)
            for y0 in range(0, h, 4):
                blk.ymax = y0 + 4 if causal else None
                for x in range(w):
                    y = y0
                    ylim = min(y0 + 4, h)
                    if ylim - y0 == 4 and all(
                        blk.sig[(y0 + j) * w + x] == 0 and
                        blk.vis[(y0 + j) * w + x] == 0 and
                        sum(blk.neighborhood(x, y0 + j)) == 0
                        for j in range(4)
                    ):
                        first = next(
                            (j for j in range(4) if bit((y0 + j) * w + x)),
                            None)
                        if first is None:
                            mq.encode(CX_RL, 0)
                            continue
                        mq.encode(CX_RL, 1)
                        mq.encode(CX_UNI, (first >> 1) & 1)
                        mq.encode(CX_UNI, first & 1)
                        i = (y0 + first) * w + x
                        scx, sxor = blk.sign_ctx(x, y0 + first)
                        mq.encode(scx, blk_sgn[i] ^ sxor)
                        blk.sig[i] = 1
                        blk.sgn[i] = blk_sgn[i]
                        y = y0 + first + 1
                    for yy in range(y, ylim):
                        i = yy * w + x
                        if blk.sig[i] or blk.vis[i]:
                            continue
                        hh, vv, dd = blk.neighborhood(x, yy)
                        b = bit(i)
                        mq.encode(sig_ctx(band, hh, vv, dd), b)
                        if b:
                            scx, sxor = blk.sign_ctx(x, yy)
                            mq.encode(scx, blk_sgn[i] ^ sxor)
                            blk.sig[i] = 1
                            blk.sgn[i] = blk_sgn[i]
            if style & STY_SEGSYM:
                for sb in (1, 0, 1, 0):
                    mq.encode(CX_UNI, sb)
            for i in range(w * h):
                blk.vis[i] = 0
        blk.ymax = None
        if term:
            seg = mq.flush() if mq is not None else raw.flush()
            data.extend(seg)
            mq, raw = None, None
            pass_ends.append(len(data))
        else:
            pend = len(mq.out) - 1 if mq is not None else len(raw.out)
            pass_ends.append(len(data) + pend)
        pass_terms.append(term)
        if style & STY_RESET:
            fresh = init_states()
            for ci in range(len(cx)):
                cx[ci][0] = fresh[ci][0]
                cx[ci][1] = fresh[ci][1]
    return bytes(data), nplanes, npasses, pass_ends, pass_terms


def t1_decode(band, segments, w, h, nplanes, npasses, style=0):
    """Decode one code-block from its TERMINATED codeword segments (a
    single-element list for default-style streams); returns signed
    coefficients."""
    mags = [0] * (w * h)
    blk = Block(band, w, h)
    if npasses == 0 or nplanes == 0:
        return mags
    causal = bool(style & STY_CAUSAL)
    sched = pass_schedule(nplanes, npasses, style)
    cx = init_states()
    mq, raw = None, None
    segidx = 0
    for k, (p, pt, raw_mode, term) in enumerate(sched):
        if mq is None and raw is None:
            seg = segments[segidx] if segidx < len(segments) else b""
            segidx += 1
            if raw_mode:
                raw = RawDecoder(seg)
            else:
                mq = MQDecoder(seg, cx)
        if pt == 0:
            for y0 in range(0, h, 4):
                blk.ymax = y0 + 4 if causal else None
                for x in range(w):
                    for y in range(y0, min(y0 + 4, h)):
                        i = y * w + x
                        if blk.sig[i]:
                            continue
                        hh, vv, dd = blk.neighborhood(x, y)
                        if hh + vv + dd == 0:
                            continue
                        blk.vis[i] = 1
                        b = raw.bit() if raw_mode else \
                            mq.decode(sig_ctx(band, hh, vv, dd))
                        if b:
                            if raw_mode:
                                s = raw.bit()
                            else:
                                scx, sxor = blk.sign_ctx(x, y)
                                s = mq.decode(scx) ^ sxor
                            blk.sig[i] = 1
                            blk.sgn[i] = s
                            mags[i] |= 1 << p
        elif pt == 1:
            for y0 in range(0, h, 4):
                blk.ymax = y0 + 4 if causal else None
                for x in range(w):
                    for y in range(y0, min(y0 + 4, h)):
                        i = y * w + x
                        if not blk.sig[i] or blk.vis[i]:
                            continue
                        b = raw.bit() if raw_mode else \
                            mq.decode(blk.mag_ctx(x, y))
                        if b:
                            mags[i] |= 1 << p
                        blk.ref[i] = 1
        else:
            for y0 in range(0, h, 4):
                blk.ymax = y0 + 4 if causal else None
                for x in range(w):
                    y = y0
                    ylim = min(y0 + 4, h)
                    if ylim - y0 == 4 and all(
                        blk.sig[(y0 + j) * w + x] == 0 and
                        blk.vis[(y0 + j) * w + x] == 0 and
                        sum(blk.neighborhood(x, y0 + j)) == 0
                        for j in range(4)
                    ):
                        if not mq.decode(CX_RL):
                            continue
                        first = (mq.decode(CX_UNI) << 1) | mq.decode(CX_UNI)
                        i = (y0 + first) * w + x
                        scx, sxor = blk.sign_ctx(x, y0 + first)
                        s = mq.decode(scx) ^ sxor
                        blk.sig[i] = 1
                        blk.sgn[i] = s
                        mags[i] |= 1 << p
                        y = y0 + first + 1
                    for yy in range(y, ylim):
                        i = yy * w + x
                        if blk.sig[i] or blk.vis[i]:
                            continue
                        hh, vv, dd = blk.neighborhood(x, yy)
                        if mq.decode(sig_ctx(band, hh, vv, dd)):
                            scx, sxor = blk.sign_ctx(x, yy)
                            s = mq.decode(scx) ^ sxor
                            blk.sig[i] = 1
                            blk.sgn[i] = s
                            mags[i] |= 1 << p
            if style & STY_SEGSYM:
                seg_sym = 0
                for _ in range(4):
                    seg_sym = (seg_sym << 1) | mq.decode(CX_UNI)
                assert seg_sym == 0b1010, \
                    f"bad segmentation symbol {seg_sym:04b}"
            for i in range(w * h):
                blk.vis[i] = 0
        blk.ymax = None
        if term:
            mq, raw = None, None
        if style & STY_RESET:
            fresh = init_states()
            for ci in range(len(cx)):
                cx[ci][0] = fresh[ci][0]
                cx[ci][1] = fresh[ci][1]
    return [(-m if blk.sgn[i] else m) for i, m in enumerate(mags)]


# ------------------------------------------------------------- 5/3 DWT

def fwd53_1d(x):
    n = len(x)
    if n == 1:
        return list(x), []
    ext = lambda i: x[min(max(i, -i), 2 * (n - 1) - i) if i < 0 or i >= n
                      else i]

    def xe(i):  # symmetric extension
        if i < 0:
            i = -i
        if i >= n:
            i = 2 * (n - 1) - i
        return x[i]
    nl = (n + 1) // 2
    nh = n // 2
    hi = [0] * nh
    lo = [0] * nl
    for k in range(nh):
        hi[k] = xe(2 * k + 1) - ((xe(2 * k) + xe(2 * k + 2)) >> 1)

    def he(k):
        if k < 0:
            k = -k - 1
        if k >= nh:
            k = 2 * nh - 1 - k
        return hi[k] if nh else 0
    for k in range(nl):
        if nh:
            lo[k] = xe(2 * k) + ((he(k - 1) + he(k) + 2) >> 2)
        else:
            lo[k] = xe(2 * k)
    return lo, hi


def inv53_1d(lo, hi):
    nl, nh = len(lo), len(hi)
    n = nl + nh
    if n == 1:
        return list(lo)
    out = [0] * n

    def he(k):
        if k < 0:
            k = -k - 1
        if k >= nh:
            k = 2 * nh - 1 - k
        return hi[k] if nh else 0
    for k in range(nl):
        out[2 * k] = lo[k] - ((he(k - 1) + he(k) + 2) >> 2)

    def ee(i):  # even (reconstructed) with symmetric extension
        if i < 0:
            i = -i
        if i >= n:
            i = 2 * (n - 1) - i
        # even positions only are defined here during lifting; the
        # callers only request even indices
        return out[i]
    for k in range(nh):
        lo_i = 2 * k
        hi_i = 2 * k + 2
        if hi_i >= n:
            hi_i = 2 * (n - 1) - hi_i
        out[2 * k + 1] = hi[k] + ((out[lo_i] + out[hi_i]) >> 1)
    return out


def fwd53_2d(img, w, h):
    """One DWT level: returns (ll, hl, lh, hh) with their dims."""
    # rows first
    lo_w = (w + 1) // 2
    hi_w = w // 2
    rl = [[0] * lo_w for _ in range(h)]
    rh = [[0] * hi_w for _ in range(h)]
    for y in range(h):
        lo, hi = fwd53_1d(img[y * w:(y + 1) * w])
        rl[y] = lo
        rh[y] = hi
    lo_h = (h + 1) // 2
    hi_h = h // 2
    ll = [0] * (lo_w * lo_h)
    lh = [0] * (lo_w * hi_h)
    hl = [0] * (hi_w * lo_h)
    hh = [0] * (hi_w * hi_h)
    for x in range(lo_w):
        lo, hi = fwd53_1d([rl[y][x] for y in range(h)])
        for k in range(lo_h):
            ll[k * lo_w + x] = lo[k]
        for k in range(hi_h):
            lh[k * lo_w + x] = hi[k]
    for x in range(hi_w):
        lo, hi = fwd53_1d([rh[y][x] for y in range(h)])
        for k in range(lo_h):
            hl[k * hi_w + x] = lo[k]
        for k in range(hi_h):
            hh[k * hi_w + x] = hi[k]
    return ll, hl, lh, hh, lo_w, lo_h, hi_w, hi_h


def inv53_2d(ll, hl, lh, hh, lo_w, lo_h, hi_w, hi_h):
    w = lo_w + hi_w
    h = lo_h + hi_h
    # columns first (mirror of forward rows-then-cols)
    rl = [[0] * lo_w for _ in range(h)]
    rh = [[0] * hi_w for _ in range(h)]
    for x in range(lo_w):
        col = inv53_1d([ll[k * lo_w + x] for k in range(lo_h)],
                       [lh[k * lo_w + x] for k in range(hi_h)])
        for y in range(h):
            rl[y][x] = col[y]
    for x in range(hi_w):
        col = inv53_1d([hl[k * hi_w + x] for k in range(lo_h)],
                       [hh[k * hi_w + x] for k in range(hi_h)])
        for y in range(h):
            rh[y][x] = col[y]
    out = [0] * (w * h)
    for y in range(h):
        row = inv53_1d(rl[y], rh[y])
        for x in range(w):
            out[y * w + x] = row[x]
    return out


# ---------------------------------------------------------- tag trees

class TagTree:
    """T.800 B.10.2 tag tree: per node a value, a coded lower bound
    (`low`) and a resolved flag (`known`). Encoding at threshold T
    emits 0s raising the bound and a single 1 when the true value is
    reached; the decoder mirrors. One instance per (precinct, use)."""

    def __init__(self, w, h):
        self.dims = []
        ww, hh = max(1, w), max(1, h)
        while True:
            self.dims.append((ww, hh))
            if ww == 1 and hh == 1:
                break
            ww = (ww + 1) // 2
            hh = (hh + 1) // 2
        n = sum(a * b for a, b in self.dims)
        self.value = [0] * n
        self.low = [0] * n
        self.known = [0] * n

    def _idx(self, lev, x, y):
        base = sum(a * b for a, b in self.dims[:lev])
        w, _ = self.dims[lev]
        return base + y * w + x

    def set_values(self, leaf_vals):
        w0, h0 = self.dims[0]
        assert len(leaf_vals) == w0 * h0
        for i, v in enumerate(leaf_vals):
            self.value[i] = v
        for lev in range(1, len(self.dims)):
            pw, ph = self.dims[lev - 1]
            w, h = self.dims[lev]
            for y in range(h):
                for x in range(w):
                    c = []
                    for dy in range(2):
                        for dx in range(2):
                            cx, cy = 2 * x + dx, 2 * y + dy
                            if cx < pw and cy < ph:
                                c.append(self.value[self._idx(lev - 1, cx, cy)])
                    self.value[self._idx(lev, x, y)] = min(c)

    def _path(self, x, y):
        out = []
        for lev in range(len(self.dims)):
            out.append(self._idx(lev, x >> lev, y >> lev))
        return list(reversed(out))  # root first

    def encode(self, bits, x, y, threshold):
        low = 0
        for i in self._path(x, y):
            if self.low[i] < low:
                self.low[i] = low
            else:
                low = self.low[i]
            while low < threshold:
                if low >= self.value[i]:
                    if not self.known[i]:
                        bits.append(1)
                        self.known[i] = 1
                    break
                bits.append(0)
                low += 1
            self.low[i] = low
        return self.value[self._path(x, y)[-1]] < threshold

    def decode(self, bits, x, y, threshold):
        low = 0
        leaf = None
        for i in self._path(x, y):
            if self.low[i] < low:
                self.low[i] = low
            else:
                low = self.low[i]
            while not self.known[i] and low < threshold:
                if bits.pop(0):
                    self.known[i] = 1
                else:
                    low += 1
            self.value[i] = low
            self.low[i] = low
            leaf = i
        return self.known[leaf] and self.value[leaf] < threshold


# ------------------------------------------------- packet-header bits

class HdrWriter:
    """Packet-header bit writer with T.800 B.10.1 stuffing: a byte of
    0xFF is followed by a 7-bit byte (MSB 0); a trailing 0xFF gets a
    stuffed 0x00."""

    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nb = 0
        self.cap = 8

    def bit(self, b):
        self.cur = (self.cur << 1) | b
        self.nb += 1
        if self.nb == self.cap:
            self.out.append(self.cur)
            self.cap = 7 if self.cur == 0xFF else 8
            self.cur = 0
            self.nb = 0

    def bits(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bit((v >> i) & 1)

    def finish(self):
        while self.nb:
            self.bit(0)
        if self.out and self.out[-1] == 0xFF:
            self.out.append(0x00)
        return bytes(self.out)


class HdrReader:
    def __init__(self, data, pos=0):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nb = 0
        self.prev_ff = False

    def bit(self):
        if self.nb == 0:
            b = self.data[self.pos]
            self.pos += 1
            if self.prev_ff:
                assert b < 0x80, "stuffed byte with MSB set"
                self.cur = b
                self.nb = 7
            else:
                self.cur = b
                self.nb = 8
            self.prev_ff = b == 0xFF
        self.nb -= 1
        return (self.cur >> self.nb) & 1

    def bits(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self):
        # consume the trailing stuffed byte after a final 0xFF
        if self.prev_ff:
            assert self.data[self.pos] < 0x80
            self.pos += 1
            self.prev_ff = False
        self.nb = 0


class BitList:
    """Adapter so TagTree can run over writer/reader uniformly."""

    def __init__(self, writer=None, reader=None):
        self.w = writer
        self.r = reader

    def append(self, b):
        self.w.bit(b)

    def pop(self, _i):
        return self.r.bit()


# --------------------------------------------------------- geometry

def resolutions(w, h, levels):
    """Per resolution, the list of (band_name, bw, bh); LL first."""
    sizes = []
    cw, ch = w, h
    for _ in range(levels):
        lo_w, hi_w = (cw + 1) // 2, cw // 2
        lo_h, hi_h = (ch + 1) // 2, ch // 2
        sizes.append((lo_w, lo_h, hi_w, hi_h))
        cw, ch = lo_w, lo_h
    res = [[("LL", cw, ch)]]
    for l in range(levels - 1, -1, -1):
        lo_w, lo_h, hi_w, hi_h = sizes[l]
        res.append([("HL", hi_w, lo_h), ("LH", lo_w, hi_h),
                    ("HH", hi_w, hi_h)])
    return res


def cb_grid(bw, bh, cbw, cbh):
    """Code-block rects (x0, y0, w, h) raster order, plus grid dims."""
    if bw == 0 or bh == 0:
        return [], 0, 0
    nx = (bw + cbw - 1) // cbw
    ny = (bh + cbh - 1) // cbh
    out = []
    for gy in range(ny):
        for gx in range(nx):
            x0, y0 = gx * cbw, gy * cbh
            out.append((x0, y0, min(cbw, bw - x0), min(cbh, bh - y0)))
    return out, nx, ny


def npasses_of(nplanes):
    return 0 if nplanes == 0 else 1 + 3 * (nplanes - 1)


def write_npasses(bw, n):
    if n == 1:
        bw.bit(0)
    elif n == 2:
        bw.bits(0b10, 2)
    elif n <= 5:
        bw.bits(0b11, 2)
        bw.bits(n - 3, 2)
    elif n <= 36:
        bw.bits(0b1111, 4)
        bw.bits(n - 6, 5)
    else:
        bw.bits(0b111111111, 9)
        bw.bits(n - 37, 7)


def read_npasses(br):
    if br.bit() == 0:
        return 1
    if br.bit() == 0:
        return 2
    v = br.bits(2)
    if v < 3:
        return 3 + v
    v = br.bits(5)
    if v < 31:
        return 6 + v
    return 37 + br.bits(7)


GUARD = 2


def _cdiv(a, b):
    return -(-a // b)


def tile_grid(xsiz, ysiz, xt, yt, xo=0, yo=0, xto=0, yto=0):
    """Tile rects (tx0, tx1, ty0, ty1) raster order on the reference
    grid (T.800 B.3): the grid anchors at (XTOsiz, YTOsiz) and each
    tile clips to the image region [XOsiz, Xsiz) x [YOsiz, Ysiz)."""
    assert 0 <= xto <= xo and 0 <= yto <= yo, "tile offset > image offset"
    assert xto + xt > xo and yto + yt > yo, \
        "first tile misses the image origin"
    ntx = _cdiv(xsiz - xto, xt)
    nty = _cdiv(ysiz - yto, yt)
    tiles = []
    for q in range(nty):
        for p in range(ntx):
            tiles.append((max(xto + p * xt, xo),
                          min(xto + (p + 1) * xt, xsiz),
                          max(yto + q * yt, yo),
                          min(yto + (q + 1) * yt, ysiz)))
    return tiles, ntx, nty


def res_rect(tx0, tx1, ty0, ty1, levels, r):
    """Resolution-r grid rect of a tile (T.800 B-14)."""
    d = 1 << (levels - r)
    return (_cdiv(tx0, d), _cdiv(tx1, d), _cdiv(ty0, d), _cdiv(ty1, d))


def band_rect(tx0, tx1, ty0, ty1, levels, r, name):
    """Subband coordinate rect (T.800 B-15): LL at r=0, else HL/LH/HH
    of resolution r (decomposition level nb = levels - r + 1)."""
    if r == 0:
        return res_rect(tx0, tx1, ty0, ty1, levels, 0)
    nb = levels - r + 1
    d = 1 << nb
    ho = 1 << (nb - 1)
    xo = ho if name in ("HL", "HH") else 0
    yo = ho if name in ("LH", "HH") else 0
    return (_cdiv(tx0 - xo, d), _cdiv(tx1 - xo, d),
            _cdiv(ty0 - yo, d), _cdiv(ty1 - yo, d))


def band_list(levels):
    """(r, name, nb, gain) in QCD signaling order: LL then per
    resolution HL, LH, HH. gain is the log2 nominal range increase."""
    out = [(0, "LL", levels, 0)]
    for r in range(1, levels + 1):
        nb = levels - r + 1
        out.extend([(r, "HL", nb, 1), (r, "LH", nb, 1), (r, "HH", nb, 2)])
    return out


def prec_grid(rx0, rx1, ry0, ry1, ppx, ppy):
    """Precinct indices (pi, pj) raster order over a resolution rect;
    the partition is anchored at 0 with cells 2^ppx x 2^ppy."""
    if rx1 <= rx0 or ry1 <= ry0:
        return []
    px0, px1 = rx0 >> ppx, _cdiv(rx1, 1 << ppx)
    py0, py1 = ry0 >> ppy, _cdiv(ry1, 1 << ppy)
    return [(pi, pj) for pj in range(py0, py1) for pi in range(px0, px1)]


def prec_band_rect(pi, pj, ppx, ppy, shift, brect):
    """A precinct's intersection with a band, in band coordinates.
    shift=0 at r=0 (band coords == resolution coords), else 1."""
    bx0, bx1, by0, by1 = brect
    x0 = max(bx0, (pi << ppx) >> shift)
    x1 = min(bx1, ((pi + 1) << ppx) >> shift)
    y0 = max(by0, (pj << ppy) >> shift)
    y1 = min(by1, ((pj + 1) << ppy) >> shift)
    return (x0, max(x0, x1), y0, max(y0, y1))


def cb_list_g(pb, lcbw, lcbh):
    """Code-blocks of a precinct-band: the partition is anchored at 0
    in band space with cells 2^lcbw x 2^lcbh; cells never straddle
    precinct boundaries (cell size divides precinct size). Returns
    (rects, nx, ny) with rects (x0, x1, y0, y1) in band coords,
    raster order matching the tag-tree leaf layout."""
    x0, x1, y0, y1 = pb
    if x1 <= x0 or y1 <= y0:
        return [], 0, 0
    mx0, mx1 = x0 >> lcbw, _cdiv(x1, 1 << lcbw)
    my0, my1 = y0 >> lcbh, _cdiv(y1, 1 << lcbh)
    out = []
    for my in range(my0, my1):
        for mx in range(mx0, mx1):
            out.append((max(x0, mx << lcbw), min(x1, (mx + 1) << lcbw),
                        max(y0, my << lcbh), min(y1, (my + 1) << lcbh)))
    return out, mx1 - mx0, my1 - my0


# --------------------------------------- general-interval DWT kernels

K97 = 1.230174104914001
IK97 = 1.0 / K97
A97 = -1.586134342059924
B97 = -0.052980118572961
G97 = 0.882911075530934
D97 = 0.443506852043971


def _ref(j, i0, i1):
    """Whole-sample symmetric reflection into [i0, i1); reflection
    about a boundary sample preserves parity (i0-k vs i0+k)."""
    n = i1 - i0
    p = 2 * (n - 1)
    k = (j - i0) % p
    if k >= n:
        k = p - k
    return i0 + k


def fwd1d_g(x, i0, i1, kernel):
    """Forward 1D DWT on samples at global positions [i0, i1). Returns
    (lo, hi): lo = transformed even-position samples, hi = odd. The
    interval origin's parity decides which subband each sample joins
    (T.800 interleave convention)."""
    n = i1 - i0
    if n == 0:
        return [], []
    if n == 1:
        if i0 % 2 == 0:
            return list(x), []
        # lone high-pass sample: Y = 2X (inverse halves it)
        return [], [2 * x[0] if kernel == "53" else 2.0 * x[0]]

    if kernel == "53":
        Y = list(x)
        for j in range(i0, i1):
            if j % 2:  # reads even neighbours (still original values)
                Y[j - i0] -= (Y[_ref(j - 1, i0, i1) - i0] +
                              Y[_ref(j + 1, i0, i1) - i0]) >> 1
        for j in range(i0, i1):
            if j % 2 == 0:  # reads updated odd neighbours
                Y[j - i0] += (Y[_ref(j - 1, i0, i1) - i0] +
                              Y[_ref(j + 1, i0, i1) - i0] + 2) >> 2
    else:
        Y = [float(v) for v in x]
        for j in range(i0, i1):
            if j % 2:
                Y[j - i0] += A97 * (Y[_ref(j - 1, i0, i1) - i0] +
                                    Y[_ref(j + 1, i0, i1) - i0])
        for j in range(i0, i1):
            if j % 2 == 0:
                Y[j - i0] += B97 * (Y[_ref(j - 1, i0, i1) - i0] +
                                    Y[_ref(j + 1, i0, i1) - i0])
        for j in range(i0, i1):
            if j % 2:
                Y[j - i0] += G97 * (Y[_ref(j - 1, i0, i1) - i0] +
                                    Y[_ref(j + 1, i0, i1) - i0])
        for j in range(i0, i1):
            if j % 2 == 0:
                Y[j - i0] += D97 * (Y[_ref(j - 1, i0, i1) - i0] +
                                    Y[_ref(j + 1, i0, i1) - i0])
        # normalization from T.800 Table F.4: low-pass DC gain 1
        # (raw lifting gives K), high-pass Nyquist gain 2 (raw 2/K)
        for j in range(i0, i1):
            Y[j - i0] *= K97 if j % 2 else IK97
    lo = [Y[j - i0] for j in range(i0, i1) if j % 2 == 0]
    hi = [Y[j - i0] for j in range(i0, i1) if j % 2]
    return lo, hi


def inv1d_g(lo, hi, i0, i1, kernel):
    """Inverse of fwd1d_g: subband samples back to [i0, i1)."""
    n = i1 - i0
    if n == 0:
        return []
    if n == 1:
        if i0 % 2 == 0:
            return list(lo)
        return [hi[0] >> 1] if kernel == "53" else [hi[0] / 2.0]
    Y = [0] * n
    li = hi_i = 0
    for j in range(i0, i1):
        if j % 2 == 0:
            Y[j - i0] = lo[li]
            li += 1
        else:
            Y[j - i0] = hi[hi_i]
            hi_i += 1
    if kernel == "53":
        for j in range(i0, i1):
            if j % 2 == 0:
                Y[j - i0] -= (Y[_ref(j - 1, i0, i1) - i0] +
                              Y[_ref(j + 1, i0, i1) - i0] + 2) >> 2
        for j in range(i0, i1):
            if j % 2:
                Y[j - i0] += (Y[_ref(j - 1, i0, i1) - i0] +
                              Y[_ref(j + 1, i0, i1) - i0]) >> 1
    else:
        for j in range(i0, i1):
            Y[j - i0] *= IK97 if j % 2 else K97
        for j in range(i0, i1):
            if j % 2 == 0:
                Y[j - i0] -= D97 * (Y[_ref(j - 1, i0, i1) - i0] +
                                    Y[_ref(j + 1, i0, i1) - i0])
        for j in range(i0, i1):
            if j % 2:
                Y[j - i0] -= G97 * (Y[_ref(j - 1, i0, i1) - i0] +
                                    Y[_ref(j + 1, i0, i1) - i0])
        for j in range(i0, i1):
            if j % 2 == 0:
                Y[j - i0] -= B97 * (Y[_ref(j - 1, i0, i1) - i0] +
                                    Y[_ref(j + 1, i0, i1) - i0])
        for j in range(i0, i1):
            if j % 2:
                Y[j - i0] -= A97 * (Y[_ref(j - 1, i0, i1) - i0] +
                                    Y[_ref(j + 1, i0, i1) - i0])
    return Y


def fwd2d_g(img, x0, x1, y0, y1, kernel):
    """One 2D level over the rect (rows then columns). Returns
    (ll, hl, lh, hh) row-major in their band rects."""
    w, h = x1 - x0, y1 - y0
    lx0, lx1 = _cdiv(x0, 2), _cdiv(x1, 2)
    ly0, ly1 = _cdiv(y0, 2), _cdiv(y1, 2)
    hy0, hy1 = y0 // 2, y1 // 2
    lw = lx1 - lx0
    hw = x1 // 2 - x0 // 2
    rl, rh = [], []
    for yy in range(h):
        lo, hi = fwd1d_g(img[yy * w:(yy + 1) * w], x0, x1, kernel)
        rl.append(lo)
        rh.append(hi)
    ll = [0] * (lw * (ly1 - ly0))
    lh = [0] * (lw * (hy1 - hy0))
    hl = [0] * (hw * (ly1 - ly0))
    hh = [0] * (hw * (hy1 - hy0))
    for cx in range(lw):
        lo, hi = fwd1d_g([rl[yy][cx] for yy in range(h)], y0, y1, kernel)
        for k, v in enumerate(lo):
            ll[k * lw + cx] = v
        for k, v in enumerate(hi):
            lh[k * lw + cx] = v
    for cx in range(hw):
        lo, hi = fwd1d_g([rh[yy][cx] for yy in range(h)], y0, y1, kernel)
        for k, v in enumerate(lo):
            hl[k * hw + cx] = v
        for k, v in enumerate(hi):
            hh[k * hw + cx] = v
    return ll, hl, lh, hh


def inv2d_g(ll, hl, lh, hh, x0, x1, y0, y1, kernel):
    """Inverse of fwd2d_g (columns then rows)."""
    w, h = x1 - x0, y1 - y0
    lx0, lx1 = _cdiv(x0, 2), _cdiv(x1, 2)
    ly0, ly1 = _cdiv(y0, 2), _cdiv(y1, 2)
    hy0, hy1 = y0 // 2, y1 // 2
    lw = lx1 - lx0
    hw = x1 // 2 - x0 // 2
    rl = [[0] * lw for _ in range(h)]
    rh = [[0] * hw for _ in range(h)]
    for cx in range(lw):
        col = inv1d_g([ll[k * lw + cx] for k in range(ly1 - ly0)],
                      [lh[k * lw + cx] for k in range(hy1 - hy0)],
                      y0, y1, kernel)
        for yy in range(h):
            rl[yy][cx] = col[yy]
    for cx in range(hw):
        col = inv1d_g([hl[k * hw + cx] for k in range(ly1 - ly0)],
                      [hh[k * hw + cx] for k in range(hy1 - hy0)],
                      y0, y1, kernel)
        for yy in range(h):
            rh[yy][cx] = col[yy]
    out = [0] * (w * h)
    for yy in range(h):
        row = inv1d_g(rl[yy], rh[yy], x0, x1, kernel)
        for xx in range(w):
            out[yy * w + xx] = row[xx]
    return out


# -------------------------------------------- color transforms, quant

def rct_fwd(r, g, b):
    y = (r + 2 * g + b) >> 2
    return y, b - g, r - g


def rct_inv(y, u, v):
    g = y - ((u + v) >> 2)
    return v + g, g, u + g


def ict_fwd(r, g, b):
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def ict_inv(y, cb, cr):
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return r, g, b


def quant_setup(levels, prec, style, e0, mu0):
    """Per-band (eps, mu, delta, mb) in QCD signaling order.
    derived: eps_b = e0 - levels + nb (one signaled pair);
    expounded: eps_b = e0 + gain_b (uniform step; per-band pairs).
    delta_b = 2^(Rb - eps_b) * (1 + mu_b / 2^11), Rb = prec + gain_b;
    Mb = GUARD + eps_b - 1 (T.800 E.1)."""
    out = []
    for (_, _, nb, gain) in band_list(levels):
        eb = (e0 - levels + nb) if style == "derived" else (e0 + gain)
        assert 0 <= eb < 32, eb
        delta = 2.0 ** ((prec + gain) - eb) * (1.0 + mu0 / 2048.0)
        out.append((eb, mu0, delta, GUARD + eb - 1))
    return out


# ----------------------------------------------------------- encoder

PROGRESSIONS = {"LRCP": 0, "RLCP": 1, "RPCL": 2, "PCRL": 3, "CPRL": 4}


def pkt_key(order, l, r, c, pi, pj, ppx, ppy, levels, tx0, ty0,
            xr=1, yr=1):
    """Packet ordering key for the five T.800 progressions (B.12).
    Position progressions (RPCL/PCRL/CPRL) order precincts by the
    reference-grid projection of their origin (resolution coords x
    2^(levels-r)) CLAMPED to the tile origin: B.12's position loops
    run over [ty0, ty1), so a tile's first partial precinct keys at
    the tile origin, not its (grid-anchored-at-0) projected origin."""
    ty = max(ty0, ((pj << ppy) << (levels - r)) * yr)
    tx = max(tx0, ((pi << ppx) << (levels - r)) * xr)
    if order == 0:
        return (l, r, c, pj, pi)
    if order == 1:
        return (r, l, c, pj, pi)
    if order == 2:
        return (r, ty, tx, c, l)
    if order == 3:
        return (ty, tx, c, r, l)
    return (c, ty, tx, r, l)


def _p_cod(b):
    """Parse a COD segment body (after Lcod) to its field dict."""
    scod = b[0]
    prog = b[1]
    assert prog <= 4, f"progression {prog}"
    layers = (b[2] << 8) | b[3]
    assert layers >= 1
    levels = b[5]
    cbsty = b[8]
    assert cbsty & ~0x3F == 0, f"code-block style {cbsty:#x}"
    if scod & 1:
        pps = [(b[10 + r] & 0x0F, b[10 + r] >> 4)
               for r in range(levels + 1)]
    else:
        pps = [(15, 15)] * (levels + 1)
    return dict(scod=scod, prog=prog, layers=layers, mct=b[4] == 1,
                levels=levels, lcbw=b[6] + 2, lcbh=b[7] + 2,
                cbsty=cbsty, lossy=b[9] == 0, pps=pps)


def _p_coc(b, ncomp):
    """Parse a COC segment body; returns (comp, coc_over tuple)."""
    cc = b[0] if ncomp < 257 else ((b[0] << 8) | b[1])
    o = 1 if ncomp < 257 else 2
    scoc = b[o]
    lv2 = b[o + 1]
    cbsty2 = b[o + 4]
    assert cbsty2 & ~0x3F == 0, f"code-block style {cbsty2:#x}"
    if scoc & 1:
        pps2 = [(b[o + 6 + r] & 0x0F, b[o + 6 + r] >> 4)
                for r in range(lv2 + 1)]
    else:
        pps2 = [(15, 15)] * (lv2 + 1)
    return cc, (lv2, b[o + 2] + 2, b[o + 3] + 2, b[o + 5] == 0,
                pps2, cbsty2)


def _p_quant(b, o):
    """Parse Sqcd/Sqcc + pairs from b[o:]; returns (style, guard,
    pairs)."""
    sq = b[o]
    qs = sq & 0x1F
    g = sq >> 5
    assert qs <= 2, f"quant style {qs}"
    prs = []
    i = o + 1
    if qs == 0:
        while i < len(b):
            prs.append((b[i] >> 3, 0))
            i += 1
    else:
        while i < len(b):
            prs.append(((b[i] << 8 | b[i + 1]) >> 11,
                        (b[i] << 8 | b[i + 1]) & 0x7FF))
            i += 2
    return qs, g, prs


def order_packets(metas, prog, poc, levels, tx0, ty0):
    """Order packet metas (l, r, c, ip, pi, pj, ppx, ppy, xr, yr) for
    one tile: by the COD progression, or — when POC segments are
    present (A.6.6 / B.12.1.7) — segment by segment, each emitting in
    ITS progression order the not-yet-emitted packets with
    RSpoc <= r < REpoc, CSpoc <= c < CEpoc, layer < LYEpoc."""
    def key(pr, m):
        (l, r, c, ip, pi, pj, ppx, ppy, xr, yr) = m
        return pkt_key(pr, l, r, c, pi, pj, ppx, ppy, levels,
                       tx0, ty0, xr, yr)
    if not poc:
        return sorted(metas, key=lambda m: key(prog, m))
    out = []
    taken = [False] * len(metas)
    for (rs, cs, lye, re_, ce, pr) in poc:
        batch = [(key(pr, m), i) for i, m in enumerate(metas)
                 if not taken[i] and rs <= m[1] < re_ and
                 cs <= m[2] < ce and m[0] < lye]
        for (_, i) in sorted(batch):
            taken[i] = True
            out.append(metas[i])
    assert all(taken), "POC progression does not cover all packets"
    return out


def layer_bounds(nps, layers):
    """Pass-count cut points per layer: contiguous, as even as
    possible, earliest layers first."""
    return [nps * g // layers for g in range(layers + 1)]


def encode(img, w, h, prec, signed=False, levels=2, cbw=32, cbh=32,
           ncomp=1, mct=False, transform="53", quant=None,
           xtsiz=None, ytsiz=None, precincts=None, sop=False, eph=False,
           tile_parts=1, layers=1, progression="LRCP",
           xosiz=0, yosiz=0, xtosiz=0, ytosiz=0, coc=None, qcc=None,
           subsampling=None, cbstyle=0, rgn=None, poc=None,
           ppt=False, ppm=False, tile_cod=None, tile_qcd=None):
    """img: single plane (ncomp=1) or list of ncomp planes, row-major
    w x h. transform "53" (reversible, quant must be None) or "97"
    (irreversible, quant = (style, e0, mu0), style "derived" or
    "expounded"). xtsiz/ytsiz tile the image; precincts is a single
    (ppx, ppy) or per-resolution list (Scod bit 0); tile_parts splits
    every tile's packets across that many SOT segments; layers splits
    every code-block's coding passes across quality layers;
    progression picks the packet order (any of the five);
    xosiz/yosiz place the w x h image region at that reference-grid
    origin (Xsiz = xosiz + w) and xtosiz/ytosiz anchor the tile grid
    (cropped-encode canvas offsets, T.800 B.3); coc maps a component
    index to dict(cbw=, cbh=, precincts=) per-component coding
    overrides (emitted as COC markers); qcc maps a component index to
    its quantization override (a (style, e0, mu0) tuple when lossy or
    the string "auto" when lossless — per-component reversible
    exponents from that component's own magnitudes), emitted as QCC
    markers. subsampling is a per-component (XRsiz, YRsiz) list:
    component c's samples live on the reference-grid lattice of
    multiples of its factors, so its plane has
    cdiv(Xsiz, xr) - cdiv(XOsiz, xr) columns (T.800 B.2); pass each
    plane at ITS OWN dims. MCT requires equal factors. cbstyle is
    the T.800 Table A.19 code-block style byte (BYPASS 0x01 |
    RESET 0x02 | RESTART 0x04 | CAUSAL 0x08 | SEGSYM 0x20; ERTERM is
    a flush-side property this encoder does not emit). rgn maps a
    component to its maxshift ROI shift (Annex H): this encoder marks
    the top-left quadrant of every band as the ROI, upshifts those
    quantized coefficients by the shift, and asserts every background
    magnitude stays below 2^shift (raising shift as needed is the
    caller's concern — H.2 requires it). poc is a list of
    progression-order-change segments (rs, cs, lye, re, ce,
    progression_name) emitted as a POC marker; together they must
    cover every packet. ppt moves every packet header into PPT
    marker segments in the tile-part headers (A.6.4); ppm moves them
    into a main-header PPM segment with per-tile-part Nppm length
    prefixes in codestream order (A.6.5); either way the bitstream
    bodies carry only SOP markers and payload bytes. tile_cod maps a
    tile index to dict(cbw=, cbh=, precincts=, progression=, layers=,
    cbstyle=) tile-scope coding overrides (a COD in that tile's first
    tile-part header; levels/transform/MCT stay global); tile_qcd
    maps a tile index to a (style, e0, mu0) quantization override
    (lossy only, a QCD in the tile-part header)."""
    assert 1 <= levels <= 6 and 4 <= cbw <= 64 and 4 <= cbh <= 64
    assert cbstyle & ~0x2F == 0, "cbstyle: BYPASS/RESET/RESTART/CAUSAL/SEGSYM"
    assert transform in ("53", "97")
    assert 1 <= layers <= 65535
    prog = PROGRESSIONS[progression]
    poc = [(rs, cs, lye, re_, ce, PROGRESSIONS[pn])
           for (rs, cs, lye, re_, ce, pn) in (poc or [])]
    lossy = transform == "97"
    assert lossy == (quant is not None), "quant iff 9/7"
    xsiz = xosiz + w
    ysiz = yosiz + h
    xt = xtsiz if xtsiz else xsiz - xtosiz
    yt = ytsiz if ytsiz else ysiz - ytosiz
    assert 1 <= tile_parts <= 255
    assert not (ppt and ppm), "PPT and PPM are mutually exclusive"
    packed = ppt or ppm
    tile_cod = dict(tile_cod or {})
    tile_qcd = dict(tile_qcd or {})
    _ntiles = _cdiv(xsiz - xtosiz, xt) * _cdiv(ysiz - ytosiz, yt)
    for t_ in list(tile_cod) + list(tile_qcd):
        assert 0 <= t_ < _ntiles, f"tile override {t_} of {_ntiles} tiles"
    assert not tile_qcd or lossy, "tile_qcd needs the 9/7 transform"
    assert not (tile_cod and (coc or {})), \
        "tile COD with per-component COC: use one override axis"
    assert not (tile_cod and (poc or [])) and not (tile_qcd and (poc or [])), \
        "tile overrides with POC unsupported"
    assert not (tile_qcd and (qcc or {})), \
        "tile QCD with per-component QCC: use one override axis"
    # per-tile effective coding parameters (tile COD semantics)
    def t_prog(t):
        return (PROGRESSIONS[tile_cod[t]["progression"]]
                if t in tile_cod and "progression" in tile_cod[t] else prog)
    def t_layers(t):
        return tile_cod.get(t, {}).get("layers", layers)
    def t_cbsty(t):
        return tile_cod.get(t, {}).get("cbstyle", cbstyle)
    def t_lcb(t, c):
        ov = tile_cod.get(t, {})
        return ((ov["cbw"].bit_length() - 1 if "cbw" in ov else lcbw_c[c]),
                (ov["cbh"].bit_length() - 1 if "cbh" in ov else lcbh_c[c]))
    def t_pps(t, c):
        ov = tile_cod.get(t, {})
        if ov.get("precincts") is not None:
            return pp_list(ov["precincts"])
        return pps_c[c] if pps_c[c] is not None else pps
    def t_qinfo(t, c):
        if t in tile_qcd:
            q = tile_qcd[t]
            return quant_setup(levels, prec, q[0], q[1], q[2])
        return qinfo_c[c] if qinfo_c[c] is not None else qinfo
    qinfo = (quant_setup(levels, prec, quant[0], quant[1], quant[2])
             if lossy else None)

    if precincts is None:
        pps = [(15, 15)] * (levels + 1)
        scod_prec = 0
    else:
        pps = ([tuple(precincts)] * (levels + 1)
               if isinstance(precincts, tuple) else
               [tuple(p) for p in precincts])
        assert len(pps) == levels + 1
        for r, (px, py) in enumerate(pps):
            assert 0 <= px <= 15 and 0 <= py <= 15
            assert r == 0 or (px >= 1 and py >= 1), \
                "precinct exponent 0 only legal at resolution 0"
        scod_prec = 1

    def pp_list(p):
        ps = ([tuple(p)] * (levels + 1) if isinstance(p, tuple)
              else [tuple(x) for x in p])
        assert len(ps) == levels + 1
        for r, (px, py) in enumerate(ps):
            assert 0 <= px <= 15 and 0 <= py <= 15
            assert r == 0 or (px >= 1 and py >= 1)
        return ps

    coc = dict(coc or {})
    qcc = dict(qcc or {})
    for cc in list(coc) + list(qcc):
        assert 0 <= cc < ncomp, f"coc/qcc component {cc} out of range"
    lcbw_c = [(coc[c]["cbw"].bit_length() - 1
               if c in coc and "cbw" in coc[c] else cbw.bit_length() - 1)
              for c in range(ncomp)]
    lcbh_c = [(coc[c]["cbh"].bit_length() - 1
               if c in coc and "cbh" in coc[c] else cbh.bit_length() - 1)
              for c in range(ncomp)]
    pps_c = [pp_list(coc[c]["precincts"])
             if c in coc and coc[c].get("precincts") is not None
             else None for c in range(ncomp)]
    qinfo_c = [None] * ncomp
    for c, q in qcc.items():
        if lossy:
            assert isinstance(q, tuple), "lossy QCC needs (style, e0, mu0)"
            qinfo_c[c] = quant_setup(levels, prec, q[0], q[1], q[2])
        else:
            assert q == "auto", 'lossless QCC must be "auto"'

    subs = ([(1, 1)] * ncomp if subsampling is None
            else [tuple(s) for s in subsampling])
    assert len(subs) == ncomp
    for (xr, yr) in subs:
        assert 1 <= xr <= 255 and 1 <= yr <= 255
    assert not mct or len(set(subs[:3])) == 1, \
        "MCT requires equal component subsampling"
    # component plane dims (T.800 B.2: samples at factor multiples)
    cw_dims = [(_cdiv(xsiz, xr) - _cdiv(xosiz, xr),
                _cdiv(ysiz, yr) - _cdiv(yosiz, yr)) for (xr, yr) in subs]

    shift = 0 if signed else 1 << (prec - 1)
    planes = [img] if ncomp == 1 else list(img)
    assert len(planes) == ncomp
    for c in range(ncomp):
        assert len(planes[c]) == cw_dims[c][0] * cw_dims[c][1], \
            f"comp {c}: plane size != its subsampled dims"
    lcbw = cbw.bit_length() - 1
    lcbh = cbh.bit_length() - 1
    blist = band_list(levels)
    tiles, _, _ = tile_grid(xsiz, ysiz, xt, yt,
                            xosiz, yosiz, xtosiz, ytosiz)

    # phase 1: per tile/component DWT (+ quantization when lossy)
    # tile_bands[t][c][(r, name)] = (coef ints, band rect)
    tile_bands = []
    max_mag = [[0] * len(blist) for _ in range(ncomp)]
    max_mag_t = {}   # per-tile magnitudes for tile_qcd override tiles
    for t, (tx0, tx1, ty0, ty1) in enumerate(tiles):
        if t in tile_qcd:
            max_mag_t[t] = [[0] * len(blist) for _ in range(ncomp)]
        # per-component tile rects in component coordinates (B.3:
        # tcx = cdiv(tx, XRsiz)); equal to the tile rect when 1:1
        crects = [(_cdiv(tx0, xr), _cdiv(tx1, xr),
                   _cdiv(ty0, yr), _cdiv(ty1, yr)) for (xr, yr) in subs]
        comps = []
        for c in range(ncomp):
            pl = planes[c]
            (cx0, cx1, cy0, cy1) = crects[c]
            cwp = cw_dims[c][0]
            ox = _cdiv(xosiz, subs[c][0])
            oy = _cdiv(yosiz, subs[c][1])
            sub = [pl[(yy - oy) * cwp + (xx - ox)] - shift
                   for yy in range(cy0, cy1) for xx in range(cx0, cx1)]
            comps.append(sub)
        if mct:
            assert ncomp == 3
            n = len(comps[0])
            if lossy:
                for i in range(n):
                    comps[0][i], comps[1][i], comps[2][i] = ict_fwd(
                        float(comps[0][i]), float(comps[1][i]),
                        float(comps[2][i]))
            else:
                for i in range(n):
                    comps[0][i], comps[1][i], comps[2][i] = rct_fwd(
                        comps[0][i], comps[1][i], comps[2][i])
        per_comp = []
        for c in range(ncomp):
            cur = comps[c]
            (tcx0, tcx1, tcy0, tcy1) = crects[c]
            cx0, cx1, cy0, cy1 = tcx0, tcx1, tcy0, tcy1
            bands = {}
            for k in range(1, levels + 1):
                r = levels - k + 1
                ll, hl, lh, hh = fwd2d_g(cur, cx0, cx1, cy0, cy1,
                                         transform)
                bands[(r, "HL")] = (hl, band_rect(tcx0, tcx1, tcy0, tcy1,
                                                  levels, r, "HL"))
                bands[(r, "LH")] = (lh, band_rect(tcx0, tcx1, tcy0, tcy1,
                                                  levels, r, "LH"))
                bands[(r, "HH")] = (hh, band_rect(tcx0, tcx1, tcy0, tcy1,
                                                  levels, r, "HH"))
                cur = ll
                cx0, cx1 = _cdiv(cx0, 2), _cdiv(cx1, 2)
                cy0, cy1 = _cdiv(cy0, 2), _cdiv(cy1, 2)
            bands[(0, "LL")] = (cur, (cx0, cx1, cy0, cy1))
            # quantize (lossy) and track per-band max magnitude
            qi = t_qinfo(t, c) if lossy else None
            rshift = (rgn or {}).get(c, 0)
            for bi, (r, name, _, _) in enumerate(blist):
                coefs, brc = bands[(r, name)]
                if lossy:
                    delta = qi[bi][2]
                    for i, v in enumerate(coefs):
                        coefs[i] = (int(v / delta) if v >= 0
                                    else -int(-v / delta))
                if rshift:
                    # maxshift ROI: top-left quadrant of the band is
                    # the ROI; everything else must fit under 2^shift
                    bw_ = brc[1] - brc[0]
                    bh_ = brc[3] - brc[2]
                    for i, v in enumerate(coefs):
                        if (i % bw_) < (bw_ + 1) // 2 and \
                                (i // bw_) < (bh_ + 1) // 2:
                            coefs[i] = v << rshift if v >= 0 \
                                else -((-v) << rshift)
                        else:
                            assert abs(v) < (1 << rshift), \
                                "rgn shift too small for background"
                mm = max_mag_t[t][c] if t in tile_qcd else max_mag[c]
                for v in coefs:
                    if abs(v) > mm[bi]:
                        mm[bi] = abs(v)
            per_comp.append(bands)
        tile_bands.append(per_comp)

    # band Mb / QCD values, per component: QCD covers components
    # without a QCC override; "auto" lossless QCC components carry
    # their own exponents from their own magnitudes
    shared = [c for c in range(ncomp) if c not in qcc]
    rgn = dict(rgn or {})
    for cc, s_ in rgn.items():
        assert 0 <= cc < ncomp and 1 <= s_ <= 37, "rgn comp/shift"
    # comps signaling through the shared QCD must share one ROI shift
    # (the decoder adds SPrgn per component to the SAME eps values)
    shared_shifts = {rgn.get(c, 0) for c in shared}
    assert len(shared_shifts) <= 1, \
        "per-component RGN shifts need per-component QCC"
    rs_qcd = shared_shifts.pop() if shared_shifts else 0
    if lossy:
        mbs_c = [None] * ncomp
        for c in range(ncomp):
            qi = qinfo_c[c] if qinfo_c[c] is not None else qinfo
            mbs_c[c] = [q[3] + rgn.get(c, 0) for q in qi]
            for bi in range(len(blist)):
                assert max(1, max_mag[c][bi]).bit_length() <= mbs_c[c][bi], \
                    f"comp {c} band {bi}: magnitude overflows Mb"
        qcd_mbs = mbs_c[shared[0]] if shared else [q[3] for q in qinfo]
    else:
        qcd_mbs = [max(1, max(max_mag[c][bi] for c in shared)
                       if shared else 1).bit_length()
                   for bi in range(len(blist))]
        mbs_c = [([max(1, max_mag[c][bi]).bit_length()
                   for bi in range(len(blist))] if c in qcc else qcd_mbs)
                 for c in range(ncomp)]
    mbs = qcd_mbs
    assert not (tile_qcd and rgn), "tile QCD with RGN: use one override"
    mbs_t = {}   # per-tile Mb tables for tile_qcd override tiles
    for t_ in tile_qcd:
        qi_ = t_qinfo(t_, 0)
        row = [q[3] for q in qi_]
        for c_ in range(ncomp):
            for bi_ in range(len(blist)):
                assert max(1, max_mag_t[t_][c_][bi_]).bit_length() <= \
                    row[bi_], f"tile {t_}: magnitude overflows Mb"
        mbs_t[t_] = row

    out = bytearray()

    def m16(v):
        out.append((v >> 8) & 0xFF)
        out.append(v & 0xFF)
    m16(0xFF4F)                      # SOC
    m16(0xFF51)                      # SIZ
    m16(38 + 3 * ncomp)
    m16(0)                           # Rsiz
    out.extend(xsiz.to_bytes(4, "big"))
    out.extend(ysiz.to_bytes(4, "big"))
    out.extend(xosiz.to_bytes(4, "big"))
    out.extend(yosiz.to_bytes(4, "big"))
    out.extend(xt.to_bytes(4, "big"))    # XTsiz
    out.extend(yt.to_bytes(4, "big"))    # YTsiz
    out.extend(xtosiz.to_bytes(4, "big"))
    out.extend(ytosiz.to_bytes(4, "big"))
    m16(ncomp)                       # Csiz
    for c in range(ncomp):
        out.append((prec - 1) | (0x80 if signed else 0))
        out.append(subs[c][0])       # XRsiz
        out.append(subs[c][1])       # YRsiz
    m16(0xFF52)                      # COD
    m16(12 + (levels + 1 if scod_prec else 0))
    out.append(scod_prec | (2 if sop else 0) | (4 if eph else 0))
    out.append(prog)                 # progression order
    m16(layers)
    out.append(1 if mct else 0)      # MCT
    out.append(levels)
    out.append(lcbw - 2)             # xcb exponent - 2
    out.append(lcbh - 2)
    out.append(cbstyle)              # code-block style (Table A.19)
    # T.800 Table A.20: 0 = 9/7 irreversible, 1 = 5/3 reversible
    out.append(0 if lossy else 1)
    if scod_prec:
        for (px, py) in pps:
            out.append(px | (py << 4))
    for c in sorted(coc):            # COC: per-component coding style
        has_pp = pps_c[c] is not None
        m16(0xFF53)
        m16(2 + 1 + 6 + (levels + 1 if has_pp else 0))
        out.append(c)                # Ccoc (ncomp < 257)
        out.append(1 if has_pp else 0)   # Scoc
        out.append(levels)
        out.append(lcbw_c[c] - 2)
        out.append(lcbh_c[c] - 2)
        out.append(cbstyle)          # code-block style (Table A.19)
        out.append(0 if lossy else 1)
        if has_pp:
            for (px, py) in pps_c[c]:
                out.append(px | (py << 4))
    if poc:                          # POC: progression order changes
        m16(0xFF5F)
        m16(2 + 7 * len(poc))
        for (rs, cs, lye, re_, ce, pr) in poc:
            out.append(rs)
            out.append(cs)           # CSpoc (ncomp < 257)
            m16(lye)
            out.append(re_)
            out.append(ce)
            out.append(pr)
    for c in sorted(rgn):            # RGN: maxshift ROI (Annex H)
        m16(0xFF5E)
        m16(5)
        out.append(c)                # Crgn (ncomp < 257)
        out.append(0)                # Srgn 0 = implicit (maxshift)
        out.append(rgn[c])           # SPrgn
    m16(0xFF5C)                      # QCD
    if not lossy:
        m16(3 + len(mbs))
        out.append((GUARD << 5) | 0)     # style 0: no quantization
        for mb in mbs:
            eps = mb - GUARD + 1 - rs_qcd
            assert 0 <= eps < 32, eps
            out.append((eps & 0x1F) << 3)
    elif quant[0] == "derived":
        m16(3 + 2)
        out.append((GUARD << 5) | 1)
        e0, mu0 = qinfo[0][0], qinfo[0][1]   # LL carries the base pair
        m16((e0 << 11) | mu0)
    else:
        m16(3 + 2 * len(qinfo))
        out.append((GUARD << 5) | 2)
        for (eb, mu, _, _) in qinfo:
            m16((eb << 11) | mu)
    for c in sorted(qcc):            # QCC: per-component quantization
        m16(0xFF5D)
        if not lossy:
            m16(3 + 1 + len(mbs_c[c]))
            out.append(c)
            out.append((GUARD << 5) | 0)
            for mb in mbs_c[c]:
                eps = mb - GUARD + 1 - rgn.get(c, 0)
                assert 0 <= eps < 32, eps
                out.append((eps & 0x1F) << 3)
        elif qcc[c][0] == "derived":
            m16(3 + 1 + 2)
            out.append(c)
            out.append((GUARD << 5) | 1)
            e0, mu0 = qinfo_c[c][0][0], qinfo_c[c][0][1]
            m16((e0 << 11) | mu0)
        else:
            m16(3 + 1 + 2 * len(qinfo_c[c]))
            out.append(c)
            out.append((GUARD << 5) | 2)
            for (eb, mu, _, _) in qinfo_c[c]:
                m16((eb << 11) | mu)

    # phase 2: per tile — T1 every code-block once, then packets in
    # the progression order with per-layer contributions
    tile_emit = []   # (isot, tpsot, tnsot, hdr_chunk_or_None, body)
    for t, (tx0, tx1, ty0, ty1) in enumerate(tiles):
        # cb_state[(r, ip, c, bpos)] = (nx, ny, incl, zbp, cbs) where
        # cbs[i] = dict(data, npl, nps, ends, bounds, lblock, included)
        cb_state = {}
        pkts_meta = []
        crects = [(_cdiv(tx0, xr), _cdiv(tx1, xr),
                   _cdiv(ty0, yr), _cdiv(ty1, yr)) for (xr, yr) in subs]
        for r in range(levels + 1):
            bnames = ["LL"] if r == 0 else ["HL", "LH", "HH"]
            pshift = 0 if r == 0 else 1
            for c in range(ncomp):
                rr = res_rect(*crects[c], levels, r)
                ppx, ppy = t_pps(t, c)[r]
                precs = prec_grid(*rr, ppx, ppy)
                lcw_, lch_ = t_lcb(t, c)
                exw = min(lcw_, ppx - pshift)
                exh = min(lch_, ppy - pshift)
                for ip, (pi, pj) in enumerate(precs):
                    for bpos, name in enumerate(bnames):
                        coefs, brect = tile_bands[t][c][(r, name)]
                        pb = prec_band_rect(pi, pj, ppx, ppy, pshift,
                                            brect)
                        cbs, nx, ny = cb_list_g(pb, exw, exh)
                        bw_ = brect[1] - brect[0]
                        st = []
                        for (x0, x1_, y0, y1_) in cbs:
                            cw_, ch_ = x1_ - x0, y1_ - y0
                            sub = [coefs[(yy - brect[2]) * bw_ +
                                         (xx - brect[0])]
                                   for yy in range(y0, y1_)
                                   for xx in range(x0, x1_)]
                            data, npl, nps, ends, terms = t1_encode(
                                name, sub, cw_, ch_, t_cbsty(t))
                            st.append(dict(
                                data=data, npl=npl, nps=nps, ends=ends,
                                terms=terms,
                                bounds=layer_bounds(nps, t_layers(t)),
                                lblock=3, included=False))
                        cb_state[(r, ip, c, bpos)] =                             (nx, ny, TagTree(nx, ny), TagTree(nx, ny), st)
                    for l in range(t_layers(t)):
                        pkts_meta.append((l, r, c, ip, pi, pj,
                                          ppx, ppy, *subs[c]))
        ordered = order_packets(pkts_meta, t_prog(t), poc, levels,
                                tx0, ty0)

        packets = []
        packet_seq = 0
        for (l, r, c, ip, pi, pj, _, _, _, _) in ordered:
            bnames = ["LL"] if r == 0 else ["HL", "LH", "HH"]
            sop_b = bytearray()
            if sop:
                sop_b.extend(b"\xff\x91\x00\x04")
                sop_b.append((packet_seq >> 8) & 0xFF)
                sop_b.append(packet_seq & 0xFF)
            packet_seq = (packet_seq + 1) & 0xFFFF
            hw = HdrWriter()
            payloads = []
            nonempty = False
            for bpos in range(len(bnames)):
                _, _, _, _, st = cb_state[(r, ip, c, bpos)]
                for cb in st:
                    if cb["bounds"][l + 1] > cb["bounds"][l]:
                        nonempty = True
            hw.bit(1 if nonempty else 0)
            if nonempty:
                for bpos in range(len(bnames)):
                    nx, ny, incl, zbp, st = cb_state[(r, ip, c, bpos)]
                    if nx == 0 or ny == 0:
                        continue
                    bi = 0 if r == 0 else 1 + 3 * (r - 1) + bpos
                    mb = mbs_t[t][bi] if t in tile_qcd else mbs_c[c][bi]
                    bl = BitList(writer=hw)
                    # inclusion leaf values: first contributing layer
                    # (set once, before the first packet touches them)
                    if not getattr(incl, "_init", False):
                        vals = []
                        for cb in st:
                            fl = t_layers(t)
                            for g in range(t_layers(t)):
                                if cb["bounds"][g + 1] > cb["bounds"][g]:
                                    fl = g
                                    break
                            vals.append(fl)
                        incl.set_values(vals)
                        zbp.set_values([mb - cb["npl"] if cb["nps"] > 0
                                        else 0 for cb in st])
                        incl._init = True
                    for i, cb in enumerate(st):
                        gx, gy = i % nx, i // nx
                        contrib = cb["bounds"][l + 1] > cb["bounds"][l]
                        if cb["included"]:
                            hw.bit(1 if contrib else 0)
                        else:
                            got = incl.encode(bl, gx, gy, l + 1)
                            assert got == contrib
                        if not contrib:
                            continue
                        if not cb["included"]:
                            tt = 1
                            while not zbp.encode(bl, gx, gy, tt):
                                tt += 1
                            cb["included"] = True
                        np_new = cb["bounds"][l + 1] - cb["bounds"][l]
                        write_npasses(hw, np_new)
                        a, bnd = cb["bounds"][l], cb["bounds"][l + 1]

                        def cut(kk):
                            return cb["ends"][kk - 1] if kk > 0 else 0
                        # split the contribution at terminated-segment
                        # boundaries: one signaled length per piece,
                        # each with Lblock + floor(log2(its passes))
                        # bits (B.10.7.2); a single piece when the
                        # style terminates nothing inside it
                        pieces = []
                        pst = a
                        for kk in range(a, bnd):
                            if cb["terms"][kk] or kk == bnd - 1:
                                pieces.append((cut(kk + 1) - cut(pst),
                                               kk + 1 - pst))
                                pst = kk + 1
                        need = cb["lblock"]
                        for (ln_, np_) in pieces:
                            nb_ = np_.bit_length() - 1
                            while ln_ >= (1 << (need + nb_)):
                                need += 1
                        while cb["lblock"] < need:
                            hw.bit(1)
                            cb["lblock"] += 1
                        hw.bit(0)
                        for (ln_, np_) in pieces:
                            hw.bits(ln_, cb["lblock"] + (np_.bit_length() - 1))
                        payloads.append(cb["data"][cut(a):cut(bnd)])
            hdr_b = bytearray(hw.finish())
            if eph:
                hdr_b.extend(b"\xff\x92")
            pay_b = bytearray()
            for d in payloads:
                pay_b.extend(d)
            if packed:
                # header bits (+EPH) go to PPT/PPM; SOP markers stay
                # in the bitstream with the payload bytes
                packets.append((bytes(hdr_b), bytes(sop_b + pay_b)))
            else:
                packets.append(bytes(sop_b + hdr_b + pay_b))
        # split packets into tile-parts (contiguous, near-even)
        ntp = min(tile_parts, max(1, len(packets)))
        bounds = [round(i * len(packets) / ntp) for i in range(ntp + 1)]
        for k in range(ntp):
            chunk = packets[bounds[k]:bounds[k + 1]]
            if packed:
                hdr_chunk = b"".join(h for (h, _) in chunk)
                body = b"".join(b for (_, b) in chunk)
            else:
                hdr_chunk = None
                body = b"".join(chunk)
            tile_emit.append((t, k, ntp, hdr_chunk, body))

    if ppm:
        # one PPM segment (Zppm 0): per tile-part in codestream
        # order, Nppm then that tile-part's packed packet headers
        ppm_payload = b"".join(
            len(h).to_bytes(4, "big") + h for (_, _, _, h, _) in tile_emit)
        m16(0xFF60)
        m16(3 + len(ppm_payload))
        out.append(0)                # Zppm
        out.extend(ppm_payload)
    for (t, k, ntp, hdr_chunk, body) in tile_emit:
        tilehdr = b""
        if k == 0 and (t in tile_cod or t in tile_qcd):
            th = bytearray()
            if t in tile_cod:
                pp_t = (pp_list(tile_cod[t]["precincts"])
                        if tile_cod[t].get("precincts") is not None
                        else None)
                th.extend(b"\xff\x52")
                ln_ = 12 + (levels + 1 if pp_t is not None else 0)
                th.extend(ln_.to_bytes(2, "big"))
                th.append((1 if pp_t is not None else 0) |
                          (2 if sop else 0) | (4 if eph else 0))
                th.append(t_prog(t))
                th.extend(t_layers(t).to_bytes(2, "big"))
                th.append(1 if mct else 0)
                th.append(levels)
                lcw_, lch_ = t_lcb(t, 0)
                th.append(lcw_ - 2)
                th.append(lch_ - 2)
                th.append(t_cbsty(t))
                th.append(0 if lossy else 1)
                if pp_t is not None:
                    for (px_, py_) in pp_t:
                        th.append(px_ | (py_ << 4))
            if t in tile_qcd:
                qi_ = t_qinfo(t, 0)
                th.extend(b"\xff\x5c")
                if tile_qcd[t][0] == "derived":
                    th.extend((3 + 2).to_bytes(2, "big"))
                    th.append((GUARD << 5) | 1)
                    e0_, mu0_ = qi_[0][0], qi_[0][1]
                    th.extend(((e0_ << 11) | mu0_).to_bytes(2, "big"))
                else:
                    th.extend((3 + 2 * len(qi_)).to_bytes(2, "big"))
                    th.append((GUARD << 5) | 2)
                    for (eb_, mu_, _, _) in qi_:
                        th.extend(((eb_ << 11) | mu_).to_bytes(2, "big"))
            tilehdr = bytes(th)
        pptseg = b"" if not ppt else (
            b"\xff\x61" + (3 + len(hdr_chunk)).to_bytes(2, "big") +
            b"\x00" + hdr_chunk)  # Zppt 0
        psot = 12 + len(tilehdr) + len(pptseg) + 2 + len(body)
        m16(0xFF90)              # SOT
        m16(10)
        m16(t)                   # Isot
        out.extend(psot.to_bytes(4, "big"))
        out.append(k)            # TPsot
        out.append(ntp)          # TNsot
        out.extend(tilehdr)
        out.extend(pptseg)
        m16(0xFF93)              # SOD
        out.extend(body)
    m16(0xFFD9)                  # EOC
    return bytes(out)


# ----------------------------------------------------------- decoder

def decode(data):
    pos = 0

    def u16():
        nonlocal pos
        v = (data[pos] << 8) | data[pos + 1]
        pos += 2
        return v

    def u32():
        nonlocal pos
        v = int.from_bytes(data[pos:pos + 4], "big")
        pos += 4
        return v

    assert u16() == 0xFF4F, "missing SOC"
    w = h = prec = None
    signed = False
    ncomp = 1
    mct = False
    levels = lcbw = lcbh = None
    xt = yt = None
    prog = 0
    layers = 1
    lossy = False
    qstyle = guard = None
    qpairs = []      # signaled (eps, mu) pairs (one pair for derived)
    use_sop = use_eph = False
    pps = None
    tp_bodies = {}   # Isot -> {TPsot: body bytes}
    tp_counts = {}
    coc_over = {}    # comp -> (levels, lcbw, lcbh, lossy, pps)
    qcc_over = {}    # comp -> (qstyle, guard, pairs)
    rgn_over = {}    # comp -> maxshift ROI shift (SPrgn)
    poc_segs = []    # (RSpoc, CSpoc, LYEpoc, REpoc, CEpoc, Ppoc)
    ppm_chunks = []  # (Zppm, bytes) main-header packed headers
    tp_ppt = {}      # isot -> [(tpsot, zppt, bytes)] tile-part headers
    tp_order = []    # (isot, tpsot) in codestream order (PPM chunking)
    tile_over = {}   # isot -> tile-scope COD/COC/QCD/QCC overrides
    saw_eoc = False
    while not saw_eoc:
        mk = u16()
        if mk == 0xFF51:  # SIZ
            ln = u16()
            end = pos + ln - 2
            u16()
            xsiz = u32()
            ysiz = u32()
            xosiz = u32()
            yosiz = u32()
            assert 0 <= xosiz < xsiz and 0 <= yosiz < ysiz, "image offset"
            w = xsiz - xosiz
            h = ysiz - yosiz
            xt = u32()
            yt = u32()
            xtosiz = u32()
            ytosiz = u32()
            ncomp = u16()
            sss = []
            subs = []
            for c in range(ncomp):
                sss.append(data[pos])
                assert 1 <= data[pos + 1] <= 255 and \
                    1 <= data[pos + 2] <= 255, "bad XRsiz/YRsiz"
                subs.append((data[pos + 1], data[pos + 2]))
                pos += 3
            assert len(set(sss)) == 1, "mixed component precisions"
            prec = (sss[0] & 0x7F) + 1
            signed = (sss[0] & 0x80) != 0
            pos = end
        elif mk == 0xFF52:  # COD
            ln = u16()
            end = pos + ln - 2
            scod = data[pos]
            use_sop = (scod & 2) != 0
            use_eph = (scod & 4) != 0
            prog = data[pos + 1]
            assert prog <= 4, f"progression {prog}"
            layers = (data[pos + 2] << 8) | data[pos + 3]
            assert layers >= 1
            mct = data[pos + 4] == 1
            levels = data[pos + 5]
            lcbw = data[pos + 6] + 2
            lcbh = data[pos + 7] + 2
            cbsty = data[pos + 8]
            assert cbsty & ~0x3F == 0, f"code-block style {cbsty:#x}"
            lossy = data[pos + 9] == 0   # A.20: 0 = 9/7, 1 = 5/3
            if scod & 1:
                pps = [(data[pos + 10 + r] & 0x0F, data[pos + 10 + r] >> 4)
                       for r in range(levels + 1)]
            else:
                pps = [(15, 15)] * (levels + 1)
            pos = end
        elif mk == 0xFF53:  # COC (per-component coding style)
            ln = u16()
            end = pos + ln - 2
            cc = data[pos] if ncomp < 257 else ((data[pos] << 8)
                                                | data[pos + 1])
            pos += 1 if ncomp < 257 else 2
            scoc = data[pos]
            lv2 = data[pos + 1]
            w2 = data[pos + 2] + 2
            h2 = data[pos + 3] + 2
            cbsty2 = data[pos + 4]
            assert cbsty2 & ~0x3F == 0, f"code-block style {cbsty2:#x}"
            lossy2 = data[pos + 5] == 0
            if scoc & 1:
                pps2 = [(data[pos + 6 + r] & 0x0F, data[pos + 6 + r] >> 4)
                        for r in range(lv2 + 1)]
            else:
                pps2 = [(15, 15)] * (lv2 + 1)
            coc_over[cc] = (lv2, w2, h2, lossy2, pps2, cbsty2)
            pos = end
        elif mk == 0xFF5D:  # QCC (per-component quantization)
            ln = u16()
            end = pos + ln - 2
            cc = data[pos] if ncomp < 257 else ((data[pos] << 8)
                                                | data[pos + 1])
            pos += 1 if ncomp < 257 else 2
            sq = data[pos]
            qs2 = sq & 0x1F
            g2 = sq >> 5
            pos += 1
            prs = []
            if qs2 == 0:
                while pos < end:
                    prs.append((data[pos] >> 3, 0))
                    pos += 1
            else:
                assert qs2 in (1, 2), f"quant style {qs2}"
                while pos < end:
                    v = (data[pos] << 8) | data[pos + 1]
                    prs.append((v >> 11, v & 0x7FF))
                    pos += 2
            qcc_over[cc] = (qs2, g2, prs)
            pos = end
        elif mk == 0xFF5F:  # POC (progression order changes)
            ln = u16()
            end = pos + ln - 2
            step = 7 if ncomp < 257 else 9
            assert (ln - 2) % step == 0, "bad Lpoc"
            for _ in range((ln - 2) // step):
                rs = data[pos]
                cs = data[pos + 1]
                lye = (data[pos + 2] << 8) | data[pos + 3]
                re_ = data[pos + 4]
                ce = data[pos + 5]
                pr = data[pos + 6]
                assert pr <= 4, f"POC progression {pr}"
                poc_segs.append((rs, cs, lye, re_, ce, pr))
                pos += step
            pos = end
        elif mk == 0xFF60:  # PPM: packed packet headers, main header
            ln = u16()
            zppm = data[pos]
            ppm_chunks.append((zppm, bytes(data[pos + 1:pos + ln - 2])))
            pos = pos + ln - 2
        elif mk == 0xFF61:
            raise AssertionError("PPT marker outside a tile-part header")
        elif mk == 0xFF5E:  # RGN (maxshift ROI, Annex H)
            ln = u16()
            end = pos + ln - 2
            cc = data[pos] if ncomp < 257 else ((data[pos] << 8)
                                                | data[pos + 1])
            pos += 1 if ncomp < 257 else 2
            assert data[pos] == 0, "RGN style 0 (implicit) only"
            rgn_over[cc] = data[pos + 1]
            pos = end
        elif mk == 0xFF5C:  # QCD
            ln = u16()
            end = pos + ln - 2
            sq = data[pos]
            qstyle = sq & 0x1F
            guard = sq >> 5
            pos += 1
            if qstyle == 0:
                while pos < end:
                    qpairs.append((data[pos] >> 3, 0))
                    pos += 1
            else:
                assert qstyle in (1, 2), f"quant style {qstyle}"
                while pos < end:
                    v = (data[pos] << 8) | data[pos + 1]
                    qpairs.append((v >> 11, v & 0x7FF))
                    pos += 2
            pos = end
        elif mk == 0xFF90:  # SOT
            sot_at = pos - 2
            ln = u16()
            isot = u16()
            psot = u32()
            tpsot = data[pos]
            tnsot = data[pos + 1]
            pos += ln - 8
            while True:
                tmk = u16()
                if tmk == 0xFF93:  # SOD
                    break
                if tmk == 0xFF61:  # PPT
                    tln = u16()
                    zppt = data[pos]
                    tp_ppt.setdefault(isot, []).append(
                        (tpsot, zppt, bytes(data[pos + 1:pos + tln - 2])))
                    pos = pos + tln - 2
                elif tmk in (0xFF52, 0xFF53, 0xFF5C, 0xFF5D):
                    # tile-scope coding/quantization overrides: legal
                    # only in the tile's FIRST tile-part (A.6.1-2)
                    assert tpsot == 0, \
                        "tile coding markers outside tile-part 0"
                    tln = u16()
                    seg = bytes(data[pos:pos + tln - 2])
                    ov = tile_over.setdefault(
                        isot, dict(cod=None, cocs={}, qcd=None, qccs={}))
                    if tmk == 0xFF52:
                        ov["cod"] = _p_cod(seg)
                    elif tmk == 0xFF53:
                        cc, v = _p_coc(seg, ncomp)
                        ov["cocs"][cc] = v
                    elif tmk == 0xFF5C:
                        ov["qcd"] = _p_quant(seg, 0)
                    else:
                        cc = seg[0] if ncomp < 257 else ((seg[0] << 8)
                                                         | seg[1])
                        ov["qccs"][cc] = _p_quant(
                            seg, 1 if ncomp < 257 else 2)
                    pos = pos + tln - 2
                else:
                    raise AssertionError(
                        f"tile-part header marker {tmk:#06x} unsupported")
            end = sot_at + psot if psot else len(data) - 2
            tp_bodies.setdefault(isot, {})[tpsot] = bytes(data[pos:end])
            if tnsot:
                tp_counts[isot] = tnsot
            tp_order.append((isot, tpsot))
            pos = end
        elif mk == 0xFFD9:
            saw_eoc = True
        else:
            ln = u16()
            pos = pos + ln - 2

    # per-component, per-tile coding/quantization: main-header COD/QCD
    # overridden by COC/QCC and by tile-scope COD/COC/QCD/QCC from the
    # first tile-part header, with the T.800 A.6.1 precedence (tile
    # COC > tile COD > main COC > main COD; same shape for quant).
    # Decomposition levels and the transform must agree everywhere
    # (per-component or per-tile levels/transform are encoder exotica
    # this decoder refuses by name).
    kernel = "97" if lossy else "53"
    blist = band_list(levels)
    main_cod = dict(scod=0, prog=prog, layers=layers, mct=mct,
                    levels=levels, lcbw=lcbw, lcbh=lcbh, cbsty=cbsty,
                    lossy=lossy, pps=pps, use_sop=use_sop,
                    use_eph=use_eph)

    def derive(codd, qcdd, cocs, qccs):
        assert codd["levels"] == levels, \
            "per-tile decomposition levels unsupported"
        assert codd["lossy"] == lossy, "per-tile transform unsupported"
        for cc, (lv2, _, _, lossy2, _, _) in cocs.items():
            assert cc < ncomp, f"COC component {cc} out of range"
            assert lv2 == levels, \
                "per-component decomposition levels unsupported"
            assert lossy2 == lossy, "per-component transform unsupported"
        for cc in qccs:
            assert cc < ncomp, f"QCC component {cc} out of range"
        lcbw_c = [cocs[c][1] if c in cocs else codd["lcbw"]
                  for c in range(ncomp)]
        lcbh_c = [cocs[c][2] if c in cocs else codd["lcbh"]
                  for c in range(ncomp)]
        pps_c = [cocs[c][4] if c in cocs else codd["pps"]
                 for c in range(ncomp)]
        cbsty_c = [cocs[c][5] if c in cocs else codd["cbsty"]
                   for c in range(ncomp)]
        deltas_c = [None] * ncomp
        mbs_c = [None] * ncomp
        for c in range(ncomp):
            qs, g, prs = qccs.get(c, qcdd)
            assert (qs == 0) == (not lossy), \
                "quant style must match transform"
            if qs == 1:
                assert len(prs) == 1
                e0, mu0 = prs[0]
                prs = [(e0 - levels + nb, mu0) for (_, _, nb, _) in blist]
            else:
                assert len(prs) >= len(blist)
            if lossy:
                deltas_c[c] = [
                    2.0 ** ((prec + gain) - eb) * (1.0 + mu / 2048.0)
                    for (eb, mu), (_, _, _, gain) in zip(prs, blist)]
            mbs_c[c] = [g + eb - 1 + rgn_over.get(c, 0)
                        for (eb, _) in prs[:len(blist)]]
        return dict(prog=codd["prog"], layers=codd["layers"],
                    mct=codd["mct"],
                    use_sop=codd.get("use_sop", (codd["scod"] & 2) != 0),
                    use_eph=codd.get("use_eph", (codd["scod"] & 4) != 0),
                    lcbw_c=lcbw_c, lcbh_c=lcbh_c, pps_c=pps_c,
                    cbsty_c=cbsty_c, deltas_c=deltas_c, mbs_c=mbs_c)

    P0 = derive(main_cod, (qstyle, guard, qpairs), coc_over, qcc_over)
    tile_params = {}
    for t_, ov in tile_over.items():
        codd = ov["cod"] if ov["cod"] is not None else main_cod
        cocs = (dict(ov["cocs"]) if ov["cod"] is not None
                else {**coc_over, **ov["cocs"]})
        qcdd = ov["qcd"] if ov["qcd"] is not None else (qstyle, guard,
                                                        qpairs)
        qccs = (dict(ov["qccs"]) if ov["qcd"] is not None
                else {**qcc_over, **ov["qccs"]})
        tile_params[t_] = derive(codd, qcdd, cocs, qccs)

    tiles, _, _ = tile_grid(xsiz, ysiz, xt, yt,
                            xosiz, yosiz, xtosiz, ytosiz)
    assert set(tp_bodies.keys()) == set(range(len(tiles))), \
        "missing tile-parts"
    # packed packet headers: per tile, the PPT segments concatenate in
    # (TPsot, Zppt) order; a PPM stream splits into per-tile-part
    # chunks (4-byte Nppm prefixes) in codestream order (A.6.4/A.6.5)
    per_tile_hdr = {}
    for isot_, lst in tp_ppt.items():
        per_tile_hdr[isot_] = b"".join(
            seg for (_, _, seg) in sorted(lst, key=lambda e: (e[0], e[1])))
    if ppm_chunks:
        assert not per_tile_hdr, "PPM and PPT are mutually exclusive"
        stream = b"".join(seg for (_, seg) in sorted(ppm_chunks))
        at_ = 0
        for (isot_, _) in tp_order:
            n_ = int.from_bytes(stream[at_:at_ + 4], "big")
            per_tile_hdr[isot_] = per_tile_hdr.get(isot_, b"") + \
                stream[at_ + 4:at_ + 4 + n_]
            at_ += 4 + n_
        assert at_ == len(stream), "PPM stream length mismatch"
    if mct:
        assert ncomp == 3, "MCT needs 3 components"
        assert len(set(subs[:3])) == 1, \
            "MCT requires equal component subsampling"

    shift = 0 if signed else 1 << (prec - 1)
    lo_cl = -(1 << (prec - 1)) if signed else 0
    hi_cl = (1 << (prec - 1)) - 1 if signed else (1 << prec) - 1
    # each plane at ITS OWN subsampled dims (w x h when 1:1)
    cw_dims = [(_cdiv(xsiz, xr) - _cdiv(xosiz, xr),
                _cdiv(ysiz, yr) - _cdiv(yosiz, yr)) for (xr, yr) in subs]
    out_planes = [[0] * (cw * ch) for (cw, ch) in cw_dims]

    for t, (tx0, tx1, ty0, ty1) in enumerate(tiles):
        parts = tp_bodies[t]
        n_parts = tp_counts.get(t, max(parts.keys()) + 1)
        assert set(parts.keys()) == set(range(n_parts)), \
            f"tile {t}: have parts {sorted(parts)} of {n_parts}"
        body = b"".join(parts[k] for k in range(n_parts))
        P = tile_params.get(t, P0)
        prog = P["prog"]
        layers = P["layers"]
        mct = P["mct"]
        use_sop = P["use_sop"]
        use_eph = P["use_eph"]
        lcbw_c = P["lcbw_c"]
        lcbh_c = P["lcbh_c"]
        pps_c = P["pps_c"]
        cbsty_c = P["cbsty_c"]
        deltas_c = P["deltas_c"]
        mbs_c = P["mbs_c"]
        hsrc = per_tile_hdr.get(t, body)
        packed = t in per_tile_hdr
        br = HdrReader(hsrc, 0)
        body_at = 0
        crects = [(_cdiv(tx0, xr), _cdiv(tx1, xr),
                   _cdiv(ty0, yr), _cdiv(ty1, yr)) for (xr, yr) in subs]
        band_rects = {}
        band_coefs = {}
        for (r, name, _, _) in blist:
            for c in range(ncomp):
                rect = band_rect(*crects[c], levels, r, name)
                band_rects[(c, r, name)] = rect
                band_coefs[(c, r, name)] = \
                    [0] * ((rect[1] - rect[0]) * (rect[3] - rect[2]))
        # per-(r, precinct, comp, band) persistent packet state
        cb_state = {}
        pkts_meta = []
        for r in range(levels + 1):
            bnames = ["LL"] if r == 0 else ["HL", "LH", "HH"]
            pshift = 0 if r == 0 else 1
            for c in range(ncomp):
                rr = res_rect(*crects[c], levels, r)
                ppx, ppy = pps_c[c][r]
                precs = prec_grid(*rr, ppx, ppy)
                exw = min(lcbw_c[c], ppx - pshift)
                exh = min(lcbh_c[c], ppy - pshift)
                for ip, (pi, pj) in enumerate(precs):
                    for bpos, name in enumerate(bnames):
                        brect = band_rects[(c, r, name)]
                        pb = prec_band_rect(pi, pj, ppx, ppy, pshift,
                                            brect)
                        cbs, nx, ny = cb_list_g(pb, exw, exh)
                        st = [dict(rect=rect, included=False, lblock=3,
                                   npl=0, nps=0, segs=[])
                              for rect in cbs]
                        cb_state[(r, ip, c, bpos)] = \
                            (nx, ny, TagTree(nx, ny), TagTree(nx, ny), st)
                    for l in range(layers):
                        pkts_meta.append((l, r, c, ip, pi, pj,
                                          ppx, ppy, *subs[c]))
        ordered = order_packets(pkts_meta, prog, poc_segs, levels,
                                tx0, ty0)

        for (l, r, c, ip, _, _, _, _, _, _) in ordered:
            bnames = ["LL"] if r == 0 else ["HL", "LH", "HH"]
            if use_sop:
                if packed:
                    # SOP markers live in the bitstream with the
                    # payload bytes, not in the packed headers
                    assert body[body_at] == 0xFF and \
                        body[body_at + 1] == 0x91
                    body_at += 6
                else:
                    at0 = br.pos
                    assert body[at0] == 0xFF and body[at0 + 1] == 0x91
                    br = HdrReader(body, at0 + 6)
            nonempty = br.bit()
            contribs = []   # (cb dict, seg_len)
            if nonempty:
                for bpos, name in enumerate(bnames):
                    nx, ny, incl, zbp, st = cb_state[(r, ip, c, bpos)]
                    if nx == 0 or ny == 0:
                        continue
                    bi = 0 if r == 0 else 1 + 3 * (r - 1) + bpos
                    mb = mbs_c[c][bi]
                    bl = BitList(reader=br)
                    for i, cb in enumerate(st):
                        gx, gy = i % nx, i // nx
                        if cb["included"]:
                            contrib = br.bit() == 1
                        else:
                            contrib = incl.decode(bl, gx, gy, l + 1)
                        if not contrib:
                            continue
                        if not cb["included"]:
                            tt = 1
                            while not zbp.decode(bl, gx, gy, tt):
                                tt += 1
                            cb["npl"] = mb - (tt - 1)
                            assert cb["npl"] >= 0, "zero planes exceed Mb"
                            cb["included"] = True
                        np_new = read_npasses(br)
                        while br.bit():
                            cb["lblock"] += 1
                        a = cb["nps"]
                        # one signaled length per piece: the
                        # contribution split at structural terminated
                        # boundaries (mirrors the encoder exactly)
                        pst = a
                        for kk in range(a, a + np_new):
                            ends_seg = seg_end_after(cb["npl"],
                                                     cbsty_c[c], kk)
                            if ends_seg or kk == a + np_new - 1:
                                nbits = cb["lblock"] + \
                                    ((kk + 1 - pst).bit_length() - 1)
                                ln = br.bits(nbits)
                                contribs.append((cb, ln, ends_seg))
                                pst = kk + 1
                        cb["nps"] += np_new
            br.align()
            if use_eph:
                assert hsrc[br.pos] == 0xFF and \
                    hsrc[br.pos + 1] == 0x92, "missing EPH"
                br = HdrReader(hsrc, br.pos + 2)
            if not packed:
                body_at = br.pos
            for (cb, ln, ends_seg) in contribs:
                cb["segs"].append((body[body_at:body_at + ln], ends_seg))
                body_at += ln
            if not packed:
                br = HdrReader(body, body_at)

        # Tier-1 decode every code-block from its concatenated layer
        # segments (the MQ codeword is continuous across layers)
        for (r, ip, c, bpos), (nx, ny, _, _, st) in cb_state.items():
            name = (["LL"] if r == 0 else ["HL", "LH", "HH"])[bpos]
            brect = band_rects[(c, r, name)]
            bw_ = brect[1] - brect[0]
            for cb in st:
                x0, x1_, y0, y1_ = cb["rect"]
                cw_, ch_ = x1_ - x0, y1_ - y0
                segs, curseg = [], b""
                for (piece, ends_seg) in cb["segs"]:
                    curseg += piece
                    if ends_seg:
                        segs.append(curseg)
                        curseg = b""
                if curseg or not segs:
                    segs.append(curseg)   # final flush-terminated tail
                coefs = t1_decode(name, segs,
                                  cw_, ch_, cb["npl"], cb["nps"],
                                  cbsty_c[c])
                rs_ = rgn_over.get(c, 0)
                if rs_:
                    thr = 1 << rs_
                    coefs = [(v >> rs_ if v >= thr else
                              -((-v) >> rs_) if v <= -thr else v)
                             for v in coefs]
                plane = band_coefs[(c, r, name)]
                for yy in range(ch_):
                    for xx in range(cw_):
                        plane[(y0 + yy - brect[2]) * bw_ +
                              (x0 + xx - brect[0])] =                             coefs[yy * cw_ + xx]

        # dequantize, inverse DWT, inverse MCT, level shift - all in
        # component coordinates (the tile rect cdiv'd by the factors)
        comps = []
        for c in range(ncomp):
            if lossy:
                for bi, (r, name, _, _) in enumerate(blist):
                    d = deltas_c[c][bi]
                    plane = band_coefs[(c, r, name)]
                    for i, q in enumerate(plane):
                        plane[i] = ((q + 0.5) * d if q > 0 else
                                    (q - 0.5) * d if q < 0 else 0.0)
            cur = band_coefs[(c, 0, "LL")]
            for r in range(1, levels + 1):
                x0, x1_, y0, y1_ = res_rect(*crects[c], levels, r)
                cur = inv2d_g(cur, band_coefs[(c, r, "HL")],
                              band_coefs[(c, r, "LH")],
                              band_coefs[(c, r, "HH")],
                              x0, x1_, y0, y1_, kernel)
            comps.append(cur)
        if mct:
            n = ((crects[0][1] - crects[0][0])
                 * (crects[0][3] - crects[0][2]))
            if lossy:
                for i in range(n):
                    comps[0][i], comps[1][i], comps[2][i] = ict_inv(
                        comps[0][i], comps[1][i], comps[2][i])
            else:
                for i in range(n):
                    comps[0][i], comps[1][i], comps[2][i] = rct_inv(
                        comps[0][i], comps[1][i], comps[2][i])
        for c in range(ncomp):
            pl = out_planes[c]
            cur = comps[c]
            (cx0, cx1, cy0, cy1) = crects[c]
            ctw, cth = cx1 - cx0, cy1 - cy0
            cwp = cw_dims[c][0]
            ox = _cdiv(xosiz, subs[c][0])
            oy = _cdiv(yosiz, subs[c][1])
            for yy in range(cth):
                for xx in range(ctw):
                    v = cur[yy * ctw + xx]
                    if lossy:
                        v = math.floor(v + shift + 0.5)
                        v = lo_cl if v < lo_cl else hi_cl if v > hi_cl else v
                    else:
                        v = v + shift
                    pl[(cy0 + yy - oy) * cwp + (cx0 + xx - ox)] = v

    # planes come back at each component's OWN subsampled dims
    # (w x h when all factors are 1:1)
    if ncomp == 1:
        return w, h, prec, signed, out_planes[0]
    return w, h, prec, signed, out_planes


# ---------------------------------------------------------- self-test

def _selftest():
    import random
    rnd = random.Random(7)
    cases = [
        (8, 8, 8, 1, 4, 4),
        (16, 16, 8, 1, 8, 8),
        (13, 9, 8, 2, 8, 8),
        (32, 24, 12, 2, 16, 16),
        (21, 17, 16, 3, 8, 8),
        (64, 48, 8, 2, 32, 32),
        (5, 7, 8, 1, 4, 4),
    ]
    for (w, h, prec, levels, cbw, cbh) in cases:
        maxv = (1 << prec) - 1
        imgs = {
            "flat": [maxv // 3] * (w * h),
            "grad": [(x * 3 + y * 5) % (maxv + 1)
                     for y in range(h) for x in range(w)],
            "noise": [rnd.randrange(maxv + 1) for _ in range(w * h)],
        }
        for nm, img in imgs.items():
            enc = encode(img, w, h, prec, levels=levels, cbw=cbw, cbh=cbh)
            dw, dh, dp, _, dec = decode(enc)
            assert (dw, dh, dp) == (w, h, prec)
            assert dec == img, \
                f"{nm} {w}x{h}@{prec} L{levels} cb{cbw}: first diffs " + \
                str([(i, a, b) for i, (a, b)
                     in enumerate(zip(dec, img)) if a != b][:5])
        print(f"ok {w}x{h}@{prec} L{levels} cb{cbw}x{cbh}")
    # color: 3 components, with and without the reversible color
    # transform, odd sizes
    for (w, h, mct) in [(13, 9, False), (16, 16, True), (21, 11, True)]:
        planes = [[rnd.randrange(256) for _ in range(w * h)]
                  for _ in range(3)]
        enc = encode(planes, w, h, 8, levels=2, cbw=8, cbh=8,
                     ncomp=3, mct=mct)
        dw, dh, dp, _, dec = decode(enc)
        assert (dw, dh, dp) == (w, h, 8)
        assert dec == planes, f"color {w}x{h} mct={mct}"
        print(f"ok color {w}x{h} mct={mct}")

    # multi-tile lossless: exact roundtrip, odd tile origins included
    for (w, h, xt, yt, levels, cb) in [(45, 33, 19, 16, 2, 8),
                                       (64, 48, 32, 32, 3, 16),
                                       (30, 22, 7, 9, 1, 4)]:
        img = [(x * 3 + y * 7 + rnd.randrange(29)) % 256
               for y in range(h) for x in range(w)]
        enc = encode(img, w, h, 8, levels=levels, cbw=cb, cbh=cb,
                     xtsiz=xt, ytsiz=yt)
        dw, dh, dp, _, dec = decode(enc)
        assert dec == img, f"tiles {w}x{h} xt={xt} yt={yt}"
        print(f"ok tiles {w}x{h} xt={xt}x{yt} L{levels}")

    # precincts + SOP/EPH + multiple tile-parts, lossless
    img = [(x * 5 + y * 3 + rnd.randrange(17)) % 256
           for y in range(40) for x in range(56)]
    enc = encode(img, 56, 40, 8, levels=2, cbw=8, cbh=8,
                 precincts=(4, 4), sop=True, eph=True, tile_parts=3)
    _, _, _, _, dec = decode(enc)
    assert dec == img, "precincts"
    print("ok precincts 56x40 pp16 sop/eph tp3")
    enc = encode(img, 56, 40, 8, levels=3, cbw=16, cbh=16,
                 xtsiz=23, ytsiz=17, precincts=[(5, 5), (4, 4), (3, 4),
                                                (4, 3)], tile_parts=2)
    _, _, _, _, dec = decode(enc)
    assert dec == img, "tiles+precincts"
    print("ok tiles+per-res precincts 56x40")

    # lossy 9/7: bounded error, exact re-decode determinism
    for (w, h, style, e0, mu0, tol) in [
            (32, 24, "expounded", 8, 0, 2.5),
            (45, 33, "expounded", 6, 1024, 12.0),
            (29, 31, "derived", 9, 512, 4.0)]:
        img = [(128 + int(100 * math.sin(x * 0.3) * math.cos(y * 0.2)))
               for y in range(h) for x in range(w)]
        enc = encode(img, w, h, 8, levels=2, cbw=8, cbh=8,
                     transform="97", quant=(style, e0, mu0))
        _, _, _, _, dec = decode(enc)
        err = max(abs(a - b) for a, b in zip(dec, img))
        assert err <= tol, f"lossy {style} e0={e0}: max err {err}"
        dec2 = decode(enc)[4]
        assert dec2 == dec, "lossy decode must be deterministic"
        print(f"ok lossy {w}x{h} {style} e0={e0} mu={mu0} err<={err}")

    # lossy + tiles + precincts + ICT color
    w, h = 37, 26
    planes = [[min(255, max(0, 128 + int(80 * math.sin((x + 7 * c) * 0.25)
                                         * math.cos((y - 3 * c) * 0.2))))
               for y in range(h) for x in range(w)] for c in range(3)]
    enc = encode(planes, w, h, 8, levels=2, cbw=8, cbh=8, ncomp=3,
                 mct=True, transform="97", quant=("expounded", 8, 256),
                 xtsiz=20, ytsiz=14, precincts=(4, 4), tile_parts=2)
    _, _, _, _, dec = decode(enc)
    err = max(abs(a - b) for pa, pb in zip(dec, planes)
              for a, b in zip(pa, pb))
    assert err <= 4, f"lossy color: max err {err}"
    print(f"ok lossy color tiles+precincts err<={err}")

    # quality layers: pass-granular cuts, every progression order
    img = [(x * 7 + y * 11 + rnd.randrange(23)) % 256
           for y in range(31) for x in range(42)]
    for prog in ("LRCP", "RLCP", "RPCL", "PCRL", "CPRL"):
        for nl in (2, 5):
            enc = encode(img, 42, 31, 8, levels=2, cbw=8, cbh=8,
                         layers=nl, progression=prog)
            _, _, _, _, dec = decode(enc)
            assert dec == img, f"layers={nl} {prog}"
        print(f"ok {prog} layers 2/5 42x31")
    # layers x tiles x precincts x sop/eph x tile-parts, and lossy
    enc = encode(img, 42, 31, 8, levels=2, cbw=8, cbh=8, layers=3,
                 progression="RPCL", xtsiz=17, ytsiz=13,
                 precincts=(4, 4), sop=True, eph=True, tile_parts=2)
    _, _, _, _, dec = decode(enc)
    assert dec == img, "layers+tiles+precincts RPCL"
    print("ok RPCL layers3 tiles+precincts sop/eph tp2")
    enc = encode(img, 42, 31, 8, levels=2, cbw=8, cbh=8, layers=4,
                 progression="PCRL", transform="97",
                 quant=("expounded", 8, 0))
    _, _, _, _, dec = decode(enc)
    err = max(abs(a - b) for a, b in zip(dec, img))
    assert err <= 6, f"lossy layered: max err {err}"
    dec2 = decode(enc)[4]
    assert dec2 == dec
    print(f"ok PCRL layers4 lossy err<={err}")

    # 16-bit lossy (the DICOM .4.91 shape)
    w, h = 24, 18
    img = [(x * 151 + y * 911) % 4096 + 500 for y in range(h)
           for x in range(w)]
    enc = encode(img, w, h, 16, levels=2, cbw=8, cbh=8,
                 transform="97", quant=("expounded", 16, 0))
    _, _, _, _, dec = decode(enc)
    err = max(abs(a - b) for a, b in zip(dec, img))
    assert err <= 2, f"16-bit lossy: max err {err}"
    print(f"ok 16-bit lossy err<={err}")

    # COC/QCC per-component styles: lossless exact with per-comp
    # code-block sizes + precincts + "auto" exponents across tiles...
    w, h = 33, 25
    planes = [[(x * (3 + c) + y * (5 + c)) % 256
               for y in range(h) for x in range(w)] for c in range(3)]
    enc = encode(planes, w, h, 8, ncomp=3, mct=True, levels=2,
                 cbw=16, cbh=16, xtsiz=17, ytsiz=13,
                 coc={1: dict(cbw=8, cbh=8,
                              precincts=[(5, 5), (3, 3), (4, 4)]),
                      2: dict(cbw=4, cbh=8)},
                 qcc={2: "auto"})
    assert decode(enc)[4] == planes, "COC/QCC lossless"
    print("ok COC/QCC lossless per-comp cb+precincts+auto")
    # ...and lossy with per-component quantization through ICT
    enc = encode(planes, w, h, 8, ncomp=3, mct=True, levels=2,
                 cbw=8, cbh=8, transform="97",
                 quant=("expounded", 9, 256), progression="RPCL",
                 layers=2, coc={1: dict(cbw=4, cbh=4)},
                 qcc={1: ("expounded", 10, 512),
                      2: ("derived", 11, 128)})
    dec = decode(enc)[4]
    err = max(abs(a - b) for pa, pb in zip(dec, planes)
              for a, b in zip(pa, pb))
    assert err <= 2, f"COC/QCC lossy: max err {err}"
    print(f"ok COC/QCC lossy per-comp quant err<={err}")

    # component subsampling (B.2 lattices): 4:2:0-style planes at
    # their own dims, across tiles and a position progression
    w, h = 33, 25
    subs = [(1, 1), (2, 2), (2, 2)]
    dims = [(_cdiv(w, xr), _cdiv(h, yr)) for (xr, yr) in subs]
    planes = [[(x * (3 + c) + y * (5 + c)) % 256
               for y in range(dh) for x in range(dw)]
              for c, (dw, dh) in enumerate(dims)]
    enc = encode(planes, w, h, 8, ncomp=3, levels=2, cbw=8, cbh=8,
                 subsampling=subs, xtsiz=17, ytsiz=13,
                 progression="RPCL", layers=2)
    assert decode(enc)[4] == planes, "4:2:0 tiled RPCL"
    print("ok subsampling 4:2:0 tiled RPCL lossless")

    # code-block styles: bypass/reset/restart/causal/segsym in
    # realistic combinations, incl. layer cuts that land inside and
    # across terminated codeword segments
    w, h = 37, 29
    img = [(x * 3 + y * 7 + (x * y) % 41) % 256
           for y in range(h) for x in range(w)]
    img12 = [(x * 151 + y * 911) % 4096 for y in range(h)
             for x in range(w)]
    for sty in (0x01, 0x04, 0x02, 0x08, 0x20, 0x05, 0x2B):
        enc = encode(img, w, h, 8, levels=2, cbw=16, cbh=16,
                     cbstyle=sty)
        assert decode(enc)[4] == img, hex(sty)
    for sty in (0x01, 0x05, 0x2B):
        enc = encode(img12, w, h, 12, levels=2, cbw=8, cbh=8,
                     cbstyle=sty, layers=4, xtsiz=17, ytsiz=13,
                     precincts=(4, 4), progression="RPCL",
                     sop=True, eph=True, tile_parts=2)
        assert decode(enc)[4] == img12, hex(sty)
    print("ok code-block styles (bypass/reset/restart/causal/segsym)")

    # RGN maxshift ROI + POC progression order changes
    img = [(x * 3 + y * 7 + (x ^ y) % 13) % 256
           for y in range(25) for x in range(33)]
    enc = encode(img, 33, 25, 8, levels=2, cbw=8, cbh=8, rgn={0: 9})
    assert decode(enc)[4] == img, "rgn"
    enc = encode(img, 33, 25, 8, levels=2, cbw=8, cbh=8, layers=3,
                 xtsiz=17, ytsiz=13,
                 poc=[(0, 0, 2, 2, 1, "LRCP"), (0, 0, 3, 3, 1, "RPCL")])
    assert decode(enc)[4] == img, "poc"
    print("ok RGN maxshift + POC progression changes")

    # packed packet headers: PPT (tile-part) and PPM (main header)
    enc = encode(img, 33, 25, 8, levels=2, cbw=8, cbh=8, ppt=True,
                 layers=3, xtsiz=17, ytsiz=13, tile_parts=2,
                 sop=True, eph=True)
    assert decode(enc)[4] == img, "ppt"
    enc = encode(img, 33, 25, 8, levels=2, cbw=8, cbh=8, ppm=True,
                 layers=2, xtsiz=17, ytsiz=13, tile_parts=3,
                 progression="RPCL", precincts=(4, 4))
    assert decode(enc)[4] == img, "ppm"
    print("ok PPT/PPM packed packet headers")

    # tile-scope coding/quantization overrides (tile-part-0 COD/QCD)
    enc = encode(img, 33, 25, 8, levels=2, cbw=16, cbh=16,
                 xtsiz=17, ytsiz=13, layers=2,
                 tile_cod={1: dict(cbw=8, cbh=8,
                                   precincts=[(5, 5), (3, 3), (4, 4)],
                                   progression="RPCL", layers=3,
                                   cbstyle=0x28)})
    assert decode(enc)[4] == img, "tile_cod"
    enc = encode(img, 33, 25, 8, levels=2, cbw=8, cbh=8,
                 xtsiz=17, ytsiz=13, transform="97",
                 quant=("expounded", 9, 256),
                 tile_qcd={1: ("derived", 11, 128),
                           2: ("expounded", 10, 512)})
    dec = decode(enc)[4]
    err = max(abs(a - b) for a, b in zip(dec, img))
    assert err <= 2, f"tile_qcd: max err {err}"
    print("ok tile-scope COD/QCD overrides")
    print("selftest passed")


if __name__ == "__main__":
    _selftest()
