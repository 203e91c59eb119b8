#!/usr/bin/env python3
"""Independent pure-Python JPEG 2000 codec (ITU-T T.800) — constrained
lossless profile: single tile, single component, reversible 5/3 DWT,
no quantization, 1 layer, LRCP, default precincts, default code-block
style, MQ-coded EBCOT Tier-1. Encoder AND decoder, written from the
published spec; the self-test roundtrips both. `make_j2k_fixture.py`
uses the encoder for graft's committed fixtures; the Scala decoder
(`operators/Jpeg2k.scala`) is the product surface.
"""

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
    def __init__(self):
        self.out = bytearray([0])  # dummy first byte (never 0xFF)
        self.c = 0
        self.a = 0x8000
        self.ct = 12
        self.cx = init_states()

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
    def __init__(self, data):
        self.data = data
        self.bp = 0
        self.cx = init_states()
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

    def _at(self, x, y, arr):
        if x < 0 or y < 0 or x >= self.w or y >= self.h:
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


def t1_encode(band, coefs, w, h):
    """Encode one code-block; returns (data, nplanes, npasses).
    coefs: signed ints, row-major w x h."""
    mags = [abs(c) for c in coefs]
    maxmag = max(mags) if mags else 0
    nplanes = max(1, maxmag.bit_length()) if maxmag else 0
    if nplanes == 0:
        return b"", 0, 0
    blk = Block(band, w, h)
    blk_sgn = [1 if c < 0 else 0 for c in coefs]
    mq = MQEncoder()
    npasses = 0
    for p in range(nplanes - 1, -1, -1):
        bit = lambda i: (mags[i] >> p) & 1
        if p == nplanes - 1:
            passes = (2,)          # first plane: cleanup only
        else:
            passes = (0, 1, 2)
        for which in passes:
            if which == 0:  # significance propagation
                for y0 in range(0, h, 4):
                    for x in range(w):
                        for y in range(y0, min(y0 + 4, h)):
                            i = y * w + x
                            if blk.sig[i]:
                                continue
                            hh, vv, dd = blk.neighborhood(x, y)
                            if hh + vv + dd == 0:
                                continue
                            cxi = sig_ctx(band, hh, vv, dd)
                            b = bit(i)
                            mq.encode(cxi, b)
                            blk.vis[i] = 1
                            if b:
                                scx, sxor = blk.sign_ctx(x, y)
                                mq.encode(scx, blk_sgn[i] ^ sxor)
                                blk.sig[i] = 1
                                blk.sgn[i] = blk_sgn[i]
            elif which == 1:  # magnitude refinement
                for y0 in range(0, h, 4):
                    for x in range(w):
                        for y in range(y0, min(y0 + 4, h)):
                            i = y * w + x
                            if not blk.sig[i] or blk.vis[i]:
                                continue
                            mq.encode(blk.mag_ctx(x, y), bit(i))
                            blk.ref[i] = 1
            else:  # cleanup
                for y0 in range(0, h, 4):
                    for x in range(w):
                        y = y0
                        ylim = min(y0 + 4, h)
                        # run-length shortcut: full 4-strip, all four
                        # insignificant+unvisited with zero context
                        if ylim - y0 == 4 and all(
                            blk.sig[(y0 + k) * w + x] == 0 and
                            blk.vis[(y0 + k) * w + x] == 0 and
                            sum(blk.neighborhood(x, y0 + k)) == 0
                            for k in range(4)
                        ):
                            first = next(
                                (k for k in range(4) if bit((y0 + k) * w + x)),
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
                            cxi = sig_ctx(band, hh, vv, dd)
                            b = bit(i)
                            mq.encode(cxi, b)
                            if b:
                                scx, sxor = blk.sign_ctx(x, yy)
                                mq.encode(scx, blk_sgn[i] ^ sxor)
                                blk.sig[i] = 1
                                blk.sgn[i] = blk_sgn[i]
                # clear visited after finishing the plane
                for i in range(w * h):
                    blk.vis[i] = 0
            npasses += 1
    return mq.flush(), nplanes, npasses


def t1_decode(band, data, w, h, nplanes, npasses):
    """Decode one code-block; returns signed coefficients."""
    mags = [0] * (w * h)
    blk = Block(band, w, h)
    if npasses == 0 or nplanes == 0:
        return mags
    mq = MQDecoder(data)
    done = 0
    p = nplanes - 1
    which = 2  # first pass of first plane is cleanup
    while done < npasses:
        if which == 0:
            for y0 in range(0, h, 4):
                for x in range(w):
                    for y in range(y0, min(y0 + 4, h)):
                        i = y * w + x
                        if blk.sig[i]:
                            continue
                        hh, vv, dd = blk.neighborhood(x, y)
                        if hh + vv + dd == 0:
                            continue
                        cxi = sig_ctx(band, hh, vv, dd)
                        blk.vis[i] = 1
                        if mq.decode(cxi):
                            scx, sxor = blk.sign_ctx(x, y)
                            s = mq.decode(scx) ^ sxor
                            blk.sig[i] = 1
                            blk.sgn[i] = s
                            mags[i] |= 1 << p
        elif which == 1:
            for y0 in range(0, h, 4):
                for x in range(w):
                    for y in range(y0, min(y0 + 4, h)):
                        i = y * w + x
                        if not blk.sig[i] or blk.vis[i]:
                            continue
                        if mq.decode(blk.mag_ctx(x, y)):
                            mags[i] |= 1 << p
                        blk.ref[i] = 1
        else:
            for y0 in range(0, h, 4):
                for x in range(w):
                    y = y0
                    ylim = min(y0 + 4, h)
                    if ylim - y0 == 4 and all(
                        blk.sig[(y0 + k) * w + x] == 0 and
                        blk.vis[(y0 + k) * w + x] == 0 and
                        sum(blk.neighborhood(x, y0 + k)) == 0
                        for k in range(4)
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
                        cxi = sig_ctx(band, hh, vv, dd)
                        if mq.decode(cxi):
                            scx, sxor = blk.sign_ctx(x, yy)
                            s = mq.decode(scx) ^ sxor
                            blk.sig[i] = 1
                            blk.sgn[i] = s
                            mags[i] |= 1 << p
            for i in range(w * h):
                blk.vis[i] = 0
        done += 1
        if which == 2:
            p -= 1
            which = 0
        else:
            which += 1
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


# ----------------------------------------------------------- encoder

def rct_fwd(r, g, b):
    y = (r + 2 * g + b) >> 2
    return y, b - g, r - g


def rct_inv(y, u, v):
    g = y - ((u + v) >> 2)
    return v + g, g, u + g


def encode(img, w, h, prec, signed=False, levels=2, cbw=32, cbh=32,
           ncomp=1, mct=False):
    """img: single plane (ncomp=1) or list of ncomp planes. mct=True
    applies the reversible color transform (requires ncomp=3)."""
    assert 1 <= levels <= 6 and 4 <= cbw <= 64 and 4 <= cbh <= 64
    shift = 0 if signed else 1 << (prec - 1)
    planes = [img] if ncomp == 1 else list(img)
    assert len(planes) == ncomp
    comps = [[v - shift for v in pl] for pl in planes]
    if mct:
        assert ncomp == 3
        n = w * h
        yy = [0] * n
        uu = [0] * n
        vv = [0] * n
        for i in range(n):
            yy[i], uu[i], vv[i] = rct_fwd(comps[0][i], comps[1][i], comps[2][i])
        comps = [yy, uu, vv]

    res = resolutions(w, h, levels)
    # per component: forward DWT -> band data per resolution
    comp_band_data = []
    for cur in comps:
        cw, ch = w, h
        per_level = []
        for _ in range(levels):
            ll, hl, lh, hh, lo_w, lo_h, hi_w, hi_h = fwd53_2d(cur, cw, ch)
            per_level.append({"HL": (hl, hi_w, lo_h), "LH": (lh, lo_w, hi_h),
                              "HH": (hh, hi_w, hi_h)})
            cur, cw, ch = ll, lo_w, lo_h
        bd = [{"LL": (cur, cw, ch)}]
        for l in range(levels - 1, -1, -1):
            bd.append(per_level[l])
        comp_band_data.append(bd)

    # Tier-1 every code-block; shared QCD -> Mb = max over components
    # coded[r][c] = [(name, bw, bh, nx, ny, [(data,npl,nps)...])]
    coded = []
    band_mb = []
    for r, bands in enumerate(res):
        per_comp = []
        mx_band = [1] * len(bands)
        for c in range(ncomp):
            rb = []
            for bi, (name, bw_, bh_) in enumerate(bands):
                coefs, bw2, bh2 = comp_band_data[c][r][name]
                assert (bw2, bh2) == (bw_, bh_)
                cbs, nx, ny = cb_grid(bw_, bh_, cbw, cbh)
                lst = []
                for (x0, y0, cw_, ch_) in cbs:
                    sub = [coefs[(y0 + yy2) * bw_ + x0 + xx]
                           for yy2 in range(ch_) for xx in range(cw_)]
                    data, npl, nps = t1_encode(name, sub, cw_, ch_)
                    lst.append((data, npl, nps))
                    mx_band[bi] = max(mx_band[bi], npl)
                rb.append((name, bw_, bh_, nx, ny, lst))
            per_comp.append(rb)
        coded.append(per_comp)
        band_mb.extend(mx_band)

    out = bytearray()

    def m16(v):
        out.append((v >> 8) & 0xFF)
        out.append(v & 0xFF)
    m16(0xFF4F)                      # SOC
    m16(0xFF51)                      # SIZ
    m16(38 + 3 * ncomp)
    m16(0)                           # Rsiz
    out.extend(w.to_bytes(4, "big"))
    out.extend(h.to_bytes(4, "big"))
    out.extend((0).to_bytes(4, "big"))  # XOsiz
    out.extend((0).to_bytes(4, "big"))  # YOsiz
    out.extend(w.to_bytes(4, "big"))    # XTsiz
    out.extend(h.to_bytes(4, "big"))    # YTsiz
    out.extend((0).to_bytes(4, "big"))  # XTOsiz
    out.extend((0).to_bytes(4, "big"))  # YTOsiz
    m16(ncomp)                       # Csiz
    for _ in range(ncomp):
        out.append((prec - 1) | (0x80 if signed else 0))
        out.append(1)                # XRsiz
        out.append(1)                # YRsiz
    m16(0xFF52)                      # COD
    m16(12)
    out.append(0)                    # Scod: default precincts, no SOP/EPH
    out.append(0)                    # progression LRCP
    m16(1)                           # 1 layer
    out.append(1 if mct else 0)      # MCT
    out.append(levels)
    out.append((cbw.bit_length() - 1) - 2)  # xcb exponent - 2
    out.append((cbh.bit_length() - 1) - 2)
    out.append(0)                    # code-block style: all defaults
    out.append(0)                    # transform: 5/3 reversible
    m16(0xFF5C)                      # QCD
    m16(3 + len(band_mb))
    out.append((GUARD << 5) | 0)     # Sqcd: reversible, guard bits
    for mb in band_mb:
        eps = mb - GUARD + 1
        assert 0 <= eps < 32, eps
        out.append((eps & 0x1F) << 3)

    # tile part: LRCP with one layer -> for each res, one packet per comp
    body = bytearray()
    for r in range(len(res)):
        for c in range(ncomp):
            rb = coded[r][c]
            hw = HdrWriter()
            nonempty = any(npl > 0 for (_, _, _, _, _, lst) in rb
                           for (_, npl, _) in lst)
            hw.bit(1 if nonempty else 0)
            cb_payloads = []
            if nonempty:
                for bi, (name, bw_, bh_, nx, ny, lst) in enumerate(rb):
                    if nx == 0 or ny == 0:
                        continue
                    incl = TagTree(nx, ny)
                    zbp = TagTree(nx, ny)
                    idx = 0 if r == 0 else 1 + 3 * (r - 1) + bi
                    mb = band_mb[idx]
                    incl.set_values(
                        [0 if npl > 0 else 1 for (_, npl, _) in lst])
                    zbp.set_values([mb - npl if npl > 0 else 0
                                    for (_, npl, _) in lst])
                    bl = BitList(writer=hw)
                    for i, (data, npl, nps) in enumerate(lst):
                        gx, gy = i % nx, i // nx
                        included = incl.encode(bl, gx, gy, 1)
                        if not included:
                            continue
                        t = 1
                        while not zbp.encode(bl, gx, gy, t):
                            t += 1
                        write_npasses(hw, nps)
                        lblock = 3
                        nbits = lblock + (nps.bit_length() - 1)
                        while len(data) >= (1 << nbits):
                            hw.bit(1)
                            lblock += 1
                            nbits += 1
                        hw.bit(0)
                        hw.bits(len(data), nbits)
                        cb_payloads.append(data)
            body.extend(hw.finish())
            for d in cb_payloads:
                body.extend(d)

    psot = 12 + 2 + len(body)        # SOT(12) + SOD(2) + body
    m16(0xFF90)                      # SOT
    m16(10)
    m16(0)                           # Isot
    out.extend(psot.to_bytes(4, "big"))
    out.append(0)                    # TPsot
    out.append(1)                    # TNsot
    m16(0xFF93)                      # SOD
    out.extend(body)
    m16(0xFFD9)                      # EOC
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
    levels = cbw = cbh = None
    eps_list = []
    body_at = None
    while body_at is None:
        mk = u16()
        if mk == 0xFF51:  # SIZ
            ln = u16()
            end = pos + ln - 2
            u16()
            w = u32()
            h = u32()
            assert u32() == 0 and u32() == 0, "image offset unsupported"
            assert u32() == w and u32() == h, "tiling unsupported"
            u32(); u32()
            ncomp = u16()
            sss = []
            for c in range(ncomp):
                sss.append(data[pos])
                assert data[pos + 1] == 1 and data[pos + 2] == 1, \
                    "no subsampling"
                pos += 3
            assert len(set(sss)) == 1, "mixed component precisions"
            prec = (sss[0] & 0x7F) + 1
            signed = (sss[0] & 0x80) != 0
            pos = end
        elif mk == 0xFF52:  # COD
            ln = u16()
            end = pos + ln - 2
            assert data[pos] == 0, "precincts/SOP/EPH unsupported"
            assert data[pos + 1] == 0, "LRCP only"
            assert ((data[pos + 2] << 8) | data[pos + 3]) == 1, "1 layer only"
            mct = data[pos + 4] == 1
            levels = data[pos + 5]
            cbw = 1 << (data[pos + 6] + 2)
            cbh = 1 << (data[pos + 7] + 2)
            assert data[pos + 8] == 0, "code-block style 0 only"
            assert data[pos + 9] == 0, "5/3 reversible only"
            pos = end
        elif mk == 0xFF5C:  # QCD
            ln = u16()
            end = pos + ln - 2
            sq = data[pos]
            assert (sq & 0x1F) == 0, "reversible (no quantization) only"
            guard = sq >> 5
            for i in range(pos + 1, end):
                eps_list.append((data[i] >> 3) + guard - 1)  # Mb per band
            pos = end
        elif mk == 0xFF90:  # SOT
            ln = u16()
            pos += ln - 2
        elif mk == 0xFF93:  # SOD
            body_at = pos
        else:
            ln = u16()
            pos = pos + ln - 2

    if mct:
        assert ncomp == 3, "MCT needs 3 components"
    res = resolutions(w, h, levels)
    br = HdrReader(data, body_at)
    band_coefs = {}   # (comp, r, name) -> plane
    qcd_i = 0
    for r, bands in enumerate(res):
        for c in range(ncomp):
            nonempty = br.bit()
            todo = []
            if nonempty:
                bl = BitList(reader=br)
                for bi, (name, bw_, bh_) in enumerate(bands):
                    mb = eps_list[qcd_i + bi]
                    cbs, nx, ny = cb_grid(bw_, bh_, cbw, cbh)
                    if nx == 0:
                        continue
                    incl = TagTree(nx, ny)
                    zbp = TagTree(nx, ny)
                    for i, (x0, y0, cw_, ch_) in enumerate(cbs):
                        gx, gy = i % nx, i // nx
                        if not incl.decode(bl, gx, gy, 1):
                            todo.append((name, bw_, bh_, x0, y0, cw_, ch_, 0, 0, 0))
                            continue
                        t = 1
                        while not zbp.decode(bl, gx, gy, t):
                            t += 1
                        z = t - 1
                        npl = mb - z
                        nps = read_npasses(br)
                        lblock = 3
                        while br.bit():
                            lblock += 1
                        nbits = lblock + (nps.bit_length() - 1)
                        ln = br.bits(nbits)
                        todo.append((name, bw_, bh_, x0, y0, cw_, ch_, npl, nps, ln))
            else:
                for (name, bw_, bh_) in bands:
                    cbs, nx, ny = cb_grid(bw_, bh_, cbw, cbh)
                    for (x0, y0, cw_, ch_) in cbs:
                        todo.append((name, bw_, bh_, x0, y0, cw_, ch_, 0, 0, 0))
            br.align()
            at = br.pos
            for (name, bw_, bh_, x0, y0, cw_, ch_, npl, nps, ln) in todo:
                key = (c, r, name)
                if key not in band_coefs:
                    band_coefs[key] = [0] * (bw_ * bh_)
                coefs = t1_decode(name, data[at:at + ln], cw_, ch_, npl, nps)
                for yy in range(ch_):
                    for xx in range(cw_):
                        band_coefs[key][(y0 + yy) * bw_ + x0 + xx] = \
                            coefs[yy * cw_ + xx]
                at += ln
            br = HdrReader(data, at)
        qcd_i += len(bands)

    # inverse DWT per component
    shift = 0 if signed else 1 << (prec - 1)
    comps = []
    for c in range(ncomp):
        cur = band_coefs.get((c, 0, "LL"), [0] * (res[0][0][1] * res[0][0][2]))
        cw = res[0][0][1]
        ch = res[0][0][2]
        for r in range(1, levels + 1):
            hl_w = res[r][0][1]
            lh_h = res[r][1][2]
            def b(name, bw_, bh_):
                return band_coefs.get((c, r, name), [0] * (bw_ * bh_))
            cur = inv53_2d(cur, b("HL", hl_w, ch), b("LH", cw, lh_h),
                           b("HH", hl_w, lh_h), cw, ch, hl_w, lh_h)
            cw = cw + hl_w
            ch = ch + lh_h
        assert (cw, ch) == (w, h)
        comps.append(cur)
    if mct:
        n = w * h
        for i in range(n):
            r_, g_, b_ = rct_inv(comps[0][i], comps[1][i], comps[2][i])
            comps[0][i], comps[1][i], comps[2][i] = r_, g_, b_
    planes = [[v + shift for v in cur] for cur in comps]
    if ncomp == 1:
        return w, h, prec, signed, planes[0]
    return w, h, prec, signed, planes


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
    print("selftest passed")


if __name__ == "__main__":
    _selftest()
