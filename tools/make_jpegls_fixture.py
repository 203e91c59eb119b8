#!/usr/bin/env python3
"""Independent pure-Python JPEG-LS (ITU-T T.87) encoder — ground truth
for graft's Scala decoder (`operators/JpegLs.scala`, `JpegLsSpec`).

Implements the spec from scratch: MED prediction, gradient-context
modeling with bias correction, limited-length Golomb coding, run mode,
FF bit stuffing. No third-party codec involved, so agreement between
this writer and the Scala reader is two independent readings of the
published standard.

Writes to src/test/resources/fixtures/jls/:
  g8.jls / g8.raw       8-bit 29x17 textured gradient (regular mode heavy)
  g16.jls / g16.raw     16-bit 13x11 wide-range values (big-endian u16 raw)
  runs8.jls / runs8.raw 8-bit 32x9 flat regions (run mode + EOL runs)
  near8.jls / near8.raw NEAR=2 8-bit 21x13; raw holds the encoder's
                        reconstruction (what a conforming decoder must emit)
"""
import os

J = [0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
     4, 4, 5, 5, 6, 6, 7, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def ceil_log2(v):
    k = 0
    while (1 << k) < v:
        k += 1
    return k


def default_thresholds(maxval, near):
    def clamp(i, lo):
        return lo if (i > maxval or i < lo) else i
    if maxval >= 128:
        factor = (min(maxval, 4095) + 128) // 256
        t1 = clamp(factor + 2 + 3 * near, near + 1)
        t2 = clamp(4 * factor + 3 + 5 * near, t1)
        t3 = clamp(17 * factor + 4 + 7 * near, t2)
    else:
        factor = 256 // (maxval + 1)
        t1 = clamp(max(2, 3 // factor + 3 * near), near + 1)
        t2 = clamp(max(3, 7 // factor + 5 * near), t1)
        t3 = clamp(max(4, 21 // factor + 7 * near), t2)
    return t1, t2, t3


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.cur = 0
        self.nb = 0
        self.cap = 8

    def bit(self, b):
        self.cur = (self.cur << 1) | b
        self.nb += 1
        if self.nb == self.cap:
            self.bytes.append(self.cur)
            self.cap = 7 if self.cur == 0xFF else 8
            self.cur = 0
            self.nb = 0

    def bits(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bit((v >> i) & 1)

    def finish(self):
        while self.nb != 0:
            self.bit(0)
        return bytes(self.bytes)


class Encoder:
    def __init__(self, w, h, prec, near=0):
        self.w, self.h, self.prec, self.near = w, h, prec, near
        self.maxval = (1 << prec) - 1
        self.t1, self.t2, self.t3 = default_thresholds(self.maxval, near)
        self.range = (self.maxval + 2 * near) // (2 * near + 1) + 1
        self.qbpp = ceil_log2(self.range)
        bpp = max(2, ceil_log2(self.maxval + 1))
        self.limit = 2 * (bpp + max(8, bpp))
        self.reset = 64
        init_a = max(2, (self.range + 32) >> 6)
        self.A = [init_a] * 367
        self.B = [0] * 365
        self.C = [0] * 365
        self.N = [1] * 367
        self.Nn = [0, 0]
        self.run_index = 0

    # -- modeling helpers --
    def quantize(self, d):
        if d <= -self.t3:
            return -4
        if d <= -self.t2:
            return -3
        if d <= -self.t1:
            return -2
        if d < -self.near:
            return -1
        if d <= self.near:
            return 0
        if d < self.t1:
            return 1
        if d < self.t2:
            return 2
        if d < self.t3:
            return 3
        return 4

    def clamp_rx(self, rx):
        if rx < -self.near:
            rx += self.range * (2 * self.near + 1)
        elif rx > self.maxval + self.near:
            rx -= self.range * (2 * self.near + 1)
        return min(max(rx, 0), self.maxval)

    def golomb_k(self, q):
        k = 0
        while (self.N[q] << k) < self.A[q]:
            k += 1
        return k

    def put_mapped(self, bw, m, k, limit):
        high = m >> k
        if high < limit - self.qbpp - 1:
            bw.bits(1, high + 1)
            if k:
                bw.bits(m & ((1 << k) - 1), k)
        else:
            bw.bits(1, limit - self.qbpp)
            bw.bits(m - 1, self.qbpp)

    def update_regular(self, q, err):
        self.B[q] += err * (2 * self.near + 1)
        self.A[q] += abs(err)
        if self.N[q] == self.reset:
            self.A[q] >>= 1
            self.B[q] = self.B[q] >> 1 if self.B[q] >= 0 \
                else -((1 - self.B[q]) >> 1)
            self.N[q] >>= 1
        self.N[q] += 1
        if self.B[q] <= -self.N[q]:
            self.B[q] += self.N[q]
            if self.C[q] > -128:
                self.C[q] -= 1
            if self.B[q] <= -self.N[q]:
                self.B[q] = -self.N[q] + 1
        elif self.B[q] > 0:
            self.B[q] -= self.N[q]
            if self.C[q] < 127:
                self.C[q] += 1
            if self.B[q] > 0:
                self.B[q] = 0

    # -- scan --
    def encode_scan(self, img):
        w, h = self.w, self.h
        bw = BitWriter()
        prev = [0] * w
        cur = [0] * w
        rc_first = 0
        recon = []
        for row in range(h):
            ra_first = prev[0] if row > 0 else 0
            col = 0
            while col < w:
                ra = cur[col - 1] if col > 0 else ra_first
                rb = prev[col] if row > 0 else 0
                rc = (prev[col - 1] if row > 0 else 0) if col > 0 else rc_first
                rd = (prev[col + 1] if col + 1 < w else rb) if row > 0 else 0
                q1 = self.quantize(rd - rb)
                q2 = self.quantize(rb - rc)
                q3 = self.quantize(rc - ra)
                if q1 == 0 and q2 == 0 and q3 == 0:
                    col = self.encode_run(bw, img, cur, prev, col, ra, row)
                else:
                    q = 81 * q1 + 9 * q2 + q3
                    sign = -1 if q < 0 else 1
                    q = abs(q)
                    px = self.med(ra, rb, rc) + sign * self.C[q]
                    px = min(max(px, 0), self.maxval)
                    ix = img[row * w + col]
                    err = (ix - px) * sign
                    if self.near > 0:
                        err = (self.near + err) // (2 * self.near + 1) \
                            if err > 0 \
                            else -((self.near - err) // (2 * self.near + 1))
                    cur[col] = self.clamp_rx(
                        px + sign * err * (2 * self.near + 1))
                    if err < 0:
                        err += self.range
                    if err >= (self.range + 1) // 2:
                        err -= self.range
                    k = self.golomb_k(q)
                    if self.near == 0 and k == 0 \
                            and 2 * self.B[q] <= -self.N[q]:
                        mer = 2 * err + 1 if err >= 0 else -2 * (err + 1)
                    else:
                        mer = 2 * err if err >= 0 else -2 * err - 1
                    self.put_mapped(bw, mer, k, self.limit)
                    self.update_regular(q, err)
                    col += 1
            prev, cur = cur, prev
            for v in prev:  # prev now holds this row's reconstruction
                recon.append(v)
            rc_first = ra_first
        return bw.finish(), recon

    @staticmethod
    def med(ra, rb, rc):
        if rc >= max(ra, rb):
            return min(ra, rb)
        if rc <= min(ra, rb):
            return max(ra, rb)
        return ra + rb - rc

    def encode_run(self, bw, img, cur, prev, col, ra, row):
        w = self.w
        run_cnt = 0
        while col < w and abs(img[row * w + col] - ra) <= self.near:
            cur[col] = ra
            run_cnt += 1
            col += 1
        while run_cnt >= (1 << J[self.run_index]):
            bw.bit(1)
            run_cnt -= 1 << J[self.run_index]
            if self.run_index < 31:
                self.run_index += 1
        if col == w:
            if run_cnt > 0:
                bw.bit(1)
            return col
        bw.bit(0)
        if J[self.run_index]:
            bw.bits(run_cnt, J[self.run_index])
        rb = prev[col] if row > 0 else 0
        ritype = 1 if abs(ra - rb) <= self.near else 0
        px = ra if ritype == 1 else rb
        sign = -1 if (ritype == 0 and ra > rb) else 1
        ix = img[row * w + col]
        err = (ix - px) * sign
        if self.near > 0:
            err = (self.near + err) // (2 * self.near + 1) if err > 0 \
                else -((self.near - err) // (2 * self.near + 1))
        cur[col] = self.clamp_rx(px + sign * err * (2 * self.near + 1))
        if err < 0:
            err += self.range
        if err >= (self.range + 1) // 2:
            err -= self.range
        ctx = 365 + ritype
        temp = self.A[ctx] + (self.N[ctx] >> 1 if ritype == 1 else 0)
        k = 0
        while (self.N[ctx] << k) < temp:
            k += 1
        if k == 0 and err > 0 and 2 * self.Nn[ritype] < self.N[ctx]:
            mp = 1
        elif err < 0 and 2 * self.Nn[ritype] >= self.N[ctx]:
            mp = 1
        elif err < 0 and k != 0:
            mp = 1
        else:
            mp = 0
        emer = 2 * abs(err) - ritype - mp
        self.put_mapped(bw, emer, k, self.limit - J[self.run_index] - 1)
        if err < 0:
            self.Nn[ritype] += 1
        self.A[ctx] += (emer + 1 - ritype) >> 1
        if self.N[ctx] == self.reset:
            self.A[ctx] >>= 1
            self.N[ctx] >>= 1
            self.Nn[ritype] >>= 1
        self.N[ctx] += 1
        if self.run_index > 0:
            self.run_index -= 1
        return col + 1


def encode(img, w, h, prec, near=0):
    enc = Encoder(w, h, prec, near)
    scan, recon = enc.encode_scan(img)
    out = bytearray()

    def m16(v):
        out.append((v >> 8) & 0xFF)
        out.append(v & 0xFF)
    m16(0xFFD8)                      # SOI
    m16(0xFFF7); m16(11)             # SOF55
    out.append(prec); m16(h); m16(w); out.append(1)
    out.append(1); out.append(0x11); out.append(0)
    m16(0xFFDA); m16(8)              # SOS
    out.append(1); out.append(1); out.append(0)
    out.append(near); out.append(0); out.append(0)
    out.extend(scan)
    m16(0xFFD9)                      # EOI
    return bytes(out), recon


def main():
    outdir = os.path.join(os.path.dirname(__file__), os.pardir,
                          "src", "test", "resources", "fixtures", "jls")
    os.makedirs(outdir, exist_ok=True)

    def write(name, data):
        with open(os.path.join(outdir, name), "wb") as f:
            f.write(data)

    # deterministic LCG so the fixtures are reproducible
    def lcg(seed):
        s = seed
        while True:
            s = (s * 1103515245 + 12345) & 0x7FFFFFFF
            yield s

    # 1. 8-bit textured gradient: mixes smooth ramps with noise so
    #    both regular contexts and occasional runs appear
    w, h = 29, 17
    rnd = lcg(42)
    img8 = [(x * 5 + y * 9 + (next(rnd) % 13)) % 256
            for y in range(h) for x in range(w)]
    jls, _ = encode(img8, w, h, 8)
    write("g8.jls", jls)
    write("g8.raw", bytes(img8))

    # 2. 16-bit wide-range: exercises qbpp=16, LIMIT=64, escape codes
    w, h = 13, 11
    rnd = lcg(7)
    img16 = [(x * 4099 + y * 911 + (next(rnd) % 4096) * 16) % 65536
             for y in range(h) for x in range(w)]
    jls, _ = encode(img16, w, h, 16)
    write("g16.jls", jls)
    raw = bytearray()
    for v in img16:
        raw.append((v >> 8) & 0xFF)
        raw.append(v & 0xFF)
    write("g16.raw", bytes(raw))

    # 3. run-mode heavy: flat regions, full constant lines (EOL runs),
    #    runs interrupted mid-line, and a long run spanning the ramp
    w, h = 32, 9
    img_runs = []
    for y in range(9):
        if y in (0, 4):
            img_runs += [77] * w            # full-line run from line start
        elif y == 1:
            img_runs += [77] * 20 + [200] + [77] * 11  # interrupted run
        elif y == 2:
            img_runs += [10, 20] + [20] * 29 + [30]    # run after regular
        else:
            img_runs += [(x * 3 + y) % 256 for x in range(w)]
    jls, _ = encode(img_runs, w, h, 8)
    write("runs8.jls", jls)
    write("runs8.raw", bytes(img_runs))

    # 4. NEAR=2 near-lossless: the .raw stores the encoder's
    #    reconstruction — the decoder must match it bit-exactly
    w, h = 21, 13
    rnd = lcg(99)
    img_n = [(x * 11 + y * 7 + (next(rnd) % 9)) % 256
             for y in range(h) for x in range(w)]
    jls, recon = encode(img_n, w, h, 8, near=2)
    assert all(abs(a - b) <= 2 for a, b in zip(img_n, recon))
    write("near8.jls", jls)
    write("near8.raw", bytes(recon))

    print("wrote jls fixtures to", outdir)


if __name__ == "__main__":
    main()
