#!/usr/bin/env python3
"""Independent pure-Python JPEG Lossless encoder (ITU-T T.81 process
14, SOF3) — ground truth for graft's Scala decoder
(`operators/JpegLossless.scala`, `JpegLosslessSpec`). This is the
predictive Huffman-coded lossless mode behind the DICOM transfer
syntaxes 1.2.840.10008.1.2.4.57 and .70 (SV1), which clinical CT/MR
archives still carry.

Implements the spec from scratch: the seven spatial predictors, DC
difference categories with sign-extension bits, canonical Huffman
coding (one table, all 17 category symbols at code length 5 — valid,
deliberately simple), FF00 byte stuffing, modulo-2^16 difference
arithmetic including the category-16 special case.

Writes to src/test/resources/fixtures/jlo/:
  p1_8.jls16 / p1_8.raw    8-bit 23x14, predictor 1 (the DICOM SV1)
  p4_16.jls16 / p4_16.raw  16-bit 11x9 wide range, predictor 4 (MED-ish)
  p7_12.jls16 / p7_12.raw  12-bit 17x6 ramps, predictor 7
(raw files are big-endian u16 except p1_8.raw: u8)
"""
import os

# one canonical Huffman table: all 17 category symbols at length 5.
# code(symbol i) = i (5 bits) — canonical order, max code 10000 != 11111
BITS = [0, 0, 0, 0, 17] + [0] * 11            # counts per length 1..16
VALS = list(range(17))
CODE = {v: (i, 5) for i, v in enumerate(VALS)}


class BitWriter:
    """MSB-first with JPEG FF00 byte stuffing; pads final byte with 1s
    (the T.81 convention — padding must not form a valid code prefix
    shorter than the stuff, and all-ones is never a code here)."""

    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nb = 0

    def bits(self, v, n):
        for i in range(n - 1, -1, -1):
            self.cur = (self.cur << 1) | ((v >> i) & 1)
            self.nb += 1
            if self.nb == 8:
                self.out.append(self.cur)
                if self.cur == 0xFF:
                    self.out.append(0x00)
                self.cur = 0
                self.nb = 0

    def finish(self):
        while self.nb:
            self.bits(1, 1)
        return bytes(self.out)


def predict(samples, w, x, y, psv, prec, pt, row0_default):
    if y == 0 and x == 0:
        return 1 << (prec - 1 - pt)
    if y == 0:
        return samples[x - 1]                  # first line: predictor 1
    if x == 0:
        return samples[(y - 1) * w]            # first column: predictor 2
    ra = samples[y * w + x - 1]
    rb = samples[(y - 1) * w + x]
    rc = samples[(y - 1) * w + x - 1]
    if psv == 1:
        return ra
    if psv == 2:
        return rb
    if psv == 3:
        return rc
    if psv == 4:
        return ra + rb - rc
    if psv == 5:
        return ra + ((rb - rc) >> 1)
    if psv == 6:
        return rb + ((ra - rc) >> 1)
    if psv == 7:
        return (ra + rb) >> 1
    raise ValueError(psv)


def encode(samples, w, h, prec, psv):
    maxval = (1 << prec) - 1
    assert all(0 <= v <= maxval for v in samples)
    bw = BitWriter()
    for y in range(h):
        for x in range(w):
            px = predict(samples, w, x, y, psv, prec, 0, None)
            diff = (samples[y * w + x] - px) & 0xFFFF
            if diff >= 32768:
                diff -= 65536                  # into [-32768, 32767]
            if diff == -32768:
                cat = 16                       # special: no extra bits
            else:
                cat = abs(diff).bit_length()
            code, nbits = CODE[cat]
            bw.bits(code, nbits)
            if 0 < cat < 16:
                extra = diff if diff >= 0 else diff + (1 << cat) - 1
                bw.bits(extra, cat)
    scan = bw.finish()

    out = bytearray()

    def m16(v):
        out.append((v >> 8) & 0xFF)
        out.append(v & 0xFF)
    m16(0xFFD8)                                # SOI
    m16(0xFFC3)                                # SOF3 (lossless)
    m16(2 + 6 + 3)
    out.append(prec)
    m16(h)
    m16(w)
    out.append(1)                              # 1 component
    out.append(1)
    out.append(0x11)
    out.append(0)
    dht = bytes(BITS) + bytes(VALS)
    m16(0xFFC4)                                # DHT: class 0 (DC), id 0
    m16(2 + 1 + len(dht))
    out.append(0x00)
    out.extend(dht)
    m16(0xFFDA)                                # SOS
    m16(2 + 1 + 2 + 3)
    out.append(1)
    out.append(1)
    out.append(0x00)                           # Td 0 / Ta 0
    out.append(psv)                            # Ss = predictor selection
    out.append(0)                              # Se
    out.append(0)                              # Ah<<4 | Al (point transform)
    out.extend(scan)
    m16(0xFFD9)                                # EOI
    return bytes(out)


def main():
    outdir = os.path.join(os.path.dirname(__file__), os.pardir,
                          "src", "test", "resources", "fixtures", "jlo")
    os.makedirs(outdir, exist_ok=True)

    def write(name, data):
        with open(os.path.join(outdir, name), "wb") as f:
            f.write(data)

    def lcg(seed):
        s = seed
        while True:
            s = (s * 1103515245 + 12345) & 0x7FFFFFFF
            yield s

    # predictor 1 (the DICOM SV1 default), 8-bit
    w, h = 23, 14
    rnd = lcg(5)
    img = [(x * 7 + y * 3 + (next(rnd) % 21)) % 256
           for y in range(h) for x in range(w)]
    write("p1_8.jls16", encode(img, w, h, 8, 1))
    write("p1_8.raw", bytes(img))

    # predictor 4, 16-bit full range (exercises cat 16 / big diffs)
    w, h = 11, 9
    rnd = lcg(31)
    img = []
    for i in range(w * h):
        m = i % 5
        img.append(0 if m == 0 else 65535 if m == 1 else next(rnd) % 65536)
    write("p4_16.jls16", encode(img, w, h, 16, 4))
    raw = bytearray()
    for v in img:
        raw.append((v >> 8) & 0xFF)
        raw.append(v & 0xFF)
    write("p4_16.raw", bytes(raw))

    # predictor 7, 12-bit smooth ramps (small categories, stuffing-prone
    # long 1-runs from the all-length-5 table padding)
    w, h = 17, 6
    img = [(x * 241 + y * 119) % 4096 for y in range(h) for x in range(w)]
    write("p7_12.jls16", encode(img, w, h, 12, 7))
    raw = bytearray()
    for v in img:
        raw.append((v >> 8) & 0xFF)
        raw.append(v & 0xFF)
    write("p7_12.raw", bytes(raw))

    print("wrote jpeg-lossless fixtures to", outdir)


if __name__ == "__main__":
    main()
