#!/usr/bin/env python3
"""Independent pure-Python 12-bit extended sequential JPEG encoder
(ITU-T T.81 process 2&4, SOF1) — ground truth for graft's Scala
decoder (`operators/JpegExtended.scala`). This is the lossy 12-bit
DCT mode behind DICOM transfer syntax 1.2.840.10008.1.2.4.51
(JPEG Extended), which 12-bit CT exports use.

From the spec, no third-party codec: level shift, 8x8 FDCT,
quantization (16-bit DQT entries, Pq=1), zigzag, DC-difference and
AC run/size Huffman coding with simple valid canonical tables (DC:
16 symbols at length 5; AC: 242 symbols at length 8), FF00 stuffing.

The encoder also emits each fixture's RECONSTRUCTION (dequant + the
same deterministic integer-rounded IDCT the Scala decoder uses) so
the spec can assert exact parity, not just bounded error. The IDCT
cosine table is rounded to a 2^-20 grid in BOTH implementations, so
double arithmetic agrees bit-for-bit across languages.

Writes to src/test/resources/fixtures/jext/:
  flat12.jpg / flat12.raw    four uniform 16x16 quadrants (DC-only)
  grad12.jpg / grad12.raw    24x16 gradient + texture
(raw files hold the big-endian u16 RECONSTRUCTION)
"""
import math
import os

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# cosine table rounded to 2^-20: identical constants in Scala
COS = [[round(math.cos((2 * x + 1) * u * math.pi / 16) * (1 << 20)) / (1 << 20)
        for x in range(8)] for u in range(8)]
C = [1 / math.sqrt(2)] + [1.0] * 7
CQ = [round(c * (1 << 20)) / (1 << 20) for c in C]

# quantization table (zigzag order irrelevant here — stored natural,
# emitted in zigzag): mild values so 12-bit detail survives
QTABLE = [8 if i == 0 else 12 + (i % 7) * 2 for i in range(64)]

# DC table: 16 symbols (categories 0-15) at code length 5
DC_BITS = [0, 0, 0, 0, 16] + [0] * 11
DC_VALS = list(range(16))
DC_CODE = {v: (i, 5) for i, v in enumerate(DC_VALS)}
# AC table: EOB, ZRL, and (run<<4|size) run 0-15 size 1-14, length 8
AC_VALS = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 15)]
AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(AC_VALS)] + [0] * 8
AC_CODE = {v: (i, 8) for i, v in enumerate(AC_VALS)}


class BitWriter:
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


def fdct(block):  # block: 64 level-shifted ints -> 64 floats
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += block[y * 8 + x] * COS[u][y] * COS[v][x]
            out[u * 8 + v] = 0.25 * CQ[u] * CQ[v] * s
    return out


def idct(coef):  # 64 dequantized ints -> 64 ints (deterministic round)
    out = [0] * 64
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += CQ[u] * CQ[v] * coef[u * 8 + v] * COS[u][y] * COS[v][x]
            val = 0.25 * s
            out[y * 8 + x] = math.floor(val + 0.5)
    return out


def encode(img, w, h, prec=12):
    maxval = (1 << prec) - 1
    shift = 1 << (prec - 1)
    bw = BitWriter()
    recon = [0] * (w * h)
    pred = 0
    bh = (h + 7) // 8
    bwid = (w + 7) // 8
    for by in range(bh):
        for bx in range(bwid):
            block = []
            for y in range(8):
                for x in range(8):
                    yy = min(by * 8 + y, h - 1)   # edge replication pad
                    xx = min(bx * 8 + x, w - 1)
                    block.append(img[yy * w + xx] - shift)
            coef = fdct(block)
            q = [int(math.floor(coef[i] / QTABLE[i] + 0.5)) for i in range(64)]
            # DC
            diff = q[0] - pred
            pred = q[0]
            cat = abs(diff).bit_length()
            code, n = DC_CODE[cat]
            bw.bits(code, n)
            if cat:
                extra = diff if diff >= 0 else diff + (1 << cat) - 1
                bw.bits(extra, cat)
            # AC in zigzag
            zz = [q[ZIGZAG[k]] for k in range(1, 64)]
            run = 0
            for a in zz:
                if a == 0:
                    run += 1
                    continue
                while run >= 16:
                    code, n = AC_CODE[0xF0]
                    bw.bits(code, n)
                    run -= 16
                size = abs(a).bit_length()
                assert size <= 14
                code, n = AC_CODE[(run << 4) | size]
                bw.bits(code, n)
                extra = a if a >= 0 else a + (1 << size) - 1
                bw.bits(extra, size)
                run = 0
            if run:
                code, n = AC_CODE[0x00]
                bw.bits(code, n)
            # reconstruction (what a conforming decoder must emit)
            deq = [q[i] * QTABLE[i] for i in range(64)]
            rec = idct(deq)
            for y in range(8):
                for x in range(8):
                    yy = by * 8 + y
                    xx = bx * 8 + x
                    if yy < h and xx < w:
                        recon[yy * w + xx] = min(max(rec[y * 8 + x] + shift, 0),
                                                 maxval)
    scan = bw.finish()

    out = bytearray()

    def m16(v):
        out.append((v >> 8) & 0xFF)
        out.append(v & 0xFF)
    m16(0xFFD8)                                  # SOI
    m16(0xFFDB)                                  # DQT, Pq=1 (16-bit)
    m16(2 + 1 + 128)
    out.append(0x10)
    for k in range(64):
        m16(QTABLE[ZIGZAG[k]])
    m16(0xFFC1)                                  # SOF1 (extended sequential)
    m16(11)
    out.append(prec)
    m16(h)
    m16(w)
    out.append(1)
    out.append(1)
    out.append(0x11)
    out.append(0)
    dc = bytes(DC_BITS) + bytes(DC_VALS)
    m16(0xFFC4)
    m16(2 + 1 + len(dc))
    out.append(0x00)
    out.extend(dc)
    ac = bytes(AC_BITS) + bytes(AC_VALS)
    m16(0xFFC4)
    m16(2 + 1 + len(ac))
    out.append(0x10)
    out.extend(ac)
    m16(0xFFDA)                                  # SOS
    m16(8)
    out.append(1)
    out.append(1)
    out.append(0x00)                             # DC table 0 / AC table 0
    out.append(0)                                # Ss
    out.append(63)                               # Se
    out.append(0)
    out.extend(scan)
    m16(0xFFD9)
    return bytes(out), recon


def main():
    outdir = os.path.join(os.path.dirname(__file__), os.pardir,
                          "src", "test", "resources", "fixtures", "jext")
    os.makedirs(outdir, exist_ok=True)

    def write(name, data):
        with open(os.path.join(outdir, name), "wb") as f:
            f.write(data)

    def write16(name, vals):
        raw = bytearray()
        for v in vals:
            raw.append((v >> 8) & 0xFF)
            raw.append(v & 0xFF)
        write(name, bytes(raw))

    # four uniform 16x16 quadrants: DC-only blocks, recon error = DC
    # quantization rounding only
    w, h = 32, 32
    img = [(1000 if y < 16 else 2500) + (0 if x < 16 else 700)
           for y in range(h) for x in range(w)]
    jpg, recon = encode(img, w, h)
    assert all(abs(a - b) <= 1 for a, b in zip(img, recon))
    write("flat12.jpg", jpg)
    write16("flat12.raw", recon)

    # gradient + texture: exercises AC runs, ZRL, EOB, negative coefs
    w, h = 24, 16
    img = [(x * 150 + y * 90 + ((x * 7 + y * 13) % 5) * 40) % 4096
           for y in range(h) for x in range(w)]
    jpg, recon = encode(img, w, h)
    write("grad12.jpg", jpg)
    write16("grad12.raw", recon)

    print("wrote 12-bit extended JPEG fixtures to", outdir)


if __name__ == "__main__":
    main()
