#!/usr/bin/env python3
"""Committed JPEG 2000 fixtures for Jpeg2kSpec, encoded by the
independent pure-Python T.800 implementation in j2k.py (which
self-tests its own encoder/decoder roundtrip). Raw expectations are
u8 or big-endian u16.

Writes to src/test/resources/fixtures/j2k/:
  g8_l1.j2c / .raw     8-bit 19x13, 1 level, 8x8 code-blocks
  g8_l3.j2c / .raw     8-bit 37x29, 3 levels, 16x16 code-blocks
                       (multi-code-block grids, partial stripes)
  g12_l2.j2c / .raw    12-bit 24x16, 2 levels
  g16_l2.j2c / .raw    16-bit 11x9 full range (category-16-ish diffs)
  flat_l2.j2c / .raw   constant 32x32 (empty packets path)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from j2k import encode, decode  # noqa: E402


def lcg(seed):
    s = seed
    while True:
        s = (s * 1103515245 + 12345) & 0x7FFFFFFF
        yield s


def main():
    outdir = os.path.join(os.path.dirname(__file__), os.pardir,
                          "src", "test", "resources", "fixtures", "j2k")
    os.makedirs(outdir, exist_ok=True)

    def emit(name, img, w, h, prec, levels, cb):
        enc = encode(img, w, h, prec, levels=levels, cbw=cb, cbh=cb)
        dw, dh, dp, _, dec = decode(enc)
        assert (dw, dh, dp) == (w, h, prec) and dec == img, name
        with open(os.path.join(outdir, name + ".j2c"), "wb") as f:
            f.write(enc)
        raw = bytearray()
        for v in img:
            if prec > 8:
                raw.append((v >> 8) & 0xFF)
            raw.append(v & 0xFF)
        with open(os.path.join(outdir, name + ".raw"), "wb") as f:
            f.write(bytes(raw))

    r = lcg(11)
    w, h = 19, 13
    emit("g8_l1", [(x * 5 + y * 9 + next(r) % 17) % 256
                   for y in range(h) for x in range(w)], w, h, 8, 1, 8)

    r = lcg(23)
    w, h = 37, 29
    emit("g8_l3", [(x * 3 + y * 7 + next(r) % 31) % 256
                   for y in range(h) for x in range(w)], w, h, 8, 3, 16)

    r = lcg(37)
    w, h = 24, 16
    emit("g12_l2", [(x * 151 + y * 91 + next(r) % 512) % 4096
                    for y in range(h) for x in range(w)], w, h, 12, 2, 8)

    r = lcg(53)
    w, h = 11, 9
    img = []
    for i in range(w * h):
        m = i % 5
        img.append(0 if m == 0 else 65535 if m == 1 else next(r) % 65536)
    emit("g16_l2", img, w, h, 16, 2, 8)

    w, h = 32, 32
    emit("flat_l2", [77] * (w * h), w, h, 8, 2, 16)

    # color with the reversible color transform (MCT): raw holds the
    # pixel-interleaved r,g,b expectation
    r = lcg(71)
    w, h = 21, 11
    planes = [[(x * (5 + c) + y * (9 - c) + next(r) % 23) % 256
               for y in range(h) for x in range(w)] for c in range(3)]
    enc = encode(planes, w, h, 8, levels=2, cbw=8, cbh=8, ncomp=3, mct=True)
    dw, dh, dp, _, dec = decode(enc)
    assert dec == planes
    with open(os.path.join(outdir, "rgb_mct.j2c"), "wb") as f:
        f.write(enc)
    raw = bytearray()
    for i in range(w * h):
        for c in range(3):
            raw.append(planes[c][i])
    with open(os.path.join(outdir, "rgb_mct.raw"), "wb") as f:
        f.write(bytes(raw))

    print("wrote j2k fixtures to", outdir)


if __name__ == "__main__":
    main()
