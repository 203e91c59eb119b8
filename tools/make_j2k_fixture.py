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

    # ---- round-11 surface: lossy 9/7, tiles, precincts, tile-parts.
    # For lossy fixtures the committed .raw is the PYTHON DECODER's
    # reconstruction (midpoint dequant + double 9/7 + floor(v+0.5)),
    # the exact-parity-for-lossy pattern: the Scala decoder must land
    # on the same doubles bit-for-bit.
    def emit2(name, img, w, h, prec, ncomp=1, **kw):
        enc = encode(img, w, h, prec, ncomp=ncomp, **kw)
        dw, dh, dp, _, dec = decode(enc)
        assert (dw, dh, dp) == (w, h, prec), name
        if kw.get("transform", "53") == "53":
            assert dec == img, name
        with open(os.path.join(outdir, name + ".j2c"), "wb") as f:
            f.write(enc)
        planes = [dec] if ncomp == 1 else dec
        raw = bytearray()
        for i in range(w * h):
            for pl in planes:
                v = pl[i]
                if prec > 8:
                    raw.append((v >> 8) & 0xFF)
                raw.append(v & 0xFF)
        with open(os.path.join(outdir, name + ".raw"), "wb") as f:
            f.write(bytes(raw))

    import math as _m
    r = lcg(101)
    w, h = 33, 25
    img = [min(255, max(0, 128 + int(90 * _m.sin(x * 0.31) *
                                     _m.cos(y * 0.23)) + next(r) % 7))
           for y in range(h) for x in range(w)]
    emit2("lossy97_exp", img, w, h, 8, levels=2, cbw=8, cbh=8,
          transform="97", quant=("expounded", 7, 512))

    r = lcg(113)
    w, h = 24, 16
    img = [(x * 151 + y * 911 + next(r) % 257) % 4096
           for y in range(h) for x in range(w)]
    emit2("lossy97_der", img, w, h, 12, levels=2, cbw=8, cbh=8,
          transform="97", quant=("derived", 12, 1024))

    # lossless multi-tile with ODD tile origins (19 % 2 == 1) — the
    # general-interval DWT's parity handling is load-bearing
    r = lcg(131)
    w, h = 45, 33
    img = [(x * 3 + y * 7 + next(r) % 29) % 256
           for y in range(h) for x in range(w)]
    emit2("tiles53", img, w, h, 8, levels=2, cbw=8, cbh=8,
          xtsiz=19, ytsiz=16)

    # lossless precincts + SOP/EPH + 3 tile-parts
    r = lcg(149)
    w, h = 56, 40
    img = [(x * 5 + y * 3 + next(r) % 17) % 256
           for y in range(h) for x in range(w)]
    emit2("prec_tp", img, w, h, 8, levels=2, cbw=8, cbh=8,
          precincts=(3, 3), sop=True, eph=True, tile_parts=3)

    # 16-bit lossy + tiles + per-resolution precincts (DICOM .4.91 CT
    # shape at fixture scale)
    r = lcg(163)
    w, h = 45, 33
    img = [((x * 37 + y * 101 + next(r) % 701) % 30000) + 1000
           for y in range(h) for x in range(w)]
    emit2("lossy16_tiles", img, w, h, 16, levels=2, cbw=8, cbh=8,
          transform="97", quant=("expounded", 15, 256),
          xtsiz=19, ytsiz=16, precincts=[(5, 5), (4, 4), (4, 4)])

    # lossy RGB through the irreversible color transform (ICT)
    r = lcg(179)
    w, h = 37, 26
    planes = [[min(255, max(0, 128 + int(80 * _m.sin((x + 7 * c) * 0.25) *
                                         _m.cos((y - 3 * c) * 0.2)) +
                            next(r) % 5))
               for y in range(h) for x in range(w)] for c in range(3)]
    emit2("lossy_rgb_ict", planes, w, h, 8, ncomp=3, mct=True,
          levels=2, cbw=8, cbh=8, transform="97",
          quant=("expounded", 8, 256), tile_parts=2)

    # quality layers (pass-granular cuts) + non-LRCP progressions
    r = lcg(191)
    w, h = 42, 31
    img = [(x * 7 + y * 11 + next(r) % 23) % 256
           for y in range(h) for x in range(w)]
    emit2("layers3_rlcp", img, w, h, 8, levels=2, cbw=8, cbh=8,
          layers=3, progression="RLCP")
    emit2("rpcl_tiles", img, w, h, 8, levels=2, cbw=8, cbh=8,
          layers=2, progression="RPCL", xtsiz=17, ytsiz=13,
          precincts=(4, 4), sop=True, eph=True, tile_parts=2)
    emit2("cprl_lossy", img, w, h, 8, levels=2, cbw=8, cbh=8,
          layers=4, progression="CPRL", transform="97",
          quant=("expounded", 8, 0))
    r = lcg(197)
    planes = [[(x * (5 + c) + y * (9 - c) + next(r) % 23) % 256
               for y in range(h) for x in range(w)] for c in range(3)]
    emit2("pcrl_rgb_layers", planes, w, h, 8, ncomp=3, mct=True,
          levels=2, cbw=8, cbh=8, layers=2, progression="PCRL")

    # multi-tile position progressions across the T.800 B.12 clamp
    # case: precinct-unaligned tile origins (17, 13) and a small r=1
    # precinct (2^2) make a non-first tile's first precinct index
    # NON-zero, so its projected origin (8) falls strictly between 0
    # and the tile origin — only the clamp to the tile origin orders
    # these packets per B.12 (6 of the 9 tiles reorder; verified
    # differentially when these fixtures were added).
    r = lcg(211)
    w, h = 42, 31
    img = [(x * 13 + y * 5 + next(r) % 19) % 256
           for y in range(h) for x in range(w)]
    emit2("pcrl_tiles", img, w, h, 8, levels=2, cbw=8, cbh=8,
          layers=2, progression="PCRL", xtsiz=17, ytsiz=13,
          precincts=[(5, 5), (2, 2), (4, 4)])
    r = lcg(223)
    planes = [[(x * (7 + c) + y * (3 + c) + next(r) % 23) % 256
               for y in range(h) for x in range(w)] for c in range(3)]
    emit2("cprl_tiles", planes, w, h, 8, ncomp=3, mct=True, levels=2,
          cbw=8, cbh=8, progression="CPRL", xtsiz=17, ytsiz=13,
          precincts=[(5, 5), (2, 2), (4, 4)])

    # canvas offsets from cropped encodes (T.800 B.3): the image
    # region sits at (XOsiz, YOsiz) on the reference grid and the
    # tile grid anchors at (XTOsiz, YTOsiz) behind it. offs53 pins
    # the lossless geometry (odd offsets, tiles clipped against the
    # region); offs_rpcl_lossy adds a position progression (offset
    # tile origins exercise the B.12 clamp) + 9/7 + layers.
    r = lcg(227)
    w, h = 30, 22
    img = [(x * 3 + y * 7 + next(r) % 29) % 256
           for y in range(h) for x in range(w)]
    emit2("offs53", img, w, h, 8, levels=2, cbw=8, cbh=8,
          xtsiz=13, ytsiz=9, xosiz=5, yosiz=3)
    emit2("offs_rpcl_lossy", img, w, h, 8, levels=2, cbw=8, cbh=8,
          xtsiz=16, ytsiz=16, xosiz=7, yosiz=11, xtosiz=4, ytosiz=8,
          progression="RPCL", layers=2, transform="97",
          quant=("expounded", 8, 256))

    # COC/QCC per-component coding/quantization styles — what
    # mainstream encoders (OpenJPEG/Kakadu) routinely emit on color
    # images (e.g. different code-block or quantization parameters
    # for chroma after the color transform). coc53: lossless RCT
    # with per-component code-block sizes + precincts + "auto"
    # reversible exponents, across tiles; qcc97: lossy ICT with
    # per-component quantization (expounded AND derived overrides)
    # plus a chroma code-block override, RPCL.
    r = lcg(233)
    w, h = 33, 25
    planes = [[(x * (3 + c) + y * (5 + c) + next(r) % 23) % 256
               for y in range(h) for x in range(w)] for c in range(3)]
    emit2("coc53", planes, w, h, 8, ncomp=3, mct=True, levels=2,
          cbw=16, cbh=16, xtsiz=17, ytsiz=13,
          coc={1: dict(cbw=8, cbh=8, precincts=[(5, 5), (3, 3), (4, 4)]),
               2: dict(cbw=4, cbh=8)},
          qcc={2: "auto"})
    emit2("qcc97", planes, w, h, 8, ncomp=3, mct=True, levels=2,
          cbw=8, cbh=8, transform="97", quant=("expounded", 9, 256),
          progression="RPCL", layers=2, coc={1: dict(cbw=4, cbh=4)},
          qcc={1: ("expounded", 10, 512), 2: ("derived", 11, 128)})

    # component subsampling (SIZ XRsiz/YRsiz, T.800 B.2): planes live
    # on per-component lattices. The committed .raw is the REPLICATED
    # full-grid interleave (each subsampled sample across its xr x yr
    # footprint, clamped at region edges) — the presentation rule the
    # Scala decoder's interleaved output applies; the Python decoder
    # returns natural-size planes, replicated here identically.
    def cdiv(a, b):
        return -(-a // b)

    def emit_sub(name, w, h, prec, subs, seed, **kw):
        r = lcg(seed)
        dims = [(cdiv(w, xr), cdiv(h, yr)) for (xr, yr) in subs]
        planes = [[(x * (3 + c) + y * (5 + c) + next(r) % 23) % 256
                   for y in range(dh) for x in range(dw)]
                  for c, (dw, dh) in enumerate(dims)]
        enc = encode(planes, w, h, prec, ncomp=len(subs),
                     subsampling=subs, **kw)
        dw_, dh_, dp_, _, dec = decode(enc)
        assert (dw_, dh_, dp_) == (w, h, prec), name
        if kw.get("transform", "53") == "53":
            assert dec == planes, name
        with open(os.path.join(outdir, name + ".j2c"), "wb") as f:
            f.write(enc)
        raw = bytearray()
        for y in range(h):
            for x in range(w):
                for c, (xr, yr) in enumerate(subs):
                    cw, ch = dims[c]
                    cx = max(0, min(cw - 1, x // xr))
                    cy = max(0, min(ch - 1, y // yr))
                    v = dec[c][cy * cw + cx]
                    if prec > 8:
                        raw.append((v >> 8) & 0xFF)
                    raw.append(v & 0xFF)
        with open(os.path.join(outdir, name + ".raw"), "wb") as f:
            f.write(bytes(raw))

    emit_sub("sub420", 32, 24, 8, [(1, 1), (2, 2), (2, 2)], 241,
             levels=2, cbw=8, cbh=8, xtsiz=13, ytsiz=9,
             progression="RPCL", layers=2)
    emit_sub("sub422_lossy", 33, 25, 8, [(1, 1), (2, 1), (2, 1)], 251,
             levels=2, cbw=8, cbh=8, transform="97",
             quant=("expounded", 9, 256),
             qcc={1: ("expounded", 10, 512), 2: ("expounded", 10, 512)})

    # code-block styles (Table A.19, the Kakadu "Cmodes" surface):
    # cbsty_bypass pins BYPASS+CAUSAL+SEGSYM on a 12-bit image (deep
    # bitplanes force long raw SPP/MRP segments) with quality layers
    # whose cuts land inside and across terminated segments, plus
    # tiles; cbsty_restart pins RESTART+RESET per-pass termination
    # under lossy 9/7 + RPCL.
    r = lcg(263)
    w, h = 37, 29
    img12 = [(x * 151 + y * 911 + next(r) % 512) % 4096
             for y in range(h) for x in range(w)]
    emit2("cbsty_bypass", img12, w, h, 12, levels=2, cbw=8, cbh=8,
          cbstyle=0x01 | 0x08 | 0x20, layers=4, xtsiz=19, ytsiz=16)
    emit2("cbsty_restart", img12, w, h, 12, levels=2, cbw=8, cbh=8,
          cbstyle=0x04 | 0x02, transform="97",
          quant=("expounded", 12, 512), progression="RPCL", layers=2)

    # RGN (maxshift ROI, Annex H) + POC (progression order changes):
    # rgn_roi upshifts each band's top-left-quadrant coefficients by
    # 9 planes and signals SPrgn; poc_mixed covers the packet space
    # with three progression segments (low-res LRCP first, then the
    # chroma tail PCRL, then everything LRCP) across tiles and layers.
    r = lcg(271)
    w, h = 33, 25
    img = [(x * 3 + y * 7 + next(r) % 29) % 256
           for y in range(h) for x in range(w)]
    emit2("rgn_roi", img, w, h, 8, levels=2, cbw=8, cbh=8,
          rgn={0: 9}, xtsiz=17, ytsiz=13, layers=2)
    r = lcg(277)
    planes = [[(x * (3 + c) + y * (5 + c) + next(r) % 23) % 256
               for y in range(h) for x in range(w)] for c in range(3)]
    emit2("poc_mixed", planes, w, h, 8, ncomp=3, mct=True, levels=2,
          cbw=8, cbh=8, layers=2, xtsiz=17, ytsiz=13,
          poc=[(0, 0, 1, 2, 1, "LRCP"), (0, 1, 1, 3, 3, "PCRL"),
               (0, 0, 2, 3, 3, "LRCP")])

    # PPT/PPM packed packet headers (A.6.4/A.6.5): header bits move
    # out of the bitstream into tile-part PPT segments (ppt_hdrs,
    # with SOP/EPH so the header/body split is pinned) or one
    # main-header PPM segment with per-tile-part Nppm chunks in
    # codestream order (ppm_hdrs, RPCL + precincts + 3 tile-parts).
    r = lcg(283)
    w, h = 33, 25
    img = [(x * 3 + y * 7 + next(r) % 29) % 256
           for y in range(h) for x in range(w)]
    emit2("ppt_hdrs", img, w, h, 8, levels=2, cbw=8, cbh=8, ppt=True,
          layers=3, xtsiz=17, ytsiz=13, tile_parts=2, sop=True, eph=True)
    emit2("ppm_hdrs", img, w, h, 8, levels=2, cbw=8, cbh=8, ppm=True,
          layers=2, xtsiz=17, ytsiz=13, tile_parts=3,
          progression="RPCL", precincts=(4, 4))

    # tile-scope coding/quantization overrides (COD/QCD in a tile's
    # first tile-part header, A.6.1 precedence): tilecod gives tile 1
    # its own code-block size, per-resolution precincts, RPCL
    # progression, 3 layers and CAUSAL+SEGSYM styles while its
    # neighbors keep the main-header coding; tileqcd re-quantizes
    # tiles 1 (derived) and 2 (expounded) under lossy 9/7.
    r = lcg(307)
    w, h = 33, 25
    img = [(x * 3 + y * 7 + next(r) % 29) % 256
           for y in range(h) for x in range(w)]
    emit2("tilecod", img, w, h, 8, levels=2, cbw=16, cbh=16,
          xtsiz=17, ytsiz=13, layers=2,
          tile_cod={1: dict(cbw=8, cbh=8,
                            precincts=[(5, 5), (3, 3), (4, 4)],
                            progression="RPCL", layers=3,
                            cbstyle=0x28)})
    emit2("tileqcd", img, w, h, 8, levels=2, cbw=8, cbh=8,
          xtsiz=17, ytsiz=13, transform="97",
          quant=("expounded", 9, 256),
          tile_qcd={1: ("derived", 11, 128),
                    2: ("expounded", 10, 512)})

    # combination fuzz corpus: 16 seeded random parameter combinations
    # (tiles x offsets x precincts x layers x progressions x styles x
    # COC/QCC x RGN x POC x PPT/PPM x tile overrides x subsampling,
    # lossless AND lossy) — targeted fixtures pin each feature alone;
    # these pin their INTERACTIONS. Every stream roundtrips through
    # the Python decoder before committing; Jpeg2kSpec then requires
    # the Scala decode bit-exact.
    import random as _rnd
    rng = _rnd.Random(20260815)
    combos = []
    for fi in range(16):
        w = rng.randrange(18, 42)
        h = rng.randrange(14, 34)
        prec = rng.choice([8, 8, 12, 16])
        levels = rng.randrange(1, 4)
        cb = rng.choice([8, 16])
        kw = dict(levels=levels, cbw=cb, cbh=cb)
        ncomp = rng.choice([1, 1, 3])
        lossy = rng.random() < 0.4
        if lossy:
            kw["transform"] = "97"
            kw["quant"] = (rng.choice(["expounded", "derived"]),
                           prec + rng.randrange(-1, 2), rng.randrange(0, 1024))
        if rng.random() < 0.6:
            kw["xtsiz"] = rng.randrange(9, w + 1)
            kw["ytsiz"] = rng.randrange(9, h + 1)
        if rng.random() < 0.3:
            kw["xosiz"] = rng.randrange(0, 6)
            kw["yosiz"] = rng.randrange(0, 6)
        if rng.random() < 0.4:
            kw["precincts"] = (rng.randrange(3, 6), rng.randrange(3, 6))
        if rng.random() < 0.5:
            kw["layers"] = rng.randrange(2, 5)
        kw["progression"] = rng.choice(
            ["LRCP", "RLCP", "RPCL", "PCRL", "CPRL"])
        if rng.random() < 0.4:
            kw["cbstyle"] = rng.choice([0x01, 0x04, 0x08, 0x20, 0x28, 0x05])
        if rng.random() < 0.3:
            kw["sop"] = True
            kw["eph"] = True
        if rng.random() < 0.3:
            kw["tile_parts"] = rng.randrange(2, 4)
        if ncomp == 3 and rng.random() < 0.5:
            kw["mct"] = True
        if ncomp == 3 and rng.random() < 0.3:
            kw["coc"] = {1: dict(cbw=rng.choice([4, 8]),
                                 cbh=rng.choice([4, 8]))}
        if rng.random() < 0.25 and not lossy:
            kw["rgn"] = {0: prec + 1}
        if rng.random() < 0.25:
            kw["ppt"] = True
        elif rng.random() < 0.2:
            kw["ppm"] = True
        dims = [(w, h)] * ncomp
        planes = [[(x * (3 + c) + y * (5 + c) + ((x * y + fi) % 17)) %
                   (1 << prec)
                   for y in range(dh) for x in range(dw)]
                  for c, (dw, dh) in enumerate(dims)]
        img = planes[0] if ncomp == 1 else planes
        name = f"fuzz{fi:02d}"
        try:
            emit2(name, img, w, h, prec, ncomp=ncomp, **kw)
        except AssertionError:
            # a randomly-inconsistent combination (e.g. rgn shift too
            # small) — re-draw deterministically without the extras
            for k in ("rgn", "coc", "ppt", "ppm"):
                kw.pop(k, None)
            emit2(name, img, w, h, prec, ncomp=ncomp, **kw)
        combos.append((name, w, h, prec, ncomp))
    # four subsampled interaction cases ride the emit_sub replicated-
    # interleave raw rule (factors x styles x progression x layers x
    # tiles — combinations no targeted fixture pins together)
    emit_sub("fuzz_sub0", 30, 22, 8, [(1, 1), (2, 2), (2, 2)], 311,
             levels=2, cbw=8, cbh=8, cbstyle=0x28, layers=2,
             xtsiz=13, ytsiz=9)
    emit_sub("fuzz_sub1", 33, 25, 8, [(1, 1), (2, 1), (2, 1)], 313,
             levels=2, cbw=8, cbh=8, progression="CPRL",
             cbstyle=0x04, sop=True, eph=True)
    emit_sub("fuzz_sub2", 28, 20, 12, [(1, 1), (2, 2), (2, 2)], 317,
             levels=1, cbw=8, cbh=8, transform="97",
             quant=("expounded", 12, 256), layers=3, tile_parts=2)
    emit_sub("fuzz_sub3", 26, 18, 8, [(2, 2), (1, 1), (2, 1)], 331,
             levels=2, cbw=16, cbh=16, progression="RPCL",
             xtsiz=11, ytsiz=10)
    for fi, (name, sw, sh, sprec) in enumerate([
            ("fuzz_sub0", 30, 22, 8), ("fuzz_sub1", 33, 25, 8),
            ("fuzz_sub2", 28, 20, 12), ("fuzz_sub3", 26, 18, 8)]):
        combos.append((name, sw, sh, sprec, 3))
    with open(os.path.join(outdir, "fuzz_manifest.txt"), "w") as f:
        for (name, w, h, prec, ncomp) in combos:
            f.write(f"{name} {w} {h} {prec} {ncomp}\n")

    print("wrote j2k fixtures to", outdir)


if __name__ == "__main__":
    main()
