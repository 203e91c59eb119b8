#!/usr/bin/env python3
"""Committed DICOM fixtures (pure stdlib) for DicomIOSpec — built
independently of the JVM encoder so the reader is pinned against a
second implementation of the Part 10 layout:

    series/s{1..4}.dcm  explicit VR LE, int16, 6x5, shuffled
                        InstanceNumbers (4,2,1,3) + matching IPP z
    mf.dcm              implicit VR LE, uint8, 3 frames, a nested
                        undefined-length SQ before PixelData, and
                        RescaleSlope/Intercept 2/10
    be.dcm              explicit VR BIG endian, int16
    rle.dcm             RLE Lossless (1.2.840.10008.1.2.5), int16,
                        6x5, z=0 — header/segments/PackBits written
                        from PS3.5 Annex G independently of the JVM
                        decoder
    jlo.dcm             JPEG Lossless SV1 (1.2.840.10008.1.2.4.70),
                        int16 negatives, z=1 pattern minus 45 — from
                        the independent pure-Python T.81 process-14
                        encoder in make_jpeglossless_fixture.py
    jls.dcm             JPEG-LS Lossless (1.2.840.10008.1.2.4.80),
                        int16 with negative values, z=2 pattern minus
                        60 — encoded by the independent pure-Python
                        T.87 implementation in make_jpegls_fixture.py
    jls_frag1.dcm       JPEG-LS, ONE frame split across 3 fragments
    jls_frag2.dcm       JPEG-LS, TWO frames of 2 fragments each,
                        delimited by a real Basic Offset Table
    jext.dcm            JPEG Extended 12-bit (1.2.840.10008.1.2.4.51),
                        uint16/BitsStored 12 — from the independent
                        pure-Python T.81 process-2&4 encoder in
                        make_jpegext_fixture.py; jext_recon.raw holds
                        the encoder's reconstruction for exact parity
    defl.dcm            Deflated Explicit VR LE (1.2.840.10008.1.2
                        .1.99): raw-deflate dataset, int16 negatives,
                        z=2 pattern minus 20
    rgb.dcm / rgbp.dcm / rgbrle.dcm
                        8-bit RGB color: native interleaved (planar
                        0), native channel-planar (planar 1), and RLE
                        with R/G/B byte planes; rgbv(x,y,c) =
                        (3x + 7y + 41c) % 256
    j2k.dcm             JPEG 2000 Lossless (1.2.840.10008.1.2.4.90):
                        reversible 5/3, 2 levels, 4x4 code-blocks,
                        SIGNED 16-bit component (z=0 pattern minus
                        55) — from the independent pure-Python T.800
                        implementation in j2k.py
    j2krgb.dcm          JPEG 2000 color (YBR_RCT): 3 components, the
                        reversible color transform, rgbv pattern
    mpeg.dcm            MPEG2 video transfer syntax (must refuse)
    jpeg.dcm            JPEG-baseline transfer syntax header with no
                        PixelData (must refuse on the missing element,
                        not the syntax — baseline now decodes)

    v(x, y, z) = (3x + 7y + 11z) % 126
"""
import struct
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "src/test/resources/fixtures/dicom"
(OUT / "series").mkdir(parents=True, exist_ok=True)

NX, NY = 6, 5  # cols, rows


def vox(z):
    return [(3 * x + 7 * y + 11 * z) % 126 for y in range(NY) for x in range(NX)]


def el_explicit(g, e, vr, val, be=False):
    fmt = ">" if be else "<"
    if len(val) % 2:
        val += b"\x00" if vr == "UI" else b" "
    if vr in ("OB", "OW", "OF", "OD", "OL", "SQ", "UC", "UR", "UT", "UN"):
        return struct.pack(fmt + "HH", g, e) + vr.encode() + b"\x00\x00" + \
            struct.pack(fmt + "I", len(val)) + val
    return struct.pack(fmt + "HH", g, e) + vr.encode() + \
        struct.pack(fmt + "H", len(val)) + val


def el_implicit(g, e, val):
    if len(val) % 2:
        val += b" "
    return struct.pack("<HHI", g, e, len(val)) + val


def meta_group(ts):
    body = el_explicit(0x0002, 0x0010, "UI", ts.encode())
    return el_explicit(0x0002, 0x0000, "UL", struct.pack("<I", len(body))) + body


def part10(meta, dataset):
    return b"\x00" * 128 + b"DICM" + meta + dataset


# --- explicit LE series, shuffled instance numbers -----------------------
order = [4, 2, 1, 3]  # file s{i}.dcm carries InstanceNumber order[i-1]
for i, inst in enumerate(order, start=1):
    z = inst - 1
    px = b"".join(struct.pack("<h", v) for v in vox(z))
    ds = b"".join([
        el_explicit(0x0008, 0x0060, "CS", b"OT"),
        el_explicit(0x0018, 0x0050, "DS", b"3.0"),
        el_explicit(0x0020, 0x0013, "IS", str(inst).encode()),
        el_explicit(0x0020, 0x0032, "DS", f"0\\0\\{z * 3.0}".encode()),
        el_explicit(0x0028, 0x0002, "US", struct.pack("<H", 1)),
        el_explicit(0x0028, 0x0004, "CS", b"MONOCHROME2"),
        el_explicit(0x0028, 0x0010, "US", struct.pack("<H", NY)),
        el_explicit(0x0028, 0x0011, "US", struct.pack("<H", NX)),
        el_explicit(0x0028, 0x0030, "DS", b"2.5\\1.5"),
        el_explicit(0x0028, 0x0100, "US", struct.pack("<H", 16)),
        el_explicit(0x0028, 0x0103, "US", struct.pack("<H", 1)),
        el_explicit(0x7FE0, 0x0010, "OW", px),
    ])
    (OUT / "series" / f"s{i}.dcm").write_bytes(
        part10(meta_group("1.2.840.10008.1.2.1"), ds))

# --- implicit LE multi-frame with a nested undefined-length SQ -----------
frames = b"".join(struct.pack("<B", v) for z in range(3) for v in vox(z))
item = el_implicit(0x0008, 0x0100, b"SEQITEM")
undef = struct.pack("<I", 0xFFFFFFFF)
sq = (struct.pack("<HH", 0x0040, 0x0260) + undef +          # SQ, undefined len
      struct.pack("<HH", 0xFFFE, 0xE000) + undef +          # item, undefined len
      item +
      struct.pack("<HHI", 0xFFFE, 0xE00D, 0) +              # item delimiter
      struct.pack("<HHI", 0xFFFE, 0xE0DD, 0))               # sequence delimiter
ds = b"".join([
    el_implicit(0x0028, 0x0002, struct.pack("<H", 1)),
    el_implicit(0x0028, 0x0004, b"MONOCHROME2"),
    el_implicit(0x0028, 0x0008, b"3"),
    el_implicit(0x0028, 0x0010, struct.pack("<H", NY)),
    el_implicit(0x0028, 0x0011, struct.pack("<H", NX)),
    el_implicit(0x0028, 0x0030, b"1.0\\1.0"),
    el_implicit(0x0028, 0x0100, struct.pack("<H", 8)),
    el_implicit(0x0028, 0x0103, struct.pack("<H", 0)),
    el_implicit(0x0028, 0x1052, b"10"),
    el_implicit(0x0028, 0x1053, b"2"),
    sq,
    el_implicit(0x7FE0, 0x0010, frames),
])
(OUT / "mf.dcm").write_bytes(part10(meta_group("1.2.840.10008.1.2"), ds))

# --- explicit BIG endian single slice ------------------------------------
px = b"".join(struct.pack(">h", v) for v in vox(0))
ds = b"".join([
    el_explicit(0x0028, 0x0002, "US", struct.pack(">H", 1), be=True),
    el_explicit(0x0028, 0x0004, "CS", b"MONOCHROME2", be=True),
    el_explicit(0x0028, 0x0010, "US", struct.pack(">H", NY), be=True),
    el_explicit(0x0028, 0x0011, "US", struct.pack(">H", NX), be=True),
    el_explicit(0x0028, 0x0100, "US", struct.pack(">H", 16), be=True),
    el_explicit(0x0028, 0x0103, "US", struct.pack(">H", 1), be=True),
    el_explicit(0x7FE0, 0x0010, "OW", px, be=True),
])
(OUT / "be.dcm").write_bytes(part10(meta_group("1.2.840.10008.1.2.2"), ds))

# --- RLE Lossless slice (PS3.5 Annex G, independent implementation) ------


def packbits(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while i + run < len(data) and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 3:
            out.append((1 - run) & 0xFF)
            out.append(data[i])
            i += run
        else:
            start = i
            lit = 0
            while i < len(data) and lit < 128 and not (
                i + 2 < len(data) and data[i] == data[i + 1] == data[i + 2]
            ):
                i += 1
                lit += 1
            out.append(lit - 1)
            out += data[start:i]
    return bytes(out)


vals = vox(0)
msb = bytes((v >> 8) & 0xFF for v in vals)
lsb = bytes(v & 0xFF for v in vals)
segs = [packbits(msb), packbits(lsb)]
segs = [s + b"\x00" if len(s) % 2 else s for s in segs]
rle_frame = struct.pack("<2I", 2, 64) + struct.pack("<I", 64 + len(segs[0])) \
    + b"\x00" * 4 * 13 + segs[0] + segs[1]
if len(rle_frame) % 2:
    rle_frame += b"\x00"
encap = (struct.pack("<HHI", 0xFFFE, 0xE000, 0)            # empty offset table
         + struct.pack("<HHI", 0xFFFE, 0xE000, len(rle_frame)) + rle_frame
         + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0))
pixel_el = struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00" \
    + struct.pack("<I", 0xFFFFFFFF) + encap
ds = b"".join([
    el_explicit(0x0028, 0x0002, "US", struct.pack("<H", 1)),
    el_explicit(0x0028, 0x0004, "CS", b"MONOCHROME2"),
    el_explicit(0x0028, 0x0010, "US", struct.pack("<H", NY)),
    el_explicit(0x0028, 0x0011, "US", struct.pack("<H", NX)),
    el_explicit(0x0028, 0x0100, "US", struct.pack("<H", 16)),
    el_explicit(0x0028, 0x0103, "US", struct.pack("<H", 1)),
    pixel_el,
])
(OUT / "rle.dcm").write_bytes(part10(meta_group("1.2.840.10008.1.2.5"), ds))

# --- JPEG-LS Lossless slice (independent T.87 encoder) --------------------
# signed int16 with NEGATIVE values: the stream stores the 16-bit
# two's-complement pattern, pinning the reader's signed reinterpretation
import sys
sys.path.insert(0, str(Path(__file__).resolve().parent))
from make_jpegls_fixture import encode as jls_encode  # noqa: E402

vals_s = [v - 60 for v in vox(2)]  # range [-60, 65]
jls, _ = jls_encode([v & 0xFFFF for v in vals_s], NX, NY, 16)
if len(jls) % 2:
    jls += b"\x00"
encap = (struct.pack("<HHI", 0xFFFE, 0xE000, 0)
         + struct.pack("<HHI", 0xFFFE, 0xE000, len(jls)) + jls
         + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0))
pixel_el = struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00" \
    + struct.pack("<I", 0xFFFFFFFF) + encap
ds = b"".join([
    el_explicit(0x0028, 0x0002, "US", struct.pack("<H", 1)),
    el_explicit(0x0028, 0x0004, "CS", b"MONOCHROME2"),
    el_explicit(0x0028, 0x0010, "US", struct.pack("<H", NY)),
    el_explicit(0x0028, 0x0011, "US", struct.pack("<H", NX)),
    el_explicit(0x0028, 0x0100, "US", struct.pack("<H", 16)),
    el_explicit(0x0028, 0x0103, "US", struct.pack("<H", 1)),
    pixel_el,
])
(OUT / "jls.dcm").write_bytes(part10(meta_group("1.2.840.10008.1.2.4.80"), ds))

# --- JPEG Lossless (T.81 process 14, SV1) slice ---------------------------
from make_jpeglossless_fixture import encode as jlo_encode  # noqa: E402

vals_l = [v - 45 for v in vox(1)]  # negatives again
jlo, = (jlo_encode([v & 0xFFFF for v in vals_l], NX, NY, 16, 1),)
if len(jlo) % 2:
    jlo += b"\x00"
encap = (struct.pack("<HHI", 0xFFFE, 0xE000, 0)
         + struct.pack("<HHI", 0xFFFE, 0xE000, len(jlo)) + jlo
         + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0))
pixel_el = struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00" \
    + struct.pack("<I", 0xFFFFFFFF) + encap
ds = b"".join([
    el_explicit(0x0028, 0x0002, "US", struct.pack("<H", 1)),
    el_explicit(0x0028, 0x0004, "CS", b"MONOCHROME2"),
    el_explicit(0x0028, 0x0010, "US", struct.pack("<H", NY)),
    el_explicit(0x0028, 0x0011, "US", struct.pack("<H", NX)),
    el_explicit(0x0028, 0x0100, "US", struct.pack("<H", 16)),
    el_explicit(0x0028, 0x0103, "US", struct.pack("<H", 1)),
    pixel_el,
])
(OUT / "jlo.dcm").write_bytes(part10(meta_group("1.2.840.10008.1.2.4.70"), ds))

# --- multi-fragment encapsulation: split frames + Basic Offset Table ------
# Large frames legally split across fragments; readers must both
# concatenate single-frame splits and use the BOT to delimit frames
# when counts disagree.


def even_split(blob, n):
    """n chunks, all but last at even boundaries."""
    step = (len(blob) // n) & ~1
    cuts = [step * i for i in range(n)] + [len(blob)]
    return [blob[cuts[i]:cuts[i + 1]] for i in range(n)]


def encap_multi(frames_frags):
    frags = []
    for frs in frames_frags:
        frags.append([f + b"\x00" if len(f) % 2 else f for f in frs])
    bot = bytearray()
    pos = 0
    for frs in frags:
        bot += struct.pack("<I", pos)
        for f in frs:
            pos += 8 + len(f)
    out = bytearray()
    out += struct.pack("<HHI", 0xFFFE, 0xE000, len(bot)) + bot
    for frs in frags:
        for f in frs:
            out += struct.pack("<HHI", 0xFFFE, 0xE000, len(f)) + f
    out += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    return struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00" \
        + struct.pack("<I", 0xFFFFFFFF) + bytes(out)


def jls_ds(pixel_el, nframes=None):
    els = [
        el_explicit(0x0028, 0x0002, "US", struct.pack("<H", 1)),
        el_explicit(0x0028, 0x0004, "CS", b"MONOCHROME2"),
    ]
    if nframes:
        els.append(el_explicit(0x0028, 0x0008, "IS", str(nframes).encode()))
    els += [
        el_explicit(0x0028, 0x0010, "US", struct.pack("<H", NY)),
        el_explicit(0x0028, 0x0011, "US", struct.pack("<H", NX)),
        el_explicit(0x0028, 0x0100, "US", struct.pack("<H", 16)),
        el_explicit(0x0028, 0x0103, "US", struct.pack("<H", 1)),
        pixel_el,
    ]
    return b"".join(els)


# one frame (z=0 pattern) split into 3 fragments
jls0, _ = jls_encode([v & 0xFFFF for v in vox(0)], NX, NY, 16)
(OUT / "jls_frag1.dcm").write_bytes(part10(
    meta_group("1.2.840.10008.1.2.4.80"),
    jls_ds(encap_multi([even_split(jls0, 3)]))))

# two frames (z=0, z=1), each split into 2 fragments, BOT delimits
jls1, _ = jls_encode([v & 0xFFFF for v in vox(1)], NX, NY, 16)
(OUT / "jls_frag2.dcm").write_bytes(part10(
    meta_group("1.2.840.10008.1.2.4.80"),
    jls_ds(encap_multi([even_split(jls0, 2), even_split(jls1, 2)]),
           nframes=2)))

# --- 12-bit extended sequential JPEG slice (.4.51) -------------------------
from make_jpegext_fixture import encode as jext_encode  # noqa: E402

# four uniform NYxNX-ish quadrants scaled into 12-bit range: DC-only
# blocks after edge padding, so the reconstruction error is bounded
# by DC quantization rounding; the .raw expectation is the encoder's
# own reconstruction (exact parity with the decoder)
img12 = [((v + 10) * 30) for v in vox(3)]
jext, recon12 = jext_encode(img12, NX, NY)
if len(jext) % 2:
    jext += b"\x00"
with open(OUT / "jext_recon.raw", "wb") as f:
    for v in recon12:
        f.write(struct.pack(">H", v))
encap = (struct.pack("<HHI", 0xFFFE, 0xE000, 0)
         + struct.pack("<HHI", 0xFFFE, 0xE000, len(jext)) + jext
         + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0))
pixel_el = struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00" \
    + struct.pack("<I", 0xFFFFFFFF) + encap
ds = b"".join([
    el_explicit(0x0028, 0x0002, "US", struct.pack("<H", 1)),
    el_explicit(0x0028, 0x0004, "CS", b"MONOCHROME2"),
    el_explicit(0x0028, 0x0010, "US", struct.pack("<H", NY)),
    el_explicit(0x0028, 0x0011, "US", struct.pack("<H", NX)),
    el_explicit(0x0028, 0x0100, "US", struct.pack("<H", 16)),
    el_explicit(0x0028, 0x0101, "US", struct.pack("<H", 12)),
    el_explicit(0x0028, 0x0103, "US", struct.pack("<H", 0)),
    pixel_el,
])
(OUT / "jext.dcm").write_bytes(part10(meta_group("1.2.840.10008.1.2.4.51"), ds))

# --- Deflated Explicit VR LE: whole dataset is one raw-deflate stream -----
import zlib  # noqa: E402

px_d = b"".join(struct.pack("<h", v - 20) for v in vox(2))
ds = b"".join([
    el_explicit(0x0028, 0x0002, "US", struct.pack("<H", 1)),
    el_explicit(0x0028, 0x0004, "CS", b"MONOCHROME2"),
    el_explicit(0x0028, 0x0010, "US", struct.pack("<H", NY)),
    el_explicit(0x0028, 0x0011, "US", struct.pack("<H", NX)),
    el_explicit(0x0028, 0x0100, "US", struct.pack("<H", 16)),
    el_explicit(0x0028, 0x0103, "US", struct.pack("<H", 1)),
    el_explicit(0x7FE0, 0x0010, "OW", px_d),
])
comp = zlib.compressobj(6, zlib.DEFLATED, -15)  # raw deflate, no header
(OUT / "defl.dcm").write_bytes(part10(
    meta_group("1.2.840.10008.1.2.1.99"),
    comp.compress(ds) + comp.flush()))

# --- RGB color slices: interleaved, planar, RLE color planes --------------
def rgbv(x, y, c):
    return (3 * x + 7 * y + 41 * c) % 256


rgb_inter = bytes(rgbv(x, y, c)
                  for y in range(NY) for x in range(NX) for c in range(3))


def color_ds(pixel_el, planar=None):
    els = [
        el_explicit(0x0028, 0x0002, "US", struct.pack("<H", 3)),
        el_explicit(0x0028, 0x0004, "CS", b"RGB"),
    ]
    if planar is not None:
        els.append(el_explicit(0x0028, 0x0006, "US", struct.pack("<H", planar)))
    els += [
        el_explicit(0x0028, 0x0010, "US", struct.pack("<H", NY)),
        el_explicit(0x0028, 0x0011, "US", struct.pack("<H", NX)),
        el_explicit(0x0028, 0x0100, "US", struct.pack("<H", 8)),
        el_explicit(0x0028, 0x0103, "US", struct.pack("<H", 0)),
        pixel_el,
    ]
    return b"".join(els)


(OUT / "rgb.dcm").write_bytes(part10(
    meta_group("1.2.840.10008.1.2.1"),
    color_ds(el_explicit(0x7FE0, 0x0010, "OB", rgb_inter), planar=0)))

rgb_planar = bytes(rgbv(x, y, c)
                   for c in range(3) for y in range(NY) for x in range(NX))
(OUT / "rgbp.dcm").write_bytes(part10(
    meta_group("1.2.840.10008.1.2.1"),
    color_ds(el_explicit(0x7FE0, 0x0010, "OB", rgb_planar), planar=1)))

# RLE color: three PackBits byte planes R, G, B (Annex G composite order)
planes = [bytes(rgbv(x, y, c) for y in range(NY) for x in range(NX))
          for c in range(3)]
segs = [packbits(pl) for pl in planes]
segs = [sg + b"\x00" if len(sg) % 2 else sg for sg in segs]
hdr = struct.pack("<I", 3)
off = 64
for sg in segs:
    hdr += struct.pack("<I", off)
    off += len(sg)
hdr += b"\x00" * (64 - len(hdr))
rle_c = hdr + b"".join(segs)
if len(rle_c) % 2:
    rle_c += b"\x00"
encap = (struct.pack("<HHI", 0xFFFE, 0xE000, 0)
         + struct.pack("<HHI", 0xFFFE, 0xE000, len(rle_c)) + rle_c
         + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0))
pixel_el = struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00" \
    + struct.pack("<I", 0xFFFFFFFF) + encap
(OUT / "rgbrle.dcm").write_bytes(part10(
    meta_group("1.2.840.10008.1.2.5"), color_ds(pixel_el, planar=0)))

# --- JPEG 2000 Lossless slice (reversible 5/3, signed component) ----------
from j2k import encode as j2k_encode  # noqa: E402

vals_k = [v - 55 for v in vox(0)]  # negatives: signed J2K component
j2c = j2k_encode(vals_k, NX, NY, 16, signed=True, levels=2, cbw=4, cbh=4)
if len(j2c) % 2:
    j2c += b"\x00"
encap = (struct.pack("<HHI", 0xFFFE, 0xE000, 0)
         + struct.pack("<HHI", 0xFFFE, 0xE000, len(j2c)) + j2c
         + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0))
pixel_el = struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00" \
    + struct.pack("<I", 0xFFFFFFFF) + encap
ds = b"".join([
    el_explicit(0x0028, 0x0002, "US", struct.pack("<H", 1)),
    el_explicit(0x0028, 0x0004, "CS", b"MONOCHROME2"),
    el_explicit(0x0028, 0x0010, "US", struct.pack("<H", NY)),
    el_explicit(0x0028, 0x0011, "US", struct.pack("<H", NX)),
    el_explicit(0x0028, 0x0100, "US", struct.pack("<H", 16)),
    el_explicit(0x0028, 0x0103, "US", struct.pack("<H", 1)),
    pixel_el,
])
(OUT / "j2k.dcm").write_bytes(part10(meta_group("1.2.840.10008.1.2.4.90"), ds))

# --- JPEG 2000 color slice: 3 components with the reversible CT -----------
rgb_planes = [[rgbv(x, y, c) for y in range(NY) for x in range(NX)]
              for c in range(3)]
j2c_rgb = j2k_encode(rgb_planes, NX, NY, 8, levels=1, cbw=4, cbh=4,
                     ncomp=3, mct=True)
if len(j2c_rgb) % 2:
    j2c_rgb += b"\x00"
encap = (struct.pack("<HHI", 0xFFFE, 0xE000, 0)
         + struct.pack("<HHI", 0xFFFE, 0xE000, len(j2c_rgb)) + j2c_rgb
         + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0))
pixel_el = struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00" \
    + struct.pack("<I", 0xFFFFFFFF) + encap
ds = b"".join([
    el_explicit(0x0028, 0x0002, "US", struct.pack("<H", 3)),
    el_explicit(0x0028, 0x0004, "CS", b"YBR_RCT"),
    el_explicit(0x0028, 0x0010, "US", struct.pack("<H", NY)),
    el_explicit(0x0028, 0x0011, "US", struct.pack("<H", NX)),
    el_explicit(0x0028, 0x0100, "US", struct.pack("<H", 8)),
    el_explicit(0x0028, 0x0103, "US", struct.pack("<H", 0)),
    pixel_el,
])
(OUT / "j2krgb.dcm").write_bytes(part10(
    meta_group("1.2.840.10008.1.2.4.90"), ds))

# --- JPEG 2000 lossy slice (.4.91): irreversible 9/7, quantized -----------
# j2klossy_recon.raw commits the Python decoder's reconstruction
# (big-endian int16); the Scala decode must match it bit-for-bit.
from j2k import decode as j2k_decode  # noqa: E402

vals_l = [v - 55 for v in vox(0)]
j2c_l = j2k_encode(vals_l, NX, NY, 16, signed=True, levels=2, cbw=4, cbh=4,
                   transform="97", quant=("expounded", 15, 512))
recon_l = j2k_decode(j2c_l)[4]
raw_l = bytearray()
for vv in recon_l:
    raw_l += struct.pack(">h", vv)
(OUT / "j2klossy_recon.raw").write_bytes(bytes(raw_l))
if len(j2c_l) % 2:
    j2c_l += b"\x00"
encap = (struct.pack("<HHI", 0xFFFE, 0xE000, 0)
         + struct.pack("<HHI", 0xFFFE, 0xE000, len(j2c_l)) + j2c_l
         + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0))
pixel_el = struct.pack("<HH", 0x7FE0, 0x0010) + b"OB\x00\x00" \
    + struct.pack("<I", 0xFFFFFFFF) + encap
ds = b"".join([
    el_explicit(0x0028, 0x0002, "US", struct.pack("<H", 1)),
    el_explicit(0x0028, 0x0004, "CS", b"MONOCHROME2"),
    el_explicit(0x0028, 0x0010, "US", struct.pack("<H", NY)),
    el_explicit(0x0028, 0x0011, "US", struct.pack("<H", NX)),
    el_explicit(0x0028, 0x0100, "US", struct.pack("<H", 16)),
    el_explicit(0x0028, 0x0103, "US", struct.pack("<H", 1)),
    pixel_el,
])
(OUT / "j2klossy.dcm").write_bytes(part10(
    meta_group("1.2.840.10008.1.2.4.91"), ds))

# --- still-unsupported syntax (MPEG2 video): must refuse -------------------
(OUT / "mpeg.dcm").write_bytes(part10(
    meta_group("1.2.840.10008.1.2.4.100"),
    el_explicit(0x0028, 0x0010, "US", struct.pack("<H", NY))))

# --- JPEG baseline header without PixelData: refuses on the element ------
(OUT / "jpeg.dcm").write_bytes(part10(
    meta_group("1.2.840.10008.1.2.4.50"),
    el_explicit(0x0028, 0x0010, "US", struct.pack("<H", NY))))

print("wrote", sorted(str(p.relative_to(OUT)) for p in OUT.rglob("*.dcm")))
