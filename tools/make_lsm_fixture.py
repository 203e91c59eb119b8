#!/usr/bin/env python3
"""Committed Zeiss LSM fixture for TiffIOSpec — pure-stdlib byte
construction from the public layout (LSM = little-endian classic TIFF
with the CZ_LSMINFO private tag 34412 on IFD 0, and a reduced-
resolution thumbnail IFD [NewSubfileType=1] interleaved after every
image IFD).

    vol.lsm   2 z-planes 8x6 uint8 v = (x*7 + y*11 + z*13) % 200,
              each followed by a 4x3 thumbnail of 0xEE bytes,
              voxel sizes 0.5e-6 / 0.7e-6 / 2.0e-6 m (x/y/z)
"""
import struct
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "src/test/resources/fixtures/vol"
OUT.mkdir(parents=True, exist_ok=True)

W, H, NZ = 8, 6, 2
TW, TH = 4, 3

planes = [
    bytes((x * 7 + y * 11 + z * 13) % 200 for y in range(H) for x in range(W))
    for z in range(NZ)
]
thumb = bytes([0xEE] * (TW * TH))

# CZ_LSMINFO head (88 bytes is plenty for the axes-bearing prefix)
lsm = bytearray(88)
struct.pack_into("<I", lsm, 0, 0x0400494C)   # magic
struct.pack_into("<i", lsm, 4, 88)           # structure size
struct.pack_into("<i", lsm, 8, W)            # DimensionX
struct.pack_into("<i", lsm, 12, H)           # DimensionY
struct.pack_into("<i", lsm, 16, NZ)          # DimensionZ
struct.pack_into("<i", lsm, 20, 1)           # DimensionChannels
struct.pack_into("<i", lsm, 24, 1)           # DimensionTime
struct.pack_into("<i", lsm, 28, 1)           # IntensityDataType: 8-bit
struct.pack_into("<I", lsm, 32, TW)          # ThumbnailX
struct.pack_into("<I", lsm, 36, TH)          # ThumbnailY
struct.pack_into("<d", lsm, 40, 0.5e-6)      # VoxelSizeX (meters)
struct.pack_into("<d", lsm, 48, 0.7e-6)      # VoxelSizeY
struct.pack_into("<d", lsm, 56, 2.0e-6)      # VoxelSizeZ


def entry(tag, typ, count, value):
    return struct.pack("<HHI", tag, typ, count) + struct.pack("<I", value)


out = bytearray()
out += struct.pack("<2sHI", b"II", 42, 8)

# layout plan: header(8) | IFD chain | lsm struct | pixel data
# 4 IFDs: image0 (11 entries incl. 34412), thumb0 (10), image1 (10), thumb1 (10)
ifd_sizes = [2 + 11 * 12 + 4, 2 + 10 * 12 + 4, 2 + 10 * 12 + 4, 2 + 10 * 12 + 4]
ifd_offs = []
pos = 8
for s in ifd_sizes:
    ifd_offs.append(pos)
    pos += s
lsm_off = pos
pos += len(lsm)
data_offs = []
for d in [planes[0], thumb, planes[1], thumb]:
    data_offs.append(pos)
    pos += len(d)


def ifd(image, data_off, w, h, nsft, extra, next_off):
    n = 10 + len(extra)
    b = struct.pack("<H", n)
    b += entry(254, 4, 1, nsft)
    b += entry(256, 3, 1, w)
    b += entry(257, 3, 1, h)
    b += entry(258, 3, 1, 8)
    b += entry(259, 3, 1, 1)          # uncompressed
    b += entry(262, 3, 1, 1)          # BlackIsZero
    b += entry(273, 4, 1, data_off)   # strip offset
    b += entry(277, 3, 1, 1)
    b += entry(278, 3, 1, h)          # one strip
    b += entry(279, 4, 1, w * h)
    for e in extra:
        b += e
    b += struct.pack("<I", next_off)
    return b


out += ifd(True, data_offs[0], W, H, 0,
           [entry(34412, 1, len(lsm), lsm_off)], ifd_offs[1])
out += ifd(False, data_offs[1], TW, TH, 1, [], ifd_offs[2])
out += ifd(True, data_offs[2], W, H, 0, [], ifd_offs[3])
out += ifd(False, data_offs[3], TW, TH, 1, [], 0)
assert len(out) == lsm_off, (len(out), lsm_off)
out += lsm
out += planes[0] + thumb + planes[1] + thumb

(OUT / "vol.lsm").write_bytes(bytes(out))
print("wrote", OUT / "vol.lsm", len(out), "bytes")

# ---- vol_planar.lsm: 2 channels stored PLANAR (PlanarConfiguration 2)
# 2 z planes, spp=2 per page, one strip per channel channel-major —
# the common Zeiss multichannel layout.
#     v = (x*7 + y*11 + z*13 + c*31) % 200

C = 2
strips = [
    bytes((x * 7 + y * 11 + z * 13 + c * 31) % 200
          for y in range(H) for x in range(W))
    for z in range(NZ) for c in range(C)
]

lsm2 = bytearray(lsm)
struct.pack_into("<i", lsm2, 20, C)          # DimensionChannels = 2

# layout: header | ifd0(13) thumb0(10) ifd1(12) thumb1(10) | lsm |
#         aux (2 offset arrays + 2 count arrays per image) | data
ifd_sizes2 = [2 + 13 * 12 + 4, 2 + 10 * 12 + 4, 2 + 12 * 12 + 4, 2 + 10 * 12 + 4]
pos = 8
ifd_offs2 = []
for s in ifd_sizes2:
    ifd_offs2.append(pos)
    pos += s
lsm_off2 = pos
pos += len(lsm2)
aux_off = pos
pos += 4 * 8  # so0, sc0, so1, sc1 (2 u32 each)
data_offs2 = []
for d in strips + [thumb, thumb]:
    data_offs2.append(pos)
    pos += len(d)


def entry2(tag, typ, count, payload4):
    return struct.pack("<HHI", tag, typ, count) + payload4


def img_ifd(z, extra, next_off):
    so = aux_off + (0 if z == 0 else 16)
    sc = so + 8
    n = 12 + len(extra)
    b = struct.pack("<H", n)
    b += entry(254, 4, 1, 0)
    b += entry(256, 3, 1, W)
    b += entry(257, 3, 1, H)
    b += entry2(258, 3, 2, struct.pack("<HH", 8, 8))
    b += entry(259, 3, 1, 1)
    b += entry(262, 3, 1, 1)
    b += entry(273, 4, 2, so)
    b += entry(277, 3, 1, C)
    b += entry(278, 3, 1, H)
    b += entry(279, 4, 2, sc)
    b += entry(284, 3, 1, 2)          # PLANAR
    b += entry(339, 3, 1, 1)
    for e in extra:
        b += e
    b += struct.pack("<I", next_off)
    return b


out = bytearray()
out += struct.pack("<2sHI", b"II", 42, 8)
out += img_ifd(0, [entry(34412, 1, len(lsm2), lsm_off2)], ifd_offs2[1])
out += ifd(False, data_offs2[4], TW, TH, 1, [], ifd_offs2[2])
out += img_ifd(1, [], ifd_offs2[3])
out += ifd(False, data_offs2[5], TW, TH, 1, [], 0)
assert len(out) == lsm_off2, (len(out), lsm_off2)
out += lsm2
out += struct.pack("<2I", data_offs2[0], data_offs2[1])  # z0 offsets
out += struct.pack("<2I", W * H, W * H)
out += struct.pack("<2I", data_offs2[2], data_offs2[3])  # z1 offsets
out += struct.pack("<2I", W * H, W * H)
for d in strips + [thumb, thumb]:
    out += d

(OUT / "vol_planar.lsm").write_bytes(bytes(out))
print("wrote", OUT / "vol_planar.lsm", len(out), "bytes")
