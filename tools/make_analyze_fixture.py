#!/usr/bin/env python3
"""Committed Analyze 7.5 / NIfTI-1 dual-file pair fixtures for
NiftiIOSpec — pure stdlib, per the public analyze75 and nifti1.h
layouts.

Fixtures (src/test/resources/fixtures/):
  pair.hdr + pair.img      Analyze 7.5 (blank magic): int16 LE 6x5x4,
                           pixdim (1.5, 2.5, 3.5); payload at offset 0
                           of .img; v = (x*7 + y*11 + z*13) % 200
  pair_n1.hdr + pair_n1.img.gz  NIfTI-1 "ni1" pair with sform scale
                           (2,3,4), translation (10,-5,2.5), gzipped
                           payload; same voxels
"""
import gzip
import struct
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "src/test/resources/fixtures"

NX, NY, NZ = 6, 5, 4


def vox():
    return [
        (x * 7 + y * 11 + z * 13) % 200
        for z in range(NZ) for y in range(NY) for x in range(NX)
    ]


payload = b"".join(struct.pack("<h", v) for v in vox())

# --- Analyze 7.5: blank magic, pixdim spacing ---------------------------
h = bytearray(348)
struct.pack_into("<i", h, 0, 348)
struct.pack_into("<10s", h, 4, b"dsr")       # data_type (unused)
struct.pack_into("<8h", h, 40, 3, NX, NY, NZ, 1, 1, 1, 1)
struct.pack_into("<h", h, 70, 4)             # DT_SIGNED_SHORT
struct.pack_into("<h", h, 72, 16)            # bitpix
struct.pack_into("<8f", h, 76, 1.0, 1.5, 2.5, 3.5, 1.0, 1.0, 1.0, 1.0)
struct.pack_into("<f", h, 124, 90.0)         # cal_max
struct.pack_into("<f", h, 128, 0.0)          # cal_min
# magic bytes at 344 stay zero -> Analyze
(OUT / "pair.hdr").write_bytes(bytes(h))
(OUT / "pair.img").write_bytes(payload)

# --- NIfTI-1 "ni1" pair: sform affine, gzipped payload ------------------
h = bytearray(348)
struct.pack_into("<i", h, 0, 348)
struct.pack_into("<8h", h, 40, 3, NX, NY, NZ, 1, 1, 1, 1)
struct.pack_into("<h", h, 70, 4)
struct.pack_into("<h", h, 72, 16)
struct.pack_into("<8f", h, 76, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)
struct.pack_into("<f", h, 108, 0.0)          # vox_offset: .img starts at 0
struct.pack_into("<h", h, 254, 1)            # sform_code
struct.pack_into("<4f", h, 280, 2.0, 0.0, 0.0, 10.0)   # srow_x
struct.pack_into("<4f", h, 296, 0.0, 3.0, 0.0, -5.0)   # srow_y
struct.pack_into("<4f", h, 312, 0.0, 0.0, 4.0, 2.5)    # srow_z
struct.pack_into("<4s", h, 344, b"ni1\x00")
(OUT / "pair_n1.hdr").write_bytes(bytes(h))
(OUT / "pair_n1.img.gz").write_bytes(gzip.compress(payload, 6, mtime=0))

print("wrote", OUT / "pair.hdr")
