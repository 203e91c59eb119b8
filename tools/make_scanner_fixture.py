#!/usr/bin/env python3
"""Committed fixtures for ScannerFormats (BioRad PIC / Scanco ISQ /
Varian FDF) — pure-stdlib byte construction from the published
layouts, independent of the Scala reader. Shares the VolumeFormats
synthetic volume so the spec can assert cross-format equality:

    shape (x,y,z) = (6,5,4), fastest-first on disk (x fastest)
    v(x,y,z) = (x*7 + y*11 + z*13) % 200

Files (src/test/resources/fixtures/vol/):
    vol.pic       BioRad PIC uint8, AXIS_2/3/4 notes (0.5/0.6/0.7 microns)
    vol.isq       Scanco ISQ int16 LE, dims_um -> 1.5/2.5/3.5 mm spacing
    vol.fdf       Varian FDF float32 big-endian (no bigendian field),
                  span cm -> 1.5/2.5/3.5 mm spacing, origin {1,2,3} cm
    vol_le.fdf    Varian FDF int16 little-endian (bigendian = 0),
                  trailing junk-free, same voxels
"""
import struct
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "src/test/resources/fixtures/vol"
OUT.mkdir(parents=True, exist_ok=True)

NX, NY, NZ = 6, 5, 4


def vox():
    return [
        (x * 7 + y * 11 + z * 13) % 200
        for z in range(NZ) for y in range(NY) for x in range(NX)
    ]


# --- BioRad PIC: uint8, notes with AXIS_2/3/4 ---------------------------
header = bytearray(76)
struct.pack_into("<h", header, 0, NX)
struct.pack_into("<h", header, 2, NY)
struct.pack_into("<h", header, 4, NZ)
struct.pack_into("<i", header, 10, 1)      # notes present
struct.pack_into("<h", header, 14, 1)      # byte_format: 8-bit
struct.pack_into("<h", header, 54, 12345)  # file_id magic
payload = bytes(vox())
notes = bytearray()
axis_lines = [
    ("AXIS_2 001 1.000000e+01 5.000000e-01 microns", 1),
    ("AXIS_3 001 2.000000e+01 6.000000e-01 microns", 1),
    ("AXIS_4 001 3.000000e+01 7.000000e-01 microns", 0),
]
for text, more in axis_lines:
    rec = bytearray(96)
    struct.pack_into("<i", rec, 2, more)   # next flag
    struct.pack_into("<h", rec, 10, 20)    # NOTE_TYPE_VARIABLE
    rec[16:16 + len(text)] = text.encode("ascii")
    notes += rec
(OUT / "vol.pic").write_bytes(bytes(header) + payload + bytes(notes))

# --- Scanco ISQ: int16 LE, data offset 1 block --------------------------
isq = bytearray(1024)
isq[0:16] = b"CTDATA-HEADER_V1"
struct.pack_into("<i", isq, 16, 3)  # data type: short
for i, (p, um) in enumerate([(NX, 9000), (NY, 12500), (NZ, 14000)]):
    struct.pack_into("<i", isq, 44 + 4 * i, p)
    struct.pack_into("<i", isq, 56 + 4 * i, um)
struct.pack_into("<i", isq, 508, 1)  # payload at (1+1)*512 = 1024
(OUT / "vol.isq").write_bytes(
    bytes(isq) + b"".join(struct.pack("<h", v) for v in vox()))

# --- Varian FDF: float32 big-endian (no bigendian field) ----------------
fdf_header = (
    "#!/usr/local/fdf/startup\n"
    'char  *spatial_rank = "3dfov";\n'
    'char  *storage = "float";\n'
    "float  bits = 32;\n"
    "float  rank = 3;\n"
    f"float  matrix[] = {{{NX}, {NY}, {NZ}}};\n"
    "float  span[] = {0.90, 1.25, 1.40};\n"
    "float  origin[] = {1.0, 2.0, 3.0};\n"
    "int    checksum = 0;\n"
).encode("ascii") + b"\x0c\n\x00"
(OUT / "vol.fdf").write_bytes(
    fdf_header + b"".join(struct.pack(">f", float(v)) for v in vox()))

# --- Varian FDF: int16 little-endian (explicit bigendian = 0) -----------
fdf_header_le = (
    "#!/usr/local/fdf/startup\n"
    'char  *storage = "short";\n'
    "float  bits = 16;\n"
    "float  rank = 3;\n"
    f"float  matrix[] = {{{NX}, {NY}, {NZ}}};\n"
    "float  span[] = {0.90, 1.25, 1.40};\n"
    "float  origin[] = {0.0, 0.0, 0.0};\n"
    "int    bigendian = 0;\n"
).encode("ascii") + b"\x0c\n\x00"
(OUT / "vol_le.fdf").write_bytes(
    fdf_header_le + b"".join(struct.pack("<h", v) for v in vox()))

print("wrote", OUT)
