#!/usr/bin/env python3
"""Committed fixtures for VolumeFormats (NRRD / MetaImage / MGH) —
pure-stdlib byte construction, one shared synthetic volume so the spec
can assert cross-format equality:

    shape (x,y,z) = (6,5,4), fastest-first on disk (x fastest)
    v(x,y,z) = (x*7 + y*11 + z*13) % 200

Files (src/test/resources/fixtures/vol/):
    vol.nrrd       attached gzip,   int16 big-endian, space directions + origin
    vol.nhdr+.raw  detached raw,    uint8 little-endian, spacings
    vol.mha        attached raw,    float32 LE, ElementSpacing/Offset
    volc.mha       attached zlib,   int16 MSB
    vol.mhd+.raw   detached raw,    uint16 LE
    vol.mgh        raw,             int16 BE, goodRAS spacing, 2 frames
    vol.mgz        gzip of vol.mgh
"""
import gzip
import struct
import zlib
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "src/test/resources/fixtures/vol"
OUT.mkdir(parents=True, exist_ok=True)

NX, NY, NZ = 6, 5, 4


def vox(frame=0):
    # Fortran order: x fastest
    return [
        (x * 7 + y * 11 + z * 13 + frame * 17) % 200
        for z in range(NZ) for y in range(NY) for x in range(NX)
    ]


def pack(vals, fmt):
    return b"".join(struct.pack(fmt, v) for v in vals)


# --- NRRD: attached gzip, int16 big endian -------------------------------
header = (
    "NRRD0004\n"
    "# deterministic fixture (make_volume_fixture.py)\n"
    "type: short\n"
    "dimension: 3\n"
    "space: left-posterior-superior\n"
    f"sizes: {NX} {NY} {NZ}\n"
    "space directions: (1.5,0,0) (0,2.5,0) (0,0,3.5)\n"
    "space origin: (10,20,30)\n"
    'space units: "mm" "mm" "um"\n'
    "endian: big\n"
    "encoding: gzip\n"
    "\n"
)
(OUT / "vol.nrrd").write_bytes(
    header.encode() + gzip.compress(pack(vox(), ">h"), mtime=0))

# --- NRRD: detached raw uint8, spacings ----------------------------------
(OUT / "vol.raw").write_bytes(pack(vox(), "<B"))
(OUT / "vol.nhdr").write_bytes((
    "NRRD0004\n"
    "type: uint8\n"
    "dimension: 3\n"
    f"sizes: {NX} {NY} {NZ}\n"
    "spacings: 0.5 0.6 0.7\n"
    "encoding: raw\n"
    "data file: vol.raw\n"
    "\n"
).encode())

# --- MetaImage: attached raw float32 LE ----------------------------------
(OUT / "vol.mha").write_bytes((
    "ObjectType = Image\n"
    "NDims = 3\n"
    f"DimSize = {NX} {NY} {NZ}\n"
    "ElementType = MET_FLOAT\n"
    "ElementSpacing = 1.25 2.25 3.25\n"
    "Offset = -1 -2 -3\n"
    "BinaryData = True\n"
    "BinaryDataByteOrderMSB = False\n"
    "ElementDataFile = LOCAL\n"
).encode() + pack([float(v) for v in vox()], "<f"))

# --- MetaImage: attached zlib-compressed int16 MSB -----------------------
payload = zlib.compress(pack(vox(), ">h"), 6)
(OUT / "volc.mha").write_bytes((
    "ObjectType = Image\n"
    "NDims = 3\n"
    f"DimSize = {NX} {NY} {NZ}\n"
    "ElementType = MET_SHORT\n"
    "ElementSpacing = 1 1 1\n"
    "BinaryDataByteOrderMSB = True\n"
    "CompressedData = True\n"
    f"CompressedDataSize = {len(payload)}\n"
    "ElementDataFile = LOCAL\n"
).encode() + payload)

# --- MetaImage: detached raw uint16 LE -----------------------------------
(OUT / "vol_mhd.raw").write_bytes(pack(vox(), "<H"))
(OUT / "vol.mhd").write_bytes((
    "ObjectType = Image\n"
    "NDims = 3\n"
    f"DimSize = {NX} {NY} {NZ}\n"
    "ElementType = MET_USHORT\n"
    "ElementSpacing = 2 2 2\n"
    "ElementDataFile = vol_mhd.raw\n"
).encode())

# --- MGH: int16 BE, goodRAS spacing, 2 frames ----------------------------
mgh = struct.pack(">iiiii", 1, NX, NY, NZ, 2)          # version, dims, nframes
mgh += struct.pack(">ii", 4, 0)                        # type=MRI_SHORT, dof
mgh += struct.pack(">h", 1)                            # goodRASFlag
mgh += struct.pack(">fff", 0.8, 0.9, 1.1)              # spacing
mgh += struct.pack(">fffffffff", 1, 0, 0, 0, 1, 0, 0, 0, 1)  # Mdc
mgh += struct.pack(">fff", 0, 0, 0)                    # Pxyz_c
mgh += b"\x00" * (284 - len(mgh))
mgh += pack(vox(0) + vox(1), ">h")
(OUT / "vol.mgh").write_bytes(mgh)
(OUT / "vol.mgz").write_bytes(gzip.compress(mgh, mtime=0))

# --- VTK legacy structured points: BINARY short (big-endian) -------------
vtk_header = (
    "# vtk DataFile Version 3.0\n"
    "deterministic fixture\n"
    "BINARY\n"
    "DATASET STRUCTURED_POINTS\n"
    f"DIMENSIONS {NX} {NY} {NZ}\n"
    "SPACING 0.4 0.5 0.6\n"
    "ORIGIN 1 2 3\n"
    f"POINT_DATA {NX*NY*NZ}\n"
    "SCALARS values short 1\n"
    "LOOKUP_TABLE default\n"
)
(OUT / "vol.vtk").write_bytes(vtk_header.encode() + pack(vox(), ">h"))

# --- GIPL: uint16 big-endian, 3-D + a gz twin ----------------------------
gipl = struct.pack(">HHHH", NX, NY, NZ, 1)
gipl += struct.pack(">H", 16)                          # image_type ushort
gipl += struct.pack(">ffff", 0.3, 0.7, 0.9, 1.0)       # pixdim
gipl += b"\x00" * 80                                   # patient
gipl += struct.pack(">20f", *([0.0] * 20))             # matrix
gipl += b"\x00\x00"                                    # flag1, flag2
gipl += struct.pack(">dd", 0.0, 199.0)                 # min, max
gipl += struct.pack(">dddd", 4.0, 5.0, 6.0, 0.0)       # origin
gipl += struct.pack(">ffff", 0.0, 0.0, 0.0, 0.0)       # pixval/gap/user
gipl += struct.pack(">I", 0x2AE389B8)                  # magic
assert len(gipl) == 256, len(gipl)
gipl += pack(vox(), ">H")
(OUT / "vol.gipl").write_bytes(gipl)
(OUT / "vol.gipl.gz").write_bytes(gzip.compress(gipl, mtime=0))

# --- ascii twins: NRRD text encoding + VTK ASCII format ------------------
(OUT / "vol_ascii.nrrd").write_bytes((
    "NRRD0004\n"
    "type: int\n"
    "dimension: 3\n"
    f"sizes: {NX} {NY} {NZ}\n"
    "spacings: 1 1 1\n"
    "encoding: ascii\n"
    "\n" + " ".join(str(v) for v in vox()) + "\n"
).encode())
(OUT / "vol_ascii.vtk").write_bytes((
    "# vtk DataFile Version 3.0\n"
    "ascii fixture\n"
    "ASCII\n"
    "DATASET STRUCTURED_POINTS\n"
    f"DIMENSIONS {NX} {NY} {NZ}\n"
    "SPACING 1 1 1\n"
    "ORIGIN 0 0 0\n"
    f"POINT_DATA {NX*NY*NZ}\n"
    "SCALARS values float 1\n"
    "LOOKUP_TABLE default\n"
    + "\n".join(str(float(v)) for v in vox()) + "\n"
).encode())

# --- MRC2014: float32 LE with extended header, int16 BE ------------------
def mrc(mode, fmt_end, stamp, extended=b""):
    h = struct.pack(fmt_end + "10i", NX, NY, NZ, mode, 0, 0, 0, NX, NY, NZ)
    h += struct.pack(fmt_end + "3f", NX * 1.2, NY * 1.4, NZ * 1.6)  # CELLA
    h += struct.pack(fmt_end + "3f", 90, 90, 90)                    # CELLB
    h += struct.pack(fmt_end + "3i", 1, 2, 3)                       # MAPC/R/S
    h += struct.pack(fmt_end + "3f", 0, 199, 99)                    # DMIN/MAX/MEAN
    h += struct.pack(fmt_end + "ii", 0, len(extended))              # ISPG, NSYMBT
    h += b"\x00" * (208 - len(h))
    h += b"MAP "
    h += stamp + b"\x00" * 3
    h += b"\x00" * (1024 - len(h))
    return h + extended

px_f = b"".join(struct.pack("<f", float(v)) for v in vox())
(OUT / "vol.mrc").write_bytes(mrc(2, "<", b"\x44", extended=b"\x00" * 80) + px_f)
px_s = b"".join(struct.pack(">h", v) for v in vox())
(OUT / "vol_be.mrc").write_bytes(mrc(1, ">", b"\x11") + px_s)

print("wrote", sorted(p.name for p in OUT.iterdir()))
