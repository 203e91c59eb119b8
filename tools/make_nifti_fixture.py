#!/usr/bin/env python3
"""Generate committed NIfTI-1/2 fixtures for NiftiIOSpec using only the
stdlib (struct + gzip), per the public NIfTI-1 and nifti2.h layouts.

Fixtures:
  anat.nii.gz  3D int16 7x6x5, sform scale (2,3,4) + translation
               (10,-5,2.5), scl_slope=2 scl_inter=10 (rescale path),
               cal_min=5 cal_max=50 (OMERO window), little-endian.
  ident.nii    3D uint8 16x8x4, no sform/qform (pixdim spacing
               1.5/1/1), identity scaling, no calibration.
  perm.nii     4D float32 4x3x2x2, sform flipping x (R-to-L) to
               exercise orientation extraction; identity scaling.
  anat2.nii.gz NIfTI-2 twin of anat.nii.gz: identical voxels and
               affine in the 540-byte header (int64 dims, double
               pixdim/scl/cal/srow) — the spec asserts both parse to
               the same image.
"""
import gzip
import struct
import sys
from pathlib import Path

OUT = Path(sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/fixtures")


def header(dims, datatype, bitpix, pixdim, scl=(0.0, 0.0), cal=(0.0, 0.0),
           sform=None):
    h = bytearray(348)
    struct.pack_into("<i", h, 0, 348)
    dim = [len(dims)] + list(dims) + [1] * (7 - len(dims))
    struct.pack_into("<8h", h, 40, *dim)
    struct.pack_into("<h", h, 70, datatype)
    struct.pack_into("<h", h, 72, bitpix)
    pd = [1.0] + list(pixdim) + [1.0] * (7 - len(pixdim))
    struct.pack_into("<8f", h, 76, *pd)
    struct.pack_into("<f", h, 108, 352.0)  # vox_offset
    struct.pack_into("<2f", h, 112, *scl)  # scl_slope, scl_inter
    struct.pack_into("<f", h, 124, cal[1])  # cal_max
    struct.pack_into("<f", h, 128, cal[0])  # cal_min
    struct.pack_into("<h", h, 252, 0)  # qform_code
    struct.pack_into("<h", h, 254, 1 if sform is not None else 0)
    if sform is not None:
        struct.pack_into("<4f", h, 280, *sform[0])
        struct.pack_into("<4f", h, 296, *sform[1])
        struct.pack_into("<4f", h, 312, *sform[2])
    h[344:348] = b"n+1\x00"
    return bytes(h) + b"\x00" * 4  # pad to vox_offset 352


def header2(dims, datatype, bitpix, pixdim, scl=(0.0, 0.0), cal=(0.0, 0.0),
            sform=None):
    """NIfTI-2 header per the public nifti2.h field offsets."""
    h = bytearray(540)
    struct.pack_into("<i", h, 0, 540)
    h[4:12] = b"n+2\x00\r\n\x1a\n"
    struct.pack_into("<h", h, 12, datatype)
    struct.pack_into("<h", h, 14, bitpix)
    dim = [len(dims)] + list(dims) + [1] * (7 - len(dims))
    struct.pack_into("<8q", h, 16, *dim)
    pd = [1.0] + list(pixdim) + [1.0] * (7 - len(pixdim))
    struct.pack_into("<8d", h, 104, *pd)
    struct.pack_into("<q", h, 168, 544)  # vox_offset (int64, 16-aligned)
    struct.pack_into("<2d", h, 176, *scl)  # scl_slope, scl_inter
    struct.pack_into("<d", h, 192, cal[1])  # cal_max
    struct.pack_into("<d", h, 200, cal[0])  # cal_min
    struct.pack_into("<i", h, 344, 0)  # qform_code
    struct.pack_into("<i", h, 348, 1 if sform is not None else 0)
    if sform is not None:
        struct.pack_into("<4d", h, 400, *sform[0])
        struct.pack_into("<4d", h, 432, *sform[1])
        struct.pack_into("<4d", h, 464, *sform[2])
    return bytes(h) + b"\x00" * 4  # pad to vox_offset 544


def fortran_values(dims, fn):
    # first dim fastest
    vals = []
    idx = [0] * len(dims)
    total = 1
    for d in dims:
        total *= d
    for _ in range(total):
        vals.append(fn(*idx))
        for k in range(len(dims)):
            idx[k] += 1
            if idx[k] == dims[k]:
                idx[k] = 0
            else:
                break
    return vals


def main():
    OUT.mkdir(parents=True, exist_ok=True)

    dims = (7, 6, 5)
    vals = fortran_values(dims, lambda i, j, k: (i + 10 * j + 100 * k) % 120 - 20)
    body = header(dims, 4, 16, (2.0, 3.0, 4.0), scl=(2.0, 10.0), cal=(5.0, 50.0),
                  sform=[(2.0, 0.0, 0.0, 10.0),
                         (0.0, 3.0, 0.0, -5.0),
                         (0.0, 0.0, 4.0, 2.5)])
    body += struct.pack(f"<{len(vals)}h", *vals)
    (OUT / "anat.nii.gz").write_bytes(gzip.compress(body, 6, mtime=0))

    dims = (16, 8, 4)
    vals = fortran_values(dims, lambda i, j, k: (i + 2 * j + 3 * k) % 256)
    body = header(dims, 2, 8, (1.5, 1.0, 1.0))
    body += struct.pack(f"<{len(vals)}B", *vals)
    (OUT / "ident.nii").write_bytes(body)

    dims = (4, 3, 2, 2)
    vals = fortran_values(dims, lambda i, j, k, t: i - j + 0.5 * k + 10.0 * t)
    body = header(dims, 16, 32, (2.0, 2.0, 2.0, 1.0),
                  sform=[(-2.0, 0.0, 0.0, 8.0),
                         (0.0, 2.0, 0.0, 0.0),
                         (0.0, 0.0, 2.0, 0.0)])
    body += struct.pack(f"<{len(vals)}f", *vals)
    (OUT / "perm.nii").write_bytes(body)

    # NIfTI-2 twin of anat: identical voxels, affine, scaling and
    # calibration in the 540-byte header
    dims = (7, 6, 5)
    vals = fortran_values(dims, lambda i, j, k: (i + 10 * j + 100 * k) % 120 - 20)
    body = header2(dims, 4, 16, (2.0, 3.0, 4.0), scl=(2.0, 10.0), cal=(5.0, 50.0),
                   sform=[(2.0, 0.0, 0.0, 10.0),
                          (0.0, 3.0, 0.0, -5.0),
                          (0.0, 0.0, 4.0, 2.5)])
    body += struct.pack(f"<{len(vals)}h", *vals)
    (OUT / "anat2.nii.gz").write_bytes(gzip.compress(body, 6, mtime=0))

    print("wrote", sorted(p.name for p in OUT.glob("*.nii*")))


if __name__ == "__main__":
    main()
