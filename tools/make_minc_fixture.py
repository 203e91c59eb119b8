#!/usr/bin/env python3
"""Committed MINC1 fixtures (pure-stdlib NetCDF classic bytes) for
MincIOSpec — an independent second implementation of the CDF-1 layout:

    vol.mnc        NC_SHORT image (zspace,yspace,xspace), valid_range
                   (0,4095), scalar image-min/image-max 0-dim doubles
                   (0, 819) -> real = raw * 0.2, float32 output;
                   step/start/units attrs on the dimension variables
    vol.mnc.gz     gzip twin
    volf.mnc       NC_FLOAT image, no normalization, raw floats
    slice.mnc      per-slice image-min (dim'd over zspace) -> refuses

    raw v(x,y,z) = (7x + 11y + 13z) % 200   (the shared volume)
"""
import gzip
import struct
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "src/test/resources/fixtures/vol"
OUT.mkdir(parents=True, exist_ok=True)

NX, NY, NZ = 6, 5, 4
NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 4, 6: 8}


def vox():
    return [(x * 7 + y * 11 + z * 13) % 200
            for z in range(NZ) for y in range(NY) for x in range(NX)]


def pad4(b):
    return b + b"\x00" * (-len(b) % 4)


def name(s):
    return struct.pack(">i", len(s)) + pad4(s.encode())


def att(nm, typ, vals):
    if typ == NC_CHAR:
        body = pad4(vals.encode())
        n = len(vals)
    else:
        fmt = {NC_SHORT: ">h", NC_INT: ">i", NC_FLOAT: ">f", NC_DOUBLE: ">d"}[typ]
        body = pad4(b"".join(struct.pack(fmt, v) for v in vals))
        n = len(vals)
    return name(nm) + struct.pack(">ii", typ, n) + body


def att_list(atts):
    if not atts:
        return struct.pack(">ii", 0, 0)
    return struct.pack(">ii", 0x0C, len(atts)) + b"".join(atts)


def var(nm, dimids, atts, typ, vsize, begin):
    return (name(nm) + struct.pack(">i", len(dimids)) +
            b"".join(struct.pack(">i", d) for d in dimids) +
            att_list(atts) + struct.pack(">iii", typ, vsize, begin))


def build(image_typ, image_pack, normalize, per_slice=False):
    dims = [("zspace", NZ), ("yspace", NY), ("xspace", NX)]
    dim_list = struct.pack(">ii", 0x0A, len(dims)) + b"".join(
        name(n) + struct.pack(">i", s) for n, s in dims)

    def dim_var(nm, step, start):
        return (nm, [], [att("step", NC_DOUBLE, [step]),
                         att("start", NC_DOUBLE, [start]),
                         att("units", NC_CHAR, "mm")], NC_INT, 4)

    specs = [dim_var("xspace", 0.5, 1.0), dim_var("yspace", 0.75, 2.0),
             dim_var("zspace", 1.25, 3.0)]
    if normalize:
        if per_slice:
            specs.append(("image-min", [0], [], NC_DOUBLE, 8 * NZ))
        else:
            specs.append(("image-min", [], [], NC_DOUBLE, 8))
        specs.append(("image-max", [], [], NC_DOUBLE, 8))
    n = NX * NY * NZ
    img_vsize = (n * SIZES[image_typ] + 3) // 4 * 4
    specs.append(("image", [0, 1, 2],
                  [att("valid_range", NC_DOUBLE, [0.0, 4095.0])], image_typ, img_vsize))

    # two passes: header length is independent of begin values
    def header(begins):
        vl = struct.pack(">ii", 0x0B, len(specs)) + b"".join(
            var(nm, dimids, atts, typ, vsize, begins[i])
            for i, (nm, dimids, atts, typ, vsize) in enumerate(specs))
        return b"CDF\x01" + struct.pack(">i", 0) + dim_list + \
            struct.pack(">ii", 0, 0) + vl

    hlen = len(header([0] * len(specs)))
    begins, off = [], hlen
    for _, _, _, _, vsize in specs:
        begins.append(off)
        off += vsize
    out = header(begins)
    for i, (nm, dimids, atts, typ, vsize) in enumerate(specs):
        if nm == "image":
            out += pad4(b"".join(image_pack(v) for v in vox()))
        elif nm == "image-min":
            out += struct.pack(">d", 0.0) * (NZ if per_slice else 1)
        elif nm == "image-max":
            out += struct.pack(">d", 819.0)
        else:
            out += struct.pack(">i", 0)
    return out


short_mnc = build(NC_SHORT, lambda v: struct.pack(">h", v), normalize=True)
(OUT / "vol.mnc").write_bytes(short_mnc)
(OUT / "vol.mnc.gz").write_bytes(gzip.compress(short_mnc, mtime=0))
(OUT / "volf.mnc").write_bytes(
    build(NC_FLOAT, lambda v: struct.pack(">f", float(v)), normalize=False))
(OUT / "slice.mnc").write_bytes(
    build(NC_SHORT, lambda v: struct.pack(">h", v), normalize=True, per_slice=True))
print("wrote vol.mnc vol.mnc.gz volf.mnc slice.mnc")
