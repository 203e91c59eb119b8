#!/usr/bin/env python3
"""Generate committed TIFF fixtures for TiffIOSpec with only the
stdlib, per the public TIFF 6.0 / BigTIFF specs.

Fixtures:
  gray8_strips.tif    21x17 uint8, rowsPerStrip 5, uncompressed, II
  gray16_deflate.tif  16x12 uint16, deflate + predictor 2, MM (big-endian)
  rgb_packbits.tif    9x7 RGB uint8, PackBits
  gray8_lzw.tif       33x9 uint8, TIFF-LZW (early change)
  tiled_f32.tif       40x30 float32, 16x16 tiles, deflate
  multipage.tif       3 pages 8x6 uint8 -> z stack
  big.tif             BigTIFF (version 43) 10x5 uint8 uncompressed
"""
import os
import struct
import sys
import zlib
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from j2k import encode as j2k_encode  # noqa: E402

OUT = Path(sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/fixtures")


def pix_gray(w, h, fn):
    return [[fn(x, y) for x in range(w)] for y in range(h)]


def pack_samples(rows, fmt, endian):
    flat = [s for row in rows for px in row for s in (px if isinstance(px, tuple) else (px,))]
    return struct.pack(f"{endian}{len(flat)}{fmt}", *flat)


def packbits_encode(data):
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find run
        j = i
        while j < n - 1 and data[j] == data[j + 1] and j - i < 127:
            j += 1
        if j > i:  # run of j-i+1
            out.append(256 - (j - i))  # -(j-i) as unsigned byte
            out.append(data[i])
            i = j + 1
        else:
            # literal run
            j = i
            while j < n - 1 and data[j] != data[j + 1] and j - i < 127:
                j += 1
            if j == n - 1:
                j = n - 1 if j - i < 127 else j
            out.append(j - i)
            out.extend(data[i:j + 1])
            i = j + 1
    return bytes(out)


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code, width):
        self.acc = (self.acc << width) | code
        self.nbits += width
        while self.nbits >= 8:
            self.buf.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def done(self):
        if self.nbits:
            self.buf.append((self.acc << (8 - self.nbits)) & 0xFF)
        return bytes(self.buf)


def lzw_encode(data):
    CLEAR, EOI = 256, 257
    bw = BitWriter()
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    bw.write(CLEAR, width)
    w = b""
    for b in data:
        c = bytes([b])
        if w + c in table:
            w += c
            continue
        bw.write(table[w], width)
        table[w + c] = next_code
        next_code += 1
        # TIFF early change: widen when the NEXT emitted code could be
        # 2^width - 1 (decoder mirrors at table sizes 511/1023/2047)
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code > 4093:
            bw.write(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = c
    if w:
        bw.write(table[w], width)
    bw.write(EOI, width)
    return bw.done()


def predict2(raw, width, spp, bps, endian):
    """Apply horizontal differencing (per row of width*spp samples)."""
    fmt = {1: "B", 2: "H"}[bps]
    row_samples = width * spp
    n = len(raw) // bps
    vals = list(struct.unpack(f"{endian}{n}{fmt}", raw))
    mask = (1 << (8 * bps)) - 1
    out = vals[:]
    for r in range(n // row_samples):
        base = r * row_samples
        for x in range(row_samples - 1, spp - 1, -1):
            out[base + x] = (vals[base + x] - vals[base + x - spp]) & mask
    return struct.pack(f"{endian}{n}{fmt}", *out)


def write_tiff(path, pages, endian="<", bigtiff=False):
    """pages: list of dicts with keys width,height,spp,bits,fmt(sample
    format),regions(list of compressed bytes),tags(extra {tag:(type,
    [values])}).
    """
    e = endian
    out = bytearray()
    if bigtiff:
        out += (b"II" if e == "<" else b"MM") + struct.pack(f"{e}HHHQ", 43, 8, 0, 0)
        ifd_ptr_pos = 8
    else:
        out += (b"II" if e == "<" else b"MM") + struct.pack(f"{e}HI", 42, 0)
        ifd_ptr_pos = 4

    def patch(pos, value):
        fmt = f"{e}Q" if bigtiff else f"{e}I"
        out[pos:pos + (8 if bigtiff else 4)] = struct.pack(fmt, value)

    prev_next_ptr = ifd_ptr_pos
    for page in pages:
        # write region data first
        offsets = []
        counts = []
        for rdata in page["regions"]:
            offsets.append(len(out))
            counts.append(len(rdata))
            out.extend(rdata)
            if len(out) % 2:
                out.append(0)

        tags = {
            256: (4, [page["width"]]),
            257: (4, [page["height"]]),
            258: (3, [page["bits"]] * page["spp"]),
            259: (3, [page.get("compression", 1)]),
            262: (3, [2 if page["spp"] == 3 else 1]),
            277: (3, [page["spp"]]),
            339: (3, [page.get("fmt", 1)] * page["spp"]),
        }
        if "tile_w" in page:
            tags[322] = (4, [page["tile_w"]])
            tags[323] = (4, [page["tile_h"]])
            tags[324] = (16 if bigtiff else 4, offsets)
            tags[325] = (4, counts)
        else:
            tags[273] = (16 if bigtiff else 4, offsets)
            tags[278] = (4, [page["rows_per_strip"]])
            tags[279] = (4, counts)
        if page.get("predictor"):
            tags[317] = (3, [page["predictor"]])
        tags.update(page.get("tags", {}))

        type_size = {3: 2, 4: 4, 16: 8}
        inline = 8 if bigtiff else 4
        # out-of-line value areas
        extra = bytearray()
        entries = []
        ifd_pos_est = None  # patched later
        for tag in sorted(tags):
            typ, vals = tags[tag]
            if typ == 2:  # ASCII: vals is raw bytes incl. NUL terminator
                payload = vals
                entries.append((tag, typ, len(payload), payload))
            else:
                vfmt = {3: "H", 4: "I", 16: "Q"}[typ]
                payload = struct.pack(f"{e}{len(vals)}{vfmt}", *vals)
                entries.append((tag, typ, len(vals), payload))

        # IFD layout: [count][entries][next_ptr][extra values]
        entry_size = 20 if bigtiff else 12
        count_size = 8 if bigtiff else 2
        ptr_size = 8 if bigtiff else 4
        ifd_pos = len(out)
        ifd_size = count_size + len(entries) * entry_size + ptr_size
        extra_pos = ifd_pos + ifd_size

        ifd = bytearray()
        ifd += struct.pack(f"{e}Q" if bigtiff else f"{e}H", len(entries))
        for tag, typ, cnt, payload in entries:
            ifd += struct.pack(f"{e}HH", tag, typ)
            ifd += struct.pack(f"{e}Q" if bigtiff else f"{e}I", cnt)
            if len(payload) <= inline:
                ifd += payload + b"\x00" * (inline - len(payload))
            else:
                ifd += struct.pack(f"{e}Q" if bigtiff else f"{e}I",
                                   extra_pos + len(extra))
                extra += payload
                if len(extra) % 2:
                    extra += b"\x00"
        ifd += struct.pack(f"{e}Q" if bigtiff else f"{e}I", 0)  # next ptr

        patch(prev_next_ptr, ifd_pos)
        prev_next_ptr = ifd_pos + count_size + len(entries) * entry_size
        out.extend(ifd)
        out.extend(extra)

    Path(path).write_bytes(bytes(out))


def main():
    OUT.mkdir(parents=True, exist_ok=True)

    # 1. gray8 strips, uncompressed, little-endian
    w, h, rps = 21, 17, 5
    rows = pix_gray(w, h, lambda x, y: (3 * x + 7 * y) % 256)
    regions = []
    for s in range((h + rps - 1) // rps):
        chunk = rows[s * rps:(s + 1) * rps]
        regions.append(pack_samples(chunk, "B", "<"))
    write_tiff(OUT / "gray8_strips.tif", [dict(
        width=w, height=h, spp=1, bits=8, rows_per_strip=rps, regions=regions)])

    # 2. gray16 deflate + predictor 2, BIG-endian
    w, h, rps = 16, 12, 4
    rows = pix_gray(w, h, lambda x, y: (x * 801 + y * 1203) % 65536)
    regions = []
    for s in range(h // rps):
        raw = pack_samples(rows[s * rps:(s + 1) * rps], "H", ">")
        regions.append(zlib.compress(predict2(raw, w, 1, 2, ">"), 6))
    write_tiff(OUT / "gray16_deflate.tif", [dict(
        width=w, height=h, spp=1, bits=16, rows_per_strip=rps,
        compression=8, predictor=2, regions=regions)], endian=">")

    # 3. RGB packbits (one strip)
    w, h = 9, 7
    rows = [[((x * 20) % 256, (y * 30) % 256, ((x + y) * 15) % 256)
             for x in range(w)] for y in range(h)]
    raw = pack_samples(rows, "B", "<")
    write_tiff(OUT / "rgb_packbits.tif", [dict(
        width=w, height=h, spp=3, bits=8, rows_per_strip=h,
        compression=32773, regions=[packbits_encode(raw)])])

    # 4. gray8 LZW (one strip, content with repeats to exercise the dict)
    w, h = 33, 9
    rows = pix_gray(w, h, lambda x, y: (x // 3 + y) % 7)
    raw = pack_samples(rows, "B", "<")
    write_tiff(OUT / "gray8_lzw.tif", [dict(
        width=w, height=h, spp=1, bits=8, rows_per_strip=h,
        compression=5, regions=[lzw_encode(raw)])])

    # 5. tiled float32, deflate, tiles padded at edges
    w, h, tw, th = 40, 30, 16, 16
    vals = pix_gray(w, h, lambda x, y: float(x) * 0.5 - float(y) * 0.25)
    regions = []
    for ty in range((h + th - 1) // th):
        for tx in range((w + tw - 1) // tw):
            tile = [[vals[min(ty * th + yy, h - 1)][min(tx * tw + xx, w - 1)]
                     if (ty * th + yy < h and tx * tw + xx < w) else 0.0
                     for xx in range(tw)] for yy in range(th)]
            regions.append(zlib.compress(pack_samples(tile, "f", "<"), 6))
    write_tiff(OUT / "tiled_f32.tif", [dict(
        width=w, height=h, spp=1, bits=32, fmt=3, tile_w=tw, tile_h=th,
        compression=8, regions=regions)])

    # 6. multipage -> z stack
    w, h = 8, 6
    pages = []
    for z in range(3):
        rows = pix_gray(w, h, lambda x, y: (x + 2 * y + 10 * z) % 256)
        pages.append(dict(width=w, height=h, spp=1, bits=8, rows_per_strip=h,
                          regions=[pack_samples(rows, "B", "<")]))
    write_tiff(OUT / "multipage.tif", pages)

    # 7. BigTIFF
    w, h = 10, 5
    rows = pix_gray(w, h, lambda x, y: (5 * x + y) % 256)
    write_tiff(OUT / "big.tif", [dict(
        width=w, height=h, spp=1, bits=8, rows_per_strip=h,
        regions=[pack_samples(rows, "B", "<")])], bigtiff=True)

    # 8. OME-TIFF: XYCZT interleaving (C fastest), SizeZ=3 SizeC=2
    # SizeT=2 -> 12 pages; PhysicalSize z declared in nm to exercise
    # unit normalization (2000 nm -> 2.0 um)
    w, h = 10, 8
    ome_xml = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
        '<Image ID="Image:0" Name="fixture">'
        '<Pixels ID="Pixels:0" DimensionOrder="XYCZT" Type="uint8"'
        f' SizeX="{w}" SizeY="{h}" SizeZ="3" SizeC="2" SizeT="2"'
        ' PhysicalSizeX="0.5" PhysicalSizeY="0.6"'
        ' PhysicalSizeZ="2000" PhysicalSizeZUnit="nm">'
        '<TiffData/></Pixels></Image></OME>')
    pages = []
    for p in range(12):
        c, z, t = p % 2, (p // 2) % 3, p // 6
        rows = pix_gray(w, h, lambda x, y, t=t, c=c, z=z:
                        (t * 83 + c * 47 + z * 29 + y * 5 + x * 3) % 256)
        page = dict(width=w, height=h, spp=1, bits=8, rows_per_strip=h,
                    regions=[pack_samples(rows, "B", "<")])
        if p == 0:
            page["tags"] = {270: (2, ome_xml.encode("utf-8") + b"\x00")}
        pages.append(page)
    write_tiff(OUT / "interleaved.ome.tif", pages)

    # 9. RGB PLANAR strips (PlanarConfiguration 2): same pixel formula
    # as fixture 3, but each channel's rows stored as its own strip
    # run, channel-major — the layout planar Zeiss/legacy writers emit
    w, h, rps = 9, 7, 3
    rgb = [[((x * 20) % 256, (y * 30) % 256, ((x + y) * 15) % 256)
            for x in range(w)] for y in range(h)]
    regions = []
    for c in range(3):
        for s in range((h + rps - 1) // rps):
            chunk = [[px[c] for px in row] for row in rgb[s * rps:(s + 1) * rps]]
            regions.append(pack_samples(chunk, "B", "<"))
    write_tiff(OUT / "rgb_planar.tif", [dict(
        width=w, height=h, spp=3, bits=8, rows_per_strip=rps,
        regions=regions, tags={284: (3, [2])})])
    # palette-color (photometric 3): 8-bit indices + 16-bit ColorMap.
    # index(x,y) = (x*5 + y*3) % 256; map: R=i*257, G=(255-i)*257,
    # B=((i*7)%256)*257 (u16 full-scale convention)
    w, h, rps = 13, 9, 4
    idx_rows = [[(x * 5 + y * 3) % 256 for x in range(w)] for y in range(h)]
    regions = []
    for st in range((h + rps - 1) // rps):
        chunk = idx_rows[st * rps:(st + 1) * rps]
        regions.append(pack_samples(chunk, "B", "<"))
    cmap = ([i * 257 for i in range(256)]
            + [(255 - i) * 257 for i in range(256)]
            + [((i * 7) % 256) * 257 for i in range(256)])
    write_tiff(OUT / "pal8.tif", [dict(
        width=w, height=h, spp=1, bits=8, rows_per_strip=rps,
        regions=regions, tags={262: (3, [3]), 320: (3, cmap)})])

    # 4-bit packed palette: two indices per byte, high nibble first,
    # rows byte-aligned. index(x,y) = (x*3 + y) % 16; ColorMap 3*16 u16
    w, h, rps = 11, 5, 2
    idx_rows = [[(x * 3 + y) % 16 for x in range(w)] for y in range(h)]
    regions = []
    for st in range((h + rps - 1) // rps):
        chunk = idx_rows[st * rps:(st + 1) * rps]
        raw = bytearray()
        for row in chunk:
            for i in range(0, len(row), 2):
                hi = row[i]
                lo = row[i + 1] if i + 1 < len(row) else 0
                raw.append((hi << 4) | lo)
        regions.append(bytes(raw))
    cmap4 = ([i * 4369 for i in range(16)]
             + [(15 - i) * 4369 for i in range(16)]
             + [((i * 5) % 16) * 4369 for i in range(16)])
    write_tiff(OUT / "pal4.tif", [dict(
        width=w, height=h, spp=1, bits=4, rows_per_strip=rps,
        regions=regions, tags={262: (3, [3]), 320: (3, cmap4)})])

    # 10. multi-Image (multi-series) OME-TIFF: two series of different
    # shapes in one file; TiffData blocks map each series' planes to
    # its IFD range. pixel(s, z, y, x) = (s*31 + z*17 + y*5 + x*3) % 251
    ome_xml2 = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
        '<Image ID="Image:0" Name="series0">'
        '<Pixels ID="Pixels:0" DimensionOrder="XYZCT" Type="uint8"'
        ' SizeX="8" SizeY="6" SizeZ="3" SizeC="1" SizeT="1"'
        ' PhysicalSizeX="0.4" PhysicalSizeY="0.7">'
        '<TiffData IFD="0" PlaneCount="3"/></Pixels></Image>'
        '<Image ID="Image:1" Name="series1">'
        '<Pixels ID="Pixels:1" DimensionOrder="XYZCT" Type="uint8"'
        ' SizeX="10" SizeY="4" SizeZ="2" SizeC="1" SizeT="1">'
        '<TiffData IFD="3" PlaneCount="2"/></Pixels></Image></OME>')
    pages = []
    for z in range(3):
        rows = pix_gray(8, 6, lambda x, y, z=z: (z * 17 + y * 5 + x * 3) % 251)
        page = dict(width=8, height=6, spp=1, bits=8, rows_per_strip=6,
                    regions=[pack_samples(rows, "B", "<")])
        if z == 0:
            page["tags"] = {270: (2, ome_xml2.encode("utf-8") + b"\x00")}
        pages.append(page)
    for z in range(2):
        rows = pix_gray(10, 4, lambda x, y, z=z: (31 + z * 17 + y * 5 + x * 3) % 251)
        pages.append(dict(width=10, height=4, spp=1, bits=8, rows_per_strip=4,
                          regions=[pack_samples(rows, "B", "<")]))
    write_tiff(OUT / "multiseries.ome.tif", pages)

    # 10b. scrambled twin of the multi-series file: SAME pixels per
    # (series, z), but the planes are physically stored at permuted
    # IFDs (series0 z0,z1,z2 -> IFD 2,0,1; series1 z0,z1 -> IFD 4,3)
    # with one TiffData block per plane declaring the permutation —
    # the multi-position-acquisition layout tifffile accepts. A
    # reader honoring the mappings decodes it identically to the
    # in-order twin.
    ome_scr = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
        '<Image ID="Image:0" Name="series0">'
        '<Pixels ID="Pixels:0" DimensionOrder="XYZCT" Type="uint8"'
        ' SizeX="8" SizeY="6" SizeZ="3" SizeC="1" SizeT="1"'
        ' PhysicalSizeX="0.4" PhysicalSizeY="0.7">'
        '<TiffData IFD="2" PlaneCount="1" FirstZ="0"/>'
        '<TiffData IFD="0" PlaneCount="1" FirstZ="1"/>'
        '<TiffData IFD="1" PlaneCount="1" FirstZ="2"/>'
        '</Pixels></Image>'
        '<Image ID="Image:1" Name="series1">'
        '<Pixels ID="Pixels:1" DimensionOrder="XYZCT" Type="uint8"'
        ' SizeX="10" SizeY="4" SizeZ="2" SizeC="1" SizeT="1">'
        '<TiffData IFD="4" PlaneCount="1" FirstZ="0"/>'
        '<TiffData IFD="3" PlaneCount="1" FirstZ="1"/>'
        '</Pixels></Image></OME>')
    ifd_plane = [(0, 1), (0, 2), (0, 0), (1, 1), (1, 0)]
    pages = []
    for i, (s, z) in enumerate(ifd_plane):
        sw, sh = (8, 6) if s == 0 else (10, 4)
        rows = pix_gray(sw, sh,
                        lambda x, y, s=s, z=z: (s * 31 + z * 17 + y * 5 + x * 3) % 251)
        page = dict(width=sw, height=sh, spp=1, bits=8, rows_per_strip=sh,
                    regions=[pack_samples(rows, "B", "<")])
        if i == 0:
            page["tags"] = {270: (2, ome_scr.encode("utf-8") + b"\x00")}
        pages.append(page)
    write_tiff(OUT / "multiseries_scrambled.ome.tif", pages)

    # 11. Aperio-SVS-shaped slide: heterogeneous pages by design —
    # page 0 = baseline tiled J2K (compression 33003) with the Aperio
    # ImageDescription (incl. MPP), page 1 = stripped thumbnail,
    # page 2 = a smaller pyramid level. Only page 0 should read.
    desc = ("Aperio Image Library v10.0.51\r\n"
            "16x16 [0,0 16x16] (240x240) JPEG2000 Q=70"
            "|AppMag = 20|MPP = 0.4965|Filename = fixture")
    base = [(x * 3 + y * 5 + 7) % 256 for y in range(16) for x in range(16)]
    j2c0 = j2k_encode(base, 16, 16, 8, levels=1, cbw=8, cbh=8)
    thumb = pix_gray(8, 4, lambda x, y: (x + y) % 256)
    lvl = [(x * 6 + y * 10 + 7) % 256 for y in range(8) for x in range(8)]
    j2c2 = j2k_encode(lvl, 8, 8, 8, levels=1, cbw=8, cbh=8)
    # trailing label/macro pages (stripped, named in their Aperio
    # descriptions) — openslide-style associated images; `read`
    # still takes only page 0, svsAssociated enumerates these
    label = pix_gray(6, 4, lambda x, y: (x * 2 + y) % 256)
    macro = pix_gray(7, 3, lambda x, y: (x + y * 3) % 256)
    write_tiff(OUT / "aperio.svs", [
        dict(width=16, height=16, spp=1, bits=8, compression=33003,
             tile_w=16, tile_h=16, regions=[j2c0],
             tags={270: (2, desc.encode("utf-8") + b"\x00")}),
        dict(width=8, height=4, spp=1, bits=8, rows_per_strip=4,
             regions=[pack_samples(thumb, "B", "<")]),
        dict(width=8, height=8, spp=1, bits=8, compression=33003,
             tile_w=8, tile_h=8, regions=[j2c2]),
        dict(width=6, height=4, spp=1, bits=8, rows_per_strip=4,
             regions=[pack_samples(label, "B", "<")],
             tags={270: (2, b"Aperio Image Library v10.0.51\r\nlabel 6x4\x00")}),
        dict(width=7, height=3, spp=1, bits=8, rows_per_strip=3,
             regions=[pack_samples(macro, "B", "<")],
             tags={270: (2, b"Aperio Image Library v10.0.51\r\nmacro 7x3\x00")}),
    ])


    print("wrote", sorted(p.name for p in OUT.glob("*.tif")))


if __name__ == "__main__":
    main()
