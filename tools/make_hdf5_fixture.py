#!/usr/bin/env python3
"""Committed fixtures for Hdf5IO — a minimal, INDEPENDENT pure-stdlib
HDF5 writer following the public HDF5 File Format Specification
(version 2.0, https://docs.hdfgroup.org/hdf5/develop/_f_m_t2.html),
structured the way libhdf5/h5py lay files out by default:

    superblock v0, v1 symbol-table groups (TREE/SNOD/HEAP),
    v1 object headers, dataspace v1, datatype v1 (fixed/float),
    fill value v2, data layout v3 (contiguous + chunked v1-btree),
    filter pipeline v1 (shuffle + deflate), attribute message v1.

Same shared synthetic volume as the other converter fixtures:
    shape (x,y,z) = (6,5,4), v(x,y,z) = (x*7 + y*11 + z*13) % 200
HDF5 datasets are C-ordered; the fastest-varying (x) axis is the LAST
HDF5 dimension, so the dataset shape here is (4,5,6) = (z,y,x).

Files (src/test/resources/fixtures/h5/):
    vol.hdf5        /volume  int16 LE contiguous + attrs, /meta group
    volc.hdf5       /volume  float32 LE chunked (3,2,4)+(1,3,2) edge
                    chunks, shuffle+deflate filters
    vol.mnc2        MINC2 layout: /minc-2.0/image/0/image uint8 with
                    dimorder attr, /minc-2.0/dimensions/{z,y,x}space
                    step/start float64 attrs
"""
import struct
import zlib
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "src/test/resources/fixtures/h5"
OUT.mkdir(parents=True, exist_ok=True)

NX, NY, NZ = 6, 5, 4
UNDEF = 0xFFFFFFFFFFFFFFFF


def vox():
    # C order over (z,y,x): x fastest — the HDF5 buffer order
    return [
        (x * 7 + y * 11 + z * 13) % 200
        for z in range(NZ) for y in range(NY) for x in range(NX)
    ]


def pad8(b: bytes) -> bytes:
    return b + b"\x00" * ((8 - len(b) % 8) % 8)


# ---- low-level message builders --------------------------------------

def msg(mtype: int, body: bytes) -> bytes:
    body = pad8(body)
    return struct.pack("<HHB3x", mtype, len(body), 0) + body


def dataspace(dims) -> bytes:
    # version 1, no max dims, no permutation
    return struct.pack("<BBB5x", 1, len(dims), 0) + b"".join(
        struct.pack("<Q", d) for d in dims)


def dt_fixed(size: int, signed: bool, big_endian: bool = False) -> bytes:
    b0 = (1 if big_endian else 0) | ((8 if signed else 0))  # bit3 = signed
    return struct.pack("<B3BI", (1 << 4) | 0, b0, 0, 0, size) + struct.pack(
        "<HH", 0, size * 8)


def dt_float(size: int) -> bytes:
    # IEEE LE float: bit1..2 padding 0, mantissa norm = 2 (bits 4-5),
    # sign location byte1
    if size == 4:
        b0, sign, exploc, expsz, manloc, mansz, bias = 0x20, 31, 23, 8, 0, 23, 127
    else:
        b0, sign, exploc, expsz, manloc, mansz, bias = 0x20, 63, 52, 11, 0, 52, 1023
    return (struct.pack("<B3BI", (1 << 4) | 1, b0, sign, 0, size)
            + struct.pack("<HHBBBBI", 0, size * 8, exploc, expsz, manloc, mansz, bias))


def fill_value_v2() -> bytes:
    # alloc time 2 (late), write time 0, undefined
    return struct.pack("<BBBB", 2, 2, 0, 0)


def layout_contiguous(addr: int, nbytes: int) -> bytes:
    return struct.pack("<BBQQ", 3, 1, addr, nbytes)


def layout_chunked(btree_addr: int, chunk_dims, elem_size: int) -> bytes:
    dims = list(chunk_dims) + [elem_size]
    return (struct.pack("<BBBQ", 3, 2, len(dims), btree_addr)
            + b"".join(struct.pack("<I", d) for d in dims))


def filter_pipeline(shuffle_elem: int) -> bytes:
    # v1, two filters: shuffle (id 2, client value = element size) then
    # deflate (id 1, client value = level)
    body = struct.pack("<BB6x", 1, 2)
    body += struct.pack("<HHHH", 2, 0, 0, 1) + struct.pack("<I", shuffle_elem) + b"\x00" * 4
    body += struct.pack("<HHHH", 1, 0, 0, 1) + struct.pack("<I", 6) + b"\x00" * 4
    return body


def attribute(name: str, dt: bytes, ds: bytes, data: bytes) -> bytes:
    nm = name.encode() + b"\x00"
    return (struct.pack("<BxHHH", 1, len(nm), len(dt), len(ds))
            + pad8(nm) + pad8(dt) + pad8(ds) + data)


def symbol_table_msg(btree: int, heap: int) -> bytes:
    return struct.pack("<QQ", btree, heap)


def object_header_v1(messages) -> bytes:
    body = b"".join(msg(t, b) for t, b in messages)
    # prefix: version 1, nmsgs, refcount 1, header size; messages start
    # 8-byte aligned after a 12+4 byte prefix
    return struct.pack("<BxHII4x", 1, len(messages), 1, len(body)) + body


# ---- file assembler ---------------------------------------------------

class H5:
    """Append-only file image with address back-patching."""

    def __init__(self):
        self.buf = bytearray(b"\x00" * 2048)  # reserve generous front region
        self.cursor = 2048  # front region holds superblock + root structures

    def alloc(self, data: bytes) -> int:
        addr = self.cursor
        self.buf += data
        self.cursor += len(data)
        return addr

    def place(self, addr: int, data: bytes):
        self.buf[addr:addr + len(data)] = data


def group_structures(f: H5, entries):
    """v1 group plumbing: local heap with names, SNOD, leaf B-tree.
    entries: [(name, objheader_addr)] sorted by name."""
    heap_data = bytearray(b"\x00" * 8)  # offset 0 reserved
    offs = []
    for name, _ in entries:
        offs.append(len(heap_data))
        heap_data += name.encode() + b"\x00"
        while len(heap_data) % 8:
            heap_data += b"\x00"
    heap_seg = f.alloc(bytes(heap_data))
    heap = f.alloc(b"HEAP" + struct.pack("<B3xQQQ", 0, len(heap_data), UNDEF, heap_seg))
    snod_entries = b""
    for (name, oh), off in zip(entries, offs):
        snod_entries += struct.pack("<QQI4x16x", off, oh, 0)
    # leaf-k = 4 → capacity 2K = 8 entries of 40 bytes
    snod = f.alloc(b"SNOD" + struct.pack("<BxH", 1, len(entries))
                   + snod_entries + b"\x00" * (8 * 40 - len(snod_entries)))
    btree = f.alloc(b"TREE" + struct.pack("<BBHQQ", 0, 0, 1, UNDEF, UNDEF)
                    + struct.pack("<QQQ", 0, snod, offs[-1]))
    return btree, heap


def superblock(f: H5, root_oh: int):
    sb = (b"\x89HDF\r\n\x1a\n"
          + struct.pack("<BBBxB", 0, 0, 0, 0)
          + struct.pack("<BBx", 8, 8)
          + struct.pack("<HH", 4, 16)
          + struct.pack("<I", 0)
          + struct.pack("<QQQQ", 0, UNDEF, len(f.buf), UNDEF)
          # root symbol table entry: name offset 0, header addr,
          # cache type 0, scratch zeroed
          + struct.pack("<QQI4x16x", 0, root_oh, 0))
    f.place(0, sb)


# ---- vol.hdf5: contiguous int16 + attrs + subgroup -------------------

def make_contiguous():
    f = H5()
    data = b"".join(struct.pack("<h", v) for v in vox())
    data_addr = f.alloc(data)
    ds_oh = f.alloc(object_header_v1([
        (0x0001, dataspace([NZ, NY, NX])),
        (0x0003, dt_fixed(2, signed=True)),
        (0x0005, fill_value_v2()),
        (0x0008, layout_contiguous(data_addr, len(data))),
        (0x000C, attribute("scale", dt_float(8), dataspace([3]),
                           struct.pack("<3d", 1.5, 2.5, 3.5))),
        (0x000C, attribute("note", dt_fixed(4, signed=False), dataspace([]),
                           struct.pack("<I", 42))),
    ]))
    # empty subgroup /meta (its own empty symbol table)
    empty_heap_seg = f.alloc(b"\x00" * 8)
    empty_heap = f.alloc(b"HEAP" + struct.pack("<B3xQQQ", 0, 8, UNDEF, empty_heap_seg))
    empty_btree = f.alloc(b"TREE" + struct.pack("<BBHQQ", 0, 0, 0, UNDEF, UNDEF))
    meta_oh = f.alloc(object_header_v1([
        (0x0011, symbol_table_msg(empty_btree, empty_heap)),
    ]))
    btree, heap = group_structures(
        f, sorted([("meta", meta_oh), ("volume", ds_oh)]))
    root_oh_addr = f.alloc(object_header_v1([
        (0x0011, symbol_table_msg(btree, heap)),
    ]))
    superblock(f, root_oh_addr)
    (OUT / "vol.hdf5").write_bytes(bytes(f.buf))


# ---- volc.hdf5: chunked float32, shuffle + deflate -------------------

def shuffle_bytes(raw: bytes, esize: int) -> bytes:
    n = len(raw) // esize
    out = bytearray(len(raw))
    for i in range(n):
        for b in range(esize):
            out[b * n + i] = raw[i * esize + b]
    return bytes(out)


def make_chunked():
    f = H5()
    cz, cy, cx = 3, 2, 4  # chunk shape (z,y,x) — edge chunks are partial
    vals = vox()

    def at(z, y, x):
        return float(vals[(z * NY + y) * NX + x]) if z < NZ and y < NY and x < NX else 0.0

    chunk_records = []
    for z0 in range(0, NZ, cz):
        for y0 in range(0, NY, cy):
            for x0 in range(0, NX, cx):
                raw = b"".join(
                    struct.pack("<f", at(z0 + i, y0 + j, x0 + k))
                    for i in range(cz) for j in range(cy) for k in range(cx))
                comp = zlib.compress(shuffle_bytes(raw, 4), 6)
                addr = f.alloc(comp)
                chunk_records.append(((z0, y0, x0), addr, len(comp)))
    # chunked v1 B-tree (node type 1), single leaf: keys carry
    # (chunk nbytes, filter mask, offsets..., 0) and a final bound key
    nrec = len(chunk_records)
    body = b"TREE" + struct.pack("<BBHQQ", 1, 0, nrec, UNDEF, UNDEF)
    for (off, addr, nbytes) in chunk_records:
        body += struct.pack("<II", nbytes, 0)
        body += struct.pack("<QQQQ", off[0], off[1], off[2], 0)
        body += struct.pack("<Q", addr)
    body += struct.pack("<II", 0, 0) + struct.pack("<QQQQ", NZ, NY, NX, 0)
    btree_addr = f.alloc(body)
    ds_oh = f.alloc(object_header_v1([
        (0x0001, dataspace([NZ, NY, NX])),
        (0x0003, dt_float(4)),
        (0x0005, fill_value_v2()),
        (0x000B, filter_pipeline(4)),
        (0x0008, layout_chunked(btree_addr, [cz, cy, cx], 4)),
    ]))
    btree, heap = group_structures(f, [("volume", ds_oh)])
    root_oh = f.alloc(object_header_v1([
        (0x0011, symbol_table_msg(btree, heap)),
    ]))
    superblock(f, root_oh)
    (OUT / "volc.hdf5").write_bytes(bytes(f.buf))


# ---- vol.mnc2: MINC2 group layout ------------------------------------

def make_minc2():
    f = H5()
    data = bytes(vox())
    data_addr = f.alloc(data)
    dimorder = b"zspace,yspace,xspace\x00"
    image_oh = f.alloc(object_header_v1([
        (0x0001, dataspace([NZ, NY, NX])),
        (0x0003, dt_fixed(1, signed=False)),
        (0x0005, fill_value_v2()),
        (0x0008, layout_contiguous(data_addr, len(data))),
        (0x000C, attribute("dimorder",
                           dt_string(len(dimorder)), dataspace([]), dimorder)),
        (0x000C, attribute("valid_range", dt_float(8), dataspace([2]),
                           struct.pack("<2d", 0.0, 199.0))),
    ]))
    zero_oh = f.alloc(object_header_v1([
        *group_msgs(f, [("image", image_oh)]),
    ]))
    image_grp_oh = f.alloc(object_header_v1([
        *group_msgs(f, [("0", zero_oh)]),
    ]))

    def dimspace(name, step, start, length):
        oh = f.alloc(object_header_v1([
            (0x0001, dataspace([])),
            (0x0003, dt_fixed(4, signed=True)),
            (0x0005, fill_value_v2()),
            (0x0008, layout_contiguous(UNDEF, 0)),
            (0x000C, attribute("step", dt_float(8), dataspace([]),
                               struct.pack("<d", step))),
            (0x000C, attribute("start", dt_float(8), dataspace([]),
                               struct.pack("<d", start))),
            (0x000C, attribute("length", dt_fixed(4, signed=False), dataspace([]),
                               struct.pack("<I", length))),
        ]))
        return (name, oh)

    dims = sorted([
        dimspace("xspace", 1.5, 10.0, NX),
        dimspace("yspace", 2.5, 20.0, NY),
        dimspace("zspace", -3.5, 30.0, NZ),
    ])
    dims_grp_oh = f.alloc(object_header_v1([*group_msgs(f, dims)]))
    minc_oh = f.alloc(object_header_v1([
        *group_msgs(f, sorted([("dimensions", dims_grp_oh), ("image", image_grp_oh)])),
    ]))
    root_oh = f.alloc(object_header_v1([*group_msgs(f, [("minc-2.0", minc_oh)])]))
    superblock(f, root_oh)
    (OUT / "vol.mnc2").write_bytes(bytes(f.buf))


def dt_string(size: int) -> bytes:
    # class 3 string, null-terminated, ASCII
    return struct.pack("<B3BI", (1 << 4) | 3, 0, 0, 0, size)


def group_msgs(f: H5, entries):
    btree, heap = group_structures(f, entries)
    return [(0x0011, symbol_table_msg(btree, heap))]


# ---- vol_itk.hdf5: ITK HDF5ImageIO layout -----------------------------

def make_itk():
    f = H5()
    data = b"".join(struct.pack("<H", v) for v in vox())
    data_addr = f.alloc(data)
    vox_oh = f.alloc(object_header_v1([
        (0x0001, dataspace([NZ, NY, NX])),
        (0x0003, dt_fixed(2, signed=False)),
        (0x0005, fill_value_v2()),
        (0x0008, layout_contiguous(data_addr, len(data))),
    ]))
    # Spacing/Origin: small float64 datasets in ITK (fastest-first) order
    sp_addr = f.alloc(struct.pack("<3d", 1.5, 2.5, 3.5))   # x,y,z
    or_addr = f.alloc(struct.pack("<3d", 10.0, 20.0, 30.0))
    sp_oh = f.alloc(object_header_v1([
        (0x0001, dataspace([3])),
        (0x0003, dt_float(8)),
        (0x0005, fill_value_v2()),
        (0x0008, layout_contiguous(sp_addr, 24)),
    ]))
    or_oh = f.alloc(object_header_v1([
        (0x0001, dataspace([3])),
        (0x0003, dt_float(8)),
        (0x0005, fill_value_v2()),
        (0x0008, layout_contiguous(or_addr, 24)),
    ]))
    zero_oh = f.alloc(object_header_v1([
        *group_msgs(f, sorted([("Origin", or_oh), ("Spacing", sp_oh),
                               ("VoxelData", vox_oh)])),
    ]))
    itk_oh = f.alloc(object_header_v1([*group_msgs(f, [("0", zero_oh)])]))
    root_oh = f.alloc(object_header_v1([*group_msgs(f, [("ITKImage", itk_oh)])]))
    superblock(f, root_oh)
    (OUT / "vol_itk.hdf5").write_bytes(bytes(f.buf))


# ---- vol_v2.hdf5: libver=latest profile -------------------------------
# superblock v2, v2 object headers (OHDR), compact link-message groups

def jenkins_lookup3(data: bytes, initval: int = 0) -> int:
    """The hash libhdf5 uses for metadata checksums (Bob Jenkins
    lookup3, hashlittle variant)."""
    def rot(x, k):
        return ((x << k) | (x >> (32 - k))) & 0xFFFFFFFF

    length = len(data)
    a = b = c = (0xDEADBEEF + length + initval) & 0xFFFFFFFF
    i = 0
    while length > 12:
        a = (a + int.from_bytes(data[i:i+4], "little")) & 0xFFFFFFFF
        b = (b + int.from_bytes(data[i+4:i+8], "little")) & 0xFFFFFFFF
        c = (c + int.from_bytes(data[i+8:i+12], "little")) & 0xFFFFFFFF
        a = (a - c) & 0xFFFFFFFF; a ^= rot(c, 4);  c = (c + b) & 0xFFFFFFFF
        b = (b - a) & 0xFFFFFFFF; b ^= rot(a, 6);  a = (a + c) & 0xFFFFFFFF
        c = (c - b) & 0xFFFFFFFF; c ^= rot(b, 8);  b = (b + a) & 0xFFFFFFFF
        a = (a - c) & 0xFFFFFFFF; a ^= rot(c, 16); c = (c + b) & 0xFFFFFFFF
        b = (b - a) & 0xFFFFFFFF; b ^= rot(a, 19); a = (a + c) & 0xFFFFFFFF
        c = (c - b) & 0xFFFFFFFF; c ^= rot(b, 4);  b = (b + a) & 0xFFFFFFFF
        i += 12
        length -= 12
    tail = data[i:] + b"\x00" * (12 - length)
    if length > 8:
        c = (c + int.from_bytes(tail[8:12], "little")) & 0xFFFFFFFF
    if length > 4:
        b = (b + int.from_bytes(tail[4:8], "little")) & 0xFFFFFFFF
    if length > 0:
        a = (a + int.from_bytes(tail[0:4], "little")) & 0xFFFFFFFF
        c ^= b; c = (c - rot(b, 14)) & 0xFFFFFFFF
        a ^= c; a = (a - rot(c, 11)) & 0xFFFFFFFF
        b ^= a; b = (b - rot(a, 25)) & 0xFFFFFFFF
        c ^= b; c = (c - rot(b, 16)) & 0xFFFFFFFF
        a ^= c; a = (a - rot(c, 4)) & 0xFFFFFFFF
        b ^= a; b = (b - rot(a, 14)) & 0xFFFFFFFF
        c ^= b; c = (c - rot(b, 24)) & 0xFFFFFFFF
    return c


def oh_v2(messages):
    # OHDR v2: signature, version, flags(size-of-chunk0 = 4 bytes),
    # chunk0 size, messages (type 1B, size 2B, flags 1B), gapless,
    # trailing lookup3 checksum over everything before it
    body = b""
    for t, m in messages:
        body += struct.pack("<BHB", t, len(m), 0) + m
    head = b"OHDR" + struct.pack("<BB", 2, 0x02) + struct.pack("<I", len(body))
    block = head + body
    return block + struct.pack("<I", jenkins_lookup3(block))


def link_msg(name: str, target: int) -> bytes:
    nm = name.encode()
    # version 1, flags: 0 (name length 1 byte, no extras, hard link)
    return struct.pack("<BBB", 1, 0, len(nm)) + nm + struct.pack("<Q", target)


def make_v2():
    f = H5()
    data = b"".join(struct.pack("<i", v) for v in vox())
    data_addr = f.alloc(data)
    ds_oh = f.alloc(oh_v2([
        (0x0001, dataspace([NZ, NY, NX])),
        (0x0003, dt_fixed(4, signed=True)),
        (0x0005, fill_value_v2()),
        (0x0008, layout_contiguous(data_addr, len(data))),
        (0x000C, attribute("scale", dt_float(8), dataspace([3]),
                           struct.pack("<3d", 0.5, 0.6, 0.7))),
    ]))
    # link info v0, flags 0: fractal heap + name-index btree both UNDEF
    # (compact storage — links live inline as 0x0006 messages)
    link_info = struct.pack("<BBQQ", 0, 0, UNDEF, UNDEF)
    grp_oh = f.alloc(oh_v2([
        (0x0002, link_info),
        (0x0006, link_msg("volume", ds_oh)),
    ]))
    root_oh = f.alloc(oh_v2([
        (0x0002, link_info),
        (0x0006, link_msg("grp", grp_oh)),
    ]))
    # superblock v2: sig, version, offset size, length size, flags,
    # base, extension(UNDEF), eof, root OH address, checksum
    sb = (b"\x89HDF\r\n\x1a\n"
          + struct.pack("<BBBB", 2, 8, 8, 0)
          + struct.pack("<QQQQ", 0, UNDEF, len(f.buf), root_oh))
    sb += struct.pack("<I", jenkins_lookup3(sb))
    f.place(0, sb)
    (OUT / "vol_v2.hdf5").write_bytes(bytes(f.buf))


# ---- vold.hdf5: level-1 chunk B-tree (two leaves) ----------------------

def make_chunked_deep():
    f = H5()
    cz, cy, cx = 1, 5, 6  # one z-slab per chunk → 4 chunks, no filters
    vals = vox()
    records = []
    for z0 in range(0, NZ, cz):
        raw = b"".join(
            struct.pack("<h", vals[(z0 * NY + j) * NX + k])
            for j in range(NY) for k in range(NX))
        records.append(((z0, 0, 0), f.alloc(raw), len(raw)))

    def leaf(recs, bound):
        body = b"TREE" + struct.pack("<BBHQQ", 1, 0, len(recs), UNDEF, UNDEF)
        for (off, addr, nbytes) in recs:
            body += struct.pack("<II", nbytes, 0)
            body += struct.pack("<QQQQ", off[0], off[1], off[2], 0)
            body += struct.pack("<Q", addr)
        body += struct.pack("<II", 0, 0) + struct.pack("<QQQQ", *bound, 0)
        return f.alloc(body)

    leaf_a = leaf(records[:2], (2, 0, 0))
    leaf_b = leaf(records[2:], (NZ, 0, 0))
    root = b"TREE" + struct.pack("<BBHQQ", 1, 1, 2, UNDEF, UNDEF)
    root += struct.pack("<II", 0, 0) + struct.pack("<QQQQ", 0, 0, 0, 0)
    root += struct.pack("<Q", leaf_a)
    root += struct.pack("<II", 0, 0) + struct.pack("<QQQQ", 2, 0, 0, 0)
    root += struct.pack("<Q", leaf_b)
    root += struct.pack("<II", 0, 0) + struct.pack("<QQQQ", NZ, 0, 0, 0)
    btree_addr = f.alloc(root)
    ds_oh = f.alloc(object_header_v1([
        (0x0001, dataspace([NZ, NY, NX])),
        (0x0003, dt_fixed(2, signed=True)),
        (0x0005, fill_value_v2()),
        (0x0008, layout_chunked(btree_addr, [cz, cy, cx], 2)),
    ]))
    btree, heap = group_structures(f, [("volume", ds_oh)])
    root_oh = f.alloc(object_header_v1([
        (0x0011, symbol_table_msg(btree, heap)),
    ]))
    superblock(f, root_oh)
    (OUT / "vold.hdf5").write_bytes(bytes(f.buf))


# ---- dense.hdf5: dense (fractal-heap) link storage ---------------------

def make_dense():
    """Group 'many' with 12 links stored densely — the layout libhdf5
    switches to past 8 links: Link Info message → fractal heap (FRHP +
    one direct block) holding the link-message bodies, plus a
    link-name-index v2 B-tree (BTHD + one BTLF leaf, record type 5 =
    lookup3(name) hash + 7-byte managed heap ID, hash-sorted like
    libhdf5 writes them). Structure checksums are real lookup3 values;
    the reader trusts rather than re-verifies them.
    """
    f = H5()
    entries = []
    for i in range(12):
        val_addr = f.alloc(struct.pack("<h", 7 * i + 3))
        oh = f.alloc(object_header_v1([
            (0x0001, dataspace([1])),
            (0x0003, dt_fixed(2, signed=True)),
            (0x0005, fill_value_v2()),
            (0x0008, layout_contiguous(val_addr, 2)),
        ]))
        entries.append((f"d{i:02d}", oh))

    # link-message bodies (v1, flags 0 → 1-byte name length, hard)
    bodies = [
        struct.pack("<BBB", 1, 0, len(name)) + name.encode()
        + struct.pack("<Q", oh)
        for name, oh in entries
    ]
    # fractal heap: one 512-byte direct block, unchecksummed (flags 0)
    DB_SIZE, OFFSET_SIZE, LEN_SIZE = 512, 4, 2  # max heap 32 bits, max direct 64K
    db_hdr_len = 4 + 1 + 8 + OFFSET_SIZE
    block = bytearray(DB_SIZE)
    heap_ids = []
    pos = db_hdr_len
    for body in bodies:
        heap_ids.append(b"\x00" + struct.pack("<I", pos)
                        + struct.pack("<H", len(body)))
        block[pos:pos + len(body)] = body
        pos += len(body)
    db_addr = f.alloc(bytes(block))
    frhp = (b"FRHP"
            + struct.pack("<BHHB", 0, 1 + OFFSET_SIZE + LEN_SIZE, 0, 0)
            + struct.pack("<I", 4096)            # max managed object size
            + struct.pack("<Q", 0)               # next huge id
            + struct.pack("<Q", UNDEF)           # huge-object v2 btree
            + struct.pack("<Q", DB_SIZE - pos)   # free space
            + struct.pack("<Q", UNDEF)           # free-space manager
            + struct.pack("<QQ", DB_SIZE, DB_SIZE)  # managed / allocated
            + struct.pack("<Q", pos)             # direct-block iterator
            + struct.pack("<Q", len(bodies))     # managed objects
            + struct.pack("<QQQQ", 0, 0, 0, 0)   # huge/tiny size+count
            + struct.pack("<H", 4)               # table width
            + struct.pack("<QQ", DB_SIZE, 65536)  # start / max direct size
            + struct.pack("<H", 32)              # max heap size (bits)
            + struct.pack("<H", 1)               # starting rows
            + struct.pack("<Q", db_addr)         # root block address
            + struct.pack("<H", 0))              # current rows → direct root
    frhp_addr = f.alloc(frhp + struct.pack("<I", jenkins_lookup3(frhp)))
    f.place(db_addr, b"FHDB" + struct.pack("<BQ", 0, frhp_addr)
            + struct.pack("<I", 0))              # block offset 0

    # name-index v2 B-tree: one leaf, records hash-sorted
    recs = sorted(
        (jenkins_lookup3(name.encode()), hid)
        for (name, _), hid in zip(entries, heap_ids))
    rec_bytes = b"".join(struct.pack("<I", h) + hid for h, hid in recs)
    btlf = b"BTLF" + struct.pack("<BB", 0, 5) + rec_bytes
    btlf_addr = f.alloc(btlf + struct.pack("<I", jenkins_lookup3(btlf)))
    bthd = (b"BTHD" + struct.pack("<BB", 0, 5)
            + struct.pack("<IHH", 512, 4 + len(heap_ids[0]), 0)
            + struct.pack("<BB", 100, 40)
            + struct.pack("<QH", btlf_addr, len(recs))
            + struct.pack("<Q", len(recs)))
    bthd_addr = f.alloc(bthd + struct.pack("<I", jenkins_lookup3(bthd)))

    li = struct.pack("<BB", 0, 0) + struct.pack("<QQ", frhp_addr, bthd_addr)
    many_oh = f.alloc(object_header_v1([(0x0002, li)]))
    btree, heap = group_structures(f, [("many", many_oh)])
    root_oh = f.alloc(object_header_v1([
        (0x0011, symbol_table_msg(btree, heap)),
    ]))
    superblock(f, root_oh)
    (OUT / "dense.hdf5").write_bytes(bytes(f.buf))




# ---- dense_filtered.hdf5 / dense_deep.hdf5: filtered heaps + depth-2 ----

def _deflate_pipeline_v2() -> bytes:
    """Filter Pipeline message body, v2, one filter: deflate(level 6)."""
    return (struct.pack("<BB", 2, 1)
            + struct.pack("<HHH", 1, 0, 1)   # id=1, flags, 1 client value
            + struct.pack("<I", 6))


def _link_entries(f: H5, prefix: str, count: int):
    entries = []
    for i in range(count):
        val_addr = f.alloc(struct.pack("<h", 7 * i + 3))
        oh = f.alloc(object_header_v1([
            (0x0001, dataspace([1])),
            (0x0003, dt_fixed(2, signed=True)),
            (0x0005, fill_value_v2()),
            (0x0008, layout_contiguous(val_addr, 2)),
        ]))
        entries.append((f"{prefix}{i:02d}", oh))
    return entries


def _btree_and_group(f: H5, entries, heap_ids, frhp_addr, node_size, gname):
    recs = sorted(
        (jenkins_lookup3(name.encode()), hid)
        for (name, _), hid in zip(entries, heap_ids))
    rec_bytes = b"".join(struct.pack("<I", h) + hid for h, hid in recs)
    btlf = b"BTLF" + struct.pack("<BB", 0, 5) + rec_bytes
    btlf_addr = f.alloc(btlf + struct.pack("<I", jenkins_lookup3(btlf)))
    bthd = (b"BTHD" + struct.pack("<BB", 0, 5)
            + struct.pack("<IHH", node_size, 4 + len(heap_ids[0]), 0)
            + struct.pack("<BB", 100, 40)
            + struct.pack("<QH", btlf_addr, len(recs))
            + struct.pack("<Q", len(recs)))
    bthd_addr = f.alloc(bthd + struct.pack("<I", jenkins_lookup3(bthd)))
    li = struct.pack("<BB", 0, 0) + struct.pack("<QQ", frhp_addr, bthd_addr)
    g_oh = f.alloc(object_header_v1([(0x0002, li)]))
    btree, heap = group_structures(f, [(gname, g_oh)])
    root_oh = f.alloc(object_header_v1([
        (0x0011, symbol_table_msg(btree, heap)),
    ]))
    superblock(f, root_oh)


def make_dense_filtered():
    """Dense group whose fractal heap is DEFLATE-filtered: the FRHP
    carries an I/O-filter pipeline, its root DIRECT block is stored
    compressed (header gains stored-size + filter-mask fields), and
    the reader must defilter before resolving managed heap IDs —
    the layout libhdf5 emits for large attribute-heavy groups."""
    import zlib
    f = H5()
    entries = _link_entries(f, "c", 12)
    bodies = [
        struct.pack("<BBB", 1, 0, len(name)) + name.encode()
        + struct.pack("<Q", oh)
        for name, oh in entries
    ]
    DB_SIZE, OFFSET_SIZE, LEN_SIZE = 512, 4, 2
    db_hdr_len = 4 + 1 + 8 + OFFSET_SIZE
    block = bytearray(DB_SIZE)
    heap_ids = []
    pos = db_hdr_len
    for body in bodies:
        heap_ids.append(b"\x00" + struct.pack("<I", pos)
                        + struct.pack("<H", len(body)))
        block[pos:pos + len(body)] = body
        pos += len(body)
    pipeline = _deflate_pipeline_v2()
    # compress a placeholder first to learn the stored size; the FHDB
    # header embeds frhp_addr, which depends on nothing downstream of
    # the block, so patch then recompress deterministically
    frhp_fixed = (b"FRHP"
            + struct.pack("<BHHB", 0, 1 + OFFSET_SIZE + LEN_SIZE, len(pipeline), 0)
            + struct.pack("<I", 4096)
            + struct.pack("<Q", 0)
            + struct.pack("<Q", UNDEF)
            + struct.pack("<Q", DB_SIZE - pos)
            + struct.pack("<Q", UNDEF)
            + struct.pack("<QQ", DB_SIZE, DB_SIZE)
            + struct.pack("<Q", pos)
            + struct.pack("<Q", len(bodies))
            + struct.pack("<QQQQ", 0, 0, 0, 0)
            + struct.pack("<H", 4)
            + struct.pack("<QQ", DB_SIZE, 65536)
            + struct.pack("<H", 32)
            + struct.pack("<H", 1))
    # frhp_addr must be known to fill FHDB; alloc the heap header FIRST
    # with a placeholder root address, then the compressed block
    frhp_addr = f.cursor
    block[0:db_hdr_len] = (b"FHDB" + struct.pack("<BQ", 0, frhp_addr)
                           + struct.pack("<I", 0))
    stored = zlib.compress(bytes(block), 6)
    db_addr = frhp_addr + 4 + 138 + 12 + len(pipeline) + 4  # header+extras+cksum
    frhp = (frhp_fixed
            + struct.pack("<Q", db_addr)
            + struct.pack("<H", 0)                    # rows=0: direct root
            + struct.pack("<QI", len(stored), 0)      # stored size + mask
            + pipeline)
    assert f.alloc(frhp + struct.pack("<I", jenkins_lookup3(frhp))) == frhp_addr
    assert f.alloc(stored) == db_addr
    _btree_and_group(f, entries, heap_ids, frhp_addr, 512, "packed")
    (OUT / "dense_filtered.hdf5").write_bytes(bytes(f.buf))


def make_dense_deep():
    """Dense group whose fractal heap needs a DEPTH-2 walk: the root
    indirect block's third row holds CHILD indirect blocks (start =
    max direct size = 256, width 2 => max_dblock_rows = 2), and the
    whole heap is ALSO deflate-filtered, so indirect entries carry
    (address, stored size, filter mask) triplets. 80 links spill past
    the 1024 bytes covered by the root's direct rows into the child."""
    import zlib
    f = H5()
    entries = _link_entries(f, "e", 80)
    bodies = [
        struct.pack("<BBB", 1, 0, len(name)) + name.encode()
        + struct.pack("<Q", oh)
        for name, oh in entries
    ]
    BLK, WIDTH, OFFSET_SIZE, LEN_SIZE = 256, 2, 4, 2
    db_hdr_len = 4 + 1 + 8 + OFFSET_SIZE
    pipeline = _deflate_pipeline_v2()
    frhp_addr = f.cursor  # heap header allocated first (FHDB points back)

    # pack bodies into 256-byte blocks at heap offsets 0,256,...
    blocks, heap_ids = [], []
    cur = bytearray(BLK)
    cur_off, pos = 0, db_hdr_len
    def flush():
        nonlocal cur, pos
        cur[0:db_hdr_len] = (b"FHDB" + struct.pack("<BQ", 0, frhp_addr)
                             + struct.pack("<I", cur_off))
        blocks.append((cur_off, zlib.compress(bytes(cur), 6)))
        cur = bytearray(BLK)
        pos = db_hdr_len
    for body in bodies:
        if pos + len(body) > BLK:
            flush()
            cur_off += BLK
        heap_ids.append(b"\x00" + struct.pack("<I", cur_off + pos)
                        + struct.pack("<H", len(body)))
        cur[pos:pos + len(body)] = body
        pos += len(body)
    flush()
    n_blocks = len(blocks)
    assert n_blocks == 5, n_blocks  # rows 0-1 of root + 1 in the child

    total_cover = 1024 + 2 * BLK  # root direct rows + one child indirect
    frhp = (b"FRHP"
            + struct.pack("<BHHB", 0, 1 + OFFSET_SIZE + LEN_SIZE, len(pipeline), 0)
            + struct.pack("<I", 4096)
            + struct.pack("<Q", 0)
            + struct.pack("<Q", UNDEF)
            + struct.pack("<Q", n_blocks * BLK - (blocks[-1][0] + 256))
            + struct.pack("<Q", UNDEF)
            + struct.pack("<QQ", total_cover, total_cover)
            + struct.pack("<Q", blocks[-1][0] + 256)
            + struct.pack("<Q", len(bodies))
            + struct.pack("<QQQQ", 0, 0, 0, 0)
            + struct.pack("<H", WIDTH)
            + struct.pack("<QQ", BLK, BLK)      # start = max direct = 256
            + struct.pack("<H", 32)
            + struct.pack("<H", 3))             # starting rows
    db_addrs = [f.cursor + 0]  # placeholder; allocate after header+root+child
    # layout: FRHP | root FHIB | child FHIB | direct blocks (compressed)
    frhp_len = len(frhp) + 8 + 2 + len(pipeline) + 4
    # root FHIB: 3 rows x 2 cols; rows 0-1 direct (addr+size+mask each),
    # row 2 indirect (addr only)
    root_len = 4 + 1 + 8 + OFFSET_SIZE + 4 * (8 + 8 + 4) + 2 * 8 + 4
    child_len = 4 + 1 + 8 + OFFSET_SIZE + 2 * (8 + 8 + 4) + 4
    root_addr = frhp_addr + frhp_len
    child_addr = root_addr + root_len
    addr = child_addr + child_len
    db_addrs = []
    for _off, comp in blocks:
        db_addrs.append(addr)
        addr += len(comp)
    frhp_full = (frhp + struct.pack("<Q", root_addr) + struct.pack("<H", 3)
                 + pipeline)  # indirect root: no stored-size/mask extras
    assert len(frhp_full) + 4 == frhp_len
    assert f.alloc(frhp_full + struct.pack("<I", jenkins_lookup3(frhp_full))) == frhp_addr

    def fhib(block_off, entries_bytes):
        body = (b"FHIB" + struct.pack("<BQ", 0, frhp_addr)
                + struct.pack("<I", block_off) + entries_bytes)
        return body + struct.pack("<I", jenkins_lookup3(body))

    root_entries = b""
    for k in range(4):  # rows 0-1: direct blocks 0..3
        root_entries += struct.pack("<QQI", db_addrs[k], len(blocks[k][1]), 0)
    root_entries += struct.pack("<Q", child_addr)  # row 2 col 0: child FHIB
    root_entries += struct.pack("<Q", UNDEF)       # row 2 col 1: absent
    assert f.alloc(fhib(0, root_entries)) == root_addr

    child_entries = (struct.pack("<QQI", db_addrs[4], len(blocks[4][1]), 0)
                     + struct.pack("<QQI", UNDEF, 0, 0))
    assert f.alloc(fhib(1024, child_entries)) == child_addr

    for (i, (_off, comp)) in enumerate(blocks):
        assert f.alloc(comp) == db_addrs[i]

    _btree_and_group(f, entries, heap_ids, frhp_addr, 2048, "deep")
    (OUT / "dense_deep.hdf5").write_bytes(bytes(f.buf))


def make_dense_btdeep():
    """Dense group whose link-name-index v2 B-tree has DEPTH 2: 53
    links over a 128-byte node size force root -> internal -> leaf.
    Child-pointer field widths follow the libhdf5 header math: per-
    child nrec is sized from the leaf capacity (10 -> 1 byte), and
    root pointers (to internal children) append a total-subtree count
    sized from cumMax(1) = 65 -> 1 byte. Shape: root holds 2 records
    + 3 internal children; each child holds 2 records + 3 leaves of 5.
    """
    f = H5()
    entries = _link_entries(f, "n", 53)
    bodies = [
        struct.pack("<BBB", 1, 0, len(name)) + name.encode()
        + struct.pack("<Q", oh)
        for name, oh in entries
    ]
    DB_SIZE, OFFSET_SIZE, LEN_SIZE = 1024, 4, 2
    db_hdr_len = 4 + 1 + 8 + OFFSET_SIZE
    block = bytearray(DB_SIZE)
    heap_ids = []
    pos = db_hdr_len
    for body in bodies:
        heap_ids.append(b"\x00" + struct.pack("<I", pos)
                        + struct.pack("<H", len(body)))
        block[pos:pos + len(body)] = body
        pos += len(body)
    db_addr = f.alloc(bytes(block))
    frhp = (b"FRHP"
            + struct.pack("<BHHB", 0, 1 + OFFSET_SIZE + LEN_SIZE, 0, 0)
            + struct.pack("<I", 4096)
            + struct.pack("<Q", 0) + struct.pack("<Q", UNDEF)
            + struct.pack("<Q", DB_SIZE - pos) + struct.pack("<Q", UNDEF)
            + struct.pack("<QQ", DB_SIZE, DB_SIZE)
            + struct.pack("<Q", pos) + struct.pack("<Q", len(bodies))
            + struct.pack("<QQQQ", 0, 0, 0, 0)
            + struct.pack("<H", 4)
            + struct.pack("<QQ", DB_SIZE, 65536)
            + struct.pack("<H", 32) + struct.pack("<H", 1)
            + struct.pack("<Q", db_addr) + struct.pack("<H", 0))
    frhp_addr = f.alloc(frhp + struct.pack("<I", jenkins_lookup3(frhp)))
    f.place(db_addr, b"FHDB" + struct.pack("<BQ", 0, frhp_addr)
            + struct.pack("<I", 0))

    recs = sorted(
        (jenkins_lookup3(name.encode()), hid)
        for (name, _), hid in zip(entries, heap_ids))
    rec_bytes = [struct.pack("<I", h) + hid for h, hid in recs]
    NODE = 128
    REC = 4 + len(heap_ids[0])      # 11
    assert REC == 11

    def leaf(rs):
        body = b"BTLF" + struct.pack("<BB", 0, 5) + b"".join(rs)
        return f.alloc(body + struct.pack("<I", jenkins_lookup3(body)))

    # in-order split: child subtree = leaf(5) r leaf(5) r leaf(5) = 17
    def internal(rs17):
        l0 = leaf(rs17[0:5]); l1 = leaf(rs17[6:11]); l2 = leaf(rs17[12:17])
        body = (b"BTIN" + struct.pack("<BB", 0, 5)
                + rs17[5] + rs17[11]
                + struct.pack("<QB", l0, 5)      # ptr: addr + nrec(1)
                + struct.pack("<QB", l1, 5)
                + struct.pack("<QB", l2, 5))
        return f.alloc(body + struct.pack("<I", jenkins_lookup3(body)))

    c0 = internal(rec_bytes[0:17])
    c1 = internal(rec_bytes[18:35])
    c2 = internal(rec_bytes[36:53])
    root_body = (b"BTIN" + struct.pack("<BB", 0, 5)
                 + rec_bytes[17] + rec_bytes[35]
                 + struct.pack("<QBB", c0, 2, 17)  # ptr: addr+nrec+totNrec
                 + struct.pack("<QBB", c1, 2, 17)
                 + struct.pack("<QBB", c2, 2, 17))
    assert len(root_body) + 4 <= NODE
    root_addr = f.alloc(root_body + struct.pack("<I", jenkins_lookup3(root_body)))
    bthd = (b"BTHD" + struct.pack("<BB", 0, 5)
            + struct.pack("<IHH", NODE, REC, 2)   # depth 2
            + struct.pack("<BB", 100, 40)
            + struct.pack("<QH", root_addr, 2)
            + struct.pack("<Q", 53))
    bthd_addr = f.alloc(bthd + struct.pack("<I", jenkins_lookup3(bthd)))
    li = struct.pack("<BB", 0, 0) + struct.pack("<QQ", frhp_addr, bthd_addr)
    g_oh = f.alloc(object_header_v1([(0x0002, li)]))
    btree, heap = group_structures(f, [("btdeep", g_oh)])
    root_oh = f.alloc(object_header_v1([
        (0x0011, symbol_table_msg(btree, heap)),
    ]))
    superblock(f, root_oh)
    (OUT / "dense_btdeep.hdf5").write_bytes(bytes(f.buf))


def make_dense_huge():
    """Dense group with one HUGE link: a 199-char link name pushes its
    body (210 bytes) past the heap's max managed object size (128), so
    libhdf5 stores it outside the heap blocks and the name-index
    record carries a type-1 heap ID keying the heap's huge-object v2
    B-tree (record type 1: address, length, id). Ten short links stay
    managed in the one direct block.
    """
    f = H5()
    entries = _link_entries(f, "h", 10)
    long_name = "hugelink_" + "x" * 190
    val_addr = f.alloc(struct.pack("<h", 999))
    huge_oh = f.alloc(object_header_v1([
        (0x0001, dataspace([1])),
        (0x0003, dt_fixed(2, signed=True)),
        (0x0005, fill_value_v2()),
        (0x0008, layout_contiguous(val_addr, 2)),
    ]))
    bodies = [
        struct.pack("<BBB", 1, 0, len(name)) + name.encode()
        + struct.pack("<Q", oh)
        for name, oh in entries
    ]
    huge_body = (struct.pack("<BBB", 1, 0, len(long_name))
                 + long_name.encode() + struct.pack("<Q", huge_oh))
    assert len(huge_body) > 128  # past max managed object size
    huge_addr = f.alloc(huge_body)

    DB_SIZE, OFFSET_SIZE, LEN_SIZE = 512, 4, 2
    db_hdr_len = 4 + 1 + 8 + OFFSET_SIZE
    block = bytearray(DB_SIZE)
    heap_ids = []
    pos = db_hdr_len
    for body in bodies:
        heap_ids.append(b"\x00" + struct.pack("<I", pos)
                        + struct.pack("<H", len(body)))
        block[pos:pos + len(body)] = body
        pos += len(body)
    db_addr = f.alloc(bytes(block))

    # huge-object v2 B-tree: type 1, one leaf, record {addr, len, id=1}
    hrec = struct.pack("<QQQ", huge_addr, len(huge_body), 1)
    hleaf = b"BTLF" + struct.pack("<BB", 0, 1) + hrec
    hleaf_addr = f.alloc(hleaf + struct.pack("<I", jenkins_lookup3(hleaf)))
    hbthd = (b"BTHD" + struct.pack("<BB", 0, 1)
             + struct.pack("<IHH", 512, 24, 0)
             + struct.pack("<BB", 100, 40)
             + struct.pack("<QH", hleaf_addr, 1)
             + struct.pack("<Q", 1))
    hbthd_addr = f.alloc(hbthd + struct.pack("<I", jenkins_lookup3(hbthd)))

    frhp = (b"FRHP"
            + struct.pack("<BHHB", 0, 1 + OFFSET_SIZE + LEN_SIZE, 0, 0)
            + struct.pack("<I", 128)             # max managed object size
            + struct.pack("<Q", 2)               # next huge id
            + struct.pack("<Q", hbthd_addr)      # huge-object v2 btree
            + struct.pack("<Q", DB_SIZE - pos) + struct.pack("<Q", UNDEF)
            + struct.pack("<QQ", DB_SIZE, DB_SIZE)
            + struct.pack("<Q", pos) + struct.pack("<Q", len(bodies))
            + struct.pack("<QQ", len(huge_body), 1)  # huge size + count
            + struct.pack("<QQ", 0, 0)               # tiny size + count
            + struct.pack("<H", 4)
            + struct.pack("<QQ", DB_SIZE, 65536)
            + struct.pack("<H", 32) + struct.pack("<H", 1)
            + struct.pack("<Q", db_addr) + struct.pack("<H", 0))
    frhp_addr = f.alloc(frhp + struct.pack("<I", jenkins_lookup3(frhp)))
    f.place(db_addr, b"FHDB" + struct.pack("<BQ", 0, frhp_addr)
            + struct.pack("<I", 0))

    # type-1 huge heap ID: version/type byte 0x10, then id in 6 LE bytes
    huge_hid = b"\x10" + struct.pack("<Q", 1)[:6]
    all_named = list(zip([n for n, _ in entries], heap_ids)) \
        + [(long_name, huge_hid)]
    recs = sorted((jenkins_lookup3(n.encode()), hid) for n, hid in all_named)
    rec_bytes = b"".join(struct.pack("<I", h) + hid for h, hid in recs)
    btlf = b"BTLF" + struct.pack("<BB", 0, 5) + rec_bytes
    btlf_addr = f.alloc(btlf + struct.pack("<I", jenkins_lookup3(btlf)))
    bthd = (b"BTHD" + struct.pack("<BB", 0, 5)
            + struct.pack("<IHH", 512, 4 + 7, 0)
            + struct.pack("<BB", 100, 40)
            + struct.pack("<QH", btlf_addr, len(recs))
            + struct.pack("<Q", len(recs)))
    bthd_addr = f.alloc(bthd + struct.pack("<I", jenkins_lookup3(bthd)))
    li = struct.pack("<BB", 0, 0) + struct.pack("<QQ", frhp_addr, bthd_addr)
    g_oh = f.alloc(object_header_v1([(0x0002, li)]))
    btree, heap = group_structures(f, [("hugeg", g_oh)])
    root_oh = f.alloc(object_header_v1([
        (0x0011, symbol_table_msg(btree, heap)),
    ]))
    superblock(f, root_oh)
    (OUT / "dense_huge.hdf5").write_bytes(bytes(f.buf))


def make_dense_tiny_ext():
    """Dense group whose heap uses a 20-byte heap ID length, so every
    short link body stores as an EXTENDED-tiny object: type-2 ID with
    a 12-bit length split across byte 0's low nibble and a second
    length byte (the form libhdf5 uses whenever heap ID length > 18).
    No direct blocks exist at all (root block address undefined).
    """
    f = H5()
    entries = _link_entries(f, "t", 9)
    bodies = [
        struct.pack("<BBB", 1, 0, len(name)) + name.encode()
        + struct.pack("<Q", oh)
        for name, oh in entries
    ]
    ID_LEN = 20
    heap_ids = []
    for body in bodies:
        assert len(body) <= ID_LEN - 2
        n = len(body) - 1
        # extended tiny: low nibble of byte0 + one extra length byte
        hid = (bytes([0x20 | (n & 0x0F), (n >> 4) & 0xFF]) + body
               + b"\x00" * (ID_LEN - 2 - len(body)))
        heap_ids.append(hid)
    frhp = (b"FRHP"
            + struct.pack("<BHHB", 0, ID_LEN, 0, 0)
            + struct.pack("<I", 4096)
            + struct.pack("<Q", 0) + struct.pack("<Q", UNDEF)
            + struct.pack("<Q", 0) + struct.pack("<Q", UNDEF)
            + struct.pack("<QQ", 0, 0)
            + struct.pack("<Q", 0) + struct.pack("<Q", 0)
            + struct.pack("<QQ", 0, 0)           # huge size + count
            + struct.pack("<QQ", sum(len(b) for b in bodies), len(bodies))
            + struct.pack("<H", 4)
            + struct.pack("<QQ", 512, 65536)
            + struct.pack("<H", 32) + struct.pack("<H", 0)
            + struct.pack("<Q", UNDEF) + struct.pack("<H", 0))
    frhp_addr = f.alloc(frhp + struct.pack("<I", jenkins_lookup3(frhp)))
    recs = sorted(
        (jenkins_lookup3(name.encode()), hid)
        for (name, _), hid in zip(entries, heap_ids))
    rec_bytes = b"".join(struct.pack("<I", h) + hid for h, hid in recs)
    btlf = b"BTLF" + struct.pack("<BB", 0, 5) + rec_bytes
    btlf_addr = f.alloc(btlf + struct.pack("<I", jenkins_lookup3(btlf)))
    bthd = (b"BTHD" + struct.pack("<BB", 0, 5)
            + struct.pack("<IHH", 512, 4 + ID_LEN, 0)
            + struct.pack("<BB", 100, 40)
            + struct.pack("<QH", btlf_addr, len(recs))
            + struct.pack("<Q", len(recs)))
    bthd_addr = f.alloc(bthd + struct.pack("<I", jenkins_lookup3(bthd)))
    li = struct.pack("<BB", 0, 0) + struct.pack("<QQ", frhp_addr, bthd_addr)
    g_oh = f.alloc(object_header_v1([(0x0002, li)]))
    btree, heap = group_structures(f, [("tinyext", g_oh)])
    root_oh = f.alloc(object_header_v1([
        (0x0011, symbol_table_msg(btree, heap)),
    ]))
    superblock(f, root_oh)
    (OUT / "dense_tinyext.hdf5").write_bytes(bytes(f.buf))


make_contiguous()
make_chunked()
make_minc2()
make_itk()
make_v2()
make_chunked_deep()
make_dense()
make_dense_filtered()
make_dense_deep()
make_dense_btdeep()
make_dense_huge()
make_dense_tiny_ext()
print("wrote hdf5 fixtures to", OUT)
