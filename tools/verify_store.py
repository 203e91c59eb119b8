#!/usr/bin/env python3
"""Independent verification of a graft-written OME-Zarr v0.4 store:
parse the metadata and decode every chunk using only numpy + json +
gzip/zlib (no graft code, no zarr-python), then print per-scale
checksums. Usage: verify_store.py <store> [expected_sum_scale0]
"""
import gzip
import json
import pathlib
import sys
import zlib

import numpy as np

DTYPES = {"|u1": np.uint8, "<u2": np.dtype("<u2"), "<i2": np.dtype("<i2"),
          "<i4": np.dtype("<i4"), "<f4": np.dtype("<f4"), "<f8": np.dtype("<f8"),
          "<u4": np.dtype("<u4"), "<i8": np.dtype("<i8"), "|b1": np.bool_}


def read_array(path):
    za = json.loads((path / ".zarray").read_text())
    shape, chunks = za["shape"], za["chunks"]
    sep = za.get("dimension_separator", ".")
    comp = za.get("compressor")
    dt = DTYPES[za["dtype"]]
    arr = np.zeros(shape, dtype=dt)
    grid = [(s + c - 1) // c for s, c in zip(shape, chunks)]
    idx = [0] * len(grid)
    import itertools
    for pos in itertools.product(*[range(g) for g in grid]):
        key = sep.join(str(p) for p in pos)
        raw = (path / key).read_bytes() if sep == "." else (
            path.joinpath(*[str(p) for p in pos])).read_bytes()
        if comp is not None:
            if comp["id"] == "gzip":
                raw = gzip.decompress(raw)
            elif comp["id"] == "zlib":
                raw = zlib.decompress(raw)
            else:
                raise SystemExit(f"unsupported compressor {comp['id']}")
        block = np.frombuffer(raw, dtype=dt).reshape(chunks)
        sl = tuple(slice(p * c, min((p + 1) * c, s))
                   for p, c, s in zip(pos, chunks, shape))
        arr[sl] = block[tuple(slice(0, s.stop - s.start) for s in sl)]
    return arr


def main():
    store = pathlib.Path(sys.argv[1])
    attrs = json.loads((store / ".zattrs").read_text())
    ms = attrs["multiscales"][0]
    print("version:", ms.get("version"), "method:", ms.get("type"))
    ok = True
    for d in ms["datasets"]:
        arr = read_array(store / d["path"])
        scales = [t["scale"] for t in d["coordinateTransformations"]
                  if t["type"] == "scale"][0]
        print(f"{d['path']}: shape={arr.shape} sum={arr.sum()} scale={scales}")
    if len(sys.argv) > 2:
        arr0 = read_array(store / ms["datasets"][0]["path"])
        expected = int(sys.argv[2])
        ok = int(arr0.sum()) == expected
        print("scale0 sum matches:", ok)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
