#!/usr/bin/env python3
"""Generate a Zarr v2 / OME-Zarr v0.4 store with an implementation
independent of the Scala engine (numpy + zlib + hand-written JSON per
the Zarr v2 spec), used as a committed interop fixture:
src/test/resources/fixtures/interop.zarr

Layout choices deliberately exercise reader edge paths:
 - scale0: big-endian uint16 (>u2), zlib compressor, 32x32 chunks over
   a 48x80 image (ragged edge chunks, padded on disk per spec)
 - scale1: little-endian float32, raw (null compressor), '.' separator
 - omero rendering metadata + axis units in root attrs
"""
import json
import pathlib
import shutil
import zlib

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
OUT = ROOT / "src/test/resources/fixtures/interop.zarr"


def write_array(path, arr, chunks, dtype_str, compressor, separator):
    path.mkdir(parents=True, exist_ok=True)
    zarray = {
        "zarr_format": 2,
        "shape": list(arr.shape),
        "chunks": list(chunks),
        "dtype": dtype_str,
        "compressor": compressor,
        "fill_value": 0,
        "order": "C",
        "filters": None,
        "dimension_separator": separator,
    }
    (path / ".zarray").write_text(json.dumps(zarray, indent=2))
    grid = [(s + c - 1) // c for s, c in zip(arr.shape, chunks)]
    for iy in range(grid[0]):
        for ix in range(grid[1]):
            block = np.zeros(chunks, dtype=arr.dtype)
            ys = slice(iy * chunks[0], min((iy + 1) * chunks[0], arr.shape[0]))
            xs = slice(ix * chunks[1], min((ix + 1) * chunks[1], arr.shape[1]))
            block[: ys.stop - ys.start, : xs.stop - xs.start] = arr[ys, xs]
            raw = block.astype(dtype_str).tobytes(order="C")
            if compressor is not None and compressor["id"] == "zlib":
                raw = zlib.compress(raw, compressor["level"])
            key = f"{iy}{separator}{ix}"
            target = path / key
            target.parent.mkdir(parents=True, exist_ok=True)
            target.write_bytes(raw)


def main():
    if OUT.exists():
        shutil.rmtree(OUT)
    OUT.mkdir(parents=True)
    rng = np.random.default_rng(99)
    s0 = rng.integers(0, 60000, size=(48, 80), dtype=np.uint16)
    s1 = (s0[::2, ::2] / 4.0).astype(np.float32)

    (OUT / ".zgroup").write_text(json.dumps({"zarr_format": 2}))
    attrs = {
        "multiscales": [{
            "axes": [
                {"name": "y", "type": "space", "unit": "micrometer"},
                {"name": "x", "type": "space", "unit": "micrometer"},
            ],
            "datasets": [
                {"path": "scale0/image", "coordinateTransformations": [
                    {"type": "scale", "scale": [0.5, 0.5]},
                    {"type": "translation", "translation": [0.0, 0.0]}]},
                {"path": "scale1/image", "coordinateTransformations": [
                    {"type": "scale", "scale": [1.0, 1.0]},
                    {"type": "translation", "translation": [0.25, 0.25]}]},
            ],
            "version": "0.4",
            "name": "interop",
            "type": "itkwasm_bin_shrink",
        }],
        "omero": {"channels": [
            {"color": "00FF00", "window": {"min": 0, "max": 60000,
                                           "start": 100, "end": 50000},
             "label": "green"}]},
    }
    (OUT / ".zattrs").write_text(json.dumps(attrs, indent=2))
    for i in range(2):
        (OUT / f"scale{i}").mkdir(exist_ok=True)
        (OUT / f"scale{i}/.zgroup").write_text(json.dumps({"zarr_format": 2}))
    write_array(OUT / "scale0/image", s0, (32, 32), ">u2",
                {"id": "zlib", "level": 6}, "/")
    write_array(OUT / "scale1/image", s1, (24, 40), "<f4", None, ".")
    # checksums for the spec to assert against
    print("s0 sum:", int(s0.sum()), "s0[5,7]:", int(s0[5, 7]))
    print("s1 sum:", float(np.float64(s1).sum()), "s1[3,3]:", float(s1[3, 3]))


if __name__ == "__main__":
    main()
