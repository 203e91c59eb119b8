#!/usr/bin/env python3
"""Committed fixtures for IwiIO (.iwi / .iwi.cbor itk-wasm image
containers) — an INDEPENDENT pure-stdlib CBOR encoder (RFC 8949
definite-length forms, RFC 8746 typed-array tags), so the Scala
decoder is exercised against a producer that shares none of its code.
Same shared synthetic volume as make_volume_fixture.py:

    shape (x,y,z) = (6,5,4), v(x,y,z) = (x*7 + y*11 + z*13) % 200

Files (src/test/resources/fixtures/vol/):
    vol.iwi.cbor       uint8 payload, typed-array tag 64
    vol_be.iwi.cbor    int16 BIG-endian payload, typed-array tag 73,
                       indefinite-length root map (exercises §3.2.2)
    vol_rgb.iwi.cbor   3-component uint8 vector image, v+c interleaved
    vol.iwi/           directory form: index.json + data/*.raw, float32
"""
import struct
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "src/test/resources/fixtures/vol"
OUT.mkdir(parents=True, exist_ok=True)

NX, NY, NZ = 6, 5, 4


def vox():
    # Fortran order: x fastest
    return [
        (x * 7 + y * 11 + z * 13) % 200
        for z in range(NZ) for y in range(NY) for x in range(NX)
    ]


# --- minimal CBOR encoder (independent of the Scala implementation) ----

def head(major, arg):
    if arg < 24:
        return bytes([(major << 5) | arg])
    if arg < 256:
        return bytes([(major << 5) | 24, arg])
    if arg < 65536:
        return bytes([(major << 5) | 25]) + struct.pack(">H", arg)
    if arg < 2**32:
        return bytes([(major << 5) | 26]) + struct.pack(">I", arg)
    return bytes([(major << 5) | 27]) + struct.pack(">Q", arg)


def cbor(v):
    if isinstance(v, bool):
        return b"\xf5" if v else b"\xf4"
    if isinstance(v, int):
        return head(0, v) if v >= 0 else head(1, -1 - v)
    if isinstance(v, float):
        f32 = struct.unpack(">f", struct.pack(">f", v))[0]
        if f32 == v:
            return b"\xfa" + struct.pack(">f", v)
        return b"\xfb" + struct.pack(">d", v)
    if isinstance(v, str):
        b = v.encode("utf-8")
        return head(3, len(b)) + b
    if isinstance(v, bytes):
        return head(2, len(v)) + v
    if isinstance(v, list):
        return head(4, len(v)) + b"".join(cbor(x) for x in v)
    if isinstance(v, dict):
        return head(5, len(v)) + b"".join(cbor(k) + cbor(x) for k, x in v.items())
    if isinstance(v, Tag):
        return head(6, v.tag) + cbor(v.value)
    raise TypeError(type(v))


class Tag:
    def __init__(self, tag, value):
        self.tag, self.value = tag, value


def image_doc(component_type, data_tag, payload, components=1, pixel="Scalar"):
    return {
        "imageType": {
            "dimension": 3,
            "componentType": component_type,
            "pixelType": pixel,
            "components": components,
        },
        "name": "fixture",
        "origin": [10.0, 20.0, 30.0],
        "spacing": [1.5, 2.5, 3.5],
        "direction": Tag(86, struct.pack("<9d", 1, 0, 0, 0, 1, 0, 0, 0, 1)),
        "size": [NX, NY, NZ],
        "metadata": {},
        "data": Tag(data_tag, payload),
    }


V = vox()

# --- vol.iwi.cbor: uint8, tag 64 ---------------------------------------
(OUT / "vol.iwi.cbor").write_bytes(
    cbor(image_doc("uint8", 64, bytes(V))))

# --- vol_be.iwi.cbor: int16 big-endian (tag 73), indefinite root map ---
doc = image_doc("int16", 73, b"".join(struct.pack(">h", v) for v in V))
body = b"".join(cbor(k) + cbor(v) for k, v in doc.items())
(OUT / "vol_be.iwi.cbor").write_bytes(b"\xbf" + body + b"\xff")

# --- vol_rgb.iwi.cbor: 3-component uint8 vector image ------------------
rgb = []
for v in V:
    rgb += [v, (v + 40) % 200, (v + 80) % 200]  # component fastest
(OUT / "vol_rgb.iwi.cbor").write_bytes(
    cbor(image_doc("uint8", 64, bytes(rgb), components=3, pixel="Vector")))

# --- vol.iwi/: directory form, float32 LE ------------------------------
d = OUT / "vol.iwi"
(d / "data").mkdir(parents=True, exist_ok=True)
index = """{
  "imageType": {
    "dimension": 3,
    "componentType": "float32",
    "pixelType": "Scalar",
    "components": 1
  },
  "name": "fixture",
  "origin": [10.0, 20.0, 30.0],
  "spacing": [1.5, 2.5, 3.5],
  "direction": "data/direction.raw",
  "size": [6, 5, 4],
  "metadata": [],
  "data": "data/data.raw"
}
"""
(d / "index.json").write_text(index)
(d / "data" / "direction.raw").write_bytes(
    struct.pack("<9d", 1, 0, 0, 0, 1, 0, 0, 0, 1))
(d / "data" / "data.raw").write_bytes(
    b"".join(struct.pack("<f", float(v)) for v in V))

print("wrote iwi fixtures to", OUT)
