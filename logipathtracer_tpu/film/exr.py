"""Minimal OpenEXR writer (uncompressed float32 scanlines).

HDR radiance output for the RMSE harness and external comparison —
the film-side capability SURVEY.md §7 lists alongside PNG.  Write-only;
readable by OpenEXR/oiio/tev.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = 0x01312F76


def _attr(name: bytes, typ: bytes, data: bytes) -> bytes:
    return name + b"\0" + typ + b"\0" + struct.pack("<I", len(data)) + data


def encode_exr(img: np.ndarray) -> bytes:
    """img: [H, W, 3] float32 (linear radiance) -> EXR bytes."""
    img = np.ascontiguousarray(img, np.float32)
    h, w, c = img.shape
    assert c == 3
    # Channel list (alphabetical: B, G, R), each FLOAT (type 2).
    chan = b""
    for name in (b"B", b"G", b"R"):
        chan += name + b"\0" + struct.pack("<iiii", 2, 0, 1, 1)
    chan += b"\0"
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header = b""
    header += _attr(b"channels", b"chlist", chan)
    header += _attr(b"compression", b"compression", b"\0")  # none
    header += _attr(b"dataWindow", b"box2i", box)
    header += _attr(b"displayWindow", b"box2i", box)
    header += _attr(b"lineOrder", b"lineOrder", b"\0")  # increasing y
    header += _attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
    header += _attr(b"screenWindowCenter", b"v2f",
                    struct.pack("<ff", 0.0, 0.0))
    header += _attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
    header += b"\0"

    head = struct.pack("<II", _MAGIC, 2) + header
    # Scanline offset table.
    line_size = 8 + w * 4 * 3  # y + size prefix... computed below
    data_off = len(head) + 8 * h
    offsets = b"".join(struct.pack("<Q", data_off + i * line_size)
                       for i in range(h))
    body = b""
    for y in range(h):
        # Per scanline: y, byte count, then channels B, G, R planar.
        row = img[y]
        payload = (row[:, 2].tobytes() + row[:, 1].tobytes()
                   + row[:, 0].tobytes())
        body += struct.pack("<iI", y, len(payload)) + payload
    return head + offsets + body


def write_exr(path: str, img: np.ndarray) -> None:
    with open(path, "wb") as f:
        f.write(encode_exr(img))
