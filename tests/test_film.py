"""Film: tonemap curve, sRGB, EXR/PNG writers, RMSE."""

import struct
import zlib

import numpy as np

from logipathtracer_tpu.film.exr import encode_exr
from logipathtracer_tpu.film.image import (linear_to_srgb, rmse,
                                           srgb_to_linear, tonemap,
                                           to_uint8)
from logipathtracer_tpu.film.png import decode_png, encode_png


def test_tonemap_reference_curve():
    """exposure 1.5, gamma 2.2, vertical flip (tex_to_quad.frag:21-33)."""
    accum = np.zeros((2, 1, 3), np.float32)
    accum[0, 0] = 4.0   # top row
    accum[1, 0] = 0.0
    out = np.asarray(tonemap(accum, sample_count=2))
    want = (1.0 - np.exp(-2.0 * 1.5)) ** (1 / 2.2)
    # Flip: the bright input row 0 lands on output row 1.
    assert abs(out[1, 0, 0] - want) < 1e-6
    assert out[0, 0, 0] == 0.0


def test_srgb_roundtrip():
    x = np.linspace(0, 1, 64, dtype=np.float32)
    y = np.asarray(srgb_to_linear(linear_to_srgb(x)))
    assert np.allclose(y, x, atol=1e-5)
    # Piecewise breakpoint (util.glsl:5).
    assert np.allclose(np.asarray(srgb_to_linear(np.float32(0.04045))),
                       0.04045 / 12.92, atol=1e-7)


def test_rmse():
    a = np.zeros((4, 4, 3))
    b = np.full((4, 4, 3), 0.5)
    assert abs(rmse(a, b) - 0.5) < 1e-12
    assert rmse(a, a) == 0.0


def test_exr_structure():
    img = np.random.default_rng(0).random((5, 7, 3)).astype(np.float32)
    data = encode_exr(img)
    magic, version = struct.unpack("<II", data[:8])
    assert magic == 0x01312F76 and version == 2
    # Recover one float from the last scanline payload R channel.
    line_size = 8 + 7 * 4 * 3
    body = data[-5 * line_size:]
    y, size = struct.unpack("<iI", body[:8])
    assert y == 0 and size == 7 * 12
    b_chan = np.frombuffer(body[8:8 + 28], np.float32)
    assert np.allclose(b_chan, img[0, :, 2])


def test_png_paeth_decode():
    """Exercise non-trivial PNG filters through an external-style file."""
    rng = np.random.default_rng(1)
    img = (rng.random((9, 13, 3)) * 255).astype(np.uint8)
    # Build a PNG with filter type 2 (Up) manually.
    h, w, c = img.shape
    raw = bytearray()
    prev = np.zeros((w * c,), np.uint8)
    for yy in range(h):
        line = img[yy].reshape(-1)
        raw.append(2)
        raw += bytes((line - prev) & 0xFF)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))
    dec = decode_png(png)
    assert (dec[:, :, :3] == img).all()


def test_to_uint8_clip():
    assert to_uint8(np.array([[-0.5, 0.5, 2.0]])).tolist() == [[0, 128, 255]]
