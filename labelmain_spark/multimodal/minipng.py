"""Minimal pure-stdlib PNG codec for the multimodal real-decode path
(r7 verdict item 8: the env-gated PIL branch had never executed in
this container, making the "decodes when a codec exists" claim
vacuous — this vendors the smallest codec that makes it real).

Scope is deliberately tiny and fully public: the PNG spec's (RFC 2083)
8-bit GRAYSCALE, non-interlaced subset — IHDR/IDAT/IEND chunk walk,
zlib inflate, and the five scanline filters (None/Sub/Up/Average/
Paeth). That is enough to round-trip a deterministic test image and to
drive the REAL branch of ``decode_features`` end-to-end in CI; any
richer media (color PNG, JPEG, audio, video) still routes through PIL
when present or the deterministic fake otherwise. The encoder exists
so tests can fabricate valid fixtures without any external tool.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def encode_gray(pixels: bytes, width: int, height: int) -> bytes:
    """Encode 8-bit grayscale pixels (row-major, len == width*height)
    as a minimal non-interlaced PNG (filter 0 on every scanline)."""
    if len(pixels) != width * height:
        raise ValueError("pixels length != width*height")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def is_png(payload: bytes) -> bool:
    return payload[:8] == PNG_MAGIC


def decode_gray(payload: bytes) -> bytes:
    """Decode an 8-bit grayscale non-interlaced PNG to raw pixel bytes
    (row-major). Raises ValueError on anything outside the supported
    subset — callers treat that exactly like an unknown codec."""
    if not is_png(payload):
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    idat = b""
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, ctype, comp, filt, ilace) != (8, 0, 0, 0, 0):
                raise ValueError("unsupported PNG subset")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG")
    raw = zlib.decompress(idat)
    stride = width  # 1 byte/pixel, grayscale
    if len(raw) != (stride + 1) * height:
        raise ValueError("bad scanline data")
    out = bytearray(width * height)
    prev = bytes(width)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for x in range(1, width):
                line[x] = (line[x] + line[x - 1]) & 0xFF
        elif f == 2:  # Up
            for x in range(width):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif f == 3:  # Average
            for x in range(width):
                a = line[x - 1] if x else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(width):
                a = line[x - 1] if x else 0
                b = prev[x]
                c = prev[x - 1] if x else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pr) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown filter {f}")
        out[y * width : (y + 1) * width] = line
        prev = line
    return bytes(out)
