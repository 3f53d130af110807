"""Minimal real PNG codec on the standard library (zlib + struct + numpy).

The container ships no image libraries (no PIL), but PNG itself is just
zlib-compressed filtered scanlines — so the multimodal feature kernel can
do a REAL decode (signature → chunks → inflate → per-scanline unfilter →
pixel array) instead of stubbing. Scope: 8-bit depth, greyscale (color
type 0) and RGB (color type 2), non-interlaced — full filter support
(None/Sub/Up/Average/Paeth) on decode, filter 0 on encode. In a real
deployment with codecs installed, `decode` is the single swap point for
PIL/libvips; everything around it (Arrow batches, schema, partitioning)
is identical.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) greyscale or (h, w, 3) RGB → PNG bytes
    (filter 0 scanlines, one zlib stream)."""
    if arr.dtype != np.uint8:
        raise ValueError(f"expected uint8 pixels, got {arr.dtype}")
    if arr.ndim == 2:
        color_type = 0
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type = 2
    else:
        raise ValueError(f"expected (h,w) or (h,w,3), got {arr.shape}")
    h, w = arr.shape[:2]
    raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 9))
        + _chunk(b"IEND", b"")
    )


def is_png(data: bytes) -> bool:
    return data[:8] == SIGNATURE


def decode(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w) or (h, w, 3). Real decode: chunk
    parse, inflate, unfilter (all five PNG filter types)."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    idat = bytearray()
    ihdr = None
    while pos + 8 <= len(data):
        (length,), typ = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8 or color_type not in (0, 2) or interlace:
        raise ValueError(
            f"unsupported PNG (depth={depth} color_type={color_type} interlace={interlace})"
        )
    ch = 1 if color_type == 0 else 3
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt scanline data")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for r in range(h):
        f = raw[r * (stride + 1)]
        line = np.frombuffer(raw, np.uint8, stride, r * (stride + 1) + 1).astype(np.int64)
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 255
        else:  # Sub / Average / Paeth need left-neighbor recurrence
            cur = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0  # left
                b = prev[i]  # up
                if f == 1:  # Sub
                    cur[i] = (line[i] + a) & 255
                elif f == 3:  # Average
                    cur[i] = (line[i] + (a + b) // 2) & 255
                elif f == 4:  # Paeth
                    c = prev[i - ch] if i >= ch else 0  # upper-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    if pa <= pb and pa <= pc:
                        pred = a
                    elif pb <= pc:
                        pred = b
                    else:
                        pred = c
                    cur[i] = (line[i] + pred) & 255
                else:
                    raise ValueError(f"bad filter type {f}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, 3) if ch == 3 else out.reshape(h, w)
