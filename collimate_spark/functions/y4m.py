"""Minimal real YUV4MPEG2 (.y4m) video codec on the standard library —
the video sibling of functions/png.py and functions/wav.py.

The container ships no video codecs (no ffmpeg/pyav), but YUV4MPEG2 is a
REAL public interchange format (the uncompressed format mjpegtools /
ffmpeg use for raw video pipes): an ASCII stream header
``YUV4MPEG2 W<w> H<h> F<num>:<den> Ip A1:1 C420jpeg\\n`` followed by one
``FRAME\\n`` marker + raw planar YCbCr data per frame. So the multimodal
feature kernel can do a REAL decode (header parse → frame iteration →
per-plane numpy arrays) instead of stubbing. Scope: progressive C420jpeg
(2×2-subsampled chroma) and Cmono, which is what the synthesis side
emits. In a deployment with codecs installed, ``decode`` is the single
swap point for pyav/ffmpeg; the Arrow batching, schema, and partitioning
around it are identical.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"


def is_y4m(data: bytes) -> bool:
    return data[: len(_MAGIC)] == _MAGIC


def encode(
    frames: np.ndarray,
    fps: tuple[int, int] = (25, 1),
    chroma: str = "mono",
) -> bytes:
    """(n_frames, h, w) uint8 luma array → .y4m bytes.

    ``chroma='mono'`` writes luma-only planes; ``chroma='420jpeg'`` adds
    neutral (128) 2×2-subsampled chroma planes (h and w must be even)."""
    if frames.dtype != np.uint8 or frames.ndim != 3:
        raise ValueError(f"expected (n, h, w) uint8, got {frames.dtype} {frames.shape}")
    n, h, w = frames.shape
    if chroma == "mono":
        ctag = "Cmono"
        chroma_plane = b""
    elif chroma == "420jpeg":
        if h % 2 or w % 2:
            raise ValueError("C420 requires even dimensions")
        ctag = "C420jpeg"
        chroma_plane = bytes([128]) * ((h // 2) * (w // 2)) * 2
    else:
        raise ValueError(f"unsupported chroma {chroma!r}")
    header = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 {ctag}\n".encode()
    parts = [header]
    for i in range(n):
        parts.append(b"FRAME\n")
        parts.append(frames[i].tobytes())
        parts.append(chroma_plane)
    return b"".join(parts)


def decode(data: bytes) -> tuple[tuple[int, int], np.ndarray]:
    """.y4m bytes → ((fps_num, fps_den), (n_frames, h, w) uint8 luma).
    Real decode: stream-header parse + per-FRAME plane extraction. Chroma
    planes of C420* streams are skipped (luma carries the features)."""
    if not is_y4m(data):
        raise ValueError("not a YUV4MPEG2 stream (bad magic)")
    nl = data.index(b"\n")
    fields = data[:nl].decode("ascii").split(" ")
    w = h = None
    fps = (25, 1)
    chroma = "420jpeg"
    for f in fields[1:]:
        if f.startswith("W"):
            w = int(f[1:])
        elif f.startswith("H"):
            h = int(f[1:])
        elif f.startswith("F"):
            num, den = f[1:].split(":")
            fps = (int(num), int(den))
        elif f.startswith("C"):
            chroma = f[1:]
    if w is None or h is None:
        raise ValueError("missing W/H in stream header")
    luma_size = w * h
    if chroma == "mono":
        frame_size = luma_size
    elif chroma.startswith("420"):
        frame_size = luma_size + 2 * ((h // 2) * (w // 2))
    else:
        raise ValueError(f"unsupported chroma {chroma!r}")
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        pos = fnl + 1
        plane = np.frombuffer(data[pos : pos + luma_size], dtype=np.uint8)
        if plane.size != luma_size:
            raise ValueError("truncated frame")
        frames.append(plane.reshape(h, w))
        pos += frame_size
    return fps, np.stack(frames) if frames else np.empty((0, h, w), dtype=np.uint8)
