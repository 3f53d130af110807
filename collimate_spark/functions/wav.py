"""Minimal real WAV (RIFF/PCM) codec on the standard library (wave +
struct + numpy) — the audio twin of functions/png.py.

The container ships no audio libraries (no torchaudio/soundfile), but PCM
WAV is just a RIFF header + interleaved little-endian samples — so the
multimodal feature kernel can do a REAL decode (RIFF parse → frame read →
int16 sample array) instead of stubbing. Scope: 16-bit PCM, any channel
count / sample rate, which is what the synthesis side emits. In a real
deployment with codecs installed, `decode` is the single swap point for
torchaudio/ffmpeg; everything around it (Arrow batches, schema,
partitioning) is identical.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 array (n,) mono or (n, ch) multi-channel → WAV bytes
    (16-bit PCM, interleaved frames)."""
    if samples.dtype != np.int16:
        raise ValueError(f"expected int16 samples, got {samples.dtype}")
    if samples.ndim == 1:
        samples = samples.reshape(-1, 1)
    if samples.ndim != 2:
        raise ValueError(f"expected (n,) or (n, ch), got {samples.shape}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, int16 array (n_frames, n_channels)).
    Real decode: RIFF chunk parse + PCM frame deinterleave."""
    if not is_wav(data):
        raise ValueError("not a WAV (bad RIFF signature)")
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(f"unsupported sample width {w.getsampwidth()} (16-bit PCM only)")
        n, ch, rate = w.getnframes(), w.getnchannels(), w.getframerate()
        raw = w.readframes(n)
    return rate, np.frombuffer(raw, dtype="<i2").reshape(n, ch)
