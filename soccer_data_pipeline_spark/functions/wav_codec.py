"""Pure-stdlib WAV (RIFF/PCM) codec for the multimodal operators.

Same philosophy as ``png_codec.py``: the container ships no libav, but
RIFF/PCM WAV is simple enough for the standard library alone —
``wave`` walks the fmt/data chunks, ``struct``/``int.from_bytes``
widen the PCM samples. This makes the audio path REAL for WAV payloads
(decode → channels / sample rate / duration / RMS / amplitude
histogram) while compressed audio (mp3/ogg/aac) and video stay
documented ``NotImplementedError`` boundaries (their codecs genuinely
need external libraries).

Scope (documented, asserted): integer PCM, sample widths 1/2/3/4
bytes. Float PCM and compressed WAV variants raise
``NotImplementedError`` so callers can fall back. Sample values are
normalized to [-1, 1) floats; numpy widens the hot loop when it is
importable (it always is in this container), with a stdlib fallback.
"""

from __future__ import annotations

import io
import struct
import wave


def is_wav(payload: bytes | None) -> bool:
    return (
        payload is not None
        and len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    )


def decode_wav(payload: bytes) -> tuple[int, int, int, list[float]]:
    """→ (channels, sample_rate_hz, n_frames, samples) with samples
    interleaved and normalized to [-1, 1) floats."""
    if not is_wav(payload):
        raise ValueError("not a WAV payload")
    try:
        with wave.open(io.BytesIO(payload)) as w:
            channels = w.getnchannels()
            width = w.getsampwidth()
            rate = w.getframerate()
            n_frames = w.getnframes()
            raw = w.readframes(n_frames)
    except wave.Error as exc:  # compressed / float / malformed variants
        raise NotImplementedError(f"WAV variant unsupported by stdlib reader: {exc}")
    return channels, rate, n_frames, _widen(raw, width)


def _widen(raw: bytes, width: int) -> list[float]:
    """Interleaved PCM bytes → normalized floats."""
    try:
        import numpy as np

        if width == 1:  # unsigned 8-bit, bias 128
            return ((np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0).tolist()
        if width == 2:
            return (np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0).tolist()
        if width == 4:
            return (np.frombuffer(raw, "<i4").astype(np.float64) / 2147483648.0).tolist()
        # width 3 has no numpy dtype; fall through to the stdlib path
    except ImportError:
        pass
    if width == 1:
        return [(b - 128) / 128.0 for b in raw]
    if width == 2:
        return [v / 32768.0 for v in struct.unpack(f"<{len(raw) // 2}h", raw)]
    if width == 3:
        return [
            int.from_bytes(raw[i : i + 3], "little", signed=True) / 8388608.0
            for i in range(0, len(raw) - 2, 3)
        ]
    if width == 4:
        return [v / 2147483648.0 for v in struct.unpack(f"<{len(raw) // 4}i", raw)]
    raise NotImplementedError(f"PCM sample width {width} unsupported")


def duration_ms(n_frames: int, sample_rate_hz: int) -> int:
    return int(round(n_frames * 1000.0 / sample_rate_hz)) if sample_rate_hz else 0


def rms(samples: list[float]) -> float:
    """Root-mean-square amplitude of normalized samples (0 for silence,
    ~0.707 for a full-scale sine)."""
    if not samples:
        return 0.0
    return (sum(s * s for s in samples) / len(samples)) ** 0.5


def amplitude_histogram(samples: list[float], bins: int = 8) -> list[float]:
    """Normalized ``bins``-bucket histogram of sample amplitude over
    [-1, 1) — the audio analog of the image luminance histogram, so the
    multimodal ``feature`` column keeps one 8-dim contract across
    media types."""
    counts = [0] * bins
    if not samples:
        return [0.0] * bins
    for s in samples:
        i = int((s + 1.0) * bins / 2.0)
        counts[min(max(i, 0), bins - 1)] += 1
    n = len(samples)
    return [round(c / n, 6) for c in counts]


def encode_wav(
    channels: int, sample_rate_hz: int, sample_width: int, frames: bytes
) -> bytes:
    """Interleaved PCM frame bytes → RIFF/PCM WAV payload (tests and
    the synthetic-media fixtures use this; it is the exact inverse of
    ``decode_wav`` for integer PCM)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sample_width)
        w.setframerate(sample_rate_hz)
        w.writeframes(frames)
    return buf.getvalue()
