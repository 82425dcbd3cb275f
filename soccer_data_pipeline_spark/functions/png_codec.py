"""Pure-stdlib PNG codec (zlib + struct) for the multimodal operators.

The container has no Pillow/libav, but PNG's format is simple enough to
decode/encode with the standard library alone: zlib inflate + per-
scanline unfiltering (filters 0-4 per the PNG spec §9). This makes the
image path REAL for PNG payloads — decode, resample, re-encode —
while JPEG/video stay stubbed (their codecs genuinely need external
libraries).

Scope (documented, asserted): 8-bit depth, non-interlaced, color types
0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA). No palette, no 16-bit,
no Adam7 — raise NotImplementedError so callers can fall back.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(payload: bytes | None) -> bool:
    return payload is not None and payload[:8] == PNG_SIG


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """→ (width, height, channels, pixels) with pixels row-major,
    ``width*height*channels`` bytes."""
    if not is_png(payload):
        raise ValueError("not a PNG payload")
    pos = 8
    idat = bytearray()
    w = h = color_type = None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if bit_depth != 8:
                raise NotImplementedError(f"PNG bit depth {bit_depth} unsupported")
            if interlace != 0:
                raise NotImplementedError("Adam7 interlacing unsupported")
            if color_type not in _CHANNELS:
                raise NotImplementedError(f"PNG color type {color_type} unsupported")
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    ch = _CHANNELS[color_type]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    pos = 0
    for y in range(h):
        f = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter byte {f}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return w, h, ch, bytes(out)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def encode_png(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Inverse of decode_png (filter 0 on every scanline)."""
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    stride = width * channels
    ihdr = struct.pack(">IIBBBBB", width, height, 8, _COLOR_TYPE[channels], 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(
    width: int, height: int, channels: int, pixels: bytes, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resample (numpy-vectorized index gather)."""
    import numpy as np

    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    ys = (np.arange(new_h) * height) // new_h
    xs = (np.arange(new_w) * width) // new_w
    return arr[ys][:, xs].tobytes()


def luminance_histogram(
    width: int, height: int, channels: int, pixels: bytes, buckets: int = 8
) -> list[float]:
    """Normalized luminance histogram — the decoded-image feature the
    multimodal operators emit (8-dim to match the byte-level fake)."""
    import numpy as np

    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(-1, channels)
    if channels >= 3:
        lum = arr[:, :3].mean(axis=1)
    else:
        lum = arr[:, 0].astype(np.float64)
    hist, _ = np.histogram(lum, bins=buckets, range=(0, 256))
    n = max(len(lum), 1)
    return [round(float(c) / n, 6) for c in hist]
