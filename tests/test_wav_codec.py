"""WAV codec (functions/wav_codec.py) + audio feature extraction.

The stdlib RIFF/PCM codec makes the audio path real without libav —
same strategy as the PNG codec. Round-trips are exact for integer PCM,
so decode is checked against synthesized payloads with known
channels/rate/amplitude, then driven end-to-end through the Arrow
``mapInPandas`` plumbing in ``operators/multimodal.py``.
"""

from __future__ import annotations

import math
import struct

import pytest

from soccer_data_pipeline_spark.functions.wav_codec import (
    amplitude_histogram,
    decode_wav,
    duration_ms,
    encode_wav,
    is_wav,
    rms,
)
from soccer_data_pipeline_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_audio_features,
    extract_media_features,
    media_stats,
)


def sine_wav(
    freq_hz: float = 440.0,
    rate: int = 8000,
    seconds: float = 0.5,
    amp: float = 0.5,
    channels: int = 1,
    width: int = 2,
) -> bytes:
    """Synthesize an integer-PCM sine WAV with the stdlib only."""
    n = int(rate * seconds)
    full = {1: 127, 2: 32767, 3: 8388607, 4: 2147483647}[width]
    frames = bytearray()
    for i in range(n):
        s = amp * math.sin(2 * math.pi * freq_hz * i / rate)
        v = int(round(s * full))
        for _ in range(channels):
            if width == 1:
                frames.append((v + 128) & 0xFF)
            elif width == 2:
                frames += struct.pack("<h", v)
            elif width == 3:
                frames += v.to_bytes(3, "little", signed=True)
            else:
                frames += struct.pack("<i", v)
    return encode_wav(channels, rate, width, bytes(frames))


def test_sniff_and_roundtrip_16bit():
    payload = sine_wav(rate=8000, seconds=0.5, amp=0.5, width=2)
    assert is_wav(payload) and not is_wav(payload[4:]) and not is_wav(None)
    ch, rate, n_frames, samples = decode_wav(payload)
    assert (ch, rate, n_frames) == (1, 8000, 4000)
    assert len(samples) == 4000
    assert duration_ms(n_frames, rate) == 500
    # full-period sine: RMS = amp/sqrt(2)
    assert abs(rms(samples) - 0.5 / math.sqrt(2)) < 1e-3


@pytest.mark.parametrize("width", [1, 3, 4])
def test_sample_widths(width):
    ch, rate, n, samples = decode_wav(sine_wav(width=width, seconds=0.1, amp=0.8))
    assert n == 800 and len(samples) == 800
    assert abs(max(samples) - 0.8) < 0.02  # 8-bit quantization is coarse
    assert abs(rms(samples) - 0.8 / math.sqrt(2)) < 0.01


def test_stereo_interleave():
    ch, rate, n, samples = decode_wav(sine_wav(channels=2, seconds=0.1))
    assert ch == 2 and n == 800 and len(samples) == 1600
    # both channels carry the same signal: consecutive pairs equal
    assert samples[0] == samples[1] and samples[100] == samples[101]


def test_amplitude_histogram_contract():
    silence = [0.0] * 100
    h = amplitude_histogram(silence)
    assert len(h) == 8 and h[4] == 1.0 and sum(h) == 1.0
    _, _, _, samples = decode_wav(sine_wav(amp=0.9, seconds=0.2))
    h = amplitude_histogram(samples)
    assert len(h) == 8 and abs(sum(h) - 1.0) < 1e-3
    # a 0.9-amplitude sine spreads mass across all 8 buckets
    assert all(c > 0 for c in h)
    assert amplitude_histogram([]) == [0.0] * 8


def test_non_pcm_raises_not_implemented():
    # forge a RIFF/WAVE header with a compressed (non-PCM) format tag;
    # the stdlib reader rejects it and the codec maps that to the
    # documented NotImplementedError boundary
    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 8)  # 85 = MP3
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", 0)
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    assert is_wav(payload)
    with pytest.raises(NotImplementedError):
        decode_wav(payload)


@pytest.fixture(scope="module")
def audio_media(spark):
    rows = [
        (1, sine_wav(amp=0.5, seconds=0.25), ("audio", "wav", None, None, 250)),
        (2, sine_wav(amp=0.2, seconds=0.5, channels=2), ("audio", "wav", None, None, 500)),
        (3, None, ("audio", "wav", None, None, None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).cache()


def test_extract_audio_features_end_to_end(audio_media):
    rows = {r.media_id: r for r in extract_audio_features(audio_media).collect()}
    assert rows[1].channels == 1 and rows[1].sample_rate_hz == 8000
    assert rows[1].duration_ms == 250
    assert abs(rows[1].rms - 0.5 / math.sqrt(2)) < 1e-3
    assert rows[2].channels == 2 and rows[2].duration_ms == 500
    assert abs(rows[2].rms - 0.2 / math.sqrt(2)) < 1e-3
    assert rows[3].channels is None and rows[3].rms is None  # null passthrough


def test_extract_media_features_handles_wav(audio_media):
    """The generic feature path decodes WAV for real: 8-dim normalized
    amplitude histogram, no Pillow and no fake_decode involved."""
    feats = {r.media_id: r for r in extract_media_features(audio_media).collect()}
    assert len(feats[1].feature) == 8 and abs(sum(feats[1].feature) - 1.0) < 1e-3
    assert feats[3].feature == []
    # low-amplitude sine concentrates mass in the two center buckets
    assert feats[2].feature[3] + feats[2].feature[4] > 0.6


def test_media_stats_sniffs_wav(audio_media):
    rows = {r.media_id: r for r in media_stats(audio_media).collect()}
    assert rows[1].sniffed_format == "wav" and rows[2].sniffed_format == "wav"


def test_compressed_audio_raises_through_spark(spark):
    media = spark.createDataFrame(
        [(9, b"\xffM4A-not-a-wav" * 4, ("audio", "m4a", None, None, None))],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception) as ei:
        extract_audio_features(media).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)


def test_segment_audio_windowed_rms(spark):
    """One payload fans out to per-window rows with REAL per-segment
    RMS: an amplitude-modulated sine (quiet first half, loud second)
    must show the step between its segments."""
    import struct as _struct

    from soccer_data_pipeline_spark.operators.multimodal import segment_audio

    rate, seconds = 8000, 1.0
    n = int(rate * seconds)
    frames = bytearray()
    for i in range(n):
        amp = 0.2 if i < n // 2 else 0.8
        v = int(round(amp * 32767 * math.sin(2 * math.pi * 440 * i / rate)))
        frames += _struct.pack("<h", v)
    payload = encode_wav(1, rate, 2, bytes(frames))
    media = spark.createDataFrame(
        [(1, payload, ("audio", "wav", None, None, 1000)),
         (2, None, ("audio", "wav", None, None, None))],
        MEDIA_SCHEMA,
    )
    segs = {r.seg_index: r for r in segment_audio(media, every_ms=250).collect()}
    assert sorted(segs) == [0, 1, 2, 3]  # null payload emits nothing
    assert segs[0].seg_start_ms == 0 and segs[0].seg_end_ms == 250
    assert segs[3].seg_start_ms == 750 and segs[3].seg_end_ms == 1000
    for i in (0, 1):
        assert abs(segs[i].rms - 0.2 / math.sqrt(2)) < 5e-3
    for i in (2, 3):
        assert abs(segs[i].rms - 0.8 / math.sqrt(2)) < 5e-3


def test_spectral_features_find_the_sine(spark):
    """A pure 440 Hz sine's dominant FFT bin and spectral centroid both
    land on 440 Hz (±1 bin); a 1200 Hz tone lands on 1200. Stereo mixes
    before the transform, so a same-tone stereo clip matches mono."""
    from soccer_data_pipeline_spark.operators.multimodal import (
        audio_spectral_features,
    )

    def meta():
        return ("audio", "wav", None, None, 500)

    rows = [
        (1, bytearray(sine_wav(freq_hz=440.0)), meta()),
        (2, bytearray(sine_wav(freq_hz=1200.0)), meta()),
        (3, bytearray(sine_wav(freq_hz=440.0, channels=2)), meta()),
        (4, None, meta()),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in audio_spectral_features(media).collect()}
    assert set(out) == {1, 2, 3}  # null payload emits no row
    bin_hz = 8000 / (8000 * 0.5)  # rate / n_samples = 2 Hz resolution
    for mid, want in ((1, 440.0), (2, 1200.0), (3, 440.0)):
        assert abs(out[mid].dominant_freq_hz - want) <= bin_hz
        # a pure tone's centroid sits near its frequency (spectral
        # leakage pulls it slightly, well inside 5%)
        assert abs(out[mid].spectral_centroid_hz - want) / want < 0.05
    assert out[1].sample_rate_hz == 8000 and out[1].n_frames == 4000


def test_spectral_features_non_wav_boundary(spark):
    from soccer_data_pipeline_spark.operators.multimodal import (
        audio_spectral_features,
    )

    media = spark.createDataFrame(
        [(1, bytearray(b"\x00\x01notwav"), ("audio", "mp3", None, None, 10))],
        MEDIA_SCHEMA,
    )
    try:
        audio_spectral_features(media).collect()
        assert False, "expected the NotImplementedError boundary"
    except Exception as exc:
        assert "NotImplementedError" in str(type(exc)) or "NotImplementedError" in str(exc)
