"""[beyond-ref] Multimodal column operators (SURVEY §2.10).

Images / audio / video ride through the engine as opaque ``binary``
columns plus typed metadata — the lakehouse-standard pattern (the
content column stays a byte payload; partition/prune on the metadata).

The Spark-side plumbing here is REAL and tested: schemas, Arrow-batched
``mapInPandas`` signatures, batch shaping, partition sizing. The codec
tier is split by format:

- **PNG: real.** Decode / resample / re-encode run on actual PNG bytes
  via the pure-stdlib codec in ``functions/png_codec.py`` (zlib inflate
  + spec filters) — no external library needed.
- **JPEG / other images: Pillow-optional.** Pillow is feature-detected
  at call time (worker-side, so a cluster whose executors carry Pillow
  decodes even if the driver doesn't); when present, decode/resize run
  through it, when absent those payloads raise ``NotImplementedError``
  (or use the deterministic fake in tests).
- **WAV audio: real.** RIFF/PCM parses with the stdlib ``wave`` +
  ``struct`` (``functions/wav_codec.py``, same trick as PNG) — decode,
  channels / sample-rate / duration / RMS, amplitude-histogram
  feature.
- **compressed audio: soundfile-optional.** ``soundfile`` (libsndfile)
  is feature-detected worker-side exactly like Pillow; when present,
  FLAC/OGG (and MP3 on libsndfile ≥ 1.1) decode through the same
  ``_decode_audio`` dispatch as WAV; when absent they raise the clean
  boundary.
- **video: PyAV-optional.** ``av`` is probed the same way for
  ``extract_video_features``; container/stream metadata and frame
  iteration run through it when present, else the documented
  ``NotImplementedError`` boundary (frame-TIMESTAMP sampling from
  metadata needs no codec and is always real — ``sample_frames``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata travelling next to the payload (never inside it).
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # jpeg|png|wav|mp4…
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_hash", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _pillow():
    """Feature-detected Pillow Image module, or None.

    Probed at CALL time inside the Arrow batch handler, i.e. in the
    executor's Python — a cluster whose workers ship Pillow decodes
    JPEG even when the driver environment doesn't have it.
    """
    try:
        from PIL import Image

        return Image
    except Exception:
        return None


def _soundfile():
    """Feature-detected ``soundfile`` module (libsndfile bindings:
    FLAC/OGG, and MP3 with libsndfile ≥ 1.1), or None. Probed at call
    time in the executor's Python — same contract as :func:`_pillow`:
    a cluster whose workers ship soundfile decodes compressed audio
    even when this driver environment doesn't have it (VERDICT r6 #8).
    """
    try:
        import soundfile

        return soundfile
    except Exception:
        return None


def _av():
    """Feature-detected PyAV (libav bindings) for video, or None —
    the same worker-side probe as :func:`_pillow`/:func:`_soundfile`."""
    try:
        import av

        return av
    except Exception:
        return None


def _decode_audio(payload: bytes) -> tuple[int, int, int, list[float]]:
    """→ (channels, sample_rate_hz, n_frames, interleaved [-1,1)
    samples) for RIFF/PCM WAV (stdlib codec, always available) or —
    when ``soundfile`` imports worker-side — any libsndfile-supported
    compressed format. Everything else stays the documented
    ``NotImplementedError`` boundary. All audio extractors dispatch
    through here so the compressed path lights up everywhere at once
    the moment workers ship the library."""
    from ..functions.wav_codec import decode_wav, is_wav

    if is_wav(payload):
        return decode_wav(payload)
    sf = _soundfile()
    if sf is not None:
        import io

        import numpy as np

        try:
            data, rate = sf.read(io.BytesIO(payload), dtype="float64")
        except Exception as exc:  # not audio / codec missing in libsndfile
            raise NotImplementedError(
                f"payload is not libsndfile-decodable audio ({type(exc).__name__})"
            )
        arr = np.asarray(data, dtype=np.float64)
        if arr.ndim == 1:
            channels, n_frames = 1, int(arr.size)
        else:
            n_frames, channels = int(arr.shape[0]), int(arr.shape[1])
        # row-major flatten of (frames, channels) IS interleaved order —
        # identical sample contract to the stdlib WAV codec
        return channels, int(rate), n_frames, arr.reshape(-1).tolist()
    raise NotImplementedError(
        "only RIFF/PCM WAV decodes without an external codec library; "
        "install soundfile worker-side for FLAC/OGG/MP3"
    )


def _decode_media_impl(payload: bytes, media_type: str | None = None) -> list[float]:
    """Real decode for PNG (stdlib codec), WAV (stdlib codec) and, when
    Pillow is importable, any Pillow-supported image format (JPEG,
    WebP, ...); other payloads raise ``NotImplementedError``.

    Feature = 8-bucket normalized histogram of the DECODED signal
    (same shape as the byte-level fake, so downstream schema and tests
    are format-agnostic): luminance buckets for images (PNG path
    averages RGB; Pillow path uses L-mode ITU-R 601-2 luma), amplitude
    buckets for WAV audio. The 8-dim contract is what downstream sees.

    Format dispatch is by magic bytes, WAV before Pillow — an audio
    payload must never reach the image library. Pillow failures
    (unidentified or truncated payloads) re-raise as
    ``NotImplementedError`` so the stub contract holds with Pillow
    installed too (ADVICE r5). The Pillow fallback additionally gates
    on the DECLARED ``media_type`` when the caller has one: a payload
    declared audio/video that happens to parse as an image must not
    silently yield a bogus image feature (ADVICE r6) — only
    ``media_type in (None, 'image')`` may enter the Pillow branch.
    """
    from ..functions.png_codec import decode_png, is_png, luminance_histogram
    from ..functions.wav_codec import amplitude_histogram, decode_wav, is_wav

    if payload is None:  # null passthrough, same as the fake path
        return []
    if is_png(payload):
        return luminance_histogram(*decode_png(payload))
    if is_wav(payload):
        _ch, _rate, _n, samples = decode_wav(payload)
        return amplitude_histogram(samples)
    if media_type == "audio":
        # declared compressed audio: the soundfile-optional dispatch —
        # amplitude histogram when libsndfile decodes it, the clean
        # boundary otherwise. Never falls through to Pillow.
        _ch, _rate, _n, samples = _decode_audio(payload)
        return amplitude_histogram(samples)
    Image = _pillow() if media_type in (None, "image") else None
    if Image is not None:
        import io

        import numpy as np

        try:
            with Image.open(io.BytesIO(payload)) as im:
                lum = np.asarray(im.convert("L"), dtype=np.float64).reshape(-1)
        except NotImplementedError:
            raise
        except Exception as exc:  # UnidentifiedImageError, truncation, ...
            raise NotImplementedError(
                f"payload is not a decodable image ({type(exc).__name__}); "
                "compressed audio/video need an external codec library"
            )
        hist, _ = np.histogram(lum, bins=8, range=(0, 256))
        n = max(lum.size, 1)
        return [round(float(c) / n, 6) for c in hist]
    raise NotImplementedError(
        "only PNG/WAV decode without an external codec library; "
        "use fake_decode=True or install Pillow for JPEG/other image formats"
    )


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in feature: normalized 8-bucket byte histogram."""
    if payload is None:
        return []
    buckets = [0] * 8
    for b in payload:
        buckets[b >> 5] += 1
    n = max(len(payload), 1)
    return [round(c / n, 6) for c in buckets]


def extract_media_features(media: DataFrame, fake_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` streams record batches through Python once —
    payload bytes never round-trip the JVM more than necessary, and
    batch size is governed by ``spark.sql.execution.arrow.
    maxRecordsPerBatch`` (tune down for large payloads: ~100 MB of
    payload per batch is the sweet spot at scale).
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            metas = pdf["meta"] if "meta" in pdf.columns else None
            feats = []
            for i, c in enumerate(pdf["content"]):
                if fake_decode:
                    feats.append(_fake_decode(c))
                    continue
                mt = None
                if metas is not None:
                    mm = metas.iloc[i]
                    if isinstance(mm, dict):
                        mt = mm.get("media_type")
                feats.append(_decode_media_impl(c, mt))
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [
                        len(c) if c is not None else 0 for c in pdf["content"]
                    ],
                    "content_hash": [
                        hashlib.md5(c).hexdigest() if c is not None else None
                        for c in pdf["content"]
                    ],
                    "feature": feats,
                }
            )
            yield out

    return media.mapInPandas(run, FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate_hz", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def extract_audio_features(media: DataFrame, fake_decode: bool = False) -> DataFrame:
    """Arrow-batched audio feature extraction: channels, sample rate,
    duration, RMS amplitude per payload.

    WAV (RIFF/PCM) decodes for real via the stdlib codec in
    ``functions/wav_codec.py``; compressed audio decodes through the
    soundfile-optional worker-side probe (``_decode_audio``) and
    raises the clean ``NotImplementedError`` boundary when the library
    is absent. Null payloads pass through as null features. ``fake_decode`` substitutes
    a deterministic byte-derived stand-in with the same schema, for
    plumbing tests on non-WAV fixtures.
    """
    from ..functions.wav_codec import duration_ms, rms

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                if c is None:
                    out_rows.append((mid, None, None, None, None))
                    continue
                payload = bytes(c)
                if fake_decode:
                    out_rows.append(
                        (mid, 1, 16000, len(payload) // 32, (payload[0] if payload else 0) / 255.0)
                    )
                    continue
                ch, rate, n_frames, samples = _decode_audio(payload)
                out_rows.append(
                    (mid, ch, rate, duration_ms(n_frames, rate), rms(samples))
                )
            yield pd.DataFrame(
                out_rows,
                columns=["media_id", "channels", "sample_rate_hz", "duration_ms", "rms"],
            )

    return media.mapInPandas(run, AUDIO_FEATURE_SCHEMA)


AUDIO_SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("seg_index", T.IntegerType(), True),
        T.StructField("seg_start_ms", T.LongType(), True),
        T.StructField("seg_end_ms", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def segment_audio(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Windowed audio features: per-segment RMS over fixed time slices
    — the audio analog of ``sample_frames`` (which only emits the
    timestamps; here the WAV codec is real, so the per-segment
    *feature* is real too). One input row fans out to
    ceil(duration/every_ms) output rows inside the Arrow batch handler
    — decode once per payload, slice many.

    WAV decodes via the stdlib codec and compressed audio via the
    soundfile-optional ``_decode_audio`` dispatch (clean
    ``NotImplementedError`` boundary when absent); null payloads emit
    no segments (empty fan-out, same contract as an empty stream).
    """
    from ..functions.wav_codec import rms

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "seg_index", "seg_start_ms", "seg_end_ms", "rms"]
        for pdf in batches:
            rows = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                if c is None:
                    continue
                payload = bytes(c)
                ch, rate, n_frames, samples = _decode_audio(payload)
                frames_per_seg = max(1, rate * every_ms // 1000)
                for i in range(0, (n_frames + frames_per_seg - 1) // frames_per_seg):
                    lo = i * frames_per_seg * ch
                    hi = min((i + 1) * frames_per_seg, n_frames) * ch
                    rows.append(
                        (
                            mid,
                            i,
                            i * frames_per_seg * 1000 // rate,
                            min((i + 1) * frames_per_seg, n_frames) * 1000 // rate,
                            rms(samples[lo:hi]),
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(run, AUDIO_SEGMENT_SCHEMA)


AUDIO_SPECTRAL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate_hz", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("dominant_freq_hz", T.DoubleType(), True),
        T.StructField("spectral_centroid_hz", T.DoubleType(), True),
    ]
)


def audio_spectral_features(media: DataFrame) -> DataFrame:
    """Frequency-domain audio features via numpy rFFT inside the same
    Arrow ``mapInPandas`` path as the time-domain extractors: dominant
    frequency (argmax magnitude bin, DC excluded) and spectral centroid
    (magnitude-weighted mean frequency) over the channel-mixed signal.

    Real DSP with no external codec dependency: WAV decodes via the
    stdlib codec (compressed audio via the soundfile-optional
    ``_decode_audio`` dispatch), the transform is numpy (baked in);
    undecodable payloads raise the documented ``NotImplementedError``
    boundary and null payloads emit no row. Per-payload cost is one decode + one
    O(n log n) FFT inside the executor's Arrow batch — nothing ever
    collects to the driver, and batches stay bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "media_id",
            "sample_rate_hz",
            "n_frames",
            "dominant_freq_hz",
            "spectral_centroid_hz",
        ]
        for pdf in batches:
            rows = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                if c is None:
                    continue
                payload = bytes(c)
                ch, rate, n_frames, samples = _decode_audio(payload)
                mono = np.asarray(samples, dtype=np.float64).reshape(-1, ch).mean(axis=1)
                mag = np.abs(np.fft.rfft(mono))
                freqs = np.fft.rfftfreq(mono.size, d=1.0 / rate)
                mag[0] = 0.0  # DC carries offset, not pitch
                total = float(mag.sum())
                dom = float(freqs[int(mag.argmax())]) if total > 0 else 0.0
                centroid = float((freqs * mag).sum() / total) if total > 0 else 0.0
                rows.append((mid, rate, n_frames, dom, centroid))
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(run, AUDIO_SPECTRAL_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """JVM-only byte-level stats (no Python): size, hash, format split.

    For anything expressible without the codec, stay out of Python —
    ``length``/``md5``/``substring`` on binary are codegen'd.
    """
    return media.select(
        "media_id",
        F.length("content").alias("n_bytes"),
        F.md5("content").alias("content_hash"),
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.format").alias("format"),
        # magic-byte sniff: JPEG FF D8, PNG 89 50, WAV RIFF....WAVE
        F.when(F.hex(F.substring("content", 1, 2)) == "FFD8", "jpeg")
        .when(F.hex(F.substring("content", 1, 2)) == "8950", "png")
        .when(
            (F.hex(F.substring("content", 1, 4)) == "52494646")
            & (F.hex(F.substring("content", 9, 4)) == "57415645"),
            "wav",
        )
        .otherwise("unknown")
        .alias("sniffed_format"),
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits (media_id,
    frame_ts_ms) rows from duration metadata; the frame *decode* joins
    through ``extract_media_features``. Pure JVM sequence/explode."""
    return (
        media.where(F.col("meta.media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


VIDEO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_frames_sampled", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
    ]
)


def extract_video_features(media: DataFrame, max_frames: int = 8) -> DataFrame:
    """Video decode through the PyAV-optional worker-side probe:
    container width/height/duration plus the mean luminance of up to
    ``max_frames`` evenly-spaced decoded frames — the video analog of
    ``extract_media_features``.

    Engine-side contract (Arrow batching, schema, null passthrough) is
    real and tested in this container; the codec itself is the
    feature-detected boundary: with ``av`` importable on workers,
    frames decode and the luma is real; without it every non-null
    payload raises the documented ``NotImplementedError`` (libav
    bindings genuinely cannot be reimplemented stdlib-side the way PNG
    and WAV were). Decode cost is per payload inside the executor's
    Arrow batch — nothing collects to the driver, and ``max_frames``
    caps the per-row work regardless of clip length.
    """

    def _features(payload: bytes) -> tuple:
        av = _av()
        if av is None:
            raise NotImplementedError(
                "video decode needs the libav bindings (PyAV) worker-side; "
                "install `av` to light this path up — metadata-only frame "
                "sampling (sample_frames) works without it"
            )
        import io

        import numpy as np

        try:
            with av.open(io.BytesIO(payload)) as container:
                stream = container.streams.video[0]
                width = int(stream.codec_context.width)
                height = int(stream.codec_context.height)
                dur = (
                    int(container.duration // 1000)
                    if container.duration is not None
                    else None
                )
                lumas = []
                step = max(1, (stream.frames or max_frames) // max_frames)
                for i, frame in enumerate(container.decode(stream)):
                    if i % step:
                        continue
                    arr = frame.to_ndarray(format="gray")
                    lumas.append(float(np.asarray(arr, dtype=np.float64).mean()))
                    if len(lumas) >= max_frames:
                        break
        except NotImplementedError:
            raise
        except Exception as exc:  # not a decodable container
            raise NotImplementedError(
                f"payload is not a decodable video ({type(exc).__name__})"
            )
        mean_luma = sum(lumas) / len(lumas) if lumas else None
        return width, height, dur, len(lumas), mean_luma

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "media_id",
            "width",
            "height",
            "duration_ms",
            "n_frames_sampled",
            "mean_luma",
        ]
        for pdf in batches:
            rows = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                if c is None:
                    rows.append((mid, None, None, None, None, None))
                    continue
                rows.append((mid, *_features(bytes(c))))
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(run, VIDEO_FEATURE_SCHEMA)


def resize_images(
    media: DataFrame, width: int, height: int, fake_decode: bool = False
) -> DataFrame:
    """Resize plumbing: binary in → binary out with updated metadata.

    PNG payloads are REALLY resized (decode → nearest-neighbor resample
    → re-encode, stdlib codec); other formats go through Pillow when it
    is importable worker-side (nearest-neighbor, re-encoded to the
    source format — lossy formats like JPEG re-encode at Pillow's
    default quality) and raise otherwise unless ``fake_decode`` — the
    engine-side contract (Arrow batching, output schema with refreshed
    width/height metadata, null passthrough) is identical either way.
    Read-only Pillow formats (decodable but not re-encodable, e.g. PSD)
    raise a clean ``NotImplementedError`` rather than Pillow's opaque
    save error (ADVICE r5).
    """

    def _resize_png(payload: bytes) -> bytes:
        from ..functions.png_codec import (
            decode_png,
            encode_png,
            is_png,
            resize_nearest,
        )

        if is_png(payload):
            w0, h0, ch, px = decode_png(payload)
            return encode_png(
                width, height, ch, resize_nearest(w0, h0, ch, px, width, height)
            )
        Image = _pillow()
        if Image is not None:
            import io

            nearest = getattr(
                getattr(Image, "Resampling", Image), "NEAREST"
            )
            try:
                with Image.open(io.BytesIO(payload)) as im:
                    fmt = im.format
                    buf = io.BytesIO()
                    try:
                        im.resize((width, height), nearest).save(buf, format=fmt)
                    except NotImplementedError:
                        raise
                    except Exception as exc:  # read-only format: no encoder
                        raise NotImplementedError(
                            f"format {fmt} decodable but not re-encodable "
                            f"({type(exc).__name__})"
                        )
                    return buf.getvalue()
            except NotImplementedError:
                raise
            except Exception as exc:  # not an image at all
                raise NotImplementedError(
                    f"payload is not a decodable image ({type(exc).__name__})"
                )
        raise NotImplementedError(
            "only PNG resizes without an external codec library; "
            "use fake_decode=True or install Pillow"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake_decode:
                # deterministic fake: payload truncated/padded to w*h/64
                # bytes, standing in for the re-encoded image
                target = max(1, width * height // 64)
                out_payload = [
                    None if c is None else (bytes(c)[:target]).ljust(target, b"\0")
                    for c in pdf["content"]
                ]
            else:
                out_payload = [
                    None if c is None else _resize_png(bytes(c))
                    for c in pdf["content"]
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": out_payload,
                    "width": [None if c is None else width for c in pdf["content"]],
                    "height": [None if c is None else height for c in pdf["content"]],
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )
    return media.mapInPandas(run, schema)


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("ahash", T.LongType(), True),
    ]
)


def _ahash_impl(payload: bytes) -> int:
    """64-bit average hash of a PNG payload: decode (stdlib codec),
    luminance, block-mean downsample to 8×8, threshold at the mean.
    Pure integer arithmetic end-to-end — deterministic across
    platforms (no float resize kernels)."""
    from ..functions.png_codec import decode_png, is_png

    if not payload or not is_png(bytes(payload)):
        raise NotImplementedError("average hash implemented for PNG payloads only")
    w, h, ch, px = decode_png(bytes(payload))
    # integer luminance per pixel (ITU-R 601 weights scaled by 1000)
    lum = [0] * (w * h)
    for i in range(w * h):
        o = i * ch
        if ch >= 3:
            lum[i] = 299 * px[o] + 587 * px[o + 1] + 114 * px[o + 2]
        else:
            lum[i] = 1000 * px[o]
    # 8x8 block means (integer): block (bx, by) covers its pixel span
    bits = 0
    sums = [[0, 0] for _ in range(64)]  # [total, npx]
    for y in range(h):
        by = y * 8 // h
        for x in range(w):
            bx = x * 8 // w
            cell = sums[by * 8 + bx]
            cell[0] += lum[y * w + x]
            cell[1] += 1
    # scale to a common denominator: mean comparison via cross-multiply
    # (cell_total * total_npx) vs (grand_total * cell_npx) — integers only
    grand_total = sum(c[0] for c in sums)
    total_npx = sum(c[1] for c in sums)
    for i, (ct, cn) in enumerate(sums):
        if cn and ct * total_npx > grand_total * cn:
            bits |= 1 << i
    # keep within signed int64 for the Spark LongType column
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def image_average_hash(media: DataFrame) -> DataFrame:
    """media(media_id, content: binary) → (media_id, ahash) — the image
    near-dup fingerprint tier: payloads whose hashes agree (or sit
    within a small Hamming radius) are visual near-duplicates, the
    image analog of SimHash over tokens (operators/dedup.simhash).

    Runs in the Arrow `mapInPandas` path like every codec operator
    here: bytes never leave the executor, one Python batch per Arrow
    batch. The hash itself is integer-only (block means compared by
    cross-multiplication), so the fingerprint is bit-stable across
    platforms — safe to persist and join against across runs.
    Non-PNG payloads raise the documented ``NotImplementedError``
    boundary; null payloads emit a null hash.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for c in pdf["content"]:
                hashes.append(None if c is None else _ahash_impl(bytes(c)))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "ahash": pd.array(hashes, dtype="Int64")}
            )

    return media.select("media_id", "content").mapInPandas(run, AHASH_SCHEMA)


def hamming64(a, b):
    """Column expr: Hamming distance between two 64-bit fingerprints
    (JVM-side bit_count over xor — no Python)."""
    return F.bit_count(F.col(a).bitwiseXOR(F.col(b)))
