"""ANN recall vs brute force; multimodal binary plumbing end-to-end."""

from __future__ import annotations

import pytest

from soccer_data_pipeline_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_media_features,
    media_stats,
    sample_frames,
)
from soccer_data_pipeline_spark.operators.similarity import (
    ann_lsh_cosine,
    brute_force_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_ann_recall_on_planted_neighbors(spark):
    """Sign-LSH recall is only meaningful when near neighbors exist —
    on uniform random vectors every bucket is equally (un)likely, which
    is the regime ANN is *not* for. Plant clusters: 20 base vectors,
    3 noisy copies each; queries = bases; true neighbors = the copies.
    """
    import math
    import random

    rng = random.Random(7)
    dim = 64
    rows = []
    qrows = []
    vid = 1000
    for b in range(20):
        base = [rng.gauss(0, 1) for _ in range(dim)]
        norm = math.sqrt(sum(x * x for x in base))
        base = [x / norm for x in base]
        qrows.append((b, [float(x) for x in base]))
        for _ in range(3):
            noisy = [x + rng.gauss(0, 0.02) for x in base]
            rows.append((vid, [float(x) for x in noisy]))
            vid += 1
        # distractors: fresh random vectors
        for _ in range(10):
            d = [rng.gauss(0, 1) for _ in range(dim)]
            rows.append((vid, [float(x) for x in d]))
            vid += 1
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    c = spark.createDataFrame(rows, schema)
    q = spark.createDataFrame(qrows, schema)
    exact = brute_force_topk(q, c, k=3)
    approx = ann_lsh_cosine(q, c, k=3, n_planes=8, dim=dim)
    exact_pairs = {(r.query_id, r.candidate_id) for r in exact.collect()}
    approx_pairs = {(r.query_id, r.candidate_id) for r in approx.collect()}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.9, f"ANN recall on planted near-dups too low: {recall}"


def test_brute_force_topk_shape(spark, emb):
    q = emb.where("vec_id < 10")
    c = emb.where("vec_id >= 10")
    exact = brute_force_topk(q, c, k=5)
    rows = exact.collect()
    assert len(rows) == 50  # 10 queries × k=5
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.cosine)
    for cosines in by_q.values():
        assert cosines == sorted(cosines, reverse=True)


@pytest.fixture(scope="module")
def media(spark):
    jpeg = bytes([0xFF, 0xD8]) + b"fakejpegpayload" * 10
    png = bytes([0x89, 0x50]) + b"fakepngpayload" * 8
    rows = [
        (1, jpeg, ("image", "jpeg", 640, 480, None)),
        (2, png, ("image", "png", 100, 100, None)),
        (3, None, ("image", "jpeg", None, None, None)),
        (4, b"\x00\x01videoish", ("video", "mp4", 1920, 1080, 3500)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).cache()


def test_media_stats_jvm_side(media):
    rows = {r.media_id: r for r in media_stats(media).collect()}
    assert rows[1].sniffed_format == "jpeg"
    assert rows[2].sniffed_format == "png"
    assert rows[4].sniffed_format == "unknown"
    assert rows[1].n_bytes == 2 + 15 * 10
    assert rows[3].n_bytes is None  # null payload stays null JVM-side


def test_feature_extraction_arrow_batched(media):
    feats = {r.media_id: r for r in extract_media_features(media, fake_decode=True).collect()}
    assert len(feats) == 4
    assert len(feats[1].feature) == 8
    assert abs(sum(feats[1].feature) - 1.0) < 1e-3  # normalized histogram
    assert feats[3].feature == []  # null payload → empty feature
    assert feats[1].content_hash is not None and feats[3].content_hash is None


try:
    import PIL  # noqa: F401

    _HAS_PILLOW = True
except ImportError:
    _HAS_PILLOW = False


@pytest.mark.skipif(
    _HAS_PILLOW, reason="with Pillow present non-PNG formats decode instead of raising"
)
def test_codec_stub_raises_cleanly(media):
    with pytest.raises(Exception) as ei:
        extract_media_features(media, fake_decode=False).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)


@pytest.mark.skipif(not _HAS_PILLOW, reason="Pillow not installed in this container")
def test_jpeg_decode_with_pillow(spark):
    """Real JPEG → 8-bucket luminance histogram through the Arrow path."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (16, 16), (200, 30, 90)).save(buf, format="JPEG")
    media = spark.createDataFrame(
        [(1, buf.getvalue(), ("image", "jpeg", 16, 16, None))], MEDIA_SCHEMA
    )
    feats = extract_media_features(media).collect()
    assert len(feats[0].feature) == 8
    assert abs(sum(feats[0].feature) - 1.0) < 1e-3


@pytest.mark.skipif(not _HAS_PILLOW, reason="Pillow not installed in this container")
def test_jpeg_resize_with_pillow(spark):
    import io

    from PIL import Image

    from soccer_data_pipeline_spark.operators.multimodal import resize_images

    buf = io.BytesIO()
    Image.new("RGB", (32, 16), (10, 120, 250)).save(buf, format="JPEG")
    media = spark.createDataFrame(
        [(1, buf.getvalue(), ("image", "jpeg", 32, 16, None))], MEDIA_SCHEMA
    )
    out = resize_images(media, 8, 8).collect()[0]
    assert (out.width, out.height) == (8, 8)
    with Image.open(io.BytesIO(out.content)) as im:
        assert im.size == (8, 8) and im.format == "JPEG"


def test_frame_sampling(media):
    frames = sample_frames(media, every_ms=1000).collect()
    # 3500ms video at 1Hz → ts 0,1000,2000,3000
    assert [f.frame_ts_ms for f in frames] == [0, 1000, 2000, 3000]


def test_ivf_recall_on_planted_neighbors(spark):
    """IVF with a coarse quantizer must recover planted near-dups:
    noisy copies land in the same k-means cell as their base vector."""
    import math
    import random

    from soccer_data_pipeline_spark.operators.similarity import ivf_topk

    rng = random.Random(13)
    dim = 32
    rows, qrows, vid = [], [], 1000
    for b in range(12):
        base = [rng.gauss(0, 1) for _ in range(dim)]
        nrm = math.sqrt(sum(x * x for x in base))
        base = [x / nrm for x in base]
        qrows.append((b, [float(x) for x in base]))
        for _ in range(3):
            rows.append((vid, [float(x + rng.gauss(0, 0.02)) for x in base]))
            vid += 1
        for _ in range(8):
            rows.append((vid, [float(rng.gauss(0, 1)) for _ in range(dim)]))
            vid += 1
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    q = spark.createDataFrame(qrows, schema)
    c = spark.createDataFrame(rows, schema)
    exact = brute_force_topk(q, c, k=3)
    approx, model = ivf_topk(q, c, k=3, n_centroids=6, n_probe=2)
    e = {(r.query_id, r.candidate_id) for r in exact.collect()}
    a = {(r.query_id, r.candidate_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.85, f"IVF recall too low: {recall}"


def test_resize_plumbing(media):
    from soccer_data_pipeline_spark.operators.multimodal import resize_images

    out = {r.media_id: r for r in resize_images(media, 64, 64, fake_decode=True).collect()}
    assert len(out[1].content) == 64 * 64 // 64
    assert (out[1].width, out[1].height) == (64, 64)
    assert out[3].content is None and out[3].width is None


def test_image_average_hash_groups_near_dups(spark):
    """aHash must be identical for an exact duplicate, within a small
    Hamming radius for a lightly-perturbed copy, and far for a
    structurally different image; non-PNG payloads raise the
    documented boundary."""
    import pyspark.sql.functions as F
    import pytest
    from soccer_data_pipeline_spark.functions.png_codec import encode_png
    from soccer_data_pipeline_spark.operators.multimodal import (
        _ahash_impl,
        hamming64,
        image_average_hash,
    )

    w, h = 24, 16
    grad = bytes(((x * 9 + y * 5) % 256) for y in range(h) for x in range(w) for _ in range(3))
    # perturb a handful of pixels slightly
    pert = bytearray(grad)
    for i in range(0, 30, 3):
        pert[i] = min(255, pert[i] + 4)
    checker = bytes(
        (255 if ((x // 4 + y // 4) % 2) else 0)
        for y in range(h)
        for x in range(w)
        for _ in range(3)
    )
    rows = [
        (1, encode_png(w, h, 3, grad)),
        (2, encode_png(w, h, 3, grad)),         # exact dup
        (3, encode_png(w, h, 3, bytes(pert))),  # near dup
        (4, encode_png(w, h, 3, checker)),      # different
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    hashes = {r.media_id: r.ahash for r in image_average_hash(df).collect()}
    assert hashes[1] == hashes[2]
    j = (
        spark.createDataFrame([(hashes[1], hashes[3]), (hashes[1], hashes[4])], "a long, b long")
        .select(hamming64("a", "b").alias("d"))
        .collect()
    )
    near, far = j[0].d, j[1].d
    assert near <= 8, f"near-dup hamming {near} too large"
    assert far > near, f"different image ({far}) not farther than near-dup ({near})"

    with pytest.raises(NotImplementedError):
        _ahash_impl(b"\xff\xd8\xffJPEGISH")


def test_image_average_hash_grayscale(spark):
    """aHash must handle 1-channel PNGs through the luminance fallback;
    a flat image hashes to all-zero bits (no block exceeds the mean)."""
    from soccer_data_pipeline_spark.functions.png_codec import encode_png
    from soccer_data_pipeline_spark.operators.multimodal import image_average_hash

    w, h = 16, 16
    flat = encode_png(w, h, 1, bytes([128] * (w * h)))
    grad = encode_png(w, h, 1, bytes((x * 16) % 256 for _ in range(h) for x in range(w)))
    df = spark.createDataFrame(
        [(1, flat), (2, grad)], "media_id long, content binary"
    )
    hashes = {r.media_id: r.ahash for r in image_average_hash(df).collect()}
    assert hashes[1] == 0  # strict > mean never fires on a flat image
    assert hashes[2] != 0  # bright columns set bits


def test_decode_gate_skips_pillow_for_declared_non_image(monkeypatch):
    """ADVICE r6: a payload DECLARED audio/video must never enter the
    Pillow branch, even when it would parse as an image — a bogus
    luminance histogram for an mp3 is worse than the clean boundary.
    Only media_type in (None, 'image') may probe Pillow."""
    from soccer_data_pipeline_spark.operators import multimodal as mm

    payload = b"\x01\x02 neither wav nor png"

    def boom():
        raise AssertionError("Pillow probed for a declared non-image payload")

    monkeypatch.setattr(mm, "_pillow", boom)
    for mt in ("audio", "video"):
        with pytest.raises(NotImplementedError):
            mm._decode_media_impl(payload, mt)
    # declared image (or undeclared) still reaches the feature-detect
    # probe — with Pillow absent it stays the documented boundary
    monkeypatch.setattr(mm, "_pillow", lambda: None)
    for mt in ("image", None):
        with pytest.raises(NotImplementedError):
            mm._decode_media_impl(payload, mt)


def test_pq_topk_empty_candidates_and_prefit_dim(spark, emb):
    """ADVICE r6: pq_topk must fail loudly (not TypeError) on an empty
    candidate frame, and with prefit models must derive the dimension
    from the codebooks instead of firing an eager probe job."""
    from soccer_data_pipeline_spark.operators.similarity import pq_topk

    empty = emb.where("vec_id < 0")
    with pytest.raises(ValueError, match="empty"):
        pq_topk(emb.limit(2), empty, k=2, m=4, n_codes=4)

    # fit once on the real frame, then reuse: the prefit call must not
    # probe candidates with first() (works even on an empty frame)
    _, models = pq_topk(emb.limit(2), emb, k=2, m=4, n_codes=4)
    out, _ = pq_topk(emb.limit(2), empty, k=2, m=4, n_codes=4, models=models)
    assert out.count() == 0


def test_decode_audio_soundfile_feature_detect(monkeypatch):
    """Compressed audio decodes through the worker-side soundfile
    probe when the library is present — emulated with a stub module,
    since libsndfile isn't in this container — and stays the clean
    boundary when absent. Interleave order must match the stdlib WAV
    codec's (frames-major row flatten)."""
    import numpy as np

    from soccer_data_pipeline_spark.operators import multimodal as mm

    payload = b"fLaC fake compressed payload"

    class StubSF:
        @staticmethod
        def read(buf, dtype="float64"):
            return np.array([[0.1, -0.1], [0.2, -0.2], [0.3, -0.3]]), 8000

    monkeypatch.setattr(mm, "_soundfile", lambda: StubSF)
    ch, rate, n, samples = mm._decode_audio(payload)
    assert (ch, rate, n) == (2, 8000, 3)
    assert samples == [0.1, -0.1, 0.2, -0.2, 0.3, -0.3]

    class StubMono:
        @staticmethod
        def read(buf, dtype="float64"):
            return np.array([0.5, 0.25]), 16000

    monkeypatch.setattr(mm, "_soundfile", lambda: StubMono)
    assert mm._decode_audio(payload) == (1, 16000, 2, [0.5, 0.25])

    monkeypatch.setattr(mm, "_soundfile", lambda: None)
    with pytest.raises(NotImplementedError, match="soundfile"):
        mm._decode_audio(payload)


def test_video_features_schema_null_passthrough_and_boundary(media):
    """extract_video_features: the engine-side contract (schema, Arrow
    path, null passthrough) is real in this container; the decode
    itself is the PyAV feature-detected boundary."""
    from soccer_data_pipeline_spark.operators.multimodal import (
        extract_video_features,
    )

    out = extract_video_features(media.where("content is null"))
    assert [f.name for f in out.schema.fields] == [
        "media_id", "width", "height", "duration_ms",
        "n_frames_sampled", "mean_luma",
    ]
    rows = out.collect()
    assert len(rows) == 1 and rows[0].width is None and rows[0].mean_luma is None

    with pytest.raises(Exception) as ei:
        extract_video_features(media.where("media_id = 1")).collect()
    assert "NotImplementedError" in str(ei.value) or "video" in str(ei.value)
