"""Multimodal columns: opaque binary payloads + typed metadata.

The training-data-pipeline pattern (driver north star): media travels
as a ``binary`` column with typed metadata alongside; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes never round-trip row-at-a-time through
Python.

The image/audio codec libraries are NOT in this container, so the
decode kernels are stubbed (clearly marked) with a deterministic fake
keyed on the payload hash — the Spark-side contract (schemas,
partitioning, batch shape, null handling) is real and tested. Swapping
in a real decoder means replacing only ``_fake_decode_*`` bodies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),       # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StructType([
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("duration_ms", T.IntegerType()),
            T.StructField("mime", T.StringType()),
        ])),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)

STUB_FEATURE_DIM = 8


def _payload_digest_ints(payload: bytes, n: int) -> list[int]:
    """STUB decode kernel: deterministic pseudo-decode from sha256 of
    the payload. Replace with a real codec (PIL/ffmpeg) in deployment."""
    import hashlib

    h = hashlib.sha256(payload or b"").digest()
    return [h[i % 32] for i in range(n)]


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests/demos (no codecs in
    container). Payload bytes derive from media_id; metadata is typed."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = f"media-{i}".encode() * (4 + i % 5)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                (64 + i % 8, 48 + i % 6, 1000 * (1 + i % 7), f"x/{kind}"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_from_documents(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic media table derived from a text corpus: payload =
    UTF-8 bytes of the text, kind/metadata keyed on the id. Gives the
    multimodal operators a reproducible input both engines (and the
    DuckDB oracle) can construct — the at-scale analog is a parquet
    table with a real binary column."""
    mid = F.col(id_col).cast("long")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        F.pmod(mid, 3).cast("int") + 1,
    )
    return docs.select(
        mid.alias("media_id"),
        kind.alias("kind"),
        F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8").alias("payload"),
        F.struct(
            (F.lit(64) + F.pmod(mid, 8)).cast("int").alias("width"),
            (F.lit(48) + F.pmod(mid, 6)).cast("int").alias("height"),
            (F.lit(1000) * (F.lit(1) + F.pmod(mid, 7))).cast("int").alias("duration_ms"),
            F.concat(F.lit("x/"), kind).alias("mime"),
        ).alias("meta"),
    )


def image_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode + feature-extract images via Arrow-batched mapInPandas.

    The kernel sees pandas batches (zero-copy Arrow transfer); output
    partitioning follows the input — no shuffle. Decode itself is a
    STUB (deterministic hash features) pending a real codec.
    """
    imgs = media.filter(F.col("kind") == "image").select("media_id", "payload", "meta")

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            feats = [
                [float(v) / 255.0 for v in _payload_digest_ints(p, STUB_FEATURE_DIM)]
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [m["width"] for m in pdf["meta"]],
                    "height": [m["height"] for m in pdf["meta"]],
                    "mean_luma": [sum(f) / len(f) for f in feats],
                    "feature": feats,
                }
            )

    return imgs.mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB resize: re-tags metadata and rewrites payload length
    deterministically; real impl swaps the kernel body only."""
    imgs = media.filter(F.col("kind") == "image")

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            out_payload = [
                bytes(_payload_digest_ints(p, width * height // 64)) for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": out_payload,
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    return imgs.mapInPandas(kernel, schema)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """STUB frame sampling for video rows: one output row per sampled
    frame (duration_ms / every_ms frames). The fan-out shape — one
    input row to many frame rows inside an Arrow batch — is the real
    contract a decoder plugs into."""
    vids = media.filter(F.col("kind") == "video").select("media_id", "payload", "meta")

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            ids, nos, frames = [], [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                n_frames = max(int(meta["duration_ms"]) // every_ms, 1)
                for k in range(n_frames):
                    ids.append(mid)
                    nos.append(k)
                    frames.append(bytes(_payload_digest_ints(payload + bytes([k]), 16)))
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    return vids.mapInPandas(kernel, FRAME_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("mean_amp", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

STUB_SAMPLE_RATE = 16_000


def audio_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract audio rows — same Arrow-batched
    mapInPandas contract as :func:`image_features`: batches in, no
    shuffle, decode STUBBED (sha256-derived pseudo-samples) pending a
    real codec. ``n_samples`` derives from metadata duration at the
    stub 16 kHz rate; ``mean_amp`` is the mean of the pseudo-sample
    bytes normalized to [0, 1]."""
    auds = media.filter(F.col("kind") == "audio").select("media_id", "payload", "meta")

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            feats = [
                [float(v) / 255.0 for v in _payload_digest_ints(p, STUB_FEATURE_DIM)]
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": STUB_SAMPLE_RATE,
                    "n_samples": [
                        int(m["duration_ms"]) * (STUB_SAMPLE_RATE // 1000)
                        for m in pdf["meta"]
                    ],
                    "mean_amp": [sum(f) / len(f) for f in feats],
                    "feature": feats,
                }
            )

    return auds.mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)


def decode_audio(media: DataFrame) -> DataFrame:
    """Raw audio decode (full PCM out) is NOT implementable in this
    container (no codec libs) — explicit gate per SURVEY; the
    feature-extraction surface with the stub decode is
    :func:`audio_features`, whose kernel body a real codec replaces."""
    raise NotImplementedError(
        "audio decode requires an audio codec library not present in this "
        "environment; the mapInPandas plumbing pattern is audio_features()"
    )
