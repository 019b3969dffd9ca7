"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The container has no image/audio codecs, so the decode step is STUBBED
(NotImplementedError behind `real_decode=True`, deterministic fake
features otherwise) — but the Spark-side plumbing is real and tested:
schema, Arrow batch shape through mapInPandas, partition sizing, and
the feature contract downstream operators consume.

At scale: binary payloads dominate partition size — repartition by
`pmod(xxhash64(media_id), n)` before the decode pass and set
spark.sql.files.maxPartitionBytes low enough that a batch of payloads
fits executor memory alongside the decode workspace.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("doc_id", T.LongType(), True),
    T.StructField("media_type", T.StringType(), False),   # image|audio|video
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
    ]), True),
])

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes int, "
    "feature array<float>, hist array<int>, decode_status string"
)

_FEATURE_DIM = 16


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media rows (payload = seeded bytes)."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        mt = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.randrange(256) for _ in range(rng.randrange(64, 256)))
        rows.append((
            i, i // 2, mt, payload,
            (64 + i % 512, 64 + (i * 7) % 512,
             1000 * (1 + i % 30), "fake"),
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """mapInPandas decode/feature-extract pass.

    real_decode=True is the production slot for PIL/libav decoding —
    NotImplementedError here because the codecs are not in this
    container.  The default path emits deterministic fake features
    (byte-histogram projection) so the batch shape, schema and
    partitioning are exercised end-to-end.
    """

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            if real_decode:
                raise NotImplementedError(
                    "media codecs unavailable in this environment; "
                    "plug PIL/torchaudio/pyav here"
                )
            feats, hists, nbytes, status = [], [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    hists.append(None)
                    nbytes.append(0)
                    status.append("empty")
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr % _FEATURE_DIM, minlength=_FEATURE_DIM)
                denom = max(len(arr), 1)
                feats.append((hist / denom).astype("float32").tolist())
                # exact integer histogram: the contract-surface twin of
                # `feature` (float lists aren't portably serializable)
                hists.append([int(x) for x in hist])
                nbytes.append(len(arr))
                status.append("stub")
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pd.Series(nbytes, dtype="int32"),
                "feature": feats,
                "hist": hists,
                "decode_status": status,
            })

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan* (timestamps to decode) — pure SQL:
    explodes a sequence over duration; the actual frame decode belongs
    in decode_features' real path."""
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
