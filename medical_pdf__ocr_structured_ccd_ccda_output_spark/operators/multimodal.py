"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The container has no image/audio codec LIBRARIES, so `real_decode=True`
decodes the one codec parseable with the stdlib alone — RIFF/WAV PCM
(via `wave` + numpy frombuffer); payloads that aren't WAV report
decode_status='unsupported_codec' (that slot is where PIL/torchaudio/
pyav plug in on a real cluster).  The default path emits deterministic
fake features so the batch shape, schema and partitioning are exercised
without any codec.  Both paths share the Spark-side plumbing: schema,
Arrow batch shape through mapInPandas, partition sizing, and the
feature contract downstream operators consume.

At scale: binary payloads dominate partition size — repartition by
`pmod(xxhash64(media_id), n)` before the decode pass and set
spark.sql.files.maxPartitionBytes low enough that a batch of payloads
fits executor memory alongside the decode workspace.
"""

from __future__ import annotations

import pandas as pd
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


def synthetic_wav_payload(key: int, rate: int = 8000) -> bytes:
    """Deterministic mono 16-bit PCM WAV: n = 32 + key%32 samples with
    sample_u16[i] = (key*7 + i*13) % 65536.  Shared by the oracled
    contract query and tests — the feature expectation has a closed
    form in the key, so DuckDB can oracle the REAL decode path."""
    import io
    import wave

    n = 32 + key % 32
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"".join(
            int((key * 7 + i * 13) % 65536).to_bytes(2, "little")
            for i in range(n)
        ))
    return buf.getvalue()


def wav_payload_udf():
    """pandas_udf key -> synthetic WAV bytes (Arrow binary batches)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _wav(key: pd.Series) -> pd.Series:
        return key.map(lambda k: synthetic_wav_payload(int(k)))

    return _wav


def _decode_wav(payload: bytes):
    """stdlib RIFF/WAV decode -> (samples_u16 ndarray, status)."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(bytes(payload))) as w:
            width = w.getsampwidth()
            frames = w.readframes(w.getnframes())
    except Exception:
        return None, "decode_error"
    if width == 2:
        samples = np.frombuffer(frames, dtype="<u2")
    elif width == 1:
        samples = np.frombuffer(frames, dtype=np.uint8).astype("uint16")
    else:
        return None, "decode_error"
    return samples, "wav"


def decode_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """mapInPandas decode/feature-extract pass.

    real_decode=True runs the stdlib WAV decoder (RIFF magic sniff ->
    `wave` parse -> uint16 sample histogram); non-WAV payloads get
    decode_status='unsupported_codec' — the production slot for
    PIL/torchaudio/pyav on a real cluster.  The default path emits
    deterministic fake features (byte-histogram projection) so the
    batch shape, schema and partitioning are exercised end-to-end
    without any codec.
    """

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            feats, hists, nbytes, status = [], [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    hists.append(None)
                    nbytes.append(0)
                    status.append("empty")
                    continue
                raw = bytes(payload)
                if real_decode:
                    if raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
                        samples, st = _decode_wav(raw)
                    else:
                        samples, st = None, "unsupported_codec"
                    nbytes.append(len(raw))
                    status.append(st)
                    if samples is None:
                        feats.append(None)
                        hists.append(None)
                        continue
                    hist = np.bincount(samples % _FEATURE_DIM,
                                       minlength=_FEATURE_DIM)
                    feats.append(
                        (hist / max(len(samples), 1)).astype("float32").tolist())
                    hists.append([int(x) for x in hist])
                    continue
                arr = np.frombuffer(raw, dtype=np.uint8)
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
