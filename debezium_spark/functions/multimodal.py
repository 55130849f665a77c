"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are `binary` columns with a metadata struct; decode/resize/
frame-sample run as Arrow-batched pandas functions over `mapInPandas` — the Spark
side (schema, batching, partitioning) is real and tested; the codec step is a
deterministic stub because no image/audio libraries exist in this container
(clearly marked; swap `_decode_stub` for PIL/libav calls on a real cluster).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),       # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),     # opaque encoded bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),  # embedding-shaped
        T.StructField("frames_sampled", T.IntegerType()),
    ]
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = hash-chain bytes) for plumbing
    tests. Every derivation is md5/sha2-based so an ANSI-SQL oracle can rebuild
    the table bit-for-bit (see __spark_entry__ mm_media_features oracle)."""
    df = spark.range(n)
    # portable 60-bit hash (md5 hex prefix — same trick as dedup._h64)
    kind_h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(seed), "id")), 1, 15), 16, 10
    ).cast("long")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(kind_h, F.lit(3)) + 1).cast("int"),
    )
    payload = F.unbase64(
        F.base64(F.encode(F.repeat(F.sha2(F.concat_ws(":", F.lit(seed), "id"), 256), 8), "utf-8"))
    )
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        payload.alias("payload"),
        F.struct(
            F.lit(640).alias("width"),
            F.lit(480).alias("height"),
            (F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(60000)) + 1000).cast("long").alias("duration_ms"),
            F.lit(16000).alias("sample_rate"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """STUB codec: deterministic 8-dim feature from payload bytes.

    Real deployment: PIL.Image.open / torchaudio.load / av.open here. The container
    has no codec libraries, so this computes a stable stand-in feature; everything
    around it (Arrow batching, schema, partition shape) is production-real.
    """
    d = hashlib.sha256(payload).digest()
    return [int.from_bytes(d[i : i + 2], "big") / 65535.0 for i in range(0, 16, 2)]


def extract_features(media: DataFrame, *, frames_per_video: int = 4) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches, not per-row Python).

    Partitioning: repartition by media_id so one task never holds more than a
    batch of payloads in memory; at scale set spark.sql.files.maxPartitionBytes to
    bound batch bytes instead.
    """

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, hashes, nbytes, frames = [], [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                b = bytes(payload)
                hashes.append(hashlib.sha256(b).hexdigest())
                nbytes.append(len(b))
                feats.append(_decode_stub(b, kind))
                frames.append(frames_per_video if kind == "video" else 1)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "sha256": hashes,
                    "n_bytes": nbytes,
                    "feature": feats,
                    "frames_sampled": frames,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        batch_fn, schema=FEATURE_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),     # re-encoded bytes
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def resize_images(media: DataFrame, *, width: int, height: int) -> DataFrame:
    """Image resize plumbing over mapInPandas: filter to image rows (pushed to
    the scan), decode -> resize -> re-encode per Arrow batch. The codec is the
    container-honest STUB (`PIL.Image.open(...).resize(...)` on a real
    cluster): the re-encoded payload is the sha256 hex of
    ``payload || ':WxH'`` as utf-8 bytes — deterministic, so the DuckDB
    oracle rebuilds it bit-for-bit. Schema, batching, and the 1-in-1-out row
    shape are production-real."""

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag = f":{width}x{height}".encode()
        for pdf in batches:
            out_payload = [
                hashlib.sha256(bytes(p) + tag).hexdigest().encode()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out_payload,
                    "width": width,
                    "height": height,
                    "n_bytes": [len(b) for b in out_payload],
                }
            )

    return (
        media.where(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(batch_fn, schema=RESIZED_SCHEMA)
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("t_ms", T.LongType()),
        T.StructField("frame_sha", T.StringType()),
    ]
)


def sample_frames(media: DataFrame, *, every_ms: int) -> DataFrame:
    """Video frame sampling plumbing over mapInPandas with ROW EXPANSION —
    one input video emits ceil(duration_ms / every_ms) frame rows at
    t = 0, every_ms, 2*every_ms, ... (the `av.open` seek-and-grab loop on a
    real cluster; here the frame digest is the STUB
    ``sha256(payload || ':' || t_ms)``, rebuildable by the oracle). The
    1-to-N batch shape is the part that matters: the pandas batch returns
    MORE rows than it received, which is exactly how a decoder fans out
    frames without ever materializing them driver-side."""

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ts, shas = [], [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                b = bytes(payload)
                t, i = 0, 0
                while t < int(dur):
                    ids.append(mid)
                    idxs.append(i)
                    ts.append(t)
                    shas.append(
                        hashlib.sha256(b + f":{t}".encode()).hexdigest()
                    )
                    t, i = t + every_ms, i + 1
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "t_ms": ts, "frame_sha": shas}
            )

    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id", "payload", F.col("meta.duration_ms").alias("duration_ms")
        )
        .mapInPandas(batch_fn, schema=FRAME_SCHEMA)
    )
