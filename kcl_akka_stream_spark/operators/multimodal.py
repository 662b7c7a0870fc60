"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference treats every payload as opaque bytes (SURVEY §1.3); a training
-data pipeline extends that to image/audio/video columns: ``binary`` payload
+ a metadata struct, processed by Arrow-batched ``mapInPandas`` operators.

The actual media codecs are NOT in this container, so the decode step is a
deterministic fake behind ``set_decoder`` (clearly marked); the Spark-side
plumbing -- schema, batch shape, partition sizing, UDF signatures -- is real
and tested.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried next to the opaque payload.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, digest string, feature array<double>"


def _fake_decode(payload: bytes, kind: str) -> list[float]:
    """STUB decoder: real image/audio libs are not installed here.  Produces
    a deterministic 8-dim 'feature' from the payload digest so the pipeline
    shape is testable end-to-end.  Swap via set_decoder() in production."""
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:8]]


_DECODER: Callable[[bytes, str], list[float]] = _fake_decode


def set_decoder(fn: Callable[[bytes, str], list[float]]) -> None:
    global _DECODER
    _DECODER = fn


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapt the documents fixture into the media envelope (payload = encoded
    text) -- the test stand-in for a real binary column."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def extract_features(df: DataFrame, batch_hint_rows: int = 1024) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas``: Arrow-batched, one
    Python worker per partition, constant memory per batch.  At 100 TB the
    payload column dominates -- partitions must be sized by bytes
    (spark.sql.files.maxPartitionBytes), not rows, and the feature output is
    narrow so the shuffle after this op is cheap."""

    from kcl_akka_stream_spark.plans.hygiene import spread

    df = spread(df)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_DECODER(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len),
                    "digest": pdf["payload"].map(lambda b: hashlib.sha256(b).hexdigest()),
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
    """STUB resizer: a real implementation would decode -> resample ->
    re-encode (PIL/ffmpeg, not installed here).  Deterministic fake:
    truncate the payload to the target pixel count so the byte-level
    plumbing (binary in, binary out, metadata rewrite) is real and
    oracle-checkable."""
    return payload[: w * h]


def resize_images(df: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize plumbing over the media envelope: Arrow-batched mapInPandas,
    binary -> binary, metadata struct rewritten to the target dims.  The
    decode/re-encode inside is stubbed (_fake_resize); the schema, batch
    shape and partition behavior are the production shape."""
    out_schema = "media_id long, width int, height int, n_bytes long, digest string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [_fake_resize(p, width, height) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "n_bytes": [len(b) for b in resized],
                    "digest": [hashlib.sha256(b).hexdigest() for b in resized],
                }
            )

    from kcl_akka_stream_spark.plans.hygiene import spread

    return spread(df).mapInPandas(run, schema=out_schema)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode n_frames into sampled frame
    indices (decode stubbed).  Pure built-ins -- the explode happens JVM-side;
    real decode would be a second mapInPandas over (media_id, frame_idx)."""
    return (
        df.filter(F.col("meta.n_frames").isNotNull())
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))).alias("frame_idx"),
        )
    )


def payload_simhash(
    df: DataFrame,
    gram: int = 4,
    stride: int = 4,
    bits: int = 16,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Byte-gram SimHash over an opaque BINARY payload -- near-duplicate
    fingerprinting that needs NO codec, so it works on any media column
    as-is (re-encoded copies, watermarked variants, truncated uploads all
    land within small hamming distance; a pixel-space pHash slots into
    the same banding once a decoder exists, ``set_decoder`` style).

    Same bit convention as the text simhash (operators/dedup.py): each
    ``gram``-byte window (start offsets 0, stride, 2*stride, ...; tail
    windows shorter than ``gram`` dropped) hashes with md5, bit i of a
    window = hex digit i+1 >= '8', per-bit sign-sum over the payload,
    fingerprint bit set iff the sum is positive.  Payloads with no full
    window produce no row.

    MAP-ONLY: one Arrow pass (mapInPandas) emitting (id, simhash);
    feed the result to ``dedup.fingerprint_band_pairs`` for the banded
    candidate join + hamming verify.
    """
    src = df.select(id_col, payload_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        highs = set(b"89abcdef")
        for pdf in batches:
            ids, fps = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                counts = [0] * bits
                n = 0
                for off in range(0, len(data) - gram + 1, stride):
                    h = hashlib.md5(data[off : off + gram]).hexdigest().encode()
                    n += 1
                    for i in range(bits):
                        if h[i] in highs:
                            counts[i] += 1
                if n == 0:
                    continue
                fp = 0
                for i in range(bits):
                    if 2 * counts[i] - n > 0:
                        fp |= 1 << i
                ids.append(mid)
                fps.append(fp)
            yield pd.DataFrame({id_col: pd.Series(ids, dtype="int64"),
                                "simhash": pd.Series(fps, dtype="int64")})

    from kcl_akka_stream_spark.plans.hygiene import spread

    return spread(src).mapInPandas(run, schema=f"{id_col} long, simhash long")
