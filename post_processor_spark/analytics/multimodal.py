"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata. The Spark-side plumbing (schema, partitioning, Arrow
batch shape, UDF signatures) is real and tested; the actual codec calls
are STUBBED — the decode libraries are not in this container. Each stub
is clearly marked and either raises NotImplementedError (strict mode) or
produces a deterministic fake (test mode).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),       # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),      # opaque bytes
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def synthetic_media(
    documents: DataFrame, id_col: str = "doc_id", arithmetic: bool = False
) -> DataFrame:
    """Deterministic fake media table derived from doc ids — payload bytes
    are a hash-expanded pattern so tests have real binary columns.

    arithmetic=True derives kind/width/height/duration by modular
    arithmetic on a NUMERIC id instead of xxhash64 — same shape, but
    every derived field (and the sha256 payload) is reproducible in an
    external ANSI-SQL engine, which is what lets q_media_features run
    under the full DuckDB value-hash gate instead of rows-only."""
    if arithmetic:
        kind_sel = F.pmod(F.col(id_col).cast("long"), F.lit(3)) + 1
        width = F.pmod(F.col(id_col).cast("long"), F.lit(1920)) + 1
        height = F.pmod(F.col(id_col).cast("long"), F.lit(1080)) + 1
        duration = F.pmod(F.col(id_col).cast("long"), F.lit(60000))
    else:
        kind_sel = F.pmod(F.xxhash64(id_col), F.lit(3)) + 1
        width = F.pmod(F.xxhash64(id_col, F.lit(1)), F.lit(1920)) + 1
        height = F.pmod(F.xxhash64(id_col, F.lit(2)), F.lit(1080)) + 1
        duration = F.pmod(F.xxhash64(id_col, F.lit(3)), F.lit(60000))
    return documents.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            kind_sel.cast("int"),
        ).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        width.cast("int").alias("width"),
        height.cast("int").alias("height"),
        duration.cast("long").alias("duration_ms"),
        F.to_binary(F.sha2(F.col(id_col).cast("string"), 256), F.lit("hex")).alias("payload"),
    )


def _decode_stub(payload: bytes, kind: str, strict: bool) -> np.ndarray:
    """STUB: real impl would call PIL/libav/ffmpeg. Deterministic fake:
    interpret payload bytes as the 'decoded' sample array."""
    if strict:
        raise NotImplementedError(
            "media decode requires codec libraries not present in this "
            "container — plug a real decoder in here"
        )
    return np.frombuffer(payload or b"\x00", dtype=np.uint8).astype(np.float32)


def _bucket_means(arr: np.ndarray, dim: int) -> tuple[np.ndarray, float]:
    """Pad to a multiple of `dim`, return (`dim` bucket means, padded
    mean). Dtype-preserving: feature extraction feeds float32 (schema is
    float), perceptual_hash feeds float64 (exact /dim arithmetic for the
    oracle) — shared so the pad/reshape logic can't drift between the
    two."""
    pad = int(np.ceil(len(arr) / dim) * dim)
    padded = np.pad(arr, (0, pad - len(arr)))
    return padded.reshape(dim, -1).mean(axis=1), padded.mean()


def extract_features(
    media: DataFrame, dim: int = 8, strict: bool = False
) -> DataFrame:
    """decode → feature-extract as an Arrow-batched mapInPandas stage.

    Partitioning note: media rows are large (payload bytes); the stage is
    a narrow map — no shuffle. At 100 TB you bound Arrow batch memory via
    spark.sql.execution.arrow.maxRecordsPerBatch (set in session.py) and
    spark.sql.files.maxPartitionBytes on the scan."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, frames = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                arr = _decode_stub(payload, kind, strict)
                # 'feature' = dim bucket means over the decoded samples
                buckets, _ = _bucket_means(arr, dim)
                feats.append(buckets.astype(np.float32).tolist())
                frames.append(int(kind == "video") * 16 or 1)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_frames": frames,
                }
            )

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, max_px: int = 256, strict: bool = False) -> DataFrame:
    """Resize stage: metadata math is real (aspect-preserving target
    dims, JVM-side); pixel resampling is the stubbed decode path."""
    scale = F.least(
        F.lit(max_px) / F.greatest(F.col("width"), F.lit(1)),
        F.lit(max_px) / F.greatest(F.col("height"), F.lit(1)),
        F.lit(1.0),
    )
    return media.withColumn("target_width", F.ceil(F.col("width") * scale).cast("int")) \
                .withColumn("target_height", F.ceil(F.col("height") * scale).cast("int"))


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for videos: one row per sampled timestamp —
    pure explode on metadata (decode of the actual frame is the stub)."""
    vids = media.filter(F.col("kind") == "video")
    ts = F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
    return vids.select("media_id", F.explode(ts).alias("frame_ts_ms"))


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("phash", T.LongType(), True),
    ]
)


def perceptual_hash(media: DataFrame, dim: int = 64, strict: bool = False) -> DataFrame:
    """(media_id, kind, phash) — average-hash over the decoded samples:
    decode (STUB — same codec boundary as extract_features) → pad to a
    multiple of `dim` → `dim` bucket means → bit i set iff bucket i is
    strictly above the padded-array mean → signed int64.

    The media analog of dedup.simhash: a 64-bit signature whose hamming
    distance tracks payload similarity, so near-duplicate media detection
    at 100 TB reuses dedup.simhash_near_dups' 16-bit-quarter blocking
    unchanged (pigeonhole-exact ≤3, equi-join — no all-pairs):

        sig = perceptual_hash(media).select(F.col("media_id").alias("id"),
                                            F.col("phash").alias("simhash"))
        pairs = dedup.simhash_near_dups(sig, max_hamming=3)

    Narrow Arrow-batched map, no shuffle; the bucket-mean/threshold
    arithmetic is exact in float64 (integer byte sums, /dim a power of
    two), which is what lets the DuckDB oracle reproduce the hash
    bit-for-bit on the arithmetic synthetic payloads (q_media_phash).

    dim is capped at 64: the signature is one int64, and wrapping extra
    buckets onto reused bit positions would OR unrelated buckets
    together — the hash would stop being the documented average-hash and
    hamming distances would be meaningless."""
    if not 0 < dim <= 64:
        raise ValueError(f"dim must be in [1, 64]: {dim}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                arr = _decode_stub(payload, kind, strict).astype(np.float64)
                buckets, mu = _bucket_means(arr, dim)
                h = np.uint64(0)
                for i in range(dim):
                    if buckets[i] > mu:
                        h |= np.uint64(1) << np.uint64(i)
                hashes.append(int(h.astype(np.int64)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "phash": pd.Series(hashes, dtype="int64"),
                }
            )

    return media.mapInPandas(gen, schema=PHASH_SCHEMA)
