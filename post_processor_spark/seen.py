"""URL-seen set: exact hash-keyed table + partitioned bloom pre-filter.

north_rule: "partitioned bloom/cuckoo-filter URL-seen set keyed by
canonicalized+hashed URL". Reference analog: drop_duplicates on load
(load_input.py:294) and the `unique` dict in the record cleaner
(scripts/cleaner/record/clean.py:41-52) — exact, driver-memory-bound.

Design:
- exact membership = `seen` table (url_hash, host_hash, generation);
  unseen = left_anti join on url_hash. Collision note: xxhash64 over
  canonical URLs makes the seen set hash-keyed per the north_rule; at
  10^10 keys the expected number of 64-bit collisions is ~3 (birthday
  bound) — a false "seen" drops a URL, which crawl semantics tolerate.
- bloom pre-filter = bitmaps SHARDED BY host-hash bucket, built
  distributively (applyInPandas per bucket, numpy bit-ops — no driver
  collection), carried as a tiny DataFrame (bucket, bitmap) and
  broadcast-joined onto candidates. Candidates whose bloom says
  "definitely unseen" skip the exact anti-join entirely; only
  "maybe seen" rows (true positives + FPs) hit the exact join. At
  10^10-frontier scale each executor holds only the buckets it joins
  (~1.2 GB per 10^9 keys at 1% FPR, split across buckets); if the total
  bloom outgrows broadcast, the same plan degrades gracefully to a
  co-partitioned shuffle join on bucket — no code change.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# splitmix64-style odd multipliers for double hashing (public-domain
# constants from the splitmix64 reference implementation)
_H1_MULT = np.uint64(0xBF58476D1CE4E5B9)
_H2_MULT = np.uint64(0x94D049BB133111EB)


def _positions(url_hash: np.ndarray, k: int, m: int) -> np.ndarray:
    """k bit positions per key via double hashing: pos_i = h1 + i*h2 mod m.
    Vectorized: returns shape (k, len(keys))."""
    x = url_hash.astype(np.uint64)
    h1 = (x * _H1_MULT) >> np.uint64(1)
    h2 = ((x ^ (x >> np.uint64(31))) * _H2_MULT) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64).reshape(-1, 1)
    return ((h1 + i * h2) % np.uint64(m)).astype(np.int64)


def build_bloom(
    seen: DataFrame, n_buckets: int = 64, bits_per_bucket: int = 1 << 20, k: int = 5
) -> DataFrame:
    """seen(url_hash, host_hash, ...) → (bucket, bitmap binary).

    Built fully distributed: one applyInPandas group per host-hash bucket.
    """
    m = bits_per_bucket

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m // 8, dtype=np.uint8)
        pos = _positions(pdf["url_hash"].to_numpy(), k, m).ravel()
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pd.DataFrame(
            {"bucket": [int(pdf["bucket"].iloc[0])], "bitmap": [bits.tobytes()]}
        )

    schema = T.StructType(
        [
            T.StructField("bucket", T.IntegerType()),
            T.StructField("bitmap", T.BinaryType()),
        ]
    )
    with_bucket = seen.withColumn(
        "bucket", F.pmod(F.col("host_hash"), F.lit(n_buckets)).cast("int")
    )
    return with_bucket.select("bucket", "url_hash").groupBy("bucket").applyInPandas(
        agg, schema=schema
    )


def bloom_filter_candidates(
    candidates: DataFrame,
    bloom: DataFrame,
    n_buckets: int = 64,
    bits_per_bucket: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Tag candidates with maybe_seen.

    COGROUP by bucket, not a join: a join would replicate the bucket's
    bitmap (hundreds of KB) onto EVERY candidate row through the Arrow
    channel; cogrouping ships each bucket's bitmap across exactly once
    per task. Candidates in a bucket with no bloom row are
    maybe_seen=False (nothing from that bucket was ever seen)."""
    m = bits_per_bucket

    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(candidates.schema.fields) + [T.StructField("maybe_seen", T.BooleanType())]
    )
    cand_cols = candidates.columns

    def check(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        out = left[cand_cols].copy()
        if right.empty or left.empty:
            out["maybe_seen"] = False
            return out
        bits = np.frombuffer(right["bitmap"].iloc[0], dtype=np.uint8)
        uh = left["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
        pos = _positions(uh, k, m)
        hit = np.ones(len(left), dtype=bool)
        for i in range(k):
            p = pos[i]
            hit &= (bits[p >> 3] & (np.uint8(1) << (p & 7).astype(np.uint8))) != 0
        out["maybe_seen"] = hit
        return out

    cand = candidates.withColumn(
        "bucket", F.pmod(F.col("host_hash"), F.lit(n_buckets)).cast("int")
    )
    return (
        cand.groupby("bucket")
        .cogroup(bloom.groupby("bucket"))
        .applyInPandas(check, schema=out_schema)
    )


def filter_unseen(
    candidates: DataFrame,
    seen: DataFrame,
    use_bloom: bool = True,
    n_buckets: int = 64,
    bits_per_bucket: int = 1 << 20,
) -> DataFrame:
    """Rows of `candidates` whose url_hash is not in `seen`.

    Bloom path: definitely-unseen rows bypass the exact join; maybe-seen
    rows get the exact left_anti (resolves bloom false positives)."""
    if not use_bloom:
        return candidates.join(seen.select("url_hash").distinct(), "url_hash", "left_anti")
    bloom = build_bloom(seen, n_buckets, bits_per_bucket)
    # persist: both branches (definitely-unseen ∪ resolved-maybe) consume
    # `tagged`; without a cache each union branch re-runs the candidate
    # lineage AND the bloom check
    tagged = bloom_filter_candidates(candidates, bloom, n_buckets, bits_per_bucket).persist()
    definitely_unseen = tagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = tagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    resolved = maybe.join(seen.select("url_hash").distinct(), "url_hash", "left_anti")
    return definitely_unseen.unionByName(resolved)
