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
- bloom pre-filter = bitmaps SHARDED BY url-hash bucket (uniform by
  construction — host-hash bucketing would concentrate a mega-host's
  keys in one bucket, making its build task hot and its FPR balloon),
  built distributively (applyInPandas per bucket, numpy bit-ops — no
  driver collection), carried as a tiny DataFrame (bucket, bitmap) and
  broadcast-joined onto candidates. Candidates whose bloom says
  "definitely unseen" skip the exact anti-join entirely; only
  "maybe seen" rows (true positives + FPs) hit the exact join. At
  10^10-frontier scale each executor holds only the buckets it joins
  (~1.2 GB per 10^9 keys at 1% FPR, split across buckets); if the total
  bloom outgrows broadcast, the same plan degrades gracefully to a
  co-partitioned shuffle join on bucket — no code change.
"""

from __future__ import annotations


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


def _bucket_col(n_buckets: int):
    """Uniform bucket from url_hash's HIGH 32 bits. High bits are
    independent of the double-hash position arithmetic (whose low-20-bit
    values depend only on the key's low bits), so conditioning on the
    bucket doesn't constrain which bitmap slots a key can hit — low-bit
    bucketing would concentrate h1 positions on 1/n_buckets of each
    bitmap."""
    return F.pmod(F.shiftrightunsigned(F.col("url_hash"), 32), F.lit(n_buckets)).cast(
        "int"
    )


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

    with_bucket = seen.withColumn("bucket", _bucket_col(n_buckets))
    return with_bucket.select("bucket", "url_hash").groupBy("bucket").applyInPandas(
        agg, schema=_BLOOM_SCHEMA
    )


_BLOOM_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("bitmap", T.BinaryType()),
    ]
)


_EXACT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("keys", T.BinaryType()),
    ]
)


def build_exact_index(seen: DataFrame, n_buckets: int = 64) -> DataFrame:
    """seen(url_hash, ...) → (bucket, keys binary): sorted DISTINCT
    int64 url_hash shards, bucketed by the same uniform url-hash-high-bits
    rule as the bloom.

    This is the EXACT membership structure of the seen set in a compact,
    broadcastable form (8 bytes/key — a 4M-key seen side is 32 MB,
    vs a driver-built JVM hash relation for the same keys). Like the
    bloom it is STATE: built distributed (applyInPandas per bucket),
    maintained incrementally via merge_exact_index over per-generation
    deltas, never rebuilt from the full seen table per pass. Membership
    is np.searchsorted — vectorized binary search, no per-pass serial
    hash-relation build (the Amdahl section that capped N→4N scaling of
    the broadcast_fused pass). At 10^10 keys (80 GB) the index no longer
    broadcasts — use the branch path + bucketed seen layout instead;
    the bucket column means the same shards also serve a cogrouped
    executor-side lookup without re-sharding."""

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = np.unique(pdf["url_hash"].to_numpy(dtype=np.int64))
        return pd.DataFrame(
            {"bucket": [int(pdf["bucket"].iloc[0])], "keys": [keys.tobytes()]}
        )

    return (
        seen.withColumn("bucket", _bucket_col(n_buckets))
        .select("bucket", "url_hash")
        .groupBy("bucket")
        .applyInPandas(agg, schema=_EXACT_SCHEMA)
    )


def merge_exact_index(deltas: DataFrame) -> DataFrame:
    """Union-merge per-generation sorted-shard deltas into one sorted
    distinct shard per bucket (the exact-index analog of merge_bloom)."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = np.unique(
            np.concatenate(
                [np.frombuffer(b, dtype=np.int64) for b in pdf["keys"]]
            )
        )
        return pd.DataFrame(
            {"bucket": [int(pdf["bucket"].iloc[0])], "keys": [keys.tobytes()]}
        )

    return deltas.groupBy("bucket").applyInPandas(merge, schema=_EXACT_SCHEMA)


def merge_bloom(deltas: DataFrame) -> DataFrame:
    """OR-merge per-generation delta bitmaps into one bitmap per bucket.

    The bloom table is maintained INCREMENTALLY (north_rule 10^10 scale):
    each generation appends a delta built from only that generation's new
    keys, so no generation ever rescans the full seen table — at a
    10^10-row seen set that rescan is the whole job. Merging is a tiny
    shuffle of (generations-since-compaction × n_buckets) bitmap rows."""

    def or_reduce(pdf: pd.DataFrame) -> pd.DataFrame:
        out = np.frombuffer(pdf["bitmap"].iloc[0], dtype=np.uint8).copy()
        for b in pdf["bitmap"].iloc[1:]:
            out |= np.frombuffer(b, dtype=np.uint8)
        return pd.DataFrame(
            {"bucket": [int(pdf["bucket"].iloc[0])], "bitmap": [out.tobytes()]}
        )

    return deltas.groupBy("bucket").applyInPandas(or_reduce, schema=_BLOOM_SCHEMA)


def _bucket_np(url_hash: np.ndarray, n_buckets: int) -> np.ndarray:
    """numpy twin of _bucket_col: uniform bucket from url_hash's high 32
    bits. Computing it INSIDE the pandas UDF from the hash it already
    receives keeps the derived column out of the Arrow exchange
    (8 bytes/row on a 20M-row pass is ~160 MB of transfer for a value
    that's one shift+mod away)."""
    return ((url_hash.view(np.uint64) >> np.uint64(32)) % np.uint64(n_buckets)).astype(
        np.int64
    )


def _unseen_udf(
    spark, bloom: DataFrame, exact_index: DataFrame, n_buckets: int,
    bits_per_bucket: int, k: int = 5,
):
    """Pandas UDF (url_hash) → unseen boolean: bloom pre-filter then
    exact searchsorted resolution of the maybe subset, all inside one
    Arrow batch — the 'prebuilt' strategy's entire seen filter.

    Both lookup structures are flattened at collect time so the per-batch
    test is branch-free vectorized numpy — no per-bucket Python loop:
    the bitmaps concatenate into one (n_buckets * m/8) byte array
    (global bit address = bucket * m + pos, a pure gather), and the
    exact shards union-merge into ONE globally sorted key array (the
    bucket partitioning exists for distributed build/maintenance and the
    10^10 cogroup path, not for the broadcast probe)."""
    m = bits_per_bucket
    bits_flat = np.zeros(n_buckets * (m // 8), dtype=np.uint8)
    for r in bloom.collect():
        b = int(r["bucket"])
        bits_flat[b * (m // 8):(b + 1) * (m // 8)] = np.frombuffer(
            r["bitmap"], dtype=np.uint8
        )
    shards = [
        np.frombuffer(r["keys"], dtype=np.int64) for r in exact_index.collect()
    ]
    keys_global = (
        np.sort(np.concatenate(shards)) if shards else np.zeros(0, dtype=np.int64)
    )
    bc_b = spark.sparkContext.broadcast(bits_flat)
    bc_i = spark.sparkContext.broadcast(keys_global)

    @F.pandas_udf("boolean")
    def is_unseen(url_hash: pd.Series) -> pd.Series:
        if len(url_hash) == 0:
            return pd.Series(np.zeros(0, dtype=bool))
        uh = url_hash.to_numpy(dtype=np.int64)
        bk = _bucket_np(uh, n_buckets)
        bits = bc_b.value
        base = bk * (m // 8)
        pos = _positions(uh.view(np.uint64), k, m)
        maybe = np.ones(len(uh), dtype=bool)
        for i in range(k):
            p = pos[i]
            maybe &= (
                bits[base + (p >> 3)] & (np.uint8(1) << (p & 7).astype(np.uint8))
            ) != 0
        seen_mask = np.zeros(len(uh), dtype=bool)
        if maybe.any():
            keys = bc_i.value
            if len(keys):
                v = uh[maybe]
                p = np.clip(np.searchsorted(keys, v), 0, len(keys) - 1)
                seen_mask[maybe] = keys[p] == v
        return pd.Series(~seen_mask)

    return is_unseen


def bloom_filter_candidates(
    candidates: DataFrame,
    bloom: DataFrame,
    n_buckets: int = 64,
    bits_per_bucket: int = 1 << 20,
    k: int = 5,
    mode: str = "auto",
) -> DataFrame:
    """Tag candidates with maybe_seen. Two physical strategies — both keep
    candidate ROWS out of Python (only the two hash longs ever cross the
    Arrow channel; an earlier full-row cogroup variant was 20x slower):

    - 'broadcast' (default while total bitmap bytes fit an executor):
      bitmaps collected once + broadcast to workers; membership is a
      scalar pandas UDF over (url_hash, bucket) — a narrow map, NO shuffle.
    - 'cogroup' (the 10^10 path, bitmaps too big to broadcast): hash-only
      projection cogrouped with its bucket's bitmap shard, then a JVM
      join-back on url_hash. Each executor only ever holds the shards it
      processes."""
    m = bits_per_bucket
    bucket_col = _bucket_col(n_buckets)

    if mode == "auto":
        mode = "broadcast" if n_buckets * (m // 8) <= 256 * (1 << 20) else "cogroup"

    if mode == "broadcast":
        spark = candidates.sparkSession
        # flat concatenated bitmaps: branch-free vectorized probe (global
        # bit address = bucket * m + pos), no per-bucket Python loop
        bits_flat = np.zeros(n_buckets * (m // 8), dtype=np.uint8)
        for r in bloom.collect():
            b = int(r["bucket"])
            bits_flat[b * (m // 8):(b + 1) * (m // 8)] = np.frombuffer(
                r["bitmap"], dtype=np.uint8
            )
        bc = spark.sparkContext.broadcast(bits_flat)

        @F.pandas_udf("boolean")
        def might_contain(url_hash: pd.Series) -> pd.Series:
            if len(url_hash) == 0:
                return pd.Series(np.zeros(0, dtype=bool))
            uh = url_hash.to_numpy(dtype=np.int64)
            base = _bucket_np(uh, n_buckets) * (m // 8)
            pos = _positions(uh.view(np.uint64), k, m)
            bits = bc.value
            hit = np.ones(len(uh), dtype=bool)
            for i in range(k):
                p = pos[i]
                hit &= (
                    bits[base + (p >> 3)]
                    & (np.uint8(1) << (p & 7).astype(np.uint8))
                ) != 0
            return pd.Series(hit)

        return candidates.withColumn(
            "maybe_seen", might_contain(F.col("url_hash"))
        )

    # cogroup path: only (url_hash, bucket) enters Python
    from pyspark.sql import types as T

    hashes = candidates.select(
        F.col("url_hash"), bucket_col.alias("bucket")
    ).dropDuplicates(["url_hash"])

    out_schema = T.StructType(
        [
            T.StructField("url_hash", T.LongType()),
            T.StructField("maybe_seen", T.BooleanType()),
        ]
    )

    def check(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame({"url_hash": [], "maybe_seen": []})
        if right.empty:
            return pd.DataFrame(
                {"url_hash": left["url_hash"], "maybe_seen": np.zeros(len(left), dtype=bool)}
            )
        bits = np.frombuffer(right["bitmap"].iloc[0], dtype=np.uint8)
        uh = left["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
        pos = _positions(uh, k, m)
        hit = np.ones(len(left), dtype=bool)
        for i in range(k):
            p = pos[i]
            hit &= (bits[p >> 3] & (np.uint8(1) << (p & 7).astype(np.uint8))) != 0
        return pd.DataFrame({"url_hash": left["url_hash"], "maybe_seen": hit})

    tagged = (
        hashes.groupby("bucket")
        .cogroup(bloom.groupby("bucket"))
        .applyInPandas(check, schema=out_schema)
    )
    return candidates.join(tagged, "url_hash", "left").fillna({"maybe_seen": False})


def filter_unseen(
    candidates: DataFrame,
    seen: DataFrame,
    use_bloom: bool = True,
    n_buckets: int = 64,
    bits_per_bucket: int = 1 << 20,
    mode: str = "auto",
    materialize: bool = False,
    bloom: DataFrame | None = None,
    exact_join: str = "branch",
    exact_index: DataFrame | None = None,
) -> DataFrame:
    """Rows of `candidates` whose url_hash is not in `seen`.

    Bloom path: definitely-unseen rows bypass the exact join; maybe-seen
    rows get the exact left_anti (resolves bloom false positives).

    bloom: prebuilt (bucket, bitmap) frame (e.g. the incrementally
    maintained store table via merge_bloom). When omitted, the bloom is
    built from the full seen table — an O(|seen|) rescan acceptable for
    one-shot use, NOT per generation at scale.

    exact_join='branch' (default): two-branch union — definitely-unseen
    rows bypass the exact join as a separate plan branch. Correct under
    ANY join strategy, including the bucketed storage-partitioned seen
    layout; costs one cache of the tagged frame (both branches consume
    it).
    exact_join='broadcast_fused': ONE streaming pass, no intermediate
    cache — the anti-join key is NULLed for definitely-unseen rows (a
    null key never matches a left_anti probe, so those rows survive
    without touching the hash table) and the seen side is explicitly
    broadcast. ONLY valid while the seen side fits a broadcast: under a
    shuffle join every null-key row would hash to a single partition —
    the worst possible skew — and the expression key would defeat the
    bucketed layout's exchange-free scan. Used by the seed-list fast
    path (frontier.schedule_seed_list).
    exact_join='prebuilt': bloom test AND exact resolution in ONE narrow
    pandas UDF — the exact side is the incrementally-maintained sorted
    int64 shard index (build_exact_index / merge_exact_index), broadcast
    as compact numpy arrays; membership is vectorized np.searchsorted on
    the bloom-maybe subset only. NO join operator and NO per-pass serial
    hash-relation build — the whole seen filter is a narrow map, so the
    pass's only non-parallel cost is the bitmap+index collect/broadcast
    (~40 MB at a 4M-key seen side). Valid while the index fits executor
    memory (same envelope as broadcast_fused); at 10^10 keys use the
    branch path + bucketed layout.
    exact_join='shuffle_hash': the branch plan with a shuffle-hash hint
    on the seen side of the maybe-resolve join — no serial broadcast
    relation build (the broadcast build is a fixed Amdahl section that
    caps scaling efficiency as core count grows); both sides exchange
    and hash in parallel instead. Pick this when the seen side is large
    enough that its broadcast build rivals the per-core pass time.

    materialize=True: persist + force the RESULT, then release the
    intermediate cache. Use when the caller consumes the result more than
    once (count + snapshot writes) — uncached, each consumer re-runs the
    candidate lineage and the membership pass. Caller owns unpersist() of
    the returned frame; the forced row count is exposed as
    `out.materialized_count` so callers don't pay a second count job."""
    # NOTE: no .distinct() on the seen side — left_anti semantics ignore
    # duplicate matches, and a distinct would shuffle the full seen table
    # (10^10 rows at target scale) before every generation's join.
    if exact_join not in ("branch", "broadcast_fused", "shuffle_hash", "prebuilt"):
        raise ValueError(
            "exact_join must be 'branch', 'broadcast_fused', 'shuffle_hash'"
            f" or 'prebuilt', got {exact_join!r}"
        )
    if not use_bloom:
        out = candidates.join(seen.select("url_hash"), "url_hash", "left_anti")
        if materialize:
            out = out.persist()
            out.materialized_count = out.count()
        return out
    if bloom is None:
        # Ad-hoc one-shot build (callers on the per-generation path pass
        # the incrementally-maintained store bloom instead): right-size
        # the filter to the actual seen count rather than paying the
        # default 10^8-key geometry (8 MB of bitmaps built, collected and
        # broadcast) for a small table. ~10 bits/key keeps FPR ~1%; the
        # count job is one cheap pass over a table this path only ever
        # sees at one-shot scale.
        cnt = seen.count()
        total_bits = 1 << max(13, (max(cnt, 1) * 10 - 1).bit_length())
        bits_per_bucket = min(bits_per_bucket, max(1 << 13, total_bits // n_buckets))
        bloom = build_bloom(seen, n_buckets, bits_per_bucket)
    if exact_join == "prebuilt":
        if exact_index is None:
            exact_index = build_exact_index(seen, n_buckets)
        out = candidates.filter(
            _unseen_udf(
                candidates.sparkSession, bloom, exact_index, n_buckets,
                bits_per_bucket,
            )(F.col("url_hash"))
        )
        if materialize:
            out = out.persist()
            out.materialized_count = out.count()
        return out
    if exact_join == "broadcast_fused":
        tagged = bloom_filter_candidates(
            candidates, bloom, n_buckets, bits_per_bucket, mode=mode
        )
        out = (
            tagged.withColumn(
                "_mk", F.when(F.col("maybe_seen"), F.col("url_hash"))
            )
            .join(
                F.broadcast(seen.select(F.col("url_hash").alias("_mk"))),
                "_mk",
                "left_anti",
            )
            .drop("_mk", "maybe_seen")
        )
        if materialize:
            out = out.persist()
            out.materialized_count = out.count()
        return out
    # persist: both branches (definitely-unseen ∪ resolved-maybe) consume
    # `tagged`; without a cache each union branch re-runs the candidate
    # lineage AND the bloom check
    tagged = bloom_filter_candidates(
        candidates, bloom, n_buckets, bits_per_bucket, mode=mode
    ).persist()
    definitely_unseen = tagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = tagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    seen_side = seen.select("url_hash")
    if exact_join == "shuffle_hash":
        seen_side = seen_side.hint("shuffle_hash")
    resolved = maybe.join(seen_side, "url_hash", "left_anti")
    out = definitely_unseen.unionByName(resolved)
    if materialize:
        out = out.persist()
        out.materialized_count = out.count()
        tagged.unpersist()
    return out
