"""Deduplication operators over a documents(doc_id, text, ...) table.

- exact_dedup: hash-groupBy (reference analog: first-wins record dedupe,
  scripts/cleaner/record/clean.py:41-60, P6/P7)
- minhash_lsh_candidates / minhash_dedup: shingle → minhash (xxhash64,
  JVM-side) → band buckets → bucket join. The classic MinHash+LSH
  near-dup pipeline expressed as explode/groupBy/join — no UDFs.
- simhash: 64-bit simhash from token hashes via bit-vote aggregation,
  vectorized with explode + groupBy over bit positions.
- ngram_jaccard_pairs: exact n-gram Jaccard for candidate verification.

Scale notes: every stage is shuffle-by-key with map-side combine;
minhash bands bound the candidate-pair blowup; a duplicate mega-cluster
is capped with per-bucket limits (documented below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def normalize_text(col):
    """lower + collapse whitespace — shared normalization for dedup keys."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def norm_tokens(col):
    """Whitespace tokens of the normalized text, in one regex pass:
    split(lower(trim(x)), '\\s+') yields exactly
    split(normalize_text(x), ' ') — the collapse-then-split round trip
    builds a full normalized copy of every document only to cut it
    apart again, which profiling showed was the single largest cost of
    the whole minhash pipeline (the explode floor). Keep normalize_text
    for operators that need the normalized STRING as a key."""
    return F.split(F.lower(F.trim(col)), r"\s+")


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the first doc (by id) per normalized-text group."""
    w = Window.partitionBy(normalize_text(F.col(text_col))).orderBy(id_col)
    return docs.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")


def shingles(docs: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) — word n-gram shingles, distinct per doc.

    The token array is materialized as a column BEFORE the gram
    transform: an expression referenced inside a higher-order lambda is
    re-evaluated per element (Spark does no loop-invariant hoisting out
    of lambda scope), so an inline norm_tokens would re-split the whole
    document once per gram — O(tokens²) regex work per doc (measured
    2.4x on the same trap in passage_windows)."""
    base = docs.select(
        F.col(id_col).alias("id"), norm_tokens(F.col(text_col)).alias("_toks")
    )
    toks = F.col("_toks")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return base.select("id", F.explode(F.array_distinct(grams)).alias("shingle"))


def hashed_shingles(
    docs: DataFrame, text_col: str, id_col: str, n: int = 3
) -> DataFrame:
    """(id, _h: long) — distinct word-n-gram shingle HASHES, no gram
    string ever materialized: each n-gram is hashed directly from its n
    token strings with one multi-arg xxhash64 (JVM-side hash chaining).
    Cheaper than shingles()+xxhash64(shingle) — no array_join copy of
    ~n words per position per doc — and the explode carries longs, not
    strings. Minhash only needs a hash family over shingle identity, so
    the gram text itself is never required (ngram_jaccard_pairs keeps
    the string form for its df-cap semantics).

    F.get (0-indexed, null-safe under ANSI) pads trailing short grams
    with nulls, which multi-arg xxhash64 skips — a doc shorter than n
    words still yields one shingle, like shingles() does."""
    base = docs.select(
        F.col(id_col).alias("id"), norm_tokens(F.col(text_col)).alias("_toks")
    )
    return base.select("id", F.explode(_gram_hashes("_toks", n)).alias("_h"))


def _gram_hashes(toks_col: str, n: int):
    """array<long> of distinct word-n-gram hashes for one document row
    (see hashed_shingles for the hashing contract). toks_col must be a
    MATERIALIZED token-array column, not an inline split expression —
    the lambda references it n times per gram, and anything non-trivial
    there gets re-evaluated per reference (see shingles)."""
    toks = F.col(toks_col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.xxhash64(*[F.get(toks, i + j) for j in range(n)]),
        )
    )


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 32, shingle_n: int = 3,
) -> DataFrame:
    """(id, sig: array<long>) — minhash via min over a derived hash
    family.

    Each shingle is hashed exactly once, straight from its tokens
    (_gram_hashes — no gram string built); the i-th family member is
    xxhash64 over that 8-byte long + the seed — constant-time re-mixing
    instead of num_hashes full string scans per shingle (the string
    hashing was the dominant CPU of the whole candidate pipeline: ~32
    O(len) scans per shingle).

    One explode + one groupBy with num_hashes min() partial aggregates —
    map-side combine keeps the shuffle at |docs| rows, and the min aggs
    stay inside whole-stage codegen. A zero-shuffle per-row variant
    (higher-order aggregate with a zip_with running min) was measured
    ~6x SLOWER end-to-end at sf0.1: lambda functions are interpreted
    per element, while this explode/agg pipeline is codegen'd — the
    shuffle it saves is |docs| rows of 32 longs, which is noise."""
    sh = hashed_shingles(docs, text_col, id_col, shingle_n)
    aggs = [
        F.min(F.xxhash64(F.col("_h"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy("id").agg(*aggs)
    return sig.select("id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"))


def minhash_signatures_md5(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 32, shingle_n: int = 3,
) -> DataFrame:
    """(id, sig: array<long>) — minhash whose base hash is the first 32
    bits of md5(shingle string), family member i =
    ((2i+1)·h + 1000003·i + 12345) mod 4294967311 (prime > 2^32).

    Exists so the whole signature — shingling, hashing, the affine
    family, the min aggregation — is reproducible in an external
    ANSI-SQL engine (the DuckDB oracle for q_minhash_md5): md5 +
    hex-substring gives the base hash, and every affine product stays
    under 2^39, far inside signed-64 range in any engine. The engine
    default stays minhash_signatures (token-direct multi-arg xxhash64 —
    no gram string is ever built), which is several times cheaper but
    not expressible outside Spark. Same uniformity guarantees; only the
    hash family differs."""
    sh = shingles(docs, text_col, id_col, shingle_n)
    h32 = F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long")
    hs = sh.select("id", h32.alias("_h"))
    aggs = [
        F.min(
            (F.lit(2 * i + 1) * F.col("_h") + F.lit(1000003 * i + 12345))
            % F.lit(4294967311)
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = hs.groupBy("id").agg(*aggs)
    return sig.select("id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"))


def _band_buckets(
    signatures: DataFrame, bands: int, rows_per_band: int
) -> DataFrame:
    """(id, band, bucket) — one row per (doc, band). Band hash = one
    multi-arg xxhash64 over the band's signature elements + the band id
    (hash chaining, no per-band string render)."""
    return signatures.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.xxhash64(
                        *[
                            F.col("sig")[i * rows_per_band + j]
                            for j in range(rows_per_band)
                        ],
                        F.lit(i),
                    ).alias("bucket"),
                )
                for i in range(bands)
            ])
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")


_CAP_OVERSAMPLE = 2
_CAP_RANK_MOD = 1 << 20
# Floor on the gate's EXPECTED survivor count: the Chernoff argument
# below ("< max_bucket survivors vanishingly unlikely") needs the
# expectation comfortably above max_bucket in absolute terms, which
# _CAP_OVERSAMPLE×max_bucket alone only gives at max_bucket ≳ 100. For
# smaller caps the keep-threshold targets _CAP_MIN_EXPECT survivors
# instead (P[Binom(E=200) < 100] < e^-25); buckets at or under the
# target pass whole, so the aggregate row stays bounded by ~max(2×
# max_bucket, _CAP_MIN_EXPECT) either way.
_CAP_MIN_EXPECT = 200


def _gate_oversized_buckets(
    b: DataFrame, max_bucket: int, distinct_ids: bool = False,
    share_scan: bool = False,
) -> DataFrame:
    """Pre-aggregation bound for LSH bucket caps: census the (band,
    bucket) sizes (a partial-aggregable count — map-side combined), then
    drop members of oversized buckets by deterministic hash rank BEFORE
    any collect_list/collect_set, keeping ~_CAP_OVERSAMPLE × max_bucket
    survivors in expectation, never fewer than max_bucket except with
    vanishing probability (Chernoff; see _CAP_MIN_EXPECT for the
    small-cap floor). The exact final cap is still the slice after
    aggregation.

    distinct_ids: census with count(DISTINCT id) instead of count(*).
    Required whenever the input can carry the same id several times per
    (band, bucket) — e.g. merging overlapping index deltas. The keep
    decision is a pure function of (id, band, bucket), so an id's copies
    survive or drop together; with a raw count(*) census the duplicates
    would inflate _n and each DISTINCT id would survive with probability
    target/_n — the expected distinct survivors would fall below
    max_bucket and in-cap ids would be silently dropped.

    Without this gate the cap sliced AFTER materializing the full member
    array: one 10^7-member near-dup family (post-exact-dedup boilerplate)
    would build an ~80 MB aggregate row per band before the cap applied.
    With it no aggregate row exceeds ~2-3× max_bucket members no matter
    how degenerate the bucket. Buckets at or under max_bucket pass
    through UNTOUCHED — results change only where the cap was already
    truncating, and stay deterministic (hash rank is a pure function of
    (id, band, bucket), independent of partitioning).

    Cost: one extra small shuffle of (band, bucket, count) partials and a
    broadcast of the oversized-bucket census (|census| = degenerate
    buckets only — near-empty in a healthy corpus).

    share_scan: route b through ONE explicit exchange that both the
    census and the gate probe consume (ReusedExchange), so b's lineage
    is computed exactly once. Without it the census subtree recomputes
    b in full — for the minhash paths that means re-shingling and
    re-hashing the whole corpus (measured 0.89 s vs 0.53 s ungated at
    sf0.1; at 10^10 docs the recompute IS the job, while the extra
    exchange moves only ~30 B/row of (id, band, bucket)). The exchange
    hashes on (id, band) — NOT on the bucket — so a degenerate
    mega-bucket spreads uniformly instead of landing on one shuffle
    partition; the census still partial-aggregates map-side, and the
    post-gate members shuffle carries only survivors, exactly as
    before. Off by default: callers whose b is a cheap scan (index
    delta explode) would pay a full-row shuffle to save a re-scan."""
    if share_scan:
        b = b.repartition(F.xxhash64("id", "band"))
    # count(id), not count(*): id is never null here (bucket rows come
    # from signatures / index explodes), and referencing it keeps the
    # census subtree's column set identical to the probe's — otherwise
    # pruning drops id below the census, the two shared-scan exchanges
    # canonicalize differently, and ReuseExchange never fires.
    size = F.countDistinct("id") if distinct_ids else F.count("id")
    census = (
        b.groupBy("band", "bucket")
        .agg(size.alias("_n"))
        .filter(F.col("_n") > max_bucket)
    )
    target = max(max_bucket * _CAP_OVERSAMPLE, _CAP_MIN_EXPECT)
    # thresh may exceed _CAP_RANK_MOD when max_bucket < _n ≤ target —
    # the pmod comparison then keeps every row (gate is a no-op for that
    # bucket; the bucket is ≤ target rows, so still bounded)
    thresh = F.floor(
        F.lit(float(target * _CAP_RANK_MOD)) / F.col("_n")
    ).cast("long")
    gated = b.join(F.broadcast(census), ["band", "bucket"], "left")
    keep = F.col("_n").isNull() | (
        F.pmod(F.xxhash64("id", "band", "bucket"), F.lit(_CAP_RANK_MOD)) < thresh
    )
    return gated.filter(keep).drop("_n")


def _pairs_from_members(members: DataFrame) -> DataFrame:
    """(band, bucket, ids sorted array) → distinct (id_a, id_b), id_a <
    id_b — pairs generated JVM-side inside the row (nested transform over
    the member array), no self-join."""
    pair_arr = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice("ids", i + 2, F.greatest(F.size("ids") - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        members.filter(F.size("ids") >= 2)
        .select(F.explode(pair_arr).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def minhash_lsh_candidates(
    signatures: DataFrame, bands: int = 8, rows_per_band: int = 4,
    max_bucket: int = 1000,
) -> DataFrame:
    """(id_a, id_b) candidate near-dup pairs, id_a < id_b.

    Band hash = one multi-arg xxhash64 over the band's signature
    elements + the band id (hash chaining — no per-band string render:
    the previous cast-to-string + array_join built and hashed a ~90-char
    string per band per doc; measured −26% end-to-end at sf0.1). Docs
    sharing any band bucket become candidates. max_bucket caps
    degenerate buckets (e.g. empty docs) so a mega-cluster can't produce
    O(n^2) pairs — capped pairs are logged by the caller, not silently
    ok'd."""
    b = _band_buckets(signatures, bands, rows_per_band)
    # ONE groupBy per (band,bucket), then pairs generated JVM-side inside
    # the row (nested transform over the sorted, capped member array) —
    # replaces the previous window-cap + self-join + distinct chain:
    # 2 shuffles instead of 3, no per-bucket sort pass, and the self-join
    # no longer recomputes the band explosion for both sides. Oversized
    # buckets are hash-rank pre-gated BEFORE the collect_list
    # (_gate_oversized_buckets) so the aggregate row itself is bounded;
    # the slice is the exact final cap.
    members = _gate_oversized_buckets(
        b, max_bucket, share_scan=True
    ).groupBy("band", "bucket").agg(
        F.slice(F.sort_array(F.collect_list("id")), 1, max_bucket).alias("ids")
    )
    return _pairs_from_members(members)


def build_lsh_index(
    signatures: DataFrame, bands: int = 8, rows_per_band: int = 4,
    max_bucket: int = 1000,
) -> DataFrame:
    """Corpus LSH band index: (band, bucket, ids sorted array), singleton
    buckets INCLUDED (a later batch must be able to match a bucket's lone
    inhabitant).

    This is the incremental complement to minhash_lsh_candidates: build
    once over the corpus, persist (at 10^10-doc scale as a SnapshotStore
    bucketed table keyed by (band, bucket) — the same delta-log
    discipline as the bloom bitmaps and the exact seen index), then
    near-dup-check each incoming batch with probe_lsh_index WITHOUT
    re-scanning or re-signing the corpus. The reference has no
    incremental path — its dedup is a full drop_duplicates per load
    (load_input.py:294).

    max_bucket caps degenerate buckets at build time (hash-rank
    pre-gated before the aggregation, then sliced — the same rule as the
    batch path); the cap is per-delta — see merge_lsh_index."""
    b = _band_buckets(signatures, bands, rows_per_band)
    return _gate_oversized_buckets(
        b, max_bucket, share_scan=True
    ).groupBy("band", "bucket").agg(
        F.slice(F.sort_array(F.collect_list("id")), 1, max_bucket).alias("ids")
    )


def merge_lsh_index(deltas: DataFrame, max_bucket: int = 1000) -> DataFrame:
    """OR-merge LSH index deltas (union of build_lsh_index outputs) into
    one index: per (band, bucket) the sorted distinct union of member
    ids, re-capped. Same contract as seen.merge_bloom /
    merge_exact_index: appending a batch = union old index with the
    batch's delta and merge — cost ∝ |touched buckets|, never a corpus
    rescan. A bucket touched by MANY deltas could otherwise accumulate
    cap × n_deltas members into one aggregate row, so the same hash-rank
    pre-gate bounds the merge aggregation — with a count(DISTINCT id)
    census (distinct_ids=True): exploded delta rows repeat ids, and a
    raw row count would overstate bucket sizes and make the gate drop
    in-cap distinct members (the keep decision itself is set-stable —
    an id's copies hash identically, so they survive or drop together;
    only the census needed the distinct count)."""
    exploded = deltas.select("band", "bucket", F.explode("ids").alias("id"))
    return (
        _gate_oversized_buckets(exploded, max_bucket, distinct_ids=True)
        .groupBy("band", "bucket")
        .agg(F.slice(F.sort_array(F.collect_set("id")), 1, max_bucket).alias("ids"))
    )


def index_candidates(index: DataFrame) -> DataFrame:
    """Distinct corpus-internal candidate pairs from a prebuilt index —
    identical result to minhash_lsh_candidates over the corpus the index
    was built from (same cap rule), without touching signatures again."""
    return _pairs_from_members(index)


def probe_lsh_index(
    new_signatures: DataFrame, index: DataFrame, bands: int = 8,
    rows_per_band: int = 4, max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs touching the NEW batch: new×corpus pairs
    via an equi-join of the batch's (band, bucket) rows against the
    prebuilt index, plus new×new pairs via the ordinary batch path over
    the new signatures alone. (id_a, id_b) ordered by least/greatest —
    the same natural ordering as the sorted-array batch path, so results
    union cleanly with index_candidates. Assumes batch ids are disjoint
    from corpus ids (same contract as every dedup id column here).

    Scale: the join shuffles ONLY the batch's band rows (bands × |batch|);
    with the index stored bucketed by (band, bucket) the corpus side
    scans in place — the whole probe is one probe-side exchange. The
    within-batch term is the standalone capped batch pipeline.

    Cap semantics are per-phase: corpus buckets were capped at
    build/merge time, the batch term is capped here — an incremental
    index cannot retroactively re-rank a bucket it already capped."""
    nb = _band_buckets(new_signatures, bands, rows_per_band)
    cross = (
        nb.join(index, ["band", "bucket"])
        .select(F.col("id").alias("new_id"), F.explode("ids").alias("corpus_id"))
        .select(
            F.least("new_id", "corpus_id").alias("id_a"),
            F.greatest("new_id", "corpus_id").alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .distinct()
    )
    within = minhash_lsh_candidates(new_signatures, bands, rows_per_band, max_bucket)
    return cross.unionByName(within).distinct()


def ngram_jaccard_pairs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n: int = 1, threshold: float = 0.5, max_df: int | None = 100_000,
) -> DataFrame:
    """Exact n-gram Jaccard over all pairs sharing ≥1 surviving shingle.

    (id_a, id_b, jaccard) — the verification step after LSH, or a full
    exact pass at small scale.

    max_df caps hot shingles: a shingle appearing in more than max_df
    docs (a stopword, boilerplate) produces O(df^2) pairs in the
    inverted-index self-join — one degenerate shingle at corpus scale is
    the whole shuffle. Shingles above the cap are dropped from the
    REPRESENTATION (index and sizes both), so the returned jaccard is
    exact over the df-filtered shingle universe — self-consistent and
    oracle-expressible, never a silently wrong count. Pairs similar ONLY
    through dropped mega-df shingles are not reported (by design — such
    shingles carry no dedup signal). max_df=None disables the cap.

    Plan: shingles are keyed by xxhash64 the moment they exist — the
    string never rides an exchange; every shuffle and the self-join
    probe carry 8-byte longs. The self-join + pair aggregation stays
    (whole-stage codegen): the minhash band path's in-row pair
    generation was measured ~60% SLOWER here at sf0.1 — higher-order
    lambdas evaluate interpreted per element, which loses to a
    codegen'd join once per-key member lists are large (band buckets
    are small; shingle dfs are not)."""
    sh = shingles(docs, text_col, id_col, n).select(
        "id", F.xxhash64("shingle").alias("_sk")
    )
    if max_df is not None:
        # hot list is tiny BY CONSTRUCTION (few shingles exceed the cap)
        # → broadcast anti-join; the df agg shrinks map-side to one row
        # per distinct shingle per mapper
        hot = (
            sh.groupBy("_sk")
            .count()
            .filter(F.col("count") > max_df)
            .select("_sk")
        )
        sh = sh.join(F.broadcast(hot), "_sk", "left_anti")
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "_sk")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash long) — 64-bit simhash: per-token xxhash64, bit votes
    summed per position, sign → bit. 64 sum() aggregates in ONE
    groupBy(id) pass — partial (map-side) aggregation keeps the shuffle
    at |docs| rows × 64 longs, no per-token arrays materialized.

    The per-position vote is BRANCH-FREE: sum the raw bit (shift+and,
    0/1) plus one shared token count, and recover the ±1-vote sign at
    the end via 2·ones > n (identical bits: vote = 2·ones − n, and the
    tie 2·ones = n maps to bit 0 either way). Dropping the per-token
    per-bit conditional from the pre-aggregation expressions measured
    −27% end-to-end at sf0.1 (1.09 s → 0.80 s) with zero value changes."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(norm_tokens(F.col(text_col))).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    vote_aggs = [
        F.sum(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1))).alias(f"b{i}")
        for i in range(64)
    ] + [F.count(F.lit(1)).alias("_n")]
    summed = toks.groupBy("id").agg(*vote_aggs)
    sig = None
    for i in range(64):
        bit = F.when(
            F.col(f"b{i}") * 2 > F.col("_n"), F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        sig = bit if sig is None else sig + bit
    return summed.select("id", sig.alias("simhash"))


def simhash_md5(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash_hi, simhash_lo) — the same bit-vote simhash as
    simhash(), but the per-token hash is the first 64 bits of md5,
    carried as two unsigned 32-bit halves.

    Exists so the signature is reproducible bit-for-bit by an external
    ANSI-SQL engine (md5 + hex-substring + integer shifts — the DuckDB
    oracle for q_simhash_md5); the engine default stays simhash()'s
    single multi-arg xxhash64, which is ~3× cheaper per token but not
    expressible outside Spark. The two halves dodge signed-64 overflow
    in engines whose BIGINT shift/sum semantics differ at bit 63; a
    caller who wants one long can pack shiftleft(hi,32)|lo."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(norm_tokens(F.col(text_col))).alias("tok"),
    ).withColumn("_md5", F.md5("tok"))
    halves = toks.select(
        "id",
        F.conv(F.substring("_md5", 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring("_md5", 9, 8), 16, 10).cast("long").alias("lo"),
    )
    vote_aggs = [
        F.sum(
            F.when(F.shiftright(F.col(h), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"{h}{i}")
        for h in ("hi", "lo")
        for i in range(32)
    ]
    summed = halves.groupBy("id").agg(*vote_aggs)

    def pack(h: str):
        sig = F.lit(0).cast("long")
        for i in range(32):
            sig = sig + F.when(
                F.col(f"{h}{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long"))
        return sig

    return summed.select(
        "id", pack("hi").alias("simhash_hi"), pack("lo").alias("simhash_lo")
    )


def simhash_near_dups(sig: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(id_a, id_b, hamming) — block on 16-bit quarters (a pair within
    hamming ≤3 shares at least one identical quarter by pigeonhole),
    verify with popcount via bin()."""
    quarters = sig.select(
        "id", "simhash",
        F.explode(
            F.array(*[
                F.struct(F.lit(q).alias("q"),
                         F.shiftright("simhash", q * 16).bitwiseAND(F.lit(0xFFFF)).alias("block"))
                for q in range(4)
            ])
        ).alias("qb"),
    ).select("id", "simhash", "qb.q", "qb.block")
    ham = F.length(F.regexp_replace(F.bin(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))), "0", ""))
    pairs = (
        quarters.alias("a")
        .join(quarters.alias("b"), ["q", "block"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs


def neardup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(doc_id, cluster_id) for every doc appearing in `pairs`:
    cluster_id = MIN id reachable in the undirected pair graph (connected
    components). The step after candidate generation + verification in a
    dedup pipeline — pairs alone can't drive a keep/drop decision when
    duplicates chain (A~B, B~C: keeping one doc per PAIR keeps two of the
    three).

    Hash-min label propagation, DataFrame-only: each round every node
    takes min(own label, neighbours' labels); converges in O(graph
    diameter) rounds — near-dup components are quasi-cliques (every
    member pairs with most others), so diameter is 1-3 in practice.
    Per round: one join (labels shuffled by id) + one groupBy min with
    map-side combine; lineage is cut per round with localCheckpoint (an
    iterative plan otherwise grows by two shuffles per round and
    re-executes from the source on every action). Driver work per round
    is one scalar count — no collect of data-scale frames.

    Raises RuntimeError if max_iter rounds don't converge (a correctness
    guarantee: a truncated propagation would silently mislabel — the
    caller can raise max_iter for a pathological chain-shaped graph).
    Reference analog: none (the reference dedupes exact-only,
    scripts/cleaner/record/clean.py:41-60); this is the builder-spec
    near-dup extension."""
    e = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    edges = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()
    labels = (
        edges.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges.v == labels.id)
            .groupBy("u")
            .agg(F.min("label").alias("nmin"))
        )
        updated = (
            labels.join(neigh, labels.id == neigh.u, "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias("label"),
                (F.col("nmin") < F.col("label")).alias("_chg"),
            )
        ).localCheckpoint()
        changed = updated.filter(F.col("_chg")).count()
        labels = updated.drop("_chg")
        if changed == 0:
            edges.unpersist()
            return labels.select(
                F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
            )
    edges.unpersist()
    raise RuntimeError(f"neardup_clusters did not converge in {max_iter} rounds")


def neardup_keep(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """The final keep/drop decision of the dedup pipeline: keep exactly
    ONE doc per near-dup cluster (the cluster representative =
    cluster_id = min member id, deterministic) plus every unclustered
    doc. Composition: candidate pairs → neardup_clusters → neardup_keep.

    Plan shape: one broadcast-able join against the clusters frame
    (|clusters| = docs that appear in any pair — at corpus scale the
    duplicate fraction, not the corpus) — docs never self-join."""
    drop = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias("_drop_id")
    )
    return docs.join(
        drop, docs[id_col] == F.col("_drop_id"), "left_anti"
    )


def neardup_keep_best(
    docs: DataFrame,
    clusters: DataFrame,
    prefer: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """neardup_keep, but the representative per cluster is the member
    with the HIGHEST `prefer` column value (a numeric score:
    text.quality_score, token count, graph.pagerank rank), id ascending
    on ties — what a real training-data pipeline wants: near-dup groups
    keep their best copy, not their first.

    Plan shape: the clusters frame (duplicate fraction of the corpus,
    never the whole corpus) joins docs once to pick up the preference
    column, then ONE min_by hash aggregate per cluster (struct(-pref,
    id) ordering encodes "pref desc, id asc" — map-side combined, no
    window sort), and one anti-join back. Docs never self-join; both
    joins broadcast when the duplicate set is small. Reference analog:
    none (same builder-spec extension family as neardup_clusters)."""
    member_pref = docs.select(
        F.col(id_col).alias("_m_id"), F.col(prefer).cast("double").alias("_pref")
    )
    members = clusters.join(
        member_pref, clusters.doc_id == member_pref._m_id
    ).select("_m_id", "cluster_id", "_pref")
    best = members.groupBy("cluster_id").agg(
        F.min_by("_m_id", F.struct((-F.col("_pref")).alias("p"), F.col("_m_id").alias("i"))).alias("_keep_id")
    )
    drop = (
        clusters.join(best, "cluster_id")
        .filter(F.col("doc_id") != F.col("_keep_id"))
        .select(F.col("doc_id").alias("_drop_id"))
    )
    return docs.join(drop, docs[id_col] == F.col("_drop_id"), "left_anti")


def _unit_vectors(vectors: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(_id, _unit) — pre-normalize ONCE per vector; computing cosine per
    pair would re-derive both norms n^2 times. The norm is materialized
    as a column BEFORE the element-wise division: referencing the
    O(dim) norm aggregate inside the transform lambda would re-reduce
    the whole array per element — O(dim²) per vector (the same
    lambda-invariant re-evaluation trap as dedup.shingles)."""
    from . import similarity

    return (
        vectors.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_v"),
            similarity._norm(F.col(vec_col)).alias("_nrm"),
        )
        .select(
            "_id",
            F.transform("_v", lambda x: x / F.col("_nrm")).alias("_unit"),
        )
    )


def _grid_projection(unit_col, d: int, seed: int):
    """Dot with the d-th deterministic pseudo-random UNIT vector (xxhash64
    coefficients, normalized) — model-free, identical on every executor.
    The direction's length tracks each row's vector (F.size) so mixed or
    unknown dimensionality needs no config."""
    raw = F.transform(
        F.sequence(F.lit(0), F.size(unit_col) - 1),
        lambda i: F.pmod(F.xxhash64(F.lit(seed), F.lit(d), i), F.lit(10_000)).cast(
            "double"
        )
        / 10_000.0
        - 0.5,
    )
    # bind the generated direction once via a 1-element transform: the
    # dot product and the normalization both reference it, and two
    # top-level references would generate the xxhash direction twice
    return F.get(
        F.transform(
            F.array(raw),
            lambda r: F.aggregate(
                F.zip_with(unit_col, r, lambda x, c: x * c),
                F.lit(0.0),
                lambda s, v: s + v,
            )
            / F.sqrt(
                F.aggregate(
                    F.transform(r, lambda x: x * x),
                    F.lit(0.0),
                    lambda s, v: s + v,
                )
            ),
        ),
        0,
    )


def embedding_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_projections: int = 2,
    seed: int = 271,
    method: str = "grid",
) -> DataFrame:
    """(id_a, id_b, cosine) — EXACT embedding-cosine near-duplicate pairs
    with id_a < id_b and cosine >= threshold.

    Default path ('grid') is bucketed with a completeness GUARANTEE — it
    returns exactly the all-pairs answer without an all-pairs join:
    unit vectors with cosine >= t are within chord r = sqrt(2-2t), and by
    Cauchy-Schwarz their projections onto any unit vector differ by <= r
    — so with cell width r, qualifying pairs' cell ids differ by at most
    1 per dimension. The join is ONE-SIDED neighbor expansion: the probe
    side carries each vector's own cell once, the build side emits all
    3^D neighbor cells (cell_d + {-1,0,1}), and a qualifying ordered
    pair therefore matches on EXACTLY one bucket key — no
    dropDuplicates, no post-join dedup shuffle hauling vector payloads
    (the earlier two-sided 2^D corner scheme matched a pair on up to
    2^D keys and paid a full-width dedup exchange). Candidates =
    bucket equi-join (shuffle hash/SMJ — Catalyst's choice), verified
    with exact cosine. Pruning power grows with the threshold (r
    shrinks); at low thresholds the cells are wide and the join degrades
    gracefully toward dense buckets while STAYING an equi-join — never
    a BNLJ/cartesian.

    method='exact' keeps the theta-join baseline (oracle/debug only —
    O(n^2) at corpus scale)."""
    from . import similarity

    unit = _unit_vectors(vectors, id_col, vec_col)
    sim = similarity._dot(F.col("_va"), F.col("_vb"))

    if method == "exact":
        a = unit.select(F.col("_id").alias("id_a"), F.col("_unit").alias("_va"))
        b = unit.select(F.col("_id").alias("id_b"), F.col("_unit").alias("_vb"))
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
        return (
            pairs.select("id_a", "id_b", sim.alias("cosine"))
            .filter(F.col("cosine") >= threshold)
        )

    # cell width: chord bound, slightly inflated so a pair at EXACTLY the
    # threshold can't straddle two non-adjacent cells through float round
    r = max((2.0 - 2.0 * threshold), 0.0) ** 0.5 * (1.0 + 1e-9) + 1e-12
    # cell ids materialized as columns BEFORE the corner expansion: all
    # 2^D corner expressions reference every cell_d, and inline
    # projections would re-run the O(dim) interpreted projection once
    # per corner instead of once per vector
    gridded = unit.select(
        "_id",
        "_unit",
        *[
            F.floor(_grid_projection(F.col("_unit"), d, seed) / F.lit(r))
            .cast("long")
            .alias(f"_c{d}")
            for d in range(n_projections)
        ],
    )
    # probe side: own cell, once; build side: all 3^D neighbor cells —
    # an ordered qualifying pair shares exactly ONE key, so the join
    # output needs no dedup
    import itertools

    own = F.concat_ws(
        ",", *[F.col(f"_c{d}").cast("string") for d in range(n_projections)]
    )
    neighbors = F.array(*[
        F.concat_ws(
            ",", *[(F.col(f"_c{d}") + off[d]).cast("string")
                   for d in range(n_projections)]
        )
        for off in itertools.product((-1, 0, 1), repeat=n_projections)
    ])
    a = gridded.select(
        F.col("_id").alias("id_a"), F.col("_unit").alias("_va"),
        own.alias("_bucket"),
    )
    b = gridded.select(
        F.col("_id").alias("id_b"), F.col("_unit").alias("_vb"),
        F.explode(neighbors).alias("_bucket"),
    )
    cand = (
        a.join(b, "_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_va", "_vb")
    )
    return (
        cand.select("id_a", "id_b", sim.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def dedup_lines(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """CCNet-style corpus-wide line deduplication: every non-empty line
    keeps exactly its FIRST occurrence (ordered by (doc id, position));
    later repeats — boilerplate, cookie banners, navigation chrome —
    are dropped and each document's text is rebuilt from its surviving
    lines in original order. Empty/whitespace lines are dropped
    outright. Docs whose every line is dropped survive with empty text.

    Plan: explode lines with position → groupBy(line key).min(struct
    (id, pos)) — PARTIAL aggregation makes the hot-line skew harmless
    (a line repeated 10^8 times map-side-combines to one row per task,
    where a row_number window over partitionBy(line) would sort the
    whole hot partition on one reducer) → equi-join keepers back →
    groupBy(id) ordered reassembly. Two line-keyed exchanges + one
    id-keyed; the line key is xxhash64(trimmed line) so the wide text
    never rides the aggregation exchange."""
    lines = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("pos", "line"),
    ).withColumn("line", F.trim("line")).filter(F.col("line") != "")
    lines = lines.withColumn("lk", F.xxhash64("line"))
    keepers = lines.groupBy("lk").agg(
        F.min(F.struct("id", "pos")).alias("first")
    ).select("lk", F.col("first.id").alias("id"), F.col("first.pos").alias("pos"))
    kept = lines.join(keepers, ["lk", "id", "pos"])
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("_new_text")
    )
    out = docs.join(rebuilt, docs[id_col] == rebuilt["id"], "left").drop("id")
    cols = [
        F.coalesce(F.col("_new_text"), F.lit("")).alias(c) if c == text_col else F.col(c)
        for c in docs.columns
    ]
    return out.select(*cols)


# ---------------------------------------------------------------------------
# cross-document duplicated-passage detection (window dedup)
# ---------------------------------------------------------------------------

def passage_windows(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    stride: int = 4,
) -> DataFrame:
    """(id, pos, wk): rolling k-token window keys per document. pos is
    the 1-based token index of the window start (step = stride); wk is
    md5 of the space-joined window — engine-portable so the DuckDB
    oracle recomputes keys bit-for-bit. Docs shorter than k tokens emit
    no windows. Map + explode, no shuffle; the fan-out is
    ~tokens/stride rows per document, so partitions stay balanced
    without a repartition."""
    if k <= 0 or stride <= 0:
        raise ValueError(f"k and stride must be > 0: k={k} stride={stride}")
    # materialize the token array ONCE per row before the window
    # transform: referencing the regex-split expression inside the
    # lambda would re-tokenize the document for every window (O(windows
    # x tokens) regex work); CollapseProject keeps the split separate
    # because the reference is non-cheap and multiply-used
    base = docs.select(
        F.col(id_col).alias("id"),
        F.filter(norm_tokens(F.col(text_col)), lambda t: t != "").alias("_toks"),
    )
    toks = F.col("_toks")
    n = F.size(toks)
    starts = F.when(
        n >= k, F.sequence(F.lit(1), n - F.lit(k) + 1, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    wins = F.transform(
        starts,
        lambda i: F.struct(
            i.alias("pos"),
            F.md5(F.array_join(F.slice(toks, i, k), " ")).alias("wk"),
        ),
    )
    return base.select("id", F.explode(wins).alias("w")).select(
        "id", F.col("w.pos").alias("pos"), F.col("w.wk").alias("wk")
    )


def duplicate_passages(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    stride: int = 4,
    within_doc: bool = False,
) -> DataFrame:
    """Duplicated-passage spans: for every document, the merged token
    ranges [span_start, span_end) (1-based, end exclusive) covered by
    k-token windows that also occur in ANOTHER document (within_doc=True
    additionally flags windows repeated inside one document). This is
    the passage-level complement to dedup_lines (exact lines) and
    MinHash (whole-doc near-dup): it catches copied paragraphs embedded
    in otherwise-unique pages, the public exact-substring-dedup recipe
    (Lee et al. 2022) at window granularity.

    Plan shape at 100 TB: windows explode map-side (~tokens/stride
    rows); duplicate keys come from groupBy(wk).agg(min(id), max(id)
    [, count]) — fully partial-aggregable, so a boilerplate window
    repeated 10^9 times combines to one row per map task and NEVER
    concentrates on one reducer (this is why the cross-doc test is
    min!=max, not countDistinct, whose expand would double the
    exchange); then one equi-semi-join back on wk and a per-doc
    gaps-and-islands merge (window over (id, pos) — bounded by windows
    per doc). Three exchanges total, every one on a well-distributed
    key. Output: (id_col, span_start, span_end, n_windows)."""
    wins = passage_windows(docs, text_col, id_col, k=k, stride=stride)
    aggs = [F.min("id").alias("_min_id"), F.max("id").alias("_max_id")]
    if within_doc:
        aggs.append(F.count("*").alias("_n"))
    keys = wins.groupBy("wk").agg(*aggs)
    cond = F.col("_min_id") != F.col("_max_id")
    if within_doc:
        cond = cond | (F.col("_n") > 1)
    dup = keys.filter(cond).select("wk")
    hits = wins.join(dup, "wk", "semi")
    w = Window.partitionBy("id").orderBy("pos")
    prev_end = F.max(F.col("pos") + F.lit(k)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = hits.withColumn(
        "_new", F.when(F.col("pos") > F.coalesce(prev_end, F.lit(-1)), 1).otherwise(0)
    ).withColumn("_island", F.sum("_new").over(w))
    return (
        islands.groupBy("id", "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k)).alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .select(
            F.col("id").alias(id_col), "span_start", "span_end", "n_windows"
        )
    )


def edit_distance_verify(
    pairs: DataFrame,
    docs: DataFrame,
    max_dist: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact bounded edit-distance verification for candidate pairs:
    (id_a, id_b) → (id_a, id_b, len_a, len_b, dist, is_dup).

    The verification stage that runs AFTER candidate generation (minhash
    bands / simhash quarters / embedding grid): candidates are ≪ corpus,
    so the cost profile is two hash joins on the id plus one bounded
    Levenshtein per pair. `dist` is -1 when the true distance exceeds
    max_dist — Spark's threshold form runs the banded O(max_dist·n) DP,
    not the full O(n·m) table — and pairs whose LENGTH GAP alone proves
    dist > max_dist short-circuit to -1 without running the DP at all
    (|len_a − len_b| is a lower bound on edit distance). is_dup ⇔
    dist ∈ [0, max_dist]. A NULL text on either side yields dist=-1,
    is_dup=false, len=-1 — never a NULL verdict.

    Length prefilter + bounded DP keep the stage safe against the
    adversarial case (two long unrelated docs in one candidate bucket);
    at 100 TB the joins broadcast the pair list when it is small or
    hash-partition on id when it is not — either way the corpus text is
    touched only for ids that appear in a pair."""
    a = docs.select(
        F.col(id_col).alias("id_a"), F.col(text_col).alias("_ta")
    )
    b = docs.select(
        F.col(id_col).alias("id_b"), F.col(text_col).alias("_tb")
    )
    j = pairs.select("id_a", "id_b").join(a, "id_a").join(b, "id_b")
    # NULL text (or an id missing from docs after an outer variant) must
    # not leak NULL into dist/is_dup: the contract is dist=-1 /
    # is_dup=false whenever the pair cannot be verified.
    len_a = F.coalesce(F.length("_ta"), F.lit(-1))
    len_b = F.coalesce(F.length("_tb"), F.lit(-1))
    dist = F.when(
        F.col("_ta").isNull() | F.col("_tb").isNull(), F.lit(-1)
    ).when(
        F.abs(len_a - len_b) > max_dist, F.lit(-1)
    ).otherwise(F.levenshtein("_ta", "_tb", max_dist))
    return j.select(
        "id_a",
        "id_b",
        len_a.alias("len_a"),
        len_b.alias("len_b"),
        dist.alias("dist"),
        (dist >= 0).alias("is_dup"),
    )


def strip_boilerplate(
    docs: DataFrame,
    group_col: str = "source",
    min_df: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group boilerplate removal: a line that appears on ≥ min_df
    DISTINCT documents of the same group (host / source) is chrome —
    cookie banners, navigation, footers — and is dropped from EVERY
    document of that group (unlike dedup_lines, which keeps the first
    occurrence corpus-wide); rarer lines survive byte-identical (the
    chrome KEY is the trimmed line — indentation variants of one banner
    collapse — but surviving lines keep their original whitespace, so
    the op is an identity on chrome-free documents). Blank lines are
    never chrome and always survive. A doc whose every line is
    boilerplate survives with empty text.

    Plan: lines keyed by xxhash64 so wide text never rides an exchange;
    per-(group, line) doc-frequency via two PARTIAL-aggregable stages
    (distinct (group, lk, id) then count — a line on 10^8 pages
    map-side-combines instead of sorting one hot partition) → broadcast-
    able anti-join of the chrome keys → per-doc ordered reassembly."""
    lines = docs.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("pos", "line"),
    )
    # chrome key = fully whitespace-trimmed line (regexp, not F.trim —
    # trim strips spaces only, and a tab-indented banner must collapse
    # onto the same key as its space-indented variants)
    _tl = F.regexp_replace("line", r"^\s+|\s+$", "")
    lines = lines.withColumn("lk", F.xxhash64(_tl))
    chrome = (
        lines.filter(_tl != F.lit(""))
        .select("grp", "lk", "id").distinct()
        .groupBy("grp", "lk").agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("grp", "lk")
    )
    kept = lines.join(chrome, ["grp", "lk"], "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("_new_text")
    )
    out = docs.join(rebuilt, docs[id_col] == rebuilt["id"], "left").drop("id")
    cols = [
        F.coalesce(F.col("_new_text"), F.lit("")).alias(c) if c == text_col else F.col(c)
        for c in docs.columns
    ]
    return out.select(*cols)
