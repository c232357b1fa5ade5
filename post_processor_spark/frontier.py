"""Frontier + per-host politeness scheduler (the north_rule core).

Reference analog being re-expressed: the getAllUrls crawl loop — a
directory of pending URLs, workers fetching pages, extracting <a>
outlinks, merging new URLs, restart until drained
(archived/utils/getAllUrls/master.py:10-18, getURLs.py:49-166) — plus its
round-robin work assignment (archived/Post-Processor/processor.py:798-827).

Spark-first design:
- frontier/seen/metrics are snapshot tables (state.SnapshotStore), one
  snapshot per generation → exact resume (north_rule).
- crawl ordering is an explicit deterministic sort key
  (priority, generation_discovered, seq, sub) — reproducing the
  reference's insertion-order processing (SURVEY.md §2.6 O3) as a defined
  contract instead of dict-iteration order.
- politeness: per-host budget B per generation + crawl-delay slots. The
  top-B-per-host selection is TWO-PHASE to stay balanced under skew
  (north_rule mega-domain salting): phase 1 ranks within
  (host, salt=pmod(url_hash, S)) shards and keeps ≤B per shard — any row
  in the global per-host top-B survives its shard's top-B — phase 2
  ranks the ≤B*S survivors per host. A mega-host's millions of pending
  rows are ranked in S balanced shards; only B*S rows reach the final
  per-host window. The per-generation budget B is the capped token
  bucket.
- fetch is simulated by joining scheduled URLs back to the documents
  corpus (sandbox has no network; the fetch stage is injectable — S11).
- not_before timestamps are deterministic: epoch(g) = BASE + g*B*delay,
  slot i → epoch(g) + i*delay. No wall clock in data.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from . import canon
from .seen import (
    build_bloom, build_exact_index, filter_unseen, merge_bloom,
    merge_exact_index,
)
from .state import SnapshotStore

# fixed, documented epoch for deterministic not_before timestamps
_BASE_EPOCH = 1_700_000_000  # 2023-11-14T22:13:20Z
DEFAULT_PRIORITY = 5

ORDER_COLS = ["priority", "generation", "seq", "sub"]

# Packed rank key: lexicographic (priority, generation) equals numeric
# order of (priority << 32 | generation) for the documented domain —
# both are non-negative ints (priority is a small scheduling class,
# generation a monotone counter), so the pack/unpack round-trip is exact.
# One long replaces two ints in every politeness sort + exchange row
# (UnsafeRow stores each field in an 8-byte slot, so this saves 8 bytes
# per row in the job's dominant shuffle) and collapses one comparator
# level out of the rank sort.
_PACKED_ORDER = ["_pg", "seq", "sub"]


def _pack_order(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "_pg", F.shiftleft(F.col("priority").cast("long"), 32) + F.col("generation")
    ).drop("priority", "generation")


def _unpack_order(df: DataFrame) -> DataFrame:
    return (
        df.withColumn("priority", F.shiftright(F.col("_pg"), 32).cast("int"))
        .withColumn(
            "generation",
            F.col("_pg").bitwiseAND(F.lit(0xFFFFFFFF)).cast("int"),
        )
        .drop("_pg")
    )


def canonicalize_candidates(df: DataFrame) -> DataFrame:
    """(url, priority, generation, seq, sub) → + canonical/host/hashes."""
    return canon.with_canonical(df, "url")


def dedupe_candidates(df: DataFrame) -> DataFrame:
    """First occurrence per url_hash in crawl order (P6 analog, exact,
    deterministic under parallelism).

    min_by hash aggregation, not a row_number window: a window needs a
    full sort within every hash partition; min_by is a partial-aggregating
    hash agg (map-side combine shrinks the shuffle to one row per distinct
    url per mapper). The crawl-order tuple is unique, so min_by is
    deterministic."""
    cols = df.columns
    key = F.struct(*[F.col(c) for c in ORDER_COLS])
    return (
        df.groupBy("url_hash")
        .agg(F.min_by(F.struct(*[F.col(c) for c in cols]), key).alias("_r"))
        .select("_r.*")
    )


def _host_from_canonical(canon_url):
    """Authority of a canon.with_canonical canonical URL: the canonical
    form embeds `host` verbatim between the first '://' (when present)
    and the next '/' or '?', so recovery is substring cuts — no re-parse.
    NOT total (a scheme-less URL with an empty authority, or one whose
    path embeds '://', recovers wrongly) — callers must delta-encode:
    compare recovered vs actual at encode time and carry the explicit
    host for the rare rows where they differ."""
    pos = F.locate("://", canon_url)
    after = F.when(pos > 0, F.substr(canon_url, pos + 3)).otherwise(canon_url)
    return F.substring_index(F.substring_index(after, "/", 1), "?", 1)


def _slim_encode(df: DataFrame) -> DataFrame:
    """Delta-encode url/host against canonical_url: both ride as NULL
    whenever recoverable (url equals its canonical form; host equals the
    canonical authority — the overwhelmingly common case). IDEMPOTENT
    (null in → null out), so encoded frames can flow through
    politeness_schedule's own encode unchanged. Decode is
    F.coalesce(url, canonical_url) / the _host_from_canonical coalesce.
    Applied BEFORE a .persist() this also slims the cache build — the
    columnar cache otherwise materializes three full string columns per
    row that the rank path never reads."""
    rec_host = _host_from_canonical(F.col("canonical_url"))
    return df.withColumn(
        "url",
        F.when(F.col("url") == F.col("canonical_url"), F.lit(None))
        .otherwise(F.col("url")),
    ).withColumn(
        "host",
        F.when(rec_host.eqNullSafe(F.col("host")), F.lit(None))
        .otherwise(F.col("host")),
    )


def _dedupe_candidates_slim(df: DataFrame) -> DataFrame:
    """dedupe_candidates specialised to canonicalized frames
    (_DEDUP_COLS): the exchange carries a DELTA-ENCODED payload — `url`
    and `host` ride as NULL whenever they are recoverable from
    canonical_url (the overwhelmingly common case: url differs from its
    canonical form only for fragment / userinfo / port / case variants)
    and host_hash is re-derived after the shuffle. Cuts dedupe exchange
    bytes ~40% on URL-shaped rows; the re-derivation is substring cuts +
    one xxhash64 — CPU-side work, which scales better than the
    DRAM-bandwidth-bound exchange it replaces (BENCH/BASELINE.md
    hardware calibrations: cpu 0.87 vs bandwidth 0.67 at 4->16 workers).
    Exact: the encode compares recovered vs actual per row, so any row
    where recovery would be wrong carries the explicit value."""
    rec_host = _host_from_canonical(F.col("canonical_url"))
    slim = _pack_order(
        df.select(
            "url_hash",
            F.when(F.col("url") == F.col("canonical_url"), F.lit(None))
            .otherwise(F.col("url"))
            .alias("_url_d"),
            "canonical_url",
            F.when(rec_host.eqNullSafe(F.col("host")), F.lit(None))
            .otherwise(F.col("host"))
            .alias("_host_d"),
            "priority", "generation", "seq", "sub",
        )
    )
    key = F.struct(*[F.col(c) for c in _PACKED_ORDER])
    payload = [c for c in slim.columns if c != "url_hash"]
    deduped = _unpack_order(
        slim.groupBy("url_hash")
        .agg(F.min_by(F.struct(*[F.col(c) for c in payload]), key).alias("_r"))
        .select("url_hash", "_r.*")
    )
    host = F.coalesce(
        F.col("_host_d"), _host_from_canonical(F.col("canonical_url"))
    )
    return deduped.select(
        F.coalesce(F.col("_url_d"), F.col("canonical_url")).alias("url"),
        "canonical_url",
        "url_hash",
        host.alias("host"),
        canon.host_hash(host).alias("host_hash"),
        "priority", "generation", "seq", "sub",
    )


def politeness_schedule(
    pending: DataFrame,
    generation: int,
    budget_per_host: int = 8,
    crawl_delay_sec: int = 1,
    salt_parts: int = 16,
    skew_threshold: int | None = None,
    host_delays: DataFrame | None = None,
    dedupe: bool = False,
) -> DataFrame:
    """Tag pending rows: the per-host top-B in crawl order get
    status='scheduled' + a not_before slot; the rest stay 'pending'.

    Skew-adaptive two-phase top-B: hosts with more pending rows than
    skew_threshold (detected with one cheap hash-agg count) go through a
    salted pre-rank that caps any single sort partition at ~threshold
    rows; everyone else gets a single per-host window. Sorting everything
    twice — the naive always-two-phase plan — costs a full extra sort of
    the 99% of rows that aren't skewed; always-one-phase serializes the
    mega-host in one task. The selection is EXACT either way (any global
    per-host top-B row is in its salt shard's top-B).

    Each branch is ranked SEPARATELY (a host lives entirely in one
    branch, so per-branch windows see every row of their hosts): ranking
    norm ∪ survivors in one window — the earlier plan — destroys the
    union's partitioning and re-exchanges the full norm payload a second
    time for nothing.

    dedupe=True fuses first-in-crawl-order url_hash dedupe (P6) INTO the
    politeness exchange: every duplicate of a url_hash shares its
    canonical_url, hence its host_hash AND its salt shard
    (salt = pmod(url_hash, S)), so a dedupe window partitioned by
    (host_hash[, salt], url_hash) is exact under the same explicit
    repartition the rank window uses — the input payload crosses ONE
    exchange total. The standalone alternative (dedupe_candidates before
    scheduling) costs a full extra url_hash exchange plus two
    SortAggregate sorts (min_by over a struct buffer is not
    hash-aggregatable). Input may omit status/not_before/sched_gen
    (implicitly all-pending, e.g. a fresh seed list); they are
    synthesized in the output either way.

    Returns the full frame with updated status/not_before/sched_gen."""
    if skew_threshold is None:
        skew_threshold = max(budget_per_host * salt_parts, 4096)
    has_status = "status" in pending.columns

    # Slim exchange: url/host ride as NULL whenever recoverable from
    # canonical_url (_slim_encode, idempotent) and are re-derived AFTER
    # the windows. The rank/dedupe window exchanges are this job's
    # dominant shuffle and the high-parallelism level is
    # DRAM-bandwidth-bound (BENCH/BASELINE.md calibrations), so exchange
    # bytes are the scaling lever; the re-derivation is substring cuts —
    # CPU-side work. Exact: encode compares recovered vs actual per row,
    # so unrecoverable rows carry explicit values.
    pending = _slim_encode(pending)
    # pack (priority, generation) into one rank long for the sort +
    # exchange; unpacked after the windows (exact — see _pack_order)
    pending = _pack_order(pending)

    big_hosts = (
        pending.groupBy("host_hash")
        .count()
        .filter(F.col("count") > skew_threshold)
        .select("host_hash")
    )
    norm = pending.join(F.broadcast(big_hosts), "host_hash", "left_anti")
    big = pending.join(F.broadcast(big_hosts), "host_hash", "left_semi")

    w_host = Window.partitionBy("host_hash").orderBy(*_PACKED_ORDER)
    salt = F.pmod(F.col("url_hash"), F.lit(salt_parts))
    w_shard = Window.partitionBy("host_hash", salt).orderBy(*_PACKED_ORDER)

    if dedupe:
        # explicit repartition so the dedupe window (whose partition spec
        # is a SUPERSET of the repartition keys — satisfied without a new
        # exchange) and the rank window share one exchange per branch
        norm = norm.repartition("host_hash")
        w_d = Window.partitionBy("host_hash", "url_hash").orderBy(*_PACKED_ORDER)
        norm = (
            norm.withColumn("_dn", F.row_number().over(w_d))
            .filter(F.col("_dn") == 1)
            .drop("_dn")
        )
        big = big.repartition(F.col("host_hash"), salt)
        w_ds = Window.partitionBy("host_hash", salt, "url_hash").orderBy(*_PACKED_ORDER)
        big = (
            big.withColumn("_dn", F.row_number().over(w_ds))
            .filter(F.col("_dn") == 1)
            .drop("_dn")
        )

    # skewed hosts: shard pre-rank (persisted — feeds survivors + overflow)
    pre = big.withColumn("_shard_rn", F.row_number().over(w_shard)).persist()
    survivors = pre.filter(F.col("_shard_rn") <= budget_per_host).drop("_shard_rn")
    shard_overflow = pre.filter(F.col("_shard_rn") > budget_per_host).drop("_shard_rn")

    ranked = norm.withColumn("_rn", F.row_number().over(w_host)).unionByName(
        survivors.withColumn("_rn", F.row_number().over(w_host))
    )
    # per-host crawl-delay override (north_rule: robots crawl-delay):
    # host_delays(host_hash, crawl_delay_sec) — broadcast; default global
    if host_delays is not None:
        ranked = ranked.join(
            F.broadcast(
                host_delays.select(
                    "host_hash", F.col("crawl_delay_sec").alias("_hd")
                )
            ),
            "host_hash",
            "left",
        )
        delay = F.coalesce(F.col("_hd"), F.lit(crawl_delay_sec))
    else:
        delay = F.lit(crawl_delay_sec)
    # Epoch spacing uses the HOST'S delay, not the global one: slot i of
    # generation g lands at BASE + (g*B + i-1)*d(host), so consecutive
    # slots are d apart both within a generation AND across the
    # generation boundary. (With a global-delay epoch, a host whose
    # robots delay exceeds the global delay had generation-g slots
    # extending past epoch(g+1), violating its declared crawl-delay.)
    epoch = F.lit(_BASE_EPOCH) + F.lit(generation * budget_per_host) * delay
    is_sched = F.col("_rn") <= budget_per_host
    prev_status = F.col("status") if has_status else F.lit("pending")
    prev_sched_gen = F.col("sched_gen") if has_status else F.lit(None).cast("int")
    prev_not_before = (
        F.col("not_before") if has_status else F.lit(None).cast("timestamp")
    )
    decided = (
        ranked.withColumn(
            "status", F.when(is_sched, F.lit("scheduled")).otherwise(prev_status)
        )
        .withColumn(
            "sched_gen",
            F.when(is_sched, F.lit(generation)).otherwise(prev_sched_gen),
        )
        .withColumn(
            "not_before",
            F.when(
                is_sched,
                F.timestamp_seconds(epoch + (F.col("_rn") - 1) * delay),
            ).otherwise(prev_not_before),
        )
        .drop("_rn", *(["_hd"] if host_delays is not None else []))
    )
    overflow = shard_overflow
    if not has_status:
        overflow = (
            overflow.withColumn("status", F.lit("pending"))
            .withColumn("sched_gen", F.lit(None).cast("int"))
            .withColumn("not_before", F.lit(None).cast("timestamp"))
        )
    out = decided.unionByName(overflow.select(*decided.columns))
    # decode the slim exchange (post-shuffle, narrow)
    out = out.withColumn(
        "url", F.coalesce(F.col("url"), F.col("canonical_url"))
    ).withColumn(
        "host",
        F.coalesce(F.col("host"), _host_from_canonical(F.col("canonical_url"))),
    )
    return _unpack_order(out)


def top_per_host(
    df: DataFrame,
    cap: int,
    salt_parts: int = 16,
    skew_threshold: int | None = None,
) -> DataFrame:
    """EXACT top-`cap` rows per host in crawl order, skew-adaptively (the
    same two-phase salted pattern as politeness_schedule: shard pre-rank
    caps any single sort partition, global rank finalizes ≤cap*S rows).
    Used to maintain the scheduler head cache."""
    if skew_threshold is None:
        skew_threshold = max(cap * salt_parts, 4096)
    df = _pack_order(df)
    big_hosts = (
        df.groupBy("host_hash")
        .count()
        .filter(F.col("count") > skew_threshold)
        .select("host_hash")
    )
    norm = df.join(F.broadcast(big_hosts), "host_hash", "left_anti")
    big = df.join(F.broadcast(big_hosts), "host_hash", "left_semi")
    salt = F.pmod(F.col("url_hash"), F.lit(salt_parts))
    w_shard = Window.partitionBy("host_hash", salt).orderBy(*_PACKED_ORDER)
    survivors = (
        big.withColumn("_srn", F.row_number().over(w_shard))
        .filter(F.col("_srn") <= cap)
        .drop("_srn")
    )
    w_host = Window.partitionBy("host_hash").orderBy(*_PACKED_ORDER)
    return _unpack_order(
        norm.unionByName(survivors)
        .withColumn("_rn", F.row_number().over(w_host))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def apply_robots(candidates: DataFrame, robots: DataFrame) -> DataFrame:
    """Tag candidates blocked by robots.txt rules (north_rule: per-domain
    politeness with robots budget).

    robots(host, disallow: array<string>[, allow: array<string>]) —
    per-host rules as the crawler would fetch them (injectable; the
    sandbox has no network). REP longest-match semantics: the most
    specific (longest) matching rule wins; on a tie the Allow wins
    (least-restrictive, per the REP RFC 9309 §2.2.2) — so a candidate is
    blocked iff its longest matching disallow prefix is strictly longer
    than its longest matching allow prefix. Without an allow column this
    degrades to 'any disallow prefix matches'. Pure column expressions:
    broadcast rules join + filter/aggregate over the prefix arrays, no
    per-row Python. Returns candidates + `robots_blocked` boolean."""
    # Path via the same parse that produced `host` — an instr('://') scan
    # would take a mid-string '://' embedded in a query (e.g.
    # 'host.com/redirect?u=https://x') for a scheme separator and derive a
    # garbage path that silently under-blocks. An empty path is the root.
    cu = F.col("canonical_url")
    rest = canon._parse_url(cu)["rest"]
    path = F.when(rest == "", F.lit("/")).otherwise(rest)
    with_path = candidates.withColumn("_path", path)
    has_allow = "allow" in robots.columns
    rule_cols = [
        F.col("host").alias("_rhost"),
        F.col("disallow").alias("_disallow"),
    ]
    if has_allow:
        rule_cols.append(F.col("allow").alias("_allow"))
    rules = robots.select(*rule_cols)

    def longest_match(rules_col):
        return F.aggregate(
            F.filter(rules_col, lambda p: F.startswith(F.col("_path"), p)),
            F.lit(0),
            lambda s, p: F.greatest(s, F.length(p)),
        )

    joined = with_path.join(
        F.broadcast(rules), with_path.host == F.col("_rhost"), "left"
    )
    dis_len = F.coalesce(longest_match(F.col("_disallow")), F.lit(0))
    if has_allow:
        alw_len = F.coalesce(longest_match(F.col("_allow")), F.lit(0))
        blocked = dis_len > alw_len
    else:
        blocked = dis_len > F.lit(0)
    return joined.withColumn("robots_blocked", blocked).drop(
        "_rhost", "_disallow", "_path", *(["_allow"] if has_allow else [])
    )


def extract_outlinks(documents: DataFrame) -> DataFrame:
    """documents(doc_id, spans, url, seq) → one row per link/media span:
    (url, parent_seq, sub). The vectorized span-explosion the north_rule
    asks for — link extraction happened once at ingest (spans are the
    canonical representation), so frontier expansion is a pure explode."""
    return (
        documents.select(
            F.col("url").alias("parent_url"),
            F.col("seq").alias("parent_seq"),
            F.explode("spans").alias("s"),
        )
        .filter(F.col("s.kind").isin("link", "media"))
        .select(
            F.col("s.media_ref").alias("url"),
            F.col("parent_seq"),
            F.col("s.offset").cast("long").alias("sub"),
        )
    )


_DEDUP_COLS = [
    "url", "canonical_url", "url_hash", "host", "host_hash",
    "priority", "generation", "seq", "sub",
]


def seed_candidates(seeds: DataFrame) -> DataFrame:
    """(url, priority, seq) → canonicalized generation-0 candidate rows
    (_DEDUP_COLS), not yet deduped: the narrow front half shared by
    seeds_to_frontier and the fused scheduling path."""
    base = seeds.withColumn("generation", F.lit(0)).withColumn(
        "sub", F.lit(0).cast("long")
    )
    return canonicalize_candidates(base).select(*_DEDUP_COLS)


def schedule_seed_list(
    seeds: DataFrame,
    seen: DataFrame,
    generation: int = 1,
    budget_per_host: int = 8,
    crawl_delay_sec: int = 1,
    salt_parts: int = 16,
    bloom: DataFrame | None = None,
    skew_threshold: int | None = None,
    exact_join: str = "broadcast_fused",
    exact_index: DataFrame | None = None,
) -> DataFrame:
    """One-exchange scheduling of a fresh seed list against an existing
    seen set — the bench-headline composition, and the fast path for
    'here are N new URLs, schedule the polite top-B per host':

      canonicalize (narrow) → bloom tag + null-key broadcast exact
      anti-join (narrow) → politeness with FUSED dedupe (dedupe + rank
      windows share one host-partitioned exchange per skew branch).

    The seed payload crosses exactly ONE exchange. The default
    exact_join='broadcast_fused' requires the seen side to fit a
    broadcast; 'shuffle_hash' resolves the maybe-seen subset with a
    parallel shuffle-hash anti-join instead (no serial broadcast build —
    see seen.filter_unseen); 'prebuilt' takes the incrementally
    maintained sorted-shard exact index (seen.build_exact_index) and
    resolves bloom + exact membership in one narrow pandas UDF — no
    join operator, no per-pass hash-relation build; at a 10^10-row seen
    set use the generation loop's branch path + bucketed layout instead. Result rows are
    persisted (the politeness census + both skew branches consume them);
    callers own unpersist/clearCache."""
    from .seen import filter_unseen as _filter_unseen

    # delta-encode BEFORE the persist: the cached unseen frame then
    # carries null url/host for the common case instead of three full
    # string columns per row (the cache build was the largest remaining
    # per-row byte cost of this pass; politeness re-encodes idempotently)
    cand = _slim_encode(seed_candidates(seeds))
    unseen = _filter_unseen(
        cand, seen, use_bloom=True, bloom=bloom, exact_join=exact_join,
        exact_index=exact_index,
    ).persist()
    return politeness_schedule(
        unseen,
        generation=generation,
        budget_per_host=budget_per_host,
        crawl_delay_sec=crawl_delay_sec,
        salt_parts=salt_parts,
        skew_threshold=skew_threshold,
        dedupe=True,
    )


def seeds_to_frontier(seeds: DataFrame) -> DataFrame:
    """(url, priority, seq) → generation-0 pending frontier rows.

    Constant columns (status/not_before/sched_gen) are attached AFTER the
    dedupe — shuffling them through the min_by aggregation is pure
    payload; same for registrable_domain, which the frontier never uses."""
    slim = seed_candidates(seeds)
    return (
        _dedupe_candidates_slim(slim)
        .withColumn("status", F.lit("pending"))
        .withColumn("not_before", F.lit(None).cast("timestamp"))
        .withColumn("sched_gen", F.lit(None).cast("int"))
    )


FRONTIER_COLS = [
    "url", "canonical_url", "url_hash", "host", "host_hash",
    "priority", "generation", "seq", "sub", "status", "not_before", "sched_gen",
]


def _observed(obs: Observation, defaults: dict) -> dict:
    """Read an Observation's metrics, defaulting when the observed
    subtree was optimized away.

    Empty-relation propagation may remove a CollectMetrics node whose
    input is provably empty at runtime (e.g. the scheduled-rows filter
    in a generation where robots blocked every pending row); the JVM
    Observation then completes with a schemaless empty row that
    Observation.get cannot convert. Elimination only happens when the
    observed input was empty, so each defaulted value must be the
    observed aggregate's empty-input result (counts/sums → 0)."""
    try:
        return obs.get
    except Exception:
        return defaults


def pending_view(
    spark: SparkSession, store: SnapshotStore, generation: int | None = None
) -> DataFrame:
    """Merge-on-read pending state of the append-mode frontier table.

    The frontier is a delta log: discovery writes a url's row once with
    status='pending' (the seen-filter guarantees at-most-once discovery)
    and scheduling writes it once more with status='done'. Latest-wins
    therefore reduces to an anti-join against the done keys — no window,
    no full-table rewrite per generation (the O(frontier) write the
    snapshot design paid; at 10^10 pending rows that write IS the job)."""
    fr = store.read(spark, "frontier", generation).select(*FRONTIER_COLS)
    done_keys = fr.filter(F.col("status") != "pending").select("url_hash")
    return fr.filter(F.col("status") == "pending").join(
        done_keys, "url_hash", "left_anti"
    )


def run_generation(
    spark: SparkSession,
    store: SnapshotStore,
    documents: DataFrame,
    generation: int,
    budget_per_host: int = 8,
    crawl_delay_sec: int = 1,
    salt_parts: int = 16,
    use_bloom: bool = True,
    compact_every: int = 8,
    robots: DataFrame | None = None,
    head_cache: bool = True,
    exact_join: str = "branch",
    trap_gate: bool = False,
) -> dict:
    """One frontier generation: robots gate → schedule → fetch(sim) →
    expand → dedupe → seen-filter → delta commit. Returns driver-side
    metrics dict.

    trap_gate: apply canon.is_crawl_trap as an admission filter on
    discovered outlinks, BEFORE the in-batch dedupe and the seen
    anti-join — trap URL families never enter the frontier, bloom, or
    seen state.

    robots (optional): per-host disallow rules (see apply_robots). Blocked
    rows are committed with status='blocked' — in the merge-on-read view a
    non-pending status is a done-key, so they never re-enter the frontier.
    With the head cache active, any host that blocks ≥1 head row this
    generation gets its schedulable head slice rebuilt exactly from the
    full pending view BEFORE scheduling (see the inline refill note) —
    without this, blocked rows drain a host's head faster than the
    ≤ B/generation the head-exactness argument allows, and a rule
    blocking most of a head could under-schedule that host until the
    next compaction refill.

    The frontier commit is a DELTA (finished + newly discovered rows),
    cost ∝ scheduled+new instead of O(frontier); every `compact_every`
    generations the merged state is compacted into one dir so the
    read-side delta union and done-key anti-join stay bounded.

    head_cache: schedule from a generation-carried HEAD table — per host
    the top K·B pending rows in crawl order, K = compact_every+1 — so a
    non-compaction generation ranks only O(head + new) rows instead of
    the full pending set (at a 10^10-row frontier, ranking all pending
    to schedule ~B·hosts rows is the scale-killer). EXACTNESS: a row
    demoted from the head had ≥ K·B better-ranked rows at its host, at
    most B of which are scheduled per generation, so it cannot reach the
    true top-B within the ≤ compact_every (= K-1) generations before the
    next full refill — and newly discovered rows always merge through
    the head, so the head's top-B equals the full-pending top-B every
    generation. The refill rides the compaction pass (which already
    scans the full delta log). Disabled when compact_every=0. With the
    head active, the rows_in metric counts the scheduler's input rows
    (head size), not the full pending set — counting 10^10 pending rows
    per generation would defeat the point."""
    t0 = time.time()
    frontier = store.read(spark, "frontier").select(*FRONTIER_COLS)
    seen = store.read(spark, "seen")
    # Incrementally maintained bloom table: per-generation delta bitmaps,
    # OR-merged at read (tiny — n_buckets rows per delta). This replaces
    # the per-generation build_bloom(seen) rescan, whose cost is
    # O(|seen|): at a 10^10-row seen set that rescan IS the job.
    try:
        bloom_deltas = store.read(spark, "bloom")
    except FileNotFoundError:
        bloom_deltas = None  # pre-bloom store (older run) — backfill below
    bloom_df = (
        merge_bloom(bloom_deltas) if (use_bloom and bloom_deltas is not None) else None
    )
    # exact_join='prebuilt': the exact seen side is ALSO an incrementally
    # maintained delta log — sorted int64 shards per bucket, union-merged
    # at read, appended per generation (cost ∝ new keys). A store without
    # the table (branch-path history, or bootstrap) gets a one-time
    # backfill over seen∪new at commit; this generation's filter then
    # builds from the seen table directly (same one-time O(|seen|) cost
    # the bloom backfill pays).
    idx_deltas = None
    exact_idx_df = None
    if exact_join == "prebuilt":
        try:
            idx_deltas = store.read(spark, "exact_index")
        except FileNotFoundError:
            idx_deltas = None
        if idx_deltas is not None:
            exact_idx_df = merge_exact_index(idx_deltas)

    is_compact = bool(compact_every) and generation % compact_every == 0
    use_head = head_cache and bool(compact_every)
    head_cap = (compact_every + 1) * budget_per_host if use_head else 0
    head_df = None
    if use_head and not is_compact:
        try:
            head_df = store.read(spark, "head").select(*FRONTIER_COLS)
        except FileNotFoundError:
            head_df = None  # first generation / pre-head store → full rank

    if head_df is not None:
        # head generations never materialize the merge-on-read pending
        # view at all — the head IS the schedulable set
        pending = head_df.persist()
    else:
        # persist: politeness consumes pending three times (skew census +
        # norm/big splits) — uncached that's three delta-log re-merges
        done_keys = frontier.filter(F.col("status") != "pending").select("url_hash")
        pending = (
            frontier.filter(F.col("status") == "pending")
            .join(done_keys, "url_hash", "left_anti")
            .persist()
        )

    refill = None
    if robots is not None:
        gated = apply_robots(pending, robots).persist()
        blocked = (
            gated.filter(F.col("robots_blocked"))
            .drop("robots_blocked")
            .withColumn("status", F.lit("blocked"))
            .withColumn("sched_gen", F.lit(generation))
            .select(*FRONTIER_COLS)
        )
        schedulable = gated.filter(~F.col("robots_blocked")).drop("robots_blocked")
        # rows_in / n_blocked are NOT collected here: they ride the
        # metrics write as a one-row aggregate over the persisted gated
        # head with an Observation attached (see the metrics section) —
        # removing the last synchronous driver action from the
        # generation loop. The head-refill decision below is likewise
        # RELATIONAL: the refill plan is always built, and degenerates
        # to the identity at runtime when nothing was blocked
        # (blocked_hosts is empty → AQE's empty-relation propagation
        # replaces the broadcast semi-join with an empty relation and
        # the anti-join with its stream side).
        rows_in = None
        n_blocked = None
        if head_df is not None:
            # Head-cache × robots exactness fix: the head-exactness
            # argument assumes ≤ B rows leave a host's head per
            # generation, but robots-blocked head rows ALSO leave (they
            # commit non-pending and never return) — a rule that blocks
            # most of a host's head would leave it with fewer than B
            # schedulable head rows until the next compaction refill,
            # under-scheduling the host even within THIS generation
            # (the true top-B schedulable rows may sit below the head).
            # Whenever a host blocked ≥1 head row this generation, its
            # schedulable slice is rebuilt EXACTLY from the full pending
            # view (delta-log merge filtered to the affected hosts via a
            # broadcast semi-join), with current robots applied first —
            # so scheduling and the post-generation head write both see
            # the exact schedulable top again. Robots-blocked rows BELOW
            # the head stay pending in the log (they are gated — and
            # committed blocked — at the next full-rank generation).
            blocked_hosts = (
                gated.filter(F.col("robots_blocked")).select("host_hash").distinct()
            )
            done_keys = frontier.filter(F.col("status") != "pending").select(
                "url_hash"
            )
            full_pending = frontier.filter(F.col("status") == "pending").join(
                done_keys, "url_hash", "left_anti"
            )
            affected = full_pending.join(
                F.broadcast(blocked_hosts), "host_hash", "left_semi"
            )
            affected = (
                apply_robots(affected, robots)
                .filter(~F.col("robots_blocked"))
                .drop("robots_blocked")
            )
            refreshed = top_per_host(
                affected.select(*FRONTIER_COLS), head_cap, salt_parts
            )
            refill = (
                schedulable.join(
                    F.broadcast(blocked_hosts), "host_hash", "left_anti"
                )
                .unionByName(refreshed.select(*schedulable.columns))
                .persist()
            )
            schedulable = refill
    else:
        gated = None
        blocked = None
        schedulable = pending
        rows_in = None
        n_blocked = 0

    # per-host crawl-delay from the robots table when provided
    host_delays = None
    if robots is not None and "crawl_delay_sec" in robots.columns:
        host_delays = robots.select(
            canon.host_hash(F.col("host")).alias("host_hash"), "crawl_delay_sec"
        )
    # pending rows carry CONSTANT status/not_before/sched_gen by
    # construction (discovery writes them exactly once as
    # pending/null/null; the merge-on-read view and the head exclude
    # everything else) — dropping them keeps three dead 8-byte slots out
    # of the rank exchange; politeness re-synthesizes them.
    updated = politeness_schedule(
        schedulable.drop("status", "not_before", "sched_gen"),
        generation, budget_per_host, crawl_delay_sec, salt_parts,
        host_delays=host_delays,
    )
    updated = updated.persist()
    scheduled = updated.filter(F.col("status") == "scheduled")

    # fetch simulation (S11): scheduled URL → its document in the corpus
    docs_canon = documents.select(
        canon.canonical_url(F.col("url")).alias("doc_canonical_url"),
        "url", "spans", "seq",
    )
    fetched = scheduled.select("canonical_url", F.col("seq").alias("parent_rank")).join(
        docs_canon, F.col("canonical_url") == F.col("doc_canonical_url"), "inner"
    ).select("url", "spans", F.col("seq"))

    discovered = (
        extract_outlinks(fetched)
        .withColumn("priority", F.lit(DEFAULT_PRIORITY))
        .withColumn("generation", F.lit(generation))
        .withColumn("seq", F.col("parent_seq"))
        .drop("parent_seq")
    )
    if trap_gate:
        # crawl-trap ADMISSION gate (canon.is_crawl_trap): applied to raw
        # discovered URLs BEFORE canonicalize/dedupe/seen — trap families
        # (session-id aliases, calendar loops, parameter explosions)
        # never enter the pending set, the bloom, or the seen table, so
        # at 10^10 scale an adversarial site can't inflate the state
        # tables. Map-only (the signal struct carries ONE copy of the
        # URL parse tree); rows dropped here are intentionally absent
        # from every downstream count.
        discovered = discovered.filter(~canon.is_crawl_trap(F.col("url")))
    # constants attached after the dedupe shuffle (see seeds_to_frontier)
    disc_obs = Observation(f"disc_{generation}")
    discovered = (
        _dedupe_candidates_slim(canonicalize_candidates(discovered).select(*_DEDUP_COLS))
        .withColumn("status", F.lit("pending"))
        .withColumn("not_before", F.lit(None).cast("timestamp"))
        .withColumn("sched_gen", F.lit(None).cast("int"))
        .select(*FRONTIER_COLS)
        # observed BELOW the persist: the CollectMetrics node is part of
        # the cached plan, so it executes exactly once — in the
        # materialize job that fills this cache — and cache-hit readers
        # scan the InMemoryRelation without re-firing it
        .observe(disc_obs, F.count(F.lit(1)).alias("n"))
        .persist()
    )
    new_base = filter_unseen(
        discovered, seen, use_bloom=use_bloom, materialize=True, bloom=bloom_df,
        exact_join=exact_join, exact_index=exact_idx_df,
    )
    new_rows = new_base.select(*FRONTIER_COLS)
    n_new = new_base.materialized_count
    # the materialize job above filled the discovered cache and fired
    # disc_obs — the old follow-up discovered.count() job is free now
    n_discovered = int(_observed(disc_obs, {"n": 0})["n"])

    # scheduled rows are fetched within the generation → status done
    finished = scheduled.withColumn("status", F.lit("done"))
    # Driver-side actions are per-generation FIXED overhead that caps the
    # headline rate and scaling efficiency, so ALL counts are folded into
    # the metrics job inside the atomic commit — with or without robots
    # the generation loop runs ZERO synchronous driver actions before the
    # commit (the pre-r5 robots path collected a one-row aggregate before
    # scheduling to decide the head refill; that decision is now
    # relational — see the refill block).
    wall_ms = int((time.time() - t0) * 1000)
    # per-partition lineage (A6/north_rule): partition-level scheduled
    # counts as ONE lazy rollup — per-partition rows plus the grand-total
    # row (rollup's null group → partition_id -1) — that rides the
    # metrics write inside the atomic commit instead of a per-generation
    # driver collect. n_scheduled, rows_in, and n_blocked reach the
    # driver through Observations piggybacked on the same job: zero
    # extra actions per generation. (Each observed subtree appears
    # exactly once in exactly one executed plan — a CollectMetrics node
    # must never be duplicated or re-executed, or the observed count
    # would double.)
    rows_in_obs = None
    totals_obs = None
    m_src = updated
    if gated is not None:
        # robots path: rows_in keeps its pre-r5 meaning (the scheduler's
        # PRE-robots input — the gated head size, blocked rows included)
        # and n_blocked rides along, both as ONE one-row aggregate over
        # the persisted gated head, broadcast onto every metrics row.
        # The Observation sits on the aggregate (a one-row subtree that
        # executes exactly once, in the metrics write) and ferries both
        # values to the driver.
        totals_obs = Observation(f"robots_totals_{generation}")
        totals = gated.agg(
            F.count(F.lit(1)).cast("long").alias("_rows_in"),
            F.coalesce(
                F.sum(F.col("robots_blocked").cast("long")), F.lit(0)
            ).cast("long").alias("_n_blocked"),
        ).observe(
            totals_obs,
            F.max("_rows_in").alias("n"),
            F.max("_n_blocked").alias("b"),
        )
    else:
        # relational rows_in: a one-row total over the (persisted)
        # scheduler output, broadcast onto every metrics row — no
        # observe node on this second scan of `updated` (it must not
        # re-fire rows_in_obs)
        rows_in_obs = Observation(f"rows_in_{generation}")
        m_src = updated.observe(rows_in_obs, F.count(F.lit(1)).alias("n"))
        totals = updated.agg(F.count(F.lit(1)).cast("long").alias("_rows_in"))
    sched_obs = Observation(f"sched_gen_{generation}")
    part_metrics = (
        m_src.filter(F.col("status") == "scheduled")
        .observe(sched_obs, F.count(F.lit(1)).alias("n_scheduled"))
        .select(F.spark_partition_id().alias("pid"))
        .rollup("pid")
        .agg(F.count("*").alias("n_sched"))
    )
    # A grouping-set aggregation over EMPTY input emits no rows at all —
    # without the fallback a generation that scheduled nothing (e.g.
    # robots blocked every head row) would write no metrics rows, losing
    # the always-present partition_id=-1 summary row. Union a literal
    # zero row and sum-merge by pid: per-partition rows pass through
    # untouched, the null-pid fallback folds into the rollup's grand
    # total when one exists (total + 0) and BECOMES the summary row when
    # the rollup was empty. Tiny aggregate (≤ partitions+2 rows).
    fallback = updated.sparkSession.range(1).select(
        F.lit(None).cast("int").alias("pid"),
        F.lit(0).cast("long").alias("n_sched"),
    )
    part_metrics = (
        part_metrics.unionByName(fallback)
        .groupBy("pid")
        .agg(F.sum("n_sched").alias("n_sched"))
    )
    part_metrics = part_metrics.crossJoin(F.broadcast(totals.select("_rows_in")))
    rows_in_col = F.col("_rows_in")
    metrics = part_metrics.select(
        F.lit(generation).cast("int").alias("generation"),
        F.coalesce(F.col("pid"), F.lit(-1)).cast("int").alias("partition_id"),
        rows_in_col.alias("rows_in"),
        F.lit(n_new).cast("long").alias("rows_out"),
        F.col("n_sched").cast("long").alias("scheduled"),
        F.when(F.col("pid").isNull(), F.lit(n_discovered - n_new))
        .otherwise(F.lit(0)).cast("long").alias("filtered_seen"),
        F.lit(wall_ms).cast("long").alias("wall_ms"),
    )
    # ONE atomic commit for all three tables: a crash mid-generation must
    # never leave the frontier at g with the seen set at g-1. All three
    # are append-mode — only this generation's delta is written (a full
    # rewrite is O(10^10) I/O per generation at target scale). Every
    # compact_every generations the frontier delta log is folded into one
    # merged dir instead (still the same atomic commit).
    delta = finished.select(*FRONTIER_COLS).unionByName(new_rows)
    if blocked is not None:
        delta = delta.unionByName(blocked)
    # bloom delta: bitmaps over THIS generation's new keys only (cost ∝
    # new rows). A pre-bloom store gets a one-time backfill over seen∪new.
    new_keys = new_rows.select("url_hash")
    if bloom_deltas is None:
        bloom_delta = build_bloom(seen.select("url_hash").unionByName(new_keys))
    else:
        bloom_delta = build_bloom(new_keys)
    if compact_every and generation % compact_every == 0:
        merged = (
            frontier.filter(F.col("status") != "pending")
            .unionByName(finished.select(*FRONTIER_COLS))
            .unionByName(
                updated.filter(F.col("status") == "pending").select(*FRONTIER_COLS)
            )
            .unionByName(new_rows)
        )
        if blocked is not None:
            merged = merged.unionByName(blocked)
        frontier_entry = ("frontier", merged, generation, "compact")
        if bloom_deltas is not None:
            bloom_delta = merge_bloom(bloom_deltas.unionByName(bloom_delta))
        bloom_entry = ("bloom", bloom_delta, generation, "compact")
    else:
        frontier_entry = ("frontier", delta, generation, "append")
        bloom_entry = ("bloom", bloom_delta, generation, "append")
    idx_entry = None
    if exact_join == "prebuilt":
        if idx_deltas is None:
            idx_delta = build_exact_index(
                seen.select("url_hash").unionByName(new_keys)
            )
        else:
            idx_delta = build_exact_index(new_keys)
        if compact_every and generation % compact_every == 0:
            if idx_deltas is not None:
                idx_delta = merge_exact_index(idx_deltas.unionByName(idx_delta))
            idx_entry = ("exact_index", idx_delta, generation, "compact")
        else:
            idx_entry = ("exact_index", idx_delta, generation, "append")
    # seen deltas follow the layout bootstrap chose (append dirs or the
    # bucketed external table — spec already pinned in the manifest)
    seen_mode = store.table_mode("seen") or "append"
    writes = [
        frontier_entry,
        (
            "seen",
            new_rows.select(
                "url_hash", "host_hash", F.lit(generation).alias("generation")
            ),
            generation,
            seen_mode,
        ),
        ("metrics", metrics, generation, "append"),
        bloom_entry,
    ]
    if idx_entry is not None:
        writes.append(idx_entry)
    if use_head:
        # head' = top-K·B per host of (this generation's unscheduled
        # input ∪ new discoveries). On a head generation the input was
        # the old head (cost O(head+new)); on a refill/compaction
        # generation it was the full pending view, so this IS the exact
        # refill. Demoted rows need no write — they already sit in the
        # frontier delta log as pending.
        leftover = updated.filter(F.col("status") == "pending").select(*FRONTIER_COLS)
        head_new = top_per_host(
            leftover.unionByName(new_rows), head_cap, salt_parts
        )
        writes.append(("head", head_new, generation, "snapshot"))
    store.write_many(writes)
    # the metrics write above executed the observed plan; get() returns
    # the filled values without launching anything
    n_scheduled = int(_observed(sched_obs, {"n_scheduled": 0})["n_scheduled"])
    if totals_obs is not None:
        tv = _observed(totals_obs, {"n": 0, "b": 0})
        rows_in = int(tv["n"])
        n_blocked = int(tv["b"])
    else:
        rows_in = int(_observed(rows_in_obs, {"n": 0})["n"])
    extras = tuple(h for h in (gated, refill) if h is not None)
    for h in (updated, pending, discovered, new_base) + extras:
        h.unpersist()
    return {
        "generation": generation,
        "rows_in": rows_in,
        "scheduled": n_scheduled,
        "discovered": n_discovered,
        "new": n_new,
        "blocked": n_blocked,
        "wall_ms": wall_ms,
    }


def bootstrap(
    spark: SparkSession,
    store: SnapshotStore,
    seeds: DataFrame,
    seen_layout: str = "append",
    seen_buckets: int = 32,
) -> dict:
    """Generation 0: seed the frontier + seen set.

    seen_layout='bucketed' stores the seen set as a url_hash-bucketed
    external table (state.SnapshotStore bucketed mode): every later
    generation's exact anti-join then scans the 10^10-row seen side IN
    PLACE — no per-generation shuffle of the seen set, only the small
    maybe-seen side is exchanged into the bucket partitioning. At cluster
    scale pick seen_buckets ~ total cores (e.g. 4096); the Iceberg analog
    is a bucket(N, url_hash) partition transform + storage-partitioned
    joins."""
    if seen_layout not in ("append", "bucketed"):
        # the layout is pinned forever in the manifest — a typo silently
        # coerced to 'append' would only surface as a scale regression
        raise ValueError(f"seen_layout must be 'append' or 'bucketed', got {seen_layout!r}")
    fr = seeds_to_frontier(seeds).select(*FRONTIER_COLS).persist()
    seen_mode = "bucketed" if seen_layout == "bucketed" else "append"
    store.write_many(
        [
            ("frontier", fr, 0, "append"),
            ("seen", fr.select("url_hash", "host_hash", F.lit(0).alias("generation")), 0, seen_mode),
            ("bloom", build_bloom(fr.select("url_hash")), 0, "append"),
        ],
        bucket_specs={"seen": (["url_hash"], seen_buckets)},
    )
    n = fr.count()
    fr.unpersist()
    return {"generation": 0, "seeded": n}


def run_generations(
    spark: SparkSession,
    store: SnapshotStore,
    documents: DataFrame,
    seeds: DataFrame | None,
    n_generations: int,
    start_generation: int | None = None,
    seen_layout: str = "append",
    seen_buckets: int = 32,
    **kwargs,
) -> list[dict]:
    """Drive the generation loop (the reference's master.py restart loop).

    With start_generation=None: bootstrap from seeds then run 1..n.
    With start_generation=k: exact resume from snapshot k (seeds ignored;
    the seen layout is read back from the store manifest)."""
    out = []
    if start_generation is None:
        assert seeds is not None, "seeds required for a fresh run"
        out.append(bootstrap(spark, store, seeds, seen_layout, seen_buckets))
        gens = range(1, n_generations + 1)
    else:
        gens = range(start_generation + 1, start_generation + 1 + n_generations)
    for g in gens:
        out.append(run_generation(spark, store, documents, g, **kwargs))
    return out
