"""As-of (temporal) join: for each left row, attach the payload of the
most recent right row at-or-before its timestamp, per key — the operator
behind "latest price as of trade time", "last crawl state as of fetch
time", "most recent order as of event time". Spark has no ASOF JOIN;
the naive encodings are a range join (O(n·m) row explosion the optimizer
turns into BNLJ) or a per-key collect (driver-side). Neither survives
100 TB.

Implementation here is the union-tag + ordered-window plan:

    union(left[tag=1], right[tag=0])
      → window PARTITION BY key ORDER BY (t, tag)
      → last(payload IGNORE NULLS) over rows UNBOUNDED PRECEDING..CURRENT
      → keep tag=1

Exactly ONE hash shuffle on the key (the window exchange) and one
in-partition sort — same cost as a plain equi-join, zero row expansion,
no driver state. At equal timestamps a right row sorts BEFORE the left
row (tag 0 < 1), giving inclusive `left.t >= right.t` semantics, which
matches DuckDB's `ASOF LEFT JOIN ... ON l.t >= r.t` and pandas
merge_asof(direction="backward", allow_exact_matches=True).

Scale shape: skewed keys land in one partition like any window — AQE
skew handling or pre-salting by coarse time-bucket applies if a single
key's history exceeds a partition; payload width is the carried state,
so project payload_cols down to what you need before joining.

Determinism: if the right side has several rows at the same (key, t),
"the last one" is tie-broken by nothing — dedupe the right side first
(e.g. max_by payload per (key, t)) for a deterministic result; the
q_asof_join driver query does exactly that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_tag"
_RT = "__asof_right_t"
_BIN = "__rj_bin"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_width_s: float,
    point_key: str | None = None,
    interval_key: str | None = None,
) -> DataFrame:
    """Point-in-interval join (`start <= ts <= end`, inclusive both ends)
    without the BNLJ/CartesianProduct Catalyst plans for a non-equi
    predicate.

    Plan: bucket time into bins of bin_width_s seconds; each interval is
    exploded to the bins it covers (`sequence(bin(start), bin(end))`),
    each point has exactly ONE bin, and the join becomes an equi-join on
    (bin [, key]) followed by the exact range filter. Because a point
    belongs to exactly one bin, every qualifying (point, interval) pair
    is emitted exactly once — no post-join dedup.

    Scale shape: a hash shuffle on (bin [, key]) instead of a broadcast
    nested loop — this is the "binned range join" a 100 TB events ×
    windows join needs. The interval side expands by
    ~(interval_length / bin_width_s + 1) rows, so pick bin_width_s near
    the TYPICAL interval length: blowup stays 2–3×, and each bin's
    population bounds the per-task match work. Skewed bins (a hot hour)
    are ordinary join skew — AQE skew-join handles them.

    point_key/interval_key: optional extra equality predicate (e.g.
    events.user_id = window.custkey) folded into the join key, which both
    tightens the shuffle key and shrinks bins.

    Intervals with end < start are dropped (empty range; also keeps
    `sequence()` from stepping backwards). Output is points.* ++
    intervals.* — column names must be disjoint.
    """
    if bin_width_s <= 0:
        raise ValueError(f"bin_width_s must be > 0: {bin_width_s}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"point/interval columns collide: {sorted(overlap)}")
    if (point_key is None) != (interval_key is None):
        raise ValueError("point_key and interval_key must be set together")

    def _bin(c: str) -> Column:
        # .cast("timestamp") first: TIMESTAMP_NTZ has no direct double
        # cast; the double keeps sub-second precision (numeric ts columns
        # pass through both casts unchanged).
        return F.floor(
            F.col(c).cast("timestamp").cast("double") / F.lit(float(bin_width_s))
        )

    p = points.withColumn(_BIN, _bin(point_ts))
    iv = (
        intervals.filter(F.col(end_ts) >= F.col(start_ts))
        .withColumn(_BIN, F.explode(F.sequence(_bin(start_ts), _bin(end_ts))))
    )
    on = [_BIN] if point_key is None else [
        p[_BIN] == iv[_BIN], p[point_key] == iv[interval_key]
    ]
    joined = p.join(iv, on=on, how="inner").filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
    )
    return joined.select(*points.columns, *intervals.columns)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    direction: str = "backward",
    tolerance_s: float | None = None,
    matched_ts_col: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus payload_cols from the
    matching right row (nulls when no right row qualifies).

    direction="backward": most recent right row with right_ts <= left_ts.
    direction="forward":  earliest right row with right_ts >= left_ts.
    tolerance_s: optional max |left_ts - right_ts| in seconds — matches
    farther than this are nulled out (pandas merge_asof tolerance).
    matched_ts_col: if set, also emit the matched right timestamp under
    this name (needed by callers that want the match age).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    overlap = set(payload_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"payload_cols collide with left columns: {sorted(overlap)}")

    nulls = [F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload_cols]
    l_tag, r_tag = (1, 0) if direction == "backward" else (0, 1)
    lhs = left.select(
        F.col(left_on).alias("__asof_key"),
        F.col(left_ts).alias("__asof_t"),
        F.lit(l_tag).alias(_TAG),
        F.lit(None).cast(right.schema[right_ts].dataType).alias(_RT),
        F.struct(*left.columns).alias("__asof_row"),
        *nulls,
    )
    rhs = right.select(
        F.col(right_on).alias("__asof_key"),
        F.col(right_ts).alias("__asof_t"),
        F.lit(r_tag).alias(_TAG),
        F.col(right_ts).alias(_RT),
        F.lit(None).cast(lhs.schema["__asof_row"].dataType).alias("__asof_row"),
        *[F.col(c) for c in payload_cols],
    )
    u = lhs.unionByName(rhs)

    if direction == "backward":
        w = (
            Window.partitionBy("__asof_key")
            .orderBy(F.col("__asof_t").asc(), F.col(_TAG).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
        keep_tag = 1
    else:
        # forward: earliest right at-or-after; scan from the other end
        w = (
            Window.partitionBy("__asof_key")
            .orderBy(F.col("__asof_t").asc(), F.col(_TAG).asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
        keep_tag = 0

    matched = u.select(
        "__asof_key", "__asof_t", _TAG, "__asof_row",
        pick(_RT).alias(_RT),
        *[pick(c).alias(c) for c in payload_cols],
    ).filter(F.col(_TAG) == keep_tag)

    if tolerance_s is not None:
        age = F.abs(
            F.col("__asof_t").cast("double") - F.col(_RT).cast("double")
        )
        in_tol = F.col(_RT).isNotNull() & (age <= F.lit(float(tolerance_s)))
        matched = matched.select(
            "__asof_key", "__asof_t", _TAG, "__asof_row",
            F.when(in_tol, F.col(_RT)).alias(_RT),
            *[F.when(in_tol, F.col(c)).alias(c) for c in payload_cols],
        )

    out_cols = [F.col(f"__asof_row.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(c) for c in payload_cols]
    if matched_ts_col is not None:
        out_cols.append(F.col(_RT).alias(matched_ts_col))
    return matched.select(*out_cols)
