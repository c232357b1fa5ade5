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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_tag"
_RT = "__asof_right_t"


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
