"""A/B the exact-join strategy of the seed-scheduling pass at one
parallelism level, inside ONE warm JVM: broadcast_fused (serial broadcast
relation build, zero exchange) vs shuffle_hash (parallel hash build of
the maybe-seen resolve, one small exchange). The broadcast build is a
fixed Amdahl section — as cores grow it caps scaling efficiency; this
probe measures where the crossover sits on this box.

Usage: python scripts_spark/exact_join_ab.py [cores] [n_urls] [reps] [strategies]

strategies: comma list (default broadcast_fused,prebuilt). 'prebuilt'
carries the sorted-shard exact index as pre-built state, like the bloom.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from post_processor_spark import canon, fixtures, frontier  # noqa: E402
from post_processor_spark import seen as seen_mod  # noqa: E402
from post_processor_spark.session import get_spark  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    strategies = (
        sys.argv[4].split(",") if len(sys.argv) > 4
        else ["broadcast_fused", "prebuilt"]
    )
    spark = get_spark(cores=cores, app_name=f"ab-{cores}",
                      shuffle_partitions=cores * 2)
    n_hosts = max(200, n_urls // 50)

    def seeds():
        return fixtures.synthetic_seed_frontier(
            spark, n_urls, n_hosts=n_hosts, mega_host_share=0.3, seed=99
        )

    seen_tbl = (
        canon.with_canonical(seeds().filter(F.col("seq") % 5 == 0))
        .select("url_hash", "host_hash", F.lit(0).alias("generation"))
        .persist()
    )
    bloom_df = seen_mod.build_bloom(seen_tbl).persist()
    bloom_df.count()
    idx_df = seen_mod.build_exact_index(seen_tbl).persist()
    idx_df.count()
    seen_tbl.count()

    def _force_state():
        bloom_df.count(); seen_tbl.count(); idx_df.count()

    def one(strategy: str) -> float:
        spark.catalog.clearCache()
        _force_state()  # re-force evicted state
        t0 = time.time()
        n = (
            frontier.schedule_seed_list(
                seeds(), seen_tbl, generation=1, budget_per_host=64,
                salt_parts=64, bloom=bloom_df, exact_join=strategy,
                exact_index=idx_df if strategy == "prebuilt" else None,
            )
            .filter(F.col("status") == "scheduled")
            .count()
        )
        return n / (time.time() - t0)

    # warm-up each code path
    for s in strategies:
        spark.catalog.clearCache()
        _force_state()
        frontier.schedule_seed_list(
            fixtures.synthetic_seed_frontier(spark, 100_000, n_hosts=2000,
                                             mega_host_share=0.3, seed=99),
            seen_tbl, bloom=bloom_df, exact_join=s,
            exact_index=idx_df if s == "prebuilt" else None,
        ).filter(F.col("status") == "scheduled").count()

    # INTERLEAVED reps (rep-major): this box's deliverable perf drifts
    # minute-to-minute, so strategy-major ordering confounds strategy
    # with window drift — alternate strategies within each rep instead.
    out = {"cores": cores, "n_urls": n_urls}
    rates: dict[str, list[float]] = {s: [] for s in strategies}
    for _ in range(reps):
        for s in strategies:
            rates[s].append(one(s))
    for s in strategies:
        out[s] = [round(r) for r in rates[s]]
        out[f"{s}_best"] = round(max(rates[s]))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
