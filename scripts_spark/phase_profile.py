"""Phase-by-phase scaling profile of the frontier bench pass.

Times each phase of bench.frontier_throughput separately at local[N_LO]
and local[N_HI] (fresh JVM each) and prints per-phase 4x-scaling
efficiency — identifies which phase caps the end-to-end number.

Usage: python scripts_spark/phase_profile.py [n_urls]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

N_LO, N_HI = 4, 16

RUNNER = r"""
import json, sys, time
sys.path.insert(0, ".")
from pyspark.sql import functions as F
from post_processor_spark.session import get_spark
from post_processor_spark import fixtures, frontier, seen as seen_mod

cores = int(sys.argv[1]); n_urls = int(sys.argv[2])
spark = get_spark(cores=cores, app_name=f"prof-{cores}", shuffle_partitions=cores*2)

def one_pass(n):
    seeds = fixtures.synthetic_seed_frontier(
        spark, n, n_hosts=max(200, n // 50), mega_host_share=0.3, seed=99)
    spark.catalog.clearCache()
    out = {}
    t0 = time.time()
    pending = frontier.seeds_to_frontier(seeds).persist()
    pending.count()
    out["a_canon_dedupe"] = time.time() - t0

    seen_tbl = pending.filter(F.col("seq") % 5 == 0).select(
        "url_hash", "host_hash", F.lit(0).alias("generation"))
    t0 = time.time()
    bloom = seen_mod.build_bloom(seen_tbl)
    tagged = seen_mod.bloom_filter_candidates(pending, bloom)
    unseen = tagged.filter(~F.col("maybe_seen")).drop("maybe_seen").unionByName(
        tagged.filter(F.col("maybe_seen")).drop("maybe_seen")
        .join(seen_tbl.select("url_hash"), "url_hash", "left_anti"))
    unseen = unseen.persist()
    unseen.count()
    out["b_seen_filter"] = time.time() - t0

    t0 = time.time()
    sched = frontier.politeness_schedule(
        unseen, generation=1, budget_per_host=64, salt_parts=64
    ).filter(F.col("status") == "scheduled")
    n_sched = sched.count()
    out["c_politeness"] = time.time() - t0
    pending.unpersist(); unseen.unpersist()
    out["scheduled"] = n_sched
    return out

one_pass(100_000)   # warm-up
best = None
for _ in range(2):
    r = one_pass(n_urls)
    tot = r["a_canon_dedupe"] + r["b_seen_filter"] + r["c_politeness"]
    if best is None or tot < best[0]:
        best = (tot, r)
print(json.dumps({"cores": cores, "total": best[0], **best[1]}))
spark.stop()
"""


def run_at(cores: int, n_urls: int) -> dict:
    env = dict(os.environ, SPARK_DRIVER_MEM=os.environ.get("SPARK_DRIVER_MEM", "32g"))
    out = subprocess.run(
        [sys.executable, "-c", RUNNER, str(cores), str(n_urls)],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=1800,
    )
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"no output at cores={cores}: {out.stderr[-3000:]}")
    return json.loads(lines[-1])


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    lo = run_at(N_LO, n_urls)
    hi = run_at(N_HI, n_urls)
    print(json.dumps({"lo": lo, "hi": hi}))
    for ph in ("a_canon_dedupe", "b_seen_filter", "c_politeness", "total"):
        eff = (lo[ph] / hi[ph]) / (N_HI / N_LO)
        print(f"{ph:16s} lo={lo[ph]:7.2f}s hi={hi[ph]:7.2f}s eff={eff:.3f}")


if __name__ == "__main__":
    main()
