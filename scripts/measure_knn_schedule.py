#!/usr/bin/env python
"""A/B sweep of the kNN ring schedule (R0, GROWTH) — round-5 lever probe
(VERDICT r4 "Next round #7a"). Alternating variant passes inside one
session, min-of-N per variant, bench.py protocol (noop write, clearCache
before every run, generic warm-up outside the clock); result-identity is
asserted for every variant first (the schedule is a perf knob only —
results are hash-identical by the ring-bound contract).

Host discipline (BASELINE.md §methodology): run with NOTHING else on the
box, repeat the whole sweep in a second window before believing a
winner; 2-4x burst variance is documented here.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
       python scripts/measure_knn_schedule.py [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCHEDULES = [(2, 8), (2, 4), (3, 8), (4, 8), (2, 16)]


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from butterfly_osm_spark.fixtures.generate import ensure_fixtures
    from butterfly_osm_spark.operators.knn import knn_join
    from butterfly_osm_spark.session import get_spark

    sf = os.path.basename(os.path.normpath(sf_dir)).removeprefix("sf")
    fix = ensure_fixtures(sf)
    spark = get_spark(
        app_name="knn-schedule-ab",
        master=f"local[{cpus}]",
        shuffle_partitions=str(max(32, 2 * cpus)),
    )
    spark.range(100000).select(F.sum(F.hash("id"))).collect()  # warm-up

    def frames():
        q = spark.read.parquet(os.path.join(fix, "query_points.parquet"))
        n = spark.read.parquet(os.path.join(fix, "osm_nodes.parquet"))
        return q, n

    def out_hash(r0: int, g: int):
        spark.catalog.clearCache()
        q, n = frames()
        df = knn_join(q, n, r0=r0, ring_growth=g)
        h = df.select(
            F.sum(F.xxhash64("query_id", "rank", "node_id", "dist_m").cast("decimal(38,0)")).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        df.unpersist()
        return (h["h"], h["n"])

    base = out_hash(*SCHEDULES[0])
    for r0, g in SCHEDULES[1:]:
        h = out_hash(r0, g)
        assert h == base, f"schedule ({r0},{g}) changed results: {h} vs {base}"

    def run(r0: int, g: int) -> float:
        spark.catalog.clearCache()
        q, n = frames()
        t0 = time.time()
        df = knn_join(q, n, r0=r0, ring_growth=g)
        df.write.format("noop").mode("overwrite").save()
        t = time.time() - t0
        df.unpersist()
        return round(t, 3)

    times: dict[str, list[float]] = {f"{r0}x{g}": [] for r0, g in SCHEDULES}
    for i in range(repeats):
        for r0, g in SCHEDULES:  # alternate variants within each pass
            times[f"{r0}x{g}"].append(run(r0, g))
        print(f"  pass{i}: " + " ".join(f"{k}={v[-1]}s" for k, v in times.items()), file=sys.stderr)
    out = {
        "metric": "knn_ring_schedule_ab",
        "sf": float(sf),
        "cpus": cpus,
        "rows": int(base[1]),
        "times_s": times,
        "min_s": {k: min(v) for k, v in times.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
