#!/usr/bin/env python
"""A/B measurement for the round-4 kNN lever: materialize the pruned
remaining-query set before the phase-2 shell explode vs the lazy
anti-join (current default). Alternating A/B passes, min-of-N per
variant, bench.py protocol (noop write, clearCache before every run,
generic warm-up outside the clock). Also asserts the two variants are
result-identical (the knob must be perf-only).

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/measure_knn_prune.py [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
        app_name="knn-prune-ab",
        master=f"local[{cpus}]",
        shuffle_partitions=str(max(32, 2 * cpus)),
    )
    spark.range(100000).select(F.sum(F.hash("id"))).collect()  # warm-up

    def run(materialize: bool) -> float:
        spark.catalog.clearCache()
        q = spark.read.parquet(os.path.join(fix, "query_points.parquet"))
        n = spark.read.parquet(os.path.join(fix, "osm_nodes.parquet"))
        t0 = time.time()
        df = knn_join(q, n, materialize_remaining=materialize)
        df.write.format("noop").mode("overwrite").save()
        t = time.time() - t0
        df.unpersist()
        return round(t, 3)

    # result identity first (hash of the full output, both ways)
    def out_hash(materialize: bool) -> int:
        spark.catalog.clearCache()
        q = spark.read.parquet(os.path.join(fix, "query_points.parquet"))
        n = spark.read.parquet(os.path.join(fix, "osm_nodes.parquet"))
        df = knn_join(q, n, materialize_remaining=materialize)
        h = df.select(
            # decimal sum: order-independent and no ANSI long overflow
            F.sum(F.xxhash64("query_id", "rank", "node_id", "dist_m").cast("decimal(38,0)")).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        df.unpersist()
        return (h["h"], h["n"])

    ha, hb = out_hash(False), out_hash(True)
    assert ha == hb, f"variants differ: {ha} vs {hb}"

    lazy: list[float] = []
    mat: list[float] = []
    for i in range(repeats):
        lazy.append(run(False))
        mat.append(run(True))
        print(f"  pass{i}: lazy={lazy[-1]}s materialized={mat[-1]}s", file=sys.stderr)
    out = {
        "metric": "knn_phase2_prune_ab",
        "sf": float(sf),
        "cpus": cpus,
        "rows": int(ha[1]),
        "lazy_s": lazy,
        "materialized_s": mat,
        "lazy_min_s": min(lazy),
        "materialized_min_s": min(mat),
        "speedup_min": round(min(lazy) / min(mat), 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
