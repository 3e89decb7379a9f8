#!/usr/bin/env python
"""Headline benchmark for the butterfly-osm-spark engine.

Default mode (what the round driver runs): executes the headline queries
at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32) and prints ONE JSON line:

    {"metric": "headline_total_sec", "value": <sec>, "unit": "sec",
     "queries": {"pip_images": sec, ...}, "sf": 0.1,
     "rows": {...}, "rows_per_sec": <join output rows/sec>, "cpus": N}

Scaling mode (north-rule evidence — cluster-size scaling is substituted
by two parallelism levels on the same input, per the driver mandate):

    python bench.py --masters 8,32

re-runs the identical job in a fresh subprocess per level and prints one
JSON line with both throughputs and the scaling efficiency
eff = (R_high / R_low) / (cores_high / cores_low). Results are recorded
in BASELINE.md §scaling.

Timing counts only query execution (fixture generation and session
startup are excluded). The timed action is ``df.count()`` — it drives
every join/shuffle/window of the plan; only terminal scalar projections
can be pruned, which is negligible for these join-dominated plans.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HEADLINE = [
    # spatial core (rows/s of the BASELINE.json metric)
    "extract_edges",
    "pip_images",
    "knn_nodes",
    "image_tiles",
    "way_cover",
    "radius_join",
    "region_tiles",
    # raster/tiling (tiles/s of the metric)
    "raster_contour",
    # training-data pipeline ops over the driver's tables
    "minhash_lsh",
    "ann_cosine_topk",
]


def run_once(sf_dir: str, cpus: int) -> dict:
    from butterfly_osm_spark.fixtures.generate import ensure_fixtures
    from butterfly_osm_spark.queries import QUERIES
    from butterfly_osm_spark.session import get_spark

    sf = os.path.basename(os.path.normpath(sf_dir)).removeprefix("sf")
    ensure_fixtures(sf)  # outside the timed region

    # shuffle partitions scale with parallelism, like executor count would
    spark = get_spark(
        app_name=f"butterfly-osm-bench-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=str(max(32, 2 * cpus)),
    )
    try:
        times: dict[str, float] = {}
        rows: dict[str, int] = {}
        for name in HEADLINE:
            t0 = time.time()
            rows[name] = QUERIES[name](spark, sf_dir).count()
            times[name] = round(time.time() - t0, 3)
            print(f"  {name}: {rows[name]} rows in {times[name]}s", file=sys.stderr)
        total = round(sum(times.values()), 3)
        total_rows = int(sum(rows.values()))
        return {
            "metric": "headline_total_sec",
            "value": total,
            "unit": "sec",
            "queries": times,
            "sf": float(sf),
            "rows": rows,
            "rows_per_sec": round(total_rows / total, 1) if total else None,
            "cpus": cpus,
        }
    finally:
        spark.stop()


def run_scaling(sf_dir: str, levels: list[int]) -> dict:
    runs = []
    for cpus in levels:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        runs.append(json.loads(out.stdout.strip().splitlines()[-1]))
        print(f"level local[{cpus}]: {runs[-1]['value']}s", file=sys.stderr)
    lo, hi = runs[0], runs[-1]
    speedup = lo["value"] / hi["value"] if hi["value"] else None
    eff = round(speedup / (hi["cpus"] / lo["cpus"]), 3) if speedup else None
    return {
        "metric": "scaling_efficiency",
        "value": eff,
        "unit": "ratio",
        "levels": [
            {"cpus": r["cpus"], "sec": r["value"], "rows_per_sec": r["rows_per_sec"]}
            for r in runs
        ],
        "speedup": round(speedup, 3) if speedup else None,
        "sf": lo["sf"],
        "queries": {f"local[{r['cpus']}]": r["value"] for r in runs},
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if len(sys.argv) >= 3 and sys.argv[1] == "--masters":
        levels = [int(x) for x in sys.argv[2].split(",")]
        result = run_scaling(sf_dir, levels)
    else:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        result = run_once(sf_dir, cpus)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
