#!/usr/bin/env python
"""Driver-style side-by-side verification: run queries() vs oracle_sql()
at a given sf and print MATCH/MISMATCH per query.

Usage: python scripts/verify_queries.py [sf] [query ...]
  sf defaults to 0.01 (the driver's correctness sf); no query names = all
  queries that have an oracle entry.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import duckdb

    import __spark_entry__ as E
    from butterfly_osm_spark.session import get_spark

    args = sys.argv[1:]
    sf = args[0] if args and args[0][0].isdigit() else "0.01"
    names = args[1:] if args and args[0][0].isdigit() else args

    qs = E.queries()
    # sf-parameterized oracles (round 5): E.oracle_sql() binds the driver's
    # default ORACLE_SF, so fixture-path oracles used to read sf0.01
    # fixtures at ANY requested sf; the registry callables take sf directly
    from butterfly_osm_spark.queries import ORACLES as oracle_fns

    oracles = {n: fn(sf) for n, fn in oracle_fns.items()}
    assert set(oracles) == set(E.oracle_sql()), "entry/registry oracle drift"
    if not names:
        names = [n for n in qs if n in oracles]

    spark = get_spark(
        app_name="verify-queries",
        master=os.environ.get("VERIFY_MASTER", "local[8]"),
        shuffle_partitions=os.environ.get("VERIFY_SHUFFLE", "8"),
    )
    con = duckdb.connect()
    sf_dir = f"/root/testdata/sf{sf}"
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")

    failed = []
    for name in names:
        if name not in qs:
            print(f"{name}: NOT A QUERY")
            failed.append(name)
            continue
        try:
            df = qs[name](spark, sf_dir)
            cols = sorted(df.columns)
            got = sorted(tuple(str(r[c]) for c in cols) for r in df.collect())
            if name not in oracles:
                print(f"{name}: no_oracle spark_rows={len(got)}")
                continue
            rel = con.sql(oracles[name])
            ocols = list(rel.columns)
            assert sorted(ocols) == cols, f"schema {sorted(ocols)} != {cols}"
            order = [ocols.index(c) for c in cols]
            want = sorted(tuple(str(row[i]) for i in order) for row in rel.fetchall())
            ok = got == want
            print(f"{name}: {'MATCH' if ok else 'MISMATCH'} spark={len(got)} oracle={len(want)}")
            if not ok:
                failed.append(name)
                diff_g = [r for r in got if r not in set(want)][:3]
                diff_w = [r for r in want if r not in set(got)][:3]
                print(f"  spark-only: {diff_g}")
                print(f"  oracle-only: {diff_w}")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:400]}")
            failed.append(name)
    spark.stop()
    print(f"\n{len(names) - len(failed)}/{len(names)} ok; failed: {failed}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
