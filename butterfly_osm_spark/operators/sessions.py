"""Sessionization: gap-based event grouping (batch + streaming-stateful).

The training-data analog of the reference's trace segmentation (its
map-matcher cuts GPS traces on time/distance gaps before HMM matching —
route/src/server/mapmatch.rs gap handling); for a web-scale ingest
pipeline this is THE canonical stateful operator: group a user's events
into sessions split on idle gaps > threshold.

Batch form (this module): the classic one-shuffle islands plan —
``lag`` over (user, ts) marks gap starts, a running ``sum`` of the
marks numbers the sessions, one ``groupBy`` aggregates. All three steps
share the SAME (user_id) hash partitioning, so Catalyst plans exactly
one exchange for the windows and reuses it for the final aggregation;
nothing is driver-side. Skew posture: per-user row counts are bounded
(a user's event rate is physical), so user_id hashing balances; a
pathological firehose user would be salted by session-day first.

Streaming form (streaming/sessions.py): the same semantics as an
``applyInPandasWithState`` operator with per-user open-session state —
parity with this batch plan is pytest-asserted on a replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GAP_S = 1800  # idle gap (seconds) that closes a session


def sessionize(pings: DataFrame, gap_s: int = GAP_S) -> DataFrame:
    """(user_id, session_seq, n_pings, start_s, end_s, duration_s):
    events split into sessions wherever the per-user time gap exceeds
    ``gap_s``. session_seq is 1-based in time order."""
    w = Window.partitionBy("user_id").orderBy("ts_s")
    gap = F.col("ts_s") - F.lag("ts_s").over(w)
    marked = pings.select(
        "user_id",
        "ts_s",
        F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0).alias("new_s"),
    ).withColumn("session_seq", F.sum("new_s").over(w))
    return (
        marked.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_pings"),
            F.min("ts_s").alias("start_s"),
            F.max("ts_s").alias("end_s"),
        )
        .withColumn("duration_s", F.col("end_s") - F.col("start_s"))
    )


def sessionize_oracle_sql(fix: str, gap_s: int = GAP_S) -> str:
    """Identical islands construction in DuckDB over the pings parquet."""
    return f"""
WITH lagged AS (
  SELECT user_id, ts_s,
         CASE WHEN ts_s - lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s) > {gap_s}
              OR lag(ts_s) OVER (PARTITION BY user_id ORDER BY ts_s) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM read_parquet('{fix}/pings.parquet')
), numbered AS (
  SELECT user_id, ts_s,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_s
                          ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM lagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       CAST(count(*) AS BIGINT) AS n_pings,
       min(ts_s) AS start_s, max(ts_s) AS end_s,
       max(ts_s) - min(ts_s) AS duration_s
FROM numbered
GROUP BY user_id, session_seq
"""
