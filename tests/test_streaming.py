"""Streaming ops: stream result must EQUAL the batch plan over the same
files (endpoint-consistency discipline); dedup drops re-deliveries."""

import pyspark.sql.functions as F


def _landing(spark, fix001, tmp_path, n_files=4):
    """Write fixture image_geo rows + deterministic event times as a
    multi-file landing zone."""
    d = str(tmp_path / "landing")
    df = (
        spark.read.parquet(f"{fix001}/image_geo.parquet")
        .withColumn(
            "event_time",
            F.timestamp_seconds(F.lit(1700000000) + F.pmod(F.xxhash64("image_id"), F.lit(3600))),
        )
        .select("image_id", "lon_e7", "lat_e7", "event_time")
    )
    df.repartition(n_files).write.mode("overwrite").parquet(d)
    return d, df


def test_stream_counts_equal_batch(spark, fix001, tmp_path):
    from butterfly_osm_spark.streaming.ingest import (
        batch_cell_counts,
        read_image_stream,
        streaming_cell_counts,
    )

    d, batch_df = _landing(spark, fix001, tmp_path)
    out = streaming_cell_counts(read_image_stream(spark, d, max_files=2))
    q = (
        out.writeStream.format("memory")
        .queryName("cellcounts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM cellcounts").collect()}
    want = {tuple(r) for r in batch_cell_counts(spark.read.parquet(d)).collect()}
    assert got == want and len(want) > 10


def test_streaming_dedup_drops_redelivery(spark, fix001, tmp_path):
    from butterfly_osm_spark.streaming.ingest import read_image_stream, streaming_dedup

    d, batch_df = _landing(spark, fix001, tmp_path, n_files=1)
    # re-deliver the same rows as a second file (same ids, same times)
    batch_df.write.mode("append").parquet(d)
    out = streaming_dedup(read_image_stream(spark, d, max_files=1))
    q = (
        out.writeStream.format("memory")
        .queryName("deduped")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT image_id FROM deduped").collect()
    ids = [r.image_id for r in rows]
    assert len(ids) == len(set(ids)), "re-delivered ids must be dropped"
    assert len(set(ids)) == batch_df.count()


def test_stateful_sessionize_matches_batch(spark, fix001, tmp_path):
    """applyInPandasWithState sessionizer on an availableNow replay emits
    exactly the batch islands plan's sessions minus each user's trailing
    (still-open) session, with identical numbering. Re-delivery across
    TWO micro-batch files must also stitch sessions through state."""
    from butterfly_osm_spark.operators.sessions import sessionize
    from butterfly_osm_spark.streaming.sessions import sessionize_stream

    src = spark.read.parquet(f"{fix001}/pings.parquet")
    d = str(tmp_path / "pings_landing")
    # split mid-stream at the median ts (arrival order respects event
    # order, as a watermarked source guarantees); sessions spanning the
    # split force the state handoff between micro-batches
    mid = src.approxQuantile("ts_s", [0.5], 0.0)[0]
    src.filter(f"ts_s < {mid}").coalesce(1).write.mode("overwrite").parquet(d + "/f0")
    src.filter(f"ts_s >= {mid}").coalesce(1).write.mode("overwrite").parquet(d + "/f1")

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        tuple(r)
        for r in spark.sql(
            "SELECT user_id, session_seq, n_pings, start_s, end_s, duration_s FROM sessions_stream"
        ).collect()
    }

    batch = sessionize(src).collect()
    last_seq = {}
    for r in batch:
        last_seq[r.user_id] = max(last_seq.get(r.user_id, 0), r.session_seq)
    want = {
        (r.user_id, r.session_seq, r.n_pings, r.start_s, r.end_s, r.duration_s)
        for r in batch
        if r.session_seq != last_seq[r.user_id]
    }
    assert got == want
    assert len(want) > 50, "fixture should contain many multi-session users"


def test_stateful_asof_matches_batch(spark, tmp_path):
    """applyInPandasWithState as-of enrichment on an availableNow replay
    (single micro-batch -> full per-user history per fold call) must
    emit exactly the batch asof_purchases rows, NULL carries included."""
    from butterfly_osm_spark.operators.asof import asof_purchases
    from butterfly_osm_spark.streaming.asof import asof_purchases_stream

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    d = str(tmp_path / "events_landing")
    src.coalesce(1).write.mode("overwrite").parquet(d)

    stream = spark.readStream.schema(src.schema).parquet(d)
    q = (
        asof_purchases_stream(stream)
        .writeStream.format("memory")
        .queryName("asofstream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    def norm(rows):
        return {
            (
                r.event_id,
                r.user_id,
                r.ts_us,
                r.event_type,
                r.asof_purchase_id if r.asof_purchase_id is not None else -1,
                round(r.asof_value, 6) if r.asof_value is not None else -1.0,
            )
            for r in rows
        }

    got = norm(spark.sql("SELECT * FROM asofstream").collect())
    want = norm(asof_purchases(spark.read.parquet(d)).collect())
    assert len(want) > 100
    assert got == want
