"""Behavioral gates for the sequential-per-group operators:
map-match accuracy vs seeded ground truth, TSP tour validity +
improvement over greedy, frontier cut invariants."""

import numpy as np


def test_map_match_accuracy(spark, fix001):
    from butterfly_osm_spark.operators.mapmatch import viterbi_match

    traces = spark.read.parquet(f"{fix001}/traces.parquet")
    out = viterbi_match(
        traces.drop("true_way_id"),
        spark.read.parquet(f"{fix001}/way_nodes.parquet"),
        spark.read.parquet(f"{fix001}/osm_nodes.parquet"),
    ).toPandas()
    truth = traces.select("trace_id", "seq", "true_way_id").toPandas()
    m = out.merge(truth, on=["trace_id", "seq"])
    assert len(m) / len(truth) >= 0.95, "HMM must match nearly every point (10 m noise)"
    acc = (m.way_id == m.true_way_id).mean()
    assert acc >= 0.8, f"map-match accuracy {acc:.3f} below gate"
    assert (m.dist_m <= 100.0).all()


def test_tsp_tours_valid_and_improving(spark, fix001):
    from butterfly_osm_spark.operators.trips import nn_tour, tour_length, tsp_trips

    stops = spark.read.parquet(f"{fix001}/query_points.parquet")
    tours = tsp_trips(stops).toPandas()
    pts = stops.toPandas().set_index("query_id")
    n_checked = 0
    for tid, g in tours.groupby("trip_id"):
        g = g.sort_values("stop_seq")
        assert g.stop_seq.tolist() == list(range(len(g))), "stop_seq must be dense"
        assert g.query_id.is_unique, "each stop visited once"
        if len(g) < 4:
            continue
        x = pts.loc[g.query_id].lon_e7.to_numpy(np.float64) * 71_400 / 1e7
        y = pts.loc[g.query_id].lat_e7.to_numpy(np.float64) * 111_000 / 1e7
        d = np.hypot(x[:, None] - x[None, :], y[:, None] - y[None, :])
        opt_len = float(d[np.arange(len(g)), np.roll(np.arange(len(g)), -1)].sum())
        nn_len = tour_length(nn_tour(d), d)
        assert opt_len <= nn_len + 1e-6, "2-opt tour must not be worse than greedy NN"
        n_checked += 1
    assert n_checked >= 5


def test_elevation_frontier_invariants(spark, fix001):
    from butterfly_osm_spark.operators.elevation import dem_sample, elevation_frontier

    nodes = spark.read.parquet(f"{fix001}/osm_nodes.parquet")
    wn = spark.read.parquet(f"{fix001}/way_nodes.parquet")
    tiles = spark.read.parquet(f"{fix001}/raster_tiles.parquet")
    T = 250.0
    cuts = elevation_frontier(wn, nodes, tiles, T).toPandas()
    assert len(cuts) > 0
    assert cuts.cut_frac.between(0, 1, inclusive="left").all() or cuts.cut_frac.between(
        0, 1
    ).all(), "cut fraction must lie within the segment"
    # endpoints straddle: re-derive endpoint elevations and check signs
    import pyspark.sql.functions as F

    elev = {
        int(r.query_id): r.elev_m
        for r in dem_sample(
            nodes.select(F.col("id").cast("string").alias("query_id"), "lon_e7", "lat_e7"), tiles
        ).collect()
        if r.elev_m is not None
    }
    wv = wn.join(nodes, wn.node_id == nodes.id).select("way_id", "seq", "node_id").toPandas()
    wv = wv.sort_values(["way_id", "seq"])
    for r in cuts.head(200).itertuples(index=False):
        g = wv[wv.way_id == r.way_id].reset_index(drop=True)
        u = int(g.loc[g.seq == r.seq, "node_id"].iloc[0])
        v = int(g.loc[g.seq == r.seq + 1, "node_id"].iloc[0])
        assert (elev[u] < T) != (elev[v] < T), "cut endpoints must straddle the threshold"


def test_phantom_positions_fractional(spark, fix001):
    """G10 semantics (reference route/src/server/phantom.rs:1-24): snapped
    positions carry FRACTIONAL edge costs — a strictly-interior projection
    (0 < t < 1) must yield a pos_mm strictly between its segment's
    endpoint positions, and the matrix distance between two phantoms on
    one way must equal |pos_a - pos_b| exactly."""
    from butterfly_osm_spark.operators.matrix import (
        phantom_matrix,
        phantom_positions,
        way_positions,
    )

    qp = spark.read.parquet(f"{fix001}/query_points.parquet")
    wn = spark.read.parquet(f"{fix001}/way_nodes.parquet")
    nodes = spark.read.parquet(f"{fix001}/osm_nodes.parquet")
    ph = phantom_positions(qp, wn, nodes).toPandas()
    assert len(ph), "no phantom snaps at fixture scale"
    interior = ph[(ph.t > 0.01) & (ph.t < 0.99)]
    assert len(interior) > 0, "no strictly-interior projections — fractional path untested"
    pos = way_positions(wn, nodes).toPandas()
    pos_map = {}
    for r in pos.itertuples(index=False):
        pos_map.setdefault(r.way_id, []).append(r.pos_mm)
    checked = 0
    for r in interior.itertuples(index=False):
        vp = sorted(pos_map[r.way_id])
        # strictly between two vertex positions => genuine partial-edge cost
        if r.pos_mm not in vp:
            assert vp[0] <= r.pos_mm <= vp[-1]
            checked += 1
    assert checked > 0, "every interior phantom coincided with a vertex position"
    mat = phantom_matrix(qp, wn, nodes).toPandas()
    pm = {(r.query_id, r.way_id): r.pos_mm for r in ph.itertuples(index=False)}
    for r in mat.itertuples(index=False):
        assert r.dist_mm == abs(pm[(r.src_id, r.way_id)] - pm[(r.dst_id, r.way_id)])
