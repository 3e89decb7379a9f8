"""O2 Hilbert locality key + J14 border matrix tests."""

import numpy as np
import pytest

from butterfly_osm_spark import cells


def _xy2d_scalar(order, x, y):
    # textbook xy2d reference walk
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_np_matches_scalar():
    rng = np.random.RandomState(3)
    xs = rng.randint(0, 1 << cells.HILBERT_ORDER, 2000)
    ys = rng.randint(0, 1 << cells.HILBERT_ORDER, 2000)
    got = cells.hilbert_np(xs, ys)
    for a, b, h in zip(xs[:200], ys[:200], got[:200]):
        assert _xy2d_scalar(cells.HILBERT_ORDER, int(a), int(b)) == int(h)
    # bijectivity on a small full grid (order 4)
    g = np.arange(16)
    gx, gy = np.meshgrid(g, g)
    d4 = cells.hilbert_np(gx.ravel(), gy.ravel(), order=4)
    assert sorted(d4.tolist()) == list(range(256))


def test_hilbert_adjacent_cells_are_neighbors():
    # consecutive Hilbert indices differ by exactly one grid step — the
    # locality contract the O2 sort exists for
    g = np.arange(32)
    gx, gy = np.meshgrid(g, g)
    d = cells.hilbert_np(gx.ravel(), gy.ravel(), order=5)
    order_ix = np.argsort(d)
    xs, ys = gx.ravel()[order_ix], gy.ravel()[order_ix]
    step = np.abs(np.diff(xs)) + np.abs(np.diff(ys))
    assert (step == 1).all()


def test_hilbert_quantizer_domain():
    lon = np.array([-1_800_000_000, 0, 1_800_000_000], dtype=np.int64)
    lat = np.array([-900_000_000, 0, 900_000_000], dtype=np.int64)
    hx, hy = cells.hilbert_xy_np(lon, lat)
    assert hx.min() >= 0 and hx.max() < (1 << cells.HILBERT_ORDER)
    assert hy.min() >= 0 and hy.max() < (1 << cells.HILBERT_ORDER)


def test_with_hilbert_spark_matches_numpy(spark):
    import pandas as pd

    rng = np.random.RandomState(11)
    lon = rng.randint(-1_800_000_000, 1_800_000_000, 512).astype(np.int64)
    lat = rng.randint(-900_000_000, 900_000_000, 512).astype(np.int64)
    df = spark.createDataFrame(pd.DataFrame({"lon_e7": lon, "lat_e7": lat}))
    got = cells.with_hilbert(df).toPandas().sort_values(["lon_e7", "lat_e7"])
    exp = cells.hilbert_np(*cells.hilbert_xy_np(lon, lat))
    ref = (
        pd.DataFrame({"lon_e7": lon, "lat_e7": lat, "hilbert": exp})
        .sort_values(["lon_e7", "lat_e7"])
    )
    assert (got["hilbert"].to_numpy() == ref["hilbert"].to_numpy()).all()


def test_border_matrix_invariants(spark, fix001):
    from butterfly_osm_spark.operators.extract import border_matrix

    ways = spark.read.parquet(f"{fix001}/osm_ways.parquet")
    wn = spark.read.parquet(f"{fix001}/way_nodes.parquet")
    nodes = spark.read.parquet(f"{fix001}/osm_nodes.parquet")
    bm = border_matrix(ways, wn, nodes).toPandas()
    assert len(bm) > 0
    assert (bm["src_region"] != bm["dst_region"]).all()
    assert (bm["n_cross"] >= 1).all()
    assert (bm["min_seg_mm"] <= bm["total_seg_mm"]).all()
    src = bm["src_region"].to_numpy().astype(np.int64)
    dst = bm["dst_region"].to_numpy().astype(np.int64)
    # regions are res-7 packed ids
    assert (src >> cells.RES_SHIFT == 7).all()
    # crossings only between grid-adjacent or near regions at this res:
    # consecutive way vertices are short segments, so |dx|,|dy| stay small
    dx = np.abs((src & cells.X_MASK) - (dst & cells.X_MASK))
    dy = np.abs(((src >> cells.Y_SHIFT) & cells.Y_MASK) - ((dst >> cells.Y_SHIFT) & cells.Y_MASK))
    assert dx.max() <= 2 and dy.max() <= 2
