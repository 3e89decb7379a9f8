"""Geometry codec gates: polyline6 roundtrip, Booth vs naive oracle
(the reference's own test pairing, avoid.rs:281-411), rotation-invariant
canonical hashes, CCW enforcement, GeoJSON well-formedness."""

import json

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from butterfly_osm_spark.operators.geometry import (
    booth_min_rotation,
    canonical_polygon_key,
    polyline6_decode,
    polyline6_encode,
    wkb_polygon_bytes,
)

COORD_LAT = st.integers(min_value=-899_000_000, max_value=899_000_000)
COORD_LON = st.integers(min_value=-1_799_000_000, max_value=1_799_000_000)


@given(st.lists(st.tuples(COORD_LAT, COORD_LON), min_size=1, max_size=50))
@settings(max_examples=100, deadline=None)
def test_polyline6_roundtrip(pts):
    lat = np.array([p[0] for p in pts], dtype=np.int64)
    lon = np.array([p[1] for p in pts], dtype=np.int64)
    s = polyline6_encode(lat, lon)
    dlat, dlon = polyline6_decode(s)
    qla = (lat + np.where(lat >= 0, 5, -5)) // 10
    qlo = (lon + np.where(lon >= 0, 5, -5)) // 10
    assert np.array_equal(dlat, qla) and np.array_equal(dlon, qlo)


@given(st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=40))
@settings(max_examples=200, deadline=None)
def test_booth_vs_naive(seq):
    naive = min(range(len(seq)), key=lambda k: seq[k:] + seq[:k])
    got = booth_min_rotation(seq)
    # booth returns A minimal rotation; value-equality (duplicates allowed)
    assert seq[got:] + seq[:got] == seq[naive:] + seq[:naive]


def test_canonical_hash_rotation_invariant():
    rng = np.random.default_rng(7)
    lon = rng.integers(30_000_000, 60_000_000, 12).astype(np.int64)
    lat = rng.integers(500_000_000, 510_000_000, 12).astype(np.int64)
    base = canonical_polygon_key(lon, lat)
    for k in (1, 5, 11):
        assert canonical_polygon_key(np.roll(lon, k), np.roll(lat, k)) == base
    # duplicate closing vertex must not change the key
    assert canonical_polygon_key(np.append(lon, lon[0]), np.append(lat, lat[0])) == base
    # a genuinely different ring must differ
    assert canonical_polygon_key(lon + 1000, lat) != base


def test_wkb_ccw_enforcement():
    # clockwise square -> ccw=True must reverse the ring
    lon = np.array([0, 0, 10_000, 10_000], dtype=np.int64)
    lat = np.array([0, 10_000, 10_000, 0], dtype=np.int64)  # CW
    raw = wkb_polygon_bytes(lon, lat, ccw=False)
    fixed = wkb_polygon_bytes(lon, lat, ccw=True)
    assert raw != fixed
    rev = wkb_polygon_bytes(lon[::-1], lat[::-1], ccw=False)
    assert fixed == rev


def test_geojson_parses_and_matches_ring(spark, fix001):
    from butterfly_osm_spark.operators.geometry import geojson_sink

    polys = spark.read.parquet(f"{fix001}/polygons.parquet").limit(20)
    rings = {r.polygon_id: r.ring for r in polys.collect()}
    for r in geojson_sink(polys).collect():
        g = json.loads(r.geojson)
        assert g["type"] == "Polygon"
        coords = g["coordinates"][0]
        ring = rings[r.polygon_id]
        assert len(coords) == len(ring) + 1 and coords[0] == coords[-1]
        for c, v in zip(coords, ring):
            assert abs(c[0] - v.lon_e7 / 1e7) < 1e-6 and abs(c[1] - v.lat_e7 / 1e7) < 1e-6


def test_way_polyline6_roundtrip_spark(spark, fix001):
    from butterfly_osm_spark.operators.geometry import way_polyline6

    wn = spark.read.parquet(f"{fix001}/way_nodes.parquet")
    nodes = spark.read.parquet(f"{fix001}/osm_nodes.parquet")
    out = {r.way_id: r.polyline6 for r in way_polyline6(wn, nodes).limit(50).collect()}
    wv = (
        wn.join(nodes, wn.node_id == nodes.id)
        .select("way_id", "seq", "lat_e7", "lon_e7")
        .toPandas()
    )
    for wid, s in out.items():
        v = wv[wv.way_id == wid].sort_values("seq")
        la, lo = polyline6_decode(s)
        lat = v.lat_e7.to_numpy(np.int64)
        lon = v.lon_e7.to_numpy(np.int64)
        assert np.array_equal(la, (lat + np.where(lat >= 0, 5, -5)) // 10)
        assert np.array_equal(lo, (lon + np.where(lon >= 0, 5, -5)) // 10)
