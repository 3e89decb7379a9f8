"""Geometry codecs + sinks (S10 WKB, S11 polyline6/GeoJSON, P8-P10).

- ``wkb_sink`` (S10): polygon ring -> WKB (LE, type 3, closed ring —
  reference route/src/range/wkb_stream.rs:15-25; ``ensure_ccw`` :49 as
  an opt-in flag). Emitted as hex so the DuckDB oracle (the fixture's
  stored wkb column) compares as plain strings.
- ``polyline6_codec`` (P8): Google polyline at 1e-6 precision
  (reference route/src/server/geometry.rs:84-130 encode, :421-476
  decode) — varint zigzag over deltas; roundtrip-tested.
- ``geojson_sink`` (S11): polygon -> GeoJSON geometry string built
  ENTIRELY from higher-order Column functions (transform + array_join +
  concat) — whole-stage codegen, no UDF, mirrors the reference's
  content-negotiated encoder.
- ``canonical_hash`` (P10): 1e-6 quantise, drop duplicate closing
  vertex, Booth's lexicographically-minimal rotation, md5 — the
  polygon cache key of route/src/server/avoid.rs:157-279. Rotated
  duplicates hash identically (unit-tested vs a naive O(n^2) oracle,
  the reference's own test strategy, avoid.rs:281-411).
- ``interpolate_midpoint`` (P9): position at fraction f along a way
  polyline by cumulative haversine length (route/src/range/
  frontier.rs:319-403) — pure window algebra, DuckDB-oracled.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType

from ..geo import haversine_m_col, haversine_m_sql

E7 = 10_000_000

# ---------------------------------------------------------------------------
# numpy/python kernels
# ---------------------------------------------------------------------------


def wkb_polygon_bytes(lon_e7: np.ndarray, lat_e7: np.ndarray, ccw: bool = False) -> bytes:
    """WKB LE polygon with one closed ring; optionally CCW-enforce the
    outer ring by shoelace sign (wkb_stream.rs ensure_ccw)."""
    if ccw:
        x = lon_e7.astype(np.float64)
        y = lat_e7.astype(np.float64)
        area2 = np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
        if area2 < 0:
            lon_e7 = lon_e7[::-1]
            lat_e7 = lat_e7[::-1]
    n = len(lon_e7) + 1
    out = [struct.pack("<BII", 1, 3, 1), struct.pack("<I", n)]
    for i in list(range(len(lon_e7))) + [0]:
        out.append(struct.pack("<dd", lon_e7[i] / E7, lat_e7[i] / E7))
    return b"".join(out)


def polyline6_encode(lat_e7: np.ndarray, lon_e7: np.ndarray) -> str:
    """Google polyline, 1e-6 precision (coords arrive at 1e-7 fixed point;
    quantised with round-half-away like the reference's i64 math)."""
    out = []
    prev_lat = prev_lon = 0
    for la, lo in zip(lat_e7, lon_e7):
        qla = (int(la) + (5 if la >= 0 else -5)) // 10
        qlo = (int(lo) + (5 if lo >= 0 else -5)) // 10
        for d in (qla - prev_lat, qlo - prev_lon):
            v = (d << 1) ^ (d >> 63) if d < 0 else (d << 1)
            while v >= 0x20:
                out.append(chr((0x20 | (v & 0x1F)) + 63))
                v >>= 5
            out.append(chr(v + 63))
        prev_lat, prev_lon = qla, qlo
    return "".join(out)


def polyline6_decode(s: str) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of polyline6_encode -> (lat_e6, lon_e6) int arrays."""
    coords = []
    i = 0
    acc = []
    while i < len(s):
        shift = result = 0
        while True:
            b = ord(s[i]) - 63
            i += 1
            result |= (b & 0x1F) << shift
            shift += 5
            if b < 0x20:
                break
        d = ~(result >> 1) if result & 1 else result >> 1
        acc.append(d)
        if len(acc) == 2:
            coords.append(tuple(acc))
            acc = []
    lat = np.cumsum([c[0] for c in coords]).astype(np.int64)
    lon = np.cumsum([c[1] for c in coords]).astype(np.int64)
    return lat, lon


def booth_min_rotation(seq: list[tuple]) -> int:
    """Booth's algorithm: index of the lexicographically minimal rotation,
    O(n) (reference avoid.rs:202-279 ports the same algorithm)."""
    s = seq + seq
    n = len(seq)
    f = [-1] * len(s)
    k = 0
    for j in range(1, len(s)):
        sj = s[j]
        i = f[j - k - 1]
        while i != -1 and sj != s[k + i + 1]:
            if sj < s[k + i + 1]:
                k = j - i - 1
            i = f[i]
        if sj != s[k + i + 1]:
            if sj < s[k]:
                k = j
            f[j - k] = -1
        else:
            f[j - k] = i + 1
    return k % n


def canonical_polygon_key(lon_e7: np.ndarray, lat_e7: np.ndarray) -> str:
    """P10: quantise to 1e-6, drop duplicate closing vertex, rotate to the
    Booth-minimal start, md5-hex. Rotations of the same ring collide."""
    qx = ((lon_e7.astype(np.int64) + np.where(lon_e7 >= 0, 5, -5)) // 10).tolist()
    qy = ((lat_e7.astype(np.int64) + np.where(lat_e7 >= 0, 5, -5)) // 10).tolist()
    pts = list(zip(qx, qy))
    if len(pts) > 1 and pts[0] == pts[-1]:
        pts = pts[:-1]
    k = booth_min_rotation(pts)
    pts = pts[k:] + pts[:k]
    return hashlib.md5(repr(pts).encode()).hexdigest()


# ---------------------------------------------------------------------------
# DataFrame operators
# ---------------------------------------------------------------------------


@F.pandas_udf(BinaryType())
def _wkb_udf(lons: pd.Series, lats: pd.Series) -> pd.Series:
    return pd.Series(
        [
            wkb_polygon_bytes(np.asarray(lo, dtype=np.int64), np.asarray(la, dtype=np.int64))
            for lo, la in zip(lons, lats)
        ]
    )


def wkb_sink(polygons: DataFrame) -> DataFrame:
    """(polygon_id, wkb_hex): ring -> WKB, hex-encoded for oracle compare
    against the independently generated fixture wkb column."""
    ring = polygons.select(
        "polygon_id",
        F.expr("transform(ring, v -> v.lon_e7)").alias("lons"),
        F.expr("transform(ring, v -> v.lat_e7)").alias("lats"),
    )
    return ring.select("polygon_id", F.hex(_wkb_udf("lons", "lats")).alias("wkb_hex"))


def wkb_sink_oracle_sql(fix: str) -> str:
    return f"SELECT polygon_id, hex(wkb) AS wkb_hex FROM read_parquet('{fix}/polygons.parquet')"


@F.pandas_udf(StringType())
def _polyline6_udf(lats: pd.Series, lons: pd.Series) -> pd.Series:
    return pd.Series(
        [
            polyline6_encode(np.asarray(la, dtype=np.int64), np.asarray(lo, dtype=np.int64))
            for la, lo in zip(lats, lons)
        ]
    )


def way_polyline6(way_nodes: DataFrame, nodes: DataFrame) -> DataFrame:
    """(way_id, polyline6): each way's vertex chain as a polyline6 string.
    collect_list under an ordering window keeps vertex order."""
    wv = way_nodes.join(nodes, way_nodes.node_id == nodes.id).select(
        "way_id", "seq", "lat_e7", "lon_e7"
    )
    w = Window.partitionBy("way_id").orderBy("seq").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    arrs = (
        wv.withColumn("lats", F.collect_list("lat_e7").over(w))
        .withColumn("lons", F.collect_list("lon_e7").over(w))
        .groupBy("way_id")
        .agg(F.first("lats").alias("lats"), F.first("lons").alias("lons"))
    )
    return arrs.select("way_id", _polyline6_udf("lats", "lons").alias("polyline6"))


@F.pandas_udf(StringType())
def _canon_udf(lons: pd.Series, lats: pd.Series) -> pd.Series:
    return pd.Series(
        [
            canonical_polygon_key(np.asarray(lo, dtype=np.int64), np.asarray(la, dtype=np.int64))
            for lo, la in zip(lons, lats)
        ]
    )


def canonical_hash(polygons: DataFrame) -> DataFrame:
    """(polygon_id, canon_key): the avoid-polygon cache key (P10/C1)."""
    ring = polygons.select(
        "polygon_id",
        F.expr("transform(ring, v -> v.lon_e7)").alias("lons"),
        F.expr("transform(ring, v -> v.lat_e7)").alias("lats"),
    )
    return ring.select("polygon_id", _canon_udf("lons", "lats").alias("canon_key"))


def _e7_decimal_expr(v: str) -> str:
    """Fixed 7-decimal string built from the e7 integer with pure string
    math — no float formatting, so Spark and DuckDB (and any engine)
    produce byte-identical output."""
    return (
        f"concat(CASE WHEN {v} < 0 THEN '-' ELSE '' END, "
        f"CAST(abs({v}) div 10000000 AS STRING), '.', "
        f"lpad(CAST(abs({v}) % 10000000 AS STRING), 7, '0'))"
    )


def geojson_sink(polygons: DataFrame) -> DataFrame:
    """(polygon_id, geojson): Polygon geometry JSON built from pure Column
    expressions — closed ring, fixed 7-dp coordinates derived from the e7
    integers (integer string math, no float formatting), no UDF."""
    lon = _e7_decimal_expr("v.lon_e7")
    lat = _e7_decimal_expr("v.lat_e7")
    coord = f"transform(ring, v -> concat('[', {lon}, ',', {lat}, ']'))"
    closed = f"concat(array_join({coord}, ','), ',', element_at({coord}, 1))"
    return polygons.select(
        "polygon_id",
        F.expr(
            f"concat('{{\"type\":\"Polygon\",\"coordinates\":[[', {closed}, ']]}}')"
        ).alias("geojson"),
    )


def geojson_oracle_sql(fix: str) -> str:
    """DuckDB replication of the GeoJSON sink from the normalized
    polygon_edges table (vertex i = (x1, y1) of edge seq=i, ring closed
    by appending vertex 0) — same integer-derived decimal formatting."""

    def dec(v: str) -> str:
        return (
            f"(CASE WHEN {v} < 0 THEN '-' ELSE '' END || "
            f"CAST(abs({v}) // 10000000 AS VARCHAR) || '.' || "
            f"lpad(CAST(abs({v}) % 10000000 AS VARCHAR), 7, '0'))"
        )

    c = f"'[' || {dec('x1')} || ',' || {dec('y1')} || ']'"
    return f"""
WITH v AS (
  SELECT polygon_id, seq, {c} AS coord
  FROM read_parquet('{fix}/polygon_edges.parquet')
), body AS (
  SELECT polygon_id,
         string_agg(coord, ',' ORDER BY seq) || ',' ||
         min(CASE WHEN seq = 0 THEN coord END) AS ring_str
  FROM v GROUP BY polygon_id
)
SELECT polygon_id,
       '{{"type":"Polygon","coordinates":[[' || ring_str || ']]}}' AS geojson
FROM body
"""


def polyline6_oracle_sql(fix: str) -> str:
    """DuckDB replication of the polyline6 encoder: 1e-6 quantisation
    (round-half-away on the e7 ints), per-point lat/lon deltas vs the
    previous QUANTISED point, zigzag, 5-bit varint chunks, chr(+63).
    Chunk count k is a CASE ladder (deltas here fit 7 chunks)."""
    return f"""
WITH wv AS (
  SELECT w.way_id, w.seq,
         CAST(floor((n.lat_e7 + CASE WHEN n.lat_e7 >= 0 THEN 5 ELSE -5 END) / 10.0) AS BIGINT) AS qla,
         CAST(floor((n.lon_e7 + CASE WHEN n.lon_e7 >= 0 THEN 5 ELSE -5 END) / 10.0) AS BIGINT) AS qlo
  FROM read_parquet('{fix}/way_nodes.parquet') w
  JOIN read_parquet('{fix}/osm_nodes.parquet') n ON w.node_id = n.id
), deltas AS (
  SELECT way_id, seq, 0 AS ci,
         qla - coalesce(lag(qla) OVER (PARTITION BY way_id ORDER BY seq), 0) AS d
  FROM wv
  UNION ALL
  SELECT way_id, seq, 1 AS ci,
         qlo - coalesce(lag(qlo) OVER (PARTITION BY way_id ORDER BY seq), 0) AS d
  FROM wv
), zz AS (
  SELECT way_id, seq, ci,
         CASE WHEN d < 0 THEN -2 * d - 1 ELSE 2 * d END AS v
  FROM deltas
), sized AS (
  SELECT *, CASE WHEN v < 32 THEN 1 WHEN v < 1024 THEN 2 WHEN v < 32768 THEN 3
                 WHEN v < 1048576 THEN 4 WHEN v < 33554432 THEN 5
                 WHEN v < 1073741824 THEN 6 ELSE 7 END AS k
  FROM zz
), ch AS (
  SELECT way_id, seq, ci, i,
         chr(CAST((v >> (5 * i)) & 31 AS INT) + 63
             + CASE WHEN i < k - 1 THEN 32 ELSE 0 END) AS c
  FROM sized, unnest(generate_series(0, k - 1)) AS t(i)
)
SELECT way_id, string_agg(c, '' ORDER BY seq, ci, i) AS polyline6
FROM ch GROUP BY way_id
"""


def canonical_hash_oracle_sql(fix: str) -> str:
    """Differential oracle for the Booth canonical key: instead of
    Booth's O(n) scan, enumerate ALL rotations of the quantised ring and
    take the lexicographically minimal one (same result by definition,
    different algorithm), then md5 the identical python-repr rendering
    '[(x, y), ...]'."""
    return f"""
WITH q AS (
  SELECT polygon_id, seq,
         CAST(floor((x1 + CASE WHEN x1 >= 0 THEN 5 ELSE -5 END) / 10.0) AS BIGINT) AS qx,
         CAST(floor((y1 + CASE WHEN y1 >= 0 THEN 5 ELSE -5 END) / 10.0) AS BIGINT) AS qy
  FROM read_parquet('{fix}/polygon_edges.parquet')
), n AS (
  SELECT polygon_id, count(*) AS n,
         min(CASE WHEN seq = 0 THEN qx END) AS fx,
         min(CASE WHEN seq = 0 THEN qy END) AS fy,
         max(CASE WHEN seq = (SELECT max(seq) FROM q q2 WHERE q2.polygon_id = q.polygon_id)
                  THEN qx END) AS lx,
         max(CASE WHEN seq = (SELECT max(seq) FROM q q2 WHERE q2.polygon_id = q.polygon_id)
                  THEN qy END) AS ly
  FROM q GROUP BY polygon_id
), trimmed AS (
  -- drop the duplicate closing vertex if quantisation collapsed it
  SELECT q.polygon_id, q.seq, q.qx, q.qy
  FROM q JOIN n USING (polygon_id)
  WHERE NOT (n.n > 1 AND n.fx = n.lx AND n.fy = n.ly AND q.seq = n.n - 1)
), tn AS (
  SELECT polygon_id, count(*) AS m FROM trimmed GROUP BY polygon_id
), rot AS (
  -- skey zero-pads each coordinate to 12 chars so string comparison of
  -- rotations equals tuple-sequence comparison (Booth's ordering)
  -- regardless of digit widths; s is the exact python-repr rendering
  SELECT t.polygon_id, r.r,
         string_agg('(' || t.qx || ', ' || t.qy || ')', ', '
                    ORDER BY (t.seq - r.r + tn.m) % tn.m) AS s,
         string_agg(lpad(CAST(t.qx AS VARCHAR), 12, '0') ||
                    lpad(CAST(t.qy AS VARCHAR), 12, '0'), ''
                    ORDER BY (t.seq - r.r + tn.m) % tn.m) AS skey
  FROM trimmed t
  JOIN tn ON tn.polygon_id = t.polygon_id
  JOIN (SELECT DISTINCT polygon_id, seq AS r FROM trimmed) r
    ON r.polygon_id = t.polygon_id
  GROUP BY t.polygon_id, r.r
), best AS (
  SELECT polygon_id, arg_min(s, skey) AS s FROM rot GROUP BY polygon_id
)
SELECT polygon_id, md5('[' || s || ']') AS canon_key FROM best
"""


def interpolate_midpoint(way_nodes: DataFrame, nodes: DataFrame, frac: float = 0.5) -> DataFrame:
    """(way_id, mid_lon, mid_lat): point at ``frac`` of each way's
    cumulative haversine length, linear within the containing segment
    (P9). Degenerate zero-length ways return their first vertex."""
    wv = way_nodes.join(nodes, way_nodes.node_id == nodes.id).select(
        "way_id", "seq", "lat_e7", "lon_e7"
    )
    w = Window.partitionBy("way_id").orderBy("seq")
    pairs = wv.select(
        "way_id",
        "seq",
        "lon_e7",
        "lat_e7",
        F.lead("lon_e7").over(w).alias("nlon"),
        F.lead("lat_e7").over(w).alias("nlat"),
    ).filter(F.col("nlon").isNotNull())
    seg = pairs.withColumn("seg_m", haversine_m_col("lon_e7", "lat_e7", "nlon", "nlat"))
    seg = seg.withColumn(
        "cum_before",
        F.coalesce(F.sum("seg_m").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0.0)),
    ).withColumn("total", F.sum("seg_m").over(Window.partitionBy("way_id")))
    target = F.col("total") * F.lit(frac)
    hit = seg.filter(
        ((F.col("cum_before") <= target) & (target < F.col("cum_before") + F.col("seg_m")))
        | ((F.col("total") == 0) & (F.col("seq") == 0))
    )
    # first matching segment per way (floating ties at segment joints)
    ww = Window.partitionBy("way_id").orderBy("seq")
    hit = hit.withColumn("rn", F.row_number().over(ww)).filter(F.col("rn") == 1)
    f = F.when(F.col("seg_m") > 0, (target - F.col("cum_before")) / F.col("seg_m")).otherwise(0.0)
    return hit.select(
        "way_id",
        F.round(F.col("lon_e7") + (F.col("nlon") - F.col("lon_e7")) * f, 2).alias("mid_lon"),
        F.round(F.col("lat_e7") + (F.col("nlat") - F.col("lat_e7")) * f, 2).alias("mid_lat"),
    )


def interpolate_midpoint_oracle_sql(fix: str, frac: float = 0.5) -> str:
    hav = haversine_m_sql("lon_e7", "lat_e7", "nlon", "nlat")
    return f"""
WITH wv AS (
  SELECT w.way_id, w.seq, n.lat_e7, n.lon_e7
  FROM read_parquet('{fix}/way_nodes.parquet') w
  JOIN read_parquet('{fix}/osm_nodes.parquet') n ON w.node_id = n.id
), pairs AS (
  SELECT way_id, seq, lon_e7, lat_e7,
         lead(lon_e7) OVER (PARTITION BY way_id ORDER BY seq) AS nlon,
         lead(lat_e7) OVER (PARTITION BY way_id ORDER BY seq) AS nlat
  FROM wv
), seg AS (
  SELECT *, {hav} AS seg_m FROM pairs WHERE nlon IS NOT NULL
), cum AS (
  SELECT *,
         coalesce(sum(seg_m) OVER (PARTITION BY way_id ORDER BY seq
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS cum_before,
         sum(seg_m) OVER (PARTITION BY way_id) AS total
  FROM seg
), hit AS (
  SELECT *, row_number() OVER (PARTITION BY way_id ORDER BY seq) AS rn
  FROM cum
  WHERE (cum_before <= total * {frac} AND total * {frac} < cum_before + seg_m)
     OR (total = 0 AND seq = 0))
SELECT way_id,
       round(lon_e7 + (nlon - lon_e7) * (CASE WHEN seg_m > 0 THEN (total * {frac} - cum_before) / seg_m ELSE 0.0 END), 2) AS mid_lon,
       round(lat_e7 + (nlat - lat_e7) * (CASE WHEN seg_m > 0 THEN (total * {frac} - cum_before) / seg_m ELSE 0.0 END), 2) AS mid_lat
FROM hit WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# polygon metrics: signed shoelace area, perimeter, centroid (vector GIS)
# ---------------------------------------------------------------------------


def polygon_metrics(polygon_edges: DataFrame) -> DataFrame:
    """(polygon_id, n_edges, area2_e14, perimeter_mm, lon_c_e7, lat_c_e7):
    per-polygon planar metrics from the exploded edge table — the vector
    side of the reference's avoid-polygon machinery (its recustomizer
    rasterises polygons against the graph, route/src/customizer avoid
    handling; tile cover J10 reuses the same rings here).

    All aggregation is EXACT integer arithmetic so the result is
    identical under any partitioning / summation order:
    - ``area2_e14``: the signed shoelace sum of per-edge cross products
      (x1*y2 - x2*y1, each |term| <= 6.5e18 -> fits BIGINT; the SUM is
      carried as decimal(38,0) / int128, overflow-proof at any polygon
      size) exported as DOUBLE (one exact-int -> nearest-double
      conversion, engine-identical). Positive = CCW ring. Units: e7^2
      planar, i.e. 1e14 per squared degree.
    - ``perimeter_mm``: per-edge haversine rounded to integer mm, then
      summed exactly (the extract length_mm discipline, nbg/mod.rs
      rounding model).
    - centroid: the standard polygon centroid (cross-weighted vertex
      means) as two more exact decimal sums, divided as doubles only in
      the final projection.

    One hash exchange on polygon_id; map-side partial aggregation does
    the heavy lifting (the shuffle carries 5 scalars per polygon).
    """
    x1 = F.col("x1").cast("long")
    y1 = F.col("y1").cast("long")
    x2 = F.col("x2").cast("long")
    y2 = F.col("y2").cast("long")
    cross = (x1 * y2 - x2 * y1).alias("cross")  # |.| <= 6.5e18, exact in i64
    per_edge = polygon_edges.select(
        "polygon_id",
        cross,
        F.round(haversine_m_col("x1", "y1", "x2", "y2") * 1000)
        .cast("long")
        .alias("edge_mm"),
        (x1 + x2).alias("sx"),
        (y1 + y2).alias("sy"),
    )
    c38 = F.col("cross").cast("decimal(20,0)")
    agg = per_edge.groupBy("polygon_id").agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum(F.col("cross").cast("decimal(38,0)")).alias("a2"),
        F.sum("edge_mm").alias("perimeter_mm"),
        F.sum(c38 * F.col("sx").cast("decimal(17,0)")).alias("cx"),
        F.sum(c38 * F.col("sy").cast("decimal(17,0)")).alias("cy"),
    )
    a2d = F.col("a2").cast("double")
    return agg.select(
        "polygon_id",
        F.col("n_edges").cast("int").alias("n_edges"),
        a2d.alias("area2_e14"),
        "perimeter_mm",
        (F.col("cx").cast("double") / (F.lit(3.0) * a2d)).alias("lon_c_e7"),
        (F.col("cy").cast("double") / (F.lit(3.0) * a2d)).alias("lat_c_e7"),
    )


def polygon_metrics_oracle_sql(fix: str) -> str:
    """Identical exact-integer aggregation in DuckDB (int128 sums).

    The int -> double conversions route through VARCHAR because DuckDB's
    direct HUGEINT -> DOUBLE cast truncates instead of rounding to
    nearest (1-ulp error on ~1 % of centroid sums, verified against
    CPython's correctly-rounded int -> float); string parsing is
    correctly rounded in both engines and matches Spark's decimal cast.
    """
    hav = haversine_m_sql("x1", "y1", "x2", "y2")
    return f"""
WITH per_edge AS (
  SELECT polygon_id,
         CAST(x1 AS BIGINT) * y2 - CAST(x2 AS BIGINT) * y1 AS cross_t,
         CAST(round({hav} * 1000) AS BIGINT) AS edge_mm,
         CAST(x1 AS BIGINT) + x2 AS sx,
         CAST(y1 AS BIGINT) + y2 AS sy
  FROM read_parquet('{fix}/polygon_edges.parquet')
), agg AS (
  SELECT polygon_id, count(*) AS n_edges,
         sum(CAST(cross_t AS HUGEINT)) AS a2,
         sum(edge_mm) AS perimeter_mm,
         sum(CAST(cross_t AS HUGEINT) * sx) AS cx,
         sum(CAST(cross_t AS HUGEINT) * sy) AS cy
  FROM per_edge GROUP BY polygon_id
)
SELECT polygon_id, CAST(n_edges AS INT) AS n_edges,
       CAST(CAST(a2 AS VARCHAR) AS DOUBLE) AS area2_e14,
       CAST(perimeter_mm AS BIGINT) AS perimeter_mm,
       CAST(CAST(cx AS VARCHAR) AS DOUBLE)
         / (3.0 * CAST(CAST(a2 AS VARCHAR) AS DOUBLE)) AS lon_c_e7,
       CAST(CAST(cy AS VARCHAR) AS DOUBLE)
         / (3.0 * CAST(CAST(a2 AS VARCHAR) AS DOUBLE)) AS lat_c_e7
FROM agg
"""
