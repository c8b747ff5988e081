"""Geospatial operators (SURVEY §2B ledger, round 4): haversine
distance scoring and a grid-bucketed spatial self-join — the minimal
geo surface an analytics engine needs (store-locator joins, geofence
assignment, proximity dedup) built entirely from codegen'd math, no
geo library.

Coordinates are synthesized deterministically from customer keys with
integer arithmetic (exact on both engines): lat ∈ [−6, 6),
lon ∈ [−17, 17) — a ~1300×3700 km region dense enough that the
100 km join has real neighbor structure at every SF — bounds chosen so the grid join's 3×3 cell
neighborhood provably covers the distance threshold at every latitude
in range (see `join_geo_grid`) and no antimeridian/pole wrap cases
arise; production data swaps the synthesis for real columns plus the
standard wrap handling.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from gvcf_hbase_spark.registry import register
from gvcf_hbase_spark.sources.tables import load_table

_R_KM = 6371.0088  # mean Earth radius

# lat/lon synthesis (integer arithmetic -> exact identical doubles)
_LAT_SQL = "((c_custkey * 7919) % 1200) / 100.0 - 6.0"
_LON_SQL = "((c_custkey * 104729) % 3400) / 100.0 - 17.0"

# 8 fixed hubs on a deterministic diagonal, same synthesis idiom
_HUBS = [(h, (h * 1543) % 1200 / 100.0 - 6.0, (h * 9973) % 3400 / 100.0 - 17.0) for h in range(8)]

_GRID_DEG = 2.0  # cell size
_RADIUS_KM = 100.0
# Coverage proof for the 3x3 neighborhood: a 100 km great-circle hop moves
# at most 100/111.0 ≈ 0.91° of latitude and at most 100/(111.0*cos(lat_max))
# of longitude — ≈ 0.91° at this fixture's |lat| ≤ 6°, and still only 1.81°
# at |lat| = 60° — under one 2° cell either way, so any pair within the
# radius shares or neighbors a cell. Widen the cell (or the probe ring)
# before raising the radius or the latitude bound past 60°.


def _haversine_km(lat1, lon1, lat2, lon2):
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return 2 * _R_KM * F.asin(F.sqrt(a))


_HAVERSINE_SQL = """2 * {r} * asin(sqrt(
      sin(radians(({lat2} - {lat1})) / 2) * sin(radians(({lat2} - {lat1})) / 2)
      + cos(radians({lat1})) * cos(radians({lat2}))
        * sin(radians(({lon2} - {lon1})) / 2) * sin(radians(({lon2} - {lon1})) / 2)))"""


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    lat = ((F.col("c_custkey") * 7919) % 1200) / 100.0 - 6.0
    lon = ((F.col("c_custkey") * 104729) % 3400) / 100.0 - 17.0
    return c.select("c_custkey", lat.alias("lat"), lon.alias("lon"))


_HUBS_SQL = ", ".join(f"({h}, {lat}, {lon})" for h, lat, lon in _HUBS)

_NEAREST_ORACLE = f"""
    WITH pts AS (
      SELECT c_custkey, {_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM customer
    ),
    hubs AS (SELECT * FROM (VALUES {_HUBS_SQL}) AS t(hub_id, hlat, hlon)),
    scored AS (
      SELECT c_custkey, hub_id,
             round({_HAVERSINE_SQL.format(r=_R_KM, lat1="lat", lon1="lon", lat2="hlat", lon2="hlon")}, 6) AS dist_km
      FROM pts CROSS JOIN hubs
    )
    SELECT c_custkey, CAST(hub_id AS BIGINT) AS hub_id, dist_km
    FROM (SELECT *, row_number() OVER (PARTITION BY c_custkey
                                       ORDER BY dist_km, hub_id) AS rn
          FROM scored)
    WHERE rn = 1
"""


@register("geo_haversine_nearest", oracle=_NEAREST_ORACLE, tags=("geo",))
def geo_haversine_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-hub assignment by haversine distance — the store-locator
    / geofence-attribution primitive: every point scored against a
    broadcast 8-row hub table (a production hub list of 10⁴ rows ships
    the same way), nearest picked with a deterministic
    (rounded-distance, hub_id) tie order.

    Pure codegen'd trig over a broadcast cross join — map-side except
    the per-point row_number window, which partitions on the point key.
    Distances are 6dp-rounded BEFORE ranking so both engines make
    identical nearest choices (the transcendental-drift discipline all
    scoring ops here follow). With k hubs ≫ broadcast size, the grid
    path below replaces the cross join (assign hubs to cells, probe
    the point's neighborhood) with identical semantics."""
    pts = _points(spark, sf_dir)
    hubs = spark.createDataFrame(_HUBS, "hub_id int, hlat double, hlon double")
    scored = pts.crossJoin(F.broadcast(hubs)).select(
        "c_custkey",
        "hub_id",
        F.round(_haversine_km(F.col("lat"), F.col("lon"), F.col("hlat"), F.col("hlon")), 6).alias(
            "dist_km"
        ),
    )
    w = Window.partitionBy("c_custkey").orderBy("dist_km", "hub_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_custkey", F.col("hub_id").cast("bigint").alias("hub_id"), "dist_km")
    )


_GRID_ORACLE = f"""
    WITH pts AS (
      SELECT c_custkey, {_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM customer
    )
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           round({_HAVERSINE_SQL.format(r=_R_KM, lat1="a.lat", lon1="a.lon", lat2="b.lat", lon2="b.lon")}, 6) AS dist_km
    FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
    WHERE round({_HAVERSINE_SQL.format(r=_R_KM, lat1="a.lat", lon1="a.lon", lat2="b.lat", lon2="b.lon")}, 6) <= {_RADIUS_KM}
"""


@register("join_geo_grid", oracle=_GRID_ORACLE, tags=("geo", "join"))
def join_geo_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial self-join (all point pairs within 100 km) via GRID
    BUCKETING — the scale shape for proximity joins: each point lands
    in a 2°×2° cell; the probe side replicates each point to its 3×3
    cell neighborhood; candidates are an EQUI-join on cell id; only
    candidates pay the exact haversine. The module docstring carries
    the proof that 3×3 cells cover the radius at every in-range
    latitude, so results are EXACT — the oracle recomputes by brute
    force n².

    Cost: candidates = Σ per-cell |probe|·|base| over co-resident
    cells — linear in points for bounded density (9× probe replication,
    ints + 2 doubles per row), vs the oracle's n². Each qualifying pair
    is produced exactly once: the lower id probes, the higher id stays
    in its home cell, and the probe ring covers the home cell. Dense
    hot cells (urban skew) are the documented hazard — AQE skew
    splitting locally, finer cells + multi-ring probes at production
    density. No antimeridian wrap in the synthesized range; real data
    adds the standard ±180° duplicate-probe trick."""
    pts = _points(spark, sf_dir)
    cx = F.floor(F.col("lat") / _GRID_DEG).cast("long")
    cy = F.floor(F.col("lon") / _GRID_DEG).cast("long")
    base = pts.select("c_custkey", "lat", "lon", cx.alias("cx"), cy.alias("cy"))
    ring = F.array(
        *[
            F.struct((F.col("cx") + dx).alias("px"), (F.col("cy") + dy).alias("py"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = base.select(
        F.col("c_custkey").alias("id_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        F.explode(ring).alias("cell"),
    ).select("id_a", "lat_a", "lon_a", F.col("cell.px").alias("cx"), F.col("cell.py").alias("cy"))
    # shuffle_hash hint: the build side here is the FULL point set, so a
    # broadcast plan only works at toy scale (Spark picks one because the
    # ~MB-sized side sits under the auto-broadcast threshold, and at sf1
    # density the build future hits the 300 s broadcast timeout under
    # load — measured r08). The 100 TB-correct physical strategy for a
    # spatial self-join is a hash-partitioned equi-join on cell id; the
    # hint pins it at every scale.
    cand = probe.join(
        base.select(
            F.col("c_custkey").alias("id_b"),
            F.col("lat").alias("lat_b"),
            F.col("lon").alias("lon_b"),
            "cx",
            "cy",
        ).hint("shuffle_hash"),
        ["cx", "cy"],
    ).filter(F.col("id_a") < F.col("id_b"))
    dist = F.round(
        _haversine_km(F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")), 6
    )
    return cand.select("id_a", "id_b", dist.alias("dist_km")).filter(
        F.col("dist_km") <= _RADIUS_KM
    )


_CELL_DENSITY_ORACLE = f"""
    WITH pts AS (
      SELECT c_custkey,
             CAST((c_custkey * 7919) % 1200 AS BIGINT) // 200 AS cell_y,
             CAST((c_custkey * 104729) % 3400 AS BIGINT) // 200 AS cell_x,
             (c_custkey * 7919) % 1200 AS lat_i,
             (c_custkey * 104729) % 3400 AS lon_i,
             CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal
      FROM customer
    )
    SELECT CAST(cell_y * 100 + cell_x AS BIGINT) AS cell_id,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(bal) AS BIGINT) AS acctbal_cents,
           CAST(sum(lat_i) AS BIGINT) AS lat_i_sum,
           CAST(sum(lon_i) AS BIGINT) AS lon_i_sum,
           CAST(floor(CAST(sum(lat_i) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
             AS centroid_lat_1e2,
           CAST(floor(CAST(sum(lon_i) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
             AS centroid_lon_1e2
    FROM pts GROUP BY cell_y, cell_x
"""


@register("geo_cell_density", oracle=_CELL_DENSITY_ORACLE, tags=("geo", "agg"))
def geo_cell_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial density surface: points binned into the same 2°×2° grid
    the proximity join uses, with per-cell population, balance mass and
    an exact-integer centroid — the heatmap / tile-server aggregate, and
    the cell-occupancy statistic that sizes `join_geo_grid`'s skew risk
    (a cell whose n_points explodes is exactly the cell that needs
    AQE skew splitting or finer cells).

    ONE map-side-combining hash aggregate on the cell key — the scan
    collapses to #cells rows (6×17 here; bounded by the grid, not the
    data). The centroid stays exact: cells bin on the INTEGER lat/lon
    numerators (lat_i ∈ [0,1200) is lat·100 + 600), so the mean is a
    ratio of exact int sums quantized once — no float accumulates
    across rows on either engine."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    lat_i = (F.col("c_custkey") * 7919) % 1200
    lon_i = (F.col("c_custkey") * 104729) % 3400
    pts = c.select(
        (lat_i / 200).cast("long").alias("cell_y"),
        (lon_i / 200).cast("long").alias("cell_x"),
        lat_i.alias("lat_i"),
        lon_i.alias("lon_i"),
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("bal"),
    )
    g = pts.groupBy("cell_y", "cell_x").agg(
        F.count("*").alias("n_points"),
        F.sum("bal").alias("acctbal_cents"),
        F.sum("lat_i").alias("lat_i_sum"),
        F.sum("lon_i").alias("lon_i_sum"),
    )
    return g.select(
        (F.col("cell_y") * 100 + F.col("cell_x")).cast("bigint").alias("cell_id"),
        "n_points",
        "acctbal_cents",
        F.col("lat_i_sum").cast("bigint").alias("lat_i_sum"),
        F.col("lon_i_sum").cast("bigint").alias("lon_i_sum"),
        F.floor(F.col("lat_i_sum").cast("double") / F.col("n_points") + F.lit(0.5))
        .cast("bigint")
        .alias("centroid_lat_1e2"),
        F.floor(F.col("lon_i_sum").cast("double") / F.col("n_points") + F.lit(0.5))
        .cast("bigint")
        .alias("centroid_lon_1e2"),
    )


# per-event jitter around the user's home point: ±0.5° lat, ±0.5° lon,
# exact integer synthesis (same idiom as the customer points)
_TRAJ_LAT_SQL = "(((user_id * 7919) % 1200) + ((event_id * 31) % 100) - 50) / 100.0 - 6.0"
_TRAJ_LON_SQL = "(((user_id * 104729) % 3400) + ((event_id * 53) % 100) - 50) / 100.0 - 17.0"

_TRAJ_ORACLE = f"""
    WITH pts AS (
      SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS t,
             {_TRAJ_LAT_SQL} AS lat,
             {_TRAJ_LON_SQL} AS lon
      FROM events
    ),
    hops AS (
      SELECT user_id, lat, lon,
             lag(lat) OVER w AS plat, lag(lon) OVER w AS plon
      FROM pts
      WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    ),
    scored AS (
      SELECT user_id,
             CAST(floor({_HAVERSINE_SQL.format(r=_R_KM, lat1="plat", lon1="plon", lat2="lat", lon2="lon")} * 1e6 + 0.5) AS BIGINT) AS hop_1e6
      FROM hops WHERE plat IS NOT NULL
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_hops,
           CAST(sum(hop_1e6) AS BIGINT) AS path_km_1e6,
           CAST(max(hop_1e6) AS BIGINT) AS max_hop_1e6
    FROM scored GROUP BY user_id
"""


@register("geo_trajectory_length", oracle=_TRAJ_ORACLE, tags=("geo", "window"))
def geo_trajectory_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trajectory statistics: events become a time-ordered point
    sequence (home point + deterministic per-event jitter, exact integer
    synthesis), and the op reports hop count, total path length and the
    longest single hop — the movement profile a mobility / fleet
    pipeline derives from raw pings.

    ONE properly-partitioned lag window (user_id partition, time order
    with event-id tiebreak) computes the predecessor point — no
    self-join, no sort beyond the window's per-partition one — then ONE
    hash aggregate per user. Each hop's haversine is a single-row float
    expression quantized to 1e-6 km BEFORE the per-user sum, so the
    totals are exact int64 on both engines (the cross-row float-sum
    discipline, SURVEY §5.4). At 100 TB both shuffles key on user_id —
    co-partitioned, skew-safe (a user's ping history fits a partition;
    a bot user with millions of pings is the documented salting case)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts_us_long").alias("t")
    )
    lat = (
        ((F.col("user_id") * 7919) % 1200)
        + ((F.col("event_id") * 31) % 100)
        - 50
    ) / 100.0 - 6.0
    lon = (
        ((F.col("user_id") * 104729) % 3400)
        + ((F.col("event_id") * 53) % 100)
        - 50
    ) / 100.0 - 17.0
    pts = ev.select("user_id", "event_id", "t", lat.alias("lat"), lon.alias("lon"))
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    hops = pts.select(
        "user_id",
        "lat",
        "lon",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
    ).filter(F.col("plat").isNotNull())
    hop = F.floor(
        _haversine_km(F.col("plat"), F.col("plon"), F.col("lat"), F.col("lon")) * 1e6
        + F.lit(0.5)
    ).cast("bigint")
    return (
        hops.select("user_id", hop.alias("hop_1e6"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_hops"),
            F.sum("hop_1e6").cast("bigint").alias("path_km_1e6"),
            F.max("hop_1e6").cast("bigint").alias("max_hop_1e6"),
        )
    )


# Non-convex 6-vertex test polygon (lon = x, lat = y), vertices offset to
# .005 fractions so the .01-granular synthesized points never sit exactly
# on a vertex latitude. Counter-clockwise-ish, with a notch at (1, 0.5).
_POLY = [
    (-12.005, -4.005),
    (-2.005, -5.505),
    (6.005, -2.005),
    (1.005, 0.505),
    (8.005, 3.505),
    (-6.005, 4.505),
]


def _poly_cross_sql() -> str:
    terms = []
    n = len(_POLY)
    for i in range(n):
        x1, y1 = _POLY[i]
        x2, y2 = _POLY[(i + 1) % n]
        terms.append(
            f"(CASE WHEN ({y1} > lat) <> ({y2} > lat) "
            f"AND lon < {x1} + (lat - {y1}) * {x2 - x1} / {y2 - y1} "
            f"THEN 1 ELSE 0 END)"
        )
    return " + ".join(terms)


_POLY_CONTAINS_ORACLE = f"""
    WITH pts AS (
      SELECT c_custkey, {_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM customer
    )
    SELECT c_custkey,
           CAST(({_poly_cross_sql()}) AS BIGINT) AS n_crossings,
           (({_poly_cross_sql()}) % 2) = 1 AS inside
    FROM pts
"""


@register("geo_polygon_contains", oracle=_POLY_CONTAINS_ORACLE, tags=("geo",))
def geo_polygon_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon by ray casting against a literal non-convex
    polygon: count edges a rightward ray from the point crosses — odd =
    inside. Pure +,-,*,/ comparisons (no transcendentals, unlike the
    haversine ops' round-absorbed sin/cos), so both engines agree
    bit-for-bit without any rounding step.

    Scale: embarrassingly parallel map work — the 6-edge fold is one
    codegen'd expression per row, zero shuffle. With MANY polygons the
    production shape is a bbox-grid bucket join first (the
    `join_geo_grid` machinery) so each point only ray-casts candidate
    polygons; with one literal polygon the bbox prune is constant-folded
    by Catalyst and adds nothing, so it is omitted."""
    pts = _points(spark, sf_dir)
    n = len(_POLY)
    cross = F.lit(0)
    for i in range(n):
        x1, y1 = _POLY[i]
        x2, y2 = _POLY[(i + 1) % n]
        hit = (
            ((F.lit(y1) > F.col("lat")) != (F.lit(y2) > F.col("lat")))
            & (
                F.col("lon")
                < F.lit(x1) + (F.col("lat") - F.lit(y1)) * F.lit(x2 - x1) / F.lit(y2 - y1)
            )
        )
        cross = cross + F.when(hit, 1).otherwise(0)
    return pts.select(
        "c_custkey",
        cross.cast("bigint").alias("n_crossings"),
        (cross % 2 == 1).alias("inside"),
    )


_GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
_GEOHASH_CHARS = 6  # 30 bits: 15 lon + 15 lat, interleaved lon-first


def _geohash_bits_sql(lat: str, lon: str) -> str:
    """30-bit interleaved geohash integer (lon bit first, MSB-first) as
    engine-portable SQL: floors of scaled doubles, then shift-and-mask
    interleave — pure integer arithmetic after the two floors."""
    lonb = f"CAST(floor((({lon}) + 180.0) / 360.0 * 32768.0) AS BIGINT)"
    latb = f"CAST(floor((({lat}) + 90.0) / 180.0 * 32768.0) AS BIGINT)"
    terms = []
    for t in range(15):
        terms.append(f"((({lonb}) >> {14 - t}) & 1) * {1 << (29 - 2 * t)}")
        terms.append(f"((({latb}) >> {14 - t}) & 1) * {1 << (28 - 2 * t)}")
    return "(" + " + ".join(terms) + ")"


def _geohash_str_sql(bits: str) -> str:
    chars = [
        f"substr('{_GEOHASH_ALPHABET}', CAST((({bits}) >> {25 - 5 * i}) & 31 AS INT) + 1, 1)"
        for i in range(_GEOHASH_CHARS)
    ]
    return "concat(" + ", ".join(chars) + ")"


def geohash6(lat, lon):
    """Column expression: standard 6-char geohash of (lat, lon) — the
    interoperable cell id every geo stack understands (vs the internal
    grid cells of `join_geo_grid`). Bit-exact across engines: two
    floors, then integer shifts only."""
    lat_s, lon_s = "__gh_lat", "__gh_lon"
    expr = _geohash_str_sql(_geohash_bits_sql(lat_s, lon_s))
    return F.expr(expr.replace(lat_s, "lat").replace(lon_s, "lon"))


_GEOHASH_ORACLE = f"""
    WITH pts AS (
      SELECT c_custkey, {_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM customer
    )
    SELECT c_custkey, {_geohash_str_sql(_geohash_bits_sql("lat", "lon"))} AS gh6
    FROM pts
"""


@register("geo_geohash_encode", oracle=_GEOHASH_ORACLE, tags=("geo",))
def geo_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard base-32 geohash encoding (6 chars ≈ 1.2 km × 0.6 km
    cells): normalize → 15-bit quantize per axis → lon-first bit
    interleave → base-32 chars. The Morton/Z-order kernel again
    (`sink_zorder_layout`) but emitting the INTEROP string format, so
    cells join directly against external geo datasets. Zero shuffle,
    whole-stage codegen; prefix truncation gives coarser cells for
    free (substr(gh6, 1, k))."""
    pts = _points(spark, sf_dir)
    return pts.select("c_custkey", geohash6(F.col("lat"), F.col("lon")).alias("gh6"))
