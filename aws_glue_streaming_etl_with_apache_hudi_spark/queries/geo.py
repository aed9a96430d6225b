"""Geospatial query family (round-10 surface).

Coordinates are derived deterministically from integer keys
(operators/geo.py — exact modular arithmetic, bit-identical in both
engines); supplier sites use a +500000 key offset so the two layers
don't trivially coincide. Every distance that crosses an oracle
boundary (a filter or an ordering) is rounded to 4 decimals (~10 cm)
BEFORE the boundary, so ~1-ulp libm-vs-JVM trig differences cannot
flip a comparison.

Scale design per query (the 100 TB story):

- ``geo_grid_density``: one map-side-combinable aggregation on the
  grid-cell key, then TakeOrdered for the top cells — no window, no
  join; partition count grows with data.
- ``geo_nearest_site``: the knn_bruteforce shape — the bounded query
  side (20 points) broadcasts, the big site table streams map-side,
  and the argmin is a lexicographic ``min(struct(dist, key))``
  aggregation (ties key-deterministic). No window over the big side.
- ``geo_radius_pairs``: NEVER a cross join at scale — the 2D
  adaptive grid (operators/geo.py grid_radius_join): suppliers keep
  ONE (lat-band, lon-cell) key, customers explode the candidate
  neighborhood, and the join is a plain equi-shuffle on the grid
  key; cells are ~radius-sized wherever longitude means distance and
  degenerate to the pure band at the poles, so even a single-metro
  dataset keeps its shuffle parallel. Completeness is a theorem
  (module docstring in operators/geo.py) and pairs-exactness is
  property-tested. The oracle is the brute-force cross join —
  feasible at fixture scale only, which is exactly the point.

Reference anchor: transform-stage enrichment over the streamed rows,
the slot glue_job_script.py:87-101 leaves to the user.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_glue_streaming_etl_with_apache_hudi_spark.operators.geo import (
    grid_radius_join,
    haversine_km,
    haversine_sql,
    knn_ring_join,
    synth_lat_sql,
    synth_lon_sql,
    synthetic_lat,
    synthetic_lon,
)
from aws_glue_streaming_etl_with_apache_hudi_spark.queries.base import register, t

#: Supplier-site key offset — keeps the site layer's modular sequence
#: from trivially coinciding with customer keys (same derivation, same
#: key value => same point; see operators/geo.py docstring).
_SITE_OFFSET = 500000

_RADIUS_KM = 500.0

_HAV_CS = haversine_sql("c.lat", "c.lon", "s.lat", "s.lon")

_CUST_PTS_SQL = f"""
  SELECT c_custkey, c_nationkey,
         {synth_lat_sql('c_custkey')} AS lat,
         {synth_lon_sql('c_custkey')} AS lon
  FROM customer
"""

_SITE_PTS_SQL = f"""
  SELECT s_suppkey,
         {synth_lat_sql(f's_suppkey + {_SITE_OFFSET}')} AS lat,
         {synth_lon_sql(f's_suppkey + {_SITE_OFFSET}')} AS lon
  FROM supplier
"""


def _cust_pts(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        synthetic_lat(key).alias("lat"),
        synthetic_lon(key).alias("lon"),
    )


def _site_pts(spark, sf_dir):
    s = t(spark, sf_dir, "supplier")
    key = F.col("s_suppkey") + F.lit(_SITE_OFFSET)
    return s.select(
        "s_suppkey",
        synthetic_lat(key).alias("lat"),
        synthetic_lon(key).alias("lon"),
    )


@register(
    "geo_grid_density",
    sql=f"""
    WITH pts AS (
      SELECT user_id, value,
             {synth_lat_sql('user_id')} AS lat,
             {synth_lon_sql('user_id')} AS lon
      FROM events
    )
    SELECT CAST(floor(lat / 10) AS BIGINT) AS cell_lat,
           CAST(floor(lon / 10) AS BIGINT) AS cell_lon,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
             AS avg_value
    FROM pts
    GROUP BY cell_lat, cell_lon
    ORDER BY n_events DESC, cell_lat, cell_lon
    LIMIT 20
    """,
)
def geo_grid_density(spark, sf_dir):
    """Spatial density grid: events bucketed into 10-degree cells —
    the heatmap/tile aggregation every geo dashboard starts from.
    Per cell: event count, distinct users, exact-decimal mean value.

    Scale: a single map-side-combinable aggregation on the cell key
    plus TakeOrdered(20) — no join, no window. Cell keys are exact
    longs (floor of exact coordinates), the mean is a DECIMAL sum
    divided by the count (identical IEEE division both engines)."""
    e = t(spark, sf_dir, "events")
    key = F.col("user_id")
    pts = e.select(
        "user_id",
        "value",
        synthetic_lat(key).alias("lat"),
        synthetic_lon(key).alias("lon"),
    )
    cells = pts.groupBy(
        F.floor(F.col("lat") / 10).cast("long").alias("cell_lat"),
        F.floor(F.col("lon") / 10).cast("long").alias("cell_lon"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_value"),
    )
    return cells.orderBy(
        F.desc("n_events"), "cell_lat", "cell_lon"
    ).limit(20)


@register(
    "geo_nearest_site",
    sql=f"""
    WITH c AS (
      SELECT * FROM ({_CUST_PTS_SQL}) WHERE c_custkey <= 20
    ), s AS ({_SITE_PTS_SQL}),
    j AS (
      SELECT c.c_custkey, s.s_suppkey,
             round({_HAV_CS}, 4) AS d
      FROM c CROSS JOIN s
    )
    SELECT c_custkey, s_suppkey AS nearest_suppkey, d AS dist_km
    FROM j
    QUALIFY row_number() OVER (
      PARTITION BY c_custkey ORDER BY d, s_suppkey) = 1
    ORDER BY c_custkey
    """,
)
def geo_nearest_site(spark, sf_dir):
    """Nearest-site lookup: for 21 fixed query points (custkeys 0-20,
    0-based fixture keys), the closest
    supplier site by great-circle distance — store-locator /
    assign-to-nearest-facility semantics.

    Scale: the knn_bruteforce shape — broadcast the bounded query
    side, stream the big site table map-side, reduce with ONE
    lexicographic ``min(struct(dist, key))`` aggregation (partial
    aggregation combines per partition; ties break on the smaller
    key, matching the oracle's ``ORDER BY d, s_suppkey`` exactly).
    No window touches the big side; the oracle's QUALIFY window is
    DuckDB-side only."""
    qpts = _cust_pts(spark, sf_dir).filter(F.col("c_custkey") <= 20)
    sites = _site_pts(spark, sf_dir)
    d = F.round(
        haversine_km(
            F.col("q.lat"), F.col("q.lon"), F.col("s.lat"), F.col("s.lon")
        ),
        4,
    )
    j = sites.alias("s").join(F.broadcast(qpts.alias("q")))
    best = (
        j.select(F.col("q.c_custkey").alias("c_custkey"),
                 F.struct(d.alias("d"), F.col("s.s_suppkey").alias("k")).alias("cand"))
        .groupBy("c_custkey")
        .agg(F.min("cand").alias("m"))
    )
    return best.select(
        "c_custkey",
        F.col("m.k").alias("nearest_suppkey"),
        F.col("m.d").alias("dist_km"),
    ).orderBy("c_custkey")


@register(
    "geo_radius_pairs",
    sql=f"""
    WITH c AS ({_CUST_PTS_SQL}), s AS ({_SITE_PTS_SQL}),
    pairs AS (
      SELECT c.c_nationkey, c.c_custkey,
             round({_HAV_CS}, 4) AS d
      FROM c CROSS JOIN s
    )
    SELECT c_nationkey,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_near_customers,
           min(d) AS min_km
    FROM pairs
    WHERE d <= {_RADIUS_KM}
    GROUP BY c_nationkey ORDER BY c_nationkey
    """,
)
def geo_radius_pairs(spark, sf_dir):
    """Distributed radius join: (customer, site) pairs within 500 km,
    rolled up per customer nation — the spatial-proximity join behind
    geofencing, catchment analysis, and POI matching.

    Scale: 2D adaptive-grid bucketing instead of the oracle's cross
    join (operators/geo.py grid_radius_join) — sites keep ONE
    (lat-band, lon-cell) key, customers explode the candidate
    neighborhood, and the join is an equi-shuffle on the grid key;
    the exact haversine filter runs only on cell-colocated
    candidates. Longitude cells are sized per band from the
    completeness bound (sin(d/2R) >= cos(phi_max) sin(dlmb/2) +
    Jordan), degenerating to the pure latitude band at the poles —
    so a single-metro dataset spreads over ~radius-sized cells
    instead of funneling one latitude band through (2k+1) tasks.
    Pairs-exact vs brute force is property-tested (tests/test_geo.py,
    adversarial coordinates included); no pair is produced twice
    because each site holds exactly one key."""
    cust = _cust_pts(spark, sf_dir)
    sites = (
        _site_pts(spark, sf_dir)
        .withColumnRenamed("lat", "b_lat")
        .withColumnRenamed("lon", "b_lon")
    )
    pairs = grid_radius_join(cust, sites, _RADIUS_KM, dist_col="d").select(
        "c_nationkey", "c_custkey", "d"
    )
    return (
        pairs.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.countDistinct("c_custkey").cast("long").alias("n_near_customers"),
            F.min("d").alias("min_km"),
        )
        .orderBy("c_nationkey")
    )


_KNN_RADIUS_KM = 2000.0


@register(
    "geo_knn_sites",
    sql=f"""
    WITH c AS ({_CUST_PTS_SQL}), s AS ({_SITE_PTS_SQL}),
    pairs AS (
      SELECT c.c_custkey, s.s_suppkey,
             round({_HAV_CS}, 4) AS dist_km
      FROM c CROSS JOIN s
    ), ranked AS (
      SELECT c_custkey, s_suppkey, dist_km,
             CAST(row_number() OVER (
               PARTITION BY c_custkey ORDER BY dist_km, s_suppkey) AS INT)
               AS rn
      FROM pairs WHERE dist_km <= {_KNN_RADIUS_KM}
    )
    SELECT c_custkey, s_suppkey, dist_km, rn
    FROM ranked WHERE rn <= 3
    ORDER BY c_custkey, rn
    """,
)
def geo_knn_sites(spark, sf_dir):
    """Spatial kNN JOIN: every customer's 3 nearest sites within a
    2000 km service radius — the assign-to-k-nearest-facilities /
    store-catchment join, where BOTH sides are large (unlike
    geo_nearest_site's 20 broadcast query points).

    Scale: grid_radius_join prunes candidates to grid-colocated pairs
    (2000 km cells — no cross join), then a row_number window
    partitioned by the DATA-KEYED c_custkey (unbounded domain, shuffle
    parallel) keeps the top-3 by (distance, site key) — tie-safe and
    identical to the oracle's ordering. The radius cap is what makes a
    distributed kNN join well-posed: an uncapped kNN needs ring
    expansion for isolated points; capped, completeness follows from
    the grid theorem."""
    cust = _cust_pts(spark, sf_dir)
    sites = (
        _site_pts(spark, sf_dir)
        .withColumnRenamed("lat", "b_lat")
        .withColumnRenamed("lon", "b_lon")
    )
    pairs = grid_radius_join(cust, sites, _KNN_RADIUS_KM, dist_col="dist_km")
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("c_custkey").orderBy("dist_km", "s_suppkey")
    )
    return (
        pairs.select("c_custkey", "s_suppkey", "dist_km")
        .withColumn("rn", rn.cast("int"))
        .filter(F.col("rn") <= 3)
        .orderBy("c_custkey", "rn")
    )


#: Uncapped-kNN demonstration belt: sites restricted to |lat| <= 20 so
#: high-latitude customers are ISOLATED (nearest site >= ~7800 km away)
#: and the ring expansion's wide rounds actually fire.
_BELT_LAT = 20.0


@register(
    "geo_knn_uncapped",
    sql=f"""
    WITH c AS ({_CUST_PTS_SQL}),
    s AS (SELECT * FROM ({_SITE_PTS_SQL}) WHERE abs(lat) <= {_BELT_LAT}),
    pairs AS (
      SELECT c.c_custkey, s.s_suppkey,
             round({_HAV_CS}, 4) AS dist_km
      FROM c CROSS JOIN s
    ), ranked AS (
      SELECT c_custkey, s_suppkey, dist_km,
             CAST(row_number() OVER (
               PARTITION BY c_custkey ORDER BY dist_km, s_suppkey) AS INT)
               AS knn_rank
      FROM pairs
    )
    SELECT c_custkey, s_suppkey, dist_km, knn_rank
    FROM ranked WHERE knn_rank <= 2
    ORDER BY c_custkey, knn_rank
    """,
)
def geo_knn_uncapped(spark, sf_dir):
    """UNCAPPED spatial kNN join (VERDICT r10 task 5): every customer's
    2 nearest sites with NO service-radius assumption, against a site
    layer confined to the |lat| <= 20 belt — so polar customers sit
    thousands of km from their nearest site and a fixed-radius plan
    (geo_knn_sites) would silently drop them.

    Scale: operators/geo.py ``knn_ring_join`` — bounded-round ring
    expansion (500 -> 2000 -> 8000 -> 20016 km, the last past the
    antipodal bound). Each round joins only the still-unresolved
    probes on the (band, cell) grid; a probe holding >= k candidates
    inside ring R owns its true global top-k by the grid completeness
    theorem. The oracle is the definitional uncapped cross-join kNN —
    feasible at fixture scale only, which is the point."""
    cust = _cust_pts(spark, sf_dir)
    sites = (
        _site_pts(spark, sf_dir)
        .filter(F.abs(F.col("lat")) <= _BELT_LAT)
        .withColumnRenamed("lat", "b_lat")
        .withColumnRenamed("lon", "b_lon")
    )
    out = knn_ring_join(cust, sites, probe_key="c_custkey", k=2)
    return out.select("c_custkey", "s_suppkey", "dist_km", "knn_rank").orderBy(
        "c_custkey", "knn_rank"
    )


# -- point-in-polygon (ray casting) ------------------------------------------

#: Test zones as (lon, lat) vertex rings (planar treatment of lon/lat —
#: documented; these are gerrymandered to include a concave shape).
_ZONES: dict[str, list[tuple[float, float]]] = {
    "zone_a": [(-120.0, 10.0), (-60.0, 5.0), (-40.0, 50.0), (-90.0, 70.0), (-130.0, 45.0)],
    "zone_b": [(0.0, -60.0), (60.0, -60.0), (60.0, -20.0), (30.0, -20.0), (30.0, 10.0), (0.0, 10.0)],
    "zone_c": [(100.0, -30.0), (170.0, -25.0), (160.0, 35.0), (110.0, 25.0)],
}


def _zone_edges(zone: str) -> list[tuple[float, float, float, float]]:
    vs = _ZONES[zone]
    return [(*vs[i], *vs[(i + 1) % len(vs)]) for i in range(len(vs))]


def _crossings_sql(zone: str, px: str, py: str) -> str:
    """Ray-cast crossing count for one polygon, rendered as an explicit
    sum of per-edge indicators — the IDENTICAL expression both engines
    evaluate on identical doubles, so even boundary-grazing points get
    the same verdict (no tie rule needed beyond the formula itself)."""
    terms = []
    for x1, y1, x2, y2 in _zone_edges(zone):
        terms.append(
            f"(CASE WHEN (({y1!r} > {py}) <> ({y2!r} > {py}))"
            f" AND ({px} < ({x2!r} - {x1!r}) * ({py} - {y1!r})"
            f" / ({y2!r} - {y1!r}) + {x1!r}) THEN 1 ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


@register(
    "geo_point_in_polygon",
    sql=f"""
    WITH pts AS (
      SELECT c_custkey,
             {synth_lon_sql('c_custkey')} AS lon,
             {synth_lat_sql('c_custkey')} AS lat
      FROM customer
    ),
    hits AS (
      SELECT 'zone_a' AS zone, c_custkey FROM pts
      WHERE {_crossings_sql('zone_a', 'lon', 'lat')} % 2 = 1
      UNION ALL
      SELECT 'zone_b', c_custkey FROM pts
      WHERE {_crossings_sql('zone_b', 'lon', 'lat')} % 2 = 1
      UNION ALL
      SELECT 'zone_c', c_custkey FROM pts
      WHERE {_crossings_sql('zone_c', 'lon', 'lat')} % 2 = 1
    )
    SELECT zone, CAST(count(*) AS BIGINT) AS n_inside,
           CAST(min(c_custkey) AS BIGINT) AS first_key,
           CAST(sum(c_custkey) AS BIGINT) AS key_sum
    FROM hits GROUP BY zone ORDER BY zone
    """,
)
def geo_point_in_polygon(spark, sf_dir):
    """Point-in-polygon zone assignment by ray casting — the geofencing
    primitive (which delivery zone / jurisdiction / geofence contains
    each point): three fixed test polygons (one concave) broadcast as
    per-edge crossing indicators, each customer point evaluates the
    explicit crossing sum ROW-LOCALLY and lands inside on odd parity.
    Both engines run the literally identical per-edge formula on
    identical doubles, so boundary-grazing points cannot diverge. The
    membership census (count, min key, key checksum) is the oracle
    contract.

    Scale: zero shuffle before the O(zones) census — the polygon set
    rides the closure (a real deployment broadcasts an R-tree of edges
    and prunes by bounding box first; with 3 polygons the explicit sum
    IS the pruned form). Planar lon/lat treatment, documented: correct
    for zones away from the antimeridian, like these."""
    pts = t(spark, sf_dir, "customer").select(
        "c_custkey",
        synthetic_lon(F.col("c_custkey")).alias("lon"),
        synthetic_lat(F.col("c_custkey")).alias("lat"),
    )
    legs = []
    for zone in _ZONES:
        crossings = F.expr(_crossings_sql(zone, "lon", "lat"))
        legs.append(
            pts.filter(crossings % 2 == 1).select(
                F.lit(zone).alias("zone"), "c_custkey"
            )
        )
    hits = legs[0].unionByName(legs[1]).unionByName(legs[2])
    return (
        hits.groupBy("zone")
        .agg(
            F.count(F.lit(1)).alias("n_inside"),
            F.min("c_custkey").alias("first_key"),
            F.sum("c_custkey").alias("key_sum"),
        )
        .orderBy("zone")
    )
