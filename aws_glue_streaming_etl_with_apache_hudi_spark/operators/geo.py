"""Geospatial primitives: haversine distance, synthetic coordinates,
latitude-band bucketing for distributed radius joins.

The fixture tables carry no lat/lon columns, so coordinates are DERIVED
deterministically from integer keys with exact integer arithmetic —
``((key * P) % M) / 100.0`` — which both engines (Spark, DuckDB) compute
bit-identically: the modular product is exact in 64-bit, and dividing the
same integer by 100.0 is one IEEE round-to-nearest each side. Only the
trig that follows can diverge (libm vs java.lang.Math, ~1 ulp), so every
distance that crosses the oracle boundary is rounded to 4 decimals
(~10 cm) first.

Scale design (the 100 TB story):

- ``haversine_km`` is a pure JVM column expression — whole-stage codegen,
  no UDF, no Python.
- Radius joins NEVER cross-join: ``lat_band`` buckets rows into 1-degree
  latitude bands, and great-circle distance >= meridian distance
  (|dlat| * 111.195 km/deg), so every pair within R km sits within
  ``ceil(R / 111.195 / band_deg)`` bands of each other. One side keeps
  its single band, the probe side explodes the +/-k neighborhood, and
  the join is a plain equi-shuffle on the band key — partition count
  grows with the data, no single task sees more than a band.
- Nearest-site lookups broadcast the (small) query-point side and reduce
  with a lexicographic ``min(struct(dist, key))`` — one map-side-combined
  aggregation, ties broken deterministically by key, no window.

Reference anchor: the reference pipeline (glue_job_script.py:87-101)
ships rows with arbitrary payload columns through the same
transform-then-upsert path; geo enrichment is a transform stage a
user of that pipeline would register exactly like this module's
expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mean Earth radius (km) — IUGG value used by both sides of every oracle.
EARTH_RADIUS_KM = 6371.0

#: km per degree of latitude at the mean radius (pi/180 * R). Used to
#: size latitude bands so band pruning is provably complete.
KM_PER_LAT_DEG = 111.19492664455873


def synthetic_lat(key: Column) -> Column:
    """Deterministic latitude in [-90, 89.99] from an integer key.

    ``((key * 7919) % 18000) / 100 - 90`` — 7919 is coprime to 18000 so
    consecutive keys spread over the full range. Exact integer math both
    engines; the SQL twin is :data:`SYNTH_LAT_SQL`.
    """
    return ((key * F.lit(7919)) % F.lit(18000)) / F.lit(100.0) - F.lit(90.0)


def synthetic_lon(key: Column) -> Column:
    """Deterministic longitude in [-180, 179.99] from an integer key."""
    return ((key * F.lit(104729)) % F.lit(36000)) / F.lit(100.0) - F.lit(180.0)


def synth_lat_sql(key: str) -> str:
    """DuckDB-side twin of :func:`synthetic_lat`."""
    return f"((({key}) * 7919) % 18000) / 100.0 - 90.0"


def synth_lon_sql(key: str) -> str:
    """DuckDB-side twin of :func:`synthetic_lon`."""
    return f"((({key}) * 104729) % 36000) / 100.0 - 180.0"


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km — pure built-in column expression.

    ``2R * asin(sqrt(sin^2(dphi/2) + cos(phi1) cos(phi2) sin^2(dlmb/2)))``

    Stays inside whole-stage codegen (radians/sin/cos/asin/sqrt are all
    JVM intrinsics); the SQL twin is :func:`haversine_sql`. LEAST(1.0, .)
    clamps the asin argument against rounding just past 1 for antipodal
    points — both sides clamp identically.
    """
    phi1, phi2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1) / F.lit(2.0)
    dlmb = F.radians(lon2 - lon1) / F.lit(2.0)
    h = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(phi1) * F.cos(phi2) * F.sin(dlmb) * F.sin(dlmb)
    )
    return (
        F.lit(2.0 * EARTH_RADIUS_KM)
        * F.asin(F.sqrt(F.least(F.lit(1.0), h)))
    )


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """DuckDB-side twin of :func:`haversine_km` (same clamp, same radius)."""
    return (
        f"2 * {EARTH_RADIUS_KM} * asin(sqrt(least(1.0, "
        f"pow(sin(radians(({lat2}) - ({lat1})) / 2), 2) + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * "
        f"pow(sin(radians(({lon2}) - ({lon1})) / 2), 2))))"
    )


def lat_band(lat: Column, band_deg: float = 1.0) -> Column:
    """Latitude band id: ``floor(lat / band_deg)`` as a long join key."""
    return F.floor(lat / F.lit(band_deg)).cast("long")


def band_reach(radius_km: float, band_deg: float = 1.0) -> int:
    """How many neighbor bands a radius can cross.

    Great-circle distance >= |dlat| * KM_PER_LAT_DEG, so two points
    within ``radius_km`` differ in latitude by at most
    ``radius_km / KM_PER_LAT_DEG`` degrees — i.e. at most
    ``floor(that / band_deg) + 1`` band ids apart.
    """
    import math

    return int(math.floor(radius_km / KM_PER_LAT_DEG / band_deg)) + 1


def neighbor_bands(lat: Column, radius_km: float, band_deg: float = 1.0) -> Column:
    """Array of candidate band ids covering every point within the radius.

    Explode this on the PROBE side of a radius join and equi-join against
    the build side's single :func:`lat_band` — completeness follows from
    :func:`band_reach`; each build row sits in exactly one band so no
    pair is produced twice.
    """
    k = band_reach(radius_km, band_deg)
    base = lat_band(lat, band_deg)
    return F.array(*[base + F.lit(i) for i in range(-k, k + 1)])
