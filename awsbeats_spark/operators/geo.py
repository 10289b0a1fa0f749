"""Geospatial operators — engine extension (SURVEY.md §2.C).

The reference ships host/geo metadata untouched inside the event JSON
(`/root/reference/streams/client.go:96-125` serializes whatever libbeat
put in the record); a fleet-scale analytics engine needs to JOIN on
location, which a naive approach does as an all-pairs distance check —
O(n·m) and untenable at 100 TB. These operators implement the standard
scale shape instead: **grid-blocked spatial join** — bucket every point
into a fixed lat/lon grid cell, equi-join on cell (with 3x3 neighbor
expansion on the small side), THEN compute exact haversine distance on
the candidate pairs only. The expensive trig runs on the grid-pruned
candidate set, not the cross product, and the equi-join shuffles on the
cell key exactly like any other hash join.

The test tables carry no coordinates, so both engines derive synthetic
ones from the integer keys with the SAME linear-congruential projection
(integer arithmetic — bit-identical cross-engine). On a real deployment
the projection is replaced by the actual lat/lon columns; every plan
property (grid bucketing, neighbor expansion, candidate-only trig) is
independent of where the coordinates come from.

Determinism note: the candidate *generation* is pure integer math; only
the final haversine (libm trig on both engines) is floating, and it is
rounded before aggregation so last-bit libm drift cannot flip output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from awsbeats_spark.catalog import tables
from awsbeats_spark.functions.rounding import rnd
from awsbeats_spark.registry import query

# LCG projection constants (classic 233280 modulus): lat in [-85, 85]
# (poles excluded — grid cells degenerate there), lon in [-180, 180).
_M = 233280
_LAT_SPAN, _LAT_OFF = 170.0, -85.0
_LON_SPAN, _LON_OFF = 360.0, -180.0

#: grid cell edge in degrees; 5 deg ~ 556 km of latitude, so one cell +
#: one neighbor ring covers every pair within the 500 km radius for
#: |lat| < ~64 deg (above that, longitude convergence can push a pair
#: beyond the ring — the blocked-join contract below is the operator
#: spec on BOTH engines, so parity is exact; a polar deployment widens
#: the ring as ceil(R / (111*cos(lat))) cells, same plan shape).
#: Longitude cells wrap modulo the 72-cell circumference so pairs that
#: straddle the antimeridian (lon 179.9 vs -179.9) still meet; the
#: haversine itself is 360-periodic in dlon, so only candidate
#: generation needs the wrap.
_CELL_DEG = 5
_LON_CELLS = 360 // _CELL_DEG  # 72, cells [-36, 35]
_RADIUS_KM = 500.0
_EARTH_KM = 6371.0


def _lat(key: Column) -> Column:
    return ((key * 9301 + 49297) % _M) / float(_M) * _LAT_SPAN + _LAT_OFF


def _lon(key: Column) -> Column:
    return ((key * 49297 + 9301) % _M) / float(_M) * _LON_SPAN + _LON_OFF


def _lat_sql(key: str) -> str:
    return f"(({key} * 9301 + 49297) % {_M}) / {float(_M)} * {_LAT_SPAN} + {_LAT_OFF}"


def _lon_sql(key: str) -> str:
    return f"(({key} * 49297 + 9301) % {_M}) / {float(_M)} * {_LON_SPAN} + {_LON_OFF}"


def _cell(deg: Column) -> Column:
    # floor() on the raw LCG double: the quotient feeding floor() is
    # identical on both engines (same integer numerator, same constant
    # divisor), so the bucket id is too.
    return F.floor(deg / F.lit(float(_CELL_DEG))).cast("long")


def _cell_sql(deg_sql: str) -> str:
    return f"CAST(floor(({deg_sql}) / {float(_CELL_DEG)}) AS BIGINT)"


def _haversine_km(lat1, lon1, lat2, lon2) -> Column:
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    h = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(F.sin(dlon / 2), 2)
    )
    return 2.0 * _EARTH_KM * F.asin(F.sqrt(h))


_HAVERSINE_SQL = (
    f"2.0 * {_EARTH_KM} * asin(sqrt("
    "pow(sin(radians(c_lat - s_lat) / 2), 2)"
    " + cos(radians(s_lat)) * cos(radians(c_lat))"
    " * pow(sin(radians(c_lon - s_lon) / 2), 2)))"
)


@query(
    "geo_grid_neighbor_join",
    oracle=f"""
    WITH cust AS (
        SELECT c_custkey,
               {_lat_sql('c_custkey')} AS c_lat,
               {_lon_sql('c_custkey')} AS c_lon
        FROM customer
    ),
    cust_cells AS (
        SELECT *,
               {_cell_sql('c_lat')} AS cell_lat,
               {_cell_sql('c_lon')} AS cell_lon
        FROM cust
    ),
    supp AS (
        SELECT s_suppkey,
               {_lat_sql('s_suppkey')} AS s_lat,
               {_lon_sql('s_suppkey')} AS s_lon
        FROM supplier
    ),
    supp_cells AS (
        SELECT s.*,
               {_cell_sql('s_lat')} + dlat AS cell_lat,
               (({_cell_sql('s_lon')} + dlon + 36) % 72 + 72) % 72 - 36
                   AS cell_lon
        FROM supp s
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dlat) a
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dlon) b
    ),
    pairs AS (
        SELECT s_suppkey, c_custkey,
               round({_HAVERSINE_SQL}, 3) AS dist_km
        FROM supp_cells s
        JOIN cust_cells c USING (cell_lat, cell_lon)
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (
                   PARTITION BY s_suppkey
                   ORDER BY dist_km, c_custkey) AS rn
        FROM pairs
        WHERE dist_km <= {_RADIUS_KM}
    )
    SELECT s_suppkey,
           count(*) AS n_within,
           round(min(dist_km), 3) AS nearest_km,
           min(c_custkey) FILTER (WHERE rn = 1) AS nearest_custkey
    FROM ranked
    GROUP BY s_suppkey
    """,
)
def geo_grid_neighbor_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius spatial join, grid-blocked: for each supplier, the
    customers within 500 km — candidate pairs generated by a cell
    equi-join (supplier cells expanded to the 3x3 neighbor ring),
    haversine evaluated on candidates only.

    Scale shape: one scan per side; the 9x expansion happens on the
    SMALL side (suppliers — dims stay broadcastable; were both sides
    facts, the join shuffles both on (cell_lat, cell_lon) and each cell
    pair meets in one task — never an all-pairs product). At 1000
    executors the cell key distributes like any hash-join key; hot
    cells (urban skew) would salt exactly like `join_skew_salted`.
    """
    t = tables(spark, sf_dir)
    cust = t.customer.select(
        "c_custkey",
        _lat(F.col("c_custkey")).alias("c_lat"),
        _lon(F.col("c_custkey")).alias("c_lon"),
    ).select(
        "*",
        _cell(F.col("c_lat")).alias("cell_lat"),
        _cell(F.col("c_lon")).alias("cell_lon"),
    )
    offsets = F.expr(
        "explode(array(-1L, 0L, 1L))"
    )  # applied twice below for the 3x3 ring
    supp = (
        t.supplier.select(
            "s_suppkey",
            _lat(F.col("s_suppkey")).alias("s_lat"),
            _lon(F.col("s_suppkey")).alias("s_lon"),
        )
        .withColumn("dlat", offsets)
        .withColumn("dlon", F.expr("explode(array(-1L, 0L, 1L))"))
        .select(
            "*",
            (_cell(F.col("s_lat")) + F.col("dlat")).alias("cell_lat"),
            (
                ((_cell(F.col("s_lon")) + F.col("dlon") + 36) % 72 + 72) % 72 - 36
            ).alias("cell_lon"),
        )
    )
    dist = rnd(
        _haversine_km(
            F.col("s_lat"), F.col("s_lon"), F.col("c_lat"), F.col("c_lon")
        ),
        3,
    )
    pairs = (
        F.broadcast(supp)
        .join(cust, ["cell_lat", "cell_lon"])
        .select("s_suppkey", "c_custkey", dist.alias("dist_km"))
        .filter(F.col("dist_km") <= _RADIUS_KM)
    )
    return pairs.groupBy("s_suppkey").agg(
        F.count(F.lit(1)).alias("n_within"),
        rnd(F.min("dist_km"), 3).alias("nearest_km"),
        F.min_by(
            "c_custkey", F.struct(F.col("dist_km"), F.col("c_custkey"))
        ).alias("nearest_custkey"),
    )


@query(
    "geo_cell_density_topk",
    oracle=f"""
    SELECT cell_lat, cell_lon,
           count(*) AS n_customers,
           round(avg(c_acctbal), 4) AS avg_acctbal
    FROM (
        SELECT c_acctbal,
               {_cell_sql(_lat_sql('c_custkey'))} AS cell_lat,
               {_cell_sql(_lon_sql('c_custkey'))} AS cell_lon
        FROM customer
    )
    GROUP BY cell_lat, cell_lon
    ORDER BY n_customers DESC, cell_lat, cell_lon
    LIMIT 20
    """,
)
def geo_cell_density_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 densest grid cells (point-density heatmap feeding the
    skew diagnosis for the blocked join above: these ARE the cells one
    would salt). Single groupBy with map-side combine; top-k via
    TakeOrderedAndProject — no global sort materializes.
    """
    t = tables(spark, sf_dir)
    cells = t.customer.select(
        "c_acctbal",
        _cell(_lat(F.col("c_custkey"))).alias("cell_lat"),
        _cell(_lon(F.col("c_custkey"))).alias("cell_lon"),
    )
    return (
        cells.groupBy("cell_lat", "cell_lon")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            rnd(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
        .orderBy(F.desc("n_customers"), "cell_lat", "cell_lon")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Grid-blocked k-nearest-neighbors: top-3 suppliers per customer
# --------------------------------------------------------------------------

_KNN_K = 3


@query(
    "geo_knn_grid",
    oracle=f"""
    WITH cust AS (
        SELECT c_custkey,
               {_lat_sql('c_custkey')} AS c_lat,
               {_lon_sql('c_custkey')} AS c_lon
        FROM customer
    ),
    cust_cells AS (
        SELECT *,
               {_cell_sql('c_lat')} AS cell_lat,
               {_cell_sql('c_lon')} AS cell_lon
        FROM cust
    ),
    supp AS (
        SELECT s_suppkey,
               {_lat_sql('s_suppkey')} AS s_lat,
               {_lon_sql('s_suppkey')} AS s_lon
        FROM supplier
    ),
    supp_cells AS (
        SELECT s.*,
               {_cell_sql('s_lat')} + dlat AS cell_lat,
               (({_cell_sql('s_lon')} + dlon + 36) % 72 + 72) % 72 - 36
                   AS cell_lon
        FROM supp s
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dlat) a
        CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dlon) b
    ),
    pairs AS (
        SELECT c_custkey, s_suppkey,
               round({_HAVERSINE_SQL}, 3) AS dist_km
        FROM supp_cells s
        JOIN cust_cells c USING (cell_lat, cell_lon)
    )
    SELECT c_custkey, s_suppkey, dist_km,
           row_number() OVER (
               PARTITION BY c_custkey
               ORDER BY dist_km, s_suppkey) AS rn
    FROM pairs
    QUALIFY rn <= {_KNN_K}
    """,
)
def geo_knn_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-blocked spatial k-NN: each customer's 3 nearest suppliers
    among the 3x3-neighbor-ring candidates — the "assign every entity
    to its closest facilities" primitive (routing, coverage planning,
    nearest-warehouse enrichment). Same blocked contract as
    geo_grid_neighbor_join: candidates come from the cell equi-join
    (with antimeridian wrap), haversine runs on candidates only, and
    k-NN WITHIN the ring is the documented operator spec on both
    engines — a production deployment widens the ring (or iterates
    ring radius for customers with < k candidates) without changing
    the plan shape.

    Scale shape: the 9x expansion is on the supplier (small) side,
    broadcast; the per-customer top-k is a customer-partitioned rank
    window that Spark prunes with WindowGroupLimit before the final
    filter. Output is <= k rows per customer — bounded, never
    all-pairs."""
    t = tables(spark, sf_dir)
    cust = t.customer.select(
        "c_custkey",
        _lat(F.col("c_custkey")).alias("c_lat"),
        _lon(F.col("c_custkey")).alias("c_lon"),
    ).select(
        "*",
        _cell(F.col("c_lat")).alias("cell_lat"),
        _cell(F.col("c_lon")).alias("cell_lon"),
    )
    supp = (
        t.supplier.select(
            "s_suppkey",
            _lat(F.col("s_suppkey")).alias("s_lat"),
            _lon(F.col("s_suppkey")).alias("s_lon"),
        )
        .withColumn("dlat", F.expr("explode(array(-1L, 0L, 1L))"))
        .withColumn("dlon", F.expr("explode(array(-1L, 0L, 1L))"))
        .select(
            "*",
            (_cell(F.col("s_lat")) + F.col("dlat")).alias("cell_lat"),
            (
                ((_cell(F.col("s_lon")) + F.col("dlon") + 36) % 72 + 72)
                % 72
                - 36
            ).alias("cell_lon"),
        )
    )
    dist = rnd(
        _haversine_km(
            F.col("s_lat"), F.col("s_lon"), F.col("c_lat"), F.col("c_lon")
        ),
        3,
    )
    pairs = (
        F.broadcast(supp)
        .join(cust, ["cell_lat", "cell_lon"])
        .select("c_custkey", "s_suppkey", dist.alias("dist_km"))
    )
    rn = F.row_number().over(
        Window.partitionBy("c_custkey").orderBy(
            F.asc("dist_km"), F.asc("s_suppkey")
        )
    )
    return pairs.withColumn("rn", rn).filter(F.col("rn") <= _KNN_K)


# --------------------------------------------------------------------------
# Per-user trajectory distance (consecutive-hop haversine)
# --------------------------------------------------------------------------

_TRAVEL_TOP_K = 20


@query(
    "geo_user_travel_haversine",
    oracle=f"""
    WITH pts AS (
        SELECT user_id, ts, event_id,
               {_lat_sql('event_id')} AS lat,
               {_lon_sql('event_id')} AS lon
        FROM events
    ),
    hops AS (
        SELECT user_id,
               lag(lat) OVER w AS p_lat, lag(lon) OVER w AS p_lon,
               lat AS c_lat, lon AS c_lon
        FROM pts
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    dists AS (
        SELECT user_id,
               round({_HAVERSINE_SQL.replace('s_lat', 'p_lat').replace('s_lon', 'p_lon')}, 6)
                   AS hop_km
        FROM hops WHERE p_lat IS NOT NULL
    ),
    totals AS (
        SELECT user_id, count(*) AS n_hops,
               round(sum(hop_km), 4) AS total_km,
               round(max(hop_km), 4) AS max_hop_km
        FROM dists GROUP BY user_id
    )
    SELECT user_id, CAST(n_hops AS BIGINT) AS n_hops, total_km, max_hop_km
    FROM (
        SELECT *, row_number() OVER (
                   ORDER BY total_km DESC, user_id) AS rn
        FROM totals
    ) WHERE rn <= {_TRAVEL_TOP_K}
    """,
    tags=("geo",),
)
def geo_user_travel_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trajectory mileage: order each user's events in time,
    measure every consecutive hop with exact haversine, and rank the
    top {_TRAVEL_TOP_K} travellers by total distance — the
    trajectory-grain geo primitive (fleet mileage, bot-speed detection,
    impossible-travel fraud gates all reduce to exactly this lag +
    haversine shape). Coordinates come from the module's deterministic
    LCG projection of the event key (see the module docstring: a real
    deployment swaps in the actual lat/lon columns; every plan property
    is coordinate-source-independent). Hops are rounded BEFORE the sum
    (the module's libm-drift discipline) so cross-engine trig agreement
    is guaranteed at hash precision.

    Scale shape: one lag window per user partition (the natural
    shuffle: trajectory analysis is keyed by the moving entity), one
    keyed aggregate, one bounded top-k sort of user-grain rows. No
    pair joins anywhere — trajectory distance is linear in events. At
    100 TB: partition event files by user bucket and the window sort
    becomes a per-file merge."""
    t = tables(spark, sf_dir)
    pts = t.events.select(
        "user_id",
        "ts",
        "event_id",
        _lat(F.col("event_id")).alias("lat"),
        _lon(F.col("event_id")).alias("lon"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hops = pts.select(
        "user_id",
        F.lag("lat").over(w).alias("p_lat"),
        F.lag("lon").over(w).alias("p_lon"),
        F.col("lat").alias("c_lat"),
        F.col("lon").alias("c_lon"),
    ).filter(F.col("p_lat").isNotNull())
    dists = hops.select(
        "user_id",
        rnd(
            _haversine_km(
                F.col("p_lat"), F.col("p_lon"),
                F.col("c_lat"), F.col("c_lon"),
            ),
            6,
        ).alias("hop_km"),
    )
    totals = dists.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hops"),
        rnd(F.sum("hop_km"), 4).alias("total_km"),
        rnd(F.max("hop_km"), 4).alias("max_hop_km"),
    )
    wr = Window.orderBy(F.desc("total_km"), F.asc("user_id"))
    return (
        totals.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= _TRAVEL_TOP_K)
        .select("user_id", "n_hops", "total_km", "max_hop_km")
    )


geo_user_travel_haversine.__doc__ = geo_user_travel_haversine.__doc__.replace(
    "{_TRAVEL_TOP_K}", str(_TRAVEL_TOP_K)
)


# --------------------------------------------------------------------------
# Grid DBSCAN: dense-cell clustering by fixed-round label propagation
# --------------------------------------------------------------------------

_DBSCAN_MIN_PTS = 5
_DBSCAN_ROUNDS = 3

# linear cell index: lat cells span [-17, 16] for +-85 deg at 5 deg
_DBSCAN_LIN_SQL = (
    "CAST((cell_lat + 17) * {lc} + ((cell_lon % {lc} + {lc}) % {lc}) "
    "AS BIGINT)".format(lc=_LON_CELLS)
)


def _dbscan_round_sql(r: int) -> str:
    return f"""
    l{r} AS (
        SELECT e.a AS lin, min(least(l.lbl, l2.lbl)) AS lbl
        FROM adj e
        JOIN l{r - 1} l ON l.lin = e.a
        JOIN l{r - 1} l2 ON l2.lin = e.b
        GROUP BY e.a
    )"""


@query(
    "geo_dbscan_cells",
    oracle=f"""
    WITH pts AS (
        SELECT event_id,
               {_lat_sql('event_id')} AS lat, {_lon_sql('event_id')} AS lon
        FROM events
    ),
    cells AS (
        SELECT {_cell_sql('lat')} AS cell_lat, {_cell_sql('lon')} AS cell_lon,
               count(*) AS n_points
        FROM pts GROUP BY 1, 2
    ),
    dense AS (
        SELECT {_DBSCAN_LIN_SQL} AS lin, cell_lat, cell_lon, n_points
        FROM cells WHERE n_points >= {_DBSCAN_MIN_PTS}
    ),
    adj AS (
        SELECT a.lin AS a, b.lin AS b
        FROM dense a
        JOIN dense b
          ON b.cell_lat BETWEEN a.cell_lat - 1 AND a.cell_lat + 1
         AND ((b.cell_lon - a.cell_lon) % {_LON_CELLS} + {_LON_CELLS})
             % {_LON_CELLS} IN (0, 1, {_LON_CELLS - 1})
    ),
    l0 AS (SELECT lin, lin AS lbl FROM dense),
    {",".join(_dbscan_round_sql(r) for r in range(1, _DBSCAN_ROUNDS + 1))}
    SELECT d.cell_lat, d.cell_lon, CAST(d.n_points AS BIGINT) AS n_points,
           l.lbl AS cluster_id
    FROM dense d JOIN l{_DBSCAN_ROUNDS} l ON l.lin = d.lin
    """,
    tags=("geo",),
)
def geo_dbscan_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid DBSCAN — density-based spatial clustering in its
    cluster-scale formulation: bucket points into the module's 5-degree
    grid, keep DENSE cells (>= {minpts} points — the minPts rule at
    cell granularity), and merge 8-neighbor-adjacent dense cells into
    clusters by {rounds} rounds of synchronous min-label propagation
    (the [[graph_lpa_communities]] superstep shape; each cluster id is
    the smallest member cell's linear index). This is how DBSCAN is
    actually run on planetary point sets — cell-grid density first,
    exact point-level epsilon refinement only inside surviving cells —
    because the grid pass is ONE aggregate + ONE bounded
    neighbor-join, while naive DBSCAN is all-pairs
    ([[geo_grid_neighbor_join]] is the same blocking idea for joins).
    Longitude adjacency wraps the antimeridian via the module's
    modular-cell convention.

    Scale shape: the point scan collapses to cell grain immediately
    (map-side partial count); everything after runs on the bounded
    cell lattice (<= 34 x {lc} cells on Earth at 5 degrees, regardless
    of point count). Fixed rounds = fixed plan depth; label
    propagation on the lattice is a self-join on an 8-neighbor
    condition, broadcast-sized."""
    t = tables(spark, sf_dir)
    pts = t.events.select(
        _lat(F.col("event_id")).alias("lat"),
        _lon(F.col("event_id")).alias("lon"),
    )
    cells = pts.select(
        _cell(F.col("lat")).alias("cell_lat"),
        _cell(F.col("lon")).alias("cell_lon"),
    ).groupBy("cell_lat", "cell_lon").agg(
        F.count(F.lit(1)).alias("n_points")
    )
    lin = (
        (F.col("cell_lat") + 17) * _LON_CELLS
        + ((F.col("cell_lon") % _LON_CELLS) + _LON_CELLS) % _LON_CELLS
    ).cast("long")
    dense = cells.filter(F.col("n_points") >= _DBSCAN_MIN_PTS).select(
        lin.alias("lin"), "cell_lat", "cell_lon", "n_points"
    ).localCheckpoint(eager=True)
    da, db = dense.alias("da"), dense.alias("db")
    dlon = (
        (F.col("db.cell_lon") - F.col("da.cell_lon")) % _LON_CELLS
        + _LON_CELLS
    ) % _LON_CELLS
    adj = da.join(
        db,
        F.col("db.cell_lat").between(
            F.col("da.cell_lat") - 1, F.col("da.cell_lat") + 1
        )
        & dlon.isin(0, 1, _LON_CELLS - 1),
    ).select(F.col("da.lin").alias("a"), F.col("db.lin").alias("b"))
    labels = dense.select("lin", F.col("lin").alias("lbl"))
    for _ in range(_DBSCAN_ROUNDS):
        la = labels.select(F.col("lin").alias("a"), F.col("lbl").alias("la"))
        lb = labels.select(F.col("lin").alias("b"), F.col("lbl").alias("lb"))
        labels = (
            adj.join(la, "a")
            .join(lb, "b")
            .groupBy(F.col("a").alias("lin"))
            .agg(F.min(F.least(F.col("la"), F.col("lb"))).alias("lbl"))
        )
    return dense.join(labels, "lin").select(
        "cell_lat",
        "cell_lon",
        F.col("n_points").cast("long").alias("n_points"),
        F.col("lbl").alias("cluster_id"),
    )


geo_dbscan_cells.__doc__ = (
    geo_dbscan_cells.__doc__
    .replace("{minpts}", str(_DBSCAN_MIN_PTS))
    .replace("{rounds}", str(_DBSCAN_ROUNDS))
    .replace("{lc}", str(_LON_CELLS))
)


# --------------------------------------------------------------------------
# Impossible-travel fraud flags: hop speed over consecutive events
# --------------------------------------------------------------------------

_TRAVEL_MAX_KMH = 900.0  # commercial-flight ceiling


@query(
    "geo_impossible_travel_flags",
    oracle=f"""
    WITH pts AS (
        SELECT user_id, ts, event_id,
               {_lat_sql('event_id')} AS lat,
               {_lon_sql('event_id')} AS lon
        FROM events
    ),
    hops AS (
        SELECT user_id, ts, event_id,
               lag(lat) OVER w AS p_lat, lag(lon) OVER w AS p_lon,
               lag(ts) OVER w AS p_ts,
               lat AS c_lat, lon AS c_lon
        FROM pts
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    scored AS (
        SELECT user_id, event_id,
               round({_HAVERSINE_SQL.replace('s_lat', 'p_lat').replace('s_lon', 'p_lon')}, 4)
                   AS hop_km,
               round(epoch_us(ts - p_ts) / 3600000000.0, 6) AS gap_h
        FROM hops WHERE p_lat IS NOT NULL
    )
    SELECT user_id, event_id, hop_km, gap_h,
           round(hop_km / gap_h, 2) AS speed_kmh
    FROM scored
    WHERE gap_h > 0 AND hop_km / gap_h > {_TRAVEL_MAX_KMH}
    """,
    tags=("geo", "quality"),
)
def geo_impossible_travel_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Impossible-travel detection — the classic account-takeover /
    bot gate: consecutive events of one user whose implied ground
    speed (haversine hop distance over wall-clock gap) exceeds the
    {kmh} km/h commercial-flight ceiling are flagged with their speed.
    Same lag + haversine trajectory shape as
    [[geo_user_travel_haversine]] (which totals mileage; this one
    emits the violating hops), with the hop distance rounded before
    the division per the module's libm-drift discipline. Zero-gap
    pairs (same timestamp) are excluded: speed is undefined, and a
    same-second device switch is the session-anomaly lane's job, not
    a velocity violation.

    Scale shape: one lag window keyed by the moving entity, one
    row-local filter — linear, no joins; flags are a sparse output
    lane exactly like [[dq_quarantine_rows]]."""
    t = tables(spark, sf_dir)
    pts = t.events.select(
        "user_id",
        "ts",
        "event_id",
        _lat(F.col("event_id")).alias("lat"),
        _lon(F.col("event_id")).alias("lon"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hops = pts.select(
        "user_id",
        "event_id",
        F.lag("lat").over(w).alias("p_lat"),
        F.lag("lon").over(w).alias("p_lon"),
        F.lag("ts").over(w).alias("p_ts"),
        F.col("lat").alias("c_lat"),
        F.col("lon").alias("c_lon"),
        "ts",
    ).filter(F.col("p_lat").isNotNull())
    scored = hops.select(
        "user_id",
        "event_id",
        rnd(
            _haversine_km(
                F.col("p_lat"), F.col("p_lon"),
                F.col("c_lat"), F.col("c_lon"),
            ),
            4,
        ).alias("hop_km"),
        # EXACT integer micros difference, then ONE division by the same
        # constant as the oracle: casting each timestamp to double first
        # rounds at ~2^-21 s (epoch ~2^31 s eats 31 of the 52 mantissa
        # bits), and that 1e-10-hour wobble flipped a 6-dp rounding
        # knife edge at sf0.1 (4.8868135 -> .886813 vs .886814)
        rnd(
            (F.unix_micros("ts") - F.unix_micros("p_ts")) / 3.6e9,
            6,
        ).alias("gap_h"),
    )
    return scored.filter(
        (F.col("gap_h") > 0)
        & (F.col("hop_km") / F.col("gap_h") > _TRAVEL_MAX_KMH)
    ).select(
        "user_id",
        "event_id",
        "hop_km",
        "gap_h",
        rnd(F.col("hop_km") / F.col("gap_h"), 2).alias("speed_kmh"),
    )


geo_impossible_travel_flags.__doc__ = (
    geo_impossible_travel_flags.__doc__.replace(
        "{kmh}", str(int(_TRAVEL_MAX_KMH))
    )
)


# --------------------------------------------------------------------------
# Geohash encoding (bit-interleave, base32) + prefix density
# --------------------------------------------------------------------------

_GH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
_GH_PRECISION = 5  # 25 bits: 13 lon (even positions), 12 lat (odd)
_GH_LON_BITS = 13
_GH_LAT_BITS = 12
_GH_PREFIX = 3  # density grain (~156 x 156 km cells)
_GH_TOPK = 20


def _gh_code_terms(shr) -> str:
    """The 25 interleave terms as a SQL sum. `shr(x, n)` renders a
    right-shift in the target dialect (Spark: shiftright; DuckDB: >>).
    Bit i of the code (0 = MSB): even i takes the next lon bit, odd i
    the next lat bit — the geohash standard."""
    terms = []
    for b in range(_GH_LON_BITS):
        terms.append(
            f"({shr('lonq', _GH_LON_BITS - 1 - b)} & 1)"
            f" * {1 << (24 - 2 * b)}"
        )
    for b in range(_GH_LAT_BITS):
        terms.append(
            f"({shr('latq', _GH_LAT_BITS - 1 - b)} & 1)"
            f" * {1 << (23 - 2 * b)}"
        )
    return " + ".join(terms)


@query(
    "geo_geohash_density",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey,
               {_lat_sql('c_custkey')} AS lat,
               {_lon_sql('c_custkey')} AS lon
        FROM customer
    ),
    q AS (
        SELECT c_custkey,
               CAST(floor((lon + 180.0) / 360.0 * {1 << _GH_LON_BITS})
                    AS BIGINT) AS lonq,
               CAST(floor((lat + 90.0) / 180.0 * {1 << _GH_LAT_BITS})
                    AS BIGINT) AS latq
        FROM pts
    ),
    coded AS (
        SELECT c_custkey,
               {_gh_code_terms(lambda x, n: f"({x} >> {n})")} AS code
        FROM q
    ),
    gh AS (
        SELECT c_custkey,
               {" || ".join(
                   f"substring('{_GH_ALPHABET}',"
                   f" CAST(((code >> {20 - 5 * i}) & 31) + 1 AS INT), 1)"
                   for i in range(_GH_PRECISION)
               )} AS gh5
        FROM coded
    ),
    per5 AS (
        SELECT substring(gh5, 1, {_GH_PREFIX}) AS gh3, gh5,
               count(*) AS n
        FROM gh GROUP BY 1, 2
    ),
    dens AS (
        SELECT gh3,
               CAST(sum(n) AS BIGINT) AS n_points,
               CAST(count(*) AS BIGINT) AS n_cells5,
               min(gh5) AS min_gh5
        FROM per5 GROUP BY gh3
    )
    SELECT gh3, n_points, n_cells5, min_gh5,
           row_number() OVER (ORDER BY n_points DESC, gh3) AS rn
    FROM dens
    QUALIFY rn <= {_GH_TOPK}
    """,
)
def geo_geohash_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard geohash encoding (Niemeyer base32: quantize lon to 13
    bits / lat to 12, interleave lon-first, 5 bits per character) of
    the customer point set, aggregated to precision-3 prefix density
    with a per-prefix precision-5 exemplar — the index-construction
    primitive behind geohash range scans ("one prefix = one contiguous
    key range").

    Everything through the base32 string is INTEGER arithmetic on a
    floor()-quantized value whose double input is bit-identical across
    engines (same LCG projection as the rest of this module), so the
    hash is engine-portable with no float rounding anywhere. The bit
    interleave is a closed-form 25-term sum (no iterative bisection):
    bit i of the code takes lon bit i/2 for even i, lat bit (i-1)/2
    for odd — checked against a classic bisection-loop reference in
    tests/test_round6q_ops.py.

    Scale shape: encode is a map-side projection (whole-stage codegen,
    25 shift-mask terms); density is a two-level keyed rollup (gh5
    grain then gh3 — no COUNT DISTINCT Expand); top-k is
    TakeOrderedAndProject. One shuffle at any corpus size, and the gh3
    key is exactly what a 100-TB deployment would range-partition
    by."""
    t = tables(spark, sf_dir)
    pts = t.customer.select(
        "c_custkey",
        _lat(F.col("c_custkey")).alias("lat"),
        _lon(F.col("c_custkey")).alias("lon"),
    )
    q = pts.select(
        "c_custkey",
        F.floor((F.col("lon") + 180.0) / 360.0 * (1 << _GH_LON_BITS))
        .cast("long")
        .alias("lonq"),
        F.floor((F.col("lat") + 90.0) / 180.0 * (1 << _GH_LAT_BITS))
        .cast("long")
        .alias("latq"),
    )
    code = sum(
        (
            F.shiftright(F.col("lonq"), _GH_LON_BITS - 1 - b).bitwiseAND(
                F.lit(1)
            )
            * F.lit(1 << (24 - 2 * b))
            for b in range(_GH_LON_BITS)
        ),
        start=F.lit(0),
    ) + sum(
        (
            F.shiftright(F.col("latq"), _GH_LAT_BITS - 1 - b).bitwiseAND(
                F.lit(1)
            )
            * F.lit(1 << (23 - 2 * b))
            for b in range(_GH_LAT_BITS)
        ),
        start=F.lit(0),
    )
    alpha = F.array(*[F.lit(c) for c in _GH_ALPHABET])
    coded = q.select("c_custkey", code.alias("code"))
    gh5 = F.concat(
        *[
            F.element_at(
                alpha,
                (
                    F.shiftright(F.col("code"), 20 - 5 * i).bitwiseAND(
                        F.lit(31)
                    )
                    + 1
                ).cast("int"),
            )
            for i in range(_GH_PRECISION)
        ]
    )
    per5 = (
        coded.select(gh5.alias("gh5"))
        .select(F.substring("gh5", 1, _GH_PREFIX).alias("gh3"), "gh5")
        .groupBy("gh3", "gh5")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    dens = per5.groupBy("gh3").agg(
        F.sum("n").cast("long").alias("n_points"),
        F.count(F.lit(1)).cast("long").alias("n_cells5"),
        F.min("gh5").alias("min_gh5"),
    )
    rn = F.row_number().over(
        Window.partitionBy(F.lit(1)).orderBy(F.desc("n_points"), F.asc("gh3"))
    )
    return dens.withColumn("rn", rn).filter(F.col("rn") <= _GH_TOPK)


# --------------------------------------------------------------------------
# Bounding-box containment join (broadcast region dims)
# --------------------------------------------------------------------------

_BBOX_DLAT = 10.0  # box half-height (degrees)
_BBOX_DLON = 20.0  # box half-width


@query(
    "geo_bbox_assign",
    oracle=f"""
    WITH boxes AS (
        SELECT n_nationkey, n_name,
               {_lat_sql('n_nationkey')} AS b_lat,
               {_lon_sql('n_nationkey')} AS b_lon
        FROM nation
    ),
    pts AS (
        SELECT c_custkey,
               {_lat_sql('c_custkey')} AS c_lat,
               {_lon_sql('c_custkey')} AS c_lon
        FROM customer
    ),
    hit AS (
        SELECT b.n_nationkey, b.n_name,
               round(2.0 * {_EARTH_KM} * asin(sqrt(
                   pow(sin(radians(c_lat - b_lat) / 2), 2)
                   + cos(radians(b_lat)) * cos(radians(c_lat))
                   * pow(sin(radians(c_lon - b_lon) / 2), 2))), 6)
                   AS d_km
        FROM pts p JOIN boxes b
          ON p.c_lat BETWEEN b.b_lat - {_BBOX_DLAT}
                         AND b.b_lat + {_BBOX_DLAT}
         AND p.c_lon BETWEEN b.b_lon - {_BBOX_DLON}
                         AND b.b_lon + {_BBOX_DLON}
    )
    SELECT n_nationkey, n_name,
           CAST(count(*) AS BIGINT) AS n_points,
           round(avg(d_km), 4) AS avg_center_km,
           round(max(d_km), 4) AS max_center_km
    FROM hit GROUP BY n_nationkey, n_name
    """,
)
def geo_bbox_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-rectangle containment join: every nation carries a
    fixed lat/lon bounding box (center from the module's LCG
    projection, ±{dlat}°/±{dlon}°), and the customer point set is
    assigned to every box containing it — the "which region is this
    point in" primitive (geofencing, admin-area rollups), here in its
    axis-aligned form where containment is two BETWEEN predicates.

    Scale shape: the region dim is tiny and BROADCAST, so Spark runs a
    BroadcastNestedLoopJoin — the right plan for range predicates
    against a small dim (a hash join cannot express BETWEEN; the
    wrong plan would be a shuffle cartesian). Points stream through
    map-side, each testing ≤ |regions| boxes; overlapping boxes
    multi-assign by design (a point near a border belongs to both
    rollups). At PSL-scale region counts you grid-block first
    ([[geo_grid_neighbor_join]]'s cell trick) so each point tests only
    its cell's boxes; the containment predicate and the aggregate are
    unchanged. Distances round before aggregation (module contract:
    libm last-bit drift cannot flip output)."""
    t = tables(spark, sf_dir)
    boxes = t.nation.select(
        "n_nationkey",
        "n_name",
        _lat(F.col("n_nationkey")).alias("b_lat"),
        _lon(F.col("n_nationkey")).alias("b_lon"),
    )
    pts = t.customer.select(
        "c_custkey",
        _lat(F.col("c_custkey")).alias("c_lat"),
        _lon(F.col("c_custkey")).alias("c_lon"),
    )
    hit = pts.join(
        F.broadcast(boxes),
        (F.col("c_lat") >= F.col("b_lat") - _BBOX_DLAT)
        & (F.col("c_lat") <= F.col("b_lat") + _BBOX_DLAT)
        & (F.col("c_lon") >= F.col("b_lon") - _BBOX_DLON)
        & (F.col("c_lon") <= F.col("b_lon") + _BBOX_DLON),
    ).select(
        "n_nationkey",
        "n_name",
        rnd(
            _haversine_km(
                F.col("b_lat"), F.col("b_lon"), F.col("c_lat"), F.col("c_lon")
            ),
            6,
        ).alias("d_km"),
    )
    return hit.groupBy("n_nationkey", "n_name").agg(
        F.count(F.lit(1)).alias("n_points"),
        rnd(F.avg("d_km"), 4).alias("avg_center_km"),
        rnd(F.max("d_km"), 4).alias("max_center_km"),
    )


geo_bbox_assign.__doc__ = geo_bbox_assign.__doc__.replace(
    "{dlat}", str(int(_BBOX_DLAT))
).replace("{dlon}", str(int(_BBOX_DLON)))


# --------------------------------------------------------------------------
# Weiszfeld geometric median per region (fixed rounds)
# --------------------------------------------------------------------------

_WZ_ITERS = 3
_WZ_ROUND = 6
_WZ_EPS = 1e-9  # distance floor (Weiszfeld's singularity guard)


def _wz_round_sql(t: int) -> str:
    """One Weiszfeld round: inverse-distance-weighted mean against the
    previous iterate, both coordinates ROUNDED (float-portability)."""
    return f"""
    wz{t} AS (
        SELECT p.r_name,
               round(sum(p.lat / greatest(sqrt((p.lat - m.mlat) * (p.lat - m.mlat)
                         + (p.lon - m.mlon) * (p.lon - m.mlon)), {_WZ_EPS!r}))
                     / sum(1.0 / greatest(sqrt((p.lat - m.mlat) * (p.lat - m.mlat)
                         + (p.lon - m.mlon) * (p.lon - m.mlon)), {_WZ_EPS!r})),
                     {_WZ_ROUND}) AS mlat,
               round(sum(p.lon / greatest(sqrt((p.lat - m.mlat) * (p.lat - m.mlat)
                         + (p.lon - m.mlon) * (p.lon - m.mlon)), {_WZ_EPS!r}))
                     / sum(1.0 / greatest(sqrt((p.lat - m.mlat) * (p.lat - m.mlat)
                         + (p.lon - m.mlon) * (p.lon - m.mlon)), {_WZ_EPS!r})),
                     {_WZ_ROUND}) AS mlon
        FROM wpts p JOIN wz{t - 1} m USING (r_name)
        GROUP BY p.r_name
    )"""


@query(
    "geo_geometric_median_weiszfeld",
    oracle=f"""
    WITH wpts AS (
        SELECT r.r_name,
               {_lat_sql('c.c_custkey')} AS lat,
               {_lon_sql('c.c_custkey')} AS lon
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
    ),
    wz0 AS (
        SELECT r_name, round(avg(lat), {_WZ_ROUND}) AS mlat,
               round(avg(lon), {_WZ_ROUND}) AS mlon
        FROM wpts GROUP BY r_name
    ),
    {",".join(_wz_round_sql(t) for t in range(1, _WZ_ITERS + 1))},
    gain AS (
        SELECT p.r_name,
               count(*) AS n_points,
               avg(sqrt((p.lat - c0.mlat) * (p.lat - c0.mlat)
                        + (p.lon - c0.mlon) * (p.lon - c0.mlon)))
                   AS mean_d_centroid,
               avg(sqrt((p.lat - cf.mlat) * (p.lat - cf.mlat)
                        + (p.lon - cf.mlon) * (p.lon - cf.mlon)))
                   AS mean_d_gmedian
        FROM wpts p
        JOIN wz0 c0 USING (r_name)
        JOIN wz{_WZ_ITERS} cf USING (r_name)
        GROUP BY p.r_name
    )
    SELECT g.r_name,
           CAST(g.n_points AS BIGINT) AS n_points,
           round(c0.mlat, 4) AS centroid_lat,
           round(c0.mlon, 4) AS centroid_lon,
           round(cf.mlat, 4) AS gmedian_lat,
           round(cf.mlon, 4) AS gmedian_lon,
           round(g.mean_d_centroid, 4) AS mean_d_centroid,
           round(g.mean_d_gmedian, 4) AS mean_d_gmedian
    FROM gain g
    JOIN wz0 c0 USING (r_name)
    JOIN wz{_WZ_ITERS} cf USING (r_name)
    """,
)
def geo_geometric_median_weiszfeld(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GEOMETRIC MEDIAN of each region's customer point cloud by
    Weiszfeld's algorithm (1937; the classic facility-location
    iterate): {it} rounds of inverse-distance-weighted means starting
    from the centroid, with the standard distance-floor singularity
    guard. The geometric median is the ROBUST center — the point
    minimizing total distance, immune to a far-flung customer dragging
    the depot location the way the centroid is (the 2-D sibling of
    [[agg_huber_m_location]]); `mean_d_*` columns report the objective
    at the centroid vs the fitted median (median ≤ centroid by
    definition of the minimizer, pinned in tests). Planar degrees —
    the algorithm demo; a production siting job feeds projected
    coordinates.

    Per-round coordinates ROUND to {r} decimals in both engines (the
    fixed-rounds float pattern), so the whole iterate is hash-checked.
    Scale shape: each round is ONE keyed aggregate over the points
    with the tiny (region, iterate) state broadcast back — k rounds =
    k scans, map-side combined, no collect."""
    t = tables(spark, sf_dir)
    pts = (
        t.customer.join(
            F.broadcast(t.nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t.region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            "r_name",
            _lat(F.col("c_custkey")).alias("lat"),
            _lon(F.col("c_custkey")).alias("lon"),
        )
    )
    wz = pts.groupBy("r_name").agg(
        rnd(F.avg("lat"), _WZ_ROUND).alias("mlat"),
        rnd(F.avg("lon"), _WZ_ROUND).alias("mlon"),
    )
    wz0 = wz
    for _ in range(_WZ_ITERS):
        j = pts.join(F.broadcast(wz), "r_name")
        dist = F.greatest(
            F.sqrt(
                (F.col("lat") - F.col("mlat")) * (F.col("lat") - F.col("mlat"))
                + (F.col("lon") - F.col("mlon"))
                * (F.col("lon") - F.col("mlon"))
            ),
            F.lit(_WZ_EPS),
        )
        wz = j.groupBy("r_name").agg(
            rnd(
                F.sum(F.col("lat") / dist) / F.sum(1.0 / dist), _WZ_ROUND
            ).alias("mlat"),
            rnd(
                F.sum(F.col("lon") / dist) / F.sum(1.0 / dist), _WZ_ROUND
            ).alias("mlon"),
        )
    c0 = wz0.select(
        "r_name",
        F.col("mlat").alias("c0lat"),
        F.col("mlon").alias("c0lon"),
    )
    cf = wz.select(
        "r_name", F.col("mlat").alias("cflat"), F.col("mlon").alias("cflon")
    )
    both = pts.join(F.broadcast(c0), "r_name").join(F.broadcast(cf), "r_name")

    def _d(latc, lonc):
        return F.sqrt(
            (F.col("lat") - F.col(latc)) * (F.col("lat") - F.col(latc))
            + (F.col("lon") - F.col(lonc)) * (F.col("lon") - F.col(lonc))
        )

    gain = both.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.avg(_d("c0lat", "c0lon")).alias("mean_d_centroid"),
        F.avg(_d("cflat", "cflon")).alias("mean_d_gmedian"),
        F.any_value("c0lat").alias("c0lat"),
        F.any_value("c0lon").alias("c0lon"),
        F.any_value("cflat").alias("cflat"),
        F.any_value("cflon").alias("cflon"),
    )
    return gain.select(
        "r_name",
        F.col("n_points").cast("long").alias("n_points"),
        rnd("c0lat", 4).alias("centroid_lat"),
        rnd("c0lon", 4).alias("centroid_lon"),
        rnd("cflat", 4).alias("gmedian_lat"),
        rnd("cflon", 4).alias("gmedian_lon"),
        rnd("mean_d_centroid", 4).alias("mean_d_centroid"),
        rnd("mean_d_gmedian", 4).alias("mean_d_gmedian"),
    )


geo_geometric_median_weiszfeld.__doc__ = (
    geo_geometric_median_weiszfeld.__doc__.replace("{it}", str(_WZ_ITERS))
    .replace("{r}", str(_WZ_ROUND))
)
