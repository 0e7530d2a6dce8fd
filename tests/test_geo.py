"""Grid-bucketed radius join: brute-force parity (incl. cell-boundary
pairs), plan shape (keyed hash join, never a nested loop), and the
latitude acceptance bound."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from datafusion_gpu_spark.operators.geo import EARTH_RADIUS_KM, radius_join


def _hav_km(lat1, lon1, lat2, lon2):
    p = math.radians
    a = (
        math.sin(p(lat2 - lat1) / 2) ** 2
        + math.cos(p(lat1)) * math.cos(p(lat2)) * math.sin(p(lon2 - lon1) / 2) ** 2
    )
    return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(a))


def test_radius_join_matches_bruteforce_with_boundary_pairs(spark):
    # a cluster around (0, 0) plus pairs deliberately straddling grid
    # cell boundaries (cell_deg ~ 0.45 deg at 25 km): points at -0.001
    # and +0.001 land in DIFFERENT home cells but are ~0.2 km apart —
    # the 3x3 neighborhood expansion must still find them
    lpts = [(1, 0.0, 0.0), (2, -0.001, 0.0), (3, 0.2, 0.2), (4, 10.0, 10.0)]
    rpts = [(101, 0.001, 0.0), (102, 0.18, 0.21), (103, 10.05, 10.0),
            (104, 3.0, 3.0)]
    left = spark.createDataFrame(lpts, "id long, lat double, lon double")
    right = spark.createDataFrame(rpts, "rid long, lat double, lon double")
    got = {
        (r.id, r.rid_r)
        for r in radius_join(left, right, radius_km=25.0).collect()
    }
    want = {
        (i, j)
        for (i, la, lo) in lpts
        for (j, ra, ro) in rpts
        if _hav_km(la, lo, ra, ro) <= 25.0
    }
    assert got == want
    assert (1, 101) in got and (2, 101) in got  # boundary-straddling pairs


def test_radius_join_complete_at_lat60_boundary(spark):
    # regression for the unpadded cell size: at the accepted |lat|=60
    # boundary, this pair is 24.9993 km apart (within the 25 km radius)
    # yet with cell_deg = 25/111.2/cos(60) its lons land 2 grid cells
    # apart (0.449639 vs 0.899289 deg; cell 0 vs cell 2) — outside the
    # 3x3 expansion. The padded cell (111.0 constant + 0.1% margin)
    # makes them adjacent again.
    lo_a = 0.44964028776978415 * 0.99999
    lo_b = 0.44964028776978415 * 2.00001
    assert _hav_km(60.0, lo_a, 60.0, lo_b) <= 25.0
    left = spark.createDataFrame(
        [(1, 60.0, lo_a)], "id long, lat double, lon double")
    right = spark.createDataFrame(
        [(11, 60.0, lo_b)], "rid long, lat double, lon double")
    got = {(r.id, r.rid_r) for r in radius_join(left, right, 25.0).collect()}
    assert got == {(1, 11)}


def test_radius_join_plan_is_keyed_hash_join(spark):
    left = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 10 / 2.0).alias("lat"),
        (F.col("id") % 7 / 2.0).alias("lon"),
    )
    right = spark.range(50).select(
        F.col("id").alias("rid"),
        (F.col("id") % 9 / 2.0).alias("lat"),
        (F.col("id") % 5 / 2.0).alias("lon"),
    )
    plan = radius_join(left, right, 25.0)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan  # equality join on the cell key


def test_radius_join_rejects_high_latitude_rows(spark):
    # |lat| > 60 rows are filtered on BOTH sides, not silently mis-joined
    left = spark.createDataFrame(
        [(1, 75.0, 0.0), (2, 10.0, 0.0)], "id long, lat double, lon double"
    )
    right = spark.createDataFrame(
        [(11, 75.0, 0.0), (12, 10.0, 0.001)], "rid long, lat double, lon double"
    )
    got = {(r.id, r.rid_r) for r in radius_join(left, right, 25.0).collect()}
    assert got == {(2, 12)}
