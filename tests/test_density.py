"""DBSCAN gates on planted 2-D geometry (unit vectors by angle, so
cosine thresholds translate to angular neighborhoods exactly):
core/border/noise roles, min-cluster border assignment, and the
singleton-core edge case."""

import math

from data_quality_checks_in_relational_database_spark.operators.density import dbscan


def _vec(deg):
    r = math.radians(deg)
    return [math.cos(r), math.sin(r)]


def test_dbscan_roles_and_clusters(spark):
    # cluster A at 0/5/10deg, cluster B at 180/185/190deg,
    # border point at 74deg (within eps of ONLY the 10deg core),
    # noise at 270deg (no neighbors at eps=cos>=0.4)
    pts = [
        (0, _vec(0)), (1, _vec(5)), (2, _vec(10)),
        (3, _vec(180)), (4, _vec(185)), (5, _vec(190)),
        (6, _vec(74)), (7, _vec(270)),
    ]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r for r in dbscan(df, eps_cosine=0.4, min_pts=3).collect()}
    assert {i: got[i]["role"] for i in range(8)} == {
        0: "core", 1: "core", 2: "core",
        3: "core", 4: "core", 5: "core",
        6: "border", 7: "noise",
    }
    assert got[0]["cluster_id"] == got[1]["cluster_id"] == got[2]["cluster_id"] == 0
    assert got[3]["cluster_id"] == got[4]["cluster_id"] == got[5]["cluster_id"] == 3
    assert got[6]["cluster_id"] == 0  # min core-neighbor cluster
    assert got[7]["cluster_id"] is None
    assert got[2]["n_neighbors"] == 3  # 0, 1, and the border point
    assert got[7]["n_neighbors"] == 0


def test_dbscan_singleton_core_keeps_own_cluster(spark):
    # a core point whose eps-neighbors are all non-core anchors its own
    # cluster: hub at 0deg with two spokes at +-60deg (spokes see only
    # the hub; hub sees both)
    pts = [(10, _vec(0)), (11, _vec(60)), (12, _vec(-60))]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r for r in dbscan(df, eps_cosine=0.4, min_pts=3).collect()}
    assert got[10]["role"] == "core" and got[10]["cluster_id"] == 10
    assert got[11]["role"] == "border" and got[11]["cluster_id"] == 10
    assert got[12]["role"] == "border" and got[12]["cluster_id"] == 10
