"""Operator-level tests for PIP, kNN, and extent range join."""

import numpy as np
import pytest

from i3dm_export_spark.config import Bounds
from i3dm_export_spark.operators import knn, pip, range_join


class TestRayCastingPip:
    def test_concave_l_shape(self):
        # L-shape: [0,6]x[0,3] plus [0,3]x[3,8]
        ring = np.array(
            [(0, 0), (6, 0), (6, 3), (3, 3), (3, 8), (0, 8)], dtype=np.float64
        )
        lon = np.array([1.0, 5.0, 5.0, 1.0, 4.0, 7.0])
        lat = np.array([1.0, 1.0, 5.0, 5.0, 4.0, 1.0])
        got = pip.point_in_polygon_batch(lon, lat, ring)
        assert list(got) == [True, True, False, True, False, False]

    def test_triangle(self):
        ring = np.array([(0, 0), (4, 0), (0, 4)], dtype=np.float64)
        lon = np.array([1.0, 3.0, 3.5])
        lat = np.array([1.0, 3.0, 0.25])
        got = pip.point_in_polygon_batch(lon, lat, ring)
        assert list(got) == [True, False, True]

    def test_matches_bruteforce_oracle(self):
        """Random points vs an independent even-odd implementation."""
        rng = np.random.default_rng(11)
        ring = np.array(
            [(0, 0), (10, 0), (10, 4), (6, 4), (6, 7), (10, 7), (10, 10), (0, 10)],
            dtype=np.float64,
        )
        pts = rng.uniform(-1, 11, size=(500, 2))

        def oracle(px, py):
            inside = False
            m = len(ring)
            for i in range(m):
                x1, y1 = ring[i]
                x2, y2 = ring[(i + 1) % m]
                if (y1 > py) != (y2 > py):
                    xint = x1 + (py - y1) / (y2 - y1) * (x2 - x1)
                    if px < xint:
                        inside = not inside
            return inside

        got = pip.point_in_polygon_batch(pts[:, 0], pts[:, 1], ring)
        want = [oracle(px, py) for px, py in pts]
        assert list(got) == want

    def test_spark_pip_join(self, spark):
        from i3dm_export_spark.sources.pages import pages_df

        pts = pages_df(spark, 500, "A")
        polys = [
            {"boundary_id": 7, "ring": [(34.0, 44.0), (34.05, 44.0), (34.05, 44.1), (34.0, 44.1)]}
        ]
        out = pip.pip_join(pts, polys).toPandas()
        assert (out["boundary_id"] == 7).all()
        # rectangle => same result as plain predicates
        want = pts.filter("lon >= 34.0 and lon < 34.05").count()
        assert len(out) == want


class TestKnnBatch:
    def test_small_exact(self):
        pts = np.array([[0.0, 0], [1, 0], [5, 0], [6, 0]])
        r, c, d = knn.knn_pairs_batch(pts, 1)
        # nearest of each: 0<->1, 2<->3
        assert list(c) == [1, 0, 3, 2]
        np.testing.assert_allclose(d, [1, 1, 1, 1])

    def test_matches_full_sort(self):
        rng = np.random.default_rng(5)
        pts = rng.normal(size=(200, 2))
        r, c, d = knn.knn_pairs_batch(pts, 3)
        full = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(axis=2)
        np.fill_diagonal(full, np.inf)
        want = np.sort(full, axis=1)[:, :3].ravel()
        # knn_pairs_batch uses the expanded form (|a|^2 - 2ab + |b|^2) which
        # differs from (a-b)^2 by FP rounding only
        np.testing.assert_allclose(np.asarray(d), want, rtol=1e-9, atol=1e-12)

    def test_k_larger_than_group(self):
        pts = np.array([[0.0, 0], [1, 0]])
        r, c, d = knn.knn_pairs_batch(pts, 5)
        assert len(r) == 2  # k clamps to n-1


class TestRangeJoin:
    def test_cellkey_equals_broadcast(self, spark):
        from pyspark.sql import functions as F

        b = Bounds(0.0, 0.0, 100.0, 100.0)
        rng_seed = 13
        left = spark.range(40).select(
            F.col("id").alias("raster_id"),
            (F.col("id") % 10 * 9.7).alias("min_lon"),
            (F.col("id") % 10 * 9.7 + 12.0).alias("max_lon"),
            (F.floor(F.col("id") / 10) * 22.0).alias("min_lat"),
            (F.floor(F.col("id") / 10) * 22.0 + 25.0).alias("max_lat"),
        )
        right = spark.range(25).select(
            F.col("id").alias("tile_id"),
            (F.col("id") % 5 * 20.0).alias("min_lon"),
            (F.col("id") % 5 * 20.0 + 20.0).alias("max_lon"),
            (F.floor(F.col("id") / 5) * 20.0).alias("min_lat"),
            (F.floor(F.col("id") / 5) * 20.0 + 20.0).alias("max_lat"),
        )
        bc = range_join.extent_overlap_join_broadcast(left, right).select(
            "a.raster_id", "b.tile_id"
        )
        ck = range_join.extent_overlap_join_cellkey(
            left, right, b, level=3, left_id="raster_id", right_id="tile_id"
        )
        got_b = {tuple(r) for r in bc.collect()}
        got_c = {tuple(r) for r in ck.collect()}
        assert got_b == got_c
        assert len(got_b) > 40  # real overlaps exist


class TestAsofJoin:
    def test_matches_pandas_merge_asof(self, spark):
        """Union+window as-of join must equal pandas merge_asof on a
        deterministic fixture (keys with no match, exact-ts ties, and
        multiple matches per key)."""
        import numpy as np
        import pandas as pd

        from i3dm_export_spark.operators.asof import asof_join_backward

        rng = np.random.default_rng(7)
        n_l, n_r = 400, 300
        lp = pd.DataFrame({
            "id": np.arange(n_l),
            "k": rng.integers(0, 20, n_l),
            "t": rng.integers(0, 1000, n_l).astype("int64"),
        })
        rp = (
            pd.DataFrame({
                "k": rng.integers(0, 25, n_r),
                "t": rng.integers(0, 1000, n_r).astype("int64"),
                "v": np.round(rng.uniform(0, 100, n_r), 3),
            })
            .groupby(["k", "t"], as_index=False)["v"].max()
        )
        expected = pd.merge_asof(
            lp.sort_values("t", kind="mergesort"),
            rp.sort_values("t", kind="mergesort"),
            on="t", by="k", direction="backward",
        ).sort_values("id").reset_index(drop=True)

        out = (
            asof_join_backward(
                spark.createDataFrame(lp), spark.createDataFrame(rp),
                on=["k"], left_ts="t", right_ts="t", value_cols=["v"],
            )
            .toPandas().sort_values("id").reset_index(drop=True)
        )
        assert len(out) == n_l
        pd.testing.assert_series_equal(
            out["v"], expected["v"], check_exact=False, rtol=0, atol=0
        )

    def test_tolerance(self, spark):
        import pandas as pd

        from i3dm_export_spark.operators.asof import asof_join_backward

        lp = pd.DataFrame({"id": [0, 1], "k": [1, 1], "t": [100.0, 500.0]})
        rp = pd.DataFrame({"k": [1], "t": [90.0], "v": [7.0]})
        out = (
            asof_join_backward(
                spark.createDataFrame(lp), spark.createDataFrame(rp),
                on=["k"], left_ts="t", right_ts="t", value_cols=["v"],
                tolerance_seconds=50,
            )
            .toPandas().set_index("id")
        )
        assert out.loc[0, "v"] == 7.0       # 10s old: inside tolerance
        assert pd.isna(out.loc[1, "v"])     # 410s old: outside


class TestAsofNtzTolerance:
    def test_tolerance_on_timestamp_ntz(self, spark):
        """ADVICE r1: TIMESTAMP_NTZ event logs rejected a direct
        cast-to-double in the tolerance path; must use the
        timestamp-bridge cast."""
        import pandas as pd
        from pyspark.sql import functions as F

        from i3dm_export_spark.operators.asof import asof_join_backward

        left = spark.createDataFrame(
            [(0, 1, "2024-01-01 00:01:40"), (1, 1, "2024-01-01 00:08:20")],
            "id int, k int, t string",
        ).withColumn("t", F.col("t").cast("timestamp_ntz"))
        right = spark.createDataFrame(
            [(1, "2024-01-01 00:01:30", 7.0)], "k int, t string, v double"
        ).withColumn("t", F.col("t").cast("timestamp_ntz"))
        out = asof_join_backward(
            left, right, on=["k"], left_ts="t", right_ts="t",
            value_cols=["v"], tolerance_seconds=50,
        ).toPandas().set_index("id")
        assert out.loc[0, "v"] == 7.0    # 10 s old: inside tolerance
        assert pd.isna(out.loc[1, "v"])  # 410 s old: outside

    def test_ntz_tolerance_is_timezone_free_across_dst(self, spark):
        """ADVICE r2: two NTZ values straddling a DST transition must
        difference timezone-free. Under Europe/Amsterdam the old
        cast-through-session-zone path gave 01:30->03:00 on 2026-03-29 a
        1800 s delta (offsets +01/+02) instead of the true 5400 s, wrongly
        matching a 3600 s tolerance."""
        import pandas as pd
        from pyspark.sql import functions as F

        from i3dm_export_spark.operators.asof import asof_join_backward

        old_tz = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone", "Europe/Amsterdam")
        try:
            left = spark.createDataFrame(
                [(0, 1, "2026-03-29 03:00:00")], "id int, k int, t string"
            ).withColumn("t", F.col("t").cast("timestamp_ntz"))
            right = spark.createDataFrame(
                [(1, "2026-03-29 01:30:00", 7.0)], "k int, t string, v double"
            ).withColumn("t", F.col("t").cast("timestamp_ntz"))
            out = asof_join_backward(
                left, right, on=["k"], left_ts="t", right_ts="t",
                value_cols=["v"], tolerance_seconds=3600,
            ).toPandas().set_index("id")
            # true NTZ delta is 5400 s > 3600 -> no match
            assert pd.isna(out.loc[0, "v"])
        finally:
            spark.conf.set("spark.sql.session.timeZone", old_tz)
