"""F16 WKB decode + P4 orientation-column fallback tests."""

import struct

import numpy as np
import pytest

from i3dm_export_spark.functions import wkb


class TestWkb:
    def test_point2d_roundtrip(self):
        blobs = [wkb.encode_wkb_point(5.1, 52.0), wkb.encode_wkb_point(-122.3, 47.6)]
        out = wkb.decode_wkb_points(blobs)
        np.testing.assert_allclose(out[:, :2], [[5.1, 52.0], [-122.3, 47.6]])
        assert np.isnan(out[:, 2]).all()

    def test_pointz_roundtrip(self):
        blobs = [wkb.encode_wkb_point(34.0, 44.0, 12.5)]
        out = wkb.decode_wkb_points(blobs)
        np.testing.assert_allclose(out[0], [34.0, 44.0, 12.5])

    def test_ewkb_z_srid_flags(self):
        # PostGIS EWKB: little endian, type = 1 | Z | SRID, srid=4326
        b = struct.pack("<BIIddd", 1, 1 | 0x80000000 | 0x20000000, 4326, 1.0, 2.0, 3.0)
        out = wkb.decode_wkb_points([b])
        np.testing.assert_allclose(out[0], [1.0, 2.0, 3.0])

    def test_big_endian(self):
        b = struct.pack(">BIdd", 0, 1, 9.0, 8.0)
        out = wkb.decode_wkb_points([b])
        np.testing.assert_allclose(out[0, :2], [9.0, 8.0])

    def test_mixed_layouts_and_nulls(self):
        blobs = [
            wkb.encode_wkb_point(1.0, 2.0),
            None,
            wkb.encode_wkb_point(3.0, 4.0, 5.0),
            b"\x01",  # garbage
        ]
        out = wkb.decode_wkb_points(blobs)
        np.testing.assert_allclose(out[0, :2], [1, 2])
        assert np.isnan(out[1]).all()
        np.testing.assert_allclose(out[2], [3, 4, 5])
        assert np.isnan(out[3]).all()


class TestOrientationFallback:
    """P4: reference src/InstancesRepository.cs:142-159 column introspection."""

    def test_yaw_pitch_roll_present(self, spark):
        from i3dm_export_spark.sources.tables import orientation_select

        df = spark.createDataFrame(
            [(0.0, 1.0, 2.0)], "yaw double, pitch double, roll double"
        )
        cols = orientation_select(df)
        row = df.select(*cols).collect()[0]
        assert (row["yaw"], row["pitch"], row["roll"]) == (0.0, 1.0, 2.0)

    def test_legacy_rotation_fallback_non_gpu(self, spark):
        from i3dm_export_spark.sources.tables import orientation_select

        df = spark.createDataFrame([(33.0,)], "rotation double")
        cols = orientation_select(df, use_gpu_instancing=False)
        row = df.select(*cols).collect()[0]
        # rotation as yaw, 0 pitch, 0 roll (deprecation path)
        assert (row["yaw"], row["pitch"], row["roll"]) == (33.0, 0.0, 0.0)

    def test_gpu_mode_rejects_legacy_rotation(self, spark):
        from i3dm_export_spark.sources.tables import orientation_select

        df = spark.createDataFrame([(33.0,)], "rotation double")
        with pytest.raises(ValueError, match="yaw/pitch/roll"):
            orientation_select(df, use_gpu_instancing=True)

    def test_missing_columns_raise(self, spark):
        from i3dm_export_spark.sources.tables import orientation_select

        df = spark.createDataFrame([(1,)], "doc_id int")
        with pytest.raises(ValueError):
            orientation_select(df)
