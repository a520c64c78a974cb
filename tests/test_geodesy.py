"""Golden-value tests for the geodesy kernel.

Every expected constant below is a published golden value from the
reference's own test suite (file:line cited per test) — re-asserted here
against the from-scratch numpy kernels.
"""

import numpy as np
import pytest

from i3dm_export_spark.functions import geodesy as geo


class TestMercator:
    def test_roundtrip_golden(self):
        # reference tests/Cesium/SpatialConvertorTests.cs:11-23
        x, y = geo.wgs84_to_spherical_mercator(5.139838, 52.086577)
        assert x == pytest.approx(572164.14884027175, abs=1e-6)
        assert y == pytest.approx(6815794.8490610179, abs=1e-6)
        lon, lat = geo.spherical_mercator_to_wgs84(x, y)
        assert lon == pytest.approx(5.139838, abs=1e-12)
        assert round(float(lat), 3) == round(52.086577, 3)


class TestEcefToEnu:
    def test_matrix_golden(self):
        # reference tests/Cesium/SpatialConvertorTests.cs:26-51
        p = np.array([[1214947.2, -4736379.0, 4081540.8]])
        m = geo.ecef_to_enu_matrix(p)[0]
        assert round(float(m[0, 0]), 4) == 0.9686
        assert round(float(m[0, 1]), 4) == 0.2485
        assert float(m[0, 2]) == 0.0
        assert float(m[0, 3]) == 0.0
        assert round(float(m[1, 0]), 4) == -0.1599
        assert round(float(m[1, 1]), 4) == 0.6232
        assert round(float(m[1, 2]), 4) == 0.7656
        assert round(float(m[2, 0]), 4) == 0.1902
        assert round(float(m[2, 1]), 4) == -0.7416
        assert round(float(m[2, 2]), 4) == 0.6433
        assert round(float(m[3, 0]), 1) == 1214947.2
        assert float(m[3, 1]) == np.float32(-4736379.0)
        assert round(float(m[3, 2]), 1) == 4081540.8
        assert float(m[3, 3]) == 1.0


class TestRotator:
    AXIS = np.array([[0.19021961, -0.74156934, 0.6433439]], dtype=np.float32)

    def test_rotate_east_golden(self):
        # reference tests/Cesium/RotatorTests.cs:18-25
        v = np.array([[0.9686404294605896, 0.24846673502584724, 0.0]], dtype=np.float32)
        out = geo.rotate_vector(v, self.AXIS, 45.0)[0]
        np.testing.assert_allclose(
            out, [0.7979629, -0.26495427, -0.54134506], atol=2e-6
        )

    def test_rotate_north_golden(self):
        # reference tests/Cesium/RotatorTests.cs:28-35
        v = np.array([[-0.15984882, 0.6231691, 0.7655773]], dtype=np.float32)
        out = geo.rotate_vector(v, self.AXIS, 45.0)[0]
        np.testing.assert_allclose(out, [0.5719022, 0.6163388, 0.5413449], atol=2e-6)

    def test_rotate_zero_is_identity(self):
        # reference tests/Cesium/RotatorTests.cs:38-45 (heading=0 -> unchanged)
        v = np.array([[-0.15984882, 0.6231691, 0.7655773]], dtype=np.float32)
        out = geo.rotate_vector(v, self.AXIS, 0.0)[0]
        np.testing.assert_allclose(out, v[0], atol=1e-6)


class TestEnuBasis:
    P = np.array([[1214947.2, -4736379.0, 4081540.8]])

    def test_heading_matches_manual_rotation(self):
        # reference tests/Cesium/CesiumTransformerTests.cs:10-27
        m = geo.ecef_to_enu_matrix(self.P)[0]
        east0, north0, up0 = m[0, :3], m[1, :3], m[2, :3]
        east90, north90, up90 = geo.local_enu_basis(self.P, yaw=90.0)
        east_manual = geo.rotate_vector(east0[None, :], up0[None, :], 90.0)[0]
        east_manual = east_manual / np.linalg.norm(east_manual)
        north_manual = geo.rotate_vector(north0[None, :], up0[None, :], 90.0)[0]
        north_manual = north_manual / np.linalg.norm(north_manual)
        assert float(np.dot(east90[0], east_manual)) > 0.9999
        assert float(np.dot(north90[0], north_manual)) > 0.9999
        assert float(np.dot(up90[0], up0)) > 0.9999

    def test_orthonormal(self):
        # reference tests/Cesium/CesiumTransformerTests.cs:29-42
        east, north, up = geo.local_enu_basis(self.P, yaw=12.0, pitch=3.0, roll=4.0)
        for v in (east[0], north[0], up[0]):
            assert abs(np.linalg.norm(v) - 1.0) < 1e-5
        assert abs(float(np.dot(east[0], up[0]))) < 1e-5
        assert abs(float(np.dot(east[0], north[0]))) < 1e-5
        assert abs(float(np.dot(north[0], up[0]))) < 1e-5

    def test_heading32_golden(self):
        # reference tests/Vector3Calculations.cs:9-20. NB: the reference test
        # is inert (calls .Equals without Assert.That) and mislabels its
        # second constant "Up" — it is the rotated *north* vector. Both
        # constants reproduce here under the correct labels.
        p = np.array([[3891004.8, 332908.44, 5025898.0]])
        east, north, _ = geo.local_enu_basis(p, yaw=32.0)
        np.testing.assert_allclose(
            east[0], [0.3456809, 0.88072217, -0.32377872], atol=1e-5
        )
        np.testing.assert_allclose(
            north[0], [-0.7140731, 0.47076005, 0.51815444], atol=1e-5
        )


class TestCartesianBasis:
    # reference tests/CartesianRotationTests.cs:15-91
    def test_identity(self):
        east, north, up = geo.local_cartesian_basis(0.0, 0.0, 0.0)
        np.testing.assert_allclose(east[0], [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(north[0], [0, 1, 0], atol=1e-6)
        np.testing.assert_allclose(up[0], [0, 0, 1], atol=1e-6)

    def test_yaw90(self):
        east, north, up = geo.local_cartesian_basis(90.0)
        np.testing.assert_allclose(east[0], [0, -1, 0], atol=1e-6)
        np.testing.assert_allclose(north[0], [1, 0, 0], atol=1e-6)
        assert up[0][2] == pytest.approx(1, abs=1e-6)

    def test_pitch90(self):
        east, north, up = geo.local_cartesian_basis(0.0, 90.0)
        assert east[0][0] == pytest.approx(1, abs=1e-6)
        assert north[0][2] == pytest.approx(-1, abs=1e-6)
        assert up[0][1] == pytest.approx(1, abs=1e-6)

    def test_roll90(self):
        east, north, up = geo.local_cartesian_basis(0.0, 0.0, 90.0)
        assert east[0][2] == pytest.approx(1, abs=1e-6)
        assert north[0][1] == pytest.approx(1, abs=1e-6)
        assert up[0][0] == pytest.approx(-1, abs=1e-6)

    def test_orthonormal(self):
        east, north, up = geo.local_cartesian_basis(45.0, 30.0, 15.0)
        for v in (east[0], north[0], up[0]):
            assert abs(np.linalg.norm(v) - 1.0) < 1e-6
        assert abs(float(np.dot(east[0], north[0]))) < 1e-6
        assert abs(float(np.dot(east[0], up[0]))) < 1e-6
        assert abs(float(np.dot(north[0], up[0]))) < 1e-6


class TestRelativePositions:
    def test_rtc_golden(self):
        # reference tests/TileHandlerTests.cs:696-720: inputs (1,2),(10,20)
        # -> positions[0]=(0,0,0), positions[1]=(9,18,0)
        pos = np.array([[1.0, 2.0, 0.0], [10.0, 20.0, 0.0]])
        rel = geo.relative_positions_f32(pos, pos[0])
        np.testing.assert_array_equal(rel[0], [0, 0, 0])
        np.testing.assert_array_equal(rel[1], [9, 18, 0])


class TestEcef:
    def test_known_point(self):
        # Equator/prime meridian -> (a, 0, 0); north pole -> (0, 0, b)
        out = geo.wgs84_to_ecef(np.array([0.0]), np.array([0.0]))
        np.testing.assert_allclose(out[0], [geo.WGS84_A, 0, 0], atol=1e-6)
        out = geo.wgs84_to_ecef(np.array([0.0]), np.array([90.0]))
        np.testing.assert_allclose(out[0], [0, 0, geo.WGS84_B], atol=1e-6)

    def test_height_offsets_along_normal(self):
        out0 = geo.wgs84_to_ecef(np.array([5.0]), np.array([52.0]), 0.0)
        out100 = geo.wgs84_to_ecef(np.array([5.0]), np.array([52.0]), 100.0)
        d = np.linalg.norm(out100[0] - out0[0])
        assert d == pytest.approx(100.0, abs=1e-6)


class TestYUpAndQuaternion:
    def test_y_up_swizzle(self):
        # reference src/GPUTileHandler.cs:351-359: (x,y,z)->(x,z,-y)
        v = np.array([[1.0, 2.0, 3.0]])
        np.testing.assert_array_equal(geo.to_y_up(v)[0], [1.0, 3.0, -2.0])

    def test_identity_quaternion(self):
        e = np.array([[1.0, 0, 0]])
        u = np.array([[0.0, 1, 0]])
        f = np.array([[0.0, 0, 1]])
        q = geo.quaternion_from_basis(e, u, f)[0]
        np.testing.assert_allclose(q, [0, 0, 0, 1], atol=1e-6)

    def test_rotation_changes_quaternion(self):
        # reference tests/CartesianRotationTests.cs:123-139 (quaternions differ)
        e0, n0, u0 = geo.local_cartesian_basis(0.0)
        e1, n1, u1 = geo.local_cartesian_basis(45.0)
        q0 = geo.quaternion_from_basis(e0, geo.to_y_up(u0), geo.to_y_up(n0))[0]
        q1 = geo.quaternion_from_basis(e1, geo.to_y_up(u1), geo.to_y_up(n1))[0]
        assert abs(float(np.dot(q0, q1))) < 0.999
