"""K2 GPU glb encoder tests (reference tests/CartesianRotationTests.cs)."""

import numpy as np
import pandas as pd

from i3dm_export_spark.operators import gpu_encode


def _pdf(n=3, yaw=0.0):
    return pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(n)],
            "x_ecef": np.linspace(100.0, 100.0 + 10 * (n - 1), n),
            "y_ecef": np.linspace(200.0, 200.0 + 10 * (n - 1), n),
            "z_ecef": np.full(n, 50.0),
            "lon": np.linspace(100.0, 100.0 + 10 * (n - 1), n),
            "lat": np.linspace(200.0, 200.0 + 10 * (n - 1), n),
            "z": np.full(n, 50.0),
            "scale": np.full(n, 1.0),
            "yaw": np.full(n, yaw),
            "pitch": np.zeros(n),
            "roll": np.zeros(n),
            "model": ["box.glb"] * n,
            "tags": [None] * n,
        }
    )


def _accessor_data(gltf, bin_chunk, idx):
    acc = gltf["accessors"][idx]
    view = gltf["bufferViews"][acc["bufferView"]]
    comps = {"VEC3": 3, "VEC4": 4, "SCALAR": 1}[acc["type"]]
    raw = bin_chunk[view["byteOffset"] : view["byteOffset"] + view["byteLength"]]
    return np.frombuffer(raw, np.float32).reshape(acc["count"], comps)


class TestGpuGlb:
    def test_container_roundtrip_and_extension(self):
        data = gpu_encode.encode_gpu_tile_pdf(_pdf(), keep_projection=True)
        gltf, bin_chunk = gpu_encode.parse_glb(data)
        assert "EXT_mesh_gpu_instancing" in gltf["extensionsUsed"]
        attrs = gltf["nodes"][0]["extensions"]["EXT_mesh_gpu_instancing"]["attributes"]
        assert set(attrs) == {"TRANSLATION", "ROTATION", "SCALE", "_FEATURE_ID_0"}

    def test_first_translation_is_origin(self):
        # reference CartesianRotationTests.cs:170-188: position relative to
        # RTC center (first instance) is (0,0,0) after Y-up transform
        data = gpu_encode.encode_gpu_tile_pdf(_pdf(), keep_projection=True)
        gltf, bin_chunk = gpu_encode.parse_glb(data)
        attrs = gltf["nodes"][0]["extensions"]["EXT_mesh_gpu_instancing"]["attributes"]
        trans = _accessor_data(gltf, bin_chunk, attrs["TRANSLATION"])
        np.testing.assert_allclose(trans[0], [0, 0, 0], atol=1e-5)
        # second instance: (110,210,50)->(110,50,-210) minus (100,50,-200)
        np.testing.assert_allclose(trans[1], [10, 0, -10], atol=1e-4)

    def test_rotation_affects_quaternion(self):
        # reference CartesianRotationTests.cs:123-139
        d0 = gpu_encode.encode_gpu_tile_pdf(_pdf(yaw=0.0), keep_projection=True)
        d45 = gpu_encode.encode_gpu_tile_pdf(_pdf(yaw=45.0), keep_projection=True)
        g0, b0 = gpu_encode.parse_glb(d0)
        g45, b45 = gpu_encode.parse_glb(d45)
        a0 = g0["nodes"][0]["extensions"]["EXT_mesh_gpu_instancing"]["attributes"]
        a45 = g45["nodes"][0]["extensions"]["EXT_mesh_gpu_instancing"]["attributes"]
        q0 = _accessor_data(g0, b0, a0["ROTATION"])[0]
        q45 = _accessor_data(g45, b45, a45["ROTATION"])[0]
        assert abs(float(np.dot(q0, q45))) < 0.999
        # unit quaternions
        assert abs(np.linalg.norm(q0) - 1) < 1e-5
        assert abs(np.linalg.norm(q45) - 1) < 1e-5

    def test_ecef_mode_works(self):
        # reference CartesianRotationTests.cs:190-207
        pdf = _pdf()
        pdf[["x_ecef", "y_ecef", "z_ecef"]] = np.array(
            [[1214947.2, -4736379.0, 4081540.8]] * 3
        ) + np.arange(3)[:, None]
        data = gpu_encode.encode_gpu_tile_pdf(pdf, keep_projection=False)
        gltf, bin_chunk = gpu_encode.parse_glb(data)
        attrs = gltf["nodes"][0]["extensions"]["EXT_mesh_gpu_instancing"]["attributes"]
        quats = _accessor_data(gltf, bin_chunk, attrs["ROTATION"])
        assert np.all(np.abs(np.linalg.norm(quats, axis=1) - 1) < 1e-5)

    def test_scale_non_uniform(self):
        pdf = _pdf()
        pdf["scale_non_uniform"] = [np.array([10.0, 20.0, 30.0])] * 3
        data = gpu_encode.encode_gpu_tile_pdf(
            pdf, keep_projection=True, use_scale_non_uniform=True
        )
        gltf, bin_chunk = gpu_encode.parse_glb(data)
        attrs = gltf["nodes"][0]["extensions"]["EXT_mesh_gpu_instancing"]["attributes"]
        sc = _accessor_data(gltf, bin_chunk, attrs["SCALE"])
        np.testing.assert_array_equal(sc[0], [10, 20, 30])

    def test_pipeline_gpu_mode(self, spark, tmp_path):
        from i3dm_export_spark.config import ExportOptions
        from i3dm_export_spark.plans import pipeline
        from i3dm_export_spark.sources.pages import pages_df

        pages = pages_df(spark, 500, scenario="A")
        opts = ExportOptions(
            max_features_per_tile=100, max_level=10, use_gpu_instancing=True
        )
        s = pipeline.run_export(pages, opts, str(tmp_path / "gpu"))
        import glob

        files = glob.glob(str(tmp_path / "gpu" / "content" / "*.glb"))
        assert len(files) == s["n_content_tiles"]
        with open(files[0], "rb") as f:
            gltf, _ = gpu_encode.parse_glb(f.read())
        assert "EXT_mesh_gpu_instancing" in gltf["extensionsUsed"]


class TestBinaryPropertyTable:
    """K2 parity: EXT_structural_metadata STRING property table in the BIN
    chunk (reference src/GPUTileHandler.cs:106-112,285-327)."""

    def _glb(self, tags_json):
        import numpy as np

        from i3dm_export_spark.operators import gpu_encode as g

        n = 3
        return g.build_gpu_glb(
            np.array([[4.0, 52.0, 0.0], [4.001, 52.0, 0.0], [4.0, 52.001, 0.0]]),
            np.zeros(3), np.zeros(3), np.zeros(3),
            keep_projection=True, tags_json=tags_json,
        )

    def test_roundtrip_values(self):
        import json

        from i3dm_export_spark.operators import gpu_encode as g

        tags = json.dumps({"customer": ["a", "bb", "ccc"],
                           "id": ["1", "2", "3"]})
        gltf, bin_chunk = g.parse_glb(self._glb(tags))
        assert "EXT_structural_metadata" in gltf["extensionsUsed"]
        assert "EXT_instance_features" in gltf["extensionsUsed"]
        md = gltf["extensions"]["EXT_structural_metadata"]
        assert md["schema"]["id"] == "schema"
        cls = md["schema"]["classes"]["propertyTable"]["properties"]
        assert cls == {"customer": {"type": "STRING"}, "id": {"type": "STRING"}}
        assert md["propertyTables"][0]["count"] == 3
        pt = g.read_property_table(gltf, bin_chunk)
        assert pt == {"customer": ["a", "bb", "ccc"], "id": ["1", "2", "3"]}
        feats = gltf["nodes"][0]["extensions"]["EXT_instance_features"]
        assert feats["featureIds"][0] == {
            "featureCount": 3, "attribute": 0, "propertyTable": 0
        }

    def test_all_empty_property_skipped_and_unicode(self):
        import json

        from i3dm_export_spark.operators import gpu_encode as g

        tags = json.dumps({"empty": ["", "", ""], "city": ["Delft", "Γλυφάδα", ""]})
        gltf, bin_chunk = g.parse_glb(self._glb(tags))
        pt = g.read_property_table(gltf, bin_chunk)
        assert pt == {"city": ["Delft", "Γλυφάδα", ""]}

    def test_no_tags_no_metadata_extension(self):
        from i3dm_export_spark.operators import gpu_encode as g

        gltf, bin_chunk = g.parse_glb(self._glb(None))
        assert "EXT_structural_metadata" not in gltf.get("extensionsUsed", [])
        assert g.read_property_table(gltf, bin_chunk) == {}
