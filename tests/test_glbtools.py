"""F10 base-model rotation + K5 external-texture helpers.

Reference parity: src/TileHandler.cs:16-38 (RotateModelForCartesian),
src/ExternalTextureHelper.cs:11-126. Pure driver-side — no Spark fixture.
"""

import json
import math
import os
import struct

import numpy as np
import pytest

from i3dm_export_spark.functions import glbtools
from i3dm_export_spark.operators.encode import stub_glb


def _glb_with(gltf: dict, bin_chunk: bytes | None = None) -> bytes:
    return glbtools.write_glb(gltf, bin_chunk)


class TestContainer:
    def test_roundtrip_json_only(self):
        gltf, bin_chunk = glbtools.parse_glb(stub_glb())
        assert bin_chunk is None
        assert "asset" in gltf
        again, _ = glbtools.parse_glb(glbtools.write_glb(gltf))
        assert again == gltf

    def test_roundtrip_with_bin(self):
        gltf = {"asset": {"version": "2.0"}, "scenes": [], "nodes": []}
        payload = b"\x01\x02\x03"  # needs padding to 4
        out = _glb_with(gltf, payload)
        g2, b2 = glbtools.parse_glb(out)
        assert g2 == gltf
        assert b2[:3] == payload and len(b2) % 4 == 0
        # header length field covers the whole file
        assert struct.unpack_from("<I", out, 8)[0] == len(out)

    def test_bad_magic_rejected(self):
        with pytest.raises(ValueError):
            glbtools.parse_glb(b"NOPE" + b"\x00" * 20)


class TestRotateForCartesian:
    IDEAL = np.array(
        [[-1, 0, 0, 0], [0, 0, -1, 0], [0, -1, 0, 0], [0, 0, 0, 1]],
        dtype=np.float32,
    )

    def test_identity_root_gets_combined_rotation(self):
        gltf = {
            "asset": {"version": "2.0"},
            "scenes": [{"nodes": [0]}],
            "nodes": [{}],
        }
        out = glbtools.rotate_model_for_cartesian(_glb_with(gltf))
        g2, _ = glbtools.parse_glb(out)
        m = np.asarray(g2["nodes"][0]["matrix"], np.float32).reshape(4, 4)
        # rotX(-90) then rotZ(180), row-vector convention
        assert np.allclose(m, self.IDEAL, atol=1e-6)
        # v * M: +Z (model up) maps to -Y
        v = np.array([0, 0, 1, 1], np.float32) @ m
        assert np.allclose(v, [0, -1, 0, 1], atol=1e-6)

    def test_translation_node_composes(self):
        gltf = {
            "asset": {"version": "2.0"},
            "scenes": [{"nodes": [0]}],
            "nodes": [{"translation": [1.0, 2.0, 3.0]}],
        }
        g2, _ = glbtools.parse_glb(
            glbtools.rotate_model_for_cartesian(_glb_with(gltf))
        )
        m = np.asarray(g2["nodes"][0]["matrix"], np.float32).reshape(4, 4)
        # local(T) * combined: translation row is rotated too
        assert np.allclose(m[3, :3], np.array([1, 2, 3], np.float32) @ self.IDEAL[:3, :3], atol=1e-6)
        assert "translation" not in g2["nodes"][0]

    def test_non_root_nodes_untouched(self):
        gltf = {
            "asset": {"version": "2.0"},
            "scenes": [{"nodes": [0]}],
            "nodes": [{"children": [1]}, {}],
        }
        g2, _ = glbtools.parse_glb(
            glbtools.rotate_model_for_cartesian(_glb_with(gltf))
        )
        assert "matrix" in g2["nodes"][0]
        assert "matrix" not in g2["nodes"][1]


class TestExternalTextures:
    def _model(self, tmp_path, name, tex_rel="tex/wood.png"):
        mdir = tmp_path / name
        (mdir / os.path.dirname(tex_rel)).mkdir(parents=True, exist_ok=True)
        tex = mdir / tex_rel
        tex.write_bytes(b"PNGDATA-" + name.encode())
        gltf = {
            "asset": {"version": "2.0"},
            "images": [{"uri": tex_rel}, {"bufferView": 0, "mimeType": "image/png"}],
        }
        return str(mdir / f"{name}.glb"), gltf

    def test_collect_rewrite_copy_once(self, tmp_path):
        model_path, gltf = self._model(tmp_path, "tree")
        ext: dict[str, str] = {}
        glbtools.collect_external_textures(ext, model_path, gltf)
        assert list(ext.values()) == ["textures/tree/wood.png"]

        used = glbtools.configure_external_texture_uris(gltf, ext)
        assert gltf["images"][0]["uri"] == "textures/tree/wood.png"
        assert "uri" not in gltf["images"][1]  # embedded image untouched
        assert used == ["textures/tree/wood.png"]

        out = tmp_path / "out"
        copied: set[str] = set()
        w1 = glbtools.copy_external_textures(str(out), ext, copied)
        assert len(w1) == 1 and os.path.exists(w1[0])
        # second call (another tile, same model) copies nothing
        assert glbtools.copy_external_textures(str(out), ext, copied) == []

    def test_ambiguous_filename_goes_shared(self, tmp_path):
        p1, g1 = self._model(tmp_path, "oak")
        p2, g2 = self._model(tmp_path, "pine")
        ext: dict[str, str] = {}
        glbtools.collect_external_textures(ext, p1, g1)
        glbtools.collect_external_textures(ext, p2, g2)
        # same basename from two models -> ambiguous -> _shared
        glbtools.configure_external_texture_uris(g1, ext)
        assert g1["images"][0]["uri"] == "textures/_shared/wood.png"

    def test_shared_destination_actually_copied(self, tmp_path):
        """ADVICE r1 (medium): URIs resolved to textures/_shared/<file>
        must not dangle — the copy step must write that destination."""
        import os

        p1, g1 = self._model(tmp_path, "oak")
        p2, g2 = self._model(tmp_path, "pine")
        ext: dict[str, str] = {}
        glbtools.collect_external_textures(ext, p1, g1)
        glbtools.collect_external_textures(ext, p2, g2)
        glbtools.configure_external_texture_uris(g1, ext)
        glbtools.configure_external_texture_uris(g2, ext)
        out = tmp_path / "out"
        glbtools.copy_external_textures(str(out), ext)
        for g in (g1, g2):
            uri = g["images"][0]["uri"]
            assert os.path.exists(out / uri), uri
        # deterministic pick: lexicographically-first source wins
        shared = (out / "textures" / "_shared" / "wood.png").read_bytes()
        first_src = sorted(ext)[0]
        assert shared == open(first_src, "rb").read()

    def test_data_uri_ignored(self, tmp_path):
        gltf = {"asset": {"version": "2.0"},
                "images": [{"uri": "data:image/png;base64,AAAA"}]}
        ext: dict[str, str] = {}
        glbtools.collect_external_textures(ext, str(tmp_path / "m.glb"), gltf)
        assert ext == {}


class TestPrepareModels:
    def _model_with_scene(self, tmp_path, name, tex=True):
        mdir = tmp_path / name
        mdir.mkdir(parents=True, exist_ok=True)
        gltf = {
            "asset": {"version": "2.0"},
            "scenes": [{"nodes": [0]}],
            "nodes": [{}],
        }
        if tex:
            (mdir / "skin.png").write_bytes(b"PNG" + name.encode())
            gltf["images"] = [{"uri": "skin.png"}]
        path = mdir / f"{name}.glb"
        path.write_bytes(glbtools.write_glb(gltf))
        return str(path)

    def test_path_loading_rotation_and_textures(self, tmp_path):
        from i3dm_export_spark.config import ExportOptions
        from i3dm_export_spark.operators.encode import prepare_models

        p = self._model_with_scene(tmp_path, "tree")
        out = tmp_path / "content"
        opts = ExportOptions(keep_projection=True)
        prepared, external = prepare_models({"tree.glb": p}, opts, str(out))

        assert set(prepared) == {"tree.glb"}
        g, _ = glbtools.parse_glb(prepared["tree.glb"])
        # F10 applied: root node got the combined rotation matrix
        m = np.asarray(g["nodes"][0]["matrix"], np.float32).reshape(4, 4)
        assert np.allclose(m, TestRotateForCartesian.IDEAL, atol=1e-6)
        # K5: uri rewritten + file copied once
        assert g["images"][0]["uri"] == "textures/tree/skin.png"
        assert (out / "textures" / "tree" / "skin.png").read_bytes() == b"PNGtree"
        assert external  # mapping returned

    def test_bytes_passthrough_no_keep_projection(self, tmp_path):
        from i3dm_export_spark.config import ExportOptions
        from i3dm_export_spark.operators.encode import prepare_models

        gltf = {"asset": {"version": "2.0"}, "scenes": [{"nodes": [0]}],
                "nodes": [{}]}
        raw = glbtools.write_glb(gltf)
        prepared, external = prepare_models(
            {"box.glb": raw}, ExportOptions(keep_projection=False)
        )
        g, _ = glbtools.parse_glb(prepared["box.glb"])
        assert "matrix" not in g["nodes"][0]  # no rotation applied
        assert external == {}


class TestMultipleScenes:
    """Reference TileHandlerTests MultipleScenes fixture parity: every
    scene's root nodes get the keep_projection base rotation, and the glb
    container round-trips unchanged otherwise."""

    def test_rotation_applies_to_all_scenes(self):
        import numpy as np

        gltf = {
            "asset": {"version": "2.0"},
            "scene": 0,
            "scenes": [{"nodes": [0]}, {"nodes": [1]}],
            "nodes": [
                {"name": "a"},
                {"name": "b", "translation": [1.0, 2.0, 3.0]},
                {"name": "child"},
            ],
            "buffers": [{"byteLength": 4}],
        }
        glb = glbtools.write_glb(gltf, b"\x00\x00\x00\x00")
        out, bin_chunk = glbtools.parse_glb(
            glbtools.rotate_model_for_cartesian(glb)
        )
        assert bin_chunk == b"\x00\x00\x00\x00"
        # both scene roots now carry a matrix; the non-root node is untouched
        assert "matrix" in out["nodes"][0]
        assert "matrix" in out["nodes"][1]
        assert "matrix" not in out["nodes"][2]
        # node b's translation folded into the matrix (last row x/y/z)
        m_b = np.array(out["nodes"][1]["matrix"]).reshape(4, 4)
        assert not np.allclose(m_b, np.eye(4))
        assert "translation" not in out["nodes"][1]
        # rotation part is rotX(-90)*rotZ(180): v*M maps +Z -> -Y
        m_a = np.array(out["nodes"][0]["matrix"]).reshape(4, 4)
        v = np.array([0.0, 0.0, 1.0, 0.0]) @ m_a
        assert np.allclose(v[:3], [0.0, -1.0, 0.0], atol=1e-6)
