"""K2/EP4-GPU: glb tile writer with EXT_mesh_gpu_instancing (from scratch).

The reference GPU path (src/GPUTileHandler.cs:39-93,201-283) builds one glb
per tile whose instancing node carries per-instance TRANSLATION / ROTATION /
SCALE accessors:

* translation = Y-up swizzled position relative to the tile's RTC center
  (first instance, fixed url order) — src/GPUTileHandler.cs:214-226,268;
* rotation    = quaternion from the Y-up-swizzled ENU basis (ECEF mode) or
  local Cartesian basis (keep_projection) — src/GPUTileHandler.cs:228-266
  with the row-major basis matrix of :329-349;
* scale       = uniform scale triplet or scale_non_uniform
  — src/GPUTileHandler.cs:275-277;
* per-instance feature ids + a string-typed property table from the tags
  (EXT_instance_features / EXT_structural_metadata,
  src/GPUTileHandler.cs:106-112,285-327) — encoded BINARY per the
  EXT_structural_metadata spec: per property a values bufferView
  (concatenated UTF-8) + a UINT32 stringOffsets bufferView in the BIN
  chunk, schema id 'schema' / class 'propertyTable', all-empty
  properties skipped, feature ids linked via EXT_instance_features.

The glb container (header + JSON chunk + BIN chunk) is written by hand —
no glTF library exists in this container. The mesh itself is a stub node
(the reference loads the real model glb from disk; model payloads are
opaque binaries to the engine).
"""

from __future__ import annotations

import json
import struct

import numpy as np
import pandas as pd

from ..functions import geodesy as geo


def _pad4(b: bytes, pad: bytes) -> bytes:
    if len(b) % 4:
        b += pad * (4 - len(b) % 4)
    return b


def build_gpu_glb(
    positions: np.ndarray,
    yaw: np.ndarray,
    pitch: np.ndarray,
    roll: np.ndarray,
    scales: np.ndarray | None = None,
    scales_non_uniform: np.ndarray | None = None,
    keep_projection: bool = False,
    tags_json: str | None = None,
) -> bytes:
    """One tile's instances -> glb bytes with EXT_mesh_gpu_instancing."""
    n = len(positions)
    pos = np.asarray(positions, np.float64)
    rtc = pos[0]

    # translations: Y-up swizzle of RTC-relative positions
    # (reference src/GPUTileHandler.cs:214-226: swizzle BEFORE subtracting
    # the already-swizzled RTC translation)
    rel = geo.to_y_up(pos) - geo.to_y_up(rtc[None, :])
    translations = rel.astype(np.float32)

    # rotations: basis -> Y-up -> orthonormalize -> quaternion
    if keep_projection:
        east, north, up = geo.local_cartesian_basis(yaw, pitch, roll, n=n)
    else:
        east, north, up = geo.local_enu_basis(pos.astype(np.float32), yaw, pitch, roll)
    east_y = geo.to_y_up(east)
    up_y = geo.to_y_up(up)
    # forward = east x up; up = forward x east (reference :237-240,268-269)
    fwd_y = np.cross(east_y, up_y).astype(np.float32)
    fwd_y /= np.linalg.norm(fwd_y, axis=1, keepdims=True)
    up_y2 = np.cross(fwd_y, east_y).astype(np.float32)
    up_y2 /= np.linalg.norm(up_y2, axis=1, keepdims=True)
    quats = geo.quaternion_from_basis(east_y, up_y2, fwd_y)

    if scales_non_uniform is not None:
        scale_arr = np.asarray(scales_non_uniform, np.float32)
    else:
        s = np.asarray(scales if scales is not None else np.ones(n), np.float32)
        scale_arr = np.repeat(s[:, None], 3, axis=1)

    feature_ids = np.arange(n, dtype=np.float32)

    # ---- binary buffer ----
    bin_parts = []
    views = []
    accessors = []

    def add_accessor(arr, acc_type, with_minmax=False):
        data = np.ascontiguousarray(arr, np.float32).tobytes()
        offset = sum(len(p) for p in bin_parts)
        views.append({"buffer": 0, "byteOffset": offset, "byteLength": len(data)})
        acc = {
            "bufferView": len(views) - 1,
            "componentType": 5126,  # FLOAT
            "count": n,
            "type": acc_type,
        }
        if with_minmax:
            a2 = np.asarray(arr, np.float32).reshape(n, -1)
            acc["min"] = [float(v) for v in a2.min(axis=0)]
            acc["max"] = [float(v) for v in a2.max(axis=0)]
        accessors.append(acc)
        bin_parts.append(_pad4(data, b"\x00"))
        return len(accessors) - 1

    a_trans = add_accessor(translations, "VEC3", with_minmax=True)
    a_rot = add_accessor(quats, "VEC4")
    a_scale = add_accessor(scale_arr, "VEC3")
    a_feat = add_accessor(feature_ids, "SCALAR")

    def add_view(data: bytes) -> int:
        offset = sum(len(p) for p in bin_parts)
        views.append(
            {"buffer": 0, "byteOffset": offset, "byteLength": len(data)}
        )
        bin_parts.append(_pad4(data, b"\x00"))
        return len(views) - 1

    # EXT_structural_metadata: STRING-typed property table encoded into the
    # BIN chunk (values bytes + UINT32 string offsets per property), schema
    # id 'schema' / class 'propertyTable', properties whose values are all
    # empty skipped — reference src/GPUTileHandler.cs:106-112,285-327
    pt_properties: dict = {}
    if tags_json is not None:
        for name, vals in json.loads(tags_json).items():
            strs = ["" if v is None else str(v) for v in vals]
            if all(s == "" for s in strs):
                continue
            encoded = [s.encode("utf-8") for s in strs]
            offsets = np.zeros(len(encoded) + 1, np.uint32)
            offsets[1:] = np.cumsum([len(b) for b in encoded])
            v_values = add_view(b"".join(encoded))
            v_offsets = add_view(offsets.tobytes())
            pt_properties[name] = {
                "values": v_values,
                "stringOffsets": v_offsets,
                "stringOffsetType": "UINT32",
            }

    buffer_bytes = b"".join(bin_parts)

    node_ext = {
        "EXT_mesh_gpu_instancing": {
            "attributes": {
                "TRANSLATION": a_trans,
                "ROTATION": a_rot,
                "SCALE": a_scale,
                "_FEATURE_ID_0": a_feat,
            }
        }
    }
    extensions_used = ["EXT_mesh_gpu_instancing"]
    if pt_properties:
        extensions_used += ["EXT_structural_metadata", "EXT_instance_features"]
        node_ext["EXT_instance_features"] = {
            "featureIds": [
                {"featureCount": n, "attribute": 0, "propertyTable": 0}
            ]
        }
    gltf = {
        "asset": {"version": "2.0", "generator": "i3dm_export_spark"},
        "extensionsUsed": extensions_used,
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"name": "instances", "extensions": node_ext}],
        "buffers": [{"byteLength": len(buffer_bytes)}],
        "bufferViews": views,
        "accessors": accessors,
        "extras": {"rtcCenter": [float(v) for v in geo.to_y_up(rtc[None, :])[0]]},
    }
    if pt_properties:
        gltf["extensions"] = {
            "EXT_structural_metadata": {
                "schema": {
                    "id": "schema",
                    "classes": {
                        "propertyTable": {
                            "properties": {
                                name: {"type": "STRING"}
                                for name in pt_properties
                            }
                        }
                    },
                },
                "propertyTables": [
                    {
                        "class": "propertyTable",
                        "count": n,
                        "properties": pt_properties,
                    }
                ],
            }
        }

    jbytes = _pad4(json.dumps(gltf, separators=(",", ":")).encode(), b" ")
    bbytes = _pad4(buffer_bytes, b"\x00")
    total = 12 + 8 + len(jbytes) + 8 + len(bbytes)
    return (
        struct.pack("<4sII", b"glTF", 2, total)
        + struct.pack("<I4s", len(jbytes), b"JSON")
        + jbytes
        + struct.pack("<I4s", len(bbytes), b"BIN\x00")
        + bbytes
    )


def parse_glb(data: bytes):
    """Round-trip reader for tests: returns (gltf_json, bin_chunk)."""
    magic, version, total = struct.unpack("<4sII", data[:12])
    assert magic == b"glTF" and version == 2 and total == len(data)
    off = 12
    jlen, jtype = struct.unpack("<I4s", data[off : off + 8])
    assert jtype == b"JSON"
    gltf = json.loads(data[off + 8 : off + 8 + jlen].decode())
    off += 8 + jlen
    bin_chunk = b""
    if off < len(data):
        blen, btype = struct.unpack("<I4s", data[off : off + 8])
        assert btype == b"BIN\x00"
        bin_chunk = data[off + 8 : off + 8 + blen]
    return gltf, bin_chunk


def read_property_table(gltf: dict, bin_chunk: bytes) -> dict:
    """Round-trip reader for tests: decode the EXT_structural_metadata
    STRING property table back to {property: [str, ...]}."""
    ext = (gltf.get("extensions") or {}).get("EXT_structural_metadata")
    if not ext:
        return {}
    pt = ext["propertyTables"][0]
    out: dict = {}
    for name, p in pt["properties"].items():
        vv = gltf["bufferViews"][p["values"]]
        ov = gltf["bufferViews"][p["stringOffsets"]]
        data = bin_chunk[vv["byteOffset"] : vv["byteOffset"] + vv["byteLength"]]
        offs = np.frombuffer(
            bin_chunk[ov["byteOffset"] : ov["byteOffset"] + ov["byteLength"]],
            np.uint32,
        )
        out[name] = [
            data[offs[i] : offs[i + 1]].decode("utf-8")
            for i in range(pt["count"])
        ]
    return out


def encode_gpu_tile_pdf(
    pdf: pd.DataFrame,
    keep_projection: bool = False,
    use_scale_non_uniform: bool = False,
    order_col: str = "url",
) -> bytes:
    """Per-tile grouped-pandas entry: rows (sorted by the total-order key)
    -> glb bytes. Mirrors operators/encode.encode_tile_pdf's contract."""
    pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
    if keep_projection:
        pos = pdf[["lon", "lat", "z"]].to_numpy(np.float64)
    else:
        pos = pdf[["x_ecef", "y_ecef", "z_ecef"]].to_numpy(np.float64)
    snu = None
    scales = None
    if use_scale_non_uniform:
        snu = np.stack(pdf["scale_non_uniform"].to_numpy())
    else:
        scales = pdf["scale"].to_numpy(np.float32)
    from .encode import batch_table_json

    bt = batch_table_json(list(pdf["tags"])) if "tags" in pdf else None
    return build_gpu_glb(
        pos,
        pdf["yaw"].to_numpy(np.float64),
        pdf["pitch"].to_numpy(np.float64),
        pdf["roll"].to_numpy(np.float64),
        scales=scales,
        scales_non_uniform=snu,
        keep_projection=keep_projection,
        tags_json=bt,
    )
