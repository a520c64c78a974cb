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
  src/GPUTileHandler.cs:285-327) — represented here as the feature-id
  accessor plus a JSON metadata extras block (full binary property-table
  encoding is glTF-spec mechanical work, tracked for a later round).

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
    gltf = {
        "asset": {"version": "2.0", "generator": "i3dm_export_spark"},
        "extensionsUsed": ["EXT_mesh_gpu_instancing"],
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"name": "instances", "extensions": node_ext}],
        "buffers": [{"byteLength": len(buffer_bytes)}],
        "bufferViews": views,
        "accessors": accessors,
        "extras": {"rtcCenter": [float(v) for v in geo.to_y_up(rtc[None, :])[0]]},
    }
    if tags_json is not None:
        gltf["extras"]["propertyTable"] = json.loads(tags_json)

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
