"""glb (binary glTF) container tools — driver-side model prep.

Implements the two reference features that operate on the glb side input
rather than on row data:

* F10 base-model rotation for keep_projection mode
  (reference ``src/TileHandler.cs:16-38`` ``RotateModelForCartesian``):
  every scene root node's local matrix is post-multiplied by
  rotX(-90deg) * rotZ(180deg).
* K5 external-texture collection / URI rewrite / copy-once
  (reference ``src/ExternalTextureHelper.cs:11-126``): external image
  URIs are collected per model as ``textures/<model>/<file>``, rewritten
  in the glTF JSON (falling back to ``textures/_shared/<file>`` when the
  same file name maps to multiple sources), and the files are copied to
  the output directory exactly once.

Everything here is pure-stdlib + numpy over the PUBLIC glTF 2.0 binary
container layout (12-byte header, 4-byte-aligned JSON/BIN chunks); models
are few and shared, so this runs on the driver and ships broadcast —
the same side-input shape as the reference (SURVEY.md S6/J2).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import struct

import numpy as np

_GLB_MAGIC = b"glTF"
_JSON_CHUNK = b"JSON"
_BIN_CHUNK = b"BIN\x00"


def parse_glb(data: bytes) -> tuple[dict, bytes | None]:
    """glb container -> (gltf json dict, BIN chunk bytes or None)."""
    magic, version, _length = struct.unpack_from("<4sII", data, 0)
    if magic != _GLB_MAGIC:
        raise ValueError("not a glb: bad magic")
    if version != 2:
        raise ValueError(f"unsupported glb version {version}")
    offset = 12
    gltf: dict | None = None
    bin_chunk: bytes | None = None
    while offset < len(data):
        clen, ctype = struct.unpack_from("<I4s", data, offset)
        offset += 8
        chunk = data[offset : offset + clen]
        offset += clen
        if ctype == _JSON_CHUNK:
            gltf = json.loads(chunk.decode("utf-8"))
        elif ctype == _BIN_CHUNK:
            bin_chunk = bytes(chunk)
    if gltf is None:
        raise ValueError("glb has no JSON chunk")
    return gltf, bin_chunk


def write_glb(gltf: dict, bin_chunk: bytes | None = None) -> bytes:
    """(gltf json dict, optional BIN chunk) -> glb container bytes."""
    j = json.dumps(gltf, separators=(",", ":")).encode("utf-8")
    j += b" " * (-len(j) % 4)
    chunks = struct.pack("<I4s", len(j), _JSON_CHUNK) + j
    if bin_chunk is not None:
        b = bin_chunk + b"\x00" * (-len(bin_chunk) % 4)
        chunks += struct.pack("<I4s", len(b), _BIN_CHUNK) + b
    return struct.pack("<4sII", _GLB_MAGIC, 2, 12 + len(chunks)) + chunks


# ---------------------------------------------------------------------------
# F10 — base model rotation (keep_projection)
# ---------------------------------------------------------------------------

def _rot_x(theta: float) -> np.ndarray:
    """Row-vector-convention rotation (System.Numerics CreateRotationX)."""
    c, s = np.float32(math.cos(theta)), np.float32(math.sin(theta))
    m = np.eye(4, dtype=np.float32)
    m[1, 1], m[1, 2], m[2, 1], m[2, 2] = c, s, -s, c
    return m


def _rot_z(theta: float) -> np.ndarray:
    c, s = np.float32(math.cos(theta)), np.float32(math.sin(theta))
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[0, 1], m[1, 0], m[1, 1] = c, s, -s, c
    return m


def _quat_to_matrix(q) -> np.ndarray:
    """glTF quaternion [x,y,z,w] -> 4x4 row-vector-convention matrix."""
    x, y, z, w = (np.float32(v) for v in q)
    m = np.eye(4, dtype=np.float32)
    m[0, 0] = 1 - 2 * (y * y + z * z)
    m[0, 1] = 2 * (x * y + z * w)
    m[0, 2] = 2 * (x * z - y * w)
    m[1, 0] = 2 * (x * y - z * w)
    m[1, 1] = 1 - 2 * (x * x + z * z)
    m[1, 2] = 2 * (y * z + x * w)
    m[2, 0] = 2 * (x * z + y * w)
    m[2, 1] = 2 * (y * z - x * w)
    m[2, 2] = 1 - 2 * (x * x + y * y)
    return m


def node_local_matrix(node: dict) -> np.ndarray:
    """Node local transform in row-vector convention. glTF stores
    ``matrix`` column-major for column vectors; the row-major reshape of
    that flat list IS its row-vector-convention transpose, so no explicit
    transposition is needed on either read or write."""
    if "matrix" in node:
        return np.asarray(node["matrix"], dtype=np.float32).reshape(4, 4)
    m = np.eye(4, dtype=np.float32)
    if "scale" in node:
        m = m @ np.diag(
            np.asarray(list(node["scale"]) + [1.0], dtype=np.float32)
        )
    if "rotation" in node:
        m = m @ _quat_to_matrix(node["rotation"])
    if "translation" in node:
        t = np.eye(4, dtype=np.float32)
        t[3, :3] = np.asarray(node["translation"], dtype=np.float32)
        m = m @ t
    return m


def rotate_model_for_cartesian(glb_bytes: bytes) -> bytes:
    """F10: post-multiply every scene root node's local matrix by
    rotX(-pi/2) * rotZ(pi) — aligns Z-up models for keep_projection mode
    (reference src/TileHandler.cs:16-38, same float32 arithmetic and the
    same row-vector composition order as System.Numerics)."""
    gltf, bin_chunk = parse_glb(glb_bytes)
    combined = _rot_x(-math.pi / 2.0) @ _rot_z(math.pi)
    nodes = gltf.get("nodes", [])
    for scene in gltf.get("scenes", []):
        for ni in scene.get("nodes", []):
            node = nodes[ni]
            new = node_local_matrix(node) @ combined
            for key in ("translation", "rotation", "scale"):
                node.pop(key, None)
            node["matrix"] = [float(v) for v in new.reshape(-1)]
    return write_glb(gltf, bin_chunk)


# ---------------------------------------------------------------------------
# K5 — external texture collect / rewrite / copy
# ---------------------------------------------------------------------------

def _is_external_uri(uri: str | None) -> bool:
    return bool(uri) and not uri.startswith("data:")


def collect_external_textures(
    external_textures: dict[str, str], model_path: str, gltf: dict
) -> None:
    """Record {absolute source path: 'textures/<model>/<file>'} for every
    externally-referenced image of a model (reference
    ExternalTextureHelper.CollectExternalTextures)."""
    model_dir = os.path.dirname(model_path)
    model_name = os.path.splitext(os.path.basename(model_path))[0]
    for image in gltf.get("images", []):
        uri = image.get("uri")
        if not _is_external_uri(uri):
            continue
        absolute = os.path.normpath(os.path.join(model_dir, uri))
        external_textures[absolute] = (
            f"textures/{model_name}/{os.path.basename(absolute)}"
        )


def resolve_relative_uri(uri: str, external_textures: dict[str, str]) -> str | None:
    """Relative output URI for an image: the unique collected mapping for
    its file name, else 'textures/_shared/<file>' on ambiguity (reference
    ExternalTextureHelper.ResolveRelativeUriForImage)."""
    if not _is_external_uri(uri):
        return None
    file_name = os.path.basename(uri).lower()
    matches = {
        rel
        for src, rel in external_textures.items()
        if os.path.basename(src).lower() == file_name
    }
    # _shared name is the LOWERCASED basename so it agrees with
    # copy_external_textures regardless of which original-case variant
    # appears in the URI vs the copied source (ADVICE r2: mixed-case
    # duplicates otherwise produce a dangling URI on case-sensitive FS)
    return matches.pop() if len(matches) == 1 else f"textures/_shared/{file_name}"


def configure_external_texture_uris(
    gltf: dict, external_textures: dict[str, str], output_directory: str | None = None
) -> list[str]:
    """Rewrite every external image URI in-place to its relative output
    URI; create the output directories; return the URIs used."""
    used: list[str] = []
    for image in gltf.get("images", []):
        rel = resolve_relative_uri(image.get("uri"), external_textures)
        if rel is None:
            continue
        image["uri"] = rel
        used.append(rel)
    if output_directory:
        for rel in set(used):
            os.makedirs(
                os.path.dirname(os.path.join(output_directory, rel)), exist_ok=True
            )
    return used


def copy_external_textures(
    output_directory: str,
    external_textures: dict[str, str],
    copied_destinations: set[str] | None = None,
) -> list[str]:
    """Copy each collected texture into the output directory once —
    dedupes across models via ``copied_destinations`` and never overwrites
    an existing file (reference CopyExternalTextures/CopyTextureIfMissing).
    Returns destinations actually written.

    When two models collect the same texture FILE NAME,
    :func:`resolve_relative_uri` rewrites those image URIs to
    ``textures/_shared/<file>`` — so that destination must exist too:
    the lexicographically-first source for each ambiguous basename is
    additionally copied there (deterministic pick; the reference reaches
    the same state through SharpGLTF's satellite-file write,
    src/GPUTileHandler.cs:35)."""
    copy_list = sorted(external_textures.items())
    by_name: dict[str, list[tuple[str, str]]] = {}
    for source, rel in copy_list:
        by_name.setdefault(os.path.basename(source).lower(), []).append(
            (source, rel)
        )
    for name, pairs in by_name.items():
        if len({rel for _, rel in pairs}) > 1:
            # lowercased basename: must match resolve_relative_uri's
            # _shared rewrite exactly (ADVICE r2)
            copy_list.append((pairs[0][0], f"textures/_shared/{name}"))

    written: list[str] = []
    for source, rel in copy_list:
        destination = os.path.join(output_directory, rel)
        if copied_destinations is not None:
            if destination in copied_destinations:
                continue
            copied_destinations.add(destination)
        os.makedirs(os.path.dirname(destination), exist_ok=True)
        if not os.path.exists(destination):
            shutil.copyfile(source, destination)
            written.append(destination)
    return written
