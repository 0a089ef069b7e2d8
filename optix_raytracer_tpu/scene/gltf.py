"""Minimal GLTF 2.0 loader: meshes, node transforms, PBR materials, textures.

The role of tinygltf + `sutil::loadScene` (`SDK/sutil/Scene.cpp:267-560`):
parse .gltf (JSON + external/base64 buffers) or .glb (binary container),
decode accessors, walk the node hierarchy accumulating transforms
(`processGLTFNode`, `Scene.cpp:125-207`), and extract pbrMetallicRoughness
materials (`Scene.cpp:379-428`). Pure numpy/PIL — no GLTF package exists in
the environment. Returns plain python/numpy structures the Scene layer
consumes; no JAX here (host-side I/O).
"""
from __future__ import annotations

import base64
import json
import os
import struct
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

_COMPONENT_DTYPES = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16,
    5123: np.uint16, 5125: np.uint32, 5126: np.float32,
}
_TYPE_COUNTS = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4,
                "MAT3": 9, "MAT4": 16}


@dataclass
class GltfMesh:
    positions: np.ndarray            # [V, 3] f32 (object space)
    indices: np.ndarray              # [M, 3] i32
    normals: Optional[np.ndarray]    # [V, 3] or None
    uvs: Optional[np.ndarray]        # [V, 2] or None
    material: int                    # material index (-1 = default)
    transform: np.ndarray            # [4, 4] node-to-world
    name: str = ""


@dataclass
class GltfMaterial:
    base_color: tuple = (1.0, 1.0, 1.0, 1.0)
    metallic: float = 1.0
    roughness: float = 1.0
    emissive: tuple = (0.0, 0.0, 0.0)
    base_color_texture: int = -1     # texture index
    normal_texture: int = -1         # tangent-space normal map
    mr_texture: int = -1             # metallic-roughness map (G=r, B=m)
    emissive_texture: int = -1
    alpha_mode: str = "OPAQUE"
    alpha_cutoff: float = 0.5
    name: str = ""


@dataclass
class GltfCamera:
    transform: np.ndarray            # [4, 4]
    yfov: float = 0.8
    aspect: float = 1.0


@dataclass
class GltfScene:
    meshes: list = field(default_factory=list)
    materials: list = field(default_factory=list)
    textures: list = field(default_factory=list)   # np.uint8 [H, W, 4]
    cameras: list = field(default_factory=list)


def _load_buffers(gltf, base_dir, glb_chunk):
    buffers = []
    for buf in gltf.get("buffers", []):
        uri = buf.get("uri")
        if uri is None:
            buffers.append(glb_chunk)
        elif uri.startswith("data:"):
            b64 = uri.split(",", 1)[1]
            buffers.append(base64.b64decode(b64))
        else:
            with open(os.path.join(base_dir, uri), "rb") as f:
                buffers.append(f.read())
    return buffers


def _read_accessor(gltf, buffers, idx):
    acc = gltf["accessors"][idx]
    count = acc["count"]
    n_comp = _TYPE_COUNTS[acc["type"]]
    dtype = _COMPONENT_DTYPES[acc["componentType"]]
    itemsize = np.dtype(dtype).itemsize

    if "bufferView" not in acc:
        data = np.zeros((count, n_comp), dtype)
    else:
        bv = gltf["bufferViews"][acc["bufferView"]]
        buf = buffers[bv["buffer"]]
        offset = bv.get("byteOffset", 0) + acc.get("byteOffset", 0)
        stride = bv.get("byteStride") or n_comp * itemsize
        if stride == n_comp * itemsize:
            data = np.frombuffer(buf, dtype, count * n_comp, offset)
            data = data.reshape(count, n_comp)
        else:
            raw = np.frombuffer(buf, np.uint8,
                                stride * (count - 1) + n_comp * itemsize,
                                offset)
            data = np.lib.stride_tricks.as_strided(
                raw.view(dtype), shape=(count, n_comp),
                strides=(stride, itemsize)).copy()

    if acc.get("sparse"):
        data = data.copy()
        sp = acc["sparse"]
        idx_acc = {"count": sp["count"], "type": "SCALAR",
                   "componentType": sp["indices"]["componentType"],
                   "bufferView": sp["indices"]["bufferView"],
                   "byteOffset": sp["indices"].get("byteOffset", 0)}
        val_acc = {"count": sp["count"], "type": acc["type"],
                   "componentType": acc["componentType"],
                   "bufferView": sp["values"]["bufferView"],
                   "byteOffset": sp["values"].get("byteOffset", 0)}
        g2 = dict(gltf)
        g2["accessors"] = [idx_acc, val_acc]
        sp_idx = _read_accessor(g2, buffers, 0).reshape(-1).astype(np.int64)
        sp_val = _read_accessor(g2, buffers, 1)
        data[sp_idx] = sp_val

    # normalized integer attributes → float
    if acc.get("normalized"):
        info = np.iinfo(dtype)
        data = data.astype(np.float32) / info.max
    return data


def _node_matrix(node):
    if "matrix" in node:
        return np.asarray(node["matrix"], np.float32).reshape(4, 4).T
    m = np.eye(4, dtype=np.float32)
    if "scale" in node:
        m = np.diag(list(node["scale"]) + [1.0]).astype(np.float32) @ m
    if "rotation" in node:
        x, y, z, w = node["rotation"]
        rot = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w), 0],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w), 0],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y), 0],
            [0, 0, 0, 1]], np.float32)
        m = rot @ m
    if "translation" in node:
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = node["translation"]
        m = t @ m
    return m


def _decode_image(gltf, buffers, base_dir, img):
    from PIL import Image
    import io
    if "uri" in img:
        uri = img["uri"]
        if uri.startswith("data:"):
            raw = base64.b64decode(uri.split(",", 1)[1])
            im = Image.open(io.BytesIO(raw))
        else:
            im = Image.open(os.path.join(base_dir, uri))
    else:
        bv = gltf["bufferViews"][img["bufferView"]]
        off = bv.get("byteOffset", 0)
        raw = buffers[bv["buffer"]][off:off + bv["byteLength"]]
        im = Image.open(io.BytesIO(raw))
    return np.asarray(im.convert("RGBA"))


def load_gltf(path: str) -> GltfScene:
    """Parse a .gltf/.glb file into a GltfScene (world-space transforms)."""
    base_dir = os.path.dirname(os.path.abspath(path))
    glb_chunk = None
    if path.lower().endswith(".glb"):
        with open(path, "rb") as f:
            data = f.read()
        magic, _version, _length = struct.unpack_from("<III", data, 0)
        assert magic == 0x46546C67, "not a GLB file"
        offset = 12
        gltf = None
        while offset < len(data):
            clen, ctype = struct.unpack_from("<II", data, offset)
            chunk = data[offset + 8: offset + 8 + clen]
            if ctype == 0x4E4F534A:      # JSON
                gltf = json.loads(chunk)
            elif ctype == 0x004E4942:    # BIN
                glb_chunk = chunk
            offset += 8 + clen
        assert gltf is not None, "GLB missing JSON chunk"
    else:
        with open(path) as f:
            gltf = json.load(f)

    buffers = _load_buffers(gltf, base_dir, glb_chunk)
    out = GltfScene()

    for m in gltf.get("materials", []):
        pbr = m.get("pbrMetallicRoughness", {})
        tex = pbr.get("baseColorTexture", {}).get("index", -1)
        out.materials.append(GltfMaterial(
            base_color=tuple(pbr.get("baseColorFactor", (1, 1, 1, 1))),
            metallic=pbr.get("metallicFactor", 1.0),
            roughness=pbr.get("roughnessFactor", 1.0),
            emissive=tuple(m.get("emissiveFactor", (0, 0, 0))),
            base_color_texture=tex,
            normal_texture=m.get("normalTexture", {}).get("index", -1),
            mr_texture=pbr.get("metallicRoughnessTexture",
                               {}).get("index", -1),
            emissive_texture=m.get("emissiveTexture", {}).get("index", -1),
            alpha_mode=m.get("alphaMode", "OPAQUE"),
            alpha_cutoff=m.get("alphaCutoff", 0.5),
            name=m.get("name", ""),
        ))

    # texture index → decoded image (through the texture→image indirection)
    images = None
    for tex in gltf.get("textures", []):
        if images is None:
            images = [None] * len(gltf.get("images", []))
        src = tex.get("source", 0)
        if images[src] is None:
            images[src] = _decode_image(gltf, buffers, base_dir,
                                        gltf["images"][src])
        out.textures.append(images[src])

    # walk node hierarchy (Scene.cpp:125-207 processGLTFNode)
    scene_idx = gltf.get("scene", 0)
    roots = gltf.get("scenes", [{}])[scene_idx].get("nodes", [])
    nodes = gltf.get("nodes", [])

    def walk(node_idx, parent_m):
        node = nodes[node_idx]
        m = parent_m @ _node_matrix(node)
        if "camera" in node:
            cam = gltf["cameras"][node["camera"]]
            persp = cam.get("perspective", {})
            out.cameras.append(GltfCamera(
                transform=m, yfov=persp.get("yfov", 0.8),
                aspect=persp.get("aspectRatio", 1.0)))
        if "mesh" in node:
            mesh = gltf["meshes"][node["mesh"]]
            for prim in mesh.get("primitives", []):
                if prim.get("mode", 4) != 4:
                    continue  # triangles only
                attrs = prim["attributes"]
                pos = _read_accessor(gltf, buffers,
                                     attrs["POSITION"]).astype(np.float32)
                if "indices" in prim:
                    idx = _read_accessor(gltf, buffers, prim["indices"])
                    idx = idx.reshape(-1, 3).astype(np.int32)
                else:
                    idx = np.arange(len(pos), dtype=np.int32).reshape(-1, 3)
                normals = None
                if "NORMAL" in attrs:
                    normals = _read_accessor(
                        gltf, buffers, attrs["NORMAL"]).astype(np.float32)
                uvs = None
                if "TEXCOORD_0" in attrs:
                    uvs = _read_accessor(
                        gltf, buffers, attrs["TEXCOORD_0"]).astype(np.float32)
                out.meshes.append(GltfMesh(
                    positions=pos[:, :3], indices=idx, normals=normals,
                    uvs=uvs, material=prim.get("material", -1),
                    transform=m, name=mesh.get("name", "")))
        for child in node.get("children", []):
            walk(child, m)

    for r in roots:
        walk(r, np.eye(4, dtype=np.float32))
    return out
