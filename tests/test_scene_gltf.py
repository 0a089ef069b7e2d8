"""GLTF loader + Scene finalize + meshviewer headless render."""
import base64
import json
import struct

import numpy as np
import pytest

from optix_raytracer_tpu.scene.gltf import load_gltf
from optix_raytracer_tpu.scene.scene import Scene
from optix_raytracer_tpu.apps import meshviewer


def make_cube_gltf(path, with_texture=True, binary=False):
    """Write a unit textured cube as .gltf (embedded base64) or .glb."""
    # 8 corners expanded to 24 verts (per-face normals/uvs)
    faces = []
    for axis in range(3):
        for sign in (-1.0, 1.0):
            n = np.zeros(3); n[axis] = sign
            u = np.zeros(3); u[(axis + 1) % 3] = 1.0
            v = np.zeros(3); v[(axis + 2) % 3] = sign
            c = n * 0.5
            faces.append((c, u, v, n))
    positions, normals, uvs, indices = [], [], [], []
    for f, (c, u, v, n) in enumerate(faces):
        base = 4 * f
        for du, dv in [(-0.5, -0.5), (0.5, -0.5), (0.5, 0.5), (-0.5, 0.5)]:
            positions.append(c + du * u + dv * v)
            normals.append(n)
            uvs.append([du + 0.5, dv + 0.5])
        indices += [base, base + 1, base + 2, base, base + 2, base + 3]
    positions = np.asarray(positions, np.float32)
    normals = np.asarray(normals, np.float32)
    uvs = np.asarray(uvs, np.float32)
    indices = np.asarray(indices, np.uint16)

    blob = (positions.tobytes() + normals.tobytes() + uvs.tobytes()
            + indices.tobytes())
    off_n = positions.nbytes
    off_uv = off_n + normals.nbytes
    off_idx = off_uv + uvs.nbytes

    tex_png = None
    if with_texture:
        from PIL import Image
        import io
        arr = np.zeros((8, 8, 3), np.uint8)
        arr[::2, ::2] = (255, 40, 40)
        arr[1::2, 1::2] = (40, 40, 255)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        tex_png = buf.getvalue()

    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [0, 0, 0]}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3, "material": 0}]}],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorFactor": [1, 1, 1, 1],
            **({"baseColorTexture": {"index": 0}} if with_texture else {}),
            "metallicFactor": 0.0, "roughnessFactor": 0.9}}],
        "buffers": [{"byteLength": len(blob)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": positions.nbytes},
            {"buffer": 0, "byteOffset": off_n, "byteLength": normals.nbytes},
            {"buffer": 0, "byteOffset": off_uv, "byteLength": uvs.nbytes},
            {"buffer": 0, "byteOffset": off_idx, "byteLength": indices.nbytes},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 24, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 24, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 24, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 36, "type": "SCALAR"},
        ],
    }
    if with_texture:
        img_off = len(blob)
        blob = blob + tex_png
        gltf["buffers"][0]["byteLength"] = len(blob)
        gltf["bufferViews"].append(
            {"buffer": 0, "byteOffset": img_off, "byteLength": len(tex_png)})
        gltf["images"] = [{"bufferView": 4, "mimeType": "image/png"}]
        gltf["textures"] = [{"source": 0}]

    if binary:
        js = json.dumps(gltf).encode()
        js += b" " * ((4 - len(js) % 4) % 4)
        blob += b"\x00" * ((4 - len(blob) % 4) % 4)
        total = 12 + 8 + len(js) + 8 + len(blob)
        with open(path, "wb") as f:
            f.write(struct.pack("<III", 0x46546C67, 2, total))
            f.write(struct.pack("<II", len(js), 0x4E4F534A) + js)
            f.write(struct.pack("<II", len(blob), 0x004E4942) + blob)
    else:
        gltf["buffers"][0]["uri"] = (
            "data:application/octet-stream;base64,"
            + base64.b64encode(blob).decode())
        with open(path, "w") as f:
            json.dump(gltf, f)
    return path


class TestGltfParse:
    def test_ascii_cube(self, tmp_path):
        path = make_cube_gltf(str(tmp_path / "cube.gltf"))
        g = load_gltf(path)
        assert len(g.meshes) == 1
        mesh = g.meshes[0]
        assert mesh.positions.shape == (24, 3)
        assert mesh.indices.shape == (12, 3)
        assert mesh.normals.shape == (24, 3)
        assert mesh.uvs.shape == (24, 2)
        assert len(g.materials) == 1
        assert g.materials[0].base_color_texture == 0
        assert len(g.textures) == 1
        assert g.textures[0].shape == (8, 8, 4)

    def test_glb_cube(self, tmp_path):
        path = make_cube_gltf(str(tmp_path / "cube.glb"), binary=True)
        g = load_gltf(path)
        assert g.meshes[0].positions.shape == (24, 3)
        assert len(g.textures) == 1

    def test_node_transform_applied(self, tmp_path):
        path = make_cube_gltf(str(tmp_path / "cube.gltf"))
        with open(path) as f:
            g = json.load(f)
        g["nodes"][0]["translation"] = [5.0, 0.0, 0.0]
        with open(path, "w") as f:
            json.dump(g, f)
        scene = Scene.load(path)
        lo, hi = scene.aabb()
        assert abs(lo[0] - 4.5) < 1e-5 and abs(hi[0] - 5.5) < 1e-5


class TestSceneFinalize:
    def test_device_scene_shapes(self, tmp_path):
        path = make_cube_gltf(str(tmp_path / "cube.gltf"))
        ds = Scene.load(path).finalize()
        assert ds.num_triangles == 12
        assert ds.textures.shape[0] == 1
        assert not ds.has_bvh  # small mesh → brute force

    def test_bvh_built_for_big_meshes(self):
        scene = Scene()
        rng = np.random.default_rng(0)
        n = 600
        verts = rng.uniform(-1, 1, (3 * n, 3)).astype(np.float32)
        idx = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
        scene.add_material({"base_color": (0.5, 0.5, 0.5)})
        scene.add_mesh(verts, idx)
        ds = scene.finalize()
        assert ds.has_bvh
        assert ds.bvh.num_nodes == 2 * n - 1


class TestMeshviewerRender:
    def test_textured_cube_render(self, tmp_path):
        path = make_cube_gltf(str(tmp_path / "cube.gltf"))
        accum, film = meshviewer.render(path, 64, 64, samples=2, max_depth=2)
        img = np.asarray(accum)
        assert np.isfinite(img).all()
        center = img[28:36, 28:36]
        corner = img[:4, :4]
        # cube visible in the middle, background at corners
        assert center.mean() != pytest.approx(corner.mean(), rel=0.05)
