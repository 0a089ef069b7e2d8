"""OBJ/PLY loading: native C++ parser vs numpy fallback — identical
output on the same files (io/meshio.py, native/mesh_loader.cpp). The
assimp-model-loading role of the reference (`imgui_test/triangle_gas.cpp:77`).
"""
import struct

import numpy as np
import pytest

from optix_raytracer_tpu.io import meshio

OBJ_FULL = """
# cube corner with uv/normals, quads + negative indices
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0 0 1
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 0 1
vn 0 0 -1
f 1/1/1 2/2/1 3/3/1 4/4/1
f -5//2 -4//2 -1//2
"""

OBJ_PLAIN = """
v 0 0 0
v 2 0 0
v 0 2 0
f 1 2 3
"""


def write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def make_ply_ascii(tmp_path, with_normals=True, with_uv=True):
    props = ["property float x", "property float y", "property float z"]
    if with_normals:
        props += ["property float nx", "property float ny",
                  "property float nz"]
    if with_uv:
        props += ["property float u", "property float v"]
    verts = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)]
    lines = ["ply", "format ascii 1.0", "comment generated",
             "element vertex 4"] + props + [
        "element face 2",
        "property list uchar int vertex_indices", "end_header"]
    for i, v in enumerate(verts):
        row = list(v)
        if with_normals:
            row += [0, 0, 1]
        if with_uv:
            row += [i % 2, i // 2]
        lines.append(" ".join(str(float(x)) for x in row))
    lines.append("4 0 1 2 3")          # quad -> 2 tris
    lines.append("3 0 2 3")
    p = tmp_path / "mesh.ply"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def make_ply_binary(tmp_path):
    head = ("ply\nformat binary_little_endian 1.0\n"
            "element vertex 3\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property float nx\nproperty float ny\nproperty float nz\n"
            "element face 1\n"
            "property list uchar int vertex_indices\nend_header\n")
    body = b""
    for v in ((0, 0, 0), (1, 0, 0), (0, 1, 0)):
        body += struct.pack("<6f", *v, 0.0, 0.0, 1.0)
    body += struct.pack("<B3i", 3, 0, 1, 2)
    p = tmp_path / "bin.ply"
    p.write_bytes(head.encode() + body)
    return str(p)


def both_loaders(path):
    py = meshio.load_mesh(path, prefer_native=False)
    nat = meshio._load_native(path)
    return py, nat


class TestObj:
    def test_full_features(self, tmp_path):
        path = write(tmp_path, "full.obj", OBJ_FULL)
        v, f, n, t = meshio.load_mesh(path, prefer_native=False)
        assert f.shape == (3, 3)            # quad -> 2 tris + 1 tri
        assert v.shape[0] == 7              # 4 uv-corner verts + 3 vn=2 ones
        assert n is not None and t is not None
        # first face normal all (0,0,1)
        np.testing.assert_allclose(n[f[0]], [[0, 0, 1]] * 3)
        # negative indices resolved: last face uses v1,v2,v5 with vn 2
        np.testing.assert_allclose(n[f[2]], [[0, 0, -1]] * 3)

    def test_plain_no_attrs(self, tmp_path):
        path = write(tmp_path, "plain.obj", OBJ_PLAIN)
        v, f, n, t = meshio.load_mesh(path, prefer_native=False)
        assert n is None and t is None
        np.testing.assert_allclose(v[f[0]],
                                   [[0, 0, 0], [2, 0, 0], [0, 2, 0]])

    def test_native_matches_python(self, tmp_path):
        path = write(tmp_path, "full.obj", OBJ_FULL)
        py, nat = both_loaders(path)
        if nat is None:
            pytest.skip("native toolchain unavailable")
        for a, b in zip(py, nat):
            if a is None:
                assert b is None
            else:
                np.testing.assert_allclose(a, b)


class TestPly:
    @pytest.mark.parametrize("with_n,with_uv", [(True, True), (False, False),
                                                (True, False)])
    def test_ascii(self, tmp_path, with_n, with_uv):
        path = make_ply_ascii(tmp_path, with_n, with_uv)
        v, f, n, t = meshio.load_mesh(path, prefer_native=False)
        assert v.shape == (4, 3) and f.shape == (3, 3)
        assert (n is not None) == with_n
        assert (t is not None) == with_uv
        np.testing.assert_array_equal(f, [[0, 1, 2], [0, 2, 3], [0, 2, 3]])

    def test_binary(self, tmp_path):
        path = make_ply_binary(tmp_path)
        v, f, n, t = meshio.load_mesh(path, prefer_native=False)
        assert v.shape == (3, 3) and f.shape == (1, 3)
        np.testing.assert_allclose(n, [[0, 0, 1]] * 3)

    @pytest.mark.parametrize("maker", [make_ply_ascii, make_ply_binary])
    def test_native_matches_python(self, tmp_path, maker):
        path = maker(tmp_path)
        py, nat = both_loaders(path)
        if nat is None:
            pytest.skip("native toolchain unavailable")
        for a, b in zip(py, nat):
            if a is None:
                assert b is None
            else:
                np.testing.assert_allclose(a, b)

    def test_bad_index_rejected(self, tmp_path):
        p = tmp_path / "bad.ply"
        p.write_text("ply\nformat ascii 1.0\nelement vertex 1\n"
                     "property float x\nproperty float y\n"
                     "property float z\nelement face 1\n"
                     "property list uchar int vertex_indices\n"
                     "end_header\n0 0 0\n3 0 1 5\n")
        with pytest.raises(ValueError):
            meshio.load_mesh(str(p), prefer_native=False)


class TestSceneIntegration:
    def test_renders_through_meshviewer_scene(self, tmp_path):
        # an OBJ model through Scene + engine end-to-end
        path = write(tmp_path, "tri.obj", OBJ_PLAIN)
        from optix_raytracer_tpu.scene.scene import Scene
        from optix_raytracer_tpu.shade import materials as mat
        v, f, n, t = meshio.load_mesh(path, prefer_native=False)
        s = Scene()
        s.add_material({"kind": mat.DIFFUSE, "base_color": (0.7, 0.2, 0.2)})
        s.add_mesh(v, f, normals=n, uvs=t, material=0)
        scene = s.finalize()
        assert scene.num_triangles == 1
