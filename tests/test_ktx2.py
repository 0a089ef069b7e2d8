"""KTX2 container reader + KHR_texture_basisu glTF integration
(round-2 VERDICT format-parity item: uncompressed/zstd levels)."""
import json

import numpy as np
import pytest

from optix_raytracer_tpu.io import ktx2


def checker(h=16, w=16, c=4):
    arr = np.zeros((h, w, c), np.uint8)
    arr[::2, ::2] = 250
    arr[1::2, 1::2] = 60
    if c == 4:
        arr[..., 3] = 255
    return arr


class TestContainer:
    @pytest.mark.parametrize("scheme", ["NONE", "ZSTD", "ZLIB"])
    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    def test_roundtrip(self, tmp_path, scheme, channels):
        img = checker(12, 20, channels)
        p = str(tmp_path / "t.ktx2")
        ktx2.write_ktx2(p, img, supercompression=scheme)
        back, srgb = ktx2.read_ktx2(p)
        np.testing.assert_array_equal(back, img)
        assert not srgb

    def test_srgb_flag(self, tmp_path):
        p = str(tmp_path / "s.ktx2")
        ktx2.write_ktx2(p, checker(8, 8, 3), srgb=True)
        _, srgb = ktx2.read_ktx2(p)
        assert srgb

    def test_rgba_expansion(self, tmp_path):
        img = checker(8, 8, 1)
        p = str(tmp_path / "g.ktx2")
        ktx2.write_ktx2(p, img)
        rgba = ktx2.read_ktx2_rgba(p)
        assert rgba.shape == (8, 8, 4)
        np.testing.assert_array_equal(rgba[..., 0], img[..., 0])
        assert (rgba[..., 3] == 255).all()

    def test_zstd_actually_compresses(self, tmp_path):
        import os
        img = np.zeros((64, 64, 4), np.uint8)
        pz = str(tmp_path / "z.ktx2")
        pn = str(tmp_path / "n.ktx2")
        ktx2.write_ktx2(pz, img, supercompression="ZSTD")
        ktx2.write_ktx2(pn, img, supercompression="NONE")
        assert os.path.getsize(pz) < 0.1 * os.path.getsize(pn)

    def test_rejects_non_ktx2(self):
        with pytest.raises(ValueError):
            ktx2.read_ktx2(b"definitely not ktx2 bytes")

    def test_basislz_raises_clearly(self, tmp_path):
        import struct
        p = str(tmp_path / "b.ktx2")
        ktx2.write_ktx2(p, checker(8, 8, 4))
        raw = bytearray(open(p, "rb").read())
        # patch vkFormat=0 (UNDEFINED, as BasisLZ files use) + scheme=1
        struct.pack_into("<I", raw, 12, 0)
        struct.pack_into("<I", raw, 12 + 32, 1)
        open(p, "wb").write(bytes(raw))
        with pytest.raises(NotImplementedError, match="BasisLZ"):
            ktx2.read_ktx2(p)


class TestGltfBasisu:
    def test_khr_texture_basisu_loads(self, tmp_path):
        """A textured quad whose texture rides KHR_texture_basisu → KTX2
        (zstd); the loader must pick the extension's source image."""
        from optix_raytracer_tpu.scene import gltf as G
        tex = checker(8, 8, 4)
        ktx2.write_ktx2(str(tmp_path / "tex.ktx2"), tex,
                        supercompression="ZSTD")
        pos = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                       np.float32)
        uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
        blob = pos.tobytes() + uv.tobytes() + idx.tobytes()
        import base64
        doc = {
            "asset": {"version": "2.0"}, "scene": 0,
            "scenes": [{"nodes": [0]}], "nodes": [{"mesh": 0}],
            "extensionsUsed": ["KHR_texture_basisu"],
            "meshes": [{"primitives": [{
                "attributes": {"POSITION": 0, "TEXCOORD_0": 1},
                "indices": 2, "material": 0}]}],
            "materials": [{"pbrMetallicRoughness": {
                "baseColorTexture": {"index": 0}}}],
            "textures": [{"extensions": {
                "KHR_texture_basisu": {"source": 0}}}],
            "images": [{"uri": "tex.ktx2", "mimeType": "image/ktx2"}],
            "buffers": [{
                "uri": ("data:application/octet-stream;base64,"
                        + base64.b64encode(blob).decode()),
                "byteLength": len(blob)}],
            "bufferViews": [
                {"buffer": 0, "byteOffset": 0, "byteLength": pos.nbytes},
                {"buffer": 0, "byteOffset": pos.nbytes,
                 "byteLength": uv.nbytes},
                {"buffer": 0, "byteOffset": pos.nbytes + uv.nbytes,
                 "byteLength": idx.nbytes},
            ],
            "accessors": [
                {"bufferView": 0, "componentType": 5126, "count": 4,
                 "type": "VEC3"},
                {"bufferView": 1, "componentType": 5126, "count": 4,
                 "type": "VEC2"},
                {"bufferView": 2, "componentType": 5123, "count": 6,
                 "type": "SCALAR"},
            ],
        }
        path = str(tmp_path / "quad.gltf")
        with open(path, "w") as f:
            json.dump(doc, f)
        g = G.load_gltf(path)
        assert len(g.textures) == 1
        np.testing.assert_array_equal(np.asarray(g.textures[0]), tex)
