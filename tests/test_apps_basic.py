"""Headless smoke tests of the first apps (the optixConsole pattern:
deterministic render → programmatic inspection, SURVEY.md §4)."""
import numpy as np

from optix_raytracer_tpu.apps import hello, triangle


class TestHello:
    def test_solid_color(self):
        img = np.asarray(hello.render(64, 48, color=(0.462, 0.725, 0.0)))
        assert img.shape == (48, 64, 4)
        # Every pixel identical, alpha opaque, sRGB-encoded green dominant.
        assert (img == img[0, 0]).all()
        r, g, b, a = img[0, 0]
        assert a == 255 and g > r > b


class TestTriangle:
    def test_hit_and_miss_regions(self):
        img = np.asarray(triangle.render(96, 96))
        h, w = 96, 96
        center = img[h // 2, w // 2]
        corner = img[2, 2]
        # center hits the triangle (barycentric shading → not the miss color)
        assert (center[:3] != corner[:3]).any()
        # corner is the miss color: blue-ish gradient base
        assert corner[2] > corner[0]

    def test_deterministic(self):
        a = np.asarray(triangle.render(64, 64))
        b = np.asarray(triangle.render(64, 64))
        np.testing.assert_array_equal(a, b)

    def test_io_roundtrip(self, tmp_path):
        from optix_raytracer_tpu.io.image import load_image, save_image
        img = np.asarray(triangle.render(32, 32))
        for name in ["t.png", "t.ppm"]:
            path = str(tmp_path / name)
            save_image(path, img)
            back = load_image(path)
            np.testing.assert_array_equal(back[..., :3], img[..., :3])
