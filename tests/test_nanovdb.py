"""NanoVDB (.nvdb) codec: round-trip, densification, and viewer ingest.

The reference loads real NanoVDB fog volumes
(`optixVolumeViewer.cpp:641-678`); `io/nanovdb.py` reads/writes the same
on-disk format (ABI 29, the vendored version). The strongest check here
compiles a tiny harness against the REFERENCE's own vendored headers and
reads a file we wrote — byte-level compatibility against the original
implementation, not just our own reader (skipped when the reference tree
or g++ is absent).
"""
import os
import shutil
import subprocess

import numpy as np
import pytest

from optix_raytracer_tpu.io import nanovdb as nv

_REF = "/root/reference/SDK/optixVolumeViewer"


def _sparse_grid(seed=0, shape=(40, 24, 56)):
    rng = np.random.default_rng(seed)
    vals = np.zeros(shape, np.float32)
    blob = rng.uniform(0.2, 1.0, (16, 8, 24)).astype(np.float32)
    vals[10:26, 8:16, 20:44] = blob
    vals[vals < 0.3] = 0.0
    return vals


class TestRoundTrip:
    def test_exact_values_nonzero_origin(self, tmp_path):
        vals = _sparse_grid()
        p = str(tmp_path / "t.nvdb")
        nv.write_nvdb(p, vals, ijk_min=(8, -16, 0),
                      voxel_size=(0.5, 0.25, 1.0),
                      translation=(1.0, 2.0, 3.0), name="dens")
        g = nv.read_nvdb(p)
        assert g.name == "dens"
        assert g.grid_class == nv.GRID_CLASS_FOG
        # read densifies over the ACTIVE bbox; align into written space
        off = g.ijk_min - np.array([8, -16, 0])
        sub = vals[off[2]:off[2] + g.values.shape[0],
                   off[1]:off[1] + g.values.shape[1],
                   off[0]:off[0] + g.values.shape[2]]
        np.testing.assert_array_equal(g.values, sub)
        np.testing.assert_allclose(g.voxel_size, [0.5, 0.25, 1.0])
        np.testing.assert_allclose(g.translation, [1.0, 2.0, 3.0])
        # world AABB: translation + ijk * voxel_size, max extended by 1
        np.testing.assert_allclose(
            g.world_lo, np.array([1.0, 2.0, 3.0])
            + g.ijk_min * g.voxel_size)
        np.testing.assert_allclose(
            g.world_hi, np.array([1.0, 2.0, 3.0])
            + (g.ijk_min + g.values.shape[::-1]) * g.voxel_size)

    def test_zip_codec(self, tmp_path):
        vals = _sparse_grid(seed=3)
        raw = str(tmp_path / "raw.nvdb")
        zipped = str(tmp_path / "zip.nvdb")
        nv.write_nvdb(raw, vals)
        nv.write_nvdb(zipped, vals, codec=nv.CODEC_ZIP)
        assert os.path.getsize(zipped) < os.path.getsize(raw) / 2
        np.testing.assert_array_equal(nv.read_nvdb(raw).values,
                                      nv.read_nvdb(zipped).values)

    def test_metadata_listing(self, tmp_path):
        p = str(tmp_path / "m.nvdb")
        nv.write_nvdb(p, _sparse_grid(), name="smoke")
        metas = nv.read_grid_metadata(p)
        assert len(metas) == 1
        m = metas[0]
        assert m.name == "smoke" and m.grid_type == nv.GRID_TYPE_FLOAT
        assert m.voxel_count == int((_sparse_grid() != 0).sum())

    def test_named_grid_selection_error(self, tmp_path):
        p = str(tmp_path / "n.nvdb")
        nv.write_nvdb(p, _sparse_grid(), name="a")
        with pytest.raises(ValueError, match="no grid named"):
            nv.read_nvdb(p, grid_name="b")

    def test_multi_leaf_lattice_spans_lower_nodes(self, tmp_path):
        # >128 voxels along x forces two lower internal nodes
        vals = np.zeros((8, 8, 200), np.float32)
        vals[2:6, 2:6, 4:196] = 0.7
        p = str(tmp_path / "wide.nvdb")
        nv.write_nvdb(p, vals)
        g = nv.read_nvdb(p)
        assert g.values.sum() == pytest.approx(vals.sum(), rel=1e-6)


class TestDensityGridIngest:
    def test_load_density_grid_world_aabb(self, tmp_path):
        vals = _sparse_grid()
        p = str(tmp_path / "d.nvdb")
        nv.write_nvdb(p, vals, voxel_size=0.1)
        dg = nv.load_density_grid(p)
        lo = np.asarray(dg.lo)
        hi = np.asarray(dg.hi)
        assert ((hi - lo) > 0).all()
        span_xyz = np.asarray(dg.density.shape[::-1]) * 0.1
        np.testing.assert_allclose(hi - lo, span_xyz, rtol=1e-5)

    def test_downsample_budget(self, tmp_path):
        vals = np.ones((64, 64, 64), np.float32)
        p = str(tmp_path / "big.nvdb")
        nv.write_nvdb(p, vals)
        dg = nv.load_density_grid(p, max_voxels=32 ** 3)
        assert np.prod(dg.density.shape) <= 32 ** 3
        # mean pooling of a constant grid is the constant
        np.testing.assert_allclose(np.asarray(dg.density), 1.0, atol=1e-6)

    def test_viewer_renders_nvdb(self, tmp_path):
        from optix_raytracer_tpu.apps import volume_viewer as vv
        vals = np.zeros((32, 32, 32), np.float32)
        z, y, x = np.mgrid[:32, :32, :32]
        r = np.sqrt((x - 16) ** 2 + (y - 16) ** 2 + (z - 16) ** 2)
        vals[r < 12] = 1.0
        p = str(tmp_path / "ball.nvdb")
        nv.write_nvdb(p, vals)
        accum, _ = vv.render(64, 64, samples=1, num_steps=24, grid_file=p)
        img = np.asarray(accum)
        assert np.isfinite(img).all()
        # the ball must actually occlude/brighten the center vs sky corner
        assert abs(img[32, 32].mean() - img[2, 2].mean()) > 0.01


@pytest.mark.skipif(not os.path.isdir(_REF) or not shutil.which("g++"),
                    reason="reference NanoVDB headers or g++ unavailable")
class TestReferenceCompat:
    """Read our file through the reference's vendored NanoVDB headers."""

    HARNESS = r"""
#include <nanovdb/util/IO.h>
#include <cstdio>
#include <cstdlib>
int main(int argc, char** argv) {
    auto handle = nanovdb::io::readGrid<>(argv[1]);
    auto* grid = handle.grid<float>();
    if (!grid) { fprintf(stderr, "not float\n"); return 1; }
    auto bbox = grid->indexBBox();
    auto acc = grid->getAccessor();
    double sum = 0; long n = 0;
    for (int i = bbox.min()[0]; i <= bbox.max()[0]; ++i)
      for (int j = bbox.min()[1]; j <= bbox.max()[1]; ++j)
        for (int k = bbox.min()[2]; k <= bbox.max()[2]; ++k) {
            nanovdb::Coord c(i, j, k);
            if (acc.isActive(c)) { sum += acc.getValue(c); ++n; }
        }
    printf("%ld %.6f %llu\n", n, sum,
           (unsigned long long)grid->activeVoxelCount());
    for (int a = 2; a + 2 < argc; a += 3)
        printf("%.6f\n", acc.getValue(nanovdb::Coord(
            atoi(argv[a]), atoi(argv[a+1]), atoi(argv[a+2]))));
    return 0;
}
"""

    @pytest.fixture(scope="class")
    def harness(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("nvdbref")
        src = d / "check.cpp"
        src.write_text(self.HARNESS)
        exe = str(d / "check")
        subprocess.run(["g++", "-O1", "-std=c++14", f"-I{_REF}",
                        "-o", exe, str(src)], check=True,
                       capture_output=True)
        return exe

    def test_reference_reads_our_file(self, harness, tmp_path):
        vals = _sparse_grid(seed=7)
        p = str(tmp_path / "x.nvdb")
        nv.write_nvdb(p, vals, ijk_min=(8, -16, 0),
                      voxel_size=(0.5, 0.25, 1.0))
        # probe three voxels incl. one in negative index space
        probes = [(30, -6, 12), (28, -8, 10), (40, -4, 20)]
        args = [harness, p] + [str(v) for ijk in probes for v in ijk]
        out = subprocess.run(args, capture_output=True, text=True,
                             check=True).stdout.split()
        n, total, reported = int(out[0]), float(out[1]), int(out[2])
        active = vals != 0
        assert n == reported == int(active.sum())
        assert total == pytest.approx(float(vals[active].sum()), rel=1e-5)
        for probe, got in zip(probes, out[3:]):
            x, y, z = np.array(probe) - np.array([8, -16, 0])
            assert float(got) == pytest.approx(float(vals[z, y, x]),
                                               rel=1e-6)
