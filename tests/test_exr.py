"""EXR codec round-trips + the denoiser app's EXR file contract."""
import numpy as np
import pytest

from optix_raytracer_tpu.io.exr import read_exr, write_exr
from optix_raytracer_tpu.io.image import load_image, save_image


@pytest.fixture
def hdr(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 1, (37, 53, 3)) ** 2 * 40.0).astype(np.float32)
    return img, tmp_path


class TestRoundTrip:
    def test_half(self, hdr):
        img, d = hdr
        p = str(d / "a.exr")
        write_exr(p, img, pixel_type="HALF")
        back = read_exr(p)
        assert back.shape == img.shape and back.dtype == np.float32
        # half has 11 bits of mantissa; atol covers subnormal tinies
        np.testing.assert_allclose(back, img, rtol=1.5e-3, atol=1e-6)

    def test_float_exact(self, hdr):
        img, d = hdr
        p = str(d / "a.exr")
        write_exr(p, img, pixel_type="FLOAT")
        np.testing.assert_array_equal(read_exr(p), img)

    def test_channel_names_and_order(self, hdr):
        img, d = hdr
        p = str(d / "a.exr")
        write_exr(p, img, pixel_type="FLOAT")
        layers = read_exr(p, layers=True)
        assert set(layers) == {"R", "G", "B"}
        np.testing.assert_array_equal(layers["G"], img[..., 1])

    def test_two_channel_flow(self, hdr):
        _, d = hdr
        flow = np.random.default_rng(1).normal(
            size=(16, 24, 2)).astype(np.float32)
        p = str(d / "flow.exr")
        write_exr(p, flow, channels=("R", "G"), pixel_type="FLOAT")
        back = read_exr(p)
        np.testing.assert_array_equal(back, flow)

    def test_single_channel(self, hdr):
        _, d = hdr
        y = np.arange(12.0, dtype=np.float32).reshape(3, 4)
        p = str(d / "y.exr")
        write_exr(p, y, pixel_type="FLOAT")
        np.testing.assert_array_equal(read_exr(p)[..., 0], y)

    def test_negative_and_special_values(self, hdr):
        _, d = hdr
        img = np.array([[[-1.5, 0.0, 65504.0]]], np.float32)
        p = str(d / "n.exr")
        write_exr(p, img, pixel_type="HALF")
        np.testing.assert_array_equal(read_exr(p), img)

    @pytest.mark.parametrize("comp", ["NONE", "ZIPS", "ZIP"])
    def test_compression_modes(self, hdr, comp):
        img, d = hdr
        p = str(d / f"c_{comp}.exr")
        write_exr(p, img, pixel_type="FLOAT", compression=comp)
        np.testing.assert_array_equal(read_exr(p), img)

    def test_zip_shrinks_smooth_data(self, tmp_path):
        # A render-like smooth gradient must actually compress.
        import os
        yy, xx = np.mgrid[0:64, 0:96].astype(np.float32)
        img = np.stack([yy / 64, xx / 96, (yy + xx) / 160], axis=-1)
        pn = str(tmp_path / "n.exr")
        pz = str(tmp_path / "z.exr")
        write_exr(pn, img, compression="NONE")
        write_exr(pz, img, compression="ZIP")
        assert os.path.getsize(pz) < 0.7 * os.path.getsize(pn)
        np.testing.assert_allclose(read_exr(pz), read_exr(pn))

    def test_zip_incompressible_chunk_stored_raw(self, tmp_path):
        # Random half data rarely deflates; the raw-chunk fallback must
        # still round-trip.
        rng = np.random.default_rng(3)
        img = rng.standard_normal((21, 33, 3)).astype(np.float32)
        p = str(tmp_path / "r.exr")
        write_exr(p, img, pixel_type="FLOAT", compression="ZIPS")
        np.testing.assert_array_equal(read_exr(p), img)

    def test_image_io_dispatch(self, hdr):
        img, d = hdr
        p = str(d / "via_image.exr")
        save_image(p, img)
        back = load_image(p)
        np.testing.assert_allclose(back, img, rtol=1.5e-3, atol=1e-6)

    def test_rejects_non_exr(self, hdr):
        _, d = hdr
        p = str(d / "bogus.exr")
        with open(p, "wb") as f:
            f.write(b"not an exr at all")
        with pytest.raises(ValueError):
            read_exr(p)


class TestDenoiserAppContract:
    def test_exr_in_exr_out(self, hdr, tmp_path):
        from optix_raytracer_tpu.apps import denoiser as app
        img, _ = hdr
        beauty = str(tmp_path / "beauty.exr")
        albedo = str(tmp_path / "albedo.exr")
        out = str(tmp_path / "out.exr")
        write_exr(beauty, img)
        write_exr(albedo, np.full_like(img, 0.5))
        app.main([beauty, "-a", albedo, "-o", out, "-i", "2"])
        den = read_exr(out)
        assert den.shape == img.shape
        assert np.isfinite(den).all()


class TestPiz:
    """PIZ codec (wavelet + Huffman, `optix_types` denoiser EXR exchange
    parity with tinyexr's PIZ reader — `SDK/support/tinyexr/`)."""

    def _img(self, shape, seed=0):
        rng = np.random.default_rng(seed)
        img = (rng.normal(0, 1, shape).astype(np.float32) ** 2
               * rng.choice([0.01, 1.0, 100.0], shape).astype(np.float32))
        img[::7] = 0.0                     # runs exercise the RLE path
        return img

    @pytest.mark.parametrize("shape,pt", [
        ((37, 53, 3), "HALF"),             # odd dims (wavelet leftovers)
        ((64, 64, 4), "HALF"),             # two chunks, RGBA
        ((33, 17, 3), "FLOAT"),            # 2-u16 sub-planes
        ((5, 3, 1), "HALF"),               # tiny (stored-raw fallback)
        ((100, 200, 3), "HALF"),           # 4 chunks, last partial
    ])
    def test_roundtrip(self, shape, pt, tmp_path):
        from optix_raytracer_tpu.io.exr import read_exr, write_exr
        img = self._img(shape, seed=sum(shape))
        p = str(tmp_path / "t.exr")
        write_exr(p, img, pixel_type=pt, compression="PIZ")
        back = read_exr(p)
        ref = (img.astype(np.float16).astype(np.float32)
               if pt == "HALF" else img)
        np.testing.assert_array_equal(back, ref)

    def test_actually_compresses(self, tmp_path):
        import os
        from optix_raytracer_tpu.io.exr import write_exr
        # a render-like smooth image (PIZ targets natural images, not noise)
        y, x = np.mgrid[0:128, 0:128].astype(np.float32)
        img = np.stack([y / 128, x / 128, (x + y) / 256], -1) * 3.0
        pz = str(tmp_path / "p.exr")
        un = str(tmp_path / "n.exr")
        write_exr(pz, img, compression="PIZ")
        write_exr(un, img, compression="NONE")
        assert os.path.getsize(pz) < 0.8 * os.path.getsize(un)

    def test_huffman_unit(self):
        from optix_raytracer_tpu.io import exr
        rng = np.random.default_rng(1)
        for n in (1, 10, 1000, 5000):
            d = rng.integers(0, 3000, n).astype(np.uint16)
            d[::5] = 7                      # runs
            out = exr._huf_decompress(exr._huf_compress(d), n)
            np.testing.assert_array_equal(out, d)
        # a 300-long run crosses the 256 RLE cap
        d = np.full(300, 9, np.uint16)
        np.testing.assert_array_equal(
            exr._huf_decompress(exr._huf_compress(d), 300), d)

    def test_wavelet_unit(self):
        from optix_raytracer_tpu.io import exr
        rng = np.random.default_rng(2)
        for shape in ((8, 8), (37, 53), (1, 16), (16, 1), (5, 3),
                      (33, 17), (32, 100)):
            for mx in (1000, 60000):        # 14-bit and mod-16 modes
                d = rng.integers(0, mx + 1, shape).astype(np.uint16)
                p = d.copy()
                exr._wav2(p, mx, decode=False)
                exr._wav2(p, mx, decode=True)
                np.testing.assert_array_equal(p, d)


class TestTiledRead:
    """Tiled single-part EXR reads (the tinyexr tiled coverage,
    `SDK/support/tinyexr/`): the writer below follows the OpenEXR
    tiledesc/chunk spec independently of the reader's parsing."""

    @staticmethod
    def _write_tiled(path, img, tile=(7, 5), compression="NONE",
                     level_mode=0, extra_levels=()):
        import struct

        from optix_raytracer_tpu.io import exr as E

        h, w, nc = img.shape
        names = ("R", "G", "B")[:nc]
        pt = E._PT_FLOAT
        order = sorted(range(nc), key=lambda i: names[i])
        chlist = b""
        for i in order:
            chlist += (names[i].encode() + b"\0" + struct.pack("<i", pt)
                       + struct.pack("<i", 0) + struct.pack("<ii", 1, 1))
        chlist += b"\0"
        comp_id = E._COMP_IDS[compression.upper()]
        box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
        tw, th = tile
        header = (E._attr("channels", "chlist", chlist)
                  + E._attr("compression", "compression", bytes([comp_id]))
                  + E._attr("dataWindow", "box2i", box)
                  + E._attr("displayWindow", "box2i", box)
                  + E._attr("lineOrder", "lineOrder", b"\0")
                  + E._attr("pixelAspectRatio", "float",
                            struct.pack("<f", 1.0))
                  + E._attr("screenWindowCenter", "v2f",
                            struct.pack("<ff", 0.0, 0.0))
                  + E._attr("screenWindowWidth", "float",
                            struct.pack("<f", 1.0))
                  + E._attr("tiles", "tiledesc",
                            struct.pack("<IIB", tw, th, level_mode))
                  + b"\0")
        head = E._MAGIC + struct.pack("<i", 2 | 0x200) + header

        chunks = []
        for dy in range(-(-h // th)):
            for dx in range(-(-w // tw)):
                sub = img[dy * th:dy * th + th, dx * tw:dx * tw + tw]
                raw = np.ascontiguousarray(
                    sub[:, :, order].transpose(0, 2, 1).astype(
                        np.float32)).tobytes()
                if comp_id == E._COMP_PIZ:
                    raw = E._piz_compress(raw, sub.shape[1], sub.shape[0],
                                          [2] * nc)
                elif comp_id != E._COMP_NONE:
                    raw = E._zip_compress(raw)
                chunks.append((dx, dy, 0, 0, raw))
        chunks += list(extra_levels)

        first = len(head) + 8 * len(chunks)
        offsets, pos = [], first
        for *_ids, payload in chunks:
            offsets.append(pos)
            pos += 20 + len(payload)
        with open(path, "wb") as f:
            f.write(head)
            f.write(struct.pack("<%dq" % len(chunks), *offsets))
            for dx, dy, lx, ly, payload in chunks:
                f.write(struct.pack("<iiiii", dx, dy, lx, ly,
                                    len(payload)))
                f.write(payload)

    @pytest.mark.parametrize("comp", ["NONE", "ZIP", "PIZ"])
    def test_one_level_tiled(self, tmp_path, comp):
        rng = np.random.default_rng(3)
        img = rng.uniform(0, 4, (23, 31, 3)).astype(np.float32)
        p = str(tmp_path / "t.exr")
        self._write_tiled(p, img, tile=(7, 5), compression=comp)
        out = read_exr(p)
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_mipmap_reads_level0_only(self, tmp_path):
        """MIPMAP-mode files: coarser levels are skipped by their chunk
        headers; the offset-table length accounts for every level."""
        rng = np.random.default_rng(4)
        img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
        # fake coarser levels: one tile each at level (1,1) and (2,2)...
        extras = []
        lw = 16
        lv = 1
        while lw > 1:
            lw = max(1, lw // 2)
            sub = np.zeros((min(lw, 5), min(lw, 7), 3), np.float32)
            raw = sub.transpose(0, 2, 1).tobytes()
            for dy in range(-(-lw // 5)):
                for dx in range(-(-lw // 7)):
                    extras.append((dx, dy, lv, lv, raw))
            lv += 1
        p = str(tmp_path / "m.exr")
        # mode byte: MIPMAP (1) + round-down (0 << 4)
        self._write_tiled(p, img, tile=(7, 5), level_mode=1,
                          extra_levels=extras)
        out = read_exr(p)
        np.testing.assert_allclose(out, img, atol=1e-6)


class TestMultipart:
    """Multipart EXR (version bit 0x1000): header sequence + per-part
    offset tables + part-numbered chunks."""

    @staticmethod
    def _write_multipart(path, parts):
        """parts: list of (name, img [H,W,3] f32). Scanline ZIP parts."""
        import struct

        from optix_raytracer_tpu.io import exr as E

        headers = b""
        bodies = []          # per part: list of (payload) scanline chunks
        for pname, img in parts:
            h, w, nc = img.shape
            names = ("R", "G", "B")[:nc]
            order = sorted(range(nc), key=lambda i: names[i])
            chlist = b""
            for i in order:
                chlist += (names[i].encode() + b"\0"
                           + struct.pack("<i", E._PT_FLOAT)
                           + struct.pack("<i", 0) + struct.pack("<ii", 1, 1))
            chlist += b"\0"
            box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
            lines = E._LINES_PER_CHUNK[E._COMP_ZIP]
            n_chunks = -(-h // lines)
            header = (E._attr("channels", "chlist", chlist)
                      + E._attr("compression", "compression",
                                bytes([E._COMP_ZIP]))
                      + E._attr("dataWindow", "box2i", box)
                      + E._attr("displayWindow", "box2i", box)
                      + E._attr("lineOrder", "lineOrder", b"\0")
                      + E._attr("pixelAspectRatio", "float",
                                struct.pack("<f", 1.0))
                      + E._attr("screenWindowCenter", "v2f",
                                struct.pack("<ff", 0.0, 0.0))
                      + E._attr("screenWindowWidth", "float",
                                struct.pack("<f", 1.0))
                      + E._attr("name", "string", pname.encode())
                      + E._attr("type", "string", b"scanlineimage")
                      + E._attr("chunkCount", "int",
                                struct.pack("<i", n_chunks))
                      + b"\0")
            headers += header
            rows = img[:, :, order].transpose(0, 2, 1).astype(np.float32)
            chunks = []
            for y in range(0, h, lines):
                raw = np.ascontiguousarray(rows[y:y + lines]).tobytes()
                chunks.append((y, E._zip_compress(raw)))
            bodies.append(chunks)

        head = E._MAGIC + struct.pack("<i", 2 | 0x1000) + headers + b"\0"
        total_chunks = sum(len(c) for c in bodies)
        pos = len(head) + 8 * total_chunks
        tables = []
        chunk_bytes = b""
        for pi, chunks in enumerate(bodies):
            offs = []
            for y, payload in chunks:
                offs.append(pos)
                rec = struct.pack("<iii", pi, y, len(payload)) + payload
                chunk_bytes += rec
                pos += len(rec)
            tables.append(offs)
        with open(path, "wb") as f:
            f.write(head)
            for offs in tables:
                f.write(struct.pack("<%dq" % len(offs), *offs))
            f.write(chunk_bytes)

    def test_two_part_read(self, tmp_path):
        from optix_raytracer_tpu.io.exr import read_exr, read_exr_parts
        rng = np.random.default_rng(5)
        beauty = rng.uniform(0, 4, (21, 17, 3)).astype(np.float32)
        albedo = rng.uniform(0, 1, (21, 17, 3)).astype(np.float32)
        p = str(tmp_path / "mp.exr")
        self._write_multipart(p, [("beauty", beauty), ("albedo", albedo)])
        assert read_exr_parts(p) == ["beauty", "albedo"]
        np.testing.assert_allclose(read_exr(p, part=0), beauty, atol=1e-6)
        np.testing.assert_allclose(read_exr(p, part="albedo"), albedo,
                                   atol=1e-6)


class TestDenoiserSequences:
    """optixDenoiser frame-sequence parity: '+' placeholder substitution
    (`optixDenoiser.cpp:75-103` getFrameFilename) and per-frame temporal
    chaining (each output feeds the next frame's history)."""

    def test_frame_filename(self):
        from optix_raytracer_tpu.apps.denoiser import frame_filename
        assert frame_filename("b-++++.exr", 7) == "b-0007.exr"
        assert frame_filename("b-++++.exr", 123) == "b-0123.exr"
        assert frame_filename("static.exr", 5) == "static.exr"
        assert frame_filename("b-++.exr", -1) == "b-++.exr"
        with pytest.raises(ValueError):
            frame_filename("b-++.exr", 1234)

    def test_sequence_run(self, tmp_path):
        from optix_raytracer_tpu.apps import denoiser as app
        rng = np.random.default_rng(2)
        clean = np.zeros((24, 24, 3), np.float32)
        clean[:, :12] = (0.8, 0.3, 0.2)
        clean[:, 12:] = (0.1, 0.6, 0.9)
        for f in (3, 4, 5):
            noisy = np.maximum(
                clean + rng.normal(0, 0.3, clean.shape).astype(np.float32),
                0.0)
            write_exr(str(tmp_path / f"b-++.exr").replace("++", f"{f:02d}"),
                      noisy, pixel_type="FLOAT")
        out_pat = str(tmp_path / "d-++.exr")
        app.main([str(tmp_path / "b-++.exr"), "-o", out_pat,
                  "--Frames", "3-5", "-i", "2"])
        outs = [read_exr(str(tmp_path / f"d-{f:02d}.exr"))
                for f in (3, 4, 5)]
        errs = [np.abs(o - clean).mean() for o in outs]
        # '+' substitution produced all three frames, each denoised well
        # below the raw noise level (E|N(0,.3)| ~ 0.24)
        assert all(np.isfinite(o).all() for o in outs)
        assert max(errs) < 0.12

    def test_flow_only_mode(self, tmp_path):
        from optix_raytracer_tpu.apps import denoiser as app
        rng = np.random.default_rng(3)
        img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
        b = str(tmp_path / "b.exr")
        o = str(tmp_path / "o.exr")
        write_exr(b, img, pixel_type="FLOAT")
        app.main([b, "-o", o, "-z"])
        np.testing.assert_allclose(read_exr(o), img, atol=2e-3)  # half out

    def test_aov_mode_writes_aovs(self, tmp_path):
        from optix_raytracer_tpu.apps import denoiser as app
        import os
        rng = np.random.default_rng(4)
        img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
        b = str(tmp_path / "b.exr")
        av = str(tmp_path / "glossy.exr")
        o = str(tmp_path / "out.exr")
        write_exr(b, img)
        write_exr(av, img * 0.5)
        app.main([b, "-A", av, "-o", o, "-i", "2"])
        assert read_exr(o).shape == img.shape
        assert read_exr(str(tmp_path / "aov_out.exr")).shape == img.shape


class TestMultipartWrite:
    """write_exr_multipart round-trips through the multipart reader
    (per-part compression/pixel-type, name lookup, chunk part-numbers)."""

    def test_round_trip_parts(self, tmp_path):
        from optix_raytracer_tpu.io.exr import (read_exr, read_exr_parts,
                                                write_exr_multipart)
        rng = np.random.default_rng(4)
        beauty = rng.uniform(0, 4, (33, 20, 3)).astype(np.float32)
        albedo = rng.uniform(0, 1, (33, 20, 3)).astype(np.float32)
        depth = rng.uniform(0, 100, (33, 20)).astype(np.float32)
        p = str(tmp_path / "mp.exr")
        write_exr_multipart(p, [
            ("beauty", beauty),
            ("albedo", albedo, {"compression": "PIZ"}),
            ("depth", depth, {"pixel_type": "FLOAT",
                              "compression": "NONE",
                              "channels": ("Z",)}),
        ])
        assert read_exr_parts(p) == ["beauty", "albedo", "depth"]
        np.testing.assert_allclose(read_exr(p, part=0), beauty,
                                   rtol=1.5e-3, atol=1e-6)
        np.testing.assert_allclose(read_exr(p, part="albedo"), albedo,
                                   rtol=1.5e-3, atol=1e-6)
        z = read_exr(p, part="depth", layers=True)
        np.testing.assert_array_equal(z["Z"], depth)  # FLOAT: exact

    def test_single_part_unchanged(self, tmp_path):
        """The shared builder must not alter single-part output layout."""
        from optix_raytracer_tpu.io.exr import read_exr, write_exr
        img = np.random.default_rng(6).uniform(
            0, 2, (17, 9, 4)).astype(np.float32)
        p = str(tmp_path / "sp.exr")
        write_exr(p, img, pixel_type="FLOAT")
        np.testing.assert_array_equal(read_exr(p), img)
