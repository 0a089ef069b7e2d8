"""Viewer frame loop, input handling, checkpoint/resume, volume renderer."""
import numpy as np
import pytest

from optix_raytracer_tpu.core import checkpoint as ckpt
from optix_raytracer_tpu.core import film as film_mod
from optix_raytracer_tpu.core.camera import Camera
from optix_raytracer_tpu.scene.builtins import cornell_box, cornell_camera
from optix_raytracer_tpu.wavefront.engine import render_accumulate
from optix_raytracer_tpu.apps.viewer import TracerViewer


@pytest.fixture(scope="module")
def scene():
    return cornell_box()


class TestCheckpoint:
    def test_resume_equals_straight_run(self, scene, tmp_path):
        w = h = 16
        cam_obj = cornell_camera(w, h)
        cam = cam_obj.params()
        # straight: 8 samples
        film, _ = render_accumulate(scene, cam, film_mod.Film.create(h, w),
                                    w, h, samples_per_launch=8, max_depth=2,
                                    chunk_size=None)
        straight = np.asarray(film.accum)
        # split: 4, checkpoint, reload, 4 more
        f1, _ = render_accumulate(scene, cam, film_mod.Film.create(h, w),
                                  w, h, samples_per_launch=4, max_depth=2,
                                  chunk_size=None)
        path = str(tmp_path / "ck.npz")
        ckpt.save_checkpoint(path, f1, cam_obj, {"note": "test"})
        f2, cam2, cfg = ckpt.load_checkpoint(path)
        assert cfg["note"] == "test"
        assert cam2.eye == cam_obj.eye and cam2.fov_y == cam_obj.fov_y
        f3, _ = render_accumulate(scene, cam2.params(), f2, w, h,
                                  samples_per_launch=4, max_depth=2,
                                  chunk_size=None)
        np.testing.assert_allclose(np.asarray(f3.accum), straight,
                                   rtol=1e-5, atol=1e-6)
        assert int(f3.subframe) == 8

    def test_orbax_round_trip(self, scene, tmp_path):
        w = h = 16
        cam_obj = cornell_camera(w, h)
        f1, _ = render_accumulate(scene, cam_obj.params(),
                                  film_mod.Film.create(h, w), w, h,
                                  samples_per_launch=2, max_depth=2,
                                  chunk_size=None)
        path = str(tmp_path / "orbax_ck")
        ckpt.save_checkpoint_orbax(path, f1, cam_obj, {"spp": 2})
        f2, cam2, cfg = ckpt.load_checkpoint_orbax(path)
        assert cfg["spp"] == 2
        assert cam2.eye == cam_obj.eye
        np.testing.assert_array_equal(np.asarray(f2.accum),
                                      np.asarray(f1.accum))
        assert int(f2.subframe) == int(f1.subframe)

    def test_orbax_sharded_restore(self, scene, tmp_path):
        """Multichip film state restores directly onto a mesh sharding."""
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        w, h = 16, 16
        cam_obj = cornell_camera(w, h)
        f1, _ = render_accumulate(scene, cam_obj.params(),
                                  film_mod.Film.create(h, w), w, h,
                                  samples_per_launch=1, max_depth=2,
                                  chunk_size=None)
        path = str(tmp_path / "orbax_sharded")
        ckpt.save_checkpoint_orbax(path, f1, cam_obj)
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("rows",))
        sh = NamedSharding(mesh, P("rows"))
        abstract = film_mod.Film(
            accum=jax.ShapeDtypeStruct(f1.accum.shape, f1.accum.dtype,
                                       sharding=sh),
            subframe=jax.ShapeDtypeStruct(
                f1.subframe.shape, f1.subframe.dtype,
                sharding=NamedSharding(mesh, P())))
        f2, _, _ = ckpt.load_checkpoint_orbax(path, abstract_film=abstract)
        np.testing.assert_array_equal(np.asarray(f2.accum),
                                      np.asarray(f1.accum))


class TestViewer:
    def test_progressive_frames(self, scene):
        v = TracerViewer(scene, cornell_camera(24, 24), 24, 24,
                         spf_log2=1, max_depth=2)
        img1 = v.step()
        assert img1.shape == (24, 24, 4) and img1.dtype == np.uint8
        assert int(v.film.subframe) == 2
        v.step()
        assert int(v.film.subframe) == 4
        assert "render" in v.timers.report()

    def test_camera_keys_reset_accumulation(self, scene):
        v = TracerViewer(scene, cornell_camera(16, 16), 16, 16,
                         spf_log2=0, max_depth=2)
        v.step()
        eye_before = np.asarray(v.camera.eye)
        v.key("w")
        assert v.dirty
        v.step()
        assert int(v.film.subframe) == 1  # reset happened, then 1 sample
        assert not np.allclose(np.asarray(v.camera.eye), eye_before)

    def test_settings_keys(self, scene):
        v = TracerViewer(scene, cornell_camera(8, 8), 8, 8, spf_log2=1)
        v.key("+")
        assert v.spf == 4
        v.key("-")
        v.key("-")
        assert v.spf == 1
        fov = v.camera.fov_y
        v.key("]")
        assert v.camera.fov_y == fov + 5 and v.dirty


class TestVolume:
    def test_march_energy_conservation(self):
        import jax.numpy as jnp
        from optix_raytracer_tpu.accel import volume as vol
        from optix_raytracer_tpu.core.rays import Rays
        grid = vol.pyroclastic_ball(res=24)
        n = 64
        o = np.zeros((n, 3), np.float32)
        o[:, 2] = 3.0
        o[:, 0] = np.linspace(-1.5, 1.5, n)
        rays = Rays.make(jnp.asarray(o),
                         jnp.asarray([[0, 0, -1.0]] * n))
        rad, trans = vol.march(grid, rays, (-0.5, -0.8, -0.33),
                               jnp.asarray([1.0, 1.0, 1.0]),
                               sigma_t=10.0, num_steps=48)
        trans = np.asarray(trans)
        assert (trans >= 0).all() and (trans <= 1.0 + 1e-5).all()
        # central rays pass through the ball → attenuated; edge rays don't
        assert trans[n // 2] < 0.2
        assert trans[0] > 0.9

    def test_denser_grid_darker_transmittance(self):
        import jax.numpy as jnp
        from optix_raytracer_tpu.accel import volume as vol
        from optix_raytracer_tpu.core.rays import Rays
        grid = vol.pyroclastic_ball(res=24)
        rays = Rays.make(jnp.asarray([[0, 0, 3.0]]),
                         jnp.asarray([[0, 0, -1.0]]))
        _, t_lo = vol.march(grid, rays, (0, -1.0, 0), jnp.ones(3),
                            sigma_t=2.0, num_steps=48)
        _, t_hi = vol.march(grid, rays, (0, -1.0, 0), jnp.ones(3),
                            sigma_t=20.0, num_steps=48)
        assert float(t_hi[0]) < float(t_lo[0])


class TestViewerInput:
    """The imgui_test input surface (tracer_window.cpp update_camera /
    settings panel): every key must mutate viewer state the documented way
    and dirty-flag the accumulation when the camera changes."""

    def _viewer(self, w=16, h=16):
        from optix_raytracer_tpu.apps.viewer import TracerViewer
        from optix_raytracer_tpu.scene.builtins import (cornell_box,
                                                        cornell_camera)
        return TracerViewer(cornell_box(), cornell_camera(w, h), w, h,
                            spf_log2=1, max_depth=2)

    def test_move_keys_dirty_and_move(self):
        v = self._viewer()
        eye0 = np.asarray(v.camera.eye)
        v.key("w")
        assert v.dirty
        assert not np.allclose(np.asarray(v.camera.eye), eye0)

    def test_orbit_keys(self):
        v = self._viewer()
        look0 = np.asarray(v.camera.lookat) - np.asarray(v.camera.eye)
        v.key("left")
        look1 = np.asarray(v.camera.lookat) - np.asarray(v.camera.eye)
        assert v.dirty
        cos = (look0 @ look1) / (np.linalg.norm(look0)
                                 * np.linalg.norm(look1))
        assert cos < 0.9999          # direction actually rotated

    def test_settings_keys(self):
        v = self._viewer()
        s0 = v.spf
        v.key("+")
        assert v.spf == 2 * s0
        v.key("-")
        v.key("-")
        assert v.spf == max(s0 // 2, 1)
        f0 = v.camera.fov_y
        v.key("[")
        assert v.camera.fov_y == f0 - 5 and v.dirty
        v.key("]")
        assert v.camera.fov_y == f0
        a0 = v.camera.aperture
        v.key("0")
        assert v.camera.aperture == a0 + 2.0
        v.key("9")
        assert v.camera.aperture == a0

    def test_dirty_resets_film(self):
        v = self._viewer()
        v.step()
        assert int(v.film.subframe) > 0
        v.key("r")
        v.step()
        assert int(v.film.subframe) == v.spf      # restarted then rendered


class TestViewerMatplotlib:
    """The --interactive matplotlib window (the GLFW/imgui-window role,
    tracer_window.cpp:64-183), driven headlessly on the Agg backend with
    synthetic KeyEvents through the real mpl event plumbing."""

    def _window(self, tmp_path, w=16, h=16):
        import matplotlib
        matplotlib.use("Agg", force=True)
        import matplotlib.pyplot as plt
        from optix_raytracer_tpu.apps.viewer import (TracerViewer,
                                                     interactive_on_key)
        from optix_raytracer_tpu.scene.builtins import (cornell_box,
                                                        cornell_camera)
        v = TracerViewer(cornell_box(), cornell_camera(w, h), w, h,
                         spf_log2=0, max_depth=2)
        fig, ax = plt.subplots()
        im = ax.imshow(v.step())
        out = str(tmp_path / "saved.png")
        handler = interactive_on_key(v, im, out, fig)
        fig.canvas.mpl_connect("key_press_event", handler)
        return v, fig, im, out

    def _press(self, fig, key):
        from matplotlib.backend_bases import KeyEvent
        KeyEvent("key_press_event", fig.canvas, key)._process()

    def test_keys_route_through_canvas(self, tmp_path):
        import matplotlib.pyplot as plt
        v, fig, im, out = self._window(tmp_path)
        try:
            eye0 = np.asarray(v.camera.eye)
            self._press(fig, "w")
            assert v.dirty
            assert not np.allclose(np.asarray(v.camera.eye), eye0)
        finally:
            plt.close(fig)

    def test_space_saves_blit_and_q_quits(self, tmp_path):
        import os
        import matplotlib.pyplot as plt
        v, fig, im, out = self._window(tmp_path)
        self._press(fig, " ")
        assert os.path.exists(out)
        from PIL import Image
        img = Image.open(out)
        assert img.size == (16, 16)
        assert plt.fignum_exists(fig.number)
        self._press(fig, "q")
        assert not plt.fignum_exists(fig.number)

    def test_run_interactive_loop_bounded(self, tmp_path):
        import matplotlib
        matplotlib.use("Agg", force=True)
        import matplotlib.pyplot as plt
        from optix_raytracer_tpu.apps.viewer import (TracerViewer,
                                                     run_interactive)
        from optix_raytracer_tpu.scene.builtins import (cornell_box,
                                                        cornell_camera)
        w = h = 16
        v = TracerViewer(cornell_box(), cornell_camera(w, h), w, h,
                         spf_log2=0, max_depth=2)
        run_interactive(v, str(tmp_path / "x.png"), max_frames=2)
        assert int(v.film.subframe) >= 3     # initial blit + 2 loop frames
        plt.close("all")


class TestViewerMouse:
    """Mouse routes (the reference Trackball's mouse bindings,
    `Trackball.h:54-66`): left-drag orbit, right-drag pan, wheel zoom —
    on the TracerViewer route, through synthetic matplotlib MouseEvents,
    and over the HTTP /mouse endpoint."""

    def _viewer(self, w=16, h=16):
        from optix_raytracer_tpu.apps.viewer import TracerViewer
        from optix_raytracer_tpu.scene.builtins import (cornell_box,
                                                        cornell_camera)
        return TracerViewer(cornell_box(), cornell_camera(w, h), w, h,
                            spf_log2=0, max_depth=2)

    def test_mouse_routes(self):
        v = self._viewer()
        eye0 = np.asarray(v.camera.eye)
        look0 = np.asarray(v.camera.lookat)
        v.mouse("drag_left", 40, 10)          # orbit: eye moves, lookat not
        assert v.dirty
        assert not np.allclose(np.asarray(v.camera.eye), eye0)
        np.testing.assert_allclose(np.asarray(v.camera.lookat), look0)
        # orbit preserves the eye-lookat radius
        r0 = np.linalg.norm(eye0 - look0)
        r1 = np.linalg.norm(np.asarray(v.camera.eye) - look0)
        np.testing.assert_allclose(r1, r0, rtol=1e-6)
        v.mouse("scroll", dy=1.0)             # zoom in: radius shrinks
        r2 = np.linalg.norm(np.asarray(v.camera.eye)
                            - np.asarray(v.camera.lookat))
        assert r2 < r1
        look1 = np.asarray(v.camera.lookat)
        v.mouse("drag_right", 30, 0)          # pan moves eye AND lookat
        assert not np.allclose(np.asarray(v.camera.lookat), look1)

    def test_matplotlib_mouse_events(self):
        import matplotlib
        matplotlib.use("Agg", force=True)
        import matplotlib.pyplot as plt
        from matplotlib.backend_bases import MouseEvent
        from optix_raytracer_tpu.apps.viewer import interactive_on_mouse
        v = self._viewer()
        fig, ax = plt.subplots()
        ax.imshow(v.step())
        try:
            on_press, on_move, on_scroll = interactive_on_mouse(v)
            fig.canvas.mpl_connect("button_press_event", on_press)
            fig.canvas.mpl_connect("motion_notify_event", on_move)
            fig.canvas.mpl_connect("scroll_event", on_scroll)
            eye0 = np.asarray(v.camera.eye)
            MouseEvent("button_press_event", fig.canvas, 10, 10,
                       button=1)._process()
            MouseEvent("motion_notify_event", fig.canvas, 50, 30,
                       button=1)._process()
            assert v.dirty
            assert not np.allclose(np.asarray(v.camera.eye), eye0)
            r0 = np.linalg.norm(np.asarray(v.camera.eye)
                                - np.asarray(v.camera.lookat))
            MouseEvent("scroll_event", fig.canvas, 10, 10,
                       step=1)._process()
            r1 = np.linalg.norm(np.asarray(v.camera.eye)
                                - np.asarray(v.camera.lookat))
            assert r1 < r0
        finally:
            plt.close(fig)

    def test_serve_mouse_post(self):
        import urllib.request
        from optix_raytracer_tpu.apps.viewer import ViewerServer
        v = self._viewer()
        srv = ViewerServer(v, port=0)
        try:
            base = f"http://127.0.0.1:{srv.port}"
            for q in ("k=drag_left&dx=40&dy=10", "k=scroll&dx=0&dy=1"):
                req = urllib.request.Request(f"{base}/mouse?{q}",
                                             method="POST")
                assert urllib.request.urlopen(req).status == 200
            evs = srv.pending_mouse()
            assert evs == [("drag_left", 40.0, 10.0), ("scroll", 0.0, 1.0)]
            eye0 = np.asarray(v.camera.eye)
            for kind, dx, dy in evs:
                v.mouse(kind, dx, dy)
            assert v.dirty
            assert not np.allclose(np.asarray(v.camera.eye), eye0)
            # malformed event → 400, not a server error
            req = urllib.request.Request(base + "/mouse?k=scroll&dy=nan2",
                                         method="POST")
            try:
                urllib.request.urlopen(req)
                raised = False
            except urllib.error.HTTPError as e:
                raised = e.code == 400
            assert raised
        finally:
            srv.close()


class TestViewerServer:
    """The HTTP live-view display path (the GLDisplay-blit role on a
    headless host): page serves, frames publish as valid PNG, posted keys
    reach the viewer."""

    def test_serve_roundtrip(self):
        import io
        import urllib.request
        from PIL import Image
        from optix_raytracer_tpu.apps.viewer import TracerViewer, ViewerServer
        from optix_raytracer_tpu.scene.builtins import (cornell_box,
                                                        cornell_camera)
        w = h = 16
        v = TracerViewer(cornell_box(), cornell_camera(w, h), w, h,
                         spf_log2=0, max_depth=2)
        srv = ViewerServer(v, port=0)
        try:
            base = f"http://127.0.0.1:{srv.port}"
            page = urllib.request.urlopen(base + "/").read()
            assert b"frame.png" in page
            srv.publish(v.step(), "7 spp")
            r = urllib.request.urlopen(base + "/frame.png")
            assert r.headers["X-Status"] == "7 spp"
            img = Image.open(io.BytesIO(r.read()))
            assert img.size == (w, h)
            req = urllib.request.Request(base + "/key?k=w", method="POST")
            urllib.request.urlopen(req)
            keys = None
            for _ in range(50):
                keys = srv.pending_keys()
                if keys:
                    break
            assert keys == ["w"]
            v.key(keys[0])
            assert v.dirty
        finally:
            srv.close()

    def test_run_server_frames(self):
        from optix_raytracer_tpu.apps.viewer import TracerViewer, run_server
        from optix_raytracer_tpu.scene.builtins import (cornell_box,
                                                        cornell_camera)
        w = h = 16
        v = TracerViewer(cornell_box(), cornell_camera(w, h), w, h,
                         spf_log2=0, max_depth=2)
        n = run_server(v, port=0, out="", max_frames=3)
        assert n == 3 and int(v.film.subframe) == 3


class TestViewerAnsi:
    """--ansi terminal blit: truecolor half-block frames + key handling
    through the injectable-IO loop."""

    def test_ansi_frame_colors(self):
        from optix_raytracer_tpu.apps.viewer import ansi_frame
        img = np.zeros((8, 16, 3), np.uint8)
        img[:4] = (255, 0, 0)      # top half red
        img[4:] = (0, 0, 255)      # bottom half blue
        s = ansi_frame(img, cols=16)
        lines = s.split("\n")
        assert len(lines) == 4 and all("▀" in ln for ln in lines)
        assert "\x1b[38;2;255;0;0m" in lines[0]    # red upper pixels
        assert "\x1b[48;2;0;0;255m" in lines[-1]   # blue lower pixels
        assert lines[0].endswith("\x1b[0m")

    def test_run_ansi_loop_and_keys(self, scene):
        from optix_raytracer_tpu.apps.viewer import TracerViewer, run_ansi
        from optix_raytracer_tpu.scene.builtins import cornell_camera
        viewer = TracerViewer(scene, cornell_camera(16, 16), 16, 16,
                              spf_log2=0, max_depth=2)
        outputs = []
        keys = [["+"], ["w"], ["q"]]
        frames = run_ansi(viewer, out=None, max_frames=10, cols=16,
                          read_keys=lambda: keys.pop(0) if keys else [],
                          write=outputs.append)
        assert frames == 2          # third poll sees 'q' before rendering
        assert viewer.spf_log2 == 1             # '+' handled
        blits = [o for o in outputs if "▀" in o]
        assert len(blits) == 2 and "spp" in blits[0]


class TestStatsOverlay:
    def test_stats_line_has_fps_and_stage_times(self, scene):
        """displayStats/displayFPS parity (`sutil/sutil.h:117-121`): the
        overlay carries spp, settings, FPS, and per-stage frame times."""
        from optix_raytracer_tpu.core.camera import Camera
        from optix_raytracer_tpu.apps.viewer import TracerViewer
        v = TracerViewer(scene, Camera(eye=(278, 273, -900),
                                             lookat=(278, 273, 279),
                                             fov_y=35, aspect=1.0),
                         16, 16, spf_log2=0, max_depth=2)
        v.step()
        v.step()
        line = v.stats_line()
        assert "fps" in line and "render" in line and "spp" in line
        assert v.timers.fps() > 0.0
        assert v.timers.last["render"] > 0.0
