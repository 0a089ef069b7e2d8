"""The interactive progressive renderer — the imgui_test equivalent.

Reference: `SDK/imgui_test/` (the fork author's playground): a GLFW/imgui
loop with a movable DoF camera (WASD + orbit), a settings panel (samples per
frame 2^n, FOV, aperture, tone factor), per-frame re-upload of launch params
+ `optixLaunch`, PBO blit, and save-to-PNG on Space
(`tracer_window.cpp:64-183`, `camera.h:17-172`, `main.cpp:41-303`).

TPU hosts are headless-first, so the default mode renders N progressive
frames and writes the image + a stage-time report (the displayStats overlay).
With a display and matplotlib, `--interactive` opens a live window:
  WASDQE move · arrow keys orbit · +/- samples-per-frame · [ ] FOV ·
  9/0 aperture · r reset accumulation · space save PNG · q quit.
Checkpoint/resume: --checkpoint saves on exit, --resume continues.
"""
from __future__ import annotations

import argparse

from ._cli import parse_dim
import time

import numpy as np

from ..api.context import StageTimers
from ..core import checkpoint as ckpt
from ..core import film as film_mod
from ..core.camera import Camera, Trackball
from ..io.image import save_image
from ..scene.builtins import cornell_box, cornell_camera, whitted_scene, whitted_camera
from ..wavefront.engine import render_accumulate
from ..wavefront.whitted import render_whitted_sample


class TracerViewer:
    """The TracerWindow role: owns scene/camera/film + the frame loop."""

    def __init__(self, scene, camera: Camera, width: int, height: int,
                 integrator: str = "pathtrace", spf_log2: int = 2,
                 max_depth: int = 4):
        self.scene = scene
        self.camera = camera
        self.width = width
        self.height = height
        self.integrator = integrator
        self.spf_log2 = spf_log2          # samples per frame = 2^n
        self.max_depth = max_depth
        self.film = film_mod.Film.create(height, width)
        self.trackball = Trackball(camera, move_speed=50.0)
        self.timers = StageTimers()
        self.dirty = False                # camera/settings changed → reset

    @property
    def spf(self):
        return 1 << self.spf_log2

    def reset(self):
        self.film = self.film.reset()

    def step(self):
        """One frame: (maybe) reset, render spf samples, return uint8 RGBA."""
        with self.timers.stage("state_update"):
            if self.dirty:
                self.reset()
                self.dirty = False
            cam = self.camera.params()
        with self.timers.stage("render"):
            if self.integrator == "whitted":
                radiance = render_whitted_sample(
                    self.scene, cam, self.width, self.height,
                    self.film.subframe, max_depth=self.max_depth)
                self.film = self.film.accumulate(radiance)
            else:
                self.film, _ = render_accumulate(
                    self.scene, cam, self.film, self.width, self.height,
                    samples_per_launch=self.spf, max_depth=self.max_depth)
        with self.timers.stage("display"):
            img = np.asarray(film_mod.make_color(self.film.accum))
        self.timers.frame_done()
        return img

    # --- input handling (tracer_window.cpp update_camera / imgui panel) ---
    def key(self, k: str):
        if k in "wasdqe":
            self.trackball.move(k, dt=0.1)
            self.dirty = True
        elif k in ("up", "down", "left", "right"):
            dx = {"left": 40, "right": -40}.get(k, 0)
            dy = {"up": 25, "down": -25}.get(k, 0)
            self.trackball.orbit(dx, dy)
            self.dirty = True
        elif k == "+":
            self.spf_log2 = min(self.spf_log2 + 1, 8)
        elif k == "-":
            self.spf_log2 = max(self.spf_log2 - 1, 0)
        elif k == "[":
            self.camera.fov_y = max(self.camera.fov_y - 5, 5)
            self.dirty = True
        elif k == "]":
            self.camera.fov_y = min(self.camera.fov_y + 5, 120)
            self.dirty = True
        elif k == "9":
            self.camera.aperture = max(self.camera.aperture - 2.0, 0.0)
            self.dirty = True
        elif k == "0":
            self.camera.aperture += 2.0
            self.dirty = True
        elif k == "r":
            self.dirty = True


def build(args, width, height):
    if args.model:
        from ..scene.scene import Scene
        from ..shade.lights import AMBIENT, DIRECTIONAL
        host = Scene.load(args.model)
        cam = host.default_camera(width, height)
        lights = [{"kind": DIRECTIONAL, "direction": (-0.4, -0.7, -0.6),
                   "color": (0.9, 0.9, 0.9)},
                  {"kind": AMBIENT, "color": (0.25, 0.25, 0.25)}]
        return host.finalize(lights=lights), cam, "whitted"
    if args.scene == "whitted":
        return whitted_scene(), whitted_camera(width, height), "whitted"
    return cornell_box(), cornell_camera(width, height), "pathtrace"


def run_headless(viewer: TracerViewer, frames: int, out: str):
    img = None
    for f in range(frames):
        img = viewer.step()
        print(f"frame {f + 1}/{frames}  spp={int(viewer.film.subframe)}  "
              f"| {viewer.timers.report()}")
    if out:
        save_image(out, img)
        print(f"wrote {out}")
    return img


def run_interactive(viewer: TracerViewer, out: str):
    import matplotlib
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(8, 8))
    fig.canvas.manager.set_window_title("optix_raytracer_tpu viewer")
    im = ax.imshow(viewer.step())
    ax.axis("off")

    def on_key(event):
        k = event.key
        if k == "q":
            plt.close(fig)
            return
        if k == " ":
            save_image(out or "render.png", np.asarray(im.get_array()))
            print(f"saved ({int(viewer.film.subframe)} spp)")
            return
        viewer.key(k or "")

    fig.canvas.mpl_connect("key_press_event", on_key)
    while plt.fignum_exists(fig.number):
        im.set_data(viewer.step())
        ax.set_title(f"{int(viewer.film.subframe)} spp | spf {viewer.spf} "
                     f"| fov {viewer.camera.fov_y:.0f}")
        plt.pause(0.01)


def main(argv=None):
    p = argparse.ArgumentParser(description="interactive viewer (imgui_test)")
    p.add_argument("--model", "-m", default=None, help=".gltf/.glb model")
    p.add_argument("--scene", default="cornell", choices=["cornell", "whitted"])
    p.add_argument("--file", "-o", default="viewer.png")
    p.add_argument("--dim", default="768x768")
    p.add_argument("--frames", type=int, default=8,
                   help="frames to render in headless mode")
    p.add_argument("--spf", type=int, default=2, help="log2 samples/frame")
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--interactive", "-w", action="store_true",
                   help="open a live window (needs a display)")
    p.add_argument("--checkpoint", default=None,
                   help="write render state here on exit")
    p.add_argument("--resume", default=None, help="resume from a checkpoint")
    args = p.parse_args(argv)
    w, h = parse_dim(args.dim)

    scene, camera, integrator = build(args, w, h)
    viewer = TracerViewer(scene, camera, w, h, integrator=integrator,
                          spf_log2=args.spf, max_depth=args.depth)
    if args.resume:
        film, cam2, cfg = ckpt.load_checkpoint(args.resume)
        viewer.film = film
        if cam2 is not None:
            viewer.camera = cam2
            viewer.trackball = Trackball(cam2, move_speed=50.0)
        print(f"resumed at {int(film.subframe)} spp")

    if args.interactive:
        run_interactive(viewer, args.file)
    else:
        run_headless(viewer, args.frames, args.file)

    if args.checkpoint:
        ckpt.save_checkpoint(args.checkpoint, viewer.film, viewer.camera,
                             {"integrator": integrator})
        print(f"checkpoint → {args.checkpoint}")


if __name__ == "__main__":
    main()
