"""Cameras: pinhole UVW-frame, depth-of-field, orthographic; plus a trackball.

Replaces `SDK/sutil/Camera.{h,cpp}` (eye/lookat/up/fovY/aspect → UVW basis,
`Camera.h:38-76`), the imgui_test movable DoF/ortho camera
(`SDK/imgui_test/camera.h:17-172`, `compute_ray` with aperture jitter `:127-144`)
and `sutil/Trackball.h:38-120`. Ray generation is a pure batched function of
pixel coordinates — the `__raygen__pinhole` equivalent
(`SDK/cuda/whitted.cu:44-98`) with jittered progressive sampling.
"""
from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np

from . import rng as _rng
from .rays import Rays
from .vecmath import cross, normalize


@dataclasses.dataclass
class Camera:
    """Host-side camera description (mutable, like `sutil::Camera`)."""
    eye: tuple = (0.0, 0.0, 1.0)
    lookat: tuple = (0.0, 0.0, 0.0)
    up: tuple = (0.0, 1.0, 0.0)
    fov_y: float = 35.0          # degrees, like sutil::Camera::fovY
    aspect: float = 1.0
    aperture: float = 0.0        # lens radius; 0 = pinhole (imgui_test camera.h:127-144)
    focal_distance: float = 1.0  # only used when aperture > 0
    orthographic: bool = False   # imgui_test ortho mode (camera.h:103-125)
    ortho_height: float = 2.0

    def uvw_frame(self):
        """Compute the U, V, W basis (reference `sutil/Camera.cpp` UVWFrame)."""
        eye = np.asarray(self.eye, np.float32)
        lookat = np.asarray(self.lookat, np.float32)
        up = np.asarray(self.up, np.float32)
        w = lookat - eye                      # W points from eye to lookat (reference keeps |W| = focal length)
        wlen = np.linalg.norm(w)
        u = np.cross(w, up)
        u /= max(np.linalg.norm(u), 1e-20)
        v = np.cross(u, w)
        v /= max(np.linalg.norm(v), 1e-20)
        vlen = wlen * math.tan(0.5 * math.radians(self.fov_y))
        ulen = vlen * self.aspect
        return u * ulen, v * vlen, w

    def params(self):
        """Device-side launch params: dict of jnp arrays (the LaunchParams camera
        block, reference `SDK/cuda/whitted.h:96-99`)."""
        u, v, w = self.uvw_frame()
        return dict(
            eye=jnp.asarray(self.eye, jnp.float32),
            U=jnp.asarray(u), V=jnp.asarray(v), W=jnp.asarray(w),
            aperture=jnp.float32(self.aperture),
            focal_distance=jnp.float32(self.focal_distance),
            ortho=jnp.asarray(1 if self.orthographic else 0, jnp.int32),
            ortho_half=jnp.asarray(
                [0.5 * self.ortho_height * self.aspect, 0.5 * self.ortho_height],
                jnp.float32),
        )


def generate_rays(cam_params, width, height, rng_state=None, jitter=True,
                  y0=0, x0=0, full_width=None, full_height=None, y_stride=1):
    """Batched raygen for a [height, width] pixel grid.

    Maps the per-pixel body of `__raygen__pinhole` (`SDK/cuda/whitted.cu:55-75`):
    subpixel-jittered NDC coordinates → d = 2*(idx+jitter)/dim - 1 →
    direction = d.x*U + d.y*V + W. With aperture > 0, adds the imgui_test
    thin-lens jitter (`camera.h:127-144`). Returns (Rays, next_rng_state);
    rng_state may be None for centered (non-jittered) rays.

    (y0, x0, full_width, full_height) render a sub-tile of a larger image —
    the multi-device work-distribution hook (each chip raygens only its own
    tile; reference `SDK/sutil/WorkDistribution.h:60-81` assigns pixels per
    GPU the same way). y0/x0 may be traced values (e.g. from
    `jax.lax.axis_index` inside shard_map).
    """
    full_w = width if full_width is None else full_width
    full_h = height if full_height is None else full_height
    ix = jnp.arange(width, dtype=jnp.float32)[None, :] + x0
    # y_stride > 1 = interleaved row ownership (round-robin rows per chip,
    # the load-balancing idea of WorkDistribution.h's interleaved tiles).
    iy = jnp.arange(height, dtype=jnp.float32)[:, None] * y_stride + y0
    ix = jnp.broadcast_to(ix, (height, width))
    iy = jnp.broadcast_to(iy, (height, width))

    if jitter and rng_state is not None:
        jx, jy, rng_state = _rng.uniform2(rng_state)
    else:
        jx = jy = jnp.float32(0.5)

    # NDC in [-1, 1]; image row 0 is the top → flip y so +V is up.
    dx = 2.0 * ((ix + jx) / full_w) - 1.0
    dy = 1.0 - 2.0 * ((iy + jy) / full_h)

    U, V, W = cam_params["U"], cam_params["V"], cam_params["W"]
    eye = cam_params["eye"]

    direction = normalize(dx[..., None] * U + dy[..., None] * V + W)
    origin = jnp.broadcast_to(eye, direction.shape)

    # Orthographic: origin slides on the image plane, direction is fixed W-hat.
    ohx, ohy = cam_params["ortho_half"][0], cam_params["ortho_half"][1]
    un, vn = normalize(U), normalize(V)
    ortho_origin = eye + (dx * ohx)[..., None] * un + (dy * ohy)[..., None] * vn
    ortho_dir = jnp.broadcast_to(normalize(W), direction.shape)
    is_ortho = cam_params["ortho"] > 0
    origin = jnp.where(is_ortho, ortho_origin, origin)
    direction = jnp.where(is_ortho, ortho_dir, direction)

    # Thin-lens depth of field (imgui_test camera.h:127-144): jitter the origin
    # on the lens disk, re-aim at the focal point. aperture is a traced scalar,
    # so both branches are evaluated and selected — the DoF math is a few FMAs,
    # which is the branchless idiom a vector machine wants anyway.
    if rng_state is not None:
        aperture = cam_params["aperture"]
        u1, u2, rng_state = _rng.uniform2(rng_state)
        r = jnp.sqrt(u1) * aperture
        phi = 2.0 * jnp.float32(jnp.pi) * u2
        lens = (r * jnp.cos(phi))[..., None] * un + (r * jnp.sin(phi))[..., None] * vn
        focus = origin + cam_params["focal_distance"] * direction
        dof_origin = origin + lens
        dof_direction = normalize(focus - dof_origin)
        use_dof = aperture > 0.0
        origin = jnp.where(use_dof, dof_origin, origin)
        direction = jnp.where(use_dof, dof_direction, direction)

    return Rays.make(origin, direction), rng_state


class Trackball:
    """Mouse-orbit / pan / zoom / WASDQE camera controller.

    Host-side numpy port of the behavior of `SDK/sutil/Trackball.{h,cpp}`:
    spherical-coordinate orbit about the lookat point with gimbal-lock clamping,
    wheel zoom toward the lookat, and the WASDQE lateral moves
    (`Trackball.h:54-66`). Drives a `Camera` in place.
    """

    def __init__(self, camera: Camera, move_speed: float = 1.0):
        self.camera = camera
        self.move_speed = move_speed
        self._latitude = 0.0
        self._longitude = 0.0
        self.reinitialize_orientation()

    def reinitialize_orientation(self):
        eye = np.asarray(self.camera.eye, np.float64)
        lookat = np.asarray(self.camera.lookat, np.float64)
        d = eye - lookat
        r = np.linalg.norm(d)
        if r < 1e-12:
            self._latitude = self._longitude = 0.0
            return
        self._latitude = math.asin(np.clip(d[1] / r, -1.0, 1.0))
        self._longitude = math.atan2(d[0], d[2])

    def _apply(self):
        eye = np.asarray(self.camera.eye, np.float64)
        lookat = np.asarray(self.camera.lookat, np.float64)
        r = np.linalg.norm(eye - lookat)
        lat, lon = self._latitude, self._longitude
        d = np.array([math.cos(lat) * math.sin(lon),
                      math.sin(lat),
                      math.cos(lat) * math.cos(lon)])
        self.camera.eye = tuple(lookat + r * d)

    def orbit(self, dx_pixels: float, dy_pixels: float, per_pixel=0.005):
        """Rotate the eye about the lookat point (Trackball.cpp updateCamera)."""
        self._longitude = (self._longitude - dx_pixels * per_pixel) % (2 * math.pi)
        self._latitude = float(np.clip(self._latitude + dy_pixels * per_pixel,
                                       -0.5 * math.pi + 0.001, 0.5 * math.pi - 0.001))
        self._apply()

    def zoom(self, direction: int, factor: float = 0.9):
        """Wheel zoom: move the eye toward/away from the lookat."""
        eye = np.asarray(self.camera.eye, np.float64)
        lookat = np.asarray(self.camera.lookat, np.float64)
        scale = factor if direction > 0 else 1.0 / factor
        self.camera.eye = tuple(lookat + (eye - lookat) * scale)

    def pan(self, dx: float, dy: float):
        """Translate eye and lookat in the image plane."""
        u, v, _ = self.camera.uvw_frame()
        u = u / max(np.linalg.norm(u), 1e-20)
        v = v / max(np.linalg.norm(v), 1e-20)
        delta = (-dx * u + dy * v) * self.move_speed
        self.camera.eye = tuple(np.asarray(self.camera.eye) + delta)
        self.camera.lookat = tuple(np.asarray(self.camera.lookat) + delta)

    def move(self, key: str, dt: float = 0.1):
        """WASDQE flythrough moves (Trackball.h:54-66 keyEvent mapping)."""
        u, v, w = self.camera.uvw_frame()
        u = u / max(np.linalg.norm(u), 1e-20)
        v = v / max(np.linalg.norm(v), 1e-20)
        w = w / max(np.linalg.norm(w), 1e-20)
        step = {"w": w, "s": -w, "a": -u, "d": u, "q": -v, "e": v}.get(key.lower())
        if step is None:
            return
        delta = step * self.move_speed * dt
        self.camera.eye = tuple(np.asarray(self.camera.eye) + delta)
        self.camera.lookat = tuple(np.asarray(self.camera.lookat) + delta)
