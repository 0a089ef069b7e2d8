"""Image read/write: PNG / PPM / EXR / NPZ-float + ASCII preview.

Replaces the reference's image paths: `sutil::saveImage`/`loadImage` (PPM/PNG/EXR
via stb + tinyexr, `SDK/sutil/sutil.h:99-100`, `sutil.cpp`), `PPMLoader`
(`sutil/PPMLoader.{h,cpp}`), and the `optixConsole` luminance-mapped ASCII dump
(`SDK/optixConsole/optixConsole.cpp:697-760`). PNG goes through PIL; HDR
float layers (denoiser AOVs, beauty) use the from-scratch EXR codec in
io/exr.py (the tinyexr role) — .npz remains as a fallback container.
"""
from __future__ import annotations

import os

import numpy as np


def save_image(path: str, pixels: np.ndarray) -> None:
    """Save uint8 RGB(A) [H, W, C] or float [H, W, 3] (auto-encoded) images.

    Dispatch by extension like `sutil::saveImage`: .png/.ppm for display
    images, .npz for float/HDR layers.
    """
    pixels = np.asarray(pixels)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".npz":
        np.savez_compressed(path, image=pixels.astype(np.float32))
        return
    if ext == ".exr":
        from .exr import write_exr
        write_exr(path, pixels.astype(np.float32))
        return
    if pixels.dtype != np.uint8:
        # Linear float → sRGB uint8 (what saveImage does for float buffers).
        from ..core.film import linear_to_srgb
        import jax.numpy as jnp
        pixels = np.asarray(
            (np.clip(np.asarray(linear_to_srgb(jnp.asarray(pixels))), 0, 1) * 255.99999)
        ).astype(np.uint8)
    if ext == ".ppm":
        _save_ppm(path, pixels[..., :3])
        return
    from PIL import Image
    Image.fromarray(pixels).save(path)


def load_image(path: str) -> np.ndarray:
    """Load an image; uint8 for PNG/PPM, float32 [H, W, ...] for .npz."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".npz":
        with np.load(path) as z:
            return z["image"]
    if ext == ".exr":
        from .exr import read_exr
        return read_exr(path)
    if ext == ".ppm":
        return _load_ppm(path)
    from PIL import Image
    return np.asarray(Image.open(path))


def _save_ppm(path: str, rgb: np.ndarray) -> None:
    h, w = rgb.shape[:2]
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(np.ascontiguousarray(rgb, dtype=np.uint8).tobytes())


def _load_ppm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        data = f.read()
    # Minimal P6 parser (binary PPM) with comment skipping.
    tokens, i = [], 0
    while len(tokens) < 4:
        while i < len(data) and data[i:i + 1].isspace():
            i += 1
        if data[i:i + 1] == b"#":
            while i < len(data) and data[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j:j + 1].isspace():
            j += 1
        tokens.append(data[i:j])
        i = j
    assert tokens[0] == b"P6", "only binary PPM (P6) supported"
    w, h = int(tokens[1]), int(tokens[2])
    i += 1  # single whitespace after maxval
    return np.frombuffer(data, np.uint8, count=w * h * 3, offset=i).reshape(h, w, 3)


ASCII_RAMP = " .:-=+*#%@"


def to_ascii(rgb: np.ndarray, width: int = 96) -> str:
    """Luminance-mapped ASCII art of an image — the `optixConsole` output mode
    (`optixConsole.cpp:697-760`), used for headless smoke tests."""
    img = np.asarray(rgb, np.float32)
    if img.dtype == np.uint8 or img.max() > 1.5:
        img = img / 255.0
    h, w = img.shape[:2]
    ch = max(1, int(round(width * h / w * 0.5)))
    ys = np.linspace(0, h - 1, ch).astype(int)
    xs = np.linspace(0, w - 1, width).astype(int)
    lum = img[..., :3] @ np.array([0.2126, 0.7152, 0.0722], np.float32)
    sub = lum[np.ix_(ys, xs)]
    idx = np.clip((sub * (len(ASCII_RAMP) - 1)).round().astype(int), 0, len(ASCII_RAMP) - 1)
    return "\n".join("".join(ASCII_RAMP[v] for v in row) for row in idx)
