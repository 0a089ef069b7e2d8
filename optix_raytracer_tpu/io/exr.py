"""Minimal OpenEXR 2.0 codec: uncompressed scanline images, HALF/FLOAT.

No EXR library ships in this environment, so this implements the subset of
the format the reference's denoiser sample actually exchanges
(`SDK/optixDenoiser/optixDenoiser.cpp:51-104` loads beauty/albedo/normal/
flow EXRs and writes the denoised EXR): single-part scanline files,
compression NONE, HALF or FLOAT channels, written from numpy. Readers like
OpenEXR/tev/Nuke accept NONE-compressed files; our reader accepts any
NONE-compressed single-part scanline file with HALF/FLOAT/UINT channels.

Format notes (from the published OpenEXR file layout):
- magic 0x76 0x2f 0x31 0x01, version int32 = 2 (no tiles, no multipart)
- header = attribute list (name\\0 type\\0 size data), empty name ends it
- required attributes: channels, compression, dataWindow, displayWindow,
  lineOrder, pixelAspectRatio, screenWindowCenter, screenWindowWidth
- channel list entries are sorted alphabetically and the pixel data of each
  scanline chunk stores channels in that order
- scanline chunk: int32 y, int32 byte-size, then per-channel rows
- an offset table (int64 per chunk) precedes the chunks
"""
from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"\x76\x2f\x31\x01"
_PT_UINT, _PT_HALF, _PT_FLOAT = 0, 1, 2
_DTYPES = {_PT_UINT: np.uint32, _PT_HALF: np.float16, _PT_FLOAT: np.float32}


def _attr(name: str, typ: str, data: bytes) -> bytes:
    return (name.encode() + b"\0" + typ.encode() + b"\0"
            + struct.pack("<i", len(data)) + data)


def write_exr(path: str, image: np.ndarray, channels=None,
              pixel_type: str = "HALF") -> None:
    """Write [H, W] / [H, W, C] float data as an uncompressed scanline EXR.

    channels: names for the last axis; defaults to ("Y",), ("R","G","B") or
    ("R","G","B","A") by arity. pixel_type: "HALF" or "FLOAT".
    """
    image = np.asarray(image, np.float32)
    if image.ndim == 2:
        image = image[..., None]
    h, w, nc = image.shape
    if channels is None:
        channels = {1: ("Y",), 2: ("R", "G"), 3: ("R", "G", "B"),
                    4: ("R", "G", "B", "A")}[nc]
    assert len(channels) == nc
    pt = {"HALF": _PT_HALF, "FLOAT": _PT_FLOAT}[pixel_type.upper()]
    dtype = _DTYPES[pt]
    bpp = np.dtype(dtype).itemsize

    # Channel list is stored (and pixel data laid out) alphabetically.
    order = sorted(range(nc), key=lambda i: channels[i])
    chlist = b""
    for i in order:
        chlist += (channels[i].encode() + b"\0"
                   + struct.pack("<i", pt) + struct.pack("<i", 0)
                   + struct.pack("<ii", 1, 1))
    chlist += b"\0"

    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header = (_attr("channels", "chlist", chlist)
              + _attr("compression", "compression", b"\0")      # NONE
              + _attr("dataWindow", "box2i", box)
              + _attr("displayWindow", "box2i", box)
              + _attr("lineOrder", "lineOrder", b"\0")          # increasing y
              + _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
              + _attr("screenWindowCenter", "v2f",
                      struct.pack("<ff", 0.0, 0.0))
              + _attr("screenWindowWidth", "float",
                      struct.pack("<f", 1.0))
              + b"\0")

    head = _MAGIC + struct.pack("<i", 2) + header
    chunk_size = nc * w * bpp
    first = len(head) + 8 * h
    offsets = struct.pack("<%dq" % h,
                          *[first + y * (8 + chunk_size) for y in range(h)])

    rows = image[:, :, order].transpose(0, 2, 1).astype(dtype)  # [H, C, W]
    with open(path, "wb") as f:
        f.write(head)
        f.write(offsets)
        for y in range(h):
            f.write(struct.pack("<ii", y, chunk_size))
            f.write(np.ascontiguousarray(rows[y]).tobytes())


def read_exr(path: str, layers: bool = False):
    """Read an uncompressed single-part scanline EXR.

    Returns float32 [H, W, C] with channels ordered R,G,B,A,(rest alpha-
    betical) — or, with layers=True, a dict {channel_name: [H, W] f32}.
    """
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != _MAGIC:
        raise ValueError(f"{path}: not an EXR file")
    version = struct.unpack_from("<i", data, 4)[0]
    if version & 0x200 or version & 0x1000:
        raise NotImplementedError("tiled/multipart EXR not supported")

    pos = 8
    attrs = {}
    while True:
        end = data.index(b"\0", pos)
        name = data[pos:end].decode()
        pos = end + 1
        if not name:
            break
        end = data.index(b"\0", pos)
        pos = end + 1
        size = struct.unpack_from("<i", data, pos)[0]
        pos += 4
        attrs[name] = data[pos:pos + size]
        pos += size

    if attrs["compression"][0] != 0:
        raise NotImplementedError(
            "only compression NONE supported (got type "
            f"{attrs['compression'][0]})")
    x0, y0, x1, y1 = struct.unpack("<iiii", attrs["dataWindow"])
    w, h = x1 - x0 + 1, y1 - y0 + 1

    chans = []          # (name, pixel_type) in file (alphabetical) order
    cpos = 0
    cl = attrs["channels"]
    while cl[cpos] != 0:
        end = cl.index(b"\0", cpos)
        cname = cl[cpos:end].decode()
        pt = struct.unpack_from("<i", cl, end + 1)[0]
        chans.append((cname, pt))
        cpos = end + 1 + 16
    row_bytes = {name: w * np.dtype(_DTYPES[pt]).itemsize
                 for name, pt in chans}

    out = {name: np.empty((h, w), np.float32) for name, _ in chans}
    offsets = struct.unpack_from("<%dq" % h, data, pos)
    for off in offsets:
        y = struct.unpack_from("<i", data, off)[0] - y0
        p = off + 8
        for name, pt in chans:
            dt = _DTYPES[pt]
            row = np.frombuffer(data, dt, count=w, offset=p)
            out[name][y] = row.astype(np.float32)
            p += row_bytes[name]

    if layers:
        return out
    names = [n for n, _ in chans]
    front = [c for c in ("R", "G", "B", "A") if c in names]
    rest = sorted(n for n in names if n not in front)
    stacked = np.stack([out[n] for n in front + rest], axis=-1)
    return stacked
