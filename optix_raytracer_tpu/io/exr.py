"""Minimal OpenEXR 2.0 codec: scanline images, HALF/FLOAT, NONE/ZIP/ZIPS.

No EXR library ships in this environment, so this implements the subset of
the format the reference's denoiser sample actually exchanges
(`SDK/optixDenoiser/optixDenoiser.cpp:51-104` loads beauty/albedo/normal/
flow EXRs and writes the denoised EXR): single-part scanline files,
compression NONE, ZIPS (zlib, 1 scanline/chunk) or ZIP (zlib, 16
scanlines/chunk), HALF or FLOAT channels, written from numpy.

Format notes (from the published OpenEXR file layout):
- magic 0x76 0x2f 0x31 0x01, version int32 = 2 (no tiles, no multipart)
- header = attribute list (name\\0 type\\0 size data), empty name ends it
- required attributes: channels, compression, dataWindow, displayWindow,
  lineOrder, pixelAspectRatio, screenWindowCenter, screenWindowWidth
- channel list entries are sorted alphabetically and the pixel data of each
  scanline chunk stores channels in that order
- scanline chunk: int32 y, int32 byte-size, then per-channel rows
- an offset table (int64 per chunk) precedes the chunks
- zip chunks pre-process bytes with an even/odd split then a byte-delta
  predictor before deflate; a chunk whose deflate output would not shrink
  is stored raw (readers detect this by the stored size)
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x76\x2f\x31\x01"
_PT_UINT, _PT_HALF, _PT_FLOAT = 0, 1, 2
_DTYPES = {_PT_UINT: np.uint32, _PT_HALF: np.float16, _PT_FLOAT: np.float32}
_COMP_NONE, _COMP_ZIPS, _COMP_ZIP = 0, 2, 3
_COMP_IDS = {"NONE": _COMP_NONE, "ZIPS": _COMP_ZIPS, "ZIP": _COMP_ZIP}
_LINES_PER_CHUNK = {_COMP_NONE: 1, _COMP_ZIPS: 1, _COMP_ZIP: 16}


def _zip_compress(raw: bytes) -> bytes:
    """OpenEXR zip pre-filter + deflate (ImfZip behavior)."""
    b = np.frombuffer(raw, np.uint8)
    half = (b.size + 1) // 2
    t = np.empty_like(b)
    t[:half] = b[0::2]
    t[half:] = b[1::2]
    d = t.astype(np.int16)
    d[1:] = (d[1:] - d[:-1] + (128 + 256)) & 0xFF
    packed = zlib.compress(d.astype(np.uint8).tobytes())
    return packed if len(packed) < len(raw) else raw


def _zip_decompress(data: bytes, raw_size: int) -> bytes:
    if len(data) == raw_size:        # stored raw (incompressible chunk)
        return data
    t = np.frombuffer(zlib.decompress(data), np.uint8).astype(np.int32)
    t[1:] -= 128 + 256
    t = (np.cumsum(t) & 0xFF).astype(np.uint8)
    half = (t.size + 1) // 2
    out = np.empty_like(t)
    out[0::2] = t[:half]
    out[1::2] = t[half:]
    return out.tobytes()


def _attr(name: str, typ: str, data: bytes) -> bytes:
    return (name.encode() + b"\0" + typ.encode() + b"\0"
            + struct.pack("<i", len(data)) + data)


def write_exr(path: str, image: np.ndarray, channels=None,
              pixel_type: str = "HALF", compression: str = "ZIP") -> None:
    """Write [H, W] / [H, W, C] float data as a scanline EXR.

    channels: names for the last axis; defaults to ("Y",), ("R","G","B") or
    ("R","G","B","A") by arity. pixel_type: "HALF" or "FLOAT".
    compression: "ZIP" (default; zlib, 16 scanlines per chunk), "ZIPS"
    (zlib, 1 scanline) or "NONE".
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

    comp_id = _COMP_IDS[compression.upper()]
    box = struct.pack("<iiii", 0, 0, w - 1, h - 1)
    header = (_attr("channels", "chlist", chlist)
              + _attr("compression", "compression", bytes([comp_id]))
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
    lines = _LINES_PER_CHUNK[comp_id]
    n_chunks = -(-h // lines)

    rows = image[:, :, order].transpose(0, 2, 1).astype(dtype)  # [H, C, W]
    chunks = []
    for y in range(0, h, lines):
        raw = np.ascontiguousarray(rows[y:y + lines]).tobytes()
        if comp_id != _COMP_NONE:
            raw = _zip_compress(raw)
        chunks.append((y, raw))

    first = len(head) + 8 * n_chunks
    offsets, pos = [], first
    for _, payload in chunks:
        offsets.append(pos)
        pos += 8 + len(payload)
    with open(path, "wb") as f:
        f.write(head)
        f.write(struct.pack("<%dq" % n_chunks, *offsets))
        for y, payload in chunks:
            f.write(struct.pack("<ii", y, len(payload)))
            f.write(payload)


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

    comp_id = attrs["compression"][0]
    if comp_id not in _LINES_PER_CHUNK:
        raise NotImplementedError(
            "only compression NONE/ZIPS/ZIP supported (got type "
            f"{comp_id})")
    lines = _LINES_PER_CHUNK[comp_id]
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
    n_chunks = -(-h // lines)
    offsets = struct.unpack_from("<%dq" % n_chunks, data, pos)
    scan_bytes = sum(row_bytes.values())
    for off in offsets:
        y, size = struct.unpack_from("<ii", data, off)
        y -= y0
        n_lines = min(lines, h - y)
        payload = data[off + 8:off + 8 + size]
        if comp_id != _COMP_NONE:
            payload = _zip_decompress(payload, n_lines * scan_bytes)
        p = 0
        for line in range(n_lines):
            for name, pt in chans:
                dt = _DTYPES[pt]
                row = np.frombuffer(payload, dt, count=w, offset=p)
                out[name][y + line] = row.astype(np.float32)
                p += row_bytes[name]

    if layers:
        return out
    names = [n for n, _ in chans]
    front = [c for c in ("R", "G", "B", "A") if c in names]
    rest = sorted(n for n in names if n not in front)
    stacked = np.stack([out[n] for n in front + rest], axis=-1)
    return stacked
