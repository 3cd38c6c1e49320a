"""Pure-Python PNG codec (stdlib zlib + numpy): the real image path for
the multimodal operators, dependency-free.

Implements the public PNG specification (RFC 2083 / W3C PNG):
8-bit-depth, non-interlaced greyscale / RGB / greyscale+alpha / RGBA.
Decode handles all five scanline filter types (None/Sub/Up/Average/
Paeth); encode emits filter 0 scanlines (always-valid PNG). That covers
everything a training-data pipeline writes itself and most of what it
reads; exotic PNGs (16-bit, palette, interlaced) raise cleanly so the
PIL-gated seam can take over where the library exists.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # colortype → samples/pixel


def _chunks(data: bytes):
    pos = 8
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        yield ctype, body
        pos += 12 + length  # length + type + data + crc


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


# Decode-side safety cap on height*stride: corrupted IHDR dims paired
# with a zlib bomb must fail cleanly, not OOM an executor. 256 MB of
# raw scanlines ≈ a 8k×8k RGBA image — far above any thumbnail-scale
# training payload; raise it if a pipeline genuinely ships larger.
_MAX_RAW_BYTES = 1 << 28


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array of shape (height, width, channels).

    Corruption contract (fuzz-tested, tests/test_serde_fuzz.py): any
    malformed input raises ValueError — truncated chunks, bad zlib
    streams, dimension/scanline mismatches, bomb-sized IHDR dims —
    never struct.error/zlib.error, never unbounded decompression.
    """
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    width = height = None
    colortype = None
    idat = bytearray()
    try:
        for ctype, body in _chunks(data):
            if ctype == b"IHDR":
                width, height, bitdepth, colortype, comp, filt, interlace = struct.unpack(
                    ">IIBBBBB", body
                )
                if bitdepth != 8:
                    raise ValueError(f"unsupported PNG bit depth {bitdepth} (8 only)")
                if colortype not in _CHANNELS:
                    raise ValueError(f"unsupported PNG color type {colortype}")
                if interlace != 0:
                    raise ValueError("interlaced PNG not supported")
            elif ctype == b"IDAT":
                idat.extend(body)
            elif ctype == b"IEND":
                break
    except struct.error as exc:  # truncated chunk header / IHDR body
        raise ValueError(f"malformed PNG chunk: {exc}") from exc
    if width is None:
        raise ValueError("PNG missing IHDR")
    ch = _CHANNELS[colortype]
    stride = width * ch
    expected = height * (stride + 1)
    if expected > _MAX_RAW_BYTES:
        raise ValueError(f"PNG dimensions too large ({width}x{height}x{ch})")
    try:
        # bounded inflate: never produce more than expected+1 bytes no
        # matter what the (possibly corrupted) stream claims
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), expected + 1)
    except zlib.error as exc:
        raise ValueError(f"malformed PNG IDAT stream: {exc}") from exc
    if len(raw) != expected or not (d.eof and d.unconsumed_tail == b""):
        raise ValueError("PNG scanline data size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint16)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).astype(np.uint16)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up — fully vectorized
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub/Average/Paeth need left-to-right
            cur = np.zeros(stride, dtype=np.uint16)
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                b = int(prev[i])
                if ftype == 1:
                    cur[i] = (line[i] + a) & 0xFF
                elif ftype == 3:
                    cur[i] = (line[i] + ((a + b) >> 1)) & 0xFF
                else:
                    c = int(prev[i - ch]) if i >= ch else 0
                    cur[i] = (line[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(height, width, ch)


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) or (h, w, ch∈{1,2,3,4}) → PNG bytes
    (filter-0 scanlines, single zlib-compressed IDAT)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.dtype != np.uint8:
        raise ValueError("encode_png expects uint8")
    h, w, ch = arr.shape
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if colortype is None:
        raise ValueError(f"unsupported channel count {ch}")
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter type None
        raw.extend(arr[y].tobytes())

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width) — deterministic,
    pure indexing (the sampling grid is the pixel-center convention)."""
    h, w = arr.shape[:2]
    rows = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    return arr[rows][:, cols]
