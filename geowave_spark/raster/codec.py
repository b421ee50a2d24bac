"""Image codecs in pure numpy + stdlib zlib (no PIL in this environment).

The engine treats images as opaque ``binary`` columns with typed metadata
(w, h, fmt) and decodes inside Arrow-batched UDFs.  Formats:

- ``bmp``: standard uncompressed 24-bit BMP (lossless).
- ``png``: real PNG — encode uses filter 0 + zlib; decode implements all
  five scanline filters (8-bit RGB only).  Lossless.
- ``jpeg``: the FIXTURE format — a **deterministic lossy stand-in**
  (pixels quantized to 6 bits/channel → PSNR ≈ 46 dB, stored in a PNG
  container with a ``jQNT`` chunk) so fixture bytes stay bit-stable
  across rounds.  ``decode_image`` sniffs the FFD8 magic, so REAL
  JPEG/JFIF bytes in a ``jpeg`` column decode through the baseline DCT
  codec in :mod:`geowave_spark.raster.jpeg` (also exposed as the
  ``jfif`` codec name).

All functions operate on (h, w, 3) uint8 arrays.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


# --- BMP ------------------------------------------------------------------

def encode_bmp(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM",
        14 + 40 + img_size,
        0,
        0,
        14 + 40,
        40,
        w,
        h,
        1,
        24,
        0,
        img_size,
        2835,
        2835,
        0,
        0,
    )
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    return header + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", data, 10)[0]
    w = struct.unpack_from("<i", data, 18)[0]
    h = struct.unpack_from("<i", data, 22)[0]
    bpp = struct.unpack_from("<H", data, 28)[0]
    if bpp != 24:
        raise ValueError("only 24-bit BMP supported")
    row_size = (w * 3 + 3) & ~3
    arr = np.frombuffer(data, dtype=np.uint8, count=row_size * abs(h), offset=off)
    rows = arr.reshape(abs(h), row_size)[:, : w * 3].reshape(abs(h), w, 3)
    if h > 0:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR→RGB


# --- PNG ------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(px: np.ndarray, extra_chunks: list[tuple[bytes, bytes]] | None = None) -> bytes:
    h, w, _ = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 1:] = px.reshape(h, w * 3)  # filter type 0 per scanline
    idat = zlib.compress(raw.tobytes(), 6)
    out = [_PNG_SIG, _chunk(b"IHDR", ihdr)]
    for tag, payload in extra_chunks or []:
        out.append(_chunk(tag, payload))
    out.append(_chunk(b"IDAT", idat))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = []
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack_from(">IIBB", payload)[:4]
            if depth != 8 or ctype != 2:
                raise ValueError("only 8-bit RGB PNG supported")
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = 1 + w * 3
    rows = raw.reshape(h, stride)
    filters = rows[:, 0]
    out = np.zeros((h, w * 3), dtype=np.uint8)
    bpp = 3
    for y in range(h):
        line = rows[y, 1:].astype(np.int32)
        f = filters[y]
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(w * 3, dtype=np.int32)
        if f == 0:
            rec = line
        elif f == 2:  # Up
            rec = (line + prev) & 0xFF
        else:  # Sub(1) / Average(3) / Paeth(4) need left-to-right scan
            rec = np.empty(w * 3, dtype=np.int32)
            for i in range(w * 3):
                a = rec[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if f == 1:
                    rec[i] = (line[i] + a) & 0xFF
                elif f == 3:
                    rec[i] = (line[i] + ((a + b) >> 1)) & 0xFF
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[i] = (line[i] + pred) & 0xFF
        out[y] = rec.astype(np.uint8)
    return out.reshape(h, w, 3)


# --- lossy stand-in -------------------------------------------------------

_Q_SHIFT = 2  # 6 bits/channel kept; max error ±2 → PSNR ≈ 46 dB


def encode_jpeg_stub(px: np.ndarray) -> bytes:
    """Deterministic lossy encode (see module docstring — NOT real JPEG)."""
    q = ((px >> _Q_SHIFT) << _Q_SHIFT) + (1 << (_Q_SHIFT - 1))
    return encode_png(q.astype(np.uint8), extra_chunks=[(b"jQNT", bytes([_Q_SHIFT]))])


def decode_jpeg_stub(data: bytes) -> np.ndarray:
    return decode_png(data)


def _encode_jfif(px: np.ndarray) -> bytes:
    from .jpeg import encode_jpeg

    return encode_jpeg(px, quality=90)


def _decode_jfif(data: bytes) -> np.ndarray:
    from .jpeg import decode_jpeg

    return decode_jpeg(data)


CODECS = {
    "bmp": (encode_bmp, decode_bmp),
    "png": (encode_png, decode_png),
    "jpeg": (encode_jpeg_stub, decode_jpeg_stub),
    # real baseline DCT JPEG (ITU-T T.81) — see raster/jpeg.py
    "jfif": (_encode_jfif, _decode_jfif),
}


def encode_image(px: np.ndarray, fmt: str) -> bytes:
    return CODECS[fmt][0](px)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    # fixture "jpeg" columns hold the deterministic PNG-container
    # stand-in, but real-world jpeg bytes start with the FFD8 marker —
    # sniff so externally produced rows decode through the real codec
    if fmt == "jpeg" and data[:2] == b"\xff\xd8":
        return _decode_jfif(data)
    return CODECS[fmt][1](data)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
