"""Baseline JPEG (ITU-T T.81) codec in pure numpy + stdlib.

Real DCT JPEG — not the quantized-PNG stand-in in :mod:`codec` — used for

* decoding real-world JFIF/JPEG byte columns (``codec.decode_image``
  sniffs the FFD8 magic and routes here), and
* JPEG-in-TIFF (Compression=7, the reference's GeoTools readers accept
  it via ImageIO; ``sources/geotiff.py`` feeds per-strip/tile abbreviated
  streams plus the shared JPEGTables (tag 347) blob to
  :func:`decode_jpeg`).

Scope (honest partial, like the other codecs):

* decode: baseline sequential DCT (SOF0/SOF1), 8-bit, 1 or 3 components,
  arbitrary h/v sampling factors in {1, 2, 4} (nearest-neighbor
  upsampling), restart intervals, abbreviated streams with externally
  supplied tables.  Progressive (SOF2) raises.
* encode: baseline, 4:4:4 (no subsampling — keeps the PSNR headroom for
  the ≥40 dB invariant), Annex K quantization tables scaled by the IJG
  quality formula, Annex K Huffman tables.

Everything heavy is vectorized: FDCT/IDCT are one einsum over all blocks
of a component, dequantization and zigzag are fancy-indexing; only the
entropy coder walks symbols in Python (table-driven via a 16-bit peek
LUT on decode).
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants (ITU-T T.81 Annex K) ---------------------------------------

_QL = np.array(  # K.1 luminance
    [16, 11, 10, 16, 24, 40, 51, 61,
     12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56,
     14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77,
     24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101,
     72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)

_QC = np.array(  # K.2 chrominance
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32).reshape(8, 8)

# K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# zigzag scan order: (row, col) per diagonal, alternating direction
_ZZ = []
for _s in range(15):
    _rng = range(max(0, _s - 7), min(_s, 7) + 1)
    for _i in (_rng if _s % 2 else reversed(_rng)):
        _ZZ.append((_i, _s - _i))
_ZZ_ROW = np.array([p[0] for p in _ZZ])
_ZZ_COL = np.array([p[1] for p in _ZZ])
# inverse: natural (row-major) position of each zigzag index
_ZZ_FLAT = _ZZ_ROW * 8 + _ZZ_COL

# orthonormal DCT-II matrix: F = C @ b @ C.T, b = C.T @ F @ C
_C = np.cos((2 * np.arange(8)[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16.0) * 0.5
_C[0] *= 1.0 / np.sqrt(2.0)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_QL, _QC):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


def _build_huffman(bits, vals):
    """Canonical code assignment → {symbol: (code, length)}."""
    code = 0
    out = {}
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_lut(bits, vals):
    """16-bit-peek LUT: lut_len[p]=code length (0 = invalid), lut_sym[p]."""
    lut_len = np.zeros(1 << 16, dtype=np.uint8)
    lut_sym = np.zeros(1 << 16, dtype=np.uint8)
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lo = code << (16 - ln)
            hi = (code + 1) << (16 - ln)
            lut_len[lo:hi] = ln
            lut_sym[lo:hi] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return lut_len, lut_sym


# --- color ----------------------------------------------------------------

def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


# --- encoder --------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad with 1s


def _mag_bits(v: int) -> tuple[int, int]:
    """(size, raw bits) for the T.81 magnitude-category encoding."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    return size, v if v > 0 else v + (1 << size) - 1


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _dht_payload(tc_th: int, bits, vals) -> bytes:
    return bytes([tc_th]) + bytes(bits) + bytes(vals)


def _encode_blocks(plane: np.ndarray, q: np.ndarray, mcux: int, mcuy: int, ch: int, cv: int):
    """MCU-aligned pad → FDCT → quantize → zigzag, block grid row-major
    over (mcuy*cv, mcux*ch)."""
    H, W = mcuy * cv * 8, mcux * ch * 8
    h, w = plane.shape
    pad = np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")
    blocks = pad.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    f = np.einsum("ux,nxy,vy->nuv", _C, blocks - 128.0, _C)
    zz = np.round(f / q).astype(np.int32)[:, _ZZ_ROW, _ZZ_COL]
    # baseline requires AC magnitude categories ≤ 10 (DC diff ≤ 11)
    zz[:, 1:] = np.clip(zz[:, 1:], -1023, 1023)
    return zz


def _put_block(bw: _BitWriter, zz: np.ndarray, pred: int, dc, ac) -> int:
    diff = int(zz[0]) - pred
    size, bits_v = _mag_bits(diff)
    code, ln = dc[size]
    bw.put(code, ln)
    if size:
        bw.put(bits_v, size)
    nz = np.nonzero(zz[1:])[0]
    prev = 0
    for k in nz:
        run = int(k) - prev
        prev = int(k) + 1
        while run > 15:
            code, ln = ac[0xF0]  # ZRL
            bw.put(code, ln)
            run -= 16
        size, bits_v = _mag_bits(int(zz[1 + k]))
        code, ln = ac[(run << 4) | size]
        bw.put(code, ln)
        bw.put(bits_v, size)
    if prev != 63:
        code, ln = ac[0x00]  # EOB
        bw.put(code, ln)
    return int(zz[0])


def encode_jpeg(
    px: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) RGB or (h, w)/(h, w, 1) grayscale uint8 → baseline JFIF.

    ``subsampling``: "444" (default, max fidelity) or "420" (2×2 chroma
    box-mean downsampling, the common camera default — mainly here so the
    decoder's subsampled path has a first-party producer).
    ``restart_interval``: emit DRI + RSTn every that-many MCUs (0 = off).
    """
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    gray = px.ndim == 2
    h, w = px.shape[:2]
    qy, qc = _quality_tables(quality)

    if gray:
        samp = [(1, 1)]
        planes = [px.astype(np.float64)]
    elif subsampling == "420":
        samp = [(2, 2), (1, 1), (1, 1)]
        ycc = _rgb_to_ycbcr(px)
        he, we = -(-h // 2) * 2, -(-w // 2) * 2
        full = np.pad(ycc, ((0, he - h), (0, we - w), (0, 0)), mode="edge")
        sub = full.reshape(he // 2, 2, we // 2, 2, 3).mean(axis=(1, 3))
        planes = [ycc[..., 0], sub[..., 1], sub[..., 2]]
    else:
        samp = [(1, 1)] * 3
        planes = [(p := _rgb_to_ycbcr(px))[..., 0], p[..., 1], p[..., 2]]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comp_zz = [
        _encode_blocks(planes[ci], qy if ci == 0 else qc, mcux, mcuy, *samp[ci])
        for ci in range(len(planes))
    ]

    huff_dc = [_build_huffman(*_DC_L), _build_huffman(*_DC_C)]
    huff_ac = [_build_huffman(*_AC_L), _build_huffman(*_AC_C)]

    bw = _BitWriter()
    pred = [0] * len(planes)
    chunks = []
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            chunks.append(bytes(bw.out))
            bw = _BitWriter()
            pred = [0] * len(planes)
        my, mx = divmod(m, mcux)
        for ci, (ch, cv) in enumerate(samp):
            ti = 0 if ci == 0 else 1
            bwidth = mcux * ch
            for by in range(cv):
                for bx in range(ch):
                    zz = comp_zz[ci][(my * cv + by) * bwidth + (mx * ch + bx)]
                    pred[ci] = _put_block(bw, zz, pred[ci], huff_dc[ti], huff_ac[ti])
    bw.flush()
    chunks.append(bytes(bw.out))
    entropy = b"".join(
        c + (b"" if i == len(chunks) - 1 else bytes([0xFF, 0xD0 + (i % 8)]))
        for i, c in enumerate(chunks)
    )

    out = [b"\xff\xd8"]  # SOI
    out.append(_seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    out.append(_seg(0xFFDB, b"\x00" + bytes(qy[_ZZ_ROW, _ZZ_COL].astype(np.uint8))))
    if not gray:
        out.append(_seg(0xFFDB, b"\x01" + bytes(qc[_ZZ_ROW, _ZZ_COL].astype(np.uint8))))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0 if ci == 0 else 1])
    out.append(_seg(0xFFC0, sof))
    out.append(_seg(0xFFC4, _dht_payload(0x00, *_DC_L)))
    out.append(_seg(0xFFC4, _dht_payload(0x10, *_AC_L)))
    if not gray:
        out.append(_seg(0xFFC4, _dht_payload(0x01, *_DC_C)))
        out.append(_seg(0xFFC4, _dht_payload(0x11, *_AC_C)))
    if restart_interval:
        out.append(_seg(0xFFDD, struct.pack(">H", restart_interval)))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out.append(_seg(0xFFDA, sos))
    out.append(entropy)
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)


def split_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Full interchange stream → (tables-only stream, abbreviated image
    stream) per T.81 abbreviated-format semantics; DQT/DHT/DRI segments
    move to the tables stream (the TIFF JPEGTables tag 347 layout)."""
    if stream[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    tables = [b"\xff\xd8"]
    image = [b"\xff\xd8"]
    while pos < len(stream) - 1:
        if stream[pos] != 0xFF:
            raise ValueError("malformed segment structure")
        marker = stream[pos + 1]
        if marker == 0xDA:  # SOS: rest is entropy data through EOI
            image.append(stream[pos:])
            break
        (ln,) = struct.unpack_from(">H", stream, pos + 2)
        seg = stream[pos : pos + 2 + ln]
        (tables if marker in (0xDB, 0xC4, 0xDD) else image).append(seg)
        pos += 2 + ln
    tables.append(b"\xff\xd9")
    return b"".join(tables), b"".join(image)


# --- decoder --------------------------------------------------------------

class _BitReader:
    __slots__ = ("buf", "pos", "acc", "n")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self, need: int):
        while self.n < need:
            b = self.buf[self.pos] if self.pos < len(self.buf) else 0
            self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFFFF
            self.n += 8

    def peek16(self) -> int:
        if self.n < 16:
            self._fill(16)
        return (self.acc >> (self.n - 16)) & 0xFFFF

    def skip(self, nbits: int):
        self.n -= nbits
        self.acc &= (1 << self.n) - 1

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        if self.n < nbits:
            self._fill(nbits)
        v = (self.acc >> (self.n - nbits)) & ((1 << nbits) - 1)
        self.n -= nbits
        self.acc &= (1 << self.n) - 1
        return v


def _upsample(p: np.ndarray, ratio: int, axis: int) -> np.ndarray:
    if ratio == 1:
        return p
    if ratio != 2:
        return np.repeat(p, ratio, axis=axis)
    p = np.moveaxis(p, axis, 0)
    prev = np.concatenate([p[:1], p[:-1]], axis=0)
    nxt = np.concatenate([p[1:], p[-1:]], axis=0)
    out = np.empty((p.shape[0] * 2,) + p.shape[1:], dtype=p.dtype)
    out[0::2] = (3.0 * p + prev) / 4.0
    out[1::2] = (3.0 * p + nxt) / 4.0
    return np.moveaxis(out, 0, axis)


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


class _Tables:
    def __init__(self):
        self.quant: dict[int, np.ndarray] = {}   # id → (8,8) int32 natural order
        self.huff: dict[tuple[int, int], tuple] = {}  # (class, id) → LUTs
        self.restart = 0


def _parse_segments(data: bytes, t: _Tables):
    """Walk marker segments, filling tables; return (sof, scan) when a
    frame+scan is found, else (None, None) for a tables-only stream."""
    pos = 0
    n = len(data)
    sof = None
    if data[:2] == b"\xff\xd8":
        pos = 2
    while pos < n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xFF:  # T.81 B.1.1.2: optional fill byte before a marker
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        payload = data[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                p += 1
                if pq:
                    vals = np.frombuffer(payload[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                else:
                    vals = np.frombuffer(payload[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                nat = np.zeros(64, dtype=np.int32)
                nat[_ZZ_FLAT] = vals
                t.quant[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nv])
                t.huff[(tc, th)] = _build_decode_lut(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            t.restart = struct.unpack_from(">H", payload, 0)[0]
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            prec, fh, fw, nc = struct.unpack_from(">BHHB", payload, 0)
            comps = []
            for ci in range(nc):
                cid, hv, tq = payload[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            sof = (fh, fw, comps)
        elif marker == 0xC2:
            raise ValueError("progressive JPEG (SOF2) not supported")
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            smap = {}
            for si in range(ns):
                cid, tt = payload[1 + 2 * si], payload[2 + 2 * si]
                smap[cid] = (tt >> 4, tt & 0xF)
            return sof, (smap, data[pos:])
    return sof, None


def _unstuff(scan: bytes) -> tuple[bytes, list[int]]:
    """Remove 0xFF00 stuffing, split at RSTn; returns joined entropy bytes
    and segment start offsets (DC prediction resets at each)."""
    arr = np.frombuffer(scan, dtype=np.uint8)
    ff = np.nonzero(arr == 0xFF)[0]
    segments = []
    starts = [0]
    out = bytearray()
    prev = 0
    for i in ff:
        if i + 1 >= len(arr):
            break
        nxt = arr[i + 1]
        if i < prev:
            continue  # already consumed (e.g. the FF of a dropped fill run)
        if nxt == 0x00:
            out += scan[prev : i + 1]  # keep FF, drop stuffed 00
            prev = i + 2
        elif nxt == 0xFF:
            # fill byte (T.81 B.1.1.2): entropy FF is always stuffed, so
            # FF FF can only be padding before a marker — drop the first
            # FF and let the next iteration classify what follows
            out += scan[prev:i]
            prev = i + 1
        elif 0xD0 <= nxt <= 0xD7:  # RSTn
            out += scan[prev:i]
            starts.append(len(out))
            prev = i + 2
        else:  # real marker (EOI, next segment) — entropy data ends
            out += scan[prev:i]
            prev = len(scan)
            break
    if prev < len(scan):
        out += scan[prev:]
    return bytes(out), starts


def decode_jpeg(data: bytes, tables: bytes | None = None) -> np.ndarray:
    """JFIF/abbreviated JPEG → (h, w, 3) RGB uint8 (gray replicated).

    ``tables``: optional tables-only stream (TIFF JPEGTables tag 347)
    parsed before the image stream, T.81 abbreviated-format semantics.
    """
    t = _Tables()
    if tables:
        _parse_segments(tables, t)
    sof, scan_info = _parse_segments(data, t)
    if sof is None or scan_info is None:
        raise ValueError("no baseline frame/scan found")
    fh, fw, comps = sof
    smap, scan = scan_info
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))

    entropy, seg_starts = _unstuff(scan)
    # per-component coefficient planes in block units
    planes = []
    for cid, ch, cv, tq in comps:
        bw_ = mcux * ch
        bh_ = mcuy * cv
        planes.append(np.zeros((bh_ * bw_, 8, 8), dtype=np.int32))

    luts = {}
    for cid, ch, cv, tq in comps:
        td, ta = smap[cid]
        if (0, td) not in t.huff or (1, ta) not in t.huff:
            raise ValueError("missing Huffman table")
        luts[cid] = (t.huff[(0, td)], t.huff[(1, ta)])

    br = _BitReader(entropy)
    pred = {c[0]: 0 for c in comps}
    nmcu = mcux * mcuy
    ri = t.restart
    seg_i = 0
    zz_flat = _ZZ_FLAT
    for m in range(nmcu):
        if ri and m and m % ri == 0:
            seg_i += 1
            if seg_i < len(seg_starts):
                br = _BitReader(entropy[seg_starts[seg_i] :])
            pred = {c[0]: 0 for c in comps}
        my, mx = divmod(m, mcux)
        for ci, (cid, ch, cv, tq) in enumerate(comps):
            (dc_len, dc_sym), (ac_len, ac_sym) = luts[cid]
            for by in range(cv):
                for bx in range(ch):
                    coef = np.zeros(64, dtype=np.int32)
                    p16 = br.peek16()
                    ln = int(dc_len[p16])
                    if ln == 0:
                        raise ValueError("bad Huffman code (DC)")
                    size = int(dc_sym[p16])
                    br.skip(ln)
                    diff = _extend(br.read(size), size)
                    pred[cid] += diff
                    coef[0] = pred[cid]
                    k = 1
                    while k < 64:
                        p16 = br.peek16()
                        ln = int(ac_len[p16])
                        if ln == 0:
                            raise ValueError("bad Huffman code (AC)")
                        rs = int(ac_sym[p16])
                        br.skip(ln)
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        k += rs >> 4
                        size = rs & 0xF
                        if k > 63:
                            break
                        coef[zz_flat[k]] = _extend(br.read(size), size)
                        k += 1
                    bwidth = mcux * ch
                    planes[ci][(my * cv + by) * bwidth + (mx * ch + bx)] = coef.reshape(8, 8)

    # vectorized dequantize + IDCT + assemble per component
    out_planes = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        if tq not in t.quant:
            raise ValueError("missing quantization table")
        deq = planes[ci] * t.quant[tq][None, :, :]
        pix = np.einsum("ux,nuv,vy->nxy", _C, deq.astype(np.float64), _C) + 128.0
        bw_ = mcux * ch
        bh_ = mcuy * cv
        plane = pix.reshape(bh_, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(bh_ * 8, bw_ * 8)
        # upsample to the full frame grid — triangular filter for the
        # ubiquitous 2× case (libjpeg "fancy upsampling": the subsampled
        # sample sits between its two output pixels, so nearest
        # replication shifts chroma half a pixel and halves gradient
        # fidelity), pixel replication for other ratios
        plane = _upsample(plane, hmax // ch, axis=1)
        plane = _upsample(plane, vmax // cv, axis=0)
        out_planes.append(plane[:fh, :fw])

    if len(out_planes) == 1:
        g = np.clip(out_planes[0].round(), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    return _ycbcr_to_rgb(*out_planes)
