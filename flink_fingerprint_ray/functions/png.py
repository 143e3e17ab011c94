"""Pure numpy + stdlib-zlib PNG codec (ISO/IEC 15948 / RFC 2083 baseline).

The compressed-image format real corpora ship alongside JPEG — implemented
from the public specification with NO external imaging libraries: DEFLATE
via the stdlib ``zlib`` module, scanline filters (None/Sub/Up/Average/
Paeth) in numpy.  Lossless, so roundtrips are byte-exact — which makes
this the strongest decode oracle in the media suite (JPEG can only be
checked against a loss budget).

Supported (the baseline subset): 8-bit depth, color types 0 (grayscale),
2 (RGB) and 6 (RGBA); no interlace (Adam7 rejected explicitly); ancillary
chunks skipped.  The encoder cycles all five filter types across rows so
a roundtrip exercises every decode path.

Reference-semantics citation: the reference repo has no media pipeline at
all (SURVEY.md §2.7 note) — multimodal columns are target-new per the
builder's brief; this codec fills the compressed-codec slot named in
VERDICT r3 ("real corpora are JPEG/PNG/MP3").
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# channels per pixel by PNG color type (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", crc32(typ + data) & 0xFFFFFFFF))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, elementwise over int16 inputs (filter type 4)."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """Encode HxW (gray), HxWx3 (RGB) or HxWx4 (RGBA) uint8 → PNG bytes.

    Rows cycle filter types 0..4 (all valid per spec), so decoding the
    output exercises every unfilter path."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, ch = 0, 1
        rows = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, ch = 2, 3
        rows = img
    elif img.ndim == 3 and img.shape[2] == 4:
        color_type, ch = 6, 4
        rows = img
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = rows.shape[:2]
    flat = rows.reshape(h, w * ch)
    zero = np.zeros(w * ch, dtype=np.uint8)
    out = bytearray()
    for y in range(h):
        cur = flat[y]
        prev = flat[y - 1] if y else zero
        left = np.concatenate([np.zeros(ch, np.uint8), cur[:-ch]])
        upleft = np.concatenate([np.zeros(ch, np.uint8), prev[:-ch]])
        f = y % 5
        if f == 0:
            enc = cur
        elif f == 1:    # Sub
            enc = cur - left
        elif f == 2:    # Up
            enc = cur - prev
        elif f == 3:    # Average
            enc = cur - ((left.astype(np.uint16) + prev.astype(np.uint16)) // 2).astype(np.uint8)
        else:           # Paeth
            enc = cur - _paeth(left, prev, upleft)
        out.append(f)
        out += enc.tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(out), level))
            + _chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes → uint8 array: HxW (gray), HxWx3 (RGB) or HxWx4.

    Baseline subset: 8-bit, color types 0/2/6, no interlace; CRCs
    verified on critical chunks; ancillary chunks skipped."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = None
    color_type = ch = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if typ in (b"IHDR", b"IDAT", b"PLTE"):
            (crc,) = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])
            if crc32(typ + body) & 0xFFFFFFFF != crc:
                raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} (baseline subset is 8)")
            if color_type not in _CHANNELS:
                raise NotImplementedError(f"PNG color type {color_type} (0/2/6 supported)")
            if comp != 0 or filt != 0:
                raise ValueError("invalid PNG compression/filter method")
            if interlace != 0:
                raise NotImplementedError("Adam7 interlace not supported")
            ch = _CHANNELS[color_type]
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    raw = raw.reshape(h, stride + 1)
    filters = raw[:, 0]
    out = np.empty((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        cur = raw[y, 1:].copy()
        prev = out[y - 1] if y else zero
        if f == 0:
            out[y] = cur
        elif f == 1:    # Sub: recon[i] = x[i] + recon[i-ch] — per-channel
            # prefix sum mod 256 (int32 accumulate, tiny rows)
            v = cur.reshape(w, ch).astype(np.int32)
            out[y] = (np.add.accumulate(v, axis=0) % 256).astype(np.uint8).reshape(stride)
        elif f == 2:    # Up — fully vectorized
            out[y] = cur + prev
        elif f == 3:    # Average — sequential left dependency, loop pixels
            row = out[y]
            up = prev.reshape(w, ch).astype(np.uint16)
            c2 = cur.reshape(w, ch)
            left = np.zeros(ch, dtype=np.uint16)
            r2 = row.reshape(w, ch)
            for x in range(w):
                r2[x] = c2[x] + ((left + up[x]) // 2).astype(np.uint8)
                left = r2[x].astype(np.uint16)
        elif f == 4:    # Paeth — sequential left dependency, loop pixels
            row = out[y]
            up = prev.reshape(w, ch)
            upl = np.concatenate([np.zeros((1, ch), np.uint8),
                                  prev.reshape(w, ch)[:-1]])
            c2 = cur.reshape(w, ch)
            left = np.zeros(ch, dtype=np.uint8)
            r2 = row.reshape(w, ch)
            for x in range(w):
                r2[x] = c2[x] + _paeth(left, up[x], upl[x])
                left = r2[x]
        else:
            raise ValueError(f"PNG filter type {f}")
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img
