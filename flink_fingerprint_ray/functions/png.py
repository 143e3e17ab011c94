"""Pure numpy + stdlib-zlib PNG codec (ISO/IEC 15948 / RFC 2083).

The compressed-image format real corpora ship alongside JPEG — implemented
from the public specification with NO external imaging libraries: DEFLATE
via the stdlib ``zlib`` module, scanline filters (None/Sub/Up/Average/
Paeth) in numpy.  Lossless, so roundtrips are byte-exact — which makes
this the strongest decode oracle in the media suite (JPEG can only be
checked against a loss budget).

Decoder coverage (the shapes that actually occur on the web):

- color types 0 (gray), 2 (RGB), 3 (palette + optional tRNS alpha),
  4 (gray+alpha), 6 (RGBA);
- bit depths 8 and 16 (16 → most-significant byte, the standard fast
  path) for types 0/2/4/6; depths 1/2/4/8 for palette indices;
- Adam7 interlace for every supported combination (each pass is an
  independently-filtered sub-image scattered back on the pass grid).

The encoder writes 8-bit gray/RGB/RGBA, cycles all five filter types
across rows, and can emit Adam7-interlaced output (``interlace=True``)
so roundtrip tests exercise the deinterlacer against ground truth.

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
# channels per pixel by PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# Adam7 pass grid: (x_start, y_start, x_step, y_step)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", crc32(typ + data) & 0xFFFFFFFF))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, elementwise (filter type 4)."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def _filter_rows(flat: np.ndarray, bpp: int) -> bytes:
    """Filter an (h, stride) byte matrix, cycling filter types 0..4 per
    row (all valid per spec, exercises every decode path)."""
    h, stride = flat.shape
    zero = np.zeros(stride, dtype=np.uint8)
    out = bytearray()
    for y in range(h):
        cur = flat[y]
        prev = flat[y - 1] if y else zero
        left = np.concatenate([np.zeros(bpp, np.uint8), cur[:-bpp]]) \
            if stride > bpp else np.zeros(stride, np.uint8)
        upleft = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]]) \
            if stride > bpp else np.zeros(stride, np.uint8)
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
    return bytes(out)


def _unfilter_rows(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Invert scanline filtering: (h, 1+stride) filter-byte-prefixed rows
    → (h, stride) reconstructed bytes.  PNG filters operate on BYTES with
    a ``bpp``-byte left offset (ceil(depth/8)·channels) regardless of the
    pixel layout."""
    filters = raw[:, 0]
    out = np.empty((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.uint8)
    npx = stride // bpp if bpp else 0
    for y in range(h):
        f = int(filters[y])
        cur = raw[y, 1:].copy()
        prev = out[y - 1] if y else zero
        if f == 0:
            out[y] = cur
        elif f == 1:    # Sub: per-byte-lane prefix sum mod 256
            v = cur[:npx * bpp].reshape(npx, bpp).astype(np.int32)
            rec = (np.add.accumulate(v, axis=0) % 256).astype(np.uint8)
            out[y, :npx * bpp] = rec.reshape(npx * bpp)
            out[y, npx * bpp:] = cur[npx * bpp:]
        elif f == 2:    # Up — fully vectorized
            out[y] = cur + prev
        elif f == 3:    # Average — sequential left dependency
            up = prev[:npx * bpp].reshape(npx, bpp).astype(np.uint16)
            c2 = cur[:npx * bpp].reshape(npx, bpp)
            r2 = out[y, :npx * bpp].reshape(npx, bpp)
            left = np.zeros(bpp, dtype=np.uint16)
            for x in range(npx):
                r2[x] = c2[x] + ((left + up[x]) // 2).astype(np.uint8)
                left = r2[x].astype(np.uint16)
        elif f == 4:    # Paeth — sequential left dependency
            up = prev[:npx * bpp].reshape(npx, bpp)
            upl = np.concatenate([np.zeros((1, bpp), np.uint8),
                                  up[:-1]])
            c2 = cur[:npx * bpp].reshape(npx, bpp)
            r2 = out[y, :npx * bpp].reshape(npx, bpp)
            left = np.zeros(bpp, dtype=np.uint8)
            for x in range(npx):
                r2[x] = c2[x] + _paeth(left, up[x], upl[x])
                left = r2[x]
        else:
            raise ValueError(f"PNG filter type {f}")
    return out


def encode_png(img: np.ndarray, level: int = 6, interlace: bool = False) -> bytes:
    """Encode HxW (gray), HxWx3 (RGB) or HxWx4 (RGBA) uint8 → PNG bytes.

    ``interlace=True`` emits Adam7 passes (each pass filtered
    independently, per spec) — used by tests to prove the deinterlacer."""
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
    if interlace:
        body = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = rows[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                body += _filter_rows(
                    sub.reshape(sub.shape[0], sub.shape[1] * ch), ch)
        payload = bytes(body)
    else:
        payload = _filter_rows(rows.reshape(h, w * ch), ch)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, int(interlace))
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(payload, level))
            + _chunk(b"IEND", b""))


def encode_png_palette(indices: np.ndarray, palette: np.ndarray,
                       trns: np.ndarray | None = None, level: int = 6) -> bytes:
    """Encode an HxW uint8 index image + (n, 3) palette (+ optional (n,)
    alpha) → a genuine color-type-3 PNG — the most common web PNG shape."""
    idx = np.ascontiguousarray(indices, dtype=np.uint8)
    pal = np.ascontiguousarray(palette, dtype=np.uint8)
    if idx.ndim != 2 or pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("indices must be HxW, palette (n, 3)")
    if idx.max(initial=0) >= len(pal):
        raise ValueError("index out of palette range")
    h, w = idx.shape
    payload = _filter_rows(idx.reshape(h, w), 1)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    out = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", pal.tobytes())
    if trns is not None:
        out += _chunk(b"tRNS", np.ascontiguousarray(trns, np.uint8).tobytes())
    return out + _chunk(b"IDAT", zlib.compress(payload, level)) + _chunk(b"IEND", b"")


def _unpack_indices(rec: np.ndarray, h: int, w: int, depth: int) -> np.ndarray:
    """(h, stride) packed index bytes → (h, w) uint8 indices for palette
    depths 1/2/4/8 (big-endian bit order per spec)."""
    if depth == 8:
        return rec[:, :w]
    per = 8 // depth
    shifts = np.arange(per - 1, -1, -1, dtype=np.uint8) * depth
    mask = (1 << depth) - 1
    expanded = (rec[:, :, None] >> shifts[None, None, :]) & mask
    return expanded.reshape(h, -1)[:, :w].astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes → uint8 array: HxW (gray), HxWx2 (gray+alpha),
    HxWx3 (RGB) or HxWx4 (RGBA).

    Supports color types 0/2/3/4/6, depths 8/16 (16 → MSB) and palette
    depths 1/2/4/8, Adam7 interlace; CRCs verified on critical chunks;
    ancillary chunks skipped; palette expands to RGB (RGBA with tRNS)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = None
    color_type = ch = depth = interlace = None
    plte: np.ndarray | None = None
    trns: np.ndarray | None = None
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
            if color_type not in _CHANNELS:
                raise NotImplementedError(f"PNG color type {color_type}")
            if color_type == 3:
                if depth not in (1, 2, 4, 8):
                    raise ValueError(f"palette PNG with depth {depth}")
            elif depth not in (8, 16):
                raise NotImplementedError(
                    f"PNG bit depth {depth} for color type {color_type}")
            if comp != 0 or filt != 0:
                raise ValueError("invalid PNG compression/filter method")
            ch = _CHANNELS[color_type]
        elif typ == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"tRNS" and color_type == 3:
            trns = np.frombuffer(body, dtype=np.uint8)
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if color_type == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)

    nbytes_px = (2 if depth == 16 else 1) * ch  # filter offset (bpp)

    def _stride(width: int) -> int:
        if color_type == 3:
            return (width * depth + 7) // 8
        return width * nbytes_px

    def _rows_to_pixels(rec: np.ndarray, height: int, width: int) -> np.ndarray:
        """(height, stride) reconstructed bytes → (height, width, ch)."""
        if color_type == 3:
            return _unpack_indices(rec, height, width, depth)[:, :, None]
        if depth == 16:
            return rec.reshape(height, width, ch, 2)[:, :, :, 0]  # MSB
        return rec.reshape(height, width, ch)

    if interlace == 0:
        stride = _stride(w)
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG scanline payload size mismatch")
        px = _rows_to_pixels(
            _unfilter_rows(raw.reshape(h, stride + 1), h, stride,
                           max(nbytes_px, 1) if color_type != 3 else 1),
            h, w)
    elif interlace == 1:
        px = np.zeros((h, w, 1 if color_type == 3 else ch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            ph = (h - y0 + dy - 1) // dy
            pw = (w - x0 + dx - 1) // dx
            if ph <= 0 or pw <= 0:
                continue
            stride = _stride(pw)
            need = ph * (stride + 1)
            if off + need > len(raw):
                raise ValueError("PNG interlaced payload truncated")
            rec = _unfilter_rows(raw[off:off + need].reshape(ph, stride + 1),
                                 ph, stride,
                                 max(nbytes_px, 1) if color_type != 3 else 1)
            off += need
            px[y0::dy, x0::dx] = _rows_to_pixels(rec, ph, pw)
        if off != len(raw):
            raise ValueError("PNG interlaced payload size mismatch")
    else:
        raise ValueError(f"PNG interlace method {interlace}")

    if color_type == 3:
        idx = px[:, :, 0]
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[:len(trns)] = trns
            return np.concatenate([rgb, alpha[idx][:, :, None]], axis=2)
        return rgb
    return px[:, :, 0] if ch == 1 else px
