"""Pure python/numpy GIF codec (GIF87a/GIF89a, CompuServe spec).

The third big web image format after JPEG/PNG — implemented from the
public specification with NO external imaging libraries: variable-width
LZW entropy coding (LSB-first bitstream, clear/EOI codes, 12-bit table
cap with deferred clear), global/local color tables, row interlacing,
and GIF89a extensions (graphic control → transparency + frame disposal,
NETSCAPE looping).  Like PNG it is lossless over palette content, so
roundtrips pin EXACT pixel equality.

Animated GIFs double as this repo's second video container (after
MJPEG-AVI): ``gif_n_frames`` indexes frames WITHOUT entropy-decoding
them (sub-block skip only), and ``decode_gif_frame`` composites frames
per the spec's disposal methods (1 keep / 2 restore-background /
3 restore-previous).

Reference-semantics citation: the reference repo has no media pipeline
at all (SURVEY.md §2.7 note) — multimodal columns are target-new per
the build brief; this codec exists so the media stages run on GENUINE
compressed bytes rather than stubs.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]
_MAX_CODE = 4096            # LZW table cap (12-bit codes)


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first, growing code width, clear/EOI)
# ---------------------------------------------------------------------------

def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-LZW encode a flat uint8 index array.  Emits a clear code
    whenever the table approaches the 12-bit cap (spec-legal at any
    point) so the decoder never depends on deferred-clear behavior."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    next_code = eoi + 1
    table: dict[tuple[int, int], int] = {}
    emit(clear, width)
    data = indices.tolist()
    if not data:
        emit(eoi, width)
    else:
        prefix = data[0]
        for k in data[1:]:
            key = (prefix, k)
            code = table.get(key)
            if code is not None:
                prefix = code
                continue
            emit(prefix, width)
            table[key] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
            if next_code >= _MAX_CODE - 2:   # pre-emptive clear, see above
                emit(clear, width)
                width = min_code_size + 1
                next_code = eoi + 1
                table.clear()
            prefix = k
        emit(prefix, width)
        emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, npix: int) -> np.ndarray:
    """GIF-LZW decode ``npix`` palette indices from a code stream
    (sub-blocks already joined).  Handles the full spec: growing code
    width, mid-stream clears, the c==next_code self-reference case, and
    the deferred-clear full-table state external encoders produce."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    n = len(data)
    while len(out) < npix:
        while nbits < width:
            if pos >= n:
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW code out of range")
        out += entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    if len(out) < npix:
        raise ValueError("GIF LZW stream ended early")
    return np.frombuffer(bytes(out[:npix]), dtype=np.uint8)


def _sub_blocks(payload: bytes) -> bytes:
    """Wrap a byte string into GIF ≤255-byte length-prefixed sub-blocks."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _skip_sub_blocks(data: bytes, pos: int) -> int:
    """Return the position just past a sub-block chain starting at pos."""
    while True:
        if pos >= len(data):
            raise ValueError("GIF sub-block chain truncated")
        ln = data[pos]
        pos += 1 + ln
        if ln == 0:
            return pos


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("GIF sub-block chain truncated")
        ln = data[pos]
        pos += 1
        if ln == 0:
            return bytes(out), pos
        out += data[pos:pos + ln]
        pos += ln


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """Undo GIF 4-pass row interlacing on an (h, w) index matrix."""
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        n = len(range(start, h, step))
        out[start::step] = rows[src:src + n]
        src += n
    return out


def _interlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    return np.concatenate([rows[start::step]
                           for start, step in _INTERLACE_PASSES])


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------

def _color_table(palette: np.ndarray) -> tuple[bytes, int]:
    """Pad an (n, 3) palette to a power-of-two size ≥2; return raw bytes
    and the size-field exponent-1 the descriptors store."""
    pal = np.ascontiguousarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= len(pal) <= 256:
        raise ValueError("palette must be (n, 3) uint8, 1 <= n <= 256")
    bits = max(1, int(len(pal) - 1).bit_length())
    padded = np.zeros((1 << bits, 3), np.uint8)
    padded[:len(pal)] = pal
    return padded.tobytes(), bits - 1


def encode_gif(indices: np.ndarray, palette: np.ndarray,
               transparent: int | None = None,
               interlace: bool = False) -> bytes:
    """Encode one HxW uint8 index frame + (n, 3) palette → GIF89a bytes."""
    return encode_gif_animation([np.asarray(indices)], palette,
                                transparent=transparent,
                                interlace=interlace)


def encode_gif_animation(frames: list[np.ndarray], palette: np.ndarray,
                         delays_cs: list[int] | None = None,
                         disposals: list[int] | None = None,
                         transparent: int | None = None,
                         interlace: bool = False,
                         local_palettes: list[np.ndarray | None] | None = None,
                         loop: int = 0) -> bytes:
    """Encode index frames (all full-canvas HxW) + a shared palette into
    an animated GIF89a.  ``delays_cs`` are per-frame delays in 1/100 s;
    ``disposals`` per-frame disposal methods (1 keep, 2 restore-bg,
    3 restore-previous); ``local_palettes`` optionally overrides the
    global table per frame (same index content, frame-local colors)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape
    gct, gct_bits = _color_table(palette)
    mcs = max(2, gct_bits + 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (gct_bits << 4) | gct_bits, 0, 0)
    out += gct
    if len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0" + bytes([3, 1]) \
            + struct.pack("<H", loop) + b"\x00"
    for i, frame in enumerate(frames):
        idx = np.ascontiguousarray(frame, dtype=np.uint8)
        if idx.shape != (h, w):
            raise ValueError("animation frames must share the canvas size")
        lct = local_palettes[i] if local_palettes else None
        n_colors = len(lct) if lct is not None else len(palette)
        if idx.max(initial=0) >= n_colors:
            raise ValueError("index out of palette range")
        delay = delays_cs[i] if delays_cs else 4
        disposal = disposals[i] if disposals else 1
        packed = (disposal & 7) << 2 | (0 if transparent is None else 1)
        out += b"\x21\xf9\x04" + bytes([packed]) + struct.pack("<H", delay) \
            + bytes([transparent or 0]) + b"\x00"
        desc_packed = 0x40 if interlace else 0
        lct_bytes = b""
        if lct is not None:
            lct_bytes, lct_bits = _color_table(lct)
            desc_packed |= 0x80 | lct_bits
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, desc_packed)
        out += lct_bytes
        rows = _interlace(idx) if interlace else idx
        out.append(mcs)
        out += _sub_blocks(_lzw_encode(rows.reshape(-1), mcs))
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

def _parse_header(data: bytes):
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    w, h, packed, bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    return w, h, bg, gct, pos


def _iter_images(data: bytes, decode_pixels: bool):
    """Yield per-frame dicts walking the block stream once.  With
    ``decode_pixels=False`` the LZW payload is skipped via sub-block
    lengths only — frame COUNTING never entropy-decodes."""
    w, h, bg, gct, pos = _parse_header(data)
    transparent = None
    disposal = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:                       # trailer
            return
        if block == 0x21:                       # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:                   # graphic control
                body, pos = _read_sub_blocks(data, pos)
                packed = body[0]
                disposal = (packed >> 2) & 7
                transparent = body[3] if packed & 1 else None
            else:                               # app/comment/plaintext
                pos = _skip_sub_blocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, fw, fh, packed = struct.unpack("<HHHHB", data[pos:pos + 9])
        pos += 9
        lct = None
        if packed & 0x80:
            n = 2 << (packed & 7)
            lct = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        mcs = data[pos]
        pos += 1
        if decode_pixels:
            stream, pos = _read_sub_blocks(data, pos)
            idx = _lzw_decode(stream, mcs, fw * fh).reshape(fh, fw)
            if packed & 0x40:
                idx = _deinterlace(idx)
        else:
            pos = _skip_sub_blocks(data, pos)
            idx = None
        yield {"canvas": (w, h, bg, gct), "rect": (left, top, fw, fh),
               "indices": idx, "palette": lct if lct is not None else gct,
               "transparent": transparent, "disposal": disposal}
        transparent = None
        disposal = 0


def gif_n_frames(data: bytes) -> int:
    """Count frames WITHOUT LZW decode (sub-block length skip only)."""
    return sum(1 for _ in _iter_images(data, decode_pixels=False))


def decode_gif_frames(data: bytes, upto: int | None = None) -> list[np.ndarray]:
    """Decode and composite frames 0..upto (all when None) per the spec's
    disposal methods.  Returns full-canvas RGB arrays — RGBA when any
    composited frame has unpainted/transparent pixels."""
    frames: list[np.ndarray] = []
    canvas_rgb = canvas_a = None
    for k, im in enumerate(_iter_images(data, decode_pixels=True)):
        w, h, bg, gct = im["canvas"]
        if canvas_rgb is None:
            canvas_rgb = np.zeros((h, w, 3), np.uint8)
            canvas_a = np.zeros((h, w), np.uint8)     # unpainted = clear
        left, top, fw, fh = im["rect"]
        pal = im["palette"]
        if pal is None:
            raise ValueError("GIF frame without any color table")
        disposal = im["disposal"]
        saved = (canvas_rgb.copy(), canvas_a.copy()) if disposal == 3 else None
        idx = im["indices"]
        rgb = pal[idx]
        region_rgb = canvas_rgb[top:top + fh, left:left + fw]
        region_a = canvas_a[top:top + fh, left:left + fw]
        if im["transparent"] is not None:
            opaque = idx != im["transparent"]
            region_rgb[opaque] = rgb[opaque]
            region_a[opaque] = 255
        else:
            region_rgb[:] = rgb
            region_a[:] = 255
        if canvas_a.all():
            frames.append(canvas_rgb.copy())
        else:
            frames.append(np.dstack([canvas_rgb, canvas_a]))
        if upto is not None and k >= upto:
            return frames
        if disposal == 2:      # restore region to "background" = clear
            canvas_rgb[top:top + fh, left:left + fw] = 0
            canvas_a[top:top + fh, left:left + fw] = 0
        elif disposal == 3 and saved is not None:
            canvas_rgb, canvas_a = saved
    if canvas_rgb is None:
        raise ValueError("GIF contains no image frames")
    return frames


def decode_gif(data: bytes) -> np.ndarray:
    """Decode the first frame → (h, w, 3) uint8, or (h, w, 4) when the
    frame leaves transparent/unpainted canvas pixels."""
    return decode_gif_frames(data, upto=0)[0]


def decode_gif_frame(data: bytes, frame_idx: int) -> np.ndarray:
    """Composite and return frame ``frame_idx``.  GIF frames depend on
    prior canvas state, so this decodes frames 0..idx sequentially —
    callers sampling many frames of one payload should use
    ``decode_gif_frames`` once instead."""
    frames = decode_gif_frames(data, upto=frame_idx)
    if frame_idx >= len(frames):
        raise IndexError(f"frame {frame_idx} of {len(frames)}")
    return frames[frame_idx]
