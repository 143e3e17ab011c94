"""Pure-numpy MPEG-1 Video (ISO/IEC 11172-2) subset codec: I + P
pictures with full-pel motion compensation, skipped macroblocks and
GOP-structured random access.

Everything is implemented from the public spec structure:

- sequence / GOP / picture / slice / macroblock / block syntax with
  byte-aligned start codes;
- the spec's VLC tables — B.1 macroblock_address_increment (motion
  codes reuse the same codes via the spec's signed mapping), B.2
  macroblock_type (I and P), B.3 coded_block_pattern, B.5a/b intra-DC
  size, B.5c dct run/level with the 6-bit ESCAPE (each table is
  asserted prefix-free at import);
- 8x8 DCT (the orthonormal matrix shared with the JPEG codec — it IS
  the spec's DCT), default intra quantizer matrix, zigzag scan,
  intra-DC prediction, and the normative reconstruction arithmetic
  including MPEG-1's oddification mismatch control and the
  [-2048, 2047] clamp;
- P-picture prediction: full-pel forward vectors (the header's
  ``full_pel_forward_vector=1`` / ``forward_f_code=1`` operating
  point), differential MV coding with predictor resets, macroblock
  type decisions (intra / MC-coded / MC-not-coded / no-MC-coded /
  skipped), chroma vectors halved with truncation toward zero.

The encoder closes the loop through the DECODER's reconstruction
(shared ``_reconstruct_block``), so P-frame references never drift:
what the motion search sees is exactly what a decoder will have.

Honest scope notes:

- I and P pictures only (no B pictures — GOPs are closed and
  low-delay, the streaming-corpus shape), one slice per macroblock
  row, forward_f_code fixed at 1 (vector range ±16 full pel; the
  encoder searches ±7 by default).
- The encoder always writes the DEFAULT quantizer matrices; the
  decoder honours loaded ones.

Random access is the point of the GOP structure and is exposed
directly: ``mpeg1_n_frames`` counts picture start codes without any
entropy decode, and ``decode_mpeg1_frame`` seeks by decoding only
from the nearest preceding I picture.

Reference parity note: the reference pipeline (kiln repo) has no video
codecs at all; this is part of the beyond-reference multimodal layer
dispatched through ``stages/media.py``'s ``LibraryDecoder``.
"""

from __future__ import annotations

import numpy as np

from .flac import _BitReader, _BitWriter
from .jpeg import _A, ZIGZAG, UNZIGZAG, rgb_to_ycbcr, ycbcr_to_rgb

# ---------------------------------------------------------------------------
# VLC tables (ISO/IEC 11172-2 Annex B) — codes as bit-strings, asserted
# prefix-free per decode context at import time
# ---------------------------------------------------------------------------

# B.1 macroblock_address_increment
_B1_CODES = {
    1: "1", 2: "011", 3: "010", 4: "0011", 5: "0010",
    6: "00011", 7: "00010", 8: "0000111", 9: "0000110",
    10: "00001011", 11: "00001010", 12: "00001001", 13: "00001000",
    14: "00000111", 15: "00000110",
    16: "0000010111", 17: "0000010110", 18: "0000010101",
    19: "0000010100", 20: "0000010011", 21: "0000010010",
    22: "00000100011", 23: "00000100010", 24: "00000100001",
    25: "00000100000", 26: "00000011111", 27: "00000011110",
    28: "00000011101", 29: "00000011100", 30: "00000011011",
    31: "00000011010", 32: "00000011001", 33: "00000011000",
}
_B1_ESCAPE = "00000001000"      # macroblock_escape: add 33, read again
_B1_STUFFING = "00000001111"    # legal no-op; never emitted, always decoded

# B.4 motion_code: value 0 -> B.1(1); +m -> B.1(2m+1); -m -> B.1(2m)
# (the spec's signed table IS the B.1 codes under this mapping)
_MOTION_CODES = {0: _B1_CODES[1]}
for _m in range(1, 17):
    _MOTION_CODES[_m] = _B1_CODES[2 * _m + 1]
    _MOTION_CODES[-_m] = _B1_CODES[2 * _m]

# B.2 macroblock_type -> (quant, motion_forward, coded, intra)
_MBTYPE_I = {"1": (0, 0, 0, 1), "01": (1, 0, 0, 1)}
_MBTYPE_P = {
    "1": (0, 1, 1, 0),       # MC, coded
    "01": (0, 0, 1, 0),      # no MC, coded
    "001": (0, 1, 0, 0),     # MC, not coded
    "00011": (0, 0, 0, 1),   # intra
    "00010": (1, 1, 1, 0),   # MC, coded, new quant
    "00001": (1, 0, 1, 0),   # no MC, coded, new quant
    "000001": (1, 0, 0, 1),  # intra, new quant
}

# B.3 coded_block_pattern: cbp value (bit 5 = Y0 .. bit 0 = Cr) -> code
_CBP_CODES = {
    60: "111",
    4: "1101", 8: "1100", 16: "1011", 32: "1010",
    12: "10011", 48: "10010", 20: "10001", 40: "10000",
    28: "01111", 44: "01110", 52: "01101", 56: "01100",
    1: "01011", 61: "01010", 2: "01001", 62: "01000",
    24: "001111", 36: "001110", 3: "001101", 63: "001100",
    5: "0010111", 9: "0010110", 17: "0010101", 33: "0010100",
    6: "0010011", 10: "0010010", 18: "0010001", 34: "0010000",
    7: "00011111", 11: "00011110", 19: "00011101", 35: "00011100",
    13: "00011011", 49: "00011010", 21: "00011001", 41: "00011000",
    14: "00010111", 50: "00010110", 22: "00010101", 42: "00010100",
    15: "00010011", 51: "00010010", 23: "00010001", 43: "00010000",
    25: "00001111", 37: "00001110", 26: "00001101", 38: "00001100",
    29: "00001011", 45: "00001010", 53: "00001001", 57: "00001000",
    30: "00000111", 46: "00000110", 54: "00000101", 58: "00000100",
    31: "000000111", 47: "000000110", 55: "000000101", 59: "000000100",
    27: "000000011", 39: "000000010",
}

# B.5a/b intra-DC size
_DC_LUM = {0: "100", 1: "00", 2: "01", 3: "101", 4: "110", 5: "1110",
           6: "11110", 7: "111110", 8: "1111110"}
_DC_CHR = {0: "00", 1: "01", 2: "10", 3: "110", 4: "1110", 5: "11110",
           6: "111110", 7: "1111110", 8: "11111110"}

# B.5c dct_coeff run/level (sign bit appended on the wire).  (0, 1) is
# "1" when it is the FIRST coefficient of a non-intra block, "11"
# otherwise — the EOB "10" cannot appear before the first coefficient.
_DCT_CODES = {
    (0, 1): "11",
    (1, 1): "011", (0, 2): "0100", (2, 1): "0101",
    (0, 3): "00101", (3, 1): "00111", (4, 1): "00110",
    (1, 2): "000110", (5, 1): "000111", (6, 1): "000101", (7, 1): "000100",
    (0, 4): "0000110", (2, 2): "0000100", (8, 1): "0000111",
    (9, 1): "0000101",
    (0, 5): "00100110", (0, 6): "00100001", (1, 3): "00100101",
    (3, 2): "00100100", (10, 1): "00100111", (11, 1): "00100011",
    (12, 1): "00100010", (13, 1): "00100000",
    (0, 7): "0000001010", (1, 4): "0000001100", (2, 3): "0000001011",
    (4, 2): "0000001111", (5, 2): "0000001001", (14, 1): "0000001110",
    (15, 1): "0000001101", (16, 1): "0000001000",
    (0, 8): "000000011101", (0, 9): "000000011000",
    (0, 10): "000000010011", (0, 11): "000000010000",
    (1, 5): "000000011011", (2, 4): "000000010100",
    (3, 3): "000000011100", (4, 3): "000000010010",
    (6, 2): "000000011110", (7, 2): "000000010101",
    (8, 2): "000000010001", (17, 1): "000000011111",
    (18, 1): "000000011010", (19, 1): "000000011001",
    (20, 1): "000000010111", (21, 1): "000000010110",
    (0, 12): "0000000011010", (0, 13): "0000000011001",
    (0, 14): "0000000011000", (0, 15): "0000000010111",
    (1, 6): "0000000010110", (1, 7): "0000000010101",
    (2, 5): "0000000010100", (3, 4): "0000000010011",
    (5, 3): "0000000010010", (9, 2): "0000000010001",
    (10, 2): "0000000010000", (22, 1): "0000000011111",
    (23, 1): "0000000011110", (24, 1): "0000000011101",
    (25, 1): "0000000011100", (26, 1): "0000000011011",
}
_EOB = "10"
_DCT_ESCAPE = "000001"


def _assert_prefix_free(codes: list[str]) -> None:
    s = sorted(codes)
    for a, b in zip(s, s[1:]):
        if b.startswith(a):
            raise AssertionError(f"VLC not prefix-free: {a!r} / {b!r}")


_assert_prefix_free(list(_B1_CODES.values()) + [_B1_ESCAPE, _B1_STUFFING])
_assert_prefix_free(list(_MBTYPE_I))
_assert_prefix_free(list(_MBTYPE_P))
_assert_prefix_free(list(_CBP_CODES.values()))
_assert_prefix_free(list(_DC_LUM.values()))
_assert_prefix_free(list(_DC_CHR.values()))
# "next coefficient" context: full table + EOB + escape
_assert_prefix_free(list(_DCT_CODES.values()) + [_EOB, _DCT_ESCAPE])
# "first coefficient" context: (0, 1) shortens to "1", EOB absent
_assert_prefix_free(["1"] + [c for (rl, c) in _DCT_CODES.items()
                             if rl != (0, 1)] + [_DCT_ESCAPE])


def _enc_table(codes: dict) -> dict:
    """value -> (int code, n bits)"""
    return {v: (int(c, 2), len(c)) for v, c in codes.items()}


def _dec_table(codes: dict) -> dict:
    """(n bits, int code) -> value"""
    return {(len(c), int(c, 2)): v for v, c in codes.items()}


_B1_ENC = _enc_table(_B1_CODES)
_MOTION_ENC = _enc_table(_MOTION_CODES)
_DC_LUM_ENC = _enc_table(_DC_LUM)
_DC_CHR_ENC = _enc_table(_DC_CHR)
_CBP_ENC = _enc_table(_CBP_CODES)
_DCT_ENC = _enc_table(_DCT_CODES)

_B1_DEC = _dec_table({v: c for v, c in _B1_CODES.items()})
_B1_DEC[(len(_B1_ESCAPE), int(_B1_ESCAPE, 2))] = "escape"
_B1_DEC[(len(_B1_STUFFING), int(_B1_STUFFING, 2))] = "stuffing"
_MOTION_DEC = _dec_table(_MOTION_CODES)
_MBTYPE_I_DEC = {(len(c), int(c, 2)): f for c, f in _MBTYPE_I.items()}
_MBTYPE_P_DEC = {(len(c), int(c, 2)): f for c, f in _MBTYPE_P.items()}
_CBP_DEC = _dec_table(_CBP_CODES)
_DC_LUM_DEC = _dec_table(_DC_LUM)
_DC_CHR_DEC = _dec_table(_DC_CHR)
_DCT_NEXT_DEC = _dec_table(_DCT_CODES)
_DCT_NEXT_DEC[(len(_EOB), int(_EOB, 2))] = "eob"
_DCT_NEXT_DEC[(len(_DCT_ESCAPE), int(_DCT_ESCAPE, 2))] = "escape"
_DCT_FIRST_DEC = {k: v for k, v in _DCT_NEXT_DEC.items()
                  if v not in ("eob",) and v != (0, 1)}
_DCT_FIRST_DEC[(1, 1)] = (0, 1)

# default intra quantizer matrix (raster order), non-intra is flat 16
_INTRA_Q = np.array([
    8, 16, 19, 22, 26, 27, 29, 34,
    16, 16, 22, 24, 27, 29, 34, 37,
    19, 22, 26, 27, 29, 34, 34, 38,
    22, 22, 26, 27, 29, 34, 37, 40,
    22, 26, 27, 29, 32, 35, 40, 48,
    26, 27, 29, 32, 35, 40, 48, 58,
    26, 27, 29, 34, 38, 46, 56, 69,
    27, 29, 35, 38, 46, 56, 69, 83,
], dtype=np.int64)
_NONINTRA_Q = np.full(64, 16, dtype=np.int64)

_SEQ_START = b"\x00\x00\x01\xb3"
_GOP_START = b"\x00\x00\x01\xb8"
_PIC_START = b"\x00\x00\x01\x00"
_SEQ_END = b"\x00\x00\x01\xb7"


# ---------------------------------------------------------------------------
# shared reconstruction arithmetic (normative — encoder loops through it)
# ---------------------------------------------------------------------------

def _reconstruct_block(zz: np.ndarray, qscale: int, intra: bool,
                       intra_q: np.ndarray, noninta_q: np.ndarray
                       ) -> np.ndarray:
    """Zigzag-ordered quantized levels (64,) -> spatial 8x8 int block
    (intra: pixels; non-intra: residual), per the spec's dequant with
    truncation toward zero, oddification mismatch control and the
    [-2048, 2047] coefficient clamp."""
    lev = zz.astype(np.int64)
    sign = np.sign(lev)
    if intra:
        qm = intra_q[ZIGZAG]
        rec = sign * ((2 * np.abs(lev) * qscale * qm) // 16)
    else:
        qm = noninta_q[ZIGZAG]
        rec = sign * (((2 * np.abs(lev) + 1) * qscale * qm) // 16)
        rec[lev == 0] = 0
    # mismatch control: even nonzero values move one step toward zero
    even = (rec != 0) & (rec % 2 == 0)
    rec[even] -= sign[even]
    if intra:  # DC bypasses the AC dequant entirely: recon = 8 * level
        rec[0] = 8 * int(zz[0])
    rec = np.clip(rec, -2048, 2047).astype(np.float64)
    coef = np.empty(64)
    coef[ZIGZAG] = rec
    blk = _A.T @ coef.reshape(8, 8) @ _A
    return np.round(blk).astype(np.int64)


def _quantize_block(coef: np.ndarray, qscale: int, intra: bool,
                    intra_q: np.ndarray, noninta_q: np.ndarray
                    ) -> np.ndarray:
    """8x8 DCT coefficients -> zigzag-ordered levels (64,), inverting the
    reconstruction above (levels clamped to the escape-codable ±255)."""
    zzc = coef.reshape(64)[ZIGZAG]
    if intra:
        qm = intra_q[ZIGZAG].astype(np.float64)
        lev = np.round(8.0 * zzc / (qscale * qm)).astype(np.int64)
        lev[0] = int(np.clip(np.round(zzc[0] / 8.0), 0, 255))
    else:
        qm = noninta_q[ZIGZAG].astype(np.float64)
        lev = np.fix(16.0 * zzc / (2.0 * qscale * qm)).astype(np.int64)
    lev[1:] = np.clip(lev[1:], -255, 255)
    return lev


def _fdct(block: np.ndarray) -> np.ndarray:
    return _A @ block.astype(np.float64) @ _A.T


# ---------------------------------------------------------------------------
# bit helpers
# ---------------------------------------------------------------------------

def _bits_written(bw: _BitWriter) -> int:
    return sum(len(c) for c in bw.chunks)


def _align(bw: _BitWriter) -> None:
    pad = -_bits_written(bw) % 8
    if pad:
        bw.write(0, pad)


def _peek(br: _BitReader, n: int) -> int:
    sl = br.bits[br.pos:br.pos + n]
    out = 0
    for b in sl:
        out = (out << 1) | int(b)
    return out << (n - len(sl))  # zero-pad at stream end


def _read_vlc(br: _BitReader, table: dict, max_len: int = 13):
    code = 0
    bits, pos = br.bits, br.pos
    end = len(bits)
    for n in range(1, max_len + 1):
        if pos >= end:
            raise ValueError("truncated MPEG-1 stream inside a VLC")
        code = (code << 1) | int(bits[pos])
        pos += 1
        v = table.get((n, code))
        if v is not None:
            br.pos = pos
            return v
    raise ValueError("invalid MPEG-1 VLC")


# ---------------------------------------------------------------------------
# plane prep
# ---------------------------------------------------------------------------

def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -h % mult, -w % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _to_planes(frame: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """RGB (or gray) uint8 frame -> (Y, Cb, Cr) float64, Y padded to 16,
    chroma 4:2:0 (half resolution, padded to 8)."""
    if frame.ndim == 2:
        frame = np.repeat(frame[:, :, None], 3, axis=2)
    ycc = rgb_to_ycbcr(frame)
    y = _pad_edge(ycc[..., 0], 16)
    cb = _pad_edge(ycc[..., 1], 16)
    cr = _pad_edge(ycc[..., 2], 16)
    cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3))
    cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3))
    return y, cb, cr


def _planes_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                   w: int, h: int) -> np.ndarray:
    cbu = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)
    cru = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)
    ycc = np.stack([y.astype(np.float64),
                    cbu[: y.shape[0], : y.shape[1]],
                    cru[: y.shape[0], : y.shape[1]]], axis=-1)
    return ycbcr_to_rgb(ycc)[:h, :w]


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _write_intra_dc(bw: _BitWriter, diff: int, lum: bool) -> None:
    size = int(abs(diff)).bit_length()
    code, n = (_DC_LUM_ENC if lum else _DC_CHR_ENC)[size]
    bw.write(code, n)
    if size:
        bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)


def _write_coeff(bw: _BitWriter, run: int, level: int, first: bool) -> None:
    key = (run, abs(level))
    if key in _DCT_ENC and abs(level) != 0:
        if key == (0, 1) and first:
            bw.write(0b1, 1)
        else:
            code, n = _DCT_ENC[key]
            bw.write(code, n)
        bw.write(1 if level < 0 else 0, 1)
        return
    # ESCAPE: 6-bit run + 8/16-bit level (|level| <= 255 by clamping)
    bw.write(int(_DCT_ESCAPE, 2), len(_DCT_ESCAPE))
    bw.write(run, 6)
    if -127 <= level <= 127:
        bw.write(level & 0xFF, 8)
    elif level > 0:
        bw.write(0x00, 8)
        bw.write(level, 8)
    else:
        bw.write(0x80, 8)
        bw.write(256 - abs(level), 8)


def _write_block_coeffs(bw: _BitWriter, zz: np.ndarray, intra: bool) -> None:
    """AC (intra) or all (non-intra) run/level emission + EOB."""
    start = 1 if intra else 0
    nz = np.flatnonzero(zz[start:])
    run = 0
    first = not intra
    prev = start - 1
    for i in nz:
        pos = start + int(i)
        run = pos - prev - 1
        _write_coeff(bw, run, int(zz[pos]), first)
        first = False
        prev = pos
    bw.write(int(_EOB, 2), len(_EOB))


def _write_mv(bw: _BitWriter, d: int) -> None:
    code, n = _MOTION_ENC[d]
    bw.write(code, n)


def _write_addr_inc(bw: _BitWriter, inc: int) -> None:
    while inc > 33:
        bw.write(int(_B1_ESCAPE, 2), len(_B1_ESCAPE))
        inc -= 33
    code, n = _B1_ENC[inc]
    bw.write(code, n)


def _mb_blocks(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
               r: int, c: int) -> list[np.ndarray]:
    """The six 8x8 blocks of macroblock (r, c): Y00 Y01 Y10 Y11 Cb Cr."""
    y0, x0 = 16 * r, 16 * c
    return [
        y[y0:y0 + 8, x0:x0 + 8], y[y0:y0 + 8, x0 + 8:x0 + 16],
        y[y0 + 8:y0 + 16, x0:x0 + 8], y[y0 + 8:y0 + 16, x0 + 8:x0 + 16],
        cb[8 * r:8 * r + 8, 8 * c:8 * c + 8],
        cr[8 * r:8 * r + 8, 8 * c:8 * c + 8],
    ]


def _motion_search(ref: np.ndarray, cur: np.ndarray, r: int, c: int,
                   rng: int) -> tuple[int, int, float, float]:
    """Full-pel exhaustive SAD over a clamped ±rng window.
    Returns (dy, dx, best_sad, zero_sad)."""
    y0, x0 = 16 * r, 16 * c
    tgt = cur[y0:y0 + 16, x0:x0 + 16].astype(np.int64)
    ylo, yhi = max(0, y0 - rng), min(ref.shape[0] - 16, y0 + rng)
    xlo, xhi = max(0, x0 - rng), min(ref.shape[1] - 16, x0 + rng)
    region = ref[ylo:yhi + 16, xlo:xhi + 16]
    sw = np.lib.stride_tricks.sliding_window_view(region, (16, 16))
    sad = np.abs(sw.astype(np.int64) - tgt).sum(axis=(2, 3))
    iy, ix = np.unravel_index(int(np.argmin(sad)), sad.shape)
    return (int(ylo + iy - y0), int(xlo + ix - x0),
            float(sad[iy, ix]), float(sad[y0 - ylo, x0 - xlo]))


def encode_mpeg1(frames: list[np.ndarray], gop_size: int = 6,
                 qscale_i: int = 6, qscale_p: int = 8,
                 search_range: int = 7) -> bytes:
    """Encode uint8 RGB (h, w, 3) or gray (h, w) frames (all one size)
    to an MPEG-1 video elementary stream of closed I/P GOPs."""
    if not frames:
        raise ValueError("need at least one frame")
    f0 = np.asarray(frames[0])
    h, w = f0.shape[:2]
    if not (0 < w < 4096 and 0 < h < 4096):
        raise ValueError("picture size out of MPEG-1 range")
    mbw, mbh = -(-w // 16), -(-h // 16)
    if search_range > 15:
        raise ValueError("search_range beyond forward_f_code=1")

    bw = _BitWriter()
    # sequence header
    bw.write_array(np.unpackbits(np.frombuffer(_SEQ_START, np.uint8)))
    bw.write(w, 12)
    bw.write(h, 12)
    bw.write(1, 4)       # pel aspect 1:1
    bw.write(3, 4)       # picture rate: 25 fps
    bw.write(0x3FFFF, 18)  # bit_rate: variable
    bw.write(1, 1)       # marker
    bw.write(0, 10)      # vbv_buffer_size
    bw.write(0, 1)       # constrained_parameters_flag
    bw.write(0, 1)       # load_intra_quantizer_matrix (default)
    bw.write(0, 1)       # load_non_intra_quantizer_matrix (default)

    ref: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None
    for idx, frame in enumerate(frames):
        frame = np.asarray(frame)
        if frame.shape[:2] != (h, w):
            raise ValueError("all frames must share one size")
        y, cb, cr = _to_planes(frame)
        is_i = idx % gop_size == 0
        qs = qscale_i if is_i else qscale_p
        if is_i:
            _align(bw)
            bw.write_array(np.unpackbits(np.frombuffer(_GOP_START, np.uint8)))
            bw.write(0, 1)   # drop_frame_flag
            bw.write(0, 5)   # hours
            bw.write(0, 6)   # minutes
            bw.write(1, 1)   # marker
            bw.write(0, 6)   # seconds
            bw.write(0, 6)   # pictures
            bw.write(1, 1)   # closed_gop
            bw.write(0, 1)   # broken_link
        _align(bw)
        bw.write_array(np.unpackbits(np.frombuffer(_PIC_START, np.uint8)))
        bw.write(idx % gop_size, 10)          # temporal_reference
        bw.write(1 if is_i else 2, 3)         # picture_coding_type
        bw.write(0xFFFF, 16)                  # vbv_delay: variable
        if not is_i:
            bw.write(1, 1)                    # full_pel_forward_vector
            bw.write(1, 3)                    # forward_f_code = 1
        bw.write(0, 1)                        # extra_bit_picture

        ry = np.zeros_like(y, dtype=np.int64)
        rcb = np.zeros_like(cb, dtype=np.int64)
        rcr = np.zeros_like(cr, dtype=np.int64)
        for row in range(mbh):
            _align(bw)
            bw.write_array(np.unpackbits(
                np.frombuffer(b"\x00\x00\x01" + bytes([row + 1]), np.uint8)))
            bw.write(qs, 5)
            bw.write(0, 1)                    # extra_bit_slice
            prev_addr = row * mbw - 1
            mv_pred = (0, 0)
            dc_pred = [128, 128, 128]
            for col in range(mbw):
                addr = row * mbw + col
                if is_i:
                    mb_kind = "intra"
                    dy = dx = 0
                else:
                    dy, dx, sad_mv, sad_0 = _motion_search(
                        ref[0], y, row, col, search_range)
                    blocks = _mb_blocks(y, cb, cr, row, col)
                    act = sum(float(np.abs(b - b.mean()).sum())
                              for b in blocks[:4])
                    if sad_mv > act * 1.25 + 256.0:
                        mb_kind = "intra"
                    else:
                        mb_kind = "inter"
                if mb_kind == "intra":
                    levels = []
                    blocks = _mb_blocks(y, cb, cr, row, col)
                    for b in blocks:
                        levels.append(_quantize_block(
                            _fdct(b), qs, True, _INTRA_Q, _NONINTRA_Q))
                    self_recon = [_reconstruct_block(
                        lv, qs, True, _INTRA_Q, _NONINTRA_Q) for lv in levels]
                else:
                    pred = _mc_predict(ref, row, col, dy, dx)
                    blocks = _mb_blocks(y, cb, cr, row, col)
                    levels, self_recon = [], []
                    for b, p in zip(blocks, pred):
                        lv = _quantize_block(
                            _fdct(b - p), qs, False, _INTRA_Q, _NONINTRA_Q)
                        levels.append(lv)
                        res = (_reconstruct_block(
                            lv, qs, False, _INTRA_Q, _NONINTRA_Q)
                            if lv.any() else np.zeros((8, 8), np.int64))
                        self_recon.append(np.clip(p + res, 0, 255))
                    cbp = 0
                    for i, lv in enumerate(levels):
                        if lv.any():
                            cbp |= 1 << (5 - i)
                    if cbp == 0 and (dy, dx) == (0, 0) and _may_skip(
                            col, mbw):
                        mv_pred = (0, 0)
                        dc_pred = [128, 128, 128]
                        _store_mb(ry, rcb, rcr, row, col, self_recon)
                        continue
                # emit address increment (skips fold into the gap)
                inc = addr - prev_addr
                prev_addr = addr
                _write_addr_inc(bw, inc)
                if mb_kind == "intra":
                    bw.write(*(_mb_type_code(is_i, "intra")))
                    if not is_i:
                        mv_pred = (0, 0)
                    for i, lv in enumerate(levels):
                        comp = 0 if i < 4 else i - 3       # 0=Y, 1=Cb, 2=Cr
                        diff = int(lv[0]) - dc_pred[comp]
                        dc_pred[comp] = int(lv[0])
                        _write_intra_dc(bw, diff, comp == 0)
                        _write_block_coeffs(bw, lv, True)
                else:
                    if cbp == 0:
                        bw.write(*(_mb_type_code(False, "mc")))
                        _emit_mv(bw, dy, dx, mv_pred)
                        mv_pred = (dy, dx)
                    elif (dy, dx) == (0, 0):
                        bw.write(*(_mb_type_code(False, "coded")))
                        mv_pred = (0, 0)
                        _write_cbp_blocks(bw, cbp, levels)
                    else:
                        bw.write(*(_mb_type_code(False, "mc_coded")))
                        _emit_mv(bw, dy, dx, mv_pred)
                        mv_pred = (dy, dx)
                        _write_cbp_blocks(bw, cbp, levels)
                    dc_pred = [128, 128, 128]
                _store_mb(ry, rcb, rcr, row, col, self_recon)
        ref = (ry, rcb, rcr)
    _align(bw)
    bw.write_array(np.unpackbits(np.frombuffer(_SEQ_END, np.uint8)))
    return bw.tobytes()


def _may_skip(col: int, mbw: int) -> bool:
    """A macroblock may be skipped only if it is neither the first nor
    the last of its slice (one slice per row here)."""
    return 0 < col < mbw - 1


def _mb_type_code(is_i: bool, kind: str) -> tuple[int, int]:
    table = _MBTYPE_I if is_i else _MBTYPE_P
    want = {
        "intra": (0, 0, 0, 1), "mc_coded": (0, 1, 1, 0),
        "coded": (0, 0, 1, 0), "mc": (0, 1, 0, 0),
    }[kind]
    for code, flags in table.items():
        if flags == want:
            return int(code, 2), len(code)
    raise KeyError(kind)


def _emit_mv(bw: _BitWriter, dy: int, dx: int, pred: tuple[int, int]) -> None:
    for d, p in ((dx, pred[1]), (dy, pred[0])):  # horizontal first
        diff = d - p
        if diff < -16:
            diff += 32
        elif diff > 15:
            diff -= 32
        _write_mv(bw, diff)


def _write_cbp_blocks(bw: _BitWriter, cbp: int, levels: list) -> None:
    code, n = _CBP_ENC[cbp]
    bw.write(code, n)
    for i, lv in enumerate(levels):
        if cbp & (1 << (5 - i)):
            _write_block_coeffs(bw, lv, False)


def _store_mb(ry, rcb, rcr, row: int, col: int, blocks: list) -> None:
    y0, x0 = 16 * row, 16 * col
    ry[y0:y0 + 8, x0:x0 + 8] = blocks[0]
    ry[y0:y0 + 8, x0 + 8:x0 + 16] = blocks[1]
    ry[y0 + 8:y0 + 16, x0:x0 + 8] = blocks[2]
    ry[y0 + 8:y0 + 16, x0 + 8:x0 + 16] = blocks[3]
    rcb[8 * row:8 * row + 8, 8 * col:8 * col + 8] = blocks[4]
    rcr[8 * row:8 * row + 8, 8 * col:8 * col + 8] = blocks[5]


def _mc_predict(ref: tuple, row: int, col: int, dy: int, dx: int) -> list:
    """Six predicted 8x8 blocks for full-pel vector (dy, dx); chroma
    vectors are halved with truncation toward zero per the spec."""
    ry, rcb, rcr = ref
    y0, x0 = 16 * row + dy, 16 * col + dx
    cy = 8 * row + int(dy / 2)
    cx = 8 * col + int(dx / 2)
    return [
        ry[y0:y0 + 8, x0:x0 + 8], ry[y0:y0 + 8, x0 + 8:x0 + 16],
        ry[y0 + 8:y0 + 16, x0:x0 + 8], ry[y0 + 8:y0 + 16, x0 + 8:x0 + 16],
        rcb[cy:cy + 8, cx:cx + 8], rcr[cy:cy + 8, cx:cx + 8],
    ]


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class _Mpeg1Decoder:
    def __init__(self, payload: bytes) -> None:
        if payload[:4] != _SEQ_START:
            raise ValueError("not an MPEG-1 video elementary stream")
        self.payload = payload
        br = _BitReader(payload, pos_bytes=4)
        self.w = br.read(12)
        self.h = br.read(12)
        br.read(4)                       # pel aspect
        br.read(4)                       # picture rate
        br.read(18)                      # bit rate
        if br.read(1) != 1:
            raise ValueError("sequence header marker bit missing")
        br.read(10)                      # vbv size
        br.read(1)                       # constrained flag
        if br.read(1):                   # load_intra_quantizer_matrix
            self.intra_q = np.array([br.read(8) for _ in range(64)],
                                    np.int64)[UNZIGZAG]
        else:
            self.intra_q = _INTRA_Q
        if br.read(1):                   # load_non_intra_quantizer_matrix
            self.noninta_q = np.array([br.read(8) for _ in range(64)],
                                      np.int64)[UNZIGZAG]
        else:
            self.noninta_q = _NONINTRA_Q
        self.mbw, self.mbh = -(-self.w // 16), -(-self.h // 16)
        self.ref: tuple | None = None

    # -- block layers -------------------------------------------------
    def _read_intra_dc(self, br: _BitReader, lum: bool) -> int:
        size = _read_vlc(br, _DC_LUM_DEC if lum else _DC_CHR_DEC, 8)
        if size == 0:
            return 0
        d = br.read(size)
        return d if d >= (1 << (size - 1)) else d - (1 << size) + 1

    def _read_coeffs(self, br: _BitReader, zz: np.ndarray, intra: bool
                     ) -> None:
        """Fill zigzag levels starting after the intra DC (or from 0)."""
        pos = 0 if intra else -1
        first = not intra
        while True:
            table = _DCT_FIRST_DEC if first else _DCT_NEXT_DEC
            v = _read_vlc(br, table, 13)
            first = False
            if v == "eob":
                return
            if v == "escape":
                run = br.read(6)
                level = br.read(8)
                if level == 0:
                    level = br.read(8)
                elif level == 0x80:
                    level = br.read(8) - 256
                elif level > 128:
                    level -= 256
            else:
                run, level = v
                if br.read(1):
                    level = -level
            pos += run + 1
            if pos > 63:
                raise ValueError("coefficient run past end of block")
            zz[pos] = level

    def _decode_block(self, br: _BitReader, qs: int, intra: bool,
                      dc_pred: list, comp: int) -> np.ndarray:
        zz = np.zeros(64, dtype=np.int64)
        if intra:
            diff = self._read_intra_dc(br, comp == 0)
            dc_pred[comp] = dc_pred[comp] + diff
            zz[0] = dc_pred[comp]
            self._read_coeffs(br, zz, True)
        else:
            self._read_coeffs(br, zz, False)
        return _reconstruct_block(zz, qs, intra, self.intra_q,
                                  self.noninta_q)

    # -- picture layer ------------------------------------------------
    def decode_picture(self, br: _BitReader) -> np.ndarray:
        if br.read(32) != int.from_bytes(_PIC_START, "big"):
            raise ValueError("expected picture start code")
        br.read(10)                     # temporal reference
        ptype = br.read(3)
        if ptype not in (1, 2):
            raise ValueError("only I and P pictures are decodable")
        br.read(16)                     # vbv_delay
        full_pel = 1
        if ptype == 2:
            full_pel = br.read(1)
            f_code = br.read(3)
            if f_code != 1:
                raise ValueError("decoder operating point is f_code=1")
        while br.read(1) == 1:
            br.read(8)                  # extra_information_picture

        ph, pw = 16 * self.mbh, 16 * self.mbw
        if ptype == 2 and self.ref is None:
            raise ValueError("P picture with no reference")
        if ptype == 2:
            cy = tuple(p.copy() for p in self.ref)
        else:
            cy = (np.zeros((ph, pw), np.int64),
                  np.zeros((ph // 2, pw // 2), np.int64),
                  np.zeros((ph // 2, pw // 2), np.int64))
        y, cb, cr = cy

        while True:
            br.align()
            nxt = _peek(br, 32)
            if not (0x00000101 <= nxt <= 0x000001AF):
                break
            br.read(32)
            svp = nxt & 0xFF
            qs = br.read(5)
            while br.read(1) == 1:
                br.read(8)              # extra_information_slice
            addr = (svp - 1) * self.mbw - 1
            mv_pred = [0, 0]
            dc_pred = [128, 128, 128]
            first_mb = True
            while True:
                inc = 0
                while True:
                    v = _read_vlc(br, _B1_DEC, 11)
                    if v == "stuffing":
                        continue
                    if v == "escape":
                        inc += 33
                        continue
                    inc += v
                    break
                skipped = range(addr + 1, addr + inc) if not first_mb else ()
                for s in skipped:       # P-picture skipped MBs: copy ref
                    mv_pred = [0, 0]
                    dc_pred = [128, 128, 128]
                    # current planes started as a ref copy — nothing to do
                addr += inc
                first_mb = False
                row, col = divmod(addr, self.mbw)
                if ptype == 1:
                    quant, mf, coded, intra = _read_vlc(br, _MBTYPE_I_DEC, 2)
                else:
                    quant, mf, coded, intra = _read_vlc(br, _MBTYPE_P_DEC, 6)
                if quant:
                    qs = br.read(5)
                dy = dx = 0
                if mf:
                    dxc = _read_vlc(br, _MOTION_DEC, 11)
                    dyc = _read_vlc(br, _MOTION_DEC, 11)
                    dx = _recon_mv(mv_pred[1], dxc)
                    dy = _recon_mv(mv_pred[0], dyc)
                    mv_pred = [dy, dx]
                    if not full_pel:
                        raise ValueError(
                            "decoder operating point is full-pel vectors")
                elif not intra:
                    mv_pred = [0, 0]
                if intra:
                    mv_pred = [0, 0]
                    blocks = []
                    for i in range(6):
                        comp = 0 if i < 4 else i - 3
                        blocks.append(np.clip(self._decode_block(
                            br, qs, True, dc_pred, comp), 0, 255))
                    _store_mb(y, cb, cr, row, col, blocks)
                else:
                    dc_pred = [128, 128, 128]
                    cbp = _read_vlc(br, _CBP_DEC, 9) if coded else 0
                    pred = _mc_predict(self.ref, row, col, dy, dx)
                    blocks = []
                    for i in range(6):
                        if cbp & (1 << (5 - i)):
                            res = self._decode_block(br, qs, False,
                                                     dc_pred, 0)
                        else:
                            res = 0
                        blocks.append(np.clip(pred[i] + res, 0, 255))
                    _store_mb(y, cb, cr, row, col, blocks)
                if _peek(br, 23) == 0:
                    break
        self.ref = (y, cb, cr)
        return _planes_to_rgb(y, cb, cr, self.w, self.h)


def _recon_mv(pred: int, code: int) -> int:
    v = pred + code
    if v < -16:
        v += 32
    elif v > 15:
        v -= 32
    return v


# ---------------------------------------------------------------------------
# public container API (mirrors the MJPEG/GIF decoders' surface)
# ---------------------------------------------------------------------------

def mpeg1_picture_offsets(payload: bytes) -> tuple[list[int], list[int]]:
    """Byte offsets and coding types (1=I, 2=P) of every picture —
    a pure start-code scan, no entropy decode."""
    offs, types = [], []
    i = 0
    while True:
        j = payload.find(_PIC_START, i)
        if j < 0:
            return offs, types
        offs.append(j)
        # picture header: 10 bits temporal ref then 3 bits type
        types.append((payload[j + 5] >> 3) & 0x7)
        i = j + 4


def mpeg1_n_frames(payload: bytes) -> int:
    """Frame count from the container alone (start-code scan)."""
    if payload[:4] != _SEQ_START:
        raise ValueError("not an MPEG-1 video elementary stream")
    return len(mpeg1_picture_offsets(payload)[0])


def decode_mpeg1(payload: bytes) -> list[np.ndarray]:
    """Decode every picture -> list of RGB uint8 frames."""
    dec = _Mpeg1Decoder(payload)
    out = []
    for off in mpeg1_picture_offsets(payload)[0]:
        br = _BitReader(payload, pos_bytes=off)
        out.append(dec.decode_picture(br))
    return out


def decode_mpeg1_frame(payload: bytes, frame_idx: int) -> np.ndarray:
    """GOP random access: decode only from the nearest preceding I
    picture through ``frame_idx`` — the seek cost is bounded by the GOP
    size, not the stream length."""
    dec = _Mpeg1Decoder(payload)
    offs, types = mpeg1_picture_offsets(payload)
    if not 0 <= frame_idx < len(offs):
        raise IndexError(f"frame {frame_idx} of {len(offs)}")
    start = frame_idx
    while types[start] != 1:
        start -= 1
        if start < 0:
            raise ValueError("no I picture precedes the requested frame")
    img = None
    for off in offs[start:frame_idx + 1]:
        br = _BitReader(payload, pos_bytes=off)
        img = dec.decode_picture(br)
    return img
