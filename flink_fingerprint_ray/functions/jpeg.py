"""Baseline JPEG codec in pure numpy/python — fills the compressed-codec
slot of the multimodal path (``stages/media.py`` ``LibraryDecoder``) with
a REAL decoder in a container that has no PIL/opencv/libav.

Implements the public ITU-T T.81 baseline sequential process: JFIF
markers, Annex-K quantization tables (IJG quality scaling), Annex-K
canonical Huffman tables, 8x8 FDCT/IDCT (orthonormal matrix form,
batched over all blocks with one einsum), 4:4:4 and 4:2:0 chroma
subsampling, byte stuffing.  Out of scope (raises): progressive scans,
arithmetic coding, restart intervals, 12-bit precision.

Cost shape: entropy (de)coding is inherently sequential per image (a
Python loop over Huffman symbols) — that is why the media stage runs it
on an ACTOR POOL with small batches; everything per-image that can be
vectorized (DCT, quantization, color transform, upsampling) is numpy
over all blocks at once.

The encoder exists so fixtures can build GENUINE JPEG payloads to test
the decoder against (roundtrip PSNR + exact determinism), mirroring how
``encode_ppm`` backs the netpbm path.
"""

from __future__ import annotations

import struct

import numpy as np

# -- constants (ITU-T T.81 Annex K) -----------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)

DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
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
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
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
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8x8 DCT-II matrix: fdct(b) = A @ b @ A.T, idct(c) = A.T @ c @ A
_A = np.array([
    [(np.sqrt(1 / 8) if u == 0 else 0.5) * np.cos((2 * x + 1) * u * np.pi / 16)
     for x in range(8)] for u in range(8)
])


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = max(1, min(100, int(quality)))
    scale = 5000 / q if q < 50 else 200 - 2 * q
    out = []
    for t in (QT_LUMA, QT_CHROMA):
        s = np.floor((t * scale + 50) / 100)
        out.append(np.clip(s, 1, 255))
    return out[0], out[1]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 canonical construction."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {(l, c): s for s, (c, l) in _canonical_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.out)


def _csize(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(h, w) -> (n_blocks_y, n_blocks_x, 8, 8), h/w already multiples of 8."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -h % mult, -w % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsample: bool = False) -> bytes:
    """uint8 (h, w, 3) RGB or (h, w) gray -> baseline JFIF bytes
    (4:2:0 when ``subsample`` else 4:4:4)."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qt_l, qt_c = _quality_tables(quality)
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qts = [qt_l]
    else:
        ycc = rgb_to_ycbcr(img)
        if subsample:
            ylum = _pad_to(ycc[..., 0], 16)
            cb = _pad_to(ycc[..., 1], 16)
            cr = _pad_to(ycc[..., 2], 16)
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3))
            planes = [ylum, cb, cr]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
            samp = [(1, 1), (1, 1), (1, 1)]
        qts = [qt_l, qt_c, qt_c]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # quantized zigzag coefficients per component, blocks in raster order
    comp_coefs = []
    comp_bdims = []
    for plane, (sh, sv), qt in zip(planes, samp, qts):
        # pad so the component's block grid covers the frame's MCU grid
        bx = -(-w // (8 * hmax)) * sh
        by = -(-h // (8 * vmax)) * sv
        need_w, need_h = bx * 8, by * 8
        ph, pw = need_h - plane.shape[0], need_w - plane.shape[1]
        if ph > 0 or pw > 0:
            plane = np.pad(plane, ((0, max(ph, 0)), (0, max(pw, 0))), mode="edge")
        plane = plane[:need_h, :need_w]
        blocks = _to_blocks(plane - 128.0)
        coef = np.einsum("ij,abjk,lk->abil", _A, blocks, _A)
        q = np.round(coef / qt).astype(np.int64)
        comp_coefs.append(q.reshape(by, bx, 8, 8))
        comp_bdims.append((by, bx))

    dc_tabs = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
               _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_tabs = [_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS),
               _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)]

    bw = _BitWriter()
    pred = [0] * len(planes)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (sh, sv) in enumerate(samp):
                tsel = 0 if ci == 0 else 1
                dc_codes, ac_codes = dc_tabs[tsel], ac_tabs[tsel]
                for byi in range(sv):
                    for bxi in range(sh):
                        blk = comp_coefs[ci][my * sv + byi, mx * sh + bxi]
                        zz = blk.reshape(64)[ZIGZAG]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        s = _csize(diff)
                        code, ln = dc_codes[s]
                        bw.write(code, ln)
                        if s:
                            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
                        run = 0
                        nz = np.flatnonzero(zz[1:]) + 1
                        last = 0
                        for k in nz:
                            run = int(k) - last - 1
                            while run >= 16:
                                code, ln = ac_codes[0xF0]
                                bw.write(code, ln)
                                run -= 16
                            v = int(zz[k])
                            s = _csize(v)
                            code, ln = ac_codes[(run << 4) | s]
                            bw.write(code, ln)
                            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                            last = int(k)
                        if last != 63:
                            code, ln = ac_codes[0x00]  # EOB
                            bw.write(code, ln)
    entropy = bw.flush()

    # -- markers --
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + qt_l.astype(np.uint8).reshape(64)[ZIGZAG].tobytes())
    if not gray:
        out += seg(0xFFDB, b"\x01" + qt_c.astype(np.uint8).reshape(64)[ZIGZAG].tobytes())
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += struct.pack(">BBB", ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1)
    out += seg(0xFFC0, sof)

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tsel = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tsel << 4) | tsel])
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first reader over UNSTUFFED entropy bytes."""

    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        out = 0
        sl = self.bits[self.pos:self.pos + n]
        self.pos += n
        for b in sl:
            out = (out << 1) | int(b)
        return out


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 (h, w, 3) RGB (gray replicated)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    i, n = 2, len(payload)
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    scan = None
    entropy_start = entropy_end = 0
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise ValueError(f"marker sync lost at {i}")
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI
            break
        (size,) = struct.unpack(">H", payload[i + 2:i + 4])
        body = payload[i + 4:i + 2 + size]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(body):
                pq_, tq = body[j] >> 4, body[j] & 0xF
                if pq_ != 0:
                    raise ValueError("16-bit quant tables not supported")
                qts[tq] = np.frombuffer(body[j + 1:j + 65], dtype=np.uint8) \
                    .astype(np.float64)[UNZIGZAG].reshape(8, 8)
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(body):
                cls, tid = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1:j + 17])
                nv = sum(bits)
                vals = list(body[j + 17:j + 17 + nv])
                huff[(cls, tid)] = _decode_table(bits, vals)
                j += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit baseline JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential (SOF0) is supported")
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack(">H", body[:2])
            if ri:
                raise ValueError("restart intervals not supported")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            sel = []
            for c in range(ns):
                cid, tt = body[1 + 2 * c:3 + 2 * c]
                sel.append({"id": cid, "dc": tt >> 4, "ac": tt & 0xF})
            scan = sel
            entropy_start = i + 2 + size
            # entropy data runs to the next REAL marker (skip stuffed
            # FF00); find EOI
            j = entropy_start
            while j + 1 < n:
                if payload[j] == 0xFF and payload[j + 1] not in (0x00,):
                    break
                j += 1 if payload[j] != 0xFF else 2
            entropy_end = j
            i = j
            continue
        i += 2 + size
    if frame is None or scan is None:
        raise ValueError("truncated JPEG: missing SOF/SOS")

    data = payload[entropy_start:entropy_end].replace(b"\xff\x00", b"\xff")
    br = _BitReader(data)
    fh, fw = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    by_id = {s["id"]: s for s in scan}

    def read_symbol(table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    coefs = [np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.float64)
             for c in comps]
    pred = [0] * len(comps)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, c in enumerate(comps):
                sdef = by_id[c["id"]]
                dct = huff[(0, sdef["dc"])]
                act = huff[(1, sdef["ac"])]
                for byi in range(c["v"]):
                    for bxi in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        s = read_symbol(dct)
                        diff = _extend(br.read_bits(s), s) if s else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = read_symbol(act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
                        coefs[ci][my * c["v"] + byi, mx * c["h"] + bxi] = zz

    planes = []
    for ci, c in enumerate(comps):
        qt = qts[c["tq"]]
        blocks = (coefs[ci][:, :, UNZIGZAG].reshape(*coefs[ci].shape[:2], 8, 8)
                  * qt)
        pix = np.einsum("ji,abjk,kl->abil", _A, blocks, _A) + 128.0
        by, bx = pix.shape[:2]
        plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[:fh, :fw])
    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    return ycbcr_to_rgb(np.stack(planes, axis=-1))
