"""FLAC lossless audio codec — pure numpy/stdlib, from the public spec
(RFC 9639 / xiph.org FLAC format).  No library lineage: written for this
repo like the sibling T.81 JPEG / RFC 2083 PNG / GIF89a codecs.

Scope (the subset real encoders emit for 16-bit PCM):

- encoder: STREAMINFO (+ genuine PCM MD5), fixed 4096-sample frames,
  FIXED predictors order 0-2 or quantized order-2 LPC, partitioned-Rice
  residuals (method 0), independent or LEFT_SIDE stereo, CRC-8 frame
  headers + CRC-16 frame footers;
- decoder: CONSTANT / VERBATIM / FIXED(0-4) / LPC subframes, Rice
  methods 0 and 1, wasted bits, all four channel assignments
  (independent, left-side, right-side, mid-side), every block-size /
  sample-rate / sample-size header code, UTF-8 frame numbers, CRC-8 +
  CRC-16 verification and final MD5 check.

Bit-level IO follows the JPEG codec's ``np.unpackbits`` reader idiom.
Reference repo has no media at all (SURVEY.md §3.2) — this is part of
the beyond-reference multimodal layer (stages/media.py LibraryDecoder).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_BLOCK = 4096


# ---------------------------------------------------------------------------
# CRCs (FLAC polynomials: CRC-8 0x07, CRC-16 0x8005, both init 0)
# ---------------------------------------------------------------------------

def _make_crc_table(poly: int, width: int) -> np.ndarray:
    table = np.zeros(256, dtype=np.uint32)
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    for i in range(256):
        c = i << (width - 8)
        for _ in range(8):
            c = ((c << 1) ^ poly) if (c & top) else (c << 1)
        table[i] = c & mask
    return table


_CRC8_T = _make_crc_table(0x07, 8)
_CRC16_T = _make_crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8_T[c ^ b])
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC16_T[((c >> 8) ^ b) & 0xFF]) ^ ((c << 8) & 0xFFFF)
    return c


# ---------------------------------------------------------------------------
# bit IO
# ---------------------------------------------------------------------------

class _BitWriter:
    """MSB-first writer holding numpy bit chunks (one array append per
    field, no per-bit Python)."""

    def __init__(self) -> None:
        self.chunks: list[np.ndarray] = []

    def write(self, value: int, n: int) -> None:
        if n:
            sh = np.arange(n - 1, -1, -1, dtype=np.uint64)
            self.chunks.append(
                ((int(value) >> sh) & 1).astype(np.uint8))

    def write_array(self, bits: np.ndarray) -> None:
        if len(bits):
            self.chunks.append(bits.astype(np.uint8, copy=False))

    def write_unary(self, q: int) -> None:
        arr = np.zeros(q + 1, dtype=np.uint8)
        arr[-1] = 1
        self.chunks.append(arr)

    def tobytes(self) -> bytes:
        bits = (np.concatenate(self.chunks) if self.chunks
                else np.empty(0, dtype=np.uint8))
        return np.packbits(bits).tobytes()  # packbits zero-pads to a byte


class _BitReader:
    """MSB-first reader (the JPEG codec's unpackbits idiom) with a
    precomputed set-bit index so unary reads are O(log n), not a rescan
    of the remaining stream."""

    def __init__(self, data: bytes, pos_bytes: int = 0) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self._ones = np.flatnonzero(self.bits)
        self.pos = pos_bytes * 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        sl = self.bits[self.pos:self.pos + n].astype(np.uint64)
        self.pos += n
        sh = np.arange(n - 1, -1, -1, dtype=np.uint64)
        return int((sl << sh).sum())

    def read_unary(self) -> int:
        i = np.searchsorted(self._ones, self.pos)
        q = int(self._ones[i]) - self.pos
        self.pos += q + 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


# ---------------------------------------------------------------------------
# predictors
# ---------------------------------------------------------------------------

_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _fixed_restore(res: np.ndarray, warm: np.ndarray, order: int) -> np.ndarray:
    """Invert ``order`` repeated diffs: at each level the first value of
    d^{k-1} comes from the warmup samples, the rest integrate from d^k."""
    if order == 0:
        return res.astype(np.int64)
    w = warm.astype(np.int64)
    cur = res.astype(np.int64)
    for k in range(order, 0, -1):
        head = np.diff(w, n=k - 1)[0] if k > 1 else w[0]
        cur = np.cumsum(np.concatenate([[head], cur]))
    return cur


# ---------------------------------------------------------------------------
# rice coding
# ---------------------------------------------------------------------------

def _zigzag(r: np.ndarray) -> np.ndarray:
    return (r << 1) ^ (r >> 63)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _write_rice_block(w: _BitWriter, res: np.ndarray) -> None:
    """One-partition (order 0) Rice residual, method 0."""
    u = _zigzag(res.astype(np.int64))
    mean = float(u.mean()) if len(u) else 0.0
    p = 0
    while (1 << (p + 1)) < mean + 1 and p < 14:
        p += 1
    w.write(0, 2)   # residual method 0 (4-bit rice params)
    w.write(0, 4)   # partition order 0
    w.write(p, 4)
    # vectorized rice pack: value i = (u>>p) zeros, a 1, then p LSBs
    q = (u >> p).astype(np.int64)
    lens = q + 1 + p
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    bits = np.zeros(int(lens.sum()), dtype=np.uint8)
    bits[starts + q] = 1
    if p:
        sh = np.arange(p - 1, -1, -1, dtype=np.uint64)
        payload = ((u.astype(np.uint64)[:, None] >> sh) & 1).astype(np.uint8)
        pos = (starts + q + 1)[:, None] + np.arange(p)
        bits[pos.ravel()] = payload.ravel()
    w.write_array(bits)


def _read_residual(r: _BitReader, block: int, order: int) -> np.ndarray:
    method = r.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual method")
    pbits = 4 if method == 0 else 5
    esc = (1 << pbits) - 1
    porder = r.read(4)
    nparts = 1 << porder
    out = np.empty(block - order, dtype=np.int64)
    k = 0
    for part in range(nparts):
        n = (block >> porder) - (order if part == 0 else 0)
        p = r.read(pbits)
        if p == esc:  # escape: raw n-bit residuals
            nb = r.read(5)
            for i in range(n):
                v = r.read(nb)
                out[k] = v - (1 << nb) if nb and (v >> (nb - 1)) else v
                k += 1
        else:
            # terminator scan is sequential (each start depends on the
            # previous quotient) but O(log ones) per value; the p-bit
            # payloads then gather in one vectorized pass
            qs = np.empty(n, dtype=np.int64)
            pays = np.empty(n, dtype=np.int64)
            pos = r.pos
            ones = r._ones
            j = np.searchsorted(ones, pos)
            for i in range(n):
                term = int(ones[j])
                qs[i] = term - pos
                pos = term + 1 + p
                j = np.searchsorted(ones, pos)
            if p:
                lens = qs + 1 + p
                starts = r.pos + np.concatenate(([0], np.cumsum(lens)[:-1]))
                idx = (starts + qs + 1)[:, None] + np.arange(p)
                sh = np.arange(p - 1, -1, -1, dtype=np.int64)
                pays = (r.bits[idx].astype(np.int64) << sh).sum(axis=1)
            else:
                pays[:] = 0
            r.pos = pos
            u = (qs << p) | pays
            out[k:k + n] = (u >> 1) ^ -(u & 1)
            k += n
    return out


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _utf8_code(n: int) -> bytes:
    """FLAC's extended-UTF-8 coded number (frame index)."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > 6 * (nbytes - 1) + (7 - nbytes) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _best_fixed_order(x: np.ndarray) -> int:
    best, border = None, 0
    for o in range(3):
        if len(x) <= o:
            break
        cost = np.abs(_fixed_residual(x, o)).sum()
        if best is None or cost < best:
            best, border = cost, o
    return border


def _quant_lpc2(x: np.ndarray) -> tuple[list[int], int] | None:
    """Order-2 quantized LPC from autocorrelation (shift 12); None when
    the normal equations are degenerate."""
    xf = x.astype(np.float64)
    if len(xf) < 16:
        return None
    r0 = float(xf @ xf)
    r1 = float(xf[1:] @ xf[:-1])
    r2 = float(xf[2:] @ xf[:-2])
    det = r0 * r0 - r1 * r1
    if det <= 1e-9 or r0 <= 0:
        return None
    a1 = (r1 * r0 - r1 * r2) / det
    a2 = (r2 * r0 - r1 * r1) / det
    q = [int(round(a1 * 4096)), int(round(a2 * 4096))]
    if any(c < -(1 << 14) or c >= (1 << 14) for c in q):
        return None
    return q, 12


def _encode_subframe(w: _BitWriter, x: np.ndarray, bps: int,
                     predictor: str) -> None:
    if np.all(x == x[0]):
        w.write(0, 1); w.write(0, 6); w.write(0, 1)   # CONSTANT
        w.write(int(x[0]) & ((1 << bps) - 1), bps)
        return
    if predictor == "lpc":
        q = _quant_lpc2(x)
        if q is not None:
            coefs, shift = q
            order = 2
            w.write(0, 1); w.write(0b100000 | (order - 1), 6); w.write(0, 1)
            for s in x[:order].tolist():
                w.write(int(s) & ((1 << bps) - 1), bps)
            w.write(15 - 1, 4)          # coef precision 15 bits
            w.write(shift, 5)
            for c in coefs:
                w.write(c & 0x7FFF, 15)
            xi = x.astype(np.int64)
            pred = (coefs[0] * xi[1:-1] + coefs[1] * xi[:-2]) >> shift
            _write_rice_block(w, xi[2:] - pred)
            return
    order = _best_fixed_order(x)
    w.write(0, 1); w.write(0b001000 | order, 6); w.write(0, 1)  # FIXED
    for s in x[:order].tolist():
        w.write(int(s) & ((1 << bps) - 1), bps)
    _write_rice_block(w, _fixed_residual(x, order))


def encode_flac(samples: np.ndarray, sample_rate: int,
                stereo_mode: str = "independent",
                predictor: str = "fixed") -> bytes:
    """16-bit PCM -> FLAC bytes.  ``samples``: int16 (n,) or (n, ch<=2).
    ``stereo_mode``: "independent" | "left_side" | "right_side" |
    "mid_side"; ``predictor``: "fixed" | "lpc" (order-2 quantized LPC
    where well-conditioned)."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    if ch > 2:
        raise ValueError("encoder supports mono/stereo")
    md5 = hashlib.md5(
        x.astype("<i2").tobytes(order="C")).digest()  # interleaved LE PCM

    # STREAMINFO
    si = _BitWriter()
    si.write(_BLOCK, 16); si.write(_BLOCK, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(sample_rate, 20); si.write(ch - 1, 3); si.write(16 - 1, 5)
    si.write(n, 36)
    si_bytes = si.tobytes() + md5
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(si_bytes).to_bytes(3, "big") + si_bytes

    for fi, lo in enumerate(range(0, n, _BLOCK)):
        blk = x[lo:lo + _BLOCK]
        bn = len(blk)
        chans = [blk[:, c] for c in range(ch)]
        bps = [16] * ch
        ca = ch - 1
        if ch == 2 and stereo_mode == "left_side":
            ca = 0b1000
            chans = [blk[:, 0], blk[:, 0] - blk[:, 1]]
            bps = [16, 17]  # side channel carries one extra bit
        elif ch == 2 and stereo_mode == "right_side":
            ca = 0b1001
            chans = [blk[:, 0] - blk[:, 1], blk[:, 1]]
            bps = [17, 16]
        elif ch == 2 and stereo_mode == "mid_side":
            ca = 0b1010
            chans = [(blk[:, 0] + blk[:, 1]) >> 1, blk[:, 0] - blk[:, 1]]
            bps = [16, 17]
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)                     # fixed blocking
        hdr.write(0, 1)
        if bn == _BLOCK:
            bs_code, bs_tail = 0b1100, None
        else:
            bs_code, bs_tail = 0b0111, bn - 1
        hdr.write(bs_code, 4)
        hdr.write(0, 4)                     # sample rate: from STREAMINFO
        hdr.write(ca, 4)
        hdr.write(0b100, 3)                 # 16-bit
        hdr.write(0, 1)
        hb = hdr.tobytes() + _utf8_code(fi)
        if bs_tail is not None:
            hb += struct.pack(">H", bs_tail)
        hb += bytes([_crc8(hb)])

        body = _BitWriter()
        for c, xs in enumerate(chans):
            _encode_subframe(body, xs, bps[c], predictor)
        frame = hb + body.tobytes()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

_BS_CODES = {1: 192, **{i: 576 << (i - 2) for i in range(2, 6)},
             **{i: 256 << (i - 8) for i in range(8, 16)}}
_SR_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
             7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_SS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _read_utf8(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    while b0 & (0x80 >> nbytes):
        nbytes += 1
    v = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        v = (v << 6) | (r.read(8) & 0x3F)
    return v


def _decode_subframe(r: _BitReader, bn: int, bps: int) -> np.ndarray:
    if r.read(1):
        raise ValueError("subframe sync bit set")
    ftype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
        bps -= wasted
    if ftype == 0:                       # CONSTANT
        v = r.read(bps)
        v = v - (1 << bps) if v >> (bps - 1) else v
        out = np.full(bn, v, dtype=np.int64)
    elif ftype == 1:                     # VERBATIM
        out = np.empty(bn, dtype=np.int64)
        for i in range(bn):
            v = r.read(bps)
            out[i] = v - (1 << bps) if v >> (bps - 1) else v
    elif 8 <= ftype <= 12:               # FIXED order 0-4
        order = ftype - 8
        warm = np.empty(order, dtype=np.int64)
        for i in range(order):
            v = r.read(bps)
            warm[i] = v - (1 << bps) if v >> (bps - 1) else v
        res = _read_residual(r, bn, order)
        out = _fixed_restore(res, warm, order)
    elif ftype >= 32:                    # LPC
        order = (ftype & 0x1F) + 1
        warm = np.empty(order, dtype=np.int64)
        for i in range(order):
            v = r.read(bps)
            warm[i] = v - (1 << bps) if v >> (bps - 1) else v
        prec = r.read(4) + 1
        shift = r.read(5)
        coefs = []
        for _ in range(order):
            c = r.read(prec)
            coefs.append(c - (1 << prec) if c >> (prec - 1) else c)
        res = _read_residual(r, bn, order)
        out = np.empty(bn, dtype=np.int64)
        out[:order] = warm
        ca = np.asarray(coefs, dtype=np.int64)
        for i in range(order, bn):
            out[i] = res[i - order] + int((out[i - order:i][::-1] @ ca) >> shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype}")
    return out << wasted


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> (int32 samples (n,) or (n, ch), sample_rate) with
    CRC-8/CRC-16 verification per frame and a final MD5 check."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while True:
        hdr = data[pos:pos + 4]
        last, btype = bool(hdr[0] & 0x80), hdr[0] & 0x7F
        blen = int.from_bytes(hdr[1:4], "big")
        if btype == 0:
            streaminfo = data[pos + 4:pos + 4 + blen]
        pos += 4 + blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("missing STREAMINFO")
    si = _BitReader(streaminfo)
    si.read(16); si.read(16); si.read(24); si.read(24)
    sr0 = si.read(20)
    ch0 = si.read(3) + 1
    bps0 = si.read(5) + 1
    total = si.read(36)
    md5_expected = streaminfo[18:34]

    chans_out: list[list[np.ndarray]] = [[] for _ in range(ch0)]
    got = 0
    while got < total and pos < len(data):
        fstart = pos
        r = _BitReader(data, pos)
        if r.read(14) != 0b11111111111110:
            raise ValueError("bad frame sync")
        r.read(1)
        r.read(1)  # blocking strategy (frame layout identical either way)
        bs_code = r.read(4)
        sr_code = r.read(4)
        ca = r.read(4)
        ss_code = r.read(3)
        r.read(1)
        _read_utf8(r)
        if bs_code == 0b0110:
            bn = r.read(8) + 1
        elif bs_code == 0b0111:
            bn = r.read(16) + 1
        else:
            bn = _BS_CODES[bs_code]
        if sr_code == 0b1100:
            sr = r.read(8) * 1000
        elif sr_code == 0b1101:
            sr = r.read(16)
        elif sr_code == 0b1110:
            sr = r.read(16) * 10
        else:
            sr = sr0 if sr_code == 0 else _SR_CODES[sr_code]
        bps = bps0 if ss_code == 0 else _SS_CODES[ss_code]
        hdr_len = r.pos // 8 - fstart
        if _crc8(data[fstart:fstart + hdr_len]) != data[fstart + hdr_len]:
            raise ValueError("frame header CRC-8 mismatch")
        r.pos += 8  # past the CRC byte

        if ca <= 7:
            subs = [_decode_subframe(r, bn, bps) for _ in range(ca + 1)]
        elif ca == 8:    # left/side
            left = _decode_subframe(r, bn, bps)
            side = _decode_subframe(r, bn, bps + 1)
            subs = [left, left - side]
        elif ca == 9:    # right/side
            side = _decode_subframe(r, bn, bps + 1)
            right = _decode_subframe(r, bn, bps)
            subs = [right + side, right]
        elif ca == 10:   # mid/side
            mid = _decode_subframe(r, bn, bps)
            side = _decode_subframe(r, bn, bps + 1)
            left = (((mid << 1) | (side & 1)) + side) >> 1
            subs = [left, left - side]
        else:
            raise ValueError("reserved channel assignment")
        r.align()
        fend = r.pos // 8
        if struct.unpack(">H", data[fend:fend + 2])[0] != _crc16(data[fstart:fend]):
            raise ValueError("frame CRC-16 mismatch")
        pos = fend + 2
        for c, s in enumerate(subs):
            chans_out[c].append(s)
        got += bn

    cols = [np.concatenate(c) for c in chans_out]
    out = cols[0][:, None] if ch0 == 1 else np.stack(cols, axis=1)
    out = out[:total]
    if md5_expected != b"\x00" * 16 and bps0 == 16:
        if hashlib.md5(out.astype("<i2").tobytes(order="C")).digest() != md5_expected:
            raise ValueError("decoded PCM MD5 mismatch")
    return (out[:, 0] if ch0 == 1 else out).astype(np.int32), sr
