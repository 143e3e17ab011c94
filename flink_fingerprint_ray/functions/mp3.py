"""Pure-numpy MPEG-1 Audio Layer III ("MP3", ISO/IEC 11172-3) subset
codec.

Implemented from the public spec structure — the parts that make Layer
III a different codec from Layer II:

- frame syntax: 32-bit header (layer = 01), 17-byte mono side info
  (main_data_begin, scfsi, per-granule part2_3_length / big_values /
  global_gain / scalefac_compress / table_select / region counts /
  preflag / scalefac_scale / count1table_select);
- the BIT RESERVOIR: main data is a byte stream logically detached from
  frame boundaries, located by ``main_data_begin`` back-pointers — the
  decoder assembles it exactly as the spec describes (our encoder
  always writes begin = 0, which is legal, so frames stay independent);
- scalefactors: slen1/slen2 from the 16-entry scalefac_compress table,
  11 + 10 long-block bands, SCFSI reuse between granules;
- spectrum coding: big_values PAIR codes with sign bits and 13-bit
  linbits escapes, the count1 QUADRUPLE region (table B: fixed 4-bit
  codes, the bitwise complement of (v,w,x,y)), and the implicit rzero
  tail; region0/region1 partitioning on scalefactor-band boundaries;
- requantization: xr = sign(ix)·|ix|^(4/3) · 2^((global_gain-210)/4)
  · 2^(-((1+scalefac_scale)/2)·(scf+preflag·pretab)), with the spec's
  pretab emphasis vector;
- alias reduction: the 8 butterfly coefficients ci = -0.6, -0.535,
  -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037 (cs = 1/√(1+ci²),
  ca = ci·cs) applied across every subband boundary (encoder applies
  the inverse rotation);
- the hybrid filterbank: 36-point IMDCT with the sine window
  (block_type 0), 50%-overlap-add per subband, FREQUENCY INVERSION of
  odd samples in odd subbands, then the same 32-band polyphase
  synthesis as Layer II (``mp2._synthesize``).

Honest scope notes (same contract as ``mp2.py``):

- The big-values Huffman TABLE is a deterministic canonically-
  constructed prefix code over (x, y) ∈ [0, 15]² (power-law weights),
  NOT the ISO Table B.7 code lengths — those are normative data that
  cannot be derived.  Encoder and decoder share the construction, so
  streams are self-consistent; swap ``_bv_table()`` for the ISO
  lengths to make the bitstream interop-exact.  The count1 table IS
  the spec's table B (4-bit complement codes).
- The 48 kHz long-block scalefactor-band boundary table is a
  reconstructed layout (monotone, 4-line-aligned low bands, ends at
  576); it only shapes region partitioning and scalefactor application
  and is shared by both sides.
- One operating point: 48 kHz mono 320 kbps, long blocks only
  (window_switching = 0); the decoder refuses short/mixed blocks
  rather than mis-decoding them.
- The polyphase prototype is ``mp2._prototype()``'s analytic NPR
  design (~50 dB aliasing floor), not the bit-exact ISO Table 3-C.1.

Reference parity note: the reference pipeline has no audio codecs at
all; this extends the beyond-reference multimodal layer
(``stages/media.py`` ``LibraryDecoder`` dispatch).
"""

from __future__ import annotations

import heapq

import numpy as np

from .flac import _BitReader, _BitWriter
from .mp2 import DELAY as _POLY_DELAY
from .mp2 import _analyze, _pack_codes, _synthesize

SAMPLE_RATE = 48_000
BITRATE_KBPS = 320
FRAME_SAMPLES = 1152              # 2 granules x 18 steps x 32 subbands
GRANULE_STEPS = 18
FRAME_BYTES = 144 * BITRATE_KBPS * 1000 // SAMPLE_RATE   # 960, no padding
SIDE_INFO_BYTES = 17              # mono, MPEG-1
# polyphase delay + one granule of MDCT overlap-add latency
TOTAL_DELAY = _POLY_DELAY + GRANULE_STEPS * 32

# Layer III bitrate table (kbps), index 1..14
_BITRATES_L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                256, 320)

# scalefac_compress -> (slen1, slen2)
_SLEN = ((0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
         (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3))

# preflag emphasis per long scalefactor band (spec pretab)
_PRETAB = np.array([0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
                    1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0], np.int64)

# reconstructed 48 kHz long-block scalefactor-band boundaries (see
# module docstring): 21 scalefactor bands + the above-highest region
SFB_LONG_48 = np.array(
    [0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106, 128,
     156, 190, 230, 276, 330, 384, 576], np.int64)

# alias-reduction butterflies (spec ci values)
_CI = np.array([-0.6, -0.535, -0.33, -0.185, -0.095, -0.041,
                -0.0142, -0.0037])
_CS = 1.0 / np.sqrt(1.0 + _CI * _CI)
_CA = _CI * _CS

_ESC = 15                          # big-values escape value
_LINBITS = 13                      # escape extension width


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------

_TBL_CACHE: dict = {}


def _bv_table() -> dict:
    """Canonical big-values pair code over (x, y) in [0, 15]^2.

    Deterministic construction (heap Huffman over power-law weights,
    canonical assignment by (length, symbol)); both encoder and decoder
    call this, so the code is shared.  Returns dict with ``len[256]``,
    ``code[256]`` (MSB-first) and ``dec`` = {(length, code): symbol}.
    """
    got = _TBL_CACHE.get("bv")
    if got is not None:
        return got
    # power-law weights: small (x, y) pairs dominate quantized spectra
    w = [(1.0 / (((x + 1) * (y + 1)) ** 1.8), x * 16 + y)
         for x in range(16) for y in range(16)]
    lengths = np.zeros(256, np.int64)
    heap = [(wt, sym, [sym]) for wt, sym in w]
    heapq.heapify(heap)
    while len(heap) > 1:
        w1, t1, s1 = heapq.heappop(heap)
        w2, t2, s2 = heapq.heappop(heap)
        for s in s1:
            lengths[s] += 1
        for s in s2:
            lengths[s] += 1
        heapq.heappush(heap, (w1 + w2, min(t1, t2), s1 + s2))
    order = sorted(range(256), key=lambda s: (lengths[s], s))
    codes = np.zeros(256, np.int64)
    c, prev = 0, 0
    for s in order:
        c <<= (lengths[s] - prev)
        codes[s] = c
        c += 1
        prev = int(lengths[s])
    dec = {(int(lengths[s]), int(codes[s])): s for s in range(256)}
    got = {"len": lengths, "code": codes, "dec": dec,
           "maxlen": int(lengths.max())}
    _TBL_CACHE["bv"] = got
    return got


# count1 table B (count1table_select = 1): 4-bit codes, the bitwise
# complement of the (v, w, x, y) quadruple — this one IS the spec table.
def _count1_code(v: int, w: int, x: int, y: int) -> int:
    return 15 - (v * 8 + w * 4 + x * 2 + y)


# ---------------------------------------------------------------------------
# hybrid filterbank pieces
# ---------------------------------------------------------------------------

_MDCT_CACHE: dict = {}


def _mdct_mats() -> tuple[np.ndarray, np.ndarray]:
    """(forward 36->18, inverse 18->36) windowed MDCT matrices with the
    block_type-0 sine window; scaled for perfect TDAC reconstruction."""
    got = _MDCT_CACHE.get("m")
    if got is not None:
        return got
    n, k = np.arange(36), np.arange(18)
    win = np.sin(np.pi / 36 * (n + 0.5))
    cosm = np.cos(np.pi / 72 * (2 * n[None, :] + 1 + 18)
                  * (2 * k[:, None] + 1))           # (18, 36)
    fwd = cosm * win[None, :]                        # X = fwd @ z
    inv = (cosm * win[None, :]).T * (4.0 / 36.0)     # z' = inv @ X
    _MDCT_CACHE["m"] = (fwd, inv)
    return fwd, inv


def _alias(lines: np.ndarray, inverse: bool) -> np.ndarray:
    """Alias-reduction butterflies across all 31 subband boundaries,
    vectorized over boundaries; ``inverse=True`` is the encoder side."""
    out = lines.copy()
    sb = np.arange(1, 32)
    for i in range(8):
        lo = 18 * sb - 1 - i
        hi = 18 * sb + i
        a, b = out[lo], out[hi]
        if inverse:
            out[lo] = a * _CS[i] + b * _CA[i]
            out[hi] = b * _CS[i] - a * _CA[i]
        else:
            out[lo] = a * _CS[i] - b * _CA[i]
            out[hi] = b * _CS[i] + a * _CA[i]
    return out


_INV_PATTERN = ((np.arange(GRANULE_STEPS)[:, None] % 2 == 1)
                & (np.arange(32)[None, :] % 2 == 1))


def _granules_to_lines(S: np.ndarray) -> np.ndarray:
    """Subband samples (n_gr*18, 32) -> frequency lines (n_gr, 576):
    frequency inversion, windowed MDCT with one-granule overlap, inverse
    alias reduction (encoder analysis side)."""
    fwd, _ = _mdct_mats()
    n_gr = S.shape[0] // GRANULE_STEPS
    g = S.reshape(n_gr, GRANULE_STEPS, 32).copy()
    g[:, _INV_PATTERN] *= -1.0
    prev = np.concatenate([np.zeros((1, GRANULE_STEPS, 32)), g[:-1]], axis=0)
    z = np.concatenate([prev, g], axis=1)            # (n_gr, 36, 32)
    X = np.einsum("kn,gns->gsk", fwd, z)             # (n_gr, 32, 18)
    lines = X.reshape(n_gr, 576)
    return np.stack([_alias(lines[i], inverse=True) for i in range(n_gr)])


def _lines_to_granules(lines: np.ndarray) -> np.ndarray:
    """Frequency lines (n_gr, 576) -> subband samples (n_gr*18, 32):
    alias reduction, IMDCT, overlap-add, frequency inversion (decoder
    synthesis side)."""
    _, inv = _mdct_mats()
    n_gr = lines.shape[0]
    X = np.stack([_alias(lines[i], inverse=False) for i in range(n_gr)])
    z = np.einsum("nk,gsk->gsn", inv, X.reshape(n_gr, 32, 18))  # (g,32,36)
    # TDAC: granule g's true samples = second half of IMDCT(g) + first
    # half of IMDCT(g+1); we emit with one-granule latency (the 576
    # samples inside TOTAL_DELAY)
    shifted = np.zeros((n_gr, GRANULE_STEPS, 32))
    shifted[1:] = z[:-1, :, 18:].transpose(0, 2, 1)
    shifted += z[:, :, :18].transpose(0, 2, 1)
    shifted[:, _INV_PATTERN] *= -1.0
    return shifted.reshape(n_gr * GRANULE_STEPS, 32)


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def _quantize(xr: np.ndarray, gg: int) -> np.ndarray:
    step = 2.0 ** ((gg - 210) / 4.0)
    return np.round(np.abs(xr / step) ** 0.75).astype(np.int64)


def _partition(ix: np.ndarray) -> tuple[int, int]:
    """(big_values, count1) split of one granule's 576 |ix| lines:
    big-values pairs, then count1 quadruples (all <= 1), then rzero."""
    nz = np.flatnonzero(ix)
    if len(nz) == 0:
        return 0, 0
    last = int(nz[-1]) + 1
    big2 = np.flatnonzero(ix > 1)
    bv_end = int(big2[-1]) + 1 if len(big2) else 0
    bv_end += bv_end % 2                             # pair-align
    n4 = -(-(last - bv_end) // 4)                    # ceil quadruples
    if bv_end + 4 * n4 > 576:
        n4 = (576 - bv_end) // 4
        bv_end = 576 - 4 * n4
        bv_end += bv_end % 2
        n4 = (576 - bv_end) // 4
    return bv_end // 2, n4


def _granule_bits(ix: np.ndarray, bv: int, n4: int) -> int:
    """Exact Huffman bit cost of one granule (no scalefactor bits)."""
    t = _bv_table()
    total = 0
    if bv:
        pairs = ix[:2 * bv].reshape(-1, 2)
        cx = np.minimum(pairs[:, 0], _ESC)
        cy = np.minimum(pairs[:, 1], _ESC)
        total += int(t["len"][cx * 16 + cy].sum())
        total += int((pairs[:, 0] >= _ESC).sum()
                     + (pairs[:, 1] >= _ESC).sum()) * _LINBITS
        total += int((pairs[:, 0] != 0).sum() + (pairs[:, 1] != 0).sum())
    if n4:
        quads = ix[2 * bv:2 * bv + 4 * n4].reshape(-1, 4)
        total += 4 * n4 + int((quads != 0).sum())
    return total


def _emit_granule(bw: _BitWriter, ix: np.ndarray, sign: np.ndarray,
                  bv: int, n4: int) -> None:
    """Vectorized granule emission: every field of every code becomes
    one (value, width) slot — Huffman code, optional linbits, optional
    sign — and ``mp2._pack_codes`` packs the whole granule in one
    arbitrary-width numpy pass (width-0 slots vanish in np.repeat)."""
    t = _bv_table()
    lens, codes = t["len"], t["code"]
    if bv:
        pairs = ix[:2 * bv].reshape(-1, 2)
        sg = sign[:2 * bv].reshape(-1, 2)
        cx = np.minimum(pairs[:, 0], _ESC)
        cy = np.minimum(pairs[:, 1], _ESC)
        sym = cx * 16 + cy
        vals = np.column_stack([
            codes[sym], pairs[:, 0] - _ESC, sg[:, 0],
            pairs[:, 1] - _ESC, sg[:, 1]]).reshape(-1)
        widths = np.column_stack([
            lens[sym],
            np.where(pairs[:, 0] >= _ESC, _LINBITS, 0),
            (pairs[:, 0] != 0).astype(np.int64),
            np.where(pairs[:, 1] >= _ESC, _LINBITS, 0),
            (pairs[:, 1] != 0).astype(np.int64)]).reshape(-1)
        _pack_codes(bw, np.maximum(vals, 0), widths)
    if n4:
        quads = ix[2 * bv:2 * bv + 4 * n4].reshape(-1, 4)
        sq = sign[2 * bv:2 * bv + 4 * n4].reshape(-1, 4)
        ccode = 15 - quads @ np.array([8, 4, 2, 1], np.int64)
        vals = np.column_stack([ccode, sq]).reshape(-1)
        widths = np.column_stack([
            np.full(n4, 4, np.int64),
            (quads != 0).astype(np.int64)]).reshape(-1)
        _pack_codes(bw, vals, widths)


def encode_mp3(pcm: np.ndarray, sample_rate: int = SAMPLE_RATE,
               uniform_scf: int = 0) -> bytes:
    """Encode float PCM in [-1, 1) (or int16) to MPEG-1 Layer III mono
    frames at 320 kbps, long blocks, main_data_begin = 0.  Input is
    padded by the hybrid-filterbank delay so ``decode_mp3`` recovers
    every input sample.

    ``uniform_scf`` (0..3) writes that scalefactor in every long band
    (scalefac_compress = 10, SCFSI = all-reuse so granule 1 sends none);
    the quantizer divides out the decoder's per-line scalefactor gain,
    so the decoded signal is equivalent while the scalefactor and SCFSI
    syntax paths are genuinely exercised on the wire."""
    if sample_rate != SAMPLE_RATE:
        raise ValueError(f"encoder operating point is {SAMPLE_RATE} Hz")
    x = np.asarray(pcm)
    if x.dtype == np.int16:
        x = x.astype(np.float64) / 32768.0
    x = x.astype(np.float64)
    n_orig = len(x)
    pad = (-(n_orig + TOTAL_DELAY)) % FRAME_SAMPLES
    x = np.concatenate([x, np.zeros(TOTAL_DELAY + pad)])

    S = _analyze(x)                                   # (steps, 32)
    n_gr = S.shape[0] // GRANULE_STEPS
    if n_gr % 2:                                      # whole frames only
        S = np.concatenate([S, np.zeros((GRANULE_STEPS, 32))])
        n_gr += 1
    lines = _granules_to_lines(S)                     # (n_gr, 576)

    if not 0 <= uniform_scf <= 3:
        raise ValueError("uniform_scf must be 0..3 (slen budget)")
    sfc = 10 if uniform_scf else 0                    # slen (2, 3)
    slen1, slen2 = _SLEN[sfc]
    part2_g0 = 11 * slen1 + 10 * slen2               # granule-0 scf bits

    # per-granule Huffman budget: half the main-data bits, minus the
    # granule-0 scalefactor cost (charged to both for simplicity),
    # capped by the 12-bit part2_3_length field
    budget = (FRAME_BYTES - 4 - SIDE_INFO_BYTES) * 8 // 2 - part2_g0
    budget = min(budget, 4095 - part2_g0)
    out = bytearray()
    for fr in range(n_gr // 2):
        grans = []
        for g in range(2):
            xr = lines[2 * fr + g]
            if uniform_scf:
                # divide out the decoder's per-line scalefactor gain
                # (bands 0..20 only — the above-highest region has none)
                xr = xr.copy()
                xr[:SFB_LONG_48[21]] /= 2.0 ** (-uniform_scf / 2.0)
            sign = (xr < 0).astype(np.int64)
            amax = float(np.abs(xr).max())
            if amax == 0.0:
                gg = 210
            else:
                # smallest gg keeping peak |ix| within the escape range
                gg = 210 + int(np.ceil(4 * np.log2(amax / (4000.0 ** (4 / 3)))))
                gg = max(0, min(255, gg))
            while True:
                ix = _quantize(xr, gg)
                ix = np.minimum(ix, _ESC + (1 << _LINBITS) - 1)
                bv, n4 = _partition(ix)
                nbits = _granule_bits(ix, bv, n4)
                if nbits <= budget or gg >= 255:
                    break
                gg = min(255, gg + 2)
            bw = _BitWriter()
            if uniform_scf and g == 0:                # SCFSI: gr 1 reuses
                _pack = np.full(11, uniform_scf, np.int64)
                for v in _pack:
                    bw.write(int(v), slen1)
                for _sfb in range(10):
                    bw.write(uniform_scf, slen2)
            _emit_granule(bw, ix, sign, bv, n4)
            data_bits = np.concatenate([c for c in bw.chunks]) \
                if bw.chunks else np.zeros(0, np.uint8)
            grans.append({"gg": gg, "bv": bv, "bits": data_bits,
                          "p23": int(len(data_bits))})

        fbw = _BitWriter()
        # header: sync / MPEG-1 / LAYER III / no CRC / 320 / 48k / mono
        fbw.write(0xFFF, 12)
        fbw.write(1, 1)               # ID: MPEG-1
        fbw.write(0b01, 2)            # layer III
        fbw.write(1, 1)               # protection_bit: no CRC
        fbw.write(14, 4)              # bitrate index: 320 kbps
        fbw.write(0b01, 2)            # 48 kHz
        fbw.write(0, 1)               # padding (48k frames are exact)
        fbw.write(0, 1)               # private
        fbw.write(0b11, 2)            # single_channel
        fbw.write(0, 2)               # mode_extension
        fbw.write(0, 4)               # copyright/original/emphasis
        # side info (mono, 136 bits)
        fbw.write(0, 9)               # main_data_begin = 0 (no reservoir)
        fbw.write(0, 5)               # private_bits
        fbw.write(0b1111 if uniform_scf else 0, 4)   # scfsi
        for g in grans:
            fbw.write(g["p23"], 12)   # part2_3_length (scf + huffman)
            fbw.write(g["bv"], 9)
            fbw.write(g["gg"], 8)
            fbw.write(sfc, 4)         # scalefac_compress
            fbw.write(0, 1)           # window_switching_flag: long
            for _ in range(3):
                fbw.write(1, 5)       # table_select: the shared pair code
            fbw.write(7, 4)           # region0_count
            fbw.write(7, 3)           # region1_count
            fbw.write(0, 1)           # preflag
            fbw.write(0, 1)           # scalefac_scale
            fbw.write(1, 1)           # count1table_select: table B
        for g in grans:
            fbw.write_array(g["bits"])
        frame = fbw.tobytes()
        if len(frame) > FRAME_BYTES:
            raise AssertionError("granule rate loop overflowed the frame")
        out += frame + b"\x00" * (FRAME_BYTES - len(frame))
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def decode_mp3(data: bytes) -> tuple[np.ndarray, int]:
    """Decode Layer III mono frames -> (float PCM aligned to the encoder
    input, sample_rate).  Implements the general main-data assembly
    (bit reservoir via main_data_begin), scalefactor syntax with SCFSI,
    both count1 tables' SYNTAX (codes from table B), preflag /
    scalefac_scale requantization, alias reduction and the hybrid
    IMDCT synthesis.  Long blocks only — short/mixed block_types raise."""
    t = _bv_table()
    dec, maxlen = t["dec"], t["maxlen"]
    pos, n = 0, len(data)
    # real web MP3s lead with an ID3v2 tag: "ID3" + ver(2) + flags(1)
    # + syncsafe 28-bit size; skip it (and any ID3v1 trailer) per the
    # public id3.org layout
    if data[:3] == b"ID3" and n >= 10:
        size = ((data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
                | (data[8] & 0x7F) << 7 | (data[9] & 0x7F))
        pos = 10 + size + (10 if data[5] & 0x10 else 0)   # footer flag
    if data[n - 128:n - 125] == b"TAG":
        n -= 128
    granules, md_buf = [], b""
    while pos + 4 <= n:
        b0, b1, b2, _b3 = data[pos:pos + 4]
        if b0 != 0xFF or (b1 & 0xF0) != 0xF0:
            raise ValueError("lost sync")
        if (b1 >> 3) & 1 != 1 or (b1 >> 1) & 0x3 != 0b01:
            raise ValueError("not MPEG-1 Layer III")
        bidx, srate_idx, padding = b2 >> 4, (b2 >> 2) & 3, (b2 >> 1) & 1
        if not 0 < bidx < 15:
            raise ValueError("bad bitrate index")
        if srate_idx != 0b01:
            raise ValueError("decoder operating point is 48 kHz")
        frame_bytes = 144 * _BITRATES_L3[bidx] * 1000 // SAMPLE_RATE + padding
        if pos + frame_bytes > n:
            break
        side = _BitReader(data[pos + 4:pos + 4 + SIDE_INFO_BYTES])
        main_begin = side.read(9)
        side.read(5)
        scfsi = [side.read(1) for _ in range(4)]
        gr_info = []
        for _g in range(2):
            gi = {
                "p23": side.read(12), "bv": side.read(9),
                "gg": side.read(8), "sfc": side.read(4),
                "wsf": side.read(1),
            }
            if gi["wsf"]:
                raise ValueError("short/mixed blocks not in this subset")
            gi["tables"] = [side.read(5) for _ in range(3)]
            gi["r0"], gi["r1"] = side.read(4), side.read(3)
            gi["pre"], gi["sfs"] = side.read(1), side.read(1)
            gi["c1t"] = side.read(1)
            gr_info.append(gi)
        start_bit = (len(md_buf) - main_begin) * 8
        if start_bit < 0:
            raise ValueError("main_data_begin points before stream start")
        md_buf += data[pos + 4 + SIDE_INFO_BYTES:pos + frame_bytes]
        granules.append((gr_info, scfsi, start_bit))
        pos += frame_bytes
    if not granules:
        raise ValueError("no MPEG frames found")

    md = _BitReader(md_buf)
    # list-backed bit access for the sequential Huffman walk (the same
    # idiom the VP8L decoder uses: Python list indexing beats per-bit
    # numpy slicing ~10x in this inherently serial loop)
    bits = md.bits.tolist()
    sfb_of = np.minimum(
        np.searchsorted(SFB_LONG_48, np.arange(576), side="right") - 1, 21)
    all_lines = []
    prev_scf = np.zeros(21, np.int64)
    for gr_info, scfsi, start_bit in granules:
        md.pos = start_bit
        for g, gi in enumerate(gr_info):
            p23_end = md.pos + gi["p23"]
            slen1, slen2 = _SLEN[gi["sfc"]]
            scf = np.zeros(21, np.int64)
            groups = ((0, 6, slen1), (6, 11, slen1),
                      (11, 16, slen2), (16, 21, slen2))
            for bi, (lo, hi, sl) in enumerate(groups):
                if g == 1 and scfsi[bi]:
                    scf[lo:hi] = prev_scf[lo:hi]
                elif sl:
                    for sfb in range(lo, hi):
                        scf[sfb] = md.read(sl)
            prev_scf = scf

            ix = np.zeros(576, np.int64)
            line, p = 0, md.pos
            for _pair in range(gi["bv"]):
                # canonical prefix walk (<= maxlen bits)
                code, ln = 0, 0
                while True:
                    code = (code << 1) | bits[p]
                    p += 1
                    ln += 1
                    sym = dec.get((ln, code))
                    if sym is not None:
                        break
                    if ln > maxlen:
                        raise ValueError("bad big-values code")
                x, y = sym >> 4, sym & 15
                if x == _ESC:
                    for _ in range(_LINBITS):
                        x = (x << 1) | bits[p]
                        p += 1
                    x -= (_ESC << _LINBITS) - _ESC
                if x:
                    if bits[p]:
                        x = -x
                    p += 1
                if y == _ESC:
                    for _ in range(_LINBITS):
                        y = (y << 1) | bits[p]
                        p += 1
                    y -= (_ESC << _LINBITS) - _ESC
                if y:
                    if bits[p]:
                        y = -y
                    p += 1
                ix[line], ix[line + 1] = x, y
                line += 2
            while p < p23_end and line + 4 <= 576:
                if not gi["c1t"]:
                    raise ValueError("count1 table A not in this subset")
                quad = 15 - ((bits[p] << 3) | (bits[p + 1] << 2)
                             | (bits[p + 2] << 1) | bits[p + 3])
                p += 4                                # table B complement
                for j in range(4):
                    if (quad >> (3 - j)) & 1:
                        ix[line + j] = -1 if bits[p] else 1
                        p += 1
                line += 4
            md.pos = p23_end                          # skip stuffing

            # requantize
            scf_full = np.zeros(22, np.int64)
            scf_full[:21] = scf + gi["pre"] * _PRETAB[:21]
            gain = 2.0 ** ((gi["gg"] - 210) / 4.0)
            # scalefac_multiplier = (scalefac_scale + 1) / 2 per spec
            sf_exp = 2.0 ** (-(gi["sfs"] + 1.0) * 0.5 * scf_full[sfb_of])
            xr = (np.sign(ix) * np.abs(ix).astype(np.float64) ** (4.0 / 3.0)
                  * gain * sf_exp)
            all_lines.append(xr)

    lines = np.stack(all_lines)
    S = _lines_to_granules(lines)
    y = _synthesize(S)
    n_frames = len(granules)
    return (y[TOTAL_DELAY:TOTAL_DELAY + n_frames * FRAME_SAMPLES],
            SAMPLE_RATE)
