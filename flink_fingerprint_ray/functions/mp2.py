"""Pure-numpy MPEG-1 Audio Layer II (ISO/IEC 11172-3) subset codec.

Everything here is implemented from the public spec structure: the
32-band polyphase filterbank (511-tap prototype, cosine modulation with
the standard +/-16 phase offsets), Layer II frame syntax (sync header,
per-subband bit allocation from the Table 3-B.2a layout, SCFSI,
6-bit scalefactors with the 2^(-i/3) ladder, granule-ordered samples
with 3/5/9-level GROUPED triplet codes), and the midtread/midrise
requantizers that the spec's C/D constant tables reduce to
algebraically (grouped classes: f=(2c-(v-1))/v; ungrouped v=2^k-1:
f=(2c+1-v)/v — expand Table 3-B.4's s''=C*(s'''+D) to verify).

Honest scope notes:

- The prototype window is an ANALYTIC near-perfect-reconstruction
  pseudo-QMF design (square-root-raised-cosine transition centered at
  pi/64, power-complementary, ~50 dB aliasing floor — measured in
  tests), NOT the bit-exact ISO Table 3-C.1 coefficients.  Our
  encoder/decoder pair is self-consistent; a certified decoder playing
  these frames would add a small windowing error on top of
  quantization noise.  Swap ``_prototype()`` for the ISO table to make
  it interop-exact.
- One operating point: 48 kHz mono, 192 kbps, no CRC — the Table
  3-B.2a branch.  The encoder's bit allocation is a fixed
  quality-decreasing-with-frequency vector (deterministic, always fits
  the 192 kbps frame); the decoder honours ANY allocation/SCFSI the
  syntax permits.

Reference parity note: the reference pipeline has no audio codecs at
all; this is part of the beyond-reference multimodal layer
(stages/media.py ``LibraryDecoder`` dispatch).
"""

from __future__ import annotations

import numpy as np

from .flac import _BitReader, _BitWriter

SAMPLE_RATE = 48_000
BITRATE_KBPS = 192
FRAME_SAMPLES = 1152          # Layer II: 32 subbands x 36 samples
SBLIMIT = 27                  # Table 3-B.2a subband limit
DELAY = 481                   # analysis+synthesis filterbank delay (samples)
_SYNTH_GAIN = 128.0           # measured passband gain of A->F round trip (=4M)

# scalefactor ladder, Table 3-B.1: sf[i] = 2 * 2^(-i/3), i = 0..62
SCALEFACTORS = 2.0 * np.exp2(-np.arange(63) / 3.0)

# Table 3-B.2a layout: per-subband allocation-index -> quantizer levels
# (index 0 = no bits). 65535 is the 16-bit escape class.
_B2A_LOW = (3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
            16383, 32767, 65535)                       # sb 0-2, nbal=4
_B2A_MID = (3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
            8191, 65535)                               # sb 3-10, nbal=4
_B2A_HIGH = (3, 5, 7, 9, 15, 31, 65535)                # sb 11-22, nbal=3
_B2A_TOP = (3, 5, 65535)                               # sb 23-26, nbal=2


def _band_table(sb: int) -> tuple[int, tuple]:
    """(nbal, levels-tuple) for subband ``sb`` under the B.2a layout."""
    if sb < 3:
        return 4, _B2A_LOW
    if sb < 11:
        return 4, _B2A_MID
    if sb < 23:
        return 3, _B2A_HIGH
    return 2, _B2A_TOP


# grouped classes: 3 samples share one code of the given width
_GROUPED_BITS = {3: 5, 5: 7, 9: 10}


def _code_bits(levels: int) -> int:
    """Bits per individual (ungrouped) code: ceil(log2(levels+1))."""
    return int(levels).bit_length()


# encoder's fixed allocation (levels per subband) — decreasing quality
# with frequency; sums to 3684 sample bits, inside the 192 kbps budget
# (header 32 + alloc 88 + scfsi 54 + scf 486 + samples 3684 = 4344 of 4608)
_ENC_LEVELS = [127] * 3 + [15] * 8 + [9] * 12 + [5] * 4


# ---------------------------------------------------------------------------
# polyphase filterbank
# ---------------------------------------------------------------------------

_FB_CACHE: dict = {}


def _prototype() -> np.ndarray:
    """511-tap-effective NPR prototype: frequency-sampled lowpass with a
    square-root-raised-cosine transition centred at pi/64 (power-
    complementary: |H(fc+d)|^2 + |H(fc-d)|^2 = 1), inverse-FFT'd and
    truncated to 512 linear-phase taps.  Measured round-trip aliasing
    floor ~50 dB (tests/test_mp2.py pins > 45 dB)."""
    N = 16384
    fc = 1.0 / 128.0
    w = 0.5 / 128.0
    f = np.fft.rfftfreq(N)
    H = np.zeros_like(f)
    H[f <= fc - w] = 1.0
    t = (f > fc - w) & (f < fc + w)
    H[t] = np.cos(np.pi / 4 * (1 + (f[t] - fc) / w))
    h = np.roll(np.fft.irfft(H), 256)[:512]
    return h


def _filterbank() -> tuple[np.ndarray, np.ndarray]:
    """(analysis A_rev (512x32), synthesis F (32x512)) matrices.

    A_rev is pre-reversed so analysis is one matmul over plain
    chronological windows: S[m] = window(t) @ A_rev with
    window = x[t-511 .. t]."""
    got = _FB_CACHE.get("fb")
    if got is not None:
        return got
    h = _prototype()
    n = np.arange(512)
    k = np.arange(32)[:, None]
    A = h[None, :] * np.cos((2 * k + 1) * (n[None, :] - 16) * np.pi / 64)
    F = h[None, :] * np.cos((2 * k + 1) * (n[None, :] + 16) * np.pi / 64)
    A_rev = A[:, ::-1].T.copy()           # (512, 32), chronological order
    F = F * _SYNTH_GAIN
    _FB_CACHE["fb"] = (A_rev, F)
    return A_rev, F


def _analyze(x: np.ndarray) -> np.ndarray:
    """x (n,) float -> subband samples (n//32, 32)."""
    A_rev, _ = _filterbank()
    pad = np.concatenate([np.zeros(512), x.astype(np.float64)])
    n_steps = len(x) // 32
    sw = np.lib.stride_tricks.sliding_window_view(pad, 512)
    idx = 32 * (np.arange(n_steps) + 1)
    return sw[idx] @ A_rev                # (n_steps, 32)


def _synthesize(S: np.ndarray) -> np.ndarray:
    """Subband samples (m, 32) -> PCM (32*m + 512,), overlap-add."""
    _, F = _filterbank()
    contrib = S @ F                       # (m, 512)
    m = S.shape[0]
    y = np.zeros(32 * m + 512)
    yv = y[:32 * (m + 15)].reshape(-1, 32)
    base = np.arange(m)
    for j in range(16):                   # 512 = 16 chunks of 32; for a
        # fixed chunk j the target rows base+j are all distinct, so a
        # fancy-index += is race-free
        yv[base + j] += contrib[:, 32 * j:32 * j + 32]
    return y


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def _pack_codes(bw: _BitWriter, codes: np.ndarray, widths: np.ndarray) -> None:
    """Vectorized arbitrary-width MSB-first packing of one frame's codes."""
    total = int(widths.sum())
    if not total:
        return
    intra = np.arange(total) - np.repeat(
        np.concatenate([[0], np.cumsum(widths[:-1])]), widths)
    shift = np.repeat(widths - 1, widths) - intra
    bits = (np.repeat(codes.astype(np.int64), widths) >> shift) & 1
    bw.write_array(bits.astype(np.uint8))


_LAYOUT_CACHE: dict = {}


def _frame_layout(levels: tuple) -> dict:
    """Granule-ordered code layout for one fixed allocation, cached per
    allocation tuple (Layer II interleaves codes as (granule, subband);
    grouped classes emit ONE code per triplet, others three).  Both the
    encoder emission and the decoder requantizer index through these
    arrays, so the per-frame work is numpy gathers, not Python loops."""
    got = _LAYOUT_CACHE.get(levels)
    if got is not None:
        return got
    sb_l, gr_l, lv_l, t_l, grp_l, w_l = [], [], [], [], [], []
    for gr in range(12):
        for sb, lv in enumerate(levels):
            if not lv:
                continue
            if lv in _GROUPED_BITS:
                sb_l.append(sb)
                gr_l.append(gr)
                lv_l.append(lv)
                t_l.append(0)
                grp_l.append(True)
                w_l.append(_GROUPED_BITS[lv])
            else:
                nb = _code_bits(lv)
                for t in range(3):
                    sb_l.append(sb)
                    gr_l.append(gr)
                    lv_l.append(lv)
                    t_l.append(t)
                    grp_l.append(False)
                    w_l.append(nb)
    lay = {
        "sb": np.array(sb_l, np.int64), "gr": np.array(gr_l, np.int64),
        "lv": np.array(lv_l, np.int64), "t": np.array(t_l, np.int64),
        "grp": np.array(grp_l, bool), "w": np.array(w_l, np.int64),
    }
    _LAYOUT_CACHE[levels] = lay
    return lay


def encode_mp2(pcm: np.ndarray, sample_rate: int = SAMPLE_RATE) -> bytes:
    """Encode float PCM in [-1, 1) (or int16) to MPEG-1 Layer II mono
    frames at 192 kbps.  Input is zero-padded by the filterbank delay so
    ``decode_mp2`` recovers every input sample."""
    if sample_rate != SAMPLE_RATE:
        raise ValueError(f"encoder operating point is {SAMPLE_RATE} Hz")
    x = np.asarray(pcm)
    if x.dtype == np.int16:
        x = x.astype(np.float64) / 32768.0
    x = x.astype(np.float64)
    n_orig = len(x)
    pad = (-(n_orig + DELAY)) % FRAME_SAMPLES
    x = np.concatenate([x, np.zeros(DELAY + pad)])

    S = _analyze(x)                               # (steps, 32)
    n_frames = S.shape[0] // 36

    levels = np.array(_ENC_LEVELS, dtype=np.int64)
    alloc_idx = [(_band_table(sb)[1].index(_ENC_LEVELS[sb]) + 1)
                 for sb in range(SBLIMIT)]
    grouped = np.array([_ENC_LEVELS[sb] in _GROUPED_BITS
                        for sb in range(SBLIMIT)])

    bw = _BitWriter()
    for fr in range(n_frames):
        sub = S[fr * 36:(fr + 1) * 36, :SBLIMIT]  # (36, sblimit)
        # header: sync/ID/layerII/no-CRC/192kbps/48k/mono (32 bits)
        bw.write(0xFFF, 12)   # syncword
        bw.write(1, 1)        # ID: MPEG-1
        bw.write(0b10, 2)     # layer II
        bw.write(1, 1)        # protection_bit: no CRC
        bw.write(10, 4)       # bitrate index: 192 kbps (Layer II table)
        bw.write(0b01, 2)     # 48 kHz
        bw.write(0, 1)        # padding (48k frames are exact)
        bw.write(0, 1)        # private
        bw.write(0b11, 2)     # single_channel
        bw.write(0, 2)        # mode_extension
        bw.write(0, 4)        # copyright/original/emphasis

        for sb in range(SBLIMIT):
            bw.write(alloc_idx[sb], _band_table(sb)[0])
        for _sb in range(SBLIMIT):
            bw.write(0, 2)    # scfsi=0: all three scalefactors follow

        # scalefactors: per (sb, group-of-12) smallest sf covering max|s|
        groups = sub.T.reshape(SBLIMIT, 3, 12)    # (sb, grp, 12)
        maxv = np.abs(groups).max(axis=2)         # (sb, 3)
        scf = (np.searchsorted(-SCALEFACTORS, -maxv, side="right") - 1)
        scf = np.clip(scf, 0, 62)
        _pack_codes(bw, scf.reshape(-1),
                    np.full(SBLIMIT * 3, 6, dtype=np.int64))

        # quantize: f = s/sf in [-1,1]; c = round((f*v + v-1)/2)
        f = groups / SCALEFACTORS[scf][:, :, None]
        v = levels[:, None, None]
        c = np.floor((f * v + v - 1) / 2 + 0.5).astype(np.int64)
        c = np.clip(c, 0, v - 1)                  # (sb, 3, 12)

        # granule-ordered emission via the cached layout: cgr[sb, gr, t]
        cgr = c.reshape(SBLIMIT, 12, 3)
        lay = _frame_layout(tuple(_ENC_LEVELS))
        grp, sb_a, gr_a, lv_a, t_a = (lay["grp"], lay["sb"], lay["gr"],
                                      lay["lv"], lay["t"])
        codes = np.empty(len(sb_a), dtype=np.int64)
        tri = cgr[sb_a[grp], gr_a[grp]]           # (n_grouped, 3)
        lvg = lv_a[grp]
        codes[grp] = tri[:, 0] + lvg * tri[:, 1] + lvg * lvg * tri[:, 2]
        ug = ~grp
        codes[ug] = cgr[sb_a[ug], gr_a[ug], t_a[ug]]
        _pack_codes(bw, codes, lay["w"])

        # zero-pad to the fixed frame size (slots = 144*bitrate/fs)
        frame_bits = 144 * BITRATE_KBPS * 1000 // SAMPLE_RATE * 8
        used = sum(len(ch) for ch in bw.chunks) % frame_bits
        if used:
            bw.write_array(np.zeros(frame_bits - used, dtype=np.uint8))
    return bw.tobytes()


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

_BITRATES_L2 = (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                256, 320, 384)


def decode_mp2(data: bytes) -> tuple[np.ndarray, int]:
    """Decode Layer II mono frames -> (float PCM aligned to the encoder
    input, sample_rate).  Honours any B.2a allocation and SCFSI 0-3."""
    br = _BitReader(data)
    total_bits = len(br.bits)
    frames = []
    while br.pos + 32 <= total_bits:
        if br.read(12) != 0xFFF:
            raise ValueError("lost sync")
        if br.read(1) != 1 or br.read(2) != 0b10:
            raise ValueError("not MPEG-1 Layer II")
        br.read(1)                                 # protection (no CRC)
        bidx = br.read(4)
        if not 0 < bidx < 15:
            raise ValueError("bad bitrate index")
        kbps = _BITRATES_L2[bidx]
        if br.read(2) != 0b01:
            raise ValueError("decoder operating point is 48 kHz")
        padding = br.read(1)
        br.read(1)
        if br.read(2) != 0b11:
            raise ValueError("decoder operating point is mono")
        br.read(6)
        frame_start = br.pos - 32
        frame_bits = (144 * kbps * 1000 // SAMPLE_RATE + padding) * 8

        nbal = [_band_table(sb)[0] for sb in range(SBLIMIT)]
        alloc = [br.read(nbal[sb]) for sb in range(SBLIMIT)]
        levels = [(_band_table(sb)[1][a - 1] if a else 0)
                  for sb, a in enumerate(alloc)]
        scfsi = [br.read(2) if levels[sb] else 0 for sb in range(SBLIMIT)]
        scf = np.zeros((SBLIMIT, 3), dtype=np.int64)
        for sb in range(SBLIMIT):
            if not levels[sb]:
                continue
            si = scfsi[sb]
            if si == 0:
                scf[sb] = [br.read(6), br.read(6), br.read(6)]
            elif si == 1:
                a, b = br.read(6), br.read(6)
                scf[sb] = [a, a, b]
            elif si == 2:
                a = br.read(6)
                scf[sb] = [a, a, a]
            else:
                a, b = br.read(6), br.read(6)
                scf[sb] = [a, b, b]

        # vectorized sample extraction through the cached layout
        lay = _frame_layout(tuple(levels))
        widths = lay["w"]
        total = int(widths.sum())
        seg = br.bits[br.pos:br.pos + total].astype(np.int64)
        br.pos += total
        offs = np.concatenate([[0], np.cumsum(widths[:-1])])
        intra = np.arange(total) - np.repeat(offs, widths)
        weights = seg << (np.repeat(widths - 1, widths) - intra)
        codes = (np.add.reduceat(weights, offs) if total
                 else np.empty(0, np.int64))

        sub = np.zeros((36, 32))
        sb_a, gr_a, lv_a, t_a, grp = (lay["sb"], lay["gr"], lay["lv"],
                                      lay["t"], lay["grp"])
        sf_a = SCALEFACTORS[scf[sb_a, gr_a // 4]]
        ug = ~grp
        if ug.any():
            lv = lv_a[ug]
            f = (2 * codes[ug] + 1 - lv) / lv      # midrise, v = 2^k - 1
            sub[3 * gr_a[ug] + t_a[ug], sb_a[ug]] = f * sf_a[ug]
        if grp.any():
            c, lv = codes[grp], lv_a[grp]
            for t in range(3):                     # midtread, grouped 3/5/9
                cc = c % lv
                c = c // lv
                f = (2 * cc - (lv - 1)) / lv
                sub[3 * gr_a[grp] + t, sb_a[grp]] = f * sf_a[grp]
        frames.append(sub)
        br.pos = frame_start + frame_bits      # skip frame zero-pad
    if not frames:
        raise ValueError("no MPEG frames found")
    S = np.concatenate(frames, axis=0)
    y = _synthesize(S)
    return y[DELAY:DELAY + len(frames) * FRAME_SAMPLES], SAMPLE_RATE
