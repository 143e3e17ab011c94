"""Charset detection + transcoding for crawl payload bytes.

Real crawls ship a long tail of legacy encodings; the standard ingest
rule (what the WET toolchain and most corpus loaders do) is: accept bytes
that ARE valid UTF-8, otherwise fall back to Latin-1 — which never fails,
because every byte maps 1:1 to U+0000..U+00FF.

Both kernels are whole-corpus vectorized over the Arrow binary column's
flattened value buffer — no per-row Python:

- ``utf8_valid_mask``: the full RFC 3629 validation (continuation
  coverage, overlong forms, surrogate range, U+10FFFF cap, truncation at
  row boundaries) as shifted-array numpy masks + one segment-reduce.
- ``latin1_to_utf8``: byte-surgery expansion (each 0x80..0xFF byte
  becomes the 2-byte UTF-8 sequence 0xC2/0xC3 + low-6-bits) with
  recomputed offsets, returned as a zero-copy Arrow string array.
- ``decode_with_fallback``: per-row charset verdict + decoded text.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _flat(col: pa.Array | pa.ChunkedArray):
    """binary/large_binary column → (bytes uint8 array, int64 offsets)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.cast(pa.large_binary())
    buf_off = np.frombuffer(col.buffers()[1], dtype=np.int64,
                            count=len(col) + col.offset + 1)[col.offset:]
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    return data, buf_off


def utf8_valid_mask(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """True per row iff the row's bytes are valid UTF-8 (RFC 3629)."""
    data, off = _flat(col)
    n = len(off) - 1
    lo, hi = int(off[0]), int(off[-1])
    b = data[lo:hi]
    m = len(b)
    if m == 0:
        return np.ones(n, dtype=bool)
    # row id of every byte position (for boundary-truncation checks)
    row_of = np.zeros(m, dtype=np.int64)
    starts = (off[:-1] - lo).astype(np.int64)
    np.add.at(row_of, starts[starts < m], 1)
    row_of = np.cumsum(row_of) - 1

    ascii_ = b < 0x80
    cont = (b >= 0x80) & (b < 0xC0)
    lead2 = (b >= 0xC2) & (b < 0xE0)
    lead3 = (b >= 0xE0) & (b < 0xF0)
    lead4 = (b >= 0xF0) & (b < 0xF5)
    lead = lead2 | lead3 | lead4
    bad_byte = ~(ascii_ | cont | lead)          # C0, C1, F5..FF never valid

    def nxt(k: int):
        """byte k positions ahead, 0 past the end; same-row mask."""
        v = np.zeros(m, dtype=np.uint8)
        v[:m - k] = b[k:]
        same = np.zeros(m, dtype=bool)
        same[:m - k] = row_of[k:] == row_of[:m - k]
        return v, same

    b1, s1 = nxt(1)
    b2, s2 = nxt(2)
    b3, s3 = nxt(3)
    c1 = (b1 >= 0x80) & (b1 < 0xC0) & s1
    c2 = (b2 >= 0x80) & (b2 < 0xC0) & s2
    c3 = (b3 >= 0x80) & (b3 < 0xC0) & s3

    ok2 = lead2 & c1
    # E0: A0..BF (no overlong)   ED: 80..9F (no surrogates)
    c1_3 = np.where(b == 0xE0, c1 & (b1 >= 0xA0),
                    np.where(b == 0xED, c1 & (b1 < 0xA0), c1))
    ok3 = lead3 & c1_3 & c2
    # F0: 90..BF (no overlong)   F4: 80..8F (cap U+10FFFF)
    c1_4 = np.where(b == 0xF0, c1 & (b1 >= 0x90),
                    np.where(b == 0xF4, c1 & (b1 < 0x90), c1))
    ok4 = lead4 & c1_4 & c2 & c3

    bad_lead = (lead2 & ~ok2) | (lead3 & ~ok3) | (lead4 & ~ok4)
    # every continuation byte must be CLAIMED by exactly one valid lead
    claimed = np.zeros(m + 3, dtype=bool)
    idx2 = np.flatnonzero(ok2)
    claimed[idx2 + 1] = True
    idx3 = np.flatnonzero(ok3)
    claimed[idx3 + 1] = True
    claimed[idx3 + 2] = True
    idx4 = np.flatnonzero(ok4)
    claimed[idx4 + 1] = True
    claimed[idx4 + 2] = True
    claimed[idx4 + 3] = True
    orphan_cont = cont & ~claimed[:m]

    bad = bad_byte | bad_lead | orphan_cont
    # reduce per row: a row is valid iff none of its bytes are bad
    bad_per_row = np.zeros(n, dtype=np.int64)
    np.add.at(bad_per_row, row_of[bad], 1)
    return bad_per_row == 0


def latin1_to_utf8(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Decode every row as Latin-1 → UTF-8 string array (byte surgery:
    0x00..0x7F copy through, 0x80..0xFF expand to two bytes)."""
    data, off = _flat(col)
    lo = int(off[0])
    b = data[lo:int(off[-1])]
    hi = b >= 0x80
    # output position of each input byte = index + (# hi bytes before it)
    extra = np.cumsum(hi.astype(np.int64))
    out_len = len(b) + (int(extra[-1]) if len(b) else 0)
    out = np.empty(out_len, dtype=np.uint8)
    pos = np.arange(len(b), dtype=np.int64) + np.r_[0, extra[:-1]]
    out[pos] = np.where(hi, 0xC0 | (b >> 6), b)
    hp = pos[hi]
    out[hp + 1] = 0x80 | (b[hi] & 0x3F)
    # new offsets: original offset + count of hi bytes before that offset
    rel = (off - lo).astype(np.int64)
    shift = np.r_[0, extra][rel]
    new_off = rel + shift
    return pa.Array.from_buffers(
        pa.large_string(), len(off) - 1,
        [None, pa.py_buffer(new_off.tobytes()), pa.py_buffer(out.tobytes())],
    ).cast(pa.string())


def decode_with_fallback(col: pa.Array | pa.ChunkedArray):
    """(charset string array, decoded text array): UTF-8 where valid,
    Latin-1 otherwise — the crawl-ingest fallback rule."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    valid = utf8_valid_mask(col)
    as_utf8 = col.cast(pa.large_binary()).filter(pa.array(valid)) \
        .cast(pa.large_string()).cast(pa.string())
    as_latin = latin1_to_utf8(col.filter(pa.array(~valid)))
    # stitch back in row order
    out = np.empty(len(col), dtype=object)
    out[np.flatnonzero(valid)] = as_utf8.to_numpy(zero_copy_only=False)
    out[np.flatnonzero(~valid)] = as_latin.to_numpy(zero_copy_only=False)
    charset = np.where(valid, "utf-8", "latin-1")
    return (pa.array(charset.astype(object), pa.string()),
            pa.array(out, pa.string()))
