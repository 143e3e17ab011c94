"""Pure-python MJPEG-in-AVI video container (Microsoft RIFF/AVI spec).

The simplest REAL video format this sandbox can write and read from
spec: an AVI RIFF container whose ``movi`` chunks are independent
baseline-JPEG frames (``functions/jpeg.py``).  Frame extraction is pure
container parsing — the chunk index gives O(1) access to any frame — so
a frame-sampling stage decodes ONLY the frames it samples, which is the
whole point of MJPEG for data pipelines (no inter-frame state, unlike
H.264).

Reference-semantics citation: the reference repo has no media pipeline
(SURVEY.md §2.7 note) — multimodal columns are target-new per the
builder's brief; this completes the REAL-codec triple (image/audio/video).
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(listtype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", listtype + body)


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 10,
                     quality: int = 90) -> bytes:
    """uint8 RGB/gray frames (equal shapes) → MJPEG AVI bytes."""
    from .jpeg import encode_jpeg

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    movi_body = b"movi" + b"".join(_chunk(b"00dc", j) for j in jpegs)

    avih = struct.pack("<14I", 1_000_000 // fps, 0, 0, 0x10, len(frames),
                       0, 1, max(len(j) for j in jpegs), w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
            1, fps, 0, len(frames), max(len(j) for j in jpegs), 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))
    riff_body = b"AVI " + hdrl + _chunk(b"LIST", movi_body)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def avi_mjpeg_index(payload: bytes) -> list[tuple[int, int]]:
    """Parse the AVI container → [(offset, size)] of each JPEG frame.
    Container-only pass (no pixel decode): O(frames) byte scanning."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    frames: list[tuple[int, int]] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            fourcc = payload[pos:pos + 4]
            (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
            body_at = pos + 8
            if fourcc == b"LIST":
                walk(body_at + 4, body_at + size)
            elif fourcc in (b"00dc", b"00db"):
                frames.append((body_at, size))
            pos = body_at + size + (size & 1)

    walk(12, 12 + struct.unpack("<I", payload[4:8])[0] - 4)
    return frames


def decode_avi_frame(payload: bytes, frame_idx: int,
                     index: list[tuple[int, int]] | None = None) -> np.ndarray:
    """Decode ONE frame of an MJPEG AVI — container seek + JPEG decode of
    exactly that frame (the frame-sampling access pattern)."""
    from .jpeg import decode_jpeg

    idx = index if index is not None else avi_mjpeg_index(payload)
    if not 0 <= frame_idx < len(idx):
        raise IndexError(f"frame {frame_idx} of {len(idx)}")
    off, size = idx[frame_idx]
    return decode_jpeg(payload[off:off + size])
