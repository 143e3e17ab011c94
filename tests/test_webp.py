"""WebP-lossless (VP8L) codec unit tests (functions/webp.py — pure-numpy
from the public WebP Lossless Bitstream Specification): bit-exact
losslessness across every transform combination (predictor,
subtract-green, color transform, palette bundling widths, color cache,
LZ77), compression on smooth images, container/signature integrity, the
documented proximity-distance subset boundary, and the LibraryDecoder
dispatch.  Pure-function tests: no Ray session needed."""
from __future__ import annotations

import numpy as np
import pytest

from flink_fingerprint_ray.functions.webp import decode_webp, encode_webp


def _img(h=29, w=31, ch=4, seed=3):
    return np.random.RandomState(seed).randint(0, 256, (h, w, ch), dtype=np.uint8)


def _rt(img, **kw):
    dec = decode_webp(encode_webp(img, **kw))
    want = img if img.shape[-1] == 4 else np.concatenate(
        [img, np.full(img.shape[:2] + (1,), 255, np.uint8)], axis=-1)
    assert dec.shape == want.shape
    assert np.array_equal(dec, want)


@pytest.mark.parametrize("kw", [
    {},                                         # predictor + subtract-green
    {"predictor": False},
    {"subtract_green": False},
    {"predictor": False, "subtract_green": False},
    {"color_transform": True},
    {"cache_bits": 0},
    {"lz77": False},
    {"cache_bits": 3, "tile_bits": 2},
])
def test_transform_combinations_lossless(kw):
    _rt(_img(), **kw)
    _rt(_img(ch=3, seed=5), **kw)


@pytest.mark.parametrize("ncol", [2, 3, 4, 9, 16, 17, 200])
def test_palette_bundling_widths_lossless(ncol):
    rng = np.random.RandomState(ncol)
    pal = rng.randint(0, 256, (ncol, 3), dtype=np.uint8)
    _rt(pal[rng.randint(0, ncol, (29, 31))], palette="always")


def test_edge_shapes_roundtrip():
    rng = np.random.RandomState(11)
    _rt(np.array([[[5, 6, 7, 8]]], np.uint8))                   # 1x1
    _rt(rng.randint(0, 256, (1, 100, 3), dtype=np.uint8))       # single row
    _rt(rng.randint(0, 256, (100, 1, 3), dtype=np.uint8))       # single col
    _rt(np.full((40, 40, 3), 17, np.uint8))                     # flat (runs)
    gray = rng.randint(0, 256, (15, 15), dtype=np.uint8)        # 2-D input
    dec = decode_webp(encode_webp(gray))
    assert np.array_equal(dec[..., 0], gray) and np.array_equal(dec[..., 1], gray)


def test_smooth_image_compresses():
    gx = np.linspace(0, 255, 64)[None, :]
    gy = np.linspace(0, 255, 48)[:, None]
    img = np.stack([np.broadcast_to(gx, (48, 64)), np.broadcast_to(gy, (48, 64)),
                    np.broadcast_to((gx + gy) / 2, (48, 64))], axis=2).astype(np.uint8)
    assert len(encode_webp(img)) < 0.6 * img.nbytes


def test_container_and_signature_integrity():
    enc = bytearray(encode_webp(_img()))
    with pytest.raises(ValueError):
        decode_webp(b"RIFF" + bytes(enc[4:8]) + b"WAVE" + bytes(enc[12:]))
    bad = bytearray(enc)
    bad[20] ^= 0xFF                     # VP8L signature byte (0x2f)
    with pytest.raises(ValueError):
        decode_webp(bytes(bad))
    with pytest.raises(ValueError):
        decode_webp(b"not webp at all!")
    with pytest.raises(NotImplementedError):
        # lossy VP8 chunk is the documented out-of-subset container
        decode_webp(b"RIFF\x10\x00\x00\x00WEBPVP8 \x04\x00\x00\x00\x00\x00\x00\x00")


def test_proximity_distances_are_documented_subset():
    """LZ77 distance codes <= 120 (the 2-D proximity remap) raise the
    documented NotImplementedError; our encoder always offsets by +120."""
    from flink_fingerprint_ray.functions.webp import (
        _BitReader,
        _prefix_decode,
        _prefix_encode,
    )

    # encoder side: every distance is emitted at value dist + 120
    code, ev, eb = _prefix_encode(1 + 120)
    bits = bytearray()

    class _W:                           # tiny LSB writer for the probe
        def __init__(self):
            self.v, self.n = 0, 0

        def put(self, val, nb):
            self.v |= val << self.n
            self.n += nb

    w = _W()
    w.put(ev, eb)
    bits = w.v.to_bytes(max(1, (w.n + 7) // 8), "little")
    assert _prefix_decode(code, _BitReader(bits)) == 121

    # prefix coding self-inverse across the whole useful range
    for v in (1, 2, 3, 4, 5, 7, 8, 9, 120, 121, 122, 4096, 65536):
        c, e, b = _prefix_encode(v)
        bw = _W()
        bw.put(e, b)
        raw = bw.v.to_bytes(max(1, (bw.n + 7) // 8), "little")
        assert _prefix_decode(c, _BitReader(raw)) == v


def test_library_decoder_dispatch():
    from flink_fingerprint_ray.stages.media import LibraryDecoder

    img = _img(ch=3, seed=9)
    dec = LibraryDecoder().decode_image(encode_webp(img), img.shape[1],
                                        img.shape[0])
    assert np.array_equal(dec[..., :3], img)


def test_fixture_payloads_decode():
    from flink_fingerprint_ray.stages.media import make_webp_media

    tbl = make_webp_media(12, seed=23)
    for payload in tbl["payload"].to_pylist():
        out = decode_webp(payload)
        assert out.ndim == 3 and out.shape[-1] == 4
