"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

Decode support in this container:

- ``NetpbmDecoder`` — REAL decoding of netpbm P5/P6 images and PCM16
  RIFF/WAVE audio, pure numpy (these formats need no codec library), so
  the media path runs on genuine encoded bytes end-to-end;
- ``JpegDecoder`` — REAL baseline-JPEG decode (``functions/jpeg.py``,
  pure numpy/python T.81: Huffman + DCT + 4:4:4/4:2:0) — the compressed
  shape actual corpora ship;
- ``FakeDecoder`` — deterministic hash-derived pixels/samples for
  plumbing tests;
- ``LibraryDecoder`` — the compressed-codec dispatch: JPEG, PNG, GIF,
  WebP-lossless, MJPEG-AVI, MPEG-1 video, mu-law/ADPCM WAV, FLAC and
  MPEG-1 Layer II/III ("MP3") decode for REAL (pure-numpy from-spec
  codecs in ``functions/``); the remaining slots (Opus/H.264) raise
  ``NotImplementedError`` with the exact place a libav handle plugs in
  (loaded once per actor).

Usage (actor pool — decoder state built once per actor in __init__):

    ds.map_batches(ImageDecodeStage, concurrency=8, batch_size=32,
                   num_cpus=1, batch_format="pyarrow")

Large binary payloads ⇒ SMALL batch_size (a batch × concurrency must fit
the worker heap) and the binary column is dropped as soon as features are
extracted so it never enters a shuffle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),           # image | audio | video
        ("payload", pa.binary()),        # opaque encoded bytes
        ("width", pa.int32()),           # images/video
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),     # audio
        ("n_frames", pa.int32()),        # video
    ]
)


def make_fake_media(n: int, kind: str = "image", seed: int = 0) -> pa.Table:
    """Deterministic fixture: payload bytes derived from (seed, media_id)."""
    rng = np.random.RandomState(seed)
    payloads = [hashlib.sha256(f"{seed}:{kind}:{i}".encode()).digest() * 8 for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array([kind] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(rng.randint(16, 64, n).astype(np.int32)),
            "height": pa.array(rng.randint(16, 64, n).astype(np.int32)),
            "sample_rate": pa.array(np.full(n, 16000, np.int32)),
            "n_frames": pa.array(rng.randint(8, 32, n).astype(np.int32)),
        }
    )


class JpegDecoder:
    """REAL compressed-image decode with no external libraries: baseline
    JPEG (``functions/jpeg.py``, ITU-T T.81 — Huffman + DCT + 4:4:4/4:2:0)
    in pure numpy/python.  Entropy decoding is inherently sequential per
    image, which is exactly why this rides an ACTOR-POOL stage with small
    batches; DCT/dequant/color are batched numpy."""

    def decode_image(self, payload: bytes, width: int = 0, height: int = 0) -> np.ndarray:
        from ..functions.jpeg import decode_jpeg

        return decode_jpeg(payload)

    def decode_audio(self, payload: bytes, sample_rate: int) -> np.ndarray:
        raise NotImplementedError("JPEG decoder handles images only")


class PngDecoder:
    """REAL lossless compressed-image decode with no external libraries:
    baseline PNG (``functions/png.py``, RFC 2083 — stdlib-zlib DEFLATE +
    numpy unfiltering for all five scanline filters).  Lossless, so the
    check query pins EXACT pixel equality, not a loss budget."""

    def decode_image(self, payload: bytes, width: int = 0, height: int = 0) -> np.ndarray:
        from ..functions.png import decode_png

        return decode_png(payload)

    def decode_audio(self, payload: bytes, sample_rate: int) -> np.ndarray:
        raise NotImplementedError("PNG decoder handles images only")


class GifDecoder:
    """REAL lossless compressed-image decode with no external libraries:
    GIF87a/89a (``functions/gif.py``, CompuServe spec — variable-width
    LZW + palette/interlace/transparency).  Lossless over palette
    content, so check queries pin EXACT pixel equality; animated GIFs
    additionally expose the video-container API (frame count without
    entropy decode, disposal-composited frame seek)."""

    def decode_image(self, payload: bytes, width: int = 0, height: int = 0) -> np.ndarray:
        from ..functions.gif import decode_gif

        return decode_gif(payload)

    def decode_audio(self, payload: bytes, sample_rate: int) -> np.ndarray:
        raise NotImplementedError("GIF decoder handles images only")

    def n_video_frames(self, payload: bytes) -> int:
        from ..functions.gif import gif_n_frames

        return gif_n_frames(payload)

    def decode_video_frame(self, payload: bytes, frame_idx: int) -> np.ndarray:
        # GIF frames composite over prior canvas state, so sampling many
        # frames of ONE payload decodes the stream once and memoizes
        # (single-entry cache — the sampling stage walks payloads in
        # order, so this is bounded and hit-heavy)
        cache = getattr(self, "_frame_cache", None)
        key = hash(payload)
        if cache is None or cache[0] != key:
            from ..functions.gif import decode_gif_frames

            cache = (key, decode_gif_frames(payload))
            self._frame_cache = cache
        return cache[1][frame_idx]


class LibraryDecoder:
    """The compressed-codec dispatch slot.  JPEG, PNG, GIF and
    WebP-lossless decode for REAL (pure-numpy T.81 / RFC 2083 / GIF89a /
    VP8L codecs in ``functions/``); MPEG-1 Layer II audio via
    ``functions/mp2.py``; MPEG-1 Layer III ("MP3") audio via
    ``functions/mp3.py``; MPEG-1 video (I+P inter-frame coding with
    motion compensation) via ``functions/mpeg1.py``; uncompressed
    formats via ``NetpbmDecoder``.  The remaining formats (Opus/H.264)
    would hold a libav handle loaded once per actor in production —
    those libraries are not in this container."""

    def decode_image(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if payload[:2] == b"\xff\xd8":
            return JpegDecoder().decode_image(payload, width, height)
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return PngDecoder().decode_image(payload, width, height)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return self._gif().decode_image(payload, width, height)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
            # REAL lossless codec: pure-numpy VP8L (functions/webp.py —
            # transforms + color cache + LZ77 + canonical Huffman)
            from ..functions.webp import decode_webp

            return decode_webp(payload)
        raise NotImplementedError(
            "image codecs beyond JPEG/PNG/GIF/WebP-lossless require "
            "PIL/opencv — not available in this container; plug the codec "
            "in here (loaded once per actor)"
        )

    def _gif(self) -> "GifDecoder":
        # persistent instance so the animated-frame memo survives across
        # calls (the stage holds ONE LibraryDecoder per actor)
        inst = getattr(self, "_gif_decoder", None)
        if inst is None:
            inst = GifDecoder()
            self._gif_decoder = inst
        return inst

    def decode_audio(self, payload: bytes, sample_rate: int) -> np.ndarray:
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            # REAL compressed WAV: G.711 mu-law (tag 7) and IMA ADPCM
            # (tag 0x11) decode from spec; PCM16 passes through
            from ..functions.audio_codecs import decode_wav_compressed

            return decode_wav_compressed(payload)
        if payload[:4] == b"fLaC":
            # REAL lossless codec: pure-numpy FLAC (functions/flac.py,
            # RFC 9639) — CRC-8/16 + MD5 verified; stereo downmixes to
            # mono for the feature stage like the WAV paths
            from ..functions.flac import decode_flac

            pcm, _sr = decode_flac(payload)
            x = pcm.astype(np.float32) / 32768.0
            return x if x.ndim == 1 else x.mean(axis=1)
        if (len(payload) >= 4 and payload[0] == 0xFF
                and (payload[1] & 0xF0) == 0xF0
                and ((payload[1] >> 1) & 0x3) == 0b10):
            # REAL perceptual codec: pure-numpy MPEG-1 Audio Layer II
            # (functions/mp2.py — polyphase filterbank + Table 3-B.2a
            # frame syntax); returns float PCM aligned to encoder input
            from ..functions.mp2 import decode_mp2

            y, _sr = decode_mp2(payload)
            return y.astype(np.float32)
        if payload[:3] == b"ID3" or (
                len(payload) >= 4 and payload[0] == 0xFF
                and (payload[1] & 0xF0) == 0xF0
                and ((payload[1] >> 1) & 0x3) == 0b01):
            # REAL perceptual codec, the web's dominant one: pure-numpy
            # MPEG-1 Audio Layer III "MP3" (functions/mp3.py — bit
            # reservoir syntax, Huffman-coded spectrum, alias reduction,
            # hybrid IMDCT filterbank)
            from ..functions.mp3 import decode_mp3

            y, _sr = decode_mp3(payload)
            return y.astype(np.float32)
        raise NotImplementedError(
            "audio codecs beyond WAV(PCM16/mu-law/ADPCM)/FLAC/MP2/MP3 "
            "require libav/soundfile — not available in this container; "
            "plug the codec in here (loaded once per actor)")

    def n_video_frames(self, payload: bytes) -> int:
        if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
            return MjpegDecoder().n_video_frames(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return self._gif().n_video_frames(payload)
        if payload[:4] == b"\x00\x00\x01\xb3":
            # REAL inter-frame codec: pure-numpy MPEG-1 video
            # (functions/mpeg1.py, ISO 11172-2 I+P subset); frame count
            # is a picture-start-code scan, no entropy decode
            from ..functions.mpeg1 import mpeg1_n_frames

            return mpeg1_n_frames(payload)
        raise NotImplementedError(
            "video containers beyond MJPEG-AVI/GIF/MPEG-1 require libav")

    def decode_video_frame(self, payload: bytes, frame_idx: int) -> np.ndarray:
        if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
            return MjpegDecoder().decode_video_frame(payload, frame_idx)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return self._gif().decode_video_frame(payload, frame_idx)
        if payload[:4] == b"\x00\x00\x01\xb3":
            # GOP random access: decodes only from the nearest preceding
            # I picture — seek cost bounded by GOP size, not stream length
            from ..functions.mpeg1 import decode_mpeg1_frame

            return decode_mpeg1_frame(payload, frame_idx)
        raise NotImplementedError(
            "video containers beyond MJPEG-AVI/GIF/MPEG-1 require libav")


class MjpegDecoder:
    """REAL video decode with no external libraries: MJPEG-in-AVI
    (``functions/mjpeg.py``, RIFF/AVI container + the T.81 JPEG codec).
    Frame access is index-seek + single-frame JPEG decode, so a sampling
    stage pays ONLY for the frames it samples — the MJPEG property that
    makes it the right fixture for frame-sample pipelines."""

    def n_video_frames(self, payload: bytes) -> int:
        from ..functions.mjpeg import avi_mjpeg_index

        return len(avi_mjpeg_index(payload))

    def decode_video_frame(self, payload: bytes, frame_idx: int) -> np.ndarray:
        from ..functions.mjpeg import decode_avi_frame

        return decode_avi_frame(payload, frame_idx)

    def decode_image(self, payload: bytes, width: int = 0, height: int = 0) -> np.ndarray:
        return self.decode_video_frame(payload, 0)

    def decode_audio(self, payload: bytes, sample_rate: int) -> np.ndarray:
        raise NotImplementedError("MJPEG decoder handles video only")


class CompressedAudioDecoder:
    """REAL compressed-audio decode with no external libraries: G.711
    mu-law and IMA ADPCM WAV payloads (``functions/audio_codecs.py``).
    ADPCM is sample-sequential (predictor + step-index state) — the same
    actor-pool-with-small-batches shape as the JPEG entropy decoder."""

    def decode_audio(self, payload: bytes, sample_rate: int = 0) -> np.ndarray:
        from ..functions.audio_codecs import decode_wav_compressed

        return decode_wav_compressed(payload)

    def decode_image(self, payload: bytes, width: int = 0, height: int = 0) -> np.ndarray:
        raise NotImplementedError("audio decoder handles audio only")


# ---------------------------------------------------------------------------
# REAL decoders: netpbm images + PCM WAV audio, pure numpy
# ---------------------------------------------------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    """uint8 image → netpbm bytes: (h, w, 3) → P6, (h, w) → P5."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
    elif img.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError("expected (h, w, 3) RGB or (h, w) gray uint8")
    h, w = img.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """float [-1, 1] mono samples → minimal PCM16 RIFF/WAVE bytes."""
    import struct

    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = (pcm * 32767.0).round().astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    data = b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(data)) + b"WAVE" + data


def _pnm_header(payload: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse a P5/P6 header: (magic, width, height, maxval, data_offset);
    handles comments and arbitrary whitespace per the netpbm spec."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary netpbm payload: {magic!r}")
    fields, i, n = [], 2, len(payload)
    while len(fields) < 3 and i < n:
        c = payload[i:i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":  # comment to end of line
            while i < n and payload[i:i + 1] not in (b"\n", b"\r"):
                i += 1
        else:
            j = i
            while j < n and not payload[j:j + 1].isspace():
                j += 1
            fields.append(int(payload[i:j]))
            i = j
    i += 1  # single whitespace after maxval
    if len(fields) != 3:
        raise ValueError("truncated netpbm header")
    w, h, maxval = fields
    return magic, w, h, maxval, i


class NetpbmDecoder:
    """REAL image/audio decode with no external libraries: netpbm P6
    (RGB) / P5 (gray) images and PCM16 RIFF/WAVE audio are simple enough
    to parse with numpy alone, so the media pipeline is exercised with
    genuine encoded bytes in this container.  Compressed codecs plug
    into ``LibraryDecoder``."""

    def decode_image(self, payload: bytes, width: int = 0, height: int = 0) -> np.ndarray:
        magic, w, h, maxval, off = _pnm_header(payload)
        ch = 3 if magic == b"P6" else 1
        need = w * h * ch
        raw = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
        img = raw.reshape(h, w, ch) if ch == 3 else raw.reshape(h, w)
        if maxval != 255:
            img = (img.astype(np.float64) * (255.0 / maxval)).round().astype(np.uint8)
        return img if ch == 3 else np.repeat(img[:, :, None], 3, axis=2)

    def decode_audio(self, payload: bytes, sample_rate: int = 0) -> np.ndarray:
        import struct

        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE payload")
        i, n = 12, len(payload)
        n_channels, bits = 1, 16
        data = b""
        while i + 8 <= n:
            cid = payload[i:i + 4]
            (size,) = struct.unpack("<I", payload[i + 4:i + 8])
            body = payload[i + 8:i + 8 + size]
            if cid == b"fmt ":
                fmt_tag, n_channels, _rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
                if fmt_tag != 1 or bits != 16:
                    raise ValueError("only PCM16 WAV is decodable without libav")
            elif cid == b"data":
                data = body
            i += 8 + size + (size & 1)  # chunks are word-aligned
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        if n_channels > 1:
            x = x[: (len(x) // n_channels) * n_channels]
            x = x.reshape(-1, n_channels).mean(axis=1)
        return x


def make_real_media(n: int, kind: str = "image", seed: int = 0) -> pa.Table:
    """Fixture with GENUINE encoded payloads: seeded gradient+noise P6
    images, or seeded sine-mix PCM16 WAVs (0.25–1 s at 16 kHz)."""
    rng = np.random.RandomState(seed)
    widths = rng.randint(16, 64, n).astype(np.int32)
    heights = rng.randint(16, 64, n).astype(np.int32)
    rates = np.full(n, 16000, np.int32)
    payloads = []
    for i in range(n):
        if kind == "image":
            h, w = int(heights[i]), int(widths[i])
            gx = np.linspace(0, 255, w, dtype=np.float64)[None, :]
            gy = np.linspace(0, 255, h, dtype=np.float64)[:, None]
            img = np.stack([
                np.broadcast_to(gx, (h, w)),
                np.broadcast_to(gy, (h, w)),
                rng.randint(0, 256, (h, w)).astype(np.float64),
            ], axis=2).astype(np.uint8)
            payloads.append(encode_ppm(img))
        else:
            sr = int(rates[i])
            t = np.arange(int(sr * rng.uniform(0.25, 1.0))) / sr
            f1, f2 = rng.uniform(100, 2000, 2)
            payloads.append(encode_wav(
                0.5 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t), sr))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array([kind] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(widths),
            "height": pa.array(heights),
            "sample_rate": pa.array(rates),
            "n_frames": pa.array(rng.randint(8, 32, n).astype(np.int32)),
        }
    )


def make_jpeg_media(n: int, seed: int = 0, quality: int = 90) -> pa.Table:
    """Fixture with GENUINE baseline-JPEG payloads (the compressed shape
    real corpora ship): seeded gradient+texture images, a mix of 4:4:4,
    4:2:0 and grayscale encodings."""
    from ..functions.jpeg import encode_jpeg

    rng = np.random.RandomState(seed)
    widths = rng.randint(16, 64, n).astype(np.int32)
    heights = rng.randint(16, 64, n).astype(np.int32)
    payloads = []
    for i in range(n):
        h, w = int(heights[i]), int(widths[i])
        gx = np.linspace(0, 255, w)[None, :]
        gy = np.linspace(0, 255, h)[:, None]
        tex = 127.5 + 80.0 * np.sin(gx / (3.0 + i % 7)) * np.cos(gy / (2.0 + i % 5))
        if i % 4 == 3:  # grayscale
            img = np.clip(tex, 0, 255).astype(np.uint8)
        else:
            img = np.stack([
                np.broadcast_to(gx, (h, w)),
                np.broadcast_to(gy, (h, w)),
                np.clip(tex, 0, 255),
            ], axis=2).astype(np.uint8)
        payloads.append(encode_jpeg(img, quality=quality, subsample=i % 2 == 1))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(["image"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(widths),
            "height": pa.array(heights),
            "sample_rate": pa.array(np.full(n, 0, np.int32)),
            "n_frames": pa.array(np.full(n, 1, np.int32)),
        }
    )


def make_png_media(n: int, seed: int = 0) -> pa.Table:
    """Fixture with GENUINE baseline-PNG payloads: seeded gradient+texture
    images, a mix of grayscale / RGB / RGBA — lossless, so downstream
    checks can pin exact pixel equality.  The encoder cycles all five
    scanline filters across rows, so decoding exercises every unfilter
    path."""
    from ..functions.png import encode_png

    rng = np.random.RandomState(seed)
    widths = rng.randint(16, 64, n).astype(np.int32)
    heights = rng.randint(16, 64, n).astype(np.int32)
    payloads = []
    for i in range(n):
        h, w = int(heights[i]), int(widths[i])
        gx = np.linspace(0, 255, w)[None, :]
        gy = np.linspace(0, 255, h)[:, None]
        tex = 127.5 + 80.0 * np.sin(gx / (3.0 + i % 7)) * np.cos(gy / (2.0 + i % 5))
        noise = rng.randint(0, 24, (h, w)).astype(np.float64)
        base = np.clip(tex + noise, 0, 255)
        if i % 4 == 3:      # grayscale
            img = base.astype(np.uint8)
        elif i % 4 == 2:    # RGBA (alpha gradient)
            img = np.stack([np.broadcast_to(gx, (h, w)), np.broadcast_to(gy, (h, w)),
                            base, np.broadcast_to(255 - gx, (h, w))], axis=2).astype(np.uint8)
        else:               # RGB
            img = np.stack([np.broadcast_to(gx, (h, w)), np.broadcast_to(gy, (h, w)),
                            base], axis=2).astype(np.uint8)
        payloads.append(encode_png(img))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(["image"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(widths),
            "height": pa.array(heights),
            "sample_rate": pa.array(np.full(n, 0, np.int32)),
            "n_frames": pa.array(np.full(n, 1, np.int32)),
        }
    )


def make_webp_media(n: int, seed: int = 0) -> pa.Table:
    """Fixture with GENUINE WebP-lossless (VP8L) payloads: seeded
    gradient+texture images cycling the encoder's transform menu
    (predictor+subtract-green, color transform, palette with bundled
    1/2/4-bit indices) — lossless, so checks pin exact pixel equality."""
    from ..functions.webp import encode_webp

    rng = np.random.RandomState(seed)
    widths = rng.randint(16, 64, n).astype(np.int32)
    heights = rng.randint(16, 64, n).astype(np.int32)
    payloads = []
    for i in range(n):
        h, w = int(heights[i]), int(widths[i])
        gx = np.linspace(0, 255, w)[None, :]
        gy = np.linspace(0, 255, h)[:, None]
        tex = 127.5 + 80.0 * np.sin(gx / (3.0 + i % 7)) * np.cos(gy / (2.0 + i % 5))
        noise = rng.randint(0, 24, (h, w)).astype(np.float64)
        base = np.clip(tex + noise, 0, 255)
        if i % 4 == 3:      # small palette → color-indexing w/ bundling
            ncol = (2, 4, 13)[i % 3]
            pal = rng.randint(0, 256, (ncol, 3), dtype=np.uint8)
            img = pal[rng.randint(0, ncol, (h, w))]
            payloads.append(encode_webp(img, palette="always"))
        elif i % 4 == 2:    # RGBA through the fixed-delta color transform
            img = np.stack([np.broadcast_to(gx, (h, w)), np.broadcast_to(gy, (h, w)),
                            base, np.broadcast_to(255 - gx, (h, w))],
                           axis=2).astype(np.uint8)
            payloads.append(encode_webp(img, color_transform=True,
                                        palette="never"))
        else:               # RGB, predictor + subtract-green (the default)
            img = np.stack([np.broadcast_to(gx, (h, w)), np.broadcast_to(gy, (h, w)),
                            base], axis=2).astype(np.uint8)
            payloads.append(encode_webp(img, palette="never"))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(["image"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(widths),
            "height": pa.array(heights),
            "sample_rate": pa.array(np.full(n, 0, np.int32)),
            "n_frames": pa.array(np.full(n, 1, np.int32)),
        }
    )


def make_gif_media(n: int, seed: int = 0) -> pa.Table:
    """Fixture with GENUINE GIF89a payloads: seeded palette images (the
    format is inherently palettized) cycling plain / interlaced /
    transparent shapes — lossless, so downstream checks pin exact pixel
    equality against ``palette[indices]``."""
    from ..functions.gif import encode_gif

    rng = np.random.RandomState(seed)
    widths = rng.randint(16, 64, n).astype(np.int32)
    heights = rng.randint(16, 64, n).astype(np.int32)
    payloads = []
    for i in range(n):
        h, w = int(heights[i]), int(widths[i])
        ncol = int(rng.randint(4, 65))
        pal = rng.randint(0, 256, (ncol, 3)).astype(np.uint8)
        gx = np.linspace(0, ncol - 1, w)[None, :]
        gy = np.linspace(0, ncol - 1, h)[:, None]
        idx = ((gx + gy + rng.randint(0, 3, (h, w))) % ncol).astype(np.uint8)
        payloads.append(encode_gif(
            idx, pal,
            interlace=i % 3 == 1,
            transparent=(ncol - 1) if i % 3 == 2 else None))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(["image"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(widths),
            "height": pa.array(heights),
            "sample_rate": pa.array(np.full(n, 0, np.int32)),
            "n_frames": pa.array(np.full(n, 1, np.int32)),
        }
    )


def make_gif_anim_media(n: int, seed: int = 0) -> pa.Table:
    """Fixture with GENUINE animated-GIF payloads (this repo's second
    REAL video container after MJPEG-AVI): 6-20 full-canvas frames whose
    dominant palette entry carries green ≈ 12·frame_no, so a frame-sample
    stage's output identifies WHICH frame a seek decoded."""
    from ..functions.gif import encode_gif_animation

    rng = np.random.RandomState(seed)
    widths = rng.randint(16, 48, n).astype(np.int32)
    heights = rng.randint(16, 48, n).astype(np.int32)
    counts = rng.randint(6, 21, n).astype(np.int32)
    pal = np.stack([
        (np.arange(32) * 7 % 256),
        np.minimum(np.arange(32) * 12, 255),
        (255 - np.arange(32) * 9 % 256),
    ], axis=1).astype(np.uint8)
    payloads = []
    for i in range(n):
        h, w, nf = int(heights[i]), int(widths[i]), int(counts[i])
        frames = []
        for f in range(nf):
            idx = np.full((h, w), f % 21, np.uint8)
            # light texture: a seeded stripe of neighboring palette rows
            idx[:, :: 4] = (f % 21 + 1) % 21
            frames.append(idx)
        payloads.append(encode_gif_animation(frames, pal, delays_cs=[4] * nf))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(["video"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(widths),
            "height": pa.array(heights),
            "sample_rate": pa.array(np.full(n, 0, np.int32)),
            "n_frames": pa.array(counts),
        }
    )


def decode_any_image(payload: bytes) -> np.ndarray:
    """Signature-sniffing image decode across every REAL codec in this
    repo — JPEG (T.81), PNG (RFC 2083), netpbm P5/P6 — the dispatch the
    streaming media side-channel and its oracle share (same bytes, same
    kernel, exact float parity)."""
    if payload[:2] == b"\xff\xd8":
        from ..functions.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from ..functions.png import decode_png

        return decode_png(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from ..functions.gif import decode_gif

        return decode_gif(payload)
    return NetpbmDecoder().decode_image(payload)


def make_compressed_audio_media(n: int, seed: int = 0) -> pa.Table:
    """Fixture with GENUINE compressed-audio WAV payloads: seeded
    sine-mix clips encoded alternately as G.711 mu-law (2:1) and IMA
    ADPCM (4:1) — the compressed shapes real telephony/game corpora
    ship."""
    from ..functions.audio_codecs import encode_wav_adpcm, encode_wav_ulaw

    rng = np.random.RandomState(seed)
    rates = np.full(n, 16000, np.int32)
    payloads = []
    for i in range(n):
        sr = int(rates[i])
        t = np.arange(int(sr * rng.uniform(0.25, 1.0))) / sr
        f1, f2 = rng.uniform(100, 2000, 2)
        x = 0.5 * np.sin(2 * np.pi * f1 * t) + 0.25 * np.sin(2 * np.pi * f2 * t)
        # ADPCM fixture uses small blocks (spec-legal, the header field
        # declares it): block independence is what the codec vectorizes
        # across, so 129-sample blocks decode ~10x faster at a still-
        # in-budget quality cost (err 0.018 vs 0.006 at the 1017 default)
        payloads.append(encode_wav_ulaw(x, sr) if i % 2 == 0
                        else encode_wav_adpcm(x, sr, samples_per_block=129))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(["audio"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(np.full(n, 0, np.int32)),
            "height": pa.array(np.full(n, 0, np.int32)),
            "sample_rate": pa.array(rates),
            "n_frames": pa.array(np.full(n, 1, np.int32)),
        }
    )


def make_flac_media(n: int, seed: int = 0) -> pa.Table:
    """Fixture with GENUINE FLAC payloads: seeded sine-mix 16-bit clips,
    alternating FIXED / quantized-LPC predictors and mono / left-side
    stereo — the lossless shapes podcast/music corpora ship."""
    from ..functions.flac import encode_flac

    rng = np.random.RandomState(seed)
    sr = 16000
    payloads = []
    for i in range(n):
        t = np.arange(int(sr * rng.uniform(0.2, 0.5))) / sr
        f1, f2 = rng.uniform(100, 2000, 2)
        x = (0.5 * np.sin(2 * np.pi * f1 * t)
             + 0.25 * np.sin(2 * np.pi * f2 * t)
             + rng.normal(0, 0.002, len(t)))
        pcm = np.clip(x * 32767, -32768, 32767).astype(np.int16)
        pred = "lpc" if i % 2 else "fixed"
        if i % 3 == 0:
            st = np.stack([pcm, (pcm * 0.6).astype(np.int16)], axis=1)
            payloads.append(encode_flac(st, sr, stereo_mode="left_side",
                                        predictor=pred))
        else:
            payloads.append(encode_flac(pcm, sr, predictor=pred))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(["audio"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(np.full(n, 0, np.int32)),
            "height": pa.array(np.full(n, 0, np.int32)),
            "sample_rate": pa.array(np.full(n, sr, np.int32)),
            "n_frames": pa.array(np.full(n, 1, np.int32)),
        }
    )


def make_mp2_media(n: int, seed: int = 0) -> pa.Table:
    """Fixture with GENUINE MPEG-1 Layer II payloads: seeded tonal-mix
    clips at the codec's 48 kHz / 192 kbps mono operating point — the
    perceptual-codec shape broadcast/podcast corpora actually carry."""
    from ..functions.mp2 import SAMPLE_RATE, encode_mp2

    rng = np.random.RandomState(seed)
    sr = SAMPLE_RATE
    payloads = []
    for _i in range(n):
        t = np.arange(int(sr * rng.uniform(0.1, 0.3))) / sr
        f1, f2, f3 = rng.uniform(80, 8000, 3)
        x = (0.5 * np.sin(2 * np.pi * f1 * t)
             + 0.25 * np.sin(2 * np.pi * f2 * t)
             + 0.1 * np.sin(2 * np.pi * f3 * t)
             + rng.normal(0, 0.005, len(t)))
        payloads.append(encode_mp2(np.clip(x, -0.99, 0.99)))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(["audio"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(np.full(n, 0, np.int32)),
            "height": pa.array(np.full(n, 0, np.int32)),
            "sample_rate": pa.array(np.full(n, sr, np.int32)),
            "n_frames": pa.array(np.full(n, 1, np.int32)),
        }
    )


def make_mp3_media(n: int, seed: int = 0) -> pa.Table:
    """Fixture with GENUINE MPEG-1 Layer III ("MP3") payloads: seeded
    tonal-mix clips at the codec's 48 kHz / 320 kbps mono operating
    point, alternating plain and scalefactor+SCFSI-bearing frames — the
    perceptual-codec shape web audio corpora overwhelmingly carry."""
    from ..functions.mp3 import SAMPLE_RATE, encode_mp3

    rng = np.random.RandomState(seed)
    sr = SAMPLE_RATE
    payloads = []
    for i in range(n):
        t = np.arange(int(sr * rng.uniform(0.1, 0.3))) / sr
        f1, f2, f3 = rng.uniform(80, 8000, 3)
        x = (0.5 * np.sin(2 * np.pi * f1 * t)
             + 0.25 * np.sin(2 * np.pi * f2 * t)
             + 0.1 * np.sin(2 * np.pi * f3 * t)
             + rng.normal(0, 0.005, len(t)))
        payloads.append(encode_mp3(np.clip(x, -0.99, 0.99),
                                   uniform_scf=(i % 3 == 0) * 2))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(["audio"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(np.full(n, 0, np.int32)),
            "height": pa.array(np.full(n, 0, np.int32)),
            "sample_rate": pa.array(np.full(n, sr, np.int32)),
            "n_frames": pa.array(np.full(n, 1, np.int32)),
        }
    )


def make_mjpeg_media(n: int, seed: int = 0, fps: int = 10) -> pa.Table:
    """Fixture with GENUINE MJPEG-AVI video payloads: seeded gradient
    clips whose green channel encodes the frame number, 6-20 frames
    each — so a frame-sample stage's output is checkable per frame."""
    from ..functions.mjpeg import encode_avi_mjpeg

    rng = np.random.RandomState(seed)
    widths = rng.randint(16, 48, n).astype(np.int32)
    heights = rng.randint(16, 48, n).astype(np.int32)
    counts = rng.randint(6, 21, n).astype(np.int32)
    payloads = []
    for i in range(n):
        h, w, nf = int(heights[i]), int(widths[i]), int(counts[i])
        gx = np.broadcast_to(np.linspace(0, 255, w)[None, :], (h, w))
        frames = [
            np.stack([gx, np.full((h, w), min(f * 12.0, 255.0)),
                      np.clip(127.5 + 60 * np.sin(gx / 4.0 + f), 0, 255)],
                     axis=2).astype(np.uint8)
            for f in range(nf)
        ]
        payloads.append(encode_avi_mjpeg(frames, fps=fps))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(["video"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(widths),
            "height": pa.array(heights),
            "sample_rate": pa.array(np.full(n, 0, np.int32)),
            "n_frames": pa.array(counts),
        }
    )


def make_mpeg1_media(n: int, seed: int = 0) -> pa.Table:
    """Fixture with GENUINE MPEG-1 video payloads (this repo's first
    INTER-FRAME-coded video: I+P GOPs with full-pel motion
    compensation): seeded clips whose luma texture TRANSLATES between
    frames (so P pictures genuinely motion-compensate) and whose flat
    green level encodes the frame number (≈ 12·f), 6-20 frames each —
    so a frame-sample stage's output identifies WHICH frame a GOP seek
    decoded."""
    from ..functions.mpeg1 import encode_mpeg1

    rng = np.random.RandomState(seed)
    widths = rng.randint(16, 48, n).astype(np.int32)
    heights = rng.randint(16, 48, n).astype(np.int32)
    counts = rng.randint(6, 21, n).astype(np.int32)
    payloads = []
    for i in range(n):
        h, w, nf = int(heights[i]), int(widths[i]), int(counts[i])
        gx = np.broadcast_to(np.linspace(0, 255, w)[None, :], (h, w))
        gy = np.broadcast_to(np.linspace(0, 255, h)[:, None], (h, w))
        frames = []
        for f in range(nf):
            tex = np.clip(
                127.5 + 70 * np.sin((gx + 3.0 * f) / (6.0 + i % 5))
                * np.cos(gy / (5.0 + i % 3)), 0, 255)
            frames.append(np.stack(
                [np.minimum(0.5 * gx + 0.5 * tex, 255),
                 np.full((h, w), min(f * 12.0, 255.0)),
                 tex], axis=2).astype(np.uint8))
        payloads.append(encode_mpeg1(frames, gop_size=6))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(["video"] * n),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(widths),
            "height": pa.array(heights),
            "sample_rate": pa.array(np.full(n, 0, np.int32)),
            "n_frames": pa.array(counts),
        }
    )


class FakeDecoder:
    """Deterministic stand-in: pixels/samples derived from payload bytes so
    every worker produces identical output for the same row."""

    def decode_image(self, payload: bytes, width: int, height: int) -> np.ndarray:
        raw = np.frombuffer(
            (payload * ((width * height * 3) // max(len(payload), 1) + 1))[: width * height * 3],
            dtype=np.uint8,
        )
        return raw.reshape(height, width, 3)

    def decode_audio(self, payload: bytes, sample_rate: int) -> np.ndarray:
        raw = np.frombuffer((payload * 64)[: sample_rate], dtype=np.uint8)
        return (raw.astype(np.float32) - 127.5) / 127.5


_DECODERS = {"fake": FakeDecoder, "netpbm": NetpbmDecoder,
             "jpeg": JpegDecoder, "png": PngDecoder, "gif": GifDecoder,
             "compressed_audio": CompressedAudioDecoder,
             "mjpeg": MjpegDecoder,
             "library": LibraryDecoder}


def _pick_decoder(decoder: str | None, use_fake: bool):
    if decoder is not None:
        return _DECODERS[decoder]()
    return FakeDecoder() if use_fake else LibraryDecoder()


class ImageDecodeStage:
    """Actor-pool stage: decode → resize (nearest-neighbor, pure numpy) →
    per-image features. Decoder built ONCE per actor in __init__;
    ``decoder="netpbm"`` decodes REAL P5/P6 payloads.

    ``on_error``: a 100-TB web corpus always carries truncated/corrupt
    payloads, and one bad file must not kill its whole batch (and with
    Ray task retries, the whole pipeline).  ``"raise"`` (default)
    propagates, matching the strict fixture paths; ``"flag"`` keeps the
    row, zeroes its features and appends ``decode_ok``/``decode_error``
    columns — the Flink side-output analog: a downstream
    ``filter(decode_ok)`` splits the clean stream from the dead-letter
    rows in one pass."""

    def __init__(self, target_size: tuple[int, int] = (32, 32), use_fake: bool = True,
                 decoder: str | None = None, on_error: str = "raise") -> None:
        if on_error not in ("raise", "flag"):
            raise ValueError("on_error must be 'raise' or 'flag'")
        self.target = target_size
        self.decoder = _pick_decoder(decoder, use_fake)
        self.on_error = on_error

    def _resize(self, img: np.ndarray) -> np.ndarray:
        th, tw = self.target
        h, w = img.shape[:2]
        yi = (np.arange(th) * h // th).clip(0, h - 1)
        xi = (np.arange(tw) * w // tw).clip(0, w - 1)
        return img[yi[:, None], xi[None, :]]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        widths = batch["width"].to_numpy()
        heights = batch["height"].to_numpy()
        means, stds, thumbs, oks, errs = [], [], [], [], []
        for p, w, h in zip(payloads, widths, heights):
            try:
                img = self.decoder.decode_image(p, int(w), int(h))
            except Exception as e:  # noqa: BLE001 — poison-pill policy
                if self.on_error == "raise":
                    raise
                means.append(0.0)
                stds.append(0.0)
                thumbs.append(b"")
                oks.append(False)
                errs.append(f"{type(e).__name__}: {e}"[:200])
                continue
            small = self._resize(img)
            means.append(float(img.mean()))
            stds.append(float(img.std()))
            thumbs.append(small.tobytes())
            oks.append(True)
            errs.append("")
        # binary payload dropped here — only features move downstream
        out = {
            "media_id": batch["media_id"],
            "pixel_mean": pa.array(means, pa.float64()),
            "pixel_std": pa.array(stds, pa.float64()),
            "thumb": pa.array(thumbs, pa.binary()),
            "thumb_w": pa.array([self.target[1]] * batch.num_rows, pa.int32()),
            "thumb_h": pa.array([self.target[0]] * batch.num_rows, pa.int32()),
        }
        if self.on_error == "flag":
            out["decode_ok"] = pa.array(oks, pa.bool_())
            out["decode_error"] = pa.array(errs, pa.string())
        return pa.table(out)


class AudioFeatureStage:
    """Actor-pool stage: decode audio → frame energy features.
    ``on_error="flag"`` — same poison-pill contract as
    ``ImageDecodeStage``: corrupt payloads keep their row with zeroed
    features and ``decode_ok``/``decode_error`` columns."""

    def __init__(self, frame: int = 400, use_fake: bool = True,
                 decoder: str | None = None, on_error: str = "raise") -> None:
        if on_error not in ("raise", "flag"):
            raise ValueError("on_error must be 'raise' or 'flag'")
        self.frame = frame
        self.decoder = _pick_decoder(decoder, use_fake)
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        rates = batch["sample_rate"].to_numpy()
        energies, durs, oks, errs = [], [], [], []
        for p, sr in zip(payloads, rates):
            try:
                x = self.decoder.decode_audio(p, int(sr))
            except Exception as e:  # noqa: BLE001 — poison-pill policy
                if self.on_error == "raise":
                    raise
                energies.append(0.0)
                durs.append(0.0)
                oks.append(False)
                errs.append(f"{type(e).__name__}: {e}"[:200])
                continue
            n = (len(x) // self.frame) * self.frame
            frames = x[:n].reshape(-1, self.frame)
            energies.append(float((frames**2).mean()) if n else 0.0)
            durs.append(len(x) / max(int(sr), 1))
            oks.append(True)
            errs.append("")
        out = {
            "media_id": batch["media_id"],
            "energy": pa.array(energies, pa.float64()),
            "duration_s": pa.array(durs, pa.float64()),
        }
        if self.on_error == "flag":
            out["decode_ok"] = pa.array(oks, pa.bool_())
            out["decode_error"] = pa.array(errs, pa.string())
        return pa.table(out)


class VideoFrameSampleStage:
    """Actor-pool stage: sample every k-th frame of a video payload and
    emit one row per sampled frame (flat_map-shaped output).  Decoders
    exposing ``decode_video_frame`` (MJPEG-AVI, the library slot) get the
    REAL container path — frame count read from the container, only the
    sampled frames decoded; other decoders keep the synthetic
    frame-stamped-payload path."""

    def __init__(self, every: int = 4, use_fake: bool = True,
                 decoder: str | None = None, on_error: str = "raise") -> None:
        if on_error not in ("raise", "skip"):
            raise ValueError("on_error must be 'raise' or 'skip' "
                             "(flat-map output: a corrupt container emits "
                             "zero frames)")
        self.every = every
        self.decoder = _pick_decoder(decoder, use_fake)
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames_out, frame_nos = [], [], []
        real = hasattr(self.decoder, "decode_video_frame")
        for mid, p, w, h, nf in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["width"].to_numpy(),
            batch["height"].to_numpy(),
            batch["n_frames"].to_numpy(),
        ):
            try:
                if real:
                    nf = self.decoder.n_video_frames(p)
                for f in range(0, int(nf), self.every):
                    img = (self.decoder.decode_video_frame(p, f) if real else
                           self.decoder.decode_image(p + f.to_bytes(4, "little"),
                                                     int(w), int(h)))
                    ids.append(mid)
                    frame_nos.append(f)
                    frames_out.append(float(img.mean()))
            except Exception:  # noqa: BLE001 — poison-pill policy
                if self.on_error == "raise":
                    raise
                # skip: drop any frames already sampled from the corrupt
                # container so its output is all-or-nothing
                while ids and ids[-1] == mid:
                    ids.pop(), frame_nos.pop(), frames_out.pop()
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_no": pa.array(frame_nos, pa.int32()),
                "frame_mean": pa.array(frames_out, pa.float64()),
            }
        )
