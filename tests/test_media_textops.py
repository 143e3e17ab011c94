"""Multimodal plumbing (fake decoder) and text-analysis stages."""

import numpy as np
import pandas.testing as pdt
import pytest

from flink_fingerprint_ray.stages.media import (
    AudioFeatureStage,
    FakeDecoder,
    ImageDecodeStage,
    LibraryDecoder,
    VideoFrameSampleStage,
    make_fake_media,
)


def test_library_decoder_is_stub():
    with pytest.raises(NotImplementedError):
        LibraryDecoder().decode_image(b"x", 4, 4)
    with pytest.raises(NotImplementedError):
        LibraryDecoder().decode_audio(b"x", 16000)


def test_fake_decoder_deterministic():
    d = FakeDecoder()
    a = d.decode_image(b"payload", 8, 6)
    b = d.decode_image(b"payload", 8, 6)
    assert a.shape == (6, 8, 3) and (a == b).all()


def test_image_stage_actor_pool(ray_session):
    import ray.data

    ds = ray.data.from_arrow(make_fake_media(50, "image"))
    out = ds.map_batches(
        ImageDecodeStage, concurrency=2, batch_size=16, batch_format="pyarrow"
    ).to_pandas()
    assert len(out) == 50
    assert set(out.columns) == {"media_id", "pixel_mean", "pixel_std", "thumb", "thumb_w", "thumb_h"}
    assert (out["thumb"].str.len() == 32 * 32 * 3).all()
    # determinism across two runs (actor restarts produce identical output)
    out2 = ray.data.from_arrow(make_fake_media(50, "image")).map_batches(
        ImageDecodeStage, concurrency=2, batch_size=16, batch_format="pyarrow"
    ).to_pandas()
    assert np.allclose(
        out.sort_values("media_id")["pixel_mean"], out2.sort_values("media_id")["pixel_mean"]
    )


def test_audio_stage(ray_session):
    import ray.data

    ds = ray.data.from_arrow(make_fake_media(20, "audio"))
    out = ds.map_batches(
        AudioFeatureStage, concurrency=2, batch_size=8, batch_format="pyarrow"
    ).to_pandas()
    assert len(out) == 20 and (out["energy"] > 0).all()


def test_video_frame_sampling_flatmap_shape(ray_session):
    import ray.data

    media = make_fake_media(10, "video")
    ds = ray.data.from_arrow(media)
    out = ds.map_batches(
        VideoFrameSampleStage, concurrency=2, batch_size=8, batch_format="pyarrow"
    ).to_pandas()
    n_frames = media["n_frames"].to_numpy()
    expect = int(sum((nf + 3) // 4 for nf in n_frames))  # every 4th frame
    assert len(out) == expect
    assert out.groupby("media_id").size().shape[0] == 10


def test_langid_prefers_marked_language(ray_session):
    import pyarrow as pa
    import ray.data

    from flink_fingerprint_ray.stages.textops import LangIdStage

    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "the cat and the dog of the house going to the market",
            "der hund und die katze ist schön und der tag ist gut",
            "xyzzy qwerty zzz",
        ]),
    })
    out = ray.data.from_arrow(tbl).map_batches(
        LangIdStage, concurrency=1, batch_format="pyarrow"
    ).to_pandas().sort_values("doc_id")
    assert out["lang_pred"].tolist() == ["en", "de", "und"]


def test_quality_features_ranges():
    import pyarrow as pa

    from flink_fingerprint_ray.functions.textstats import quality_features

    f = quality_features(pa.array([
        "A good long sentence with the usual words and a readable structure.",
        "!!! ??? ... 123 456 789 ###",
        "",
    ]))
    q = f["quality_score"]
    assert 0.0 <= q.min() and q.max() <= 1.0
    assert q[0] > q[1] >= q[2] or q[0] > q[2]  # prose beats symbol soup
    assert f["n_tokens"][2] == 0


# ---------------------------------------------------------------------------
# REAL codecs: netpbm + PCM WAV (pure numpy)
# ---------------------------------------------------------------------------

def test_netpbm_roundtrip_exact():
    import numpy as np

    from flink_fingerprint_ray.stages.media import NetpbmDecoder, encode_ppm

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (23, 41, 3)).astype(np.uint8)
    dec = NetpbmDecoder()
    assert (dec.decode_image(encode_ppm(img)) == img).all()
    gray = rng.randint(0, 256, (17, 9)).astype(np.uint8)
    out = dec.decode_image(encode_ppm(gray))
    assert out.shape == (17, 9, 3) and (out[:, :, 0] == gray).all()
    # header with comments and odd whitespace still parses
    manual = b"P6 # comment\n# another\n 5\t4 255\n" + bytes(5 * 4 * 3)
    assert dec.decode_image(manual).shape == (4, 5, 3)


def test_wav_roundtrip_close():
    import numpy as np

    from flink_fingerprint_ray.stages.media import NetpbmDecoder, encode_wav

    t = np.arange(8000) / 16000.0
    x = 0.4 * np.sin(2 * np.pi * 440 * t)
    y = NetpbmDecoder().decode_audio(encode_wav(x, 16000))
    assert len(y) == len(x)
    assert np.abs(y - x).max() < 1.0 / 32000  # PCM16 quantization only


def test_image_stage_real_payloads(ray_session):
    import numpy as np
    import ray.data

    from flink_fingerprint_ray.stages.media import (
        ImageDecodeStage, NetpbmDecoder, make_real_media)

    media = make_real_media(40, kind="image", seed=5)
    ds = ray.data.from_arrow(media)
    out = ds.map_batches(ImageDecodeStage, fn_constructor_kwargs={"decoder": "netpbm"},
                         concurrency=2, batch_size=16,
                         batch_format="pyarrow").to_pandas()
    assert len(out) == 40
    # features match a direct single-process decode
    dec = NetpbmDecoder()
    payloads = media["payload"].to_pylist()
    for i in (0, 17, 39):
        img = dec.decode_image(payloads[i])
        row = out[out["media_id"] == i].iloc[0]
        assert row["pixel_mean"] == float(img.mean())
        assert row["thumb_w"] == 32 and len(row["thumb"]) == 32 * 32 * 3


def test_audio_stage_real_payloads(ray_session):
    import numpy as np
    import ray.data

    from flink_fingerprint_ray.stages.media import (
        AudioFeatureStage, NetpbmDecoder, make_real_media)

    media = make_real_media(24, kind="audio", seed=6)
    ds = ray.data.from_arrow(media)
    out = ds.map_batches(AudioFeatureStage, fn_constructor_kwargs={"decoder": "netpbm"},
                         concurrency=2, batch_size=8,
                         batch_format="pyarrow").to_pandas()
    assert len(out) == 24
    assert (out["energy"] > 0).all()
    dec = NetpbmDecoder()
    x = dec.decode_audio(media["payload"].to_pylist()[0])
    assert abs(out[out["media_id"] == 0]["duration_s"].iloc[0] - len(x) / 16000.0) < 1e-9


# ---------------------------------------------------------------------------
# baseline JPEG codec (pure numpy/python, functions/jpeg.py)
# ---------------------------------------------------------------------------

class TestJpegCodec:
    def _grad(self, h, w, phase=0.0):
        gx = np.linspace(0, 255, w)[None, :]
        gy = np.linspace(0, 255, h)[:, None]
        tex = 127.5 + 70 * np.sin(gx / 6 + phase) * np.cos(gy / 5)
        return np.stack([np.broadcast_to(gx, (h, w)),
                         np.broadcast_to(gy, (h, w)),
                         np.clip(tex, 0, 255)], axis=2).astype(np.uint8)

    @staticmethod
    def _chroma_floor(img):
        """Pure 4:2:0 loss (box-downsample + repeat chroma, no codec) —
        the irreducible error any subsampled encoder pays on this image."""
        from flink_fingerprint_ray.functions.jpeg import (
            rgb_to_ycbcr,
            ycbcr_to_rgb,
        )

        h, w = img.shape[:2]
        ycc = np.pad(rgb_to_ycbcr(img), ((0, -h % 2), (0, -w % 2), (0, 0)),
                     mode="edge")
        for c in (1, 2):
            d = ycc[:, :, c].reshape(ycc.shape[0] // 2, 2,
                                     ycc.shape[1] // 2, 2).mean(axis=(1, 3))
            ycc[:, :, c] = np.repeat(np.repeat(d, 2, axis=0), 2, axis=1)
        rec = ycbcr_to_rgb(ycc[:h, :w])
        return np.abs(rec.astype(float) - img.astype(float)).mean()

    def test_roundtrip_shapes_and_fidelity(self):
        from flink_fingerprint_ray.functions.jpeg import decode_jpeg, encode_jpeg

        for (h, w), sub in [((16, 16), False), ((24, 40), False),
                            ((33, 50), True), ((64, 48), True),
                            ((8, 8), False), ((9, 13), True)]:
            img = self._grad(h, w)
            dec = decode_jpeg(encode_jpeg(img, quality=92, subsample=sub))
            assert dec.shape == (h, w, 3) and dec.dtype == np.uint8
            err = np.abs(dec.astype(float) - img.astype(float)).mean()
            # budget: the irreducible chroma-subsampling floor (sub only)
            # plus a q92 quantization allowance
            floor = self._chroma_floor(img) if sub else 0.0
            assert err < floor + 4.5, (h, w, sub, err, floor)

    def test_grayscale_roundtrip(self):
        from flink_fingerprint_ray.functions.jpeg import decode_jpeg, encode_jpeg

        rng = np.random.RandomState(4)
        img = (rng.rand(17, 23) * 60 + 90).astype(np.uint8)  # low contrast
        dec = decode_jpeg(encode_jpeg(img, quality=95))
        assert dec.shape == (17, 23, 3)
        assert np.abs(dec[:, :, 0].astype(float) - img.astype(float)).mean() < 6.0
        # gray replicated across channels
        assert np.array_equal(dec[:, :, 0], dec[:, :, 1])

    def test_deterministic_bytes_and_decode(self):
        from flink_fingerprint_ray.functions.jpeg import decode_jpeg, encode_jpeg

        img = self._grad(31, 29)
        p1, p2 = encode_jpeg(img, 85, subsample=True), encode_jpeg(img, 85, subsample=True)
        assert p1 == p2
        assert np.array_equal(decode_jpeg(p1), decode_jpeg(p2))

    def test_rejects_non_jpeg_and_progressive(self):
        from flink_fingerprint_ray.functions.jpeg import decode_jpeg

        with pytest.raises(ValueError):
            decode_jpeg(b"P6\n2 2\n255\n" + b"\x00" * 12)
        # a fake SOF2 (progressive) frame header must be refused
        bogus = (b"\xff\xd8" + b"\xff\xc2" + (11).to_bytes(2, "big")
                 + bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
                 + bytes([1, 1, 0x11, 0]))
        with pytest.raises(ValueError, match="baseline"):
            decode_jpeg(bogus)

    def test_stage_decodes_real_jpeg_payloads(self, ray_session):
        import ray.data

        from flink_fingerprint_ray.stages.media import (
            ImageDecodeStage,
            make_jpeg_media,
        )

        t = make_jpeg_media(48, seed=5)
        # every payload is genuine JPEG
        assert all(p[:2] == b"\xff\xd8" for p in t["payload"].to_pylist())
        out = ray.data.from_arrow(t).map_batches(
            ImageDecodeStage, fn_constructor_kwargs={"decoder": "jpeg"},
            concurrency=2, batch_size=16, batch_format="pyarrow",
        ).to_pandas().sort_values("media_id").reset_index(drop=True)
        assert len(out) == 48
        ref = ImageDecodeStage(decoder="jpeg")(t).to_pandas() \
            .sort_values("media_id").reset_index(drop=True)
        pdt.assert_frame_equal(out[ref.columns.tolist()], ref)


class TestPngCodec:
    """Pure numpy/stdlib-zlib baseline PNG (functions/png.py) — lossless,
    so every roundtrip asserts EXACT byte equality."""

    def test_roundtrip_exact_all_shapes(self):
        from flink_fingerprint_ray.functions.png import decode_png, encode_png

        rng = np.random.RandomState(3)
        for shape in [(1, 1), (7, 3), (33, 17), (40, 56, 3), (16, 16, 4),
                      (5, 200, 3), (64, 64, 4)]:
            img = rng.randint(0, 256, shape).astype(np.uint8)
            dec = decode_png(encode_png(img))
            assert dec.shape == img.shape and dec.dtype == np.uint8
            assert np.array_equal(dec, img), shape

    def test_all_five_filters_exercised_and_inverted(self):
        from flink_fingerprint_ray.functions.png import decode_png, encode_png

        # >=5 rows ⇒ the encoder's row-cycling covers filters 0..4
        rng = np.random.RandomState(4)
        img = rng.randint(0, 256, (11, 23, 3)).astype(np.uint8)
        data = encode_png(img)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        assert np.array_equal(decode_png(data), img)

    def test_deterministic_bytes(self):
        from flink_fingerprint_ray.functions.png import encode_png

        img = (np.arange(24 * 18 * 3) % 251).reshape(24, 18, 3).astype(np.uint8)
        assert encode_png(img) == encode_png(img)

    def test_rejects_bad_input(self):
        from flink_fingerprint_ray.functions.png import decode_png

        with pytest.raises(ValueError):
            decode_png(b"not a png at all")

    def test_library_dispatch_and_stage(self, ray_session):
        import ray.data

        from flink_fingerprint_ray.stages.media import (
            ImageDecodeStage,
            LibraryDecoder,
            make_png_media,
        )

        t = make_png_media(48, seed=7)
        assert all(p[:8] == b"\x89PNG\r\n\x1a\n" for p in t["payload"].to_pylist())
        # signature dispatch through the library slot
        img = LibraryDecoder().decode_image(t["payload"][0].as_py(), 0, 0)
        assert img.dtype == np.uint8 and img.ndim in (2, 3)
        out = ray.data.from_arrow(t).map_batches(
            ImageDecodeStage, fn_constructor_kwargs={"decoder": "library"},
            concurrency=2, batch_size=16, batch_format="pyarrow",
        ).to_pandas().sort_values("media_id").reset_index(drop=True)
        assert len(out) == 48
        ref = ImageDecodeStage(decoder="library")(t).to_pandas() \
            .sort_values("media_id").reset_index(drop=True)
        pdt.assert_frame_equal(out[ref.columns.tolist()], ref)


class TestCompressedAudioCodecs:
    """G.711 mu-law + IMA ADPCM (functions/audio_codecs.py) — from-spec,
    no libav."""

    def test_ulaw_codeword_fixpoint_and_error_bound(self):
        from flink_fingerprint_ray.functions.audio_codecs import (
            ulaw_decode,
            ulaw_encode,
        )

        rng = np.random.RandomState(0)
        pcm = rng.randint(-32768, 32768, 50000).astype(np.int16)
        err = np.abs(ulaw_decode(ulaw_encode(pcm)).astype(np.int32)
                     - pcm.astype(np.int32))
        # top-segment quantization step is 1024 ⇒ error strictly below it
        assert err.max() <= 1024
        # decode -> encode -> decode is a fixpoint on every codeword
        u = np.arange(256, dtype=np.uint8)
        assert np.array_equal(ulaw_decode(ulaw_encode(ulaw_decode(u))),
                              ulaw_decode(u))

    def test_adpcm_roundtrip_snr_and_length(self):
        from flink_fingerprint_ray.functions.audio_codecs import (
            ima_adpcm_decode,
            ima_adpcm_encode,
        )

        t = np.arange(16000) / 16000.0
        pcm = ((0.5 * np.sin(2 * np.pi * 440 * t)
                + 0.2 * np.sin(2 * np.pi * 1200 * t)) * 32767) \
            .round().astype(np.int16)
        dec = ima_adpcm_decode(ima_adpcm_encode(pcm))
        assert len(dec) == len(pcm)
        snr = 10 * np.log10((pcm.astype(float) ** 2).mean()
                            / ((dec.astype(float) - pcm) ** 2).mean())
        assert snr > 20, snr

    def test_wav_containers_roundtrip_and_ratio(self):
        from flink_fingerprint_ray.functions.audio_codecs import (
            decode_wav_compressed,
            encode_wav_adpcm,
            encode_wav_ulaw,
        )

        t = np.arange(12345) / 16000.0
        x = 0.4 * np.sin(2 * np.pi * 300 * t)
        for enc, budget, ratio in ((encode_wav_ulaw, 0.01, 1.8),
                                   (encode_wav_adpcm, 0.02, 3.2)):
            w = enc(x, 16000)
            y = decode_wav_compressed(w)
            assert len(y) == len(x)
            assert np.abs(y - x.astype(np.float32)).mean() < budget
            assert len(x) * 2 / len(w) > ratio  # genuinely compressed
        with pytest.raises(ValueError):
            decode_wav_compressed(b"not riff")

    def test_library_dispatch_and_stage(self, ray_session):
        import ray.data

        from flink_fingerprint_ray.stages.media import (
            AudioFeatureStage,
            LibraryDecoder,
            make_compressed_audio_media,
        )

        t = make_compressed_audio_media(48, seed=9)
        assert all(p[:4] == b"RIFF" for p in t["payload"].to_pylist())
        x = LibraryDecoder().decode_audio(t["payload"][0].as_py(), 16000)
        assert x.dtype == np.float32 and len(x) > 0
        out = ray.data.from_arrow(t).map_batches(
            AudioFeatureStage, fn_constructor_kwargs={"decoder": "library"},
            concurrency=2, batch_size=16, batch_format="pyarrow",
        ).to_pandas().sort_values("media_id").reset_index(drop=True)
        ref = AudioFeatureStage(decoder="library")(t).to_pandas() \
            .sort_values("media_id").reset_index(drop=True)
        pdt.assert_frame_equal(out[ref.columns.tolist()], ref)


class TestMjpegAvi:
    """MJPEG-in-AVI container (functions/mjpeg.py) — real RIFF/AVI with
    baseline-JPEG frames; frame access = index seek + one JPEG decode."""

    @staticmethod
    def _frames(n=9, h=24, w=32):
        gx = np.broadcast_to(np.linspace(0, 255, w)[None, :], (h, w))
        return [np.stack([gx, np.full((h, w), min(f * 12.0, 255.0)),
                          np.clip(127.5 + 60 * np.sin(gx / 4.0 + f), 0, 255)],
                         axis=2).astype(np.uint8) for f in range(n)]

    def test_container_roundtrip_and_seek(self):
        from flink_fingerprint_ray.functions.mjpeg import (
            avi_mjpeg_index,
            decode_avi_frame,
            encode_avi_mjpeg,
        )

        frames = self._frames(9)
        avi = encode_avi_mjpeg(frames, fps=5)
        assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
        idx = avi_mjpeg_index(avi)
        assert len(idx) == 9
        for f in (0, 4, 8):
            dec = decode_avi_frame(avi, f, idx)
            assert dec.shape == frames[f].shape
            assert np.abs(dec.astype(float) - frames[f].astype(float)).mean() < 6.0
            # green channel identifies the frame — the seek hit the RIGHT one
            assert abs(float(dec[:, :, 1].mean()) - min(f * 12.0, 255.0)) < 10.0
        with pytest.raises(IndexError):
            decode_avi_frame(avi, 99, idx)
        with pytest.raises(ValueError):
            avi_mjpeg_index(b"RIFF\x04\x00\x00\x00WAVE")

    def test_stage_real_video_payloads(self, ray_session):
        import ray.data

        from flink_fingerprint_ray.stages.media import (
            VideoFrameSampleStage,
            make_mjpeg_media,
        )

        t = make_mjpeg_media(24, seed=13)
        assert all(p[:4] == b"RIFF" and p[8:12] == b"AVI "
                   for p in t["payload"].to_pylist())
        out = ray.data.from_arrow(t).map_batches(
            VideoFrameSampleStage,
            fn_constructor_kwargs={"decoder": "library", "every": 4},
            concurrency=2, batch_size=8, batch_format="pyarrow",
        ).to_pandas().sort_values(["media_id", "frame_no"]).reset_index(drop=True)
        counts = t["n_frames"].to_numpy()
        assert len(out) == int(sum((int(c) + 3) // 4 for c in counts))
        ref = VideoFrameSampleStage(decoder="library", every=4)(t).to_pandas() \
            .sort_values(["media_id", "frame_no"]).reset_index(drop=True)
        pdt.assert_frame_equal(out[ref.columns.tolist()], ref)


class TestPngExtendedShapes:
    """Round-4b PNG coverage: Adam7 interlace, palette (the most common
    web PNG shape), 16-bit depth — the decoder subsets real corpora hit."""

    def test_adam7_roundtrip_exact(self):
        from flink_fingerprint_ray.functions.png import decode_png, encode_png

        rng = np.random.RandomState(6)
        for shape in [(1, 1), (2, 3), (7, 5), (8, 8, 3), (33, 17),
                      (40, 56, 3), (9, 9, 4)]:
            img = rng.randint(0, 256, shape).astype(np.uint8)
            data = encode_png(img, interlace=True)
            assert np.array_equal(decode_png(data), img), shape

    def test_palette_decode_with_and_without_trns(self):
        from flink_fingerprint_ray.functions.png import (
            decode_png,
            encode_png_palette,
        )

        rng = np.random.RandomState(7)
        idx = rng.randint(0, 5, (23, 31)).astype(np.uint8)
        pal = rng.randint(0, 256, (5, 3)).astype(np.uint8)
        assert np.array_equal(decode_png(encode_png_palette(idx, pal)), pal[idx])
        trns = np.array([255, 128, 0, 255, 10], np.uint8)
        dec = decode_png(encode_png_palette(idx, pal, trns=trns))
        assert dec.shape == (23, 31, 4)
        assert np.array_equal(dec[:, :, :3], pal[idx])
        assert np.array_equal(dec[:, :, 3], trns[idx])

    @staticmethod
    def _raw_png(ihdr_fields, chunks):
        import struct as _s

        from flink_fingerprint_ray.functions.png import _SIG, _chunk

        out = _SIG + _chunk(b"IHDR", _s.pack(">IIBBBBB", *ihdr_fields))
        for typ, body in chunks:
            out += _chunk(typ, body)
        return out + _chunk(b"IEND", b"")

    def test_sub8_palette_depths(self):
        import zlib as _z

        from flink_fingerprint_ray.functions.png import decode_png

        rng = np.random.RandomState(8)
        for depth in (1, 2, 4):
            n = 1 << depth
            per = 8 // depth
            idx = rng.randint(0, n, (9, 13)).astype(np.uint8)
            pal = rng.randint(0, 256, (n, 3)).astype(np.uint8)
            h, w = idx.shape
            stride = (w * depth + 7) // 8
            rows = bytearray()
            for y in range(h):
                rows.append(0)
                bits = np.zeros(stride * per, np.uint8)
                bits[:w] = idx[y]
                packed = np.zeros(stride, np.uint8)
                for k in range(per):
                    packed |= (bits[k::per][:stride]
                               << ((per - 1 - k) * depth)).astype(np.uint8)
                rows += packed.tobytes()
            data = self._raw_png((w, h, depth, 3, 0, 0, 0),
                                 [(b"PLTE", pal.tobytes()),
                                  (b"IDAT", _z.compress(bytes(rows)))])
            assert np.array_equal(decode_png(data), pal[idx]), depth

    def test_16bit_msb_rule(self):
        import zlib as _z

        from flink_fingerprint_ray.functions.png import decode_png

        rng = np.random.RandomState(9)
        for ct, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
            h, w = 6, 7
            px16 = rng.randint(0, 65536, (h, w, ch)).astype(">u2")
            rows = bytearray()
            for y in range(h):
                rows.append(0)
                rows += px16[y].tobytes()
            data = self._raw_png((w, h, 16, ct, 0, 0, 0),
                                 [(b"IDAT", _z.compress(bytes(rows)))])
            want = (px16 >> 8).astype(np.uint8)
            want = want[:, :, 0] if ch == 1 else want
            assert np.array_equal(decode_png(data), want), ct


class TestGifCodec:
    """Pure python/numpy GIF89a (functions/gif.py) — LZW + palette,
    lossless over palette content, so roundtrips assert EXACT equality;
    animated GIFs double as the second REAL video container."""

    def test_roundtrip_exact_palette_sizes(self):
        from flink_fingerprint_ray.functions.gif import decode_gif, encode_gif

        rng = np.random.RandomState(31)
        for ncol in (2, 5, 16, 97, 256):
            for shape in ((1, 1), (3, 2), (17, 23), (64, 64)):
                idx = rng.randint(0, ncol, shape).astype(np.uint8)
                pal = rng.randint(0, 256, (ncol, 3)).astype(np.uint8)
                out = decode_gif(encode_gif(idx, pal))
                assert np.array_equal(out, pal[idx]), (ncol, shape)

    def test_lzw_table_full_and_clear(self):
        from flink_fingerprint_ray.functions.gif import decode_gif, encode_gif

        # 120k high-entropy pixels force the 12-bit table cap and the
        # encoder's mid-stream clear codes
        rng = np.random.RandomState(32)
        idx = rng.randint(0, 256, (300, 400)).astype(np.uint8)
        pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
        assert np.array_equal(decode_gif(encode_gif(idx, pal)), pal[idx])

    def test_interlace_roundtrip(self):
        from flink_fingerprint_ray.functions.gif import decode_gif, encode_gif

        rng = np.random.RandomState(33)
        pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
        for shape in ((1, 5), (2, 3), (7, 7), (37, 29), (64, 48)):
            idx = rng.randint(0, 16, shape).astype(np.uint8)
            out = decode_gif(encode_gif(idx, pal, interlace=True))
            assert np.array_equal(out, pal[idx]), shape

    def test_transparency_rgba(self):
        from flink_fingerprint_ray.functions.gif import decode_gif, encode_gif

        rng = np.random.RandomState(34)
        pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
        idx = rng.randint(0, 16, (21, 13)).astype(np.uint8)
        out = decode_gif(encode_gif(idx, pal, transparent=3))
        assert out.shape == (21, 13, 4)
        assert np.array_equal(out[:, :, 3] == 0, idx == 3)
        opaque = idx != 3
        assert np.array_equal(out[opaque][:, :3], pal[idx][opaque])

    def test_animation_frames_and_seek(self):
        from flink_fingerprint_ray.functions.gif import (
            decode_gif_frame,
            decode_gif_frames,
            encode_gif_animation,
            gif_n_frames,
        )

        rng = np.random.RandomState(35)
        pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
        frames = [rng.randint(0, 16, (20, 24)).astype(np.uint8)
                  for _ in range(7)]
        data = encode_gif_animation(frames, pal, delays_cs=[5] * 7)
        assert gif_n_frames(data) == 7
        dec = decode_gif_frames(data)
        assert len(dec) == 7
        for f, d in zip(frames, dec):
            assert np.array_equal(d, pal[f])
        assert np.array_equal(decode_gif_frame(data, 4), pal[frames[4]])

    def test_disposal_and_local_palettes(self):
        from flink_fingerprint_ray.functions.gif import (
            decode_gif_frames,
            encode_gif_animation,
        )

        rng = np.random.RandomState(36)
        pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
        # disposal 2 (restore to background) clears the canvas between
        # frames; frame 1 is all-transparent so it composites to empty
        f0 = np.zeros((10, 10), np.uint8)
        f1 = np.full((10, 10), 3, np.uint8)
        dec = decode_gif_frames(encode_gif_animation(
            [f0, f1], pal, disposals=[2, 1], transparent=3))
        assert dec[0].shape == (10, 10, 3)
        assert dec[1].shape == (10, 10, 4) and (dec[1][:, :, 3] == 0).all()
        # disposal 3 (restore previous) on frame 1: after frame 1 the
        # canvas reverts to frame 0's state, so the all-transparent
        # frame 2 composites to frame 0's pixels
        f1b = np.full((10, 10), 5, np.uint8)    # opaque overwrite
        f2 = np.full((10, 10), 3, np.uint8)     # transparent everywhere
        dec = decode_gif_frames(encode_gif_animation(
            [f0, f1b, f2], pal, disposals=[1, 3, 1], transparent=3))
        assert np.array_equal(dec[1], pal[f1b])
        assert np.array_equal(dec[2], pal[f0])  # shows through to frame 0
        # per-frame local color tables override the global one
        lps = [rng.randint(0, 256, (16, 3)).astype(np.uint8) for _ in range(3)]
        frames = [rng.randint(0, 16, (8, 9)).astype(np.uint8) for _ in range(3)]
        dec = decode_gif_frames(encode_gif_animation(
            frames, pal, local_palettes=lps))
        for f, lp, d in zip(frames, lps, dec):
            assert np.array_equal(d, lp[f])

    def test_n_frames_skips_entropy_decode(self):
        from flink_fingerprint_ray.functions import gif as gifmod

        rng = np.random.RandomState(37)
        pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
        frames = [rng.randint(0, 16, (12, 12)).astype(np.uint8)
                  for _ in range(5)]
        data = gifmod.encode_gif_animation(frames, pal)
        calls = []
        orig = gifmod._lzw_decode
        gifmod._lzw_decode = lambda *a, **k: calls.append(1) or orig(*a, **k)
        try:
            assert gifmod.gif_n_frames(data) == 5
        finally:
            gifmod._lzw_decode = orig
        assert calls == []

    def test_rejects_bad_input(self):
        from flink_fingerprint_ray.functions.gif import decode_gif

        with pytest.raises(ValueError):
            decode_gif(b"not a gif at all")

    def test_library_dispatch_and_stage(self, ray_session):
        import ray.data

        from flink_fingerprint_ray.stages.media import (
            ImageDecodeStage,
            LibraryDecoder,
            make_gif_media,
        )

        t = make_gif_media(48, seed=17)
        assert all(p[:6] in (b"GIF87a", b"GIF89a")
                   for p in t["payload"].to_pylist())
        img = LibraryDecoder().decode_image(t["payload"][0].as_py(), 0, 0)
        assert img.dtype == np.uint8 and img.ndim == 3
        out = ray.data.from_arrow(t).map_batches(
            ImageDecodeStage, fn_constructor_kwargs={"decoder": "library"},
            concurrency=2, batch_size=16, batch_format="pyarrow",
        ).to_pandas().sort_values("media_id").reset_index(drop=True)
        assert len(out) == 48
        ref = ImageDecodeStage(decoder="library")(t).to_pandas() \
            .sort_values("media_id").reset_index(drop=True)
        pdt.assert_frame_equal(out[ref.columns.tolist()], ref)

    def test_anim_video_stage(self, ray_session):
        import ray.data

        from flink_fingerprint_ray.functions.gif import gif_n_frames
        from flink_fingerprint_ray.stages.media import (
            VideoFrameSampleStage,
            make_gif_anim_media,
        )

        t = make_gif_anim_media(24, seed=23)
        out = ray.data.from_arrow(t).map_batches(
            VideoFrameSampleStage,
            fn_constructor_kwargs={"decoder": "library", "every": 4},
            concurrency=2, batch_size=8, batch_format="pyarrow",
        ).to_pandas().sort_values(["media_id", "frame_no"]) \
            .reset_index(drop=True)
        counts = [gif_n_frames(p.as_py()) for p in t["payload"]]
        assert counts == t["n_frames"].to_pylist()
        assert len(out) == sum((c + 3) // 4 for c in counts)
        ref = VideoFrameSampleStage(decoder="library", every=4)(t).to_pandas() \
            .sort_values(["media_id", "frame_no"]).reset_index(drop=True)
        pdt.assert_frame_equal(out[ref.columns.tolist()], ref)


def test_exact_substring_kernels_vs_brute():
    """doc_kgram_rows + dup-position + span sweep vs a pure-Python
    k-gram counter on handcrafted overlapping-duplicate docs."""
    import re
    from collections import Counter

    import pandas as pd
    import pyarrow as pa

    from flink_fingerprint_ray.stages.textops import (
        doc_kgram_rows, kgram_dup_positions, kgram_span_sweep)

    k = 3
    docs = {
        0: "alpha beta gamma delta epsilon zeta",
        1: "x alpha beta gamma delta y z",          # shares a 4-token run
        2: "one two three one two three one two",   # self-repeat
        3: "unique words only here now",
        4: "aa bb",                                 # shorter than k
    }
    batch = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                      "text": pa.array(list(docs.values()))})
    grams = doc_kgram_rows(batch, k=k)
    dup = kgram_dup_positions(grams)

    # brute force: literal k-gram strings
    toks = {d: re.findall(r"[a-z0-9]+", t.lower()) for d, t in docs.items()}
    lit = Counter()
    pos_of = {}
    for d, ts in toks.items():
        for i in range(len(ts) - k + 1):
            g = " ".join(ts[i:i + k])
            lit[g] += 1
            pos_of.setdefault(g, []).append((d, i))
    want = sorted(p for g, n in lit.items() if n >= 2 for p in pos_of[g])
    got = sorted(zip(dup["doc_id"].to_numpy(), dup["pos"].to_numpy()))
    assert got == want

    # span sweep vs brute coverage
    tagged = pd.concat([
        pd.DataFrame({"doc_id": list(docs), "pos": [len(toks[d]) for d in docs],
                      "tag": 0}),
        dup.assign(tag=1),
    ])
    out = kgram_span_sweep(pa.Table.from_pandas(tagged, preserve_index=False), k=k)
    out = out.set_index("doc_id").sort_index()
    for d in docs:
        covered = set()
        for (dd, i) in want:
            if dd == d:
                covered.update(range(i, i + k))
        runs = 0
        for p in sorted(covered):
            if p - 1 not in covered:
                runs += 1
        assert out.loc[d, "total_tokens"] == len(toks[d])
        assert out.loc[d, "dup_tokens"] == len(covered), d
        assert out.loc[d, "dup_spans"] == runs, d


def test_winnow_guarantee_and_reference_parity():
    """Winnowing guarantee: two docs sharing a token run of length
    >= w+k-1 share at least one selected fingerprint; vectorized kernel
    == paper-pseudocode loop reference on mixed-length docs."""
    import pyarrow as pa

    from flink_fingerprint_ray.stages.textops import winnow_reference, winnow_rows

    k, w = 3, 4
    shared = "lorem ipsum dolor sit amet consectetur"  # 6 tokens = w+k-1
    docs = {
        0: "prefix words here " + shared + " and a tail",
        1: shared + " totally different ending text",
        2: "tiny doc",            # < k tokens -> no fingerprints
        3: "four little tokens",  # k<=tokens<w+k-1 -> short-doc single window
        4: "a b c d",
    }
    batch = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                      "text": pa.array(list(docs.values()))})
    eng = winnow_rows(batch, k=k, w=w).to_pandas()
    ref = winnow_reference(batch["doc_id"].to_numpy(), batch["text"], k=k, w=w)
    key = ["doc_id", "pos", "fp"]
    assert eng.sort_values(key).reset_index(drop=True).equals(
        ref.sort_values(key).reset_index(drop=True))
    f0 = set(eng.loc[eng.doc_id == 0, "fp"])
    f1 = set(eng.loc[eng.doc_id == 1, "fp"])
    assert f0 & f1, "shared w+k-1 run must share a fingerprint"
    assert (eng.doc_id != 2).all()
    assert (eng.loc[eng.doc_id == 3].shape[0]) == 1


def test_media_stage_on_error_flag_and_skip(ray_session):
    """Poison-pill policy: a 100-TB corpus always carries corrupt
    payloads — one bad file must not kill its batch.  on_error="flag"
    keeps the row with decode_ok=False + zeroed features (the side-output
    split analog); "skip" on the flat-map video stage emits zero frames
    for the corrupt container; default "raise" still propagates."""
    import pyarrow as pa
    import pytest

    import ray.data
    from flink_fingerprint_ray.stages.media import (
        AudioFeatureStage,
        ImageDecodeStage,
        VideoFrameSampleStage,
        make_flac_media,
        make_mjpeg_media,
        make_webp_media,
    )

    def corrupt(tbl: pa.Table, idx: int) -> pa.Table:
        payloads = tbl["payload"].to_pylist()
        payloads[idx] = payloads[idx][: len(payloads[idx]) // 2] + b"\x00garbage"
        return tbl.set_column(tbl.schema.get_field_index("payload"),
                              "payload", pa.array(payloads, pa.binary()))

    imgs = corrupt(make_webp_media(12, seed=31), 5)
    out = ray.data.from_arrow(imgs).map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"decoder": "library", "on_error": "flag"},
        concurrency=1, batch_size=6, batch_format="pyarrow").to_pandas()
    assert len(out) == 12
    bad = out[~out.decode_ok]
    assert bad.media_id.tolist() == [5] and bad.decode_error.iloc[0]
    assert (out[out.decode_ok].pixel_std > 0).all()

    aud = corrupt(make_flac_media(8, seed=33), 2)
    out_a = ray.data.from_arrow(aud).map_batches(
        AudioFeatureStage,
        fn_constructor_kwargs={"decoder": "library", "on_error": "flag"},
        concurrency=1, batch_size=4, batch_format="pyarrow").to_pandas()
    assert out_a[~out_a.decode_ok].media_id.tolist() == [2]
    assert (out_a[out_a.decode_ok].duration_s > 0).all()

    vids = corrupt(make_mjpeg_media(6, seed=35), 1)
    out_v = ray.data.from_arrow(vids).map_batches(
        VideoFrameSampleStage,
        fn_constructor_kwargs={"decoder": "library", "on_error": "skip"},
        concurrency=1, batch_size=3, batch_format="pyarrow").to_pandas()
    got_ids = set(out_v.media_id)
    assert 1 not in got_ids and got_ids == {0, 2, 3, 4, 5}

    stage = ImageDecodeStage(decoder="library")   # default: raise
    with pytest.raises(Exception):
        stage(imgs)
    with pytest.raises(ValueError, match="on_error"):
        ImageDecodeStage(on_error="bogus")
    with pytest.raises(ValueError, match="on_error"):
        VideoFrameSampleStage(on_error="flag")
