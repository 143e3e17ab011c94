"""FLAC codec unit tests (functions/flac.py — pure-numpy RFC 9639
subset): bit-exact losslessness across predictors / stereo assignments /
block edges, compression on smooth signals, CRC + MD5 integrity, and the
LibraryDecoder dispatch.  Pure-function tests: no Ray session needed."""
from __future__ import annotations

import numpy as np
import pytest

from flink_fingerprint_ray.functions.flac import decode_flac, encode_flac


def _sig(n=10_000, seed=3, noise=40.0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (3000 * np.sin(t / 50) + 500 * np.sin(t / 7)
            + rng.normal(0, noise, n)).astype(np.int16)


@pytest.mark.parametrize("pred", ["fixed", "lpc"])
def test_mono_roundtrip_lossless_and_compressed(pred):
    x = _sig()
    enc = encode_flac(x, 22050, predictor=pred)
    dec, sr = decode_flac(enc)
    assert sr == 22050
    assert np.array_equal(dec, x.astype(np.int32))
    assert len(enc) < 0.7 * x.nbytes  # smooth signal must actually compress


@pytest.mark.parametrize("mode", ["independent", "left_side",
                                  "right_side", "mid_side"])
def test_stereo_assignments_roundtrip(mode):
    x = _sig(20_000)
    rng = np.random.default_rng(7)
    st = np.stack([x, (x // 2 + rng.normal(0, 20, len(x))).astype(np.int16)],
                  axis=1)
    dec, _ = decode_flac(encode_flac(st, 44100, stereo_mode=mode))
    assert np.array_equal(dec, st.astype(np.int32))


def test_edge_signals_roundtrip():
    rng = np.random.default_rng(11)
    for sig in (np.zeros(5000, np.int16),          # constant subframes
                np.full(17, -3, np.int16),         # sub-block, negative
                np.arange(4097, dtype=np.int16),   # exact block boundary +1
                rng.integers(-32768, 32768, 9000).astype(np.int16),  # noise
                np.array([0], dtype=np.int16)):
        dec, _ = decode_flac(encode_flac(sig, 8000))
        assert np.array_equal(dec, sig.astype(np.int32))


def test_corruption_detected_by_crc():
    enc = bytearray(encode_flac(_sig(5000), 8000))
    enc[len(enc) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        decode_flac(bytes(enc))
    with pytest.raises(ValueError):
        decode_flac(b"not a flac stream at all")


def test_library_decoder_dispatch_and_downmix():
    from flink_fingerprint_ray.stages.media import LibraryDecoder

    x = _sig(6000)
    st = np.stack([x, (x * 0.6).astype(np.int16)], axis=1)
    dec = LibraryDecoder()
    mono = dec.decode_audio(encode_flac(x, 16000), 16000)
    assert mono.dtype == np.float32 and mono.ndim == 1
    assert np.allclose(mono, x.astype(np.float32) / 32768.0)
    mixed = dec.decode_audio(encode_flac(st, 16000, stereo_mode="left_side"),
                             16000)
    assert mixed.ndim == 1 and len(mixed) == len(x)  # stereo downmixes
