"""MPEG-1 Audio Layer II codec tests (functions/mp2.py)."""

import numpy as np
import pytest

from flink_fingerprint_ray.functions.mp2 import (
    FRAME_SAMPLES,
    SAMPLE_RATE,
    _analyze,
    _synthesize,
    decode_mp2,
    encode_mp2,
)


def _tonal(seconds=1.0, seed=7, freqs=(440.0, 1870.0, 6500.0)):
    sr = SAMPLE_RATE
    t = np.arange(int(sr * seconds)) / sr
    rng = np.random.RandomState(seed)
    x = sum(a * np.sin(2 * np.pi * f * t)
            for a, f in zip((0.5, 0.25, 0.1), freqs))
    return np.clip(x + rng.normal(0, 0.01, len(t)), -0.99, 0.99)


def _snr(ref, out):
    err = ref - out[:len(ref)]
    return 10 * np.log10((ref @ ref) / (err @ err))


def test_filterbank_near_perfect_reconstruction():
    # unquantized analysis->synthesis: the NPR prototype's aliasing
    # floor (measured ~50 dB at design time) must stay above 45 dB
    rng = np.random.RandomState(0)
    x = rng.standard_normal(32 * 400)
    S = _analyze(np.concatenate([x, np.zeros(512)]))
    y = _synthesize(S)[481:]
    seg = slice(0, len(x) - 600)
    assert _snr(x[seg], y[seg]) > 45.0


def test_roundtrip_snr_and_rate():
    x = _tonal(1.0)
    enc = encode_mp2(x)
    # 192 kbps at 48 kHz: every frame is exactly 576 bytes
    assert len(enc) % 576 == 0
    y, sr = decode_mp2(enc)
    assert sr == SAMPLE_RATE
    assert len(y) >= len(x)
    assert _snr(x, y) > 28.0


def test_int16_input_path():
    x = _tonal(0.3)
    xi = (x * 32767).astype(np.int16)
    y, _ = decode_mp2(encode_mp2(xi))
    assert _snr(x, y) > 25.0


def test_frame_count_covers_input_plus_delay():
    x = _tonal(0.25)
    enc = encode_mp2(x)
    n_frames = len(enc) // 576
    assert n_frames == -(-(len(x) + 481) // FRAME_SAMPLES)
    y, _ = decode_mp2(enc)
    assert len(y) == n_frames * FRAME_SAMPLES


def test_silence_is_cheap_and_exact():
    y, _ = decode_mp2(encode_mp2(np.zeros(FRAME_SAMPLES)))
    assert np.abs(y).max() < 1e-6


def test_broken_sync_and_wrong_operating_point_raise():
    enc = bytearray(encode_mp2(_tonal(0.1)))
    enc[0] = 0x00
    with pytest.raises(ValueError):
        decode_mp2(bytes(enc))
    with pytest.raises(ValueError):
        encode_mp2(_tonal(0.1), sample_rate=44100)
    with pytest.raises(ValueError):
        decode_mp2(b"\x00" * 64)


def test_determinism():
    x = _tonal(0.2, seed=3)
    assert encode_mp2(x) == encode_mp2(x)


def test_library_decoder_dispatch():
    from flink_fingerprint_ray.stages.media import LibraryDecoder

    x = _tonal(0.2)
    enc = encode_mp2(x)
    y = LibraryDecoder().decode_audio(enc, SAMPLE_RATE)
    assert y.dtype == np.float32
    assert _snr(x, y.astype(np.float64)) > 25.0
