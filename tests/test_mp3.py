"""MPEG-1 Audio Layer III codec tests (functions/mp3.py) — pure
single-process numpy, no Ray."""
import numpy as np
import pytest

from flink_fingerprint_ray.functions.mp3 import (
    FRAME_BYTES,
    FRAME_SAMPLES,
    GRANULE_STEPS,
    SAMPLE_RATE,
    TOTAL_DELAY,
    _bv_table,
    _granules_to_lines,
    _lines_to_granules,
    decode_mp3,
    encode_mp3,
)


def _tonal(n: int, seed: int = 11) -> np.ndarray:
    rng = np.random.RandomState(seed)
    t = np.arange(n) / SAMPLE_RATE
    return np.clip(0.5 * np.sin(2 * np.pi * 440 * t)
                   + 0.25 * np.sin(2 * np.pi * 1870 * t)
                   + rng.normal(0, 0.01, n), -0.99, 0.99)


def _snr(x, y):
    err = x - y[:len(x)]
    return 10 * np.log10((x @ x) / (err @ err))


def test_hybrid_filterbank_perfect_reconstruction():
    """MDCT + inverse-alias / alias + IMDCT-overlap-add is an exact
    inverse pair (one-granule latency)."""
    rng = np.random.RandomState(0)
    S = rng.randn(8 * GRANULE_STEPS, 32)
    S2 = _lines_to_granules(_granules_to_lines(S))
    err = S2[GRANULE_STEPS:] - S[:-GRANULE_STEPS]
    ref = S[:-GRANULE_STEPS]
    assert 10 * np.log10((ref ** 2).sum() / (err ** 2).sum()) > 200


def test_roundtrip_snr_and_rate():
    x = _tonal(SAMPLE_RATE // 2)
    enc = encode_mp3(x)
    assert len(enc) % FRAME_BYTES == 0          # whole 320 kbps frames
    # 320 kbps = 5/12 of 768 kbps 16-bit PCM
    n_frames = -(-(len(x) + TOTAL_DELAY) // FRAME_SAMPLES)
    assert len(enc) == n_frames * FRAME_BYTES
    y, sr = decode_mp3(enc)
    assert sr == SAMPLE_RATE
    assert _snr(x, y) > 40.0


@pytest.mark.parametrize("scf", [1, 2, 3])
def test_scalefactors_and_scfsi_on_the_wire(scf):
    """uniform_scf writes real scalefactor + SCFSI syntax; the decoder's
    requant (2^(-(sfs+1)/2·scf) per band) must recover the signal at
    the same fidelity as the plain path."""
    x = _tonal(9000, seed=5)
    y0, _ = decode_mp3(encode_mp3(x))
    y1, _ = decode_mp3(encode_mp3(x, uniform_scf=scf))
    assert _snr(x, y1) > 40.0
    # same signal, not a rescaled one (top region compensated too)
    assert np.abs(y0[:len(x)] - y1[:len(x)]).max() < 0.01


def test_escape_linbits_path():
    """Wideband loud noise forces big-values escapes (|ix| > 15) through
    the 13-bit linbits extension and the rate loop."""
    rng = np.random.RandomState(3)
    x = np.clip(rng.randn(20000) * 0.5, -0.99, 0.99)
    y, _ = decode_mp3(encode_mp3(x))
    assert _snr(x, y) > 20.0


def test_int16_input_path():
    x = (_tonal(6000) * 32767).astype(np.int16)
    y, _ = decode_mp3(encode_mp3(x))
    assert _snr(x.astype(np.float64) / 32768.0, y) > 40.0


def test_silence_is_exact():
    y, _ = decode_mp3(encode_mp3(np.zeros(5000)))
    assert np.abs(y).max() == 0.0


def test_broken_sync_and_wrong_operating_point_raise():
    x = _tonal(4000)
    enc = bytearray(encode_mp3(x))
    enc[0] = 0x00
    with pytest.raises(ValueError):
        decode_mp3(bytes(enc))
    with pytest.raises(ValueError):
        encode_mp3(x, sample_rate=44100)
    # a Layer II stream must be refused by the Layer III decoder
    from flink_fingerprint_ray.functions.mp2 import encode_mp2
    with pytest.raises(ValueError):
        decode_mp3(encode_mp2(x))


def test_id3_tags_are_skipped():
    """Web MP3s carry ID3v2 headers and ID3v1 trailers; the decoder must
    skip both (syncsafe size arithmetic) and decode the frames."""
    x = _tonal(6000, seed=7)
    enc = encode_mp3(x)
    body = b"TPE1\x00\x00\x00\x05\x00\x00\x00engn" * 8
    size = len(body)
    syncsafe = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                      (size >> 7) & 0x7F, size & 0x7F])
    tagged = b"ID3\x04\x00\x00" + syncsafe + body + enc \
        + b"TAG" + b"\x00" * 125
    y, _ = decode_mp3(tagged)
    assert _snr(x, y) > 40.0
    # dispatch accepts the ID3-prefixed payload too
    from flink_fingerprint_ray.stages.media import LibraryDecoder
    y2 = LibraryDecoder().decode_audio(tagged, SAMPLE_RATE)
    assert np.allclose(y2[:len(x)], y[:len(x)], atol=1e-6)


def test_determinism():
    x = _tonal(7000, seed=9)
    assert encode_mp3(x) == encode_mp3(x)


def test_bv_table_is_prefix_free_and_complete():
    t = _bv_table()
    lens, codes = t["len"], t["code"]
    assert len(set(zip(lens.tolist(), codes.tolist()))) == 256
    # Kraft equality for a complete prefix code
    assert sum(2.0 ** (-int(ln)) for ln in lens) == pytest.approx(1.0)
    # canonical: no code is a prefix of another
    seen = set()
    for ln, c in sorted(zip(lens.tolist(), codes.tolist())):
        for pl, pc in seen:
            assert not (pl <= ln and (c >> (ln - pl)) == pc)
        seen.add((ln, c))


def test_library_decoder_dispatch():
    from flink_fingerprint_ray.stages.media import LibraryDecoder

    x = _tonal(5000, seed=21)
    y = LibraryDecoder().decode_audio(encode_mp3(x), SAMPLE_RATE)
    assert y.dtype == np.float32
    assert _snr(x, y.astype(np.float64)) > 40.0
