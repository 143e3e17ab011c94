"""MPEG-1 video codec (functions/mpeg1.py): roundtrip fidelity,
inter-frame compression gain, GOP random access, container plumbing.

No Ray here — the distributed path is covered by the
``media_mpeg1_frames(_check)`` query pair; these pin the codec itself.
"""

import numpy as np
import pytest

from flink_fingerprint_ray.functions.mpeg1 import (
    decode_mpeg1,
    decode_mpeg1_frame,
    encode_mpeg1,
    mpeg1_n_frames,
    mpeg1_picture_offsets,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 10 * np.log10(255.0**2 / max(mse, 1e-12))


def _clip(h: int, w: int, nf: int, luma_tex: bool = True) -> list[np.ndarray]:
    """Seeded clip: translating texture (motion-compensatable) + a flat
    green level stamping the frame number."""
    gx = np.broadcast_to(np.linspace(0, 255, w)[None, :], (h, w))
    gy = np.broadcast_to(np.linspace(0, 255, h)[:, None], (h, w))
    frames = []
    for f in range(nf):
        tex = np.clip(127.5 + 70 * np.sin((gx + 3.0 * f) / 6.0)
                      * np.cos(gy / 5.0), 0, 255)
        if luma_tex:
            img = np.stack([np.minimum(0.5 * gx + 0.5 * tex, 255),
                            np.full((h, w), min(f * 12.0, 255.0)),
                            tex], axis=2)
        else:  # chroma-smooth: gradients + the flat frame stamp only
            img = np.stack([gx, gy,
                            np.full((h, w), min(f * 12.0, 255.0))], axis=2)
        frames.append(img.astype(np.uint8))
    return frames


def test_roundtrip_psnr_and_shapes():
    # 33x47: not multiples of 16, so padding + cropping are exercised
    frames = _clip(33, 47, 13)
    payload = encode_mpeg1(frames, gop_size=6)
    dec = decode_mpeg1(payload)
    assert len(dec) == 13
    for a, b in zip(frames, dec):
        assert b.shape == a.shape and b.dtype == np.uint8
        # the texture rides chroma too, so 4:2:0 bounds this clip ~23 dB
        assert _psnr(a, b) > 22.0
        # the flat green frame stamp survives quantization
        assert abs(float(b[:, :, 1].mean()) - float(a[:, :, 1].mean())) < 6.0
    # chroma-smooth content at the same settings decodes far cleaner —
    # pins that the loss above is the 4:2:0 operating point, not a bug
    smooth = _clip(33, 47, 13, luma_tex=False)
    dec_s = decode_mpeg1(encode_mpeg1(smooth, gop_size=6))
    assert min(_psnr(a, b) for a, b in zip(smooth, dec_s)) > 34.0


def test_quantizer_scale_tradeoff():
    frames = _clip(32, 48, 8)
    fine = encode_mpeg1(frames, gop_size=6, qscale_i=2, qscale_p=2)
    coarse = encode_mpeg1(frames, gop_size=6, qscale_i=12, qscale_p=16)
    assert len(fine) > 2 * len(coarse)
    p_fine = min(_psnr(a, b) for a, b in zip(frames, decode_mpeg1(fine)))
    p_coarse = min(_psnr(a, b) for a, b in zip(frames, decode_mpeg1(coarse)))
    assert p_fine > p_coarse > 20.0


def test_inter_coding_beats_all_intra():
    """P pictures with motion compensation must compress translating
    content better than an all-I stream of the same quality settings —
    the property that makes this a VIDEO codec, not a JPEG container."""
    frames = _clip(32, 48, 12)
    gop = encode_mpeg1(frames, gop_size=6)
    all_i = encode_mpeg1(frames, gop_size=1, qscale_i=6)
    assert len(gop) < 0.8 * len(all_i)


def test_gop_seek_matches_full_decode_exactly():
    frames = _clip(32, 32, 14)
    payload = encode_mpeg1(frames, gop_size=6)
    full = decode_mpeg1(payload)
    for k in (0, 3, 5, 6, 11, 13):
        assert np.array_equal(decode_mpeg1_frame(payload, k), full[k])
    with pytest.raises(IndexError):
        decode_mpeg1_frame(payload, 14)


def test_container_scan_without_entropy_decode():
    frames = _clip(16, 16, 17)
    payload = encode_mpeg1(frames, gop_size=6)
    assert mpeg1_n_frames(payload) == 17
    offs, types = mpeg1_picture_offsets(payload)
    assert len(offs) == 17
    # GOP 6: pictures 0, 6, 12 are I (type 1), the rest P (type 2)
    assert [t for t in types] == [1 if f % 6 == 0 else 2 for f in range(17)]


def test_grayscale_and_single_frame():
    g = (np.arange(32 * 48, dtype=np.uint8).reshape(32, 48) * 3) % 251
    payload = encode_mpeg1([g], gop_size=4, qscale_i=2)
    (dec,) = decode_mpeg1(payload)
    assert dec.shape == (32, 48, 3)
    assert _psnr(np.repeat(g[:, :, None], 3, axis=2), dec) > 30.0


def test_skipped_macroblocks_roundtrip():
    """A static clip makes every interior P macroblock skippable; the
    stream must stay decodable and bit-cheap (P pictures ~header-sized)."""
    frames = [_clip(48, 64, 1)[0]] * 9
    payload = encode_mpeg1(frames, gop_size=9)
    dec = decode_mpeg1(payload)
    assert len(dec) == 9
    for b in dec[1:]:
        assert np.array_equal(b, dec[0])
    # each all-skip P picture costs only headers + the unskippable
    # first/last macroblock per slice — ~30 bytes, far below an I frame
    i_only = encode_mpeg1(frames[:1], gop_size=9)
    per_p = (len(payload) - len(i_only)) / 8.0
    assert per_p < 40.0 and per_p < len(i_only) / 8.0


def test_corrupt_payload_refused():
    frames = _clip(16, 16, 3)
    payload = bytearray(encode_mpeg1(frames))
    clean = decode_mpeg1(bytes(payload))
    with pytest.raises(ValueError):
        decode_mpeg1(b"\x00\x00\x02\xb3" + bytes(payload[4:]))
    for i in range(40, 44):
        payload[i] ^= 0xFF  # flip bits inside the first picture's slices
    try:
        out = decode_mpeg1(bytes(payload))
        # a lucky flip may still parse — but never to the right pixels
        assert len(out) != len(clean) or not all(
            np.array_equal(a, b) for a, b in zip(out, clean))
    except (ValueError, IndexError):
        pass


def test_library_decoder_dispatch_and_stage():
    from flink_fingerprint_ray.stages.media import (
        LibraryDecoder,
        VideoFrameSampleStage,
        make_mpeg1_media,
    )

    tbl = make_mpeg1_media(6, seed=3)
    dec = LibraryDecoder()
    p0 = tbl["payload"][0].as_py()
    nf0 = int(tbl["n_frames"][0].as_py())
    assert dec.n_video_frames(p0) == nf0
    img = dec.decode_video_frame(p0, 4)
    assert abs(float(img[:, :, 1].mean()) - 48.0) < 10.0  # frame 4 stamp
    stage = VideoFrameSampleStage(decoder="library", every=4)
    out = stage(tbl).to_pandas()
    want = int(sum((int(c) + 3) // 4 for c in tbl["n_frames"].to_numpy()))
    assert len(out) == want
    # sampled frame means are green-stamp-ordered within each payload
    g0 = out[out.media_id == 0].sort_values("frame_no")
    assert g0.frame_mean.is_monotonic_increasing
