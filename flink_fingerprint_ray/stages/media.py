"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

The decode kernels themselves are STUBBED (the image/audio libraries are
not in this container): ``FakeDecoder`` produces deterministic
hash-derived pixels/samples so the Ray-side plumbing — schema, batch
size, actor signature, output layout — is real and tested, and
``LibraryDecoder`` raises ``NotImplementedError`` with the exact place a
real codec plugs in.

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


class LibraryDecoder:
    """The real-codec slot. In production this would hold a PIL/libav
    handle loaded once per actor; the libraries are not in this container."""

    def decode_image(self, payload: bytes, width: int, height: int) -> np.ndarray:
        raise NotImplementedError(
            "real image decode requires PIL/opencv — not available in this "
            "container; plug the codec in here (loaded once per actor)"
        )

    def decode_audio(self, payload: bytes, sample_rate: int) -> np.ndarray:
        raise NotImplementedError("real audio decode requires libav/soundfile")


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


class ImageDecodeStage:
    """Actor-pool stage: decode → resize (nearest-neighbor, pure numpy) →
    per-image features. Decoder built ONCE per actor in __init__."""

    def __init__(self, target_size: tuple[int, int] = (32, 32), use_fake: bool = True) -> None:
        self.target = target_size
        self.decoder = FakeDecoder() if use_fake else LibraryDecoder()

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
        means, stds, thumbs = [], [], []
        for p, w, h in zip(payloads, widths, heights):
            img = self.decoder.decode_image(p, int(w), int(h))
            small = self._resize(img)
            means.append(float(img.mean()))
            stds.append(float(img.std()))
            thumbs.append(small.tobytes())
        # binary payload dropped here — only features move downstream
        return pa.table(
            {
                "media_id": batch["media_id"],
                "pixel_mean": pa.array(means, pa.float64()),
                "pixel_std": pa.array(stds, pa.float64()),
                "thumb": pa.array(thumbs, pa.binary()),
                "thumb_w": pa.array([self.target[1]] * batch.num_rows, pa.int32()),
                "thumb_h": pa.array([self.target[0]] * batch.num_rows, pa.int32()),
            }
        )


class AudioFeatureStage:
    """Actor-pool stage: decode audio → frame energy features."""

    def __init__(self, frame: int = 400, use_fake: bool = True) -> None:
        self.frame = frame
        self.decoder = FakeDecoder() if use_fake else LibraryDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        rates = batch["sample_rate"].to_numpy()
        energies, durs = [], []
        for p, sr in zip(payloads, rates):
            x = self.decoder.decode_audio(p, int(sr))
            n = (len(x) // self.frame) * self.frame
            frames = x[:n].reshape(-1, self.frame)
            energies.append(float((frames**2).mean()) if n else 0.0)
            durs.append(len(x) / max(int(sr), 1))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "energy": pa.array(energies, pa.float64()),
                "duration_s": pa.array(durs, pa.float64()),
            }
        )


class VideoFrameSampleStage:
    """Actor-pool stage: sample every k-th frame of a fake video payload
    and emit one row per sampled frame (flat_map-shaped output)."""

    def __init__(self, every: int = 4, use_fake: bool = True) -> None:
        self.every = every
        self.decoder = FakeDecoder() if use_fake else LibraryDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames_out, frame_nos = [], [], []
        for mid, p, w, h, nf in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["width"].to_numpy(),
            batch["height"].to_numpy(),
            batch["n_frames"].to_numpy(),
        ):
            for f in range(0, int(nf), self.every):
                img = self.decoder.decode_image(p + f.to_bytes(4, "little"), int(w), int(h))
                ids.append(mid)
                frame_nos.append(f)
                frames_out.append(float(img.mean()))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_no": pa.array(frame_nos, pa.int32()),
                "frame_mean": pa.array(frames_out, pa.float64()),
            }
        )
