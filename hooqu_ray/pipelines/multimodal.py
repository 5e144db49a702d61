"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The Ray-side plumbing — schemas, actor-pool stages, batch sizing, output
layout — is real and tested; the codec layer is STUBBED behind
``_load_image_codec`` / ``_load_audio_codec`` because this container ships no
image/audio libraries.  Each loader first tries the real library (PIL /
soundfile); absent that it installs a clearly-marked deterministic fake that
derives plausible metadata/features from a content hash, so every stage is
exercisable end-to-end and swapping in the real codec is a one-function
change.

Batch sizing: binary payloads are large — these stages default to small
``batch_size`` so (batch × concurrency) stays within worker heap; Ray blocks
carrying big binary columns should also get a larger
``DataContext.target_max_block_size`` so they aren't split absurdly small.
"""

from __future__ import annotations

import hashlib
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

DEFAULT_BINARY_BATCH_SIZE = 64  # rows per batch for payload-heavy stages


def _content_rng(payload: bytes) -> np.random.Generator:
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "little")
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# codec loading (real library if present, deterministic fake otherwise)
# ---------------------------------------------------------------------------

def _load_image_codec():
    try:  # pragma: no cover - PIL not in this container
        from PIL import Image  # noqa: F401
        import io

        def decode(payload: bytes) -> Tuple[int, int, int, np.ndarray]:
            img = Image.open(io.BytesIO(payload)).convert("RGB")
            arr = np.asarray(img)
            return img.width, img.height, 3, arr

        return decode, True
    except ImportError:
        def fake_decode(payload: bytes) -> Tuple[int, int, int, np.ndarray]:
            # STUB: deterministic fake — dimensions and pixels derived from
            # the payload hash.  Replace by installing Pillow.
            rng = _content_rng(payload)
            w = int(rng.integers(32, 512))
            h = int(rng.integers(32, 512))
            arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            return w, h, 3, arr

        return fake_decode, False


def _load_audio_codec():
    try:  # pragma: no cover - soundfile not in this container
        import io

        import soundfile as sf

        def decode(payload: bytes) -> Tuple[int, np.ndarray]:
            data, rate = sf.read(io.BytesIO(payload))
            return rate, np.asarray(data, dtype=np.float32)

        return decode, True
    except ImportError:
        def fake_decode(payload: bytes) -> Tuple[int, np.ndarray]:
            # STUB: deterministic fake waveform from the payload hash.
            rng = _content_rng(payload)
            rate = 16000
            n = int(rng.integers(rate // 2, rate * 3))
            return rate, rng.standard_normal(n).astype(np.float32)

        return fake_decode, False


# ---------------------------------------------------------------------------
# stages (actor pools: codec resolved once per actor in __init__)
# ---------------------------------------------------------------------------

class ImageDecodeStage:
    """binary ``image`` column → (width, height, channels, mean_luma).

    Use with ``ds.map_batches(ImageDecodeStage, concurrency=N,
    batch_size=DEFAULT_BINARY_BATCH_SIZE, batch_format="pyarrow")``."""

    def __init__(self, image_col: str = "image"):
        self.image_col = image_col
        self.decode, self.real_codec = _load_image_codec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, chans, lumas = [], [], [], []
        for payload in batch.column(self.image_col).to_pylist():
            if payload is None:
                widths.append(None); heights.append(None)
                chans.append(None); lumas.append(None)
                continue
            w, h, c, arr = self.decode(payload)
            widths.append(w); heights.append(h); chans.append(c)
            lumas.append(float(arr.mean()))
        return (
            batch.append_column("width", pa.array(widths, pa.int32()))
            .append_column("height", pa.array(heights, pa.int32()))
            .append_column("channels", pa.array(chans, pa.int32()))
            .append_column("mean_luma", pa.array(lumas, pa.float64()))
        )


class ImageResizeStage:
    """binary image → fixed-size float feature map (resize + flatten),
    emitted as a ``list<float>`` embedding column (nearest-neighbor resize on
    the decoded array; fake decoder applies the same math)."""

    def __init__(self, image_col: str = "image", size: int = 16):
        self.image_col = image_col
        self.size = size
        self.decode, self.real_codec = _load_image_codec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        s = self.size
        for payload in batch.column(self.image_col).to_pylist():
            if payload is None:
                feats.append(None)
                continue
            _w, _h, _c, arr = self.decode(payload)
            ys = (np.linspace(0, arr.shape[0] - 1, s)).astype(int)
            xs = (np.linspace(0, arr.shape[1] - 1, s)).astype(int)
            small = arr[np.ix_(ys, xs)].mean(axis=2) / 255.0
            feats.append(small.astype(np.float32).ravel())
        return batch.append_column(
            "image_embedding", pa.array(feats, pa.list_(pa.float32()))
        )


class AudioFeatureStage:
    """binary ``audio`` column → (sample_rate, duration_sec, rms energy)."""

    def __init__(self, audio_col: str = "audio"):
        self.audio_col = audio_col
        self.decode, self.real_codec = _load_audio_codec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        rates, durs, rmss = [], [], []
        for payload in batch.column(self.audio_col).to_pylist():
            if payload is None:
                rates.append(None); durs.append(None); rmss.append(None)
                continue
            rate, wave = self.decode(payload)
            rates.append(rate)
            durs.append(len(wave) / rate)
            rmss.append(float(np.sqrt(np.mean(wave**2))))
        return (
            batch.append_column("sample_rate", pa.array(rates, pa.int32()))
            .append_column("duration_sec", pa.array(durs, pa.float64()))
            .append_column("rms", pa.array(rmss, pa.float64()))
        )


class FrameSampleStage:
    """binary ``video`` column → k evenly-spaced "frame" payload slices.

    Without a video codec (STUB) a frame is a deterministic byte slice of the
    payload; with one, replace ``_frames`` to decode real frames.  Emits one
    row per (video, frame): flat-map shape."""

    def __init__(self, video_col: str = "video", id_col: str = "video_id", k: int = 4):
        self.video_col = video_col
        self.id_col = id_col
        self.k = k

    def _frames(self, payload: bytes):
        n = len(payload)
        step = max(n // self.k, 1)
        return [payload[i * step : (i + 1) * step] for i in range(min(self.k, n))]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, frames = [], [], []
        for vid, payload in zip(
            batch.column(self.id_col).to_pylist(),
            batch.column(self.video_col).to_pylist(),
        ):
            if payload is None:
                continue
            for i, fr in enumerate(self._frames(payload)):
                ids.append(vid)
                fidx.append(i)
                frames.append(fr)
        return pa.table(
            {
                self.id_col: pa.array(ids),
                "frame_idx": pa.array(fidx, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def synthesize_binary_table(n: int = 32, seed: int = 0, kind: str = "image") -> pa.Table:
    """Deterministic opaque-binary test payloads with ids."""
    rng = np.random.default_rng(seed)
    ids = list(range(n))
    payloads = [rng.bytes(int(rng.integers(256, 4096))) for _ in ids]
    col = {"image": "image", "audio": "audio", "video": "video"}[kind]
    id_col = {"image": "image_id", "audio": "audio_id", "video": "video_id"}[kind]
    return pa.table({id_col: pa.array(ids, pa.int64()), col: pa.array(payloads, pa.binary())})
