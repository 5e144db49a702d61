"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The Ray-side plumbing — schemas, actor-pool stages, batch sizing, output
layout — is real and tested, and so is the default codec layer:

- images: a pure-numpy 24-bit uncompressed **BMP** encoder/decoder
  (``bmp_encode`` / ``bmp_decode``) and a pure-stdlib **PNG** codec
  (``png_encode`` / ``png_decode`` — zlib inflate + numpy scanline-filter
  reconstruction; 8-bit gray/RGB/RGBA, all five filters) — real,
  externally-readable byte formats, no third-party library needed;
- audio: stdlib ``wave`` PCM16 **WAV** encode/decode (``wav_encode`` /
  ``wav_decode``);
- video: a length-prefixed frame container (``video_encode`` /
  ``video_frames``, magic ``HQV1``) whose frames are themselves BMPs, so
  frame-sampling composes with the image decoder.

``_load_image_codec`` / ``_load_audio_codec`` still prefer the richer
optional libraries when present (PIL / soundfile — absent in this
container) and fall back to the built-in codecs by sniffing the payload
magic.  Only a payload in an UNRECOGNIZED format hits the clearly-marked
deterministic fake (kept so foreign fixtures remain exercisable); decode
stages report which path decoded EACH payload via the per-row
``real_decode`` column (False = fabricated metadata from the fake), and
``stage.real_codec`` says whether the optional library is present.

Batch sizing: binary payloads are large — these stages default to small
``batch_size`` so (batch × concurrency) stays within worker heap; Ray blocks
carrying big binary columns should also get a larger
``DataContext.target_max_block_size`` so they aren't split absurdly small.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa

DEFAULT_BINARY_BATCH_SIZE = 64  # rows per batch for payload-heavy stages

VIDEO_MAGIC = b"HQV1"


def _content_rng(payload: bytes) -> np.random.Generator:
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "little")
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# built-in codecs (pure numpy / stdlib — real byte formats)
# ---------------------------------------------------------------------------

def bmp_encode(arr: np.ndarray) -> bytes:
    """RGB uint8 array (h, w, 3) → 24-bit uncompressed BMP bytes
    (BITMAPINFOHEADER, bottom-up rows, 4-byte row padding — readable by any
    image viewer)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"bmp_encode expects (h, w, 3) RGB, got {arr.shape}")
    h, w = arr.shape[:2]
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    bgr = arr[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    if pad:
        padded = np.zeros((h, row_bytes + pad), dtype=np.uint8)
        padded[:, :row_bytes] = bgr.reshape(h, row_bytes)
        pixels = padded.tobytes()
    else:
        pixels = bgr.tobytes()
    image_size = len(pixels)
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + image_size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    return header + pixels


def bmp_decode(payload: bytes) -> Tuple[int, int, int, np.ndarray]:
    """24-bit uncompressed BMP bytes → (width, height, 3, RGB uint8 array).
    Handles both bottom-up (positive height) and top-down (negative) rows."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h_signed = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (bpp={bpp}, compression={compression}); "
            "the built-in codec reads 24-bit uncompressed only")
    h = abs(h_signed)
    row_bytes = w * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=offset
    ).reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if h_signed > 0:  # bottom-up
        rows = rows[::-1]
    return w, h, 3, np.ascontiguousarray(rows[:, :, ::-1])  # BGR → RGB


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def png_encode(arr: np.ndarray) -> bytes:
    """RGB uint8 array (h, w, 3) → PNG bytes (pure stdlib: zlib-compressed
    8-bit truecolor, filter 0 on every scanline, non-interlaced, CRC'd
    chunks — readable by any PNG decoder)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"png_encode expects (h, w, 3) RGB, got {arr.shape}")
    h, w = arr.shape[:2]
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)  # filter byte 0 per row
    raw[:, 1:] = arr.reshape(h, w * 3)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
            + chunk(b"IEND", b""))


def png_decode(payload: bytes) -> Tuple[int, int, int, np.ndarray]:
    """PNG bytes → (width, height, 3, RGB uint8 array) — pure stdlib
    (zlib inflate + numpy filter reconstruction; PNG spec §6/§9).

    Supports 8-bit grayscale (expanded to RGB), truecolor and
    truecolor+alpha (alpha dropped, PIL ``convert("RGB")`` parity),
    non-interlaced, all five scanline filters.  Filters 0/1/2 (none /
    sub / up) reconstruct fully vectorized (sub is a per-channel-lane
    cumsum); 3/4 (average / paeth) are inherently sequential in the left
    neighbor, so those ROWS pay a per-pixel loop — our own
    :func:`png_encode` emits filter 0 only, so round-trip decode stays
    vectorized.  Unsupported variants (16-bit, palette, interlaced)
    raise ``ValueError`` like :func:`bmp_decode` does."""
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload (missing PNG signature)")
    off, ihdr, idat = 8, None, []
    while off + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, off)
        ctype = payload[off + 4:off + 8]
        data = payload[off + 8:off + 8 + ln]
        off += 12 + ln  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("corrupt PNG (missing IHDR/IDAT)")
    w, h, depth, color, comp, filt, interlace = ihdr
    if (depth != 8 or comp != 0 or filt != 0 or interlace != 0
            or color not in (0, 2, 6)):
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color_type={color}, "
            f"interlace={interlace}); the built-in codec reads 8-bit "
            "gray/RGB/RGBA non-interlaced only")
    ch = {0: 1, 2: 3, 6: 4}[color]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (1 + stride):
        raise ValueError("corrupt PNG pixel data (scanline size mismatch)")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    ftypes = lines[:, 0]
    recon = np.zeros((h, stride), dtype=np.uint8)
    zero_row = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = int(ftypes[y])
        row = lines[y, 1:].astype(np.int32)
        prior = recon[y - 1].astype(np.int32) if y else zero_row
        if f == 0:
            recon[y] = row
        elif f == 1:  # sub: recon[x] = raw[x] + recon[x-bpp] — lane cumsum
            recon[y] = (row.reshape(w, ch).cumsum(axis=0) % 256).reshape(
                stride)
        elif f == 2:  # up
            recon[y] = (row + prior) % 256
        elif f == 3:  # average — sequential in the left neighbor
            out = np.empty(stride, dtype=np.int32)
            left = np.zeros(ch, dtype=np.int32)
            for x in range(w):
                sl = slice(x * ch, (x + 1) * ch)
                out[sl] = (row[sl] + ((left + prior[sl]) >> 1)) % 256
                left = out[sl]
            recon[y] = out
        elif f == 4:  # paeth — sequential in the left neighbor
            out = np.empty(stride, dtype=np.int32)
            left = np.zeros(ch, dtype=np.int32)
            ul = np.zeros(ch, dtype=np.int32)
            for x in range(w):
                sl = slice(x * ch, (x + 1) * ch)
                up = prior[sl]
                p = left + up - ul
                pa_l, pa_u, pa_ul = (np.abs(p - left), np.abs(p - up),
                                     np.abs(p - ul))
                pred = np.where(
                    (pa_l <= pa_u) & (pa_l <= pa_ul), left,
                    np.where(pa_u <= pa_ul, up, ul))
                out[sl] = (row[sl] + pred) % 256
                left, ul = out[sl], up
            recon[y] = out
        else:
            raise ValueError(f"bad PNG filter type {f}")
    px = recon.reshape(h, w, ch)
    if color == 0:
        rgb = np.repeat(px, 3, axis=2)
    elif color == 2:
        rgb = px
    else:  # RGBA → drop alpha (PIL convert("RGB") parity)
        rgb = px[:, :, :3]
    return w, h, 3, np.ascontiguousarray(rgb)


def wav_encode(samples: np.ndarray, rate: int) -> bytes:
    """1-D int16 mono samples → PCM16 WAV bytes (stdlib ``wave``)."""
    import io
    import wave

    samples = np.ascontiguousarray(samples, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


def wav_decode(payload: bytes) -> Tuple[int, np.ndarray]:
    """PCM16 WAV bytes → (rate, float32 waveform in [-1, 1)); multi-channel
    inputs are averaged to mono (soundfile-compatible scaling: /32768)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError(
                f"unsupported WAV sample width {f.getsampwidth()} "
                "(built-in codec reads PCM16 only)")
        rate = f.getframerate()
        n_ch = f.getnchannels()
        raw = f.readframes(f.getnframes())
    wavef = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
    if n_ch > 1:
        wavef = wavef.reshape(-1, n_ch).mean(axis=1)
    return rate, wavef


def video_encode(frames: List[bytes]) -> bytes:
    """Frame payloads → ``HQV1`` container: magic + u32 frame count +
    (u32 length, bytes) per frame.  Frames are opaque (BMPs in the
    synthesized fixtures, so frame-sampling composes with the image
    decoder)."""
    out = [VIDEO_MAGIC, struct.pack("<I", len(frames))]
    for fr in frames:
        out.append(struct.pack("<I", len(fr)))
        out.append(fr)
    return b"".join(out)


def video_frames(payload: bytes) -> List[bytes]:
    """Parse an ``HQV1`` container back into its frame payloads."""
    if payload[:4] != VIDEO_MAGIC:
        raise ValueError("not an HQV1 video payload")
    (n,) = struct.unpack_from("<I", payload, 4)
    frames, off = [], 8
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", payload, off)
        off += 4
        frames.append(payload[off:off + ln])
        off += ln
    return frames


# ---------------------------------------------------------------------------
# codec loading (optional library → built-in format codec → disclosed fake)
# ---------------------------------------------------------------------------

def _load_image_codec():
    try:  # pragma: no cover - PIL not in this container
        import io

        from PIL import Image  # noqa: F401

        def decode(payload: bytes) -> Tuple[int, int, int, np.ndarray, bool]:
            img = Image.open(io.BytesIO(payload)).convert("RGB")
            arr = np.asarray(img)
            return img.width, img.height, 3, arr, True

        return decode, True
    except ImportError:
        def builtin_decode(
                payload: bytes) -> Tuple[int, int, int, np.ndarray, bool]:
            if payload[:2] == b"BM":
                return (*bmp_decode(payload), True)
            if payload[:8] == PNG_MAGIC:
                return (*png_decode(payload), True)
            # STUB fallback for unrecognized formats (JPEG needs a real
            # library): deterministic fake derived from the payload hash —
            # flagged real=False PER PAYLOAD so fabricated metadata is
            # never indistinguishable from a real decode.
            rng = _content_rng(payload)
            w = int(rng.integers(32, 512))
            h = int(rng.integers(32, 512))
            arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            return w, h, 3, arr, False

        return builtin_decode, False  # no optional library present


def _load_audio_codec():
    try:  # pragma: no cover - soundfile not in this container
        import io

        import soundfile as sf

        def decode(payload: bytes) -> Tuple[int, np.ndarray, bool]:
            data, rate = sf.read(io.BytesIO(payload))
            return rate, np.asarray(data, dtype=np.float32), True

        return decode, True
    except ImportError:
        def builtin_decode(payload: bytes) -> Tuple[int, np.ndarray, bool]:
            if payload[:4] == b"RIFF":
                return (*wav_decode(payload), True)
            # STUB fallback for unrecognized formats (mp3/flac need a real
            # library): deterministic fake waveform from the payload hash —
            # flagged real=False PER PAYLOAD (see image codec note).
            rng = _content_rng(payload)
            rate = 16000
            n = int(rng.integers(rate // 2, rate * 3))
            return rate, rng.standard_normal(n).astype(np.float32), False

        return builtin_decode, False  # no optional library present


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
        widths, heights, chans, lumas, reals = [], [], [], [], []
        for payload in batch.column(self.image_col).to_pylist():
            if payload is None:
                widths.append(None); heights.append(None)
                chans.append(None); lumas.append(None); reals.append(None)
                continue
            w, h, c, arr, real = self.decode(payload)
            widths.append(w); heights.append(h); chans.append(c)
            lumas.append(float(arr.mean())); reals.append(real)
        return (
            batch.append_column("width", pa.array(widths, pa.int32()))
            .append_column("height", pa.array(heights, pa.int32()))
            .append_column("channels", pa.array(chans, pa.int32()))
            .append_column("mean_luma", pa.array(lumas, pa.float64()))
            .append_column("real_decode", pa.array(reals, pa.bool_()))
        )


class ImageResizeStage:
    """binary image → fixed-size float feature map (resize + flatten),
    emitted as a ``list<float>`` embedding column (nearest-neighbor resize on
    the decoded array)."""

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
            _w, _h, _c, arr, _real = self.decode(payload)
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
        rates, durs, rmss, reals = [], [], [], []
        for payload in batch.column(self.audio_col).to_pylist():
            if payload is None:
                rates.append(None); durs.append(None); rmss.append(None)
                reals.append(None)
                continue
            rate, wavef, real = self.decode(payload)
            rates.append(rate)
            durs.append(len(wavef) / rate)
            reals.append(real)
            # float64 accumulation: float32 pairwise-mean error is visible
            # at the 1e-8 level and breaks exact-value oracles
            w64 = wavef.astype(np.float64)
            rmss.append(float(np.sqrt(np.mean(w64 * w64))))
        return (
            batch.append_column("sample_rate", pa.array(rates, pa.int32()))
            .append_column("duration_sec", pa.array(durs, pa.float64()))
            .append_column("rms", pa.array(rmss, pa.float64()))
            .append_column("real_decode", pa.array(reals, pa.bool_()))
        )


class FrameSampleStage:
    """binary ``video`` column → up to k evenly-spaced frame payloads.

    ``HQV1`` containers are parsed into their REAL frames; any other
    payload falls back to deterministic byte slices (disclosed stub for
    foreign containers).  Emits one row per (video, frame): flat-map
    shape.  ``frame_idx`` is the frame's index IN THE SOURCE video, so
    downstream consumers can align samples across stages."""

    def __init__(self, video_col: str = "video", id_col: str = "video_id", k: int = 4):
        self.video_col = video_col
        self.id_col = id_col
        self.k = k

    def _frames(self, payload: bytes) -> List[Tuple[int, bytes]]:
        if payload[:4] == VIDEO_MAGIC:
            frames = video_frames(payload)
            if len(frames) <= self.k:
                return list(enumerate(frames))
            pick = np.linspace(0, len(frames) - 1, self.k).round().astype(int)
            return [(int(i), frames[int(i)]) for i in np.unique(pick)]
        # STUB fallback: deterministic byte slices of an opaque container
        n = len(payload)
        step = max(n // self.k, 1)
        return [
            (i, payload[i * step: (i + 1) * step])
            for i in range(min(self.k, n))
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, frames = [], [], []
        for vid, payload in zip(
            batch.column(self.id_col).to_pylist(),
            batch.column(self.video_col).to_pylist(),
        ):
            if payload is None:
                continue
            for i, fr in self._frames(payload):
                ids.append(vid)
                fidx.append(i)
                frames.append(fr)
        return pa.table(
            {
                self.id_col: pa.array(ids, batch.column(self.id_col).type),
                "frame_idx": pa.array(fidx, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


# ---------------------------------------------------------------------------
# deterministic fixtures (REAL payloads with closed-form metadata, so the
# contract oracles can recompute every decoded value from the id alone)
# ---------------------------------------------------------------------------

def synth_image_params(i: int) -> Tuple[int, int, int]:
    """(width, height, fill value) of synthesized image ``i``."""
    return 16 + (i % 13) * 4, 16 + ((i * 7) % 11) * 4, (i * 37) % 256


def synth_audio_params(i: int) -> Tuple[int, int, int]:
    """(rate, n_samples, constant int16 sample value) of audio ``i``."""
    return 16_000, 8_000 + (i % 5) * 4_000, (i * 1_000) % 20_000


def synth_video_params(i: int) -> Tuple[int, ...]:
    """(n_frames, fill value per frame...) of video ``i`` (16×16 frames)."""
    n = 2 + (i % 3)
    return (n,) + tuple((i * 31 + j * 17) % 256 for j in range(n))


def synthesize_binary_table(n: int = 32, seed: int = 0, kind: str = "image") -> pa.Table:
    """Deterministic REAL binary payloads with ids: 24-bit BMPs
    (constant-fill, dimensions/fill from :func:`synth_image_params`),
    PCM16 WAVs (constant sample, :func:`synth_audio_params`) or ``HQV1``
    frame containers of BMPs (:func:`synth_video_params`) — every decoded
    metric is a closed-form function of the id, which is what the contract
    oracles recompute in SQL.  ``seed`` keeps the legacy signature (the
    payloads are id-deterministic, not random)."""
    ids = list(range(n))
    if kind == "image":
        payloads = []
        for i in ids:
            w, h, v = synth_image_params(i)
            payloads.append(bmp_encode(np.full((h, w, 3), v, np.uint8)))
        col, id_col = "image", "image_id"
    elif kind == "image_mixed":
        # alternating real byte formats: even ids 24-bit BMP, odd ids
        # 8-bit truecolor PNG — same closed-form pixel content, so one
        # oracle covers both decode paths and real_decode is TRUE for all
        payloads = []
        for i in ids:
            w, h, v = synth_image_params(i)
            arr = np.full((h, w, 3), v, np.uint8)
            payloads.append(bmp_encode(arr) if i % 2 == 0
                            else png_encode(arr))
        col, id_col = "image", "image_id"
    elif kind == "audio":
        payloads = []
        for i in ids:
            rate, ns, val = synth_audio_params(i)
            payloads.append(wav_encode(np.full(ns, val, np.int16), rate))
        col, id_col = "audio", "audio_id"
    elif kind == "video":
        payloads = []
        for i in ids:
            params = synth_video_params(i)
            frames = [
                bmp_encode(np.full((16, 16, 3), fv, np.uint8))
                for fv in params[1:]
            ]
            payloads.append(video_encode(frames))
        col, id_col = "video", "video_id"
    else:
        raise ValueError(f"unknown kind {kind!r}")
    return pa.table({id_col: pa.array(ids, pa.int64()), col: pa.array(payloads, pa.binary())})
