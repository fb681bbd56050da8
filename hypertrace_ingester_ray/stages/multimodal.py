"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride the pipeline as ``binary`` columns with metadata
columns (mime, width/height/duration).  The Ray-side plumbing — schema,
actor-pool stage shape, small-batch sizing, output layout — is real and
tested.  Decode support is split honestly by what this container allows:

- ``image/bmp`` and ``image/x-portable-pixmap`` (PPM P6) are DECODED FOR
  REAL — pure-numpy header parse + pixel reshape (no codec library needed)
  — and feed real per-channel statistics + intensity-histogram features.
- codec formats (png/jpeg/audio/video) are STUBBED: ``decode_stub=True``
  produces deterministic fake features, ``decode_stub=False`` raises
  ``NotImplementedError`` where a real ``PIL.Image.open`` /
  ``soundfile.read`` call belongs.

Scale notes: payload stages must use SMALL batch sizes (``batch_size=B`` with
B × payload_size × concurrency bounded by worker heap) and an actor pool
(model/codec init per worker).  ``ray.data`` spills oversized binary blocks
to the object store automatically; keep ``target_max_block_size`` in mind for
>10 MB payloads.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("payload", pa.binary()),
        pa.field("mime", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
    ]
)

FEATURE_DIM = 16


def synthesize_media(n: int, *, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media table (stands in for an image corpus)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.bytes(payload_bytes) for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/png"] * n, pa.string()),
            "width": pa.array(rng.integers(64, 2048, n, dtype=np.int32)),
            "height": pa.array(rng.integers(64, 2048, n, dtype=np.int32)),
        }
    )


class MediaFeatureExtractor:
    """Actor-pool stage: decode → feature-extract per batch.

    ``__init__`` is where a real implementation loads the codec / model once
    per actor.  ``__call__`` is vectorized over the batch.
    """

    def __init__(self, *, decode_stub: bool = True, feature_dim: int = FEATURE_DIM):
        self.decode_stub = decode_stub
        self.feature_dim = feature_dim
        # codec loaded ONCE per actor: real PIL when the environment has it,
        # else the declared stub (this container ships no codec libs)
        try:
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            self._pil = None

    def _decode(self, payload: bytes, mime: str) -> np.ndarray:
        # REAL decode for codec-free formats (pure-numpy parsers below)
        if mime == "image/bmp":
            return image_features(decode_bmp(payload), self.feature_dim)
        if mime == "image/x-portable-pixmap":
            return image_features(decode_ppm(payload), self.feature_dim)
        # codec formats: real decode when a codec library is available
        if self._pil is not None and mime.startswith("image/"):
            import io

            img = self._pil.open(io.BytesIO(payload)).convert("RGB")
            return image_features(np.asarray(img), self.feature_dim)
        if not self.decode_stub:
            raise NotImplementedError(
                f"decode of {mime!r} requires an image/audio codec "
                "(PIL/soundfile), not available in this environment"
            )
        # deterministic fake 'pixels': md5-seeded values
        digest = hashlib.md5(payload).digest()
        seed = int.from_bytes(digest[:8], "little")
        return np.random.default_rng(seed).random(self.feature_dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        mimes = batch["mime"].to_pylist()
        feats = np.stack(
            [self._decode(p, m) for p, m in zip(payloads, mimes)]
        ).astype(np.float32)
        flat = pa.array(feats.reshape(-1))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "mime": batch["mime"],
                "feature": pa.FixedSizeListArray.from_arrays(flat, self.feature_dim),
            }
        )


def extract_media_features(
    ds: Dataset,
    *,
    batch_size: int = 64,
    concurrency: int = 2,
    decode_stub: bool = True,
) -> Dataset:
    """The canonical multimodal stage: actor pool, small batches (payloads are
    heavy), zero-copy Arrow in/out."""
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decode_stub": decode_stub},
        batch_size=batch_size,
        concurrency=concurrency,
        batch_format="pyarrow",
    )


def resize_stub(batch: pa.Table, *, max_side: int = 512) -> pa.Table:
    """Resize planning (pure-metadata part is real; pixel work is stubbed):
    computes target dims preserving aspect ratio."""
    w = batch["width"].to_numpy(zero_copy_only=False).astype(np.float64)
    h = batch["height"].to_numpy(zero_copy_only=False).astype(np.float64)
    scale = np.minimum(1.0, max_side / np.maximum(w, h))
    return batch.append_column(
        "target_width", pa.array((w * scale).astype(np.int32))
    ).append_column("target_height", pa.array((h * scale).astype(np.int32)))


# ---------------------------------------------------------------------------
# real pure-numpy codecs: BMP (24bpp uncompressed) and PPM (P6)
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24bpp bottom-up uncompressed BMP bytes."""
    import struct

    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    img_size = row_size * h
    # pixel array: bottom-up, BGR
    rows = np.zeros((h, row_size), dtype=np.uint8)
    bgr = pixels[::-1, :, ::-1]  # flip vertical, RGB→BGR
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24bpp uncompressed BMP bytes → (H, W, 3) uint8 RGB."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={compression})")
    flip = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * h, offset=data_offset
    ).reshape(h, row_size)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return rgb[::-1] if flip else rgb


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → binary PPM (P6)."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) bytes → (H, W, 3) uint8 RGB."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval, then single whitespace
    parts = []
    i = 2
    n_pay = len(payload)
    while len(parts) < 3:
        while i < n_pay and payload[i : i + 1].isspace():
            i += 1
        if i >= n_pay:
            raise ValueError("truncated PPM header")
        if payload[i : i + 1] == b"#":  # comment line (bounded: a truncated
            while i < n_pay and payload[i : i + 1] != b"\n":  # trailing
                i += 1  # comment must not spin forever, ADVICE r2)
            continue
        j = i
        while j < n_pay and not payload[j : j + 1].isspace():
            j += 1
        parts.append(int(payload[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, _maxval = parts
    return np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i).reshape(
        h, w, 3
    )


def image_features(pixels: np.ndarray, feature_dim: int = FEATURE_DIM) -> np.ndarray:
    """Real features from decoded pixels: per-channel mean/std (scaled to
    [0,1]) + a 10-bin grayscale intensity histogram = 16 dims."""
    px = pixels.astype(np.float64) / 255.0
    means = px.mean(axis=(0, 1))
    stds = px.std(axis=(0, 1))
    gray = px.mean(axis=2)
    hist, _ = np.histogram(gray, bins=feature_dim - 6, range=(0.0, 1.0))
    hist = hist / max(gray.size, 1)
    return np.concatenate([means, stds, hist])


def synthesize_bmp_media(n: int, *, seed: int = 42, width: int = 32, height: int = 24) -> pa.Table:
    """Deterministic REAL-image media table: gradient+noise BMP payloads the
    decode path parses for real."""
    rng = np.random.default_rng(seed)
    payloads = []
    for i in range(n):
        gx = np.linspace(0, 255, width, dtype=np.float64)[None, :, None]
        gy = np.linspace(0, 255, height, dtype=np.float64)[:, None, None]
        base = (gx + gy) / 2 + rng.normal(0, 20, (height, width, 3))
        payloads.append(encode_bmp(np.clip(base, 0, 255).astype(np.uint8)))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/bmp"] * n, pa.string()),
            "width": pa.array(np.full(n, width, dtype=np.int32)),
            "height": pa.array(np.full(n, height, dtype=np.int32)),
        }
    )


# ---------------------------------------------------------------------------
# Video: concatenated-PPM clips, REAL frame splitting + sampling
# ---------------------------------------------------------------------------

VIDEO_MIME = "video/x-ppm-stream"


def encode_ppm_video(frames: np.ndarray) -> bytes:
    """(F, H, W, 3) uint8 → concatenated P6 frames (a codec-free 'video'
    container this environment can decode for real)."""
    return b"".join(encode_ppm(f) for f in frames)


def decode_ppm_header_only(payload: bytes):
    """Parse a P6 header; returns total frame byte length (header+pixels)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    parts, i, n_pay = [], 2, len(payload)
    while len(parts) < 3:
        while i < n_pay and payload[i : i + 1].isspace():
            i += 1
        if i >= n_pay:
            raise ValueError("truncated PPM header")
        if payload[i : i + 1] == b"#":
            while i < n_pay and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < n_pay and not payload[j : j + 1].isspace():
            j += 1
        parts.append(int(payload[i:j]))
        i = j
    i += 1
    w, h, _ = parts
    return i + w * h * 3


def synthesize_video_media(
    n: int, *, frames: int = 12, width: int = 24, height: int = 16, seed: int = 7
) -> pa.Table:
    """Deterministic REAL-video table: each clip is ``frames`` concatenated
    P6 frames of a drifting gradient (so frame features change over time)."""
    rng = np.random.default_rng(seed)
    payloads, nframes = [], []
    for i in range(n):
        clip = []
        phase = rng.uniform(0, 255)
        for f in range(frames):
            gx = np.linspace(0, 255, width)[None, :, None]
            shift = (phase + 255.0 * f / frames) % 255
            base = (gx + shift) % 255 + rng.normal(0, 10, (height, width, 3))
            clip.append(np.clip(base, 0, 255).astype(np.uint8))
        payloads.append(encode_ppm_video(np.stack(clip)))
        nframes.append(frames)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array([VIDEO_MIME] * n, pa.string()),
            "n_frames": pa.array(np.asarray(nframes, dtype=np.int32)),
        }
    )


class FrameSampler:
    """Actor-pool stage: split each concatenated-PPM clip into frames FOR
    REAL, keep every ``stride``-th frame (capped at ``max_frames``), emit
    one row per sampled frame with its decoded feature vector.

    This is the video analog of ``MediaFeatureExtractor`` — same honest
    split: the PPM container path is fully real; codec containers (mp4 etc.)
    belong behind the same optional-import seam.  The per-ROW loop here is
    over FRAMES (output-sized, like the exact-verify loop in dedup), not
    over corpus rows; pixel work is numpy.  Use small ``batch_size`` —
    payload bytes × batch × concurrency must fit the worker heap."""

    def __init__(self, *, stride: int = 4, max_frames: int = 8, feature_dim: int = FEATURE_DIM):
        self.stride = stride
        self.max_frames = max_frames
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        out_id, out_frame, out_feat = [], [], []
        for row, payload in enumerate(batch["payload"]):
            payload = payload.as_py()
            offset, fidx, kept = 0, 0, 0
            while offset < len(payload) and kept < self.max_frames:
                # 64-byte window: headers are tiny; avoids O(F^2) re-slicing
                flen = decode_ppm_header_only(payload[offset : offset + 64])
                if fidx % self.stride == 0:
                    pixels = decode_ppm(payload[offset : offset + flen])
                    out_id.append(ids[row])
                    out_frame.append(fidx)
                    out_feat.append(image_features(pixels, self.feature_dim))
                    kept += 1
                offset += flen
                fidx += 1
        feats = (
            np.stack(out_feat)
            if out_feat
            else np.zeros((0, self.feature_dim), np.float64)
        )
        return pa.table(
            {
                "media_id": pa.array(np.asarray(out_id, dtype=np.int64)),
                "frame_idx": pa.array(np.asarray(out_frame, dtype=np.int64)),
                "features": pa.array(list(feats), pa.list_(pa.float64())),
            }
        )


def sample_video_frames(
    ds: Dataset,
    *,
    stride: int = 4,
    max_frames: int = 8,
    batch_size: int = 16,
    concurrency=(1, 4),
) -> Dataset:
    """Frame-sample a video dataset (one row per clip) into one row per
    sampled frame with real decoded features."""
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"stride": stride, "max_frames": max_frames},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# real resize for decodable formats (nearest-neighbor, pure numpy)
# ---------------------------------------------------------------------------


def resize_pixels(pixels: np.ndarray, max_side: int) -> np.ndarray:
    """Nearest-neighbor downscale so max(h, w) <= max_side (no-op if already
    small enough).  Pure-numpy index sampling — no codec library."""
    h, w = pixels.shape[:2]
    scale = min(1.0, max_side / max(h, w))
    if scale >= 1.0:
        return pixels
    th, tw = max(int(h * scale), 1), max(int(w * scale), 1)
    ry = (np.arange(th) * (h / th)).astype(np.int64)
    rx = (np.arange(tw) * (w / tw)).astype(np.int64)
    return pixels[ry][:, rx]


def resize_media(ds: Dataset, *, max_side: int = 16, batch_size: int = 32) -> Dataset:
    """REAL resize stage for the decodable formats (BMP / PPM): decode,
    nearest-neighbor downsample, re-encode in the same format, update the
    width/height metadata.  Codec formats pass through untouched with
    ``resized=False`` — the same honest split as ``MediaFeatureExtractor``.
    """

    def _resize(batch: pa.Table) -> pa.Table:
        mimes = batch["mime"].to_pylist()
        payloads, widths, heights, done = [], [], [], []
        for i, payload in enumerate(batch["payload"]):
            payload = payload.as_py()
            mime = mimes[i]
            try:
                if mime == "image/bmp":
                    px = decode_bmp(payload)
                elif mime == "image/x-portable-pixmap":
                    px = decode_ppm(payload)
                else:
                    raise NotImplementedError
            except NotImplementedError:
                payloads.append(payload)
                widths.append(batch["width"][i].as_py())
                heights.append(batch["height"][i].as_py())
                done.append(False)
                continue
            out = resize_pixels(px, max_side)
            payloads.append(
                encode_bmp(out) if mime == "image/bmp" else encode_ppm(out)
            )
            heights.append(out.shape[0])
            widths.append(out.shape[1])
            done.append(True)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "payload": pa.array(payloads, pa.binary()),
                "mime": batch["mime"],
                "width": pa.array(np.asarray(widths, dtype=np.int32)),
                "height": pa.array(np.asarray(heights, dtype=np.int32)),
                "resized": pa.array(done, pa.bool_()),
            }
        )

    return ds.map_batches(_resize, batch_format="pyarrow", batch_size=batch_size)


# ---------------------------------------------------------------------------
# real audio: PCM16 WAV (codec-free) decode + features
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) int16 mono PCM → RIFF/WAVE bytes (PCM16, codec-free)."""
    import struct

    data = samples.astype("<i2").tobytes()
    n = len(data)
    hdr = b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", n) + data


def decode_wav(payload: bytes):
    """RIFF/WAVE PCM16 mono bytes → (samples int16 ndarray, sample_rate).
    Walks RIFF chunks (fmt/data may be preceded by LIST etc.); raises on
    non-PCM16 or truncated payloads."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sample_rate, bits, channels, data = 12, None, None, None, None
    n_pay = len(payload)
    while pos + 8 <= n_pay:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt_tag, channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if fmt_tag != 1:
                raise ValueError(f"unsupported WAV format tag {fmt_tag} (PCM only)")
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("truncated WAV: missing fmt/data chunk")
    if bits != 16 or channels != 1:
        raise ValueError(f"unsupported WAV layout (bits={bits}, channels={channels})")
    return np.frombuffer(data, dtype="<i2"), sample_rate


def audio_features(samples: np.ndarray, sample_rate: int) -> np.ndarray:
    """Real audio features: duration, RMS, zero-crossing rate, dominant
    frequency (rFFT argmax) and 4-band spectral energy fractions — 8 dims."""
    x = samples.astype(np.float64) / 32768.0
    n = max(len(x), 1)
    rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if len(x) > 1 else 0.0
    spec = np.abs(np.fft.rfft(x)) if len(x) else np.zeros(1)
    freqs = np.fft.rfftfreq(n, 1.0 / sample_rate)
    dom = float(freqs[int(np.argmax(spec[1:])) + 1]) if len(spec) > 1 else 0.0
    power = spec * spec
    total = float(power.sum()) or 1.0
    edges = np.array([0.0, 250.0, 1000.0, 4000.0, sample_rate / 2 + 1])
    bands = [
        float(power[(freqs >= lo) & (freqs < hi)].sum()) / total
        for lo, hi in zip(edges[:-1], edges[1:])
    ]
    return np.array([n / sample_rate, rms, zcr, dom] + bands, dtype=np.float64)


def synthesize_wav_media(
    n: int, *, seed: int = 19, sample_rate: int = 8000, duration_s: float = 0.25
) -> pa.Table:
    """Deterministic REAL-audio table: each clip is a distinct-frequency sine
    plus noise, PCM16 WAV encoded (so decode + dominant-frequency detection
    are genuinely testable)."""
    rng = np.random.default_rng(seed)
    n_samp = int(sample_rate * duration_s)
    t = np.arange(n_samp) / sample_rate
    payloads, freqs = [], []
    for i in range(n):
        f = 200.0 + 150.0 * (i % 20)
        wave = 0.6 * np.sin(2 * np.pi * f * t) + rng.normal(0, 0.02, n_samp)
        payloads.append(
            encode_wav((np.clip(wave, -1, 1) * 32767).astype(np.int16), sample_rate)
        )
        freqs.append(f)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["audio/wav"] * n, pa.string()),
            "true_freq": pa.array(np.asarray(freqs, np.float64)),
        }
    )


class AudioFeatureExtractor:
    """Actor-pool stage: REAL WAV decode + spectral features per clip (the
    audio analog of MediaFeatureExtractor's decodable path; compressed
    audio formats belong behind the optional-codec seam)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"]:
            samples, sr = decode_wav(payload.as_py())
            feats.append(audio_features(samples, sr))
        arr = np.stack(feats) if feats else np.zeros((0, 8))
        flat = pa.array(arr.reshape(-1))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "feature": pa.FixedSizeListArray.from_arrays(flat, 8),
            }
        )


def extract_audio_features(
    ds: Dataset, *, batch_size: int = 32, concurrency=(1, 4)
) -> Dataset:
    return ds.map_batches(
        AudioFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
