"""Multimodal (image/audio/video) column stages.

Model: media are opaque ``binary`` columns with typed metadata columns
alongside (``media_type``, ``width``/``height``/``sample_rate``...). All
heavy per-item work (decode, feature extraction, resize, frame sampling)
runs in ACTOR-POOL ``map_batches`` stages with SMALL batch sizes — large
binary payloads mean a batch × concurrency must fit in worker heap
(ray_guide "Memory-aware").

The real image/audio codec libraries are not in this container, so the
byte-level decode is STUBBED two ways (this is the clearly-marked boundary):

- ``decoder="fake"`` (default): a deterministic fake container format
  (:func:`fake_image_bytes` / :func:`fake_audio_bytes`) that exercises the
  FULL Ray-side plumbing — schemas, actor init, batch sizing, output layout —
  with real bytes in/arrays out;
- ``decoder="pil"`` (images) / ``decoder="soundfile"`` (audio): the REAL
  codec paths — fully implemented (PIL decode/resize/PNG re-encode,
  soundfile decode + mono mixdown) behind an import guard that raises
  ``NotImplementedError`` only when the library itself is absent from the
  container. On a production image with pillow/soundfile installed these
  branches run as-is; ``tests/test_multimodal.py`` carries
  ``importorskip``-marked tests that exercise them wherever the libs exist.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

_IMG_MAGIC = b"FIMG"
_AUD_MAGIC = b"FAUD"


# ---- deterministic fake codecs (the stub boundary) ------------------------


def fake_image_bytes(width: int, height: int, seed: int) -> bytes:
    """Deterministic fake image: magic + dims + seed-derived pixel bytes."""
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=width * height * 3, dtype=np.uint8)
    return _IMG_MAGIC + struct.pack("<IIQ", width, height, seed) + pixels.tobytes()


def fake_audio_bytes(n_samples: int, sample_rate: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    samples = (rng.standard_normal(n_samples) * 0.1).astype(np.float32)
    return _AUD_MAGIC + struct.pack("<IIQ", n_samples, sample_rate, seed) + samples.tobytes()


def _decode_fake_image(b: bytes) -> np.ndarray | None:
    if b is None or not b.startswith(_IMG_MAGIC):
        return None
    w, h, _seed = struct.unpack_from("<IIQ", b, 4)
    pixels = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=4 + 16)
    return pixels.reshape(h, w, 3)


def _decode_fake_audio(b: bytes) -> tuple[np.ndarray, int] | None:
    if b is None or not b.startswith(_AUD_MAGIC):
        return None
    n, sr, _seed = struct.unpack_from("<IIQ", b, 4)
    samples = np.frombuffer(b, dtype=np.float32, count=n, offset=4 + 16)
    return samples, sr


# ---- actor-pool stages ----------------------------------------------------


class ImageFeatureActor:
    """Actor: binary image column → feature columns
    ``(key, width, height, mean_luma, ahash64, decode_ok)``.

    ``ahash64`` is a perceptual average-hash over an 8×8 downsample — the
    classic near-dup key for images (joins the dedup machinery via
    groupby(ahash64) exactly like text content hashes)."""

    def __init__(self, key: str = "media_id", column: str = "image",
                 decoder: str = "fake"):
        self.key = key
        self.column = column
        if decoder == "fake":
            self.decode = _decode_fake_image
        elif decoder == "pil":
            try:
                from PIL import Image  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "real image decode needs PIL, which is not available in "
                    "this environment — use decoder='fake' (deterministic "
                    "stub) or run on an image with pillow installed") from e
            self.decode = self._decode_real
        else:
            raise ValueError(f"unknown decoder {decoder!r}")

    @staticmethod
    def _decode_real(b: bytes) -> np.ndarray | None:
        import io

        from PIL import Image

        try:
            return np.asarray(Image.open(io.BytesIO(b)).convert("RGB"))
        except Exception:
            return None

    @staticmethod
    def _ahash64(img: np.ndarray) -> int:
        luma = img.astype(np.float32).mean(axis=2)
        h, w = luma.shape
        ys = (np.arange(8) * h) // 8
        xs = (np.arange(8) * w) // 8
        blocks = luma[np.minimum(ys, h - 1)][:, np.minimum(xs, w - 1)]
        bits = (blocks > blocks.mean()).flatten()
        out = 0
        for i, bit in enumerate(bits):
            if bit:
                out |= 1 << i
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key).to_pylist()
        widths, heights, lumas, hashes, ok = [], [], [], [], []
        for b in batch.column(self.column).to_pylist():
            img = self.decode(b)
            if img is None:
                widths.append(None)
                heights.append(None)
                lumas.append(None)
                hashes.append(None)
                ok.append(False)
            else:
                heights.append(img.shape[0])
                widths.append(img.shape[1])
                lumas.append(float(img.astype(np.float32).mean()))
                hashes.append(self._ahash64(img))
                ok.append(True)
        return pa.table({
            self.key: pa.array(keys),
            "width": pa.array(widths, type=pa.int32()),
            "height": pa.array(heights, type=pa.int32()),
            "mean_luma": pa.array(lumas, type=pa.float64()),
            "ahash64": pa.array(hashes, type=pa.uint64()),
            "decode_ok": pa.array(ok, type=pa.bool_()),
        })


class ImageResizeActor:
    """Actor: decode → nearest-neighbor resize → re-encode (fake container).
    Output keeps the binary-column-with-metadata layout."""

    def __init__(self, target: tuple[int, int] = (64, 64),
                 key: str = "media_id", column: str = "image",
                 decoder: str = "fake"):
        self.target = target
        self.key = key
        self.column = column
        if decoder == "fake":
            self._resize = self._resize_fake
        elif decoder == "pil":
            # real path: import once per ACTOR (the import guard is the
            # stub boundary — on a production image with pillow installed
            # this branch is fully functional, no NotImplementedError)
            try:
                from PIL import Image
            except ImportError as e:
                raise NotImplementedError(
                    "real resize needs pillow, which is not available in "
                    "this environment — use decoder='fake' (deterministic "
                    "stub) or run on an image with pillow installed") from e
            self._Image = Image
            self._resize = self._resize_pil
        else:
            raise ValueError(f"unknown decoder {decoder!r}")

    def _resize_fake(self, b: bytes) -> bytes | None:
        tw, th = self.target
        img = _decode_fake_image(b)
        if img is None:
            return None
        h, w, _ = img.shape
        ys = (np.arange(th) * h) // th
        xs = (np.arange(tw) * w) // tw
        resized = img[ys][:, xs]
        return _IMG_MAGIC + struct.pack("<IIQ", tw, th, 0) + resized.tobytes()

    def _resize_pil(self, b: bytes) -> bytes | None:
        import io

        if b is None:
            return None
        try:
            img = self._Image.open(io.BytesIO(b)).convert("RGB")
        except Exception:
            return None
        out = io.BytesIO()
        img.resize(self.target, self._Image.NEAREST).save(out, format="PNG")
        return out.getvalue()

    def __call__(self, batch: pa.Table) -> pa.Table:
        tw, th = self.target
        keys = batch.column(self.key).to_pylist()
        out = [self._resize(b) for b in batch.column(self.column).to_pylist()]
        return pa.table({
            self.key: pa.array(keys),
            "image": pa.array(out, type=pa.binary()),
            "width": pa.array([tw if o is not None else None for o in out],
                              type=pa.int32()),
            "height": pa.array([th if o is not None else None for o in out],
                               type=pa.int32()),
        })


class AudioFrameSampleActor:
    """Actor: binary audio column → fixed-stride frame sample features
    ``(key, n_samples, sample_rate, duration_s, rms, n_frames)``."""

    def __init__(self, frame_len: int = 1024, hop: int = 4096,
                 key: str = "media_id", column: str = "audio",
                 decoder: str = "fake"):
        self.frame_len = frame_len
        self.hop = hop
        self.key = key
        self.column = column
        if decoder == "fake":
            self.decode = _decode_fake_audio
        elif decoder == "soundfile":
            # real path behind the import guard (functional wherever
            # soundfile/libsndfile is installed)
            try:
                import soundfile  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "real audio decode needs soundfile, which is not "
                    "available in this environment — use decoder='fake' or "
                    "run on an image with soundfile installed") from e
            self.decode = self._decode_soundfile
        else:
            raise ValueError(f"unknown decoder {decoder!r}")

    @staticmethod
    def _decode_soundfile(b: bytes) -> "tuple[np.ndarray, int] | None":
        import io

        import soundfile

        if b is None:
            return None
        try:
            samples, sr = soundfile.read(io.BytesIO(b), dtype="float32")
        except Exception:
            return None
        if samples.ndim > 1:        # mix down to mono
            samples = samples.mean(axis=1)
        return samples, int(sr)

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key).to_pylist()
        ns, srs, durs, rmss, nframes = [], [], [], [], []
        for b in batch.column(self.column).to_pylist():
            dec = self.decode(b)
            if dec is None:
                ns.append(None); srs.append(None); durs.append(None)
                rmss.append(None); nframes.append(None)
                continue
            samples, sr = dec
            frames = [samples[i:i + self.frame_len]
                      for i in range(0, len(samples), self.hop)]
            ns.append(len(samples))
            srs.append(sr)
            durs.append(len(samples) / sr)
            rmss.append(float(np.sqrt(np.mean(samples ** 2))) if len(samples) else 0.0)
            nframes.append(len(frames))
        return pa.table({
            self.key: pa.array(keys),
            "n_samples": pa.array(ns, type=pa.int64()),
            "sample_rate": pa.array(srs, type=pa.int32()),
            "duration_s": pa.array(durs, type=pa.float64()),
            "rms": pa.array(rmss, type=pa.float64()),
            "n_frames": pa.array(nframes, type=pa.int32()),
        })


def image_features(ds, *, key: str = "media_id", column: str = "image",
                   decoder: str = "fake",
                   batch_size: int = 256, concurrency: int = 2):
    """Feature-extraction pipeline entry: SMALL batches (binary payloads),
    actor pool sized by `concurrency` (decode state loads once per actor)."""
    return ds.map_batches(
        ImageFeatureActor, fn_constructor_args=(key, column, decoder),
        batch_format="pyarrow", batch_size=batch_size, concurrency=(1, concurrency))


# ---- video ----------------------------------------------------------------

_VID_MAGIC = b"FVID"


def fake_video_bytes(n_frames: int, width: int, height: int, fps: int,
                     seed: int) -> bytes:
    """Deterministic fake video: magic + (n_frames, w, h, fps, seed) header
    + n_frames raw RGB frames. Exercises the full frame-sampling plumbing
    with realistic payload sizes (w·h·3 bytes/frame)."""
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=n_frames * width * height * 3,
                          dtype=np.uint8)
    return _VID_MAGIC + struct.pack("<IIIIQ", n_frames, width, height,
                                    fps, seed) + frames.tobytes()


def _decode_fake_video(b: bytes) -> tuple[np.ndarray, int] | None:
    """→ (frames[n, h, w, 3], fps) or None for foreign/corrupt bytes."""
    if b is None or not b.startswith(_VID_MAGIC):
        return None
    header = 4 + struct.calcsize("<IIIIQ")
    if len(b) < header:
        return None
    n, w, h, fps, _seed = struct.unpack_from("<IIIIQ", b, 4)
    need = n * w * h * 3
    if len(b) < header + need:      # truncated/hostile payload → null row
        return None
    pixels = np.frombuffer(b, dtype=np.uint8, count=need, offset=header)
    return pixels.reshape(n, h, w, 3), int(fps)


class VideoFrameSampleActor:
    """Actor: binary video column → every ``stride``-th frame sampled,
    per-sampled-frame 64-bit average-hash + mean luma →
    ``(key, n_frames, width, height, fps, duration_s, n_sampled,
    frame_hashes, mean_luma)``. The real-codec path (``decoder='av'``,
    PyAV) is implemented behind an import guard — this container ships no
    video codecs, so only the deterministic fake format runs here; on an
    image with ``av`` installed the branch decodes as-is."""

    def __init__(self, stride: int = 10, key: str = "media_id",
                 column: str = "video", decoder: str = "fake"):
        self.stride = max(int(stride), 1)
        self.key = key
        self.column = column
        if decoder == "fake":
            self.decode = _decode_fake_video
        elif decoder == "av":
            try:
                import av  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "real video decode needs PyAV, which is not available "
                    "in this environment — use decoder='fake' or run on an "
                    "image with av installed") from e
            self.decode = self._decode_av
        else:
            raise ValueError(f"unknown decoder {decoder!r}")

    @staticmethod
    def _decode_av(b: bytes) -> "tuple[np.ndarray, int] | None":
        import io

        import av

        if b is None:
            return None
        try:
            with av.open(io.BytesIO(b)) as container:
                stream = container.streams.video[0]
                fps = int(round(float(stream.average_rate or 0)))
                frames = [f.to_ndarray(format="rgb24")
                          for f in container.decode(stream)]
        except Exception:
            return None
        if not frames:
            return None
        return np.stack(frames), fps

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key).to_pylist()
        nf, ws, hs, fpss, durs, nsamp, hashes, lumas = \
            [], [], [], [], [], [], [], []
        for b in batch.column(self.column).to_pylist():
            dec = self.decode(b)
            if dec is None:
                for lst in (nf, ws, hs, fpss, durs, nsamp, hashes, lumas):
                    lst.append(None)
                continue
            frames, fps = dec
            n, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
            picked = frames[::self.stride]
            # vectorized over ALL sampled frames at once: luma matrix
            # (k, h, w) → per-frame mean + 8×8 average-hash
            luma = picked.astype(np.float32).mean(axis=3)
            fh = [ImageFeatureActor._ahash64(p) for p in picked]
            nf.append(n); ws.append(w); hs.append(h); fpss.append(fps)
            durs.append(n / fps if fps else None)
            nsamp.append(len(picked))
            hashes.append([np.uint64(x).item() for x in fh])
            lumas.append(float(luma.mean()))
        return pa.table({
            self.key: pa.array(keys),
            "n_frames": pa.array(nf, type=pa.int32()),
            "width": pa.array(ws, type=pa.int32()),
            "height": pa.array(hs, type=pa.int32()),
            "fps": pa.array(fpss, type=pa.int32()),
            "duration_s": pa.array(durs, type=pa.float64()),
            "n_sampled": pa.array(nsamp, type=pa.int32()),
            "frame_hashes": pa.array(hashes, type=pa.list_(pa.uint64())),
            "mean_luma": pa.array(lumas, type=pa.float64()),
        })


def video_frame_samples(ds, *, key: str = "media_id", column: str = "video",
                        stride: int = 10, decoder: str = "fake",
                        batch_size: int = 32, concurrency: int = 2):
    """Frame-sampling pipeline entry. Batches are VERY small (a video cell
    is n_frames·w·h·3 bytes — a 100-frame 64×64 clip is ~1.2 MB, so 32 ×
    concurrency ≈ 80 MB of payload per actor heap). Consume the result as
    Arrow (iter_batches / write_parquet / take_all) — ``to_pandas`` would
    try to tensor-cast the ragged null-bearing ``frame_hashes`` list
    column."""
    return ds.map_batches(
        VideoFrameSampleActor, fn_constructor_args=(stride, key, column,
                                                    decoder),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency))
