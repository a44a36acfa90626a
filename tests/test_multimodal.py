"""Multimodal binary-column plumbing: fake codecs, actor stages, dedup via
perceptual hash."""

from __future__ import annotations

import numpy as np
import pytest


def _image_rows(n: int):
    from jsonschema_validator_ray.stages.multimodal import fake_image_bytes

    rows = []
    for i in range(n):
        w, h = 32 + (i % 5) * 16, 32 + (i % 3) * 16
        rows.append({"media_id": i, "image": fake_image_bytes(w, h, seed=i)})
    # duplicate image content under a different id
    rows.append({"media_id": 999, "image": fake_image_bytes(48, 48, seed=1)})
    # corrupted payload
    rows.append({"media_id": 998, "image": b"\x00garbage"})
    return rows


def test_image_features_actor_pool(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.multimodal import image_features

    ds = ray.data.from_items(_image_rows(20))
    out = image_features(ds, batch_size=8, concurrency=2).to_pandas() \
        .set_index("media_id")
    assert out.loc[0, "decode_ok"] and out.loc[0, "width"] == 32
    assert not out.loc[998, "decode_ok"]
    # identical content → identical perceptual hash (image dedup key)
    seed1 = [i for i in range(20) if (32 + (i % 5) * 16, 32 + (i % 3) * 16, i) ==
             (48, 48, 1)]
    if seed1:
        assert out.loc[999, "ahash64"] == out.loc[seed1[0], "ahash64"]
    # deterministic across runs
    out2 = image_features(ray.data.from_items(_image_rows(20)),
                          batch_size=4, concurrency=2).to_pandas() \
        .set_index("media_id")
    assert (out.sort_index()["ahash64"].dropna()
            == out2.sort_index()["ahash64"].dropna()).all()


def test_image_resize_roundtrip(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.multimodal import (
        ImageResizeActor, _decode_fake_image)

    ds = ray.data.from_items(_image_rows(6))
    out = ds.map_batches(ImageResizeActor, fn_constructor_args=((16, 16),),
                         batch_format="pyarrow", batch_size=4,
                         concurrency=2).to_pandas().set_index("media_id")
    img = _decode_fake_image(out.loc[0, "image"])
    assert img.shape == (16, 16, 3)
    assert out.loc[998, "image"] is None  # corrupted in → null out


def test_audio_frame_sampling(ray_session):
    import ray.data

    from jsonschema_validator_ray.stages.multimodal import (
        AudioFrameSampleActor, fake_audio_bytes)

    rows = [{"media_id": i,
             "audio": fake_audio_bytes(16000 * (1 + i % 3), 16000, seed=i)}
            for i in range(9)]
    rows.append({"media_id": 99, "audio": b"junk"})
    ds = ray.data.from_items(rows)
    out = ds.map_batches(AudioFrameSampleActor, batch_format="pyarrow",
                         batch_size=4, concurrency=2).to_pandas() \
        .set_index("media_id")
    assert out.loc[0, "sample_rate"] == 16000
    assert out.loc[0, "duration_s"] == pytest.approx(1.0)
    assert out.loc[1, "n_frames"] == int(np.ceil(32000 / 4096))
    assert np.isnan(out.loc[99, "duration_s"]) or out.loc[99, "duration_s"] is None


def test_real_decoder_gated():
    from jsonschema_validator_ray.stages.multimodal import ImageFeatureActor

    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(NotImplementedError):
            ImageFeatureActor(decoder="pil")
    with pytest.raises(ValueError):
        ImageFeatureActor(decoder="wat")


def test_resize_and_audio_real_decoders_gated():
    from jsonschema_validator_ray.stages.multimodal import (
        AudioFrameSampleActor, ImageResizeActor)

    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            ImageResizeActor(decoder="pil")
    try:
        import soundfile  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            AudioFrameSampleActor(decoder="soundfile")
    with pytest.raises(ValueError):
        ImageResizeActor(decoder="wat")
    with pytest.raises(ValueError):
        AudioFrameSampleActor(decoder="wat")


def test_real_image_codec_roundtrip():
    """Runs wherever pillow exists (production images); skipped here."""
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    from jsonschema_validator_ray.stages.multimodal import (
        ImageFeatureActor, ImageResizeActor)
    import pyarrow as pa

    buf = io.BytesIO()
    Image.new("RGB", (32, 16), (10, 200, 30)).save(buf, format="PNG")
    batch = pa.table({"media_id": [1, 2],
                      "image": pa.array([buf.getvalue(), b"junk"],
                                        type=pa.binary())})
    feats = ImageFeatureActor(decoder="pil")(batch).to_pylist()
    assert feats[0]["width"] == 32 and feats[0]["height"] == 16
    assert feats[0]["decode_ok"] and not feats[1]["decode_ok"]
    resized = ImageResizeActor(target=(8, 8), decoder="pil")(batch).to_pylist()
    out = Image.open(io.BytesIO(resized[0]["image"]))
    assert out.size == (8, 8)
    assert resized[1]["image"] is None


def test_real_audio_codec_roundtrip():
    """Runs wherever soundfile exists (production images); skipped here."""
    sf = pytest.importorskip("soundfile")
    import io

    from jsonschema_validator_ray.stages.multimodal import AudioFrameSampleActor
    import pyarrow as pa

    buf = io.BytesIO()
    sf.write(buf, np.zeros(8000, dtype="float32"), 8000, format="WAV")
    batch = pa.table({"media_id": [1],
                      "audio": pa.array([buf.getvalue()], type=pa.binary())})
    out = AudioFrameSampleActor(decoder="soundfile")(batch).to_pylist()
    assert out[0]["sample_rate"] == 8000
    assert out[0]["duration_s"] == pytest.approx(1.0)


def test_video_frame_samples_fake(ray_session):
    import pandas as pd

    from jsonschema_validator_ray.stages.multimodal import (
        fake_video_bytes, video_frame_samples)

    import ray.data

    rows = pd.DataFrame({
        "media_id": [1, 2, 3],
        "video": [fake_video_bytes(25, 16, 12, 5, seed=1),
                  fake_video_bytes(7, 8, 8, 10, seed=2),
                  b"not a video"]})
    def collect(ds):
        # to_pandas would tensor-cast the ragged frame_hashes list column
        # (nulls + varying lengths) — consume rows as dicts instead
        return pd.DataFrame(ds.take_all()).set_index("media_id").sort_index()

    out = collect(video_frame_samples(
        ray.data.from_pandas(rows), stride=10, batch_size=2, concurrency=2))
    assert out.loc[1, "n_frames"] == 25
    assert out.loc[1, "n_sampled"] == 3           # frames 0, 10, 20
    assert out.loc[1, "duration_s"] == 5.0
    assert len(out.loc[1, "frame_hashes"]) == 3
    assert out.loc[2, "n_sampled"] == 1
    assert pd.isna(out.loc[3, "n_frames"])        # foreign bytes → nulls
    # determinism: same bytes → same hashes
    out2 = collect(video_frame_samples(
        ray.data.from_pandas(rows), stride=10, batch_size=2, concurrency=2))
    assert list(out.loc[1, "frame_hashes"]) == list(out2.loc[1, "frame_hashes"])


def test_video_real_decoder_guard(ray_session):
    pytest.importorskip("av", reason="PyAV not in this container")
    # only runs where av exists: the guard must not raise there
    from jsonschema_validator_ray.stages.multimodal import VideoFrameSampleActor
    VideoFrameSampleActor(decoder="av")


def test_fake_video_decode_alignment_and_truncation():
    import numpy as np

    from jsonschema_validator_ray.stages.multimodal import (
        _decode_fake_video, fake_video_bytes)

    b = fake_video_bytes(2, 4, 3, 5, seed=123)
    frames, fps = _decode_fake_video(b)
    rng = np.random.default_rng(123)
    true = rng.integers(0, 256, size=2 * 4 * 3 * 3,
                        dtype=np.uint8).reshape(2, 3, 4, 3)
    assert np.array_equal(frames, true)     # header offset regression
    assert fps == 5
    assert _decode_fake_video(b[:-10]) is None   # truncated → null row
    assert _decode_fake_video(b[:8]) is None
