"""Pure-stdlib BMP/WAV codecs + the real multimodal decode path:
exact pixel/sample round trips, padding edge widths, stereo downmix,
spectral features recovering a known tone, honest errors for
compressed formats.
"""

import numpy as np
import pyarrow as pa
import pytest

from readability_ray.functions.media_codecs import (
    decode_bmp, decode_wav, encode_bmp, encode_wav_pcm16,
    resize_nearest,
)
from readability_ray.functions.multimodal import (
    AudioFeatureStage, ImageFeatureStage, make_real_media_table,
)


def test_bmp_roundtrip_exact():
    rng = np.random.RandomState(7)
    for w in (1, 2, 3, 4, 5, 31):  # exercise every row-padding case
        px = rng.randint(0, 256, size=(6, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_bmp_deterministic_bytes():
    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    assert encode_bmp(px) == encode_bmp(px)


def test_bmp_rejects_non_bmp():
    with pytest.raises(ValueError):
        decode_bmp(b"\x89PNG....")


def test_wav_roundtrip_close():
    rate = 16_000
    t = np.arange(rate // 4) / rate
    s = 0.5 * np.sin(2 * np.pi * 440 * t)
    got, got_rate = decode_wav(encode_wav_pcm16(s, rate))
    assert got_rate == rate
    assert np.abs(got - s).max() < 1e-3  # 16-bit quantization


def test_wav_stereo_downmix():
    import io
    import wave as wv
    rate = 8_000
    left = (np.ones(100) * 16383).astype("<i2")
    right = (np.ones(100) * -16383).astype("<i2")
    inter = np.empty(200, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    buf = io.BytesIO()
    with wv.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(inter.tobytes())
    got, _ = decode_wav(buf.getvalue())
    assert np.abs(got).max() < 1e-3  # L and R cancel


def test_resize_nearest_shapes():
    px = np.arange(8 * 6 * 3, dtype=np.uint8).reshape(8, 6, 3)
    out = resize_nearest(px, (4, 3))
    assert out.shape == (4, 3, 3)
    assert np.array_equal(resize_nearest(px, (8, 6)), px)


def test_image_stage_real_decode_features():
    # a solid-color BMP: mean == the color, std == 0
    px = np.full((20, 20, 3), (200, 100, 50), dtype=np.uint8)
    batch = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "payload": pa.array([encode_bmp(px)], pa.large_binary()),
    })
    out = ImageFeatureStage(out_hw=(8, 8), fake_decode=False)(batch)
    feat = out.column("feature").to_pylist()[0]
    assert feat[:3] == [200.0, 100.0, 50.0]
    assert feat[3:] == [0.0, 0.0, 0.0]


def test_audio_stage_real_decode_recovers_tone():
    rate = 16_000
    t = np.arange(rate) / rate
    tone = 0.7 * np.sin(2 * np.pi * 1000 * t)
    batch = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "payload": pa.array([encode_wav_pcm16(tone, rate)],
                            pa.large_binary()),
        "duration_ms": pa.array([1000], pa.int32()),
    })
    out = AudioFeatureStage(fake_decode=False)(batch)
    rms, zcr, centroid, rolloff = out.column("feature").to_pylist()[0]
    assert rms == pytest.approx(0.7 / np.sqrt(2), rel=1e-3)
    assert centroid == pytest.approx(1000.0, rel=0.05)
    assert rolloff == pytest.approx(1000.0, rel=0.05)


def test_compressed_formats_stay_honest():
    from readability_ray.functions.multimodal import (
        _decode_audio_real, _decode_image_real)
    with pytest.raises(NotImplementedError):
        _decode_image_real(b"\xff\xd8\xff\xe0JFIF")  # JPEG magic
    with pytest.raises(NotImplementedError):
        _decode_audio_real(b"ID3\x04mp3data")


def test_real_media_table_decodes(ray_session):
    from readability_ray.functions.multimodal import (audio_features,
                                                      image_features)
    import ray.data
    t = make_real_media_table(12)
    imgs = ray.data.from_arrow(t).filter(
        expr="media_type == 'image'")
    feats = image_features(imgs, fake_decode=False,
                           use_actors=False).to_pandas()
    assert len(feats) == 4
    auds = ray.data.from_arrow(t).filter(
        expr="media_type == 'audio'")
    afeats = audio_features(auds, fake_decode=False,
                            use_actors=False).to_pandas()
    assert len(afeats) == 4
    # a pure tone has near-zero bandwidth: centroid ≈ rolloff
    for f in afeats["feature"]:
        assert f[2] == pytest.approx(f[3], rel=0.15)


# ---------------------------------------------------------------------------
# Y4M video (round-4: the real video decode path, verdict #6)
# ---------------------------------------------------------------------------


def test_y4m_roundtrip_exact():
    import numpy as np

    from readability_ray.functions.media_codecs import (decode_y4m,
                                                        encode_y4m)
    rng = np.random.RandomState(3)
    frames = rng.randint(0, 256, size=(7, 10, 6, 3), dtype=np.uint8)
    enc = encode_y4m(frames, fps=(25, 2))
    dec, fps = decode_y4m(enc)
    assert fps == (25, 2)
    assert (dec == frames).all()
    # bit-deterministic writer: re-encode of the decode is identical
    assert encode_y4m(dec, fps) == enc


def test_y4m_rejects_garbage_and_subsampled():
    import numpy as np

    from readability_ray.functions.media_codecs import (decode_y4m,
                                                        encode_y4m)
    with pytest.raises(ValueError):
        decode_y4m(b"not a y4m stream")
    f = np.zeros((1, 4, 4, 3), dtype=np.uint8)
    c420 = encode_y4m(f).replace(b"C444", b"C420")
    with pytest.raises(NotImplementedError):
        decode_y4m(c420)
    truncated = encode_y4m(f)[:-5]
    with pytest.raises(ValueError):
        decode_y4m(truncated)


def test_video_stage_real_decode_pinned_frames(ray_session):
    """Writer → Ray frame_samples round trip: sampled frame payloads
    are byte-identical YUV planes of the source frames at the
    every_n_ms stride."""
    import hashlib

    import numpy as np
    import ray.data

    from readability_ray.functions.media_codecs import encode_y4m
    from readability_ray.functions.multimodal import frame_samples
    rng = np.random.RandomState(11)
    frames = rng.randint(0, 256, size=(9, 8, 8, 3), dtype=np.uint8)
    ds = ray.data.from_items([{
        "media_id": 1, "media_type": "video",
        "payload": encode_y4m(frames, fps=(4, 1)),  # 4 fps
        "mime": "video/x-yuv4mpeg", "width": 8, "height": 8,
        "duration_ms": 9 * 250,
    }])
    out = frame_samples(ds, every_n_ms=1000, fake_decode=False,
                        use_actors=False).to_pandas() \
        .sort_values("frame_index").reset_index(drop=True)
    # 1000 ms at 4 fps → stride 4 → source frames 0, 4, 8
    assert list(out["frame_index"]) == [0, 4, 8]
    for _, row in out.iterrows():
        want = frames[row["frame_index"]].transpose(2, 0, 1).tobytes()
        assert bytes(row["frame_payload"]) == want
        assert hashlib.md5(bytes(row["frame_payload"])).hexdigest() \
            == hashlib.md5(want).hexdigest()


def test_video_compressed_stays_honest(ray_session):
    import ray.data

    from readability_ray.functions.multimodal import frame_samples
    ds = ray.data.from_items([{
        "media_id": 1, "media_type": "video",
        "payload": b"\x00\x00\x00\x18ftypmp42 fake h264",
        "mime": "video/mp4", "width": 8, "height": 8,
        "duration_ms": 1000,
    }])
    with pytest.raises(Exception, match="ffmpeg"):
        frame_samples(ds, fake_decode=False,
                      use_actors=False).to_pandas()


def test_optional_pil_path():
    """When Pillow is absent (this container) the error is unchanged;
    when present the same code decodes real JPEG/PNG (skip here)."""
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    from readability_ray.functions.multimodal import _decode_image_real
    if not has_pil:
        with pytest.raises(NotImplementedError, match="Pillow"):
            _decode_image_real(b"\x89PNG\r\n\x1a\nfake")
    else:  # pragma: no cover - codec-equipped images only
        import io

        import numpy as np
        from PIL import Image
        buf = io.BytesIO()
        Image.fromarray(np.zeros((4, 4, 3), dtype=np.uint8)).save(
            buf, format="PNG")
        assert _decode_image_real(buf.getvalue()).shape == (4, 4, 3)
