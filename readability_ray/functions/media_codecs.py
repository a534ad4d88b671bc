"""Pure-stdlib media codecs: 24-bit BMP and 16-bit PCM WAV.

These make the multimodal decode path REAL for the uncompressed
formats the standard library can handle — no Pillow/libjpeg/ffmpeg in
this environment, so compressed codecs (JPEG/PNG/MP3/Opus/H.264) stay
behind the honest NotImplementedError boundary in multimodal.py, but a
corpus of BMP images or PCM WAV audio decodes natively, end to end,
and the feature stages run on real pixels/samples.

Both encoders are byte-deterministic (fixed headers, no timestamps),
so fixtures and differential tests are exact.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

_BMP_HEADER_FMT = "<2sIHHI"          # BITMAPFILEHEADER
_BMP_INFO_FMT = "<IiiHHIIiiII"       # BITMAPINFOHEADER


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit uncompressed bottom-up BMP."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (H, W, 3) RGB array")
    h, w = pixels.shape[:2]
    row_bytes = (w * 3 + 3) & ~3          # rows pad to 4 bytes
    img_size = row_bytes * h
    offset = struct.calcsize(_BMP_HEADER_FMT) \
        + struct.calcsize(_BMP_INFO_FMT)
    head = struct.pack(_BMP_HEADER_FMT, b"BM", offset + img_size,
                       0, 0, offset)
    info = struct.pack(_BMP_INFO_FMT, struct.calcsize(_BMP_INFO_FMT),
                       w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    # bottom-up rows, BGR channel order — the BMP on-disk layout
    rows[:, :w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    return head + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (H, W, 3) uint8 RGB.  Handles
    bottom-up (positive height) and top-down (negative height) rows."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    info_size = struct.unpack_from("<I", payload, 14)[0]
    if info_size < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp}, "
            f"compression={compression})")
    top_down = h < 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    data = np.frombuffer(payload, dtype=np.uint8,
                         count=row_bytes * h, offset=offset)
    rows = data.reshape(h, row_bytes)[:, :w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()        # BGR → RGB


def resize_nearest(pixels: np.ndarray,
                   out_hw: tuple[int, int]) -> np.ndarray:
    """Deterministic nearest-neighbor resize (no interpolation libs)."""
    oh, ow = out_hw
    h, w = pixels.shape[:2]
    ri = np.minimum((np.arange(oh) * h) // max(oh, 1), h - 1)
    ci = np.minimum((np.arange(ow) * w) // max(ow, 1), w - 1)
    return pixels[ri][:, ci]


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """float samples in [-1, 1] → mono 16-bit PCM WAV bytes."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(pcm16.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → (float64 mono samples in [-1, 1], sample_rate).
    Stereo is averaged to mono; 16-bit and 8-bit PCM supported."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        n_ch = wf.getnchannels()
        width = wf.getsampwidth()
        rate = wf.getframerate()
        frames = wf.readframes(wf.getnframes())
    if width == 2:
        samples = np.frombuffer(frames, dtype="<i2") \
            .astype(np.float64) / 32767.0
    elif width == 1:  # 8-bit WAV is unsigned
        samples = (np.frombuffer(frames, dtype=np.uint8)
                   .astype(np.float64) - 128.0) / 127.0
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    if n_ch > 1:
        samples = samples.reshape(-1, n_ch).mean(axis=1)
    return samples, rate


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2) — the stdlib-decodable video container
# ---------------------------------------------------------------------------
#
# Uncompressed planar video, the simplest container real tools
# (ffmpeg, mjpegtools) actually produce.  C444 keeps full-resolution
# planes and frames round-trip bit-exactly; pixels stay in YUV444
# order (no colorspace conversion — that is a pixel transform, not
# container decoding, and would break the byte-determinism the
# fixtures pin).

_Y4M_MAGIC = b"YUV4MPEG2"


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (4, 1)
               ) -> bytes:
    """(N, H, W, 3) uint8 YUV444 frames → Y4M bytes (C444 planar).

    Byte-deterministic; ``decode_y4m(encode_y4m(x)) == x`` exactly.
    """
    f = np.asarray(frames, dtype=np.uint8)
    if f.ndim != 4 or f.shape[3] != 3 or f.shape[0] == 0:
        raise ValueError("expected non-empty (N, H, W, 3) YUV frames")
    n, h, w = f.shape[:3]
    num, den = fps
    head = (f"{_Y4M_MAGIC.decode()} W{w} H{h} F{num}:{den} Ip A1:1 "
            f"C444\n").encode()
    parts = [head]
    for i in range(n):
        parts.append(b"FRAME\n")
        # planar: all Y, then all U, then all V
        parts.append(f[i].transpose(2, 0, 1).tobytes())
    return b"".join(parts)


def decode_y4m(payload: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """Y4M (C444 planar) → ((N, H, W, 3) uint8 YUV444 frames,
    (fps_num, fps_den))."""
    if not payload.startswith(_Y4M_MAGIC):
        raise ValueError("not a Y4M payload")
    nl = payload.index(b"\n")
    w = h = None
    num, den = 25, 1
    colorspace = "C444"
    for tok in payload[len(_Y4M_MAGIC):nl].split():
        t = tok.decode("ascii", errors="replace")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("F"):
            num, den = (int(x) for x in t[1:].split(":"))
        elif t.startswith("C"):
            colorspace = t
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    if colorspace != "C444":
        raise NotImplementedError(
            f"only C444 Y4M supported (got {colorspace}); subsampled "
            "colorspaces need a chroma upsampler")
    frame_bytes = w * h * 3
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError("malformed Y4M frame marker")
        pos = fnl + 1
        if pos + frame_bytes > len(payload):
            raise ValueError("truncated Y4M frame")
        plane = np.frombuffer(payload, dtype=np.uint8,
                              count=frame_bytes, offset=pos)
        frames.append(plane.reshape(3, h, w).transpose(1, 2, 0))
        pos += frame_bytes
    if not frames:
        raise ValueError("Y4M stream has no frames")
    return np.stack(frames), (num, den)
