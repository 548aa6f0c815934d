"""Pure-stdlib image/audio codecs — REAL decode paths with no external
dependencies, closing part of the codec gap the PIL seam guards.

Supported natively (struct/zlib/wave + numpy only):

- **BMP**: uncompressed BI_RGB 24/32-bit (the standard interchange
  form) — decode to HxWx3 uint8 and encode back (24-bit), so resize
  can return a real image container, not stand-in bytes.
- **PNG**: 8-bit gray / gray+alpha / RGB / RGBA, non-interlaced — chunk
  walk, zlib inflate, and full defiltering (None/Sub/Up/Average/Paeth
  per the PNG spec §9).
- **WAV**: PCM via the stdlib ``wave`` module — true duration, sample
  rate, channel count, RMS and peak from the samples themselves.

JPEG/WebP and compressed/paletted containers still route to the PIL
seam in ``multimodal/__init__.py`` (they need entropy decoders that do
not belong here).

Scale posture: these are per-payload kernels invoked from Arrow
``mapInPandas`` batches — decode cost rides in the executors, and the
binary column is only read by operators that need bytes (column
pruning skips it elsewhere).
"""

from __future__ import annotations

import functools
import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _coerce_codec_errors(fn):
    """Public entry points promise ValueError on any malformed payload
    so callers' PIL-seam fallbacks (``except ValueError``) always fire.
    Truncated headers raise struct.error and corrupt streams raise
    zlib.error / wave.Error / EOFError — none of which subclass
    ValueError — so coerce them here."""
    import wave

    @functools.wraps(fn)
    def wrapper(payload, *args, **kwargs):
        try:
            return fn(payload, *args, **kwargs)
        except (struct.error, zlib.error, wave.Error, EOFError) as exc:
            raise ValueError(f"{fn.__name__}: malformed payload ({exc})") from exc

    return wrapper

#: PNG color type → samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff(payload: bytes) -> str | None:
    """Container sniff by magic bytes: 'png' | 'bmp' | 'wav' | 'webp' |
    'jpeg' | None."""
    if payload.startswith(PNG_SIG):
        return "png"
    if payload.startswith(b"BM"):
        return "bmp"
    if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
        return "wav"
    if payload.startswith(b"RIFF") and payload[8:12] == b"WEBP":
        return "webp"
    if payload.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    return None


# -- PNG --------------------------------------------------------------------


def _png_chunks(payload: bytes):
    pos = len(PNG_SIG)
    while pos + 8 <= len(payload):
        (length,), tag = struct.unpack(">I", payload[pos:pos + 4]), payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        yield tag, data
        pos += 12 + length  # length + tag + data + crc
        if tag == b"IEND":
            return


@_coerce_codec_errors
def png_info(payload: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from IHDR; raises ValueError for
    forms outside the supported profile (8-bit, non-interlaced,
    non-paletted)."""
    for tag, data in _png_chunks(payload):
        if tag != b"IHDR":
            raise ValueError("png: first chunk is not IHDR")
        w, h, depth, ctype, comp, filt, interlace = struct.unpack(
            ">IIBBBBB", data[:13]
        )
        if depth != 8:
            raise ValueError(f"png: unsupported bit depth {depth}")
        if ctype not in _PNG_CHANNELS:
            raise ValueError(f"png: unsupported color type {ctype}")
        if interlace != 0:
            raise ValueError("png: interlaced images unsupported")
        if comp != 0 or filt != 0:
            raise ValueError("png: nonstandard compression/filter")
        return int(w), int(h), _PNG_CHANNELS[ctype]
    raise ValueError("png: no IHDR chunk")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


@_coerce_codec_errors
def decode_png(payload: bytes) -> np.ndarray:
    """HxWxC uint8 pixel array (C per color type). Implements the five
    PNG row filters; sequential filters (Sub/Average/Paeth) run as
    per-byte loops — acceptable for kernel-sized images, and the
    entropy-heavy half (inflate) is C-side zlib."""
    w, h, ch = png_info(payload)
    idat = b"".join(d for t, d in _png_chunks(payload) if t == b"IDAT")
    raw = zlib.decompress(idat)
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("png: IDAT size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint16)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        row = np.frombuffer(
            raw[pos + 1:pos + 1 + stride], dtype=np.uint8
        ).astype(np.uint16)
        pos += 1 + stride
        if ft == 0:
            cur = row
        elif ft == 2:  # Up — vectorizable
            cur = (row + prev) & 0xFF
        elif ft in (1, 3, 4):
            cur = row.copy()
            for i in range(stride):
                left = cur[i - ch] if i >= ch else 0
                up = prev[i]
                if ft == 1:
                    cur[i] = (row[i] + left) & 0xFF
                elif ft == 3:
                    cur[i] = (row[i] + ((int(left) + int(up)) >> 1)) & 0xFF
                else:
                    ul = prev[i - ch] if i >= ch else 0
                    cur[i] = (
                        row[i] + _paeth(int(left), int(up), int(ul))
                    ) & 0xFF
        else:
            raise ValueError(f"png: unknown filter type {ft}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, ch)


# -- BMP --------------------------------------------------------------------


@_coerce_codec_errors
def bmp_info(payload: bytes) -> tuple[int, int, int]:
    """(width, height, bits-per-pixel) from the BITMAPINFOHEADER."""
    if not payload.startswith(b"BM"):
        raise ValueError("bmp: bad magic")
    hdr_size = struct.unpack("<I", payload[14:18])[0]
    if hdr_size < 40:
        raise ValueError(f"bmp: unsupported DIB header size {hdr_size}")
    w, h = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    compression = struct.unpack("<I", payload[30:34])[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"bmp: unsupported (compression={compression}, bpp={bpp})"
        )
    return int(w), int(h), int(bpp)


@_coerce_codec_errors
def decode_bmp(payload: bytes) -> np.ndarray:
    """HxWx3 uint8 (RGB). Handles 24/32-bit BI_RGB, 4-byte row padding,
    and both bottom-up (height > 0) and top-down storage."""
    w, h, bpp = bmp_info(payload)
    offset = struct.unpack("<I", payload[10:14])[0]
    top_down = h < 0
    h = abs(h)
    bytes_px = bpp // 8
    row_stride = (w * bytes_px + 3) & ~3
    rows = []
    for y in range(h):
        start = offset + y * row_stride
        row = np.frombuffer(
            payload[start:start + w * bytes_px], dtype=np.uint8
        ).reshape(w, bytes_px)
        rows.append(row[:, :3][:, ::-1])  # BGR(A) → RGB
    arr = np.stack(rows)
    return arr if top_down else arr[::-1]


def encode_bmp(arr: np.ndarray) -> bytes:
    """24-bit BI_RGB encoder for an HxWx3 (or HxW gray) uint8 array —
    gives resize a REAL container to return."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"encode_bmp: unsupported array shape {arr.shape}")
    if arr.shape[2] == 4:  # RGBA — drop alpha; 24bpp has no alpha plane
        arr = arr[:, :, :3]
    elif arr.shape[2] == 2:  # gray+alpha — gray channel only
        arr = np.repeat(arr[:, :, :1], 3, axis=2)
    elif arr.shape[2] == 1:
        arr = np.repeat(arr, 3, axis=2)
    h, w, _ = arr.shape
    row_stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (row_stride - w * 3)
    body = b"".join(
        arr[y, :, ::-1].tobytes() + pad for y in range(h - 1, -1, -1)
    )
    pixel_offset = 14 + 40
    file_size = pixel_offset + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_offset)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + dib + body


# -- dispatch ---------------------------------------------------------------


@_coerce_codec_errors
def decode_image(payload: bytes) -> np.ndarray:
    """HxWxC uint8 for natively-supported containers; ValueError for
    anything that needs PIL (callers fall through to that seam)."""
    kind = sniff(payload)
    if kind == "png":
        return decode_png(payload)
    if kind == "bmp":
        return decode_bmp(payload)
    raise ValueError(f"no native decoder for {kind or 'unknown'}")


@_coerce_codec_errors
def image_info(payload: bytes) -> tuple[int, int, str]:
    """(width, height, format) without a full pixel decode."""
    kind = sniff(payload)
    if kind == "png":
        w, h, _ = png_info(payload)
        return w, h, "png"
    if kind == "bmp":
        w, h, _ = bmp_info(payload)
        return w, abs(h), "bmp"
    raise ValueError(f"no native decoder for {kind or 'unknown'}")


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample — pure index arithmetic, exact and
    deterministic (the property the oracle rows need; bilinear would
    drag float rounding into cross-engine comparisons)."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return arr[ys][:, xs]


# -- WAV --------------------------------------------------------------------


@_coerce_codec_errors
def wav_features(payload: bytes) -> dict:
    """Real audio features from PCM WAV bytes via the stdlib ``wave``
    module: duration, sample rate, channels, RMS and peak normalized to
    [-1, 1]."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        n = wf.getnframes()
        rate = wf.getframerate()
        width = wf.getsampwidth()
        channels = wf.getnchannels()
        frames = wf.readframes(n)
    if width == 2:
        samples = np.frombuffer(frames, dtype="<i2").astype(np.float64)
        samples /= 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        samples = np.frombuffer(frames, dtype=np.uint8).astype(np.float64)
        samples = (samples - 128.0) / 128.0
    else:
        raise ValueError(f"wav: unsupported sample width {width}")
    rms = float(np.sqrt(np.mean(samples**2))) if samples.size else 0.0
    peak = float(np.max(np.abs(samples))) if samples.size else 0.0
    return {
        "duration_s": n / rate if rate else 0.0,
        "sample_rate": rate,
        "n_channels": channels,
        "rms": rms,
        "peak": peak,
    }
