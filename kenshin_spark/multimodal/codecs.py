"""Pure-stdlib image/audio codecs — REAL decode paths with no external
dependencies, closing part of the codec gap the PIL seam guards.

Supported natively (struct/zlib/wave + numpy only):

- **BMP**: uncompressed BI_RGB 24/32-bit (the standard interchange
  form) — decode to HxWx3 uint8 and encode back (24-bit), so resize
  can return a real image container, not stand-in bytes.
- **PNG**: 8- and 16-bit gray / gray+alpha / RGB / RGBA (16-bit for
  the non-paletted types), non-interlaced — chunk walk, zlib inflate,
  and full defiltering (None/Sub/Up/Average/Paeth per the PNG spec
  §9, byte-wise with the bytes-per-pixel left offset).
- **WAV**: PCM via the stdlib ``wave`` module — true duration, sample
  rate, channel count, RMS and peak from the samples themselves.
- **JPEG**: baseline sequential DCT (ITU-T T.81) — marker walk, 8-bit
  DQT, SOF0, canonical-Huffman DHT, restart intervals, entropy decode,
  dequantize + inverse zigzag + float iDCT, chroma upsample, JFIF
  YCbCr→RGB. Gray / 4:4:4 / 4:2:2 / 4:2:0.
- **Progressive JPEG** (SOF2, T.81 Annex G): multi-scan coefficient
  accumulation — interleaved/non-interleaved DC first + refinement
  scans, AC spectral-selection bands with EOBn run decoding, AC
  successive-approximation refinement with correction bits, restart
  intervals — then one vectorized dequant + iDCT pass. The write half
  (:func:`encode_jpeg_progressive`) emits a spec-conformant
  spectral-selection + successive-approximation scan script so the
  decoder is pinned by roundtrips, not fixtures.

Paletted PNG (color type 3, incl. tRNS palette alpha) decodes natively
since r11 (:func:`decode_png` PLTE expansion, write half
:func:`encode_png_paletted`). VP8-lossy WebP pixels still route to the
PIL seam in ``multimodal/__init__.py`` (VP8's boolean arithmetic
decoder + loop filter is a whole video codec and does not belong here;
WebP DIMENSIONS parse natively for all variants).

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
    ValueError — so coerce them here.  JPEG adds two more leak paths: a
    truncated entropy stream indexes past the payload (IndexError) and
    an early/injected marker escapes the scan loop as _MarkerHit; both
    must also degrade to ValueError so one corrupt image falls through
    to the PIL/stand-in seam instead of killing the Arrow batch."""
    import wave

    @functools.wraps(fn)
    def wrapper(payload, *args, **kwargs):
        try:
            return fn(payload, *args, **kwargs)
        except (
            struct.error,
            zlib.error,
            wave.Error,
            EOFError,
            IndexError,
            KeyError,  # malformed multi-scan headers (bad table/comp ids)
            OverflowError,  # absurd corrupted coefficients vs int32 planes
        ) as exc:
            raise ValueError(f"{fn.__name__}: malformed payload ({exc})") from exc
        except _MarkerHit as exc:
            raise ValueError(
                f"{fn.__name__}: unexpected marker 0x{exc.marker:04x}"
            ) from exc

    return wrapper

#: PNG color type → samples per pixel (non-paletted types)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_image_bulk(payload: bytes) -> "np.ndarray":
    """:func:`decode_image` for BULK paths (resize/phash kernels over
    whole corpora): identical pixels, but lossy-VP8 WebP prefers a
    libwebp-backed decoder (PIL) when one is importable — the native
    RFC 6386 Python decoder is bit-exact (tests/test_vp8.py pins it
    against WebPDecodeRGBA, which is exactly what PIL calls) but runs
    at ~2 images/s/core, a 100 TB-scale trap (VERDICT r11 item 9). The
    native decoder stays the oracle and the fallback; golden rows keep
    calling :func:`decode_image` directly."""
    if sniff(payload) == "webp":
        from kenshin_spark.multimodal import webp as _webp

        if _webp.is_lossy_vp8(payload):
            try:
                from io import BytesIO

                from PIL import Image  # noqa: F401 — optional, bulk only

                return np.asarray(
                    Image.open(BytesIO(payload)).convert("RGBA")
                )
            except ImportError:
                pass  # no PIL in this environment — native fallback
            except Exception:
                pass  # undecodable by PIL — let the native path decide
    return decode_image(payload)


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


def _png_ihdr(payload: bytes) -> tuple[int, int, int, int]:
    """(width, height, depth, color_type) from IHDR, profile-checked:
    8-bit, non-interlaced, standard compression/filter. Color types:
    0 gray, 2 RGB, 3 paletted (decoded via PLTE), 4 gray+alpha,
    6 RGBA."""
    for tag, data in _png_chunks(payload):
        if tag != b"IHDR":
            raise ValueError("png: first chunk is not IHDR")
        w, h, depth, ctype, comp, filt, interlace = struct.unpack(
            ">IIBBBBB", data[:13]
        )
        # legal depth/type combos (spec 11.2.2): 1/2/4 only for gray
        # and paletted, 16 only for the non-paletted types
        ok = depth == 8 or (
            depth == 16 and ctype in _PNG_CHANNELS
        ) or (depth in (1, 2, 4) and ctype in (0, 3))
        if not ok:
            raise ValueError(f"png: unsupported bit depth {depth}")
        if ctype not in _PNG_CHANNELS and ctype != 3:
            raise ValueError(f"png: unsupported color type {ctype}")
        if interlace not in (0, 1):
            raise ValueError("png: unknown interlace method")
        if comp != 0 or filt != 0:
            raise ValueError("png: nonstandard compression/filter")
        return int(w), int(h), int(depth), int(ctype), int(interlace)
    raise ValueError("png: no IHDR chunk")


@_coerce_codec_errors
def png_info(payload: bytes) -> tuple[int, int, int]:
    """(width, height, channels-after-decode) from IHDR; raises
    ValueError for forms outside the supported profile. Images whose
    decode synthesizes an alpha channel report it: paletted (type 3)
    expands the PLTE lookup to 3, or 4 with tRNS palette alpha;
    gray/RGB (types 0/2) gain a channel when tRNS names a transparent
    color (spec 11.3.2)."""
    w, h, _depth, ctype, _il = _png_ihdr(payload)
    ch = 3 if ctype == 3 else _PNG_CHANNELS[ctype]
    if ctype in (0, 2, 3) and any(
        t == b"tRNS" for t, _ in _png_chunks(payload)
    ):
        ch += 1
    return w, h, ch


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


#: Adam7 pass layout, spec 8.2: (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(
    raw: bytes, pos: int, w: int, h: int, ch: int, depth: int
) -> tuple[np.ndarray, int]:
    """Unfilter ``h`` scanlines of ``w`` pixels starting at
    ``raw[pos]`` — the shared kernel for the whole image (non-
    interlaced) and for each Adam7 pass (each pass restarts filtering
    with a zero prior row, spec 8.2). Filters operate on BYTES with a
    bytes-per-pixel left offset, floored at 1 for sub-byte depths
    (spec 9.2). Returns (h x stride uint8 scanline bytes, new pos)."""
    bypp = max(1, ch * depth // 8)
    stride = (w * ch * depth + 7) // 8
    if pos + h * (stride + 1) > len(raw):
        raise ValueError("png: IDAT size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint16)
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
                left = cur[i - bypp] if i >= bypp else 0
                up = prev[i]
                if ft == 1:
                    cur[i] = (row[i] + left) & 0xFF
                elif ft == 3:
                    cur[i] = (row[i] + ((int(left) + int(up)) >> 1)) & 0xFF
                else:
                    ul = prev[i - bypp] if i >= bypp else 0
                    cur[i] = (
                        row[i] + _paeth(int(left), int(up), int(ul))
                    ) & 0xFF
        else:
            raise ValueError(f"png: unknown filter type {ft}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out, pos


def _png_samples(
    rows: np.ndarray, w: int, ch: int, depth: int
) -> np.ndarray:
    """Scanline bytes → an (h, w*ch) sample array: big-endian pair
    view for 16-bit, identity for 8-bit, MSB-first bit regrouping for
    sub-byte depths (spec 7.2 — the last byte's padding bits are
    dropped here)."""
    h = rows.shape[0]
    n = w * ch
    if depth == 16:
        return (
            np.ascontiguousarray(rows).view(">u2")
            .astype(np.uint16).reshape(h, n)
        )
    if depth == 8:
        return rows.reshape(h, -1)[:, :n]
    bits = np.unpackbits(rows, axis=1)
    usable = (bits.shape[1] // depth) * depth
    grouped = bits[:, :usable].reshape(h, -1, depth).astype(np.uint8)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (grouped * weights).sum(axis=2).astype(np.uint8)[:, :n]


@_coerce_codec_errors
def decode_png(payload: bytes) -> np.ndarray:
    """HxWxC uint8 pixel array (C per color type; paletted color type 3
    decodes to HxWx3 via the PLTE lookup); HxWxC uint16 for 16-bit
    images (faithful — :func:`decode_image` downconverts for the
    uint8 pipeline contract). Covers every legal depth/type combo of
    the baseline profile — 1/2/4-bit gray and paletted (sub-byte
    samples scale by bit replication, spec 11.2.2 note), 8-bit
    everything, 16-bit non-paletted — plus Adam7 interlacing (each
    pass unfilters independently, then scatters into the full grid,
    spec 8.2). Sequential filters (Sub/Average/Paeth) run as per-byte
    loops — acceptable for kernel-sized images, and the entropy-heavy
    half (inflate) is C-side zlib."""
    w, h, depth, ctype, interlace = _png_ihdr(payload)
    # filtering operates on the RAW byte stream: palette indices for
    # color type 3, channels x bytes-per-sample otherwise
    ch = 1 if ctype == 3 else _PNG_CHANNELS[ctype]
    idat = b"".join(d for t, d in _png_chunks(payload) if t == b"IDAT")
    raw = zlib.decompress(idat)
    dt = np.uint16 if depth == 16 else np.uint8
    if interlace == 0:
        rows, pos = _png_unfilter(raw, 0, w, h, ch, depth)
        samples = _png_samples(rows, w, ch, depth).reshape(h, w, ch)
    else:  # Adam7: 7 independent sub-images, scattered by stride
        samples = np.zeros((h, w, ch), dtype=dt)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue  # pass empty at this image size (spec 8.2)
            rows, pos = _png_unfilter(raw, pos, pw, ph, ch, depth)
            sub = _png_samples(rows, pw, ch, depth).reshape(ph, pw, ch)
            samples[y0::dy, x0::dx, :] = sub
    if pos != len(raw):
        raise ValueError("png: IDAT size mismatch")
    if ctype == 3:
        plte, trns = b"", b""
        for t, d in _png_chunks(payload):
            if t == b"PLTE":
                plte += d
            elif t == b"tRNS":
                trns += d
        if not plte or len(plte) % 3:
            raise ValueError("png: paletted image without a valid PLTE")
        palette = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = samples.reshape(h, w)
        if int(idx.max(initial=0)) >= palette.shape[0]:
            raise ValueError("png: palette index out of range")
        if trns:  # palette alpha: one byte per leading entry, rest 255
            alpha = np.full(palette.shape[0], 255, dtype=np.uint8)
            a = np.frombuffer(trns, dtype=np.uint8)[: palette.shape[0]]
            alpha[: len(a)] = a
            palette = np.concatenate([palette, alpha[:, None]], axis=1)
        return palette[idx]  # HxWx3 RGB (HxWx4 with tRNS)
    trns = b"".join(d for t, d in _png_chunks(payload) if t == b"tRNS")
    if trns and ctype in (0, 2):
        # tRNS names ONE fully-transparent sample value (pre-scaling,
        # 16-bit fields; spec 11.3.2) — decode synthesizes the alpha
        # channel a viewer would composite with
        key = struct.unpack(f">{ch}H", trns[: 2 * ch])
        mask = np.all(samples == np.array(key, dtype=dt), axis=2)
        opaque = 65535 if depth == 16 else 255
        alpha = np.where(mask, 0, opaque).astype(dt)
        if depth < 8:
            samples = samples * np.uint8(255 // ((1 << depth) - 1))
        return np.concatenate([samples, alpha[:, :, None]], axis=2)
    if depth < 8:
        # bit replication maps the sample range onto 0..255 exactly:
        # 1-bit x255, 2-bit x85, 4-bit x17 (spec 11.2.2 note)
        samples = samples * np.uint8(255 // ((1 << depth) - 1))
    return samples


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + tag + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal 8-bit RGB PNG (color type 2, filter 0 rows) — the
    write half of the decode_png loop, for engine-built fixtures and
    re-encode paths."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_png: expects HxWx3 uint8")
    h, w, _ = arr.shape
    raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_SIG + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def encode_png16(arr: np.ndarray) -> bytes:
    """16-bit PNG (filter 0 rows, big-endian samples per spec 7.1):
    HxW or HxWx1 uint16 → grayscale (color type 0), HxWx3 → RGB
    (color type 2) — the write half of decode_png's depth-16 branch,
    for engine-built fixtures (scientific/scanner imagery is where
    16-bit PNG ships in real corpora)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint16)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 3):
        raise ValueError("encode_png16: expects HxW[x1|x3] uint16")
    h, w, ch = arr.shape
    ctype = 0 if ch == 1 else 2
    be = arr.astype(">u2")
    raw = b"".join(b"\x00" + be[r].tobytes() for r in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 16, ctype, 0, 0, 0)
    return (
        PNG_SIG + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_paletted(arr: np.ndarray) -> bytes:
    """8-bit paletted PNG (color type 3): palette = the image's unique
    RGB colors (≤256, else ValueError), IDAT = filter-0 index rows.
    Together with decode_png's PLTE expansion this closes the
    'paletted containers route to the PIL seam' gap — index maps,
    sprites, and quantized thumbnails are the common real-corpus case
    (W3C PNG §4.1.2 / §11.2.3)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_png_paletted: expects HxWx3 uint8")
    h, w, _ = arr.shape
    flat = arr.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if palette.shape[0] > 256:
        raise ValueError(
            f"encode_png_paletted: {palette.shape[0]} colors > 256"
        )
    idx = inverse.astype(np.uint8).reshape(h, w)
    raw = b"".join(b"\x00" + idx[r].tobytes() for r in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    return (
        PNG_SIG + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", palette.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


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
    anything that needs PIL (callers fall through to that seam).
    16-bit PNGs downconvert by high byte (the standard 16→8 map —
    exactly ``round(v / 257)`` off by at most one, and bit-exact with
    taking the MSB of the big-endian sample stream) so the pipeline
    contract stays uint8; use :func:`decode_png` directly for the
    faithful uint16 array."""
    kind = sniff(payload)
    if kind == "png":
        arr = decode_png(payload)
        if arr.dtype == np.uint16:
            arr = (arr >> 8).astype(np.uint8)
        return arr
    if kind == "bmp":
        return decode_bmp(payload)
    if kind == "jpeg":
        return decode_jpeg(payload)
    if kind == "webp":  # VP8L lossless AND lossy VP8 (+ALPH), native
        from kenshin_spark.multimodal import webp

        return webp.decode_webp(payload)
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
    if kind == "jpeg":
        w, h, _ = jpeg_info(payload)
        return w, h, "jpeg"
    if kind == "webp":  # header-only: works for lossy VP8/VP8X too
        from kenshin_spark.multimodal import webp

        w, h = webp.webp_info(payload)
        return w, h, "webp"
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


# -- JPEG (baseline sequential DCT) -----------------------------------------
#
# A from-scratch baseline-JPEG decoder per ITU-T T.81: marker walk, DQT
# (8-bit) / SOF0 / DHT (canonical Huffman) / DRI / SOS, entropy decode
# with byte-stuffing + restart markers, dequantize, inverse zigzag,
# float iDCT, chroma upsample, JFIF YCbCr->RGB. Covers the profile the
# wild overwhelmingly ships (baseline, 8-bit, gray/4:4:4/4:2:2/4:2:0);
# progressive (SOF2), arithmetic coding, 12-bit, and hierarchical raise
# ValueError and fall through to the PIL seam. The bit-serial Huffman
# loop is Python: acceptable for kernel-sized images, like PNG's
# sequential filters above.

#: zigzag order: index i of the scan -> (row, col) in the 8x8 block
_ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]


#: zigzag index k -> flattened natural index r*8+c (both directions:
#: ``nat[..., _ZZ_FLAT] = zz`` de-zigzags, ``nat[..., _ZZ_FLAT]`` gathers)
_ZZ_FLAT = np.array([r * 8 + c for r, c in _ZIGZAG])


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: F = M @ f @ M.T, f = M.T @ F @ M."""
    n = np.arange(8)
    k = n[:, None]
    m = np.cos((2 * n + 1) * k * np.pi / 16) / 2.0
    m[0] /= np.sqrt(2)
    return m


_DCT_M = _dct_matrix()


class _HuffTable:
    """Canonical table plus an 8-bit primary LUT: codes of length <= 8
    (every code our own encoder emits, and the overwhelming bulk of
    wild tables) decode with ONE indexed lookup instead of a bit-serial
    tree walk — the classic fast-Huffman layout."""

    __slots__ = ("codes", "lut")

    def __init__(self, codes: dict):
        self.codes = codes
        lut: list = [None] * 256
        for (length, code), sym in codes.items():
            if length <= 8:
                base = code << (8 - length)
                for i in range(1 << (8 - length)):
                    lut[base | i] = (sym, length)
        self.lut = lut


def _build_huffman(counts: list[int], symbols: bytes) -> _HuffTable:
    """Canonical Huffman per T.81 Annex C."""
    table = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[idx]
            idx += 1
            code += 1
        code <<= 1
    return _HuffTable(table)


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment, handling
    0xFF00 byte stuffing; stops at any real marker (caller handles
    RSTn). ``decode_symbol``'s fill-to-8 can leave up to 14 buffered
    bits MID-STREAM, so ``byte_align`` is only exact where this codec
    calls it — restart boundaries — where marker bytes never enter the
    buffer (``_fill`` raises on them) and every non-padding bit has
    been consumed, leaving at most the final byte's <= 7 padding bits.
    Do NOT add a mid-stream ``byte_align``: it would silently discard
    buffered data bytes."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.acc = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerHit(0xFF00 | nxt)
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.bits += 8

    def read_bit(self) -> int:
        if self.bits == 0:
            self._fill()
        self.bits -= 1
        return (self.acc >> self.bits) & 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.bits < n:
            self._fill()
        self.bits -= n
        v = (self.acc >> self.bits) & ((1 << n) - 1)
        self.acc &= (1 << self.bits) - 1  # keep the int small
        return v

    def _decode_walk(self, codes: dict) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = codes.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")

    def decode_symbol(self, table: _HuffTable) -> int:
        bits = self.bits
        if bits < 8:
            try:
                while self.bits < 8:
                    self._fill()
            except _MarkerHit:
                # stream tail: fall back to the serial walk, which
                # consumes only the bits that exist
                return self._decode_walk(table.codes)
            bits = self.bits
        ent = table.lut[(self.acc >> (bits - 8)) & 0xFF]
        if ent is not None:
            sym, length = ent
            self.bits = bits - length
            self.acc &= (1 << self.bits) - 1
            return sym
        return self._decode_walk(table.codes)  # code longer than 8 bits

    def byte_align(self) -> None:
        self.bits = 0
        self.acc = 0


class _MarkerHit(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t raw bits to a signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


@_coerce_codec_errors
def jpeg_info(payload: bytes) -> tuple[int, int, int]:
    """(width, height, n_components) from the frame header without a
    pixel decode (baseline or progressive); ValueError for other
    processes (arithmetic, lossless, hierarchical)."""
    hdr = _jpeg_segments(payload, header_only=True)
    return hdr["w"], hdr["h"], len(hdr["components"])


def _parse_dqt(seg: bytes, qt: dict) -> None:
    p = 0
    while p < len(seg):
        pq, tq = seg[p] >> 4, seg[p] & 0x0F
        if pq != 0:
            raise ValueError("jpeg: 16-bit quant tables unsupported")
        tbl = np.zeros((8, 8), dtype=np.float64)
        for i, (r, c) in enumerate(_ZIGZAG):
            tbl[r, c] = seg[p + 1 + i]
        qt[tq] = tbl
        p += 65


def _parse_dht(seg: bytes, huff_dc: dict, huff_ac: dict) -> None:
    p = 0
    while p < len(seg):
        tc, th = seg[p] >> 4, seg[p] & 0x0F
        counts = list(seg[p + 1:p + 17])
        nsym = sum(counts)
        symbols = seg[p + 17:p + 17 + nsym]
        table = _build_huffman(counts, symbols)
        (huff_dc if tc == 0 else huff_ac)[th] = table
        p += 17 + nsym


def _parse_sof(seg: bytes, progressive: bool) -> dict:
    prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
    if prec != 8:
        raise ValueError(f"jpeg: {prec}-bit precision unsupported")
    if w == 0 or h == 0 or not 1 <= ncomp <= 4:
        raise ValueError("jpeg: bad frame dimensions/component count")
    comps = []
    for i in range(ncomp):
        cid, hv, tq2 = seg[6 + 3 * i:9 + 3 * i]
        sh, sv = hv >> 4, hv & 0x0F
        if not (1 <= sh <= 4 and 1 <= sv <= 4):  # T.81 B.2.2
            raise ValueError("jpeg: bad sampling factors")
        comps.append({"id": cid, "h": sh, "v": sv, "tq": tq2})
    return {
        "w": int(w), "h": int(h), "components": comps,
        "progressive": progressive,
    }


#: SOFn markers for processes out of scope (arithmetic / lossless /
#: hierarchical / differential) — ValueError, PIL-seam fall-through
_JPEG_UNSUPPORTED_SOF = (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                         0xCD, 0xCE, 0xCF)


def _jpeg_segments(payload: bytes, header_only: bool = False) -> dict:
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("jpeg: bad SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("jpeg: expected marker")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", payload[pos:pos + 2])
        seg = payload[pos + 2:pos + seg_len]
        if marker == 0xDB:  # DQT
            _parse_dqt(seg, qt)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            frame = _parse_sof(seg, progressive=(marker == 0xC2))
            if header_only:
                return frame
        elif marker in _JPEG_UNSUPPORTED_SOF:
            raise ValueError(
                "jpeg: only baseline/progressive DCT supported"
            )
        elif marker == 0xC4:  # DHT
            _parse_dht(seg, huff_dc, huff_ac)
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            scan = {}
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i:3 + 2 * i]
                scan[cs] = (tdta >> 4, tdta & 0x0F)
            return {
                **frame,
                "qt": qt,
                "huff_dc": huff_dc,
                "huff_ac": huff_ac,
                "scan": scan,
                "data_pos": pos + seg_len,
                "restart": restart,
            }
        pos += seg_len
    if header_only and frame is not None:
        return frame
    raise ValueError("jpeg: no scan found")


def _skip_entropy(payload: bytes, pos: int) -> int:
    """Position of the next real marker after an entropy-coded segment
    (skipping 0xFF00 stuffing, RSTn, and 0xFF fill bytes)."""
    while True:
        nxt = payload.find(b"\xff", pos)
        if nxt < 0 or nxt + 1 >= len(payload):
            return len(payload)
        b = payload[nxt + 1]
        if b == 0x00 or 0xD0 <= b <= 0xD7:
            pos = nxt + 2
        elif b == 0xFF:  # fill byte
            pos = nxt + 1
        else:
            return nxt


def _jpeg_all_scans(payload: bytes) -> tuple[dict, dict, list[dict]]:
    """Full multi-scan walk (progressive streams): (frame, quant
    tables, scans). Each scan snapshots the Huffman tables in effect at
    its SOS — T.81 allows redefining tables between scans."""
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("jpeg: bad SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart = 0
    scans: list[dict] = []
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("jpeg: expected marker")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", payload[pos:pos + 2])
        seg = payload[pos + 2:pos + seg_len]
        if marker == 0xDB:
            _parse_dqt(seg, qt)
        elif marker in (0xC0, 0xC1, 0xC2):
            frame = _parse_sof(seg, progressive=(marker == 0xC2))
        elif marker in _JPEG_UNSUPPORTED_SOF:
            raise ValueError(
                "jpeg: only baseline/progressive DCT supported"
            )
        elif marker == 0xC4:
            _parse_dht(seg, huff_dc, huff_ac)
        elif marker == 0xDD:
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            comp_ids = []
            dc_tbls: dict[int, dict | None] = {}
            ac_tbls: dict[int, dict | None] = {}
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i:3 + 2 * i]
                comp_ids.append(cs)
                dc_tbls[cs] = huff_dc.get(tdta >> 4)
                ac_tbls[cs] = huff_ac.get(tdta & 0x0F)
            ss, se, ahal = seg[1 + 2 * ns:4 + 2 * ns]
            scans.append({
                "comps": comp_ids,
                "dc": dc_tbls,
                "ac": ac_tbls,
                "ss": ss, "se": se,
                "ah": ahal >> 4, "al": ahal & 0x0F,
                "data_pos": pos + seg_len,
                "restart": restart,
            })
            pos = _skip_entropy(payload, pos + seg_len)
            continue
        pos += seg_len
    if frame is None or not scans:
        raise ValueError("jpeg: no scan found")
    return frame, qt, scans


def _consume_rst(reader: _BitReader) -> None:
    """RSTn sits byte-aligned between MCUs; skip it (predictor/EOB-run
    resets are the caller's job)."""
    reader.byte_align()
    try:
        reader._fill()
        raise ValueError("jpeg: expected restart marker")
    except _MarkerHit as hit:
        if not (0xFFD0 <= hit.marker <= 0xFFD7):
            raise ValueError("jpeg: expected RSTn") from None
        reader.pos += 2
        reader.bits = 0


def _assemble_planes(comps, planes, w, h, hmax, vmax) -> np.ndarray:
    """Upsample subsampled planes, crop to image dims, JFIF YCbCr→RGB."""
    out_planes = []
    for c, pl in zip(comps, planes):
        if c["h"] != hmax or c["v"] != vmax:
            pl = np.repeat(
                np.repeat(pl, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        out_planes.append(pl[:h, :w])
    if len(out_planes) == 1:
        y = np.clip(out_planes[0] + 0.5, 0, 255).astype(np.uint8)
        return y[:, :, None]
    if len(out_planes) != 3:
        raise ValueError(f"jpeg: {len(out_planes)}-component images unsupported")
    y, cb, cr = out_planes
    cb = cb - 128.0
    cr = cr - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return np.clip(rgb + 0.5, 0, 255).astype(np.uint8)


@_coerce_codec_errors
def decode_jpeg(payload: bytes) -> np.ndarray:
    """HxWx3 uint8 RGB (HxWx1 for grayscale JPEGs) — baseline and
    progressive DCT."""
    # dispatch on the frame header only (the walk stops at SOFn, before
    # the entropy tables): the progressive path re-walks all scans
    # itself, so a FULL baseline parse here would be wasted work on the
    # Arrow-batch hot path — and reusing _jpeg_segments keeps one
    # marker walk instead of a third hand-rolled copy
    if _jpeg_segments(payload, header_only=True).get("progressive"):
        return _decode_jpeg_progressive(payload)
    hdr = _jpeg_segments(payload)
    w, h, comps = hdr["w"], hdr["h"], hdr["components"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    reader = _BitReader(payload, hdr["data_pos"])
    pred = [0] * len(comps)
    restart = hdr["restart"]
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_index and mcu_index % restart == 0:
                _consume_rst(reader)
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = hdr["scan"][c["id"]]
                dc_tbl, ac_tbl = hdr["huff_dc"][td], hdr["huff_ac"][ta]
                q = hdr["qt"][c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block = np.zeros((8, 8), dtype=np.float64)
                        t = reader.decode_symbol(dc_tbl)
                        if t > 15:  # corrupted stream: absurd category
                            raise ValueError("jpeg: bad DC size category")
                        pred[ci] += _extend(reader.read_bits(t), t)
                        block[0, 0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_tbl)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("jpeg: AC index overflow")
                            rr, cc = _ZIGZAG[k]
                            block[rr, cc] = _extend(reader.read_bits(s), s)
                            k += 1
                        px = _DCT_M.T @ (block * q) @ _DCT_M + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_index += 1
    return _assemble_planes(comps, planes, w, h, hmax, vmax)


# -- JPEG progressive decode (T.81 Annex G.2) --------------------------------
#
# Progressive streams deliver each component's DCT coefficients across
# several scans: a DC-first scan (optionally interleaved) plus DC
# refinements, then per-component AC spectral-selection bands, each
# optionally split into a first pass and successive-approximation
# refinement passes carrying one correction bit per already-nonzero
# coefficient. Decode accumulates integer coefficients per block in
# zigzag order, then runs ONE vectorized dequant + iDCT pass — the
# entropy half is bit-serial Python (like baseline), the math half is
# whole-array numpy.


def _decode_dc_scan(scan, frame, coefs, geom, payload):
    """DC scan (Ss=Se=0): first pass (Ah=0) decodes size-coded diffs at
    point transform Al; refinement (Ah>0) is one raw bit per block."""
    comps = frame["components"]
    by_id = {c["id"]: i for i, c in enumerate(comps)}
    if any(cid not in by_id for cid in scan["comps"]):
        raise ValueError("jpeg: scan names a component not in the frame")
    scan_cis = [by_id[cid] for cid in scan["comps"]]
    if scan["ah"] == 0 and any(
        scan["dc"][cid] is None for cid in scan["comps"]
    ):
        raise ValueError("jpeg: DC scan without DC table")
    al, first = scan["al"], scan["ah"] == 0
    restart = scan["restart"]
    reader = _BitReader(payload, scan["data_pos"])
    pred = {ci: 0 for ci in scan_cis}
    mcus_x, mcus_y = geom["mcus_x"], geom["mcus_y"]
    interleaved = len(scan_cis) > 1
    if interleaved:
        units = []
        for my in range(mcus_y):
            for mx in range(mcus_x):
                blocks = []
                for ci in scan_cis:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blocks.append(
                                (ci, my * c["v"] + by, mx * c["h"] + bx)
                            )
                units.append(blocks)
    else:
        ci = scan_cis[0]
        bh, bw = geom["used"][ci]
        units = [[(ci, by, bx)] for by in range(bh) for bx in range(bw)]
    for idx, blocks in enumerate(units):
        if restart and idx and idx % restart == 0:
            _consume_rst(reader)
            pred = {ci: 0 for ci in scan_cis}
        for ci, by, bx in blocks:
            if first:
                t = reader.decode_symbol(scan["dc"][comps[ci]["id"]])
                if t > 15:  # T.81: DC size category <= 15 (11 for 8-bit)
                    raise ValueError("jpeg: bad DC size category")
                pred[ci] += _extend(reader.read_bits(t), t)
                coefs[ci][by, bx, 0] = pred[ci] << al
            elif reader.read_bit():
                coefs[ci][by, bx, 0] |= 1 << al


def _decode_ac_scan(scan, frame, coefs, geom, payload):
    """AC scan (Ss>0, single component per T.81): spectral-selection
    first pass with EOBn runs (Ah=0), or successive-approximation
    refinement with correction bits (Ah>0) — the G.2.2 algorithm."""
    comps = frame["components"]
    by_id = {c["id"]: i for i, c in enumerate(comps)}
    if len(scan["comps"]) != 1:
        raise ValueError("jpeg: interleaved AC progressive scan")
    if scan["comps"][0] not in by_id:
        raise ValueError("jpeg: scan names a component not in the frame")
    ci = by_id[scan["comps"][0]]
    ac_tbl = scan["ac"][scan["comps"][0]]
    if ac_tbl is None:
        raise ValueError("jpeg: AC scan without AC table")
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    restart = scan["restart"]
    reader = _BitReader(payload, scan["data_pos"])
    bh, bw = geom["used"][ci]
    coef = coefs[ci]
    eobrun = 0
    p1, m1 = 1 << al, -(1 << al)
    idx = 0
    for by in range(bh):
        for bx in range(bw):
            if restart and idx and idx % restart == 0:
                _consume_rst(reader)
                eobrun = 0
            idx += 1
            zz = coef[by, bx]
            if ah == 0:  # first pass for this band
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = reader.decode_symbol(ac_tbl)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r < 15:  # EOBn: run of (1<<r)+bits blocks
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.read_bits(r)
                            break
                        k += 16  # ZRL
                        continue
                    k += r
                    if k > se:
                        raise ValueError("jpeg: AC index overflow")
                    zz[k] = _extend(reader.read_bits(s), s) << al
                    k += 1
                continue
            # refinement pass: correction bits for already-nonzero
            # coefficients, newly-nonzero coefficients arrive as ±p1
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = reader.decode_symbol(ac_tbl)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r < 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.read_bits(r)
                            break  # rest of block: EOB correction loop
                        newval = 0  # ZRL: 16 zero-history positions
                    else:
                        if s != 1:
                            raise ValueError("jpeg: bad refinement size")
                        newval = p1 if reader.read_bit() else m1
                    # advance over r zero-history coefficients, emitting
                    # a correction bit at each nonzero one passed
                    while k <= se:
                        if zz[k] != 0:
                            if reader.read_bit() and (zz[k] & p1) == 0:
                                zz[k] += p1 if zz[k] >= 0 else m1
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval and k <= se:
                        zz[k] = newval
                    k += 1
            if eobrun > 0:
                # EOB-run blocks still carry correction bits for every
                # already-nonzero coefficient in the band
                while k <= se:
                    if zz[k] != 0 and reader.read_bit() and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                    k += 1
                eobrun -= 1


def _decode_jpeg_progressive(payload: bytes) -> np.ndarray:
    frame, qt, scans = _jpeg_all_scans(payload)
    comps, w, h = frame["components"], frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    used = []
    coefs = []
    for c in comps:
        # full grid covers interleaved-MCU padding; non-interleaved
        # scans address only the used sub-grid (T.81 A.2.2 vs A.2.3)
        cw = -(-(w * c["h"]) // hmax)
        chs = -(-(h * c["v"]) // vmax)
        used.append((-(-chs // 8), -(-cw // 8)))
        coefs.append(
            np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32)
        )
    geom = {"mcus_x": mcus_x, "mcus_y": mcus_y, "used": used}
    for scan in scans:
        if scan["ss"] == 0:
            if scan["se"] != 0:
                raise ValueError("jpeg: DC scan with Se != 0")
            _decode_dc_scan(scan, frame, coefs, geom, payload)
        else:
            _decode_ac_scan(scan, frame, coefs, geom, payload)
    planes = []
    for c, zz_arr in zip(comps, coefs):
        q = qt[c["tq"]]
        nat = np.zeros(zz_arr.shape, dtype=np.float64)
        nat[:, :, _ZZ_FLAT] = zz_arr
        blocks = nat.reshape(*zz_arr.shape[:2], 8, 8) * q
        px = np.einsum("ij,abjk,kl->abil", _DCT_M.T, blocks, _DCT_M) + 128.0
        nby, nbx = zz_arr.shape[:2]
        planes.append(px.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8))
    return _assemble_planes(comps, planes, w, h, hmax, vmax)


# -- JPEG encoder (baseline sequential) -------------------------------------
#
# The write half of the JPEG loop: FDCT + all-ones quantization
# (near-lossless) + canonical Huffman per T.81 Annex C/F/K, 4:4:4 or
# 4:2:0. Custom (declared-in-DHT) tables keep the encoder small; any
# spec decoder — including decode_jpeg above — reads the stream.

_JPEG_DC_SYMS = bytes(range(12))
_JPEG_DC_COUNTS = [0, 0, 0, 12] + [0] * 12          # all 12 cats at length 4
# full (run, size) alphabet incl. s=0 rows: EOB0..EOB14 ((r<<4)|0) and
# ZRL (0xF0) — progressive AC scans emit EOBn run lengths; 176 symbols
# at length 8 under-subscribe the code space (176/256)
_JPEG_AC_SYMS = bytes([(r << 4) | s for r in range(16) for s in range(11)])
_JPEG_AC_COUNTS = [0] * 7 + [len(_JPEG_AC_SYMS)] + [0] * 8  # all at length 8


def _enc_table(counts, symbols):
    inv = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            inv[symbols[idx]] = (length, code)
            idx += 1
            code += 1
        code <<= 1
    return inv


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def align(self):
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)

    def raw_marker(self, marker):
        self.align()
        self.out += bytes([0xFF, marker])


def _jpeg_plane_prep(arr, subsample):
    """Shared encoder front half: color transform, MCU edge-padding,
    box-average chroma subsampling. Returns (prepped planes, sampling
    factors, h, w, mcus_x, mcus_y)."""
    arr = np.asarray(arr, dtype=np.float64)
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    h, w_px = arr.shape[:2]
    if arr.ndim == 2:
        planes = [arr]
        samp = [(1, 1)]
    else:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
        samp = [(1, 1)] * 3 if subsample == "444" else [(2, 2), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = (w_px + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    prepped = []
    for pl, (sh, sv) in zip(planes, samp):
        full_w, full_h = mcus_x * 8 * hmax, mcus_y * 8 * vmax
        pad = np.pad(pl, ((0, full_h - h), (0, full_w - w_px)), mode="edge")
        fx, fy = hmax // sh, vmax // sv
        if fx > 1 or fy > 1:  # box-average chroma subsample
            pad = pad.reshape(full_h // fy, fy, full_w // fx, fx).mean(
                axis=(1, 3)
            )
        prepped.append(pad)
    return prepped, samp, h, w_px, mcus_x, mcus_y


def _jpeg_coefficients(arr, subsample):
    """FDCT + all-ones quantization over every block at once: one
    (blocks_y, blocks_x, 64) int array per component, zigzag order."""
    prepped, samp, h, w_px, mcus_x, mcus_y = _jpeg_plane_prep(arr, subsample)
    coefs = []
    for pl in prepped:
        bh, bw = pl.shape[0] // 8, pl.shape[1] // 8
        blocks = pl.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        f = np.einsum("ij,abjk,kl->abil", _DCT_M, blocks - 128.0, _DCT_M.T)
        nat = np.rint(f).astype(np.int64).reshape(bh, bw, 64)
        coefs.append(nat[:, :, _ZZ_FLAT])
    return coefs, samp, h, w_px, mcus_x, mcus_y


def _encode_block(w, dc_tbl, ac_tbl, zz, pred):
    diff = zz[0] - pred
    t = int(abs(diff)).bit_length()
    length, code = dc_tbl[t]
    w.write(code, length)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_tbl[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        s = int(abs(v)).bit_length()
        length, code = ac_tbl[(run << 4) | s]
        w.write(code, length)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        length, code = ac_tbl[0x00]  # EOB
        w.write(code, length)
    return zz[0]


def encode_jpeg(arr, subsample="444", restart=0):
    """Baseline-JPEG writer: gray (HxW / HxWx1) or RGB (HxWx3), 4:4:4 or
    4:2:0, all-ones quant table (near-lossless), one canonical Huffman
    table pair, optional restart interval — the write half of the
    multimodal codec loop (resize/export can emit real JPEG containers,
    the mirror of the .hs exporter closing the import loop)."""
    coefs, samp, h, w_px, mcus_x, mcus_y = _jpeg_coefficients(arr, subsample)

    dc_tbl = _enc_table(_JPEG_DC_COUNTS, _JPEG_DC_SYMS)
    ac_tbl = _enc_table(_JPEG_AC_COUNTS, _JPEG_AC_SYMS)
    bw = _BitWriter()
    pred = [0] * len(coefs)
    mcu_index = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_index and mcu_index % restart == 0:
                bw.raw_marker(0xD0 + rst % 8)
                rst += 1
                pred = [0] * len(coefs)
            for ci, (zz_arr, (sh, sv)) in enumerate(zip(coefs, samp)):
                for by in range(sv):
                    for bx in range(sh):
                        zz = zz_arr[my * sv + by, mx * sh + bx].tolist()
                        pred[ci] = _encode_block(
                            bw, dc_tbl, ac_tbl, zz, pred[ci]
                        )
            mcu_index += 1
    bw.align()

    sos = bytes([len(coefs)]) + b"".join(
        bytes([i + 1, 0x00]) for i in range(len(coefs))
    ) + bytes([0, 63, 0])
    out = b"\xff\xd8"
    out += _jpeg_headers(0xC0, samp, h, w_px)
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    out += _seg(0xDA, sos)
    out += bytes(bw.out) + b"\xff\xd9"
    return out


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _jpeg_headers(sof_marker, samp, h, w_px):
    """DQT (all-ones) + SOFn + DHT shared by both encoders."""
    qt_body = bytes([0x00]) + bytes([1] * 64)  # table 0, all ones (zigzag)
    sof_comps = b"".join(
        bytes([i + 1, (sh << 4) | sv, 0]) for i, (sh, sv) in enumerate(samp)
    )
    sof = struct.pack(">BHHB", 8, h, w_px, len(samp)) + sof_comps
    dht = (
        bytes([0x00]) + bytes(_JPEG_DC_COUNTS) + _JPEG_DC_SYMS
        + bytes([0x10]) + bytes(_JPEG_AC_COUNTS) + _JPEG_AC_SYMS
    )
    return _seg(0xDB, qt_body) + _seg(sof_marker, sof) + _seg(0xC4, dht)


# -- JPEG progressive encoder (T.81 Annex G.1) -------------------------------


def encode_jpeg_progressive(arr, subsample="444", levels=1, restart=0):
    """Progressive-JPEG writer (SOF2): spectral selection (DC scan, AC
    bands 1–5 and 6–63 per component) layered with ``levels`` rounds of
    successive approximation (first passes at Al=levels, then
    refinement scans stepping Al down to 0, correction bits per G.1.2).
    With the all-ones quant table the fully-refined stream carries
    exactly the coefficients :func:`encode_jpeg` would — the decoded
    pixels are bit-identical to the baseline encoding, which is what
    pins :func:`_decode_jpeg_progressive` in tests. ``levels=0`` emits
    a pure spectral-selection script."""
    coefs, samp, h, w_px, mcus_x, mcus_y = _jpeg_coefficients(arr, subsample)
    ncomp = len(coefs)
    dc_tbl = _enc_table(_JPEG_DC_COUNTS, _JPEG_DC_SYMS)
    ac_tbl = _enc_table(_JPEG_AC_COUNTS, _JPEG_AC_SYMS)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    used = []  # non-interleaved scans cover only the used block grid
    for sh, sv in samp:
        cw = -(-(w_px * sh) // hmax)
        chs = -(-(h * sv) // vmax)
        used.append((-(-chs // 8), -(-cw // 8)))

    def sos_header(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])  # every table lives in slot 0
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    def dc_scan(al, first):
        bw = _BitWriter()
        pred = [0] * ncomp
        idx = rst = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart and idx and idx % restart == 0:
                    bw.raw_marker(0xD0 + rst % 8)
                    rst += 1
                    pred = [0] * ncomp
                for ci, (zz_arr, (sh, sv)) in enumerate(zip(coefs, samp)):
                    for by in range(sv):
                        for bx in range(sh):
                            dc = int(zz_arr[my * sv + by, mx * sh + bx, 0])
                            if first:
                                # Python >> floors, the arithmetic shift
                                # the DC point transform requires
                                diff = (dc >> al) - pred[ci]
                                pred[ci] += diff
                                t = abs(diff).bit_length()
                                length, code = dc_tbl[t]
                                bw.write(code, length)
                                if t:
                                    bw.write(
                                        diff if diff >= 0
                                        else diff + (1 << t) - 1, t,
                                    )
                            else:
                                bw.write((dc >> al) & 1, 1)
                idx += 1
        bw.align()
        return bytes(bw.out)

    def ac_first(ci, ss, se, al):
        bw = _BitWriter()
        zz_arr, (bh, bwd) = coefs[ci], used[ci]
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                nbits = eobrun.bit_length() - 1
                length, code = ac_tbl[nbits << 4]
                bw.write(code, length)
                if nbits:
                    bw.write(eobrun & ((1 << nbits) - 1), nbits)
                eobrun = 0

        idx = rst = 0
        for by in range(bh):
            for bxi in range(bwd):
                if restart and idx and idx % restart == 0:
                    flush_eob()
                    bw.raw_marker(0xD0 + rst % 8)
                    rst += 1
                idx += 1
                zz = zz_arr[by, bxi]
                r = 0
                for k in range(ss, se + 1):
                    v = int(zz[k])
                    t = abs(v) >> al
                    if t == 0:
                        r += 1
                        continue
                    flush_eob()
                    while r > 15:
                        length, code = ac_tbl[0xF0]
                        bw.write(code, length)
                        r -= 16
                    s = t.bit_length()
                    length, code = ac_tbl[(r << 4) | s]
                    bw.write(code, length)
                    bw.write(t if v >= 0 else t ^ ((1 << s) - 1), s)
                    r = 0
                if r > 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
        flush_eob()
        bw.align()
        return bytes(bw.out)

    def ac_refine(ci, ss, se, al):
        bw = _BitWriter()
        zz_arr, (bh, bwd) = coefs[ci], used[ci]
        eobrun = 0
        pending: list[int] = []  # correction bits riding the next EOBn

        def flush_eob():
            nonlocal eobrun, pending
            if eobrun:
                nbits = eobrun.bit_length() - 1
                length, code = ac_tbl[nbits << 4]
                bw.write(code, length)
                if nbits:
                    bw.write(eobrun & ((1 << nbits) - 1), nbits)
                for b in pending:
                    bw.write(b, 1)
                eobrun = 0
                pending = []

        idx = rst = 0
        for by in range(bh):
            for bxi in range(bwd):
                if restart and idx and idx % restart == 0:
                    flush_eob()
                    bw.raw_marker(0xD0 + rst % 8)
                    rst += 1
                idx += 1
                zz = zz_arr[by, bxi]
                absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
                eob = ss - 1  # band index of the last newly-nonzero coef
                for i, t in enumerate(absv):
                    if t == 1:
                        eob = ss + i
                r = 0
                br: list[int] = []  # corrections since the last symbol
                for i, t in enumerate(absv):
                    k = ss + i
                    if t == 0:
                        r += 1
                        continue
                    # ZRLs only when more newly-nonzero coefs follow;
                    # otherwise the zeros fold into the EOB run
                    while r > 15 and k <= eob:
                        flush_eob()
                        length, code = ac_tbl[0xF0]
                        bw.write(code, length)
                        r -= 16
                        for b in br:
                            bw.write(b, 1)
                        br = []
                    if t > 1:  # already nonzero: one correction bit
                        br.append(t & 1)
                        continue
                    flush_eob()  # newly nonzero: run/1 symbol + sign
                    length, code = ac_tbl[(r << 4) | 1]
                    bw.write(code, length)
                    bw.write(0 if int(zz[k]) < 0 else 1, 1)
                    for b in br:
                        bw.write(b, 1)
                    br = []
                    r = 0
                if r > 0 or br:
                    eobrun += 1
                    pending.extend(br)
                    if eobrun == 0x7FFF or len(pending) > 937:
                        flush_eob()
        flush_eob()
        bw.align()
        return bytes(bw.out)

    all_ids = [i + 1 for i in range(ncomp)]
    bands = [(1, 5), (6, 63)]
    out = bytearray(b"\xff\xd8")
    out += _jpeg_headers(0xC2, samp, h, w_px)
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    out += sos_header(all_ids, 0, 0, 0, levels) + dc_scan(levels, True)
    for b in range(levels, 0, -1):
        out += sos_header(all_ids, 0, 0, b, b - 1) + dc_scan(b - 1, False)
    for ci in range(ncomp):
        for bs, be in bands:
            out += sos_header([ci + 1], bs, be, 0, levels)
            out += ac_first(ci, bs, be, levels)
    for b in range(levels, 0, -1):
        for ci in range(ncomp):
            for bs, be in bands:
                out += sos_header([ci + 1], bs, be, b, b - 1)
                out += ac_refine(ci, bs, be, b - 1)
    out += b"\xff\xd9"
    return bytes(out)


