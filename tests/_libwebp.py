"""ctypes bindings for the system libwebp — the INDEPENDENT oracle for
the native VP8 decoder tests (the role javax.imageio plays for
PNG/JPEG). Test-only: the engine's decode path never imports this."""

import ctypes

import numpy as np

try:
    _lib = ctypes.CDLL("libwebp.so.7")
except OSError:  # pragma: no cover - environment without libwebp
    _lib = None

if _lib is not None:
    _lib.WebPEncodeRGB.restype = ctypes.c_size_t
    _lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ]
    _lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
    _lib.WebPEncodeLosslessRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ]
    _lib.WebPEncodeRGBA.restype = ctypes.c_size_t
    _lib.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ]
    _lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
    _lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    _lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
    _lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]


def available() -> bool:
    return _lib is not None


def encode_rgb(rgb: np.ndarray, quality: float = 75.0) -> bytes:
    """Lossy-encode an HxWx3 uint8 array → WebP container bytes."""
    h, w, _ = rgb.shape
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = _lib.WebPEncodeRGB(
        np.ascontiguousarray(rgb).tobytes(), w, h, w * 3,
        float(quality), ctypes.byref(out),
    )
    if n == 0:
        raise RuntimeError("WebPEncodeRGB failed")
    return ctypes.string_at(out, n)


def encode_rgba(rgba: np.ndarray, quality: float = 75.0) -> bytes:
    """Lossy-encode HxWx4 (alpha → ALPH chunk)."""
    h, w, _ = rgba.shape
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = _lib.WebPEncodeRGBA(
        np.ascontiguousarray(rgba).tobytes(), w, h, w * 4,
        float(quality), ctypes.byref(out),
    )
    if n == 0:
        raise RuntimeError("WebPEncodeRGBA failed")
    return ctypes.string_at(out, n)


def decode_yuv(payload: bytes):
    """Reference decode → (Y, U, V) uint8 planes (4:2:0)."""
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_ubyte)()
    v = ctypes.POINTER(ctypes.c_ubyte)()
    stride = ctypes.c_int()
    uvs = ctypes.c_int()
    y = _lib.WebPDecodeYUV(
        payload, len(payload), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(u), ctypes.byref(v),
        ctypes.byref(stride), ctypes.byref(uvs),
    )
    if not y:
        raise RuntimeError("WebPDecodeYUV failed")
    W, H = w.value, h.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    Y = np.frombuffer(
        ctypes.string_at(y, stride.value * H), dtype=np.uint8
    ).reshape(H, stride.value)[:, :W].copy()
    U = np.frombuffer(
        ctypes.string_at(u, uvs.value * ch), dtype=np.uint8
    ).reshape(ch, uvs.value)[:, :cw].copy()
    V = np.frombuffer(
        ctypes.string_at(v, uvs.value * ch), dtype=np.uint8
    ).reshape(ch, uvs.value)[:, :cw].copy()
    return Y, U, V


def decode_rgba(payload: bytes) -> np.ndarray:
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = _lib.WebPDecodeRGBA(
        payload, len(payload), ctypes.byref(w), ctypes.byref(h)
    )
    if not p:
        raise RuntimeError("WebPDecodeRGBA failed")
    return np.frombuffer(
        ctypes.string_at(p, w.value * h.value * 4), dtype=np.uint8
    ).reshape(h.value, w.value, 4).copy()


def vp8_chunk(payload: bytes) -> bytes:
    """The raw 'VP8 ' (lossy) chunk body of a WebP container."""
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        ln = int.from_bytes(payload[pos + 4:pos + 8], "little")
        if tag == b"VP8 ":
            return payload[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
    raise ValueError("no VP8 chunk")
