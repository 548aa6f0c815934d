"""The lossy-VP8 bulk-decode gate (VERDICT r11 item 9).

``codecs.decode_image_bulk`` must route LOSSY VP8 payloads to a
libwebp-backed decoder (PIL) when importable — the native pure-Python
RFC 6386 decoder is the bit-exactness oracle but runs ~2 images/s/core —
and fall back to the native decoder everywhere else (no PIL, lossless
profiles, non-WebP containers). This environment has no PIL, so the
PIL arm is exercised through a recorded stub whose output is the native
decode (the two are bit-exact by the test_vp8 pins against
WebPDecodeRGBA, which is what PIL calls)."""

import sys
import types

import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/", 1)[0])

import _vp8_writer as W  # noqa: E402
from _vp8_writer import wrap_webp  # noqa: E402

from kenshin_spark.multimodal import codecs, webp  # noqa: E402


@pytest.fixture()
def lossy_payload():
    return wrap_webp(W.write_keyframe(16, 16, [dict(ymode=0, uvmode=0)]))


@pytest.fixture()
def lossless_payload():
    arr = np.zeros((8, 8, 4), dtype=np.uint8)
    arr[:, :, 3] = 255
    arr[2:5, 1:7, 0] = 200
    return webp.encode_webp_lossless(arr)


def test_is_lossy_vp8_probe(lossy_payload, lossless_payload):
    assert webp.is_lossy_vp8(lossy_payload)
    assert not webp.is_lossy_vp8(lossless_payload)
    assert not webp.is_lossy_vp8(b"BM not a webp")
    assert not webp.is_lossy_vp8(b"")


def test_bulk_decode_prefers_pil_for_lossy(monkeypatch, lossy_payload):
    native = codecs.decode_image(lossy_payload)
    calls = []

    class _FakeImg:
        def __init__(self, arr):
            self._arr = arr

        def convert(self, mode):
            assert mode == "RGBA"
            return self._arr

    fake_image_mod = types.ModuleType("PIL.Image")

    def _open(buf):
        calls.append(len(buf.getvalue()))
        return _FakeImg(native)

    fake_image_mod.open = _open
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)

    out = codecs.decode_image_bulk(lossy_payload)
    assert calls == [len(lossy_payload)]  # the PIL arm took it
    assert np.array_equal(out, native)  # identical pixels either way


def test_bulk_decode_native_fallback_without_pil(lossy_payload):
    assert "PIL" not in sys.modules or not hasattr(
        sys.modules.get("PIL"), "__file__"
    )
    out = codecs.decode_image_bulk(lossy_payload)
    assert np.array_equal(out, codecs.decode_image(lossy_payload))


def test_bulk_decode_lossless_never_consults_pil(
    monkeypatch, lossless_payload
):
    def _boom(*a, **k):
        raise AssertionError("PIL must not be consulted for VP8L")

    fake_image_mod = types.ModuleType("PIL.Image")
    fake_image_mod.open = _boom
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image_mod)
    out = codecs.decode_image_bulk(lossless_payload)
    assert np.array_equal(out, codecs.decode_image(lossless_payload))
