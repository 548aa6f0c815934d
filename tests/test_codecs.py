"""Real-codec seam tests (``pytest -m codecs``).

This container ships no image libraries, so these collect and SKIP
in-sandbox; in an environment with PIL they drive the REAL decode/resize
paths end-to-end through the same Spark operators the stub paths use —
guaranteeing the seam (magic-byte sniff → PIL) can't silently rot.
"""

import pytest

PIL = pytest.importorskip("PIL.Image", reason="real codecs need PIL")

pytestmark = pytest.mark.codecs


def _png_bytes(w: int, h: int) -> bytes:
    from io import BytesIO

    img = PIL.new("RGB", (w, h), color=(10, 20, 30))
    buf = BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


class TestRealImageDecode:
    def test_image_metadata_real_png(self, spark):
        from kenshin_spark.multimodal import image_metadata

        payload = _png_bytes(320, 200)
        df = spark.createDataFrame(
            [(1, bytearray(payload))], "doc_id long, payload binary"
        )
        [row] = image_metadata(df).collect()
        assert (row["width"], row["height"]) == (320, 200)
        assert row["format"] == "png"
        assert row["n_bytes"] == len(payload)

    def test_resize_real_png_roundtrip(self, spark):
        from io import BytesIO

        from kenshin_spark.multimodal.transforms import resize_images

        df = spark.createDataFrame(
            [(1, bytearray(_png_bytes(320, 200)))],
            "doc_id long, payload binary",
        )
        [row] = resize_images(df, width=64, height=48).collect()
        out = PIL.open(BytesIO(bytes(row["resized"])))
        assert (out.width, out.height) == (64, 48)

    def test_stub_path_still_used_for_non_image_bytes(self, spark):
        """Non-image payloads keep the deterministic stand-in even when
        PIL is present (the fake corpus must hash identically with and
        without codecs installed)."""
        from kenshin_spark.multimodal import _fake_decode

        digest, w, h, fmt = _fake_decode(b"just text, no magic")
        assert fmt == "fake" and 64 <= w < 1088 and 64 <= h < 1088
