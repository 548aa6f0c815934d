"""VP8L lossless WebP codec (multimodal/webp.py): every decoder path —
transforms, color cache, LZ77, meta-Huffman, pixel packing — pinned by
lossless roundtrips against the in-repo encoder, plus container-level
wiring into codecs.decode_image / image_info and the decode seam."""

import struct

import numpy as np
import pytest

from kenshin_spark.multimodal import codecs, webp

rng = np.random.default_rng(23)


def rt(arr, **kw):
    """Encode/decode and compare against the RGBA promotion of arr."""
    out = webp.decode_webp(webp.encode_webp_lossless(arr, **kw))
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.shape[2] == 1:
        exp = np.concatenate(
            [np.repeat(a, 3, axis=2), np.full_like(a, 255)], axis=2
        )
    elif a.shape[2] == 3:
        exp = np.concatenate([a, np.full(a.shape[:2] + (1,), 255, a.dtype)],
                             axis=2)
    else:
        exp = a
    np.testing.assert_array_equal(out, exp)
    return out


class TestRoundtrip:
    def test_rgb_literals(self):
        rt(rng.integers(0, 256, (11, 7, 3), dtype=np.uint8))

    def test_gray_and_rgba(self):
        rt(rng.integers(0, 256, (6, 9), dtype=np.uint8))
        rt(rng.integers(0, 256, (5, 8, 4), dtype=np.uint8))

    def test_single_pixel_and_single_row(self):
        rt(np.array([[[1, 2, 3]]], dtype=np.uint8))
        rt(rng.integers(0, 256, (1, 17, 3), dtype=np.uint8))

    @pytest.mark.parametrize("bits", [2, 4, 8, 11])
    def test_color_cache(self, bits):
        # few distinct colors -> real cache hits at every width
        arr = (rng.integers(0, 5, (9, 13, 3), dtype=np.uint8) * 50)
        rt(arr, use_cache=bits)

    def test_lz77_rle_runs(self):
        arr = np.repeat(
            np.repeat(rng.integers(0, 4, (4, 5, 3), dtype=np.uint8) * 80,
                      4, 0), 4, 1
        )
        rt(arr, use_rle=True)
        rt(arr, use_rle=True, use_cache=3)  # copies insert into cache

    def test_meta_huffman_entropy_image(self):
        rt(rng.integers(0, 256, (10, 10, 3), dtype=np.uint8), use_meta=True)


class TestTransforms:
    @pytest.mark.parametrize("mode", list(range(14)))
    def test_every_predictor_mode(self, mode):
        rt(rng.integers(0, 256, (9, 12, 3), dtype=np.uint8), predictor=mode)

    def test_predictor_rightmost_column_rule(self):
        # TR on the last column addresses the current row's first pixel
        # (contiguous-buffer rule); mode 3 (TR) isolates it
        rt(rng.integers(0, 256, (6, 4, 3), dtype=np.uint8), predictor=3)

    def test_subtract_green(self):
        rt(rng.integers(0, 256, (7, 7, 3), dtype=np.uint8),
           subtract_green=True)

    @pytest.mark.parametrize("ct", [(0x40, 0x20, 0x10), (0xF0, 0x85, 0x7F)])
    def test_color_transform_signed_deltas(self, ct):
        rt(rng.integers(0, 256, (8, 9, 3), dtype=np.uint8),
           color_transform=ct)

    def test_stacked_transforms(self):
        arr = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
        rt(arr, predictor=7, subtract_green=True)
        rt(arr, predictor=11, color_transform=(5, 200, 130),
           subtract_green=True, use_cache=5)

    @pytest.mark.parametrize("ncolors,dims", [
        (2, (7, 11)), (4, (6, 9)), (13, (8, 10)), (100, (12, 14)),
    ])
    def test_palette_all_packing_depths(self, ncolors, dims):
        base = rng.integers(0, ncolors, dims, dtype=np.uint8)
        pal = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
        rt(pal[base], palette=True)

    def test_palette_odd_width_one_bit(self):
        arr = rng.integers(0, 2, (5, 13), dtype=np.uint8) * 255
        rt(arr, palette=True)


class TestMalformed:
    def test_truncated_streams_raise(self):
        payload = webp.encode_webp_lossless(
            rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
        )
        for cut in (11, 20, len(payload) // 2, len(payload) - 2):
            with pytest.raises(ValueError):
                webp.decode_webp(payload[:cut])

    def test_lossy_vp8_routes_to_pil_seam(self):
        # minimal lossy container: VP8 chunk with a keyframe header
        frame = bytes(3) + b"\x9d\x01\x2a" + struct.pack("<HH", 40, 30)
        chunk = b"VP8 " + struct.pack("<I", len(frame)) + frame
        payload = (b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP"
                   + chunk)
        with pytest.raises(ValueError, match="needs PIL"):
            webp.decode_webp(payload)
        assert webp.webp_info(payload) == (40, 30)  # dims still readable

    def test_vp8x_dims(self):
        body = bytes(4) + (23).to_bytes(3, "little") + (17).to_bytes(
            3, "little"
        )
        chunk = b"VP8X" + struct.pack("<I", len(body)) + body
        payload = (b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP"
                   + chunk)
        assert webp.webp_info(payload) == (24, 18)

    def test_not_riff_raises(self):
        with pytest.raises(ValueError):
            webp.decode_webp(b"RIFFxxxxWAVEdata")


class TestCodecsWiring:
    def test_sniff_and_decode_image(self):
        arr = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
        payload = webp.encode_webp_lossless(arr)
        assert codecs.sniff(payload) == "webp"
        out = codecs.decode_image(payload)
        np.testing.assert_array_equal(out[:, :, :3], arr)
        assert codecs.image_info(payload) == (13, 9, "webp")

    def test_decode_seam_treats_vp8l_as_real(self):
        from kenshin_spark.multimodal import _decode_with_flag

        payload = webp.encode_webp_lossless(
            rng.integers(0, 256, (12, 20, 3), dtype=np.uint8)
        )
        digest, w, h, fmt, degraded = _decode_with_flag(payload)
        assert (w, h, fmt, degraded) == (20, 12, "webp", False)

    def test_image_metadata_webp_without_pil(self, spark):
        from kenshin_spark.multimodal import image_metadata

        arr = rng.integers(0, 256, (21, 34, 3), dtype=np.uint8)
        df = spark.createDataFrame(
            [(1, bytearray(webp.encode_webp_lossless(arr)))],
            "doc_id long, payload binary",
        )
        r = image_metadata(df).first()
        assert (r["width"], r["height"], r["format"]) == (34, 21, "webp")

    def test_resize_roundtrips_webp_in_and_out(self, spark):
        from kenshin_spark.multimodal import codecs
        from kenshin_spark.multimodal.transforms import resize_images

        arr = np.repeat(
            np.repeat(rng.integers(0, 256, (4, 4, 4), dtype=np.uint8), 4, 0),
            4, 1,
        )  # blocky 16x16 RGBA so nearest-neighbor is exact
        df = spark.createDataFrame(
            [(1, bytearray(webp.encode_webp_lossless(arr)))],
            "doc_id long, payload binary",
        )
        out = resize_images(df, width=4, height=4, out_format="webp").first()
        resized = webp.decode_webp(bytes(out["resized"]))
        np.testing.assert_array_equal(
            resized, codecs.resize_nearest(arr, 4, 4)
        )
        # default BMP out still works on webp input (alpha dropped)
        out2 = resize_images(df, width=4, height=4).first()
        bmp = codecs.decode_bmp(bytes(out2["resized"]))
        np.testing.assert_array_equal(
            bmp, codecs.resize_nearest(arr, 4, 4)[:, :, :3]
        )
