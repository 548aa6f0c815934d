"""VP8L lossless WebP codec (multimodal/webp.py): every decoder path —
transforms, color cache, LZ77, meta-Huffman, pixel packing — pinned by
lossless roundtrips against the in-repo encoder, plus container-level
wiring into codecs.decode_image / image_info and the decode seam."""

import struct

import numpy as np
import pytest

from kenshin_spark.multimodal import codecs, webp

# heavyweight tier: excluded from the driver's fast default run
pytestmark = pytest.mark.slow

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

    def test_wide_image_transforms_multi_tile(self):
        # ADVICE r9: the 3-bit size_bits field caps tiles at 512 px —
        # images past that must emit a genuinely multi-tile transform
        # image, not a truncated field (the old writer silently dropped
        # the high bits of size_bits - 2)
        arr = rng.integers(0, 256, (6, 700, 3), dtype=np.uint8)
        rt(arr, predictor=2)
        rt(arr, color_transform=(10, 20, 30))
        rt(arr, predictor=11, color_transform=(5, 5, 5))
        tall = rng.integers(0, 256, (600, 5, 3), dtype=np.uint8)
        rt(tall, predictor=5)

    def test_writer_rejects_oversized_field_values(self):
        w = webp._LsbWriter()
        with pytest.raises(ValueError):
            w.bits(8, 3)  # 8 needs 4 bits


class TestMalformed:
    def test_single_symbol_simple_code_range_checked(self):
        # ADVICE r9: the 1-symbol simple-code path must validate the
        # symbol against the alphabet like the 2-symbol path does
        w = webp._LsbWriter()
        w.bits(1, 1)    # simple code
        w.bits(0, 1)    # one symbol
        w.bits(1, 1)    # 8-bit symbol
        w.bits(255, 8)  # out of range for a 40-entry alphabet
        with pytest.raises(ValueError, match="symbol out of range"):
            webp._read_code(webp._LsbReader(bytes(w.out)), 40)

    def test_truncated_streams_raise(self):
        payload = webp.encode_webp_lossless(
            rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
        )
        for cut in (11, 20, len(payload) // 2, len(payload) - 2):
            with pytest.raises(ValueError):
                webp.decode_webp(payload[:cut])

    def test_lossy_vp8_header_only_is_fenced(self):
        # lossy decodes NATIVELY since r11 (vp8.py); a header-only
        # frame with no coefficient partitions must still fence as
        # ValueError, never crash, and dims stay readable
        frame = bytes(3) + b"\x9d\x01\x2a" + struct.pack("<HH", 40, 30)
        chunk = b"VP8 " + struct.pack("<I", len(frame)) + frame
        payload = (b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP"
                   + chunk)
        with pytest.raises(ValueError):
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


class TestDistanceMapAndMeta:
    """r9 review follow-up: the 2D distance map and multi-group
    meta-Huffman were decoder-only paths no roundtrip exercised."""

    def test_dist_map_structural_invariants(self):
        m = webp._DIST_MAP
        assert len(m) == 120
        assert len(set(m)) == 120
        assert all(-8 <= dx <= 8 and 0 <= dy <= 8 for dx, dy in m)
        # dy == 0 entries point strictly left (already-decoded pixels)
        assert all(dx > 0 for dx, dy in m if dy == 0)
        # the spec's first sixteen entries, independently re-checked
        assert m[:16] == [
            (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2),
            (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0),
            (1, 3), (-1, 3),
        ]

    @pytest.mark.parametrize("w", [1, 2, 3, 5, 8, 9])
    def test_vertical_runs_use_2d_distance_codes(self, w):
        # distance == width maps through (0, 1): dist_code 1 for any w
        assert webp._dist_code_for(w, w) <= 120
        col = rng.integers(0, 256, (1, w, 3), dtype=np.uint8)
        rt(np.repeat(col, 25, axis=0))

    def test_horizontal_runs_use_2d_distance_codes(self):
        assert webp._dist_code_for(1, 7) == 2  # (1, 0) is entry index 1
        arr = np.repeat(
            rng.integers(0, 256, (6, 1, 3), dtype=np.uint8), 9, axis=1
        )
        rt(arr)

    def test_plain_distance_codes_beyond_map(self):
        # distances no 2D entry reaches encode as dist_code d + 120
        assert webp._dist_code_for(1000, 7) == 1120

    def test_split_meta_two_real_groups(self):
        # left/right halves carry genuinely different Huffman tables;
        # the decoder must switch groups per pixel position
        arr = np.zeros((12, 16, 3), dtype=np.uint8)
        arr[:, :8] = rng.integers(0, 4, (12, 8, 3)) * 80  # few symbols
        arr[:, 8:] = rng.integers(0, 256, (12, 8, 3))  # dense alphabet
        rt(arr, use_meta="split", use_rle=False)
        rt(arr, use_meta="split", use_cache=4)

    def test_gray_alpha_channels_encode(self):
        la = rng.integers(0, 256, (6, 7, 2), dtype=np.uint8)
        out = webp.decode_webp(webp.encode_webp_lossless(la))
        np.testing.assert_array_equal(out[:, :, 0], la[:, :, 0])
        np.testing.assert_array_equal(out[:, :, 1], la[:, :, 0])
        np.testing.assert_array_equal(out[:, :, 3], la[:, :, 1])


class TestProgressiveFencing:
    """r9 review follow-up: malformed progressive streams must degrade
    as ValueError (the _coerce_codec_errors contract), never escape as
    AttributeError/KeyError and kill an Arrow batch."""

    def test_scan_with_unknown_component_raises_valueerror(self):
        jp = bytearray(codecs.encode_jpeg_progressive(
            rng.integers(0, 256, (8, 8), dtype=np.uint8)
        ))
        # first SOS: corrupt its component id (component count 1,
        # header: FF DA len2 ns cid tdta ...)
        at = bytes(jp).find(b"\xff\xda")
        jp[at + 5] = 99  # component id nobody declared
        with pytest.raises(ValueError):
            codecs.decode_jpeg(bytes(jp))

    def test_dc_scan_without_dc_table_raises_valueerror(self):
        jp = bytearray(codecs.encode_jpeg_progressive(
            rng.integers(0, 256, (8, 8), dtype=np.uint8)
        ))
        at = bytes(jp).find(b"\xff\xda")
        jp[at + 6] = 0x77  # Td=7 (undefined slot), Ta=7
        with pytest.raises(ValueError):
            codecs.decode_jpeg(bytes(jp))


class TestAnimation:
    """Animated WebP: ANMF frame table parses natively and VP8L frame
    pixels decode — making sample_frames REAL for this container."""

    def _anim(self, n=4, w=14, h=10, dur=100):
        frames = [
            (rng.integers(0, 256, (h, w, 3), dtype=np.uint8), dur)
            for _ in range(n)
        ]
        return frames, webp.encode_webp_animation(frames)

    def test_frame_table_and_pixels(self):
        frames, anim = self._anim()
        fs = webp.webp_frames(anim)
        assert [(f["w"], f["h"], f["duration_ms"]) for f in fs] == [
            (14, 10, 100)
        ] * 4
        for (arr, _), f in zip(frames, fs):
            np.testing.assert_array_equal(
                webp.decode_webp_frame(f)[:, :, :3], arr
            )

    def test_still_webp_has_no_frames(self):
        still = webp.encode_webp_lossless(
            rng.integers(0, 256, (5, 5, 3), dtype=np.uint8)
        )
        assert webp.webp_frames(still) == []

    def test_sample_frames_real_path(self, spark):
        from kenshin_spark.multimodal.transforms import sample_frames

        frames, anim = self._anim(n=5, dur=200)  # 1s timeline
        df = spark.createDataFrame(
            [(1, bytearray(anim))], "doc_id long, payload binary"
        )
        got = sorted(
            (r["frame_idx"], r["frame_ts_ms"], r["frame_md5"])
            for r in sample_frames(df, every_ms=200, max_frames=8).collect()
        )
        assert len(got) == 5  # timeline 1000ms / 200ms ticks
        # md5s are CONTENT hashes of the decoded pixel arrays
        import hashlib

        from kenshin_spark.multimodal.webp import (
            decode_webp_frame,
            webp_frames,
        )

        fs = webp_frames(anim)
        for i, (idx, ts, md5) in enumerate(got):
            assert (idx, ts) == (i, i * 200)
            exp = hashlib.md5(decode_webp_frame(fs[i]).tobytes()).hexdigest()
            assert md5 == exp

    def test_sample_frames_fake_path_for_still_webp(self, spark):
        from kenshin_spark.multimodal.transforms import sample_frames

        still = webp.encode_webp_lossless(
            rng.integers(0, 256, (5, 5, 3), dtype=np.uint8)
        )
        df = spark.createDataFrame(
            [(1, bytearray(still))], "doc_id long, payload binary"
        )
        rows = sample_frames(df, every_ms=100, max_frames=3).collect()
        assert 1 <= len(rows) <= 3  # deterministic fake, not a crash
