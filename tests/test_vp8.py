"""Native lossy-VP8 decoder vs the system libwebp (ctypes, test-only
oracle — the role javax.imageio plays for PNG/JPEG): YUV planes must be
BIT-exact (RFC 6386 fully specifies reconstruction incl. the in-loop
filter), and the RGBA output must be bit-exact too (the converter
reimplements libwebp's fancy upsampler + fixed-point BT.601).

Three fixture sources: (1) libwebp-ENCODED images (real encoder,
arbitrary content/size/quality), (2) HANDMADE bitstreams from the
minimal writer in ``_vp8_writer.py`` (every intra mode in isolation,
no residuals), (3) a real-world file shipped by CPython's test suite
(VP8X + ALPH + VP8)."""

import glob

import numpy as np
import pytest

import _libwebp as L
import _vp8_writer as W

from kenshin_spark.multimodal import codecs, vp8, webp

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not L.available(), reason="libwebp not present"
)]

REAL_LOSSY_WEBP = next(
    iter(
        sorted(
            glob.glob(
                "/root/.pyenv/versions/*/lib/python*/test/*/python.webp"
            )
        )
    ),
    None,
)


def _gradient(w, h):
    g = ((np.arange(w)[None, :, None] * 3
          + np.arange(h)[:, None, None] * 2) % 256).astype(np.uint8)
    return np.repeat(g, 3, axis=2)


def _blobs(w, h):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    p = np.stack(
        [128 + 80 * np.sin(xx / 9.0), 128 + 80 * np.cos(yy / 7.0),
         128 + 60 * np.sin((xx + yy) / 11.0)], axis=2)
    return np.clip(p, 0, 255).astype(np.uint8)


class TestYuvBitExact:
    @pytest.mark.parametrize("q", [5, 20, 50, 75, 95])
    def test_blobs_all_qualities(self, q):
        payload = L.encode_rgb(_blobs(96, 64), q)
        ref = L.decode_yuv(payload)
        Y, U, V = vp8.decode_frame(L.vp8_chunk(payload))
        np.testing.assert_array_equal(Y, ref[0])
        np.testing.assert_array_equal(U, ref[1])
        np.testing.assert_array_equal(V, ref[2])

    @pytest.mark.parametrize("wh", [(1, 1), (3, 2), (15, 17), (16, 16),
                                    (31, 33), (65, 63), (47, 81)])
    def test_sizes_incl_partial_macroblocks(self, wh):
        w, h = wh
        rng = np.random.RandomState(w * 100 + h)
        payload = L.encode_rgb(
            rng.randint(0, 256, (h, w, 3)).astype(np.uint8), 60
        )
        ref = L.decode_yuv(payload)
        Y, U, V = vp8.decode_frame(L.vp8_chunk(payload))
        np.testing.assert_array_equal(Y, ref[0])
        np.testing.assert_array_equal(U, ref[1])
        np.testing.assert_array_equal(V, ref[2])

    def test_gradient_exercises_segmentation(self):
        # libwebp's encoder emits multi-segment streams with per-
        # segment quant/filter classes for this content
        for q in (20, 75):
            payload = L.encode_rgb(_gradient(64, 48), q)
            ref = L.decode_yuv(payload)
            Y, U, V = vp8.decode_frame(L.vp8_chunk(payload))
            np.testing.assert_array_equal(Y, ref[0])
            np.testing.assert_array_equal(U, ref[1])
            np.testing.assert_array_equal(V, ref[2])


class TestHandmadeStreams:
    """The minimal writer emits one stream per intra mode with no
    residuals — libwebp decodes it as ground truth, so each predictor
    (and the mode/probability parse) is verified in isolation."""

    @pytest.mark.parametrize("ym", [0, 1, 2, 3])
    @pytest.mark.parametrize("uv", [0, 1, 2, 3])
    def test_whole_block_modes(self, ym, uv):
        frame = W.write_keyframe(16, 16, [dict(ymode=ym, uvmode=uv)])
        ref = L.decode_yuv(W.wrap_webp(frame))
        Y, U, V = vp8.decode_frame(frame)
        np.testing.assert_array_equal(Y, ref[0])
        np.testing.assert_array_equal(U, ref[1])
        np.testing.assert_array_equal(V, ref[2])

    @pytest.mark.parametrize("bm", list(range(10)))
    def test_each_b_pred_mode(self, bm):
        frame = W.write_keyframe(
            16, 16, [dict(ymode=4, bmodes=[bm] * 16, uvmode=0)]
        )
        ref = L.decode_yuv(W.wrap_webp(frame))
        Y, _U, _V = vp8.decode_frame(frame)
        np.testing.assert_array_equal(Y, ref[0])

    def test_mixed_modes_multi_mb(self):
        rng = np.random.RandomState(0)
        for _ in range(8):
            mbw, mbh = rng.randint(1, 4), rng.randint(1, 4)
            mbs = [
                dict(
                    ymode=int(rng.choice([0, 1, 2, 3, 4],
                                         p=[.1, .1, .1, .1, .6])),
                    uvmode=int(rng.randint(4)),
                    bmodes=[int(v) for v in rng.randint(0, 10, 16)],
                )
                for _ in range(mbw * mbh)
            ]
            frame = W.write_keyframe(mbw * 16, mbh * 16, mbs)
            ref = L.decode_yuv(W.wrap_webp(frame))
            Y, U, V = vp8.decode_frame(frame)
            np.testing.assert_array_equal(Y, ref[0])
            np.testing.assert_array_equal(U, ref[1])
            np.testing.assert_array_equal(V, ref[2])


class TestRgbaBitExact:
    """decode_webp end-to-end (VP8 + fancy upsample + fixed-point
    YUV→RGB + ALPH alpha) against WebPDecodeRGBA."""

    def test_opaque(self):
        payload = L.encode_rgb(_blobs(48, 32), 75)
        np.testing.assert_array_equal(
            webp.decode_webp(payload), L.decode_rgba(payload)
        )

    def test_with_alpha_chunk(self):
        rng = np.random.RandomState(9)
        rgba = rng.randint(0, 256, (53, 37, 4)).astype(np.uint8)
        rgba[:, :, 3] = (
            np.arange(37)[None, :] * 3 + np.arange(53)[:, None] * 2
        ) % 256
        payload = L.encode_rgba(rgba, 60)
        np.testing.assert_array_equal(
            webp.decode_webp(payload), L.decode_rgba(payload)
        )

    @pytest.mark.skipif(
        REAL_LOSSY_WEBP is None, reason="no real lossy webp"
    )
    def test_real_world_file(self):
        payload = open(REAL_LOSSY_WEBP, "rb").read()
        np.testing.assert_array_equal(
            webp.decode_webp(payload), L.decode_rgba(payload)
        )

    def test_decode_image_dispatch(self):
        payload = L.encode_rgb(_blobs(24, 18), 80)
        arr = codecs.decode_image(payload)
        assert arr.dtype == np.uint8 and arr.shape == (18, 24, 4)


class TestFencing:
    def test_truncated_and_garbage_raise(self):
        payload = L.encode_rgb(_blobs(32, 32), 75)
        chunk = L.vp8_chunk(payload)
        with pytest.raises(ValueError):
            vp8.decode_frame(chunk[:8])
        with pytest.raises(ValueError):
            vp8.decode_frame(b"\x01" + chunk[1:])  # interframe bit
        bad = bytearray(chunk)
        bad[3] = 0x00  # break the start code
        with pytest.raises(ValueError):
            vp8.decode_frame(bytes(bad))

    def test_image_metadata_reports_lossy_webp(self, spark):
        from kenshin_spark.multimodal import image_metadata

        payload = L.encode_rgb(_blobs(40, 30), 75)
        df = spark.createDataFrame(
            [(1, bytearray(payload))], "doc_id long, payload binary"
        )
        [row] = image_metadata(df).collect()
        assert (row["width"], row["height"], row["format"]) == (
            40, 30, "webp")


class TestLossyAnimationFrames:
    def test_anmf_vp8_frames_decode_natively(self):
        """Hand-assembled animation with LOSSY (VP8 + ALPH) frames:
        the timeline parser must surface them and decode_webp_frame
        must produce the same RGBA libwebp produces for each frame's
        still container."""
        import struct

        rng = np.random.RandomState(4)
        stills = []
        for i in range(2):
            rgba = rng.randint(0, 256, (32, 48, 4)).astype(np.uint8)
            rgba[:, :, 3] = ((np.arange(48)[None, :] * (i + 2)) % 256)
            stills.append(L.encode_rgba(rgba, 70))

        def chunks(payload):
            pos = 12
            out = []
            while pos + 8 <= len(payload):
                tag = payload[pos:pos + 4]
                ln = int.from_bytes(payload[pos + 4:pos + 8], "little")
                out.append((tag, payload[pos + 8:pos + 8 + ln]))
                pos += 8 + ln + (ln & 1)
            return out

        def chunk_bytes(tag, body):
            pad = b"\x00" if len(body) & 1 else b""
            return tag + struct.pack("<I", len(body)) + body + pad

        body = chunk_bytes(
            b"VP8X",
            bytes([0x02]) + bytes(3)
            + (47).to_bytes(3, "little") + (31).to_bytes(3, "little"),
        )
        body += chunk_bytes(b"ANIM", bytes(4) + struct.pack("<H", 0))
        for i, still in enumerate(stills):
            inner = b""
            for tag, data in chunks(still):
                if tag in (b"ALPH", b"VP8 "):
                    inner += chunk_bytes(tag, data)
            anmf = (
                bytes(6)
                + (47).to_bytes(3, "little") + (31).to_bytes(3, "little")
                + (100 * (i + 1)).to_bytes(3, "little") + bytes([0])
                + inner
            )
            body += chunk_bytes(b"ANMF", anmf)
        payload = (
            b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
        )

        frames = webp.webp_frames(payload)
        assert [f["kind"] for f in frames] == ["vp8", "vp8"]
        assert [f["duration_ms"] for f in frames] == [100, 200]
        for f, still in zip(frames, stills):
            np.testing.assert_array_equal(
                webp.decode_webp_frame(f), L.decode_rgba(still)
            )


class TestCorruptionFuzz:
    def test_mutations_degrade_to_valueerror_never_crash(self):
        """One corrupt image in a 100 TB corpus must fall through the
        ValueError fence (to the stand-in seam), never kill the Arrow
        batch: truncations and byte/bit flips over a real lossy
        payload either decode to a valid uint8 array or raise
        ValueError — no other exception class escapes (the offline
        400-mutation sweep recorded zero escapes)."""
        rng = np.random.RandomState(0)
        payload = bytearray(L.encode_rgb(_blobs(48, 32), 70))
        for trial in range(120):
            mut = bytearray(payload)
            kind = trial % 3
            if kind == 0:
                mut = mut[:rng.randint(1, len(mut))]
            elif kind == 1:
                for _ in range(rng.randint(1, 6)):
                    mut[rng.randint(0, len(mut))] = rng.randint(0, 256)
            else:
                i = rng.randint(0, len(mut))
                mut[i] ^= 1 << rng.randint(8)
            try:
                out = webp.decode_webp(bytes(mut))
                assert (
                    isinstance(out, np.ndarray)
                    and out.dtype == np.uint8
                )
            except ValueError:
                pass


class TestPoisonGuard:
    def test_huge_header_is_fenced_fast(self):
        """A corrupt header claiming 16383x16383 must raise instantly,
        not chew on 268 Mpx of pure-Python decode."""
        import struct
        import time

        frame = bytearray(
            W.write_keyframe(16, 16, [dict(ymode=0, uvmode=0)])
        )
        frame[6:8] = struct.pack("<H", 16383)
        frame[8:10] = struct.pack("<H", 16383)
        t0 = time.time()
        with pytest.raises(ValueError, match="max_pixels"):
            vp8.decode_frame(bytes(frame))
        assert time.time() - t0 < 1.0
        # explicit raise allows it past the guard (and then fails on
        # the too-short partition data instead of hanging: the mode
        # parse runs off the stream into deterministic zero-bits, so
        # fence or decode — never a crash; don't run the full decode)
