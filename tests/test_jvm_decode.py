"""The opt-in JVM bulk-decode backend (VERDICT r9 next-round #4):
``resize_images(decoder="jvm")`` routes pixel decode through
javax.imageio on the executors via Spark's ``image`` source — the same
independent decoder the codec cross-check pins against — with per-image
fallback to the native codecs for containers the JVM can't decode."""

import glob

import numpy as np
import pytest

from kenshin_spark.multimodal import codecs, webp
from kenshin_spark.multimodal.transforms import resize_images

# heavyweight tier: excluded from the driver's fast default run
pytestmark = pytest.mark.slow


def _img(seed, h=16, w=16):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (h, w, 3)).astype(np.uint8)


def _rows(spark, pairs):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in pairs], "doc_id long, payload binary"
    )


class TestJvmResize:
    def test_lossless_containers_match_native_bit_exact(self, spark, tmp_path):
        """BMP decode is bit-exact in both decoders and the resize +
        re-encode is shared numpy — the two backends must agree to the
        BYTE on lossless inputs."""
        imgs = {i: _img(i) for i in range(1, 4)}
        df = _rows(spark, [(i, codecs.encode_bmp(a)) for i, a in imgs.items()])
        native = {
            r["doc_id"]: r["resize_md5"]
            for r in resize_images(df, 8, 8).collect()
        }
        jvm = {
            r["doc_id"]: r["resize_md5"]
            for r in resize_images(
                df, 8, 8, decoder="jvm", scratch_dir=str(tmp_path / "sp")
            ).collect()
        }
        assert native == jvm and len(jvm) == 3

    def test_webp_falls_back_to_native_per_image(self, spark, tmp_path):
        """javax.imageio has no WebP plugin — those docs must take the
        native path inside the SAME call and still resize correctly."""
        a_bmp, a_webp = _img(7), _img(8)
        df = _rows(spark, [
            (1, codecs.encode_bmp(a_bmp)),
            (2, webp.encode_webp_lossless(a_webp)),
        ])
        got = {
            r["doc_id"]: r["resize_md5"]
            for r in resize_images(
                df, 8, 8, decoder="jvm", scratch_dir=str(tmp_path / "sp")
            ).collect()
        }
        native = {
            r["doc_id"]: r["resize_md5"]
            for r in resize_images(df, 8, 8).collect()
        }
        assert got == native and set(got) == {1, 2}

    def test_garbage_payload_degrades_not_crashes(self, spark, tmp_path):
        from pyspark.sql import Observation

        df = _rows(spark, [(1, b"not an image"), (2, codecs.encode_bmp(_img(9)))])
        obs = Observation()
        out = resize_images(
            df, 8, 8, observation=obs, decoder="jvm",
            scratch_dir=str(tmp_path / "sp"),
        )
        assert out.count() == 2
        assert obs.get["images_total"] == 2
        assert obs.get["images_degraded"] == 0  # garbage isn't a real image

    def test_rejects_unknown_decoder(self, spark):
        with pytest.raises(ValueError, match="decoder"):
            resize_images(_rows(spark, []), decoder="ffi")


def _first(*patterns):
    for pat in patterns:
        hits = sorted(glob.glob(pat))
        if hits:
            return hits[0]
    return None


REAL_BASELINE_JPG = _first(
    "/root/.rustup/toolchains/*/share/doc/rust/html/embedded-book/assets/verify.jpeg",
)


@pytest.mark.skipif(
    REAL_BASELINE_JPG is None, reason="no real JPEG in container"
)
def test_real_photo_jvm_vs_native_envelope(spark, tmp_path):
    """Production-entry-point cross-check on a real photo: the two
    decoders legitimately differ in iDCT rounding / chroma upsampling
    (T.81 mandates neither), so compare decoded-resized pixels within
    the measured xcheck envelope instead of by digest."""
    payload = open(REAL_BASELINE_JPG, "rb").read()
    df = _rows(spark, [(1, payload)])
    out_n = resize_images(df, 64, 64).collect()[0]["resized"]
    out_j = resize_images(
        df, 64, 64, decoder="jvm", scratch_dir=str(tmp_path / "sp")
    ).collect()[0]["resized"]
    a = codecs.decode_bmp(bytes(out_n)).astype(np.int64)
    b = codecs.decode_bmp(bytes(out_j)).astype(np.int64)
    assert a.shape == b.shape
    mean_abs = np.abs(a - b).mean()
    assert mean_abs < 3.0, mean_abs  # the r9 xcheck photo envelope


class TestScratchReuse:
    def test_reused_scratch_dir_yields_no_phantom_rows(
        self, spark, tmp_path
    ):
        """ADVICE r10: two calls sharing one scratch_dir must not leak
        the first dataset's spilled files into the second scan — each
        call spills under its own uuid subdirectory."""
        scratch = str(tmp_path / "shared")
        df1 = _rows(
            spark, [(i, codecs.encode_bmp(_img(i))) for i in (1, 2, 3)]
        )
        out1 = resize_images(
            df1, 8, 8, decoder="jvm", scratch_dir=scratch
        ).collect()
        assert {r["doc_id"] for r in out1} == {1, 2, 3}
        # second, DISJOINT dataset through the same scratch root
        df2 = _rows(spark, [(9, codecs.encode_bmp(_img(9)))])
        out2 = resize_images(
            df2, 8, 8, decoder="jvm", scratch_dir=scratch
        ).collect()
        assert {r["doc_id"] for r in out2} == {9}  # no phantom 1/2/3

    def test_stale_spills_are_reaped_by_age(self, tmp_path):
        import os
        import time

        from kenshin_spark.multimodal.transforms import _reap_stale_spills

        root = tmp_path / "shared"
        old = root / "spill_deadbeef"
        fresh = root / "spill_cafebabe"
        other = root / "keepme"
        for d in (old, fresh, other):
            d.mkdir(parents=True)
        past = time.time() - 48 * 3600
        os.utime(old, (past, past))
        _reap_stale_spills(str(root), older_than_s=24 * 3600,
                           now=time.time())
        assert not old.exists()      # aged out
        assert fresh.exists()        # possibly still being scanned
        assert other.exists()        # non-spill content untouched
