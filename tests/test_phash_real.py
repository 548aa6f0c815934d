"""Real pixels wired into perceptual-hash dedup (VERDICT r9 next-round
#3): ``real_pixels`` decodes payloads through the engine's NATIVE codecs
and reduces them to the 8×8 grayscale grid — so near-dup pairs are found
across re-encoded variants of the same image, which the md5 stand-in
can by construction never do."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kenshin_spark.multimodal import codecs, webp
from kenshin_spark.multimodal.phash import (
    grid_from_payload,
    phash_neardup_pairs,
    real_pixels,
)

# heavyweight tier: excluded from the driver's fast default run
pytestmark = pytest.mark.slow


def _block_image(grid, block=8, channels=3):
    """64×64 image whose 8×8 blocks are the grid constants (equal RGB →
    integer luma is the identity), so the area-mean reduces EXACTLY."""
    g = np.asarray(grid, dtype=np.uint8).reshape(8, 8)
    img = np.kron(g, np.ones((block, block), dtype=np.uint8))
    return np.repeat(img[:, :, None], channels, axis=2)


def _grid(seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, 64).tolist()


class TestGridFromPayload:
    def test_block_constant_bmp_reduces_exactly(self):
        grid = _grid(1)
        got, real = grid_from_payload(codecs.encode_bmp(_block_image(grid)))
        assert real is True
        assert got == grid

    def test_same_pixels_across_containers_agree(self):
        grid = _grid(2)
        img = _block_image(grid)
        payloads = [
            codecs.encode_bmp(img),
            webp.encode_webp_lossless(img),
        ]
        grids = [grid_from_payload(p) for p in payloads]
        assert all(real for _, real in grids)
        assert grids[0][0] == grids[1][0] == grid

    def test_luma_is_exact_integer_601(self):
        img = np.zeros((8, 8, 3), dtype=np.uint8)
        img[:, :, 0] = 200  # pure red
        got, real = grid_from_payload(codecs.encode_bmp(img))
        assert real and got == [299 * 200 // 1000] * 64

    def test_tiny_image_upscales(self):
        img = np.full((3, 5, 3), 77, dtype=np.uint8)
        got, real = grid_from_payload(codecs.encode_bmp(img))
        assert real and got == [77] * 64

    def test_undecodable_degrades_deterministically(self):
        got1, real1 = grid_from_payload(b"not an image at all")
        got2, real2 = grid_from_payload(b"not an image at all")
        assert real1 is real2 is False
        assert got1 == got2 and len(got1) == 64
        assert all(0 <= v <= 255 for v in got1)


class TestRealPixelNearDup:
    def test_reencoded_variants_pair_at_hamming_zero(self, spark):
        """The VERDICT 'Done' check: near-dup pairs found across
        re-encoded containers of the same image."""
        grid_a, grid_b = _grid(3), _grid(4)
        rows = [
            (10, bytearray(codecs.encode_bmp(_block_image(grid_a)))),
            (11, bytearray(webp.encode_webp_lossless(_block_image(grid_a)))),
            (20, bytearray(codecs.encode_bmp(_block_image(grid_b)))),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        px = real_pixels(df)
        assert all(r["pixels_real"] for r in px.collect())
        pairs = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in phash_neardup_pairs(px).collect()
        }
        assert pairs == {(10, 11): 0}  # same image, different container

    def test_perturbed_variant_pairs_near_not_exact(self, spark):
        grid = _grid(5)
        pert = list(grid)
        for i in (5, 17, 42):
            pert[i] = (pert[i] + 128) % 256  # flip those cells hard
        rows = [
            (1, bytearray(codecs.encode_bmp(_block_image(grid)))),
            (2, bytearray(codecs.encode_bmp(_block_image(pert)))),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = phash_neardup_pairs(real_pixels(df), max_hamming=6).collect()
        if got:  # data-dependent: a hard flip may exceed the threshold
            assert 0 < got[0]["hamming"] <= 6
        # but at threshold 64 the pair must exist with hamming > 0
        all_pairs = phash_neardup_pairs(
            real_pixels(df), max_hamming=64
        ).collect()
        assert len(all_pairs) == 1 and all_pairs[0]["hamming"] > 0

    def test_degraded_payloads_only_exact_collide(self, spark):
        rows = [
            (1, bytearray(b"\x00\x01garbage")),
            (2, bytearray(b"\x00\x01garbage")),
            (3, bytearray(b"\x00\x02other")),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        px = real_pixels(df)
        assert not any(r["pixels_real"] for r in px.collect())
        pairs = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in phash_neardup_pairs(px).collect()
        }
        assert pairs == {(1, 2): 0}


class TestPhashBucketCap:
    def test_max_bucket_drops_degenerate_buckets_only(self, spark):
        """The Σ|bucket|² guard: constant (degenerate) images share every
        band → their bucket exceeds the cap and they stop generating
        candidates; a distinct near-dup pair with private buckets
        survives untouched."""
        from kenshin_spark.multimodal.phash import (
            ahash_bands,
            fake_pixels,
            phash_neardup_pairs,
        )
        from pyspark.sql import functions as F

        # 12 exact-duplicate payloads (one giant bucket per band) + one
        # distinct pair of exact dups (bucket size 2)
        rows = [(i, "constant-image") for i in range(12)]
        rows += [(100, "unique-image"), (101, "unique-image")]
        docs = fake_pixels(
            spark.createDataFrame(rows, "doc_id long, payload string")
        )
        full = phash_neardup_pairs(docs).collect()
        assert len(full) == 12 * 11 // 2 + 1
        capped = phash_neardup_pairs(docs, max_bucket=8).collect()
        pairs = {(r["doc_a"], r["doc_b"]) for r in capped}
        assert pairs == {(100, 101)}  # the clique dropped, the pair kept

    def test_pair_blocking_complete_and_equal(self, spark):
        """block_bands=2 must return EXACTLY the single-band join's
        pairs for max_hamming <= 6 (both are complete candidate
        generators), including near-dups that differ in several bands."""
        from kenshin_spark.multimodal.phash import (
            fake_pixels,
            perturb_pixels,
            phash_neardup_pairs,
        )

        docs = fake_pixels(spark.createDataFrame(
            [(i, f"img-{i}") for i in range(30)],
            "doc_id long, payload string",
        ))
        pert = perturb_pixels(docs).withColumn(
            "doc_id", F.col("doc_id") + 1000
        )
        all_px = docs.unionByName(pert)
        one = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in phash_neardup_pairs(all_px).collect()
        }
        two = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in phash_neardup_pairs(all_px, block_bands=2).collect()
        }
        assert one == two and len(one) > 0

    def test_pair_blocking_rejects_wide_threshold(self, spark):
        from kenshin_spark.multimodal.phash import (
            fake_pixels,
            phash_neardup_pairs,
        )

        docs = fake_pixels(spark.createDataFrame(
            [(1, "x")], "doc_id long, payload string"))
        with pytest.raises(ValueError, match="pair blocking"):
            phash_neardup_pairs(docs, max_hamming=7, block_bands=2)
