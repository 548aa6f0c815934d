"""Adversarial skew for the MinHash bucket join.

SCALING.md asserts the band self-join's skew is AQE's problem; this file
actually manufactures the skew and proves the claim: a corpus where
hundreds of documents share identical boilerplate puts them all in ONE
(band, band_key) bucket per band — the worst case for the bucket join
(that single bucket is Σ|bucket|² of the whole query). With AQE skew-join
enabled (and test-scaled thresholds, since the defaults are set for
multi-GB partitions) Spark must split the hot partition at runtime —
``skew=...`` appears on the SortMergeJoin in the final adaptive plan —
and the pair set must be identical to the unsplit run."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from kenshin_spark.dedup.minhash import _lsh_candidates, minhash_lsh_pairs

N_HOT = 400    # docs sharing identical boilerplate → one hot bucket
N_COLD = 200   # unique docs → long tail of singleton buckets

SKEW_CONFS = {
    # scaled-down skew detection: a partition is skewed if it exceeds
    # BOTH factor×median AND the byte threshold; test buckets are KBs,
    # not the 256 MB production default
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1k",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512b",
    # force the band self-join to sort-merge (the 100 TB shape — at that
    # scale neither side broadcasts); the explicit BROADCAST hints on
    # the candidate-verify joins still apply
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    # keep AQE from folding everything into one partition first
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "256b",
    # enough initial partitions that the median stays far below the
    # hot bucket (shuffle compression shrinks the hot partition a lot —
    # identical band_keys RLE away — so the contrast must come from a
    # tiny median, exactly as on a real cluster)
    "spark.sql.shuffle.partitions": "8",
}


@pytest.fixture()
def skewed_docs(spark):
    boiler = (
        "all rights reserved this content is the property of the site "
        "and may not be reproduced without permission of the owner"
    )
    rows = [(i, boiler) for i in range(N_HOT)]
    rows += [
        (
            10_000 + i,
            f"unique document number {i} carrying words w{i} x{i} "
            f"y{i} z{i} q{i} r{i} s{i} t{i}",
        )
        for i in range(N_COLD)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _with_confs(spark, confs):
    saved = {}
    for key, val in confs.items():
        try:
            saved[key] = spark.conf.get(key)
        except Exception:
            saved[key] = None
        spark.conf.set(key, val)
    return saved


def _restore(spark, saved):
    for key, val in saved.items():
        if val is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, val)


class TestMinhashBucketJoinSkew:
    def test_aqe_splits_the_hot_bucket_and_results_match(
        self, spark, skewed_docs
    ):
        expected_hot_pairs = N_HOT * (N_HOT - 1) // 2

        saved = _with_confs(spark, SKEW_CONFS)
        try:
            df = minhash_lsh_pairs(skewed_docs, threshold=0.5)
            with_skew = {
                (r["doc_a"], r["doc_b"]) for r in df.collect()
            }
            # the bucket self-join now runs inside the checkpointed
            # candidate stage (evaluate-once restructure, r11 opt round);
            # inspect THAT stage's final adaptive plan — the skew split
            # protects the same join, it just lives in its own execution
            cand = _lsh_candidates(skewed_docs)
            cand.collect()
            plan = cand._jdf.queryExecution().executedPlan().toString()
            assert "skew=true" in plan, (
                "AQE never marked the bucket join skewed:\n"
                + plan[:4000]
            )

            # identical boilerplate ⇒ jaccard 1.0 for every hot pair;
            # unique docs must contribute none
            assert len(with_skew) == expected_hot_pairs
            assert all(a < 1000 and b < 1000 for a, b in with_skew)
            # and BOTH sides of the self-join were split (the reader
            # nodes carry the skewed marker)
            assert plan.count("AQEShuffleRead skewed") >= 2

            # same query with skew-join handling OFF — the pair set is
            # exactly the same (skew splitting is a physical rewrite)
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.enabled", "false"
            )
            without_skew = {
                (r["doc_a"], r["doc_b"])
                for r in minhash_lsh_pairs(
                    skewed_docs, threshold=0.5
                ).collect()
            }
            assert without_skew == with_skew
        finally:
            _restore(spark, saved)

    def test_max_bucket_caps_quadratic_candidate_output(
        self, spark, skewed_docs
    ):
        """AQE skew-split fixes the hot bucket's wall-clock but not its
        quadratic OUTPUT (B²/2 pairs from one B-doc bucket). max_bucket
        excludes over-cap buckets from candidate generation: the
        boilerplate clique's pairs disappear, pairs that share any
        under-cap bucket survive."""
        near = spark.createDataFrame(
            [
                (5000, "alpha beta gamma delta epsilon zeta eta theta"),
                (5001, "alpha beta gamma delta epsilon zeta eta iota"),
            ],
            "doc_id long, text string",
        )
        docs = skewed_docs.unionByName(near)
        full = {
            (r["doc_a"], r["doc_b"])
            for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
        }
        capped = {
            (r["doc_a"], r["doc_b"])
            for r in minhash_lsh_pairs(
                docs, threshold=0.5, max_bucket=50
            ).collect()
        }
        assert (5000, 5001) in full and (5000, 5001) in capped
        assert len(full) == N_HOT * (N_HOT - 1) // 2 + 1
        assert capped == {(5000, 5001)}  # the clique's output is gone

    def test_max_bucket_caps_the_incremental_index_join(self, spark):
        """Same guard on the daily-ingest path: an over-cap index key
        (corpus-wide boilerplate) stops fanning out to every batch doc
        that hits it; under-cap keys still match."""
        from kenshin_spark.dedup.minhash import (
            minhash_band_index,
            minhash_pairs_against_index,
        )

        boiler = (
            "all rights reserved this content is the property of the "
            "site and may not be reproduced without permission"
        )
        corpus = spark.createDataFrame(
            [(i, boiler) for i in range(30)]
            + [(500, "alpha beta gamma delta epsilon zeta eta theta")],
            "doc_id long, text string",
        )
        index = minhash_band_index(corpus)
        batch = spark.createDataFrame(
            [
                (9000, boiler),  # hits the hot key → capped away
                (9001, "alpha beta gamma delta epsilon zeta eta iota"),
            ],
            "doc_id long, text string",
        )
        full = {
            (r["corpus_id"], r["new_id"])
            for r in minhash_pairs_against_index(
                batch, corpus, index, threshold=0.5
            ).collect()
        }
        capped = {
            (r["corpus_id"], r["new_id"])
            for r in minhash_pairs_against_index(
                batch, corpus, index, threshold=0.5, max_bucket=10
            ).collect()
        }
        assert (500, 9001) in full and len(full) == 31
        assert capped == {(500, 9001)}

    def test_max_bucket_caps_embedding_lsh_buckets(self, spark):
        """The vector analog: a degenerate signature bucket (identical
        embeddings corpus-wide) is capped out of candidate generation
        in both the self-join and the incremental-index paths."""
        from kenshin_spark.dedup.embedding import (
            cross_neardup_against_index,
            embedding_neardup_pairs_lsh,
            hyperplane_band_index,
        )

        hot = [0.5] * 8 + [0.0] * 56
        near = [0.5] * 7 + [0.45] + [0.0] * 56
        emb = spark.createDataFrame(
            [(i, hot) for i in range(20)]
            + [(100, near), (101, [float(j % 3) for j in range(64)])],
            "vec_id long, embedding array<double>",
        )
        full = {
            (r["vec_a"], r["vec_b"])
            for r in embedding_neardup_pairs_lsh(
                emb, threshold=0.9
            ).collect()
        }
        capped = {
            (r["vec_a"], r["vec_b"])
            for r in embedding_neardup_pairs_lsh(
                emb, threshold=0.9, max_bucket=10
            ).collect()
        }
        assert len(full) >= 20 * 19 // 2  # the clique survives banding
        assert (0, 100) in full
        assert all(a >= 100 or b >= 100 for a, b in capped), capped

        # incremental path: hot index signature capped away
        index = hyperplane_band_index(emb)
        batch = spark.createDataFrame(
            [(9000, hot)], "vec_id long, embedding array<double>"
        )
        inc_full = cross_neardup_against_index(
            batch, emb, index, threshold=0.9
        ).count()
        inc_capped = cross_neardup_against_index(
            batch, emb, index, threshold=0.9, max_bucket=10
        ).count()
        assert inc_full >= 20
        assert inc_capped == 0

    def test_verify_joins_stay_broadcast_under_forced_smj(
        self, spark, skewed_docs
    ):
        """Even with autoBroadcastJoinThreshold=-1 (the cluster posture
        for the band join), the candidate-verify joins keep their
        explicit BROADCAST hints — the corpus side must never shuffle
        for verification."""
        saved = _with_confs(spark, SKEW_CONFS)
        try:
            df = minhash_lsh_pairs(skewed_docs, threshold=0.5)
            df.count()
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin" in plan
            assert "SortMergeJoin" in plan  # the band self-join
        finally:
            _restore(spark, saved)


class TestDensityScaledBanding:
    """The sf1-soak finding as engine code (SCALING.md r6): candidate
    volume is quadratic in bucket density, so banding must track corpus
    size — density_scaled_banding keeps expected occupancy constant."""

    def test_rows_track_log_density(self):
        from kenshin_spark.dedup.embedding import density_scaled_banding

        b1, r1 = density_scaled_banding(1_000)
        b2, r2 = density_scaled_banding(2_000)     # the sf0.1 corpus
        b3, r3 = density_scaled_banding(20_000)    # the sf1 soak corpus
        b4, r4 = density_scaled_banding(2_000_000)
        assert r1 == 4 and b1 == 16                # floor = current defaults
        assert r2 >= r1 and r3 > r2 and r4 > r3
        # +1 band per added row — recall re-centering is linear
        assert b3 - b2 == r3 - r2 and b4 - b3 == r4 - r3
        # 10x corpus → ~log2(10) ≈ 3 extra rows: buckets/band scale with n
        assert 3 <= r3 - r2 <= 4
        # cap respected
        assert density_scaled_banding(10**12)[1] == 16

    def test_auto_density_pairs_subset_of_exact(self, spark):
        import duckdb

        from kenshin_spark.dedup.embedding import (
            embedding_neardup_pairs,
            embedding_neardup_pairs_lsh,
        )
        from kenshin_spark.io import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        auto = {
            (r["vec_a"], r["vec_b"])
            for r in embedding_neardup_pairs_lsh(
                emb, threshold=0.4, auto_density=True
            ).collect()
        }
        exact = {
            (r["vec_a"], r["vec_b"])
            for r in embedding_neardup_pairs(emb, threshold=0.4).collect()
        }
        assert auto  # finds pairs at this corpus' 0.4 floor
        assert auto <= exact  # LSH candidates never invent pairs
        # r8 default flip: bare auto_density now rides the CALIBRATED
        # R=0.9 knob, so recall here is held, not merely "useful"
        assert len(auto) >= int(0.8 * len(exact))

    def test_auto_density_default_is_calibrated(self):
        """r8 (VERDICT r7 item 3): auto_density without an explicit
        target_recall must resolve to the calibrated R=0.9 banding —
        the sf1 sweep showed calibrated is higher-recall AND faster
        than the linear floor, so the safe default costs nothing.
        Explicit target_recall=None re-opts into census mode."""
        from kenshin_spark.dedup.embedding import (
            _CALIBRATED_DEFAULT,
            density_scaled_banding,
            embedding_neardup_pairs_lsh,
            recall_calibrated_banding,
        )

        import inspect

        sig = inspect.signature(embedding_neardup_pairs_lsh)
        assert sig.parameters["target_recall"].default is _CALIBRATED_DEFAULT
        # the two knobs genuinely diverge at soak density — the default
        # choice is load-bearing, not cosmetic
        assert recall_calibrated_banding(20_000) != density_scaled_banding(
            20_000
        )


class TestRecallCalibratedBanding:
    """r7: the recall contract (SCALING.md measured curve). The density
    law's one-band-per-row growth lets recall decay (measured 94.8% →
    32.3% along the sf1 trajectory); recall_calibrated_banding grows
    bands geometrically (ceil(ln(1-R)/ln(1-p^r))) to hold it."""

    def test_band_arithmetic_tracks_theory(self):
        from kenshin_spark.dedup.embedding import recall_calibrated_banding

        # floor: small corpora keep the verified defaults
        assert recall_calibrated_banding(1_000) == (16, 4)
        # sf1 soak corpus: rows follow the density law, bands grow
        # geometrically (the measured 92.8%-recall point)
        assert recall_calibrated_banding(20_000) == (145, 9)
        assert recall_calibrated_banding(20_000, target_recall=0.8) == (101, 9)
        # cap: unreachable recall at extreme density saturates, not hangs
        b, r = recall_calibrated_banding(2_000_000)
        assert b == 512 and r == 15
        # monotone in target recall
        b1, _ = recall_calibrated_banding(20_000, target_recall=0.5)
        b2, _ = recall_calibrated_banding(20_000, target_recall=0.95)
        assert b1 < b2
        import pytest as _pytest

        with _pytest.raises(ValueError):
            recall_calibrated_banding(1000, target_recall=1.0)

    def test_calibrated_recall_floor_vs_exact(self, spark):
        """At sf0.01 density (≈2k vectors) the calibrated R=0.9 point
        must actually deliver ≥0.8 recall against the exact ground
        truth — the contract the sf1 sweep measured, re-pinned at test
        scale so CI catches a regression in the banding math or the
        banded plan."""
        from kenshin_spark.dedup.embedding import (
            embedding_neardup_pairs,
            embedding_neardup_pairs_lsh,
        )
        from kenshin_spark.io import load_table

        emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
        exact = {
            (r["vec_a"], r["vec_b"])
            for r in embedding_neardup_pairs(emb, threshold=0.4).collect()
        }
        got = {
            (r["vec_a"], r["vec_b"])
            for r in embedding_neardup_pairs_lsh(
                emb, threshold=0.4, auto_density=True, target_recall=0.9
            ).collect()
        }
        assert got <= exact
        assert exact and len(got) >= 0.8 * len(exact)
