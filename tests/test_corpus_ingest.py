"""StreamingCorpusIngest — the LLM-pipeline components composed into one
incremental job: quality gate → exact dedup → near-dup vs persisted
index → BPE tokenize → append state. Driven through the real
Structured Streaming machinery and directly as batches."""

import json
import os

import pytest

from kenshin_spark.bpe import fit
from kenshin_spark.pipeline import StreamingCorpusIngest

# heavyweight tier: excluded from the driver's fast default run
pytestmark = pytest.mark.slow

BASE = "the quick brown fox jumps over the lazy dog again and again today"


@pytest.fixture()
def train_docs(spark):
    return spark.createDataFrame(
        [(900, BASE), (901, "completely different material here now")],
        "doc_id long, text string",
    )


class TestBatchPath:
    def _mk(self, spark, tmp_path, train_docs):
        merges = fit(train_docs, n_merges=20)
        return StreamingCorpusIngest(
            spark, str(tmp_path / "corpus"), merges
        )

    def test_first_batch_admits_and_builds_state(
        self, spark, tmp_path, train_docs
    ):
        ing = self._mk(spark, tmp_path, train_docs)
        b1 = spark.createDataFrame(
            [
                (1, BASE, "web"),
                (2, "some other totally unrelated document body", "web"),
                (3, None, "web"),           # quality: NULL
                (4, BASE, "web"),           # intra-batch exact dup of 1
            ],
            "doc_id long, text string, source string",
        )
        ing.ingest(b1, 0)
        assert ing.stats == {
            "received": 4, "quality_rejected": 1, "exact_dups": 1,
            "near_dups": 0, "admitted": 2,
        }
        docs = spark.read.parquet(f"{ing.root}/docs")
        assert {r["doc_id"] for r in docs.collect()} == {1, 2}
        toks = spark.read.parquet(f"{ing.root}/tokens")
        assert toks.count() == 2
        assert toks.where("n_tokens <= 0").count() == 0
        assert spark.read.parquet(f"{ing.root}/index").count() > 0
        dead = spark.read.parquet(f"{ing.root}/dead")
        assert {r["reason"] for r in dead.collect()} == {
            "quality_rejected", "exact_dups",
        }

    def test_second_batch_dedups_against_state(
        self, spark, tmp_path, train_docs
    ):
        ing = self._mk(spark, tmp_path, train_docs)
        ing.ingest(
            spark.createDataFrame(
                [(1, BASE, "web")],
                "doc_id long, text string, source string",
            ),
            0,
        )
        b2 = spark.createDataFrame(
            [
                (10, BASE, "web"),              # exact dup of stored 1
                (11, BASE + " tail", "web"),    # NEAR dup of stored 1
                (12, "fresh genuinely novel content of its own", "web"),
            ],
            "doc_id long, text string, source string",
        )
        ing.ingest(b2, 1)
        assert ing.stats["exact_dups"] == 1
        assert ing.stats["near_dups"] == 1
        docs = {r["doc_id"]
                for r in spark.read.parquet(f"{ing.root}/docs").collect()}
        assert docs == {1, 12}
        # the index grew to cover the new admission
        ix_docs = {
            r["doc_id"]
            for r in spark.read.parquet(f"{ing.root}/index").collect()
        }
        assert ix_docs == {1, 12}


class TestStreamPath:
    def test_foreachbatch_over_file_stream(self, spark, tmp_path, train_docs):
        merges = fit(train_docs, n_merges=20)
        ing = StreamingCorpusIngest(
            spark, str(tmp_path / "corpus"), merges
        )
        in_dir = str(tmp_path / "in")
        os.makedirs(in_dir)
        with open(os.path.join(in_dir, "b1.jsonl"), "w") as f:
            for d in [
                {"doc_id": 1, "text": BASE, "source": "web"},
                {"doc_id": 2, "text": BASE, "source": "web"},  # dup
                {"doc_id": 3, "text": "novel standalone words", "source": "b"},
            ]:
                f.write(json.dumps(d) + "\n")
        stream = spark.readStream.schema(
            "doc_id long, text string, source string"
        ).json(in_dir)
        q = (
            stream.writeStream.foreachBatch(ing.ingest)
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert ing.stats["admitted"] == 2
        assert ing.stats["exact_dups"] == 1
        assert spark.read.parquet(f"{ing.root}/tokens").count() == 2


class TestIdempotentReplay:
    def test_same_batch_id_is_a_noop(self, spark, tmp_path, train_docs):
        """foreachBatch re-delivers a batch with the SAME id after a
        failure — the commit marker must make the replay a no-op
        instead of appending duplicates."""
        merges = fit(train_docs, n_merges=10)
        ing = StreamingCorpusIngest(
            spark, str(tmp_path / "corpus"), merges
        )
        b = spark.createDataFrame(
            [(1, BASE, "web"), (2, "other words entirely", "web")],
            "doc_id long, text string, source string",
        )
        ing.ingest(b, 7)
        n_docs = spark.read.parquet(f"{ing.root}/docs").count()
        n_ix = spark.read.parquet(f"{ing.root}/index").count()
        ing.ingest(b, 7)  # replay
        assert spark.read.parquet(f"{ing.root}/docs").count() == n_docs
        assert spark.read.parquet(f"{ing.root}/index").count() == n_ix
        # a NEW batch id still processes (and dedups against state)
        ing.ingest(b, 8)
        assert spark.read.parquet(f"{ing.root}/docs").count() == n_docs

    def test_zero_admit_batch_still_commits_marker(
        self, spark, tmp_path, train_docs
    ):
        """A batch whose every doc is rejected must still write its
        commit marker — otherwise a foreachBatch redelivery re-appends
        the dead-letter rows and double-counts stats."""
        merges = fit(train_docs, n_merges=10)
        ing = StreamingCorpusIngest(
            spark, str(tmp_path / "corpus"), merges
        )
        ing.ingest(
            spark.createDataFrame(
                [(1, BASE, "web")],
                "doc_id long, text string, source string",
            ),
            0,
        )
        all_dups = spark.createDataFrame(
            [(10, BASE, "web"), (11, None, "web")],
            "doc_id long, text string, source string",
        )
        ing.ingest(all_dups, 1)  # everything rejected → zero admitted
        assert os.path.exists(f"{ing.root}/_batches/1")
        stats_before = dict(ing.stats)
        n_dead = spark.read.parquet(f"{ing.root}/dead").count()
        ing.ingest(all_dups, 1)  # redelivery must be a no-op
        assert ing.stats == stats_before
        assert spark.read.parquet(f"{ing.root}/dead").count() == n_dead


class TestAtomicBatchCommit:
    def test_partial_batch_is_invisible_and_replay_is_exactly_once(
        self, spark, tmp_path, train_docs
    ):
        """The commit protocol's whole point: a crash between the
        per-table writes leaves orphan batch dirs that (a) no reader
        sees — a doc 'written' by the crashed attempt must NOT count
        as a duplicate — and (b) the foreachBatch replay overwrites
        in place, ending with exactly-once state."""
        from kenshin_spark.bpe import fit
        from pyspark.sql import functions as F

        merges = fit(train_docs, n_merges=10)
        ing = StreamingCorpusIngest(
            spark, str(tmp_path / "corpus"), merges
        )
        ing.ingest(
            spark.createDataFrame(
                [(1, BASE, "a")],
                "doc_id long, text string, source string",
            ),
            0,
        )
        # simulate batch 1 crashing after the docs write: its batch
        # dir exists (with rows), but md5/index/marker never landed
        crashed = spark.createDataFrame(
            [(10, "totally novel crashed-batch content here", "a")],
            "doc_id long, text string, source string",
        )
        crashed.write.mode("overwrite").parquet(
            f"{ing.root}/docs/batch=1"
        )
        assert not os.path.exists(f"{ing.root}/_batches/1")
        # (a) readers don't see the orphan: the committed corpus is
        # still just doc 1
        corpus = ing._read(
            "docs", "doc_id long, text string, source string"
        )
        assert {r["doc_id"] for r in corpus.collect()} == {1}

        # (b) the replay of batch 1 (same id, the real content)
        # overwrites the orphan dir and commits all tables at once
        replay = spark.createDataFrame(
            [
                (10, "totally novel crashed-batch content here", "a"),
                (11, BASE, "a"),  # exact dup of committed doc 1
            ],
            "doc_id long, text string, source string",
        )
        ing.ingest(replay, 1)
        assert ing.stats["exact_dups"] == 1   # 11 vs committed state
        docs = spark.read.parquet(f"{ing.root}/docs")
        got = sorted(r["doc_id"] for r in docs.collect())
        assert got == [1, 10]  # exactly once, no orphan duplicates
        # every table committed the batch atomically
        for part in ("docs", "tokens", "md5", "index"):
            assert os.path.isdir(f"{ing.root}/{part}/batch=1"), part
        assert os.path.exists(f"{ing.root}/_batches/1")

    def test_compacted_state_lands_in_batch_minus_one(
        self, spark, tmp_path, train_docs
    ):
        """compact() folds only committed rows into the always-visible
        batch=-1 dir; an orphan batch dir is dropped by the fold (its
        replay will rewrite it)."""
        from kenshin_spark.bpe import fit

        merges = fit(train_docs, n_merges=10)
        ing = StreamingCorpusIngest(spark, str(tmp_path / "c"), merges)
        for i, text in enumerate(
            ["first body of words", "second body of words entirely"]
        ):
            ing.ingest(
                spark.createDataFrame(
                    [(i + 1, text + " padding tokens for quality", "a")],
                    "doc_id long, text string, source string",
                ),
                i,
            )
        # orphan: crashed attempt for batch 7
        spark.createDataFrame(
            [(99, "orphan text", "a")],
            "doc_id long, text string, source string",
        ).write.mode("overwrite").parquet(f"{ing.root}/docs/batch=7")
        ing.compact(min_frag=0)
        docs_dirs = [
            n for n in os.listdir(f"{ing.root}/docs")
            if n.startswith("batch=")
        ]
        assert docs_dirs == ["batch=-1"]
        got = {
            r["doc_id"]
            for r in spark.read.parquet(f"{ing.root}/docs").collect()
        }
        assert got == {1, 2}  # orphan 99 dropped by the fold


class TestClusterState:
    OTHER = "completely separate subject matter with many unique words"

    def _mk(self, spark, tmp_path, train_docs):
        merges = fit(train_docs, n_merges=10)
        return StreamingCorpusIngest(
            spark, str(tmp_path / "corpus"), merges, track_clusters=True
        )

    def test_rejected_neardups_cluster_with_their_canonical(
        self, spark, tmp_path, train_docs
    ):
        """track_clusters=True keeps the provenance the reject path
        loses: each rejected near-dup lands in the same component as
        the corpus doc(s) it collided with, labelled by min doc_id."""
        ing = self._mk(spark, tmp_path, train_docs)
        ing.ingest(
            spark.createDataFrame(
                [(1, BASE, "a"), (2, self.OTHER, "a")],
                "doc_id long, text string, source string",
            ),
            0,
        )
        assert ing.clusters().count() == 0  # no collisions yet
        ing.ingest(
            spark.createDataFrame(
                [(11, BASE + " tail", "a")],  # near-dup of stored 1
                "doc_id long, text string, source string",
            ),
            1,
        )
        assert ing.stats["near_dups"] == 1
        got = {(r["node"], r["cluster_id"])
               for r in ing.clusters().collect()}
        assert got == {(1, 1), (11, 1)}
        # another near-dup of the same canonical joins the same cluster
        ing.ingest(
            spark.createDataFrame(
                [(12, BASE + " coda", "a")],
                "doc_id long, text string, source string",
            ),
            2,
        )
        got = {(r["node"], r["cluster_id"])
               for r in ing.clusters().collect()}
        assert got == {(1, 1), (11, 1), (12, 1)}
        # the delta log is append-only: batch 2 wrote only its delta
        assert os.path.isdir(f"{ing.root}/clusters/batch=2")

    def test_cluster_log_survives_compaction(
        self, spark, tmp_path, train_docs
    ):
        ing = self._mk(spark, tmp_path, train_docs)
        ing.ingest(
            spark.createDataFrame(
                [(5, BASE, "a")],
                "doc_id long, text string, source string",
            ),
            0,
        )
        ing.ingest(
            spark.createDataFrame(
                [(9, BASE + " extra", "a")],
                "doc_id long, text string, source string",
            ),
            1,
        )
        ing.ingest(
            spark.createDataFrame(
                [(7, BASE + " addendum", "a")],
                "doc_id long, text string, source string",
            ),
            2,
        )
        before = {(r["node"], r["cluster_id"])
                  for r in ing.clusters().collect()}
        assert before == {(5, 5), (7, 5), (9, 5)}
        ing.maintenance(min_frag=0)  # ≥2 delta files -> the log gets folded
        assert sorted(
            n for n in os.listdir(f"{ing.root}/clusters")
            if n.startswith("batch=")
        ) == ["batch=-1"]
        after = {(r["node"], r["cluster_id"])
                 for r in ing.clusters().collect()}
        assert after == before
        # a post-compaction near-dup folds on top of the -1 baseline:
        # a cluster-merging doc relabels via a fresh delta batch
        ing.ingest(
            spark.createDataFrame(
                [(2, BASE + " postfix", "a")],
                "doc_id long, text string, source string",
            ),
            3,
        )
        got = {(r["node"], r["cluster_id"])
               for r in ing.clusters().collect()}
        assert got == {(2, 2), (5, 2), (7, 2), (9, 2)}

    def test_off_by_default_writes_no_cluster_state(
        self, spark, tmp_path, train_docs
    ):
        merges = fit(train_docs, n_merges=10)
        ing = StreamingCorpusIngest(spark, str(tmp_path / "c"), merges)
        ing.ingest(
            spark.createDataFrame(
                [(1, BASE, "a")],
                "doc_id long, text string, source string",
            ),
            0,
        )
        ing.ingest(
            spark.createDataFrame(
                [(2, BASE + " tail", "a")],
                "doc_id long, text string, source string",
            ),
            1,
        )
        assert ing.stats["near_dups"] == 1
        assert not os.path.exists(f"{ing.root}/clusters")


class TestMarkerPrune:
    #: one per batch — mutually dissimilar so near-dup never fires
    BODIES = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "solar panels convert photons into electrical current daily",
        "the orchestra rehearsed symphonies beneath the opera house",
        "glaciers carve valleys while rivers deposit fertile silt",
    ]

    def _ingest_n(self, spark, ing, n, start=0):
        for i in range(n):
            ing.ingest(
                spark.createDataFrame(
                    [(1000 + start + i, self.BODIES[start + i], "a")],
                    "doc_id long, text string, source string",
                ),
                start + i,
            )

    def test_markers_survive_until_their_dirs_are_folded(
        self, spark, tmp_path, train_docs
    ):
        """A marker is a batch dir's visibility bit: prune_markers must
        never touch one whose batch= dir still exists in any table, no
        matter how old — only compaction makes markers prunable, and
        keep_last holds back the newest tail as the redelivery guard."""
        merges = fit(train_docs, n_merges=10)
        ing = StreamingCorpusIngest(spark, str(tmp_path / "c"), merges)
        self._ingest_n(spark, ing, 4)
        # dirs all live -> nothing prunable even with a tiny tail
        assert ing.prune_markers(keep_last=1) == 0
        assert sorted(os.listdir(f"{ing.root}/_batches")) == [
            "0", "1", "2", "3"
        ]
        ing.compact(min_frag=0)  # folds every batch dir into batch=-1
        assert ing.prune_markers(keep_last=2) == 2  # 0 and 1 go
        assert sorted(os.listdir(f"{ing.root}/_batches")) == ["2", "3"]
        # state is intact and dedup still sees the folded corpus
        ing.ingest(
            spark.createDataFrame(
                [(9, self.BODIES[0], "a")],
                "doc_id long, text string, source string",
            ),
            10,
        )
        assert ing.stats["exact_dups"] == 1

    def test_bak_staged_dirs_keep_their_markers(
        self, spark, tmp_path, train_docs
    ):
        """A compaction swap that crashed between stage and promote
        leaves the committed batch dirs under <part>.bak; their markers
        are still the visibility bits recover() depends on, so a
        direct prune_markers call must not GC them."""
        merges = fit(train_docs, n_merges=10)
        ing = StreamingCorpusIngest(spark, str(tmp_path / "c"), merges)
        self._ingest_n(spark, ing, 3)
        # simulate the crash: live dir staged away, not yet replaced
        os.rename(f"{ing.root}/docs", f"{ing.root}/docs.bak")
        assert ing.prune_markers(keep_last=1) == 0
        assert ing.recover() == [f"{ing.root}/docs"]
        got = {
            r["doc_id"] for r in ing._read(
                "docs", "doc_id long, text string, source string"
            ).collect()
        }
        assert got == {1000, 1001, 1002}

    def test_marker_does_not_adopt_stale_orphan_dirs(
        self, spark, tmp_path, train_docs
    ):
        """A crashed attempt's batch dir in a table the REPLAY produces
        no rows for (e.g. the doc is quality-rejected after a config
        change) must be scrubbed before the marker lands — otherwise
        the marker would commit the stale rows."""
        from kenshin_spark.quality import predicate

        merges = fit(train_docs, n_merges=10)
        ing = StreamingCorpusIngest(spark, str(tmp_path / "c"), merges)
        self._ingest_n(spark, ing, 1)
        # crashed attempt for batch 5 wrote docs rows, then died
        spark.createDataFrame(
            [(66, "stale crashed attempt content", "a")],
            "doc_id long, text string, source string",
        ).write.mode("overwrite").parquet(f"{ing.root}/docs/batch=5")
        # replay of batch 5 under a stricter gate: rejects everything
        strict = StreamingCorpusIngest(
            spark, ing.root, merges,
            quality_checks=[predicate("false", name="reject_all")],
        )
        strict.ingest(
            spark.createDataFrame(
                [(66, "stale crashed attempt content", "a")],
                "doc_id long, text string, source string",
            ),
            5,
        )
        assert os.path.exists(f"{ing.root}/_batches/5")
        assert not os.path.exists(f"{ing.root}/docs/batch=5")
        got = {
            r["doc_id"] for r in strict._read(
                "docs", "doc_id long, text string, source string"
            ).collect()
        }
        assert got == {1000}  # the stale doc never became visible

    def test_flat_layout_migration(self, spark, tmp_path, train_docs):
        """A pre-commit-log root (flat appended parquet under each
        table) must fail loudly on read and migrate losslessly into
        batch=-1."""
        import hashlib

        merges = fit(train_docs, n_merges=10)
        ing = StreamingCorpusIngest(spark, str(tmp_path / "c"), merges)
        os.makedirs(f"{ing.root}/docs")
        os.makedirs(f"{ing.root}/md5")
        spark.createDataFrame(
            [(1, BASE, "a")], "doc_id long, text string, source string"
        ).toPandas().to_parquet(
            f"{ing.root}/docs/part-0000.parquet", index=False
        )
        spark.createDataFrame(
            [(1, hashlib.md5(BASE.encode()).hexdigest())],
            "doc_id long, text_md5 string",
        ).toPandas().to_parquet(
            f"{ing.root}/md5/part-0000.parquet", index=False
        )
        with pytest.raises(ValueError, match="flat pre-batch-layout"):
            ing._read("docs", "doc_id long, text string, source string")
        assert ing.migrate_flat_layout() == ["md5", "docs"]
        got = ing._read(
            "docs", "doc_id long, text string, source string"
        )
        assert {r["doc_id"] for r in got.collect()} == {1}
        # migrated state dedups: an exact dup of the legacy doc dies
        ing.ingest(
            spark.createDataFrame(
                [(2, BASE, "a")],
                "doc_id long, text string, source string",
            ),
            0,
        )
        assert ing.stats["exact_dups"] == 1

    def test_auto_maintenance_cadence(self, spark, tmp_path, train_docs):
        """maintenance_every=2 runs the pass after batches 1 and 3 —
        state stays folded without an external cron."""
        merges = fit(train_docs, n_merges=10)
        ing = StreamingCorpusIngest(
            spark, str(tmp_path / "c"), merges, maintenance_every=2,
            maintenance_min_frag=0,
        )
        self._ingest_n(spark, ing, 4)
        docs_dirs = sorted(
            n for n in os.listdir(f"{ing.root}/docs")
            if n.startswith("batch=")
        )
        # batches 0-3 folded after batch 3's commit (and 0-1 after 1's)
        assert docs_dirs == ["batch=-1"]
        got = {
            r["doc_id"] for r in ing._read(
                "docs", "doc_id long, text string, source string"
            ).collect()
        }
        assert got == {1000, 1001, 1002, 1003}

    def test_maintenance_is_the_one_call(
        self, spark, tmp_path, train_docs
    ):
        merges = fit(train_docs, n_merges=10)
        ing = StreamingCorpusIngest(spark, str(tmp_path / "c"), merges)
        self._ingest_n(spark, ing, 3)
        out = ing.maintenance(target_files=1, keep_last_markers=1, min_frag=0)
        assert out["recovered"] == []
        assert set(out["compacted"]) >= {"docs", "md5", "index"}
        assert out["markers_pruned"] == 2
        assert sorted(os.listdir(f"{ing.root}/_batches")) == ["2"]
        docs = spark.read.parquet(f"{ing.root}/docs")
        assert docs.count() == 3

    def test_compact_floor_skips_lightly_fragmented(
        self, spark, tmp_path, train_docs
    ):
        """ADVICE r5: every micro-batch adds ≥1 file per table, so a
        bare n_files > target_files re-folds the ENTIRE corpus after
        every batch — O(corpus) IO per maintenance pass. The min_frag
        floor must leave a 3-batch table alone by default and only
        rewrite once fragmentation crosses it."""
        merges = fit(train_docs, n_merges=10)
        ing = StreamingCorpusIngest(spark, str(tmp_path / "c"), merges)
        self._ingest_n(spark, ing, 3)
        assert ing.compact() == {}  # default floor (16) not crossed
        assert ing.maintenance()["compacted"] == {}
        # batch dirs untouched — nothing was rewritten
        assert sorted(
            n for n in os.listdir(f"{ing.root}/docs")
            if n.startswith("batch=")
        ) == ["batch=0", "batch=1", "batch=2"]
        # an explicit low floor folds as before
        assert "docs" in ing.compact(min_frag=2)


class TestCorpusCliVerbs:
    def test_audit_and_maintain(self, spark, tmp_path, train_docs, capsys):
        from kenshin_spark import cli

        merges = fit(train_docs, n_merges=10)
        ing = StreamingCorpusIngest(spark, str(tmp_path / "c"), merges)
        for i, body in enumerate(TestMarkerPrune.BODIES[:3]):
            ing.ingest(
                spark.createDataFrame(
                    [(100 + i, body, "a")],
                    "doc_id long, text string, source string",
                ),
                i,
            )
        cli.main(["--root", ing.root, "--cpus", "2", "corpus-audit"])
        out = json.loads(capsys.readouterr().out)
        assert out["markers"] == 3
        assert out["files"]["docs"] >= 3  # one file per batch dir
        cli.main([
            "--root", ing.root, "--cpus", "2",
            "corpus-maintain", "--keep-markers", "1", "--min-frag", "0",
        ])
        out = json.loads(capsys.readouterr().out)
        assert out["markers_pruned"] == 2
        assert "docs" in out["compacted"]
        cli.main(["--root", ing.root, "--cpus", "2", "corpus-audit"])
        out = json.loads(capsys.readouterr().out)
        assert out["markers"] == 1
        assert out["files"]["docs"] == 1
        # the folded state still dedups
        ing.ingest(
            spark.createDataFrame(
                [(9, TestMarkerPrune.BODIES[0], "a")],
                "doc_id long, text string, source string",
            ),
            10,
        )
        assert ing.stats["exact_dups"] == 1


class TestCrashMatrix:
    """Kill the ingest at EVERY write boundary of the multi-table
    transaction (after the dead write, after docs, tokens, md5, index,
    and before the marker itself) and assert the replay converges to
    byte-identical committed state — the exactly-once claim proven at
    each point the protocol can die, not just the one crash the other
    tests simulate."""

    #: pre-seeded corpus doc + a batch with one dup and two admissions
    CORPUS = "the quick brown fox jumps over the lazy dog again today"
    BATCH = [
        (20, CORPUS, "w"),                                    # exact dup
        (21, "entirely fresh material with many novel words", "w"),
        (22, "another unrelated admitted document body here", "w"),
    ]

    def _seed(self, spark, root, merges):
        ing = StreamingCorpusIngest(spark, root, merges)
        ing.ingest(
            spark.createDataFrame(
                [(1, self.CORPUS, "w")],
                "doc_id long, text string, source string",
            ),
            0,
        )
        return ing

    def _state(self, spark, ing):
        out = {}
        for part, schema in [
            ("docs", "doc_id long, text string, source string"),
            ("md5", "doc_id long, text_md5 string"),
            ("index", "doc_id long, band int, band_key string"),
            ("dead", "row string, reason string, batch_id long"),
        ]:
            out[part] = {
                tuple(r) for r in ing._read(part, schema).collect()
            }
        out["tokens_docs"] = {
            r["doc_id"]
            for r in ing._read(
                "tokens", "doc_id long, n_tokens long"
            ).select("doc_id").collect()
        }
        return out

    @pytest.mark.parametrize("fail_after", [0, 1, 2, 3, 4, "marker"])
    def test_crash_then_replay_is_exactly_once(
        self, spark, tmp_path, train_docs, monkeypatch, fail_after
    ):
        from pyspark.sql.readwriter import DataFrameWriter

        merges = fit(train_docs, n_merges=10)
        # reference: the same batch with no crash, on its own root
        ref = self._seed(spark, str(tmp_path / "ref"), merges)
        batch_df = spark.createDataFrame(
            self.BATCH, "doc_id long, text string, source string"
        )
        ref.ingest(batch_df, 1)
        want = self._state(spark, ref)

        crash_root = str(tmp_path / "crash")
        ing = self._seed(spark, crash_root, merges)

        class Boom(RuntimeError):
            pass

        real_parquet = DataFrameWriter.parquet
        count = {"n": 0}

        def failing_parquet(self_w, path, **kw):
            if f"{crash_root}/" in path and "/batch=1" in path:
                if fail_after != "marker" and count["n"] == fail_after:
                    raise Boom(f"injected crash before write {path}")
                count["n"] += 1
            return real_parquet(self_w, path, **kw)

        monkeypatch.setattr(DataFrameWriter, "parquet", failing_parquet)
        if fail_after == "marker":
            real_marker = type(ing._fs).write_text_atomic

            def failing_marker(fs, path, text):
                if path.endswith("/_batches/1"):
                    raise Boom("injected crash before marker")
                return real_marker(fs, path, text)

            monkeypatch.setattr(
                type(ing._fs), "write_text_atomic", failing_marker
            )
        with pytest.raises(Boom):
            ing.ingest(batch_df, 1)
        monkeypatch.undo()

        # mid-transaction state is invisible to every reader
        partial = self._state(spark, ing)
        assert partial == self._state(spark, self._seed_ref_only(
            spark, str(tmp_path / "base"), merges
        )), f"crash at {fail_after} leaked uncommitted state"

        # restart (fresh instance, as foreachBatch redelivery would)
        ing2 = StreamingCorpusIngest(spark, crash_root, merges)
        ing2.ingest(batch_df, 1)
        assert self._state(spark, ing2) == want, fail_after

    def _seed_ref_only(self, spark, root, merges):
        if not os.path.exists(root):
            return self._seed(spark, root, merges)
        return StreamingCorpusIngest(spark, root, merges)


class TestStateCompaction:
    def test_compact_folds_state_tables_and_dedup_still_works(
        self, spark, tmp_path, train_docs
    ):
        """Three tiny batches fragment every state table; compact folds
        each to one file, contents unchanged, and a subsequent batch
        still dedups against the compacted state."""
        merges = fit(train_docs, n_merges=10)
        ing = StreamingCorpusIngest(
            spark, str(tmp_path / "corpus"), merges
        )
        texts = [
            (1, BASE, "a"),
            (2, "wholly different second document body", "a"),
            (3, "third novel body of words entirely", "a"),
        ]
        for i, row in enumerate(texts):
            ing.ingest(
                spark.createDataFrame(
                    [row], "doc_id long, text string, source string"
                ),
                i,
            )
        rep = ing.file_report()
        assert rep["docs"] >= 3 and rep["md5"] >= 3
        before_docs = sorted(
            r["doc_id"]
            for r in spark.read.parquet(f"{ing.root}/docs").collect()
        )
        ing.compact(min_frag=0)
        rep2 = ing.file_report()
        assert all(v == 1 for k, v in rep2.items() if k != "dead")
        assert sorted(
            r["doc_id"]
            for r in spark.read.parquet(f"{ing.root}/docs").collect()
        ) == before_docs
        # dedup against the COMPACTED state still works
        ing.ingest(
            spark.createDataFrame(
                [(10, BASE, "b"), (11, BASE + " tail", "b")],
                "doc_id long, text string, source string",
            ),
            3,
        )
        assert ing.stats["exact_dups"] == 1
        assert ing.stats["near_dups"] == 1

    def test_crash_mid_compaction_recovers(self, spark, tmp_path, train_docs):
        merges = fit(train_docs, n_merges=10)
        ing = StreamingCorpusIngest(spark, str(tmp_path / "c"), merges)
        ing.ingest(
            spark.createDataFrame(
                [(1, BASE, "a")],
                "doc_id long, text string, source string",
            ),
            0,
        )
        before = sorted(
            r["doc_id"]
            for r in spark.read.parquet(f"{ing.root}/md5").collect()
        )
        # simulate the crash window: stage the live table away by hand
        os.rename(f"{ing.root}/md5", f"{ing.root}/md5.bak")
        assert f"{ing.root}/md5" in ing.recover()
        assert sorted(
            r["doc_id"]
            for r in spark.read.parquet(f"{ing.root}/md5").collect()
        ) == before


class TestEmptyQualityChecks:
    def test_explicit_empty_checks_skips_gate(
        self, spark, tmp_path, train_docs
    ):
        """quality_checks=[] must skip the gate (not build a NULL filter
        expression), admitting rows the default checks would reject."""
        merges = fit(train_docs, n_merges=10)
        ing = StreamingCorpusIngest(
            spark, str(tmp_path / "corpus"), merges,
            quality_checks=[],
        )
        ing.ingest(
            spark.createDataFrame(
                [(1, BASE, "web"), (2, "abc", "web")],
                "doc_id long, text string, source string",
            ),
            0,
        )
        assert ing.stats["quality_rejected"] == 0
        assert ing.stats["admitted"] == 2
