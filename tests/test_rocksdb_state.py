"""RocksDB state store provider — streaming state at scale.

SURVEY §7 names "RocksDB state store, state TTL" as the answer to the
reference's millions-of-live-series design point (the per-file ring
cache, rurouni/cache.py:219-338): the default HDFS-backed provider keeps
all state in executor heap, RocksDB spills it to executor-local disk.
These tests flip the provider on the shared session (a runtime SQL conf,
pinned per query at start) and prove the two stateful paths of the
engine — the watermarked hot-cache window aggregation and the
applyInPandasWithState counter-rate operator — run AND produce identical
results under RocksDB, asserting from query progress metrics that the
RocksDB provider actually held the state."""

import json
import os

import pytest
from pyspark.sql import functions as F

from kenshin_spark.config import Schema, SchemaSet
from kenshin_spark.session import ROCKSDB_PROVIDER, enable_rocksdb_state
from kenshin_spark.streaming import StreamingIngest

# heavyweight tier: excluded from the driver's fast default run
pytestmark = pytest.mark.slow

PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture()
def rocksdb(spark):
    """Enable RocksDB state for the test, restore the default after —
    provider choice binds per query at start, so other tests' queries
    are unaffected either way."""
    before = spark.conf.get(PROVIDER_CONF, None)
    enable_rocksdb_state(spark)
    assert spark.conf.get(PROVIDER_CONF) == ROCKSDB_PROVIDER
    yield spark
    if before is None:
        spark.conf.unset(PROVIDER_CONF)
    else:
        spark.conf.set(PROVIDER_CONF, before)


def _write_lines(path, name, lines):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        f.write("\n".join(lines) + "\n")


def _rocksdb_metrics(query) -> dict:
    """State operator custom metrics from the last progress — RocksDB
    exposes rocksdb* counters there; the HDFS provider does not."""
    prog = json.loads(query.lastProgress.json) if hasattr(
        query.lastProgress, "json"
    ) else query.lastProgress
    ops = prog["stateOperators"]
    assert ops, "query had no stateful operator"
    return ops[0].get("customMetrics", {})


class TestAggregatedModeUnderRocksDB:
    def test_hot_cache_windows_in_rocksdb(self, rocksdb, tmp_path):
        """The watermarked window aggregation (W1-W3 hot cache) under
        the RocksDB provider: same flush/hot split as the default
        provider test, and the progress metrics prove RocksDB held the
        window state."""
        spark = rocksdb
        in_dir, cp, root = (
            str(tmp_path / "in"),
            str(tmp_path / "cp"),
            str(tmp_path / "store"),
        )
        schema = Schema.from_strings(
            "fast", "^fast", "10s:1h,60s:1d", xff=1.0, agg_method="sum",
            cache_retention=30,
        )
        ingest = StreamingIngest(spark, SchemaSet((schema,)), root)
        _write_lines(
            in_dir,
            "b1.txt",
            [
                "fast.x 1.0 1000",
                "fast.x 2.0 1010",
                "fast.x 3.0 1100",  # watermark → 1100-30 = 1070
            ],
        )
        from kenshin_spark.sources.line_protocol import parse_metric_lines

        lines = spark.readStream.format("text").load(in_dir)
        points = parse_metric_lines(lines, line_col="value").where(
            F.col("corrupt").isNull()
        )
        q = ingest.start_aggregated(
            points, schema, checkpoint=cp, trigger={"availableNow": True}
        )
        q.awaitTermination(120)
        metrics = _rocksdb_metrics(q)
        assert any(k.startswith("rocksdb") for k in metrics), metrics

        store = ingest.store_for(schema)
        got = sorted(
            (r["metric"], r["ts"], r["value"])
            for r in store.read(0).collect()
        )
        assert got == [("fast.x", 1000, 1.0), ("fast.x", 1010, 2.0)]
        hot = ingest.hot_points(cp)
        assert sorted(
            (r["metric"], r["ts"], r["value"]) for r in hot.collect()
        ) == [("fast.x", 1100, 3.0)]


class TestCounterRateUnderRocksDB:
    def test_apply_in_pandas_with_state_in_rocksdb(
        self, rocksdb, tmp_path
    ):
        """The custom stateful operator (applyInPandasWithState) under
        RocksDB: cross-batch last-point state survives between
        micro-batches in the RocksDB store and rates match the
        single-batch computation."""
        spark = rocksdb
        in_dir = str(tmp_path / "in")
        _write_lines(in_dir, "b1.jsonl", [
            json.dumps({"metric": "c", "ts": 100, "value": 10.0}),
            json.dumps({"metric": "c", "ts": 110, "value": 30.0}),
        ])
        from kenshin_spark.streaming.stateful import with_counter_rate

        stream = spark.readStream.schema(
            "metric string, ts long, value double"
        ).json(in_dir)
        out_dir = str(tmp_path / "out")

        def sink(batch, batch_id):
            if not batch.isEmpty():
                batch.write.mode("append").parquet(out_dir)

        def run():
            q = (
                with_counter_rate(stream)
                .writeStream.foreachBatch(sink)
                .option("checkpointLocation", str(tmp_path / "cp"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            return q

        q = run()
        metrics = _rocksdb_metrics(q)
        assert any(k.startswith("rocksdb") for k in metrics), metrics

        # second run: state (last point ts=110 v=30) must persist in
        # RocksDB across the restart
        _write_lines(in_dir, "b2.jsonl", [
            json.dumps({"metric": "c", "ts": 120, "value": 50.0}),
        ])
        run()
        rows = {
            r["ts"]: r["rate"]
            for r in spark.read.parquet(out_dir).collect()
        }
        assert rows[100] is None          # series start
        assert rows[110] == 2.0           # (30-10)/10
        assert rows[120] == 2.0           # (50-30)/10 — via stored state
