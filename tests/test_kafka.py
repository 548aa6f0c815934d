"""Kafka source builders (sources/kafka.py) — the production ingest path.

This sandbox has no broker and no spark-sql-kafka connector JAR, so the
suite splits in two:

- construction tests (always run): the builders must wire the exact
  reader options the production path depends on, and resolving the
  ``kafka`` format must fail with the MISSING-DATA-SOURCE error — not a
  config error — proving the plan reaches source resolution intact;
- integration tests (``kafka`` marker, skipped unless
  ``KENSHIN_KAFKA_BOOTSTRAP`` is set): real end-to-end reads on a
  cluster with the connector on the classpath.
"""

from __future__ import annotations

import os

import pytest

# heavyweight tier: excluded from the driver's fast default run
pytestmark = pytest.mark.slow

BOOTSTRAP = os.environ.get("KENSHIN_KAFKA_BOOTSTRAP")

kafka = pytest.mark.skipif(
    BOOTSTRAP is None,
    reason="integration: set KENSHIN_KAFKA_BOOTSTRAP to a broker "
    "(and add --packages org.apache.spark:spark-sql-kafka-0-10_2.13)",
)


class TestKafkaBuilders:
    def test_reader_options_pinned(self):
        """The option set carries exactly what the ingest contract
        needs: servers, subscription, offsets, loss tolerance, and the
        backpressure cap (the 2 MB receive-cap analog)."""
        from kenshin_spark.sources.kafka import kafka_options

        opts = kafka_options(
            "broker:9092",
            "metrics-lines",
            starting_offsets="earliest",
            max_offsets_per_trigger=50_000,
        )
        assert opts == {
            "kafka.bootstrap.servers": "broker:9092",
            "subscribe": "metrics-lines",
            "startingOffsets": "earliest",
            "failOnDataLoss": "false",
            "maxOffsetsPerTrigger": "50000",
        }
        # without the cap, the key must be absent entirely (Kafka treats
        # an empty value as malformed)
        assert "maxOffsetsPerTrigger" not in kafka_options("b:9092", "t")

    def test_load_fails_at_source_resolution_not_config(self, spark):
        """Without the connector JAR, .load() must die looking up the
        'kafka' data source — any OTHER error would mean the builder
        itself is malformed."""
        from kenshin_spark.sources.kafka import kafka_lines

        with pytest.raises(Exception) as exc:
            kafka_lines(spark, "broker:9092")
        msg = str(exc.value)
        assert "kafka" in msg.lower()
        assert (
            "Failed to find" in msg
            or "DATA_SOURCE_NOT_FOUND" in msg
            or "data source" in msg.lower()
        )


@kafka
class TestKafkaIntegration:
    """Real-broker smoke: line-protocol records stream through the S1
    parser. Runs only with KENSHIN_KAFKA_BOOTSTRAP set."""

    def test_lines_roundtrip(self, spark, tmp_path):
        from kenshin_spark.sources.kafka import kafka_lines
        from kenshin_spark.sources.line_protocol import parse_metric_lines

        lines = kafka_lines(
            spark, BOOTSTRAP, "metrics-lines", starting_offsets="earliest"
        )
        points = parse_metric_lines(lines)
        q = (
            points.writeStream.format("memory")
            .queryName("kafka_smoke")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            got = spark.sql("SELECT * FROM kafka_smoke")
            assert got.columns == ["metric", "ts", "value"]
        finally:
            q.stop()
