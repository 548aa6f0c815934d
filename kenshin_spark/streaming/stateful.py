"""Custom stateful streaming operator: cross-batch counter rates.

The reference exposes raw counter series; graphite-web derives rates at
render time. In a streaming engine the idiomatic place is ingest — but a
window aggregation cannot see the *previous batch's last point*, so this
is the textbook ``applyInPandasWithState`` case (SURVEY intro: custom
stateful operators): per-metric state carries ``(last_ts, last_value)``
across micro-batches; each point emits its per-second rate vs the
previous point, NULL at series start and on counter resets.

State size is two scalars per metric — millions of metrics fit easily in
the state store. At that scale switch the provider to RocksDB
(``session.enable_rocksdb_state(spark)`` or
``get_spark(rocksdb_state=True)`` / ``SPARK_GRAFT_ROCKSDB_STATE=1``)
so state lives on executor-local disk instead of heap; this operator is
integration-tested under that provider (tests/test_rocksdb_state.py).
The ProcessingTime timeout expires dormant metrics' state, the same
hygiene as the hot-cache drain (rurouni/cache.py:288-338).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "metric string, ts long, value double, rate double"
STATE_SCHEMA = "last_ts long, last_value double"


def _rate_fn(
    key: tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (metric,) = key
    last_ts: Any = None
    last_value: Any = None
    if state.exists:
        last_ts, last_value = state.get

    frames = [pdf for pdf in pdfs if len(pdf)]
    if not frames:
        if state.hasTimedOut:
            state.remove()
        return
    pts = pd.concat(frames).sort_values("ts")

    out = []
    for ts, value in zip(pts["ts"], pts["value"]):
        ts = int(ts)
        rate = None
        if (
            last_ts is not None
            and ts > last_ts
            and value is not None
            and last_value is not None
            and value >= last_value  # counter reset → NULL, like
            # nonNegativeDerivative
        ):
            rate = (float(value) - float(last_value)) / (ts - last_ts)
        out.append((metric, ts, value, rate))
        last_ts, last_value = ts, value

    state.update((last_ts, last_value))
    state.setTimeoutDuration(3_600_000)  # 1 h idle → state expires
    yield pd.DataFrame(out, columns=["metric", "ts", "value", "rate"])


def with_counter_rate(points: DataFrame) -> DataFrame:
    """Streaming transform: ``(metric, ts, value)`` → ``+ rate`` with
    state persisted across micro-batches. Use inside a streaming query:

        points = parse_metric_lines(...)
        rated = with_counter_rate(points.select("metric", "ts", "value"))
        rated.writeStream.foreachBatch(...)...
    """
    return points.groupBy("metric").applyInPandasWithState(
        _rate_fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
