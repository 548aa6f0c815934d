"""Streaming Holt aberration detection — cross-batch forecasting state.

The batch ``functions.render.holt_linear`` scan needs the whole series in
one pass; at ingest time each micro-batch only sees its own points, so
the level/trend/deviation triple must persist across batches — the same
``applyInPandasWithState`` shape as ``streaming.stateful`` counter rates
(SURVEY intro: custom stateful operators). Both paths share ONE step
function (``render.holt_step``), so a streaming run over N batches is
bit-identical to the batch scan over the concatenated series (asserted
in tests — the invariant that makes alert thresholds portable between
backfill and live ingest).

State is three doubles per metric; the ProcessingTime timeout expires
dormant metrics' state like the hot-cache drain (rurouni/cache.py:288-338).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kenshin_spark.functions.render import holt_step

OUTPUT_SCHEMA = (
    "metric string, ts long, value double, forecast double, "
    "deviation double, aberrant boolean"
)
STATE_SCHEMA = "level double, trend double, dev double"


def make_holt_fn(alpha: float = 0.1, beta: float = 0.0035, gamma: float = 0.1):
    a, b, g = float(alpha), float(beta), float(gamma)

    def _holt_fn(
        key: tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (metric,) = key
        st = tuple(state.get) if state.exists else None

        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            if state.hasTimedOut:
                state.remove()
            return
        pts = pd.concat(frames).sort_values("ts")

        out = []
        for ts, v in zip(pts["ts"], pts["value"]):
            if pd.isna(v):
                # keep the row, like the batch scan: NULL forecast/dev/
                # aberrant, state untouched (a NaN is a gap, not a zero)
                out.append((metric, int(ts), None, None, None, None))
                continue
            st, forecast, dev, aberrant = holt_step(st, float(v), a, b, g)
            out.append((metric, int(ts), float(v), forecast, dev, aberrant))

        if st is not None:  # NaN-only history → nothing to persist yet
            state.update(st)
        state.setTimeoutDuration(3_600_000)  # 1 h idle → state expires
        yield pd.DataFrame(
            out,
            columns=[
                "metric", "ts", "value", "forecast", "deviation", "aberrant",
            ],
        )

    return _holt_fn


def with_holt_aberration(
    points: DataFrame,
    alpha: float = 0.1,
    beta: float = 0.0035,
    gamma: float = 0.1,
) -> DataFrame:
    """Streaming transform: ``(metric, ts, value)`` → ``+ forecast,
    deviation, aberrant`` with the Holt state carried across
    micro-batches."""
    return points.groupBy("metric").applyInPandasWithState(
        make_holt_fn(alpha, beta, gamma),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
