"""W4/W6/W7/W8 — the full batch-update semantics of ``kenshin.update``.

This module reproduces, over DataFrames, exactly what the reference does on
one ``update(path, points, now, mtime)`` call (kenshin/storage.py:384-586):

1. **Age routing (W4)**: each point goes to the FIRST archive whose
   retention covers ``now - ts``; points older than every archive are
   dropped (kenshin/storage.py:397-419).
2. **Align + within-batch dedup (W5)**: points are aligned down to the
   archive step; among same-slot duplicates the tuple sorting LAST wins —
   i.e. the largest value, because the reference sorts ``(aligned_ts,
   value)`` tuples and keeps the last of each run
   (kenshin/storage.py:429-444). NULL(sentinel) sorts smallest, so a NULL
   never beats a real value within one batch.
3. **Slot overwrite across updates (W6)**: a later update overwrites the
   ring slot, including with NULL (kenshin/storage.py:468-480).
4. **Gated propagation (W7/W8)**: after writing archive i the engine
   re-aggregates a *bounded window* of archive i into archive i+1,
   recursively. The window derives from the repurposed xFilesFactor
   timeunit (kenshin/storage.py:505-528):

       timeunit = ceil(low_step/high_step * xff) * high_step
       skip if floor(from/tu) == floor(until/tu) and from % tu != 0
       if low_step <= timeunit:
           end   = floor(until/tu) * tu
           start = min(end - tu, floor(from/tu) * tu)
       else:
           end   = roundup(until, low_step)
           start = align_down(from, low_step)

   with ``(from, until) = (min(mtime, oldest point ts), newest point ts)``
   and the recursion receiving ``(start, max(end, until))``
   (kenshin/storage.py:584).

The mutable ring file becomes an accumulated DataFrame per tier; the ring
overwrite becomes last-update-wins merge keyed by an update sequence
number. All per-batch aggregation is ``groupBy(metric, slot)`` — one
shuffle per touched tier, built-in aggregates only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kenshin_spark.config import AGG_SQL, Schema, propagation_timeunit
from kenshin_spark.operators.align import align_ts
from kenshin_spark.operators.fetch import roundup

#: the reference's NULL sentinel (kenshin/consts.py:4) — used only as an
#: ordering key so NULL never beats a value within a batch, never stored.
NULL_ORDER = -4294967296.0

POINT_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType(), False),
        T.StructField("ts", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)


def propagation_range(
    from_time: int, until_time: int, timeunit: int, low_step: int
) -> tuple[int, int] | None:
    """The W8 window arithmetic (kenshin/storage.py:518-528). Integer math
    on epoch seconds; None means "skip this propagation"."""
    from_b, until_b = from_time // timeunit, until_time // timeunit
    if from_b == until_b and from_time % timeunit != 0:
        return None
    if low_step <= timeunit:
        end = until_b * timeunit
        start = min(end - timeunit, from_b * timeunit)
    else:
        end = roundup(until_time, low_step)
        start = from_time - from_time % low_step
    return start, end


def _align_dedup_max(points: DataFrame, step: int) -> DataFrame:
    """Align to step; same-slot winner = tuple sorting last = max value,
    with NULL ordered below every value (kenshin/storage.py:429-444)."""
    return points.groupBy(
        "metric", align_ts(F.col("ts").cast("long"), step).alias("ts")
    ).agg(
        F.expr(f"max_by(value, coalesce(value, {NULL_ORDER}d))").alias("value")
    )


class TieredStore:
    """Accumulated per-tier state with ring-overwrite merge semantics.

    Each tier is a DataFrame ``(metric, ts, value, _seq)``; a higher _seq
    (later update) overwrites the slot, NULLs included — exactly the ring
    write of kenshin/storage.py:468-480.
    """

    def __init__(self, spark: SparkSession, schema: Schema):
        self.spark = spark
        self.schema = schema
        self._seq = 0
        empty = spark.createDataFrame([], POINT_SCHEMA).withColumn(
            "_seq", F.lit(0).cast("long")
        )
        self.tiers: list[DataFrame] = [empty] * len(schema.archives)

    def tier(self, i: int) -> DataFrame:
        """Resolved (post-merge) view of tier i: last write per slot wins.

        ``max_by`` needs a NULL-safe payload, so the value rides inside a
        struct keyed by _seq."""
        return (
            self.tiers[i]
            .groupBy("metric", "ts")
            .agg(F.max(F.struct("_seq", "value")).alias("_w"))
            .select("metric", "ts", F.col("_w.value").alias("value"))
        )

    def _write(self, i: int, rows: DataFrame) -> None:
        self._seq += 1
        stamped = rows.select(
            "metric",
            F.col("ts").cast("long").alias("ts"),
            F.col("value").cast("double").alias("value"),
            F.lit(self._seq).cast("long").alias("_seq"),
        )
        self.tiers[i] = self.tiers[i].unionByName(stamped)

    # -- the update entry point -------------------------------------------

    def update(self, points: DataFrame, now: int, mtime: int | None = None) -> None:
        """One ``kenshin.update`` call (kenshin/storage.py:384-425)."""
        archives = self.schema.archives
        pts = points.select("metric", F.col("ts").cast("long"), "value").where(
            F.col("ts").isNotNull()
        )
        # W4: first archive whose retention covers the age takes the point.
        age = F.lit(now) - F.col("ts")
        routed = pts.withColumn(
            "_arch",
            F.coalesce(
                *[
                    F.when(age <= F.lit(a.retention), F.lit(i))
                    for i, a in enumerate(archives)
                ]
            ),
        ).where(F.col("_arch").isNotNull())
        # tiny frame in tests; bounded in production (one micro-batch)
        by_arch = {
            r["_arch"]: None for r in routed.select("_arch").distinct().collect()
        }
        for i in sorted(by_arch):
            group = routed.where(F.col("_arch") == i).drop("_arch")
            bounds = group.agg(
                F.min("ts").alias("lo"), F.max("ts").alias("hi")
            ).collect()[0]
            lo, hi = int(bounds["lo"]), int(bounds["hi"])
            step = archives[i].sec_per_point
            aligned = _align_dedup_max(group, step)
            self._write(i, aligned)
            # timestamp_range per kenshin/storage.py:401-404,486-490
            start = min(mtime, lo) if mtime is not None else lo
            self._propagate(i, (start, hi))

    def _propagate(self, idx: int, ts_range: tuple[int, int]) -> None:
        """Recursive gated propagation (kenshin/storage.py:510-586)."""
        nxt = idx + 1
        if nxt >= len(self.schema.archives):
            return
        high = self.schema.archives[idx]
        low = self.schema.archives[nxt]
        tu = propagation_timeunit(
            self.schema.xff, high.sec_per_point, low.sec_per_point
        )
        rng = propagation_range(ts_range[0], ts_range[1], tu, low.sec_per_point)
        if rng is None:
            return
        start, end = rng
        window = self.tier(idx).where(
            (F.col("ts") >= F.lit(start)) & (F.col("ts") < F.lit(end))
        )
        agg_expr = AGG_SQL[self.schema.agg_method].format(v="value", t="ts")
        slots = window.groupBy(
            "metric",
            align_ts(F.col("ts").cast("long"), low.sec_per_point).alias("ts"),
        ).agg(F.expr(agg_expr).alias("value"))
        self._write(nxt, slots)
        self._propagate(nxt, (start, max(end, ts_range[1])))
