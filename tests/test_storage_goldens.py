"""Golden end-to-end tests ported from the reference suite
(tests/test_storage.py, tests/test_agg.py) — same inputs, same expected
grids; the semantics are engine-independent so they validate our Spark
operators bit-for-bit against douban/Kenshin.

Metric mapping: the reference packs N "tags" (metric names) per file with
value ``10*j + i`` for metric index j (tests/test_storage.py:33-35); here
each tag is a metric row in the tall model.
"""

import pytest
from pyspark.sql import functions as F

from kenshin_spark.config import Archive, Schema
from kenshin_spark.operators.fetch import fetch, roundup
from kenshin_spark.operators.update import POINT_SCHEMA, TieredStore

NOW = 1411628779  # fixed `now` used by every reference golden


def make_schema(archive_list, xff, agg="min"):
    return Schema(
        name="golden",
        pattern=".*",
        archives=tuple(Archive(s, c) for s, c in archive_list),
        xff=xff,
        agg_method=agg,
    )


def points_df(spark, seeds, num_metrics=2, null_seeds=()):
    """Point i at ts NOW-i with value 10*j+i per metric j
    (tests/test_storage.py:33-35); seeds in ``null_seeds`` carry NULL
    (the reference's NULL_VALUE sentinel, tests/test_storage.py:99-113)."""
    rows = []
    for i in seeds:
        for j in range(num_metrics):
            val = None if i in null_seeds else float(10 * j + i)
            rows.append((f"m{j}", NOW - i, val))
    return spark.createDataFrame(rows, POINT_SCHEMA)


def run_fetch(store, from_ts, until_ts, now, num_metrics=2):
    tiers = [store.tier(i) for i in range(len(store.schema.archives))]
    metrics = [f"m{j}" for j in range(num_metrics)]
    df = fetch(tiers, list(store.schema.archives), metrics, from_ts, until_ts, now)
    if df is None:
        return None
    rows = df.collect()
    by_ts: dict[int, list] = {}
    for r in rows:
        by_ts.setdefault(r["ts"], [None] * num_metrics)
        by_ts[r["ts"]][int(r["metric"][1:])] = r["value"]
    return {ts: tuple(v) for ts, v in by_ts.items()}


def grid_as_list(result, from_ts, until_ts, step):
    return [result[ts] for ts in range(from_ts, until_ts, step)]


@pytest.fixture()
def small_store(spark):
    # archives (1s,6),(3s,6), xff=1.0, agg=min (tests/test_storage.py:46-52)
    return TieredStore(spark, make_schema([(1, 6), (3, 6)], 1.0))


@pytest.fixture()
def lost_store(spark):
    # archives (1s,60),(3s,60), xff=5 (tests/test_storage.py:159-165)
    return TieredStore(spark, make_schema([(1, 60), (3, 60)], 5.0))


def test_basic_update_fetch(spark, small_store):
    # tests/test_storage.py:73-85
    small_store.update(points_df(spark, range(1, 6)), NOW)
    res = run_fetch(small_store, NOW - 5, NOW, NOW)
    expected = [(float(i), float(10 + i)) for i in range(5, 0, -1)]
    assert grid_as_list(res, NOW - 5, NOW, 1) == expected


def test_update_propagate(spark, small_store):
    # tests/test_storage.py:87-97
    small_store.update(points_df(spark, range(1, 7)), NOW)
    res = run_fetch(small_store, NOW - 7, NOW, NOW)
    assert grid_as_list(res, NOW - 7, roundup(NOW, 3), 3) == [
        (5.0, 15.0),
        (2.0, 12.0),
        (None, None),
    ]


def test_null_point(spark, small_store):
    # tests/test_storage.py:99-113
    small_store.update(points_df(spark, range(1, 7), null_seeds={5, 6}), NOW)
    res = run_fetch(small_store, NOW - 7, NOW, NOW)
    assert grid_as_list(res, NOW - 7, roundup(NOW, 3), 3) == [
        (None, None),
        (2.0, 12.0),
        (None, None),
    ]


def test_update_old_points(spark, small_store):
    # tests/test_storage.py:115-125 — old points land directly in the
    # coarse tier (W4 age routing); same-slot winner = tuple sorting last.
    small_store.update(points_df(spark, range(7, 13)), NOW)
    res = run_fetch(small_store, NOW - 13, NOW, NOW)
    assert grid_as_list(res, roundup(NOW - 13, 3), roundup(NOW, 3), 3) == [
        (12.0, 22.0),
        (10.0, 20.0),
        (7.0, 17.0),
        (None, None),
        (None, None),
    ]


def test_fetch_empty_metric(spark, small_store):
    # tests/test_storage.py:127-133 — empty series → all-null grid
    res = run_fetch(small_store, NOW - 4, NOW, NOW)
    assert grid_as_list(res, NOW - 4, NOW, 1) == [(None, None)] * 4


def test_lost_points_update_propagate(spark, lost_store):
    # tests/test_storage.py:167-186 — gapped, out-of-order batches with
    # explicit mtime between them.
    seeds_list = [range(30, 45), range(15)]
    mtime = None
    for i, seeds in enumerate(seeds_list):
        if i != 0:
            mtime = NOW - max(seeds_list[i - 1])
        lost_store.update(points_df(spark, seeds), NOW, mtime)
    res = run_fetch(lost_store, NOW - 61, NOW, NOW)
    null = (None, None)
    assert grid_as_list(res, roundup(NOW - 61, 3), roundup(NOW, 3), 3) == [
        null, null, null, null, null,
        (44.0, 54.0), (41.0, 51.0), (38.0, 48.0), (35.0, 45.0), (32.0, 42.0),
        (30.0, 40.0),
        null, null, null, null,
        (14.0, 24.0), (11.0, 21.0), (8.0, 18.0), (5.0, 15.0),
        null, null,
    ]


def test_lost_points_special_start_time(spark, lost_store):
    # tests/test_storage.py:188-205 — batch start exactly on a timeunit
    # boundary must still propagate.
    seeds_list = [range(10, 20), range(1, 7)]
    mtime = None
    for i, seeds in enumerate(seeds_list):
        if i != 0:
            mtime = NOW - max(seeds_list[i - 1])
        lost_store.update(points_df(spark, seeds), NOW, mtime)
    from_ts = 1411628760
    until_ts = from_ts + 15
    res = run_fetch(lost_store, from_ts, until_ts, from_ts + 61)
    assert grid_as_list(res, from_ts, roundup(until_ts, 3), 3) == [
        (17.0, 27.0), (14.0, 24.0), (11.0, 21.0), (10.0, 20.0), (5.0, 15.0),
    ]


def test_lost_points_basic_update(spark, lost_store):
    # tests/test_storage.py:207-218 — gap inside one batch
    lost_store.update(points_df(spark, [1, 2, 4, 5]), NOW)
    res = run_fetch(lost_store, NOW - 5, NOW, NOW)
    assert grid_as_list(res, NOW - 5, NOW, 1) == [
        (5.0, 15.0), (4.0, 14.0), (None, None), (2.0, 12.0), (1.0, 11.0),
    ]


def test_multi_archive_time_range(spark):
    # tests/test_storage.py:221-257 — 3-tier cascade, fetch a sub-range
    # from the coarsest tier.
    store = TieredStore(
        spark, make_schema([(1, 60), (3, 60), (6, 60)], 5.0)
    )
    store.update(points_df(spark, range(19, 30), num_metrics=3), NOW)
    from_ts = 1411628760 - 2 * 6
    until_ts = 1411628760
    res = run_fetch(store, from_ts, until_ts, from_ts + 181, num_metrics=3)
    assert grid_as_list(res, from_ts, roundup(until_ts, 6), 6) == [
        (26.0, 36.0, 46.0),
        (20.0, 30.0, 40.0),
    ]


def test_agg_goldens(spark):
    # tests/test_agg.py:21-39 — the five agg fns over values 0..9
    from kenshin_spark.operators.downsample import downsample

    rows = [("m", 100 + i, float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, POINT_SCHEMA)
    expected = {"average": 4.5, "sum": 45.0, "last": 9.0, "max": 9.0, "min": 0.0}
    for agg, want in expected.items():
        got = downsample(df, 100, agg).collect()
        assert len(got) == 1 and got[0]["value"] == want, agg


def test_fetch_outside_retention_returns_none(spark, small_store):
    # kenshin/storage.py:630-634 — window entirely older than retention
    assert run_fetch(small_store, NOW - 100, NOW - 50, NOW) is None


def test_fetch_inverted_range_raises(spark, small_store):
    with pytest.raises(ValueError):
        run_fetch(small_store, NOW, NOW - 5, NOW)


def test_fetch_zero_width_window_empty(spark):
    """A window narrower than the tier step containing no step boundary
    rounds to zero width — the reference returns an empty series
    (kenshin/storage.py:646-660); sequence() must not be asked for
    descending bounds (ADVICE r1: IllegalArgumentException)."""
    from kenshin_spark.operators.fetch import grid_fill

    store = TieredStore(spark, make_schema([(60, 60), (300, 84)], 1.0))
    store.update(points_df(spark, range(1, 6)), NOW)
    tiers = [store.tier(i) for i in range(2)]
    # last 30 s: from/until round to the same 60 s boundary
    from_ts = roundup(NOW, 60) - 59
    until_ts = from_ts + 30
    df = fetch(
        tiers, list(store.schema.archives), ["m0"], from_ts, until_ts, NOW
    )
    assert df is not None and df.count() == 0
    assert df.columns == ["metric", "ts", "value"]
    # direct grid_fill with an equal rounded window behaves the same
    assert grid_fill(tiers[0], ["m0"], 121, 130, 60).count() == 0
