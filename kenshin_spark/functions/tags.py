"""Key/value series tags — ``name;key=value;key2=value2``.

The reference's file format calls the *metric name* a "tag"
(kenshin/storage.py:27,61-63); true key/value tags appear in its test
series names (``host=webserver01,cpu=0`` — tests/test_storage.py:42-45)
and in Graphite 1.1+'s public tagged-series syntax
(``metric.name;tag1=val1;tag2=val2``), which is what we parse here.

Model: the FULL tagged string stays the series identity (the ``metric``
column everywhere — store layout, shard routing, and upserts are
unchanged and tag-agnostic); ``series_name`` / ``series_tags`` project
the name and a ``MAP<STRING,STRING>`` out of it on read. Everything is
JVM built-ins (``str_to_map``), so tag filters stay inside codegen and
predicate pushdown — no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def series_name(col: Column | str) -> Column:
    """``a.b;host=x`` → ``a.b`` (the untagged part)."""
    return F.substring_index(_c(col), ";", 1)


def series_tags(col: Column | str) -> Column:
    """``a.b;host=x;cpu=0`` → ``map(host -> x, cpu -> 0)``; an untagged
    series yields an empty map."""
    c = _c(col)
    # strip 'name;' then str_to_map the remainder
    tail = F.when(
        c.contains(";"), F.regexp_replace(c, r"^[^;]*;", "")
    ).otherwise(F.lit(""))
    return F.when(
        tail == "", F.expr("map()").cast("map<string,string>")
    ).otherwise(F.str_to_map(tail, F.lit(";"), F.lit("=")))


def format_series(name: Column | str, tags: Column | str) -> Column:
    """Canonical tagged string: name + ``;k=v`` pairs in sorted key order
    (Graphite normalizes tag order the same way), so equal series always
    compare equal as strings."""
    n, t = _c(name), _c(tags)
    pairs = F.array_sort(
        F.transform(
            F.map_entries(t),
            lambda e: F.concat(e["key"], F.lit("="), e["value"]),
        )
    )
    return F.when(F.size(pairs) > 0, F.concat_ws(";", F.array(n), pairs)).otherwise(
        n
    )


def with_tags(df: DataFrame, metric_col: str = "metric") -> DataFrame:
    """Project ``name`` and ``tags`` columns out of the tagged metric."""
    return df.withColumn("name", series_name(metric_col)).withColumn(
        "tags", series_tags(metric_col)
    )


def tag_predicate(tags: dict[str, str], metric_col: str = "metric") -> Column:
    """AND-of-equals filter over the series' tags, as one JVM expression
    (e.g. ``tag_predicate({'host': 'web01'})``)."""
    m = series_tags(metric_col)
    pred = F.lit(True)
    for k, v in tags.items():
        pred = pred & (m[k] == v)
    return pred


def metrics_matching_tags(
    catalog: DataFrame, tags: dict[str, str], metric_col: str = "metric"
) -> DataFrame:
    """The tag-indexed lookup: catalog (or any metric frame) → the 1-column
    ``metric`` frame of series matching all given tags — feed it straight
    to ``fetch()``/``grid_fill()`` (both accept a metrics DataFrame)."""
    return catalog.where(tag_predicate(tags, metric_col)).select(
        F.col(metric_col).alias("metric")
    )
