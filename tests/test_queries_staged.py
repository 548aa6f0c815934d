"""Round-5 staged queries: same Spark-vs-DuckDB gate as the live
registry (tests/test_queries_oracle.py), run on entries held out of
QUERIES until the driver window frees slots."""

import math
import os

import duckdb
import pandas as pd
import pytest

from kenshin_spark.io import TABLES
from kenshin_spark.queries import QUERIES
from kenshin_spark.queries_staged import STAGED

# heavyweight tier: excluded from the driver's fast default run
pytestmark = pytest.mark.slow

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: None if v is None or v is pd.NA
                or (isinstance(v, float) and pd.isna(v)) else v
            ).astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def test_staged_names_disjoint_from_registry():
    # before promotion: fully disjoint; after: fully contained
    overlap = set(STAGED) & set(QUERIES)
    assert not overlap or set(STAGED) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_query_matches_oracle(spark, duck, name):
    spec = STAGED[name]
    got = canon(spec.fn(spark, SF_DIR).toPandas())
    want = canon(duck.sql(spec.oracle).df())
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), name
    assert len(got) > 0, f"{name} returns no rows at {SF_DIR}"
    for col in got.columns:
        for i, (a, b) in enumerate(zip(got[col], want[col])):
            assert values_equal(a, b), f"{name}.{col}[{i}]: {a!r} != {b!r}"


@pytest.mark.parametrize("name", ["ts_trend_slope", "emb_centroid_outliers"])
def test_float_sensitive_staged_queries_partition_stable(spark, name):
    """The two staged queries whose outputs pass through float
    aggregation noise margins: the rounded results must be identical
    under different shuffle partition counts (different summation
    orders), or the driver row would be flaky."""
    spec = STAGED[name]
    base = canon(spec.fn(spark, SF_DIR).toPandas())
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            again = canon(spec.fn(spark, SF_DIR).toPandas())
            assert base.equals(again), f"{name} unstable at {parts} parts"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_plan_antipatterns(spark, name):
    """Same plan discipline as the live registry sweep: no row-Python
    UDFs, no cartesian joins — checked BEFORE promotion, not after."""
    df = STAGED[name].fn(spark, SF_DIR)
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in p, f"{name} uses a row-Python UDF"
    assert "CartesianProduct" not in p, f"{name} has a cartesian join"
