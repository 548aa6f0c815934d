"""Round-16 staged bank (the 1-row overflow created in round 9 so the
r9 window could seat q_zero_discount_share's re-verification): same
Spark-vs-DuckDB gate as the live registry and the earlier banks."""

import math
import os

import duckdb
import pandas as pd
import pytest

from kenshin_spark.io import TABLES
from kenshin_spark.queries import QUERIES
from kenshin_spark.queries_staged import STAGED
from kenshin_spark.queries_staged_r6 import STAGED_R6
from kenshin_spark.queries_staged_r7 import STAGED_R7
from kenshin_spark.queries_staged_r8 import STAGED_R8
from kenshin_spark.queries_staged_r9 import STAGED_R9
from kenshin_spark.queries_staged_r10 import STAGED_R10
from kenshin_spark.queries_staged_r11 import STAGED_R11
from kenshin_spark.queries_staged_r12 import STAGED_R12
from kenshin_spark.queries_staged_r13 import STAGED_R13
from kenshin_spark.queries_staged_r14 import STAGED_R14
from kenshin_spark.queries_staged_r15 import STAGED_R15
from kenshin_spark.queries_staged_r16 import STAGED_R16

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


def test_r16_names_disjoint_from_registry_and_banks():
    overlap = set(STAGED_R16) & set(QUERIES)
    assert not overlap or set(STAGED_R16) <= set(QUERIES)
    for bank in (STAGED, STAGED_R6, STAGED_R7, STAGED_R8, STAGED_R9,
                 STAGED_R10, STAGED_R11, STAGED_R12, STAGED_R13,
                 STAGED_R14, STAGED_R15):
        assert not set(STAGED_R16) & set(bank)


@pytest.mark.parametrize("name", sorted(STAGED_R16))
def test_staged_r16_query_matches_oracle(spark, duck, name):
    spec = STAGED_R16[name]
    got = canon(spec.fn(spark, SF_DIR).toPandas())
    want = canon(duck.sql(spec.oracle).df())
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), name
    assert len(got) > 0, f"{name} returns no rows at {SF_DIR}"
    for col in got.columns:
        for i, (a, b) in enumerate(zip(got[col], want[col])):
            assert values_equal(a, b), f"{name}.{col}[{i}]: {a!r} != {b!r}"


@pytest.mark.parametrize("name", sorted(STAGED_R16))
def test_staged_r16_plan_antipatterns(spark, name):
    df = STAGED_R16[name].fn(spark, SF_DIR)
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in p, f"{name} uses a row-Python UDF"
    assert "CartesianProduct" not in p, f"{name} has a cartesian join"
