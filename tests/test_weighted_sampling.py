"""Weighted bottom-k sampling (A-ES): determinism, weight-proportional
inclusion, zero/NULL-weight exclusion, and the no-shuffle plan shape."""

import pytest
from pyspark.sql import functions as F

from kenshin_spark.functions.sampling import weighted_bottom_k_sample


@pytest.fixture(scope="module")
def pop(spark):
    # 2000 rows; ids < 1000 carry weight 1, the rest weight 9
    return spark.range(0, 2000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 1000, 1.0).otherwise(9.0).alias("w"),
    )


def test_deterministic_and_fixed_size(spark, pop):
    a = sorted(r.k for r in weighted_bottom_k_sample(pop, 100, "k", "w").collect())
    b = sorted(r.k for r in weighted_bottom_k_sample(pop, 100, "k", "w").collect())
    assert a == b
    assert len(a) == 100


def test_weight_proportional_inclusion(spark, pop):
    got = weighted_bottom_k_sample(pop, 400, "k", "w").collect()
    heavy = sum(1 for r in got if r.k >= 1000)
    # heavy rows have 9x the odds: expect ~90% of the sample, allow slack
    assert heavy > 300, heavy


def test_zero_and_null_weights_excluded(spark):
    df = spark.range(0, 50).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, 0.0)
        .when(F.col("id") % 5 == 0, None)
        .otherwise(1.0)
        .alias("w"),
    )
    got = weighted_bottom_k_sample(df, 50, "k", "w").collect()
    assert all(r.k % 2 == 1 and r.k % 5 != 0 for r in got)


def test_nested_subset_property(spark, pop):
    small = {r.k for r in weighted_bottom_k_sample(pop, 50, "k", "w").collect()}
    big = {r.k for r in weighted_bottom_k_sample(pop, 200, "k", "w").collect()}
    assert small <= big


def test_plan_is_take_ordered(spark, pop):
    df = weighted_bottom_k_sample(pop, 10, "k", "w")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan
