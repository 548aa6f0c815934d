"""Local replica of the driver's t2 correctness gate: run every
``queries()`` entry on Spark AND its ``oracle_sql()`` twin on DuckDB over
the same parquet, then compare row count, column names, and
order-insensitive values (exact — floats included, since the engines are
meant to be bit-aligned by construction)."""

import math
import os

import duckdb
import pandas as pd
import pytest

from kenshin_spark.io import TABLES
from kenshin_spark.queries import QUERIES

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
            # normalize missing markers first: Spark hands None where
            # DuckDB hands NaN (seen with nullable booleans) — astype(str)
            # would sort 'None' and 'nan' differently and misalign rows
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


@pytest.mark.parametrize("name", [n for n, s in QUERIES.items() if s.oracle])
def test_query_matches_oracle(spark, duck, name):
    spec = QUERIES[name]
    got = spec.fn(spark, SF_DIR).toPandas()
    want = duck.sql(spec.oracle).df()

    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rowcount {len(got)} vs {len(want)}"

    # dtype-kind guard (VERDICT r8 item 1): the driver hashes serialized
    # values, so Spark int64 vs oracle float64 is a red row even when the
    # values compare equal below (int == float → True). A null-free column
    # pair may not straddle the int/float divide — that is exactly the
    # HUGEINT→float64 signature. (Columns WITH nulls are exempt: both
    # engines legitimately surface nullable ints as float64/object.)
    for c in got.columns:
        gk, wk = got[c].dtype.kind, want[c].dtype.kind
        if got[c].isna().any() or want[c].isna().any():
            continue
        if (gk in "iu" and wk == "f") or (gk == "f" and wk in "iu"):
            raise AssertionError(
                f"{name}: column {c!r} dtype kind mismatch "
                f"spark={got[c].dtype} oracle={want[c].dtype} — "
                "the driver hash WILL flag this (HUGEINT class, "
                "VERDICT r8); CAST the oracle column AS BIGINT or "
                "align the Spark twin's type"
            )

    g, w = canon(got), canon(want)
    mism = []
    for i in range(len(g)):
        for c in g.columns:
            a, b = g.iloc[i][c], w.iloc[i][c]
            a = None if (a is pd.NA or (isinstance(a, float) and pd.isna(a))) else a
            b = None if (b is pd.NA or (isinstance(b, float) and pd.isna(b))) else b
            if not values_equal(a, b):
                mism.append((i, c, a, b))
                if len(mism) >= 5:
                    break
        if len(mism) >= 5:
            break
    assert not mism, f"{name}: value mismatches {mism}"


@pytest.mark.parametrize("name", [n for n, s in QUERIES.items() if not s.oracle])
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name].fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0
