"""Round-9 staged queries: same Spark-vs-DuckDB gate as the live
registry and the earlier banks, run on entries held out of QUERIES
until round 8 frees driver-window slots."""

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


def test_r9_names_disjoint_from_registry_and_banks():
    overlap = set(STAGED_R9) & set(QUERIES)
    assert not overlap or set(STAGED_R9) <= set(QUERIES)
    for bank in (STAGED, STAGED_R6, STAGED_R7, STAGED_R8):
        assert not set(STAGED_R9) & set(bank)


@pytest.mark.parametrize("name", sorted(STAGED_R9))
def test_staged_r9_query_matches_oracle(spark, duck, name):
    spec = STAGED_R9[name]
    got = canon(spec.fn(spark, SF_DIR).toPandas())
    want = canon(duck.sql(spec.oracle).df())
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), name
    assert len(got) > 0, f"{name} returns no rows at {SF_DIR}"
    for col in got.columns:
        for i, (a, b) in enumerate(zip(got[col], want[col])):
            assert values_equal(a, b), f"{name}.{col}[{i}]: {a!r} != {b!r}"


@pytest.mark.parametrize("name", sorted(STAGED_R9))
def test_staged_r9_plan_antipatterns(spark, name):
    df = STAGED_R9[name].fn(spark, SF_DIR)
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in p, f"{name} uses a row-Python UDF"
    assert "CartesianProduct" not in p, f"{name} has a cartesian join"


def test_triage_agrees_with_the_real_ingest_job(spark, tmp_path):
    """The triage row must be a faithful projection of the REAL
    composed job: run StreamingCorpusIngest on the same batch/corpus
    split and compare its per-reason doc sets against the query's
    verdicts (quality thresholds aligned via quality_checks)."""
    from kenshin_spark.bpe import fit
    from kenshin_spark.pipeline import StreamingCorpusIngest
    from kenshin_spark.quality import predicate
    from kenshin_spark.queries_staged_r9 import STAGED_R9

    docs = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta eta theta", "t"),
            (20, "short doc", "t"),                      # quality
            (30, "the corpus shares this exact sentence body here", "t"),
            (40, "common boilerplate text repeated almost verbatim okay", "t"),
            (1, "unrelated corpus material with plenty of words", "t"),
            (3, "the corpus shares this exact sentence body here", "t"),
            (7, "common boilerplate text repeated almost verbatim yes", "t"),
        ],
        "doc_id long, text string, source string",
    )
    # the registry row's split: batch = doc_id % 10 = 0
    import pyspark.sql.functions as F  # noqa: N812

    # load_table expects the testdata layout: one parquet FILE per table
    tmp = str(tmp_path / "t")
    os.makedirs(tmp)
    docs.toPandas().to_parquet(f"{tmp}/documents.parquet", index=False)
    verdicts = {
        r["doc_id"]: r["reason"]
        for r in STAGED_R9["pipeline_ingest_triage"]
        .fn(spark, tmp)
        .collect()
    }

    corpus = docs.where("doc_id % 10 <> 0").select(
        "doc_id", "text", "source"
    )
    batch = docs.where("doc_id % 10 = 0").select(
        "doc_id", "text", "source"
    )
    merges = fit(corpus, n_merges=10)
    ing = StreamingCorpusIngest(
        spark, str(tmp_path / "c"), merges,
        quality_checks=[
            predicate(
                r"size(split(trim(text), '\\s+')) >= 5", name="min_tokens"
            )
        ],
    )
    ing.ingest(corpus, 0)   # build the persisted state
    ing.ingest(batch, 1)    # triage the batch

    dead = spark.read.parquet(f"{ing.root}/dead").where(
        F.col("batch_id") == 1
    ).withColumn(
        "doc_id", F.get_json_object("row", "$.doc_id").cast("long")
    )
    by_reason = {
        reason: {
            r["doc_id"]
            for r in dead.where(F.col("reason") == reason).collect()
        }
        for reason in ("quality_rejected", "exact_dups", "near_dups")
    }
    admitted = {
        r["doc_id"]
        for r in spark.read.parquet(f"{ing.root}/docs").collect()
    } & {r["doc_id"] for r in batch.collect()}

    assert by_reason["quality_rejected"] == {
        d for d, v in verdicts.items() if v == "quality_rejected"
    }
    assert by_reason["exact_dups"] == {
        d for d, v in verdicts.items() if v == "exact_dup"
    }
    assert by_reason["near_dups"] == {
        d for d, v in verdicts.items() if v == "near_dup"
    }
    assert admitted == {
        d for d, v in verdicts.items() if v == "admitted"
    }
