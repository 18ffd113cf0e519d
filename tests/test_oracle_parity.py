"""Run every __spark_entry__.queries() entry against its oracle_sql()
with DuckDB — the driver's t2 gate, locally, at sf0.001 (fast).
Set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 to match the driver
exactly."""

import pytest

import __spark_entry__ as entrymod
from tests.oracle_utils import compare, duck_con

QUERIES = entrymod.queries()
ORACLE = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


def test_every_query_has_oracle_or_is_flagged():
    missing = [k for k in QUERIES if k not in ORACLE]
    # non-SQL-expressible ops may omit the oracle, but must be documented
    for k in missing:
        assert k in getattr(entrymod, "ROWS_ONLY", ()), (
            f"query {k!r} lacks oracle_sql and is not declared rows-only"
        )


@pytest.mark.parametrize("name", sorted(k for k in QUERIES if k in ORACLE))
def test_oracle_parity(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    report = compare(df, ORACLE[name], con)
    assert report["ok"], f"{name}: {report['issues']} rows={report['rows']}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.columns) >= 1
