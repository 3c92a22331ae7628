from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from excelstream_spark.session import get_spark
from excelstream_spark.tables import TABLE_NAMES, table_path

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("excelstream_spark-tests")
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(SF_DIR, name)}')"
        )
    yield con
    con.close()


def _norm_value(v):
    """Normalize a cell for order-insensitive comparison (the driver's
    value-hash analogue): floats compared EXACTLY (bit-for-bit — round-1's
    9-sig-fig rounding here masked driver hash-fails on raw double sums;
    catalog queries must be engine-deterministic, see plans/relational.py),
    timestamps stringified."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (pd.Timestamp,)):
        return str(v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm_value(x) for x in v)
    if pd.isna(v):
        return None
    return v


def normalize_frame(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_norm_value(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def assert_matches_oracle(spark_df, duck_con, oracle: str, *, approx_float=True):
    actual = spark_df.toPandas()
    expected = duck_con.sql(oracle).df()
    assert sorted(map(str.lower, actual.columns)) == sorted(map(str.lower, expected.columns)), (
        f"column mismatch: spark={sorted(actual.columns)} oracle={sorted(expected.columns)}"
    )
    expected.columns = [c for c in expected.columns]
    # align oracle column case to spark's
    case_map = {c.lower(): c for c in actual.columns}
    expected.columns = [case_map[c.lower()] for c in expected.columns]
    assert len(actual) == len(expected), f"row count: spark={len(actual)} oracle={len(expected)}"
    a = normalize_frame(actual)
    e = normalize_frame(expected)
    mismatches = [(x, y) for x, y in zip(a, e) if x != y]
    assert not mismatches, f"{len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
