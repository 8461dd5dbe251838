"""Cross-check every catalog query against its DuckDB oracle.

Replicates the driver's correctness gate locally: run the Spark
DataFrame and the oracle SQL on the same sf0.01 parquet, compare row
count, column names, and order-insensitive values.
"""

import math

import pandas as pd
import pytest

from ocr_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_DIR_ORACLE


def _canon(df: pd.DataFrame) -> list[tuple]:
    """Order-insensitive canonical form: sort columns by name, then rows."""
    df = df[sorted(df.columns)]

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<NULL>"
        if pd.isna(v):
            return "<NULL>"
        if isinstance(v, float):
            return f"{v:.9g}"
        return str(v)

    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(name, spark, duck):
    spark_df = QUERIES[name](spark, SF_DIR_ORACLE).toPandas()
    oracle_df = duck.execute(ORACLES[name]).df()

    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}"
    )
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count {len(spark_df)} vs {len(oracle_df)}"
    )
    s, o = _canon(spark_df), _canon(oracle_df)
    mismatches = [(a, b) for a, b in zip(s, o) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:5]}"


def test_all_queries_have_entries():
    """Every oracle key must have a query; queries without oracles are
    allowed (rows-only checks) but should be a minority."""
    assert set(ORACLES) <= set(QUERIES)
