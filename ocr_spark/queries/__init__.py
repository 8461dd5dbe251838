"""Driver-facing query catalog: Spark queries + DuckDB oracle SQL."""

from ocr_spark.queries.catalog import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
