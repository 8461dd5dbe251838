"""Driver-facing query catalog: Spark queries + DuckDB oracle SQL."""

from ocr_spark.queries.catalog import ORACLES, QUERIES
import ocr_spark.queries.pipeline_ops  # noqa: F401  (registers into QUERIES/ORACLES)

__all__ = ["QUERIES", "ORACLES"]
