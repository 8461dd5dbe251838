"""Driver-facing query catalog: Spark queries + DuckDB oracle SQL."""

from ocr_spark.queries.catalog import ORACLES, QUERIES
import ocr_spark.queries.pipeline_ops  # noqa: F401  (registers into QUERIES/ORACLES)
import ocr_spark.queries.catalog2  # noqa: F401
import ocr_spark.queries.multimodal  # noqa: F401
import ocr_spark.queries.extraction_docs  # noqa: F401
import ocr_spark.queries.multiturn  # noqa: F401

__all__ = ["QUERIES", "ORACLES"]
