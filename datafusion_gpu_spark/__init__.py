"""datafusion_gpu_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference (gabotechs/datafusion-gpu: a DataFusion 43 SQL engine + two custom
vectorized sum aggregates), re-expressed Spark-first:

- SQL surface       -> Spark SQL / Catalyst (``spark.sql``, DataFrame API)
- custom UDAFs      -> Arrow-vectorized pandas UDF aggregates (GPU via CuPy
                       when present, NumPy otherwise)
- bounded sources   -> ``spark.read`` (parquet/csv/json/arrow-ipc)
- plus the large-scale training-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal plumbing) the reference's extension
  mechanism implies.

Reference citations in docstrings point into /root/reference/ (read-only).
"""

from datafusion_gpu_spark.context import build_ctx, get_spark, register_tables

__version__ = "0.1.0"

__all__ = ["build_ctx", "get_spark", "register_tables", "__version__"]
