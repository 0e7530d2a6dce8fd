"""Scalar-function surface.

The reference exposes DataFusion 43's full scalar-function packs through
``ctx.sql()`` (SURVEY §2.7). Spark ships namesakes for ~all of them; this
package holds the thin shims for the handful of name/semantics gaps
(``date_bin``, ``strpos``, ``arrow_typeof``) — Column-level helpers built
from built-in JVM expressions, never row-at-a-time Python UDFs.
"""

from datafusion_gpu_spark.functions.aliases import (
    date_bin,
    strpos,
    arrow_typeof,
)

__all__ = ["date_bin", "strpos", "arrow_typeof"]
