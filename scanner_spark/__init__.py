"""scanner_spark — a PySpark-native dataflow/analytics engine.

Re-expresses the capabilities of scanner-research/scanner (a distributed
video-analysis dataflow engine; see /root/reference) on top of Spark
DataFrames: streams are DataFrames keyed by ``(stream_id, idx)``, Scanner's
index-domain operators (sample/space/slice) are narrow DataFrame rewrites,
and Scanner's user Ops (stencil/batch/stateful kernels) compile to Arrow
pandas UDFs.  Everything the reference lacks (joins, aggregations, window
functions, set ops) is exposed as plain Spark, plus an LLM-data-pipeline
layer (dedup, similarity search, text analysis, multimodal columns) designed
for 100 TB scale.
"""

from scanner_spark.session import get_spark
from scanner_spark.catalog import Database
from scanner_spark import streams
from scanner_spark.caching import release_all as release_cached, scoped_caches
from scanner_spark.ops import register_op, BoundaryMode

__all__ = [
    "get_spark",
    "Database",
    "streams",
    "register_op",
    "BoundaryMode",
    "release_cached",
    "scoped_caches",
]

__version__ = "0.1.0"
