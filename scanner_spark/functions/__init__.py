"""Scalar/relational function layer: text analysis, dedup, similarity.

These are the LLM-training-data-pipeline operators that go beyond the
reference's surface (SURVEY.md §2.7): the reference pushes all relational
work to client-side Python after load() (no joins/aggs in its engine —
/root/reference/python/scannerpy/column.py:214-281); here they are
first-class, JVM-side Spark expressions designed for 100 TB.
"""

from scanner_spark.functions import (  # noqa: F401
    cluster,
    dedup,
    multimodal,
    pii,
    relevance,
    simsearch,
    text,
)
